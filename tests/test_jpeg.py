"""Baseline JPEG codec: round-trip PSNR floors for both MCU layouts,
odd sizes, grayscale passthrough in decode_real dispatch, and the
named-constraint errors."""

from __future__ import annotations

import numpy as np
import pytest

from data_frame_demo_etl_spark.multimodal.binary_ops import decode_real
from data_frame_demo_etl_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: bytes, b: bytes) -> float:
    x = np.frombuffer(a, dtype=np.uint8).astype(np.float64)
    y = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
    mse = ((x - y) ** 2).mean()
    return 99.0 if mse == 0 else float(10 * np.log10(255.0**2 / mse))


def _gradient(w: int, h: int) -> bytes:
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes([(x * 12) % 256, (y * 19) % 256, ((x + y) * 7) % 256])
    return bytes(out)


@pytest.mark.parametrize("sub,floor", [("444", 34.0), ("420", 24.0)])
@pytest.mark.parametrize("dims", [(16, 16), (21, 13), (33, 17)])
def test_jpeg_roundtrip_psnr(sub, floor, dims):
    w, h = dims
    rgb = _gradient(w, h)
    enc = encode_jpeg(w, h, rgb, quality=90, subsample=sub)
    W, H, C, out = decode_jpeg(enc)
    assert (W, H, C) == (w, h, 3)
    assert _psnr(rgb, out) >= floor


def test_jpeg_flat_color_is_near_exact():
    rgb = bytes([120, 60, 200]) * (16 * 16)
    _, _, _, out = decode_jpeg(encode_jpeg(16, 16, rgb, quality=85))
    assert _psnr(rgb, out) >= 45.0  # only color-convert rounding remains


def test_decode_real_sniffs_jpeg():
    rgb = _gradient(8, 8)
    w, h, c, out = decode_real(encode_jpeg(8, 8, rgb, quality=90))
    assert (w, h, c) == (8, 8, 3)
    assert _psnr(rgb, out) >= 30.0


def test_jpeg_rejects_malformed_progressive():
    """A baseline stream whose SOF is flipped to SOF2 is structurally
    illegal progressive (its single scan spans 0..63 interleaved,
    which T.81 forbids for SOF2) — the progressive decoder must raise,
    not misdecode."""
    enc = bytearray(encode_jpeg(8, 8, _gradient(8, 8)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(bytes(enc))


def test_jpeg_rejects_non_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")


def _strip_segments(data: bytes, marker_byte: int) -> bytes:
    """Remove every FFxx segment with the given second byte (walks the
    segment structure, stops at SOS — entropy data is left intact)."""
    out = bytearray(data[:2])  # SOI
    pos = 2
    while pos < len(data) - 1:
        assert data[pos] == 0xFF
        m = data[pos + 1]
        if m == 0xD9:  # EOI
            out += data[pos:]
            break
        seg_len = 2 + int.from_bytes(data[pos + 2 : pos + 4], "big")
        if m == 0xDA:  # SOS: header + entropy bytes until next marker
            end = pos + seg_len
            while end < len(data) - 1 and not (
                data[end] == 0xFF and data[end + 1] not in (0x00, *range(0xD0, 0xD8))
            ):
                end += 1
            seg_len = end - pos
        if m != marker_byte:
            out += data[pos : pos + seg_len]
        pos += seg_len
    return bytes(out)


def test_progressive_missing_huffman_table_raises_named_valueerror():
    from data_frame_demo_etl_spark.multimodal.jpeg import (
        _decode_progressive,
        encode_jpeg_progressive,
    )

    enc = encode_jpeg_progressive(8, 8, _gradient(8, 8))
    with pytest.raises(ValueError, match="missing DC Huffman table"):
        _decode_progressive(_strip_segments(enc, 0xC4))


def test_progressive_missing_quant_table_raises_named_valueerror():
    from data_frame_demo_etl_spark.multimodal.jpeg import (
        _decode_progressive,
        encode_jpeg_progressive,
    )

    enc = encode_jpeg_progressive(8, 8, _gradient(8, 8))
    with pytest.raises(ValueError, match="missing quant table"):
        _decode_progressive(_strip_segments(enc, 0xDB))


def test_jpeg_quality_monotone():
    rgb = _gradient(24, 24)
    lo = encode_jpeg(24, 24, rgb, quality=30)
    hi = encode_jpeg(24, 24, rgb, quality=95)
    assert len(lo) < len(hi)
    _, _, _, out_lo = decode_jpeg(lo)
    _, _, _, out_hi = decode_jpeg(hi)
    assert _psnr(rgb, out_hi) > _psnr(rgb, out_lo)


# ---- property tests (pure-python codec: no Spark session needed) ----

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    sub=st.sampled_from(["444", "420"]),
)
def test_jpeg_roundtrip_never_corrupts_structure(w, h, seed, sub):
    """ANY size (including 1×1 and non-multiples of the MCU) and any
    pixel content round-trips to the exact dimensions with a bounded
    worst-case error: quantized DCT error cannot exceed half the sum
    of quantization steps — use the loose but universal 255-max bound
    via mean error instead (noise images at q=95 stay under it)."""
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    enc = encode_jpeg(w, h, rgb, quality=95, subsample=sub)
    W, H, C, out = decode_jpeg(enc)
    assert (W, H, C) == (w, h, 3)
    assert len(out) == w * h * 3
    floor = 28.0 if sub == "444" else 9.0  # 4:2:0 chroma on noise is brutal
    assert _psnr(rgb, out) >= floor


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=40),
)
def test_ewma_weights_sum_and_bounds(vals):
    """EWMA output is always inside [min, max] of the inputs (convex
    combination) and equals pandas' adjusted ewm within the rounding
    grid while the window is untruncated."""
    import pandas as pd

    want = pd.Series(vals, dtype="float64").ewm(alpha=0.5, adjust=True).mean()
    lo, hi = min(vals), max(vals)
    for i, wv in enumerate(want):
        assert lo - 1e-6 <= wv <= hi + 1e-6
        if i < 16:
            # mirror the Spark expression in pure python: same chain order
            num = den = 0.0
            for j in range(min(16, i + 1)):
                wt = 0.5 * 0.5**j
                num += vals[i - j] * wt
                den += wt
            import math

            grid = math.floor(num / den * 1_000_000 + 0.5) / 1_000_000
            assert abs(grid - wv) < 2e-6


# ---- progressive (SOF2) ----

from data_frame_demo_etl_spark.multimodal.jpeg import (  # noqa: E402
    encode_jpeg_progressive,
)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("dims", [(8, 8), (16, 16), (21, 13), (33, 17)])
def test_progressive_matches_baseline_exactly(sub, dims):
    """The strong cross-codec property: progressive and baseline
    encodings of the same pixels at the same quality hold IDENTICAL
    quantized coefficients, so they must decode to byte-identical
    pixels — any divergence is a bug in one of the two entropy
    layouts."""
    w, h = dims
    rgb = _gradient(w, h)
    base = decode_jpeg(encode_jpeg(w, h, rgb, quality=90, subsample=sub))
    prog = decode_jpeg(encode_jpeg_progressive(w, h, rgb, quality=90, subsample=sub))
    assert base == prog


def test_progressive_is_sof2_and_multiscan():
    enc = encode_jpeg_progressive(16, 16, _gradient(16, 16))
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
    assert enc.count(b"\xff\xda") == 10  # the 10-scan script


def test_decode_real_sniffs_progressive_jpeg():
    rgb = _gradient(8, 8)
    w, h, c, out = decode_real(encode_jpeg_progressive(8, 8, rgb, quality=90))
    assert (w, h, c) == (8, 8, 3)
    assert _psnr(rgb, out) >= 30.0


def test_progressive_flat_black_all_eob_paths():
    """All-zero AC coefficients: every scan is pure EOB runs; the
    refinement scans then read correction bits for nothing."""
    rgb = bytes(16 * 16 * 3)
    base = decode_jpeg(encode_jpeg(16, 16, rgb, quality=85))
    prog = decode_jpeg(encode_jpeg_progressive(16, 16, rgb, quality=85))
    assert base == prog


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    sub=st.sampled_from(["444", "420"]),
    quality=st.integers(min_value=20, max_value=95),
)
def test_progressive_equals_baseline_property(w, h, seed, sub, quality):
    """ANY size / content / quality: progressive decode == baseline
    decode, bit for bit (high-frequency noise exercises ZRL runs, EOB
    runs, and the AC-refinement correction-bit interleave)."""
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    base = decode_jpeg(encode_jpeg(w, h, rgb, quality=quality, subsample=sub))
    prog = decode_jpeg(encode_jpeg_progressive(w, h, rgb, quality=quality, subsample=sub))
    assert base == prog
