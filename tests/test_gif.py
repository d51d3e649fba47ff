"""M13 — real GIF89a codec: LZW, interlace, container, dispatch."""

import random

import pytest

from data_frame_demo_etl_spark.multimodal.gif import (
    decode_gif,
    encode_gif,
    lzw_compress,
    lzw_decompress,
)


def test_lzw_roundtrip_varied_entropy():
    random.seed(7)
    for n in (10, 1000, 20000, 60000):
        low = bytes(random.choice([0, 1, 2, 65]) for _ in range(n))
        assert lzw_decompress(lzw_compress(low, 8), 8, n) == low
        high = bytes(random.randrange(256) for _ in range(n))
        assert lzw_decompress(lzw_compress(high, 8), 8, n) == high


def test_lzw_kwkwk_run():
    data = b"\x05" * 500
    assert lzw_decompress(lzw_compress(data, 8), 8, 500) == data


def test_lzw_compresses_low_entropy():
    data = b"abab" * 2000
    assert len(lzw_compress(data, 8)) < len(data) // 3  # real compression, not literals


def test_container_roundtrip_plain_and_interlaced():
    for interlace in (False, True):
        for w, h in [(4, 4), (8, 6), (13, 9), (1, 17)]:
            idx = bytes((i * 37 + 11) % 256 for i in range(w * h))
            dw, dh, c, rgb = decode_gif(encode_gif(w, h, idx, interlace=interlace))
            assert (dw, dh, c) == (w, h, 3)
            # byte-exact: pins interlace ROW ORDER, not just the pixel sum
            assert rgb == b"".join(bytes([v, v, v]) for v in idx)


def test_decode_skips_extensions_and_uses_local_palette():
    idx = bytes(range(6))
    blob = bytearray(encode_gif(3, 2, idx))
    # splice a comment extension right before the image descriptor
    # (fixed offset: 13-byte header + 256*3 global color table)
    at = 13 + 768
    assert blob[at] == 0x2C
    blob[at:at] = b"\x21\xfe\x05hello\x00"
    assert decode_gif(bytes(blob))[3] == b"".join(bytes([v, v, v]) for v in idx)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError, match="trailer"):
        decode_gif(b"GIF89a" + b"\x03\x00\x02\x00\x00\x00\x00" + b"\x3b")


def test_decode_real_dispatches_gif():
    from data_frame_demo_etl_spark.multimodal.binary_ops import decode_real

    idx = bytes(range(48))
    w, h, c, rgb = decode_real(encode_gif(8, 6, idx))
    assert (w, h, c) == (8, 6, 3) and len(rgb) == 144
