"""Baseline JPEG (ITU T.81 / JFIF) codec in stdlib + numpy — closes
the last named-unsupported image format in `decode_real`
(multimodal/binary_ops.py): BMP/PPM/PNG/WAV/VID0 were already real,
JPEG raised. Like the other codecs this exists so the SPARK-side
plumbing (binary columns, Arrow-batched mapInPandas decode, typed
metadata) can be exercised end-to-end without PIL in the container;
swapping PIL/libjpeg into the same UDF is a one-line change.

Scope (baseline + progressive Huffman profiles):
- decoder: SOF0 baseline sequential DCT and SOF2 progressive DCT
  (spectral selection + successive approximation: DC first/refine,
  AC first with EOB runs, AC refinement with correction bits —
  T.81 Annex G), 8-bit, 1 or 3 components, sampling factors 1–2
  (covers 4:4:4, 4:2:2, 4:2:0), restart markers, byte-stuffed
  entropy data. Arithmetic coding, 12-bit, hierarchical (SOF5+),
  and >2 sampling factors raise ValueError naming the constraint —
  same contract style as the PNG decoder.
- encoder (fixture generator): baseline `encode_jpeg` (4:4:4 or
  4:2:0) and progressive `encode_jpeg_progressive` (libjpeg-style
  scan script, exercising every decoder scan kind), quality-scaled
  Annex K quantization tables, the Annex K "typical" Huffman tables,
  JFIF APP0. Deterministic output for a given (pixels, quality).

The DCT pair uses the orthonormal DCT-II matrix (T @ B @ T.T), which
reproduces the T.81 normalization exactly; encode→decode error is
bounded by quantization alone (tests pin PSNR on gradients).

Reference parity note: `/root/reference` has no media codecs at all
(pandas/Streamlit engine) — this is beyond-reference surface mandated
by the multimodal brief.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- Annex K tables (ITU T.81, public standard data) ----

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal DCT-II matrix: T @ block @ T.T == the T.81 FDCT.
_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / 8.0) ** 0.5 if _u == 0 else 0.5
    for _x in range(8):
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# ---- bit I/O ----


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00 and stops at markers
    (returning them via ``marker``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:  # a real marker: signal and feed zeros (spec allows)
                self.marker = nxt
                b = 0
                self.pos -= 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (used for RSTn); returns its code."""
        self.acc = 0
        self.nbits = 0
        self.marker = None
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                code = d[self.pos + 1]
                self.pos += 2
                return code
            self.pos += 1
        raise ValueError("expected marker in JPEG entropy data")


# ---- Huffman ----


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ---- encoder ----


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a (8a, 8b) plane → quantized coefficient
    array of shape (a*b, 64) in zigzag order."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    shifted = blocks.astype(np.float64) - 128.0
    coeffs = np.einsum("ux,nxy,vy->nuv", _T, shifted, _T)
    quant = np.round(coeffs / q[None, :, :]).astype(np.int32)
    return quant.reshape(-1, 64)[:, _ZIGZAG]


def _encode_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_tbl: dict[int, tuple[int, int]],
    ac_tbl: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, length = dc_tbl[size]
    bw.write(code, length)
    bw.write(bits, size)
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_tbl[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if run:
        code, length = ac_tbl[0x00]  # EOB
        bw.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(
    width: int, height: int, rgb: bytes, quality: int = 85, subsample: str = "444"
) -> bytes:
    """Baseline JFIF encoder: YCbCr 4:4:4 (default) or 4:2:0, Annex K
    tables scaled by ``quality``. Deterministic; meant for fixtures
    and round-trip tests of the decoder below — 4:2:0 exists mainly so
    the decoder's interleaved-MCU/upsample path is exercised by a file
    this repo can create."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    sub = 2 if subsample == "420" else 1
    mcu = 8 * sub
    ph = (height + mcu - 1) // mcu * mcu
    pw = (width + mcu - 1) // mcu * mcu
    # Tables are kept in natural (row-major) order internally; only
    # the DQT payload and the coefficient stream are zigzag, both
    # converted exactly at the container boundary below.
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)

    planes = []
    for p in (y, cb, cr):
        pad = np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
        planes.append(np.clip(pad, 0.0, 255.0))
    if sub == 2:  # 2x2 mean chroma downsample
        for i in (1, 2):
            p = planes[i]
            planes[i] = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    zz = [
        _fdct_quant(planes[0], ql),
        _fdct_quant(planes[1], qc),
        _fdct_quant(planes[2], qc),
    ]
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcus_x, mcus_y = pw // mcu, ph // mcu
    luma_bw = pw // 8  # luma blocks per row
    for my in range(mcus_y):
        for mx in range(mcus_x):
            # luma: sub×sub blocks in raster order inside the MCU
            for by in range(sub):
                for bx in range(sub):
                    bi = (my * sub + by) * luma_bw + (mx * sub + bx)
                    preds[0] = _encode_block(bw, zz[0][bi], preds[0], dc_l, ac_l)
            ci_bw = pw // (8 * sub)
            bi = my * ci_bw + mx
            preds[1] = _encode_block(bw, zz[1][bi], preds[1], dc_c, ac_c)
            preds[2] = _encode_block(bw, zz[2][bi], preds[2], dc_c, ac_c)
    bw.flush()

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return _seg(0xDB, bytes([tid]) + bytes(int(v) for v in q.reshape(64)[_ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    y_hv = 0x11 if sub == 1 else 0x22
    sof = _seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([3])
        + bytes([1, y_hv, 0])  # Y (h=v=2 for 4:2:0), quant table 0
        + bytes([2, 0x11, 1])  # Cb
        + bytes([3, 0x11, 1]),  # Cr
    )
    sos = _seg(
        0xDA,
        bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0]),
    )
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, ql)
        + dqt(1, qc)
        + sof
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )


# ---- decoder ----


def _is_progressive(data: bytes) -> bool:
    """Cheap marker walk: does the stream carry SOF2 before its first
    SOS? (Entropy data is never entered, so the walk is O(#segments).)"""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return False
        marker = data[pos + 1]
        if marker == 0xC2:
            return True
        if marker in (0xDA, 0xD9):  # first SOS / EOI: no SOF2 seen
            return False
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        pos += 2 + seg_len
    return False


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline or progressive JPEG → (width, height, 3, RGB bytes).
    See module docstring for the supported profile; violations raise
    ValueError naming the constraint."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    if _is_progressive(data):
        return _decode_progressive(data)
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    scan_order: list[dict] = []

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        payload = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(payload):
                prec_id = payload[p]
                if prec_id >> 4 != 0:
                    raise ValueError("16-bit quant tables not supported (baseline is 8)")
                tid = prec_id & 0x0F
                zzvals = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = zzvals
                qtables[tid] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(payload):
                cls_id = payload[p]
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(cls_id >> 4, cls_id & 0x0F)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, nc = payload[0], *struct.unpack_from(">HH", payload, 1), payload[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise ValueError("only grayscale or YCbCr JPEG supported")
            for ci in range(nc):
                cid, hv, tq = payload[6 + ci * 3 : 9 + ci * 3]
                h_f, v_f = hv >> 4, hv & 0x0F
                if h_f not in (1, 2) or v_f not in (1, 2):
                    raise ValueError("sampling factors above 2 not supported")
                comps.append({"id": cid, "h": h_f, "v": v_f, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            for si in range(ns):
                cs, tables = payload[1 + si * 2], payload[2 + si * 2]
                comp = next(c for c in comps if c["id"] == cs)
                comp["dc"] = htables[(0, tables >> 4)]
                comp["ac"] = htables[(1, tables & 0x0F)]
                scan_order.append(comp)
            break
        # APPn / COM / others: skipped via seg_len

    if not scan_order or width == 0:
        raise ValueError("JPEG missing SOF/SOS")

    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * h_max, 8 * v_max
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    for c in comps:
        cw = mcus_x * 8 * c["h"]
        ch = mcus_y * 8 * c["v"]
        c["plane"] = np.zeros((ch, cw), dtype=np.float64)
        c["pred"] = 0
        c["q"] = qtables[c["tq"]].astype(np.float64)

    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                code = br.align_to_marker()
                if not (0xD0 <= code <= 0xD7):
                    raise ValueError("expected RSTn marker")
                for c in comps:
                    c["pred"] = 0
            for c in scan_order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        s = _decode_symbol(br, c["dc"])
                        diff = _extend(br.read_bits(s), s)
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, c["ac"])
                            run, size = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        nat = np.zeros(64, dtype=np.float64)
                        nat[_ZIGZAG] = zz
                        block = nat.reshape(8, 8) * c["q"]
                        pix = _T.T @ block @ _T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    # upsample to full resolution and convert
    out_planes = []
    for c in comps:
        p = c["plane"]
        ry, rx = v_max // c["v"], h_max // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:height, :width])

    if len(comps) == 1:
        yv = np.clip(out_planes[0], 0, 255)
        rgb = np.repeat(yv[..., None], 3, axis=2)
    else:
        yv, cb, cr = out_planes
        cb = cb - 128.0
        cr = cr - 128.0
        r = yv + 1.402 * cr
        g = yv - 0.344136 * cb - 0.714136 * cr
        b = yv + 1.772 * cb
        rgb = np.stack([r, g, b], axis=2)
    rgb8 = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, rgb8.tobytes()


# ---- progressive (SOF2) ----
#
# Spectral selection + successive approximation per ITU T.81 Annex G,
# Huffman entropy coding. The decoder implements the full progressive
# profile (DC first/refine, AC first with EOB runs, AC refinement with
# correction bits, interleaved DC scans, non-interleaved AC scans over
# each component's OWN ceil(size/8) block grid, restart markers); the
# encoder emits a libjpeg-style default scan script so every decoder
# path is exercised by files this repo can create. All Huffman tables
# are the Annex K set — its AC tables contain every (run<<4|1) symbol
# refinement scans need; EOB runs are therefore always emitted with
# run length 1 (symbol 0x00), which is valid (just less compressed)
# and keeps the table set identical to the baseline encoder's.

#: (component indices, Ss, Se, Ah, Al) — the libjpeg-flavored default:
#: DC first at Al=1, luma AC split into two bands at Al=2, chroma AC
#: at Al=1, then one refinement pass per band down to Al=0.
_PROG_SCANS_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def _point_transform_ac(v: int, al: int) -> int:
    """T.81 AC point transform: |v| >> Al with the sign reinstated
    (truncation toward zero — NOT the arithmetic shift DC uses)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _emit_ac_first(
    bw: _BitWriter, block: np.ndarray, ss: int, se: int, al: int, ac_tbl
) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = _point_transform_ac(int(block[k]), al)
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_tbl[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if run:
        code, length = ac_tbl[0x00]  # EOB (run length 1)
        bw.write(code, length)


def _emit_ac_refine(
    bw: _BitWriter, block: np.ndarray, ss: int, se: int, al: int, ac_tbl
) -> None:
    """T.81 G.1.2.3 AC successive-approximation refinement: newly
    significant coefficients (shifted magnitude exactly 1) are coded
    with run lengths counting only ZERO-HISTORY positions; coefficients
    already nonzero at coarser precision contribute one buffered
    correction bit, appended after the next coded symbol (or after the
    block's EOB)."""
    absv = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
    eob_k = ss - 1  # band position of the last newly-significant coef
    for i, k in enumerate(range(ss, se + 1)):
        if absv[i] == 1:
            eob_k = k
    run = 0
    pending: list[int] = []
    for i, k in enumerate(range(ss, se + 1)):
        t = absv[i]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob_k:
            code, length = ac_tbl[0xF0]
            bw.write(code, length)
            run -= 16
            for bit in pending:
                bw.write(bit, 1)
            pending = []
        if t > 1:  # history coefficient: correction bit only
            pending.append(t & 1)
            continue
        # newly significant (shifted magnitude 1)
        code, length = ac_tbl[(run << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(block[k]) >= 0 else 0, 1)
        for bit in pending:
            bw.write(bit, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        code, length = ac_tbl[0x00]  # EOB run of 1
        bw.write(code, length)
        for bit in pending:
            bw.write(bit, 1)


def encode_jpeg_progressive(
    width: int, height: int, rgb: bytes, quality: int = 85, subsample: str = "444"
) -> bytes:
    """Progressive (SOF2) JFIF encoder: the `_PROG_SCANS_COLOR` scan
    script over the same YCbCr / Annex K pipeline as `encode_jpeg`.
    Deterministic; decodes to EXACTLY the same pixels as the baseline
    encoding of the same input (identical quantized coefficients,
    different entropy layout) — the round-trip tests pin that."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    sub = 2 if subsample == "420" else 1
    mcu = 8 * sub
    ph = (height + mcu - 1) // mcu * mcu
    pw = (width + mcu - 1) // mcu * mcu
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)

    planes = []
    for p in (y, cb, cr):
        pad = np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
        planes.append(np.clip(pad, 0.0, 255.0))
    if sub == 2:
        for i in (1, 2):
            p = planes[i]
            planes[i] = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

    zz = [
        _fdct_quant(planes[0], ql),
        _fdct_quant(planes[1], qc),
        _fdct_quant(planes[2], qc),
    ]
    # per-component geometry: padded block grid (DC interleaved scans)
    # and the ceil(image-size/8) grid (non-interleaved AC scans)
    hvs = [(sub, sub), (1, 1), (1, 1)]
    pbw = [pw // 8, pw // (8 * sub), pw // (8 * sub)]
    pbh = [ph // 8, ph // (8 * sub), ph // (8 * sub)]
    cbw, cbh = [], []
    for h_f, v_f in hvs:
        cw = -(-(width * h_f) // sub // 8)  # ceil(ceil(width*h/hmax)/8)
        ch = -(-(height * v_f) // sub // 8)
        cbw.append(cw)
        cbh.append(ch)

    dc_tbls = [
        _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
        _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_tbls = [
        _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
        _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    body = bytearray()
    for comp_ids, ss, se, ah, al in _PROG_SCANS_COLOR:
        bw = _BitWriter()
        if ss == 0:  # DC scan (interleaved over all scan components)
            if ah == 0:
                preds = {c: 0 for c in comp_ids}
                for my in range(ph // mcu):
                    for mx in range(pw // mcu):
                        for c in comp_ids:
                            h_f, v_f = hvs[c]
                            for by in range(v_f):
                                for bx in range(h_f):
                                    bi = (my * v_f + by) * pbw[c] + (mx * h_f + bx)
                                    val = int(zz[c][bi][0]) >> al
                                    size, bits = _magnitude(val - preds[c])
                                    code, length = dc_tbls[c][size]
                                    bw.write(code, length)
                                    bw.write(bits, size)
                                    preds[c] = val
            else:  # DC refinement: one raw bit per block, no Huffman
                for my in range(ph // mcu):
                    for mx in range(pw // mcu):
                        for c in comp_ids:
                            h_f, v_f = hvs[c]
                            for by in range(v_f):
                                for bx in range(h_f):
                                    bi = (my * v_f + by) * pbw[c] + (mx * h_f + bx)
                                    bw.write((int(zz[c][bi][0]) >> al) & 1, 1)
        else:  # AC scan: exactly one component, its own ceil grid
            (c,) = comp_ids
            for by in range(cbh[c]):
                for bx in range(cbw[c]):
                    block = zz[c][by * pbw[c] + bx]
                    if ah == 0:
                        _emit_ac_first(bw, block, ss, se, al, ac_tbls[c])
                    else:
                        _emit_ac_refine(bw, block, ss, se, al, ac_tbls[c])
        bw.flush()
        ns = len(comp_ids)
        sos_payload = bytes([ns])
        for c in comp_ids:
            td = 0 if c == 0 else 1
            ta = 0 if c == 0 else 1
            sos_payload += bytes([c + 1, (td << 4) | ta])
        sos_payload += bytes([ss, se, (ah << 4) | al])
        body += _seg(0xDA, sos_payload) + bytes(bw.out)

    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    y_hv = 0x11 if sub == 1 else 0x22
    sof = _seg(
        0xC2,
        bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([3])
        + bytes([1, y_hv, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return _seg(0xDB, bytes([tid]) + bytes(int(v) for v in q.reshape(64)[_ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    return (
        b"\xff\xd8"
        + app0
        + dqt(0, ql)
        + dqt(1, qc)
        + sof
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + bytes(body)
        + b"\xff\xd9"
    )


def _next_marker_pos(data: bytes, pos: int) -> int:
    """Position of the next non-stuffing, non-RST marker at/after pos."""
    p = pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(data)


def _prog_scan_dc(
    data, pos, scan_comps, ah, al, restart_interval, mcus_x, mcus_y
) -> int:
    """Decode one progressive DC scan (interleaved); returns the file
    position of the marker that follows the scan's entropy data."""
    br = _BitReader(data, pos)
    preds = {id(c): 0 for c in scan_comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                code = br.align_to_marker()
                if not (0xD0 <= code <= 0xD7):
                    raise ValueError("expected RSTn marker")
                for c in scan_comps:
                    preds[id(c)] = 0
            for c in scan_comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                        if ah == 0:
                            s = _decode_symbol(br, c["dc"])
                            preds[id(c)] += _extend(br.read_bits(s), s)
                            block[0] = preds[id(c)] << al
                        else:
                            if br.read_bit():
                                block[0] = int(block[0]) | (1 << al)
            mcu_count += 1
    return _next_marker_pos(data, br.pos)


def _prog_scan_ac(data, pos, c, ss, se, ah, al, restart_interval) -> int:
    """Decode one progressive AC scan (single component, its own
    ceil-grid); returns the position of the following marker."""
    br = _BitReader(data, pos)
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    n_blocks = 0
    for by in range(c["cbh"]):
        for bx in range(c["cbw"]):
            if restart_interval and n_blocks and n_blocks % restart_interval == 0:
                code = br.align_to_marker()
                if not (0xD0 <= code <= 0xD7):
                    raise ValueError("expected RSTn marker")
                eobrun = 0
            n_blocks += 1
            block = c["coef"][by, bx]
            if ah == 0:  # first scan for this band/precision
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _decode_symbol(br, c["ac"])
                    r, sz = rs >> 4, rs & 0x0F
                    if sz == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC coefficient overflow")
                    block[k] = _extend(br.read_bits(sz), sz) << al
                    k += 1
            else:  # refinement scan (T.81 G.2 / the jdphuff algorithm)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _decode_symbol(br, c["ac"])
                        r, sz = rs >> 4, rs & 0x0F
                        if sz:
                            if sz != 1:
                                raise ValueError(
                                    "invalid magnitude in AC refinement scan"
                                )
                            sval = p1 if br.read_bit() else m1
                        else:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            sval = 0  # ZRL: skip 16 zero-history slots
                        while k <= se:
                            c0 = int(block[k])
                            if c0 != 0:
                                if br.read_bit() and (c0 & p1) == 0:
                                    block[k] = c0 + (p1 if c0 >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if k <= se:
                            if sval:
                                block[k] = sval
                            k += 1
                if eobrun > 0:
                    # EOB: correction bits for the band's remaining
                    # nonzero-history coefficients
                    while k <= se:
                        c0 = int(block[k])
                        if c0 != 0:
                            if br.read_bit() and (c0 & p1) == 0:
                                block[k] = c0 + (p1 if c0 >= 0 else m1)
                        k += 1
                    eobrun -= 1
    return _next_marker_pos(data, br.pos)


def _decode_progressive(data: bytes) -> tuple[int, int, int, bytes]:
    """Progressive JPEG → (width, height, 3, RGB bytes): accumulate
    coefficients across every scan, then dequantize + IDCT once."""
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    h_max = v_max = 1
    mcus_x = mcus_y = 0

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        payload = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                prec_id = payload[p]
                if prec_id >> 4 != 0:
                    raise ValueError("16-bit quant tables not supported (baseline is 8)")
                tid = prec_id & 0x0F
                zzvals = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = zzvals
                qtables[tid] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                cls_id = payload[p]
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(cls_id >> 4, cls_id & 0x0F)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC2:  # SOF2 progressive
            prec, height, width, nc = payload[0], *struct.unpack_from(">HH", payload, 1), payload[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise ValueError("only grayscale or YCbCr JPEG supported")
            for ci in range(nc):
                cid, hv, tq = payload[6 + ci * 3 : 9 + ci * 3]
                h_f, v_f = hv >> 4, hv & 0x0F
                if h_f not in (1, 2) or v_f not in (1, 2):
                    raise ValueError("sampling factors above 2 not supported")
                comps.append({"id": cid, "h": h_f, "v": v_f, "tq": tq})
            h_max = max(c["h"] for c in comps)
            v_max = max(c["v"] for c in comps)
            mcus_x = (width + 8 * h_max - 1) // (8 * h_max)
            mcus_y = (height + 8 * v_max - 1) // (8 * v_max)
            for c in comps:
                # padded grid (interleaved DC scans touch dummy blocks)
                pbw, pbh = mcus_x * c["h"], mcus_y * c["v"]
                c["coef"] = np.zeros((pbh, pbw, 64), dtype=np.int32)
                # ceil grid (non-interleaved AC scans stop at the
                # component's true block count, T.81 A.2.2)
                c["cbw"] = -(-(-(-width * c["h"] // h_max)) // 8)
                c["cbh"] = -(-(-(-height * c["v"] // v_max)) // 8)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("mixed/unsupported SOF in progressive decode")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = payload[0]
            scan_comps = []
            for si in range(ns):
                cs, tables = payload[1 + si * 2], payload[2 + si * 2]
                comp = next(c for c in comps if c["id"] == cs)
                comp["dc"] = htables.get((0, tables >> 4))
                comp["ac"] = htables.get((1, tables & 0x0F))
                scan_comps.append(comp)
            ss, se, ahal = payload[1 + ns * 2 : 4 + ns * 2]
            ah, al = ahal >> 4, ahal & 0x0F
            # Table presence is validated HERE (contract: malformed
            # streams raise ValueError naming the constraint) — a scan
            # referencing an undefined table would otherwise surface as
            # a TypeError deep inside _decode_symbol.
            for si, comp in enumerate(scan_comps):
                tables = payload[2 + si * 2]
                # DC table needed by first DC scans; refinement DC scans
                # (ah > 0) and AC scans read raw bits / the AC table.
                if ss == 0 and ah == 0 and comp["dc"] is None:
                    raise ValueError(
                        f"missing DC Huffman table {tables >> 4} for scan component {comp['id']}"
                    )
                if ss != 0 and comp["ac"] is None:
                    raise ValueError(
                        f"missing AC Huffman table {tables & 0x0F} for scan component {comp['id']}"
                    )
            if ss == 0 and se == 0:
                pos = _prog_scan_dc(
                    data, pos, scan_comps, ah, al, restart_interval, mcus_x, mcus_y
                )
            else:
                if ns != 1:
                    raise ValueError("progressive AC scans must be non-interleaved")
                pos = _prog_scan_ac(
                    data, pos, scan_comps[0], ss, se, ah, al, restart_interval
                )
        # APPn / COM: skipped via seg_len

    if not comps or width == 0:
        raise ValueError("progressive JPEG missing SOF2/SOS")

    # dequantize + IDCT every component at once (DQT may legally arrive
    # in any segment before EOI, so quant-table presence is checked here,
    # not at SOS — contract: ValueError naming the constraint)
    out_planes = []
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(f"missing quant table {c['tq']} for component {c['id']}")
        q = qtables[c["tq"]].astype(np.float64)
        qzz = q.reshape(64)[_ZIGZAG]  # quant steps in zigzag order
        pbh, pbw = c["coef"].shape[:2]
        zz = c["coef"].reshape(-1, 64).astype(np.float64) * qzz[None, :]
        nat = np.zeros_like(zz)
        nat[:, _ZIGZAG] = zz
        blocks = nat.reshape(-1, 8, 8)
        pix = np.einsum("xu,nuv,yv->nxy", _T.T, blocks, _T.T) + 128.0
        plane = (
            pix.reshape(pbh, pbw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(pbh * 8, pbw * 8)
        )
        ry, rx = v_max // c["v"], h_max // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:height, :width])

    if len(comps) == 1:
        yv = np.clip(out_planes[0], 0, 255)
        rgb = np.repeat(yv[..., None], 3, axis=2)
    else:
        yv, cb, cr = out_planes
        cb = cb - 128.0
        cr = cr - 128.0
        r = yv + 1.402 * cr
        g = yv - 0.344136 * cb - 0.714136 * cr
        b = yv + 1.772 * cb
        rgb = np.stack([r, g, b], axis=2)
    rgb8 = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, rgb8.tobytes()
