"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, partitioning, batch shape, UDF
signatures) is fully real, and so is the codec for the formats a
pure-stdlib decoder can cover:

- ``decode="fake"``: a deterministic codec that parses the 16-byte
  header our synthetic assets carry (magic, width, height, channels)
  — exercising the full path with engine-replayable bytes.
- ``decode="real"``: decodes actual image files — BMP (24-bit
  uncompressed BI_RGB, top-down or bottom-up), PPM (binary P6,
  maxval 255), PNG (8/16-bit RGB, sequential AND Adam7-interlaced:
  zlib inflate + all five row unfilters), and baseline JPEG (SOF0,
  4:4:4/4:2:2/4:2:0,
  restart markers — multimodal/jpeg.py) — to RGB pixel buffers with
  no dependencies beyond numpy. Anything else raises ValueError
  naming the supported set; swap PIL/ffmpeg into the same UDF on a
  cluster that has them. Audio (WAV) and video (VID0) live in
  audio_ops.py and the video section below.

At 100 TB this layout is the standard one: payloads stay in parquet
binary columns (or are pointers into object storage), metadata is
columnar and prunable, and decode parallelism is row-group/partition
parallelism.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MAGIC = b"FIMG"
HEADER_FMT = ">4sHHH"  # magic, width, height, channels
HEADER_SIZE = struct.calcsize(HEADER_FMT)

ASSET_SCHEMA = (
    "asset_id long, media_type string, content binary, "
    "meta struct<width:int, height:int, channels:int, source:string>"
)

DECODED_SCHEMA = "asset_id long, width int, height int, channels int, n_bytes long, checksum long"


def make_synthetic_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake image assets: header + pseudo-pixel bytes."""
    rows = []
    for i in range(n):
        w, h, c = 4 + (i % 13), 4 + (i % 7), 1 + (i % 3)
        body = bytes(((i * 31 + j * 7 + seed) % 251) for j in range(w * h * c))
        content = struct.pack(HEADER_FMT, MAGIC, w, h, c) + body
        rows.append((i, "image", content, (w, h, c, f"synth{i % 5}")))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _decode_fake(content: bytes) -> tuple[int, int, int, bytes]:
    magic, w, h, c = struct.unpack(HEADER_FMT, content[:HEADER_SIZE])
    if magic != MAGIC:
        raise ValueError("bad magic; not a synthetic asset")
    return w, h, c, content[HEADER_SIZE:]


# ── real codecs (pure stdlib): BMP 24-bit BI_RGB and PPM P6 ──────────


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (BITMAPINFOHEADER, BI_RGB).
    ``rgb`` is row-major top-down RGB; rows are flipped and padded to
    4 bytes as the format requires."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")
    row_size = (width * 3 + 3) // 4 * 4
    pixel_data = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            r, g, b = rgb[i], rgb[i + 1], rgb[i + 2]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (row_size - len(row))
        pixel_data += row
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + bytes(pixel_data)


def _decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    width = struct.unpack_from("<i", data, 18)[0]
    raw_h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed (BI_RGB) BMP supported")
    bottom_up, height = raw_h > 0, abs(raw_h)
    row_size = (width * 3 + 3) // 4 * 4
    body = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = data[pixel_off + src_y * row_size : pixel_off + src_y * row_size + width * 3]
        for x in range(width):
            b, g, r = row[3 * x : 3 * x + 3]
            i = (y * width + x) * 3
            body[i], body[i + 1], body[i + 2] = r, g, b
    return width, height, 3, bytes(body)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary P6 PPM writer (maxval 255); payload is already RGB."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def _decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) file")
    # Header: three whitespace-separated tokens (width, height,
    # maxval) with '#' comments allowed, then ONE whitespace byte,
    # then the raw RGB payload.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval-255 PPM supported")
    body = data[pos : pos + width * height * 3]
    if len(body) != width * height * 3:
        raise ValueError("truncated PPM payload")
    return width, height, 3, bytes(body)


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Stdlib PNG writer: 8-bit truecolor (color type 2), non-
    interlaced. Rows CYCLE through all five filter types (None/Sub/
    Up/Average/Paeth) so a round-trip exercises every unfilter branch
    of the decoder, not just the trivial one."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")
    stride = width * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        for x in range(stride):
            a = row[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                raw.append(row[x])
            elif ftype == 1:
                raw.append((row[x] - a) & 0xFF)
            elif ftype == 2:
                raw.append((row[x] - b) & 0xFF)
            elif ftype == 3:
                raw.append((row[x] - (a + b) // 2) & 0xFF)
            else:
                raw.append((row[x] - _paeth(a, b, c)) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _filter_rows_sub(pixels: bytes, width_px: int, height: int, bpp: int) -> bytearray:
    """Filter a (sub)image with per-row Sub filtering (type 1) — a
    non-trivial filter the round-trip must invert, kept simple enough
    to reason about in the Adam7/16-bit encoders below."""
    stride = width_px * bpp
    raw = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(1)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            raw.append((row[x] - a) & 0xFF)
    return raw


def encode_png_adam7(width: int, height: int, rgb: bytes) -> bytes:
    """Stdlib INTERLACED (Adam7) PNG writer: the seven passes are
    extracted from the pixel grid, each filtered independently (Sub),
    and concatenated into one IDAT — the exact stream shape the
    interlaced decode path must walk."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        if x0 >= width or y0 >= height:
            continue
        w_p = (width - x0 + dx - 1) // dx
        h_p = (height - y0 + dy - 1) // dy
        if w_p == 0 or h_p == 0:
            continue
        sub = bytearray()
        for j in range(h_p):
            for i in range(w_p):
                src = ((y0 + j * dy) * width + (x0 + i * dx)) * 3
                sub += rgb[src : src + 3]
        raw += _filter_rows_sub(bytes(sub), w_p, h_p, 3)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png16(width: int, height: int, rgb: bytes) -> bytes:
    """Stdlib 16-bit truecolor PNG writer: each 8-bit sample v widens
    to the big-endian word (v<<8)|v (the standard bit-replication
    expansion), so the decoder's high-byte reduction recovers v
    exactly."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")
    wide = bytearray()
    for v in rgb:
        wide += bytes((v, v))
    raw = _filter_rows_sub(bytes(wide), width, height, 6)
    ihdr = struct.pack(">IIBBBBB", width, height, 16, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


# Adam7 pass grid: (x0, y0, dx, dy) per pass, PNG spec §8.2.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unfilter_rows(
    raw: bytes, offset: int, width_px: int, height: int, bpp: int
) -> tuple[bytearray, int]:
    """Unfilter ``height`` rows of ``width_px`` pixels (``bpp`` bytes
    each) starting at ``raw[offset]``; returns (pixels, new offset).
    Each (sub)image's filtering is self-contained — exactly what both
    the sequential image and each Adam7 pass need."""
    stride = width_px * bpp
    out = bytearray(stride * height)
    prev = bytes(stride)
    pos = offset
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        pos += stride
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pass
            elif ftype == 1:
                row[x] = (row[x] + a) & 0xFF
            elif ftype == 2:
                row[x] = (row[x] + b) & 0xFF
            elif ftype == 3:
                row[x] = (row[x] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                row[x] = (row[x] + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return out, pos


def _decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Stdlib PNG decoder: zlib inflate + per-row unfilter. Supports
    truecolor (color type 2) at bit depth 8 AND 16 (16-bit reduces to
    8 by the high byte, the standard presentation reduction), both
    SEQUENTIAL and INTERLACED (Adam7: seven independently-filtered
    passes scattered back onto the pixel grid). Other color types
    raise naming the constraint."""
    import zlib

    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG file")
    pos, width, height, idat = 8, None, None, bytearray()
    depth = interlace = 0
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if ctype != 2 or depth not in (8, 16):
                raise ValueError("only 8/16-bit truecolor (RGB) PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = 3 * (depth // 8)
    full = bytearray(width * height * bpp)
    if interlace == 0:
        full, end = _unfilter_rows(raw, 0, width, height, bpp)
        if end != len(raw):
            raise ValueError("PNG payload size mismatch")
    elif interlace == 1:
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            if x0 >= width or y0 >= height:
                continue
            w_p = (width - x0 + dx - 1) // dx
            h_p = (height - y0 + dy - 1) // dy
            if w_p == 0 or h_p == 0:
                continue
            sub, off = _unfilter_rows(raw, off, w_p, h_p, bpp)
            for j in range(h_p):
                for i in range(w_p):
                    src = (j * w_p + i) * bpp
                    dst = ((y0 + j * dy) * width + (x0 + i * dx)) * bpp
                    full[dst : dst + bpp] = sub[src : src + bpp]
        if off != len(raw):
            raise ValueError("PNG payload size mismatch")
    else:
        raise ValueError(f"bad PNG interlace method {interlace}")
    if depth == 16:
        # high-byte reduction: sample = v16 >> 8
        full = full[0::2]
    return width, height, 3, bytes(full)


def decode_real(content: bytes) -> tuple[int, int, int, bytes]:
    """Sniff-and-decode a real image payload to (w, h, channels, RGB).
    Dependency-free formats only; anything else raises with the
    supported set named (drop PIL/ffmpeg into the same UDF for more)."""
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[:2] == b"P6":
        return _decode_ppm(content)
    if content[:8] == PNG_SIG:
        return _decode_png(content)
    if content[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(content)
    raise ValueError(
        "unsupported image format (codecs cover BMP 24-bit, PPM P6, "
        "8/16-bit RGB PNG incl. Adam7, baseline JPEG, and GIF87a/89a); "
        "install PIL/ffmpeg and extend decode_real for others"
    )


def make_real_assets(spark: SparkSession, n: int = 32, fmt: str = "bmp", seed: int = 7) -> DataFrame:
    """Actual BMP/PPM files as binary-column assets (deterministic
    pixel pattern, alternating sizes — including widths that exercise
    BMP row padding)."""
    rows = []
    for i in range(n):
        w, h = 3 + (i % 5), 2 + (i % 4)  # w=3,5,7 hit BMP 4-byte pad
        rgb = bytes(((i * 37 + j * 11 + seed) % 256) for j in range(w * h * 3))
        content = encode_bmp(w, h, rgb) if fmt == "bmp" else encode_ppm(w, h, rgb)
        media = "image/bmp" if fmt == "bmp" else "image/x-portable-pixmap"
        rows.append((i, media, content, (w, h, 3, f"real{i % 3}")))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def decode_assets(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode binary payloads to pixel stats via mapInPandas.

    Arrow moves each partition's rows to Python in columnar batches;
    the iterator contract means constant memory per partition
    regardless of partition size.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            codec = decode_real if decode == "real" else _decode_fake
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                w, h, c, body = codec(bytes(content))
                out.append(
                    {
                        "asset_id": asset_id,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "n_bytes": len(body),
                        "checksum": sum(body) % (1 << 31),
                    }
                )
            yield pd.DataFrame(out, columns=["asset_id", "width", "height", "channels", "n_bytes", "checksum"])

    return assets.select("asset_id", "content").mapInPandas(decode_batches, DECODED_SCHEMA)


def resize_stub(assets: DataFrame, target_w: int, target_h: int, decode: str = "fake") -> DataFrame:
    """Resize: emits the post-resize metadata and a payload whose size
    matches the target dimensions — nearest-neighbor index math over
    whichever codec decoded the pixels (fake header or real BMP/PPM)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = decode_real if decode == "real" else _decode_fake
        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                w, h, c, body = codec(bytes(content))
                pixels = bytearray()
                for y in range(target_h):
                    sy = min(int(y * h / target_h), h - 1)
                    for x in range(target_w):
                        sx = min(int(x * w / target_w), w - 1)
                        for ch in range(c):
                            pixels.append(body[(sy * w + sx) * c + ch])
                rows.append(
                    {
                        "asset_id": asset_id,
                        "content": struct.pack(HEADER_FMT, MAGIC, target_w, target_h, c) + bytes(pixels),
                        "width": target_w,
                        "height": target_h,
                        "channels": c,
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "content", "width", "height", "channels"])

    return assets.select("asset_id", "content").mapInPandas(
        resize_batches, "asset_id long, content binary, width int, height int, channels int"
    )


def frame_sample(assets: DataFrame, every_k: int = 2, decode: str = "fake") -> DataFrame:
    """'Video' frame sampling plumbing: treat the payload as a
    sequence of fixed-size frames (rows of the fake image) and keep
    every k-th, exploding one row per kept frame."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = decode_real if decode == "real" else _decode_fake
        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                w, h, c, body = codec(bytes(content))
                frame_size = w * c
                for frame_idx in range(0, h, every_k):
                    frame = body[frame_idx * frame_size : (frame_idx + 1) * frame_size]
                    rows.append(
                        {"asset_id": asset_id, "frame_idx": frame_idx, "frame": frame}
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame"])

    return assets.select("asset_id", "content").mapInPandas(
        sample_batches, "asset_id long, frame_idx int, frame binary"
    )


def doc_assets(docs: DataFrame) -> DataFrame:
    """Wrap documents as binary assets: UTF-8 payload + typed metadata
    struct — the standard multimodal layout (payload opaque, metadata
    columnar and prunable) built from a shared table so external
    engines can reproduce the bytes."""
    from pyspark.sql import functions as F

    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.col("n_chars").cast("int").alias("n_chars"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_byte_features(assets: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: byte
    count, byte-sum checksum, and a derived 'brightness' — the decode
    stage's shape (binary in, numeric features out) with a codec any
    engine can replay. Real image decode drops into the same UDF."""

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                body = bytes(content)
                checksum = sum(body) % (1 << 31)
                out.append(
                    {
                        "asset_id": asset_id,
                        "n_bytes": len(body),
                        "checksum": checksum,
                        "brightness": checksum % 256,
                    }
                )
            yield pd.DataFrame(
                out, columns=["asset_id", "n_bytes", "checksum", "brightness"]
            )

    return assets.select("asset_id", "content").mapInPandas(
        feature_batches, "asset_id long, n_bytes long, checksum long, brightness long"
    )


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: documents → binary assets → Arrow-batched feature
    extraction. Verifies the multimodal plumbing (binary encode,
    mapInPandas batch shape, schema) end-to-end against an engine
    that recomputes the same features from the text."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return extract_byte_features(doc_assets(docs)).orderBy("asset_id")


# ASCII corpus: per-character codepoints == UTF-8 bytes, so the byte
# checksum is expressible over the text column.
MULTIMODAL_DECODE_STATS_SQL = """
WITH feats AS (
  SELECT doc_id AS asset_id,
         CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
         CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(SPLIT(text, ''), c -> ORD(c))), 0) AS BIGINT)
           % 2147483648 AS checksum
  FROM documents
)
SELECT asset_id, n_bytes, checksum, checksum % 256 AS brightness
FROM feats
ORDER BY asset_id
"""


def docs_as_bmp_assets(
    docs: DataFrame, width: int = 4, height: int = 4, fmt: str = "bmp"
) -> DataFrame:
    """Encode each document's leading text bytes as a REAL image file
    (24-bit BMP by default, ``fmt="png"`` for non-interlaced RGB PNG;
    truncated/zero-padded to exactly w*h*3 bytes) via mapInPandas —
    deterministic image bytes an external engine can reason about."""
    n_rgb = width * height * 3
    encoder = encode_png if fmt == "png" else encode_bmp
    media = "image/png" if fmt == "png" else "image/bmp"

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = str(text).encode("utf-8")[:n_rgb]
                rgb = raw + b"\x00" * (n_rgb - len(raw))
                rows.append(
                    {
                        "asset_id": doc_id,
                        "media_type": media,
                        "content": encoder(width, height, rgb),
                        "meta": {
                            "width": width,
                            "height": height,
                            "channels": 3,
                            "source": "docs",
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "media_type", "content", "meta"])

    return docs.select("doc_id", "text").mapInPandas(encode_batches, ASSET_SCHEMA)


def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: documents → REAL BMP encode → distributed REAL decode →
    pixel stats. Proves the stdlib BMP codec (BGR ordering, bottom-up
    rows, 4-byte padding) end-to-end on actual image bytes: the
    decoded checksum must equal the text-byte sum the oracle computes
    straight from the documents table (zero padding adds nothing)."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return decode_assets(docs_as_bmp_assets(docs), decode="real").orderBy("asset_id")


def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: documents → REAL PNG encode (zlib deflate, filter types
    cycling 0-4) → distributed REAL decode (inflate + unfilter) →
    pixel stats. Same pixel-formula oracle as the BMP gate: the
    decoded RGB buffer must byte-equal the document's leading text
    bytes regardless of which container carried them."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return decode_assets(docs_as_bmp_assets(docs, fmt="png"), decode="real").orderBy(
        "asset_id"
    )


# ASCII corpus: codepoints == UTF-8 bytes; BMP payload is the first
# 48 text bytes zero-padded, so the decoded-pixel checksum equals the
# truncated text-byte sum.
MULTIMODAL_DECODE_REAL_SQL = """
SELECT doc_id AS asset_id,
       4 AS width, 4 AS height, 3 AS channels,
       CAST(48 AS BIGINT) AS n_bytes,
       CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(SPLIT(SUBSTR(text, 1, 48), ''), c -> ORD(c))), 0) AS BIGINT)
         % 2147483648 AS checksum
FROM documents
ORDER BY asset_id
"""


# ───────────────────── real video container ─────────────────────
# A motion-BMP container parseable with stdlib only: b"VID0", u32
# frame count, then length-prefixed REAL BMP frames. Completes the
# modality set (image BMP/PPM, audio WAV) with actual frame-level
# parsing in the frame-sampling path instead of the fixed-stride
# fake-frame model above.

VIDEO_MAGIC = b"VID0"


def encode_video(frames: list[bytes]) -> bytes:
    out = bytearray(VIDEO_MAGIC)
    out += struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f))
        out += f
    return bytes(out)


def decode_video(content: bytes) -> list[bytes]:
    if content[:4] != VIDEO_MAGIC:
        raise ValueError("not a VID0 container")
    (n,) = struct.unpack_from("<I", content, 4)
    off, frames = 8, []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", content, off)
        off += 4
        frames.append(content[off : off + ln])
        off += ln
    return frames


def _video_frame_rgb(asset_id: int, frame_idx: int, w: int, h: int) -> bytes:
    return bytes(
        ((asset_id * 37 + frame_idx * 53 + j * 11) % 256) for j in range(w * h * 3)
    )


def make_video_assets(spark: SparkSession, n: int = 32) -> DataFrame:
    """n real VID0 containers of real BMP frames, deterministic
    per-frame pixels (the formula is the oracle's contract)."""
    rows = []
    for i in range(n):
        w, h = 3 + (i % 3), 2 + (i % 2)
        n_frames = 4 + i % 3
        frames = [
            encode_bmp(w, h, _video_frame_rgb(i, f, w, h)) for f in range(n_frames)
        ]
        rows.append((i, "video/x-vid0", encode_video(frames), (w, h, 3, f"v{i % 2}")))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def video_frame_features(assets: DataFrame, every_k: int = 2) -> DataFrame:
    """Distributed REAL frame sampling: parse the container, keep
    every k-th frame, BMP-decode it, emit integer-exact per-frame
    features."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                frames = decode_video(bytes(content))
                for f_idx in range(0, len(frames), every_k):
                    w, h, c, body = _decode_bmp(frames[f_idx])
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "frame_idx": f_idx,
                            "width": w,
                            "height": h,
                            "checksum": sum(body) % (1 << 31),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "width", "height", "checksum"]
            )

    return assets.select("asset_id", "content").mapInPandas(
        sample_batches,
        "asset_id long, frame_idx int, width int, height int, checksum long",
    )


def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: 32 real VID0 containers → distributed parse → sample
    every 2nd frame → real BMP decode → per-frame checksums. Oracle
    recomputes from the pixel formula (sf_dir unused — synthesized
    input, same convention as the audio gate)."""
    return video_frame_features(make_video_assets(spark), every_k=2).orderBy(
        "asset_id", "frame_idx"
    )


MULTIMODAL_VIDEO_FRAMES_SQL = """
WITH ids AS (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS asset_id),
geom AS (
  SELECT asset_id, 3 + (asset_id % 3) AS w, 2 + (asset_id % 2) AS h,
         4 + (asset_id % 3) AS n_frames
  FROM ids
),
sampled AS (
  SELECT asset_id, w, h, f AS frame_idx
  FROM geom, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, n_frames - 1, 2)) AS f)
),
px AS (
  SELECT asset_id, frame_idx, w, h,
         SUM((asset_id * 37 + frame_idx * 53 + j * 11) % 256) AS body_sum
  FROM sampled, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, w * h * 3 - 1)) AS j)
  GROUP BY 1, 2, 3, 4
)
SELECT asset_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(body_sum % 2147483648 AS BIGINT) AS checksum
FROM px
ORDER BY asset_id, frame_idx
"""


# ───────────────────── baseline JPEG gate ─────────────────────


def _jpeg_fixture_rgb(asset_id: int, w: int = 8, h: int = 8) -> bytes:
    """Deterministic SMOOTH gradient (no 0↔255 wraps): JPEG is lossy,
    so the gate checks a PSNR floor, not byte equality — a smooth ramp
    keeps quantization error tiny and the floor meaningful."""
    import numpy as np

    base = int(asset_id) % 128
    x = np.arange(w)[None, :, None] * 4
    y = np.arange(h)[:, None, None] * 4
    c = np.arange(3)[None, None, :] * 8
    return (base + x + y + c).astype(np.uint8).tobytes()


def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per document, synthesize the formula gradient, encode it
    as REAL baseline JPEG (4:4:4 for even ids, 4:2:0 for odd — both
    decoder MCU paths run), decode through `decode_real`'s format
    sniff, and report dims + a 30 dB PSNR floor. Unlike the lossless
    BMP/PNG gates the oracle pins dimensions and the quality flag, not
    byte identity — that's the honest contract for a lossy codec."""
    import numpy as np
    import pandas as pd

    from ..sources.catalog import load_table
    from .jpeg import encode_jpeg

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                rgb = _jpeg_fixture_rgb(doc_id)
                sub = "420" if doc_id % 2 else "444"
                enc = encode_jpeg(8, 8, rgb, quality=90, subsample=sub)
                w, h, ch, out = decode_real(enc)
                a = np.frombuffer(rgb, dtype=np.uint8).astype(np.float64)
                b = np.frombuffer(out, dtype=np.uint8).astype(np.float64)
                mse = float(((a - b) ** 2).mean())
                psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
                rows.append((int(doc_id), w, h, ch, sub, bool(psnr >= 30.0)))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "channels", "subsample", "psnr_ok"],
            )

    schema = (
        "asset_id long, width int, height int, channels int, "
        "subsample string, psnr_ok boolean"
    )
    return docs.mapInPandas(batches, schema=schema).orderBy("asset_id")


MULTIMODAL_DECODE_JPEG_SQL = """
SELECT doc_id AS asset_id,
       8 AS width, 8 AS height, 3 AS channels,
       CASE WHEN doc_id % 2 = 1 THEN '420' ELSE '444' END AS subsample,
       TRUE AS psnr_ok
FROM documents
ORDER BY asset_id
"""


def multimodal_decode_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the baseline-JPEG gate's fixture, re-encoded as REAL
    progressive (SOF2) JPEG — spectral selection + successive
    approximation, the libjpeg-style 10-scan script — decoded through
    `decode_real`'s format sniff. Pins dims, the 30 dB PSNR floor, AND
    the strong cross-codec property: a progressive encoding of the
    same pixels at the same quality decodes to EXACTLY the baseline
    encoding's pixels (identical quantized coefficients, different
    entropy layout). Closes the last named codec gap (the r6 round's
    'only progressive JPEG remains'). Impl: multimodal/jpeg.py
    encode_jpeg_progressive/_decode_progressive (T.81 Annex G).

    Runs on the doc_id % 10 < 2 quintile-of-two (one even + one odd
    residue, so BOTH subsample paths keep running): each document is
    an independent fixture (encode two ways, decode, compare — four
    full entropy passes of per-row Python), so corpus size adds codec
    work without adding evidence. The oracle applies the same
    predicate."""
    import numpy as np
    import pandas as pd

    from ..sources.catalog import load_table
    from .jpeg import encode_jpeg, encode_jpeg_progressive

    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id")
        .filter(F.col("doc_id") % 10 < 2)
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                rgb = _jpeg_fixture_rgb(doc_id)
                sub = "420" if doc_id % 2 else "444"
                enc = encode_jpeg_progressive(8, 8, rgb, quality=90, subsample=sub)
                w, h, ch, out = decode_real(enc)
                base = decode_real(encode_jpeg(8, 8, rgb, quality=90, subsample=sub))
                a = np.frombuffer(rgb, dtype=np.uint8).astype(np.float64)
                b = np.frombuffer(out, dtype=np.uint8).astype(np.float64)
                mse = float(((a - b) ** 2).mean())
                psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        ch,
                        sub,
                        bool(psnr >= 30.0),
                        bool(out == base[3]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "channels",
                    "subsample", "psnr_ok", "matches_baseline",
                ],
            )

    schema = (
        "asset_id long, width int, height int, channels int, "
        "subsample string, psnr_ok boolean, matches_baseline boolean"
    )
    return docs.mapInPandas(batches, schema=schema).orderBy("asset_id")


MULTIMODAL_DECODE_JPEG_PROGRESSIVE_SQL = """
SELECT doc_id AS asset_id,
       8 AS width, 8 AS height, 3 AS channels,
       CASE WHEN doc_id % 2 = 1 THEN '420' ELSE '444' END AS subsample,
       TRUE AS psnr_ok,
       TRUE AS matches_baseline
FROM documents
WHERE doc_id % 10 < 2
ORDER BY asset_id
"""


def video_keyframe_hashes(assets: DataFrame) -> DataFrame:
    """(asset_id, width, height, vhash): packed spatial aHash of the
    first two SAMPLED keyframes (indices 0 and 2 — the every_k=2
    sampling contract) — vhash = ahash(frame0)·4096 + ahash(frame2),
    12-bit slots sized for the fixture thumbnails. The per-frame
    aHash is the phash.py cross-multiplied-mean bit rule on r+g+b
    gray sums: pure integer arithmetic, formula-reproducible."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                frames = decode_video(bytes(content))
                fhashes = []
                for f_idx in (0, 2):
                    w, h, c, body = _decode_bmp(frames[f_idx])
                    n = w * h
                    grays = [sum(body[i * c : i * c + c]) for i in range(n)]
                    total = sum(grays)
                    bits = 0
                    for i, g in enumerate(grays):
                        if g * n > total:
                            bits |= 1 << i
                    fhashes.append(bits)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "width": w,
                        "height": h,
                        "vhash": fhashes[0] * 4096 + fhashes[1],
                    }
                )
        yield pd.DataFrame(rows, columns=["asset_id", "width", "height", "vhash"])

    return assets.select("asset_id", "content").mapInPandas(
        hash_batches, "asset_id long, width int, height int, vhash long"
    )


def multimodal_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: VID0 corpus → real frame decode → keyframe aHash pack →
    near-dup pairs (same frame shape, Hamming ≤ 2 across both
    keyframes). The equi-join key is the frame shape here (32-asset
    fixture); at corpus scale the band-bucket split of phash.py
    applies to vhash unchanged. Oracle rebuilds every hash from the
    frame pixel formula and brute-forces the pairs."""
    assets = make_video_assets(spark)
    hashes = video_keyframe_hashes(assets)
    a = hashes.select(
        F.col("asset_id").alias("u"), "width", "height", F.col("vhash").alias("hu")
    )
    b = hashes.select(
        F.col("asset_id").alias("v"), "width", "height", F.col("vhash").alias("hv")
    )
    ham = F.bit_count(F.col("hu").bitwiseXOR(F.col("hv")))
    return (
        a.join(b, ["width", "height"])
        .filter(F.col("u") < F.col("v"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= 2)
        .select("u", "v", "hamming")
        .orderBy("u", "v")
    )


MULTIMODAL_VIDEO_DEDUP_SQL = """
WITH ids AS (
  SELECT UNNEST(GENERATE_SERIES(0, 31)) AS a
),
shapes AS (
  SELECT a, 3 + (a % 3) AS w, 2 + (a % 2) AS h FROM ids
),
grays AS (
  SELECT s.a, s.w, s.h, f.f, i.i,
         (((s.a * 37 + f.f * 53 + (3 * i.i + 0) * 11) % 256)
        + ((s.a * 37 + f.f * 53 + (3 * i.i + 1) * 11) % 256)
        + ((s.a * 37 + f.f * 53 + (3 * i.i + 2) * 11) % 256)) AS g
  FROM shapes s,
       (SELECT UNNEST([0, 2]) AS f) f,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(0, s.w * s.h - 1)) AS i) i
),
totals AS (
  SELECT a, f, SUM(g) AS t, COUNT(*) AS n FROM grays GROUP BY a, f
),
fhash AS (
  SELECT g.a, g.f,
         CAST(SUM(CASE WHEN g.g * t.n > t.t THEN POWER(2, g.i) ELSE 0 END) AS BIGINT) AS fh
  FROM grays g JOIN totals t ON t.a = g.a AND t.f = g.f
  GROUP BY g.a, g.f
),
vhash AS (
  SELECT s.a, s.w, s.h,
         (SELECT fh FROM fhash WHERE fhash.a = s.a AND f = 0) * 4096
       + (SELECT fh FROM fhash WHERE fhash.a = s.a AND f = 2) AS vh
  FROM shapes s
)
SELECT x.a AS u, y.a AS v,
       CAST(BIT_COUNT(XOR(x.vh, y.vh)) AS INTEGER) AS hamming
FROM vhash x JOIN vhash y ON x.w = y.w AND x.h = y.h AND x.a < y.a
WHERE BIT_COUNT(XOR(x.vh, y.vh)) <= 2
ORDER BY u, v
"""


# ───────────────────── M13: real GIF89a (LZW) ─────────────────────


def docs_as_gif_assets(docs: DataFrame, width: int = 8, height: int = 6) -> DataFrame:
    """Encode each document's leading text bytes as a REAL GIF89a
    (8-bit indexed, identity grayscale palette, real LZW — see
    multimodal/gif.py); documents with even doc_id take the
    INTERLACED path so both row layouts are exercised in one gate."""
    from .gif import encode_gif

    n_px = width * height

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = str(text).encode("utf-8")[:n_px]
                idx = raw + b"\x00" * (n_px - len(raw))
                rows.append(
                    {
                        "asset_id": doc_id,
                        "media_type": "image/gif",
                        "content": encode_gif(
                            width, height, idx, interlace=(int(doc_id) % 2 == 0)
                        ),
                        "meta": {
                            "width": width,
                            "height": height,
                            "channels": 1,
                            "source": "docs",
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "media_type", "content", "meta"])

    return docs.select("doc_id", "text").mapInPandas(encode_batches, ASSET_SCHEMA)


def multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: documents → REAL GIF89a encode (true LZW, alternating
    interlace) → distributed REAL decode (variable-width LZW,
    deinterlace, palette expansion) → pixel stats. The identity
    grayscale palette makes the decoded RGB checksum exactly 3× the
    truncated text-byte sum the oracle computes from the documents
    table — wrong width growth or a broken KwKwK case shifts the
    checksum (the SUM is row-order invariant, so interlace ORDER is
    pinned by the byte-exact pytest roundtrips, not this gate)."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return decode_assets(docs_as_gif_assets(docs), decode="real").orderBy("asset_id")


MULTIMODAL_DECODE_GIF_SQL = """
SELECT doc_id AS asset_id,
       8 AS width, 6 AS height, 3 AS channels,
       CAST(144 AS BIGINT) AS n_bytes,
       CAST(3 * COALESCE(LIST_SUM(LIST_TRANSFORM(SPLIT(SUBSTR(text, 1, 48), ''), c -> ORD(c))), 0) AS BIGINT)
         % 2147483648 AS checksum
FROM documents
ORDER BY asset_id
"""
