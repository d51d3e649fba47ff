"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, partitioning, batch shape, UDF
signatures) is fully real; only the codec itself is stubbed because
image/audio libraries are absent in this environment:

- ``decode="fake"``: a deterministic stub that parses the 16-byte
  header our synthetic assets carry (magic, width, height, channels)
  — exercising the full path end-to-end.
- ``decode="real"``: raises NotImplementedError at the decode call
  with a clear message; swap in PIL/ffmpeg on a cluster that has them.

At 100 TB this layout is the standard one: payloads stay in parquet
binary columns (or are pointers into object storage), metadata is
columnar and prunable, and decode parallelism is row-group/partition
parallelism.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

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


def decode_assets(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode binary payloads to pixel stats via mapInPandas.

    Arrow moves each partition's rows to Python in columnar batches;
    the iterator contract means constant memory per partition
    regardless of partition size.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                if decode == "real":
                    raise NotImplementedError(
                        "real image decoding requires PIL/ffmpeg, unavailable in "
                        "this environment; use decode='fake' or install codecs"
                    )
                w, h, c, body = _decode_fake(bytes(content))
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


def resize_stub(assets: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: emits the post-resize metadata and a payload
    whose size matches the target dimensions (nearest-neighbor index
    math on the fake codec — a real impl swaps the kernel only)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                w, h, c, body = _decode_fake(bytes(content))
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


def frame_sample(assets: DataFrame, every_k: int = 2) -> DataFrame:
    """'Video' frame sampling plumbing: treat the payload as a
    sequence of fixed-size frames (rows of the fake image) and keep
    every k-th, exploding one row per kept frame."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                w, h, c, body = _decode_fake(bytes(content))
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
