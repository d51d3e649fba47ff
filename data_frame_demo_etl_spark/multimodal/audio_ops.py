"""Audio modality with a REAL codec, zero dependencies: the stdlib
`wave` module reads/writes PCM WAV, so — like the BMP/PPM image path
(binary_ops.py) — the audio plumbing runs actual encode → decode →
feature-extraction end-to-end instead of stubbing the codec.

Pipeline shape mirrors the image path: binary `content` column +
typed metadata, Arrow-batched mapInPandas for decode/feature passes
(constant memory per partition), features chosen integer-exact so the
DuckDB oracle can recompute them from the SYNTHESIS FORMULA — passing
the gate proves the WAV round-trip is bit-lossless AND the
distributed feature pass is correct.

Reference has no audio surface; brief-mandated multimodal family.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

SAMPLE_RATE = 8000

AUDIO_SCHEMA = (
    "asset_id long, media_type string, content binary, "
    "meta struct<sample_rate:int, n_channels:int, label:string>"
)
AUDIO_FEATURES_SCHEMA = (
    "asset_id long, n_samples long, sample_rate int, duration_ms long, "
    "sum_abs long, peak int"
)


def _synth_samples(asset_id: int) -> list[int]:
    """Deterministic pseudo-waveform, PCM16-safe: the formula is the
    contract the oracle recomputes."""
    n = 800 + (asset_id % 5) * 80
    return [((asset_id * 31 + j * 17) % 2048) - 1024 for j in range(n)]


def encode_wav(samples: list[int], sample_rate: int = SAMPLE_RATE) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(content: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_channels, samples) from a PCM16 WAV payload."""
    with wave.open(io.BytesIO(content), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"expected PCM16, got width {w.getsampwidth()}")
        n = w.getnframes()
        raw = w.readframes(n)
        return (
            w.getframerate(),
            w.getnchannels(),
            list(struct.unpack(f"<{n * w.getnchannels()}h", raw)),
        )


def make_audio_assets(spark: SparkSession, n: int = 48) -> DataFrame:
    """n real mono PCM16 WAV assets with the deterministic waveform."""
    rows = []
    for i in range(n):
        content = encode_wav(_synth_samples(i))
        rows.append((i, "audio/wav", content, (SAMPLE_RATE, 1, f"a{i % 3}")))
    return spark.createDataFrame(rows, AUDIO_SCHEMA)


def audio_features(assets: DataFrame) -> DataFrame:
    """Distributed REAL decode + integer-exact features per asset:
    sample count, duration, total magnitude, peak magnitude."""

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                rate, _ch, samples = decode_wav(bytes(content))
                out.append(
                    {
                        "asset_id": asset_id,
                        "n_samples": len(samples),
                        "sample_rate": rate,
                        "duration_ms": len(samples) * 1000 // rate,
                        "sum_abs": sum(abs(s) for s in samples),
                        "peak": max((abs(s) for s in samples), default=0),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id",
                    "n_samples",
                    "sample_rate",
                    "duration_ms",
                    "sum_abs",
                    "peak",
                ],
            )

    return assets.select("asset_id", "content").mapInPandas(
        feature_batches, AUDIO_FEATURES_SCHEMA
    )


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: 48 synthesized WAV assets → distributed real decode →
    features; the oracle recomputes every feature from the synthesis
    formula, so a pass proves codec losslessness + pipeline
    correctness. (sf_dir unused: the waveform is the dataset — same
    convention as the other synthesized-input gates.)"""
    assets = make_audio_assets(spark)
    return audio_features(assets).orderBy("asset_id")


MULTIMODAL_AUDIO_STATS_SQL = f"""
WITH ids AS (
  SELECT UNNEST(GENERATE_SERIES(0, 47)) AS asset_id
),
samples AS (
  SELECT asset_id, ((asset_id * 31 + j * 17) % 2048) - 1024 AS s
  FROM ids, LATERAL (
    SELECT UNNEST(GENERATE_SERIES(0, 800 + (asset_id % 5) * 80 - 1)) AS j
  )
)
SELECT asset_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       {SAMPLE_RATE} AS sample_rate,
       CAST(COUNT(*) * 1000 // {SAMPLE_RATE} AS BIGINT) AS duration_ms,
       CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
       CAST(MAX(ABS(s)) AS INTEGER) AS peak
FROM samples
GROUP BY asset_id
ORDER BY asset_id
"""


N_FRAMES = 16


def audio_fingerprints(assets: DataFrame) -> DataFrame:
    """(asset_id, ahash): 16-bit energy fingerprint of each PCM16
    asset — samples framed into N_FRAMES integer-boundary frames
    (frame of sample j = j·N_FRAMES // n), bit i set iff frame i's
    |sample| energy beats the cross-multiplied mean
    (energy_i · N_FRAMES > Σ energy) — the audio analog of the image
    aHash (multimodal/phash.py), pure integer arithmetic end to end.
    Column names match phash.ahash_near_dup_pairs so the banded
    Hamming pair join is shared across modalities."""

    def fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                _rate, _ch, samples = decode_wav(bytes(content))
                n = len(samples)
                energy = [0] * N_FRAMES
                for j, s in enumerate(samples):
                    energy[j * N_FRAMES // n] += abs(s)
                total = sum(energy)
                bits = 0
                for i, e in enumerate(energy):
                    if e * N_FRAMES > total:
                        bits |= 1 << i
                ids.append(asset_id)
                hashes.append(bits)
            yield pd.DataFrame({"asset_id": ids, "ahash": hashes})

    return assets.select("asset_id", "content").mapInPandas(
        fp_batches, "asset_id long, ahash long"
    )


def multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: synthesized WAV corpus → real decode → energy
    fingerprints → banded Hamming-≤2 near-dup pairs (the shared
    phash pair join). The oracle rebuilds every fingerprint from the
    synthesis formula and brute-forces the pairs — codec, framing,
    fingerprint, and pair search proven end to end."""
    from .phash import ahash_near_dup_pairs

    assets = make_audio_assets(spark)
    return ahash_near_dup_pairs(audio_fingerprints(assets)).orderBy("u", "v")


MULTIMODAL_AUDIO_DEDUP_SQL = f"""
WITH ids AS (
  SELECT UNNEST(GENERATE_SERIES(0, 47)) AS asset_id
),
samples AS (
  SELECT asset_id,
         (800 + (asset_id % 5) * 80) AS n,
         j,
         ABS(((asset_id * 31 + j * 17) % 2048) - 1024) AS a
  FROM ids, LATERAL (
    SELECT UNNEST(GENERATE_SERIES(0, 800 + (asset_id % 5) * 80 - 1)) AS j
  )
),
energies AS (
  SELECT asset_id, (j * {N_FRAMES}) // n AS frame, SUM(a) AS e
  FROM samples GROUP BY asset_id, (j * {N_FRAMES}) // n
),
totals AS (
  SELECT asset_id, SUM(e) AS t FROM energies GROUP BY asset_id
),
hashes AS (
  SELECT e.asset_id,
         CAST(SUM(CASE WHEN e.e * {N_FRAMES} > t.t THEN POWER(2, e.frame) ELSE 0 END) AS BIGINT) AS ahash
  FROM energies e JOIN totals t USING (asset_id)
  GROUP BY e.asset_id
)
SELECT a.asset_id AS u, b.asset_id AS v,
       CAST(BIT_COUNT(XOR(a.ahash, b.ahash)) AS INTEGER) AS hamming
FROM hashes a JOIN hashes b ON a.asset_id < b.asset_id
WHERE BIT_COUNT(XOR(a.ahash, b.ahash)) <= 2
ORDER BY u, v
"""
