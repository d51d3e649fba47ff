"""Scalar int8 embedding quantization — the storage-tier compression
step ANN stacks run before PQ (4× smaller vectors, ~1-2% recall cost):
per-DIMENSION min/max calibration, 8-bit affine codes, and a
reconstruction-error report.

Everything on the 1e-6 integer micro-grid so the oracle reproduces
each code and error bit-for-bit: values quantize to micro ints, the
code is an integer division against the calibrated span, and the
reconstruction error is an exact integer sum. (float32 inputs widen
to double losslessly — IEEE widening is exact — before the grid.)

Scale shape: ONE posexplode scan feeds both the per-dimension
calibration aggregate (≤ dim groups, map-side combined) and, re-read
from the checkpointed explode, the coding pass; the calibration table
broadcasts (dim rows). No per-vector driver work, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

SCALE = 1_000_000
LEVELS = 255  # int8 affine code 0..255


def int8_calibrate_and_score(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(dim, lo_micro, hi_micro, span_micro, mae_micro, max_err_micro):
    per-dimension min/max calibration, then code/decode every value
    and report the exact mean/max absolute reconstruction error.

    code   = clamp(((v − lo) · 255) div span, 0..255)     (exact ints)
    recon  = lo + (code · span) div 255
    The maximum possible error is ~span/255/2 + rounding — the report
    PROVES the bound on the corpus instead of assuming it."""
    vals = vectors.select(
        F.posexplode(vec_col).alias("dim", "fval")
    ).select(
        "dim",
        F.floor(F.col("fval").cast("double") * SCALE + 0.5)
        .cast("long")
        .alias("v"),
    )
    vals = vals.localCheckpoint(eager=True)  # feeds calibration AND coding
    calib = vals.groupBy("dim").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    calib = calib.withColumn(
        "span", F.greatest(F.col("hi") - F.col("lo"), F.lit(1))
    )
    coded = (
        vals.join(F.broadcast(calib), "dim")
        .withColumn(
            "code",
            F.least(
                F.lit(LEVELS),
                F.greatest(
                    F.lit(0), F.expr(f"((v - lo) * {LEVELS}) div span")
                ),
            ),
        )
        .withColumn("recon", F.col("lo") + F.expr(f"(code * span) div {LEVELS}"))
        .withColumn("err", F.abs(F.col("v") - F.col("recon")))
    )
    return (
        coded.withColumn("dim", F.col("dim").cast("long"))
        .groupBy("dim")
        .agg(
            F.min("lo").alias("lo_micro"),
            F.min("hi").alias("hi_micro"),
            F.min("span").alias("span_micro"),
            F.expr("sum(err) div count(1)").alias("mae_micro"),
            F.max("err").alias("max_err_micro"),
        )
        .orderBy("dim")
    )


def embeddings_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: int8-quantize the embeddings table per dimension and
    report exact reconstruction error stats — the storage-compression
    contract (codes + calibration reproduce every vector to within
    span/255) proven on the corpus, not assumed."""
    vecs = load_table(spark, "embeddings", sf_dir)
    return int8_calibrate_and_score(vecs)


EMBEDDINGS_INT8_QUANTIZATION_SQL = f"""
WITH vals AS (
  SELECT i - 1 AS dim,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {SCALE} + 0.5) AS BIGINT) AS v
  FROM embeddings, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS i)
),
calib AS (
  SELECT dim, MIN(v) AS lo, MAX(v) AS hi,
         GREATEST(MAX(v) - MIN(v), 1) AS span
  FROM vals GROUP BY dim
),
coded AS (
  SELECT vals.dim, v, lo, hi, span,
         LEAST({LEVELS}, GREATEST(0, (v - lo) * {LEVELS} // span)) AS code
  FROM vals JOIN calib ON calib.dim = vals.dim
),
scored AS (
  SELECT dim, lo, hi, span,
         ABS(v - (lo + (code * span) // {LEVELS})) AS err
  FROM coded
)
SELECT dim,
       CAST(MIN(lo) AS BIGINT) AS lo_micro,
       CAST(MIN(hi) AS BIGINT) AS hi_micro,
       CAST(MIN(span) AS BIGINT) AS span_micro,
       CAST(SUM(err) // COUNT(*) AS BIGINT) AS mae_micro,
       CAST(MAX(err) AS BIGINT) AS max_err_micro
FROM scored
GROUP BY dim
ORDER BY dim
"""
