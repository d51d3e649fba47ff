"""Robust anomaly detection: median / MAD (median absolute deviation)
outlier flagging per group — the Iglewicz-Hoaglin modified z-score
(|0.6745·(x−med)/MAD| > 3.5), the standard robust alternative to
mean/stddev z-scores (which a single extreme value can mask).

Engine-portable by construction: every quantity is kept on an exact
integer grid. Values ride the repo-wide 1e-6 micro grid; medians are
carried DOUBLED (2·median of n integers is always an integer, whether
n is odd or the even-case midpoint interpolation fires), and the
outlier test is cross-multiplied into pure integer form:

    0.6745·|x−med|/MAD > 3.5
  ⟺ 6745·|2x−med2| > 35000·(mad2/2)       (med2 = 2·med, mad2 = 2·MAD)
  ⟺ 13490·|2x−med2| > 35000·mad2

so no floating division ever happens and any engine reproduces the
same flags bit-for-bit.

Scale shape: two exact-percentile aggregations per group plus one
broadcast-size join of per-group medians back onto the fact table —
group cardinality is tiny (event types), fact side streams. NOTE:
Spark's ``percentile`` buffers each group's values executor-side;
that is fine up to ~10⁶ values per group. Past that, swap in
operators/selection.grouped_median2 — exact histogram-narrowing
selection in ≤ 4 counting passes with O(groups·65536) driver state
and ZERO per-group buffering; pytest pins it bit-equal to
``percentile`` on integer inputs (test_selection.py).

No reference analog; brief-mandated beyond-reference data-quality
surface (robust stats are the outlier-audit step of corpus QA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

# Iglewicz–Hoaglin constants, cross-multiplied to the integer grid.
_C_NUM = 13490  # 2 * 6745  (0.6745 scaled by 1e4)
_C_DEN = 35000  # 3.5 scaled by 1e4


def mad_outliers(
    df: DataFrame,
    group_col: str = "event_type",
    val_col: str = "value",
) -> DataFrame:
    """Per-group robust outlier summary: (group, n, med2_micro,
    mad2_micro, n_outliers). ``med2_micro`` / ``mad2_micro`` are the
    DOUBLED median and MAD in 1e-6 units (exact integers)."""
    g = F.col(group_col)
    v_micro = F.round(F.col(val_col) * 1_000_000).cast("long")
    base = df.filter(F.col(val_col).isNotNull()).select(g.alias("grp"), v_micro.alias("v"))
    med = base.groupBy("grp").agg(
        F.round(F.percentile(F.col("v"), F.lit(0.5)) * 2).cast("long").alias("med2")
    )
    dev = base.join(F.broadcast(med), "grp").withColumn(
        "dev2", F.abs(2 * F.col("v") - F.col("med2"))
    )
    mad = dev.groupBy("grp").agg(
        F.round(F.percentile(F.col("dev2"), F.lit(0.5))).cast("long").alias("mad2")
    )
    return (
        dev.join(F.broadcast(mad), "grp")
        .groupBy("grp", "med2", "mad2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.lit(_C_NUM) * F.col("dev2") > F.lit(_C_DEN) * F.col("mad2"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            F.col("med2").alias("med2_micro"),
            F.col("mad2").alias("mad2_micro"),
            "n_outliers",
        )
    )


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-event-type robust outlier audit of ``value``."""
    events = load_table(spark, "events", sf_dir)
    return mad_outliers(events).orderBy("event_type")


EVENTS_MAD_OUTLIERS_SQL = f"""
WITH base AS (
  SELECT event_type AS grp, CAST(ROUND(value * 1000000) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT grp, CAST(ROUND(QUANTILE_CONT(v, 0.5) * 2) AS BIGINT) AS med2
  FROM base GROUP BY grp
),
dev AS (
  SELECT b.grp, b.v, m.med2, ABS(2 * b.v - m.med2) AS dev2
  FROM base b JOIN med m USING (grp)
),
mad AS (
  SELECT grp, CAST(ROUND(QUANTILE_CONT(dev2, 0.5)) AS BIGINT) AS mad2
  FROM dev GROUP BY grp
)
SELECT d.grp AS event_type,
       COUNT(*) AS n,
       d.med2 AS med2_micro,
       m.mad2 AS mad2_micro,
       CAST(SUM(CASE WHEN {_C_NUM} * d.dev2 > {_C_DEN} * m.mad2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (grp)
GROUP BY d.grp, d.med2, m.mad2
ORDER BY event_type
"""


def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: seasonality-adjusted robust anomaly audit — deseasonalize
    each event value against its (event_type, hour-of-day) profile
    mean, then run the same integer-exact MAD test on the residuals.
    The composition matters: a nightly batch spike that is NORMAL for
    3 a.m. stops tripping the plain value-level detector, and a
    mid-day value that is ordinary globally but wild for noon is
    caught. Seasonal means stay on the integer grid as
    floor(sum/cnt); the profile table is (types × 24) rows and joins
    back broadcast."""
    events = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    base = events.select(
        F.col("event_type").alias("grp"),
        F.hour("ts").alias("hod"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("v"),
    )
    profile = base.groupBy("grp", "hod").agg(
        F.floor(F.sum("v") / F.count(F.lit(1))).cast("long").alias("seasonal_mean")
    )
    resid = base.join(F.broadcast(profile), ["grp", "hod"]).select(
        "grp", (F.col("v") - F.col("seasonal_mean")).alias("v")
    )
    med = resid.groupBy("grp").agg(
        F.round(F.percentile(F.col("v"), F.lit(0.5)) * 2).cast("long").alias("med2")
    )
    dev = resid.join(F.broadcast(med), "grp").withColumn(
        "dev2", F.abs(2 * F.col("v") - F.col("med2"))
    )
    mad = dev.groupBy("grp").agg(
        F.round(F.percentile(F.col("dev2"), F.lit(0.5))).cast("long").alias("mad2")
    )
    return (
        dev.join(F.broadcast(mad), "grp")
        .groupBy("grp", "med2", "mad2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.lit(_C_NUM) * F.col("dev2") > F.lit(_C_DEN) * F.col("mad2"), 1
                ).otherwise(0)
            ).alias("n_anomalies"),
        )
        .select(
            F.col("grp").alias("event_type"),
            "n",
            F.col("med2").alias("resid_med2_micro"),
            F.col("mad2").alias("resid_mad2_micro"),
            "n_anomalies",
        )
        .orderBy("event_type")
    )


EVENTS_SEASONAL_ANOMALY_SQL = f"""
WITH base AS (
  SELECT event_type AS grp, EXTRACT(HOUR FROM ts) AS hod,
         CAST(ROUND(value * 1000000) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
profile AS (
  SELECT grp, hod, CAST(FLOOR(SUM(v) / COUNT(*)) AS BIGINT) AS seasonal_mean
  FROM base GROUP BY grp, hod
),
resid AS (
  SELECT b.grp, b.v - p.seasonal_mean AS v
  FROM base b JOIN profile p USING (grp, hod)
),
med AS (
  SELECT grp, CAST(ROUND(QUANTILE_CONT(v, 0.5) * 2) AS BIGINT) AS med2
  FROM resid GROUP BY grp
),
dev AS (
  SELECT r.grp, r.v, m.med2, ABS(2 * r.v - m.med2) AS dev2
  FROM resid r JOIN med m USING (grp)
),
mad AS (
  SELECT grp, CAST(ROUND(QUANTILE_CONT(dev2, 0.5)) AS BIGINT) AS mad2
  FROM dev GROUP BY grp
)
SELECT d.grp AS event_type,
       COUNT(*) AS n,
       d.med2 AS resid_med2_micro,
       m.mad2 AS resid_mad2_micro,
       CAST(SUM(CASE WHEN {_C_NUM} * d.dev2 > {_C_DEN} * m.mad2 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM dev d JOIN mad m USING (grp)
GROUP BY d.grp, d.med2, m.mad2
ORDER BY event_type
"""
