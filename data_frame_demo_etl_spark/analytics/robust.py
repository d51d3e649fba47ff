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
    # Persist (r12): the median/MAD cascade reads the joined fact table
    # three more times (MAD build, outlier agg) — uncached, each read
    # re-scanned the source. The broadcast BUILD of `med` executes
    # before any probe, so the first probe materializes the cache and
    # later consumers hit it: source scans drop from ~4 to 2.
    dev = (
        base.join(F.broadcast(med), "grp")
        .withColumn("dev2", F.abs(2 * F.col("v") - F.col("med2")))
        .persist()
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
    # Persist (r12): the residual table feeds the median build, the
    # deviation projection, the MAD build and the final aggregate —
    # uncached, each consumer re-scanned events and re-joined the
    # profile. The profile broadcast BUILD runs before any probe, so
    # the first probe materializes the cache: events scans drop from
    # ~5 to 2 (profile build + one residual materialization).
    resid = (
        base.join(F.broadcast(profile), ["grp", "hod"])
        .select("grp", (F.col("v") - F.col("seasonal_mean")).alias("v"))
        .persist()
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


# ─────────────── K51: Poisson-bootstrap confidence intervals ───────────────

import math as _math

#: Resample count. 32 gives a stable 2nd/31st order-statistic CI
#: (≈ the 5/95 band) while keeping the replicated aggregation one
#: map-side-combined pass.
BOOT_B = 32

#: Poisson(1) inverse-CDF thresholds on the md5 2³²-grid, PRE-COMPUTED
#: as integer literals (the BENFORD_PPM convention — neither engine
#: evaluates exp at query time). Weight w = #thresholds ≤ u, capped at
#: 8 (P(w>8) < 1e-9 — the tail mass lands on w=8, a documented,
#: deterministic truncation identical in both engines).
_POIS_CUM = []
_acc = 0.0
_pk = _math.exp(-1.0)
for _k in range(8):
    _acc += _pk
    _POIS_CUM.append(min(int(_acc * 4294967296.0), 4294967295))
    _pk /= _k + 1
POISSON_THRESHOLDS: tuple[int, ...] = tuple(_POIS_CUM)


def _poisson_weight(u):
    """Poisson(1) draw from a uniform 2³²-grid hash, as a chained
    comparison CASE (identical structure to the generated SQL)."""
    w = F.lit(8)
    for k in range(len(POISSON_THRESHOLDS) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON_THRESHOLDS[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    b: int = BOOT_B,
) -> DataFrame:
    """Per-key Poisson-bootstrap confidence interval for the mean —
    the DISTRIBUTED bootstrap (each row draws an independent
    Poisson(1) multiplicity per resample, so resampling needs no
    global n and no data movement; the classical multinomial
    bootstrap's row-count coupling is exactly what does not scale).
    Deterministic: the multiplicity of (row, b) comes from the
    engine-portable md5 grid through a PRE-COMPUTED inverse-CDF
    threshold ladder — both engines reproduce every draw, so the CI
    is bit-stable run-to-run and engine-to-engine.

    Cost model (honest): the corpus is logically replicated B times
    (explode inside the task — no shuffle amplification; the partial
    aggregation combines map-side, so the exchange carries keys×B
    rows). One pass, B× the CPU of a plain mean — the standard
    Poisson-bootstrap price.

    Sign-total: the integral divisions are engine-identical for
    SIGNED values too — Spark `div` (long and decimal(38,0)) and
    DuckDB `//` (BIGINT and HUGEINT) both truncate toward zero
    (measured; pinned by tests/test_signed_divisions.py, which runs
    this operator on negative means against the literal DuckDB
    translation). The r9 non-negative contract is retired.

    Output: n, mean_micro (full-sample, exact integral division),
    ci_lo/ci_hi_micro — the 2nd/31st order statistics of the B=32
    resample means (≈ 5/95 band), selected exactly from the sorted
    per-key array (B-bounded, never data-sized). A key where any
    resample drew total weight 0 reports NULL bounds (deterministic;
    vanishing probability beyond toy inputs)."""
    cents = F.round(F.col(val_col) * 100).cast("long")
    base = df.filter(F.col(val_col).isNotNull()).select(
        F.col(key_col).alias("key"), cents.alias("v"), F.col(id_col).alias("rid")
    )
    rep = base.select(
        "key", "v", "rid", F.explode(F.expr(f"sequence(1, {int(b)})")).alias("b")
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("rid").cast("string"), F.col("b").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    dec = "decimal(38,0)"
    means = (
        rep.withColumn("w", _poisson_weight(u))
        .groupBy("key", "b")
        .agg(
            F.sum(F.col("w").cast(dec) * F.col("v").cast(dec)).alias("wv"),
            F.sum(F.col("w").cast(dec)).alias("wsum"),
        )
        .select(
            "key",
            F.when(
                F.col("wsum") > 0,
                F.expr("(wv * cast(1000000 as decimal(38,0))) div wsum").cast("long"),
            ).alias("m"),
        )
    )
    agg_means = means.groupBy("key").agg(
        F.count(F.lit(1)).alias("nb"),
        F.count("m").alias("nm"),
        F.sort_array(F.collect_list("m")).alias("ms"),
    )
    full = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s"),
    )
    ok = F.col("nm") == F.lit(int(b))
    return (
        full.join(agg_means, "key")
        .select(
            F.col("key").alias(key_col),
            F.col("n").cast("long").alias("n"),
            F.expr("(s * cast(1000000 as decimal(38,0))) div cast(n as decimal(38,0))")
            .cast("long")
            .alias("mean_micro"),
            F.when(ok, F.element_at("ms", 2)).alias("ci_lo_micro"),
            F.when(ok, F.element_at("ms", int(b) - 1)).alias("ci_hi_micro"),
        )
        .orderBy(key_col)
    )


def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-type Poisson-bootstrap 2nd/31st-of-32 CI for the mean
    event value — the uncertainty band the point estimate alone
    hides."""
    events = load_table(spark, "events", sf_dir)
    return bootstrap_mean_ci(events)


def _pois_case_sql(u_expr: str) -> str:
    arms = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}" for k, t in enumerate(POISSON_THRESHOLDS)
    )
    return f"CASE {arms} ELSE 8 END"


EVENTS_BOOTSTRAP_CI_SQL = f"""
WITH base AS (
  SELECT event_type AS key, CAST(ROUND(value * 100) AS BIGINT) AS v, event_id AS rid
  FROM events
  WHERE value IS NOT NULL
),
rep AS (
  SELECT key, v, rid, b.b,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(rid AS VARCHAR) || ':' || CAST(b.b AS VARCHAR)), 1, 8)) AS BIGINT) AS u
  FROM base CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, {BOOT_B})) AS b) b
),
means AS (
  SELECT key, b,
         CASE WHEN SUM({_pois_case_sql('u')}) > 0
              THEN (SUM(CAST({_pois_case_sql('u')} AS HUGEINT) * v) * 1000000)
                   // SUM(CAST({_pois_case_sql('u')} AS HUGEINT))
         END AS m
  FROM rep
  GROUP BY key, b
),
am AS (
  SELECT key, COUNT(*) AS nb, COUNT(m) AS nm, LIST(m ORDER BY m) AS ms
  FROM means GROUP BY key
),
tot AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS HUGEINT) AS s
  FROM base GROUP BY key
)
SELECT tot.key AS event_type,
       n,
       CAST((s * 1000000) // n AS BIGINT) AS mean_micro,
       CASE WHEN nm = {BOOT_B} THEN CAST(ms[2] AS BIGINT) END AS ci_lo_micro,
       CASE WHEN nm = {BOOT_B} THEN CAST(ms[{BOOT_B} - 1] AS BIGINT) END AS ci_hi_micro
FROM tot JOIN am ON am.key = tot.key
ORDER BY event_type
"""
