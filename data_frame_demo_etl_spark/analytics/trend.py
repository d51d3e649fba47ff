"""Per-group linear trend estimation: closed-form OLS over each
group's hourly value series — the "is this metric drifting up or
down, and how fast" summary that monitoring and feature pipelines
compute per key.

Spark-first shape: NO regression library and NO per-group Python —
the normal equations need only five sufficient statistics
(n, Σx, Σy, Σxy, Σx²), all plain integer aggregations with map-side
partials; one hourly rollup shuffle, one per-group origin lookup
(broadcast — group-cardinality-sized, the robust.py pattern), one
stats aggregation.

Determinism: x is the hour offset from the GROUP's first bucket
(slope is shift-invariant; the shift keeps every product inside
exact int64 — raw epoch hours would push Σxy past 2^63 at scale),
y is the exact micro-grid hourly sum, so all five sums are exact
integers. The final slope/intercept divisions run on those integers
with ONE fixed parenthesization (int→double conversion rounds
identically everywhere), quantized to the 1e-6 grid.

Headroom: Σxy < 2^63 holds through ~year-long series with hourly
sums < ~10¹⁰ micro-units; for coarser/longer series, bucket wider or
drop y to a 1e-3 grid (the formulation is unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

SCALE = 1_000_000


def trend_ols(
    series: DataFrame,
    group_col: str = "grp",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(group, n, slope_micro, intercept_micro) — OLS fit of exact-
    integer (x, y) points per group. Groups with < 2 distinct x (no
    identifiable slope) report nulls."""
    g = F.col(group_col)
    stats = series.groupBy(g.alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x_col).alias("sx"),
        F.sum(y_col).alias("sy"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("sxy"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    den = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    slope = num / den
    intercept = (F.col("sy") - slope * F.col("sx")) / nd
    return stats.select(
        "grp",
        "n",
        F.when(den > 0, F.floor(slope * SCALE + 0.5).cast("long")).alias(
            "slope_micro"
        ),
        F.when(den > 0, F.floor(intercept * SCALE + 0.5).cast("long")).alias(
            "intercept_micro"
        ),
    )


def events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-event-type OLS trend of the hourly value series —
    slope in micro-units per hour, intercept at the type's first
    bucket."""
    events = load_table(spark, "events", sf_dir)
    hourly = (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type").alias("grp"),
            F.date_trunc("hour", "ts").alias("bucket"),
        )
        .agg(F.sum(F.round(F.col("value") * SCALE).cast("long")).alias("y"))
    )
    origin = hourly.groupBy("grp").agg(F.min("bucket").alias("origin"))
    series = hourly.join(F.broadcast(origin), "grp").select(
        "grp",
        (
            (F.unix_timestamp("bucket") - F.unix_timestamp("origin")) / 3600
        ).cast("long").alias("x"),
        "y",
    )
    out = trend_ols(series)
    return out.select(
        F.col("grp").alias("event_type"), "n", "slope_micro", "intercept_micro"
    ).orderBy("event_type")


EVENTS_TREND_SLOPE_SQL = f"""
WITH hourly AS (
  SELECT event_type AS grp, DATE_TRUNC('hour', ts) AS bucket,
         CAST(SUM(CAST(ROUND(value * {SCALE}) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
origin AS (
  SELECT grp, MIN(bucket) AS origin FROM hourly GROUP BY grp
),
series AS (
  SELECT h.grp,
         CAST((EPOCH(h.bucket) - EPOCH(o.origin)) / 3600 AS BIGINT) AS x,
         h.y
  FROM hourly h JOIN origin o USING (grp)
),
stats AS (
  SELECT grp, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM series GROUP BY grp
)
SELECT grp AS event_type, n,
       CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0 THEN
         CAST(FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * {SCALE} + 0.5) AS BIGINT)
       END AS slope_micro,
       CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0 THEN
         CAST(FLOOR((sy - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                          / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
                    / CAST(n AS DOUBLE) * {SCALE} + 0.5) AS BIGINT)
       END AS intercept_micro
FROM stats
ORDER BY event_type
"""


MAX_LAG = 12


def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: windowed Theil–Sen robust trend per event type — the
    median of pairwise slopes over the hourly series, restricted to
    pairs within MAX_LAG buckets of each other. The full Theil–Sen
    pair set is quadratic; the lag-windowed variant is the standard
    linear-cost form (n·MAX_LAG slopes from MAX_LAG lag expressions
    over ONE (group, bucket) window shuffle) and keeps the estimator's
    outlier robustness: a single wild bucket corrupts at most
    2·MAX_LAG of the ~n·MAX_LAG slopes, nowhere near the median.

    Determinism: each slope is quantized to the 1e-6 grid FIRST
    (FLOOR(dy·1e6/dx + 0.5) — dy, dx exact integers, one double
    division) and the median of those integers is carried DOUBLED
    (robust.py convention), so any engine reproduces the estimate
    bit-for-bit.

    Contrast with `events_trend_slope` (OLS): OLS minimizes squared
    error and follows outliers; the slope MEDIAN ignores them — the
    pair a monitoring pipeline wants side by side."""
    from pyspark.sql import Window

    events = load_table(spark, "events", sf_dir)
    hourly = (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type").alias("grp"),
            F.date_trunc("hour", "ts").alias("bucket"),
        )
        .agg(F.sum(F.round(F.col("value") * SCALE).cast("long")).alias("y"))
        .withColumn("x", (F.unix_timestamp("bucket") / 3600).cast("long"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("x").asc())
    # Window expressions can't sit inside a generator: materialize the
    # MAX_LAG slope columns first (one Window operator — all lags share
    # the spec), then explode the plain columns.
    lag_exprs = []
    for lag in range(1, MAX_LAG + 1):
        dy = F.col("y") - F.lag("y", lag).over(w)
        dx = F.col("x") - F.lag("x", lag).over(w)
        lag_exprs.append(
            F.when(dx > 0, F.floor(dy * F.lit(float(SCALE)) / dx + 0.5))
            .cast("long")
            .alias(f"s{lag}")
        )
    widened = hourly.select("grp", *lag_exprs)
    slopes = widened.select(
        "grp",
        F.explode(F.array(*[F.col(f"s{lag}") for lag in range(1, MAX_LAG + 1)])).alias("s"),
    ).filter(F.col("s").isNotNull())
    return (
        slopes.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_slopes"),
            F.round(F.percentile(F.col("s"), F.lit(0.5)) * 2)
            .cast("long")
            .alias("slope_micro_med2"),
        )
        .select(F.col("grp").alias("event_type"), "n_slopes", "slope_micro_med2")
        .orderBy("event_type")
    )


EVENTS_THEILSEN_TREND_SQL = f"""
WITH hourly AS (
  SELECT event_type AS grp, DATE_TRUNC('hour', ts) AS bucket,
         CAST(SUM(CAST(ROUND(value * {SCALE}) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
xy AS (
  SELECT grp, CAST(EPOCH(bucket) / 3600 AS BIGINT) AS x, y FROM hourly
),
slopes AS (
  SELECT grp, lag_k,
         CAST(FLOOR((y - LAG(y, lag_k) OVER (PARTITION BY grp, lag_k ORDER BY x))
                    * {SCALE}.0
                    / (x - LAG(x, lag_k) OVER (PARTITION BY grp, lag_k ORDER BY x))
                    + 0.5) AS BIGINT) AS s
  FROM xy, (SELECT UNNEST(GENERATE_SERIES(1, {MAX_LAG})) AS lag_k) lags
)
SELECT grp AS event_type,
       COUNT(s) AS n_slopes,
       CAST(ROUND(QUANTILE_CONT(s, 0.5) * 2) AS BIGINT) AS slope_micro_med2
FROM slopes
WHERE s IS NOT NULL
GROUP BY grp
ORDER BY event_type
"""


# ─────────────── K55: log-log elasticity regression ───────────────


def loglog_elasticity(
    li: DataFrame, part: DataFrame, group_col: str = "p_brand"
) -> DataFrame:
    """Per-group log-log OLS of quantity on unit price — the
    elasticity regression (slope of ln q on ln p IS the price
    elasticity of demand), the econometric member of the trend family
    (K25 fits level-on-time, K30 robust level-on-time; K55 fits
    log-on-log across items). On synthetic TPC-H data the slope
    audits the MACHINERY, not the economy — documented.

    Exactness: unit price lands on the cent grid by exact integral
    division (extended price cents div quantity — TPC-H quantities
    are integral), both logs quantize to the 1e-6 grid per row BEFORE
    the decimal(38,0) sufficient-statistic sums (the L19
    construction), slope/intercept one fixed IEEE combination.
    Zero/degenerate variance → NULL.

    Scale shape: one equi-join lineitem⋈part (AQE strategy), one
    map-side-combined groupBy over the brand vocabulary. No windows,
    no collects."""
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col(group_col).alias("g"),
        F.expr(
            "cast(round(l_extendedprice * 100) as decimal(38,0))"
            " div cast(l_quantity as decimal(38,0))"
        ).cast("long").alias("unit_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    ).filter((F.col("unit_cents") > 0) & (F.col("qty") > 0))
    dec = "decimal(38,0)"
    qx = F.floor(
        F.log(F.col("unit_cents").cast("double")) * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast(dec)
    qy = F.floor(
        F.log(F.col("qty").cast("double")) * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast(dec)
    s = (
        j.withColumn("qx", qx)
        .withColumn("qy", qy)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast(dec).alias("n"),
            F.sum("qx").alias("sx"),
            F.sum("qy").alias("sy"),
            F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
            F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    den = nd * F.col("sxx").cast("double") - sxd * sxd
    slope = (nd * F.col("sxy").cast("double") - sxd * syd) / den
    intercept = (syd - slope * sxd) / nd
    return s.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.when(den > 0, F.floor(slope * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")).alias(
            "elasticity_micro"
        ),
        F.when(den > 0, F.floor(intercept + F.lit(0.5)).cast("long")).alias(
            "intercept_micro"
        ),
    ).orderBy(group_col)


def brand_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-brand log-log quantity-on-unit-price OLS."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    return loglog_elasticity(li, part)


BRAND_PRICE_ELASTICITY_SQL = """
WITH j AS (
  SELECT p.p_brand AS g,
         CAST(CAST(ROUND(l.l_extendedprice * 100) AS HUGEINT) // CAST(l.l_quantity AS HUGEINT) AS BIGINT) AS unit_cents,
         CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_quantity > 0
),
q AS (
  SELECT g,
         CAST(FLOOR(LN(CAST(unit_cents AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) AS qx,
         CAST(FLOOR(LN(CAST(qty AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) AS qy
  FROM j
  WHERE unit_cents > 0 AND qty > 0
),
s AS (
  SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(qx) AS sx, SUM(qy) AS sy, SUM(qx * qx) AS sxx, SUM(qx * qy) AS sxy
  FROM q GROUP BY g
)
SELECT g AS p_brand,
       CAST(n AS BIGINT) AS n,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN CAST(FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS elasticity_micro,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN CAST(FLOOR(((CAST(sy AS DOUBLE)
                 - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE)) + 0.5) AS BIGINT)
       END AS intercept_micro
FROM s
ORDER BY p_brand
"""
