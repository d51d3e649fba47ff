"""Time-series helpers beyond plain windowing: gap-filled bucket
series (timescale-style ``time_bucket_gapfill``), built from
``sequence`` + explode + left join — no driver-side loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.catalog import load_table


def gapfill_buckets(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    bucket: str = "1 hour",
    agg_col: str | None = None,
) -> DataFrame:
    """Dense (bucket × key) grid with zero-filled missing buckets.

    The bucket spine is built with ``sequence(min, max, interval)``
    from a single min/max aggregate — one tiny row exploded, then a
    broadcast-joined grid against the sparse aggregates.
    """
    bucketed = df.select(
        F.date_trunc("hour", F.col(ts_col)).alias("bucket"), F.col(key_col).alias("key")
    )
    sparse = bucketed.groupBy("bucket", "key").agg(F.count(F.lit(1)).alias("n"))

    bounds = bucketed.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr(f"sequence(lo, hi, interval {bucket})")).alias("bucket")
    )
    keys = bucketed.select("key").distinct()
    # The dense (bucket × key) grid IS the output — its size is the
    # result size, not an intermediate blow-up. Callers gap-filling a
    # fine spine over high-cardinality keys should bound one side
    # (coarser bucket, key subset) since |spine|·|keys| rows WILL be
    # produced, by definition of the operation.
    grid = spine.crossJoin(keys)
    return (
        grid.join(sparse, ["bucket", "key"], "left")
        .select("bucket", "key", F.coalesce("n", F.lit(0)).alias("n"))
    )


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user hourly time grid with zero-filled gaps (bounded-grid contract)."""
    events = load_table(spark, "events", sf_dir)
    out = gapfill_buckets(events, "ts", "event_type", "1 hour")
    return out.select(
        "bucket", F.col("key").alias("event_type"), "n"
    ).orderBy("bucket", "event_type")


EVENTS_GAPFILL_SQL = """
WITH b AS (
  SELECT DATE_TRUNC('hour', ts) AS bucket, event_type FROM events
),
sparse AS (
  SELECT bucket, event_type, COUNT(*) AS n FROM b GROUP BY bucket, event_type
),
spine AS (
  SELECT UNNEST(GENERATE_SERIES((SELECT MIN(bucket) FROM b),
                                (SELECT MAX(bucket) FROM b),
                                INTERVAL '1 hour')) AS bucket
),
keys AS (SELECT DISTINCT event_type FROM b)
SELECT spine.bucket AS bucket, keys.event_type AS event_type, COALESCE(sparse.n, 0) AS n
FROM spine CROSS JOIN keys
LEFT JOIN sparse ON sparse.bucket = spine.bucket AND sparse.event_type = keys.event_type
ORDER BY spine.bucket, keys.event_type
"""


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names within a brand (edit distance ≤ 3,
    brand as the blocking key — fuzzy joins need blocking at scale)."""
    part = load_table(spark, "part", sf_dir)
    a = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(b, "brand")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= 3)
        .select("brand", "key_a", "key_b", "name_a", "name_b", "distance")
        .orderBy("brand", "key_a", "key_b")
    )


FUZZY_NAME_PAIRS_SQL = """
SELECT a.p_brand AS brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(LEVENSHTEIN(a.p_name, b.p_name) AS INTEGER) AS distance
FROM part a
JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE LEVENSHTEIN(a.p_name, b.p_name) <= 3
ORDER BY brand, key_a, key_b
"""


def top_terms_per_source(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Most frequent terms per document source (explode → count →
    windowed top-k; deterministic alphabetical tie-break)."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    terms = docs.select(
        "source",
        F.explode(F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")).alias("term"),
    )
    counts = terms.groupBy("source", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("source", "rank")
    )


TOP_TERMS_PER_SOURCE_SQL = r"""
WITH terms AS (
  SELECT source, UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w != '')) AS term
  FROM documents
),
counts AS (
  SELECT source, term, COUNT(*) AS n FROM terms GROUP BY source, term
)
SELECT source, term, n, CAST(rank AS INTEGER) AS rank FROM (
  SELECT source, term, n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, term ASC) AS rank
  FROM counts
)
WHERE rank <= 5
ORDER BY source, rank
"""


def interpolate_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
) -> DataFrame:
    """Per-key linear interpolation of null values between the nearest
    non-null neighbors in ``ts_col`` order; leading/trailing nulls stay
    null (no extrapolation). The sensor/metrics resample primitive.

    Two window passes per key partition (running last-non-null
    backward and first-non-null forward) — one shuffle on the key,
    no self-joins, frames are running (not full-partition
    materialization). Determinism: interpolation arithmetic runs on
    exact integer operands (epoch seconds, integer series values) in
    one fixed double expression, then rounds to the 1e-6 grid, so any
    engine reproduces the doubles bit-for-bit."""
    k, t, v = F.col(key_col), F.col(ts_col), F.col(val_col)
    w_back = (
        Window.partitionBy(k).orderBy(t)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(k).orderBy(t)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ep = F.unix_timestamp(t).cast("double")
    prev_v = F.last(v, ignorenulls=True).over(w_back).cast("double")
    prev_t = F.last(F.when(v.isNotNull(), ep), ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd).cast("double")
    next_t = F.first(F.when(v.isNotNull(), ep), ignorenulls=True).over(w_fwd)
    interp = prev_v + (next_v - prev_v) * (ep - prev_t) / (next_t - prev_t)
    grid = F.floor(interp * 1_000_000 + F.lit(0.5)) / 1_000_000
    filled = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(prev_v.isNull() | next_v.isNull(), F.lit(None).cast("double"))
        .when(next_t == prev_t, prev_v)
        .otherwise(grid)
    )
    return df.withColumn(f"{val_col}_filled", filled)


def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: hourly per-type event-value series (exact micro-unit
    integer sums) with deterministically-punched null holes (every
    3rd bucket by row position), linearly re-interpolated. Exercises
    the dense-spine + interpolation composition end-to-end."""
    events = load_table(spark, "events", sf_dir)
    hourly = (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            F.date_trunc("hour", "ts").alias("bucket"),
            "event_type",
        )
        .agg(
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("v_micro")
        )
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    holed = hourly.withColumn("rn", F.row_number().over(w)).withColumn(
        "v_holed", F.when(F.pmod(F.col("rn"), 3) == 0, F.lit(None)).otherwise(F.col("v_micro"))
    )
    out = interpolate_linear(holed, "event_type", "bucket", "v_holed")
    return out.select(
        "bucket", "event_type", "v_micro", "v_holed", "v_holed_filled"
    ).orderBy("event_type", "bucket")


EVENTS_INTERPOLATE_SQL = """
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS bucket, event_type,
         CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS v_micro
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
holed AS (
  SELECT bucket, event_type, v_micro,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket) % 3 = 0
              THEN NULL ELSE v_micro END AS v_holed
  FROM hourly
),
ctx AS (
  SELECT bucket, event_type, v_micro, v_holed,
    CAST(EPOCH(bucket) AS DOUBLE) AS ep,
    CAST(LAST_VALUE(v_holed IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS prev_v,
    LAST_VALUE(CASE WHEN v_holed IS NOT NULL THEN CAST(EPOCH(bucket) AS DOUBLE) END IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
    CAST(FIRST_VALUE(v_holed IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS next_v,
    FIRST_VALUE(CASE WHEN v_holed IS NOT NULL THEN CAST(EPOCH(bucket) AS DOUBLE) END IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM holed
)
SELECT bucket, event_type, v_micro, v_holed,
  CASE
    WHEN v_holed IS NOT NULL THEN CAST(v_holed AS DOUBLE)
    WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
    WHEN next_t = prev_t THEN prev_v
    ELSE FLOOR((prev_v + (next_v - prev_v) * (ep - prev_t) / (next_t - prev_t)) * 1000000 + 0.5) / 1000000
  END AS v_holed_filled
FROM ctx
ORDER BY event_type, bucket
"""


def ohlc_resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """OHLC bar resampling: per (time bucket, key) open / high / low /
    close / count / sum — the financial-candle / metrics-downsample
    primitive (reference has no analog; beyond-reference time-series
    surface alongside gapfill/interpolate).

    Open/close are the FIRST/LAST value in (ts, tiebreak) order —
    r13: picked with min_by/max_by over the (ts, tiebreak) STRUCT
    (lexicographic struct comparison ≡ the former window's two-column
    sort order; the tiebreak column makes it a total order, so any
    engine picks the same rows). The former shape ran two row_number
    windows before the groupBy — that SHUFFLED every input row, then
    sorted each hash partition; min_by/max_by partial-aggregate, so
    the exchange now carries one partial bar per (bucket, key) per map
    task instead of the full point stream (§2.3 — the 100 TB term).
    Plan note: struct-typed aggregation buffers are not hashable, so
    the aggregate plans as a partial/final SortAggregate pair — a
    map-side sort by the GROUP key remains (measured: still ~2× faster
    locally, because the shuffle and the post-shuffle full-row sort
    are gone).
    """
    base = df.select(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(val_col).alias("_v"),
    )
    okey = F.struct(F.col("_ts"), F.col("_tb"))
    return base.groupBy("bucket", "key").agg(
        F.min_by("_v", okey).alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max_by("_v", okey).alias("close"),
        F.count(F.lit(1)).alias("n_points"),
        F.sum("_v").alias("total"),
    )


def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: hourly OHLC bars of event value per event_type, on the
    exact micro-unit integer grid (value × 1e6 as BIGINT) so every
    column — including the summed volume — compares bit-exact against
    the oracle."""
    events = load_table(spark, "events", sf_dir)
    base = events.filter(F.col("value").isNotNull()).select(
        "ts",
        "event_type",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_micro"),
    )
    out = ohlc_resample(base, "event_type", "ts", "v_micro", "event_id", "hour")
    return out.select(
        "bucket",
        F.col("key").alias("event_type"),
        F.col("open").alias("open_micro"),
        F.col("high").alias("high_micro"),
        F.col("low").alias("low_micro"),
        F.col("close").alias("close_micro"),
        "n_points",
        F.col("total").alias("sum_micro"),
    ).orderBy("bucket", "event_type")


EVENTS_OHLC_HOURLY_SQL = """
WITH base AS (
  SELECT DATE_TRUNC('hour', ts) AS bucket, event_type, ts, event_id,
         CAST(ROUND(value * 1000000) AS BIGINT) AS v_micro
  FROM events
  WHERE value IS NOT NULL
),
marked AS (
  SELECT bucket, event_type, v_micro,
    ROW_NUMBER() OVER (PARTITION BY bucket, event_type ORDER BY ts ASC, event_id ASC) AS rn_a,
    ROW_NUMBER() OVER (PARTITION BY bucket, event_type ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM base
)
SELECT bucket, event_type,
  MAX(CASE WHEN rn_a = 1 THEN v_micro END) AS open_micro,
  MAX(v_micro) AS high_micro,
  MIN(v_micro) AS low_micro,
  MAX(CASE WHEN rn_d = 1 THEN v_micro END) AS close_micro,
  COUNT(*) AS n_points,
  CAST(SUM(v_micro) AS BIGINT) AS sum_micro
FROM marked
GROUP BY bucket, event_type
ORDER BY bucket, event_type
"""


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    alpha: float = 0.5,
    span: int = 16,
) -> DataFrame:
    """Per-key exponentially weighted moving average (adjusted form,
    pandas `ewm(alpha).mean()` semantics truncated to the last `span`
    observations): y_t = Σ_{i<span} w_i·x_{t-i} / Σ w_i with
    w_i = α(1-α)^i over the non-null lags present in the partition.

    Expressed as `span` explicit LAG terms over ONE (key, ts) window —
    a single shuffle, no self-join, no UDF, and a frame that any SQL
    engine reproduces bit-for-bit because the weighted sum is written
    as one fixed left-to-right chain (with α = 0.5 every weight is a
    power of two, so each product is exact in IEEE-754). The truncation
    at `span` is what keeps the expression width constant — the weight
    tail below (1-α)^span is ≤ 2^-16 of the signal, and an unbounded
    recursive form would either need an iterative fixpoint or a full
    running window; neither survives a 100× partition.

    Scale shape (r13, the core-scaling audit): the per-key window
    funnels each key through one task, but the gate feeds it the
    HOURLY pre-aggregation — its input is calendar × key-domain
    bounded (hours × event types), never corpus-sized; the corpus-
    scale work is the hourly groupBy, which partial-aggregates
    map-side. The flat 8-vs-32-core ratio at sf0.1 is the fixed
    plan/scheduling cost of a sub-second query, not a parallelism
    ceiling: the window's input at sf0.1 is ~2k rows. A deployment
    smoothing a HIGH-cardinality key domain (per-user EWMA) gets its
    parallelism from the key count; a long-calendar single-key series
    would need the keyed-prefix chunked layout instead — not this
    gate's shape.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    v = F.col(val_col).cast("double")
    num = None
    den = None
    for i in range(span):
        wt = alpha * (1.0 - alpha) ** i
        term = F.lag(v, i).over(w) if i else v
        t = F.when(term.isNotNull(), term * F.lit(wt)).otherwise(F.lit(0.0))
        d = F.when(term.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = t if num is None else num + t
        den = d if den is None else den + d
    out = F.floor(num / den * 1_000_000 + F.lit(0.5)) / 1_000_000
    return df.withColumn(f"{val_col}_ewma", out)


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: EWMA (α=0.5, span 16) over the hourly per-type event-value
    series — same exact integer-micro series as `events_interpolate`,
    so the smoothing arithmetic is the only floating-point step and it
    rounds to the 1e-6 grid."""
    events = load_table(spark, "events", sf_dir)
    hourly = (
        events.filter(F.col("value").isNotNull())
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("v_micro"))
    )
    out = ewma(hourly, "event_type", "bucket", "v_micro", alpha=0.5, span=16)
    return out.select(
        "bucket", "event_type", "v_micro", F.col("v_micro_ewma").alias("v_ewma")
    ).orderBy("event_type", "bucket")


def _ewma_sql(alpha: float = 0.5, span: int = 16) -> str:
    num = []
    den = []
    for i in range(span):
        wt = repr(alpha * (1.0 - alpha) ** i)
        term = (
            "CAST(v_micro AS DOUBLE)"
            if i == 0
            else f"LAG(CAST(v_micro AS DOUBLE), {i}) OVER w"
        )
        num.append(f"CASE WHEN {term} IS NOT NULL THEN ({term}) * {wt} ELSE 0.0 END")
        den.append(f"CASE WHEN {term} IS NOT NULL THEN {wt} ELSE 0.0 END")
    num_sql = " + ".join(num)
    den_sql = " + ".join(den)
    return f"""
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS bucket, event_type,
         CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS v_micro
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
)
SELECT bucket, event_type, v_micro,
  FLOOR(({num_sql}) / ({den_sql}) * 1000000 + 0.5) / 1000000 AS v_ewma
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
ORDER BY event_type, bucket
"""


EVENTS_EWMA_SQL = _ewma_sql()


def rolling_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Exact trailing-N-day distinct keys per day: (day, n_distinct) —
    the DAU/WAU-style rolling-reach metric.

    A windowed COUNT(DISTINCT) can't partial-aggregate and a per-day
    self-join rescans the fact N× — instead each observed (key, day)
    pair CONTRIBUTES itself to the `window_days` days it is visible
    from: distinct (key, day) first (one map-side-combined shuffle
    that collapses the fact table to active-pairs), then an in-row
    sequence explode (×N on the already-collapsed pairs), then one
    count-distinct per day. Work is O(active_pairs · N), independent
    of raw event count — the formulation that survives 100 TB of
    events, and the exact complement to the mergeable HLL rollup
    (events_hll_rollup) when the answer must be exact.

    Trailing windows only start reporting from the first full window?
    No — early days report the partial window (the standard metric
    definition); day keys are dates, arithmetic is integer day
    sequences, so the oracle is trivially portable."""
    # date_trunc (timestamp), not to_date: DATE round-trips as python
    # objects through pandas while TIMESTAMP stays a typed column on
    # both engines — the repo-wide day-bucket convention.
    pairs = df.select(
        F.col(key_col).alias("k"), F.date_trunc("day", F.col(ts_col)).alias("d")
    ).distinct()
    contrib = pairs.select(
        "k",
        F.explode(
            F.sequence(
                F.col("d"),
                F.col("d") + F.expr(f"interval {window_days - 1} days"),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    # Days beyond the observed range would report phantom partial
    # windows — clip to the true day span (two scalar aggregates).
    bounds = pairs.agg(F.min("d").alias("lo"), F.max("d").alias("hi")).collect()[0]
    return (
        contrib.filter(F.col("day") <= F.lit(bounds["hi"]))
        .groupBy("day")
        .agg(F.count_distinct(F.col("k")).alias("n_distinct"))
    )


def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: exact trailing-7-day distinct users per day (rolling
    weekly reach)."""
    events = load_table(spark, "events", sf_dir)
    return rolling_distinct(events).orderBy("day")


EVENTS_ROLLING_DISTINCT_USERS_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id AS k, DATE_TRUNC('day', ts) AS d FROM events
),
bounds AS (SELECT MAX(d) AS hi FROM pairs),
contrib AS (
  SELECT k, UNNEST(GENERATE_SERIES(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS day
  FROM pairs
)
SELECT day, COUNT(DISTINCT k) AS n_distinct
FROM contrib, bounds
WHERE day <= bounds.hi
GROUP BY day
ORDER BY day
"""


# ───────────────────────── autocorrelation (K39) ─────────────────────────

ACF_LAGS = (1, 2, 3)
ACF_MIN_EVENTS = 8


def per_key_acf(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    lags: tuple[int, ...] = ACF_LAGS,
    min_events: int = ACF_MIN_EVENTS,
) -> DataFrame:
    """Per-key sample autocorrelation of the ordered value series at
    the given lags — the burstiness / periodicity diagnostic that
    decides whether a series needs differencing before the trend and
    anomaly gates (trend.py, robust.py) are trusted.

    r_l = Σ_{t≤n−l}(x_t−μ)(x_{t+l}−μ) / Σ_{t≤n}(x_t−μ)²  with the
    full-series mean μ — the standard (biased-denominator) sample ACF.

    Engine portability (the PSI/zscore playbook, hardened one step
    further): the series is quantized to the exact cent grid
    (ROUND(value·100) — the sums of squares stay inside int64 at any
    realistic per-key history, unlike the 1e-6 grid whose squares
    overflow past ~38 terms), every distributed sum (n, S=Σx, Q=Σx²,
    and per lag P=Σx_t·x_{t+l}, A=Σx_t, B=Σx_{t+l} over the paired
    prefix) is an EXACT integer, and the single floating step is one
    fixed-parenthesization combination of those integers:

        num_l·n² = n²·P_l − n·S·(A_l+B_l) + m_l·S²   (m_l = #pairs)
        den·n²   = n²·Q − n·S²
        r_l      = num_l / den_l

    +,−,×,÷ on doubles are correctly-rounded IEEE, so identical
    operand order ⇒ bit-identical r_l in Spark and DuckDB; the output
    rides the ppm grid (FLOOR(r·1e6 + 0.5)). A constant series has
    den = 0 → NULL (guarded — ANSI mode).

    Scale: one window shuffle on the high-cardinality key (the
    sequence_features spec — leads only, no per-key sort beyond the
    one Exchange), then a partial-aggregable groupBy. No hot-key
    window: keys are users, not enums.
    """
    w = Window.partitionBy("k").orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    xi = F.round(F.col(val_col) * 100).cast("long")
    x = df.filter(F.col(val_col).isNotNull()).select(
        F.col(key_col).alias("k"), F.col(ts_col), F.col(id_col), xi.alias("xi")
    )
    for lag in lags:
        x = x.withColumn(f"x{lag}", F.lead("xi", lag).over(w))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").alias("s"),
        F.sum(F.col("xi") * F.col("xi")).alias("q"),
    ]
    for lag in lags:
        xl = F.col(f"x{lag}")
        aggs += [
            F.sum(F.col("xi") * xl).alias(f"p{lag}"),
            F.sum(F.when(xl.isNotNull(), F.col("xi"))).alias(f"a{lag}"),
            F.sum(xl).alias(f"b{lag}"),
            F.count(xl).alias(f"m{lag}"),
        ]
    g = x.groupBy("k").agg(*aggs).filter(F.col("n") >= min_events)
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    den = (nd * nd) * qd - nd * (sd * sd)
    out_cols = [F.col("k").alias(key_col), F.col("n").cast("long").alias("n")]
    for lag in lags:
        pd_ = F.col(f"p{lag}").cast("double")
        ad = F.col(f"a{lag}").cast("double")
        bd = F.col(f"b{lag}").cast("double")
        md = F.col(f"m{lag}").cast("double")
        num = (nd * nd) * pd_ - (nd * sd) * (ad + bd) + md * (sd * sd)
        r = F.when(den != F.lit(0.0), num / den)
        out_cols.append(
            F.floor(r * F.lit(1_000_000.0) + F.lit(0.5))
            .cast("long")
            .alias(f"acf{lag}_ppm")
        )
    return g.select(*out_cols)


def events_user_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-user lag-1/2/3 autocorrelation of the event value
    series (users with ≥ 8 events), ordered by user."""
    events = load_table(spark, "events", sf_dir)
    return per_key_acf(events).orderBy("user_id")


def _acf_sql(lags: tuple[int, ...] = ACF_LAGS, min_events: int = ACF_MIN_EVENTS) -> str:
    lead_cols = ",\n         ".join(
        f"LEAD(xi, {lag}) OVER w AS x{lag}" for lag in lags
    )
    agg_cols = ",\n         ".join(
        f"CAST(SUM(xi * x{lag}) AS BIGINT) AS p{lag},\n"
        f"         CAST(SUM(CASE WHEN x{lag} IS NOT NULL THEN xi END) AS BIGINT) AS a{lag},\n"
        f"         CAST(SUM(x{lag}) AS BIGINT) AS b{lag},\n"
        f"         CAST(COUNT(x{lag}) AS BIGINT) AS m{lag}"
        for lag in lags
    )
    # identical operand order to the Spark side: (n²·P − (n·S)·(A+B)) + m·S²
    # over (n²·Q − n·S²); every CAST lands on the same exact integer.
    acf_cols = ",\n       ".join(
        f"""CASE WHEN (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * CAST(q AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) <> 0
            THEN CAST(FLOOR((((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * CAST(p{lag} AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) * (CAST(a{lag} AS DOUBLE) + CAST(b{lag} AS DOUBLE)) + CAST(m{lag} AS DOUBLE) * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
            / ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * CAST(q AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))) * 1000000.0 + 0.5) AS BIGINT) END AS acf{lag}_ppm"""
        for lag in lags
    )
    return f"""
WITH x AS (
  SELECT user_id AS k,
         CAST(ROUND(value * 100) AS BIGINT) AS xi,
         {lead_cols}
  FROM events
  WHERE value IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT k,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xi) AS BIGINT) AS s,
         CAST(SUM(xi * xi) AS BIGINT) AS q,
         {agg_cols}
  FROM x
  GROUP BY k
  HAVING COUNT(*) >= {min_events}
)
SELECT k AS user_id, n,
       {acf_cols}
FROM g
ORDER BY user_id
"""


EVENTS_USER_ACF_SQL = _acf_sql()


# ──────────────── cross-series correlation (K40) ────────────────


def type_pair_correlation(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    val_col: str = "value",
) -> DataFrame:
    """Pearson correlation between every PAIR of event types' hourly
    value series — the co-movement matrix that sits beside K39's ACF
    (ACF: one series vs its own past; this: two series at the same
    hour). A missing (hour, type) combination contributes x = 0, so
    every pair is compared over the SAME dense hour spine (a sparse
    join would silently drop exactly the hours where co-movement
    breaks).

    Portability: hourly sums ride the exact cent grid; Σx, Σy, Σxy,
    Σx², Σy² accumulate as DECIMAL(38,0) (hourly sums are data-sized
    — their squares overflow int64 at large SF; decimal sums are
    exact in Spark, HUGEINT in DuckDB), and the only floating step is
    one fixed-parenthesization combination

        r = (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx·Sx) · (n·Syy − Sy·Sy))

    — +,−,×,÷,sqrt are all correctly-rounded IEEE, so identical
    operand order ⇒ bit-identical r; ppm output, zero-variance pairs
    → NULL. Scale shape: the spine is (distinct hours × type
    vocabulary) — a bounded cross join by construction; the pair
    table is hours × C(T,2); the final aggregation is one partial-agg
    groupBy on the pair key.
    """
    cents = F.round(F.col(val_col) * 100).cast("long")
    hs = (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("h"),
            F.col(type_col).alias("t"),
        )
        .agg(F.sum(cents).alias("x"))
    )
    # The ONLY corpus-sized work is the aggregate above, but four
    # consumers read it (hour spine, type spine, and both pair legs)
    # — unmaterialized, the corpus agg re-runs per consumer (explain
    # showed 24 Exchanges; the r8 multi-consumer-recompute lesson).
    # Its output is (hours × types)-sized — a bounded artifact — so an
    # eager checkpoint collapses the plan to ONE corpus pass.
    hs = hs.localCheckpoint(eager=True)
    hours = hs.select("h").distinct()
    types = hs.select("t").distinct()
    spine = hours.crossJoin(F.broadcast(types))
    dense = spine.join(hs, ["h", "t"], "left").select(
        "h", "t", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    a = dense.select("h", F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = dense.select("h", F.col("t").alias("tb"), F.col("x").alias("xb"))
    pairs = a.join(b, "h").filter(F.col("ta") < F.col("tb"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = pairs.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("xa"))).alias("sx"),
        F.sum(dec(F.col("xb"))).alias("sy"),
        F.sum(dec(F.col("xa")) * dec(F.col("xb"))).alias("sxy"),
        F.sum(dec(F.col("xa")) * dec(F.col("xa"))).alias("sxx"),
        F.sum(dec(F.col("xb")) * dec(F.col("xb"))).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    r = F.when((vx > 0) & (vy > 0), (nd * sxy - sx * sy) / F.sqrt(vx * vy))
    return g.select(
        "ta",
        "tb",
        F.col("n").cast("long").alias("n_hours"),
        F.floor(r * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias("corr_ppm"),
    ).orderBy("ta", "tb")


def events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the hourly co-movement matrix of the five event types."""
    events = load_table(spark, "events", sf_dir)
    return type_pair_correlation(events)


EVENTS_TYPE_CORRELATION_SQL = """
WITH hs AS (
  SELECT DATE_TRUNC('hour', ts) AS h, event_type AS t,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
spine AS (
  SELECT h, t FROM (SELECT DISTINCT h FROM hs), (SELECT DISTINCT t FROM hs)
),
dense AS (
  SELECT s.h, s.t, COALESCE(hs.x, 0) AS x
  FROM spine s LEFT JOIN hs ON hs.h = s.h AND hs.t = s.t
),
pairs AS (
  SELECT a.h, a.t AS ta, b.t AS tb, a.x AS xa, b.x AS xb
  FROM dense a JOIN dense b ON a.h = b.h AND a.t < b.t
),
g AS (
  SELECT ta, tb,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(xa AS HUGEINT)) AS sx,
         SUM(CAST(xb AS HUGEINT)) AS sy,
         SUM(CAST(xa AS HUGEINT) * xb) AS sxy,
         SUM(CAST(xa AS HUGEINT) * xa) AS sxx,
         SUM(CAST(xb AS HUGEINT) * xb) AS syy
  FROM pairs
  GROUP BY ta, tb
)
SELECT ta, tb, n AS n_hours,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
             AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN CAST(FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS corr_ppm
FROM g
ORDER BY ta, tb
"""


# ─────────────── K53: business-day latency ───────────────


def _weekdays_before(days_col):
    """Number of WEEKDAYS in [Monday origin, origin + days_col):
    closed-form (x div 7)·5 + least(x mod 7, 5) — pure integer
    arithmetic, identical in both engines for non-negative x."""
    return F.floor(days_col / 7).cast("long") * 5 + F.least(days_col % 7, F.lit(5))


def business_day_latency(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Mean BUSINESS-day (Mon–Fri) latency from order date to first
    shipment, per order priority — the SLA metric a calendar-day mean
    overstates by ~2/7: weekends don't count against fulfilment.

    Exact closed form, no calendar table and no per-day explode: with
    x = days since the Monday 1970-01-05, the weekday count before x
    is (x div 7)·5 + min(x mod 7, 5), so the business days between
    order and ship is one subtraction of two integer expressions —
    engine-identical (TPC-H dates are all ≥ 1992, x stays positive).
    Per-order first ship is a map-side-combined min; the mean rides
    the exact integral-division micro grid.

    Scale shape: one lineitem groupBy(orderkey) min, one equi-join to
    orders (AQE picks the strategy), one ≤priorities-sized agg."""
    first_ship = lineitem.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    monday = F.lit("1970-01-05").cast("date")
    j = orders.join(
        first_ship, orders.o_orderkey == first_ship.l_orderkey
    ).select(
        "o_orderpriority",
        F.datediff(F.col("o_orderdate"), monday).alias("xa"),
        F.datediff(F.col("first_ship"), monday).alias("xb"),
    )
    bdays = _weekdays_before(F.col("xb")) - _weekdays_before(F.col("xa"))
    g = (
        j.withColumn("bdays", bdays)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("bdays").cast("decimal(38,0)")).alias("s"),
        )
    )
    return g.select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("s").cast("long").alias("business_days_total"),
        F.expr(
            "(s * cast(1000000 as decimal(38,0)))"
            " div cast(n_orders as decimal(38,0))"
        )
        .cast("long")
        .alias("mean_business_days_micro"),
    ).orderBy("o_orderpriority")


def orders_business_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: mean business-day order→first-ship latency per priority."""
    from ..sources.catalog import load_table

    return business_day_latency(
        load_table(spark, "orders", sf_dir), load_table(spark, "lineitem", sf_dir)
    )


ORDERS_BUSINESS_LATENCY_SQL = """
WITH first_ship AS (
  SELECT l_orderkey, MIN(l_shipdate) AS first_ship FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderpriority,
         DATE_DIFF('day', DATE '1970-01-05', CAST(o.o_orderdate AS DATE)) AS xa,
         DATE_DIFF('day', DATE '1970-01-05', CAST(f.first_ship AS DATE)) AS xb
  FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey
),
g AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(((xb // 7) * 5 + LEAST(xb % 7, 5))
                - ((xa // 7) * 5 + LEAST(xa % 7, 5))) AS HUGEINT) AS s
  FROM j
  GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       n_orders,
       CAST(s AS BIGINT) AS business_days_total,
       CAST((s * 1000000) // n_orders AS BIGINT) AS mean_business_days_micro
FROM g
ORDER BY o_orderpriority
"""


# ─────────────── K60: lagged cross-correlation ───────────────

CCF_MAX_LAG = 3


def cross_correlation(
    df: DataFrame,
    type_a: str,
    type_b: str,
    max_lag: int = CCF_MAX_LAG,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Lead/lag cross-correlation between two event types' hourly
    count series: corr(count_a[t], count_b[t+lag]) for lag 0..max_lag
    — the "does A lead B?" question K40's same-hour matrix cannot
    answer (a 2-hour view→purchase lag shows ZERO same-hour
    correlation and a spike at lag 2).

    Same conventions as K40: dense 0-filled hour spine (sparse joins
    drop exactly the hours where co-movement breaks), exact integer
    counts, decimal(38,0) sufficient statistics, ONE fixed IEEE
    combination per lag, ppm grid, zero-variance → NULL. The lag join
    is per-lag hour-shifted equi (union of max_lag+1 legs over the
    checkpointed hours×2 series table — bounded, never corpus work)."""
    hs = (
        df.filter(F.col(type_col).isin(type_a, type_b))
        .groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("h"),
            F.col(type_col).alias("t"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    ).localCheckpoint(eager=True)
    hours = hs.select("h").distinct()
    dense = lambda t: hours.join(  # noqa: E731
        hs.filter(F.col("t") == t).select("h", "x"), "h", "left"
    ).select("h", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
    a = dense(type_a).select("h", F.col("x").alias("xa"))
    b = dense(type_b)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    legs = None
    for lag in range(max_lag + 1):
        shifted = b.select(
            (F.col("h") - F.expr(f"INTERVAL {lag} HOURS")).alias("h"),
            F.col("x").alias("xb"),
        )
        leg = a.join(shifted, "h").select(
            F.lit(lag).alias("lag"), "xa", "xb"
        )
        legs = leg if legs is None else legs.unionByName(leg)
    g = legs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("xa"))).alias("sx"),
        F.sum(dec(F.col("xb"))).alias("sy"),
        F.sum(dec(F.col("xa")) * dec(F.col("xb"))).alias("sxy"),
        F.sum(dec(F.col("xa")) * dec(F.col("xa"))).alias("sxx"),
        F.sum(dec(F.col("xb")) * dec(F.col("xb"))).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    r = F.when((vx > 0) & (vy > 0), (nd * sxy - sx * sy) / F.sqrt(vx * vy))
    return g.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_hours"),
        F.floor(r * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias("corr_ppm"),
    ).orderBy("lag")


def events_view_purchase_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: does viewing LEAD purchasing? Hourly view→purchase
    cross-correlation at lags 0–3."""
    events = load_table(spark, "events", sf_dir)
    return cross_correlation(events, "view", "purchase")


EVENTS_VIEW_PURCHASE_CCF_SQL = f"""
WITH hs AS (
  SELECT DATE_TRUNC('hour', ts) AS h, event_type AS t, CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY 1, 2
),
hours AS (SELECT DISTINCT h FROM hs),
da AS (
  SELECT hours.h, COALESCE(hs.x, 0) AS xa
  FROM hours LEFT JOIN hs ON hs.h = hours.h AND hs.t = 'view'
),
db AS (
  SELECT hours.h, COALESCE(hs.x, 0) AS xb
  FROM hours LEFT JOIN hs ON hs.h = hours.h AND hs.t = 'purchase'
),
lags(lag) AS (VALUES (0), (1), (2), (3)),
legs AS (
  SELECT l.lag, a.xa, b.xb
  FROM lags l
  JOIN da a ON TRUE
  JOIN db b ON b.h = a.h + l.lag * INTERVAL 1 HOUR
),
g AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(xa AS HUGEINT)) AS sx, SUM(CAST(xb AS HUGEINT)) AS sy,
         SUM(CAST(xa AS HUGEINT) * xb) AS sxy,
         SUM(CAST(xa AS HUGEINT) * xa) AS sxx,
         SUM(CAST(xb AS HUGEINT) * xb) AS syy
  FROM legs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n AS n_hours,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
             AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN CAST(FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS corr_ppm
FROM g
ORDER BY lag
"""


# ───────────────────── repurchase cadence (inter-order gaps) ─────────────────────

#: Exact percentiles surfaced by the cadence gate.
CADENCE_QS = (25, 50, 75, 90)


def repurchase_cadence(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-segment repurchase cadence: exact quantiles of the gaps (in
    days) between a customer's consecutive orders — the
    inter-purchase-time read a replenishment/CRM calendar is built on
    (A10's Kaplan–Meier asks IF customers come back; this asks HOW
    OFTEN while they do).

    Spark-first shape: consecutive gaps from ONE lag window over the
    high-cardinality customer key (parallel at any scale), then the
    quantiles run entirely on the (segment × distinct-gap) VALUE
    DOMAIN — per-(segment, gap) counts through the `_keyed_prefix`
    two-pass layout (segments are low-cardinality: a plain per-segment
    window would one-task each segment's history), and percentile q is
    the smallest gap whose cumulative count clears q% of the segment
    total (exact integer cross-multiplication cum·100 ≥ t·q, no float
    interpolation — both engines agree bit-for-bit).

    Gaps are date-subtraction integers; the only division is the
    exact integral mean (Σ gap·count · 10⁶ div t)."""
    from .quality_audit import _keyed_prefix

    dec = "decimal(38,0)"
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            F.lag("o_orderdate").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .select("o_custkey", F.datediff("o_orderdate", "prev").alias("gap"))
    )
    seg = gaps.join(
        customer.select(F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment")),
        "o_custkey",
    ).select(F.col("c_mktsegment").alias("key"), "gap")
    cnt = seg.groupBy("key", "gap").agg(F.count(F.lit(1)).alias("c"))
    pre = _keyed_prefix(cnt, ["gap"], "c")
    qs = [
        F.min(F.when(F.col("cum") * 100 >= F.col("t") * q, F.col("gap")))
        .cast("long")
        .alias(f"p{q}_days")
        for q in CADENCE_QS
    ]
    means = cnt.groupBy("key").agg(
        F.sum(F.col("gap").cast(dec) * F.col("c").cast(dec)).alias("gs")
    )
    out = (
        pre.groupBy("key")
        .agg(F.max("t").cast("long").alias("n_gaps"), *qs)
        .join(means, "key")
    )
    return out.select(
        F.col("key").alias("segment"),
        "n_gaps",
        *[f"p{q}_days" for q in CADENCE_QS],
        F.expr("cast((gs * 1000000) div cast(n_gaps as decimal(38,0)) as long)").alias(
            "mean_days_micro"
        ),
    ).orderBy("segment")


def customer_repurchase_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: inter-order gap quantiles per market segment."""
    return repurchase_cadence(
        load_table(spark, "orders", sf_dir), load_table(spark, "customer", sf_dir)
    )


CUSTOMER_REPURCHASE_CADENCE_SQL = """
WITH lagged AS (
  SELECT o_custkey, o_orderdate,
         LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
),
gaps AS (
  SELECT c_mktsegment AS seg, datediff('day', prev, o_orderdate) AS gap
  FROM lagged JOIN customer ON c_custkey = o_custkey
  WHERE prev IS NOT NULL
),
cnt AS (SELECT seg, gap, CAST(COUNT(*) AS BIGINT) AS c FROM gaps GROUP BY 1, 2),
laid AS (
  SELECT seg, gap, c,
         SUM(c) OVER (PARTITION BY seg ORDER BY gap) AS cum,
         SUM(c) OVER (PARTITION BY seg) AS t,
         SUM(CAST(gap AS HUGEINT) * c) OVER (PARTITION BY seg) AS gs
  FROM cnt
)
SELECT seg AS segment,
       CAST(MAX(t) AS BIGINT) AS n_gaps,
       CAST(MIN(CASE WHEN cum * 100 >= t * 25 THEN gap END) AS BIGINT) AS p25_days,
       CAST(MIN(CASE WHEN cum * 100 >= t * 50 THEN gap END) AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN cum * 100 >= t * 75 THEN gap END) AS BIGINT) AS p75_days,
       CAST(MIN(CASE WHEN cum * 100 >= t * 90 THEN gap END) AS BIGINT) AS p90_days,
       CAST(MAX(gs) * 1000000 // MAX(t) AS BIGINT) AS mean_days_micro
FROM laid
GROUP BY seg
ORDER BY seg
"""


# ─────────────── K66: MASE forecast-accuracy scale ───────────────

MASE_SEASON = 24  # hours (daily cycle)


def mase_hourly(events: DataFrame, season: int = MASE_SEASON) -> DataFrame:
    """MASE of the seasonal-naive forecast on the hourly value series
    (Hyndman & Koehler 2006) — the scale-free forecast-accuracy
    number every demand/traffic model is benchmarked against:
    MASE = MAE(seasonal-naive, lag s) / MAE(one-step naive, lag 1).
    MASE < 1e6 ppm ⇒ the daily cycle carries real signal beyond plain
    persistence.

    Series: dense hourly spine from min to max event hour (missing
    hours are true zeros — no events means zero value), value sums on
    the exact cent grid. Errors are exact integer |Δcents|; the ratio
    lands once as mase_ppm = (Σ|e_s|·n₁·10⁶) div (Σ|e₁|·n_s) with
    each mean's count carried explicitly (the two lags drop different
    numbers of leading hours).

    Scale: one map-side-combined hourly aggregation; the spine,
    lags and folds live on the calendar-bounded hour table."""
    from pyspark.sql import Window

    hourly = events.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.sum(F.expr("cast(round(value * 100) as long)")).alias("cents")
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    dense = spine.join(hourly, "h", "left").select(
        "h", F.coalesce(F.col("cents"), F.lit(0)).alias("cents")
    )
    w = Window.orderBy("h")
    lagged = dense.select(
        "cents",
        F.lag("cents", season).over(w).alias("lag_s"),
        F.lag("cents", 1).over(w).alias("lag_1"),
    )
    agg = lagged.agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.count("lag_s").alias("n_s"),
        F.sum(F.abs(F.col("cents") - F.col("lag_s"))).alias("sae_s"),
        F.count("lag_1").alias("n_1"),
        F.sum(F.abs(F.col("cents") - F.col("lag_1"))).alias("sae_1"),
    )
    return agg.select(
        F.col("n_hours").cast("long").alias("n_hours"),
        F.col("n_s").cast("long").alias("n_seasonal"),
        F.col("sae_s").cast("long").alias("sae_seasonal_cents"),
        F.col("n_1").cast("long").alias("n_naive"),
        F.col("sae_1").cast("long").alias("sae_naive_cents"),
        F.when(
            (F.col("sae_1") > 0) & (F.col("n_s") > 0),
            F.expr(
                "cast(sae_s as decimal(38,0)) * cast(n_1 as decimal(38,0)) * 1000000"
                " div (cast(sae_1 as decimal(38,0)) * cast(n_s as decimal(38,0)))"
            ),
        ).cast("long").alias("mase_ppm"),
    )


def events_value_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (K66): MASE of the daily-seasonal-naive forecast of hourly
    event value — does the 24-hour cycle beat persistence?"""
    events = load_table(spark, "events", sf_dir)
    return mase_hourly(events.filter(F.col("value").isNotNull()))


EVENTS_VALUE_MASE_SQL = f"""
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS h,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM hourly),
spine AS (
  SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
dense AS (
  SELECT s.h, COALESCE(x.cents, 0) AS cents
  FROM spine s LEFT JOIN hourly x ON x.h = s.h
),
lagged AS (
  SELECT cents,
         LAG(cents, {MASE_SEASON}) OVER (ORDER BY h) AS lag_s,
         LAG(cents, 1) OVER (ORDER BY h) AS lag_1
  FROM dense
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(COUNT(lag_s) AS BIGINT) AS n_seasonal,
       CAST(COALESCE(SUM(ABS(cents - lag_s)), 0) AS BIGINT) AS sae_seasonal_cents,
       CAST(COUNT(lag_1) AS BIGINT) AS n_naive,
       CAST(COALESCE(SUM(ABS(cents - lag_1)), 0) AS BIGINT) AS sae_naive_cents,
       CASE WHEN COALESCE(SUM(ABS(cents - lag_1)), 0) > 0 AND COUNT(lag_s) > 0
            THEN CAST(CAST(SUM(ABS(cents - lag_s)) AS HUGEINT) * COUNT(lag_1) * 1000000
                      // (CAST(SUM(ABS(cents - lag_1)) AS HUGEINT) * COUNT(lag_s)) AS BIGINT)
       END AS mase_ppm
FROM lagged
"""


# ─────────────── A17: dwell time per event transition ───────────────


def dwell_transitions(events: DataFrame) -> DataFrame:
    """A17: per-transition dwell-time summary — for every consecutive
    event pair within a user's (ts, event_id)-ordered stream, the gap
    in microseconds, aggregated per (from_type, to_type): n, min, max
    and the DOUBLED exact median (the repo's integer-median
    convention). The behavioral-latency companion of K23's transition
    PROBABILITIES: K23 says "view → click happens 30% of the time",
    this says "and takes a median of 90 seconds" — the pair a
    session-timeout or recommendation-latency budget is tuned from.

    Determinism: the per-user order carries the (ts, event_id) total
    order (A11's convention), so tied timestamps produce identical
    transition pairs in both engines. Scale: one user-partitioned lag
    window (high-cardinality, parallelizes), ONE (transition, gap)
    map-side-combined aggregation, then the K63 pattern — the
    `_keyed_prefix` two-pass layout over the collapsed gap table with
    both middle order statistics read off the cumulative counts by
    exact integer cross-multiplication (2·cum ≥ t+1 / t+2). The first
    cut of this op ran the histogram-narrowing grouped median instead:
    correct, but its per-task WHEN array (25 transitions × 2 ranks)
    costs 50 struct evaluations per row per pass — measured 234 s at
    sf10 vs 20 s for this plan on identical output."""
    from .quality_audit import _keyed_prefix

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("from_type", F.lag("event_type").over(w))
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("from_type").isNotNull())
        .select(
            "from_type",
            F.col("event_type").alias("to_type"),
            (F.unix_micros("ts") - F.unix_micros("prev_ts")).alias("d_us"),
        )
    )
    cnt = gaps.groupBy("from_type", "to_type", "d_us").agg(
        F.count(F.lit(1)).alias("c")
    ).withColumn("key", F.concat_ws("|", "from_type", "to_type"))
    pre = _keyed_prefix(cnt, ["d_us"], "c")
    r_lo = F.expr("(t + 1) div 2")  # lower-middle rank (exact integer)
    r_hi = F.expr("(t + 2) div 2")  # upper-middle rank (== r_lo when t odd)
    return (
        pre.groupBy("key")
        .agg(
            F.first("from_type").alias("from_type"),
            F.first("to_type").alias("to_type"),
            F.max("t").cast("long").alias("n"),
            F.min("d_us").cast("long").alias("min_us"),
            F.max("d_us").cast("long").alias("max_us"),
            (
                F.min(F.when(F.col("cum") >= r_lo, F.col("d_us")))
                + F.min(F.when(F.col("cum") >= r_hi, F.col("d_us")))
            )
            .cast("long")
            .alias("median2_us"),
        )
        .select("from_type", "to_type", "n", "min_us", "max_us", "median2_us")
        .orderBy("from_type", "to_type")
    )


def events_dwell_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (A17): dwell-time summary of every event-type transition."""
    return dwell_transitions(load_table(spark, "events", sf_dir))


EVENTS_DWELL_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type, ts,
         LAG(event_type) OVER w AS from_type,
         LAG(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
d AS (
  SELECT from_type, event_type AS to_type,
         EPOCH_US(ts) - EPOCH_US(prev_ts) AS d_us
  FROM seq WHERE from_type IS NOT NULL
)
SELECT from_type, to_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(d_us) AS BIGINT) AS min_us,
       CAST(MAX(d_us) AS BIGINT) AS max_us,
       CAST(2 * QUANTILE_CONT(d_us, 0.5) AS BIGINT) AS median2_us
FROM d
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ─────────────── K68: seasonal strength decomposition ───────────────

SEASONAL_HALF_WINDOW = 12  # centered 25-hour moving-average trend


def seasonal_strength_hourly(events: DataFrame) -> DataFrame:
    """K68: seasonal-strength decomposition of the hourly value series
    (the STL-strength read, Wang/Smith/Hyndman 2006): detrend with a
    centered 25-hour moving average, take the hour-of-day means as the
    seasonal component, and report
    F_seasonal = max(0, 1 − Var(remainder)/Var(detrended)) — "how much
    of the non-trend variation is the daily cycle". K66's MASE says a
    seasonal-naive FORECAST beats persistence; this says how much of
    the variance the season explains, plus WHERE the cycle peaks.

    Exact-integer construction: the dense hourly spine and cent sums
    are K66's; detrended d = 25·cents − Σ±12 cents (multiplied
    through, so the trend subtraction never divides); d is SHIFTED by
    the global min (one broadcast 1-row scalar — the q22 shape) so
    every later floor division runs on non-negatives, where Spark
    `div` and DuckDB `//` agree (variance is shift-invariant, so the
    strength is unchanged); hour-of-day means land once, floored
    on the d grid itself (s_grid = Σd_shift div n_hod — one grid unit
    is 1/25 of a cent of hourly sum, so the quantization is far below
    any real seasonal signal, and both engines floor identically on
    the non-negative shifted values); variances use the n·Σx² − (Σx)²
    integer form on decimal(38,0) — an earlier cut scaled d by 10⁶
    before squaring and overflowed the 38-digit grid at sf1.
    Edges without a full 25-hour window are excluded (n_core).

    Scale: one map-side-combined hourly aggregation; every window and
    mean lives on the calendar-bounded spine."""
    hourly = events.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.sum(F.expr("cast(round(value * 100) as long)")).alias("cents")
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    dense = spine.join(hourly, "h", "left").select(
        "h", F.coalesce(F.col("cents"), F.lit(0)).alias("cents")
    )
    from pyspark.sql import Window

    hw = SEASONAL_HALF_WINDOW
    span = 2 * hw + 1
    w = Window.orderBy("h").rowsBetween(-hw, hw)
    dec = "decimal(38,0)"
    n_hours = dense.count()
    core = (
        dense.withColumn("s25", F.sum("cents").over(w))
        .withColumn("c25", F.count(F.lit(1)).over(w))
        .filter(F.col("c25") == span)
        .select(
            F.hour("h").alias("hod"),
            (F.lit(span).cast(dec) * F.col("cents").cast(dec) - F.col("s25").cast(dec)).alias("d"),
        )
    )
    dmin = core.agg(F.min("d").alias("dmin"))
    shifted = core.crossJoin(F.broadcast(dmin)).select(
        "hod", (F.col("d") - F.col("dmin")).alias("dm")
    ).persist()
    hod_means = shifted.groupBy("hod").agg(
        F.expr("cast(sum(dm) div cast(count(1) as decimal(38,0)) as decimal(38,0))").alias("s_grid")
    )
    joined = shifted.join(F.broadcast(hod_means), "hod").select(
        "dm", (F.col("dm") - F.col("s_grid")).alias("r")
    )
    g = joined.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("dm").alias("sd"),
        F.sum(F.expr("dm * dm")).alias("sdd"),
        F.sum("r").alias("sr"),
        F.sum(F.expr("r * r")).alias("srr"),
    )
    peak = hod_means.orderBy(F.col("s_grid").desc(), F.col("hod").asc()).limit(1)
    out = g.crossJoin(F.broadcast(peak)).select(
        F.lit(n_hours).cast("long").alias("n_hours"),
        F.col("n").cast("long").alias("n_core"),
        F.when(
            F.expr("n * sdd - sd * sd") > 0,
            F.expr(
                "greatest((n * sdd - sd * sd) - (n * srr - sr * sr), cast(0 as decimal(38,0)))"
                " * 1000000 div (n * sdd - sd * sd)"
            ),
        )
        .cast("long")
        .alias("seasonal_strength_ppm"),
        F.col("hod").cast("int").alias("peak_hour"),
    )
    shifted.unpersist()
    return out


def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (K68): seasonal strength + peak hour of the hourly value
    series."""
    events = load_table(spark, "events", sf_dir)
    return seasonal_strength_hourly(events.filter(F.col("value").isNotNull()))


EVENTS_SEASONAL_STRENGTH_SQL = f"""
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS h,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM hourly),
spine AS (
  SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
dense AS (
  SELECT s.h, COALESCE(hourly.cents, 0) AS cents
  FROM spine s LEFT JOIN hourly ON hourly.h = s.h
),
win AS (
  SELECT h, cents,
         SUM(cents) OVER w AS s25, COUNT(*) OVER w AS c25
  FROM dense
  WINDOW w AS (ORDER BY h ROWS BETWEEN {SEASONAL_HALF_WINDOW} PRECEDING
               AND {SEASONAL_HALF_WINDOW} FOLLOWING)
),
core AS (
  SELECT EXTRACT(HOUR FROM h) AS hod,
         CAST({2 * SEASONAL_HALF_WINDOW + 1} AS HUGEINT) * cents - CAST(s25 AS HUGEINT) AS d
  FROM win WHERE c25 = {2 * SEASONAL_HALF_WINDOW + 1}
),
shifted AS (
  SELECT hod, d - (SELECT MIN(d) FROM core) AS dm FROM core
),
hod_means AS (
  SELECT hod, SUM(dm) // COUNT(*) AS s_grid FROM shifted GROUP BY hod
),
joined AS (
  SELECT dm, dm - s_grid AS r FROM shifted JOIN hod_means USING (hod)
),
g AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(dm) AS sd, SUM(dm * dm) AS sdd,
         SUM(r) AS sr, SUM(r * r) AS srr
  FROM joined
),
peak AS (
  SELECT hod FROM hod_means ORDER BY s_grid DESC, hod ASC LIMIT 1
)
SELECT CAST((SELECT COUNT(*) FROM dense) AS BIGINT) AS n_hours,
       CAST(n AS BIGINT) AS n_core,
       CASE WHEN n * sdd - sd * sd > 0
            THEN CAST(GREATEST((n * sdd - sd * sd) - (n * srr - sr * sr), 0)
                      * 1000000 // (n * sdd - sd * sd) AS BIGINT)
       END AS seasonal_strength_ppm,
       CAST((SELECT hod FROM peak) AS INTEGER) AS peak_hour
FROM g
"""
