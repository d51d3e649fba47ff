"""Approximate/sketch aggregates and time-hierarchy rollups.

- ``events_approx_stats``: HyperLogLog++ distinct counts and
  approximate percentiles — the O(1)-memory summaries used instead of
  exact distincts at 100 TB. Rows-only gate (sketch internals are
  engine-specific); accuracy is asserted against exact values in
  pytest.
- ``events_hypertable_rollup``: continuous-aggregate-style rollup at
  multiple granularities (hour + day) in ONE grouping-sets pass over
  the fact table, instead of one scan per granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table


def approx_stats(events: DataFrame) -> DataFrame:
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("value_pcts"),
        F.count(F.lit(1)).alias("n"),
    )


def events_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-bound gate, fully oracle-backed.

    The sketch values themselves (HLL++ distinct, KLL-style quantiles)
    are engine-internal, so instead of hashing them the gate emits the
    EXACT distinct count plus booleans asserting each sketch landed
    inside its published error bound; the oracle replays the exact
    side and expects every bound check TRUE. A Spark upgrade that
    breaks a sketch's guarantee flips a boolean and fails the hash.

    Bounds checked:
    - ``approx_count_distinct(rsd=0.02)``: |approx − exact| ≤ 3·rsd·exact
      (three standard errors; HLL++ is deterministic, no flakiness).
    - ``percentile_approx(accuracy=10000)``: the returned value's exact
      rank interval [#{v<x}+1, #{v≤x}] must lie within n/accuracy + 1
      of the target rank p·(n−1)+1 (the Greenwald-Khanna guarantee
      plus one grid step of slack).
    """
    events = load_table(spark, "events", sf_dir).select("event_type", "user_id", "value")
    apx = approx_stats(events).select(
        "event_type",
        "approx_users",
        F.col("value_pcts")[0].alias("apx_p50"),
        F.col("value_pcts")[1].alias("apx_p95"),
        F.col("value_pcts")[2].alias("apx_p99"),
    )
    exact_users = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("n"),
    )
    # Exact rank interval of each approx percentile value, from one
    # extra pass over the fact table (apx is 1 row per event type —
    # broadcast by AQE/size).
    vals = events.filter(F.col("value").isNotNull())
    joined = vals.join(F.broadcast(apx), "event_type")
    ranks = joined.groupBy("event_type").agg(
        *[
            agg
            for p in (50, 95, 99)
            for agg in (
                F.sum(
                    (F.col("value") < F.col(f"apx_p{p}")).cast("long")
                ).alias(f"lt_{p}"),
                F.sum(
                    (F.col("value") <= F.col(f"apx_p{p}")).cast("long")
                ).alias(f"le_{p}"),
                F.count(F.lit(1)).alias(f"nv_{p}"),
            )
        ]
    )

    def pct_ok(p: int):
        # target rank on the discrete (n-1)-grid; slack = rank error
        # bound n/accuracy plus one grid step.
        target = (F.col(f"nv_{p}") - F.lit(1)) * F.lit(p) / F.lit(100) + F.lit(1)
        bound = F.col(f"nv_{p}") / F.lit(10000) + F.lit(1.0)
        lo = F.col(f"lt_{p}") + F.lit(1)
        hi = F.col(f"le_{p}")
        return ~((hi < target - bound) | (lo > target + bound))

    out = (
        exact_users.join(F.broadcast(apx), "event_type")
        .join(F.broadcast(ranks), "event_type")
        .select(
            "event_type",
            "distinct_users",
            "n",
            (
                F.abs(F.col("approx_users") - F.col("distinct_users"))
                <= F.lit(3 * 0.02) * F.col("distinct_users")
            ).alias("hll_users_ok"),
            pct_ok(50).alias("p50_ok"),
            pct_ok(95).alias("p95_ok"),
            pct_ok(99).alias("p99_ok"),
        )
    )
    return out.orderBy("event_type")


# Oracle for events_approx_stats: the exact side is replayed; each
# bound check is expected TRUE (the sketches' published guarantees).
EVENTS_APPROX_STATS_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS distinct_users,
       COUNT(*) AS n,
       TRUE AS hll_users_ok,
       TRUE AS p50_ok,
       TRUE AS p95_ok,
       TRUE AS p99_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact counterpart of ``events_approx_stats``, and the external
    gate for it: exact distinct users plus DISCRETE p50/p95/p99
    (the value at sorted position floor((n-1)*p)+1 — an actual data
    point, no interpolation arithmetic, hence bit-identical across
    engines). The HLL/KLL sketch version stays the 100 TB fast path;
    pytest asserts its accuracy against this exact one."""
    from pyspark.sql import Window

    events = load_table(spark, "events", sf_dir).select("event_type", "user_id", "value")
    vals = events.filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value")
    wcnt = Window.partitionBy("event_type")
    ranked = vals.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(wcnt)
    )

    def pick(pct_int: int):
        # Integer arithmetic only: (cnt-1)*0.95 in DOUBLE can land an
        # ulp below an integer while DECIMAL math (DuckDB) hits it
        # exactly — floor would then disagree by 1. (n-1)*p//100 can't.
        idx = F.expr(f"((cnt - 1) * {pct_int}) div 100 + 1")
        return F.max(F.when(F.col("rn") == idx, F.col("value")))

    pct = ranked.groupBy("event_type").agg(
        pick(50).alias("p50"),
        pick(95).alias("p95"),
        pick(99).alias("p99"),
        F.max("cnt").alias("n"),
    )
    users = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users")
    )
    return (
        pct.join(users, "event_type")
        .select("event_type", "distinct_users", "p50", "p95", "p99", "n")
        .orderBy("event_type")
    )


EVENTS_EXACT_STATS_SQL = """
WITH vals AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM vals
),
pct AS (
  SELECT event_type,
         MAX(CASE WHEN rn = ((cnt - 1) * 50) // 100 + 1 THEN value END) AS p50,
         MAX(CASE WHEN rn = ((cnt - 1) * 95) // 100 + 1 THEN value END) AS p95,
         MAX(CASE WHEN rn = ((cnt - 1) * 99) // 100 + 1 THEN value END) AS p99,
         MAX(cnt) AS n
  FROM ranked GROUP BY event_type
),
u AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users
  FROM events GROUP BY event_type
)
SELECT p.event_type, u.distinct_users, p.p50, p.p95, p.p99, p.n
FROM pct p JOIN u ON p.event_type = u.event_type
ORDER BY p.event_type
"""


def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(granularity, bucket, event_type) → count/sum at hour AND day
    resolution from one scan (grouping sets)."""
    events = load_table(spark, "events", sf_dir)
    bucketed = events.select(
        F.date_trunc("hour", "ts").alias("bucket_hour"),
        F.date_trunc("day", "ts").alias("bucket_day"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("value"),
    )
    gs = bucketed.groupingSets(
        [["bucket_hour", "event_type"], ["bucket_day", "event_type"]],
        "bucket_hour",
        "bucket_day",
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).cast("double").alias("value_sum"),
    )
    return gs.select(
        F.when(F.col("bucket_hour").isNotNull(), F.lit("hour")).otherwise(F.lit("day")).alias("granularity"),
        F.coalesce("bucket_hour", "bucket_day").alias("bucket"),
        "event_type",
        "n_events",
        "value_sum",
    ).orderBy("granularity", "bucket", "event_type")


EVENTS_HYPERTABLE_ROLLUP_SQL = """
WITH b AS (
  SELECT DATE_TRUNC('hour', ts) AS bucket_hour,
         DATE_TRUNC('day', ts) AS bucket_day,
         event_type,
         CAST(value AS DECIMAL(18,6)) AS value
  FROM events
)
SELECT 'hour' AS granularity, bucket_hour AS bucket, event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(value), 4) AS DOUBLE) AS value_sum
FROM b GROUP BY bucket_hour, event_type
UNION ALL
SELECT 'day', bucket_day, event_type,
       COUNT(*),
       CAST(ROUND(SUM(value), 4) AS DOUBLE)
FROM b GROUP BY bucket_day, event_type
ORDER BY granularity, bucket, event_type
"""


def events_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch pattern that makes distinct counting
    incremental at 100 TB: build per-(day, event_type) HLL partial
    sketches once (`hll_sketch_agg` — storable in a rollup table),
    then answer per-event_type distinct-user questions by MERGING the
    partials (`hll_union_agg`) instead of rescanning raw events.

    The gate pins two properties per event_type:
    - `merge_eq_direct`: the merged-partials estimate agrees with the
      direct whole-data sketch estimate to within 0.5% relative. In
      practice the two are EXACTLY equal on this data (Datasketches
      HLL union is associative), but exact equality depends on union
      internals — coupon-mode promotion, the union target's lgK/HLL
      type — so a Spark or datasketches upgrade could legitimately
      perturb the last ulp; the gate pins the statistical agreement,
      not the library internals.
    - `merged_ok` (the correctness gate): the estimate sits within 3σ
      of exact distinct (σ ≈ 1.04/√2^12 for the default lgConfigK=12).
    The oracle replays exact distinct counts and expects both TRUE.
    """
    from ..sources.catalog import load_table

    events = load_table(spark, "events", sf_dir)
    with_day = events.select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )
    partials = with_day.groupBy("day", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = with_day.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.count_distinct("user_id").alias("distinct_users"),
    )
    rsd = 1.04 / (2**12) ** 0.5
    return (
        direct.join(merged, "event_type")
        .select(
            "event_type",
            "distinct_users",
            (
                F.abs(F.col("est_merged") - F.col("est_direct"))
                <= F.lit(0.005) * F.col("est_direct")
            ).alias("merge_eq_direct"),
            (
                F.abs(F.col("est_merged") - F.col("distinct_users"))
                <= F.lit(3 * rsd) * F.col("distinct_users")
            ).alias("merged_ok"),
        )
        .orderBy("event_type")
    )


EVENTS_HLL_ROLLUP_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS distinct_users,
       TRUE AS merge_eq_direct,
       TRUE AS merged_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-quantile pattern: per-event_type p50/p90/p99 via
    `approx_percentile` — Spark's GK/QuantileSummaries sketch, whose
    partial aggregates ARE the mergeable rollup (map-side partials
    merge on the reduce, the same property that lets a 100 TB scan
    keep per-partition summaries instead of sorting values).

    The gate pins the sketch's published rank guarantee instead of its
    internals: for accuracy A the returned value's rank must lie within
    n/A of the target rank. Verified with one conditional-count pass —
    `cnt_le` (values ≤ returned) must reach the lower rank bound and
    `cnt_lt` (values < returned) must not exceed the upper. Exact
    percentiles (linear interpolation on the integer-micro grid) ride
    along as the value columns both engines compute bit-equal.

    Follows `events_hll_rollup` (above) — same oracle stance: the
    oracle replays the exact side and expects the guarantee flags TRUE.
    """
    from ..sources.catalog import load_table

    qs = [0.5, 0.9, 0.99]
    acc = 10_000
    events = load_table(spark, "events", sf_dir)
    base = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v"),
    )
    summary = base.groupBy("event_type").agg(
        F.percentile_approx("v", F.array(*[F.lit(q) for q in qs]), F.lit(acc)).alias("apx"),
        F.percentile("v", F.array(*[F.lit(q) for q in qs])).alias("exact"),
        F.count(F.lit(1)).alias("n_values"),
    )
    probe = base.join(F.broadcast(summary), "event_type")
    checks = []
    for i, q in enumerate(qs):
        a = F.element_at(F.col("apx"), i + 1)
        cnt_le = F.sum(F.when(F.col("v") <= a, 1).otherwise(0))
        cnt_lt = F.sum(F.when(F.col("v") < a, 1).otherwise(0))
        n = F.first("n_values")
        lo = F.ceil(F.lit(q) * n) - F.floor(n / F.lit(acc)) - F.lit(1)
        hi = F.ceil(F.lit(q) * n) + F.floor(n / F.lit(acc)) + F.lit(1)
        checks.append(((cnt_le >= lo) & (cnt_lt <= hi)).alias(f"p{int(q * 100)}_ok"))
    out = probe.groupBy("event_type").agg(
        F.first("n_values").alias("n_values"),
        *[
            F.element_at(F.first("exact"), i + 1).alias(f"p{int(q * 100)}_micro")
            for i, q in enumerate(qs)
        ],
        *checks,
    )
    return out.select(
        "event_type",
        "n_values",
        "p50_micro",
        "p90_micro",
        "p99_micro",
        "p50_ok",
        "p90_ok",
        "p99_ok",
    ).orderBy("event_type")


EVENTS_QUANTILE_ROLLUP_SQL = """
WITH base AS (
  SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL
)
SELECT event_type,
       COUNT(*) AS n_values,
       QUANTILE_CONT(v, 0.5) AS p50_micro,
       QUANTILE_CONT(v, 0.9) AS p90_micro,
       QUANTILE_CONT(v, 0.99) AS p99_micro,
       TRUE AS p50_ok,
       TRUE AS p90_ok,
       TRUE AS p99_ok
FROM base
GROUP BY event_type
ORDER BY event_type
"""
