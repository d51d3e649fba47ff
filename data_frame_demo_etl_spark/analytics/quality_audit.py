"""Numeric data-quality audits: Benford first-digit conformance and
CUSUM changepoint location — the two standard "did something change /
is this data fabricated" checks a warehouse runs over fact columns.

Both are pure integer arithmetic end-to-end (the repo's 1e-6
micro-grid convention), so the DuckDB oracle reproduces every output
bit: Benford's expected shares are inlined as pre-computed integer
ppm literals (no cross-engine log10), and the CUSUM statistic is the
division-free form n·cumsum_k − k·total computed in exact wide
arithmetic (decimal(38) / HUGEINT — int64 would overflow at
n·Σ|v_micro| scale), never surfaced as a column.

No reference analog (`/root/reference` has no statistical audits);
brief-mandated beyond-reference data-quality analytics.

Scale shape: Benford is one map-side-combined aggregation over ≤ 9
groups. CUSUM and the other prefix-sum audits use the two-pass keyed
layout (``_keyed_prefix``) — parallel range partitions + bounded
offset collect, never a one-task-per-key window — plus a per-key
argmax aggregation; no self-joins, no driver loops.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.catalog import load_table

#: Hard ceiling on the (partition, key) offset rows `_keyed_prefix`
#: may collect — the loud-failure form of its low-cardinality-keys
#: contract (32 partitions × ~2000 keys at the default conf).
MAX_OFFSET_ROWS = 65536

# log10(1 + 1/d) in integer ppm, PRE-COMPUTED so neither engine
# evaluates a transcendental (libm results differ across engines in
# the last ulp; an inlined literal cannot).
BENFORD_PPM = {d: round(math.log10(1.0 + 1.0 / d) * 1_000_000) for d in range(1, 10)}


def benford_audit(df: DataFrame, col: str) -> DataFrame:
    """(digit, n, observed_ppm, expected_ppm, deviation_ppm) for the
    first significant digit of a positive numeric column.

    The digit is taken from the integer-cents rendering (exact:
    FLOOR(x·100 + 0.5) then first character), so float formatting
    differences can't shift it; shares are integer ppm (n_d·1e6 div N,
    both engines floor on positives)."""
    cents = F.floor(F.col(col) * 100 + 0.5).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(F.col(col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    expected = F.create_map(
        *[F.lit(x) for kv in BENFORD_PPM.items() for x in kv]
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.expr("n * 1000000 div total").alias("observed_ppm"),
            expected[F.col("digit")].cast("long").alias("expected_ppm"),
        )
        .withColumn(
            "deviation_ppm",
            F.abs(F.col("observed_ppm") - F.col("expected_ppm")),
        )
        .orderBy("digit")
    )


def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: Benford conformance of order totals — the classic
    fabricated-numbers screen (synthetic TPC-H prices are roughly
    uniform-in-range, so large deviations are EXPECTED here; the gate
    verifies the audit arithmetic, not the corpus's honesty)."""
    orders = load_table(spark, "orders", sf_dir)
    return benford_audit(orders, "o_totalprice")


def _benford_case() -> str:
    return (
        "CASE digit "
        + " ".join(f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items())
        + " END"
    )


ORDERS_BENFORD_AUDIT_SQL = f"""
WITH digits AS (
  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders WHERE o_totalprice > 0
),
counts AS (
  SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
),
tot AS (SELECT SUM(n) AS total FROM counts)
SELECT digit,
       CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // total AS BIGINT) AS observed_ppm,
       CAST({_benford_case()} AS BIGINT) AS expected_ppm,
       CAST(ABS(n * 1000000 // total - ({_benford_case()})) AS BIGINT) AS deviation_ppm
FROM counts CROSS JOIN tot
ORDER BY digit
"""


def _keyed_prefix(
    base: DataFrame, order_cols: list[str], val_col: str | list[str]
) -> DataFrame:
    """Per-key exact prefix sums WITHOUT a per-key global window: the
    two-pass layout (operators/packing.py pattern) generalized to a
    key column. Range-partition by (key, *order_cols), cum-sum within
    each partition, add per-(partition, key) offsets from one bounded
    in-plan broadcast (≤ partitions × live keys rows — this helper is
    for
    LOW-cardinality keys, where ``Window.partitionBy(key)`` would
    funnel each key's entire history through ONE task; high-
    cardinality keys parallelize fine under the plain window).

    Rows with equal (key, order) sort arbitrarily between engines and
    partitions, but prefix sums over equal elements produce the same
    multiset of partial values, so every downstream statistic built
    from (k, cum) is order-independent — the same argument the plain
    window relied on.

    Returns the input plus ``k`` (1-based per-key position), ``cum``
    (per-key prefix sum of ``val_col``), ``n`` and ``t`` (per-key
    total count/sum). Persist is load-bearing: repartitionByRange
    samples boundaries, so pass 2 must see pass 1's exact layout.

    ``val_col`` may be a LIST of columns: the layout, offset collect
    and window are shared (one shuffle, one bounded collect), and each
    column ``c`` yields ``cum_<c>`` / ``t_<c>`` instead of the single
    ``cum`` / ``t`` — the multi-statistic form the KS test needs
    (cumulative per-arm AND total counts from one pass).

    The low-cardinality contract is ENFORCED, not trusted: the offset
    table is ≤ partitions × distinct keys rows; a caller passing a
    high-cardinality key would otherwise silently build an unbounded
    broadcast — a lazy `raise_error` guard on the offset row count
    (one scalar agg, broadcast alongside) fails the job with a pointer
    at the plain per-key window, which parallelizes fine when keys are
    plentiful.

    r12: the offsets are computed IN-PLAN (per-key running sums over
    the partitions×keys table, ordered by ``__pid`` — the same
    ascending-pid accumulation the former driver loop did) and joined
    back as ONE broadcast instead of a blocking collect + two literal
    broadcasts. Construction no longer issues Spark jobs (the former
    collect materialized the layout eagerly and serialized every
    caller on a driver round-trip); the caller's single action
    materializes the persisted layout once, during the broadcast
    build, so pass 2 still sees pass 1's exact sampled boundaries."""
    single = isinstance(val_col, str)
    vals: list[str] = [val_col] if single else list(val_col)
    cum_names = ["cum"] if single else [f"cum_{c}" for c in vals]
    tot_names = ["t"] if single else [f"t_{c}" for c in vals]
    spark = base.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col("key")] + [F.col(c) for c in order_cols]
    laid = (
        base.repartitionByRange(n_parts, *cols)
        .sortWithinPartitions("key", *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    part_tot = laid.groupBy("__pid", "key").agg(
        F.count(F.lit(1)).alias("__c"),
        *[
            F.coalesce(F.sum(v), F.lit(0)).cast("long").alias(f"__sv_{i}")
            for i, v in enumerate(vals)
        ],
    )
    guard = part_tot.agg(F.count(F.lit(1)).alias("__noff"))
    # Offsets for a key accumulate in ascending __pid (the range
    # partitioner's layout order): strictly-preceding-pid running sums
    # per key. Totals (n, t) are the whole-key sums off the same tiny
    # table — one shared shuffle by key, both window frames bounded by
    # ≤ n_parts rows per key.
    w_off = (
        Window.partitionBy("key")
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Whole-key totals ride the SAME ordered window spec with an
    # unbounded frame (not a separate unordered Window.partitionBy):
    # identical partitioning+ordering lets Spark evaluate offsets and
    # totals in ONE WindowExec, and an unordered per-key window renders
    # with two bracket groups — the shape the global-window audit
    # flags as unpartitioned.
    w_tot = (
        Window.partitionBy("key")
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    off = part_tot.crossJoin(F.broadcast(guard)).select(
        "__pid",
        "key",
        F.when(
            F.col("__noff") > MAX_OFFSET_ROWS,
            F.raise_error(
                F.lit(
                    f"_keyed_prefix built more than {MAX_OFFSET_ROWS} "
                    "(partition, key) offset rows — the key column is too "
                    "high-cardinality for the two-pass layout. Use a plain "
                    "Window.partitionBy(key) prefix sum instead: many "
                    "distinct keys parallelize fine under the per-key "
                    "window."
                )
            ).cast("long"),
        )
        .otherwise(F.coalesce(F.sum("__c").over(w_off), F.lit(0)))
        .cast("long")
        .alias("__off_c"),
        *[
            F.coalesce(F.sum(f"__sv_{i}").over(w_off), F.lit(0))
            .cast("long")
            .alias(f"__off_v_{i}")
            for i in range(len(vals))
        ],
        F.sum("__c").over(w_tot).cast("long").alias("n"),
        *[
            F.sum(f"__sv_{i}").over(w_tot).cast("long").alias(t)
            for i, t in enumerate(tot_names)
        ],
    )
    w = (
        Window.partitionBy("__pid", "key")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = laid.join(F.broadcast(off), ["__pid", "key"]).withColumn(
        "k",
        F.row_number().over(Window.partitionBy("__pid", "key").orderBy(*order_cols))
        + F.col("__off_c"),
    )
    for i, (v, cn) in enumerate(zip(vals, cum_names)):
        out = out.withColumn(cn, F.sum(v).over(w) + F.col(f"__off_v_{i}"))
    return out.drop("__pid", "__off_c", *[f"__off_v_{i}" for i in range(len(vals))])


def cusum_changepoint(
    df: DataFrame, key_col: str, ts_col: str, val_col: str
) -> DataFrame:
    """(key, cp_ts, cp_pos, n): per key, the position k maximizing the
    division-free CUSUM statistic |n·S_k − k·T| over the time-ordered
    micro-grid series (S_k = prefix sum, T = total) — the classic
    changepoint location estimator for a mean shift. Exact: the
    statistic is computed in decimal(38,0) (n·S_k overflows int64 at
    realistic scales) and never surfaced; ties break to the earliest
    position. Rows with NULL values are excluded.

    Scale shape: prefix sums come from the two-pass keyed layout
    (``_keyed_prefix``) — with a handful of event types, a plain
    ``Window.partitionBy(key)`` would sort each type's entire history
    in ONE task; here every range partition sorts in parallel and the
    per-key totals arrive as a broadcast, not a second window."""
    v_micro = F.floor(F.col(val_col) * 1_000_000 + 0.5).cast("long")
    base = df.filter(F.col(val_col).isNotNull()).select(
        F.col(key_col).alias("key"), F.col(ts_col).alias("ts"), v_micro.alias("v")
    )
    dec = "decimal(38,0)"
    cur = _keyed_prefix(base, ["ts", "v"], "v").withColumn(
        "stat",
        F.abs(
            F.col("n").cast(dec) * F.col("cum").cast(dec)
            - F.col("k").cast(dec) * F.col("t").cast(dec)
        ),
    )
    best = cur.groupBy("key").agg(F.max("stat").alias("best"))
    return (
        cur.join(best, "key")
        .filter(F.col("stat") == F.col("best"))
        .groupBy("key")
        .agg(
            F.min_by("ts", "k").alias("cp_ts"),
            F.min("k").alias("cp_pos"),
            F.first("n").alias("n"),
        )
        .select(
            F.col("key"),
            "cp_ts",
            F.col("cp_pos").cast("long").alias("cp_pos"),
            F.col("n").cast("long").alias("n"),
        )
        .orderBy("key")
    )


def events_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-event-type CUSUM changepoint over the value series in
    time order — where each type's running mean most decisively
    shifts. One window pass + one argmax per type."""
    events = load_table(spark, "events", sf_dir)
    out = cusum_changepoint(events, "event_type", "ts", "value")
    return out.select(
        F.col("key").alias("event_type"), "cp_ts", "cp_pos", "n"
    ).orderBy("event_type")


EVENTS_CUSUM_CHANGEPOINTS_SQL = """
WITH base AS (
  SELECT event_type AS key, ts,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
cur AS (
  SELECT key, ts, v,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts, v) AS k,
         SUM(v) OVER (PARTITION BY key ORDER BY ts, v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
         COUNT(*) OVER (PARTITION BY key) AS n,
         SUM(v) OVER (PARTITION BY key) AS t
  FROM base
),
scored AS (
  SELECT key, ts, k, n,
         ABS(CAST(n AS HUGEINT) * CAST(s AS HUGEINT)
             - CAST(k AS HUGEINT) * CAST(t AS HUGEINT)) AS stat
  FROM cur
),
best AS (SELECT key, MAX(stat) AS best FROM scored GROUP BY key)
SELECT s.key AS event_type,
       MIN_BY(s.ts, s.k) AS cp_ts,
       CAST(MIN(s.k) AS BIGINT) AS cp_pos,
       CAST(MIN(s.n) AS BIGINT) AS n
FROM scored s JOIN best b ON b.key = s.key AND s.stat = b.best
GROUP BY s.key
ORDER BY event_type
"""


def max_concurrency(
    df: DataFrame, key_col: str, start_col: str, end_col: str
) -> DataFrame:
    """(key, peak, peak_ts): maximum number of simultaneously-open
    intervals per key, and the earliest instant it is reached — the
    classic boundary-sweep: +1 at each start, −1 at each end, ordered
    prefix sum, argmax. Ends sort BEFORE starts at the same instant
    (half-open [start, end) semantics). One window pass per key over
    2·n boundary rows; no interval self-join (the naive overlap join
    is quadratic in concurrency)."""
    starts = df.select(
        F.col(key_col).alias("key"),
        F.col(start_col).alias("at"),
        F.lit(1).alias("delta"),
    )
    ends = df.select(
        F.col(key_col).alias("key"),
        F.col(end_col).alias("at"),
        F.lit(-1).alias("delta"),
    )
    bounds = starts.unionByName(ends)
    # two-pass keyed prefix sum (see _keyed_prefix): the running open
    # count, ends sorted before starts at the same instant
    cur = _keyed_prefix(bounds, ["at", "delta"], "delta").withColumnRenamed(
        "cum", "open"
    )
    best = cur.groupBy("key").agg(F.max("open").alias("peak"))
    return (
        cur.join(best, "key")
        .filter(F.col("open") == F.col("peak"))
        .groupBy("key")
        .agg(F.min("at").alias("peak_ts"), F.min("open").alias("peak"))
        .select("key", F.col("peak").cast("long").alias("peak"), "peak_ts")
        .orderBy("key")
    )


def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: peak concurrent activity per event type, treating each
    event as a 5-minute half-open activity interval — the "max
    concurrent sessions" number every capacity audit asks for."""
    events = load_table(spark, "events", sf_dir)
    iv = events.select(
        "event_type",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    out = max_concurrency(iv, "event_type", "s", "e")
    return out.select(
        F.col("key").alias("event_type"), "peak", "peak_ts"
    ).orderBy("event_type")


EVENTS_MAX_CONCURRENCY_SQL = """
WITH bounds AS (
  SELECT event_type AS key, ts AS at, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 5 MINUTE, -1 FROM events
),
cur AS (
  SELECT key, at, delta,
         SUM(delta) OVER (PARTITION BY key ORDER BY at, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
  FROM bounds
),
best AS (SELECT key, MAX(open) AS peak FROM cur GROUP BY key)
SELECT c.key AS event_type,
       CAST(MIN(c.open) AS BIGINT) AS peak,
       MIN(c.at) AS peak_ts
FROM cur c JOIN best b ON b.key = c.key AND c.open = b.peak
GROUP BY c.key
ORDER BY event_type
"""


def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over (event_type, dow): exactly the three
    subtotal shapes a dashboard wants — per (type, dow), per type, and
    the grand total — WITHOUT the per-dow-only set a full CUBE would
    also compute (completes the grouping family beside `revenue_rollup`
    and `events_cube_summary`; one pass, Spark expands the sets into a
    single aggregation). grouping_id disambiguates subtotal levels;
    labels are COALESCE'd so the output is NULL-free."""
    events = load_table(spark, "events", sf_dir)
    base = events.select(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("long").alias("v"),
    )
    return (
        base.groupingSets(
            [["event_type", "dow"], ["event_type"], []], "event_type", "dow"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("value_micro"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias("dow"),
            "n_events",
            F.coalesce("value_micro", F.lit(0)).alias("value_micro"),
            F.col("gid").cast("long").alias("gid"),
        )
        .orderBy("gid", "event_type", "dow")
    )


EVENTS_GROUPING_SETS_SQL = """
WITH base AS (
  SELECT event_type, CAST(DAYOFWEEK(ts) + 1 AS BIGINT) AS dow,  -- DuckDB Sunday=0, Spark Sunday=1
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v
  FROM events
)
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(dow AS VARCHAR), 'ALL') AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COALESCE(SUM(v), 0) AS BIGINT) AS value_micro,
       CAST(GROUPING(event_type) * 2 + GROUPING(dow) AS BIGINT) AS gid
FROM base
GROUP BY GROUPING SETS ((event_type, dow), (event_type), ())
ORDER BY gid, event_type, dow
"""


def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per event type between a deterministic
    A/B split (user_id parity): conversion = value > 0.5 (a stand-in
    success predicate on the synthetic stream). Output per type:
    group sizes, success counts, rate difference and z-statistic in
    integer micro units.

    Determinism: counts are exact; the z pipeline is a FIXED
    parenthesization of correctly-rounded IEEE ops (+,−,×,÷,sqrt all
    are; no libm transcendentals), quantized once at the end — the
    same discipline as the temperature-mix thresholds. One map-side-
    combined aggregation; no shuffle beyond ≤types groups."""
    events = load_table(spark, "events", sf_dir)
    base = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        (F.col("user_id") % 2 == 0).alias("is_a"),
        (F.col("value") > 0.5).cast("long").alias("succ"),
    )
    agg = base.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("is_a"), F.col("succ")).otherwise(0)).alias("s_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(~F.col("is_a"), F.col("succ")).otherwise(0)).alias("s_b"),
    )
    # fixed parenthesization; pooled two-proportion z. NULL guards
    # (empty arm → rates undefined; all-success/all-failure pool →
    # se = 0 → z undefined) keep the expression legal under ANSI mode
    # (division by zero RAISES on a vanilla Spark-4 session — caught
    # by the vanilla smoke sweep at sf0.001, where a small type can
    # have zero successes).
    p_a = F.col("s_a").cast("double") / F.nullif(F.col("n_a"), F.lit(0)).cast("double")
    p_b = F.col("s_b").cast("double") / F.nullif(F.col("n_b"), F.lit(0)).cast("double")
    p_pool = (F.col("s_a") + F.col("s_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        (p_pool * (F.lit(1.0) - p_pool))
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    z = (p_a - p_b) / F.nullif(se, F.lit(0.0))
    return agg.filter((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("s_a").cast("long").alias("s_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("s_b").cast("long").alias("s_b"),
        F.floor((p_a - p_b) * 1_000_000 + 0.5).cast("long").alias("rate_diff_micro"),
        F.floor(z * 1_000_000 + 0.5).cast("long").alias("z_micro"),
    ).orderBy("event_type")


EVENTS_AB_TEST_SQL = """
WITH base AS (
  SELECT event_type,
         user_id % 2 = 0 AS is_a,
         CAST(value > 0.5 AS BIGINT) AS succ
  FROM events WHERE value IS NOT NULL
),
agg AS (
  SELECT event_type,
         SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN is_a THEN succ ELSE 0 END) AS s_a,
         SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN NOT is_a THEN succ ELSE 0 END) AS s_b
  FROM base GROUP BY event_type
)
SELECT event_type,
       CAST(n_a AS BIGINT) AS n_a, CAST(s_a AS BIGINT) AS s_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(s_b AS BIGINT) AS s_b,
       CAST(FLOOR((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) * 1000000 + 0.5) AS BIGINT) AS rate_diff_micro,
       CAST(FLOOR(
         ((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
          / NULLIF(SQRT((CAST(s_a + s_b AS DOUBLE) / (n_a + n_b) * (1.0 - CAST(s_a + s_b AS DOUBLE) / (n_a + n_b)))
                 * (1.0 / n_a + 1.0 / n_b)), 0.0))
         * 1000000 + 0.5) AS BIGINT) AS z_micro
FROM agg
WHERE n_a > 0 AND n_b > 0
ORDER BY event_type
"""


def gini_skew(df: DataFrame, key_col: str) -> DataFrame:
    """One row: the Gini coefficient of the per-key row-count
    distribution, in integer micro units — 0 = perfectly even load,
    →1 = one key owns everything. The single-number companion to the
    per-key skew profiler (operators/skew.py): alert on it, then
    profile.

    Exact integer formulation over counts sorted ascending with the
    two-pass global rank (range partition + bounded offsets — no
    single-partition window): G = (2·Σ i·x_i − (n+1)·Σ x_i) /
    (n·Σ x_i), every product in decimal(38,0) (i·x_i sums overflow
    int64 at key-count scale), one final integer division onto the
    micro grid. Empty input ⇒ zero rows on BOTH engines (the oracle
    carries `HAVING COUNT(*) > 0` to match this groupBy shape)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("x")
    )
    laid = _keyed_prefix(
        counts.select(F.lit("g").alias("key2"), "x").selectExpr(
            "key2 as key", "x", "x as ord_x"
        ),
        ["ord_x"],
        "x",
    )
    dec = "decimal(38,0)"
    terms = laid.select(
        (F.col("k").cast(dec) * F.col("x").cast(dec)).alias("ix"),
        F.col("x").cast(dec).alias("x"),
        F.col("n").cast("long").alias("n"),
    )
    # Integral division (`div`), NOT decimal `/`: Spark's decimal
    # division rounds to the result scale before any cast (a
    # 2.9999997 would round UP to 3.000000), while DuckDB's integer
    # `/` returns a double — both diverge from exact truncation on
    # knife-edge rationals. `div` / `//` truncate identically on the
    # non-negative numerator (2·Σi·x_i ≥ (n+1)·Σx_i for ascending x,
    # by Chebyshev's sum inequality).
    return (
        terms.groupBy("n")
        .agg(F.sum("ix").alias("six"), F.sum("x").alias("sx"))
        .select(
            F.col("n").alias("n_keys"),
            F.col("sx").cast("long").alias("n_rows"),
            F.expr(
                "cast(((2 * six - (n + 1) * sx) * cast(1000000 as decimal(38,0)))"
                " div (cast(n as decimal(38,0)) * sx) as bigint)"
            ).alias("gini_micro"),
        )
    )


def lineitem_supplier_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: Gini coefficient of lineitem rows per supplier — how
    unevenly the join/shuffle load for l_suppkey is distributed."""
    li = load_table(spark, "lineitem", sf_dir)
    return gini_skew(li, "l_suppkey")


LINEITEM_SUPPLIER_GINI_SQL = """
WITH counts AS (
  SELECT l_suppkey, COUNT(*) AS x FROM lineitem GROUP BY l_suppkey
),
ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS i, COUNT(*) OVER () AS n
  FROM counts
)
SELECT CAST(MIN(n) AS BIGINT) AS n_keys,
       CAST(SUM(x) AS BIGINT) AS n_rows,
       CAST((2 * SUM(CAST(i AS HUGEINT) * x) - (MIN(n) + 1) * SUM(CAST(x AS HUGEINT)))
            * 1000000 // (CAST(MIN(n) AS HUGEINT) * SUM(CAST(x AS HUGEINT))) AS BIGINT) AS gini_micro
FROM ranked
HAVING COUNT(*) > 0
"""


# ─────────────── Mann–Whitney U rank-sum test (K42) ───────────────


def mannwhitney_u(
    df: DataFrame,
    key_col: str = "event_type",
    group_col_expr=None,
    val_col: str = "value",
) -> DataFrame:
    """Per-key Mann–Whitney U (Wilcoxon rank-sum) between the same
    deterministic A/B arms K36 uses — the NONPARAMETRIC location test
    that stays valid when values are skewed/heavy-tailed and a mean
    comparison (or K36's proportion test over a thresholded success)
    would mislead.

    Exact-integer construction: values ride the cent grid; per
    (key, cents) the engine needs only (t_v = total rows, a_v = arm-A
    rows) plus the cumulative count BEFORE each distinct value.
    Average midranks with ties are half-integers, so everything is
    carried DOUBLED: 2·rank_sum_A = Σ a_v · (2·before_v + t_v + 1)
    and 2·U_A = that − n_A(n_A+1) — exact integers (DECIMAL(38,0)
    accumulation: the rank-sum is O(n²) and outgrows int64 at data
    scale). The tie-corrected normal approximation is the single
    floating step:

        var(2U) = n_A·n_B · ((n+1) − Σ(t³−t)/(n·(n−1))) / 3
        z       = (2U_A − n_A·n_B) / sqrt(var(2U))

    fixed parenthesization of correctly-rounded IEEE ops (no
    continuity correction — documented), z on the 1e-6 grid,
    degenerate variance (all values tied, or an empty arm) → NULL.

    Scale shape: one map-side-combined (key, cents) aggregation over
    the corpus, then the two-pass keyed prefix layout for before_v
    (the distinct-value table is VALUE-DOMAIN-sized; with enum keys a
    plain Window.partitionBy(key) would one-task each key), then one
    ≤keys-sized aggregation.
    """
    if group_col_expr is None:
        group_col_expr = F.col("user_id") % 2 == 0
    cents = F.round(F.col(val_col) * 100).cast("long")
    cnt = (
        df.filter(F.col(val_col).isNotNull())
        .select(F.col(key_col).alias("key"), cents.alias("cents"), group_col_expr.alias("is_a"))
        .groupBy("key", "cents")
        .agg(
            F.count(F.lit(1)).alias("tv"),
            F.count_if(F.col("is_a")).alias("av"),
        )
    )
    pre = _keyed_prefix(cnt, ["cents"], "tv")
    dec = "decimal(38,0)"
    before = (F.col("cum") - F.col("tv")).cast(dec)
    term = F.col("av").cast(dec) * (
        F.lit(2).cast(dec) * before + F.col("tv").cast(dec) + F.lit(1).cast(dec)
    )
    tie = F.col("tv").cast(dec) * F.col("tv").cast(dec) * F.col("tv").cast(dec) - F.col(
        "tv"
    ).cast(dec)
    g = (
        pre.withColumn("r2a_term", term)
        .withColumn("tie_term", tie)
        .groupBy("key")
        .agg(
            F.first("t").alias("n_rows"),
            F.sum("av").alias("n_a"),
            F.sum("r2a_term").alias("r2a"),
            F.sum("tie_term").alias("ties"),
        )
    )
    na = F.col("n_a").cast(dec)
    nn = F.col("n_rows").cast(dec)
    nb_d = nn - na
    u2 = F.col("r2a") - na * (na + F.lit(1).cast(dec))
    nad = na.cast("double")
    nbd = nb_d.cast("double")
    nd = nn.cast("double")
    tied = F.col("ties").cast("double")
    var2 = (
        (nad * nbd)
        * ((nd + F.lit(1.0)) - tied / (nd * (nd - F.lit(1.0))))
        / F.lit(3.0)
    )
    z = F.when(var2 > 0, (u2.cast("double") - nad * nbd) / F.sqrt(var2))
    return g.select(
        F.col("key").alias(key_col),
        F.col("n_a").cast("long").alias("n_a"),
        nb_d.cast("long").alias("n_b"),
        u2.cast("long").alias("u2_a"),
        F.floor(z * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias("z_micro"),
    ).orderBy(key_col)


def events_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-type Mann–Whitney U between the user-parity arms —
    the nonparametric sibling of `events_ab_test`."""
    events = load_table(spark, "events", sf_dir)
    return mannwhitney_u(events)


EVENTS_MANNWHITNEY_SQL = """
WITH cnt AS (
  SELECT event_type AS key, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS tv,
         CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS av
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
pre AS (
  SELECT key, cents, tv, av,
         SUM(tv) OVER (PARTITION BY key ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv AS before_v
  FROM cnt
),
g AS (
  SELECT key,
         CAST(SUM(tv) AS HUGEINT) AS n_rows,
         CAST(SUM(av) AS HUGEINT) AS n_a,
         SUM(CAST(av AS HUGEINT) * (2 * CAST(before_v AS HUGEINT) + CAST(tv AS HUGEINT) + 1)) AS r2a,
         SUM(CAST(tv AS HUGEINT) * CAST(tv AS HUGEINT) * CAST(tv AS HUGEINT) - CAST(tv AS HUGEINT)) AS ties
  FROM pre
  GROUP BY key
)
SELECT key AS event_type,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_rows - n_a AS BIGINT) AS n_b,
       CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       CASE WHEN (CAST(n_a AS DOUBLE) * CAST(n_rows - n_a AS DOUBLE))
                 * ((CAST(n_rows AS DOUBLE) + 1.0) - CAST(ties AS DOUBLE) / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0)))
                 / 3.0 > 0
            THEN CAST(FLOOR(((CAST(r2a - n_a * (n_a + 1) AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_rows - n_a AS DOUBLE))
                 / SQRT((CAST(n_a AS DOUBLE) * CAST(n_rows - n_a AS DOUBLE))
                        * ((CAST(n_rows AS DOUBLE) + 1.0) - CAST(ties AS DOUBLE) / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0)))
                        / 3.0))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS z_micro
FROM g
ORDER BY event_type
"""

# ─────────────── Kolmogorov–Smirnov two-sample test (K43) ───────────────


def ks_two_sample(
    df: DataFrame,
    key_col: str = "event_type",
    group_col_expr=None,
    val_col: str = "value",
) -> DataFrame:
    """Per-key two-sample Kolmogorov–Smirnov test between the same
    deterministic A/B arms K36/K42 use — the DISTRIBUTION-shape test
    that completes the A/B family: K36 compares a thresholded
    proportion, K42 location, KS the whole empirical CDF (it fires on
    variance/shape changes a location test is blind to).

    Exact-integer construction: values ride the cent grid; per
    (key, cents) the engine needs (t_v = total rows, a_v = arm-A
    rows) and BOTH cumulative counts, so the two-pass keyed prefix
    runs in its multi-column form (one shuffle, one bounded offset
    collect — NOT two passes). With cumT_v = Σ_{w≤v} t_w and
    cumA_v = Σ_{w≤v} a_w, the scaled deviation at v is the exact
    integer

        dev_v = |n·cumA_v − n_A·cumT_v|   (= |n_B·cumA_v − n_A·cumB_v|)

    and D = max_v dev_v / (n_A·n_B). Ties are handled exactly: the
    empirical CDFs only ever need evaluating at distinct data values,
    which is precisely the (key, cents) grid. dev is accumulated in
    decimal(38,0) — n·cum is O(n²) and outgrows int64 at data scale
    (exact to n ≈ 6·10¹⁵ rows per key on the ppm output grid).

    Outputs per key: n_a, n_b, d_ppm = ⌊10⁶·D⌋ (exact integral
    division — Spark `div` / DuckDB `//` truncate identically on
    non-negative operands) and the asymptotic effective statistic
    λ = D·√(n_A·n_B/n) on the 1e-6 grid — the quantity fed to the
    Kolmogorov distribution; surfacing λ instead of a p-value keeps
    the gate inside correctly-rounded IEEE ops (·, /, √ — no
    cross-engine transcendental exp). Empty arm → both NULL.

    Scale shape: one map-side-combined (key, cents) aggregation, the
    shared two-pass keyed prefix (range partitions sort in parallel;
    a plain Window.partitionBy(key) would one-task each enum key),
    one ≤keys-sized max/first aggregation. No self-joins, no driver
    loops. No reference analog (/root/reference has no statistical
    tests); brief-mandated beyond-reference quality analytics.
    """
    if group_col_expr is None:
        group_col_expr = F.col("user_id") % 2 == 0
    cents = F.round(F.col(val_col) * 100).cast("long")
    cnt = (
        df.filter(F.col(val_col).isNotNull())
        .select(F.col(key_col).alias("key"), cents.alias("cents"), group_col_expr.alias("is_a"))
        .groupBy("key", "cents")
        .agg(
            F.count(F.lit(1)).alias("tv"),
            F.count_if(F.col("is_a")).alias("av"),
        )
    )
    pref = _keyed_prefix(cnt, ["cents"], ["tv", "av"])
    dec = "decimal(38,0)"
    n = F.col("t_tv").cast(dec)
    na = F.col("t_av").cast(dec)
    dev = F.abs(n * F.col("cum_av").cast(dec) - na * F.col("cum_tv").cast(dec))
    g = (
        pref.withColumn("dev", dev)
        .groupBy("key")
        .agg(
            F.first("t_tv").alias("n_rows"),
            F.first("t_av").alias("n_a"),
            F.max("dev").alias("d_num"),
        )
    )
    na_g = F.col("n_a").cast(dec)
    nb_g = (F.col("n_rows") - F.col("n_a")).cast(dec)
    ok = (F.col("n_a") > 0) & (F.col("n_rows") > F.col("n_a"))
    d_ppm = F.expr(
        "cast((d_num * cast(1000000 as decimal(38,0)))"
        " div (cast(n_a as decimal(38,0))"
        "      * cast(n_rows - n_a as decimal(38,0))) as bigint)"
    )
    nad = na_g.cast("double")
    nbd = nb_g.cast("double")
    nd = F.col("n_rows").cast("double")
    d_exact = F.col("d_num").cast("double") / (nad * nbd)
    lam = d_exact * F.sqrt((nad * nbd) / nd)
    return g.select(
        F.col("key").alias(key_col),
        F.col("n_a").cast("long").alias("n_a"),
        nb_g.cast("long").alias("n_b"),
        F.when(ok, d_ppm).alias("d_ppm"),
        F.when(ok, F.floor(lam * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")).alias(
            "lambda_micro"
        ),
    ).orderBy(key_col)


def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-type two-sample KS between the user-parity arms —
    the distribution-shape sibling of `events_ab_test` (K36) and
    `events_mannwhitney` (K42)."""
    events = load_table(spark, "events", sf_dir)
    return ks_two_sample(events)


EVENTS_KS_TEST_SQL = """
WITH cnt AS (
  SELECT event_type AS key, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS tv,
         CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS av
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
pre AS (
  SELECT key, tv, av,
         SUM(tv) OVER (PARTITION BY key ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tv,
         SUM(av) OVER (PARTITION BY key ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_av,
         SUM(tv) OVER (PARTITION BY key) AS key_n,
         SUM(av) OVER (PARTITION BY key) AS key_na
  FROM cnt
),
g AS (
  SELECT key,
         CAST(MIN(key_n) AS HUGEINT) AS n_rows,
         CAST(MIN(key_na) AS HUGEINT) AS n_a,
         MAX(ABS(CAST(key_n AS HUGEINT) * CAST(cum_av AS HUGEINT)
                 - CAST(key_na AS HUGEINT) * CAST(cum_tv AS HUGEINT))) AS d_num
  FROM pre
  GROUP BY key
)
SELECT key AS event_type,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_rows - n_a AS BIGINT) AS n_b,
       CASE WHEN n_a > 0 AND n_rows > n_a
            THEN CAST((d_num * 1000000) // (n_a * (n_rows - n_a)) AS BIGINT)
       END AS d_ppm,
       CASE WHEN n_a > 0 AND n_rows > n_a
            THEN CAST(FLOOR((CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_rows - n_a AS DOUBLE)))
                 * SQRT((CAST(n_a AS DOUBLE) * CAST(n_rows - n_a AS DOUBLE)) / CAST(n_rows AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS lambda_micro
FROM g
ORDER BY event_type
"""


# ─────────────── Spearman rank correlation (K44) ───────────────


def spearman_rank_corr(pairs: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman's ρ over integer-valued pairs — Pearson on midranks,
    the monotone-association test that completes the correlation
    family (K40 Pearson = linear co-movement, K39 ACF = self-lag,
    K44 = rank agreement, robust to any monotone transform and to
    heavy tails).

    Exact construction: per VARIABLE, ranks come from the value
    domain, not the rows — groupBy(value) counts, then the two-pass
    keyed prefix (constant key: range partitions still split by
    value, the offset collect is ≤ #partitions rows) gives each
    distinct value its DOUBLED midrank 2r_v = 2·before_v + t_v + 1,
    an exact integer under ties; rows join their rank back by value.
    All sufficient statistics (n, Σ2r_x, Σ2r_y, Σ(2r_x)², Σ(2r_y)²,
    Σ2r_x·2r_y) accumulate in decimal(38,0) — products are O(n³) and
    n·Σxy is O(n⁴), exact to ~10⁹ pairs (documented bound; beyond
    that the doubled grid needs a 128-bit rework). ρ is ONE fixed
    IEEE combination (·, −, /, √ — all correctly rounded, no
    transcendentals):

        ρ = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²))

    on the 1e-6 grid; zero variance in either variable → NULL.

    Scale shape: one groupBy per variable (map-side combined), two
    parallel prefix layouts over value-domain tables, two equi-joins
    back (AQE picks broadcast when the domain is small), one global
    aggregation. No per-row window over the full pair table, no
    driver loops."""
    dec = "decimal(38,0)"

    def ranked(col: str, out: str) -> DataFrame:
        dom = (
            pairs.select(F.col(col).alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("tv"))
            .select(F.lit(1).alias("key"), "v", "tv")
        )
        pre = _keyed_prefix(dom, ["v"], "tv")
        r2 = (F.lit(2) * (F.col("cum") - F.col("tv")) + F.col("tv") + F.lit(1)).cast(
            "long"
        )
        return pre.select(F.col("v").alias(col), r2.alias(out))

    j = (
        pairs.join(ranked(x_col, "rx2"), x_col)
        .join(ranked(y_col, "ry2"), y_col)
        .select(F.col("rx2").cast(dec).alias("rx2"), F.col("ry2").cast(dec).alias("ry2"))
    )
    s = j.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    rho = num.cast("double") / (
        F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))
    )
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.when(
            (varx > 0) & (vary > 0),
            F.floor(rho * F.lit(1_000_000.0) + F.lit(0.5)).cast("long"),
        ).alias("rho_micro"),
    )


def events_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: Spearman rank correlation between per-user activity
    volume (event count) and total spend (value cents) — does rank in
    engagement agree with rank in monetary value."""
    events = load_table(spark, "events", sf_dir)
    users = (
        events.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"),
        )
    )
    return spearman_rank_corr(users, "x", "y")


EVENTS_SPEARMAN_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1
),
vx AS (SELECT x AS v, COUNT(*) AS tv FROM u GROUP BY 1),
rx AS (
  SELECT v,
         2 * (SUM(tv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv) + tv + 1 AS r2
  FROM vx
),
vy AS (SELECT y AS v, COUNT(*) AS tv FROM u GROUP BY 1),
ry AS (
  SELECT v,
         2 * (SUM(tv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv) + tv + 1 AS r2
  FROM vy
),
j AS (
  SELECT CAST(rx.r2 AS HUGEINT) AS rx2, CAST(ry.r2 AS HUGEINT) AS ry2
  FROM u JOIN rx ON u.x = rx.v JOIN ry ON u.y = ry.v
),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(rx2) AS sx, SUM(ry2) AS sy,
         SUM(rx2 * rx2) AS sxx, SUM(ry2 * ry2) AS syy,
         SUM(rx2 * ry2) AS sxy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN CAST(FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) * SQRT(CAST(n * syy - sy * sy AS DOUBLE))))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS rho_micro
FROM s
"""


# ─────────────── Chi-square independence test (K47) ───────────────

#: Fixed-point scale for the per-cell O²/(r·c) terms — both engines
#: floor the SAME integer division, so parity is exact; the grid
#: truncation itself is bounded by #cells ulps of 1e-12.
_CHISQ_SCALE = 10**12


def chisq_independence(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Pearson chi-square test of independence over the (row, col)
    contingency table — the categorical-association member of the
    test family (K36 proportions, K42/K43 distributions, K44 ranks;
    this one: are two discrete columns associated at all).

    Exact-integer construction: with observed cell counts O_ij, row
    totals r_i and column totals c_j, the statistic in the
    expected-count-free form is

        χ² = n · (Σ_ij O_ij²/(r_i·c_j) − 1)

    Each cell term is floored ONCE onto a 1e-12 fixed-point grid
    (t_ij = O_ij²·10¹² div r_i·c_j — exact integral division, both
    engines truncate identically on non-negatives), summed exactly in
    decimal(38,0), and the final χ² lands on the 1e-6 grid as
    n·(T − 10¹²) div 10⁶. The grid truncation under-counts by less
    than #cells·10⁻¹²·n — deterministic and identical across engines
    (the oracle reproduces every floor), documented in lieu of a
    cross-engine-unstable float accumulation. Exact to ~3·10¹² rows
    (O² in decimal38).

    Scale shape: one map-side-combined groupBy(row,col) over the
    corpus; row/col totals re-aggregate the CELL table (value-domain
    sized — never a second corpus scan); two broadcast joins onto the
    cells; one global aggregation. dof = (R−1)(C−1) from the same
    cell table."""
    cells = (
        df.filter(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
        .groupBy(F.col(row_col).alias("ri"), F.col(col_col).alias("cj"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rows = cells.groupBy("ri").agg(F.sum("o").alias("r"))
    colsum = cells.groupBy("cj").agg(F.sum("o").alias("c"))
    dec = "decimal(38,0)"
    joined = (
        cells.join(F.broadcast(rows), "ri")
        .join(F.broadcast(colsum), "cj")
        .withColumn(
            "t",
            F.expr(
                f"(cast(o as {dec}) * cast(o as {dec})"
                f" * cast({_CHISQ_SCALE} as {dec}))"
                f" div (cast(r as {dec}) * cast(c as {dec}))"
            ),
        )
    )
    s = joined.agg(
        F.sum("o").cast(dec).alias("n"),
        F.count_distinct("ri").alias("r_levels"),
        F.count_distinct("cj").alias("c_levels"),
        F.sum("t").alias("tsum"),
    )
    # greatest(·, 0): T can floor a hair BELOW the scale on a
    # perfectly independent table; χ² is mathematically ≥ 0 and the
    # clamp keeps the integral division on non-negatives, where Spark
    # `div` (truncate) and DuckDB `//` (floor) agree.
    chi2 = F.expr(
        f"(n * greatest(tsum - cast({_CHISQ_SCALE} as decimal(38,0)),"
        f" cast(0 as decimal(38,0)))) div 1000000"
    )
    dof = F.when(
        (F.col("r_levels") > 0) & (F.col("c_levels") > 0),
        (F.col("r_levels") - 1) * (F.col("c_levels") - 1),
    ).otherwise(F.lit(0))
    # Cramér's V = sqrt(χ² / (n · min(R−1, C−1))) — the [0,1] effect
    # size that makes χ² comparable across table shapes and n. One
    # extra IEEE combination over the already-deterministic inputs
    # (χ² is read back off its own micro grid, so both engines feed
    # sqrt the identical double).
    minq = F.least(F.col("r_levels") - 1, F.col("c_levels") - 1)
    v = F.sqrt(
        (chi2.cast("double") / F.lit(1_000_000.0))
        / (F.col("n").cast("double") * minq.cast("double"))
    )
    return s.select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.col("r_levels").cast("long").alias("r_levels"),
        F.col("c_levels").cast("long").alias("c_levels"),
        dof.cast("long").alias("dof"),
        F.when(dof > 0, chi2.cast("long")).alias("chi2_micro"),
        F.when(
            (dof > 0) & (F.col("n") > 0),
            F.floor(v * F.lit(1_000_000.0) + F.lit(0.5)).cast("long"),
        ).alias("cramers_v_micro"),
    )


def events_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: is event type associated with ISO weekday — the
    seasonality-of-mix screen (a drifted weekday mix breaks
    train/serve assumptions even when daily volume is flat)."""
    events = load_table(spark, "events", sf_dir)
    df = events.select(
        F.col("event_type"), F.expr("weekday(ts)").alias("dow")
    )
    return chisq_independence(df, "event_type", "dow")


EVENTS_CHISQ_INDEPENDENCE_SQL = f"""
WITH cells AS (
  SELECT event_type AS ri, isodow(ts) - 1 AS cj, CAST(COUNT(*) AS BIGINT) AS o
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
r AS (SELECT ri, SUM(o) AS r FROM cells GROUP BY 1),
c AS (SELECT cj, SUM(o) AS c FROM cells GROUP BY 1),
j AS (
  SELECT cells.o,
         (CAST(cells.o AS HUGEINT) * cells.o * {_CHISQ_SCALE})
           // (CAST(r.r AS HUGEINT) * c.c) AS t,
         cells.ri, cells.cj
  FROM cells JOIN r USING (ri) JOIN c USING (cj)
),
s AS (
  SELECT CAST(SUM(o) AS HUGEINT) AS n,
         COUNT(DISTINCT ri) AS r_levels,
         COUNT(DISTINCT cj) AS c_levels,
         SUM(t) AS tsum
  FROM j
)
SELECT CAST(COALESCE(n, 0) AS BIGINT) AS n,
       CAST(r_levels AS BIGINT) AS r_levels,
       CAST(c_levels AS BIGINT) AS c_levels,
       CAST(CASE WHEN r_levels > 0 AND c_levels > 0
                 THEN (r_levels - 1) * (c_levels - 1) ELSE 0 END AS BIGINT) AS dof,
       CASE WHEN r_levels > 1 AND c_levels > 1
            THEN CAST((n * GREATEST(tsum - {_CHISQ_SCALE}, 0)) // 1000000 AS BIGINT)
       END AS chi2_micro,
       CASE WHEN r_levels > 1 AND c_levels > 1 AND n > 0
            THEN CAST(FLOOR(SQRT((CAST((n * GREATEST(tsum - {_CHISQ_SCALE}, 0)) // 1000000 AS DOUBLE) / 1000000.0)
                 / (CAST(n AS DOUBLE) * CAST(LEAST(r_levels - 1, c_levels - 1) AS DOUBLE)))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS cramers_v_micro
FROM s
"""


# ─────────────── Mutual information audit (K48) ───────────────


def mutual_information(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Mutual information (nats) between two discrete columns plus
    both marginal entropies — the information-theoretic companion to
    K47's chi-square: χ² answers "associated at all?", MI "how many
    nats does knowing X give about Y" (and MI/min(H) is the usual
    normalized dependence score; both entropies are surfaced so the
    caller can normalize either way).

    Cross-engine portability (the lm.py covariance-gate trick): each
    cell's log term ln(n·O_ij/(r_i·c_j)) — a correctly-rounded double
    of a ratio of exact integers — is quantized to the 1e-6 grid
    BEFORE the O-weighted summation, so the aggregate is exact integer
    arithmetic in both engines; libm ulp differences sit ~9 orders
    below the grid. Sums accumulate in decimal(38,0); the final
    division is exact integral `div`/`//` on non-negatives (MI ≥ 0 and
    H ≥ 0 mathematically; the ≤cells-ulp quantization residual is
    clamped at 0).

    Scale shape: one map-side-combined groupBy(row,col) corpus pass;
    marginals re-aggregate the value-domain cell table; two broadcast
    joins; one global agg. Same skeleton as chisq_independence — the
    two audits share their physical plan shape by design."""
    cells = (
        df.filter(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
        .groupBy(F.col(row_col).alias("ri"), F.col(col_col).alias("cj"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rows = cells.groupBy("ri").agg(F.sum("o").alias("r"))
    colsum = cells.groupBy("cj").agg(F.sum("o").alias("c"))
    dec = "decimal(38,0)"
    n_col = F.sum("o").over(Window.partitionBy())
    # ln of a double-division of exact integers, quantized per cell.
    joined = (
        cells.join(F.broadcast(rows), "ri")
        .join(F.broadcast(colsum), "cj")
        .withColumn("n", n_col)
        .withColumn(
            "lq",
            F.floor(
                F.log(
                    (F.col("n") * F.col("o")).cast("double")
                    / (F.col("r") * F.col("c")).cast("double")
                )
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            ).cast(dec),
        )
    )
    mi_s = joined.agg(
        F.coalesce(F.sum(F.col("o").cast(dec) * F.col("lq")), F.lit(0).cast(dec)).alias(
            "mi_sum"
        ),
        F.coalesce(F.sum("o"), F.lit(0)).cast(dec).alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
    )

    def entropy(marg: DataFrame, cnt_col: str) -> DataFrame:
        tot = F.sum(cnt_col).over(Window.partitionBy())
        lq = F.floor(
            F.log(F.col(cnt_col).cast("double") / F.col("__tot").cast("double"))
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        ).cast(dec)
        return (
            marg.withColumn("__tot", tot)
            .withColumn("lq", lq)
            .agg(
                F.coalesce(
                    -F.sum(F.col(cnt_col).cast(dec) * F.col("lq")), F.lit(0).cast(dec)
                ).alias(f"h_{cnt_col}_sum")
            )
        )

    out = (
        mi_s.crossJoin(F.broadcast(entropy(rows, "r")))
        .crossJoin(F.broadcast(entropy(colsum, "c")))
    )
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_cells").cast("long").alias("n_cells"),
        F.when(
            F.col("n") > 0,
            F.expr("greatest(mi_sum, cast(0 as decimal(38,0))) div n").cast("long"),
        ).alias("mi_micro"),
        F.when(
            F.col("n") > 0,
            F.expr("greatest(h_r_sum, cast(0 as decimal(38,0))) div n").cast("long"),
        ).alias("h_row_micro"),
        F.when(
            F.col("n") > 0,
            F.expr("greatest(h_c_sum, cast(0 as decimal(38,0))) div n").cast("long"),
        ).alias("h_col_micro"),
    )


def events_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: MI between event type and hour-of-day — how much the
    clock tells you about the traffic mix (the diurnal-pattern
    strength K47's weekday test screens on a different axis)."""
    events = load_table(spark, "events", sf_dir)
    df = events.select("event_type", F.hour("ts").alias("hr"))
    return mutual_information(df, "event_type", "hr")


EVENTS_MUTUAL_INFORMATION_SQL = """
WITH cells AS (
  SELECT event_type AS ri, EXTRACT(hour FROM ts) AS cj, CAST(COUNT(*) AS BIGINT) AS o
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
r AS (SELECT ri, SUM(o) AS r FROM cells GROUP BY 1),
c AS (SELECT cj, SUM(o) AS c FROM cells GROUP BY 1),
n AS (SELECT SUM(o) AS n, COUNT(*) AS n_cells FROM cells),
mi AS (
  SELECT COALESCE(SUM(CAST(cells.o AS HUGEINT)
           * CAST(FLOOR(LN(CAST(n.n * cells.o AS DOUBLE) / CAST(r.r * c.c AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT)), 0) AS mi_sum
  FROM cells JOIN r USING (ri) JOIN c USING (cj) CROSS JOIN n
),
hr AS (
  SELECT COALESCE(-SUM(CAST(r AS HUGEINT)
           * CAST(FLOOR(LN(CAST(r AS DOUBLE) / CAST((SELECT n FROM n) AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT)), 0) AS h_r_sum
  FROM r
),
hc AS (
  SELECT COALESCE(-SUM(CAST(c AS HUGEINT)
           * CAST(FLOOR(LN(CAST(c AS DOUBLE) / CAST((SELECT n FROM n) AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT)), 0) AS h_c_sum
  FROM c
)
SELECT CAST(COALESCE(n.n, 0) AS BIGINT) AS n,
       CAST(n.n_cells AS BIGINT) AS n_cells,
       CASE WHEN n.n > 0 THEN CAST(GREATEST(mi.mi_sum, 0) // n.n AS BIGINT) END AS mi_micro,
       CASE WHEN n.n > 0 THEN CAST(GREATEST(hr.h_r_sum, 0) // n.n AS BIGINT) END AS h_row_micro,
       CASE WHEN n.n > 0 THEN CAST(GREATEST(hc.h_c_sum, 0) // n.n AS BIGINT) END AS h_col_micro
FROM n CROSS JOIN mi CROSS JOIN hr CROSS JOIN hc
"""


# ─────────────── Welch's t-test (K50) ───────────────


def welch_t_test(
    df: DataFrame,
    key_col: str = "event_type",
    group_col_expr=None,
    val_col: str = "value",
) -> DataFrame:
    """Per-key Welch's unequal-variance t-test between the K36/K42/K43
    arms — the parametric mean comparison that does NOT assume equal
    variances (the Student pooled test's silent failure mode), closing
    the A/B family: K36 proportions, K42 location ranks, K43 CDF
    shape, K50 means.

    Exact sufficient statistics on the cent grid: per (key, arm) only
    (n, Σv, Σv²) in decimal(38,0) (Σv² is O(n·v²) — exact to ~10¹⁴
    rows at $10⁶ values). The single floating step is one fixed
    parenthesization of correctly-rounded IEEE ops (·, −, /, √):

        s²_i = (n_i·Σv²_i − (Σv_i)²) / (n_i·(n_i−1))   [sample var]
        t    = (mean_A − mean_B) / √(s²_A/n_A + s²_B/n_B)
        df   = (s²_A/n_A + s²_B/n_B)² /
               ((s²_A/n_A)²/(n_A−1) + (s²_B/n_B)²/(n_B−1))

    t and the Welch–Satterthwaite df land on the 1e-6 grid; arm with
    <2 rows or zero pooled variance → NULLs.

    Scale shape: ONE map-side-combined conditional aggregation over
    the corpus (count_if/sum over the arm predicate — no second scan,
    no join between arms), then arithmetic on a ≤keys-sized table."""
    if group_col_expr is None:
        group_col_expr = F.col("user_id") % 2 == 0
    dec = "decimal(38,0)"
    cents = F.round(F.col(val_col) * 100).cast("long")
    base = df.filter(F.col(val_col).isNotNull()).select(
        F.col(key_col).alias("key"), cents.alias("v"), group_col_expr.alias("is_a")
    )
    g = base.groupBy("key").agg(
        F.count_if(F.col("is_a")).alias("na"),
        F.count_if(~F.col("is_a")).alias("nb"),
        F.sum(F.when(F.col("is_a"), F.col("v"))).cast(dec).alias("sa"),
        F.sum(F.when(~F.col("is_a"), F.col("v"))).cast(dec).alias("sb"),
        F.sum(F.when(F.col("is_a"), F.col("v") * F.col("v"))).cast(dec).alias("qa"),
        F.sum(F.when(~F.col("is_a"), F.col("v") * F.col("v"))).cast(dec).alias("qb"),
    )
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    sad, sbd = F.col("sa").cast("double"), F.col("sb").cast("double")
    qad, qbd = F.col("qa").cast("double"), F.col("qb").cast("double")
    va = (nad * qad - sad * sad) / (nad * (nad - F.lit(1.0)))
    vb = (nbd * qbd - sbd * sbd) / (nbd * (nbd - F.lit(1.0)))
    sea = va / nad
    seb = vb / nbd
    se2 = sea + seb
    t = (sad / nad - sbd / nbd) / F.sqrt(se2)
    dfree = (se2 * se2) / (
        (sea * sea) / (nad - F.lit(1.0)) + (seb * seb) / (nbd - F.lit(1.0))
    )
    ok = (F.col("na") > 1) & (F.col("nb") > 1)
    return g.select(
        F.col("key").alias(key_col),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.when(ok & (se2 > 0), F.floor(t * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")).alias(
            "t_micro"
        ),
        F.when(
            ok & (se2 > 0),
            F.floor(dfree * F.lit(1_000_000.0) + F.lit(0.5)).cast("long"),
        ).alias("df_micro"),
    ).orderBy(key_col)


def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-type Welch's t between the user-parity arms — the
    parametric sibling of `events_ab_test`/`events_mannwhitney`."""
    events = load_table(spark, "events", sf_dir)
    return welch_t_test(events)


EVENTS_WELCH_TTEST_SQL = """
WITH base AS (
  SELECT event_type AS key, CAST(ROUND(value * 100) AS BIGINT) AS v,
         (user_id % 2 = 0) AS is_a
  FROM events
  WHERE value IS NOT NULL
),
g AS (
  SELECT key,
         CAST(COUNT(*) FILTER (WHERE is_a) AS HUGEINT) AS na,
         CAST(COUNT(*) FILTER (WHERE NOT is_a) AS HUGEINT) AS nb,
         CAST(SUM(v) FILTER (WHERE is_a) AS HUGEINT) AS sa,
         CAST(SUM(v) FILTER (WHERE NOT is_a) AS HUGEINT) AS sb,
         CAST(SUM(CAST(v AS HUGEINT) * v) FILTER (WHERE is_a) AS HUGEINT) AS qa,
         CAST(SUM(CAST(v AS HUGEINT) * v) FILTER (WHERE NOT is_a) AS HUGEINT) AS qb
  FROM base
  GROUP BY key
)
SELECT key AS event_type,
       CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CASE WHEN na > 1 AND nb > 1 AND
                 ((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0))) / CAST(na AS DOUBLE)
               + ((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))) / CAST(nb AS DOUBLE) > 0
            THEN CAST(FLOOR(((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                 / SQRT(((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0))) / CAST(na AS DOUBLE)
                      + ((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))) / CAST(nb AS DOUBLE)))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS t_micro,
       CASE WHEN na > 1 AND nb > 1 AND
                 ((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0))) / CAST(na AS DOUBLE)
               + ((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))) / CAST(nb AS DOUBLE) > 0
            THEN CAST(FLOOR((((((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE)) + ((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE))) * (((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE)) + ((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE))))
                 / (((((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE))) * (((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE)))) / (CAST(na AS DOUBLE) - 1.0)
                  + ((((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE))) * (((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE)))) / (CAST(nb AS DOUBLE) - 1.0)))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS df_micro
FROM g
ORDER BY event_type
"""


# ─────────────── Wald–Wolfowitz runs test (K52) ───────────────


def runs_test(
    df: DataFrame,
    key_col: str = "event_type",
    group_col_expr=None,
    order_cols: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """Per-key Wald–Wolfowitz runs test on the TIME ORDER of the A/B
    arm labels — the serial-randomness audit the rest of the A/B
    family assumes away: K36/K42/K43/K50 all treat the two arms as
    independent draws, which is false if assignment was batched
    (alternating too little) or round-robin (alternating too much).
    R = number of maximal same-arm runs in (ts, event_id) order;

        E[R]   = 1 + 2·n_A·n_B/n
        Var[R] = 2·n_A·n_B·(2·n_A·n_B − n) / (n²·(n−1))
        z      = (R − E[R]) / √Var[R]

    R is an exact integer: the per-key sequence position k comes from
    the two-pass keyed prefix (enum keys — a plain per-key window
    would one-task each key), and boundaries are counted by joining
    position k against k+1 on (key, k) — a fine-grained parallel
    equi-join, never a sequential scan. Moments are one fixed IEEE
    combination in doubles of exact decimal(38,0) products. Empty
    arm, n<2 or zero variance → NULL z.
    """
    if group_col_expr is None:
        group_col_expr = F.col("user_id") % 2 == 0
    base = df.select(
        F.col(key_col).alias("key"),
        *[F.col(c) for c in order_cols],
        group_col_expr.cast("int").alias("lab"),
    )
    laid = _keyed_prefix(base, list(order_cols), "lab")
    cur = laid.select("key", "k", F.col("lab").alias("l1"), "n", "t")
    nxt = laid.select("key", (F.col("k") - 1).alias("k"), F.col("lab").alias("l2"))
    bounds = (
        cur.join(nxt, ["key", "k"])
        .select("key", (F.col("l1") != F.col("l2")).cast("long").alias("chg"))
        .groupBy("key")
        .agg(F.sum("chg").alias("changes"))
    )
    g = (
        laid.groupBy("key")
        .agg(F.first("n").alias("n"), F.first("t").alias("n_a"))
        .join(bounds, "key", "left")
        .withColumn("runs", F.coalesce(F.col("changes"), F.lit(0)) + F.lit(1))
    )
    dec = "decimal(38,0)"
    na = F.col("n_a").cast(dec)
    nb = (F.col("n") - F.col("n_a")).cast(dec)
    nn = F.col("n").cast(dec)
    two_ab = F.lit(2).cast(dec) * na * nb
    e_num = two_ab  # E[R] = 1 + two_ab/n
    nad = na.cast("double")
    nbd = nb.cast("double")
    nd = nn.cast("double")
    tabd = two_ab.cast("double")
    e_r = F.lit(1.0) + tabd / nd
    var = (tabd * (tabd - nd)) / (nd * nd * (nd - F.lit(1.0)))
    z = (F.col("runs").cast("double") - e_r) / F.sqrt(var)
    ok = (F.col("n_a") > 0) & (F.col("n") > F.col("n_a")) & (F.col("n") > 1)
    return g.select(
        F.col("key").alias(key_col),
        F.col("n").cast("long").alias("n"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("runs").cast("long").alias("runs"),
        F.when(
            ok & (var > 0), F.floor(z * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
        ).alias("z_micro"),
    ).orderBy(key_col)


def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-type runs test of the user-parity arm sequence in
    event-time order — is the A/B interleave serially random."""
    events = load_table(spark, "events", sf_dir)
    return runs_test(events)


EVENTS_RUNS_TEST_SQL = """
WITH base AS (
  SELECT event_type AS key, ts, event_id,
         CAST(user_id % 2 = 0 AS INTEGER) AS lab
  FROM events
),
seq AS (
  SELECT key, lab,
         LAG(lab) OVER (PARTITION BY key ORDER BY ts, event_id) AS prev
  FROM base
),
g AS (
  SELECT key,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(lab) AS HUGEINT) AS n_a,
         CAST(1 + COUNT(*) FILTER (WHERE prev IS NOT NULL AND lab != prev) AS BIGINT) AS runs
  FROM seq
  GROUP BY key
)
SELECT key AS event_type,
       CAST(n AS BIGINT) AS n,
       CAST(n_a AS BIGINT) AS n_a,
       runs,
       CASE WHEN n_a > 0 AND n > n_a AND n > 1 AND
                 (CAST(2 * n_a * (n - n_a) AS DOUBLE) * (CAST(2 * n_a * (n - n_a) AS DOUBLE) - CAST(n AS DOUBLE)))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) > 0
            THEN CAST(FLOOR(((CAST(runs AS DOUBLE) - (1.0 + CAST(2 * n_a * (n - n_a) AS DOUBLE) / CAST(n AS DOUBLE)))
                 / SQRT((CAST(2 * n_a * (n - n_a) AS DOUBLE) * (CAST(2 * n_a * (n - n_a) AS DOUBLE) - CAST(n AS DOUBLE)))
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS z_micro
FROM g
ORDER BY event_type
"""


# ─────────────── Lorenz curve points (K56) ───────────────


def lorenz_points(df: DataFrame, key_col: str, n_points: int = 10) -> DataFrame:
    """Decile points of the Lorenz curve of per-key row counts — the
    CURVE behind K37's single Gini number (auditors plot L(p) to see
    WHERE the skew lives: a hockey-stick at the top decile is a
    hot-key problem, a uniform bow is organic spread).

    Exact construction: per-key counts ascend through the two-pass
    constant-key prefix layout (rank k, cumulative count cum, totals
    n/t all exact integers); decile d reads the prefix row at
    position p_d = max(1, (n·d) div n_points). Rather than joining a
    decile table on that non-equi condition (which plans as a
    BroadcastNestedLoopJoin — the r9 cartesian audit rightly flags
    it), each laid row computes the ≤n_points deciles that land on
    its position with filter(sequence(1, n_points)) and explodes —
    a narrow map over the laid table, NO join at all. Shares land on
    the exact integral-division ppm grid. The curve is tie-stable:
    equal counts sort arbitrarily BETWEEN engines, but cum at any
    fixed position is invariant over permutations of equal values
    (the prefix-sum-over-ties argument the layout documents).

    Scale shape: one map-side-combined groupBy(key) count, the
    bounded prefix layout over the KEY table (not the corpus), one
    O(n_points) filter per laid row. Output is n_points rows.
    The (count, key) order carries the key as tie-break, so the rank
    is a TOTAL order — engine-identical at every position, stronger
    than the tie-invariance the layout needs elsewhere."""
    counts = (
        df.groupBy(F.col(key_col).alias("kk"))
        .agg(F.count(F.lit(1)).alias("x"))
        .select(F.lit(1).alias("key"), "kk", "x")
    )
    laid = _keyed_prefix(counts, ["x", "kk"], "x")
    hits = F.expr(
        f"filter(sequence(1, {n_points}), "
        f"d -> greatest(1L, (n * cast(d as long)) div {n_points}) = k)"
    )
    return (
        laid.select(F.explode(hits).alias("decile"), "k", "cum", "n", "t")
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("k").cast("long").alias("n_keys_cum"),
            F.expr("k * 1000000 div n").cast("long").alias("pop_share_ppm"),
            F.expr("cum * 1000000 div t").cast("long").alias("mass_share_ppm"),
        )
        .orderBy("decile")
    )


def lineitem_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: Lorenz deciles of lineitem rows per supplier — the curve
    whose area K37 summarizes as the supplier Gini."""
    li = load_table(spark, "lineitem", sf_dir)
    return lorenz_points(li, "l_suppkey")


LINEITEM_LORENZ_CURVE_SQL = """
WITH counts AS (
  SELECT l_suppkey AS kk, CAST(COUNT(*) AS BIGINT) AS x FROM lineitem GROUP BY l_suppkey
),
laid AS (
  SELECT kk, x,
         ROW_NUMBER() OVER (ORDER BY x, kk) AS k,
         SUM(x) OVER (ORDER BY x, kk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         COUNT(*) OVER () AS n,
         SUM(x) OVER () AS t
  FROM counts
),
deciles AS (SELECT UNNEST(GENERATE_SERIES(1, 10)) AS decile)
SELECT CAST(d.decile AS BIGINT) AS decile,
       CAST(l.k AS BIGINT) AS n_keys_cum,
       CAST(l.k * 1000000 // l.n AS BIGINT) AS pop_share_ppm,
       CAST(l.cum * 1000000 // l.t AS BIGINT) AS mass_share_ppm
FROM laid l
JOIN deciles d ON l.k = GREATEST(1, (l.n * d.decile) // 10)
ORDER BY decile
"""


# ─────────────── Theil T inequality index (K59) ───────────────


def theil_index(df: DataFrame, key_col: str) -> DataFrame:
    """Theil T index of per-key row counts — the DECOMPOSABLE
    inequality measure next to K37's Gini and K56's Lorenz curve
    (Theil splits exactly into between-group + within-group terms, so
    a sharded audit can attribute skew to shards; Gini cannot):

        T = (1/n) Σ_i (x_i/μ)·ln(x_i/μ),  μ = t/n

    Grouping by COUNT VALUE first makes the fold value-domain-sized:
    per distinct count x, term = m_x·x·lq(x) with
    lq = ⌊ln(x·n/t)·10⁶ + ½⌋ (exact-integer ratio → one double ln →
    1e-6 grid, the K48 convention), then

        theil_micro = greatest(Σ term, 0) div t

    (T ≥ 0 mathematically; grid residue clamps). Scale: one map-side-
    combined groupBy(key) count, one groupBy(count) collapse, one
    scalar fold."""
    counts = df.groupBy(F.col(key_col).alias("kk")).agg(F.count(F.lit(1)).alias("x"))
    byval = counts.groupBy("x").agg(F.count(F.lit(1)).alias("m"))
    dec = "decimal(38,0)"
    tot = byval.agg(
        F.sum("m").cast(dec).alias("n"),
        F.sum(F.col("m").cast(dec) * F.col("x").cast(dec)).alias("t"),
    )
    lq = F.floor(
        F.log(
            (F.col("x").cast(dec) * F.col("n")).cast("double") / F.col("t").cast("double")
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast(dec)
    return (
        byval.crossJoin(F.broadcast(tot))
        .agg(
            F.coalesce(
                F.sum(F.col("m").cast(dec) * F.col("x").cast(dec) * lq), F.lit(0).cast(dec)
            ).alias("s"),
            F.first("n").alias("n"),
            F.first("t").alias("t"),
        )
        .select(
            F.col("n").cast("long").alias("n_keys"),
            F.col("t").cast("long").alias("n_rows"),
            F.when(
                F.col("t") > 0,
                F.expr("greatest(s, cast(0 as decimal(38,0))) div t"),
            )
            .cast("long")
            .alias("theil_micro"),
        )
    )


def lineitem_supplier_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: Theil T of lineitem rows per supplier — the decomposable
    companion to the supplier Gini (K37) and Lorenz deciles (K56)."""
    li = load_table(spark, "lineitem", sf_dir)
    return theil_index(li, "l_suppkey")


LINEITEM_SUPPLIER_THEIL_SQL = """
WITH counts AS (
  SELECT l_suppkey, CAST(COUNT(*) AS HUGEINT) AS x FROM lineitem GROUP BY l_suppkey
),
byval AS (
  SELECT x, CAST(COUNT(*) AS HUGEINT) AS m FROM counts GROUP BY x
),
tot AS (SELECT SUM(m) AS n, SUM(m * x) AS t FROM byval),
folded AS (
  SELECT COALESCE(SUM(m * x * CAST(FLOOR(LN(CAST(x * n AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT)), 0) AS s,
         MAX(n) AS n, MAX(t) AS t
  FROM byval CROSS JOIN tot
)
SELECT CAST(n AS BIGINT) AS n_keys,
       CAST(t AS BIGINT) AS n_rows,
       CASE WHEN t > 0 THEN CAST(GREATEST(s, 0) // t AS BIGINT) END AS theil_micro
FROM folded
"""


# ─────────────── K61: ABC (Pareto) classification ───────────────

#: Cumulative revenue-share boundaries (ppm): A ≤ 80%, B ≤ 95%, C rest.
ABC_A_PPM = 800_000
ABC_B_PPM = 950_000


def abc_classification(
    df: DataFrame, key_col: str, cents_col
) -> DataFrame:
    """ABC / Pareto inventory classification of keys by value mass:
    rank keys by revenue DESC, class A = keys inside the first 80% of
    cumulative revenue, B to 95%, C the tail — the stock-policy
    operator behind "20% of parts are 80% of the money" (the acting
    sibling of K56's Lorenz CURVE: same prefix machinery, but the
    output is the classification a planner applies).

    Exact: per-key cents through the constant-key two-pass prefix in
    (−revenue, key) total order; class boundaries compared in pure
    integers (cum·10⁶ ≤ t·boundary — no division, no knife-edge).
    Output is the 3-row class summary (n_keys, revenue, exact ppm
    share of keys and revenue)."""
    counts = (
        df.groupBy(F.col(key_col).alias("kk"))
        .agg(F.sum(cents_col).alias("x"))
        .select(F.lit(1).alias("key"), "kk", F.col("x").cast("long").alias("x"))
        .withColumn("negx", -F.col("x"))
    )
    laid = _keyed_prefix(counts, ["negx", "kk"], "x")
    dec = "decimal(38,0)"
    cls = (
        F.when(
            F.col("cum").cast(dec) * F.lit(1_000_000).cast(dec)
            <= F.col("t").cast(dec) * F.lit(ABC_A_PPM).cast(dec),
            F.lit("A"),
        )
        .when(
            F.col("cum").cast(dec) * F.lit(1_000_000).cast(dec)
            <= F.col("t").cast(dec) * F.lit(ABC_B_PPM).cast(dec),
            F.lit("B"),
        )
        .otherwise(F.lit("C"))
    )
    return (
        laid.withColumn("abc_class", cls)
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("x").alias("revenue_cents"),
            F.first("n").alias("n_all"),
            F.first("t").alias("t_all"),
        )
        .select(
            "abc_class",
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("revenue_cents").cast("long").alias("revenue_cents"),
            F.expr("n_keys * 1000000 div n_all").cast("long").alias("key_share_ppm"),
            F.expr(
                "(cast(revenue_cents as decimal(38,0)) * 1000000) div cast(t_all as decimal(38,0))"
            )
            .cast("long")
            .alias("revenue_share_ppm"),
        )
        .orderBy("abc_class")
    )


def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: ABC classes of parts by lineitem revenue — the
    80/15/5 stock policy table."""
    li = load_table(spark, "lineitem", sf_dir)
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return abc_classification(li, "l_partkey", rev)


PARTS_ABC_CLASSIFICATION_SQL = f"""
WITH counts AS (
  SELECT l_partkey AS kk,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS x
  FROM lineitem GROUP BY l_partkey
),
laid AS (
  SELECT kk, x,
         SUM(x) OVER (ORDER BY -x, kk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         COUNT(*) OVER () AS n,
         SUM(x) OVER () AS t
  FROM counts
),
classed AS (
  SELECT *,
         CASE WHEN CAST(cum AS HUGEINT) * 1000000 <= CAST(t AS HUGEINT) * {ABC_A_PPM} THEN 'A'
              WHEN CAST(cum AS HUGEINT) * 1000000 <= CAST(t AS HUGEINT) * {ABC_B_PPM} THEN 'B'
              ELSE 'C' END AS abc_class
  FROM laid
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(x) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) * 1000000 // MAX(n) AS BIGINT) AS key_share_ppm,
       CAST((CAST(SUM(x) AS HUGEINT) * 1000000) // CAST(MAX(t) AS HUGEINT) AS BIGINT) AS revenue_share_ppm
FROM classed
GROUP BY abc_class
ORDER BY abc_class
"""


# ─────────────── K64: market concentration (HHI + CRk) ───────────────


def market_concentration(df: DataFrame, key_col: str, cents_col) -> DataFrame:
    """Herfindahl–Hirschman index + 4/8-firm concentration ratios of a
    revenue column — the antitrust-style concentration read next to
    the skew family (K37 Gini and K56 Lorenz measure inequality of the
    whole distribution; HHI and CRk are what a risk/compliance review
    quotes: DOJ calls > 0.25 'highly concentrated').

    Exactness without per-entity truncation: HHI = Σ(xᵢ/t)² =
    (Σ xᵢ²)/t² — numerator and denominator exact DECIMAL(38,0), ONE
    integral division onto the ppm grid (cents² · entities stays
    under 10³⁸ through ~10⁹ entities at 10⁹-cent books). CRk sums the
    top-k revenues under a (x desc, key) TOTAL order — a TakeOrdered,
    never a global sort — over one more integral division each.

    Shape: one map-side-combined groupBy(key); the Σx²/t/n aggregate
    and the 8-row top table cross as 1-row broadcasts."""
    dec = "decimal(38,0)"
    rev = df.groupBy(F.col(key_col).alias("kk")).agg(
        F.sum(cents_col).cast(dec).alias("x")
    )
    agg = rev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("t"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    top8 = rev.orderBy(F.col("x").desc(), F.col("kk").asc()).limit(8)
    w = Window.orderBy(F.col("x").desc(), F.col("kk").asc())
    tops = (
        top8.withColumn("rn", F.row_number().over(w))
        .agg(
            F.coalesce(F.sum(F.when(F.col("rn") <= 4, F.col("x"))), F.lit(0).cast(dec)).alias(
                "s4"
            ),
            F.coalesce(F.sum("x"), F.lit(0).cast(dec)).alias("s8"),
        )
    )
    return agg.crossJoin(F.broadcast(tops)).select(
        F.col("n").cast("long").alias("n_entities"),
        F.col("t").cast("long").alias("total_cents"),
        F.expr("cast((sx2 * 1000000) div (t * t) as long)").alias("hhi_ppm"),
        F.expr("cast((s4 * 1000000) div t as long)").alias("cr4_ppm"),
        F.expr("cast((s8 * 1000000) div t as long)").alias("cr8_ppm"),
    )


def customer_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: HHI + CR4/CR8 of order revenue across customers."""
    orders = load_table(spark, "orders", sf_dir)
    return market_concentration(
        orders, "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long")
    )


CUSTOMER_CONCENTRATION_SQL = """
WITH rev AS (
  SELECT o_custkey AS kk,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS x
  FROM orders GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS t, SUM(x * x) AS sx2 FROM rev
),
top AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, kk ASC) AS rn
  FROM rev ORDER BY x DESC, kk ASC LIMIT 8
),
tops AS (
  SELECT COALESCE(SUM(CASE WHEN rn <= 4 THEN x END), 0) AS s4,
         COALESCE(SUM(x), 0) AS s8
  FROM top
)
SELECT n AS n_entities,
       CAST(t AS BIGINT) AS total_cents,
       CAST((sx2 * 1000000) // (t * t) AS BIGINT) AS hhi_ppm,
       CAST((s4 * 1000000) // t AS BIGINT) AS cr4_ppm,
       CAST((s8 * 1000000) // t AS BIGINT) AS cr8_ppm
FROM agg CROSS JOIN tops
"""


# ─────────────── K65: Kruskal–Wallis H (multi-arm rank test) ───────────────


def kruskal_wallis(df: DataFrame, arm_col, cents_col) -> DataFrame:
    """Kruskal–Wallis H — the k-SAMPLE member that completes the A/B
    test family (K36 two proportions, K42 two-sample ranks, K43 CDF
    shape, K50 means, K52 runs): 'do these k groups share one value
    distribution?', valid under skew where a k-way ANOVA is not.
    Pairwise Mann–Whitney over k arms inflates false positives
    k(k−1)/2-fold; KW is the one-shot gate run BEFORE any pairwise
    drill-down.

    Rank machinery is K42's, globalized: ranks never materialize —
    per distinct cent value only (t_v, per-arm a_jv) counts plus the
    cumulative count before each value (the constant-key two-pass
    prefix over the VALUE DOMAIN), midrank ties carried DOUBLED so
    2·R_j = Σ a_jv·(2·before_v + t_v + 1) stays an exact
    DECIMAL(38,0) (documented ~10⁹-row exactness bound, the K44
    convention). Σ R_j²/n_j accumulates as per-arm exact integral
    divisions q_j = (2R_j)² div (4·n_j) — deterministic truncation
    < 1 per arm against an O(n³/k) term. H and the tie-corrected H
    are each ONE fixed-parenthesization IEEE combination over doubles
    of those exact integers; all-tied data (C = 0) → NULL.

    Shape: one corpus scan → (arm × value) and value-domain counts,
    the bounded prefix layout, arm-sized folds, 1-row output."""
    dec = "decimal(38,0)"
    base = df.select(
        F.col(arm_col).alias("arm"), cents_col.alias("cents")
    ).filter(F.col("cents").isNotNull())
    dom = (
        base.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("tv"))
        .select(F.lit(1).alias("key"), "cents", "tv")
    )
    armcnt = base.groupBy("arm", "cents").agg(F.count(F.lit(1)).cast(dec).alias("av"))
    pre = _keyed_prefix(dom, ["cents"], "tv")
    before = (F.col("cum") - F.col("tv")).cast(dec)
    arms = (
        armcnt.join(pre.select("cents", F.col("tv").cast(dec).alias("tvd"), before.alias("bef")), "cents")
        .withColumn(
            "r2_term",
            F.col("av")
            * (F.lit(2).cast(dec) * F.col("bef") + F.col("tvd") + F.lit(1).cast(dec)),
        )
        .groupBy("arm")
        .agg(F.sum("av").alias("nj"), F.sum("r2_term").alias("r2j"))
        # per-arm Σ R_j²/n_j on the 1e-6 grid: the unscaled div's
        # ≤1-per-arm truncation is magnified by 12/(n(n+1)) into a
        # visible artifact at small n (all-tied 4 rows → H = −0.6).
        # `div` on decimals returns LONG (overflows at sf0.1 under
        # ANSI: qj ~ n³·10⁶/k > 2⁶³), so floor-divide IN DECIMAL via
        # mod-subtract-divide — the quotient is an exact integer, so
        # the decimal division is exact, no rounding corner.
        # Exactness bound: r2j²·10⁶ ≤ 4e6·n⁴ needs n ≲ 7·10⁷ non-null
        # rows before decimal(38,0) overflow errors (ANSI-loud), the
        # K44-style documented-bound convention.
        .withColumn(
            "qj",
            F.expr(
                "cast(((r2j * r2j * 1000000) - pmod(r2j * r2j * 1000000, 4 * nj))"
                " / (4 * nj) as decimal(38,0))"
            ),
        )
    )
    ties = dom.agg(
        F.sum(
            F.col("tv").cast(dec) * F.col("tv").cast(dec) * F.col("tv").cast(dec)
            - F.col("tv").cast(dec)
        ).alias("tie_sum")
    )
    tot = arms.agg(
        F.sum("nj").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("qj").alias("s"),
    ).crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double") / F.lit(1.0e6)
    tied = F.col("tie_sum").cast("double")
    h = F.lit(12.0) * sd / (nd * (nd + F.lit(1.0))) - F.lit(3.0) * (nd + F.lit(1.0))
    c = F.lit(1.0) - tied / (nd * nd * nd - nd)
    return tot.select(
        F.col("n").cast("long").alias("n_obs"),
        F.col("k").cast("long").alias("n_groups"),
        F.floor(h * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias("h_micro"),
        F.when(c > 0, F.floor(h / c * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")).alias(
            "h_corrected_micro"
        ),
    )


def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: KW H of event value across event types (k arms)."""
    events = load_table(spark, "events", sf_dir)
    return kruskal_wallis(
        events.filter(F.col("value").isNotNull()),
        "event_type",
        F.round(F.col("value") * 100).cast("long"),
    )


EVENTS_KRUSKAL_WALLIS_SQL = """
WITH base AS (
  SELECT event_type AS arm, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
dom AS (
  SELECT cents, CAST(COUNT(*) AS HUGEINT) AS tv FROM base GROUP BY cents
),
pre AS (
  SELECT cents, tv,
         SUM(tv) OVER (ORDER BY cents) - tv AS bef
  FROM dom
),
armcnt AS (
  SELECT arm, cents, CAST(COUNT(*) AS HUGEINT) AS av FROM base GROUP BY arm, cents
),
arms AS (
  SELECT arm, SUM(av) AS nj,
         SUM(av * (2 * bef + tv + 1)) AS r2j
  FROM armcnt JOIN pre USING (cents)
  GROUP BY arm
),
folded AS (
  SELECT SUM(nj) AS n, COUNT(*) AS k,
         SUM((r2j * r2j * 1000000) // (4 * nj)) AS s
  FROM arms
),
ties AS (SELECT SUM(tv * tv * tv - tv) AS tie_sum FROM dom)
SELECT CAST(n AS BIGINT) AS n_obs,
       CAST(k AS BIGINT) AS n_groups,
       CAST(FLOOR((12.0 * (CAST(s AS DOUBLE) / 1000000.0) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                   - 3.0 * (CAST(n AS DOUBLE) + 1.0)) * 1000000.0 + 0.5) AS BIGINT) AS h_micro,
       CASE WHEN (1.0 - CAST(tie_sum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))) > 0
            THEN CAST(FLOOR((12.0 * (CAST(s AS DOUBLE) / 1000000.0) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                             - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                            / (1.0 - CAST(tie_sum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
                            * 1000000.0 + 0.5) AS BIGINT)
       END AS h_corrected_micro
FROM folded CROSS JOIN ties
"""


# ─────────────── Cliff's delta effect size (K67) ───────────────


def cliffs_delta(
    df: DataFrame,
    key_col: str = "event_type",
    group_col_expr=None,
    val_col: str = "value",
) -> DataFrame:
    """Per-key Cliff's delta between the K36/K42 arms — the EFFECT
    SIZE the Mann–Whitney p-value refuses to be: δ = P(a > b) −
    P(a < b) over all cross-arm pairs, the dominance probability
    difference ([-1, 1]; sign = which arm runs higher). At data scale
    every test is "significant"; δ is the number that says whether
    anyone should care.

    Exactly derivable from K42's doubled-U: with U counting ties half,
    2U_A = 2·#(a>b) + #ties and n_A·n_B = #(a>b) + #(a<b) + #ties, so
    δ = (2U_A − n_A·n_B) / (n_A·n_B) — no new scan shape. Floor-safety
    on negatives: δ_ppm = (2U_A·10⁶ div n_A·n_B) − 10⁶ (the dividend
    is non-negative, and shifting by an integer multiple of the
    denominator commutes with floor — both engines stay exact without
    ever floor-dividing a negative). The |δ| magnitude label uses
    Romano et al.'s conventional cuts (0.147/0.33/0.474) on the
    IDENTICAL integer δ_ppm, so it can never disagree between engines.

    Scale: same as K42 — one (key, cents) value-domain aggregation,
    the two-pass keyed prefix, one ≤keys agg."""
    if group_col_expr is None:
        group_col_expr = F.col("user_id") % 2 == 0
    cents = F.round(F.col(val_col) * 100).cast("long")
    cnt = (
        df.filter(F.col(val_col).isNotNull())
        .select(F.col(key_col).alias("key"), cents.alias("cents"), group_col_expr.alias("is_a"))
        .groupBy("key", "cents")
        .agg(
            F.count(F.lit(1)).alias("tv"),
            F.count_if(F.col("is_a")).alias("av"),
        )
    )
    pre = _keyed_prefix(cnt, ["cents"], "tv")
    dec = "decimal(38,0)"
    before = (F.col("cum") - F.col("tv")).cast(dec)
    term = F.col("av").cast(dec) * (
        F.lit(2).cast(dec) * before + F.col("tv").cast(dec) + F.lit(1).cast(dec)
    )
    g = (
        pre.withColumn("r2a_term", term)
        .groupBy("key")
        .agg(
            F.first("t").alias("n_rows"),
            F.sum("av").alias("n_a"),
            F.sum("r2a_term").alias("r2a"),
        )
    )
    na = F.col("n_a").cast(dec)
    nn = F.col("n_rows").cast(dec)
    nb_d = nn - na
    out = g.select(
        F.col("key"),
        F.col("n_a").cast("long").alias("n_a"),
        nb_d.cast("long").alias("n_b"),
        F.when(
            (na > 0) & (nb_d > 0),
            F.expr(
                "(r2a - cast(n_a as decimal(38,0)) * (cast(n_a as decimal(38,0)) + 1))"
                " * 1000000 div (cast(n_a as decimal(38,0))"
                " * (cast(n_rows as decimal(38,0)) - cast(n_a as decimal(38,0))))"
            )
            - F.lit(1_000_000),
        )
        .cast("long")
        .alias("delta_ppm"),
    )
    mag = F.abs(F.col("delta_ppm"))
    return out.withColumn(
        "magnitude",
        F.when(F.col("delta_ppm").isNull(), F.lit(None).cast("string"))
        .when(mag < 147_000, F.lit("negligible"))
        .when(mag < 330_000, F.lit("small"))
        .when(mag < 474_000, F.lit("medium"))
        .otherwise(F.lit("large")),
    ).orderBy("key")


def events_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (K67): per-type Cliff's delta of event value between the
    user-parity arms — the effect-size companion of K42's U test."""
    events = load_table(spark, "events", sf_dir)
    return cliffs_delta(events).withColumnRenamed("key", "event_type")


EVENTS_CLIFFS_DELTA_SQL = """
WITH cnt AS (
  SELECT event_type AS key, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS tv,
         CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS av
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
pre AS (
  SELECT key, tv, av,
         SUM(tv) OVER (PARTITION BY key ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv AS before_v
  FROM cnt
),
g AS (
  SELECT key,
         CAST(SUM(tv) AS HUGEINT) AS n_rows,
         CAST(SUM(av) AS HUGEINT) AS n_a,
         SUM(CAST(av AS HUGEINT) * (2 * CAST(before_v AS HUGEINT) + CAST(tv AS HUGEINT) + 1)) AS r2a
  FROM pre
  GROUP BY key
),
d AS (
  SELECT key,
         CAST(n_a AS BIGINT) AS n_a,
         CAST(n_rows - n_a AS BIGINT) AS n_b,
         CASE WHEN n_a > 0 AND n_rows - n_a > 0
              THEN CAST((r2a - n_a * (n_a + 1)) * 1000000
                        // (n_a * (n_rows - n_a)) - 1000000 AS BIGINT)
         END AS delta_ppm
  FROM g
)
SELECT key AS event_type, n_a, n_b, delta_ppm,
       CASE WHEN delta_ppm IS NULL THEN NULL
            WHEN ABS(delta_ppm) < 147000 THEN 'negligible'
            WHEN ABS(delta_ppm) < 330000 THEN 'small'
            WHEN ABS(delta_ppm) < 474000 THEN 'medium'
            ELSE 'large'
       END AS magnitude
FROM d
ORDER BY event_type
"""


# ─────────────── K69: Benjamini–Hochberg FDR over the A/B family ───────────────

BH_ALPHA = 0.05
BH_MAX_M = 8  # threshold table covers up to 8 simultaneous tests

#: z*(m, k) = Φ⁻¹(1 − α·k/(2m)) on the micro grid — the two-sided
#: z-threshold equivalent of the BH bound p_(k) ≤ α·k/m, precomputed
#: ONCE here (stdlib NormalDist) and embedded as literals in BOTH
#: engines (the anchor-constant policy): |z| comparisons against a
#: shared integer table keep Φ out of both plans entirely, so the
#: step-up decision is exact integer logic.
import statistics as _statistics

BH_Z_MICRO = {
    (m, k): int(
        round(
            _statistics.NormalDist().inv_cdf(1.0 - BH_ALPHA * k / (2.0 * m)) * 1_000_000
        )
    )
    for m in range(1, BH_MAX_M + 1)
    for k in range(1, m + 1)
}


def bh_fdr(tests: DataFrame, key_col: str, z_micro_col: str) -> DataFrame:
    """K69: Benjamini–Hochberg step-up over a family of z-tests — the
    multiple-testing layer every per-type A/B table needs before
    anyone acts on it (at data scale, 1-in-20 "significant" types are
    free; BH caps the expected FALSE-DISCOVERY share at α instead of
    the per-test error). Tests ranked by |z| DESC (p ASC), the BH
    bound p_(k) ≤ α·k/m applied as |z|_(k) ≥ z*(m, k) against the
    literal BH_Z_MICRO table, and every rank ≤ the LARGEST passing k
    is rejected (step-up: a test can be carried over the line by a
    stronger one below it — the defining BH behavior).

    Scale: the family table is test-domain-sized (≤ types); the rank
    window and the 1-row k* scalar are bounded by construction."""
    from pyspark.sql import Window

    base = tests.select(
        F.col(key_col).alias("key"), F.col(z_micro_col).alias("z_micro")
    ).filter(F.col("z_micro").isNotNull())
    w = Window.orderBy(F.abs(F.col("z_micro")).desc(), F.col("key").asc())
    m_row = base.agg(F.count(F.lit(1)).alias("m"))
    thr = F.coalesce(
        *[
            F.when(
                (F.col("m") == m) & (F.col("rank") == k), F.lit(z)
            )
            for (m, k), z in sorted(BH_Z_MICRO.items())
        ],
        F.lit(None).cast("long"),
    )
    ranked = (
        base.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(m_row))
        .withColumn("threshold_micro", thr.cast("long"))
        .withColumn(
            "passes", F.abs(F.col("z_micro")) >= F.col("threshold_micro")
        )
    )
    kstar = ranked.agg(
        F.coalesce(F.max(F.when(F.col("passes"), F.col("rank"))), F.lit(0)).alias("k_star")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            F.col("key"),
            F.col("z_micro").cast("long").alias("z_micro"),
            F.col("rank").cast("int").alias("rank"),
            "threshold_micro",
            (F.col("rank") <= F.col("k_star")).alias("rejected"),
        )
        .orderBy("rank")
    )


def events_ab_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (K69): BH step-up at α=0.05 over the per-type two-
    proportion z family (K36) — which event types survive
    multiple-testing correction."""
    return bh_fdr(events_ab_test(spark, sf_dir), "event_type", "z_micro").withColumnRenamed(
        "key", "event_type"
    )


def _bh_threshold_case() -> str:
    arms = " ".join(
        f"WHEN m = {m} AND rank = {k} THEN {z}"
        for (m, k), z in sorted(BH_Z_MICRO.items())
    )
    return f"CASE {arms} END"


EVENTS_AB_FDR_SQL = f"""
WITH zt AS (
{EVENTS_AB_TEST_SQL}
),
fdr_base AS (SELECT event_type AS key, z_micro FROM zt WHERE z_micro IS NOT NULL),
ranked AS (
  SELECT key, z_micro,
         CAST(ROW_NUMBER() OVER (ORDER BY ABS(z_micro) DESC, key ASC) AS INTEGER) AS rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM fdr_base
),
thr AS (
  SELECT key, z_micro, rank,
         CAST({_bh_threshold_case()} AS BIGINT) AS threshold_micro
  FROM ranked
),
ks AS (
  SELECT COALESCE(MAX(CASE WHEN ABS(z_micro) >= threshold_micro THEN rank END), 0) AS k_star
  FROM thr
)
SELECT key AS event_type, z_micro, rank, threshold_micro,
       rank <= (SELECT k_star FROM ks) AS rejected
FROM thr
ORDER BY rank
"""


# ─────────────── K70: Cramér–von Mises two-sample test ───────────────

CVM_CRIT_05_MICRO = 461_000  # asymptotic 5% point of T (Anderson 1962)
CVM_FLOOR_SHIFT = 10  # T > −10 always; shifts the floor onto positives


def cvm_two_sample(
    df: DataFrame,
    key_col: str = "event_type",
    group_col_expr=None,
    val_col: str = "value",
) -> DataFrame:
    """Per-key two-sample Cramér–von Mises T between the K36/K42 arms
    — the INTEGRATED-distance member of the A/B family: KS (K43) takes
    the supremum of the CDF gap (one point decides), CvM integrates
    the squared gap over the whole distribution, so it fires on
    accumulated small deviations KS is blind to. Anderson's rank form:
    T = U/(N·n·m) − (4nm−1)/(6N) with
    U = n·Σᵢ(rᵢ−i)² + m·Σⱼ(sⱼ−j)² over pooled midranks.

    Exact with ties, no per-row ranks: midranks are half-integers, so
    everything is carried DOUBLED (the K42 discipline) and each tied
    block's contribution has a CLOSED FORM — for a block of a members
    at doubled midrank R with beforeA members of the arm below it,
    Σₖ₌₁..ₐ(R − 2·(beforeA+k))² = (3aC² − 6C·a(a+1) + 2a(a+1)(2a+1))/3
    with C = R − 2·beforeA — so the whole statistic folds over the
    value-domain table: 12U = n·Σ3A + m·Σ3B exactly. The final ratio
    lands once: t_micro = (num + 10·den) div den − 10 with
    num = (12U − 2nm(4nm−1))·10⁶ and den = 12·N·n·m — T can be
    slightly negative, and the +10·den shift keeps the floor division
    on positives where both engines agree (the K67 trick).
    DECIMAL(38,0) bound: 12U·10⁶ ~ N⁴·10⁶ — exact to ~10⁸ rows per
    key (same documented class as K43's n² bound).

    Scale: one (key, cents) value-domain aggregation, the multi-column
    two-pass keyed prefix, one ≤keys agg."""
    if group_col_expr is None:
        group_col_expr = F.col("user_id") % 2 == 0
    cents = F.round(F.col(val_col) * 100).cast("long")
    cnt = (
        df.filter(F.col(val_col).isNotNull())
        .select(F.col(key_col).alias("key"), cents.alias("cents"), group_col_expr.alias("is_a"))
        .groupBy("key", "cents")
        .agg(
            F.count(F.lit(1)).alias("tv"),
            F.count_if(F.col("is_a")).alias("av"),
        )
    )
    pre = _keyed_prefix(cnt, ["cents"], ["tv", "av"])
    dec = "decimal(38,0)"

    def block3(c, a):
        # 3·Σ_{k=1..a} (C − 2k)² as exact decimals
        return (
            F.lit(3).cast(dec) * a * c * c
            - F.lit(6).cast(dec) * c * a * (a + 1)
            + F.lit(2).cast(dec) * a * (a + 1) * (2 * a + 1)
        )

    before = (F.col("cum_tv") - F.col("tv")).cast(dec)
    before_a = (F.col("cum_av") - F.col("av")).cast(dec)
    before_b = before - before_a
    r2 = F.lit(2).cast(dec) * before + F.col("tv").cast(dec) + F.lit(1).cast(dec)
    av = F.col("av").cast(dec)
    bv = F.col("tv").cast(dec) - av
    terms = pre.select(
        "key",
        F.col("t_tv").alias("nn"),
        F.col("t_av").alias("na"),
        block3(r2 - F.lit(2).cast(dec) * before_a, av).alias("s3a"),
        block3(r2 - F.lit(2).cast(dec) * before_b, bv).alias("s3b"),
    )
    g = terms.groupBy("key").agg(
        F.first("nn").cast(dec).alias("nn"),
        F.first("na").cast(dec).alias("na"),
        F.sum("s3a").alias("s3a"),
        F.sum("s3b").alias("s3b"),
    )
    shift = CVM_FLOOR_SHIFT
    out = g.select(
        "key",
        F.col("na").cast("long").alias("n_a"),
        (F.col("nn") - F.col("na")).cast("long").alias("n_b"),
        F.when(
            (F.col("na") > 0) & (F.col("nn") > F.col("na")),
            F.expr(
                f"((na * s3a + (nn - na) * s3b"
                f"   - 2 * na * (nn - na) * (4 * na * (nn - na) - 1)) * 1000000"
                f" + {shift} * (12 * nn * na * (nn - na)))"
                f" div (12 * nn * na * (nn - na)) - {shift}"
            ),
        )
        .cast("long")
        .alias("t_micro"),
    )
    return out.withColumn(
        "significant_05",
        F.when(F.col("t_micro").isNull(), F.lit(None).cast("boolean")).otherwise(
            F.col("t_micro") >= CVM_CRIT_05_MICRO
        ),
    ).orderBy("key")


def events_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (K70): per-type Cramér–von Mises T of event value between
    the user-parity arms — the integrated-CDF member beside K43's KS."""
    events = load_table(spark, "events", sf_dir)
    return cvm_two_sample(events).withColumnRenamed("key", "event_type")


EVENTS_CVM_TEST_SQL = f"""
WITH cnt AS (
  SELECT event_type AS key, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS tv,
         CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS av
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
pre AS (
  SELECT key, tv, av,
         SUM(tv) OVER w - tv AS before_t,
         SUM(av) OVER w - av AS before_a
  FROM cnt
  WINDOW w AS (PARTITION BY key ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
terms AS (
  SELECT key, tv, av,
         2 * CAST(before_t AS HUGEINT) + tv + 1 AS r2,
         CAST(before_a AS HUGEINT) AS ba,
         CAST(before_t - before_a AS HUGEINT) AS bb
  FROM pre
),
blocks AS (
  SELECT key, tv, av,
         (3 * CAST(av AS HUGEINT) * (r2 - 2*ba) * (r2 - 2*ba)
          - 6 * (r2 - 2*ba) * CAST(av AS HUGEINT) * (av + 1)
          + 2 * CAST(av AS HUGEINT) * (av + 1) * (2*av + 1)) AS s3a,
         (3 * CAST(tv - av AS HUGEINT) * (r2 - 2*bb) * (r2 - 2*bb)
          - 6 * (r2 - 2*bb) * CAST(tv - av AS HUGEINT) * ((tv - av) + 1)
          + 2 * CAST(tv - av AS HUGEINT) * ((tv - av) + 1) * (2*(tv - av) + 1)) AS s3b
  FROM terms
),
g AS (
  SELECT key,
         CAST(SUM(tv) AS HUGEINT) AS nn,
         CAST(SUM(av) AS HUGEINT) AS na,
         SUM(s3a) AS s3a, SUM(s3b) AS s3b
  FROM blocks GROUP BY key
),
d AS (
  SELECT key,
         CAST(na AS BIGINT) AS n_a,
         CAST(nn - na AS BIGINT) AS n_b,
         CASE WHEN na > 0 AND nn > na
              THEN CAST(((na * s3a + (nn - na) * s3b
                          - 2 * na * (nn - na) * (4 * na * (nn - na) - 1)) * 1000000
                         + {CVM_FLOOR_SHIFT} * (12 * nn * na * (nn - na)))
                        // (12 * nn * na * (nn - na)) - {CVM_FLOOR_SHIFT} AS BIGINT)
         END AS t_micro
  FROM g
)
SELECT key AS event_type, n_a, n_b, t_micro,
       CASE WHEN t_micro IS NULL THEN NULL
            ELSE t_micro >= {CVM_CRIT_05_MICRO} END AS significant_05
FROM d
ORDER BY event_type
"""
