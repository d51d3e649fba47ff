"""Per-key sequence feature engineering — the standard "make a
training row out of an event stream" transform (lag/lead values,
rolling sums, inter-arrival gaps, per-key sequence index).

This is the feature-extraction step a behavioural-model pipeline runs
right before training: one window shuffle keyed by the entity,
everything else computed inside the sorted partition with running
frames (no full-partition materialization, no self-joins).

Scale shape: ONE shuffle on ``user_id`` serves every feature — all
window specs share the same (partition, order) so Catalyst plans a
single Sort+Window over a single Exchange. Rolling frames are
rows-bounded (3 rows), so state per key is O(1) regardless of how
long a user's history grows. At 100 TB the plan is scan → exchange
(by key) → sort-within-partition → one Window operator.

Determinism: values ride a 1e-6 integer micro-grid (the repo-wide
convention, see analytics/timeseries.py) and the window order has a
total tie-break (ts, event_id), so every engine reproduces identical
rows bit-for-bit.

No reference analog (`/root/reference` has no sequence-feature ops);
brief-mandated beyond-reference training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.catalog import load_table


def sequence_features(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
) -> DataFrame:
    """Append per-key sequence features to an event frame:

    - ``seq``          1-based index of the event in its key's history
    - ``v_micro``      value on the exact 1e-6 integer grid
    - ``prev_v_micro`` previous event's value (null at history start)
    - ``gap_us``       exact microseconds since the previous event (null at start)
    - ``roll3_sum_micro`` sum of the last 3 values including current
    - ``run_max_micro``   running max of the value so far

    All features share one (key, order) window → one shuffle total.
    """
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    w3 = w.rowsBetween(-2, Window.currentRow)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v_micro = F.round(F.col(val_col) * 1_000_000).cast("long")
    ep = F.unix_micros(F.col(ts_col))
    return (
        df.withColumn("v_micro", v_micro)
        .withColumn("seq", F.row_number().over(w))
        .withColumn("prev_v_micro", F.lag("v_micro").over(w))
        .withColumn("gap_us", ep - F.lag(ep).over(w))
        .withColumn("roll3_sum_micro", F.sum("v_micro").over(w3))
        .withColumn("run_max_micro", F.max("v_micro").over(wrun))
    )


def events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the full sequence-feature row for every event, keyed by
    user — the exact frame a next-event / churn model trains on."""
    events = load_table(spark, "events", sf_dir)
    out = sequence_features(events.filter(F.col("value").isNotNull()))
    return out.select(
        "user_id",
        "event_id",
        F.col("seq").cast("int").alias("seq"),
        "v_micro",
        "prev_v_micro",
        "gap_us",
        "roll3_sum_micro",
        "run_max_micro",
    ).orderBy("user_id", "seq")


EVENTS_LAG_FEATURES_SQL = """
WITH base AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 1000000) AS BIGINT) AS v_micro
  FROM events
  WHERE value IS NOT NULL
)
SELECT user_id, event_id,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS seq,
       v_micro,
       LAG(v_micro) OVER w AS prev_v_micro,
       EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w AS gap_us,
       CAST(SUM(v_micro) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3_sum_micro,
       MAX(v_micro) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max_micro
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, seq
"""


def type_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix of ``type_col`` within each
    key's ordered history: (prev_type, next_type, n, prob_micro) with
    prob row-normalized over the outgoing type.

    One window shuffle on the key (the sequence_features spec), one
    vocabulary²-bounded aggregation, and a broadcast-size row-total
    join — the user-journey "what follows what" summary that feeds
    next-event models and funnel design. prob rides the 1e-6 grid via
    FLOOR(n·1e6/row_total + 0.5) (one double division of exact ints,
    the repo convention)."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    steps = df.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        counts.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.floor(F.col("n") * F.lit(1_000_000.0) / F.col("row_total") + 0.5)
            .cast("long")
            .alias("prob_micro"),
        )
    )


def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the event-type transition matrix over per-user ordered
    histories — the Markov summary of user journeys."""
    events = load_table(spark, "events", sf_dir)
    return type_transitions(events).orderBy("prev_type", "next_type")


EVENTS_TYPE_TRANSITIONS_SQL = """
WITH steps AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
),
counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
),
totals AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total FROM counts GROUP BY prev_type
)
SELECT c.prev_type, c.next_type, c.n,
       CAST(FLOOR(c.n * 1000000.0 / t.row_total + 0.5) AS BIGINT) AS prob_micro
FROM counts c JOIN totals t USING (prev_type)
ORDER BY prev_type, next_type
"""


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary), the standard
    customer-value scoring: per customer, days since last order
    (anchored at the dataset's max date — deterministic, no wall
    clock), order count, and exact-cents spend, each scored into
    ``n_tiles`` quantile bands with the usual orientation (5 = most
    recent / most frequent / highest spend).

    One aggregation keyed by customer, then each score comes from a
    DISTRIBUTED exact global rank (the packing.py two-pass prefix-sum
    shape: range-partition + per-partition offsets, never a global
    single-partition NTILE window — a billion customers rank in
    parallel) folded through the closed-form NTILE formula, which is
    value-identical to SQL NTILE: with q = n // tiles and
    rem = n % tiles, ranks ≤ (q+1)·rem land in tile
    ⌊(r−1)/(q+1)⌋+1, the rest in rem + ⌊(r−1−(q+1)·rem)/q⌋ + 1.
    Determinism: every rank order has the customer id as final
    tie-break, so band edges cannot float between engines; amounts
    ride exact integer cents.
    """
    # The anchor stays a driver scalar (one single-column agg job): as
    # a lazy 1-row crossJoin it plans a BroadcastNestedLoopJoin, which
    # the RFM plan contract bans outright (test_rfm_no_single_
    # partition_window) — and a literal folds into the datediff while
    # a joined column does not.
    anchor = orders.agg(F.max(date_col).alias("mx")).collect()[0]["mx"]
    per_cust = orders.groupBy(F.col(cust_col).alias("custkey")).agg(
        F.datediff(F.lit(anchor), F.max(date_col)).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("monetary_cents"),
    )
    ranked = per_cust
    for metric, out in (
        ("recency_days", "__rank_r"),
        ("frequency", "__rank_f"),
        ("monetary_cents", "__rank_m"),
    ):
        ranked = _global_rank(ranked, metric, "custkey", out)
    n = F.col("__n")
    r_tile = _ntile_from_rank("__rank_r", n, n_tiles)
    f_tile = _ntile_from_rank("__rank_f", n, n_tiles)
    m_tile = _ntile_from_rank("__rank_m", n, n_tiles)
    return (
        ranked.select(
            "custkey",
            "recency_days",
            "frequency",
            "monetary_cents",
            (F.lit(n_tiles + 1) - r_tile).cast("int").alias("r_score"),
            f_tile.cast("int").alias("f_score"),
            m_tile.cast("int").alias("m_score"),
        ).withColumn(
            "rfm_code",
            (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast("int"),
        )
    )


def _global_rank(df, metric: str, id_col: str, out: str):
    """Exact 1-based global rank by (metric, id) WITHOUT a global
    single-partition window: range-partition on the order key, count
    rows per partition, cumulate offsets over the ≤-partitions-row
    counts table IN-PLAN (r12: formerly a blocking collect + driver
    loop) and add them to per-partition row_numbers — the two-pass
    prefix-sum shape of operators/packing.py. Returns df + rank +
    ``__n`` (the global row count, every row — the NTILE closed form
    downstream consumes it as a column).

    The range layout is persisted before pass 1 for the same
    correctness reason packing.py documents: repartitionByRange
    samples its boundaries, and a recompute in pass 2 could re-draw
    them; the caller's action materializes it during the offset
    broadcast build. The two windows over the counts table are
    unpartitioned BUT bounded by the partition count (≤ n_parts rows)
    — the GLOBAL_WINDOW_ALLOWED justification of the RFM gates. The
    session owner releases caches."""
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if "__n" in df.columns:  # re-rank of an already-ranked frame
        df = df.drop("__n")
    laid = (
        df.repartitionByRange(n_parts, F.col(metric).asc(), F.col(id_col).asc())
        .sortWithinPartitions(metric, id_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    # coalesce(1), not an exchange: the ≤ n_parts-row counts table is
    # already aggregated, and the offset window needs all of it in one
    # task either way — coalescing keeps the RFM plan contract's "no
    # Exchange SinglePartition" guarantee about the CUSTOMER table
    # while the bounded table rides a narrow merge.
    counts = laid.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c")).coalesce(1)
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off = counts.select(
        "__pid",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).cast("long").alias("__off"),
        F.sum("__c").over(Window.partitionBy()).cast("long").alias("__n"),
    )
    w = Window.partitionBy("__pid").orderBy(F.col(metric).asc(), F.col(id_col).asc())
    ranked = (
        laid.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off), "__pid")
        .withColumn(out, (F.col("__rn") + F.col("__off")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )
    return ranked


def _ntile_from_rank(rank_col: str, n, tiles: int):
    """SQL NTILE(tiles) as a closed-form expression over an exact
    1-based rank: the first n % tiles bands hold ⌈n/tiles⌉ rows, the
    rest ⌊n/tiles⌋ — the standard (Spark == DuckDB) distribution.
    ``n`` is a Column (the per-row global count `_global_rank`
    emits), so the whole formula stays lazy; q == 0 (fewer rows than
    tiles: tile == rank) folds into the CASE."""
    q = F.floor(n / F.lit(tiles)).cast("long")
    rem = (n % F.lit(tiles)).cast("long")
    r = F.col(rank_col)
    big = (q + F.lit(1)) * rem
    return F.when(q == 0, r).otherwise(
        F.when(r <= big, F.floor((r - 1) / (q + 1)) + 1).otherwise(
            rem + F.floor((r - 1 - big) / q) + 1
        )
    )


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: RFM quintile scores for every ordering customer."""
    from ..sources.catalog import load_table

    orders = load_table(spark, "orders", sf_dir)
    return rfm_segments(orders).orderBy("custkey")


CUSTOMER_RFM_SEGMENTS_SQL = """
WITH anchor AS (SELECT MAX(o_orderdate) AS mx FROM orders),
per_cust AS (
  SELECT o_custkey AS custkey,
         CAST(DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE), CAST(a.mx AS DATE)) AS INTEGER) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM orders, anchor a
  GROUP BY o_custkey, a.mx
)
SELECT custkey, recency_days, frequency, monetary_cents,
       CAST(6 - NTILE(5) OVER (ORDER BY recency_days ASC, custkey ASC) AS INTEGER) AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency ASC, custkey ASC) AS INTEGER) AS f_score,
       CAST(NTILE(5) OVER (ORDER BY monetary_cents ASC, custkey ASC) AS INTEGER) AS m_score,
       CAST((6 - NTILE(5) OVER (ORDER BY recency_days ASC, custkey ASC)) * 100
            + NTILE(5) OVER (ORDER BY frequency ASC, custkey ASC) * 10
            + NTILE(5) OVER (ORDER BY monetary_cents ASC, custkey ASC) AS INTEGER) AS rfm_code
FROM per_cust
ORDER BY custkey
"""


# ─────────────── P11: smoothed target encoding ───────────────

#: Smoothing pseudo-count m: the encoding of a category with n rows is
#: pulled toward the global mean with weight m/(n+m) — the standard
#: empirical-Bayes shrinkage (Micci-Barreca 2001) that keeps rare
#: categories from memorizing their handful of targets.
TE_SMOOTHING = 20


def target_encode(
    df: DataFrame, cat_col: str, target_micro_col: str, m: int = TE_SMOOTHING
) -> DataFrame:
    """Smoothed mean (target) encoding of a categorical column — the
    workhorse categorical feature for tabular models:

        enc(c) = (Σ_c target + m · global_mean) / (n_c + m)

    Exact-integer construction: targets arrive on an integer micro
    grid, signed or not (Spark `div` and DuckDB `//` BOTH truncate
    toward zero — measured, pinned with negative targets by
    tests/test_signed_divisions.py; the r9 non-negative contract is
    retired); global_mean is truncated ONCE onto the same grid
    (Σ·1 div N — exact integral division), then each category's
    encoding is a second single floor. Both engines reproduce every
    floor, so the encoding is bit-identical — no float accumulation
    order to diverge.

    Scale shape: one map-side-combined groupBy(cat) pass, one scalar
    global aggregate broadcast onto the (value-domain-sized) category
    table. The per-category table is what ships to the trainer; a
    per-ROW join-back is the caller's (embarrassingly parallel)
    composition. Leakage note: this is the fit-on-train artifact —
    leave-one-out / fold-aware variants refit on the same plan with a
    fold filter."""
    cats = (
        df.filter(F.col(cat_col).isNotNull() & F.col(target_micro_col).isNotNull())
        .groupBy(F.col(cat_col).alias("category"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(target_micro_col).cast("decimal(38,0)").alias("s"),
        )
    )
    glob = cats.agg(
        F.sum("n").cast("decimal(38,0)").alias("gn"),
        F.sum("s").alias("gs"),
    ).select(
        "gn",
        F.expr("case when gn > 0 then gs div gn end").alias("gmean"),
    )
    enc = F.expr(
        f"(s + {int(m)} * gmean) div (cast(n as decimal(38,0)) + {int(m)})"
    )
    return (
        cats.crossJoin(F.broadcast(glob))
        .select(
            "category",
            F.col("n").cast("long").alias("n"),
            F.expr("case when n > 0 then s div cast(n as decimal(38,0)) end")
            .cast("long")
            .alias("raw_mean_micro"),
            enc.cast("long").alias("encoded_micro"),
            F.col("gmean").cast("long").alias("global_mean_micro"),
        )
        .orderBy("category")
    )


def customer_segment_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: smoothed target encoding of customer market segment
    against order value (cents grid) — the feature a spend model
    would consume; shrinkage visible as |encoded − raw| shrinking
    with segment size."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    df = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "cents"
    )
    return target_encode(df, "c_mktsegment", "cents")


CUSTOMER_SEGMENT_TARGET_ENCODING_SQL = f"""
WITH base AS (
  SELECT c.c_mktsegment AS category,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IS NOT NULL
),
cats AS (
  SELECT category, CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(cents) AS HUGEINT) AS s
  FROM base GROUP BY category
),
gtot AS (
  SELECT SUM(n) AS gn, CASE WHEN SUM(n) > 0 THEN SUM(s) // SUM(n) END AS gmean
  FROM cats
)
SELECT category,
       CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN n > 0 THEN s // n END AS BIGINT) AS raw_mean_micro,
       CAST((s + {TE_SMOOTHING} * gmean) // (n + {TE_SMOOTHING}) AS BIGINT) AS encoded_micro,
       CAST(gmean AS BIGINT) AS global_mean_micro
FROM cats CROSS JOIN gtot
ORDER BY category
"""


# ─────────────── K49: sequential pattern mining ───────────────


def sequence_trigrams(df: DataFrame) -> DataFrame:
    """Consecutive event-type trigram mining — the order-3 extension
    of the K23 transition matrix and the "what do users DO, in
    sequence" primitive behind next-action models and funnel
    discovery: every gap-free (t1 → t2 → t3) run inside a user's
    time-ordered stream, with occurrence and distinct-user support.

    Determinism: the window order carries the (ts, event_id) total
    tie-break (event_id unique), so every engine forms identical
    triples. Scale shape: ONE Exchange on user_id serves both leads
    (same window spec → one Sort+Window operator, the K17 argument —
    users are plentiful, so the per-key window parallelizes); then a
    map-side-combined groupBy over the ≤|types|³ trigram domain.
    count_distinct(user) expands on a value-domain-sized table only."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        df.select("user_id", "ts", "event_id", F.col("event_type").alias("t1"))
        .withColumn("t2", F.lead("t1", 1).over(w))
        .withColumn("t3", F.lead("t1", 2).over(w))
        .filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    )
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            "t1",
            "t2",
            "t3",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("n_users").cast("long").alias("n_users"),
        )
        .orderBy("t1", "t2", "t3")
    )


def events_sequence_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: all consecutive event-type trigrams with occurrence and
    user support — the sequence-mining table a funnel designer reads."""
    events = load_table(spark, "events", sf_dir)
    return sequence_trigrams(events)


EVENTS_SEQUENCE_TRIGRAMS_SQL = """
WITH tri AS (
  SELECT user_id,
         event_type AS t1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
  FROM events
)
SELECT t1, t2, t3,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM tri
WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY t1, t2, t3
"""


# ─────────────── K58: Markov transition entropy ───────────────


def transition_entropy(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Entropy rate of the first-order journey chain: the conditional
    entropy H(next | prev) = −Σ_ij (c_ij/C)·ln(c_ij/r_i) over K23's
    transition counts, next to the marginal H(prev) — their gap is
    exactly the mutual information the chain exploits, so
    h_cond ≈ h_marg means journeys are memoryless (sequence models
    won't beat a popularity baseline) and h_cond ≪ h_marg means
    order matters.

    Same quantized-log convention as K48: each ln of an exact-integer
    ratio lands on the 1e-6 grid BEFORE the count-weighted integer
    fold; entropies clamp at 0. Scale: one lag window on the key
    (high-cardinality → parallel), one vocab²-bounded agg, folds over
    vocab-sized tables."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    steps = df.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    cells = steps.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("c"))
    rows = cells.groupBy("prev_type").agg(F.sum("c").alias("r"))
    dec = "decimal(38,0)"
    tot = rows.agg(F.sum("r").cast(dec).alias("C"), F.count(F.lit(1)).alias("n_states"))
    lq_cond = F.floor(
        F.log(F.col("c").cast("double") / F.col("r").cast("double")) * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast(dec)
    cond = (
        cells.join(F.broadcast(rows), "prev_type")
        .agg(F.coalesce(-F.sum(F.col("c").cast(dec) * lq_cond), F.lit(0).cast(dec)).alias("hc"))
    )
    lq_marg = F.floor(
        F.log(F.col("r").cast("double") / F.col("C").cast("double")) * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast(dec)
    marg = (
        rows.crossJoin(F.broadcast(tot))
        .agg(
            F.coalesce(-F.sum(F.col("r").cast(dec) * lq_marg), F.lit(0).cast(dec)).alias("hm"),
            F.first("C").alias("C"),
            F.first("n_states").alias("n_states"),
        )
    )
    return marg.crossJoin(F.broadcast(cond)).select(
        F.col("C").cast("long").alias("n_transitions"),
        F.col("n_states").cast("long").alias("n_states"),
        F.when(
            F.col("C") > 0,
            F.expr("greatest(hc, cast(0 as decimal(38,0))) div C"),
        )
        .cast("long")
        .alias("h_cond_micro"),
        F.when(
            F.col("C") > 0,
            F.expr("greatest(hm, cast(0 as decimal(38,0))) div C"),
        )
        .cast("long")
        .alias("h_marginal_micro"),
    )


def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: entropy rate of the per-user event-type chain vs the
    marginal type entropy — how much knowing the current step tells
    you about the next."""
    events = load_table(spark, "events", sf_dir)
    return transition_entropy(events)


EVENTS_TRANSITION_ENTROPY_SQL = """
WITH steps AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
),
cells AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS HUGEINT) AS c
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
),
r_tot AS (
  SELECT prev_type, SUM(c) AS r FROM cells GROUP BY prev_type
),
tot AS (SELECT SUM(r) AS C, COUNT(*) AS n_states FROM r_tot),
hc AS (
  SELECT COALESCE(-SUM(c * CAST(FLOOR(LN(CAST(c AS DOUBLE) / CAST(r AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT)), 0) AS hc
  FROM cells JOIN r_tot USING (prev_type)
),
hm AS (
  SELECT COALESCE(-SUM(r * CAST(FLOOR(LN(CAST(r AS DOUBLE) / CAST(C AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT)), 0) AS hm
  FROM r_tot CROSS JOIN tot
)
SELECT CAST(C AS BIGINT) AS n_transitions,
       CAST(n_states AS BIGINT) AS n_states,
       CASE WHEN C > 0 THEN CAST(GREATEST(hc, 0) // C AS BIGINT) END AS h_cond_micro,
       CASE WHEN C > 0 THEN CAST(GREATEST(hm, 0) // C AS BIGINT) END AS h_marginal_micro
FROM tot CROSS JOIN hc CROSS JOIN hm
"""


# ─────────────── K62: RFM segment migration matrix ───────────────

RFM_SPLIT_DATE = "1998-07-01"


def rfm_migration(
    orders: DataFrame,
    split_date: str = RFM_SPLIT_DATE,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Customer VALUE-segment migration matrix: monetary quintile in
    the period before ``split_date`` vs the period after, for
    customers active in BOTH — the lifecycle readout behind
    upgrade/churn-risk programs (K27 scores a snapshot; this is the
    snapshot's time derivative). Each half's quintile comes from the
    K27 machinery (exact closed-form NTILE over the distributed
    two-pass rank — no single-partition window), so the matrix is
    bit-deterministic. Output: (m_before, m_after, n_customers) over
    the ≤25-cell quintile² domain, plus each cell's share of the
    matched population on the ppm grid."""
    before = rfm_segments(
        orders.filter(F.col(date_col) < F.lit(split_date)),
        cust_col=cust_col,
        date_col=date_col,
        amount_col=amount_col,
    ).select(F.col("custkey"), F.col("m_score").alias("m_before"))
    after = rfm_segments(
        orders.filter(F.col(date_col) >= F.lit(split_date)),
        cust_col=cust_col,
        date_col=date_col,
        amount_col=amount_col,
    ).select(F.col("custkey"), F.col("m_score").alias("m_after"))
    cells = before.join(after, "custkey").groupBy("m_before", "m_after").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    tot = cells.agg(F.sum("n_customers").alias("matched"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("m_before").cast("long").alias("m_before"),
            F.col("m_after").cast("long").alias("m_after"),
            F.col("n_customers").cast("long").alias("n_customers"),
            F.expr("n_customers * 1000000 div matched").cast("long").alias("share_ppm"),
        )
        .orderBy("m_before", "m_after")
    )


def customer_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: monetary-quintile migration across the mid-history
    1998-07-01 split of the order window."""
    orders = load_table(spark, "orders", sf_dir)
    return rfm_migration(orders)


def _rfm_half_sql(pred: str, alias: str) -> str:
    return f"""
  SELECT custkey, CAST(NTILE(5) OVER (ORDER BY monetary_cents ASC, custkey ASC) AS INTEGER) AS {alias}
  FROM (
    SELECT o_custkey AS custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
    FROM orders WHERE {pred}
    GROUP BY o_custkey
  )"""


CUSTOMER_RFM_MIGRATION_SQL = f"""
WITH before_half AS ({_rfm_half_sql(f"o_orderdate < DATE '{RFM_SPLIT_DATE}'", "m_before")}),
after_half AS ({_rfm_half_sql(f"o_orderdate >= DATE '{RFM_SPLIT_DATE}'", "m_after")}),
cells AS (
  SELECT m_before, m_after, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM before_half JOIN after_half USING (custkey)
  GROUP BY m_before, m_after
),
tot AS (SELECT SUM(n_customers) AS matched FROM cells)
SELECT CAST(m_before AS BIGINT) AS m_before,
       CAST(m_after AS BIGINT) AS m_after,
       n_customers,
       CAST(n_customers * 1000000 // matched AS BIGINT) AS share_ppm
FROM cells CROSS JOIN tot
ORDER BY m_before, m_after
"""
