"""Distribution drift monitoring: Population Stability Index (PSI)
between a reference and a current slice of a numeric column — the
standard deployed-model drift check (PSI < 0.1 stable, 0.1-0.25
moderate shift, > 0.25 action), here per group so one pass audits
every event type at once.

    PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

Spark-first shape: ONE aggregation computes both histograms — each
row contributes to (group, bin, slice) counts; the PSI fold then runs
over a bins×groups-sized table (constant, tiny). No per-slice rescan,
no driver-side histogramming; at 100 TB this is a single map-side-
combined shuffle of ≤ groups·bins·2 rows.

Determinism: binning is pure integer arithmetic on the 1e-6 micro
grid against FIXED bounds (min/max of the union, computed exactly —
two integer aggregates), bin proportions are Laplace-smoothed
rationals (n_i+1)/(N+bins) so empty bins stay finite, and each bin's
PSI term (one fixed parenthesization on exactly-representable
operands) is quantized to the 1e-6 grid BEFORE the fold, so the sum
is an exact integer sum — immune to partition-dependent double
addition order (the bm25 convention for engine-bit-identical sums).

Reference/current split here is by event-id parity — a deterministic
stand-in for the time-window split a production monitor would use
(the operator takes any two pre-filtered frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

N_BINS = 10
SCALE = 1_000_000


def psi_by_group(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str,
    val_col: str,
    n_bins: int = N_BINS,
) -> DataFrame:
    """(group, n_ref, n_cur, psi_micro) — PSI of ``val_col`` between
    the two frames, computed per group with shared global bin bounds.
    """
    v = F.round(F.col(val_col) * SCALE).cast("long")
    both = (
        ref.select(F.col(group_col).alias("grp"), v.alias("v"), F.lit(0).alias("slice"))
        .unionByName(
            cur.select(
                F.col(group_col).alias("grp"), v.alias("v"), F.lit(1).alias("slice")
            )
        )
        .filter(F.col("v").isNotNull())
    )
    bounds = both.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    # Empty input: any bounds yield the correct (empty, same-schema)
    # result because every downstream table derives from `both`.
    lo = int(bounds["lo"]) if bounds["lo"] is not None else 0
    hi = int(bounds["hi"]) if bounds["hi"] is not None else 0
    span = max(hi - lo + 1, 1)
    # Integer equal-width binning: bin = floor((v-lo)·n_bins/span),
    # clamped implicitly (v ≤ hi ⇒ bin ≤ n_bins−1).
    # floor(double division) in BOTH engines (not cast/truncate: DuckDB
    # CAST(double AS BIGINT) rounds, Spark cast truncates — floor is
    # the one spelling with identical semantics).
    binned = both.withColumn(
        "bin", F.floor((F.col("v") - F.lit(lo)) * n_bins / F.lit(span)).cast("long")
    )
    counts = binned.groupBy("grp", "slice", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = binned.groupBy("grp", "slice").agg(F.count(F.lit(1)).alias("n"))
    # Dense (grp × slice × bin) spine so empty bins contribute their
    # smoothed mass: groups × 2 × n_bins rows — trivially broadcastable.
    grps = both.select("grp").distinct()
    spine = (
        grps.crossJoin(spark_range_df(both, n_bins))
        .crossJoin(both.sparkSession.createDataFrame([(0,), (1,)], "slice int"))
    )
    dense = (
        spine.join(counts, ["grp", "slice", "bin"], "left")
        .join(totals, ["grp", "slice"])
        .select(
            "grp",
            "slice",
            "bin",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            "n",
        )
    )
    # Laplace-smoothed proportion as ONE double division of exact ints.
    p = (F.col("c") + 1.0) / (F.col("n") + F.lit(float(n_bins)))
    per_bin = dense.select("grp", "slice", "bin", p.alias("p"), "n")
    refp = per_bin.filter(F.col("slice") == 0).select(
        "grp", "bin", F.col("p").alias("p_ref"), F.col("n").alias("n_ref")
    )
    curp = per_bin.filter(F.col("slice") == 1).select(
        "grp", "bin", F.col("p").alias("p_cur"), F.col("n").alias("n_cur")
    )
    # Quantize EACH bin's term to the 1e-6 grid before summing: the
    # fold is then an exact integer sum, immune to Spark's partition-
    # dependent double-addition order (a raw double Σ followed by one
    # floor can flip the grid on knife-edge values vs DuckDB's order).
    term = (F.col("p_ref") - F.col("p_cur")) * F.log(F.col("p_ref") / F.col("p_cur"))
    term_micro = F.floor(term * SCALE + 0.5).cast("long")
    return (
        refp.join(curp, ["grp", "bin"])
        .groupBy("grp", "n_ref", "n_cur")
        .agg(F.sum(term_micro).cast("long").alias("psi_micro"))
        .select(F.col("grp"), "n_ref", "n_cur", "psi_micro")
    )


def spark_range_df(like: DataFrame, n: int) -> DataFrame:
    return like.sparkSession.range(n).select(F.col("id").cast("long").alias("bin"))


def events_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: PSI of event value per event type between the even- and
    odd-event-id halves of the stream (a deterministic A/B split; a
    stable corpus should sit well under the 0.1 alert line, and the
    gate emits the number, not a verdict)."""
    events = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    ref = events.filter(F.col("event_id") % 2 == 0)
    cur = events.filter(F.col("event_id") % 2 == 1)
    out = psi_by_group(ref, cur, "event_type", "value")
    return out.select(
        F.col("grp").alias("event_type"), "n_ref", "n_cur", "psi_micro"
    ).orderBy("event_type")


EVENTS_VALUE_DRIFT_PSI_SQL = f"""
WITH both_slices AS (
  SELECT event_type AS grp,
         CAST(ROUND(value * {SCALE}) AS BIGINT) AS v,
         CAST(event_id % 2 AS INTEGER) AS slice
  FROM events WHERE value IS NOT NULL
),
bounds AS (
  SELECT MIN(v) AS lo, GREATEST(MAX(v) - MIN(v) + 1, 1) AS span FROM both_slices
),
binned AS (
  SELECT grp, slice,
         CAST(FLOOR((v - b.lo) * {N_BINS} / b.span) AS BIGINT) AS bin
  FROM both_slices, bounds b
),
counts AS (
  SELECT grp, slice, bin, COUNT(*) AS c FROM binned GROUP BY grp, slice, bin
),
totals AS (
  SELECT grp, slice, COUNT(*) AS n FROM binned GROUP BY grp, slice
),
spine AS (
  SELECT g.grp, s.slice, b.bin
  FROM (SELECT DISTINCT grp FROM both_slices) g,
       (SELECT UNNEST(RANGE({N_BINS})) AS bin) b,
       (SELECT UNNEST([0, 1]) AS slice) s
),
dense AS (
  SELECT sp.grp, sp.slice, sp.bin,
         (COALESCE(c.c, 0) + 1.0) / (t.n + {N_BINS}.0) AS p,
         t.n
  FROM spine sp
  LEFT JOIN counts c ON c.grp = sp.grp AND c.slice = sp.slice AND c.bin = sp.bin
  JOIN totals t ON t.grp = sp.grp AND t.slice = sp.slice
)
SELECT r.grp AS event_type,
       r.n AS n_ref,
       c.n AS n_cur,
       CAST(SUM(CAST(FLOOR((r.p - c.p) * LN(r.p / c.p) * {SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS psi_micro
FROM dense r
JOIN dense c ON c.grp = r.grp AND c.bin = r.bin AND c.slice = 1
WHERE r.slice = 0
GROUP BY r.grp, r.n, c.n
ORDER BY event_type
"""


# ─────────────── ST12/K54: windowed drift monitor ───────────────


def windowed_psi(events: DataFrame, n_bins: int = N_BINS) -> DataFrame:
    """Per-(hour window, type) PSI against the full-corpus reference —
    the PRODUCTION form of the drift monitor psi_by_group's docstring
    promises (its parity split is the deterministic stand-in; this is
    the time-window monitor itself): every hour of traffic is scored
    against the corpus distribution, so a drifting hour surfaces with
    its own PSI instead of diluting a single global number.

    Same determinism contract as K22: integer binning on the micro
    grid against exact global bounds, Laplace-smoothed proportions,
    per-bin terms quantized BEFORE the fold. The counts stage —
    groupBy(window, type, bin) — is the streaming-compatible part
    (identical expression under readStream; the PSI finish runs in
    foreachBatch over the bin counts, the standard two-stage monitor
    deployment — pytest drives exactly that and pins stream == batch).

    Scale shape: ONE corpus aggregation for the reference histogram,
    ONE for the windowed histograms (both map-side combined,
    ≤ types·bins and windows·types·bins rows), dense spines bounded
    by (calendar hours × type vocabulary × bins), one join on
    (type, bin). No corpus self-joins, no per-row windows."""
    spark = events.sparkSession
    v = F.round(F.col("value") * SCALE).cast("long")
    base = events.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("grp"),
        F.date_trunc("hour", F.col("ts")).alias("w"),
        v.alias("v"),
    )
    bounds = base.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    lo = int(bounds["lo"]) if bounds["lo"] is not None else 0
    hi = int(bounds["hi"]) if bounds["hi"] is not None else 0
    span = max(hi - lo + 1, 1)
    binned = base.withColumn(
        "bin", F.floor((F.col("v") - F.lit(lo)) * n_bins / F.lit(span)).cast("long")
    )
    ref_counts = binned.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("c"))
    ref_totals = binned.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    cur_counts = binned.groupBy("w", "grp", "bin").agg(F.count(F.lit(1)).alias("c"))
    cur_totals = binned.groupBy("w", "grp").agg(F.count(F.lit(1)).alias("n"))
    bins = spark_range_df(binned, n_bins)
    ref_dense = (
        binned.select("grp")
        .distinct()
        .crossJoin(bins)
        .join(ref_counts, ["grp", "bin"], "left")
        .join(ref_totals, ["grp"])
        .select(
            "grp",
            "bin",
            ((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0)) / (F.col("n") + F.lit(float(n_bins)))).alias("p_ref"),
            F.col("n").alias("n_ref"),
        )
    )
    cur_dense = (
        cur_totals.select("w", "grp", "n")
        .crossJoin(bins)
        .join(cur_counts, ["w", "grp", "bin"], "left")
        .select(
            "w",
            "grp",
            "bin",
            ((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0)) / (F.col("n") + F.lit(float(n_bins)))).alias("p_cur"),
            F.col("n").alias("n_cur"),
        )
    )
    term = (F.col("p_ref") - F.col("p_cur")) * F.log(F.col("p_ref") / F.col("p_cur"))
    term_micro = F.floor(term * SCALE + 0.5).cast("long")
    return (
        cur_dense.join(F.broadcast(ref_dense), ["grp", "bin"])
        .groupBy("w", "grp", "n_ref", "n_cur")
        .agg(F.sum(term_micro).cast("long").alias("psi_micro"))
        .select(
            F.col("w").alias("window_start"),
            F.col("grp").alias("event_type"),
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_window"),
            "psi_micro",
        )
        .orderBy("window_start", "event_type")
    )


def events_windowed_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: hourly PSI drift of event values against the corpus
    reference, per type — the deployed monitor's batch backfill."""
    events = load_table(spark, "events", sf_dir)
    return windowed_psi(events)


EVENTS_WINDOWED_PSI_SQL = f"""
WITH base AS (
  SELECT event_type AS grp, DATE_TRUNC('hour', ts) AS w,
         CAST(ROUND(value * {SCALE}) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
bounds AS (
  SELECT MIN(v) AS lo, GREATEST(MAX(v) - MIN(v) + 1, 1) AS span FROM base
),
binned AS (
  SELECT grp, w, CAST(FLOOR((v - b.lo) * {N_BINS} / b.span) AS BIGINT) AS bin
  FROM base, bounds b
),
ref_counts AS (SELECT grp, bin, COUNT(*) AS c FROM binned GROUP BY grp, bin),
ref_totals AS (SELECT grp, COUNT(*) AS n FROM binned GROUP BY grp),
cur_counts AS (SELECT w, grp, bin, COUNT(*) AS c FROM binned GROUP BY w, grp, bin),
cur_totals AS (SELECT w, grp, COUNT(*) AS n FROM binned GROUP BY w, grp),
bins AS (SELECT UNNEST(RANGE({N_BINS})) AS bin),
ref_dense AS (
  SELECT g.grp, b.bin,
         (COALESCE(c.c, 0) + 1.0) / (t.n + {N_BINS}.0) AS p_ref,
         t.n AS n_ref
  FROM (SELECT DISTINCT grp FROM binned) g
  CROSS JOIN bins b
  LEFT JOIN ref_counts c ON c.grp = g.grp AND c.bin = b.bin
  JOIN ref_totals t ON t.grp = g.grp
),
cur_dense AS (
  SELECT ct.w, ct.grp, b.bin,
         (COALESCE(c.c, 0) + 1.0) / (ct.n + {N_BINS}.0) AS p_cur,
         ct.n AS n_cur
  FROM cur_totals ct
  CROSS JOIN bins b
  LEFT JOIN cur_counts c ON c.w = ct.w AND c.grp = ct.grp AND c.bin = b.bin
)
SELECT cd.w AS window_start,
       cd.grp AS event_type,
       CAST(rd.n_ref AS BIGINT) AS n_ref,
       CAST(cd.n_cur AS BIGINT) AS n_window,
       CAST(SUM(CAST(FLOOR((rd.p_ref - cd.p_cur) * LN(rd.p_ref / cd.p_cur) * {SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS psi_micro
FROM cur_dense cd
JOIN ref_dense rd ON rd.grp = cd.grp AND rd.bin = cd.bin
GROUP BY cd.w, cd.grp, rd.n_ref, cd.n_cur
ORDER BY window_start, event_type
"""


# ─────────────── Jensen–Shannon divergence (K57) ───────────────


def jsd_categorical(
    a: DataFrame, b: DataFrame, cat_col: str
) -> DataFrame:
    """Jensen–Shannon divergence (nats) between the two frames'
    categorical distributions — PSI's bounded, symmetric sibling
    (JSD ∈ [0, ln 2], finite even when a category exists in only one
    slice, so no Laplace smoothing is needed: the mixture M =
    (P+Q)/2 is positive wherever either side is).

        JSD = ½·KL(P‖M) + ½·KL(Q‖M)
        per-category p term: ln(p_i/m_i) = ln(2·a_i·B / (a_i·B + b_i·A))

    — a correctly-rounded double of a ratio of exact integers,
    quantized to the 1e-6 grid per category BEFORE the count-weighted
    sum (the K48 MI convention), so both engines fold exact integers.
    Each KL half is clamped at 0 (mathematically ≥ 0; quantization
    residue ≤ categories·ulp). One map-side-combined aggregation over
    the union, one value-domain-sized fold."""
    both = (
        a.select(F.col(cat_col).alias("cat"), F.lit(1).alias("ia"), F.lit(0).alias("ib"))
        .unionByName(
            b.select(F.col(cat_col).alias("cat"), F.lit(0).alias("ia"), F.lit(1).alias("ib"))
        )
        .filter(F.col("cat").isNotNull())
        .groupBy("cat")
        .agg(F.sum("ia").alias("ai"), F.sum("ib").alias("bi"))
    )
    dec = "decimal(38,0)"
    tot = both.agg(
        F.sum("ai").cast(dec).alias("A"),
        F.sum("bi").cast(dec).alias("B"),
        F.count(F.lit(1)).alias("n_categories"),
    )
    j = both.crossJoin(F.broadcast(tot))
    lq_p = F.floor(
        F.log(
            (F.lit(2).cast(dec) * F.col("ai").cast(dec) * F.col("B")).cast("double")
            / (F.col("ai").cast(dec) * F.col("B") + F.col("bi").cast(dec) * F.col("A")).cast(
                "double"
            )
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast(dec)
    lq_q = F.floor(
        F.log(
            (F.lit(2).cast(dec) * F.col("bi").cast(dec) * F.col("A")).cast("double")
            / (F.col("ai").cast(dec) * F.col("B") + F.col("bi").cast(dec) * F.col("A")).cast(
                "double"
            )
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast(dec)
    sums = j.agg(
        F.coalesce(
            F.sum(F.when(F.col("ai") > 0, F.col("ai").cast(dec) * lq_p)), F.lit(0).cast(dec)
        ).alias("sp"),
        F.coalesce(
            F.sum(F.when(F.col("bi") > 0, F.col("bi").cast(dec) * lq_q)), F.lit(0).cast(dec)
        ).alias("sq"),
        F.first("A").alias("A"),
        F.first("B").alias("B"),
        F.first("n_categories").alias("n_categories"),
    )
    return sums.select(
        F.col("A").cast("long").alias("n_a"),
        F.col("B").cast("long").alias("n_b"),
        F.col("n_categories").cast("long").alias("n_categories"),
        F.when(
            (F.col("A") > 0) & (F.col("B") > 0),
            F.expr(
                "(greatest(sp div A, cast(0 as decimal(38,0)))"
                " + greatest(sq div B, cast(0 as decimal(38,0)))) div 2"
            ),
        )
        .cast("long")
        .alias("jsd_micro"),
    )


def events_jsd_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: JSD between the user-parity arms' event-type mixes — the
    A/A sanity check a traffic split runs before trusting any A/B
    readout (two arms of the same traffic should sit at ≈ 0 nats)."""
    events = load_table(spark, "events", sf_dir)
    return jsd_categorical(
        events.filter(F.col("user_id") % 2 == 0),
        events.filter(F.col("user_id") % 2 != 0),
        "event_type",
    )


EVENTS_JSD_ARMS_SQL = """
WITH both_slices AS (
  SELECT event_type AS cat,
         CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS HUGEINT) AS ai,
         CAST(COUNT(*) FILTER (WHERE user_id % 2 != 0) AS HUGEINT) AS bi
  FROM events WHERE event_type IS NOT NULL
  GROUP BY event_type
),
tot AS (
  SELECT SUM(ai) AS A, SUM(bi) AS B, COUNT(*) AS n_categories FROM both_slices
),
terms AS (
  SELECT
    CASE WHEN ai > 0
         THEN ai * CAST(FLOOR(LN(CAST(2 * ai * B AS DOUBLE) / CAST(ai * B + bi * A AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT)
         ELSE 0 END AS tp,
    CASE WHEN bi > 0
         THEN bi * CAST(FLOOR(LN(CAST(2 * bi * A AS DOUBLE) / CAST(ai * B + bi * A AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT)
         ELSE 0 END AS tq,
    A, B, n_categories
  FROM both_slices CROSS JOIN tot
)
SELECT CAST(MAX(A) AS BIGINT) AS n_a,
       CAST(MAX(B) AS BIGINT) AS n_b,
       CAST(MAX(n_categories) AS BIGINT) AS n_categories,
       CASE WHEN MAX(A) > 0 AND MAX(B) > 0
            THEN CAST((GREATEST(SUM(tp) // MAX(A), 0) + GREATEST(SUM(tq) // MAX(B), 0)) // 2 AS BIGINT)
       END AS jsd_micro
FROM terms
"""
