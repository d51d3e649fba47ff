"""Weighted sampling without replacement (Efraimidis & Spirakis 2006).

The A-ES scheme: each row draws key = u^(1/w) (u uniform from a hash,
w its weight) and the k largest keys are the sample — a one-pass,
join-free distributed algorithm whose inclusion probabilities match
sequential weighted sampling without replacement. Here the weight is
document LENGTH (n_chars): the standard token-budget-aware corpus
draw where longer documents are proportionally likelier.

Determinism/portability: u derives from md5(doc_id) (engine-shared,
like the portable samplers in operators/gate.py); ranking uses the
monotone-equivalent score ln(u)/w quantized to a 1e-6 integer grid
(libm ulps sit ~9 orders below), ties broken by id. Top-k via
orderBy+limit = distributed TakeOrdered — no full sort.

At 100 TB: one scan, no shuffle except the TakeOrdered reduction;
the sample never materializes more than k rows per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SAMPLE_K = 200
SCALE = 1_000_000
U_DENOM = 4294967296.0  # 2^32


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = SAMPLE_K,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k A-ES draw: (id_col, weight, skey). Rows with weight <= 0
    are excluded (zero weight = never sampled)."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
    u = (h + F.lit(0.5)) / F.lit(U_DENOM)
    skey = F.floor(F.log(u) / F.col(weight_col) * SCALE).cast("long")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(id_col, F.col(weight_col).alias("weight"), skey.alias("skey"))
        .orderBy(F.col("skey").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sample_documents_weighted(spark, sf_dir: str) -> DataFrame:
    """Gate: length-weighted 200-doc draw from documents."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return weighted_sample(docs, "n_chars").orderBy(F.col("skey").desc(), F.col("doc_id").asc())


SAMPLE_DOCUMENTS_WEIGHTED_SQL = f"""
SELECT doc_id, n_chars AS weight,
       CAST(FLOOR(
         LN((CAST(CONCAT('0x', SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
            / {U_DENOM})
         / n_chars * {SCALE}) AS BIGINT) AS skey
FROM documents
WHERE n_chars > 0
ORDER BY skey DESC, doc_id ASC
LIMIT {SAMPLE_K}
"""


# ─────────────── exact-quota stratified sampling (P10) ───────────────

FRAC_PPM = 100_000  # 10% global budget


def stratified_quota_sample(
    docs: DataFrame,
    frac_ppm: int = FRAC_PPM,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """EXACT-count stratified sample: a global budget of
    N = floor(total · frac_ppm / 1e6) rows, allocated across strata by
    the largest-remainder method (floor(N·c_s/total) each, remainders
    to the largest fractional parts, ties toward the smaller stratum
    name) — the allocation an eval-set builder needs when "10%" must
    mean exactly N rows AND per-stratum proportionality to the row.
    P1 (Bernoulli hash) holds rates only in expectation; P2 targets an
    EXTERNAL mix; this is the exact-quota sibling.

    Within a stratum rows are picked in md5-grid order (the portable
    sampler idiom) — deterministic, reproducible, engine-shared.

    Scale shape: the stratum census is a vocabulary-sized aggregate
    (collected driver-side and turned into exact integer quotas — the
    triangles-histogram precedent; never a data-sized collect), the
    pick is the P5 partition-pruned per-key top-n (bounded shuffle:
    partitions × strata × max-quota rows, not the corpus), and the
    quota filter is a broadcast join. Caveat for extreme budgets: at
    frac → 1 the prune bound approaches the corpus — this operator is
    for sampling, not splitting (P3 hash splits cover that).
    """
    from .topn import pruned_topn

    counts = sorted(
        (r[0], r[1])
        for r in docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("c")).collect()
    )
    total = sum(c for _, c in counts)
    if not total:
        spark = docs.sparkSession
        return spark.createDataFrame(
            [], f"{stratum_col} string, {id_col} long, pick_rank long"
        )
    budget = total * frac_ppm // 1_000_000
    base = {s: budget * c // total for s, c in counts}
    remainder = budget - sum(base.values())
    by_frac = sorted(counts, key=lambda sc: (-(budget * sc[1] % total), sc[0]))
    quotas = dict(base)
    for s, _ in by_frac[:remainder]:
        quotas[s] += 1
    max_q = max(quotas.values()) if quotas else 0

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    ranked = pruned_topn(
        docs.select(stratum_col, id_col).withColumn("h", h),
        [stratum_col],
        [("h", True), (id_col, True)],
        max_q,
    )
    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(s, int(q)) for s, q in sorted(quotas.items())],
        f"{stratum_col} string, __quota long",
    )
    return (
        ranked.join(F.broadcast(qdf), stratum_col)
        .filter(F.col("rank") <= F.col("__quota"))
        .select(
            stratum_col,
            id_col,
            F.col("rank").cast("long").alias("pick_rank"),
        )
        .orderBy(stratum_col, "pick_rank")
    )


def docs_stratified_sample(spark, sf_dir: str) -> DataFrame:
    """Gate: exact-quota 10% stratified sample of `documents` by
    source — largest-remainder allocation, md5-grid picks."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return stratified_quota_sample(docs)


DOCS_STRATIFIED_SAMPLE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS c FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS total,
         CAST(SUM(c) * {FRAC_PPM} // 1000000 AS BIGINT) AS budget
  FROM counts
),
base AS (
  SELECT source, c,
         CAST(t.budget * c // t.total AS BIGINT) AS b,
         CAST(t.budget * c % t.total AS BIGINT) AS frac
  FROM counts, tot t
),
alloc AS (
  SELECT source, b,
         ROW_NUMBER() OVER (ORDER BY frac DESC, source ASC) AS rn,
         (SELECT budget FROM tot) - (SELECT SUM(b) FROM base) AS rem
  FROM base
),
quota AS (
  SELECT source, b + CASE WHEN rn <= rem THEN 1 ELSE 0 END AS q FROM alloc
),
ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(CONCAT('0x', SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) ASC,
                    doc_id ASC
         ) AS rk
  FROM documents
)
SELECT r.source, r.doc_id, CAST(r.rk AS BIGINT) AS pick_rank
FROM ranked r JOIN quota USING (source)
WHERE r.rk <= q
ORDER BY source, pick_rank
"""


# ─────────────── P12: Horvitz–Thompson estimator audit ───────────────

#: Per-source inclusion probability ladder for the gate: π halves as
#: the source's corpus share rank grows — stratified "keep less of
#: the big sources" sampling, the shape a 100 TB pipeline actually
#: runs. Thresholds live on the md5 2³²-grid so π is EXACTLY T/2³².
HT_BASE_SHIFT = 1  # π of the largest source = 1/2


def ht_estimate(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Horvitz–Thompson total estimation under deterministic
    stratified Bernoulli sampling — the audit that answers "can the
    cheap sample stand in for the full scan": per stratum, draw rows
    whose md5 grid point falls under the stratum's threshold, weight
    each by the EXACT inverse inclusion probability 2³²/T (T is the
    integer threshold, so π = T/2³² is exact — no float rate ever
    enters), and compare the estimate to the exact total.

    Strata thresholds: sources ranked by size (count DESC, name ASC
    total order); stratum at rank r keeps π = 2^-(r+1) — the big
    sources get sampled hardest, mirroring the temperature-mix
    shape. The per-row weighted contribution floors ONCE onto the
    micro grid ((v·2³²·10⁶) div T — both engines truncate
    identically), so estimate and error are bit-identical.

    Output per stratum: n_rows, n_sampled, total (exact),
    ht_total_micro, err_ppm = |est − total|·10⁶ div total. Scale
    shape: one census agg (value-domain sized), rank via one bounded
    sort on the census, broadcast thresholds onto the corpus scan,
    one conditional aggregation — no second corpus pass, no windows
    over data."""
    census = (
        df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), F.col("s").asc())
    # census is value-domain sized: the unpartitioned rank window is
    # bounded by the stratum vocabulary, never the corpus.
    ranked = census.withColumn("r", F.row_number().over(wr)).select(
        "s",
        "n",
        F.floor(F.lit(4294967296.0) / F.pow(F.lit(2.0), F.col("r"))).cast("long").alias(
            "thresh"
        ),
    )
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    dec = "decimal(38,0)"
    base = df.select(
        F.col(stratum_col).alias("s"),
        F.col(value_col).alias("v"),
        h.alias("hh"),
    ).join(F.broadcast(ranked), "s")
    kept = F.col("hh") < F.col("thresh")
    contrib = F.expr(
        f"(cast(v as {dec}) * cast(4294967296 as {dec})"
        f" * cast(1000000 as {dec})) div cast(thresh as {dec})"
    )
    g = base.groupBy("s").agg(
        F.first("n").alias("n_rows"),
        F.count_if(kept).alias("n_sampled"),
        F.sum(F.col("v").cast(dec)).alias("total"),
        F.sum(F.when(kept, contrib)).alias("est"),
    )
    err = F.expr(
        "(abs(coalesce(est, cast(0 as decimal(38,0)))"
        " - total * cast(1000000 as decimal(38,0))) "
        " * cast(1000000 as decimal(38,0)))"
        " div (total * cast(1000000 as decimal(38,0)))"
    )
    return g.select(
        F.col("s").alias(stratum_col),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_sampled").cast("long").alias("n_sampled"),
        F.col("total").cast("long").alias("total"),
        F.coalesce(F.col("est"), F.lit(0).cast(dec)).cast("long").alias("ht_total_micro"),
        F.when(F.col("total") > 0, err.cast("long")).alias("err_ppm"),
    ).orderBy(stratum_col)


def docs_ht_estimate(spark, sf_dir: str) -> DataFrame:
    """Gate: HT estimate of total characters per source from the
    stratified md5 sample vs the exact total."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return ht_estimate(docs, "source", "n_chars", "doc_id")


DOCS_HT_ESTIMATE_SQL = """
WITH census AS (
  SELECT source AS s, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
),
ranked AS (
  SELECT s, n,
         CAST(FLOOR(4294967296.0 / POWER(2.0, ROW_NUMBER() OVER (ORDER BY n DESC, s ASC))) AS BIGINT) AS thresh
  FROM census
),
base AS (
  SELECT d.source AS s, d.n_chars AS v, r.n, r.thresh,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hh
  FROM documents d JOIN ranked r ON r.s = d.source
),
g AS (
  SELECT s, MIN(n) AS n_rows,
         CAST(COUNT(*) FILTER (WHERE hh < thresh) AS BIGINT) AS n_sampled,
         CAST(SUM(v) AS HUGEINT) AS total,
         SUM(CASE WHEN hh < thresh
                  THEN (CAST(v AS HUGEINT) * 4294967296 * 1000000) // thresh END) AS est
  FROM base
  GROUP BY s
)
SELECT s AS source,
       CAST(n_rows AS BIGINT) AS n_rows,
       n_sampled,
       CAST(total AS BIGINT) AS total,
       CAST(COALESCE(est, 0) AS BIGINT) AS ht_total_micro,
       CASE WHEN total > 0
            THEN CAST((ABS(COALESCE(est, 0) - total * 1000000) * 1000000)
                 // (total * 1000000) AS BIGINT)
       END AS err_ppm
FROM g
ORDER BY source
"""
