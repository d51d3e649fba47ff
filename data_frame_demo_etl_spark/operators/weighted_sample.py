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

from pyspark.sql import DataFrame, functions as F

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
