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
