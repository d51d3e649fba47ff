"""Correctness-gate wrappers for similarity search on `embeddings`.

Brute-force cosine top-k has a DuckDB oracle (list_cosine_similarity);
the LSH variants are rows-only (deterministic seeded hyperplanes, but
no SQL equivalent) and are recall-tested against brute force in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table
from .ann import brute_force_topk, embedding_near_dup_pairs, lsh_topk

N_QUERIES = 10
K = 5
DIM = 64


def _queries(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    return brute_force_topk(emb, _queries(emb), k=K).orderBy("query_id", "rank")


ANN_COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cosine
  FROM q, embeddings e
  WHERE e.vec_id != q.query_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {K}
ORDER BY query_id, rank
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    return lsh_topk(emb, _queries(emb), dim=DIM, k=K).orderBy("query_id", "rank")


def embeddings_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components: posexplode the vectors and
    average each dimension (decimal-exact sums → engine-identical
    results). Covers labelled-vector analytics: class centroids are
    the building block of nearest-class-mean classification and
    per-class drift monitoring."""
    emb = load_table(spark, "embeddings", sf_dir)
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "label", "dim", F.col("val").cast("double").cast("decimal(18,9)").alias("val")
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("val").cast("double") / F.count(F.lit(1)), 6).alias("centroid_val"),
        )
        .filter(F.col("dim") < 8)  # keep the gate output compact
        .orderBy("label", "dim")
    )


EMBEDDINGS_LABEL_STATS_SQL = """
WITH exploded AS (
  SELECT label, i - 1 AS dim,
         CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9)) AS val
  FROM embeddings,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS i)
)
SELECT label, CAST(dim AS INTEGER) AS dim, COUNT(*) AS n,
       ROUND(CAST(SUM(val) AS DOUBLE) / COUNT(*), 6) AS centroid_val
FROM exploded
WHERE dim < 8
GROUP BY label, dim
ORDER BY label, dim
"""


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    return embedding_near_dup_pairs(emb, dim=DIM, threshold=0.9).orderBy("id_a", "id_b")
