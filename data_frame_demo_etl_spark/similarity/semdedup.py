"""Semantic deduplication (SemDeDup, Abbas et al. 2023).

Cluster the embedding space, then look for near-duplicate pairs ONLY
within a cluster: pairwise work drops from O(N²) to Σ|cluster|², and
each cluster's pair search is an equi-join on the cluster id — the
exact shape Spark shuffles well. Documents with cosine ≥ τ to an
earlier-id neighbor in their cluster are dropped (keep-lowest-id, the
deterministic analog of the paper's keep-one-per-group).

Two variants:
- the SCALE path clusters with the data-adaptive coarse quantizer
  (ivf.fit_ivf → Spark ML KMeans); recall vs full pairwise is
  pytest-checked;
- the GATE path uses deterministic seeded anchor centroids embedded
  as literals in BOTH engines (same trick as the LSH oracle in
  gate.py), so assignment, within-cluster pair generation, scoring,
  and the keep/drop rule are all externally verified by DuckDB.

At 100 TB: assignment is one scan (k × d literal array, argmin
JVM-side); the self-join shuffles on cluster id; skewed clusters are
the hot-bucket analog — cap with max_cluster_size (same policy as
minhash's max_bucket_size) or re-cluster the oversized ones.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import cosine, l2_distance

DIM = 64


def anchor_centroids(dim: int = DIM, k: int = 8, seed: int = 7) -> list[list[float]]:
    """Deterministic unit-norm anchors (data-independent, like LSH
    hyperplanes) — the portable gate's clustering."""
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(k, dim))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return [[float(v) for v in row] for row in c]


def assign_clusters(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment as pure Column code — fully IN-ROW
    (r13): per-centroid L2 distances via transform over the literal
    k × d array, argmin via array_min of (distance, cluster) structs
    (lexicographic struct comparison ≡ the former window's
    orderBy(dist asc, cluster asc) rank-1 — identical winner, same
    doubles from the same expression). The former shape posexploded
    every embedding k ways and ran a per-id window: a k× row blowup
    plus a full corpus shuffle and sort, for a decision that depends
    only on the row itself. Now: zero shuffles, zero explode."""
    cent_lit = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in centroids])
    vec = F.col(vec_col).cast("array<double>")
    best = F.array_min(
        F.transform(
            cent_lit,
            lambda c, i: F.struct(
                l2_distance(vec, c).alias("__dist"), i.alias("cluster")
            ),
        )
    )
    return emb.select(id_col, vec_col, best.getField("cluster").alias("cluster"))


def semantic_dup_pairs(
    assigned: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Within-cluster near-dup pairs (id_a < id_b, cosine ≥ τ)."""
    if max_cluster_size is not None:
        sizes = assigned.groupBy("cluster").count().filter(F.col("count") <= max_cluster_size)
        assigned = assigned.join(sizes.select("cluster"), "cluster")
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "cluster"
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "cluster"
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine(F.col("__va").cast("array<double>"), F.col("__vb").cast("array<double>")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup_decisions(
    assigned: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Keep/drop per vector: drop anything with an earlier-id
    near-duplicate in its cluster (keep-lowest-id)."""
    pairs = semantic_dup_pairs(assigned, threshold, vec_col, id_col)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return assigned.select(id_col, "cluster").join(
        dropped.withColumn("__drop", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "cluster",
        F.coalesce(F.col("__drop"), F.lit(False)).alias("is_dropped"),
    )


def semantic_dedup_adaptive(
    emb: DataFrame,
    k: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Scale path: data-adaptive KMeans clustering, then prune."""
    from .ivf import fit_ivf

    assigned, _ = fit_ivf(emb, k=k, seed=seed, vec_col=vec_col)
    return semantic_dup_pairs(
        assigned.select(id_col, vec_col, "cluster"),
        threshold,
        vec_col,
        id_col,
        max_cluster_size=max_cluster_size,
    )


# ───────────────────────── portable gate ─────────────────────────

GATE_K = 8
GATE_SEED = 7
GATE_THRESHOLD = 0.4  # synthetic embeddings are near-orthogonal; 0.9 is vacuous


def dedup_semantic(spark, sf_dir: str) -> DataFrame:
    """Gate: anchor-centroid assignment → within-cluster pairs →
    keep/drop decisions, summarized per cluster so the output is
    compact but pins every stage (counts depend on assignment AND the
    pair threshold AND the keep rule)."""
    from ..sources.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    decisions = semantic_dedup_decisions(
        assign_clusters(emb, anchor_centroids(k=GATE_K, seed=GATE_SEED)),
        threshold=GATE_THRESHOLD,
    )
    return (
        decisions.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.when(F.col("is_dropped"), 1).otherwise(0)).alias("n_dropped"),
            F.coalesce(
                F.min(F.when(F.col("is_dropped"), F.col("vec_id"))), F.lit(-1)
            ).alias("first_dropped_id"),
        )
        .orderBy("cluster")
    )


def _centroid_sql_values(centroids: list[list[float]]) -> str:
    rows = []
    for i, c in enumerate(centroids):
        lits = ", ".join(repr(v) for v in c)
        rows.append(f"({i}, [{lits}])")
    return ", ".join(rows)


DEDUP_SEMANTIC_SQL = f"""
WITH cent(cluster, cv) AS (VALUES {_centroid_sql_values(anchor_centroids(k=GATE_K, seed=GATE_SEED))}),
assigned AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT e.vec_id, e.embedding, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY LIST_DISTANCE(CAST(e.embedding AS DOUBLE[]), c.cv) ASC, c.cluster ASC
           ) AS rk
    FROM embeddings e, cent c
  ) WHERE rk = 1
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), 6) >= {GATE_THRESHOLD}
),
decisions AS (
  SELECT s.vec_id, s.cluster,
         (s.vec_id IN (SELECT id_b FROM pairs)) AS is_dropped
  FROM assigned s
)
SELECT cluster, COUNT(*) AS n_vectors,
       CAST(SUM(CASE WHEN is_dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       COALESCE(MIN(CASE WHEN is_dropped THEN vec_id END), -1) AS first_dropped_id
FROM decisions
GROUP BY cluster
ORDER BY cluster
"""
