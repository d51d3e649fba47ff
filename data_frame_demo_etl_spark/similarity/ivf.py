"""IVF (inverted-file) approximate nearest neighbor search.

Coarse quantizer: Spark ML KMeans (seeded) over the embedding corpus;
every vector is assigned to its nearest centroid's posting list. A
query scores only the lists of its ``nprobe`` closest centroids —
corpus work drops from O(N) to O(N · nprobe / k) per query while the
centroid table (k × dim) stays driver-small and broadcastable.

This complements the hyperplane-LSH path in ``ann.py``: IVF adapts to
the data distribution (clusters), LSH is data-independent.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import dot, norm


def _to_ml_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))


def fit_ivf(
    corpus: DataFrame,
    k: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    max_iter: int = 10,
):
    """Fit the coarse quantizer; returns (assigned_corpus, centroids).

    centroids: list[list[float]] (k × dim, driver-side — tiny)."""
    from pyspark.ml.clustering import KMeans

    ml_df = _to_ml_vectors(corpus, vec_col)
    km = KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="__features", predictionCol="__cluster")
    model = km.fit(ml_df)
    assigned = model.transform(ml_df).drop("__features").withColumnRenamed("__cluster", "cluster")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def _nearest_centroids(qvec: np.ndarray, centroids: list[list[float]], nprobe: int) -> list[int]:
    c = np.asarray(centroids)
    d = ((c - qvec) ** 2).sum(axis=1)
    return [int(i) for i in np.argsort(d)[:nprobe]]


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries_pd,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: each query scores only its nprobe nearest
    posting lists. `queries_pd`: pandas frame (query_id, vec_col)."""
    spark = assigned.sparkSession
    probe_rows = []
    for _, row in queries_pd.iterrows():
        qv = np.asarray(row[vec_col], dtype="float64")
        for cl in _nearest_centroids(qv, centroids, nprobe):
            probe_rows.append((int(row[query_id_col]), cl, [float(x) for x in qv]))
    probes = spark.createDataFrame(
        probe_rows, f"{query_id_col} long, cluster int, __qvec array<double>"
    )

    qn = norm(F.col("__qvec"))
    cn = norm(F.col(vec_col))
    denom = qn * cn
    scored = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                F.when(denom > 0, dot(F.col("__qvec"), F.col(vec_col)) / denom).otherwise(0.0), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", F.col(id_col).alias("neighbor_id"), "cosine")
    )


def ann_ivf_topk(spark, sf_dir: str) -> DataFrame:
    """Gate query: IVF top-5 for the first 10 vectors at FULL probe
    (nprobe = all 16 posting lists). Full probe makes IVF exact by
    construction, so the brute-force cosine SQL is its oracle — the
    gate proves the entire assignment → probe → rerank machinery
    loses nothing. The approximate regime (nprobe=4) is recall-tested
    against brute force in pytest."""
    from ..sources.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    assigned, centroids = fit_ivf(emb, k=16)
    assigned = assigned.persist()
    queries_pd = (
        emb.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .toPandas()
    )
    return ivf_topk(assigned, centroids, queries_pd, k=5, nprobe=len(centroids)).orderBy(
        "query_id", "rank"
    )
