"""IVF-PQ: inverted-file search over product-quantized residuals.

The full composition from Jégou et al. 2011 §V ("IVFADC"): a coarse
quantizer (ivf.py) partitions the corpus into posting lists; each
vector is then stored as the PQ code of its RESIDUAL (vector minus its
coarse centroid), which concentrates the quantizer's resolution where
the data actually lies. A query probes only its ``nprobe`` nearest
posting lists and scores survivors with asymmetric distance
computation (ADC) over the residual codes.

Spark shape (everything scale-bearing stays JVM-side or Arrow-batched):
- coarse quantizer: Spark ML KMeans (ivf.fit_ivf), centroids are a
  driver-small k × d list;
- residuals: `F.zip_with` subtraction against a LITERAL
  array-of-arrays of centroids indexed by cluster id — Column code,
  no Python;
- codebooks: trained driver-side on a bounded deterministic residual
  sample (pq._kmeans_1sub), m × 2^nbits × (d/m) floats;
- encoding: one `mapInPandas` pass carrying (id, cluster, vnorm,
  codes) so no re-join is needed afterwards;
- search: per (query, probed-cluster) row carries the scalar
  q·centroid term; the m × 2^nbits LUT of query-subvector ×
  residual-codebook dot products is shared across probes and embedded
  once per query. score = (q·c + LUT-gather(codes)) / (|q|·|v|) with
  the EXACT corpus norm stored at encode time (1 float/vector), so
  the only approximation is the PQ residual itself.

At 100 TB: the corpus holds m bytes + 1 float per vector instead of
d floats (64× smaller at d=64/m=8); the probe join is a broadcast of
(queries × nprobe) rows against a cluster-partitioned table, so a
query touches ~nprobe/k_coarse of the data and nothing shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .ivf import _nearest_centroids, fit_ivf
from .pq import _kmeans_1sub


def fit_ivfpq(
    corpus: DataFrame,
    k_coarse: int = 16,
    m: int = 8,
    nbits: int = 6,
    sample_n: int = 2048,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Fit coarse quantizer + residual codebooks; encode the corpus.

    Returns (encoded, centroids, codebooks) where encoded has columns
    (id_col, cluster, vnorm, codes array<int>[m])."""
    assigned, centroids = fit_ivf(corpus, k=k_coarse, seed=seed, vec_col=vec_col)

    cent_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    residual = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.element_at(cent_lit, F.col("cluster") + 1),
        lambda x, c: x - c,
    )
    with_res = assigned.select(
        id_col,
        "cluster",
        F.sqrt(
            F.aggregate(
                F.col(vec_col).cast("array<double>"),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        ).alias("vnorm"),
        residual.alias("__residual"),
    )

    # Residual codebooks on a bounded deterministic sample.
    sample = with_res.select(id_col, "__residual").orderBy(id_col).limit(sample_n).toPandas()
    x = np.stack(sample["__residual"].to_numpy()).astype(np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub, ksub = d // m, 2**nbits
    codebooks = np.stack(
        [_kmeans_1sub(x[:, i * dsub : (i + 1) * dsub], ksub, seed + i) for i in range(m)]
    )

    cb = codebooks.copy()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            r = np.stack(pdf["__residual"].to_numpy()).astype(np.float64)
            codes = np.empty((len(r), m), dtype=np.int32)
            for i in range(m):
                sub = r[:, i * dsub : (i + 1) * dsub]
                d2 = ((sub[:, None, :] - cb[i][None, :, :]) ** 2).sum(-1)
                codes[:, i] = d2.argmin(1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "cluster": pdf["cluster"].to_numpy(),
                    "vnorm": pdf["vnorm"].to_numpy(),
                    "codes": list(codes),
                }
            )

    encoded = with_res.mapInPandas(
        gen, "id long, cluster int, vnorm double, codes array<int>"
    ).withColumnRenamed("id", id_col)
    return encoded, centroids, codebooks


def ivfpq_topk(
    encoded: DataFrame,
    centroids: list[list[float]],
    codebooks: np.ndarray,
    queries_pd: pd.DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k over probed posting lists (approximate cosine).

    dot(q, v) = q·c + q·r where r is the residual; q·r comes from the
    per-query LUT, q·c is a per-probe scalar. |v| is exact (stored)."""
    spark = encoded.sparkSession
    m, ksub, dsub = codebooks.shape
    cents = np.asarray(centroids, dtype=np.float64)

    rows = []
    for _, row in queries_pd.iterrows():
        qv = np.asarray(row[vec_col], dtype=np.float64)
        qn = float(np.sqrt((qv**2).sum()))
        lut = np.stack(
            [codebooks[i] @ qv[i * dsub : (i + 1) * dsub] for i in range(m)]
        )
        lut_lit = [[float(v) for v in r_] for r_ in lut]
        for cl in _nearest_centroids(qv, centroids, nprobe):
            rows.append(
                (int(row[query_id_col]), int(cl), float(cents[cl] @ qv), qn, lut_lit)
            )
    probes = spark.createDataFrame(
        rows,
        f"{query_id_col} long, cluster int, qc double, qn double, lut array<array<double>>",
    )

    idx = F.sequence(F.lit(0), F.lit(m - 1))
    dot_res = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(F.element_at("lut", i + 1), F.element_at("codes", i + 1) + 1),
    )
    denom = F.col("qn") * F.col("vnorm")
    scored = (
        encoded.join(F.broadcast(probes), "cluster")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.when(denom > 0, (F.col("qc") + dot_res) / denom).otherwise(0.0).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", F.col(id_col).alias("neighbor_id"), "cosine")
    )
