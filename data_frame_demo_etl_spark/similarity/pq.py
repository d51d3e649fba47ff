"""Product quantization (PQ) for embedding compression + ADC search.

Jégou et al. 2011 ("Product quantization for nearest neighbor
search"): split each d-dim vector into `m` subvectors, k-means each
subspace into 2^nbits centroids, store a vector as its m centroid
codes — 64 float32 (256 B) become 8 × 4-bit codes (4 B) at
m=8/nbits=4. Asymmetric distance computation (ADC) scores a query
against codes via an m × 2^nbits lookup table of exact subspace dot
products, so search cost is m table gathers per corpus vector and the
corpus itself never has to hold raw floats in memory.

Spark shape:
- codebooks train DRIVER-SIDE on a bounded deterministic sample
  (k-means over m × 2^nbits × (d/m) floats is model-constant work);
- encoding is one `mapInPandas` pass (numpy argmin per subspace);
- ADC scoring is pure Column code: the per-query LUT is embedded as a
  literal array-of-arrays and reduced with `aggregate(sequence(...))`
  — JVM-side, no Python in the scoring path, broadcast join on the
  (tiny) query side.

Composes with IVF (ivf.py) in the usual IVF-PQ layout: coarse
quantizer prunes posting lists, PQ scores the survivors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _kmeans_1sub(x: np.ndarray, ksub: int, seed: int, iters: int = 25) -> np.ndarray:
    """Seeded Lloyd k-means with kmeans++ init for one subspace."""
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), 1)]
    while len(centers) < ksub:
        d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1).min(1)
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centers = np.vstack([centers, x[rng.choice(len(x), 1, p=probs)]])
    for _ in range(iters):
        assign = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1).argmin(1)
        for c in range(ksub):
            pts = x[assign == c]
            if len(pts):
                centers[c] = pts.mean(0)
    return centers


def fit_pq(
    corpus: DataFrame,
    m: int = 8,
    nbits: int = 4,
    sample_n: int = 2048,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train codebooks[m, 2^nbits, d/m] on a deterministic bounded
    sample (first `sample_n` ids — stable across cluster sizes)."""
    sample = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_n).toPandas()
    )
    x = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub, ksub = d // m, 2**nbits
    return np.stack(
        [_kmeans_1sub(x[:, i * dsub : (i + 1) * dsub], ksub, seed + i) for i in range(m)]
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One mapInPandas pass: (id, codes array<int>[m])."""
    m, ksub, dsub = codebooks.shape
    cb = codebooks.copy()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for i in range(m):
                sub = x[:, i * dsub : (i + 1) * dsub]
                d2 = ((sub[:, None, :] - cb[i][None, :, :]) ** 2).sum(-1)
                codes[:, i] = d2.argmin(1)
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(), "codes": list(codes)})

    out = corpus.select(id_col, vec_col).mapInPandas(gen, "id long, codes array<int>")
    return out.withColumnRenamed("id", id_col)


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    queries_pd: pd.DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k by approximate cosine. Each query carries a literal
    LUT of exact subspace dot products and the per-code norm terms;
    scoring is a JVM-side aggregate over the code array."""
    spark = encoded.sparkSession
    m, ksub, dsub = codebooks.shape
    sq_norms = (codebooks**2).sum(-1)  # [m, ksub]

    rows = []
    for _, row in queries_pd.iterrows():
        qv = np.asarray(row[vec_col], dtype=np.float64)
        qn = float(np.sqrt((qv**2).sum()))
        lut = np.stack(
            [codebooks[i] @ qv[i * dsub : (i + 1) * dsub] for i in range(m)]
        )  # [m, ksub] subspace dot products
        rows.append(
            (
                int(row[query_id_col]),
                qn,
                [[float(v) for v in r] for r in lut],
                [[float(v) for v in r] for r in sq_norms],
            )
        )
    queries = spark.createDataFrame(
        rows,
        f"{query_id_col} long, qn double, lut array<array<double>>, nrm array<array<double>>",
    )

    idx = F.sequence(F.lit(0), F.lit(m - 1))
    gather = lambda table: F.aggregate(  # noqa: E731
        idx,
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(F.element_at(table, i + 1), F.element_at("codes", i + 1) + 1),
    )
    dot_approx = gather(F.col("lut"))
    norm_approx = F.sqrt(gather(F.col("nrm")))
    denom = F.col("qn") * norm_approx
    scored = (
        encoded.join(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.when(denom > 0, dot_approx / denom).otherwise(0.0).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", F.col(id_col).alias("neighbor_id"), "cosine")
    )
