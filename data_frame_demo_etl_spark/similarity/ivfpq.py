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


# ──────────────────── anchor-codebook IVFADC gate (X6) ────────────────────
# Gate counterpart of fit_ivfpq/ivfpq_topk above: the full IVFADC
# composition (coarse prune → RESIDUAL product quantization → ADC
# scoring) with every trained structure replaced by its deterministic
# anchor analog — coarse centroids from the X14 sweep set
# (semdedup.anchor_centroids k=8 seed=7), residual codebooks from
# pq.anchor_codebooks at the residual component scale — so the whole
# pipeline, probe selection included, is reproduced by generated
# DuckDB SQL. Scoring is decode-then-cosine (v̂ = centroid + decoded
# residual), value-identical to the LUT gather the deployment path
# uses (dot(q, v̂) = q·c + Σ lut terms).

GATE_NPROBE = 2
_RES_SEED = 13
# residual component scale: |emb − unit-norm anchor| per dim ≈
# sqrt(0.125² + 0.12²) on the synthetic embeddings
_RES_SCALE = 0.17


def ivfpq_adc_topk_gate(spark, sf_dir: str) -> DataFrame:
    """Gate (X6): IVFADC cosine top-5 for the first 10 queries —
    nprobe=2 coarse prune, residual PQ reconstruction, round-6 cosine,
    id tie-break. Candidates are bounded by the probed posting lists
    (~nprobe/k of the corpus), never all pairs."""
    from ..functions.vectors import dot, l2_distance, norm
    from ..sources.catalog import load_table
    from .pq import GATE_K, GATE_QUERIES, anchor_codebooks, pq_anchor_vhat
    from .semdedup import anchor_centroids, assign_clusters

    emb = load_table(spark, "embeddings", sf_dir)
    cents = anchor_centroids(k=8, seed=7)
    cent_lit = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in cents])

    assigned = assign_clusters(emb, cents)  # (vec_id, embedding, cluster)
    my_cent = F.element_at(cent_lit, F.col("cluster") + 1)
    residual = F.zip_with(
        F.col("embedding").cast("array<double>"), my_cent, lambda x, c: x - c
    )
    vh_res = pq_anchor_vhat(residual, anchor_codebooks(seed=_RES_SEED, scale=_RES_SCALE))
    vhat = assigned.select(
        "vec_id",
        "cluster",
        F.zip_with(vh_res, my_cent, lambda r, c: r + c).alias("__vh"),
    )

    q = emb.filter(F.col("vec_id") < GATE_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        norm(F.col("embedding")).alias("__qn"),
    )
    qexp = q.select(
        "query_id",
        "__qv",
        "__qn",
        F.posexplode(cent_lit).alias("cluster", "__cent"),
    ).select(
        "query_id",
        "__qv",
        "__qn",
        "cluster",
        l2_distance(F.col("__qv").cast("array<double>"), F.col("__cent")).alias("__d"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__d").asc(), F.col("cluster").asc())
    qrank = (
        qexp.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= GATE_NPROBE)
        .select("query_id", "cluster", "__qv", "__qn")
    )

    denom = F.col("__qn") * norm(F.col("__vh"))
    scored = (
        vhat.join(F.broadcast(qrank), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                F.when(denom > 0, dot(F.col("__qv"), F.col("__vh")) / denom).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= GATE_K)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "cosine")
        .orderBy("query_id", "rank")
    )


def _ivfpq_adc_topk_sql() -> str:
    from .pq import GATE_K, GATE_QUERIES, _codebook_sql_values, anchor_codebooks
    from .semdedup import _centroid_sql_values, anchor_centroids

    dsub, k, nq, npr = 8, GATE_K, GATE_QUERIES, GATE_NPROBE
    cents = _centroid_sql_values(anchor_centroids(k=8, seed=7))
    cbs = _codebook_sql_values(anchor_codebooks(seed=_RES_SEED, scale=_RES_SCALE))
    return f"""
WITH cent(cluster, cv) AS (VALUES {cents}),
cb(sub, code, w) AS (VALUES {cbs}),
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
res AS (
  SELECT a.vec_id, a.cluster,
         LIST_TRANSFORM(CAST(a.embedding AS DOUBLE[]), (x, i) -> x - c.cv[i]) AS r
  FROM assigned a JOIN cent c ON c.cluster = a.cluster
),
enc AS (
  SELECT vec_id, cluster, sub, w FROM (
    SELECT r.vec_id, r.cluster, c.sub, c.code, c.w,
           ROW_NUMBER() OVER (
             PARTITION BY r.vec_id, c.sub
             ORDER BY LIST_DISTANCE(LIST_SLICE(r.r, c.sub*{dsub}+1, c.sub*{dsub}+{dsub}), c.w) ASC,
                      c.code ASC
           ) AS rk
    FROM res r, cb c
  ) WHERE rk = 1
),
vres AS (
  SELECT vec_id, cluster, FLATTEN(LIST(w ORDER BY sub)) AS vr
  FROM enc GROUP BY vec_id, cluster
),
vhat AS (
  SELECT v.vec_id, v.cluster,
         LIST_TRANSFORM(v.vr, (x, i) -> x + c.cv[i]) AS vh
  FROM vres v JOIN cent c ON c.cluster = v.cluster
),
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {nq}
),
qrank AS (
  SELECT query_id, cluster, qv FROM (
    SELECT q.query_id, c.cluster, q.qv,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY LIST_DISTANCE(q.qv, c.cv) ASC, c.cluster ASC
           ) AS pr
    FROM q, cent c
  ) WHERE pr <= {npr}
),
scored AS (
  SELECT r.query_id, v.vec_id AS neighbor_id,
         ROUND(LIST_COSINE_SIMILARITY(r.qv, v.vh), 6) AS cosine
  FROM qrank r JOIN vhat v ON v.cluster = r.cluster
  WHERE v.vec_id != r.query_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


IVFPQ_ADC_TOPK_SQL = _ivfpq_adc_topk_sql()
