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


# ───────────────────────── anchor-codebook gate (X4) ─────────────────────────
# The TRAINED codebooks above (fit_pq: driver-side seeded k-means) are
# the deployment path, recall-tested in pytest. The GATE below swaps in
# ANCHOR codebooks — deterministic data-independent codewords from a
# seeded rng, exactly the D8/X14 anchor-centroid policy — so encoding
# and ADC scoring become fully DuckDB-reproducible: the same 128
# codeword literals are embedded in the generated oracle SQL. The gate
# scores via decode-then-cosine (reconstruct v̂ from the chosen
# codewords, cosine(q, v̂)), which is VALUE-identical to the ADC LUT
# gather (dot(q, v̂) = Σ_sub lut[sub][code]) — the LUT is the physical
# optimization, not a different quantity.

ANCHOR_M = 8  # subspaces over the 64-dim embeddings
ANCHOR_KSUB = 16  # 2^4 codewords per subspace (nbits=4)
ANCHOR_DSUB = 8  # 64 / m
ANCHOR_SEED = 11
ANCHOR_SCALE = 0.12  # matches the synthetic embeddings' component scale
GATE_QUERIES = 10
GATE_K = 5


def anchor_codebooks(
    m: int = ANCHOR_M,
    ksub: int = ANCHOR_KSUB,
    dsub: int = ANCHOR_DSUB,
    seed: int = ANCHOR_SEED,
    scale: float = ANCHOR_SCALE,
) -> list[list[list[float]]]:
    """Deterministic codebooks[m][ksub][dsub] (data-independent, like
    LSH hyperplanes) — shared verbatim by the Spark gate and the
    generated oracle SQL."""
    rng = np.random.default_rng(seed)
    cb = rng.normal(scale=scale, size=(m, ksub, dsub))
    return [[[float(v) for v in code] for code in sub] for sub in cb]


def pq_anchor_vhat(vec_col, codebooks: list[list[list[float]]]):
    """Reconstructed vector v̂ for `vec_col` under anchor codebooks, as
    ONE narrow Column expression (static unroll over subspaces): per
    subspace, argmin-by-L2 over the ksub literal codewords (ties → the
    lowest code, via struct ordering), then concatenate the chosen
    codewords. No shuffle, no UDF — encoding rides whole-stage codegen
    and scales embarrassingly at any corpus size."""
    from ..functions.vectors import l2_distance

    dsub = len(codebooks[0][0])
    ksub = len(codebooks[0])
    def _score(cb_lit, sub):
        # closure factory: PySpark reads the lambda's arity, so the
        # captured columns must NOT appear as defaulted params
        return lambda c: F.struct(
            l2_distance(sub, F.element_at(cb_lit, c + 1)).alias("d"),
            c.alias("c"),
        )

    chosen = []
    for s, cb_s in enumerate(codebooks):
        cb_lit = F.array(*[F.array(*[F.lit(v) for v in code]) for code in cb_s])
        sub = F.slice(vec_col, s * dsub + 1, dsub)
        scored = F.transform(F.sequence(F.lit(0), F.lit(ksub - 1)), _score(cb_lit, sub))
        best_code = F.array_min(scored)["c"]
        chosen.append(F.element_at(cb_lit, best_code + 1))
    return F.concat(*chosen)


def pq_adc_topk_gate(spark, sf_dir: str) -> DataFrame:
    """Gate (X4): PQ-compressed cosine top-5 for the first 10 query
    vectors under anchor codebooks — raw queries against reconstructed
    corpus vectors (asymmetric distance), brute-force X1 shape
    otherwise (broadcast query set, round-6 cosine, id tie-break)."""
    from ..sources.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    cb = anchor_codebooks()
    vh = emb.select("vec_id", pq_anchor_vhat(F.col("embedding"), cb).alias("__vh"))
    from ..functions.vectors import dot, norm

    q = emb.filter(F.col("vec_id") < GATE_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        norm(F.col("embedding")).alias("__qn"),
    )
    denom = F.col("__qn") * norm(F.col("__vh"))
    scored = (
        vh.crossJoin(F.broadcast(q))
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


def _codebook_sql_values(codebooks: list[list[list[float]]]) -> str:
    rows = []
    for s, sub in enumerate(codebooks):
        for c, code in enumerate(sub):
            vals = ", ".join(repr(v) for v in code)
            rows.append(f"({s}, {c}, CAST([{vals}] AS DOUBLE[]))")
    return ",\n".join(rows)


def _pq_adc_topk_sql() -> str:
    dsub, k, nq = ANCHOR_DSUB, GATE_K, GATE_QUERIES
    return f"""
WITH cb(sub, code, cv) AS (VALUES {_codebook_sql_values(anchor_codebooks())}),
enc AS (
  SELECT vec_id, sub, cv FROM (
    SELECT e.vec_id, c.sub, c.code, c.cv,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id, c.sub
             ORDER BY LIST_DISTANCE(
               CAST(LIST_SLICE(e.embedding, c.sub*{dsub}+1, c.sub*{dsub}+{dsub}) AS DOUBLE[]),
               c.cv) ASC, c.code ASC
           ) AS rk
    FROM embeddings e, cb c
  ) WHERE rk = 1
),
vhat AS (
  SELECT vec_id, FLATTEN(LIST(cv ORDER BY sub)) AS vh FROM enc GROUP BY vec_id
),
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {nq}
),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         ROUND(LIST_COSINE_SIMILARITY(q.qv, v.vh), 6) AS cosine
  FROM q, vhat v WHERE v.vec_id != q.query_id
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


PQ_ADC_TOPK_SQL = _pq_adc_topk_sql()


def pq_recall_eval_gate(spark, sf_dir: str) -> DataFrame:
    """Gate (X19): measured recall@5 of the anchor-PQ ADC path (X4
    gate) against exact brute force, per query — the trust-the-
    compression number a rollout reads before serving from codes
    (X10's ann_recall_eval pattern applied to quantization instead of
    bucketing). Composes two fully-oracled pipelines; recall on the
    ppm grid."""
    from ..sources.catalog import load_table
    from .ann import brute_force_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < GATE_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=GATE_K).select(
        "query_id", F.col("neighbor_id").alias("vec_id")
    )
    approx = pq_adc_topk_gate(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("vec_id")
    )
    hits = approx.join(exact, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("hits")
    )
    base = queries.select("query_id")
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.expr(f"coalesce(hits, 0) * 1000000 div {GATE_K}")
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


def _pq_recall_eval_sql() -> str:
    k, nq = GATE_K, GATE_QUERIES
    return f"""
WITH approx_topk AS ({_pq_adc_topk_sql()}),
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {nq}
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(LIST_COSINE_SIMILARITY(q.qv, CAST(e.embedding AS DOUBLE[])), 6) DESC,
                      e.vec_id ASC
           ) AS rn
    FROM q, embeddings e WHERE e.vec_id != q.query_id
  ) WHERE rn <= {k}
),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS hits
  FROM approx_topk a JOIN exact x
    ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
  GROUP BY a.query_id
)
SELECT q.query_id,
       COALESCE(h.hits, 0) AS hits,
       CAST(COALESCE(h.hits, 0) * 1000000 // {k} AS BIGINT) AS recall_ppm
FROM q LEFT JOIN hits h ON h.query_id = q.query_id
ORDER BY q.query_id
"""


PQ_RECALL_EVAL_SQL = _pq_recall_eval_sql()
