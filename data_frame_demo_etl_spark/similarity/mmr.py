"""Maximal Marginal Relevance (MMR) diverse re-ranking (X12).

The rerank layer the retrieval family was missing: X1–X3 produce
relevance-ordered candidates, X8 fuses rankers, X10/X11 evaluate —
MMR (Carbonell & Goldstein 1998) post-processes a candidate pool so
the returned top-k trades relevance against redundancy:

    MMR(d) = λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s)

greedily, S the already-selected set. This is what a RAG/retrieval
stack actually serves when near-duplicate passages crowd the top of
the dense ranking.

Determinism & portability: cosines ride the repo's 6-decimal grid
(ROUND(cos, 6), the X1 convention) and are converted to exact ppm
integers; with λ = 0.7 the greedy score is the INTEGER
10·MMR·1e6 = 7·rel_ppm − 3·max_sim_ppm, so every comparison is exact
int64 arithmetic in both engines, ties broken toward the smaller
candidate id. The greedy loop is a fixed K-step unroll; the oracle
unrolls the same K steps CTE-for-CTE (argmax via QUALIFY-style
ROW_NUMBER subselects, cumulative selected-set joins).

Scale shape (100 TB): the only corpus-sized work is the X1 relevance
scan that builds the pool (broadcast queries, no corpus shuffle);
everything after operates on Q×POOL rows (bounded, here 10×10). The
pool and the pairwise-similarity table are eagerly checkpointed —
each greedy round consumes both, and round t references every
earlier pick (without materialization the lineage re-expands
~2^K-fold). Per-round argmax is the partial-aggregable max(struct)
keep-best construction, never a row_number window over a hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.vectors import cosine
from ..sources.catalog import load_table
from .ann import brute_force_topk

N_QUERIES = 10
K = 5
POOL = 10
LAM10_REL = 7  # λ = 0.7, scaled ×10 so the score stays integer
LAM10_DIV = 3


def _ppm(col: Column) -> Column:
    # ppm integers derived from the ALREADY-6dp-rounded cosine — both
    # engines multiply identical doubles, so the grids agree exactly.
    return F.round(col * F.lit(1_000_000.0)).cast("long")


def _argmax(df: DataFrame, score_col: str, pos: int) -> DataFrame:
    """Per-query argmax of (score DESC, cand ASC) as max(struct)."""
    m = df.groupBy("query_id").agg(
        F.max(
            F.struct(F.col(score_col).alias("s"), (-F.col("cand")).alias("nc"))
        ).alias("m")
    )
    return m.select(
        "query_id",
        (-F.col("m.nc")).alias("cand"),
        F.col("m.s").cast("long").alias("score10_ppm"),
        F.lit(pos).cast("int").alias("pos"),
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = K,
    pool: int = POOL,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, pos, neighbor_id, score10_ppm): the MMR-greedy top-k
    out of the relevance top-``pool``, score10_ppm = 7·rel − 3·maxsim
    in cosine ppm (position 1 has no diversity term: 7·rel)."""
    rel = brute_force_topk(corpus, queries, k=pool, id_col=id_col, vec_col=vec_col)
    cands = rel.select(
        "query_id",
        F.col("neighbor_id").alias("cand"),
        _ppm(F.col("cosine")).alias("rel_ppm"),
    ).localCheckpoint(eager=True)

    vecs = corpus.select(F.col(id_col).alias("cand"), F.col(vec_col).alias("__v"))
    a = cands.select("query_id", "cand").join(vecs, "cand").select(
        "query_id", F.col("cand").alias("ca"), F.col("__v").alias("__va")
    )
    b = cands.select("query_id", "cand").join(vecs, "cand").select(
        "query_id", F.col("cand").alias("cb"), F.col("__v").alias("__vb")
    )
    pairs = (
        a.join(b, "query_id")
        .filter(F.col("ca") != F.col("cb"))
        .select(
            "query_id",
            "ca",
            "cb",
            _ppm(F.round(cosine(F.col("__va"), F.col("__vb")), 6)).alias("sim_ppm"),
        )
        .localCheckpoint(eager=True)
    )

    first = _argmax(
        cands.select(
            "query_id", "cand", (F.lit(LAM10_REL) * F.col("rel_ppm")).alias("score10")
        ),
        "score10",
        1,
    ).localCheckpoint(eager=True)
    selected = first
    for t in range(2, k + 1):
        remaining = cands.join(
            selected.select("query_id", "cand"), ["query_id", "cand"], "left_anti"
        )
        ms = (
            pairs.join(
                selected.select("query_id", F.col("cand").alias("cb")),
                ["query_id", "cb"],
            )
            .groupBy("query_id", F.col("ca").alias("cand"))
            .agg(F.max("sim_ppm").alias("ms"))
        )
        scored = remaining.join(ms, ["query_id", "cand"]).select(
            "query_id",
            "cand",
            (
                F.lit(LAM10_REL) * F.col("rel_ppm") - F.lit(LAM10_DIV) * F.col("ms")
            ).alias("score10"),
        )
        pick = _argmax(scored, "score10", t).localCheckpoint(eager=True)
        selected = selected.unionByName(pick)
    return selected.select(
        "query_id", "pos", F.col("cand").alias("neighbor_id"), "score10_ppm"
    )


def embeddings_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: MMR top-5 (λ=0.7) out of the cosine top-10 pool for the
    first 10 query vectors — the diverse-retrieval sibling of
    `ann_cosine_topk`."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return mmr_rerank(emb, q).orderBy("query_id", "pos")


def _mmr_sql(k: int = K, pool: int = POOL, n_queries: int = N_QUERIES) -> str:
    head = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.query_id, e.vec_id AS cand,
         CAST(ROUND(ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) * 1000000) AS BIGINT) AS rel_ppm
  FROM q, embeddings e WHERE e.vec_id != q.query_id
),
cands AS MATERIALIZED (
  SELECT query_id, cand, rel_ppm FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel_ppm DESC, cand ASC) AS rn
    FROM scored
  ) WHERE rn <= {pool}
),
ps AS MATERIALIZED (
  SELECT a.query_id, a.cand AS ca, b.cand AS cb,
         CAST(ROUND(ROUND(LIST_COSINE_SIMILARITY(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 6) * 1000000) AS BIGINT) AS sim_ppm
  FROM cands a
  JOIN cands b ON a.query_id = b.query_id AND a.cand != b.cand
  JOIN embeddings ea ON ea.vec_id = a.cand
  JOIN embeddings eb ON eb.vec_id = b.cand
),
s1 AS MATERIALIZED (
  SELECT query_id, cand, {LAM10_REL} * rel_ppm AS score10_ppm, 1 AS pos FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel_ppm DESC, cand ASC) AS rn
    FROM cands
  ) WHERE rn = 1
),
sel1 AS (SELECT query_id, cand, score10_ppm, pos FROM s1)"""
    parts = [head]
    for t in range(2, k + 1):
        prev = f"sel{t - 1}"
        parts.append(
            f""",
m{t} AS (
  SELECT p.query_id, p.ca AS cand, MAX(p.sim_ppm) AS ms
  FROM ps p JOIN {prev} s ON s.query_id = p.query_id AND s.cand = p.cb
  GROUP BY 1, 2
),
r{t} AS (
  SELECT c.query_id, c.cand,
         {LAM10_REL} * c.rel_ppm - {LAM10_DIV} * m.ms AS score10_ppm
  FROM cands c
  JOIN m{t} m ON m.query_id = c.query_id AND m.cand = c.cand
  WHERE NOT EXISTS (
    SELECT 1 FROM {prev} s WHERE s.query_id = c.query_id AND s.cand = c.cand
  )
),
s{t} AS MATERIALIZED (
  SELECT query_id, cand, score10_ppm, {t} AS pos FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score10_ppm DESC, cand ASC) AS rn
    FROM r{t}
  ) WHERE rn = 1
),
sel{t} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM s{t})"""
        )
    parts.append(
        f"""
SELECT query_id, CAST(pos AS INTEGER) AS pos, cand AS neighbor_id,
       CAST(score10_ppm AS BIGINT) AS score10_ppm
FROM sel{k}
ORDER BY query_id, pos
"""
    )
    return "".join(parts)


EMBEDDINGS_MMR_RERANK_SQL = _mmr_sql()
