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
scan that builds the pool (broadcast queries, no corpus shuffle) plus
ONE broadcast-hash vector fetch for the pool ids; everything after
operates on Q rows each carrying a bounded POOL-sized array (10
candidates, 90 pairwise sims — sims computed IN-ROW from the pool
vectors, same ROUND(cos,6)·1e6 grid). That bounded Q-row table is
collected and the greedy K-step argmax runs on the driver in exact
int64 arithmetic — the count_triangles literal-result convention for
answer-sized tails: at any corpus size the collect is Q×POOL rows.
The pre-r12 form instead ran each greedy step as a join+groupBy round
with 7 eager localCheckpoints ≈ 50 blocking construction jobs
(measured r12: 3.1 s of the sf0.1 bench, ~85% scheduler latency); an
all-expression rewrite (array_max over a static unroll) was measured
too — its codegen alone cost 3.3 s/run — before settling here.
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
    in cosine ppm (position 1 has no diversity term: 7·rel).

    Spark carries the corpus-scale work: the X1 relevance scan and ONE
    broadcast-hash vector fetch whose groupBy emits per query the pool
    (cand, rel_ppm) plus the pool×(pool−1) pairwise cosine ppms
    computed IN-ROW from the pool vectors (same ROUND(cos,6)·1e6 grid
    as before, so the integers collected are grid-identical to the
    former join-based pairs table). The greedy K-step argmax then runs
    on the driver over those collected integers — exact int64
    arithmetic, ties toward the smaller candidate id — and the answer
    comes back as a literal frame. The collect is bounded at Q rows
    (Q·pool ids + Q·pool·(pool−1) sims) at ANY corpus size. Every
    aggregate here is order-independent (max over a set), so the
    non-deterministic collect_list order never reaches the output."""
    rel = brute_force_topk(corpus, queries, k=pool, id_col=id_col, vec_col=vec_col)
    cands = rel.select(
        "query_id",
        F.col("neighbor_id").alias("cand"),
        _ppm(F.col("cosine")).alias("rel_ppm"),
    )
    vecs = corpus.select(F.col(id_col).alias("cand"), F.col(vec_col).alias("__v"))
    # Broadcast the Q×POOL id table so the corpus-sized vector fetch is
    # a map-side hash join (corpus streams once, never shuffles).
    byq = (
        vecs.join(F.broadcast(cands), "cand")
        .groupBy("query_id")
        .agg(F.collect_list(F.struct("cand", "rel_ppm", "__v")).alias("cs"))
        .select(
            "query_id",
            F.transform(
                F.col("cs"),
                lambda c: F.struct(c["cand"].alias("cand"), c["rel_ppm"].alias("rel_ppm")),
            ).alias("pl"),
            F.flatten(
                F.transform(
                    F.col("cs"),
                    lambda a: F.transform(
                        F.filter(F.col("cs"), lambda b: b["cand"] != a["cand"]),
                        lambda b: F.struct(
                            a["cand"].alias("ca"),
                            b["cand"].alias("cb"),
                            _ppm(F.round(cosine(a["__v"], b["__v"]), 6)).alias(
                                "sim_ppm"
                            ),
                        ),
                    ),
                )
            ).alias("ps"),
        )
    )

    out: list[tuple[int, int, int, int]] = []
    for r in byq.collect():
        rel_by_cand = {int(c["cand"]): int(c["rel_ppm"]) for c in r["pl"]}
        sim = {(int(p["ca"]), int(p["cb"])): int(p["sim_ppm"]) for p in r["ps"]}
        selected: list[int] = []
        for pos in range(1, k + 1):
            best_key = None
            best_cand = None
            for c, rp in rel_by_cand.items():
                if c in selected:
                    continue
                if pos == 1:
                    s = LAM10_REL * rp
                else:
                    s = LAM10_REL * rp - LAM10_DIV * max(
                        sim[(c, sid)] for sid in selected
                    )
                key = (s, -c)
                if best_key is None or key > best_key:
                    best_key, best_cand = key, c
            if best_cand is None:
                break
            selected.append(best_cand)
            out.append((int(r["query_id"]), pos, best_cand, best_key[0]))
    out.sort()
    spark = corpus.sparkSession
    return spark.createDataFrame(
        out, "query_id long, pos int, neighbor_id long, score10_ppm long"
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
