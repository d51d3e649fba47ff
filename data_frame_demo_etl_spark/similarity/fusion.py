"""Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke &
Buettcher 2009) — the standard way to combine a lexical ranking
(BM25) with a semantic ranking (embedding cosine) without score
calibration: each list contributes 1/(K + rank) per candidate and the
fused list is re-ranked by the sum. This is the retrieval shape a
RAG / contamination-triage pipeline actually runs: sparse + dense,
fused.

Composes two existing, independently-verified rankers over the SAME
id space (documents.doc_id = embeddings.vec_id, the repo's text↔
vector contract):

- lexical: ``bm25.bm25_topk`` at depth RRF_DEPTH
- semantic: ``ann.brute_force_topk`` at depth RRF_DEPTH (broadcast
  query side — the corpus never shuffles)

Fusion is one full-outer equi-join of two ≤ Q·depth-row lists (tiny;
both sides are already per-query top-k) and a window re-rank.

Determinism: RRF points ride the 1e-6 integer grid —
FLOOR(1e6/(K+rank) + 0.5) — so the fused score is an exact integer
sum; ranks feeding it come from rankers whose tie-breaks are already
total (score desc, neighbor asc).

No reference analog; brief-mandated beyond-reference retrieval
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.catalog import load_table
from .ann import brute_force_topk
from .bm25 import B, K1, SCALE, bm25_topk

RRF_K = 60
RRF_DEPTH = 20
K_OUT = 5
QUERY_IDS = [0, 1, 2, 3, 4]


def _points(rank_col: str):
    return F.when(
        F.col(rank_col).isNotNull(),
        F.floor(F.lit(float(SCALE)) / (F.lit(RRF_K) + F.col(rank_col)) + 0.5).cast("long"),
    ).otherwise(F.lit(0).cast("long"))


def rrf_fuse(lex: DataFrame, sem: DataFrame, k_out: int = K_OUT) -> DataFrame:
    """Fuse two (query_id, rank, neighbor_id, …) rank lists into the
    RRF top-``k_out``: (query_id, rank, neighbor_id, rrf_micro,
    lex_rank, sem_rank)."""
    lexr = lex.select("query_id", "neighbor_id", F.col("rank").alias("lex_rank"))
    semr = sem.select("query_id", "neighbor_id", F.col("rank").alias("sem_rank"))
    fused = (
        lexr.join(semr, ["query_id", "neighbor_id"], "full_outer")
        .withColumn("rrf_micro", _points("lex_rank") + _points("sem_rank"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_out)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            "rrf_micro",
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("sem_rank").cast("int").alias("sem_rank"),
        )
    )


def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: hybrid top-5 for the first 5 documents — BM25 over text
    fused with exact cosine over the documents' embeddings."""
    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    lex = bm25_topk(docs, query_ids=QUERY_IDS, k=RRF_DEPTH)
    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sem = brute_force_topk(emb, queries, k=RRF_DEPTH)
    return rrf_fuse(lex, sem).orderBy("query_id", "rank")


_IDS = ", ".join(str(i) for i in QUERY_IDS)

RETRIEVAL_RRF_FUSION_SQL = rf"""
WITH toks AS (
  SELECT doc_id AS doc, UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w != '')) AS tok
  FROM documents
),
tf AS (SELECT doc, tok, COUNT(*) AS tf FROM toks GROUP BY doc, tok),
dl AS (SELECT doc, COUNT(*) AS dl FROM toks GROUP BY doc),
totals AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl),
dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
qterms AS (
  SELECT DISTINCT doc AS query_id, tok FROM toks WHERE doc IN ({_IDS})
),
terms AS (
  SELECT q.query_id, tf.doc,
    CAST(FLOOR(
      LN((CAST(t.n_docs AS DOUBLE) - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
      * (tf.tf * ({K1} + 1.0))
      / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl * CAST(t.n_docs AS DOUBLE) / CAST(t.total_len AS DOUBLE)))
      * {SCALE} + 0.5) AS BIGINT) AS tq
  FROM qterms q
  JOIN tf ON tf.tok = q.tok AND tf.doc != q.query_id
  JOIN dl ON dl.doc = tf.doc
  JOIN dfreq ON dfreq.tok = q.tok
  CROSS JOIN totals t
),
lex_scored AS (
  SELECT query_id, doc AS neighbor_id,
         ROUND(CAST(SUM(tq) AS DOUBLE) / {SCALE}, 6) AS bm25
  FROM terms GROUP BY query_id, doc
),
lex AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY bm25 DESC, neighbor_id ASC) AS rank
    FROM lex_scored
  ) WHERE rank <= {RRF_DEPTH}
),
qv AS (
  SELECT vec_id AS query_id, embedding AS v FROM embeddings WHERE vec_id IN ({_IDS})
),
sem_scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(LIST_COSINE_SIMILARITY(CAST(q.v AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cosine
  FROM qv q, embeddings e
  WHERE e.vec_id != q.query_id
),
sem AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM sem_scored
  ) WHERE rank <= {RRF_DEPTH}
),
fused AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.neighbor_id, s.neighbor_id) AS neighbor_id,
         l.rank AS lex_rank, s.rank AS sem_rank,
         COALESCE(CAST(FLOOR({SCALE}.0 / ({RRF_K} + l.rank) + 0.5) AS BIGINT), 0)
         + COALESCE(CAST(FLOOR({SCALE}.0 / ({RRF_K} + s.rank) + 0.5) AS BIGINT), 0) AS rrf_micro
  FROM lex l FULL OUTER JOIN sem s
    ON l.query_id = s.query_id AND l.neighbor_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id, rrf_micro, lex_rank, sem_rank FROM (
  SELECT query_id, neighbor_id, rrf_micro,
         CAST(lex_rank AS INTEGER) AS lex_rank,
         CAST(sem_rank AS INTEGER) AS sem_rank,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM fused
)
WHERE rank <= {K_OUT}
ORDER BY query_id, rank
"""
