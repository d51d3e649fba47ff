"""Okapi BM25 retrieval (Robertson & Zaragoza 2009), engine-portable.

Complements the TF-IDF cosine path (text_retrieval.py): BM25 is the
standard lexical ranking function — term-frequency saturation (k1)
and document-length normalization (b) on top of IDF. Used here for
query-by-document ("more like this"), the retrieval mode a
training-data pipeline needs for contamination triage and
nearest-neighbor corpus exploration.

Shape: one groupBy for per-doc term frequencies, one for document
frequencies, two scalar totals (N, total length), then a single
equi-join of query terms against the posting (tf) table and a per-
(query, doc) re-aggregation. Posting-list join on the token key —
the inverted-index shape; no self-join on documents.

Portability: every per-term score is quantized to a 1e-6 integer grid
(FLOOR(s·1e6 + 0.5)) BEFORE the per-document sum, so aggregate order
cannot move bits and DuckDB reproduces the ranking exactly. The
formula is evaluated with one fixed parenthesization in both engines:

    idf = LN((N - df + 0.5) / (df + 0.5) + 1)          [Lucene form]
    s   = idf · (tf · (k1+1)) / (tf + k1·(1 - b + b·dl·N/L))

with k1 = 1.2, b = 0.75, and dl·N/L replacing dl/avgdl (avgdl = L/N)
so every input to the double expression is an exact integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

K1 = 1.2
B = 0.75
SCALE = 1_000_000


def _tok_table(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return corpus.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("tok"),
    )


def bm25_topk(
    corpus: DataFrame,
    query_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k BM25 matches for each query document (self excluded):
    (query_id, rank, neighbor_id, bm25)."""
    toks = _tok_table(corpus, id_col, text_col).persist()
    tf = toks.groupBy("doc", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    # Corpus totals ride a 1-row scalar-aggregate broadcast (the
    # q11/q22 shape) instead of a blocking driver collect (r12): the
    # doubles entering idf/denom are identical to the former literals
    # (count→double, sum→double are the same exact conversions), so
    # the bm25 grid is unchanged.
    totals = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        F.sum("dl").cast("double").alias("__total_len"),
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    qterms = (
        toks.filter(F.col("doc").isin(query_ids))
        .select(F.col("doc").alias("query_id"), "tok")
        .distinct()
    )

    idf = F.log(
        (F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + K1 * (
        1.0 - B + B * F.col("dl") * F.col("__n_docs") / F.col("__total_len")
    )
    term_q = F.floor(idf * (F.col("tf") * (K1 + 1.0)) / denom * SCALE + 0.5).cast("long")

    scored = (
        qterms.join(tf, "tok")
        .filter(F.col("doc") != F.col("query_id"))
        .join(dl, "doc")
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy("query_id", "doc")
        .agg(F.sum(term_q).alias("sq"))
        .select(
            "query_id",
            F.col("doc").alias("neighbor_id"),
            F.round(F.col("sq") / float(SCALE), 6).alias("bm25"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "bm25")
    )


QUERY_IDS = [0, 1, 2, 3, 4]


def text_bm25_topk(spark, sf_dir: str) -> DataFrame:
    """Gate: BM25 top-5 "more like this" for the first 5 documents."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return bm25_topk(docs, query_ids=QUERY_IDS).orderBy("query_id", "rank")


TEXT_BM25_TOPK_SQL = rf"""
WITH toks AS (
  SELECT doc_id AS doc, UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w != '')) AS tok
  FROM documents
),
tf AS (SELECT doc, tok, COUNT(*) AS tf FROM toks GROUP BY doc, tok),
dl AS (SELECT doc, COUNT(*) AS dl FROM toks GROUP BY doc),
totals AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl),
dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
qterms AS (
  SELECT DISTINCT doc AS query_id, tok FROM toks
  WHERE doc IN ({", ".join(str(i) for i in QUERY_IDS)})
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
scored AS (
  SELECT query_id, doc AS neighbor_id,
         ROUND(CAST(SUM(tq) AS DOUBLE) / {SCALE}, 6) AS bm25
  FROM terms GROUP BY query_id, doc
)
SELECT query_id, rank, neighbor_id, bm25 FROM (
  SELECT query_id, neighbor_id, bm25,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY bm25 DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= 5
ORDER BY query_id, rank
"""
