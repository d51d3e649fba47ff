"""Vocabulary coverage / OOV-rate analysis.

Tokenizer-fit triage for a training corpus: fix the top-K corpus
vocabulary (by frequency, deterministic tie-break on the token
itself), then measure per document how much of its token stream
falls outside that vocabulary. High OOV share predicts poor
tokenizer fertility (many byte-fallback splits) and flags domain
drift between a corpus slice and the tokenizer's training mix.

Shape: one token-count agg, a window top-K over the (vocab-sized)
count table, then a broadcast-friendly left join of token occurrences
against the K-row vocab and a per-doc re-agg. The only corpus-sized
shuffles are the count agg and the per-doc re-agg; the vocab join
broadcasts.

Everything is exact integer/string work — full oracle, no
quantization needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

VOCAB_K = 16  # the synthetic corpus has ~40 distinct tokens; K=16
# leaves a real OOV tail at every test scale (non-vacuous gate)


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("tok"),
    )


def top_vocab(toks: DataFrame, k: int) -> DataFrame:
    """Top-k tokens by frequency, ties broken lexicographically —
    fully deterministic, so two engines build the same vocab."""
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    return counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).select("tok")


def vocab_coverage(
    docs: DataFrame,
    k: int = VOCAB_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_tokens, n_oov, oov_rate) per document against the
    corpus's own top-k vocabulary. Empty docs: rate 0.0."""
    toks = _tokens(docs, id_col, text_col).persist()
    vocab = top_vocab(toks, k).withColumn("__in", F.lit(1))
    per_doc = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.round(F.col("n_oov") / F.col("n_tokens"), 6),
            )
            .otherwise(0.0)
            .alias("oov_rate"),
        )
    )


def vocab_coverage_gate(spark, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / OOV rate of documents against the corpus top-K vocab."""
    from ..sources.catalog import load_table

    return vocab_coverage(load_table(spark, "documents", sf_dir)).orderBy("doc_id")


VOCAB_COVERAGE_SQL = rf"""
WITH toks AS (
  SELECT doc_id AS doc,
         UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w != '')) AS tok
  FROM documents
),
counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rk FROM counts
  ) WHERE rk <= {VOCAB_K}
),
per_doc AS (
  SELECT t.doc, COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
  GROUP BY t.doc
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.n_oov, 0) AS n_oov,
       CASE WHEN COALESCE(p.n_tokens, 0) > 0
            THEN ROUND(p.n_oov / CAST(p.n_tokens AS DOUBLE), 6)
            ELSE 0.0 END AS oov_rate
FROM documents d LEFT JOIN per_doc p ON p.doc = d.doc_id
ORDER BY d.doc_id
"""
