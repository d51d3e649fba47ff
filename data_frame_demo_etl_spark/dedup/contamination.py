"""Benchmark-contamination detection: find training documents that
share long n-gram spans with an evaluation set (the decontamination
step every serious LLM data pipeline runs before training).

Same scale shape as the set-similarity join: hash the n-grams once,
equi-join on the 64-bit hash (eval side is small → broadcast), count
shared spans per (train, eval) pair. n defaults to 8 — long enough
that shared spans indicate copying, not chance collocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .shingling import shingle_hash_table


def contamination_pairs(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """(train_id, eval_id, shared_ngrams) for every train/eval pair
    sharing >= min_shared distinct n-grams."""
    t = shingle_hash_table(train, id_col, text_col, n).select(
        F.col("doc").alias("train_id"), "h"
    )
    e = shingle_hash_table(eval_set, id_col, text_col, n).select(
        F.col("doc").alias("eval_id"), "h"
    )
    return (
        t.join(F.broadcast(e), "h")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Drop contaminated training documents."""
    dirty = contamination_pairs(train, eval_set, id_col, text_col, n, min_shared).select(
        F.col("train_id").alias(id_col)
    ).distinct()
    return train.join(dirty, id_col, "left_anti")


# --- gate ------------------------------------------------------------------

def contamination_check(spark, sf_dir: str) -> DataFrame:
    """Gate: docs split into train (doc_id%5!=0) / eval (doc_id%5==0);
    report contaminated pairs with 8-gram overlap counts."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    eval_set = docs.filter(F.col("doc_id") % 5 == 0)
    return contamination_pairs(train, eval_set).orderBy("train_id", "eval_id")


def docs_decontaminate(spark, sf_dir: str) -> DataFrame:
    """Gate: the ACTING half of decontamination — the surviving
    training set after dropping every train document (doc_id%5!=0)
    that shares ≥1 distinct 8-gram with the eval split (doc_id%5==0).
    `contamination_check` reports the pairs; this gate returns the set
    the pipeline would actually train on, so the drop itself is
    externally hash-verified (the D18-for-D17 convention). Plan: the
    eval shingle table broadcasts into the equi-join, the dirty-id set
    anti-joins train — no train-side shuffle beyond the anti join."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    eval_set = docs.filter(F.col("doc_id") % 5 == 0)
    kept = decontaminate(train, eval_set)
    return kept.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    ).orderBy("doc_id")


CONTAMINATION_CHECK_SQL = r"""
WITH words AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '') AS ws FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
         ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7] AS g
  FROM words, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(ws) - 7, 0))) AS i)
)
SELECT t.doc_id AS train_id, e.doc_id AS eval_id, COUNT(*) AS shared_ngrams
FROM grams t
JOIN grams e ON t.g = e.g
WHERE t.doc_id % 5 != 0 AND e.doc_id % 5 = 0
GROUP BY 1, 2
ORDER BY train_id, eval_id
"""

DOCS_DECONTAMINATE_SQL = r"""
WITH words AS (
  SELECT doc_id, text,
         LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '') AS ws
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
         ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7] AS g
  FROM words, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(ws) - 7, 0))) AS i)
),
dirty AS (
  SELECT DISTINCT t.doc_id
  FROM grams t JOIN grams e ON t.g = e.g
  WHERE t.doc_id % 5 != 0 AND e.doc_id % 5 = 0
)
SELECT d.doc_id, CAST(LEN(d.text) AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id % 5 != 0 AND d.doc_id NOT IN (SELECT doc_id FROM dirty)
ORDER BY doc_id
"""
