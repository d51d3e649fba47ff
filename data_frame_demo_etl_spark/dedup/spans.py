"""Sub-document (span-level) deduplication: the corpus-wide analog of
Dolma/CCNet line-dedup, on fixed word windows since the synthetic
corpus has no line structure.

Documents are cut into non-overlapping K-word spans; a span that
already occurred anywhere earlier in the corpus (global first-
occurrence order: (doc_id, position)) is dropped, and each document is
reassembled from its surviving spans. This removes repeated
boilerplate ACROSS documents that whole-document dedup can't touch —
two different pages sharing a navigation header keep one copy of the
header total.

Scale shape: one explode (spans ~= words/K rows), one window keyed by
the span text (the global first-occurrence shuffle — span HASHES
travel once the text column is dropped), one groupBy to reassemble.
No self-joins, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .shingling import word_array


def span_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", span_words: int = 20
) -> DataFrame:
    """(doc, idx, span): non-overlapping K-word windows per document."""
    ws_df = df.select(F.col(id_col).alias("doc"), word_array(F.col(text_col)).alias("__ws"))
    ws = F.col("__ws")
    n_spans = F.ceil(F.size(ws) / F.lit(span_words)).cast("int")
    idx = F.when(F.size(ws) > 0, F.sequence(F.lit(0), n_spans - 1)).otherwise(
        F.array().cast("array<int>")
    )
    spans = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(ws, i * span_words + 1, span_words))
    )
    return ws_df.select("doc", F.posexplode(spans).alias("idx", "span"))


def span_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", span_words: int = 20
) -> DataFrame:
    """(id_col, dedup_text, n_kept, n_total): corpus-wide span dedup
    with deterministic first-occurrence winners."""
    spans = span_table(df, id_col, text_col, span_words)
    # r13: first-occurrence winner per span via MIN of the (doc, idx)
    # struct — lexicographic ≡ the former window's orderBy(doc, idx),
    # and (doc, idx) is unique so the winner is identical. The window
    # shuffled and sorted every span OCCURRENCE (full span text rides
    # each row); the groupBy partial-aggregates map-side, shipping one
    # candidate winner per distinct span per task (§2.3).
    kept = (
        spans.groupBy("span")
        .agg(F.min(F.struct("doc", "idx")).alias("__w"))
        .select(F.col("__w.doc").alias("doc"), F.col("__w.idx").alias("idx"), "span")
    )
    re = kept.groupBy("doc").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span"))), lambda s: s["span"]
            ),
        ).alias("dedup_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = spans.groupBy("doc").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(totals, "doc", "left")
        .join(re, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_total", F.lit(0)).cast("long").alias("n_total"),
        )
    )


def dedup_spans(spark, sf_dir: str) -> DataFrame:
    """Gate query: corpus-wide 20-word span dedup over documents."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return span_dedup(docs).orderBy("doc_id")


DEDUP_SPANS_SQL = r"""
WITH words AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '') AS ws
  FROM documents
),
chunks AS (
  SELECT doc_id, i AS idx,
         ARRAY_TO_STRING(ws[(i*20+1):(i*20+20)], ' ') AS span
  FROM words,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(0, CAST(CEIL(LEN(ws) / 20.0) AS INT) - 1)) AS i)
  WHERE LEN(ws) > 0
),
kept AS (
  SELECT * FROM chunks
  QUALIFY ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, idx) = 1
),
re AS (
  SELECT doc_id,
         ARRAY_TO_STRING(LIST(span ORDER BY idx), ' ') AS dedup_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_total FROM chunks GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(re.dedup_text, '') AS dedup_text,
       COALESCE(re.n_kept, 0) AS n_kept,
       COALESCE(tot.n_total, 0) AS n_total
FROM documents d
LEFT JOIN tot ON tot.doc_id = d.doc_id
LEFT JOIN re ON re.doc_id = d.doc_id
ORDER BY d.doc_id
"""
