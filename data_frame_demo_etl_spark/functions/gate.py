"""Correctness-gate wrappers for the text-analysis functions and exact
dedup over the `documents` table, with DuckDB oracles mirroring the
same closed-form logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedupe import dedup_exact
from ..sources.catalog import load_table
from . import text as T


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        T.token_count_whitespace(F.col("text")).alias("ws_tokens"),
        T.token_count_bpe(F.col("text")).alias("bpe_tokens"),
    ).orderBy("doc_id")


TEXT_TOKEN_COUNT_SQL = r"""
SELECT
  doc_id,
  CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '')) AS INTEGER) AS ws_tokens,
  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens
FROM documents
ORDER BY doc_id
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", T.quality_score(F.col("text")).alias("quality")).orderBy("doc_id")


_SW = "', '".join(T.STOPWORDS)
TEXT_QUALITY_SCORE_SQL = rf"""
WITH f AS (
  SELECT
    doc_id,
    CAST(LENGTH(text) AS DOUBLE) AS n,
    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '')) AS DOUBLE) AS wc,
    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w IN ('{_SW}'))) AS DOUBLE) AS sw,
    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^\w\s]')) AS DOUBLE) AS punct
  FROM documents
)
SELECT
  doc_id,
  ROUND(
    0.5 * LEAST(n / 500.0, 1.0)
    + 0.5 * LEAST((CASE WHEN wc > 0 THEN sw / wc ELSE 0.0 END) * 5, 1.0)
    - 0.25 * LEAST((CASE WHEN n > 0 THEN punct / n ELSE 0.0 END) * 4, 1.0),
  6) AS quality
FROM f
ORDER BY doc_id
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", "lang", T.lang_id(F.col("text")).alias("lang_pred")
    ).orderBy("doc_id")


def _markers_sql(lang: str) -> str:
    ms = "', '".join(T.LANG_MARKERS[lang])
    return (
        f"CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\\s+'), w -> w IN ('{ms}'))) AS INTEGER)"
    )


TEXT_LANG_ID_SQL = rf"""
WITH s AS (
  SELECT doc_id, lang,
    {_markers_sql("de")} AS de,
    {_markers_sql("en")} AS en,
    {_markers_sql("es")} AS es,
    {_markers_sql("fr")} AS fr,
    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[一-鿿]')) AS INTEGER) AS zh
  FROM documents
)
SELECT doc_id, lang,
  CASE
    WHEN GREATEST(de, en, es, fr, zh) = 0 THEN 'und'
    WHEN de >= GREATEST(en, es, fr, zh) THEN 'de'
    WHEN en >= GREATEST(es, fr, zh) THEN 'en'
    WHEN es >= GREATEST(fr, zh) THEN 'es'
    WHEN fr >= zh THEN 'fr'
    ELSE 'zh'
  END AS lang_pred
FROM s
ORDER BY doc_id
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", T.fingerprint(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


TEXT_FINGERPRINT_SQL = r"""
SELECT doc_id, MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')))) AS fingerprint
FROM documents
ORDER BY doc_id
"""


def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return dedup_exact(docs, text_col="text", id_col="doc_id").orderBy("doc_id")


DEDUP_EXACT_SQL = """
SELECT doc_id, text, lang, source, n_chars
FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
ORDER BY doc_id
"""
