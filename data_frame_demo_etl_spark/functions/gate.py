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
    """Whitespace token counts per document (the corpus token-budget primitive)."""
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
    """Length/punctuation/stopword quality scoring per document."""
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
    """N-gram-heuristic language ID over documents (Column expressions only)."""
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
    """64-bit rolling-hash document fingerprints (portable md5 family for the oracle)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", T.fingerprint(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


TEXT_FINGERPRINT_SQL = r"""
SELECT doc_id, MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')))) AS fingerprint
FROM documents
ORDER BY doc_id
"""


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction + counting over synthesized PII-bearing text
    (deterministically injected into the corpus so the oracle sees the
    same spans)."""
    docs = load_table(spark, "documents", sf_dir)
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com now")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" ssn 123-45-6789 end")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return salted.select(
        "doc_id",
        T.redact_pii(F.col("text")).alias("redacted"),
        T.pii_counts(F.col("text"))["email"].alias("email_hits"),
        T.pii_counts(F.col("text"))["ssn"].alias("ssn_hits"),
    ).orderBy("doc_id")


TEXT_PII_REDACT_SQL = r"""
WITH salted AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' ssn 123-45-6789 end' ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  REGEXP_REPLACE(
    REGEXP_REPLACE(
      REGEXP_REPLACE(
        REGEXP_REPLACE(
          REGEXP_REPLACE(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[SSN]', 'g'),
          '[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}', '[CREDIT_CARD]', 'g'),
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IPV4]', 'g'),
    '\+?[0-9][0-9()\-\s]{7,}[0-9]', '[PHONE]', 'g') AS redacted,
  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS email_hits,
  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS INTEGER) AS ssn_hits
FROM salted
ORDER BY doc_id
"""


def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring over text with deterministically injected
    duplicate lines."""
    docs = load_table(spark, "documents", sf_dir)
    lined = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nfooter line"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("\nfooter line")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return lined.select(
        "doc_id", F.round(T.repetition_score(F.col("text")), 6).alias("repetition")
    ).orderBy("doc_id")


TEXT_REPETITION_SCORE_SQL = r"""
WITH lined AS (
  SELECT doc_id,
    text || CHR(10) || 'footer line'
         || CASE WHEN doc_id % 3 = 0 THEN CHR(10) || 'footer line' ELSE '' END AS text
  FROM documents
),
arr AS (
  SELECT doc_id,
    LIST_FILTER(LIST_TRANSFORM(STRING_SPLIT(text, CHR(10)), s -> TRIM(s)), s -> s != '') AS lines
  FROM lined
)
SELECT doc_id,
  ROUND(CASE WHEN LEN(lines) > 1
        THEN CAST(LEN(lines) - LEN(LIST_DISTINCT(lines)) AS DOUBLE) / LEN(lines)
        ELSE 0.0 END, 6) AS repetition
FROM arr
ORDER BY doc_id
"""


def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking (200 chars, 50 overlap) exploded to
    one row per chunk."""
    docs = load_table(spark, "documents", sf_dir)
    chunked = docs.select(
        "doc_id", F.explode(T.chunk_text(F.col("text"), 200, 50)).alias("c")
    )
    return chunked.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk").alias("chunk"),
        F.length("c.chunk").alias("chunk_len"),
    ).orderBy("doc_id", "chunk_idx")


TEXT_CHUNKING_SQL = """
WITH starts AS (
  SELECT doc_id, text, LENGTH(text) AS n,
         UNNEST(GENERATE_SERIES(0, GREATEST((LENGTH(text)-1) - ((LENGTH(text)-1) % 150), 0), 150)) AS s
  FROM documents
),
valid AS (
  SELECT doc_id, text, s, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS chunk_idx
  FROM starts WHERE s = 0 OR s < n
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       SUBSTRING(text, s + 1, 200) AS chunk,
       CAST(LENGTH(SUBSTRING(text, s + 1, 200)) AS INTEGER) AS chunk_len
FROM valid
ORDER BY doc_id, chunk_idx
"""


def docs_with_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ↔ vector join: documents matched to their embedding row
    (doc_id = vec_id), carrying quality and vector norm."""
    from .vectors import norm

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select(
            "doc_id",
            "source",
            "label",
            F.round(T.quality_score(F.col("text")), 6).alias("quality"),
            F.round(norm(F.col("embedding")), 6).alias("vec_norm"),
        )
        .orderBy("doc_id")
    )


DOCS_WITH_EMBEDDINGS_SQL = rf"""
SELECT d.doc_id, d.source, e.label,
  ROUND(
    0.5 * LEAST(CAST(LENGTH(d.text) AS DOUBLE) / 500.0, 1.0)
    + 0.5 * LEAST((CASE WHEN LEN(LIST_FILTER(STRING_SPLIT_REGEX(d.text, '\s+'), w -> w != '')) > 0
        THEN CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(d.text), '\s+'), w -> w IN ('{_SW}'))) AS DOUBLE)
             / LEN(LIST_FILTER(STRING_SPLIT_REGEX(d.text, '\s+'), w -> w != ''))
        ELSE 0.0 END) * 5, 1.0)
    - 0.25 * LEAST((CASE WHEN LENGTH(d.text) > 0
        THEN CAST(LEN(REGEXP_EXTRACT_ALL(d.text, '[^\w\s]')) AS DOUBLE) / LENGTH(d.text)
        ELSE 0.0 END) * 4, 1.0),
  6) AS quality,
  ROUND(SQRT(LIST_DOT_PRODUCT(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))), 6) AS vec_norm
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
ORDER BY d.doc_id
"""


def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup: hash-groupBy keeps each duplicate group's minimum doc_id."""
    docs = load_table(spark, "documents", sf_dir)
    return dedup_exact(docs, text_col="text", id_col="doc_id").orderBy("doc_id")


DEDUP_EXACT_SQL = """
SELECT doc_id, text, lang, source, n_chars
FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
ORDER BY doc_id
"""


def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher quality rule flags + the overall keep/drop
    decision (emitting flags rather than filtering keeps the gate
    non-vacuous regardless of the corpus's pass rate)."""
    from .text import gopher_quality_flags, gopher_quality_pass

    docs = load_table(spark, "documents", sf_dir)
    flags = gopher_quality_flags(F.col("text"))
    return docs.select(
        "doc_id",
        *[c.alias(name) for name, c in flags.items()],
        gopher_quality_pass(F.col("text")).alias("keep"),
    ).orderBy("doc_id")


TEXT_GOPHER_QUALITY_SQL = r"""
WITH feats AS (
  SELECT doc_id,
    LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '') AS ws,
    LIST_FILTER(STRING_SPLIT_REGEX(text, '\n'), l -> TRIM(l) != '') AS lines,
    LEN(REGEXP_EXTRACT_ALL(text, '(#|\.\.\.|…)')) AS symbols
  FROM documents
),
m AS (
  SELECT doc_id,
    LEN(ws) AS n_words,
    CASE WHEN LEN(ws) > 0
         THEN CAST(LIST_SUM(LIST_TRANSFORM(ws, w -> LEN(w))) AS DOUBLE) / LEN(ws)
         ELSE 0.0 END AS mean_len,
    symbols,
    GREATEST(LEN(lines), 1) AS n_lines,
    LEN(LIST_FILTER(lines, l -> REGEXP_MATCHES(TRIM(l), '^([*\-•]|[0-9]+[.)])'))) AS bullet_lines,
    LEN(LIST_FILTER(lines, l -> REGEXP_MATCHES(TRIM(l), '(\.\.\.|…)$'))) AS ellipsis_lines,
    LEN(LIST_FILTER(ws, w -> REGEXP_MATCHES(w, '[A-Za-z]'))) AS alpha_words
  FROM feats
)
SELECT doc_id,
  n_words >= 50 AND n_words <= 100000 AS wc_ok,
  mean_len >= 3.0 AND mean_len <= 10.0 AS mean_len_ok,
  CASE WHEN n_words > 0 THEN CAST(symbols AS DOUBLE) / n_words <= 0.1 ELSE FALSE END AS symbol_ok,
  CAST(bullet_lines AS DOUBLE) / n_lines < 0.9 AS bullet_ok,
  CAST(ellipsis_lines AS DOUBLE) / n_lines < 0.3 AS ellipsis_ok,
  CASE WHEN n_words > 0 THEN CAST(alpha_words AS DOUBLE) / n_words >= 0.8 ELSE FALSE END AS alpha_ok,
  (n_words >= 50 AND n_words <= 100000)
    AND (mean_len >= 3.0 AND mean_len <= 10.0)
    AND (CASE WHEN n_words > 0 THEN CAST(symbols AS DOUBLE) / n_words <= 0.1 ELSE FALSE END)
    AND (CAST(bullet_lines AS DOUBLE) / n_lines < 0.9)
    AND (CAST(ellipsis_lines AS DOUBLE) / n_lines < 0.3)
    AND (CASE WHEN n_words > 0 THEN CAST(alpha_words AS DOUBLE) / n_words >= 0.8 ELSE FALSE END) AS keep
FROM m
ORDER BY doc_id
"""


def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020 §2.2): line-level
    terminal-punctuation / min-words / javascript filtering, then
    document-level sentence-count, lorem-ipsum, and curly-brace rules.

    The shipped synthetic corpus has no line structure or punctuation
    at all, which would make every rule constant. The gate therefore
    first SENTENCIFIES each document deterministically — regroups its
    words into 8-word lines with cyclic punctuation, injecting
    javascript / lorem-ipsum / curly-brace markers keyed on line index
    and doc_id — using only expressions both engines share, then
    applies the C4 rules to that lined text. Every flag varies across
    the corpus, so the gate checks the full rule logic, not a
    constant. Emitting per-document flags (rather than the filtered
    corpus) keeps row count non-vacuous regardless of pass rate."""
    from .text import C4_MIN_SENTENCES

    docs = load_table(spark, "documents", sf_dir)
    # stage 1: word array (computed once; HOF lambdas would otherwise
    # re-split the text per line)
    ws = docs.select("doc_id", F.filter(F.split("text", r"\s+"), lambda w: w != "").alias("ws"))
    # stage 2: deterministic sentencified text
    n_chunks = (F.ceil(F.size("ws") / 8)).cast("int")
    suffix = (
        lambda i: F.when(i % 5 == F.lit(2), F.lit(" javascript enabled."))
        .when(i % 3 == F.lit(0), F.lit("."))
        .when(i % 3 == F.lit(2), F.lit("!"))
        .otherwise(F.lit(""))
    )
    lines = F.when(
        F.size("ws") > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat(F.array_join(F.slice("ws", i * 8 + 1, 8), " "), suffix(i)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    lined = F.concat(
        F.array_join(lines, "\n"),
        F.when(F.col("doc_id") % 11 == 0, F.lit("\nlorem ipsum dolor sit amet.")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 13 == 0, F.lit("\nweird { brace } block here okay.")).otherwise(
            F.lit("")
        ),
    )
    staged = ws.select("doc_id", lined.alias("text"))
    # stage 3: C4 line rules over the lined text (kept materialized once)
    kept = F.filter(
        F.split("text", r"\n"),
        lambda l: F.trim(l).rlike(r'[.!?"]$')
        & (F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != "")) >= 5)
        & ~F.lower(l).contains("javascript"),
    )
    m = staged.select("doc_id", "text", kept.alias("kept")).select(
        "doc_id",
        "text",
        F.size("kept").cast("long").alias("lines_kept"),
        F.regexp_count(F.array_join("kept", "\n"), F.lit(r"[.!?]")).cast("long").alias(
            "n_sentences"
        ),
    )
    return m.select(
        "doc_id",
        "lines_kept",
        "n_sentences",
        (F.col("n_sentences") >= C4_MIN_SENTENCES).alias("sentences_ok"),
        (~F.lower(F.col("text")).contains("lorem ipsum")).alias("no_lorem"),
        (~F.col("text").contains("{")).alias("no_brace"),
        (
            (F.col("n_sentences") >= C4_MIN_SENTENCES)
            & ~F.lower(F.col("text")).contains("lorem ipsum")
            & ~F.col("text").contains("{")
        ).alias("keep"),
    ).orderBy("doc_id")


TEXT_C4_FILTERS_SQL = r"""
WITH w AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), x -> x != '') AS ws
  FROM documents
),
lined AS (
  SELECT doc_id,
    ARRAY_TO_STRING(
      LIST_TRANSFORM(
        RANGE(0, CAST(CEIL(LEN(ws) / 8.0) AS INT)),
        i -> ARRAY_TO_STRING(ws[i*8+1 : i*8+8], ' ') ||
             CASE WHEN i % 5 = 2 THEN ' javascript enabled.'
                  WHEN i % 3 = 0 THEN '.'
                  WHEN i % 3 = 2 THEN '!'
                  ELSE '' END
      ), chr(10))
    || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'weird { brace } block here okay.' ELSE '' END
    AS text
  FROM w
),
kept AS (
  SELECT doc_id, text,
    LIST_FILTER(STRING_SPLIT(text, chr(10)), l ->
      REGEXP_MATCHES(TRIM(l), '[.!?"]$')
      AND LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(l), '\s+'), x -> x != '')) >= 5
      AND NOT CONTAINS(LOWER(l), 'javascript')
    ) AS kl
  FROM lined
),
m AS (
  SELECT doc_id, text,
    LEN(kl) AS lines_kept,
    LEN(REGEXP_EXTRACT_ALL(ARRAY_TO_STRING(kl, chr(10)), '[.!?]')) AS n_sentences
  FROM kept
)
SELECT doc_id,
  lines_kept,
  n_sentences,
  n_sentences >= 3 AS sentences_ok,
  NOT CONTAINS(LOWER(text), 'lorem ipsum') AS no_lorem,
  NOT CONTAINS(text, '{') AS no_brace,
  (n_sentences >= 3
   AND NOT CONTAINS(LOWER(text), 'lorem ipsum')
   AND NOT CONTAINS(text, '{')) AS keep
FROM m
ORDER BY doc_id
"""


def docs_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality dashboard: ROLLUP(source, lang) over document
    counts, whitespace-token volume, and Gopher-rule pass counts —
    the per-source / per-language triage view a data curator reads
    before deciding sampling weights. One grouping-sets pass; all
    aggregates are integer sums (engine-exact), averages derived
    after the fact."""
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        F.coalesce("source", F.lit("?")).alias("source"),
        F.coalesce("lang", F.lit("?")).alias("lang"),
        T.token_count_whitespace(F.col("text")).cast("long").alias("ws_tokens"),
        F.when(T.gopher_quality_pass(F.col("text")), 1).otherwise(0).alias("gopher_pass"),
    )
    return (
        base.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("total_tokens"),
            F.round(F.sum("ws_tokens") / F.count(F.lit(1)), 6).alias("avg_tokens"),
            F.sum("gopher_pass").alias("n_gopher_pass"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "total_tokens",
            "avg_tokens",
            "n_gopher_pass",
        )
        .orderBy("source", "lang")
    )


DOCS_QUALITY_ROLLUP_SQL = r"""
WITH feats AS (
  SELECT doc_id,
    COALESCE(source, '?') AS source,
    COALESCE(lang, '?') AS lang,
    LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '') AS ws,
    LIST_FILTER(STRING_SPLIT_REGEX(text, '\n'), l -> TRIM(l) != '') AS lines,
    LEN(REGEXP_EXTRACT_ALL(text, '(#|\.\.\.|…)')) AS symbols
  FROM documents
),
m AS (
  SELECT doc_id, source, lang,
    CAST(LEN(ws) AS BIGINT) AS ws_tokens,
    LEN(ws) AS n_words,
    CASE WHEN LEN(ws) > 0
         THEN CAST(LIST_SUM(LIST_TRANSFORM(ws, w -> LEN(w))) AS DOUBLE) / LEN(ws)
         ELSE 0.0 END AS mean_len,
    symbols,
    GREATEST(LEN(lines), 1) AS n_lines,
    LEN(LIST_FILTER(lines, l -> REGEXP_MATCHES(TRIM(l), '^([*\-•]|[0-9]+[.)])'))) AS bullet_lines,
    LEN(LIST_FILTER(lines, l -> REGEXP_MATCHES(TRIM(l), '(\.\.\.|…)$'))) AS ellipsis_lines,
    LEN(LIST_FILTER(ws, w -> REGEXP_MATCHES(w, '[A-Za-z]'))) AS alpha_words
  FROM feats
),
flags AS (
  SELECT source, lang, ws_tokens,
    CASE WHEN (n_words >= 50 AND n_words <= 100000)
      AND (mean_len >= 3.0 AND mean_len <= 10.0)
      AND (CASE WHEN n_words > 0 THEN CAST(symbols AS DOUBLE) / n_words <= 0.1 ELSE FALSE END)
      AND (CAST(bullet_lines AS DOUBLE) / n_lines < 0.9)
      AND (CAST(ellipsis_lines AS DOUBLE) / n_lines < 0.3)
      AND (CASE WHEN n_words > 0 THEN CAST(alpha_words AS DOUBLE) / n_words >= 0.8 ELSE FALSE END)
    THEN 1 ELSE 0 END AS gopher_pass
  FROM m
)
SELECT COALESCE(source, 'ALL') AS source,
       COALESCE(lang, 'ALL') AS lang,
       COUNT(*) AS n_docs,
       CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(ws_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
       CAST(SUM(gopher_pass) AS BIGINT) AS n_gopher_pass
FROM flags
GROUP BY ROLLUP (source, lang)
ORDER BY source, lang
"""


def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 table A1's
    "repetitious text" family) per document, word-n-gram variant:

    - ``dup_word_frac``  — fraction of word occurrences that repeat an
      earlier word (1-gram repetition);
    - ``top2_frac`` / ``top3_frac`` — fraction of n-gram characters
      covered by the heaviest 2-/3-gram (MAX of count×len, so ties
      resolve identically in every engine);
    - ``dup5_frac`` — fraction of 5-gram characters belonging to
      5-grams that occur more than once.

    (The corresponding line/paragraph signals exist as the pure-Column
    ``text.repetition_score``; the synthetic corpus has no newlines,
    so a line-based gate would be vacuous here.)

    Scale shape: ONE scan — all four n-gram families are built as a
    single flattened array of (n, gram) structs and exploded once —
    then two hash aggregations (doc,n,gram → doc,n → doc). No UDFs,
    no window over the corpus, no joins. At 100 TB the explode factor
    is ~4× the token count, the same order as the MinHash shingle
    table.
    """
    docs = load_table(spark, "documents", sf_dir)
    # Materialize the word array as a REAL column before any lambda
    # touches it: an expression referenced inside a higher-order
    # function re-evaluates per element (an O(words²) regexp-split per
    # doc here — measured 13s → ~1s at sf0.1 for this query).
    wsdf = docs.select("doc_id", T.words(F.col("text")).alias("ws"))
    ws = F.col("ws")

    def tagged_grams(n: int):
        if n == 1:
            grams = ws
        else:
            # F.sequence(1, k) counts DOWN when k < 1 — guard short docs.
            grams = F.when(
                F.size(ws) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
                ),
            ).otherwise(F.slice(F.array(F.lit("")), 1, 0))
        return F.transform(
            grams, lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))
        )

    exploded = wsdf.select(
        "doc_id",
        F.explode(
            F.flatten(F.array(*[tagged_grams(n) for n in (1, 2, 3, 5)]))
        ).alias("t"),
    ).select("doc_id", F.col("t.n").alias("n"), F.col("t.g").alias("g"))
    gc = (
        exploded.groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("l", F.length("g"))
    )
    per_n = gc.groupBy("doc_id", "n").agg(
        F.sum(F.col("c") * F.col("l")).alias("tot"),
        F.max(F.col("c") * F.col("l")).alias("mx"),
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("l")).otherwise(0)).alias("dup"),
        F.sum("c").alias("items"),
        F.count(F.lit(1)).alias("dist"),
    )
    pick = lambda n, expr: F.max(F.when(F.col("n") == n, expr))  # noqa: E731
    return (
        per_n.groupBy("doc_id")
        .agg(
            F.coalesce(
                pick(1, F.round((F.col("items") - F.col("dist")).cast("double") / F.col("items"), 6)),
                F.lit(0.0),
            ).alias("dup_word_frac"),
            F.coalesce(
                pick(2, F.round(F.col("mx").cast("double") / F.col("tot"), 6)), F.lit(0.0)
            ).alias("top2_frac"),
            F.coalesce(
                pick(3, F.round(F.col("mx").cast("double") / F.col("tot"), 6)), F.lit(0.0)
            ).alias("top3_frac"),
            F.coalesce(
                pick(5, F.round(F.col("dup").cast("double") / F.col("tot"), 6)), F.lit(0.0)
            ).alias("dup5_frac"),
        )
        .orderBy("doc_id")
    )


TEXT_REPETITION_SIGNALS_SQL = r"""
WITH w AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), x -> x != '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, 1 AS n, ws[i] AS g
  FROM w, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws))) AS i)
  UNION ALL
  SELECT doc_id, 2, ARRAY_TO_STRING(ws[i:i+1], ' ')
  FROM w, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws) - 1)) AS i)
  UNION ALL
  SELECT doc_id, 3, ARRAY_TO_STRING(ws[i:i+2], ' ')
  FROM w, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws) - 2)) AS i)
  UNION ALL
  SELECT doc_id, 5, ARRAY_TO_STRING(ws[i:i+4], ' ')
  FROM w, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws) - 4)) AS i)
),
gc AS (
  SELECT doc_id, n, g, COUNT(*) AS c, LEN(g) AS l
  FROM grams GROUP BY doc_id, n, g
),
per_n AS (
  SELECT doc_id, n,
         SUM(c * l) AS tot,
         MAX(c * l) AS mx,
         SUM(CASE WHEN c > 1 THEN c * l ELSE 0 END) AS dup,
         SUM(c) AS items,
         COUNT(*) AS dist
  FROM gc GROUP BY doc_id, n
)
SELECT doc_id,
  COALESCE(MAX(CASE WHEN n = 1
    THEN ROUND(CAST(items - dist AS DOUBLE) / items, 6) END), 0.0) AS dup_word_frac,
  COALESCE(MAX(CASE WHEN n = 2
    THEN ROUND(CAST(mx AS DOUBLE) / tot, 6) END), 0.0) AS top2_frac,
  COALESCE(MAX(CASE WHEN n = 3
    THEN ROUND(CAST(mx AS DOUBLE) / tot, 6) END), 0.0) AS top3_frac,
  COALESCE(MAX(CASE WHEN n = 5
    THEN ROUND(CAST(dup AS DOUBLE) / tot, 6) END), 0.0) AS dup5_frac
FROM per_n
GROUP BY doc_id
ORDER BY doc_id
"""


def docs_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility report — the multilingual-
    budget planning table every training pipeline keeps: docs, words,
    BPE-ish tokens, chars, and the two fertility ratios (tokens per
    word, chars per token) in exact integer ppm. A language whose
    fertility is 2× English costs 2× the compute per word — this is
    the number that decides per-language sampling weights."""
    docs = load_table(spark, "documents", sf_dir)
    per_doc = docs.select(
        "lang",
        T.token_count_whitespace(F.col("text")).cast("long").alias("words"),
        T.token_count_bpe(F.col("text")).cast("long").alias("toks"),
        F.length("text").cast("long").alias("chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("words").alias("words"),
            F.sum("toks").alias("tokens"),
            F.sum("chars").alias("chars"),
        )
        .select(
            "lang",
            "n_docs",
            "words",
            "tokens",
            "chars",
            F.expr("tokens * 1000000 div greatest(words, 1)").alias(
                "tokens_per_word_ppm"
            ),
            F.expr("chars * 1000000 div greatest(tokens, 1)").alias(
                "chars_per_token_ppm"
            ),
        )
        .orderBy("lang")
    )


DOCS_TOKEN_FERTILITY_SQL = r"""
WITH per_doc AS (
  SELECT lang,
         CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '')) AS BIGINT) AS words,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS toks,
         CAST(LENGTH(text) AS BIGINT) AS chars
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS words,
       CAST(SUM(toks) AS BIGINT) AS tokens,
       CAST(SUM(chars) AS BIGINT) AS chars,
       CAST(SUM(toks) * 1000000 // GREATEST(SUM(words), 1) AS BIGINT) AS tokens_per_word_ppm,
       CAST(SUM(chars) * 1000000 // GREATEST(SUM(toks), 1) AS BIGINT) AS chars_per_token_ppm
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the n-gram heuristic's prediction
    (L1) against the corpus's labeled `lang`, as (actual, predicted,
    n, row_share_ppm) — the eval table a lang-ID rollout reads before
    trusting the classifier for routing/filtering. row_share_ppm is
    the per-actual-language recall grid in exact integer ppm."""
    docs = load_table(spark, "documents", sf_dir)
    pred = docs.select(
        F.col("lang").alias("actual"), T.lang_id(F.col("text")).alias("predicted")
    )
    counts = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("actual").agg(F.sum("n").alias("t"))
    return (
        counts.join(totals, "actual")
        .select(
            "actual",
            "predicted",
            "n",
            F.expr("n * 1000000 div t").alias("row_share_ppm"),
        )
        .orderBy("actual", "predicted")
    )


LANG_ID_CONFUSION_SQL = rf"""
WITH s AS (
  SELECT doc_id, lang,
    {_markers_sql("de")} AS de,
    {_markers_sql("en")} AS en,
    {_markers_sql("es")} AS es,
    {_markers_sql("fr")} AS fr,
    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[一-鿿]')) AS INTEGER) AS zh
  FROM documents
),
pred AS (
  SELECT lang AS actual,
    CASE
      WHEN GREATEST(de, en, es, fr, zh) = 0 THEN 'und'
      WHEN de >= GREATEST(en, es, fr, zh) THEN 'de'
      WHEN en >= GREATEST(es, fr, zh) THEN 'en'
      WHEN es >= GREATEST(fr, zh) THEN 'es'
      WHEN fr >= zh THEN 'fr'
      ELSE 'zh'
    END AS predicted
  FROM s
),
counts AS (
  SELECT actual, predicted, COUNT(*) AS n FROM pred GROUP BY actual, predicted
),
totals AS (SELECT actual, SUM(n) AS t FROM counts GROUP BY actual)
SELECT actual, predicted, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // t AS BIGINT) AS row_share_ppm
FROM counts JOIN totals USING (actual)
ORDER BY actual, predicted
"""
