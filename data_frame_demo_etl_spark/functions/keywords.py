"""RAKE keyword extraction (Rose et al. 2010) — corpus-level candidate
phrases scored by word degree/frequency.

The classic unsupervised keyword extractor: split text into candidate
phrases at stopword boundaries, score each WORD by
degree(w)/freq(w) (degree = total length of phrases it appears in —
words that live in long multi-word phrases score high), score each
PHRASE as the sum of its member word scores, and keep the top
candidates. Complements L1–L21: the tokenizer/quality family measures
documents; this extracts the vocabulary a human would skim.

Spark-first shape: tokenization is one narrow regexp pass;
phrase-id assignment is a running stopword count windowed per doc
(doc_id is high-cardinality — the window parallelizes); word stats
are one vocabulary-sized aggregation broadcast back onto the
(distinct) phrase table. Scores ride the ppm grid (degree·10⁶ div
freq — exact integers), so the oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.catalog import load_table

#: Stopword boundary set (literal in BOTH engines — part of the
#: operator definition, like the LSH hyperplanes).
RAKE_STOPWORDS = (
    "a an and are as at be but by for from had has have he her his i if in is it "
    "its my no not of on or our she so that the their they this to was we were "
    "which will with you your"
).split()

#: Candidate phrases longer than this are discarded (standard RAKE
#: practice: beyond ~4 words candidates are clause fragments).
RAKE_MAX_PHRASE = 4

RAKE_TOP = 20

_WORD_RE = "[a-z0-9]+"


def rake_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = RAKE_TOP,
    max_phrase: int = RAKE_MAX_PHRASE,
) -> DataFrame:
    """(rank, phrase, n_words, n_occurrences, score_ppm) — the corpus
    top keywords by RAKE score."""
    stop_lit = [F.lit(s) for s in RAKE_STOPWORDS]
    words = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
        ).alias("pos", "w"),
    )
    wdoc = Window.partitionBy("doc").orderBy("pos")
    marked = words.withColumn("is_stop", F.col("w").isin(*RAKE_STOPWORDS)).withColumn(
        "pid", F.sum(F.when(F.col("is_stop"), 1).otherwise(0)).over(wdoc)
    )
    phr_occ = (
        marked.filter(~F.col("is_stop"))
        .groupBy("doc", "pid")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "w"))).alias("ws"))
        .select(F.expr("transform(ws, s -> s.w)").alias("wa"))
        .filter((F.size("wa") >= 1) & (F.size("wa") <= max_phrase))
        .select(F.concat_ws(" ", F.col("wa")).alias("phrase"), F.size("wa").alias("plen"))
    )
    word_occ = phr_occ.select(F.explode(F.split("phrase", " ")).alias("w"), "plen")
    stats = word_occ.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("degree"),
    ).select("w", F.expr("degree * 1000000 div freq").alias("wscore"))
    uphr = phr_occ.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.first("plen").alias("n_words"),
    )
    scored = (
        uphr.select("phrase", "n_occurrences", "n_words", F.explode(F.split("phrase", " ")).alias("w"))
        .join(F.broadcast(stats), "w")
        .groupBy("phrase", "n_occurrences", "n_words")
        .agg(F.sum("wscore").alias("score_ppm"))
    )
    wtop = Window.partitionBy().orderBy(F.col("score_ppm").desc(), F.col("phrase").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wtop))
        .filter(F.col("rank") <= top)
        .select(
            F.col("rank").cast("long").alias("rank"),
            "phrase",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("score_ppm").cast("long").alias("score_ppm"),
        )
        .orderBy("rank")
    )


def docs_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: top-20 RAKE keyword phrases over the documents corpus."""
    docs = load_table(spark, "documents", sf_dir)
    return rake_keywords(docs)


def _stop_sql() -> str:
    return ", ".join(f"'{s}'" for s in RAKE_STOPWORDS)


DOCS_RAKE_KEYWORDS_SQL = f"""
WITH words AS (
  SELECT doc_id AS doc, t.w, t.pos
  FROM documents,
       LATERAL (SELECT UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '{_WORD_RE}')) AS w,
                       GENERATE_SUBSCRIPTS(REGEXP_EXTRACT_ALL(LOWER(text), '{_WORD_RE}'), 1) AS pos) t
),
marked AS (
  SELECT doc, pos, w, w IN ({_stop_sql()}) AS is_stop,
         SUM(CASE WHEN w IN ({_stop_sql()}) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
  FROM words
),
phr_occ AS (
  SELECT STRING_AGG(w, ' ' ORDER BY pos) AS phrase, CAST(COUNT(*) AS BIGINT) AS plen
  FROM marked WHERE NOT is_stop
  GROUP BY doc, pid
  HAVING COUNT(*) BETWEEN 1 AND {RAKE_MAX_PHRASE}
),
word_occ AS (
  SELECT UNNEST(STRING_SPLIT(phrase, ' ')) AS w, plen FROM phr_occ
),
stats AS (
  SELECT w, CAST(SUM(plen) * 1000000 // COUNT(*) AS BIGINT) AS wscore
  FROM word_occ GROUP BY w
),
uphr AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences, MIN(plen) AS n_words
  FROM phr_occ GROUP BY phrase
),
scored AS (
  SELECT u.phrase, u.n_occurrences, u.n_words,
         CAST(SUM(s.wscore) AS BIGINT) AS score_ppm
  FROM (SELECT phrase, n_occurrences, n_words, UNNEST(STRING_SPLIT(phrase, ' ')) AS w FROM uphr) u
  JOIN stats s USING (w)
  GROUP BY u.phrase, u.n_occurrences, u.n_words
)
SELECT CAST(rank AS BIGINT) AS rank, phrase,
       CAST(n_words AS BIGINT) AS n_words, n_occurrences, score_ppm
FROM (
  SELECT phrase, n_words, n_occurrences, score_ppm,
         ROW_NUMBER() OVER (ORDER BY score_ppm DESC, phrase ASC) AS rank
  FROM scored
) WHERE rank <= {RAKE_TOP}
ORDER BY rank
"""
