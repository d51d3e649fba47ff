"""RAKE keyword extraction (Rose et al. 2010) — corpus-level candidate
phrases scored by word degree/frequency.

The classic unsupervised keyword extractor: split text into candidate
phrases at stopword boundaries, score each WORD by
degree(w)/freq(w) (degree = total length of phrases it appears in —
words that live in long multi-word phrases score high), score each
PHRASE as the sum of its member word scores, and keep the top
candidates. Complements L1–L21: the tokenizer/quality family measures
documents; this extracts the vocabulary a human would skim.

Spark-first shape: tokenization AND phrase carving are one in-row
regexp pass (stopword tokens deleted from the rebuilt token string,
leaving phrase boundaries) — no token explode, no per-doc window, no
data movement before the vocabulary-sized aggregations; word stats
are one such aggregation broadcast back onto the (distinct) phrase
table. Scores ride the ppm grid (degree·10⁶ div freq — exact
integers), so the oracle matches bit-for-bit.
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
    # r12: candidate phrases are a PER-DOCUMENT function of the token
    # sequence, so they are carved out IN-ROW: rebuild the token stream
    # as a single-space-joined string and delete each stopword token
    # (consumed with its leading space, trailing space kept via
    # lookahead so stopword runs fall together) leaving "|" phrase
    # boundaries — one linear regexp pass, zero shuffles. The former
    # shape posexploded every token, ran a per-doc running-sum window
    # (full token-stream exchange + sort) and a (doc, pid) groupBy
    # (second token-stream exchange) just to reassemble adjacent
    # words; phrase formation now costs no data movement at all and
    # the first exchanges in the plan are the vocabulary-sized
    # aggregations.
    arr = F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
    joined = F.concat(F.lit(" "), F.concat_ws(" ", arr), F.lit(" "))
    # The stopwords are joined into a regex alternation UNescaped; that
    # is only sound while every entry is a plain [a-z0-9]+ token (a
    # metacharacter would silently corrupt phrase carving and diverge
    # from the oracle's IN-list). Enforce the precondition.
    for w in RAKE_STOPWORDS:
        if not w.isalnum():
            raise ValueError(f"RAKE stopword {w!r} is not a plain alphanumeric token")
    stop_pat = " (?:" + "|".join(RAKE_STOPWORDS) + ")(?= )"
    segments = F.split(F.regexp_replace(joined, stop_pat, " |"), r"\|")
    phrases = F.filter(
        F.transform(segments, lambda s: F.trim(s)), lambda s: s != ""
    )
    # Persist: the word-stats branch and the distinct-phrase branch
    # both consume the phrase table; the stats side is the broadcast
    # BUILD of the scoring join, so it materializes the cache before
    # the probe side reads it (no concurrent-recompute hazard).
    phr_occ = (
        docs.select(F.explode(phrases).alias("phrase"))
        .select("phrase", F.size(F.split("phrase", " ")).alias("plen"))
        .filter((F.col("plen") >= 1) & (F.col("plen") <= max_phrase))
        .persist()
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
    # r12: the global row_number window funnelled the WHOLE phrase
    # vocabulary through one task; (score, phrase) is a total order
    # (phrases are distinct), so orderBy+limit — a distributed
    # per-partition top-k merge (TakeOrderedAndProject) — selects the
    # identical rows and the rank window then numbers only ≤top rows.
    wtop = Window.partitionBy().orderBy(F.col("score_ppm").desc(), F.col("phrase").asc())
    return (
        scored.orderBy(F.col("score_ppm").desc(), F.col("phrase").asc())
        .limit(top)
        .withColumn("rank", F.row_number().over(wtop))
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
