"""Corpus-trained n-gram language-model scoring (CCNet-style).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model; low-probability documents are noise, very-high
ones are boilerplate. The same shape works self-contained at corpus
scale: train bigram/unigram counts on the corpus itself with one
groupBy each, then score every document's average add-one-smoothed
bigram log-probability:

    score(doc) = mean over bigrams (w1 w2) of
                 ln( (c(w1 w2) + 1) / (c(w1) + V) )

Everything is Column expressions — tokenize, bigram windows, count
joins, log arithmetic — so the whole pipeline is one Catalyst plan
with three shuffles (unigram agg, bigram agg, score-join re-agg), all
on hashed token keys. No Python UDFs, no driver loops: the only
driver-side value is V (vocab size, one scalar).

Cross-engine portability: each bigram's log-prob is quantized to a
1e-6 integer grid (FLOOR(lp·1e6 + 0.5)) BEFORE summation, so the
per-document aggregate is exact integer arithmetic in both engines —
the covariance-gate trick; ln() libm differences (≤1 ulp) sit ~9
orders of magnitude below the grid.

At 100 TB: count tables are vocab-sized (unigrams) and
bigram-vocab-sized — large but far smaller than the corpus; the
scoring join shuffles document bigram occurrences on the bigram key.
Skewed ("the the") keys are AQE-split; a frequency cap is unnecessary
because counts, not pair joins, absorb the skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

LP_SCALE = 1_000_000


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def _bigrams(tk: Column) -> Column:
    n = F.greatest(F.size(tk) - 1, F.lit(0))
    left = F.slice(tk, F.lit(1), n)
    right = F.slice(tk, F.lit(2), n)
    return F.zip_with(left, right, lambda a, b: F.concat(a, F.lit(" "), b))


def lm_score_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average smoothed bigram log-prob, trained on the
    input corpus itself. Documents with fewer than two tokens have no
    bigrams and are absent from the output (they carry no LM signal).

    Returns (id_col, n_bigrams, avg_logprob)."""
    toks = docs.select(id_col, _tokens(F.col(text_col)).alias("tk"))

    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    vocab_size = uni.count()  # one scalar; vocab-bounded

    bi_occ = toks.select(id_col, F.explode(_bigrams(F.col("tk"))).alias("bg"))
    bi_counts = bi_occ.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))

    lp = F.log(F.col("cb") + F.lit(1.0)) - F.log(F.col("cu") + F.lit(float(vocab_size)))
    lpq = F.floor(lp * LP_SCALE + F.lit(0.5)).cast("long")

    scored = (
        bi_occ.join(bi_counts, "bg")
        .withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .select(id_col, lpq.alias("lpq"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("lpq").cast("double") / F.count(F.lit(1)) / LP_SCALE, 6
            ).alias("avg_logprob"),
        )
        .orderBy(id_col)
    )


def lm_score_gate(spark, sf_dir: str) -> DataFrame:
    """Gate: score the whole documents table against its own bigram LM."""
    from ..sources.catalog import load_table

    return lm_score_documents(load_table(spark, "documents", sf_dir))


LM_SCORE_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\\s+'), w -> w != '') AS tk
  FROM documents
),
uni AS (
  SELECT w, COUNT(*) AS cu
  FROM (SELECT UNNEST(tk) AS w FROM toks)
  GROUP BY w
),
vocab AS (SELECT COUNT(*) AS v FROM uni),
bi AS (
  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bg, tk[i] AS w1
  FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(tk) - 1)) AS i)
  WHERE LEN(tk) >= 2
),
bc AS (SELECT bg, COUNT(*) AS cb FROM bi GROUP BY bg),
scored AS (
  SELECT b.doc_id,
         CAST(FLOOR((LN(bc.cb + 1.0) - LN(u.cu + v.v)) * {LP_SCALE} + 0.5) AS BIGINT) AS lpq
  FROM bi b
  JOIN bc USING (bg)
  JOIN uni u ON u.w = b.w1
  CROSS JOIN vocab v
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(lpq) AS DOUBLE) / COUNT(*) / {LP_SCALE}.0, 6) AS avg_logprob
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""
