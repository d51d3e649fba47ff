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

    # r12: the per-bigram log-prob depends only on (cb, cu of w1) — so
    # it is computed ON THE COUNTS TABLE (bigram-vocab-sized) and the
    # corpus-sized occurrence stream joins the finished per-bigram
    # score once, on bg. The former shape joined uni onto every
    # OCCURRENCE row (an occurrence-sized second join input plus a
    # per-occurrence split(bg)); at 100 TB that was a second
    # corpus-scale shuffle for a value that has bigram-vocab
    # cardinality. Same rows out: bg_lp has one row per distinct bg
    # and every occurrence matches it (counts come from the same
    # corpus), so the inner joins are cardinality-preserving in both
    # shapes.
    bg_lp = (
        bi_counts.withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .select("bg", lpq.alias("lpq"))
    )
    scored = bi_occ.join(bg_lp, "bg").select(id_col, "lpq")
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


# --- DSIR importance resampling (Xie et al. 2023) --------------------------

DSIR_K = 100  #: documents selected by the gate (exact top-k by Gumbel key)


def dsir_importance_keys(
    docs: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance score + Gumbel resampling key
    (Data Selection via Importance Resampling, Xie et al. 2023).

    The importance weight of a document x is p_target(x)/p_raw(x)
    under two n-gram LMs — here the same add-one-smoothed bigram
    model ``lm_score_documents`` trains (the paper uses hashed
    n-grams; bigrams are the un-hashed special case and reuse the
    proven-portable machinery). Both LMs come from ONE conditional
    aggregation per n-gram order: cb_raw = count(*), cb_tgt =
    count_if(target) over the same groupBy — no second corpus pass,
    no extra shuffle, and a bigram absent from the target corpus
    smooths to ln(1/V_t) automatically because its conditional count
    is 0, not missing.

    Sampling ∝ weight is the Gumbel trick: key = ln w(x) + G(x) with
    G = −ln(−ln u); taking the global top-k of the key IS a weighted
    sample without replacement. u comes from the md5 integer grid
    ((hash32 + 0.5) / 2^32 — never 0 or 1), so selection is
    DETERMINISTIC and cross-engine: the only libm calls (ln) are
    quantized to the 1e-6 grid before any comparison (the
    lm_score_documents convention; +,−,×,÷ on the grid integers are
    exact in both engines).

    Returns (id_col, n_bigrams, score_q, dsir_key):
    score_q = round(mean bigram [lpq_target − lpq_raw]) — the
    quantized log importance weight; dsir_key = score_q + gumbel_q.
    Documents with < 2 tokens carry no LM evidence and are absent.

    100 TB shape: identical to lm_score_documents — two vocab-sized
    count tables, the scoring join shuffles bigram occurrences on the
    bigram key (AQE splits hot function-word keys), one per-doc agg,
    then a distributed top-k. The two driver-side scalars are the
    vocab sizes."""
    # persisted: the unigram agg and the bigram build both consume the
    # tokenized corpus — the regex split is the per-row hot spot
    toks = docs.select(
        id_col, target_filter.alias("__tgt"), _tokens(F.col(text_col)).alias("tk")
    ).persist()

    uni = (
        toks.select("__tgt", F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("cu_r"),
            F.count_if(F.col("__tgt")).alias("cu_t"),
        )
    ).persist()
    v_raw = uni.count()
    v_tgt = max(uni.filter(F.col("cu_t") > 0).count(), 1)

    # persisted: the bigram-count agg AND the scoring join both consume
    # it — unpersisted, the corpus tokenize+bigram explode runs twice
    # (session owner releases; the r8 multi-consumer-recompute lesson)
    bi_occ = toks.select(
        id_col, "__tgt", F.explode(_bigrams(F.col("tk"))).alias("bg")
    ).persist()
    bi_counts = bi_occ.groupBy("bg").agg(
        F.count(F.lit(1)).alias("cb_r"),
        F.count_if(F.col("__tgt")).alias("cb_t"),
    )

    lp_raw = F.log(F.col("cb_r") + F.lit(1.0)) - F.log(
        F.col("cu_r") + F.lit(float(v_raw))
    )
    lp_tgt = F.log(F.col("cb_t") + F.lit(1.0)) - F.log(
        F.col("cu_t") + F.lit(float(v_tgt))
    )
    dq = (
        F.floor(lp_tgt * LP_SCALE + F.lit(0.5)).cast("long")
        - F.floor(lp_raw * LP_SCALE + F.lit(0.5)).cast("long")
    )

    # r12: same counts-side restructure as lm_score_documents — dq is a
    # function of the bigram alone, so it is finished on the
    # bigram-vocab-sized counts table and the occurrence stream joins
    # the scored table once, on bg (was: uni joined per occurrence).
    bg_dq = (
        bi_counts.withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .select("bg", dq.alias("dq"))
    )
    scored = bi_occ.join(bg_dq, "bg").select(id_col, "dq")
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("dq").alias("sd"),
    )

    hash32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (hash32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    gq = F.floor(-F.log(-F.log(u)) * LP_SCALE + F.lit(0.5)).cast("long")
    score_q = F.floor(
        F.col("sd").cast("double") / F.col("n_bigrams") + F.lit(0.5)
    ).cast("long")
    return per_doc.select(
        id_col,
        "n_bigrams",
        score_q.alias("score_q"),
        (score_q + gq).alias("dsir_key"),
    )


def corpus_dsir_sample(spark, sf_dir: str) -> DataFrame:
    """Gate: DSIR-select the 100 documents whose bigram distribution
    is most target-like (target = the corpus's English split), via
    deterministic Gumbel-key top-k over the quantized log importance
    weights. The data-SELECTION sibling of `corpus_temperature_mix`
    (which reweights sources) and `corpus_mix_sample` (which meets
    fixed quotas): DSIR picks by CONTENT similarity to a target
    distribution, the Xie et al. 2023 recipe."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    keys = dsir_importance_keys(docs, F.col("lang") == "en")
    return keys.orderBy(F.col("dsir_key").desc(), "doc_id").limit(DSIR_K)


CORPUS_DSIR_SAMPLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS tgt,
         LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\\s+'), w -> w != '') AS tk
  FROM documents
),
uni AS (
  SELECT w, COUNT(*) AS cu_r, COUNT(CASE WHEN tgt THEN 1 END) AS cu_t
  FROM (SELECT tgt, UNNEST(tk) AS w FROM toks)
  GROUP BY w
),
vr AS (SELECT COUNT(*) AS v FROM uni),
vt AS (SELECT GREATEST(COUNT(CASE WHEN cu_t > 0 THEN 1 END), 1) AS v FROM uni),
bi AS (
  SELECT doc_id, tgt, tk[i] || ' ' || tk[i+1] AS bg, tk[i] AS w1
  FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(tk) - 1)) AS i)
  WHERE LEN(tk) >= 2
),
bc AS (
  SELECT bg, COUNT(*) AS cb_r, COUNT(CASE WHEN tgt THEN 1 END) AS cb_t
  FROM bi GROUP BY bg
),
scored AS (
  SELECT b.doc_id,
         CAST(FLOOR((LN(bc.cb_t + 1.0) - LN(u.cu_t + vt.v)) * {LP_SCALE} + 0.5) AS BIGINT)
         - CAST(FLOOR((LN(bc.cb_r + 1.0) - LN(u.cu_r + vr.v)) * {LP_SCALE} + 0.5) AS BIGINT) AS dq
  FROM bi b
  JOIN bc USING (bg)
  JOIN uni u ON u.w = b.w1
  CROSS JOIN vr CROSS JOIN vt
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(dq) AS sd
  FROM scored GROUP BY doc_id
),
keyed AS (
  SELECT doc_id, n_bigrams,
         CAST(FLOOR(CAST(sd AS DOUBLE) / n_bigrams + 0.5) AS BIGINT) AS score_q,
         CAST(FLOOR(-LN(-LN((CAST(CAST(CONCAT('0x', SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0)) * {LP_SCALE} + 0.5) AS BIGINT) AS gq
  FROM per_doc
)
SELECT doc_id, n_bigrams, score_q, score_q + gq AS dsir_key
FROM keyed
ORDER BY dsir_key DESC, doc_id
LIMIT {DSIR_K}
"""
