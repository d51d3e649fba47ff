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

Knife-edge note for the log-quantized gates in this module (PMI,
source-KL, keyness G², token-budget curve — the K48 convention,
floor(ln(x)·1e6 + 0.5) of an exactly-computed double ratio): the
convention assumes the JVM's StrictMath.log and DuckDB's ln round the
same double input to the same double — true on every platform both
engines support (both are correctly-rounded for these inputs in
practice), but a hypothetical last-ulp disagreement EXACTLY at a grid
midpoint would flip the floor. The inputs here are ratios of exact
DECIMAL(38,0) products, so the set of representable arguments is
identical on both sides; the residual risk is a shared-input,
divergent-libm event that has never been observed across r9–r10's
external windows. If a gate ever hash-mismatches with every value off
by exactly 1 micro-unit at one row, this is the first suspect — the
fix is a planted-corpus assertion that no gate-corpus ratio lands
within 1e-9 of a .5 grid boundary, not a wider grid.
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


# ─────────────── L19: Zipf-law fit ───────────────


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Weighted OLS fit of ln(frequency) against ln(rank) over the
    corpus vocabulary — the Zipf-law audit (slope ≈ −1 on natural
    text; a corpus whose slope drifts is template-heavy, spam-ridden,
    or synthetic — one number that screens ingest batches).

    Deterministic ranks under ties: every term with equal frequency f
    shares the MIDRANK of its frequency class, computed on the
    FREQUENCY HISTOGRAM (value-domain sized: distinct frequency
    values), so no engine-dependent tie order exists. The histogram's
    descending prefix runs on the shared two-pass keyed layout; each
    class contributes its (ln midrank, ln f) point with weight
    c_f (#terms in the class) — exactly equal to summing over terms.

    Portability: ln() of exact half-integer midranks / integer
    frequencies is quantized to the 1e-6 grid per CLASS before the
    weighted sums (the lm.py trick); sums accumulate in
    decimal(38,0); the final slope/intercept are one fixed IEEE
    combination over the (correctly-rounded) double casts of those
    exact sums — products would outgrow decimal38, doubles cannot
    diverge because every input is bit-identical in both engines.

    Scale shape: tokenize+count (two map-side-combined aggs), a
    histogram agg, the bounded prefix layout, one global weighted
    agg. No windows over the vocab table, no joins back to the corpus.
    """
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    hist = (
        counts.groupBy("f")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit(1).alias("key"), (-F.col("f")).alias("nf"), "f", "c")
    )
    from ..analytics.quality_audit import _keyed_prefix

    pre = _keyed_prefix(hist, ["nf"], "c")
    r2 = (F.lit(2) * (F.col("cum") - F.col("c")) + F.col("c") + F.lit(1)).cast("long")
    qx = F.floor(
        F.log(r2.cast("double") / F.lit(2.0)) * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("decimal(38,0)")
    qy = F.floor(
        F.log(F.col("f").cast("double")) * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("decimal(38,0)")
    dec = "decimal(38,0)"
    s = (
        pre.withColumn("qx", qx)
        .withColumn("qy", qy)
        .agg(
            F.sum(F.col("c").cast(dec)).alias("n"),
            F.sum(F.col("c").cast(dec) * F.col("f").cast(dec)).alias("n_tokens"),
            F.sum(F.col("c").cast(dec) * F.col("qx")).alias("sx"),
            F.sum(F.col("c").cast(dec) * F.col("qy")).alias("sy"),
            F.sum(F.col("c").cast(dec) * F.col("qx") * F.col("qx")).alias("sxx"),
            F.sum(F.col("c").cast(dec) * F.col("qx") * F.col("qy")).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    den = nd * F.col("sxx").cast("double") - sxd * sxd
    slope = (nd * F.col("sxy").cast("double") - sxd * syd) / den
    intercept = (syd - slope * sxd) / nd
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.when(den > 0, F.floor(slope * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")).alias(
            "slope_micro"
        ),
        F.when(den > 0, F.floor(intercept + F.lit(0.5)).cast("long")).alias(
            "intercept_micro"
        ),
    )


def docs_zipf_fit(spark, sf_dir: str) -> DataFrame:
    """Gate: Zipf slope/intercept of the documents corpus."""
    from ..sources.catalog import load_table

    return zipf_fit(load_table(spark, "documents", sf_dir))


DOCS_ZIPF_FIT_SQL = r"""
WITH toks AS (
  SELECT UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w != '')) AS tok
  FROM documents
),
counts AS (SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok),
hist AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS c FROM counts GROUP BY f),
pre AS (
  SELECT f, c,
         SUM(c) OVER (ORDER BY f DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
q AS (
  SELECT f, c,
         CAST(FLOOR(LN(CAST(2 * (cum - c) + c + 1 AS DOUBLE) / 2.0) * 1000000.0 + 0.5) AS HUGEINT) AS qx,
         CAST(FLOOR(LN(CAST(f AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) AS qy
  FROM pre
),
s AS (
  SELECT CAST(SUM(c) AS HUGEINT) AS n,
         SUM(CAST(c AS HUGEINT) * f) AS n_tokens,
         SUM(CAST(c AS HUGEINT) * qx) AS sx,
         SUM(CAST(c AS HUGEINT) * qy) AS sy,
         SUM(CAST(c AS HUGEINT) * qx * qx) AS sxx,
         SUM(CAST(c AS HUGEINT) * qx * qy) AS sxy
  FROM q
)
SELECT CAST(n AS BIGINT) AS n_terms,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN CAST(FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS slope_micro,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN CAST(FLOOR(((CAST(sy AS DOUBLE)
                 - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE)) + 0.5) AS BIGINT)
       END AS intercept_micro
FROM s
"""


# ─────────────── L20: Heaps-law fit ───────────────

#: Curve marks: powers of 4 keep the point count logarithmic in the
#: corpus while giving the OLS enough spread at small SF.
HEAPS_MARK_BASE = 4
HEAPS_MAX_MARKS = 20


def heaps_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heaps'-law vocabulary-growth audit: V(n) — distinct terms seen
    in the first n tokens of the corpus (doc_id order) — sampled at
    marks n = 4^k, with the log-log OLS slope β (natural text:
    β ≈ 0.4–0.6; β → 1 means the corpus never stops minting new
    terms — OCR noise, ids, random strings; β → 0 means template
    text). The companion of L19: Zipf is the static frequency law,
    Heaps the GROWTH law, and the two exponents are theoretically
    linked (β ≈ 1/α).

    Exactness: the corpus prefix order is (doc_id, in-doc position) —
    total and engine-identical; each term's FIRST global token index
    comes from one min-aggregation over the exploded corpus, with
    global indexes built from the per-doc token-count prefix (the
    constant-key two-pass layout — never a corpus-sized window).
    V(mark) is an exact count; the OLS on (ln mark, ln V) quantizes
    each point's logs to the 1e-6 grid before decimal sums (the L19
    construction, unweighted over ≤20 points), slope one fixed IEEE
    combination.

    Scale shape: tokenize (one pass), per-doc counts + bounded prefix,
    explode with positions → groupBy(term) min (map-side combined) —
    the only corpus-sized shuffle — then a vocab-sized × marks
    broadcast-range join and a marks-sized OLS. β lands in every
    output row next to its curve point (curve rows ARE the gate
    output, bpe_compression_curve convention)."""
    from ..analytics.quality_audit import _keyed_prefix

    toks = docs.select(
        F.col("doc_id"),
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "").alias(
            "ws"
        ),
    )
    counts = toks.select(
        F.lit(1).alias("key"), "doc_id", F.size("ws").alias("c")
    )
    pre = _keyed_prefix(counts, ["doc_id"], "c").select(
        "doc_id", (F.col("cum") - F.col("c")).alias("before"), F.col("t").alias("n_tok")
    )
    exploded = (
        toks.join(pre, "doc_id")
        .select(
            "before",
            F.posexplode("ws").alias("pos", "tok"),
        )
        .select(F.col("tok"), (F.col("before") + F.col("pos") + 1).alias("gidx"))
    )
    first = exploded.groupBy("tok").agg(F.min("gidx").alias("fidx"))
    total = pre.select(F.col("n_tok")).limit(1)
    marks = (
        total.select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, {HEAPS_MAX_MARKS}),"
                    f" k -> cast(power({HEAPS_MARK_BASE}, k) as bigint))"
                )
            ).alias("mark"),
            "n_tok",
        )
        .filter(F.col("mark") <= F.col("n_tok"))
        .select("mark")
    )
    curve = (
        first.join(F.broadcast(marks), F.col("fidx") <= F.col("mark"))
        .groupBy("mark")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    dec = "decimal(38,0)"
    q = curve.select(
        "mark",
        "vocab",
        F.floor(F.log(F.col("mark").cast("double")) * F.lit(1_000_000.0) + F.lit(0.5))
        .cast(dec)
        .alias("qx"),
        F.floor(F.log(F.col("vocab").cast("double")) * F.lit(1_000_000.0) + F.lit(0.5))
        .cast(dec)
        .alias("qy"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast(dec).alias("np"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
        F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
    )
    npd = F.col("np").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    den = npd * F.col("sxx").cast("double") - sxd * sxd
    beta = (npd * F.col("sxy").cast("double") - sxd * syd) / den
    slope = s.select(
        F.when(den > 0, F.floor(beta * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")).alias(
            "beta_micro"
        )
    )
    return (
        q.select("mark", F.col("vocab").cast("long").alias("vocab"))
        .crossJoin(F.broadcast(slope))
        .orderBy("mark")
    )


def docs_heaps_fit(spark, sf_dir: str) -> DataFrame:
    """Gate: Heaps vocabulary-growth curve + β over documents."""
    from ..sources.catalog import load_table

    return heaps_fit(load_table(spark, "documents", sf_dir))


DOCS_HEAPS_FIT_SQL = rf"""
WITH toks AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w != '') AS ws
  FROM documents
),
pre AS (
  SELECT doc_id, ws,
         SUM(LEN(ws)) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - LEN(ws) AS before,
         SUM(LEN(ws)) OVER () AS n_tok
  FROM toks
),
exploded AS (
  SELECT ws[i] AS tok, before + i AS gidx
  FROM pre, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws))) AS i)
),
first AS (SELECT tok, MIN(gidx) AS fidx FROM exploded GROUP BY tok),
marks AS (
  SELECT CAST(POWER({HEAPS_MARK_BASE}, k) AS BIGINT) AS mark
  FROM (SELECT UNNEST(GENERATE_SERIES(1, {HEAPS_MAX_MARKS})) AS k)
  WHERE CAST(POWER({HEAPS_MARK_BASE}, k) AS BIGINT) <= (SELECT MIN(n_tok) FROM pre)
),
curve AS (
  SELECT m.mark, CAST(COUNT(*) AS BIGINT) AS vocab
  FROM first f JOIN marks m ON f.fidx <= m.mark
  GROUP BY m.mark
),
q AS (
  SELECT mark, vocab,
         CAST(FLOOR(LN(CAST(mark AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) AS qx,
         CAST(FLOOR(LN(CAST(vocab AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) AS qy
  FROM curve
),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS np, SUM(qx) AS sx, SUM(qy) AS sy,
         SUM(qx * qx) AS sxx, SUM(qx * qy) AS sxy
  FROM q
)
SELECT q.mark, q.vocab,
       CASE WHEN CAST(s.np AS DOUBLE) * CAST(s.sxx AS DOUBLE) - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE) > 0
            THEN CAST(FLOOR(((CAST(s.np AS DOUBLE) * CAST(s.sxy AS DOUBLE) - CAST(s.sx AS DOUBLE) * CAST(s.sy AS DOUBLE))
                 / (CAST(s.np AS DOUBLE) * CAST(s.sxx AS DOUBLE) - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)))
                 * 1000000.0 + 0.5) AS BIGINT)
       END AS beta_micro
FROM q CROSS JOIN s
ORDER BY q.mark
"""


# ───────────────────────── collocation extraction (PMI) ─────────────────────────

#: A bigram must occur this often to be scored (rare pairs make PMI
#: explode — the standard Church & Hanks guard).
PMI_MIN_PAIR = 5
PMI_TOP_K = 20


def collocation_pmi(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks 1990) — the phrase-discovery layer next to RAKE's
    stopword-boundary keywords (L22): PMI = ln(p(xy)/(p(x)p(y)))
    scores how much more often two words co-occur ADJACENTLY than
    independence predicts.

    Spark-first shape: bigrams are built INSIDE the token array
    (transform over 1..len-1 — a narrow map, no window, no shuffle
    before the count aggregation), so the corpus is scanned once and
    the only shuffles are two vocabulary-sized groupBys. The unigram
    table joins onto the bigram table twice via broadcast (vocab is
    value-domain-sized at any corpus scale).

    Exactness: pmi term = ln(c_xy·N² / (Nb·c_x·c_y)) — one division
    of two exact DECIMAL(38,0) products each correctly rounded to
    double, quantized to the 1e-6 grid (the K48 convention); N ≈ 10¹²
    tokens keeps c_xy·N² < 10³⁸. Top-k under a (pmi, w1, w2) total
    order."""
    dec = "decimal(38,0)"
    arr = docs.select(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "").alias("l")
    )
    uni = (
        arr.select(F.explode("l").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast(dec).alias("c"))
    )
    n_tot = uni.agg(F.sum("c").cast(dec).alias("N"))
    big = (
        # size >= 2 guard is load-bearing: Spark's sequence(1, 0) runs
        # DESCENDING, which would fabricate a null bigram per short doc
        arr.filter(F.size("l") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(l) - 1), "
                    "i -> struct(l[i - 1] AS w1, l[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast(dec).alias("cxy"))
    )
    nb_tot = big.agg(F.sum("cxy").cast(dec).alias("NB"))
    scored = (
        big.filter(F.col("cxy") >= PMI_MIN_PAIR)
        .join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("cx"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("cy"))), "w2")
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(nb_tot))
        .select(
            "w1",
            "w2",
            F.col("cxy").cast("long").alias("pair_count"),
            F.floor(
                F.log(
                    (F.col("cxy") * F.col("N") * F.col("N")).cast("double")
                    / (F.col("NB") * F.col("cx") * F.col("cy")).cast("double")
                )
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("pmi_micro"),
        )
    )
    return scored.orderBy(
        F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(PMI_TOP_K)


def docs_collocation_pmi(spark, sf_dir: str) -> DataFrame:
    """Gate: top-20 adjacent-word collocations by PMI over the
    documents corpus."""
    from ..sources.catalog import load_table

    return collocation_pmi(load_table(spark, "documents", sf_dir))


DOCS_COLLOCATION_PMI_SQL = rf"""
WITH arr AS (
  SELECT list_filter(string_split_regex(lower(text), '\s+'), w -> w != '') AS l
  FROM documents
),
uni AS (
  SELECT w, CAST(COUNT(*) AS HUGEINT) AS c
  FROM (SELECT unnest(l) AS w FROM arr) GROUP BY w
),
ntot AS (SELECT SUM(c) AS N FROM uni),
big AS (
  SELECT p['w1'] AS w1, p['w2'] AS w2, CAST(COUNT(*) AS HUGEINT) AS cxy
  FROM (
    SELECT unnest(list_transform(range(2, len(l) + 1),
                                 i -> {{'w1': l[i - 1], 'w2': l[i]}})) AS p
    FROM arr
  )
  GROUP BY 1, 2
),
nbtot AS (SELECT SUM(cxy) AS NB FROM big)
SELECT w1, w2, CAST(cxy AS BIGINT) AS pair_count,
       CAST(FLOOR(LN(CAST(cxy * N * N AS DOUBLE) / CAST(NB * cx * cy AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS pmi_micro
FROM big
JOIN (SELECT w AS w1, c AS cx FROM uni) USING (w1)
JOIN (SELECT w AS w2, c AS cy FROM uni) USING (w2)
CROSS JOIN ntot CROSS JOIN nbtot
WHERE cxy >= {PMI_MIN_PAIR}
ORDER BY pmi_micro DESC, w1 ASC, w2 ASC
LIMIT {PMI_TOP_K}
"""


# ───────────────────── per-source vocabulary KL divergence ─────────────────────


def source_vocab_kl(docs: DataFrame, by_col: str = "source", text_col: str = "text") -> DataFrame:
    """KL(source ‖ corpus) over unigram distributions — the
    domain-shift audit a corpus-mixing step reads (K22's PSI watches a
    numeric column drift over time; this watches each SOURCE's
    vocabulary diverge from the blend it feeds): a source with a high
    KL dominates the mix on words the rest of the corpus rarely uses.

    Finite by construction: every source word is a corpus word, so
    q > 0 wherever p > 0 — no smoothing needed. Per-(source, word)
    term ln(c_sw·N / (N_s·c_w)) is a correctly-rounded double of
    exact-integer ratios, quantized to the 1e-6 grid BEFORE the
    count-weighted fold (the K48 convention), the fold clamped ≥ 0.

    Shape: ONE (source × vocab) aggregation; corpus counts re-aggregate
    that table (no second scan); totals broadcast. Everything after
    the first groupBy is value-domain-sized."""
    dec = "decimal(38,0)"
    sw = (
        docs.select(
            F.col(by_col).alias("src"),
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
            ).alias("w"),
        )
        .groupBy("src", "w")
        .agg(F.count(F.lit(1)).cast(dec).alias("csw"))
    )
    per_src = sw.groupBy("src").agg(
        F.sum("csw").alias("ns"), F.count(F.lit(1)).alias("n_words")
    )
    per_word = sw.groupBy("w").agg(F.sum("csw").alias("cw"))
    tot = per_word.agg(F.sum("cw").alias("N"))
    q = F.floor(
        F.log(
            (F.col("csw") * F.col("N")).cast("double")
            / (F.col("ns") * F.col("cw")).cast("double")
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast(dec)
    terms = (
        sw.join(F.broadcast(per_src), "src")
        .join(F.broadcast(per_word), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("src")
        .agg(
            F.sum(F.col("csw") * q).alias("s"),
            F.first("ns").alias("ns"),
            F.first("n_words").alias("n_words"),
        )
    )
    return terms.select(
        F.col("src").alias("source"),
        F.col("ns").cast("long").alias("n_tokens"),
        F.col("n_words").cast("long").alias("n_words"),
        F.expr("cast(greatest(s div ns, cast(0 as decimal(38,0))) as long)").alias(
            "kl_micro"
        ),
    ).orderBy("source")


def docs_source_vocab_kl(spark, sf_dir: str) -> DataFrame:
    """Gate: per-source unigram KL divergence from the corpus blend."""
    from ..sources.catalog import load_table

    return source_vocab_kl(load_table(spark, "documents", sf_dir))


DOCS_SOURCE_VOCAB_KL_SQL = r"""
WITH sw AS (
  SELECT source AS src, w, CAST(COUNT(*) AS HUGEINT) AS csw
  FROM (
    SELECT source, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> x != '')) AS w
    FROM documents
  )
  GROUP BY 1, 2
),
per_src AS (SELECT src, SUM(csw) AS ns, COUNT(*) AS n_words FROM sw GROUP BY src),
per_word AS (SELECT w, SUM(csw) AS cw FROM sw GROUP BY w),
tot AS (SELECT SUM(cw) AS N FROM per_word),
terms AS (
  SELECT src,
         SUM(csw * CAST(FLOOR(LN(CAST(csw * N AS DOUBLE) / CAST(ns * cw AS DOUBLE))
                              * 1000000.0 + 0.5) AS HUGEINT)) AS s,
         MAX(ns) AS ns, MAX(n_words) AS n_words
  FROM sw JOIN per_src USING (src) JOIN per_word USING (w) CROSS JOIN tot
  GROUP BY src
)
SELECT src AS source,
       CAST(ns AS BIGINT) AS n_tokens,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(GREATEST(s // ns, 0) AS BIGINT) AS kl_micro
FROM terms
ORDER BY source
"""


# ───────────────────── token-budget truncation curve ─────────────────────

BUDGET_POINTS = 10


def token_budget_curve(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Context-length planning table: if every document is TRUNCATED
    at cap L, what share of the corpus's tokens survives? One row per
    doc-count decile — cap_len is that decile's document length, and
    tokens_kept counts full short docs plus cap·(longer docs): the
    curve a pipeline reads to pick max_seq_len (P6's packer then
    consumes the choice).

    Exact integers end to end: the length histogram is value-domain
    sized, its doc/token prefix sums run through the constant-key
    two-pass layout, decile rows are picked by the K56 filter+explode
    idiom (first histogram row crossing each decile — a narrow map,
    no non-equi join), and both shares are single integral divisions
    on the ppm grid.

    Shape: one corpus scan (token count per doc), one histogram agg,
    everything after is distinct-length sized."""
    from ..analytics.quality_audit import _keyed_prefix

    lens = docs.select(
        F.size(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("len")
    )
    dom = (
        lens.groupBy("len")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.lit(1).alias("key"),
            "len",
            "c",
            (F.col("len").cast("decimal(38,0)") * F.col("c")).alias("m"),
        )
    )
    laid = _keyed_prefix(dom, ["len"], ["c", "m"])
    hits = F.expr(
        f"filter(sequence(1, {BUDGET_POINTS}), "
        f"d -> cum_c * {BUDGET_POINTS} >= t_c * cast(d as long)"
        f" and (cum_c - c) * {BUDGET_POINTS} < t_c * cast(d as long))"
    )
    return (
        laid.select(
            F.explode(hits).alias("decile"), "len", "cum_c", "cum_m", "t_c", "t_m"
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("len").cast("long").alias("cap_len"),
            F.expr("cast((cum_c * 1000000) div t_c as long)").alias("docs_within_ppm"),
            F.expr(
                "cast(((cum_m + cast(len as decimal(38,0)) * (t_c - cum_c)) * 1000000)"
                " div t_m as long)"
            ).alias("tokens_kept_ppm"),
        )
        .orderBy("decile")
    )


def docs_token_budget_curve(spark, sf_dir: str) -> DataFrame:
    """Gate: token survival under per-decile document-length caps."""
    from ..sources.catalog import load_table

    return token_budget_curve(load_table(spark, "documents", sf_dir))


DOCS_TOKEN_BUDGET_CURVE_SQL = rf"""
WITH lens AS (
  SELECT len(list_filter(string_split_regex(lower(text), '\s+'), w -> w != '')) AS l
  FROM documents
),
dom AS (SELECT l, CAST(COUNT(*) AS BIGINT) AS c FROM lens GROUP BY l),
laid AS (
  SELECT l, c,
         SUM(c) OVER (ORDER BY l) AS cum_c,
         SUM(CAST(l AS HUGEINT) * c) OVER (ORDER BY l) AS cum_m,
         SUM(c) OVER () AS t_c,
         SUM(CAST(l AS HUGEINT) * c) OVER () AS t_m
  FROM dom
),
deciles AS (SELECT UNNEST(GENERATE_SERIES(1, {BUDGET_POINTS})) AS d),
hits AS (
  SELECT d, l, c, cum_c, cum_m, t_c, t_m
  FROM laid JOIN deciles
    ON cum_c * {BUDGET_POINTS} >= t_c * d
   AND (cum_c - c) * {BUDGET_POINTS} < t_c * d
)
SELECT CAST(d AS BIGINT) AS decile,
       CAST(l AS BIGINT) AS cap_len,
       CAST((cum_c * 1000000) // t_c AS BIGINT) AS docs_within_ppm,
       CAST(((cum_m + CAST(l AS HUGEINT) * (t_c - cum_c)) * 1000000) // t_m AS BIGINT)
         AS tokens_kept_ppm
FROM hits
ORDER BY decile
"""


# ───────────────────── per-source keyness (Dunning G²) ─────────────────────

KEYNESS_MIN_COUNT = 5
KEYNESS_TOP_K = 20


def source_keyness(docs: DataFrame, by_col: str = "source", text_col: str = "text") -> DataFrame:
    """Top-k (source, word) pairs by Dunning log-likelihood keyness
    (G², Dunning 1993) — WHICH words make a source diverge, where L24's
    KL says only BY HOW MUCH: for each word and source, the 2×2 table
    (word-in-source / word-elsewhere / other-in-source /
    other-elsewhere) scored G² = 2·Σ O·ln(O/E); only OVER-represented
    pairs (O_a·N > n_s·c_w) surface — the corpus-linguistics keyword
    statistic, robust at low expected counts where chi-square breaks.

    Exactness: every cell's ln(O/E) is a correctly-rounded double of
    exact-integer ratios (O·N / margin-product), quantized to the 1e-6
    grid per cell BEFORE the O-weighted sum (K48 convention); empty
    cells contribute exactly 0; the total is clamped ≥ 0.

    Shape: ONE (source × vocab) aggregation; word and source margins
    re-aggregate it; margins broadcast. Output bounded at top-k under
    a (g², source, word) total order."""
    dec = "decimal(38,0)"
    sw = (
        docs.select(
            F.col(by_col).alias("src"),
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
            ).alias("w"),
        )
        .groupBy("src", "w")
        .agg(F.count(F.lit(1)).cast(dec).alias("a"))
    )
    per_src = sw.groupBy("src").agg(F.sum("a").alias("ns"))
    per_word = sw.groupBy("w").agg(F.sum("a").alias("cw"))
    tot = per_word.agg(F.sum("cw").alias("N"))

    def qln(num, den):
        # floor(ln(num/den)·1e6 + 0.5) of exact-decimal operands
        return F.floor(
            F.log(num.cast("double") / den.cast("double")) * F.lit(1_000_000.0)
            + F.lit(0.5)
        ).cast(dec)

    j = (
        sw.filter(F.col("a") >= KEYNESS_MIN_COUNT)
        .join(F.broadcast(per_src), "src")
        .join(F.broadcast(per_word), "w")
        .crossJoin(F.broadcast(tot))
    )
    a = F.col("a")
    b = F.col("cw") - F.col("a")
    c = F.col("ns") - F.col("a")
    d = F.col("N") - F.col("ns") - F.col("cw") + F.col("a")
    n = F.col("N")
    ns, cw = F.col("ns"), F.col("cw")
    term = (
        F.when(a > 0, a * qln(a * n, ns * cw)).otherwise(F.lit(0).cast(dec))
        + F.when(b > 0, b * qln(b * n, (n - ns) * cw)).otherwise(F.lit(0).cast(dec))
        + F.when(c > 0, c * qln(c * n, ns * (n - cw))).otherwise(F.lit(0).cast(dec))
        + F.when(d > 0, d * qln(d * n, (n - ns) * (n - cw))).otherwise(F.lit(0).cast(dec))
    )
    scored = (
        j.filter(a * n > ns * cw)  # over-represented only (keyness direction)
        .select(
            F.col("src").alias("source"),
            F.col("w").alias("word"),
            F.col("a").cast("long").alias("n_in_source"),
            F.greatest(F.lit(2).cast(dec) * term, F.lit(0).cast(dec))
            .cast("long")
            .alias("g2_micro"),
        )
    )
    return scored.orderBy(
        F.col("g2_micro").desc(), F.col("source").asc(), F.col("word").asc()
    ).limit(KEYNESS_TOP_K)


def docs_source_keyness(spark, sf_dir: str) -> DataFrame:
    """Gate: top-20 over-represented (source, word) pairs by G²."""
    from ..sources.catalog import load_table

    return source_keyness(load_table(spark, "documents", sf_dir))


DOCS_SOURCE_KEYNESS_SQL = rf"""
WITH sw AS (
  SELECT source AS src, w, CAST(COUNT(*) AS HUGEINT) AS a
  FROM (
    SELECT source, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> x != '')) AS w
    FROM documents
  )
  GROUP BY 1, 2
),
per_src AS (SELECT src, SUM(a) AS ns FROM sw GROUP BY src),
per_word AS (SELECT w, SUM(a) AS cw FROM sw GROUP BY w),
tot AS (SELECT SUM(cw) AS N FROM per_word),
j AS (
  SELECT src, w, a, ns, cw, N,
         cw - a AS b, ns - a AS c, N - ns - cw + a AS d
  FROM sw JOIN per_src USING (src) JOIN per_word USING (w) CROSS JOIN tot
  WHERE a >= {KEYNESS_MIN_COUNT}
),
scored AS (
  SELECT src AS source, w AS word, CAST(a AS BIGINT) AS n_in_source,
         CAST(GREATEST(2 * (
             (CASE WHEN a > 0 THEN a * CAST(FLOOR(LN(CAST(a * N AS DOUBLE) / CAST(ns * cw AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) ELSE 0 END)
           + (CASE WHEN b > 0 THEN b * CAST(FLOOR(LN(CAST(b * N AS DOUBLE) / CAST((N - ns) * cw AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) ELSE 0 END)
           + (CASE WHEN c > 0 THEN c * CAST(FLOOR(LN(CAST(c * N AS DOUBLE) / CAST(ns * (N - cw) AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) ELSE 0 END)
           + (CASE WHEN d > 0 THEN d * CAST(FLOOR(LN(CAST(d * N AS DOUBLE) / CAST((N - ns) * (N - cw) AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) ELSE 0 END)
         ), 0) AS BIGINT) AS g2_micro
  FROM j
  WHERE a * N > ns * cw
)
SELECT source, word, n_in_source, g2_micro
FROM scored
ORDER BY g2_micro DESC, source ASC, word ASC
LIMIT {KEYNESS_TOP_K}
"""


# ───────────────────── term burstiness audit ─────────────────────

BURST_MIN_CF = 50
BURST_TOP_K = 20


def term_burstiness(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k BURSTY terms — words whose occurrences clump into few
    documents instead of spreading evenly (Church & Gale 1995: content
    words are bursty, function words are not): for each word, the
    variance-to-mean ratio of its per-document counts over the
    documents that CONTAIN it. VMR ≈ 1 = Poisson-spread (function
    word); VMR ≫ 1 = topical. The signal a stopword-list builder or a
    keyword extractor reads next to raw frequency.

    Exact integers: per-(doc, word) counts → per word df (docs), cf
    (occurrences), Σc²; VMR lands once on the micro grid as
    (df·Σc² − cf²)·10⁶ div (df·cf) — biased (population) variance by
    construction, both engines bit-agree. cf ≥ 50 guard keeps the
    estimate meaningful.

    Shape: one tokenize scan → (doc, word) counts (map-side combined),
    one vocab-sized re-agg. Output top-k under a (vmr, word) total
    order."""
    dec = "decimal(38,0)"
    dw = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
            ).alias("w"),
        )
        .groupBy("doc", "w")
        .agg(F.count(F.lit(1)).cast(dec).alias("c"))
    )
    per_word = dw.groupBy("w").agg(
        F.count(F.lit(1)).cast(dec).alias("df"),
        F.sum("c").alias("cf"),
        F.sum(F.col("c") * F.col("c")).alias("c2"),
    )
    return (
        per_word.filter(F.col("cf") >= BURST_MIN_CF)
        .select(
            F.col("w").alias("word"),
            F.col("df").cast("long").alias("n_docs"),
            F.col("cf").cast("long").alias("n_occurrences"),
            F.expr("cast(((df * c2 - cf * cf) * 1000000) div (df * cf) as long)").alias(
                "vmr_micro"
            ),
        )
        .orderBy(F.col("vmr_micro").desc(), F.col("word").asc())
        .limit(BURST_TOP_K)
    )


def docs_term_burstiness(spark, sf_dir: str) -> DataFrame:
    """Gate: top-20 bursty terms by per-doc count VMR."""
    from ..sources.catalog import load_table

    return term_burstiness(load_table(spark, "documents", sf_dir))


DOCS_TERM_BURSTINESS_SQL = rf"""
WITH dw AS (
  SELECT doc, w, CAST(COUNT(*) AS HUGEINT) AS c
  FROM (
    SELECT doc_id AS doc,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x != '')) AS w
    FROM documents
  )
  GROUP BY doc, w
),
per_word AS (
  SELECT w, CAST(COUNT(*) AS HUGEINT) AS df, SUM(c) AS cf, SUM(c * c) AS c2
  FROM dw GROUP BY w
)
SELECT w AS word,
       CAST(df AS BIGINT) AS n_docs,
       CAST(cf AS BIGINT) AS n_occurrences,
       CAST(((df * c2 - cf * cf) * 1000000) // (df * cf) AS BIGINT) AS vmr_micro
FROM per_word
WHERE cf >= {BURST_MIN_CF}
ORDER BY vmr_micro DESC, word ASC
LIMIT {BURST_TOP_K}
"""


# ───────────────────── TF-IDF source profiling (L28) ─────────────────────

TFIDF_TOP_PER_SOURCE = 5
TFIDF_MIN_TF = 3


def tfidf_source_terms(
    docs: DataFrame,
    by_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = TFIDF_TOP_PER_SOURCE,
    min_tf: int = TFIDF_MIN_TF,
) -> DataFrame:
    """Per-source top-k terms by TF-IDF (Spärck Jones) — the retrieval
    view of "what is this source about": score(s, w) = tf_{s,w} ·
    ln(N_docs / df_w) with df the DOCUMENT frequency, so corpus-wide
    boilerplate (df ≈ N) scores ~0 regardless of raw count while
    source-concentrated content rises. Beside the keyness family: G²
    (L26) asks "statistically over-represented vs elsewhere", TF-IDF
    asks the rawer retrieval question "frequent here, rare anywhere".

    Exactness: the L26 qln convention — idf_micro = floor(ln(N/df)·10⁶
    + 0.5) of an exact integer ratio (correctly-rounded IEEE double of
    integer operands, identical in both engines), tfidf_micro =
    tf · idf_micro, exact integer product. tf < min_tf pairs are
    pruned before scoring (noise floor, same as KEYNESS_MIN_COUNT).

    Shape: ONE tokenize scan feeding BOTH aggregations — (source,
    word) term counts and (word, distinct-doc) document frequencies —
    then a vocabulary-sized join with the broadcast 1-row doc total;
    the per-source top-k is a partitioned window over the
    (sources × vocab)-bounded score table."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.col(by_col).alias("src"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("w"),
    )
    sw = tok.groupBy("src", "w").agg(F.count(F.lit(1)).cast(dec).alias("tf"))
    df_w = (
        tok.select("doc", "w")
        .distinct()
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast(dec).alias("df"))
    )
    n_docs = docs.select(F.count(F.lit(1)).cast(dec).alias("nd"))
    scored = (
        sw.filter(F.col("tf") >= min_tf)
        .join(df_w, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("src").alias("source"),
            F.col("w").alias("word"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            (
                F.col("tf")
                * F.floor(
                    F.log(F.col("nd").cast("double") / F.col("df").cast("double"))
                    * F.lit(1_000_000.0)
                    + F.lit(0.5)
                ).cast(dec)
            )
            .cast("long")
            .alias("tfidf_micro"),
        )
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("tfidf_micro").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= top_k)
        .select("source", F.col("rk").cast("int").alias("rk"), "word", "tf", "df", "tfidf_micro")
        .orderBy("source", "rk")
    )


def docs_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (L28): top-5 TF-IDF terms per source over the documents
    corpus."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return tfidf_source_terms(docs)


DOCS_TFIDF_TERMS_SQL = rf"""
WITH tok AS (
  SELECT doc_id AS doc, source AS src,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x != '')) AS w
  FROM documents
),
sw AS (SELECT src, w, CAST(COUNT(*) AS HUGEINT) AS tf FROM tok GROUP BY 1, 2),
df_w AS (
  SELECT w, CAST(COUNT(*) AS HUGEINT) AS df
  FROM (SELECT DISTINCT doc, w FROM tok) GROUP BY w
),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nd FROM documents),
scored AS (
  SELECT src AS source, w AS word,
         CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         CAST(tf * CAST(FLOOR(LN(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) AS BIGINT) AS tfidf_micro
  FROM sw JOIN df_w USING (w) CROSS JOIN tot
  WHERE tf >= {TFIDF_MIN_TF}
)
SELECT source, rk, word, tf, df, tfidf_micro FROM (
  SELECT source, word, tf, df, tfidf_micro,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY tfidf_micro DESC, word ASC
         ) AS INTEGER) AS rk
  FROM scored
) WHERE rk <= {TFIDF_TOP_PER_SOURCE}
ORDER BY source, rk
"""


# ───────────────── keyphrase (bigram) TF-IDF (L29) ─────────────────

KEYPHRASE_TOP_PER_SOURCE = 5
KEYPHRASE_MIN_TF = 3


def keyphrase_source_terms(
    docs: DataFrame,
    by_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = KEYPHRASE_TOP_PER_SOURCE,
    min_tf: int = KEYPHRASE_MIN_TF,
) -> DataFrame:
    """L29: per-source top-k KEYPHRASES — L28's TF-IDF lifted from
    unigrams to adjacent bigrams ("machine learning", not "machine" +
    "learning"): phrase tf from in-row adjacent pairs of the same
    whitespace tokenization (zip of the token array with its tail —
    no self-join, no explode-then-rejoin), document frequency over
    distinct docs, idf on the L26 integer-log grid, per-source top-k.
    PMI (L23) finds collocations by association strength; this ranks
    them the retrieval way — frequent here, rare anywhere.

    Scale: identical to L28 — ONE tokenize scan (the bigram zip is an
    in-row array op), (source, phrase) + distinct-doc aggregations,
    vocabulary-sized join, broadcast 1-row doc total, bounded top-k."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    bigrams = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.col(by_col).alias("src"),
        F.explode(
            F.filter(bigrams, lambda p: F.size(F.split(p, " ")) == 2)
        ).alias("w"),
    )
    sw = tok.groupBy("src", "w").agg(F.count(F.lit(1)).cast(dec).alias("tf"))
    df_w = (
        tok.select("doc", "w")
        .distinct()
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast(dec).alias("df"))
    )
    n_docs = docs.select(F.count(F.lit(1)).cast(dec).alias("nd"))
    scored = (
        sw.filter(F.col("tf") >= min_tf)
        .join(df_w, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("src").alias("source"),
            F.col("w").alias("phrase"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            (
                F.col("tf")
                * F.floor(
                    F.log(F.col("nd").cast("double") / F.col("df").cast("double"))
                    * F.lit(1_000_000.0)
                    + F.lit(0.5)
                ).cast(dec)
            )
            .cast("long")
            .alias("tfidf_micro"),
        )
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("tfidf_micro").desc(), F.col("phrase").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= top_k)
        .select("source", F.col("rk").cast("int").alias("rk"), "phrase", "tf", "df", "tfidf_micro")
        .orderBy("source", "rk")
    )


def docs_keyphrase_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (L29): top-5 TF-IDF bigram keyphrases per source."""
    from ..sources.catalog import load_table

    return keyphrase_source_terms(load_table(spark, "documents", sf_dir))


DOCS_KEYPHRASE_TERMS_SQL = rf"""
WITH words AS (
  SELECT doc_id AS doc, source AS src,
         LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x != '') AS ws
  FROM documents
),
tok AS (
  SELECT doc, src, ws[i] || ' ' || ws[i+1] AS w
  FROM words, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(ws) - 1, 0))) AS i)
),
sw AS (SELECT src, w, CAST(COUNT(*) AS HUGEINT) AS tf FROM tok GROUP BY 1, 2),
df_w AS (
  SELECT w, CAST(COUNT(*) AS HUGEINT) AS df
  FROM (SELECT DISTINCT doc, w FROM tok) GROUP BY w
),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nd FROM documents),
scored AS (
  SELECT src AS source, w AS phrase,
         CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         CAST(tf * CAST(FLOOR(LN(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT) AS BIGINT) AS tfidf_micro
  FROM sw JOIN df_w USING (w) CROSS JOIN tot
  WHERE tf >= {KEYPHRASE_MIN_TF}
)
SELECT source, rk, phrase, tf, df, tfidf_micro FROM (
  SELECT source, phrase, tf, df, tfidf_micro,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY tfidf_micro DESC, phrase ASC
         ) AS INTEGER) AS rk
  FROM scored
) WHERE rk <= {KEYPHRASE_TOP_PER_SOURCE}
ORDER BY source, rk
"""
