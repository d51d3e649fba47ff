"""Distributed BPE merge-rule learning (Sennrich et al. 2016).

Byte-pair-encoding trainers (HuggingFace tokenizers, SentencePiece)
learn merges from a WORD FREQUENCY TABLE, not the raw corpus — the
corpus collapses to (word, count) once, and each merge round runs
over the vocabulary weighted by counts. That formulation is exactly
Spark-shaped: the corpus-sized work is one tokenize + groupBy; every
round after that is an aggregate over the (small) vocabulary table:

  round r:  count adjacent symbol pairs, weighted by word count
            → pick the most frequent pair (ties: lexicographic)
            → merge it greedily left-to-right in every word

Determinism across engines: the symbol sequence is stored as a
delimited string where every symbol carries its OWN leading and
trailing space (" a  b  c "): adjacent-pair patterns then tile
without sharing characters, so plain REPLACE (non-overlapping,
left-to-right in SQL everywhere) implements exactly the greedy merge
a fold would — no regex lookarounds needed (DuckDB's RE2 has none).
The (count DESC, left, right) order makes every round's winner
unique, so N rounds are bit-reproducible in any engine; the oracle
unrolls them as CTEs.

Driver involvement: one 1-row collect per round (the winning pair IS
model state, like PQ codebooks) — model-constant, not data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_MERGES = 5


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("w")
    )
    return words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = N_MERGES,
    text_col: str = "text",
) -> DataFrame:
    """(merge_idx, merge_left, merge_right, pair_count): the first
    n_merges BPE rules learned from the corpus."""
    spark = docs.sparkSession
    wc = _word_counts(docs, text_col)
    state = wc.select(
        "w",
        "c",
        F.concat(
            F.lit(" "), F.array_join(F.split("w", r"(?!^)"), "  "), F.lit(" ")
        ).alias("s"),
    ).persist()

    merges = []
    for r in range(n_merges):
        syms_df = state.select("c", F.split(F.trim(F.col("s")), "  ").alias("ts"))
        n = F.greatest(F.size("ts") - 1, F.lit(0))
        pairs = syms_df.select(
            "c",
            F.explode(
                F.zip_with(
                    F.slice("ts", F.lit(1), n),
                    F.slice("ts", F.lit(2), n),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        counts = pairs.groupBy("p.l", "p.r").agg(F.sum("c").alias("cnt"))
        best = (
            counts.orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((r, left, right, cnt))
        state = state.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(f" {left}  {right} "),
                F.lit(f" {left}{right} "),
            ),
        ).persist()
    return spark.createDataFrame(
        merges, "merge_idx int, merge_left string, merge_right string, pair_count long"
    )


def bpe_learn_merges(spark, sf_dir: str) -> DataFrame:
    """Gate: first 5 BPE merges over the documents corpus."""
    from ..sources.catalog import load_table

    return learn_bpe_merges(load_table(spark, "documents", sf_dir)).orderBy("merge_idx")


def _bpe_round_ctes(r: int) -> str:
    prev, cur = f"s{r - 1}", f"s{r}"
    return f"""p{r} AS (
  SELECT ts[i] AS l, ts[i+1] AS r, CAST(SUM(c) AS BIGINT) AS cnt
  FROM (SELECT c, STRING_SPLIT(TRIM(s{r - 1}.s), '  ') AS ts FROM s{r - 1}) sp,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ts) - 1)) AS i)
  GROUP BY 1, 2
),
b{r} AS (SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
{cur} AS (
  SELECT w, c, REPLACE(s, ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' ') AS s
  FROM {prev} CROSS JOIN b{r} b
)"""


BPE_LEARN_MERGES_SQL = (
    """
WITH words AS (
  SELECT UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+')) AS w FROM documents
),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
s0 AS (
  SELECT w, c, ' ' || ARRAY_TO_STRING(STRING_SPLIT(w, ''), '  ') || ' ' AS s FROM wc
),
"""
    + ",\n".join(_bpe_round_ctes(r) for r in range(1, N_MERGES + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT CAST({r - 1} AS INTEGER) AS merge_idx, l AS merge_left, r AS merge_right, cnt AS pair_count FROM b{r}"
        for r in range(1, N_MERGES + 1)
    )
    + "\nORDER BY merge_idx"
)


def bpe_compression_curve(spark, sf_dir: str) -> DataFrame:
    """Gate: corpus symbol count after each of the first 5 merges —
    the tokenizer-compression curve (round 0 = characters). Shares
    the learner's state evolution; one scalar agg per round."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    wc = _word_counts(docs, "text")
    state = wc.select(
        "w",
        "c",
        F.concat(
            F.lit(" "), F.array_join(F.split("w", r"(?!^)"), "  "), F.lit(" ")
        ).alias("s"),
    ).persist()

    def total_symbols(df: DataFrame) -> int:
        return int(
            df.select(
                F.sum(F.col("c") * F.size(F.split(F.trim(F.col("s")), "  "))).alias("t")
            ).collect()[0]["t"]
        )

    curve = [(0, total_symbols(state))]
    for r in range(N_MERGES):
        syms_df = state.select("c", F.split(F.trim(F.col("s")), "  ").alias("ts"))
        n = F.greatest(F.size("ts") - 1, F.lit(0))
        pairs = syms_df.select(
            "c",
            F.explode(
                F.zip_with(
                    F.slice("ts", F.lit(1), n),
                    F.slice("ts", F.lit(2), n),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("c").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["l"], best[0]["r"]
        state = state.withColumn(
            "s",
            F.replace(F.col("s"), F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")),
        ).persist()
        curve.append((r + 1, total_symbols(state)))
    return spark.createDataFrame(curve, "merge_round int, total_symbols long").orderBy("merge_round")


BPE_COMPRESSION_CURVE_SQL = (
    """
WITH words AS (
  SELECT UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+')) AS w FROM documents
),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
s0 AS (
  SELECT w, c, ' ' || ARRAY_TO_STRING(STRING_SPLIT(w, ''), '  ') || ' ' AS s FROM wc
),
"""
    + ",\n".join(_bpe_round_ctes(r) for r in range(1, N_MERGES + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_round, CAST(SUM(c * LEN(STRING_SPLIT(TRIM(s), '  '))) AS BIGINT) AS total_symbols FROM s{r}"
        for r in range(0, N_MERGES + 1)
    )
    + "\nORDER BY merge_round"
)


def encode_with_merges(docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text") -> DataFrame:
    """Apply learned BPE merge rules to a corpus: per-document token
    counts under the merged vocabulary.

    Encoding happens on the DISTINCT-WORD vocabulary, not on every
    occurrence: the corpus tokenizes once to (doc, word), the
    vocabulary encodes driver-free via the same spaced-symbol REPLACE
    chain the learner uses (rank order = application order, exactly
    HuggingFace/SentencePiece semantics), and a join maps word →
    token count back onto occurrences. At 100 TB the REPLACE chain
    runs over the vocabulary (sublinear in corpus size); the only
    corpus-sized work is the tokenize + the final aggregation.
    """
    words = docs.select(
        F.col("doc_id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("w"),
    )
    vocab = words.select("w").distinct()
    s = F.concat(F.lit(" "), F.array_join(F.split("w", r"(?!^)"), "  "), F.lit(" "))
    for left, right in merges:
        s = F.replace(s, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} "))
    vocab_tokens = vocab.select(
        "w", F.size(F.split(F.trim(s), "  ")).alias("nt")
    )
    return (
        words.join(vocab_tokens, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum("nt").alias("n_tokens"),
        )
        .withColumn(
            "compression",
            F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 6),
        )
        .orderBy("doc_id")
    )


def bpe_encode_documents(spark, sf_dir: str) -> DataFrame:
    """Gate: learn the first 5 merges from the corpus (deterministic —
    ties broken (count DESC, left, right)), then encode every document
    with them. Completes the learn→apply tokenizer loop: L10 verifies
    the learned rules, this verifies their application."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    rules = [
        (r["merge_left"], r["merge_right"])
        for r in learn_bpe_merges(docs).orderBy("merge_idx").collect()
    ]
    return encode_with_merges(docs, rules)


BPE_ENCODE_DOCUMENTS_SQL = (
    """
WITH words AS (
  SELECT UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+')) AS w FROM documents
),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
s0 AS (
  SELECT w, c, ' ' || ARRAY_TO_STRING(STRING_SPLIT(w, ''), '  ') || ' ' AS s FROM wc
),
"""
    + ",\n".join(_bpe_round_ctes(r) for r in range(1, N_MERGES + 1))
    + f""",
vt AS (
  SELECT w, LEN(STRING_SPLIT(TRIM(s), '  ')) AS nt FROM s{N_MERGES}
),
dw AS (
  SELECT doc_id, UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+')) AS w
  FROM documents
)
SELECT doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(LEN(w)) AS BIGINT) AS n_chars,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(LEN(w)) AS DOUBLE) / SUM(nt), 6) AS compression
FROM dw JOIN vt USING (w)
GROUP BY doc_id
ORDER BY doc_id
"""
)
