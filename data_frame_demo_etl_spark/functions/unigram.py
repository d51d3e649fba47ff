"""SentencePiece-style unigram-LM tokenizer trainer (Kudo 2018),
fixed-2-iteration Viterbi-EM — the tokenizer-TRAINING sibling of the
BPE merge learner (functions/bpe.py L10).

Semantics (both engines, integer-exact):

1. **Word table** — distinct lowercased whitespace words w with corpus
   frequency f(w); words longer than ``MAX_WORD`` chars are excluded
   from training (documented bound: it fixes the DP unroll depth; long
   words are vocabulary noise for a trainer gate).
2. **Seed vocabulary** — every substring of every word up to
   ``MAX_PIECE`` chars, seed count c0(s) = Σ_w f(w)·occ(s, w)
   (overlapping occurrences). Single characters are always included,
   so every word is segmentable at every iteration.
3. **Viterbi E-step** — per word, the minimum-cost segmentation under
   cost(s) = −lpq(s), where lpq(s) = floor(ln(c(s)/Σc)·1e6 + 0.5) is
   the add-nothing unigram log-prob QUANTIZED to the 1e-6 integer grid
   (the L7 convention — ties and comparisons are integer-exact across
   engines; ln() libm ulps sit 9 orders below the grid). Tie-break:
   among equal-cost continuations the LONGEST piece wins (evaluated
   k = MAX_PIECE … 1), fixed identically in both engines.
4. **M-step** — piece usage counts over the Viterbi segmentations,
   weighted by f(w); unused pieces drop out of the vocabulary.
5. Iterate (2 fixed rounds: seed → segment → re-estimate → segment →
   count), return the trained vocabulary (piece, n_used, lpq).

Why two formulations: the Spark plan is a STATIC-UNROLL column DP —
one explode→join→conditional-agg pivot brings every (position, k)
piece cost into 64 columns, then b_i / argmin-k_i / on-path_i columns
are pure whole-stage-codegen arithmetic (no UDF, no dynamic indexing
— path membership is computed FORWARD from static columns:
on_i = OR_k(on_{i−k} AND k_{i−k} = k)). The DuckDB oracle instead
folds a cost-matrix LIST with list_reduce — an independent dynamic-
indexing formulation. Identical integers out of structurally
different programs is the D18 two-formulation cross-check.

100 TB shape: everything is vocabulary-sized after the one corpus
tokenize+count pass — the word table, the 64-way explode, the piece
joins, the DP columns. The corpus-sized work is exactly the L7 word
count aggregation. Reference: the reference repo has no tokenizer
training; semantics follow Kudo 2018's unigram model with hard
(Viterbi) EM and a substring seed vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .lm import LP_SCALE, _tokens

MAX_WORD = 12   #: words longer than this are excluded from training
MAX_PIECE = 3   #: maximum piece length (fixes the DP branching)
BIG = 10**15    #: +infinity on the integer cost grid

#: monotone suffix for the one-shot DP temp views (never reused, so a
#: long-lived session can build concurrent plans without name races);
#: itertools.count — next() is atomic under the GIL, so concurrent
#: builder THREADS (e.g. a threaded plan sweep) get distinct names,
#: which a bare `n += 1` would not guarantee.
import itertools as _itertools

_DP_VIEW_N = _itertools.count(1)


def _word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, f, len): distinct lowercased words with corpus frequency,
    bounded to MAX_WORD chars."""
    return (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.length("w") <= MAX_WORD)
        .withColumn("len", F.length("w").cast("int"))
    )


def _seed_pieces(words: DataFrame) -> DataFrame:
    """(piece, c): seed counts — every substring up to MAX_PIECE chars,
    weighted by word frequency, overlapping occurrences counted."""
    def _substr_at(k: int):
        # one-arg lambda: a two-parameter lambda would make F.transform
        # pass the ELEMENT INDEX as the second argument
        return lambda i: F.col("w").substr(i, F.lit(k))

    def _starts(k: int):
        # sequence(1, 0) counts DOWN (the shingling.py guard): gate
        # short words to an empty index array explicitly
        return F.when(
            F.col("len") >= k, F.sequence(F.lit(1), F.col("len") - (k - 1))
        ).otherwise(F.array().cast("array<int>"))

    subs = words.select(
        "f",
        F.explode(
            F.flatten(
                F.array(
                    *[
                        F.transform(_starts(k), _substr_at(k))
                        for k in range(1, MAX_PIECE + 1)
                    ]
                )
            )
        ).alias("piece"),
    )
    return subs.groupBy("piece").agg(F.sum("f").alias("c"))


def _lpq(count_col: Column, total: int) -> Column:
    """Quantized unigram log-prob: floor((ln c − ln total)·1e6 + 0.5).
    Both logs evaluate in-plan (the lm.py convention — the oracle
    computes the same two LN calls, and 1-ulp libm differences sit 9
    orders below the grid)."""
    return F.floor(
        (F.log(count_col.cast("double")) - F.log(F.lit(float(total))))
        * LP_SCALE
        + F.lit(0.5)
    ).cast("long")


def _cost_columns(words: DataFrame, pieces: DataFrame) -> DataFrame:
    """Pivot every (i, k) piece cost into a static column c_{i}_{k}
    (0-based start i, piece length k): one explode, ONE join against
    the vocabulary, one conditional aggregation back to a row per
    word. Missing pieces (possible from iteration 2 on) cost BIG."""
    # The unroll is built as GENERATED SQL strings (one selectExpr /
    # F.expr per logical piece) rather than nested Column objects: the
    # Column form cost ~2.2 s of driver-side py4j round trips PER
    # BUILD (×3 builds per encode gate — measured round 9), while the
    # string form parses JVM-side in a handful of calls. The parsed
    # expressions are identical, so plans, results, and oracle parity
    # are unchanged.
    combos = []
    for i in range(MAX_WORD):
        for k in range(1, MAX_PIECE + 1):
            if i + k <= MAX_WORD:
                combos.append((i, k))
    structs = ", ".join(
        f"named_struct('i', {i}, 'k', {k}, 'sub', substr(w, {i + 1}, {k}))"
        for i, k in combos
    )
    exploded = (
        words.selectExpr("w", "f", "len", f"explode(array({structs})) AS s")
        .selectExpr("w", "f", "len", "s.i", "s.k", "s.sub")
        .filter(F.col("i") + F.col("k") <= F.col("len"))
    )
    joined = exploded.join(
        pieces.select(F.col("piece").alias("sub"), F.col("lpq")), "sub", "left"
    ).select(
        "w",
        "f",
        "len",
        "i",
        "k",
        F.coalesce(-F.col("lpq"), F.lit(BIG)).alias("cost"),
    )
    aggs = [
        F.expr(f"max(CASE WHEN i = {i} AND k = {k} THEN cost END) AS c_{i}_{k}")
        for i, k in combos
    ]
    return joined.groupBy("w", "f", "len").agg(*aggs)


def _viterbi_used(costs: DataFrame, emit_unk: bool = False) -> DataFrame:
    """(w, f, piece): the pieces of each word's minimum-cost
    segmentation (longest-piece tie-break), via the static-unroll DP.
    Also carries b_0 as ``word_cost`` for likelihood tests.

    With ``emit_unk`` each row additionally carries ``unk`` — whether
    the emitted piece was ABSENT from the cost vocabulary. That is
    read straight off the DP: the chosen piece's cost cell is
    coalesce(-lpq, BIG), and real costs sit 7 orders of magnitude
    below BIG, so chosen-cost ≥ BIG ⟺ the piece missed the cost
    join. (The walk never chooses a k that overruns the word: at any
    position the in-range candidate through b reaches the terminal 0
    at cost ≤ len·BIG while every out-of-range candidate pays
    BIG + b_j with j > len, i.e. ≥ 2·BIG against an in-range
    alternative of ≤ BIG at the same position — so the emitted piece
    is always a true substring and membership is exactly the cost
    test.) This lets the encode gate skip a second corpus-scale join
    against the vocabulary (r13)."""
    # Generated-SQL unroll, assembled into ONE spark.sql call (see the
    # _cost_columns note): DataFrames analyze EAGERLY on creation, so
    # a withColumn/selectExpr chain re-analyzes the growing DP plan at
    # every stage (~3.4 s of driver time per build in the original
    # Column form, ~1.1 s as 38 selectExpr stages); a single nested
    # query is parsed and analyzed once. r13: the ~38 one-column-
    # per-level nested SELECTs became TWO levels using lateral column
    # aliases (each alias may reference aliases defined earlier in the
    # same SELECT list — Spark ≥ 3.4) — the analyzer resolves one
    # projection list instead of re-expanding a growing star per
    # level, measured ~40% less build (driver) time per DP with
    # bit-identical output. The temp view is dropped immediately — the
    # returned DataFrame's plan is already resolved, so later view
    # churn cannot redirect it.
    spark = costs.sparkSession
    have = set(costs.columns)

    def cost_sql(i: int, k: int) -> str:
        name = f"c_{i}_{k}"
        return f"coalesce({name}, {BIG})" if name in have else str(BIG)

    vname = f"__unigram_dp_{next(_DP_VIEW_N)}"
    costs.createOrReplaceTempView(vname)
    # Level 1 — suffix DP (right to left: b_i = min cost to segment
    # w[i+1 .. len]), argmin k (longest piece first on ties,
    # k = MAX_PIECE … 1), and the forward path walk (position 0 is on
    # the path; position i is on it iff some on-path position i−k
    # chose a k-piece ending at i) as ONE lateral-alias SELECT.
    sel = [
        "*",
        f"CASE WHEN len = {MAX_WORD} THEN 0 ELSE {BIG} END AS b_{MAX_WORD}",
    ]
    for i in range(MAX_WORD - 1, -1, -1):
        cands = [
            f"({cost_sql(i, k)} + b_{i + k})"
            for k in range(1, MAX_PIECE + 1)
            if i + k <= MAX_WORD
        ]
        m = f"least({', '.join(cands)})" if len(cands) > 1 else cands[0]
        sel.append(
            f"CASE WHEN len = {i} THEN 0 WHEN len < {i} THEN {BIG}"
            f" ELSE {m} END AS b_{i}"
        )
        whens = " ".join(
            f"WHEN ({cost_sql(i, k)} + b_{i + k}) = b_{i} THEN {k}"
            for k in range(min(MAX_PIECE, MAX_WORD - i), 0, -1)
        )
        sel.append(
            f"CASE WHEN len <= {i} THEN 0 ELSE (CASE {whens} ELSE 0 END) END AS k_{i}"
        )
    sel.append("true AS on_0")
    for i in range(1, MAX_WORD):
        terms = " OR ".join(
            f"(on_{i - k} AND k_{i - k} = {k})"
            for k in range(1, MAX_PIECE + 1)
            if i - k >= 0
        )
        sel.append(f"({terms}) AS on_{i}")
    q = f"SELECT {', '.join(sel)} FROM {vname}"
    # Level 2 — emit the used pieces (static 3-way CASE over k_i per
    # position; generators cannot ride lateral aliases, so this is its
    # own level).
    piece_at = []
    for i in range(MAX_WORD):
        inner = " ".join(
            f"WHEN k_{i} = {k} THEN substr(w, {i + 1}, {k})"
            for k in range(1, MAX_PIECE + 1)
        )
        chosen = f"CASE WHEN on_{i} AND k_{i} > 0 AND len > {i} THEN (CASE {inner} END) END"
        if emit_unk:
            ccost = " ".join(
                f"WHEN k_{i} = {k} THEN {cost_sql(i, k)}"
                for k in range(1, MAX_PIECE + 1)
            )
            chosen = (
                f"CASE WHEN on_{i} AND k_{i} > 0 AND len > {i} THEN"
                f" named_struct('p', (CASE {inner} END),"
                f" 'u', (CASE {ccost} END) >= {BIG}) END"
            )
        piece_at.append(chosen)
    if emit_unk:
        final = (
            "SELECT w, f, word_cost, s.p AS piece, s.u AS unk FROM ("
            "SELECT w, f, b_0 AS word_cost,"
            f" explode(filter(array({', '.join(piece_at)}), x -> x IS NOT NULL)) AS s"
            f" FROM ({q}))"
        )
    else:
        final = (
            "SELECT w, f, b_0 AS word_cost,"
            f" explode(filter(array({', '.join(piece_at)}), x -> x IS NOT NULL)) AS piece"
            f" FROM ({q})"
        )
    out = spark.sql(final)
    spark.catalog.dropTempView(vname)
    return out


def _mstep(used: DataFrame) -> DataFrame:
    """(piece, n_used): frequency-weighted Viterbi usage counts."""
    return used.groupBy("piece").agg(F.sum("f").alias("n_used"))


def unigram_lm_train(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Train the unigram vocabulary with 2 Viterbi-EM iterations;
    returns (piece, n_used, lpq) — the final vocabulary with usage
    counts and quantized log-probs, the table a tokenizer loads."""
    words = _word_table(docs, text_col).persist()
    return _train_from_words(words).orderBy("piece")


def _train_from_words(words: DataFrame) -> DataFrame:
    """The trainer body over a prepared (w, f, len) word table —
    UNORDERED output (the vocab gate sorts; the encode gate joins, so
    a sort would be dead work under its joins). ``words`` must already
    be persisted (or otherwise cheap): it is consumed three times
    (seed counts + both iterations' cost pivots)."""
    spark = words.sparkSession
    empty = spark.createDataFrame([], "piece string, n_used long, lpq long")

    seed = _seed_pieces(words).persist()
    total0 = seed.agg(F.sum("c")).collect()[0][0]
    if not total0:  # empty corpus / no trainable words
        return empty
    pieces0 = seed.select("piece", _lpq(F.col("c"), int(total0)).alias("lpq"))

    used1 = _viterbi_used(_cost_columns(words, pieces0))
    counts1 = _mstep(used1).persist()
    total1 = counts1.agg(F.sum("n_used")).collect()[0][0]
    pieces1 = counts1.select("piece", _lpq(F.col("n_used"), int(total1)).alias("lpq"))

    used2 = _viterbi_used(_cost_columns(words, pieces1))
    counts2 = _mstep(used2)
    total2_df = counts2.agg(F.sum("n_used").alias("t"))
    # total2 stays in-plan: join the 1-row total back (bounded scalar)
    out = (
        counts2.crossJoin(F.broadcast(total2_df))
        .select(
            "piece",
            "n_used",
            F.floor(
                (F.log(F.col("n_used").cast("double")) - F.log(F.col("t").cast("double")))
                * LP_SCALE
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lpq"),
        )
    )
    return out


def unigram_lm_vocab(spark, sf_dir: str) -> DataFrame:
    """Gate: train the unigram tokenizer vocabulary on `documents`
    (2 Viterbi-EM iterations) and return it — piece, frequency-weighted
    usage count, and quantized log-prob."""
    from ..sources.catalog import load_table

    return unigram_lm_train(load_table(spark, "documents", sf_dir))


def _iteration_sql(pieces_cte: str, n, positions: str = "positions") -> str:
    """One Viterbi iteration as SQL CTEs: cost matrix (3 LEFT JOINs
    against ``pieces_cte``), the list-fold suffix DP, the forward
    walk, and frequency-weighted usage counts — suffixed ``{n}``,
    reading (w, f, len, i) rows from the ``positions`` CTE."""
    chosen = (
        f"CASE WHEN acc[1] + 2 <= len AND cm[CAST(acc[1] AS INT)][3] "
        f"+ bl[CAST(acc[1] + 3 AS INT)] = bl[CAST(acc[1] AS INT)] THEN 3 "
        f"WHEN acc[1] + 1 <= len AND cm[CAST(acc[1] AS INT)][2] "
        f"+ bl[CAST(acc[1] + 2 AS INT)] = bl[CAST(acc[1] AS INT)] THEN 2 "
        f"ELSE 1 END"
    )
    return f"""
cm{n} AS (
  SELECT x.w, x.f, x.len, LIST(LIST_VALUE(x.ck1, x.ck2, x.ck3) ORDER BY x.i) AS cm
  FROM (
    SELECT p.w, p.f, p.len, p.i,
       COALESCE(-a.lpq, {BIG}) AS ck1,
       CASE WHEN p.i + 1 <= p.len THEN COALESCE(-b.lpq, {BIG}) ELSE {BIG} END AS ck2,
       CASE WHEN p.i + 2 <= p.len THEN COALESCE(-c.lpq, {BIG}) ELSE {BIG} END AS ck3
    FROM {positions} p
    LEFT JOIN {pieces_cte} a ON a.piece = SUBSTR(p.w, CAST(p.i AS INT), 1)
    LEFT JOIN {pieces_cte} b ON b.piece = SUBSTR(p.w, CAST(p.i AS INT), 2)
    LEFT JOIN {pieces_cte} c ON c.piece = SUBSTR(p.w, CAST(p.i AS INT), 3)
  ) x
  GROUP BY x.w, x.f, x.len
),
dp{n} AS (
  SELECT w, f, len, cm,
    LIST_REDUCE(
      LIST_PREPEND(LIST_VALUE(CAST(0 AS BIGINT)), LIST_REVERSE(cm)),
      (acc, x) -> LIST_PREPEND(
        LEAST(x[1] + acc[1],
              x[2] + COALESCE(acc[2], {BIG}),
              x[3] + COALESCE(acc[3], {BIG})),
        acc)
    ) AS bl
  FROM cm{n}
),
walk{n} AS (
  SELECT w, f, len,
    LIST_REDUCE(
      LIST_PREPEND(LIST_VALUE(CAST(1 AS BIGINT)),
                   LIST_TRANSFORM(GENERATE_SERIES(1, {MAX_WORD}), d -> LIST_VALUE(CAST(0 AS BIGINT)))),
      (acc, x) -> CASE WHEN acc[1] > len THEN list_append(acc, CAST(0 AS BIGINT))
        ELSE list_concat(
          LIST_VALUE(acc[1] + ({chosen})),
          list_append(acc[2:], CAST(({chosen}) AS BIGINT)))
        END
    )[2:] AS ks
  FROM dp{n}
),
used{n} AS (
  SELECT w, f, k, ord,
         SUM(k) OVER (PARTITION BY w ORDER BY ord) - k + 1 AS start
  FROM (SELECT w, f, UNNEST(ks) AS k,
               UNNEST(GENERATE_SERIES(1, CAST(LEN(ks) AS BIGINT))) AS ord
        FROM walk{n})
),
counts{n} AS (
  SELECT SUBSTR(w, CAST(start AS INT), CAST(k AS INT)) AS piece,
         CAST(SUM(f) AS BIGINT) AS n_used
  FROM used{n} WHERE k > 0
  GROUP BY 1
)"""


#: The trainer as shared CTEs (through counts2/t2) — consumed by the
#: vocabulary gate and the encoder gate below.
_TRAINER_CTES = f"""toks AS (
  SELECT LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\\s+'), x -> x != '') AS tk
  FROM documents
),
words AS (
  SELECT w, COUNT(*) AS f, CAST(LEN(w) AS BIGINT) AS len
  FROM (SELECT UNNEST(tk) AS w FROM toks)
  WHERE LEN(w) <= {MAX_WORD}
  GROUP BY w
),
positions AS (
  SELECT w, f, len, i
  FROM words, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, len)) AS i) i
),
seed AS (
  SELECT piece, SUM(f) AS c FROM (
    SELECT f, SUBSTR(w, CAST(i AS INT), CAST(k AS INT)) AS piece
    FROM words,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, {MAX_PIECE})) AS k) ks,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, len - k + 1)) AS i) xs
    WHERE len >= k
  ) GROUP BY piece
),
t0 AS (SELECT SUM(c) AS t FROM seed),
p0 AS (
  SELECT piece,
         CAST(FLOOR((LN(CAST(c AS DOUBLE)) - LN(CAST(t AS DOUBLE))) * {LP_SCALE} + 0.5) AS BIGINT) AS lpq
  FROM seed CROSS JOIN t0
),{_iteration_sql("p0", 1)},
t1 AS (SELECT SUM(n_used) AS t FROM counts1),
p1 AS (
  SELECT piece,
         CAST(FLOOR((LN(CAST(n_used AS DOUBLE)) - LN(CAST(t AS DOUBLE))) * {LP_SCALE} + 0.5) AS BIGINT) AS lpq
  FROM counts1 CROSS JOIN t1
),{_iteration_sql("p1", 2)},
t2 AS (SELECT SUM(n_used) AS t FROM counts2)"""


UNIGRAM_LM_VOCAB_SQL = f"""
WITH {_TRAINER_CTES}
SELECT piece, n_used,
       CAST(FLOOR((LN(CAST(n_used AS DOUBLE)) - LN(CAST(t AS DOUBLE))) * {LP_SCALE} + 0.5) AS BIGINT) AS lpq
FROM counts2 CROSS JOIN t2
ORDER BY piece
"""


# --- the APPLY half: encode documents with a trained vocabulary ------------

def unigram_encode_tokens(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    raw_words: DataFrame | None = None,
    _occ: DataFrame | None = None,
) -> DataFrame:
    """(id_col, n_tokens, n_unk): per-document token counts segmenting
    every word with a TRAINED unigram vocabulary (piece, lpq) — the
    L12-for-L10 pairing applied to L17: train once, encode the corpus.

    Words longer than MAX_WORD are pre-split into MAX_WORD-char blocks
    (deterministic in both engines — the max-input-length pre-split
    every production tokenizer applies), each block Viterbi-segmented
    by the same static-unroll DP as training. A piece the walk emits
    whose string is NOT in the vocabulary (possible where every
    covering piece was pruned during training) counts as n_unk — the
    number an encoding rollout checks before trusting the vocab.

    Scale shape: the DP runs per DISTINCT block string (vocabulary-
    sized); the corpus-sized work is one tokenize pass + two
    vocabulary joins back (word → block counts → doc). The unknown
    flag comes off the DP's own cost cells (``emit_unk``), not a
    second join against the vocabulary (r13).

    ``raw_words``: optional pre-computed distinct-word table (one
    column ``w0``); when the caller already aggregated the token
    stream (the L18 gate shares one corpus pass between trainer and
    encoder) this skips the encoder's own distinct shuffle. ``_occ``:
    the caller's already-persisted (id, w0) occurrence table, for the
    same sharing."""
    occ = (
        _occ
        if _occ is not None
        else docs.select(
            id_col, F.explode(_tokens(F.col(text_col))).alias("w0")
        ).persist()
    )
    if raw_words is None:
        raw_words = occ.select("w0").distinct()
    blocks = raw_words.select(
        "w0",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w0"), F.lit(MAX_WORD)),
                lambda s: F.col("w0").substr(s, F.lit(MAX_WORD)),
            )
        ).alias("w"),
    ).persist()
    bwords = (
        blocks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .withColumn("len", F.length("w").cast("int"))
    )
    pieces = vocab.select("piece", "lpq")
    used = _viterbi_used(_cost_columns(bwords, pieces), emit_unk=True)
    per_block = used.groupBy("w").agg(
        F.count(F.lit(1)).alias("bt"),
        F.count_if(F.col("unk")).alias("bu"),
    )
    per_word = (
        blocks.join(per_block, "w")
        .groupBy("w0")
        .agg(F.sum("bt").alias("wt"), F.sum("bu").alias("wu"))
    )
    return (
        occ.join(per_word, "w0")
        .groupBy(id_col)
        .agg(
            F.sum("wt").cast("long").alias("n_tokens"),
            F.sum("wu").cast("long").alias("n_unk"),
        )
    )


def docs_unigram_tokens(spark, sf_dir: str) -> DataFrame:
    """Gate: train the unigram vocabulary on `documents` (L17), then
    ENCODE the same corpus with it — per-document token and unknown
    counts. The acting half of the tokenizer-training family.

    r13 shape: ONE corpus tokenize pass feeds both halves — the
    persisted occurrence table aggregates once to per-word counts,
    which serve as the trainer's word table (≤ MAX_WORD filter) AND
    the encoder's distinct-word list (formerly a second tokenize scan
    plus a separate distinct shuffle). The vocabulary is consumed
    exactly once now (the unknown flag rides the DP, see
    _viterbi_used), so the eager localCheckpoint barrier the two-
    consumer form needed (it re-ran EM-2 otherwise) is gone — a lazy
    persist truncates the trainer subtree and the gate's single
    action materializes everything in one cascade."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    occ = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("w0")
    ).persist()
    wf = occ.groupBy("w0").agg(F.count(F.lit(1)).alias("f")).persist()
    words = wf.filter(F.length("w0") <= MAX_WORD).select(
        F.col("w0").alias("w"), "f", F.length("w0").cast("int").alias("len")
    )
    vocab = _train_from_words(words).persist()
    return (
        unigram_encode_tokens(docs, vocab, raw_words=wf.select("w0"), _occ=occ)
        .select("doc_id", "n_tokens", "n_unk")
        .orderBy("doc_id")
    )


DOCS_UNIGRAM_TOKENS_SQL = f"""
WITH {_TRAINER_CTES},
final AS (SELECT piece FROM counts2),
fcost AS (
  SELECT c.piece,
         CAST(FLOOR((LN(CAST(c.n_used AS DOUBLE)) - LN(CAST(t2.t AS DOUBLE))) * {LP_SCALE} + 0.5) AS BIGINT) AS lpq
  FROM counts2 c CROSS JOIN t2
),
toks_d AS (
  SELECT doc_id,
         LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\\s+'), x -> x != '') AS tk
  FROM documents
),
occ AS (SELECT doc_id, UNNEST(tk) AS w0 FROM toks_d),
blocks AS (
  SELECT w0, SUBSTR(w0, CAST(s AS INT), {MAX_WORD}) AS w
  FROM (SELECT DISTINCT w0 FROM occ) r,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w0), {MAX_WORD})) AS s) ss
),
bwords AS (
  SELECT w, COUNT(*) AS f, CAST(LEN(w) AS BIGINT) AS len
  FROM blocks GROUP BY w
),
positions_e AS (
  SELECT w, f, len, i
  FROM bwords, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, len)) AS i) i
),{_iteration_sql("fcost", "e", positions="positions_e")},
per_block AS (
  SELECT u.w, COUNT(*) AS bt,
         COUNT(CASE WHEN v.piece IS NULL THEN 1 END) AS bu
  FROM (SELECT w, SUBSTR(w, CAST(start AS INT), CAST(k AS INT)) AS piece
        FROM usede WHERE k > 0) u
  LEFT JOIN final v ON v.piece = u.piece
  GROUP BY u.w
),
per_word AS (
  SELECT b.w0, SUM(pb.bt) AS wt, SUM(pb.bu) AS wu
  FROM blocks b JOIN per_block pb ON pb.w = b.w
  GROUP BY b.w0
)
SELECT o.doc_id, CAST(SUM(pw.wt) AS BIGINT) AS n_tokens,
       CAST(SUM(pw.wu) AS BIGINT) AS n_unk
FROM occ o JOIN per_word pw ON pw.w0 = o.w0
GROUP BY o.doc_id
ORDER BY doc_id
"""
