"""Exact substring-span dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better") — per-document duplicate-
CHARACTER mass from cross-document shared runs.

A position p of document A lies inside a shared run of length ≥ L
with some other document iff p is covered by at least one L-gram of A
that also occurs verbatim in another document (any run of length
m ≥ L contains an L-length window over each of its positions). So the
exact duplicate-character mass — the quantity Lee et al.'s
suffix-array remover deletes — reduces to:

1. hash every L-gram of every document with TWO independent
   Karp–Rabin polynomials over the Mersenne prime M = 2^61 − 1
   (h_i = Σ_j code(c_{i+j})·B^{L−1−j} mod M at two evaluation points
   B_A ≠ B_B; branch-free two-limb mulmod in the numpy kernel,
   HUGEINT arithmetic in the DuckDB oracle — both engines reproduce
   every hash bit-for-bit from the same explicit L-term formula, so
   parity is exact by construction INCLUDING any residual collision);
2. keep (h1, h2) pairs present in ≥ 2 distinct documents (one
   distributed groupBy with map-side partial aggregation, then a
   shuffled semi-join back — AQE skew-join splits a hot hash's
   positions, unlike a count window);
3. per document, union the covered intervals [i, i+L−1] with a
   single prefix-max sweep (window partitioned by doc — bounded by
   DOCUMENT length, not corpus size, so the partition is safe at any
   corpus scale) and sum the union length.

Defined over DISTINCT texts (min doc_id representative — the
dedup_sketch_eval convention): exact copies duplicate every position
by definition and carry no signal the exact-dedup family doesn't
already report. Cross-document sharing only (a phrase repeated twice
WITHIN one document is not counted) — the split-contamination-
relevant kind of duplication.

Why 2×61 bits and not winnowing's single 31-bit hash: at corpus
scale a 31-bit key birthday-collides (~n²/2^32 colliding gram pairs —
certain beyond ~10^5 distinct grams), so distinct grams in different
documents would hash-equal, inflating dup_chars and making the
remover excise never-duplicated text; oracle parity cannot catch it
because the SQL reproduces the same hashes. With the (h1, h2) pair
key, two DISTINCT grams collide only if both degree-22 difference
polynomials vanish at their evaluation points — ≤ (22/M)² ≈ 2^−113
per pair in the random-input model — so at the 10^14-gram / 100 TB
design point the expected number of colliding pairs is ~5·10^−7:
collision-free where it will run. (Winnowing keeps its single 31-bit
hash deliberately: it is a SAMPLING sketch whose output is a match
*candidate* report, not an exact mass, and its per-doc fingerprint
sets are ~10^3 smaller than the full gram table.)

Relation to D16 (winnowing): winnowing samples ~2/(w+1) of these
L-gram hashes to find WHICH pairs match; this operator measures HOW
MUCH text is shared, at full positional resolution. Reference: the
reference repo has no substring dedup; semantics follow the paper
(char-level variant of its ≥50-token criterion).

Scale shape: one kernel row per character position (the same order of
magnitude as a tokenized corpus), one partial-agg shuffle + one
semi-join on the hash, one per-document window. Everything after the
Arrow-batched numpy kernel is Column expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.catalog import load_table

L_CHARS = 23  #: minimum duplicated-run length (= winnowing's w + k − 1)
MOD61 = (1 << 61) - 1  #: Mersenne prime 2^61 − 1 (shift-fold reduction)
BASE_A = 1_000_000_007  #: evaluation points, both prime and < 2^30 so
BASE_B = 998_244_353    #: the two-limb mulmod needs no 128-bit product


def lgram_hash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", L: int = L_CHARS
) -> DataFrame:
    """(doc, i, h1, h2): the two independent Karp–Rabin hashes of every
    L-gram, i 1-based — exactly the integers the oracle's L-term
    polynomials produce. Documents shorter than L emit no rows.

    The Horner step is branch-free uint64 arithmetic: with base
    B < 2^30 and h < 2^61, h·B splits into 32-bit limbs whose partial
    products stay under 2^62, and mod (2^61 − 1) is a shift-fold
    (2^61 ≡ 1) — no division, so the two 61-bit hashes cost about the
    same as the one 31-bit ``%``-based hash they replaced."""
    import numpy as np
    import pandas as pd

    m61 = np.uint64(MOD61)
    mask32 = np.uint64(0xFFFFFFFF)
    mask29 = np.uint64((1 << 29) - 1)
    s29, s32, s61 = np.uint64(29), np.uint64(32), np.uint64(61)

    def step(h, base, codes_slice):
        # (h * base + codes_slice) mod 2^61−1, all values < 2^61.
        mid = (h >> s32) * base  # < 2^29 · 2^30
        lo = (h & mask32) * base  # < 2^32 · 2^30
        t = (mid >> s29) + ((mid & mask29) << s32) + (lo >> s61) + (lo & m61)
        t = (t >> s61) + (t & m61)
        t = np.where(t >= m61, t - m61, t) + codes_slice
        return np.where(t >= m61, t - m61, t)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One Horner pass per ARROW BATCH, not per document: the texts
        # are concatenated into a single codepoint array, all L-gram
        # hashes computed in 2·L vectorized passes over it, and
        # windows crossing a document boundary masked out. Per-doc
        # hashing spent most of its wall in numpy dispatch overhead on
        # ~350-element arrays (46 calls per document); batch-level
        # hashing makes it 46 calls per ~10k documents (SCALING
        # round-9 probe: the kernel IS the substring family's wall).
        ba, bb = np.uint64(BASE_A), np.uint64(BASE_B)
        empty = np.array([], dtype=np.int64)
        empty_df = pd.DataFrame(
            {"doc": empty, "i": empty, "h1": empty, "h2": empty}
        )
        for pdf in it:
            ids: list = []
            codes_list: list = []
            for doc, text in zip(pdf["doc"], pdf["__text"]):
                if text is None:
                    continue
                ids.append(doc)
                codes_list.append(
                    np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
                )
            if not ids:
                yield empty_df
                continue
            lens = np.array([c.size for c in codes_list], dtype=np.int64)
            big = np.concatenate(codes_list).astype(np.uint64)
            n = big.size
            if n < L:
                yield empty_df
                continue
            m = n - L + 1
            h1 = np.zeros(m, dtype=np.uint64)
            h2 = np.zeros(m, dtype=np.uint64)
            for j in range(L):
                cs = big[j : j + m]
                h1 = step(h1, ba, cs)
                h2 = step(h2, bb, cs)
            starts = np.zeros(lens.size, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            owner = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
            # an L-gram starting at p is real iff p..p+L−1 lie in ONE doc
            p = np.nonzero(owner[: m] == owner[L - 1 :])[0]
            own_p = owner[p]
            yield pd.DataFrame(
                {
                    "doc": np.asarray(ids, dtype=np.int64)[own_p],
                    "i": p - starts[own_p] + 1,
                    "h1": h1[p].astype(np.int64),
                    "h2": h2[p].astype(np.int64),
                }
            )

    return df.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("__text")
    ).mapInPandas(batches, "doc long, i long, h1 long, h2 long")


def shared_intervals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", L: int = L_CHARS
) -> DataFrame:
    """(doc, i, e): the [i, i+L−1] character intervals of every L-gram
    shared verbatim with at least one OTHER document. The union of a
    doc's intervals is exactly its duplicated-character set."""
    pos = lgram_hash_table(df, id_col, text_col, L).persist()
    # "(h1,h2) in ≥2 distinct docs" ⟺ min(doc) != max(doc) over the
    # pair's rows — one partial-aggregable pass. count_distinct plans
    # the two-phase distinct expansion (an EXTRA full exchange of
    # (h, doc) pairs), measured 2× the gate's wall on the shared-
    # boilerplate corpus where every doc carries ~250 corpus-wide
    # hashes. Keying on the PAIR makes the shared set collision-exact
    # (module docstring: ≤2^−113 per gram pair).
    shared_h = (
        pos.groupBy("h1", "h2")
        .agg(F.min("doc").alias("__lo"), F.max("doc").alias("__hi"))
        .filter(F.col("__lo") != F.col("__hi"))
        .select("h1", "h2")
    )
    return pos.join(shared_h, ["h1", "h2"], "semi").select(
        "doc", F.col("i"), (F.col("i") + F.lit(L - 1)).alias("e")
    )


def duplicate_span_mass(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", L: int = L_CHARS
) -> DataFrame:
    """(doc, dup_chars): per document, the number of character
    positions covered by at least one L-gram shared verbatim with
    ANOTHER document. Documents with no shared L-gram (or shorter
    than L) are absent — callers left-join and coalesce to 0."""
    intervals = shared_intervals(df, id_col, text_col, L)
    # interval-union sweep: intervals per doc are distinct start
    # positions; union length = Σ max(0, e − max(i−1, prefix-max e)).
    w = (
        Window.partitionBy("doc")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = intervals.withColumn("pmax", F.max("e").over(w))
    contrib = F.when(
        F.col("pmax").isNull() | (F.col("pmax") < F.col("i")),
        F.col("e") - F.col("i") + 1,
    ).otherwise(F.greatest(F.col("e") - F.col("pmax"), F.lit(0)))
    return (
        swept.select("doc", contrib.alias("c"))
        .groupBy("doc")
        .agg(F.sum("c").cast("long").alias("dup_chars"))
    )


def docs_exact_substring_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: exact duplicate-substring mass over `documents` — for
    every distinct-text representative, how many characters sit inside
    a run of ≥ 23 chars shared verbatim with another document, plus
    the document length. The corpus-prep number Lee et al.'s exact
    remover acts on: dup_chars / n_chars ≈ the fraction that exact
    substring dedup would delete."""
    docs = load_table(spark, "documents", sf_dir)
    reps = (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text")
        .persist()
    )
    mass = duplicate_span_mass(reps)
    return (
        reps.select(
            "doc_id", F.length("text").cast("long").alias("n_chars")
        )
        .join(mass.withColumnRenamed("doc", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
        )
        .orderBy("doc_id")
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", L: int = L_CHARS
) -> DataFrame:
    """(doc, text_clean, n_removed): each document with every character
    covered by a cross-document shared run ≥ L chars EXCISED — the
    acting half of the Lee et al. 2022 exact-substring remover (the
    measuring half is duplicate_span_mass; n_removed == dup_chars by
    construction, pinned in pytest).

    Divergence from the paper, documented: the suffix-array remover
    keeps ONE occurrence of each duplicated run (whichever the global
    suffix order visits first — an artifact of the serial algorithm);
    this operator removes ALL occurrences. Keeping exactly one would
    require a global canonical order over occurrences — a cross-corpus
    total sort for a property the paper itself calls arbitrary. For
    the boilerplate this targets (headers, license blocks, navigation
    chrome), removing every occurrence is the intended cleanup; the
    unique prose around it is untouched by construction.

    Pure Column expressions end-to-end, with NO per-character rows:
    the shared intervals are unioned into DISJOINT covered segments
    (the D17 prefix-max sweep plus a running segment counter — one
    Exchange+Sort, both windows share the (doc, i) spec), and the
    cleaned text is rebuilt by folding the complement GAPS with
    Column.substr. A chars ⋈ intervals coverage join would cost
    doc_len × doc_intervals per document — quadratic exactly on
    boilerplate-heavy documents where intervals ≈ len (the shared-
    boilerplate harness put 33 B join rows behind 400k docs before
    this formulation; now the join-free cost is Θ(intervals) rows +
    a per-doc fold over the FEW disjoint segments). The oracle keeps
    the independent per-character formulation (chars/covered/kept),
    so the cleaned STRINGS hash-matching is a genuine two-formulation
    cross-check."""
    iv = shared_intervals(df, id_col, text_col, L)
    w_prev = (
        Window.partitionBy("doc")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = (
        iv.withColumn("pmax", F.max("e").over(w_prev))
        .withColumn(
            "new_seg",
            (F.col("pmax").isNull() | (F.col("i") > F.col("pmax"))).cast("int"),
        )
        .withColumn("seg", F.sum("new_seg").over(w_run))
    )
    segs = marked.groupBy("doc", "seg").agg(
        F.min("i").alias("s"), F.max("e").alias("e")
    )
    seg_arr = segs.groupBy("doc").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("segs")
    )
    base = df.select(
        F.col(id_col).alias("doc"),
        F.col(text_col).alias("__text"),
        F.length(text_col).cast("int").alias("__n"),
    )
    joined = base.join(seg_arr, "doc", "left")
    txt = F.col("__text")
    # fold the gaps between disjoint segments: acc = (next gap start,
    # cleaned-so-far); each segment appends the gap before it.
    folded = F.aggregate(
        F.col("segs"),
        F.struct(F.lit(1).cast("int").alias("pos"), F.lit("").alias("out")),
        lambda acc, s: F.struct(
            (s["e"] + F.lit(1)).cast("int").alias("pos"),
            F.concat(acc["out"], txt.substr(acc["pos"], s["s"] - acc["pos"])).alias(
                "out"
            ),
        ),
        lambda acc: F.concat(
            acc["out"], txt.substr(acc["pos"], F.col("__n") - acc["pos"] + F.lit(1))
        ),
    )
    clean = F.when(F.col("segs").isNull(), txt).otherwise(folded)
    return joined.select(
        "doc",
        clean.alias("text_clean"),
        (F.col("__n").cast("long") - F.length(clean)).cast("long").alias("n_removed"),
    )


def docs_remove_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the exact-substring REMOVER over `documents` — for every
    distinct-text representative, the cleaned text with all cross-doc
    duplicated runs ≥ 23 chars excised, plus how many characters went.
    The value-hash covers the cleaned STRINGS themselves, so both
    engines must agree on every excised position."""
    docs = load_table(spark, "documents", sf_dir)
    reps = (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text")
        .persist()
    )
    out = remove_duplicate_spans(reps)
    return (
        reps.select("doc_id", F.length("text").cast("long").alias("n_chars"))
        .join(out.withColumnRenamed("doc", "doc_id"), "doc_id")
        .select("doc_id", "n_chars", "n_removed", "text_clean")
        .orderBy("doc_id")
    )


def _lgram_hash_sql(base: int, L: int = L_CHARS) -> str:
    """One Karp–Rabin polynomial as explicit SQL. Powers of the base
    are precomputed mod 2^61−1; each term is up to ~2^82 (codepoint ×
    61-bit literal), so the arithmetic runs in HUGEINT (int128) and
    the reduced hash is cast back to BIGINT — bit-identical to the
    kernel's two-limb uint64 arithmetic."""
    terms = []
    for j in range(L):
        lit = pow(base, L - 1 - j, MOD61)
        terms.append(f"CAST(ASCII(SUBSTR(text, i + {j}, 1)) AS HUGEINT) * {lit}")
    return "CAST((" + " + ".join(terms) + f") % {MOD61} AS BIGINT)"


DOCS_EXACT_SUBSTRING_MASS_SQL = f"""
WITH reps AS (SELECT MIN(doc_id) AS doc, text FROM documents GROUP BY text),
pos AS (
  SELECT doc, i, {_lgram_hash_sql(BASE_A)} AS h1, {_lgram_hash_sql(BASE_B)} AS h2
  FROM reps,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(text) - {L_CHARS - 1}, 0))) AS i)
),
shared AS (SELECT h1, h2 FROM pos GROUP BY h1, h2 HAVING COUNT(DISTINCT doc) >= 2),
iv AS (
  SELECT doc, i, i + {L_CHARS - 1} AS e
  FROM pos SEMI JOIN shared USING (h1, h2)
),
swept AS (
  SELECT doc, i, e,
         MAX(e) OVER (PARTITION BY doc ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM iv
),
mass AS (
  SELECT doc,
         CAST(SUM(CASE WHEN pmax IS NULL OR pmax < i THEN e - i + 1
                       WHEN e > pmax THEN e - pmax ELSE 0 END) AS BIGINT) AS dup_chars
  FROM swept GROUP BY doc
)
SELECT r.doc AS doc_id,
       CAST(LEN(r.text) AS BIGINT) AS n_chars,
       COALESCE(m.dup_chars, 0) AS dup_chars
FROM reps r LEFT JOIN mass m ON r.doc = m.doc
ORDER BY doc_id
"""


DOCS_REMOVE_DUPLICATE_SPANS_SQL = f"""
WITH reps AS (SELECT MIN(doc_id) AS doc, text FROM documents GROUP BY text),
pos AS (
  SELECT doc, i, {_lgram_hash_sql(BASE_A)} AS h1, {_lgram_hash_sql(BASE_B)} AS h2
  FROM reps,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(text) - {L_CHARS - 1}, 0))) AS i)
),
shared AS (SELECT h1, h2 FROM pos GROUP BY h1, h2 HAVING COUNT(DISTINCT doc) >= 2),
iv AS (
  SELECT doc, i, i + {L_CHARS - 1} AS e
  FROM pos SEMI JOIN shared USING (h1, h2)
),
chars AS (
  SELECT doc, i, SUBSTR(text, i, 1) AS ch
  FROM reps, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(text))) AS i)
),
covered AS (
  SELECT DISTINCT c.doc, c.i
  FROM chars c JOIN iv ON c.doc = iv.doc AND c.i BETWEEN iv.i AND iv.e
),
kept AS (
  SELECT c.doc, c.i, c.ch
  FROM chars c LEFT JOIN covered v ON c.doc = v.doc AND c.i = v.i
  WHERE v.doc IS NULL
),
clean AS (
  SELECT doc, STRING_AGG(ch, '' ORDER BY i) AS text_clean
  FROM kept GROUP BY doc
)
SELECT r.doc AS doc_id,
       CAST(LEN(r.text) AS BIGINT) AS n_chars,
       CAST(LEN(r.text) - LEN(COALESCE(c.text_clean, '')) AS BIGINT) AS n_removed,
       COALESCE(c.text_clean, '') AS text_clean
FROM reps r LEFT JOIN clean c ON r.doc = c.doc
ORDER BY doc_id
"""
