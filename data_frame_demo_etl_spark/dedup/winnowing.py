"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
SIGMOD 2003): position-robust LOCAL fingerprinting over overlapping
character k-grams.

Every k-gram of the text is hashed with a Karp–Rabin polynomial
rolling hash (h_i = Σ_j code(c_{i+j})·B^{k−1−j} mod M — pure integer
arithmetic, so the DuckDB oracle reproduces every fingerprint
bit-for-bit from an explicit k-term formula), and within each window
of ``w`` consecutive hashes the MINIMUM is selected; the distinct
selected hashes are the document's fingerprint set. The winnowing
guarantee: any substring shared by two documents of length ≥ w + k − 1
characters contributes at least one COMMON fingerprint — regardless of
where the substring sits in either document. That alignment-
independence is what the fixed non-overlapping span dedup
(dedup/spans.py, D6) cannot give: a shared boilerplate block shifted
by one word produces disjoint span sets but overlapping winnowing
fingerprints.

Why the hashing kernel is an Arrow-batched pandas UDF and not Column
expressions: the per-position work (k-gram hash + sliding-window min)
is a higher-order transform over character arrays, which Spark
evaluates INTERPRETED (higher-order functions don't enter whole-stage
codegen) — the Column formulation measured **41 s** at sf0.1 against
~2 s for the vectorized numpy rolling hash (Horner over the codepoint
array + stride-tricks sliding minimum), a textbook case of the
brief's "Pandas UDFs where the built-ins genuinely can't express the
semantics [efficiently]". Everything AFTER the per-doc kernel — the
hot-fingerprint cap and the posting-list pair join — stays in
DataFrame ops.

Scale shape: O(k·len) vectorized work per document, density ~2/(w+1)
selected fingerprints per position (the paper's bound); the match
join runs on the fingerprint value with the standard hot-value cap (a
fingerprint appearing in more docs than the cap is boilerplate so
common it has no discriminating power — the LSH hot-bucket
treatment).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

K_CHARS = 16  #: k-gram length (characters)
WINDOW = 8    #: winnowing window (hashes) — detects matches ≥ 23 chars
BASE = 257    #: Karp–Rabin base (> any codepoint byte, coprime to M)
MOD = 2_147_483_647  #: 2^31 − 1 (Mersenne): products fit int64 on every engine
MAX_DOCS_PER_FP = 50  #: hot-fingerprint cap for the match join
MIN_SHARED = 3  #: pair threshold: fingerprints shared to call a match


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_CHARS,
    w: int = WINDOW,
) -> DataFrame:
    """(doc, fp): the distinct winnowing fingerprints of each
    document. Documents shorter than ``k`` characters emit none;
    documents with fewer than ``w`` k-grams emit the single global
    minimum (the whole text is one window). Vectorized numpy kernel
    over Arrow batches; fingerprint values are the exact integers the
    oracle's k-term polynomial formula produces."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in it:
            ids: list = []
            fps: list = []
            for doc, text in zip(pdf["doc"], pdf["__text"]):
                if text is None:
                    continue
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n = codes.size
                if n < k:
                    continue
                # Horner: h_i = sum_j codes[i+j] * B^(k-1-j) mod M
                h = np.zeros(n - k + 1, dtype=np.int64)
                for j in range(k):
                    h = (h * BASE + codes[j : j + n - k + 1]) % MOD
                if h.size >= w:
                    mins = sliding_window_view(h, w).min(axis=1)
                else:
                    mins = h.min(keepdims=True)
                for fp in np.unique(mins):
                    ids.append(doc)
                    fps.append(int(fp))
            yield pd.DataFrame({"doc": ids, "fp": fps})

    return (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__text"))
        .mapInPandas(batches, "doc long, fp long")
    )


def winnow_matches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_CHARS,
    w: int = WINDOW,
    min_shared: int = MIN_SHARED,
    max_docs_per_fp: int | None = MAX_DOCS_PER_FP,
    cap_plan: str = "anti",
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing at least
    ``min_shared`` winnowing fingerprints — the local-similarity /
    plagiarism-detection primitive. Fingerprints present in more than
    ``max_docs_per_fp`` documents are dropped before the pair join
    (ubiquitous boilerplate carries no discriminating power and its
    posting list is quadratic — the LSH hot-bucket treatment).

    cap_plan="anti" (default): groupBy-count the per-fingerprint doc
    counts (map-side partial agg — no posting list is ever gathered),
    left-anti join the over-cap fingerprints (≤ postings / cap rows;
    join strategy left to AQE — see minhash.cap_hot_buckets for why
    the broadcast must not be forced). The kernel output is PERSISTED
    because both the count branch and the pair join consume it — the
    cache outlives this call by the library-wide lifecycle contract
    (session.release_all_caches): the session owner releases between
    logical queries; long-lived callers invoking this directly should
    do the same. cap_plan="window" (legacy,
    A/B harness scripts/scaling_boilerplate.py): one count window over
    fp — reuses its exchange for the pair join, but buffers a
    boilerplate fingerprint's ENTIRE corpus-sized posting list in one
    task before dropping it, a straggler AQE cannot split."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    if max_docs_per_fp is not None:
        if cap_plan == "window":
            from pyspark.sql import Window

            cnt = F.count(F.lit(1)).over(Window.partitionBy("fp"))
            fps = (
                fps.withColumn("__n", cnt)
                .filter(F.col("__n") <= max_docs_per_fp)
                .drop("__n")
            )
        else:
            # persist the bare kernel output: the hot-count branch and
            # the pair join both consume it (session owner releases).
            fps = fps.persist()
            hot = (
                fps.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > max_docs_per_fp)
                .select("fp")
            )
            fps = fps.join(hot, "fp", "left_anti")
    a = fps.select(F.col("doc").alias("id_a"), "fp")
    b = fps.select(F.col("doc").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select("id_a", "id_b", F.col("n_shared").cast("long").alias("n_shared"))
    )


def docs_winnowing_matches(
    spark: SparkSession, sf_dir: str, cap_plan: str = "anti"
) -> DataFrame:
    """Gate: winnowing fingerprint matching over `documents` — pairs
    sharing ≥ 3 fingerprints with the hot-fingerprint cap. Exercises
    the full local-fingerprint pipeline (rolling k-gram hashing,
    window-min selection, capped posting-list join) end to end.

    Defined over DISTINCT texts (min doc_id as representative, both
    engines — the dedup_sketch_eval convention): exact copies share
    every fingerprint by construction, so copy-pairs are pure
    quadratic inflation of the match report; the local-similarity
    signal lives entirely in the distinct-text pairs.

    The repartition after the collapse is load-bearing: AQE coalesces
    the post-groupBy shuffle by BYTE size (a few thousand texts fit
    one partition), but the fingerprint kernel downstream is per-row
    CPU-dense, so without it the whole corpus's hashing runs in ONE
    task. AQE sizes partitions for bytes, not compute — spread
    explicitly before compute-dense stages."""
    spark_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    docs = load_table(spark, "documents", sf_dir)
    reps = (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text")
        .repartition(spark_parts, "doc_id")
    )
    return winnow_matches(reps, cap_plan=cap_plan).orderBy("id_a", "id_b")


def _kr_hash_sql(k: int = K_CHARS) -> str:
    """The k-term Karp–Rabin polynomial as explicit SQL: every power
    B^{k−1−j} mod M is a precomputed literal, each term stays under
    2^52, the k-term sum under 2^56 — exact in BIGINT on both
    engines."""
    terms = []
    for j in range(k):
        lit = pow(BASE, k - 1 - j, MOD)
        terms.append(f"CAST(ASCII(SUBSTR(text, i + {j}, 1)) AS BIGINT) * {lit}")
    return "(" + " + ".join(terms) + f") % {MOD}"


DOCS_WINNOWING_MATCHES_SQL = f"""
WITH kg AS (
  SELECT doc_id AS doc, {_kr_hash_sql()} AS h, i
  FROM (SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(text) - {K_CHARS - 1}, 0))) AS i)
),
harr AS (
  SELECT doc, LIST(h ORDER BY i) AS hs FROM kg GROUP BY doc
),
mins AS (
  SELECT doc,
         CASE
           WHEN LEN(hs) >= {WINDOW} THEN (
             SELECT LIST(DISTINCT m) FROM (
               SELECT LIST_AGGREGATE(hs[j : j + {WINDOW - 1}], 'min') AS m
               FROM UNNEST(GENERATE_SERIES(1, LEN(hs) - {WINDOW - 1})) AS t(j)
             )
           )
           WHEN LEN(hs) >= 1 THEN [LIST_AGGREGATE(hs, 'min')]
           ELSE []
         END AS fps
  FROM harr
),
fp AS (SELECT doc, UNNEST(fps) AS fp FROM mins),
capped AS (
  SELECT * FROM (
    SELECT doc, fp, COUNT(*) OVER (PARTITION BY fp) AS nd FROM fp
  ) WHERE nd <= {MAX_DOCS_PER_FP}
)
SELECT a.doc AS id_a, b.doc AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc < b.doc
GROUP BY a.doc, b.doc
HAVING COUNT(*) >= {MIN_SHARED}
ORDER BY id_a, id_b
"""
