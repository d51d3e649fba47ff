"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
SIGMOD 2003): position-robust LOCAL fingerprinting over overlapping
character k-grams.

Every k-gram of the text is hashed (rolling window of the character
stream), and within each window of ``w`` consecutive hashes the
MINIMUM is selected; the distinct selected hashes are the document's
fingerprint set. The winnowing guarantee: any substring shared by two
documents of length ≥ w + k − 1 characters contributes at least one
COMMON fingerprint — regardless of where the substring sits in either
document. That alignment-independence is what the fixed non-
overlapping span dedup (dedup/spans.py, D6) cannot give: a shared
boilerplate block shifted by one word produces disjoint span sets but
overlapping winnowing fingerprints.

Scale shape: everything is Column expressions over arrays — one
`transform` builds the k-gram hash array, one `transform` +
`array_min`/`slice` selects window minima, `array_distinct` +
`posexplode` emits (doc, fp) rows. Cost is O(chars) per document
with density ~2/(w+1) selected fingerprints per position (the
paper's bound); the match join runs on the fingerprint value with
the standard hot-value cap (a fingerprint appearing in more docs
than the cap is boilerplate so common it has no discriminating
power — the LSH hot-bucket treatment).

The k-gram hash is the repo's portable md5-prefix idiom, so the
DuckDB oracle reproduces every fingerprint bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

K_CHARS = 16  #: k-gram length (characters)
WINDOW = 8    #: winnowing window (hashes) — detects matches ≥ 23 chars
MAX_DOCS_PER_FP = 50  #: hot-fingerprint cap for the match join
MIN_SHARED = 3  #: pair threshold: fingerprints shared to call a match


def _kgram_hash(col, i):
    """Portable 32-bit k-gram hash: md5-prefix idiom (identical in
    DuckDB as CAST(CONCAT('0x', SUBSTR(MD5(...), 1, 8)) AS BIGINT))."""
    return F.conv(
        F.substring(F.md5(F.substring(col, i, K_CHARS)), 1, 8), 16, 10
    ).cast("long")


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
    minimum (the whole text is one window)."""
    text = F.col("__text")
    n_kgrams = F.greatest(F.length(text) - F.lit(k - 1), F.lit(0))
    # guard: Spark's sequence(1, 0) would count DOWN — build the
    # position list only when at least one k-gram exists
    positions = F.when(n_kgrams >= 1, F.sequence(F.lit(1), n_kgrams)).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.transform(positions, lambda i: _kgram_hash(text, i))
    n_windows = F.size(hashes) - F.lit(w - 1)
    mins = (
        F.when(
            n_windows >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
                lambda j: F.array_min(F.slice(hashes, j, w)),
            ),
        )
        .when(F.size(hashes) >= 1, F.array(F.array_min(hashes)))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__text"))
        .select("doc", F.explode(F.array_distinct(mins)).alias("fp"))
    )


def winnow_matches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_CHARS,
    w: int = WINDOW,
    min_shared: int = MIN_SHARED,
    max_docs_per_fp: int | None = MAX_DOCS_PER_FP,
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing at least
    ``min_shared`` winnowing fingerprints — the local-similarity /
    plagiarism-detection primitive. Fingerprints present in more than
    ``max_docs_per_fp`` documents are dropped before the pair join
    (ubiquitous boilerplate carries no discriminating power and its
    posting list is quadratic — the LSH hot-bucket treatment)."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    if max_docs_per_fp is not None:
        from pyspark.sql import Window

        cnt = F.count(F.lit(1)).over(Window.partitionBy("fp"))
        fps = (
            fps.withColumn("__n", cnt)
            .filter(F.col("__n") <= max_docs_per_fp)
            .drop("__n")
        )
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


def docs_winnowing_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: winnowing fingerprint matching over `documents` — pairs
    sharing ≥ 3 fingerprints with the hot-fingerprint cap. Exercises
    the full local-fingerprint pipeline (k-gram hashing, window-min
    selection, capped posting-list join) end to end.

    Defined over DISTINCT texts (min doc_id as representative, both
    engines — the dedup_sketch_eval convention): exact copies share
    every fingerprint by construction, so copy-pairs are pure
    quadratic inflation of the match report; the local-similarity
    signal lives entirely in the distinct-text pairs."""
    docs = load_table(spark, "documents", sf_dir)
    reps = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id", "text"
    )
    return winnow_matches(reps).orderBy("id_a", "id_b")


DOCS_WINNOWING_MATCHES_SQL = f"""
WITH kg AS (
  SELECT doc_id AS doc,
         CAST(CONCAT('0x', SUBSTR(MD5(SUBSTR(text, i, {K_CHARS})), 1, 8)) AS BIGINT) AS h,
         i
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
