"""Per-document novelty / boilerplate scoring.

Span dedup (spans.py) REMOVES repeated text; this module MEASURES it:
for each document, the share of its distinct word n-grams that occur
in at least one other document. High share = boilerplate-heavy page
(navigation chrome, templates, licenses); low share = novel prose.
RefinedWeb/Dolma-style corpus analyses use exactly this signal to
pick dedup thresholds and to rank sources by redundancy.

Shape: explode distinct per-doc shingles (one row per (doc, gram)),
one groupBy gram for document frequency, one re-agg per doc. Two
shuffles, both on hashed keys; no self-joins — the gram-frequency
table absorbs all cross-document structure, so cost is linear in
corpus size (vs quadratic pair enumeration).

Scale path hashes shingles (xxhash64 — 8-byte keys over the wire);
the gate uses string shingles so DuckDB can reproduce every stage.
pytest pins hashed == string counts on real data (collisions at 64
bits are negligible below ~2^32 distinct grams; at bigger corpora
collisions only blur the SCORE, never corrupt documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .shingling import shingle_hash_table, shingles


def doc_novelty(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = True,
) -> DataFrame:
    """(id_col, n_shingles, n_shared, boilerplate_share) per document.

    Documents with fewer than n words have no shingles: score 0.0."""
    if hashed:
        grams = shingle_hash_table(df, id_col, text_col, n=n).select("doc", F.col("h").alias("g"))
    else:
        grams = df.select(
            F.col(id_col).alias("doc"),
            F.explode(shingles(F.col(text_col), n=n)).alias("g"),
        )
    # grams feeds both the frequency agg and the per-doc join: persist
    # so the tokenize+explode runs once (at cluster scale, write the
    # gram table to parquet instead and share it across metrics).
    grams = grams.persist()
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        grams.join(freq, "g")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.round(F.col("n_shared") / F.col("n_shingles"), 6),
            )
            .otherwise(0.0)
            .alias("boilerplate_share"),
        )
    )


def doc_novelty_gate(spark, sf_dir: str) -> DataFrame:
    """Gate: string-shingle novelty at n=8 over documents (portable);
    the hashed path is pinned equal in pytest."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return doc_novelty(docs, n=8, hashed=False).orderBy("doc_id")


DOC_NOVELTY_SQL = r"""
WITH words AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '') AS ws
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, ARRAY_TO_STRING(ws[i:(i+7)], ' ') AS g
  FROM words,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(ws) - 7, 0))) AS i)
),
freq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_shingles,
         CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
  FROM grams JOIN freq USING (g)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_shingles, 0) AS n_shingles,
       COALESCE(p.n_shared, 0) AS n_shared,
       CASE WHEN COALESCE(p.n_shingles, 0) > 0
            THEN ROUND(p.n_shared / CAST(p.n_shingles AS DOUBLE), 6)
            ELSE 0.0 END AS boilerplate_share
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# ─────────────── D23: exact-duplication profile ───────────────


def duplication_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Histogram of exact-duplicate group sizes — the corpus-health
    read a crawl audit opens with (what share of documents are copies,
    and does the mass sit in a few mega-groups or a long tail of
    pairs?): one row per observed group size with the group count and
    the exact ppm of documents living at that size. size=1 row = the
    unique share; Σ doc_share_ppm ≈ 10⁶.

    Exact integers end to end; the histogram is value-domain sized
    (distinct group sizes). One sha2-keyed groupBy (dedup_exact's
    shuffle shape — 64-byte hashes, never document bytes), one
    histogram re-agg, one 1-row total broadcast."""
    sizes = (
        docs.select(F.sha2(F.col(text_col), 256).alias("__h"))
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    hist = sizes.groupBy("s").agg(F.count(F.lit(1)).alias("n_groups"))
    tot = hist.agg(
        F.sum(F.col("s") * F.col("n_groups")).cast("decimal(38,0)").alias("t")
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("s").cast("long").alias("group_size"),
            F.col("n_groups").cast("long").alias("n_groups"),
            F.expr(
                "cast((cast(s as decimal(38,0)) * n_groups * 1000000) div t as long)"
            ).alias("doc_share_ppm"),
        )
        .orderBy("group_size")
    )


def docs_duplication_profile(spark, sf_dir: str) -> DataFrame:
    """Gate: exact-duplicate group-size histogram over documents."""
    from ..sources.catalog import load_table

    return duplication_profile(load_table(spark, "documents", sf_dir))


DOCS_DUPLICATION_PROFILE_SQL = """
WITH sizes AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS s
  FROM documents GROUP BY sha256(text)
),
hist AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_groups FROM sizes GROUP BY s),
tot AS (SELECT SUM(CAST(s AS HUGEINT) * n_groups) AS t FROM hist)
SELECT s AS group_size, n_groups,
       CAST((CAST(s AS HUGEINT) * n_groups * 1000000) // t AS BIGINT) AS doc_share_ppm
FROM hist CROSS JOIN tot
ORDER BY group_size
"""
