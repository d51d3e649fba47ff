"""Incremental (batch-vs-corpus) MinHash dedup — the ingestion shape.

A live pipeline never re-dedups 100 TB against itself per delivery: it
keeps the LSH index (signatures + band buckets) of the accepted corpus
and checks each NEW batch against that index plus itself. Cost per
batch is |batch| signature scans + a bucket equi-join against the
index — independent of corpus size outside the touched buckets.

Drop rule (deterministic, order-free): a new document is dropped if it
has an estimated-Jaccard ≥ τ collision with ANY corpus document, or
with an earlier-id document in its own batch (keep-lowest-id, the
same representative rule as semdedup/spans). This is the standard
one-pass approximation: a batch doc whose only match was itself
dropped still drops (transitive pruning), which is the conservative
direction for training-data hygiene.

Scale notes: the corpus bucket table is hot-bucket capped BEFORE the
probe join (an uncapped boilerplate bucket would re-quadratize every
batch); the batch side is usually broadcastable. Reuses the minhash
module's two hash families — xxhash64 for production, md5 for the
fully-oracled gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .minhash import (
    band_buckets,
    cap_hot_buckets,
    estimated_jaccard,
    portable_signatures,
    signatures,
)


def build_lsh_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    rows: int = 4,
    n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = 200,
):
    """(signatures, capped band buckets) for the accepted corpus —
    persist/write these once, reuse per batch."""
    if hash_fn == "md5":
        sig = portable_signatures(corpus, id_col, text_col, num_perm, n)
    else:
        sig = signatures(corpus, id_col, text_col, num_perm, n, seed)
    bb = band_buckets(sig, bands, rows, portable=(hash_fn == "md5"))
    if max_bucket_size is not None:
        bb = cap_hot_buckets(bb, max_bucket_size)
    return sig, bb


def incremental_dedup_batch(
    batch: DataFrame,
    corpus_sig: DataFrame,
    corpus_buckets: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    rows: int = 4,
    n: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-batch-document admission decisions against the index.

    Returns (id_col, n_corpus_dups, n_batch_dups, is_kept), where
    n_batch_dups counts collisions with EARLIER (smaller-id) batch
    docs only — the ones that can veto this document."""
    if hash_fn == "md5":
        bsig = portable_signatures(batch, id_col, text_col, num_perm, n)
    else:
        bsig = signatures(batch, id_col, text_col, num_perm, n, seed)
    bsig = bsig.persist()
    bbb = band_buckets(bsig, bands, rows, portable=(hash_fn == "md5"))

    def _estimate(cands: DataFrame, sig_a: DataFrame, sig_b: DataFrame) -> DataFrame:
        sa = sig_a.select(F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"))
        sb = sig_b.select(F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"))
        return (
            cands.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.round(estimated_jaccard(F.col("sig_a"), F.col("sig_b")), 6).alias(
                    "est_jaccard"
                ),
            )
            .filter(F.col("est_jaccard") >= threshold)
        )

    vs_corpus = _estimate(
        bbb.select(F.col("doc").alias("id_a"), "band", "bucket")
        .join(corpus_buckets.select(F.col("doc").alias("id_b"), "band", "bucket"), ["band", "bucket"])
        .select("id_a", "id_b")
        .distinct(),
        bsig,
        corpus_sig,
    )
    within = _estimate(
        bbb.select(F.col("doc").alias("id_b"), "band", "bucket")
        .join(bbb.select(F.col("doc").alias("id_a"), "band", "bucket"), ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct(),
        bsig,
        bsig,
    )

    corpus_hits = vs_corpus.groupBy(F.col("id_a").alias("doc")).agg(
        F.count(F.lit(1)).alias("n_corpus_dups")
    )
    batch_hits = within.groupBy(F.col("id_b").alias("doc")).agg(
        F.count(F.lit(1)).alias("n_batch_dups")
    )
    return (
        batch.select(F.col(id_col).alias("doc"))
        .join(corpus_hits, "doc", "left")
        .join(batch_hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_corpus_dups", F.lit(0)).cast("long").alias("n_corpus_dups"),
            F.coalesce("n_batch_dups", F.lit(0)).cast("long").alias("n_batch_dups"),
            (
                (F.coalesce("n_corpus_dups", F.lit(0)) == 0)
                & (F.coalesce("n_batch_dups", F.lit(0)) == 0)
            ).alias("is_kept"),
        )
    )


# ───────────────────────── portable gate ─────────────────────────

GATE_THRESHOLD = 0.8


def dedup_incremental(spark, sf_dir: str) -> DataFrame:
    """Gate: even doc_ids are the accepted corpus, odd ids the new
    batch; md5 hash family so DuckDB replays signatures, buckets,
    hot-bucket cap, both candidate joins, and the admission rule."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    sig, bb = build_lsh_index(corpus, hash_fn="md5")
    return incremental_dedup_batch(
        batch, sig, bb, threshold=GATE_THRESHOLD, hash_fn="md5"
    ).orderBy("doc_id")


DEDUP_INCREMENTAL_SQL = rf"""
WITH words AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id AS doc, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM words, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(ws) - 2, 0))) AS i)
),
perms AS (
  SELECT doc, k, MIN(MD5(CAST(k AS VARCHAR) || '|' || shingle)) AS m
  FROM sh CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS k)
  GROUP BY doc, k
),
sig AS (SELECT doc, LIST(m ORDER BY k) AS sig FROM perms GROUP BY doc),
bands AS (
  SELECT doc, b AS band, MD5(ARRAY_TO_STRING(sig[b*4+1:b*4+4], '')) AS bucket
  FROM sig CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS b)
),
corpus_bands AS (SELECT * FROM bands WHERE doc % 2 = 0),
batch_bands AS (SELECT * FROM bands WHERE doc % 2 = 1),
ok_buckets AS (
  SELECT band, bucket FROM corpus_bands GROUP BY band, bucket HAVING COUNT(*) <= 200
),
corpus_capped AS (
  SELECT corpus_bands.* FROM corpus_bands JOIN ok_buckets USING (band, bucket)
),
cand_corpus AS (
  SELECT DISTINCT nb.doc AS id_a, cb.doc AS id_b
  FROM batch_bands nb JOIN corpus_capped cb
    ON nb.band = cb.band AND nb.bucket = cb.bucket
),
cand_batch AS (
  SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
  FROM batch_bands a JOIN batch_bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
),
est_corpus AS (
  SELECT id_a, id_b,
         ROUND(CAST(LEN(LIST_FILTER(GENERATE_SERIES(1, 32), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32, 6) AS est_jaccard
  FROM cand_corpus JOIN sig sa ON sa.doc = id_a JOIN sig sb ON sb.doc = id_b
),
est_batch AS (
  SELECT id_a, id_b,
         ROUND(CAST(LEN(LIST_FILTER(GENERATE_SERIES(1, 32), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32, 6) AS est_jaccard
  FROM cand_batch JOIN sig sa ON sa.doc = id_a JOIN sig sb ON sb.doc = id_b
),
corpus_hits AS (
  SELECT id_a AS doc, COUNT(*) AS n_corpus_dups
  FROM est_corpus WHERE est_jaccard >= {GATE_THRESHOLD} GROUP BY id_a
),
batch_hits AS (
  SELECT id_b AS doc, COUNT(*) AS n_batch_dups
  FROM est_batch WHERE est_jaccard >= {GATE_THRESHOLD} GROUP BY id_b
)
SELECT d.doc_id,
       COALESCE(ch.n_corpus_dups, 0) AS n_corpus_dups,
       COALESCE(bh.n_batch_dups, 0) AS n_batch_dups,
       (COALESCE(ch.n_corpus_dups, 0) = 0 AND COALESCE(bh.n_batch_dups, 0) = 0) AS is_kept
FROM documents d
LEFT JOIN corpus_hits ch ON ch.doc = d.doc_id
LEFT JOIN batch_hits bh ON bh.doc = d.doc_id
WHERE d.doc_id % 2 = 1
ORDER BY d.doc_id
"""
