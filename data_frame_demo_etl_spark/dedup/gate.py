"""Correctness-gate wrappers for near-duplicate detection on the
`documents` table. The exact n-gram Jaccard op has a full DuckDB
oracle; the sketch-based ops (MinHash/SimHash) are rows-only checks
(their xxhash64-based internals aren't expressible in DuckDB SQL) but
are cross-validated against the exact Jaccard op in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table
from .jaccard import jaccard_pairs
from .minhash import minhash_near_dup_pairs
from .simhash import simhash_near_dup_pairs

THRESHOLD = 0.8


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return jaccard_pairs(docs, threshold=THRESHOLD).orderBy("id_a", "id_b")


DEDUP_NGRAM_JACCARD_SQL = r"""
WITH words AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id AS doc, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM words, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(ws) - 2, 0))) AS i)
),
sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
inter AS (
  SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc = id_a
JOIN sizes sb ON sb.doc = id_b
WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.8
ORDER BY id_a, id_b
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components → (doc_id, cluster).
    Oracle: recursive-CTE transitive closure over the same pairs."""
    from .clusters import connected_components

    docs = load_table(spark, "documents", sf_dir)
    pairs = jaccard_pairs(docs, threshold=THRESHOLD)
    comps = connected_components(pairs)
    return comps.select(F.col("id").alias("doc_id"), F.col("component").alias("cluster")).orderBy(
        "doc_id"
    )


# Recursive transitive closure over the jaccard pairs (the pair graph
# is tiny relative to the corpus, so the CTE oracle is tractable).
DEDUP_CLUSTERS_SQL = r"""
WITH RECURSIVE words AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id AS doc, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM words, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(ws) - 2, 0))) AS i)
),
sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
inter AS (
  SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc = id_a
  JOIN sizes sb ON sb.doc = id_b
  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.8
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
)
SELECT u AS doc_id, MIN(r) AS cluster
FROM reach
GROUP BY u
ORDER BY doc_id
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with the md5 portable hash family, so the DuckDB
    oracle reproduces the ENTIRE pipeline — signatures, band buckets,
    hot-bucket cap, candidate pairs, similarity estimates — exactly.
    (The xxhash64 family is the 100 TB fast path; pytest cross-
    validates its recall against exact Jaccard.)"""
    docs = load_table(spark, "documents", sf_dir)
    return minhash_near_dup_pairs(
        docs, threshold=THRESHOLD, hash_fn="md5", max_bucket_size=200
    ).orderBy("id_a", "id_b")


DEDUP_MINHASH_LSH_SQL = r"""
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
ok_buckets AS (
  SELECT band, bucket FROM bands GROUP BY band, bucket HAVING COUNT(*) <= 200
),
capped AS (
  SELECT bands.* FROM bands JOIN ok_buckets USING (band, bucket)
),
cand AS (
  SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
  FROM capped a JOIN capped b ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
),
est AS (
  SELECT id_a, id_b,
         ROUND(CAST(LEN(LIST_FILTER(GENERATE_SERIES(1, 32), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32, 6) AS est_jaccard
  FROM cand JOIN sig sa ON sa.doc = id_a JOIN sig sb ON sb.doc = id_b
)
SELECT * FROM est WHERE est_jaccard >= 0.8 ORDER BY id_a, id_b
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return simhash_near_dup_pairs(docs, max_hamming=3).orderBy("id_a", "id_b")
