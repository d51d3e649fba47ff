"""MinHash + banded LSH near-duplicate detection.

Pipeline: shingle → K minhash values (xxhash64 with per-permutation
salt; all JVM-side) → B bands of R rows hashed to bucket keys →
self-join within (band, bucket) → candidate pairs → verify by
estimated Jaccard (fraction of matching minhash components).

Scale notes: the only wide shuffle is the band-bucket self-join, and
buckets bound the pair blowup; signatures (K longs) travel instead of
document text. Oversized buckets (degenerate content) should be capped
upstream via a bucket-frequency cutoff like jaccard.max_shingle_freq.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .shingling import shingles


def minhash_signature(text: Column, num_perm: int = 32, n: int = 3) -> Column:
    """array<long> of length num_perm: per-permutation min of
    xxhash64(salt, shingle). An empty shingle set yields nulls."""
    sh = shingles(text, n)
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(F.lit(k), s)))
            for k in range(num_perm)
        ]
    )
    return sig


def signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_perm: int = 32, n: int = 3
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        minhash_signature(F.col(text_col), num_perm, n).alias("sig"),
    ).filter(F.col("sig")[0].isNotNull())


def band_buckets(sig_df: DataFrame, bands: int = 8, rows: int = 4) -> DataFrame:
    """(doc, band, bucket) — one row per band; bucket is the hash of
    that band's signature slice."""
    out = []
    for b in range(bands):
        out.append(
            sig_df.select(
                "doc",
                F.lit(b).alias("band"),
                F.hash(F.slice("sig", b * rows + 1, rows)).alias("bucket"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def estimated_jaccard(sig_a: Column, sig_b: Column) -> Column:
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return matches.cast("double") / F.size(sig_a)


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    rows: int = 4,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """(id_a, id_b, est_jaccard) for candidate pairs whose estimated
    Jaccard >= threshold."""
    assert bands * rows == num_perm, "bands*rows must equal num_perm"
    sig = signatures(df, id_col, text_col, num_perm, n)
    bb = band_buckets(sig, bands, rows)

    left = bb.select("band", "bucket", F.col("doc").alias("id_a"))
    right = bb.select("band", "bucket", F.col("doc").alias("id_b"))
    candidates = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(estimated_jaccard(F.col("sig_a"), F.col("sig_b")), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
