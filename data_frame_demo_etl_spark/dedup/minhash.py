"""MinHash + banded LSH near-duplicate detection.

Formulation chosen for scale: each shingle is hashed ONCE with a
strong 64-bit hash (``xxhash64``); the K permutations are salted
re-hashes of that fixed-width long. Signatures are then K ``min``
aggregates over the exploded (doc, shingle-hash) table — a single scan
with map-side partial mins, one shuffle keyed by doc. This beats
per-permutation string hashing by ~K× (long input vs variable-length
string) and keeps everything in whole-stage codegen.

Bands: the K-long signature array is sliced into B bands of R values;
each band slice is hashed to a bucket key. Docs sharing any
(band, bucket) become candidate pairs; verification estimates Jaccard
as the fraction of matching signature components.

Scale notes: the band-bucket self-join is the only pair-producing
shuffle and buckets bound its size; signatures (K longs) travel, never
document text. Degenerate hot buckets (e.g. boilerplate docs) should
be capped upstream with a bucket-frequency cutoff.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .shingling import shingle_hash_table


def signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(doc, sig: array<long>[num_perm]) via explode + K min-aggregates."""
    exploded = shingle_hash_table(df, id_col, text_col, n)
    # Permutation k = xxhash64 of the (one-time) shingle hash salted
    # with k: hashing a fixed-width long is far cheaper than re-hashing
    # the string K times, and avoids ANSI-mode overflow that an affine
    # (a*h+b) permutation would hit.
    mins = [
        F.min(F.xxhash64(F.lit(seed + k), F.col("h"))).alias(f"m{k}")
        for k in range(num_perm)
    ]
    agg = exploded.groupBy("doc").agg(*mins)
    return agg.select("doc", F.array(*[f"m{k}" for k in range(num_perm)]).alias("sig"))


def band_buckets(sig_df: DataFrame, bands: int = 8, rows: int = 4) -> DataFrame:
    """(doc, band, bucket): one pass — all band hashes in a single
    projection, then posexplode."""
    band_hashes = F.array(
        *[F.hash(F.slice("sig", b * rows + 1, rows)) for b in range(bands)]
    )
    return sig_df.select("doc", F.posexplode(band_hashes).alias("band", "bucket"))


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
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, est_jaccard) for candidate pairs whose estimated
    Jaccard >= threshold."""
    assert bands * rows == num_perm, "bands*rows must equal num_perm"
    sig = signatures(df, id_col, text_col, num_perm, n, seed).persist()
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
