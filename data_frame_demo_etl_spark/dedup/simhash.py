"""SimHash fingerprinting + hamming-band near-dup detection.

fingerprint: 64-bit where bit j = sign of Σ_tokens (bit j of
xxhash64(token) ? +1 : −1). Near-dup candidates share at least one of
four 16-bit bands (catches hamming distance ≤ 3 by pigeonhole);
verification computes exact hamming via bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .shingling import word_array

N_BITS = 64
BAND_BITS = 16
N_BANDS = N_BITS // BAND_BITS


def simhash(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens (long)."""
    hashes = F.transform(word_array(F.lower(text)), lambda t: F.xxhash64(t))
    fp = F.lit(0).cast("long")
    for j in range(N_BITS):
        bit_sum = F.aggregate(
            F.transform(
                hashes,
                lambda h: F.when(
                    F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1).cast("long")) == 1, 1
                ).otherwise(-1),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        fp = fp.bitwiseOR(
            F.when(bit_sum > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fp


def hamming(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col).alias("doc"), simhash(F.col(text_col)).alias("fp"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) for pairs within max_hamming bits.

    Banding guarantees recall for max_hamming < N_BANDS; the band
    equi-join replaces the quadratic all-pairs compare.
    """
    fps = simhash_table(df, id_col, text_col)
    banded = None
    for b in range(N_BANDS):
        piece = fps.select(
            "doc",
            "fp",
            F.lit(b).alias("band"),
            F.shiftrightunsigned("fp", b * BAND_BITS)
            .bitwiseAND(F.lit((1 << BAND_BITS) - 1).cast("long"))
            .alias("bucket"),
        )
        banded = piece if banded is None else banded.unionByName(piece)

    left = banded.select("band", "bucket", F.col("doc").alias("id_a"), F.col("fp").alias("fp_a"))
    right = banded.select("band", "bucket", F.col("doc").alias("id_b"), F.col("fp").alias("fp_b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming(F.col("fp_a"), F.col("fp_b")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
