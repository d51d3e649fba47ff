"""SimHash fingerprinting + hamming-band near-dup detection.

fingerprint: 64-bit where bit j = sign of Σ_tokens (bit j of
xxhash64(token) ? +1 : −1), token-frequency weighted.

Computed as explode(token-hash) → ONE aggregation with 64 conditional
sums (map-side partial aggregation, single shuffle keyed by doc) —
never 64 passes over the token array. Near-dup candidates share at
least one of four 16-bit bands (pigeonhole ⇒ full recall for hamming
distance ≤ 3); verification is exact ``bit_count(xor)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .shingling import word_array

N_BITS = 64
BAND_BITS = 16
N_BANDS = N_BITS // BAND_BITS


def hamming(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, fp): 64-bit SimHash per document. Docs with no tokens get
    fp = 0."""
    tokens = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_array(F.lower(F.col(text_col)))).alias("tok"),
    ).select("doc", F.xxhash64("tok").alias("th"))

    one = F.lit(1).cast("long")
    bit_sums = [
        F.sum(
            F.when(F.shiftrightunsigned("th", j).bitwiseAND(one) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(N_BITS)
    ]
    agg = tokens.groupBy("doc").agg(*bit_sums)

    fp = F.lit(0).cast("long")
    for j in range(N_BITS):
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{j}") > 0, F.shiftleft(one, j)).otherwise(F.lit(0).cast("long"))
        )
    fps = agg.select("doc", fp.alias("fp"))

    # Docs that produced zero tokens fall out of the explode; restore
    # them with fp = 0 so the operator is total.
    all_docs = df.select(F.col(id_col).alias("doc"))
    return all_docs.join(fps, "doc", "left").select(
        "doc", F.coalesce("fp", F.lit(0).cast("long")).alias("fp")
    )


def portable_simhash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, fp): engine-portable SimHash. Bit j comes from hex digit
    j//4 of md5(token) (MSB-first within the digit), and the
    fingerprint is emitted as a 64-char '0'/'1' string — every engine
    with md5 + substr reproduces it exactly, which is what lets the
    DuckDB oracle verify the full pipeline (the xxhash64/int64 variant
    stays the fast path: long-width XOR + bit_count beat string ops).
    """
    tokens = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_array(F.lower(F.col(text_col)))).alias("tok"),
    ).select("doc", F.md5(F.col("tok")).alias("h"))
    # Materialize the 16 hex-digit values once, then 64 conditional
    # sums over them. The persist() is load-bearing: Catalyst inlines
    # projections into the aggregate, so without the barrier each of
    # the 64 sums re-derives conv(substring(md5)) per token (measured
    # 12s → ~2s at sf0.01 for 500 docs).
    digits = tokens.select(
        "doc",
        *[
            F.conv(F.substring("h", i + 1, 1), 16, 10).cast("int").alias(f"d{i}")
            for i in range(16)
        ],
    ).persist()
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"d{j // 4}"), 3 - j % 4).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(N_BITS)
    ]
    agg = digits.groupBy("doc").agg(*bit_sums)
    fp = F.concat(
        *[F.when(F.col(f"b{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(N_BITS)]
    )
    fps = agg.select("doc", fp.alias("fp"))
    all_docs = df.select(F.col(id_col).alias("doc"))
    return all_docs.join(fps, "doc", "left").select(
        "doc", F.coalesce("fp", F.lit("0" * N_BITS)).alias("fp")
    )


def portable_simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) over the portable string fingerprints:
    same pigeonhole banding (4 × 16-char slices).

    Recall guarantee holds only for ``max_hamming <= N_BANDS - 1``
    (= 3): with 4 bands, up to 3 differing bits cannot touch every
    band, so such pairs always share a bucket. Larger thresholds
    return only pairs that happen to collide — partial recall by
    construction (same contract as the xxhash64 variant).

    Candidate pairs are DISTINCTed before scoring (a pair colliding in
    k bands would otherwise pay the hamming computation k times), and
    hamming runs on four 16-bit ints parsed once per doc from the
    binary string (XOR + bit_count) rather than per-pair string
    splitting — ~9× on a duplicate-heavy 10× corpus, bit-identical
    result."""
    fps = portable_simhash_table(df, id_col, text_col)
    ints = fps.select(
        "doc",
        "fp",
        *[
            F.conv(F.substring("fp", b * BAND_BITS + 1, BAND_BITS), 2, 10)
            .cast("long")
            .alias(f"w{b}")
            for b in range(N_BANDS)
        ],
    ).persist()
    banded = ints.select(
        "doc",
        F.posexplode(
            F.array(*[F.substring("fp", b * BAND_BITS + 1, BAND_BITS) for b in range(N_BANDS)])
        ).alias("band", "bucket"),
    )
    left = banded.select("band", "bucket", F.col("doc").alias("id_a"))
    right = banded.select("band", "bucket", F.col("doc").alias("id_b"))
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = ints.select(F.col("doc").alias("id_a"), *[F.col(f"w{b}").alias(f"wa{b}") for b in range(N_BANDS)])
    b_ = ints.select(F.col("doc").alias("id_b"), *[F.col(f"w{b}").alias(f"wb{b}") for b in range(N_BANDS)])
    hamming_int = sum(
        F.bit_count(F.col(f"wa{b}").bitwiseXOR(F.col(f"wb{b}"))) for b in range(N_BANDS)
    )
    return (
        cand.join(a, "id_a")
        .join(b_, "id_b")
        .select("id_a", "id_b", hamming_int.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash(text: Column) -> Column:
    """Column-expression SimHash (small inputs / tests). Prefer
    ``simhash_table`` in hot paths — this form folds the token array
    64 times."""
    hashes = F.transform(word_array(F.lower(text)), lambda t: F.xxhash64(t))
    fp = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for j in range(N_BITS):
        bit_sum = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftrightunsigned(h, j).bitwiseAND(one) == 1, 1).otherwise(-1),
        )
        fp = fp.bitwiseOR(
            F.when(bit_sum > 0, F.shiftleft(one, j)).otherwise(F.lit(0).cast("long"))
        )
    return fp


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) for pairs within max_hamming bits."""
    fps = simhash_table(df, id_col, text_col).persist()
    banded = fps.select(
        "doc",
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("fp", b * BAND_BITS).bitwiseAND(
                        F.lit((1 << BAND_BITS) - 1).cast("long")
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )

    left = banded.select("band", "bucket", F.col("doc").alias("id_a"), F.col("fp").alias("fp_a"))
    right = banded.select("band", "bucket", F.col("doc").alias("id_b"), F.col("fp").alias("fp_b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming(F.col("fp_a"), F.col("fp_b")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
