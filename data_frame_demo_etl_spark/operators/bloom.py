"""Bloom-filter join pruning — cut the fact-side shuffle BEFORE an
equi-join when the dim side is selective but its key set is too large
(or too late in the plan) for a plain broadcast-hash join to prune the
scan.

The filter is built DISTRIBUTED (k hash positions per distinct key,
bit-OR folded per 64-bit word on the executors) and only the folded
bitmap — `m_bits/64` longs, a few KiB — is collected and re-broadcast
as an array literal. The probe is pure JVM column arithmetic
(xxhash64 → word index → bit test), so the prune runs inside
whole-stage codegen at scan time, upstream of the shuffle. False
positives are fine by construction: the real join still runs and
removes them — the bloom only shrinks the rows that reach it, which is
the entire point at 100 TB (Spark's own runtime bloom,
`spark.sql.optimizer.runtime.bloomFilter.enabled`, does this when
statistics let it; this operator is the explicit, plannable form with
a portable oracle).

No reference analog (`/root/reference` is a single-process pandas
engine; every join is in-memory) — beyond-reference scale surface
alongside the salted skew join (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

_WORD = 64


def build_bloom_words(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5
) -> list[int]:
    """Fold the distinct keys of ``df[key_col]`` into an m-bit Bloom
    bitmap, returned as a dense ``m_bits/64``-long word list.

    Executors compute the (word, mask) pairs and bit-OR them per word;
    the driver only sees the folded words (≤ m_bits/64 rows — bounded
    by the filter geometry, never by the data), then densifies.

    The probe side must present the key with the SAME Spark type used
    here — xxhash64 hashes the physical type, so e.g. an int probe
    against a long build silently misses every member.
    """
    if m_bits % _WORD:
        raise ValueError(f"m_bits must be a multiple of {_WORD}, got {m_bits}")
    pos = F.pmod(
        F.xxhash64(F.col("k"), F.col("seed")), F.lit(m_bits)
    ).alias("p")
    folded = (
        df.select(F.col(key_col).alias("k"))
        .distinct()
        .crossJoin(F.broadcast(df.sparkSession.range(k).select(F.col("id").alias("seed"))))
        .select(pos)
        .select(
            (F.col("p") / _WORD).cast("int").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod(F.col("p"), F.lit(_WORD)).cast("int")
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    words = [0] * (m_bits // _WORD)
    for r in folded:
        words[r["w"]] = r["word"]
    return words


def might_contain(
    words: list[int], key: Column, m_bits: int = 1 << 16, k: int = 5
) -> Column:
    """Pure-column Bloom probe: True iff all k bits for ``key`` are set
    in the broadcast word array. Compiles into whole-stage codegen —
    no UDF, no driver round-trip per row."""
    arr = F.lit(words)
    cond = None
    for seed in range(k):
        # xxhash64 is TYPE-sensitive: the seed must be LongType on both
        # the build side (spark.range → long) and the probe side, or
        # the same key hashes to different bits and members get missed.
        pos = F.pmod(F.xxhash64(key, F.lit(seed).cast("long")), F.lit(m_bits))
        word = F.get(arr, (pos / _WORD).cast("int"))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(_WORD)).cast("int")
        )
        hit = word.bitwiseAND(mask) != F.lit(0)
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_prune(
    big: DataFrame,
    big_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Return ``big`` filtered to rows whose key MIGHT join ``dim``
    (no false negatives; false positives bounded by the m/k geometry).
    Compose with the real join afterwards — the join stays correct,
    it just shuffles a fraction of the fact table."""
    words = build_bloom_words(dim, dim_key, m_bits=m_bits, k=k)
    return big.filter(might_contain(words, F.col(big_key), m_bits=m_bits, k=k))


def bloom_pruned_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: revenue per part type for one brand, with the lineitem
    scan Bloom-pruned on l_partkey before the join. The oracle is the
    PLAIN join — bloom false positives are removed by the join, so the
    result must be row-identical to the unpruned plan."""
    from ..analytics.tpch import _disc_price, _money

    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#23")
    lineitem = load_table(spark, "lineitem", sf_dir)
    pruned = bloom_prune(lineitem, "l_partkey", part, "p_partkey")
    return (
        pruned.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            _money(F.sum(_disc_price()), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_type")
    )


BLOOM_PRUNED_BRAND_REVENUE_SQL = """
SELECT
  p_type,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
GROUP BY p_type
ORDER BY p_type
"""
