"""Bloom-filter join pruning: no false negatives ever, measurable
pruning on a selective dim, and gate parity with the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.operators.bloom import (
    bloom_prune,
    bloom_pruned_brand_revenue,
    build_bloom_words,
    might_contain,
)


def test_bloom_no_false_negatives(spark):
    dim = spark.range(0, 200, 3).select(F.col("id").alias("k"))  # 67 keys
    words = build_bloom_words(dim, "k")
    probe = spark.range(0, 200).select(
        "id", might_contain(words, F.col("id")).alias("hit")
    )
    got = {r.id: r.hit for r in probe.collect()}
    for key in range(0, 200, 3):
        assert got[key], f"member key {key} missed — bloom broke its contract"


def test_bloom_prunes_most_non_members(spark):
    dim = spark.range(0, 50).select(F.col("id").alias("k"))
    big = spark.range(0, 100_000).select(F.col("id").alias("bk"))
    kept = bloom_prune(big, "bk", dim, "k").count()
    # 50 members survive; with m=65536/k=5 the FP rate is ≪ 1%, so the
    # non-member survivors are a sliver of the 100k probes.
    assert kept >= 50
    assert kept < 1_500, f"bloom barely pruned: kept {kept} of 100000"


def test_bloom_pruned_join_matches_plain_join(spark, sf_dir):
    from data_frame_demo_etl_spark.sources.catalog import load_table

    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#23")
    li = load_table(spark, "lineitem", sf_dir)
    plain = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pruned = (
        bloom_prune(li, "l_partkey", part, "p_partkey")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, pruned.collect()))


def test_bloom_gate_runs(spark, sf_dir):
    out = bloom_pruned_brand_revenue(spark, sf_dir)
    rows = out.collect()
    assert out.columns == ["p_type", "revenue", "n_lines"]
    assert len(rows) >= 1
    assert all(r.n_lines > 0 for r in rows)


def test_bloom_rejects_bad_geometry(spark):
    import pytest

    dim = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        build_bloom_words(dim, "k", m_bits=100)
