"""Round-10 additions: market concentration (HHI/CRk), token-budget curve."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hhi_monopoly_is_one(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import market_concentration

    df = spark.createDataFrame([(1, 500), (1, 500)], "k long, cents long")
    r = market_concentration(df, "k", F.col("cents")).collect()[0]
    assert (r.n_entities, r.total_cents) == (1, 1000)
    assert r.hhi_ppm == 1_000_000
    assert r.cr4_ppm == 1_000_000 and r.cr8_ppm == 1_000_000


def test_hhi_uniform_is_one_over_n(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import market_concentration

    # 10 equal entities → HHI = 1/10, CR4 = 4/10, CR8 = 8/10
    df = spark.createDataFrame([(k, 100) for k in range(10)], "k long, cents long")
    r = market_concentration(df, "k", F.col("cents")).collect()[0]
    assert r.hhi_ppm == 100_000
    assert r.cr4_ppm == 400_000
    assert r.cr8_ppm == 800_000


def test_hhi_known_mix(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import market_concentration

    # shares 1/2, 1/4, 1/4 → HHI = 1/4 + 1/16 + 1/16 = 3/8
    df = spark.createDataFrame(
        [(1, 200), (2, 100), (3, 100)], "k long, cents long"
    )
    r = market_concentration(df, "k", F.col("cents")).collect()[0]
    assert r.hhi_ppm == 375_000


def test_token_budget_curve_two_lengths(spark):
    from data_frame_demo_etl_spark.functions.vocab import token_budget_curve

    # 5 docs of 2 tokens, 5 docs of 10 tokens: t_c=10, t_m=60
    docs = spark.createDataFrame(
        [("a b",)] * 5 + [("a b c d e f g h i j",)] * 5, "text string"
    )
    rows = {r.decile: r for r in token_budget_curve(docs).collect()}
    assert set(rows) == set(range(1, 11))
    # deciles 1-5 land on len 2: kept = 5·2 (full) + 2·5 (capped) = 20/60
    for d in range(1, 6):
        assert rows[d].cap_len == 2
        assert rows[d].docs_within_ppm == 500_000
        assert rows[d].tokens_kept_ppm == 333_333
    # deciles 6-10 land on len 10: everything kept
    for d in range(6, 11):
        assert rows[d].cap_len == 10
        assert rows[d].docs_within_ppm == 1_000_000
        assert rows[d].tokens_kept_ppm == 1_000_000


def test_token_budget_curve_single_length(spark):
    from data_frame_demo_etl_spark.functions.vocab import token_budget_curve

    docs = spark.createDataFrame([("w w w",)] * 4, "text string")
    rows = token_budget_curve(docs).collect()
    assert len(rows) == 10
    assert all(r.cap_len == 3 and r.tokens_kept_ppm == 1_000_000 for r in rows)
