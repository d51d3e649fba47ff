"""Exact distributed selection (operators/selection.py): histogram-
narrowing medians must equal Spark's buffering `percentile` aggregate
bit-for-bit on integer inputs — including negatives, duplicates, and
adversarial all-in-one-bucket distributions."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.operators.selection import (
    grouped_kth,
    grouped_median2,
)


def _df(spark, groups):
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "g string, v long")


def _reference_median2(spark, df):
    return {
        r["g"]: int(round(2 * r["m"]))
        for r in df.groupBy("g")
        .agg(F.percentile(F.col("v"), F.lit(0.5)).alias("m"))
        .collect()
    }


def test_median2_matches_percentile_basic(spark):
    groups = {
        "odd": [5, 1, 9],
        "even": [4, 1, 7, 10],
        "dups": [3, 3, 3, 3, 7],
        "neg": [-5, -1, 0, 8],
        "wide": [0, 2**40, -(2**40), 17],
    }
    df = _df(spark, groups)
    assert grouped_median2(df, "g", "v") == _reference_median2(spark, df)


def test_kth_order_statistics(spark):
    vals = [random.Random(7).randrange(-1000, 1000) for _ in range(101)]
    df = _df(spark, {"g": vals})
    want = sorted(vals)
    got = grouped_kth(df, "g", "v", {"g": [1, 50, 101]})
    assert got[("g", 1)] == want[0]
    assert got[("g", 50)] == want[49]
    assert got[("g", 101)] == want[100]


def test_single_value_group(spark):
    df = _df(spark, {"g": [42]})
    assert grouped_median2(df, "g", "v") == {"g": 84}


VALS = st.lists(
    st.integers(min_value=-(2**35), max_value=2**35), min_size=1, max_size=60
)


@settings(max_examples=5, deadline=None)
@given(VALS, VALS)
def test_median2_matches_percentile_property(spark, a, b):
    df = _df(spark, {"a": a, "b": b})
    assert grouped_median2(df, "g", "v") == _reference_median2(spark, df)


def test_invalid_rank_raises(spark):
    import pytest

    df = _df(spark, {"g": [1, 2, 3]})
    with pytest.raises(ValueError, match="exceeds the rows"):
        grouped_kth(df, "g", "v", {"g": [4]})


def test_rfm_empty_orders(spark):
    from data_frame_demo_etl_spark.analytics.features import rfm_segments

    empty = spark.createDataFrame(
        [], "o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = rfm_segments(empty)
    assert out.count() == 0
    assert "rfm_code" in out.columns and "custkey" in out.columns


def test_kth_beyond_double_precision(spark):
    # Values past 2^53: float bucket math could misroute; the integer
    # `div` path must still select exactly (reference: driver sort).
    base = 2**60
    vals = [base + 3, base - 7, base + 12345678901, base, base - 2**40]
    df = _df(spark, {"g": vals})
    want = sorted(vals)
    got = grouped_kth(df, "g", "v", {"g": [1, 3, 5]})
    assert got[("g", 1)] == want[0]
    assert got[("g", 3)] == want[2]
    assert got[("g", 5)] == want[4]


def test_kth_span_exceeding_int64(spark):
    # lo near -2^63 and hi near 2^63-1: (val - lo) wraps in long
    # arithmetic; the decimal first-round path must still bucket
    # exactly (reference: driver sort).
    lo, hi = -(2**63) + 1, 2**63 - 2
    vals = [lo, -5, 0, 7, hi]
    df = _df(spark, {"g": vals})
    want = sorted(vals)
    got = grouped_kth(df, "g", "v", {"g": [1, 2, 3, 4, 5]})
    assert [got[("g", i)] for i in range(1, 6)] == want
