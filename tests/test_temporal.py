"""Temporal joins vs brute-force references on adversarial synthetic
data (duplicate timestamps, empty matches, boundary deltas)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_brute_force(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(10)), (3, 10, _ts(0)), (4, 20, _ts(7))],
        "lid long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(1), 1.0),
            (101, 10, _ts(5), 2.0),   # equal ts to lid=1 → counts (<=)
            (102, 10, _ts(5), 3.0),   # duplicate ts; larger rid wins
            (103, 10, _ts(9), 4.0),
            (104, 30, _ts(0), 9.0),   # wrong key
        ],
        "rid long, user_id long, ts timestamp, val double",
    )
    out = {
        r.lid: (r.rid, r.val)
        for r in asof_join(
            left, right, on="ts", by=["user_id"], right_payload=["rid", "val"], tie_break="rid"
        ).collect()
    }
    assert out[1] == (102, 3.0)   # ties at ts=5 → max rid
    assert out[2] == (103, 4.0)
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (None, None)  # no right rows for key 20


def test_range_join_brute_force(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(0)), (2, 10, _ts(30))], "lid long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(200, 10, _ts(0)), (201, 10, _ts(10)), (202, 10, _ts(60)), (203, 20, _ts(5))],
        "rid long, user_id long, ts timestamp",
    )
    got = {
        (r.lid, r.rid_r)
        for r in range_join(
            left, right, on="ts", by=["user_id"], lo_seconds=0, hi_seconds=600
        ).collect()
    }
    # lid=1 window [0,10min] → rids at 0 and 10 min (inclusive bounds).
    # lid=2 window [30,40min] → nothing.
    assert got == {(1, 200), (1, 201)}

    # brute-force cross check on a denser grid
    left2 = spark.createDataFrame(
        [(i, 1, _ts(i)) for i in range(40)], "lid long, user_id long, ts timestamp"
    )
    right2 = spark.createDataFrame(
        [(100 + i, 1, _ts(i * 3 + 1)) for i in range(15)],
        "rid long, user_id long, ts timestamp",
    )
    fast = {
        (r.lid, r.rid_r)
        for r in range_join(
            left2, right2, on="ts", by=["user_id"], lo_seconds=60, hi_seconds=420
        ).collect()
    }
    r2 = right2.select("user_id", F.col("rid"), F.col("ts").alias("rts"))
    naive = {
        (r.lid, r.rid)
        for r in left2.join(r2, "user_id")
        .filter(
            (F.col("ts").cast("double") + 60 <= F.col("rts").cast("double"))
            & (F.col("rts").cast("double") <= F.col("ts").cast("double") + 420)
        )
        .collect()
    }
    assert fast == naive and len(fast) > 0


def test_funnel_ordering_is_strict(spark):
    """A user whose purchase precedes their click does NOT complete
    the funnel; a properly-ordered user does; a user with only views
    stalls at stage 1."""
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.funnel import funnel_stages

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view < click < purchase — completes
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase", 0.0, "{}"),
        # user 2: purchase BEFORE click — stalls at stage 2
        (4, t0, 2, "view", 0.0, "{}"),
        (5, t0 + dt.timedelta(minutes=2), 2, "click", 0.0, "{}"),
        (6, t0 + dt.timedelta(minutes=1), 2, "purchase", 0.0, "{}"),
        # user 3: views only — stage 1
        (7, t0, 3, "view", 0.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = funnel_stages(events).orderBy("user_id").toPandas().set_index("user_id")
    assert got.loc[1, "stage_reached"] == 3
    assert got.loc[2, "stage_reached"] == 2
    assert got.loc[3, "stage_reached"] == 1


def test_interpolate_linear_known_series(spark):
    """Known series per key: interior nulls lerp between neighbors,
    leading/trailing nulls stay null, non-null rows pass through."""
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import interpolate_linear

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, None),                                # leading null
        ("a", t0 + dt.timedelta(hours=1), 10.0),
        ("a", t0 + dt.timedelta(hours=2), None),        # lerp: 10 -> 40 at 1/3
        ("a", t0 + dt.timedelta(hours=4), 40.0),
        ("a", t0 + dt.timedelta(hours=5), None),        # trailing null
        ("b", t0, 5.0),
        ("b", t0 + dt.timedelta(hours=2), None),        # lerp midpoint 5 -> 6
        ("b", t0 + dt.timedelta(hours=4), 6.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r.k, r.ts.hour): r.v_filled
        for r in interpolate_linear(df, "k", "ts", "v").collect()
    }
    assert out[("a", 0)] is None and out[("a", 5)] is None
    assert out[("a", 1)] == 10.0 and out[("a", 4)] == 40.0
    assert out[("a", 2)] == 20.0  # 10 + (40-10) * 1/3
    assert out[("b", 2)] == 5.5


def test_ohlc_resample_known_bars(spark):
    """Planted hourly bars: open/close follow (ts, tiebreak) order
    including a duplicate-timestamp tie broken by the id column."""
    from data_frame_demo_etl_spark.analytics.timeseries import ohlc_resample

    rows = [
        # key "a", hour 0: values 5 (t=1), 9 (t=2), 1 (t=3), 7 (t=59)
        ("a", _ts(1), 1, 5),
        ("a", _ts(2), 2, 9),
        ("a", _ts(3), 3, 1),
        ("a", _ts(59), 4, 7),
        # key "a", hour 1: duplicate ts → tiebreak id decides open AND close
        ("a", _ts(61), 6, 30),
        ("a", _ts(61), 5, 20),
        # key "b", hour 0: single point — open=close=high=low
        ("b", _ts(10), 7, 42),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, tb long, v long")
    got = {
        (r.key, r.bucket.hour): (r.open, r.high, r.low, r.close, r.n_points, r.total)
        for r in ohlc_resample(df, "k", "ts", "v", "tb", "hour").collect()
    }
    assert got[("a", 0)] == (5, 9, 1, 7, 4, 22)
    assert got[("a", 1)] == (20, 30, 20, 30, 2, 50)  # id 5 opens, id 6 closes
    assert got[("b", 0)] == (42, 42, 42, 42, 1, 42)


def test_ewma_matches_pandas_adjusted(spark):
    """EWMA (α=.5, span wide enough to be untruncated) equals pandas'
    adjusted ewm mean on a planted series, on the 1e-6 grid."""
    import pandas as pd

    from data_frame_demo_etl_spark.analytics.timeseries import ewma

    vals = [100, 200, 50, 400, 0, 300]
    rows = [("k", _ts(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    got = [
        r.v_ewma
        for r in ewma(df, "k", "ts", "v", alpha=0.5, span=16).orderBy("ts").collect()
    ]
    want = pd.Series(vals, dtype="float64").ewm(alpha=0.5, adjust=True).mean()
    for g, w in zip(got, want):
        assert abs(g - w) < 2e-6, (g, w)


def test_ewma_truncation_and_null_start(spark):
    """span=2 keeps only the last two observations: y_t = (x_t + .5·x_{t-1})/1.5."""
    from data_frame_demo_etl_spark.analytics.timeseries import ewma

    rows = [("k", _ts(0), 3.0), ("k", _ts(1), 6.0), ("k", _ts(2), 12.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = [r["v_ewma"] for r in ewma(df, "k", "ts", "v", span=2).orderBy("ts").collect()]
    assert got[0] == 3.0
    assert abs(got[1] - (6.0 + 0.5 * 3.0) / 1.5) < 1e-6
    assert abs(got[2] - (12.0 + 0.5 * 6.0) / 1.5) < 1e-6
