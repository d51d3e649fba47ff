"""Round-10 additions: linear multi-touch attribution, repurchase
cadence quantiles, collocation PMI, per-source vocabulary KL."""

from __future__ import annotations

import datetime as dt
import math


def _ev(uid, ts, typ, val=None):
    return (uid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts), typ, val)


EV_SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def test_attribution_equal_split_with_remainder(spark):
    from data_frame_demo_etl_spark.analytics.funnel import linear_touch_attribution

    rows = [
        _ev(1, 0, "view"),
        _ev(1, 10, "click"),
        _ev(1, 20, "purchase", 1.01),  # 101 cents over 2 touches → 50/50, rem 1
    ]
    out = {
        r.channel: (r.n_purchases, r.attributed_cents)
        for r in linear_touch_attribution(spark.createDataFrame(rows, EV_SCHEMA)).collect()
    }
    assert out["view"] == (1, 50)
    assert out["click"] == (1, 50)
    assert out["none"] == (0, 0)
    assert out["rounding_remainder"] == (1, 1)


def test_attribution_window_and_null_value(spark):
    from data_frame_demo_etl_spark.analytics.funnel import (
        ATTRIBUTION_WINDOW_S,
        linear_touch_attribution,
    )

    rows = [
        # touch OUTSIDE the 7-day lookback → purchase is unattributed
        _ev(1, 0, "view"),
        _ev(1, ATTRIBUTION_WINDOW_S + 100, "purchase", 2.00),
        # NULL-value purchase is excluded entirely, its touch unused
        _ev(2, 0, "click"),
        _ev(2, 10, "purchase", None),
    ]
    out = {
        r.channel: (r.n_purchases, r.attributed_cents)
        for r in linear_touch_attribution(spark.createDataFrame(rows, EV_SCHEMA)).collect()
    }
    assert out["none"] == (1, 200)
    assert out["view"] == (0, 0)
    assert out["click"] == (0, 0)
    assert out["rounding_remainder"] == (0, 0)


def test_attribution_conserves_purchase_cents(spark):
    from data_frame_demo_etl_spark.analytics.funnel import linear_touch_attribution

    rows = []
    for u in range(20):
        for i in range(u % 4):
            rows.append(_ev(u, i * 100, "view" if i % 2 == 0 else "click"))
        rows.append(_ev(u, 1000, "purchase", 0.97 + u))
    df = spark.createDataFrame(rows, EV_SCHEMA)
    total = sum(
        r.attributed_cents for r in linear_touch_attribution(df).collect()
    )
    expect = sum(round((0.97 + u) * 100) for u in range(20))
    assert total == expect


def test_repurchase_cadence_exact_quantiles(spark):
    from data_frame_demo_etl_spark.analytics.timeseries import repurchase_cadence

    d = dt.date(1995, 1, 1)
    orders = spark.createDataFrame(
        [
            # cust 1: days 0, 10, 30 → gaps 10, 20
            (1, 1, d),
            (2, 1, d + dt.timedelta(days=10)),
            (3, 1, d + dt.timedelta(days=30)),
            # cust 2: days 0, 30 → gap 30
            (4, 2, d),
            (5, 2, d + dt.timedelta(days=30)),
        ],
        "o_orderkey long, o_custkey long, o_orderdate date",
    )
    customer = spark.createDataFrame(
        [(1, "BUILDING"), (2, "BUILDING")], "c_custkey long, c_mktsegment string"
    )
    r = repurchase_cadence(orders, customer).collect()
    assert len(r) == 1
    row = r[0]
    # gaps {10, 20, 30}: q = smallest gap with cum*100 >= t*q
    assert (row.n_gaps, row.p25_days, row.p50_days, row.p75_days, row.p90_days) == (
        3,
        10,
        20,
        30,
        30,
    )
    assert row.mean_days_micro == 20_000_000


def test_repurchase_cadence_same_day_orders_gap_zero(spark):
    from data_frame_demo_etl_spark.analytics.timeseries import repurchase_cadence

    d = dt.date(1995, 1, 1)
    orders = spark.createDataFrame(
        [(1, 1, d), (2, 1, d)], "o_orderkey long, o_custkey long, o_orderdate date"
    )
    customer = spark.createDataFrame(
        [(1, "AUTOMOBILE")], "c_custkey long, c_mktsegment string"
    )
    row = repurchase_cadence(orders, customer).collect()[0]
    assert (row.n_gaps, row.p50_days, row.mean_days_micro) == (1, 0, 0)


def test_collocation_pmi_planted_pair(spark):
    from data_frame_demo_etl_spark.functions.vocab import collocation_pmi

    # "x y" ×5 in one doc: c(x)=c(y)=5, N=10; bigrams (x,y)=5, (y,x)=4, NB=9
    # (y,x) falls under the min-pair guard; PMI(x,y) = ln(5·10²/(9·5·5))
    docs = spark.createDataFrame(
        [("x y x y x y x y x y",)], "text string"
    )
    rows = collocation_pmi(docs).collect()
    assert [(r.w1, r.w2, r.pair_count) for r in rows] == [("x", "y", 5)]
    expect = math.floor(math.log((5 * 10 * 10) / (9 * 5 * 5)) * 1_000_000 + 0.5)
    assert rows[0].pmi_micro == expect


def test_collocation_pmi_short_docs_no_phantom_bigrams(spark):
    from data_frame_demo_etl_spark.functions.vocab import collocation_pmi

    # 1-token and empty docs must contribute NO bigrams (Spark's
    # sequence(1, 0) runs descending — the guard this test pins)
    docs = spark.createDataFrame(
        [("solo",), ("",), ("a b a b a b a b a b",)], "text string"
    )
    rows = collocation_pmi(docs).collect()
    assert [(r.w1, r.w2) for r in rows] == [("a", "b")]


def test_source_vocab_kl_identical_and_disjoint(spark):
    from data_frame_demo_etl_spark.functions.vocab import source_vocab_kl

    # A: 10 tokens of a word only A uses → KL_A = ln(N/n_A) = ln(4)
    # B: 30 tokens of its own word     → KL_B = ln(40/30)
    docs = spark.createDataFrame(
        [("A", "aaa " * 10)] + [("B", "bbb " * 30)], "source string, text string"
    )
    out = {r.source: r for r in source_vocab_kl(docs).collect()}
    assert out["A"].n_tokens == 10 and out["B"].n_tokens == 30
    assert out["A"].kl_micro == math.floor(math.log(4.0) * 1_000_000 + 0.5)
    assert out["B"].kl_micro == math.floor(math.log(40 / 30) * 1_000_000 + 0.5)

    # identical mixes → KL exactly 0 on both sides
    docs2 = spark.createDataFrame(
        [("A", "w v w v"), ("B", "w v w v")], "source string, text string"
    )
    assert all(r.kl_micro == 0 for r in source_vocab_kl(docs2).collect())
