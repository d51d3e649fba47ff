"""Salted-join semantics (operators/skew.py:salted_join) and the
bucketed co-located join posture: the two big-⋈-big strategies the
skew profiler's report points at.

Reference scope note: the reference engine exposes merge/combine
joins (engine.py) but no skew tooling — these are 100 TB additions
mandated by the brief, not ports.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_frame_demo_etl_spark.operators.skew import salted_join


def _plain(big, small, on, how="inner"):
    return big.join(small, on=on, how=how)


def test_salted_join_matches_plain_inner_with_hot_key(spark):
    # one hot key (0: 500 rows) + a tail, small side with dup keys
    big = spark.createDataFrame(
        [(0, i) for i in range(500)] + [(k, k * 10) for k in range(1, 40)],
        ["k", "payload"],
    )
    small = spark.createDataFrame(
        [(0, "hot"), (0, "hot2"), (3, "c"), (7, "d"), (99, "absent-in-big")],
        ["k", "tag"],
    )
    got = sorted(tuple(r) for r in salted_join(big, small, "k", n_salts=4).collect())
    want = sorted(tuple(r) for r in _plain(big, small, "k").collect())
    assert got == want and len(got) == 1002  # 500*2 hot + 2 tail


def test_salted_join_left_preserves_unmatched_and_multiplicity(spark):
    big = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c"), (5, "e")], ["k", "v"])
    small = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], ["k", "t"])
    got = sorted(
        tuple(r) for r in salted_join(big, small, "k", n_salts=3, how="left").collect()
    )
    want = sorted(tuple(r) for r in _plain(big, small, "k", "left").collect())
    assert got == want
    # the unmatched big row survives exactly once
    assert sum(1 for r in got if r[0] == 5) == 1


def test_salted_join_spreads_hot_key_over_salts(spark):
    big = spark.createDataFrame([(0, i) for i in range(200)], ["k", "payload"])
    salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)).cast("int")
    )
    n_used = salted.select("__salt").distinct().count()
    assert n_used == 8  # 200 rows of one key land on all 8 salts


def test_salted_join_rejects_right_full(spark):
    df = spark.createDataFrame([(1, 1)], ["k", "v"])
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="right")


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """The co-location strategy for a REPEATED big-⋈-big join key:
    write both sides bucketed by the key, and the sort-merge join
    reads the buckets directly — the plan carries no Exchange on
    either side. (At 100 TB this converts every orders⋈customer-key
    join after the one-time bucketed write into a shuffle-free scan.)"""
    from data_frame_demo_etl_spark.sources.catalog import load_table

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (
            orders.write.mode("overwrite")
            .bucketBy(4, "o_custkey")
            .sortBy("o_custkey")
            .option("path", str(tmp_path / "orders_b"))
            .saveAsTable("orders_bucketed")
        )
        (
            customer.write.mode("overwrite")
            .bucketBy(4, "c_custkey")
            .sortBy("c_custkey")
            .option("path", str(tmp_path / "customer_b"))
            .saveAsTable("customer_bucketed")
        )
        ob = spark.table("orders_bucketed")
        cb = spark.table("customer_bucketed")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS customer_bucketed")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
