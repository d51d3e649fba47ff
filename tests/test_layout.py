"""Physical-layout tests: bucketed joins must be shuffle-free;
partitioned reads must prune partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.operators.layout import (
    compact,
    write_bucketed,
    write_partitioned,
)
from data_frame_demo_etl_spark.sources.catalog import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS layout_test")
    lineitem = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    write_bucketed(lineitem, "layout_test.l_b", ["l_orderkey"], n_buckets=4, sort_cols=["l_orderkey"])
    write_bucketed(orders, "layout_test.o_b", ["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"])

    l = spark.table("layout_test.l_b")
    o = spark.table("layout_test.o_b")
    # Force a non-broadcast join so bucketing is what avoids the shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(o, l.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # Bucket-aligned tables: no Exchange (shuffle) feeds the join.
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == l.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE layout_test.l_b")
        spark.sql("DROP TABLE layout_test.o_b")


def test_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_type")
    events = load_table(spark, "events", sf_dir)
    write_partitioned(events, path, ["event_type"])

    pruned = spark.read.parquet(path).filter(F.col("event_type") == "view")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # Partition predicate becomes a PartitionFilters entry, not a scan filter.
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    want = events.filter(F.col("event_type") == "view").count()
    assert pruned.count() == want


def test_compact_clusters_rows(spark, sf_dir, tmp_path):
    lineitem = load_table(spark, "lineitem", sf_dir)
    out = compact(lineitem, 4, ["l_orderkey"])
    assert out.rdd.getNumPartitions() == 4
    # Rows within each partition are sorted by the cluster key.
    def check_sorted(it):
        prev = None
        for row in it:
            if prev is not None and row.l_orderkey < prev:
                yield 1
            prev = row.l_orderkey
    violations = out.rdd.mapPartitions(check_sorted).count()
    assert violations == 0
