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


def test_zorder_value_interleaves_bits(spark):
    from data_frame_demo_etl_spark.operators.layout import zorder_value

    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long").select(
        zorder_value(F.col("x"), F.col("y")).alias("z")
    )
    # x bits at even positions: 1,0,1 -> 1 + 16; y bits at odd: 1,1,0 -> 2 + 8
    assert df.collect()[0].z == 0b11011  # = 1 | 2 | 8 | 16 = 27


def test_zorder_cluster_bounds_both_columns(spark, tmp_path):
    """Z-order layout: every output partition's (x, y) bounding box is
    a small fraction of the domain in BOTH dimensions — the property
    parquet row-group pruning exploits. A lexicographic sort on x
    would leave each partition spanning the whole y domain."""
    import itertools

    from data_frame_demo_etl_spark.operators.layout import zorder_cluster

    side = 64
    rows = [(x, y) for x, y in itertools.product(range(side), range(side))]
    df = spark.createDataFrame(rows, "x long, y long")
    clustered = zorder_cluster(df, "x", "y", n_partitions=16, bits=6)
    spans = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(spans) == 16
    # Perfect Z-split of a 64x64 grid into 16 cells gives 16x16 boxes;
    # range-partition boundaries are approximate, so allow 2x slack —
    # still far below the 63-wide span a 1-D sort leaves on y.
    for r in spans:
        assert r.sx <= 32 and r.sy <= 32, (r.pid, r.sx, r.sy)


def test_parquet_pruning_audit_prunes_most_slices(spark, sf_dir):
    """The ~2% range predicate spans at most 2 of the 8 deterministic
    slices, so at least 6 row groups must be flagged pruned — and the
    footer stats must tile the id space exactly (no gaps/overlap)."""
    from data_frame_demo_etl_spark.operators.layout import (
        events_parquet_pruning_audit,
    )

    rows = events_parquet_pruning_audit(spark, sf_dir).collect()
    assert len(rows) == 8
    assert sum(1 for r in rows if r.pruned) >= 6
    spans = sorted((r.min_v, r.max_v) for r in rows)
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert b1 < a2  # disjoint, ordered
    assert sum(r.n_rows for r in rows) == sum(b - a + 1 for a, b in spans)


def test_zorder_cluster_empty_and_quoted_names(spark):
    """normalize=True must not crash when the min/max aggregates come
    back NULL (empty input / all-null column — it falls back to the
    raw interleave), and column names that need backtick quoting must
    survive the scaling expression."""
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.operators.layout import zorder_cluster

    empty = spark.range(0).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    assert zorder_cluster(empty, "x", "y", 4).count() == 0

    nulls = spark.range(10).select(
        F.lit(None).cast("long").alias("x"), F.col("id").alias("y")
    )
    assert zorder_cluster(nulls, "x", "y", 4).count() == 10

    quoted = spark.range(64).select(
        F.col("id").alias("user id"), (F.col("id") * 3).alias("select")
    )
    got = zorder_cluster(quoted, "user id", "select", 4)
    assert got.count() == 64 and set(got.columns) == {"user id", "select"}


def test_materialize_handles_nested_maps(spark):
    """session.materialize must hash queries whose schema nests a map
    inside an array or struct (xxhash64 rejects map types at ANY
    depth, not just top-level)."""
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.session import materialize

    df = spark.range(3).select(
        "id",
        F.array(F.create_map(F.lit("k"), F.col("id"))).alias("am"),
        F.struct(F.create_map(F.lit("k"), F.col("id")).alias("m")).alias("sm"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
    )
    materialize(df)  # must not raise AnalysisException
