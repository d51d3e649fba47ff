"""Predicted vs OBSERVED parquet row-group pruning.

The K38 audit (operators/layout.py events_parquet_pruning_audit)
derives which row groups a range predicate SHOULD prune from footer
min/max statistics. These tests close the loop: run the filtered scan
through the engine and assert the vectorized parquet reader actually
skipped exactly the predicted row groups — the scan node's
numOutputRows equals the footer-predicted surviving row count (the
vectorized reader delivers whole row groups; pushed filters prune at
row-group granularity, so scan output == rows of surviving groups).

Page-level pruning (parquet column indexes) is finer than row groups
and would legitimately push observed BELOW predicted, so the equality
scans disable it via the per-relation hadoop option; a final test
re-enables it and asserts observed <= predicted (finer, never coarser).

The Z-order tests extend the loop to K16: a zorder_cluster layout must
prune scans filtered on EITHER clustered column, where a lexicographic
layout prunes only its leading column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_frame_demo_etl_spark.operators.layout import (
    parquet_rowgroup_stats,
    zorder_cluster,
)
from data_frame_demo_etl_spark.sources.catalog import load_table


def _scan_output_rows(df) -> int:
    """Sum of numOutputRows over the leaf scan nodes of df's EXECUTED
    plan (call after an action on the same DataFrame)."""
    jplan = df._jdf.queryExecution().executedPlan()
    if jplan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        jplan = jplan.executedPlan()
    leaves = jplan.collectLeaves()
    total = 0
    found = False
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if leaf.nodeName().startswith("Scan"):
            total += leaf.longMetric("numOutputRows").value()
            found = True
    assert found, f"no scan leaf in plan: {jplan.toString()}"
    return total


def _predicted_surviving(spark, files: list[str], column: str, lo: int, hi: int) -> int:
    """Rows in row groups the footer stats say a BETWEEN predicate
    cannot prune (the audit's per-row-group prediction)."""
    stats = parquet_rowgroup_stats(spark, files, column).collect()
    return sum(
        r.n_rows for r in stats if not (r.max_v < lo or r.min_v > hi)
    )


def _parquet_files(path) -> list[str]:
    import os

    return sorted(
        os.path.join(root, f)
        for root, _, fs in os.walk(str(path))
        for f in fs
        if f.endswith(".parquet")
    )


def _read_no_pageindex(spark, path):
    # Column indexes prune at PAGE granularity; disable so the scan's
    # numOutputRows is exactly the row-group-level number the footer
    # audit predicts. The option lands in the per-relation hadoop conf.
    return spark.read.option("parquet.filter.columnindex.enabled", "false").parquet(
        str(path)
    )


@pytest.fixture(scope="module")
def sliced_events(spark, sf_dir, tmp_path_factory):
    """events sliced by event_id range: 8 files, clustered layout."""
    out = tmp_path_factory.mktemp("pruning") / "events_sliced"
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    step = (int(max_id) + 1 + 7) // 8
    # partitionBy (like the gate's fixture): one directory and file per
    # slice value — hash-repartitioning would co-locate colliding slices
    # in one file and widen its footer envelope.
    (
        ev.withColumn("slice", F.expr(f"event_id div {step}"))
        .repartition(8, "slice")
        .sortWithinPartitions("slice", "event_id")
        .write.mode("overwrite")
        .partitionBy("slice")
        .parquet(str(out))
    )
    return out, int(max_id) + 1


def test_range_scan_skips_exactly_the_predicted_row_groups(spark, sliced_events):
    path, n_total = sliced_events
    lo, hi = n_total // 2, n_total // 2 + max(n_total // 50, 1)  # ~2% range
    files = _parquet_files(path)
    predicted = _predicted_surviving(spark, files, "event_id", lo, hi)

    df = _read_no_pageindex(spark, path).filter(F.col("event_id").between(lo, hi))
    rows = df.collect()
    observed = _scan_output_rows(df)

    total = sum(r.n_rows for r in parquet_rowgroup_stats(spark, files, "event_id").collect())
    assert observed == predicted, (observed, predicted)
    # The layout must actually prune (≥ half the corpus skipped) and
    # the pruned scan still returns every matching row.
    assert predicted <= total // 2
    assert len(rows) == hi - lo + 1


def test_pageindex_prunes_at_least_as_much_as_row_groups(spark, sliced_events):
    path, n_total = sliced_events
    lo, hi = n_total // 2, n_total // 2 + max(n_total // 50, 1)
    predicted = _predicted_surviving(spark, _parquet_files(path), "event_id", lo, hi)

    df = spark.read.parquet(str(path)).filter(F.col("event_id").between(lo, hi))
    df.collect()
    observed = _scan_output_rows(df)
    # Column indexes may skip pages INSIDE surviving row groups (the
    # file is sorted by event_id, so pages are tightly bounded) but can
    # never deliver more than the surviving row groups hold.
    assert observed <= predicted


@pytest.fixture(scope="module")
def zorder_layouts(spark, sf_oracle_dir, tmp_path_factory):
    """events written twice: Z-ordered on (user_id, event_id) vs
    lexicographically clustered on user_id only. sf0.01 (not the
    smoke dir): the smoke corpus has 15 distinct users, so a 2%-range
    probe is 2 of 15 values and boundary quantization dominates the
    pruning fractions the assertions pin."""
    base = tmp_path_factory.mktemp("zorder")
    ev = load_table(spark, "events", sf_oracle_dir).select("event_id", "user_id", "value")
    zpath = base / "zorder"
    lpath = base / "lex"
    # 16 partitions → the top 4 interleaved (normalized) z bits split
    # EACH column's domain into 4, so a narrow range on either column
    # prunes ~3/4 of the files.
    zorder_cluster(ev, "user_id", "event_id", n_partitions=16).write.mode(
        "overwrite"
    ).parquet(str(zpath))
    ev.repartitionByRange(16, "user_id").sortWithinPartitions("user_id").write.mode(
        "overwrite"
    ).parquet(str(lpath))
    bounds = ev.agg(
        F.max("user_id").alias("u"), F.max("event_id").alias("e")
    ).collect()[0]
    return zpath, lpath, int(bounds.u) + 1, int(bounds.e) + 1


@pytest.mark.parametrize("column", ["user_id", "event_id"])
def test_zorder_predicted_equals_observed_on_both_columns(spark, zorder_layouts, column):
    zpath, _, n_users, n_events = zorder_layouts
    n = n_users if column == "user_id" else n_events
    # probe at the 0.4 quantile, not the midpoint: every dyadic
    # quantile (1/2, 1/4, …) sits exactly ON a z-bit boundary, where
    # BOTH adjacent cells legitimately touch the probe value (a
    # midpoint probe measured ~50-70% surviving — the layout is fine,
    # the probe straddled the top-bit split).
    q4 = int(
        spark.read.parquet(str(zpath))
        .agg(F.expr(f"percentile({column}, 0.4)"))
        .collect()[0][0]
    )
    lo, hi = q4, q4 + max(n // 50, 1)
    files = _parquet_files(zpath)
    predicted = _predicted_surviving(spark, files, column, lo, hi)
    total = sum(r.n_rows for r in parquet_rowgroup_stats(spark, files, column).collect())

    df = _read_no_pageindex(spark, zpath).filter(F.col(column).between(lo, hi))
    df.collect()
    observed = _scan_output_rows(df)

    assert observed == predicted, (column, observed, predicted)
    # Z-order bounds BOTH columns per file: a narrow range on either
    # one must skip a substantial share of the corpus (the sharp
    # second-column claim lives in the lexicographic comparison below).
    assert predicted <= (total * 6) // 10, (column, predicted, total)


def test_zorder_prunes_second_column_where_lexicographic_cannot(spark, zorder_layouts):
    zpath, lpath, _, n_events = zorder_layouts
    lo, hi = n_events // 2, n_events // 2 + max(n_events // 50, 1)
    z_surv = _predicted_surviving(spark, _parquet_files(zpath), "event_id", lo, hi)
    l_surv = _predicted_surviving(spark, _parquet_files(lpath), "event_id", lo, hi)
    l_total = sum(
        r.n_rows
        for r in parquet_rowgroup_stats(spark, _parquet_files(lpath), "event_id").collect()
    )
    # Lexicographic-on-user_id leaves event_id unclustered: footers
    # span everything, nothing is prunable. Z-order prunes most of it.
    assert l_surv == l_total
    assert z_surv < l_surv // 2


# --- K14: the Bloom-prune loop (bitmap prediction == executed filter) ------

def test_bloom_prune_observed_matches_bitmap_prediction(spark, sf_dir):
    """Close the K14 loop the way K38's tests close row-group pruning:
    predict the surviving fact rows FROM THE BITMAP (probe each
    distinct key once, weight by multiplicity) and assert the executed
    per-row pruned scan delivers exactly that count — plus the two
    semantic bounds: no false negatives (every true join key survives)
    and a false-positive rate within 3x the m/k geometry bound."""
    import math

    from data_frame_demo_etl_spark.operators.bloom import (
        bloom_prune,
        build_bloom_words,
        might_contain,
    )

    m_bits, k = 1 << 16, 5
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#23")
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey")

    words = build_bloom_words(part, "p_partkey", m_bits=m_bits, k=k)
    keys = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    predicted = (
        keys.filter(might_contain(words, F.col("l_partkey"), m_bits=m_bits, k=k))
        .agg(F.sum("n"))
        .collect()[0][0]
    )

    observed = bloom_prune(li, "l_partkey", part, "p_partkey", m_bits=m_bits, k=k).count()
    assert observed == predicted, (observed, predicted)

    # no false negatives: every row whose key truly joins dim survives
    true_rows = li.join(part.select(F.col("p_partkey").alias("l_partkey")).distinct(),
                        "l_partkey", "semi").count()
    assert observed >= true_rows

    # false positives bounded by the geometry: p = (1 - e^{-kn/m})^k
    n_members = part.select("p_partkey").distinct().count()
    fp_bound = (1.0 - math.exp(-k * n_members / m_bits)) ** k
    nonmember_rows = li.count() - true_rows
    if nonmember_rows > 0:
        assert (observed - true_rows) / nonmember_rows <= max(3 * fp_bound, 1e-3), (
            observed, true_rows, nonmember_rows, fp_bound
        )
