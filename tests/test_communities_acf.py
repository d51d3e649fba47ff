"""Planted-structure tests for the round-9 additions: label-propagation
communities (G5) and per-key autocorrelation (K39)."""

from __future__ import annotations

import math

from data_frame_demo_etl_spark.analytics.communities import (
    label_propagation,
    supplier_communities,
)
from data_frame_demo_etl_spark.analytics.timeseries import (
    events_user_acf,
    per_key_acf,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _clique(nodes):
    return [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]


def test_lpa_two_cliques_one_bridge(spark):
    # Two K4 cliques joined by a single bridge edge: LPA must keep
    # them as two communities (connected components would merge them).
    a, b = [1, 2, 3, 4], [10, 11, 12, 13]
    e = _edges(spark, _clique(a) + _clique(b) + [(4, 10)])
    got = {r.node: r.label for r in label_propagation(e).collect()}
    assert {got[n] for n in a} == {1}
    assert {got[n] for n in b} == {10}


def test_lpa_single_clique_collapses_to_min(spark):
    e = _edges(spark, _clique([5, 6, 7, 8, 9]))
    got = {r.node: r.label for r in label_propagation(e).collect()}
    assert set(got.values()) == {5}


def test_lpa_deterministic_tie_break(spark):
    # Path 1-2-3: round 1 gives l(1)=2, l(2)=1 (min of {1,3}), l(3)=2;
    # fixed synchronous rounds are deterministic — two runs agree.
    e = _edges(spark, [(1, 2), (2, 3)])
    r1 = sorted(map(tuple, label_propagation(e).collect()))
    r2 = sorted(map(tuple, label_propagation(e).collect()))
    assert r1 == r2


def test_supplier_communities_gate_shape(spark, sf_dir):
    out = supplier_communities(spark, sf_dir)
    assert out.columns == ["supplier", "community", "n_members"]
    rows = out.collect()
    # Each community's size column must equal its actual member count,
    # and sizes must sum back to the node count.
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.community, []).append(r)
    for label, members in by_label.items():
        assert all(m.n_members == len(members) for m in members)
    assert sum(len(m) for m in by_label.values()) == len(rows)


def _acf_df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double")


def test_acf_alternating_series_exact(spark):
    # x = +1,-1,... (n=8): mu=0, den=8; r_l = sign * (n-l)/n.
    rows = [(1, t, t, 1.0 if t % 2 == 0 else -1.0) for t in range(8)]
    out = per_key_acf(_acf_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 8
    assert r.acf1_ppm == math.floor(-7 / 8 * 1e6 + 0.5)
    assert r.acf2_ppm == math.floor(6 / 8 * 1e6 + 0.5)
    assert r.acf3_ppm == math.floor(-5 / 8 * 1e6 + 0.5)


def test_acf_constant_series_is_null(spark):
    rows = [(2, t, t, 5.0) for t in range(10)]
    r = per_key_acf(_acf_df(spark, rows)).collect()[0]
    assert r.acf1_ppm is None and r.acf2_ppm is None and r.acf3_ppm is None


def test_acf_min_events_filter(spark):
    rows = [(3, t, t, float(t)) for t in range(7)]  # 7 < ACF_MIN_EVENTS
    assert per_key_acf(_acf_df(spark, rows)).count() == 0


def test_acf_order_is_ts_then_event_id(spark):
    # Same alternating series delivered with shuffled row order and a
    # ts tie on every pair — (ts, event_id) must reconstruct it.
    vals = [1.0 if t % 2 == 0 else -1.0 for t in range(8)]
    rows = [(4, t // 2, t, vals[t]) for t in range(8)]
    out = per_key_acf(_acf_df(spark, list(reversed(rows)))).collect()[0]
    assert out.acf1_ppm == math.floor(-7 / 8 * 1e6 + 0.5)


def test_events_user_acf_gate_shape(spark, sf_dir):
    out = events_user_acf(spark, sf_dir)
    assert out.columns == ["user_id", "n", "acf1_ppm", "acf2_ppm", "acf3_ppm"]
    rows = out.collect()
    assert all(r.n >= 8 for r in rows)
    assert all(
        r.acf1_ppm is None or -1_000_000 <= r.acf1_ppm <= 1_000_000 for r in rows
    )


# ──────────────── K40: type-pair correlation ────────────────


def _corr_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_type_correlation_planted(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import type_pair_correlation

    base = dt.datetime(2024, 1, 1)
    rows = []
    # per hour h: A sums to h+1, B to 2(h+1) (perfect +corr), C to 8-h
    # (perfect anti-corr with A). One event per (hour, type).
    for h in range(8):
        ts = base + dt.timedelta(hours=h, minutes=5)
        rows += [
            (h * 3, ts, 1, "A", float(h + 1)),
            (h * 3 + 1, ts, 1, "B", float(2 * (h + 1))),
            (h * 3 + 2, ts, 1, "C", float(8 - h)),
        ]
    out = {(r.ta, r.tb): r.corr_ppm for r in type_pair_correlation(_corr_events(spark, rows)).collect()}
    assert out[("A", "B")] == 1_000_000
    assert out[("A", "C")] == -1_000_000
    assert out[("B", "C")] == -1_000_000


def test_type_correlation_constant_is_null_and_dense_zero(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import type_pair_correlation

    base = dt.datetime(2024, 1, 1)
    rows = []
    # D constant 5.0 every hour; E present only in hour 0 — the dense
    # spine must zero-fill E's other hours, not drop them.
    for h in range(4):
        rows.append((h * 2, base + dt.timedelta(hours=h), 1, "D", 5.0))
    rows.append((100, base, 1, "E", 3.0))
    out = {(r.ta, r.tb): (r.n_hours, r.corr_ppm) for r in type_pair_correlation(_corr_events(spark, rows)).collect()}
    n, corr = out[("D", "E")]
    assert n == 4          # E zero-filled on D's spine
    assert corr is None    # D has zero variance


# ──────────────── K42: Mann–Whitney U ────────────────


def test_mannwhitney_complete_separation(spark):
    import math

    from data_frame_demo_etl_spark.analytics.quality_audit import mannwhitney_u

    # arm A (even users): values 1,2,3; arm B (odd): 10,20,30 — A is
    # stochastically smaller, U_A = 0.
    rows = [
        (0, None, 0, "X", 1.0), (1, None, 2, "X", 2.0), (2, None, 4, "X", 3.0),
        (3, None, 1, "X", 10.0), (4, None, 3, "X", 20.0), (5, None, 5, "X", 30.0),
    ]
    import datetime as dt
    rows = [(eid, dt.datetime(2024, 1, 1), uid, t, v) for eid, _, uid, t, v in rows]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = mannwhitney_u(df).collect()[0]
    assert (r.n_a, r.n_b, r.u2_a) == (3, 3, 0)
    z = (0 - 9.0) / math.sqrt(9.0 * 7.0 / 3.0)
    assert r.z_micro == math.floor(z * 1e6 + 0.5)


def test_mannwhitney_all_tied_is_null(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.quality_audit import mannwhitney_u

    rows = [(i, dt.datetime(2024, 1, 1), i, "Y", 5.0) for i in range(8)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = mannwhitney_u(df).collect()[0]
    assert r.z_micro is None  # zero variance: every value tied


def test_mannwhitney_u_symmetry(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.analytics.quality_audit import mannwhitney_u

    rows = [
        (i, dt.datetime(2024, 1, 1), i, "Z", float(v))
        for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6, 5, 3])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    a = mannwhitney_u(df).collect()[0]
    b = mannwhitney_u(df, group_col_expr=F.col("user_id") % 2 == 1).collect()[0]
    # U_A + U_B = n_a * n_b  (doubled: u2_a + u2_b = 2 n_a n_b)
    assert a.u2_a + b.u2_a == 2 * a.n_a * a.n_b


# ──────────────── K43: Kolmogorov–Smirnov two-sample ────────────────


def _ks_df(spark, a_vals, b_vals):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1), 2 * i, "X", float(v))
        for i, v in enumerate(a_vals)
    ] + [
        (1000 + i, dt.datetime(2024, 1, 1), 2 * i + 1, "X", float(v))
        for i, v in enumerate(b_vals)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_ks_complete_separation(spark):
    import math

    from data_frame_demo_etl_spark.analytics.quality_audit import ks_two_sample

    # disjoint supports → D = 1 exactly
    r = ks_two_sample(_ks_df(spark, [1, 2, 3], [10, 20, 30])).collect()[0]
    assert (r.n_a, r.n_b, r.d_ppm) == (3, 3, 1_000_000)
    lam = 1.0 * math.sqrt(9.0 / 6.0)
    assert r.lambda_micro == math.floor(lam * 1e6 + 0.5)


def test_ks_identical_distributions(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import ks_two_sample

    # same multiset in each arm (ties included) → CDFs coincide, D = 0
    r = ks_two_sample(_ks_df(spark, [1, 1, 2, 7], [1, 1, 2, 7])).collect()[0]
    assert (r.d_ppm, r.lambda_micro) == (0, 0)


def test_ks_hand_computed_with_ties(spark):
    import math

    from data_frame_demo_etl_spark.analytics.quality_audit import ks_two_sample

    # A={1,2,2,5}, B={2,3,5,7}: cumA=1,3,3,4,4 / cumB=0,1,2,3,4 at the
    # pooled distinct values → dev=4·|cumA−cumB| peaks at 8 → D=0.5
    r = ks_two_sample(_ks_df(spark, [1, 2, 2, 5], [2, 3, 5, 7])).collect()[0]
    assert (r.n_a, r.n_b, r.d_ppm) == (4, 4, 500_000)
    lam = 0.5 * math.sqrt(16.0 / 8.0)
    assert r.lambda_micro == math.floor(lam * 1e6 + 0.5)


def test_ks_empty_arm_is_null(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.quality_audit import ks_two_sample

    rows = [(i, dt.datetime(2024, 1, 1), 2 * i, "X", float(i)) for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = ks_two_sample(df).collect()[0]
    assert (r.n_a, r.n_b) == (5, 0)
    assert r.d_ppm is None and r.lambda_micro is None


# ──────────────── K44: Spearman rank correlation ────────────────


def test_spearman_perfect_monotone(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import spearman_rank_corr

    # y = x^3 is a nonlinear but perfectly monotone map → ρ = 1
    df = spark.createDataFrame([(x, x**3) for x in range(1, 9)], "x long, y long")
    r = spearman_rank_corr(df, "x", "y").collect()[0]
    assert (r.n_pairs, r.rho_micro) == (8, 1_000_000)


def test_spearman_perfect_antitone(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import spearman_rank_corr

    df = spark.createDataFrame([(x, -(x**3)) for x in range(1, 9)], "x long, y long")
    r = spearman_rank_corr(df, "x", "y").collect()[0]
    assert r.rho_micro == -1_000_000


def test_spearman_hand_computed_with_ties(spark):
    import math

    from data_frame_demo_etl_spark.analytics.quality_audit import spearman_rank_corr

    # x = [1,1,2,3], y = [10,20,20,30]: midranks
    #   rx = 1.5, 1.5, 3, 4 ; ry = 1, 2.5, 2.5, 4
    xs = [1, 1, 2, 3]
    ys = [10, 20, 20, 30]
    rx = [1.5, 1.5, 3, 4]
    ry = [1, 2.5, 2.5, 4]
    n = 4
    num = n * sum(a * b for a, b in zip(rx, ry)) - sum(rx) * sum(ry)
    den = math.sqrt(n * sum(a * a for a in rx) - sum(rx) ** 2) * math.sqrt(
        n * sum(b * b for b in ry) - sum(ry) ** 2
    )
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    r = spearman_rank_corr(df, "x", "y").collect()[0]
    assert abs(r.rho_micro / 1e6 - num / den) < 2e-6


def test_spearman_zero_variance_is_null(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import spearman_rank_corr

    df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "x long, y long")
    r = spearman_rank_corr(df, "x", "y").collect()[0]
    assert r.rho_micro is None


# ──────────────── K47: chi-square independence ────────────────


def test_chisq_independent_table_is_zero(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import chisq_independence

    # perfectly proportional 2x2 (counts 10/20 in both rows) → χ² = 0
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20 + [("b", "x")] * 10 + [("b", "y")] * 20
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = chisq_independence(df, "r", "c").collect()[0]
    assert (out.n, out.dof) == (60, 1)
    assert out.chi2_micro == 0


def test_chisq_hand_computed_2x2(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import chisq_independence

    # table [[10, 0], [0, 10]]: complete association, χ² = n = 20
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = chisq_independence(df, "r", "c").collect()[0]
    assert (out.n, out.r_levels, out.c_levels, out.dof) == (20, 2, 2, 1)
    assert abs(out.chi2_micro - 20_000_000) <= 20  # grid truncation ≤ cells·n·1e-12
    # complete association → Cramér's V = 1 (within grid truncation)
    assert abs(out.cramers_v_micro - 1_000_000) <= 2
    # single-level column → dof 0, statistic NULL
    deg = chisq_independence(
        spark.createDataFrame([("a", "x"), ("b", "x")], "r string, c string"), "r", "c"
    ).collect()[0]
    assert deg.dof == 0 and deg.chi2_micro is None and deg.cramers_v_micro is None


# ──────────────── K48: mutual information ────────────────


def test_mi_independent_is_zero(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import mutual_information

    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20 + [("b", "x")] * 10 + [("b", "y")] * 20
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = mutual_information(df, "r", "c").collect()[0]
    assert out.mi_micro == 0
    # H(row): p = (1/2, 1/2) → ln 2
    import math
    assert abs(out.h_row_micro - math.floor(math.log(2) * 1e6 + 0.5)) <= 2


def test_mi_deterministic_relation_equals_entropy(spark):
    import math

    from data_frame_demo_etl_spark.analytics.quality_audit import mutual_information

    # Y = f(X), uniform over 4 classes → MI = H(X) = H(Y) = ln 4
    rows = [(str(i % 4), str((i % 4) * 10)) for i in range(40)]
    df = spark.createDataFrame(rows, "r string, c string")
    out = mutual_information(df, "r", "c").collect()[0]
    ln4 = math.floor(math.log(4) * 1e6 + 0.5)
    assert abs(out.mi_micro - ln4) <= 4
    assert abs(out.h_row_micro - ln4) <= 4 and abs(out.h_col_micro - ln4) <= 4


def test_mi_single_level_column(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import mutual_information

    df = spark.createDataFrame([("a", "x"), ("b", "x"), ("a", "x")], "r string, c string")
    out = mutual_information(df, "r", "c").collect()[0]
    assert out.mi_micro == 0 and out.h_col_micro == 0 and out.h_row_micro > 0


# ──────────────── K50: Welch's t-test ────────────────


def test_welch_hand_computed(spark):
    import datetime as dt
    import math

    from data_frame_demo_etl_spark.analytics.quality_audit import welch_t_test

    # arm A (even uid): 1,2,3,4 ; arm B (odd uid): 10,20,30
    a_vals, b_vals = [1, 2, 3, 4], [10, 20, 30]
    rows = [
        (i, dt.datetime(2024, 1, 1), 2 * i, "X", float(v)) for i, v in enumerate(a_vals)
    ] + [
        (100 + i, dt.datetime(2024, 1, 1), 2 * i + 1, "X", float(v))
        for i, v in enumerate(b_vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = welch_t_test(df).collect()[0]
    # hand-compute on the cent grid
    av = [v * 100 for v in a_vals]
    bv = [v * 100 for v in b_vals]
    na, nb = len(av), len(bv)
    va = (na * sum(x * x for x in av) - sum(av) ** 2) / (na * (na - 1))
    vb = (nb * sum(x * x for x in bv) - sum(bv) ** 2) / (nb * (nb - 1))
    sea, seb = va / na, vb / nb
    t = (sum(av) / na - sum(bv) / nb) / math.sqrt(sea + seb)
    dfree = (sea + seb) ** 2 / (sea**2 / (na - 1) + seb**2 / (nb - 1))
    assert (r.n_a, r.n_b) == (na, nb)
    assert r.t_micro == math.floor(t * 1e6 + 0.5)
    assert r.df_micro == math.floor(dfree * 1e6 + 0.5)


def test_welch_degenerate_small_arm_is_null(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.quality_audit import welch_t_test

    rows = [
        (1, dt.datetime(2024, 1, 1), 0, "X", 1.0),
        (2, dt.datetime(2024, 1, 1), 2, "X", 2.0),
        (3, dt.datetime(2024, 1, 1), 1, "X", 9.0),  # arm B has 1 row
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = welch_t_test(df).collect()[0]
    assert r.t_micro is None and r.df_micro is None


# ──────────────── K52: Wald–Wolfowitz runs test ────────────────


def _runs_df(spark, labs):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), 2 * i + (1 - l), "X", 1.0)
        for i, l in enumerate(labs)  # l=1 → even uid (arm A), l=0 → odd
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_runs_hand_computed(spark):
    import math

    from data_frame_demo_etl_spark.analytics.quality_audit import runs_test

    # sequence A A B B B A → 3 runs, nA=3, nB=3
    r = runs_test(_runs_df(spark, [1, 1, 0, 0, 0, 1])).collect()[0]
    assert (r.n, r.n_a, r.runs) == (6, 3, 3)
    n, two_ab = 6.0, 2.0 * 3 * 3
    e = 1.0 + two_ab / n
    var = (two_ab * (two_ab - n)) / (n * n * (n - 1.0))
    z = (3 - e) / math.sqrt(var)
    assert r.z_micro == math.floor(z * 1e6 + 0.5)


def test_runs_perfect_alternation_max_runs(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import runs_test

    labs = [1, 0] * 10
    r = runs_test(_runs_df(spark, labs)).collect()[0]
    assert r.runs == 20            # every adjacent pair switches
    assert r.z_micro > 0           # far MORE runs than random


def test_runs_fully_batched_min_runs(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import runs_test

    labs = [1] * 10 + [0] * 10
    r = runs_test(_runs_df(spark, labs)).collect()[0]
    assert r.runs == 2
    assert r.z_micro < 0           # far FEWER runs than random


def test_runs_single_arm_null(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import runs_test

    r = runs_test(_runs_df(spark, [1, 1, 1, 1])).collect()[0]
    assert r.z_micro is None


# ──────────────── K56: Lorenz curve deciles ────────────────


def test_lorenz_uniform_is_diagonal(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import lorenz_points

    # 10 keys with equal counts → L(p) = p exactly at every decile
    rows = [(k, i) for k in range(10) for i in range(7)]
    df = spark.createDataFrame(rows, "g long, i long")
    out = {r.decile: r for r in lorenz_points(df, "g").collect()}
    assert len(out) == 10
    for d in range(1, 11):
        assert out[d].pop_share_ppm == d * 100_000
        assert out[d].mass_share_ppm == d * 100_000


def test_lorenz_extreme_skew_hockey_stick(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import lorenz_points

    # 9 keys with 1 row, 1 key with 91 → bottom 90% of keys hold 9%
    rows = [(k, 0) for k in range(9)] + [(99, i) for i in range(91)]
    df = spark.createDataFrame(rows, "g long, i long")
    out = {r.decile: r for r in lorenz_points(df, "g").collect()}
    assert out[9].mass_share_ppm == 90_000     # 9/100
    assert out[10].mass_share_ppm == 1_000_000
    assert out[1].mass_share_ppm == 10_000     # 1/100


def test_cliffs_delta_complete_separation(spark):
    """Arm A strictly above arm B → δ = +1; swapped roles → −1."""
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.analytics.quality_audit import cliffs_delta

    rows = [("t", 2 * i, 10.0 + i) for i in range(4)] + [
        ("t", 2 * i + 1, 1.0 + i) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    r = cliffs_delta(df).collect()[0]
    assert (r.n_a, r.n_b, r.delta_ppm, r.magnitude) == (4, 4, 1_000_000, "large")
    flipped = cliffs_delta(df, group_col_expr=F.col("user_id") % 2 == 1).collect()[0]
    assert (flipped.delta_ppm, flipped.magnitude) == (-1_000_000, "large")


def test_cliffs_delta_ties_and_zero(spark):
    """All values tied → every pair is a tie → δ = 0, negligible."""
    from data_frame_demo_etl_spark.analytics.quality_audit import cliffs_delta

    rows = [("t", i, 5.0) for i in range(6)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    r = cliffs_delta(df).collect()[0]
    assert (r.delta_ppm, r.magnitude) == (0, "negligible")


def test_cliffs_delta_hand_computed_mixed(spark):
    """A = {1, 3}, B = {2}: pairs (1,2) a<b, (3,2) a>b → δ = 0;
    A = {3, 4}, B = {2}: both a>b → δ = 1 on a 2×1 grid."""
    from data_frame_demo_etl_spark.analytics.quality_audit import cliffs_delta

    rows = [("t", 0, 0.01), ("t", 2, 0.03), ("t", 1, 0.02)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    r = cliffs_delta(df).collect()[0]
    assert (r.n_a, r.n_b, r.delta_ppm) == (2, 1, 0)


def test_cliffs_delta_empty_arm_null(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import cliffs_delta

    rows = [("t", 0, 1.0), ("t", 2, 2.0)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    r = cliffs_delta(df).collect()[0]
    assert r.delta_ppm is None and r.magnitude is None


def test_bh_fdr_step_up_carries_weaker_test(spark):
    """The defining BH behavior: rank-1 (|z|=2.30) misses its own
    threshold z*(3,1)≈2.394 but rank-2 (|z|=2.20) clears z*(3,2)≈2.128,
    so k*=2 and BOTH are rejected; rank-3 stays."""
    from data_frame_demo_etl_spark.analytics.quality_audit import BH_Z_MICRO, bh_fdr

    assert BH_Z_MICRO[(3, 1)] > 2_300_000 > BH_Z_MICRO[(3, 2)]
    assert 2_200_000 > BH_Z_MICRO[(3, 2)] > 1_000_000
    df = spark.createDataFrame(
        [("t1", 2_300_000), ("t2", -2_200_000), ("t3", 1_000_000)],
        "key string, z_micro long",
    )
    got = [(r.key, r.rank, r.rejected) for r in bh_fdr(df, "key", "z_micro").collect()]
    assert got == [("t1", 1, True), ("t2", 2, True), ("t3", 3, False)]


def test_bh_fdr_none_pass(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import bh_fdr

    df = spark.createDataFrame(
        [("a", 100_000), ("b", -50_000)], "key string, z_micro long"
    )
    got = bh_fdr(df, "key", "z_micro").collect()
    assert all(not r.rejected for r in got)


def test_bh_fdr_null_z_excluded_from_family(spark):
    """A NULL z (degenerate test) must not inflate m: with it removed,
    m=1 and the single |z|=2.0 test clears z*(1,1)≈1.96."""
    from data_frame_demo_etl_spark.analytics.quality_audit import bh_fdr

    df = spark.createDataFrame(
        [("a", 2_000_000), ("b", None)], "key string, z_micro long"
    )
    got = [(r.key, r.rank, r.threshold_micro, r.rejected)
           for r in bh_fdr(df, "key", "z_micro").collect()]
    assert len(got) == 1
    assert got[0][0] == "a" and got[0][3] is True


def test_cvm_hand_computed_interleaved(spark):
    """A={1,3}, B={2}: U = 2·1 + 1·1 = 3, T = 3/6 − 7/18 = 1/9 →
    t_micro = 111111 (hand-walked through the doubled closed form)."""
    from data_frame_demo_etl_spark.analytics.quality_audit import cvm_two_sample

    rows = [("t", 0, 0.01), ("t", 2, 0.03), ("t", 1, 0.02)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    r = cvm_two_sample(df).collect()[0]
    assert (r.n_a, r.n_b, r.t_micro, r.significant_05) == (2, 1, 111_111, False)


def test_cvm_all_tied_equals_interleaved_ranks(spark):
    """A={1,1}, B={1}: every observation shares midrank 2 and the
    tie-exact closed form reproduces T = 1/9 — the same statistic as
    the interleaved case, as Anderson's midrank form requires."""
    from data_frame_demo_etl_spark.analytics.quality_audit import cvm_two_sample

    rows = [("t", 0, 0.01), ("t", 2, 0.01), ("t", 1, 0.01)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    r = cvm_two_sample(df).collect()[0]
    assert r.t_micro == 111_111


def test_cvm_complete_separation(spark):
    """A={1,2} below B={10,11}: U = 2·0 + 2·8 = 16,
    T = 16/16 − 15/24 = 0.375 → 375000 (the n=m=2 maximum)."""
    from data_frame_demo_etl_spark.analytics.quality_audit import cvm_two_sample

    rows = [("t", 0, 0.01), ("t", 2, 0.02), ("t", 1, 0.10), ("t", 3, 0.11)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    r = cvm_two_sample(df).collect()[0]
    assert (r.n_a, r.n_b, r.t_micro) == (2, 2, 375_000)


def test_cvm_empty_arm_null(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import cvm_two_sample

    rows = [("t", 0, 1.0), ("t", 2, 2.0)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    r = cvm_two_sample(df).collect()[0]
    assert r.t_micro is None and r.significant_05 is None
