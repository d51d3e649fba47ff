"""ML-evaluation family: ROC-AUC, Cohen's kappa, Gini stump, CUPED."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_auc_perfect_separation(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import roc_auc

    # positives all score above negatives → AUC = 1
    rows = [("k", 100 + i, True) for i in range(5)] + [
        ("k", i, False) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "key string, cents long, pos boolean")
    r = roc_auc(df, F.col("key"), F.col("pos"), F.col("cents")).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc_ppm) == (5, 5, 1_000_000)


def test_auc_ties_count_half(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import roc_auc

    # every score identical → AUC = exactly 1/2
    rows = [("k", 7, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "key string, cents long, pos boolean")
    r = roc_auc(df, F.col("key"), F.col("pos"), F.col("cents")).collect()[0]
    assert r.auc_ppm == 500_000


def test_auc_known_value(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import roc_auc

    # pos scores {3, 1}, neg scores {2, 0}: pairs won 3 of 4 → 0.75
    rows = [("k", 3, True), ("k", 1, True), ("k", 2, False), ("k", 0, False)]
    df = spark.createDataFrame(rows, "key string, cents long, pos boolean")
    r = roc_auc(df, F.col("key"), F.col("pos"), F.col("cents")).collect()[0]
    assert r.auc_ppm == 750_000


def test_kappa_perfect_and_chance(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import cohens_kappa

    # perfect agreement → κ = 1
    rows = [(True, True)] * 6 + [(False, False)] * 4
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    assert cohens_kappa(df, F.col("a"), F.col("b")).collect()[0].kappa_ppm == 1_000_000

    # independent raters at 50/50 → κ = 0 (exactly, by count algebra)
    rows = [(True, True), (True, False), (False, True), (False, False)] * 3
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    assert cohens_kappa(df, F.col("a"), F.col("b")).collect()[0].kappa_ppm == 0


def test_kappa_worse_than_chance_is_negative(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import cohens_kappa

    rows = [(True, False)] * 5 + [(False, True)] * 5
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    assert cohens_kappa(df, F.col("a"), F.col("b")).collect()[0].kappa_ppm < 0


def test_stump_finds_planted_threshold(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import gini_stump

    # labels flip exactly at 50: the best split must be cents = 50
    rows = [(i, False) for i in range(50)] + [(i, True) for i in range(50, 100)]
    df = spark.createDataFrame(rows, "cents long, pos boolean")
    out = gini_stump(df, F.col("pos"), F.col("cents")).collect()
    assert out[0].threshold_cents == 50
    assert out[0].gini_ppm == 0  # both sides pure
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]


def test_cuped_reduces_to_post_mean_when_theta_zero(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import cuped_adjusted_means

    # pre is CONSTANT → var(pre) = 0 → theta undefined → adj NULL,
    # post mean still exact
    rows = [("A", 10, 100), ("A", 10, 200), ("B", 10, 300), ("B", 10, 500)]
    df = spark.createDataFrame(rows, "arm string, pre_cents long, post_cents long")
    out = {r.arm: r for r in cuped_adjusted_means(df).collect()}
    assert out["A"].post_mean_micro == 150_000_000
    assert out["A"].theta_ppm is None and out["A"].adj_mean_micro is None


def test_cuped_removes_pre_period_bias(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import cuped_adjusted_means

    # post = pre exactly (theta = 1): arm A pre-biased high, arm B low.
    # Adjustment moves both arms' means toward the global mean by
    # exactly their pre-period offset → adjusted means equal.
    rows = [("A", 100, 100), ("A", 120, 120), ("B", 60, 60), ("B", 80, 80)]
    df = spark.createDataFrame(rows, "arm string, pre_cents long, post_cents long")
    out = {r.arm: r for r in cuped_adjusted_means(df).collect()}
    assert out["A"].theta_ppm == 1_000_000
    assert out["A"].adj_mean_micro == out["B"].adj_mean_micro == 90_000_000
    assert out["A"].post_mean_micro != out["B"].post_mean_micro


# ──────────────── K57–K59: JSD, transition entropy, Theil ────────────────


def test_jsd_identical_distributions_is_zero(spark):
    from data_frame_demo_etl_spark.analytics.drift import jsd_categorical

    a = spark.createDataFrame([("x",)] * 6 + [("y",)] * 4, "cat string")
    b = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "cat string")
    r = jsd_categorical(a, b, "cat").collect()[0]
    assert r.jsd_micro == 0 and r.n_categories == 2


def test_jsd_disjoint_distributions_is_ln2(spark):
    from data_frame_demo_etl_spark.analytics.drift import jsd_categorical

    a = spark.createDataFrame([("x",)] * 5, "cat string")
    b = spark.createDataFrame([("y",)] * 5, "cat string")
    r = jsd_categorical(a, b, "cat").collect()[0]
    assert abs(r.jsd_micro - 693_147) <= 1  # ln 2 on the micro grid


def test_jsd_symmetric(spark):
    from data_frame_demo_etl_spark.analytics.drift import jsd_categorical

    a = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, "cat string")
    b = spark.createDataFrame([("x",)] * 2 + [("y",)] * 8, "cat string")
    r1 = jsd_categorical(a, b, "cat").collect()[0]
    r2 = jsd_categorical(b, a, "cat").collect()[0]
    assert r1.jsd_micro == r2.jsd_micro > 0


def test_transition_entropy_deterministic_chain_is_zero(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.features import transition_entropy

    base = dt.datetime(2024, 1, 1)
    # A→B→A→B...: next is fully determined by prev → H(next|prev) = 0,
    # but the marginal over prev is uniform {A,B} → H(prev) = ln 2
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, "A" if i % 2 == 0 else "B", 1.0)
        for i in range(21)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = transition_entropy(df).collect()[0]
    assert r.h_cond_micro == 0
    assert abs(r.h_marginal_micro - 693_147) <= 2
    assert r.n_transitions == 20 and r.n_states == 2


def test_theil_uniform_counts_is_zero_and_skew_positive(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import theil_index

    uniform = spark.createDataFrame(
        [(k, i) for k in range(5) for i in range(10)], "k long, i long"
    )
    r = theil_index(uniform, "k").collect()[0]
    assert r.theil_micro == 0 and r.n_keys == 5 and r.n_rows == 50

    skew = spark.createDataFrame(
        [(0, i) for i in range(46)] + [(k, 0) for k in range(1, 5)], "k long, i long"
    )
    assert theil_index(skew, "k").collect()[0].theil_micro > 1_000_000  # > 1 nat


# ──────────── X15 / A12 / L22: RP recall, cohort LTV, RAKE ────────────


def test_rp_projection_preserves_scaled_norms_roughly(spark, sf_dir):
    from data_frame_demo_etl_spark.similarity.gate import embeddings_rp_recall

    rows = embeddings_rp_recall(spark, sf_dir).collect()
    assert len(rows) == 10 and [r.query_id for r in rows] == list(range(10))
    # On near-orthogonal synthetic vectors 64→16 JL keeps only part of
    # the (noise-thin) neighbor margin — the measured number IS the
    # point of the gate. Structural floor: some hit survives, every
    # count is in range, and the ppm grid is exact.
    assert sum(r.n_hit for r in rows) >= 1
    assert all(0 <= r.n_hit <= 5 for r in rows)
    assert all(r.recall_ppm == r.n_hit * 200_000 for r in rows)


def test_rp_matrix_deterministic(spark):
    from data_frame_demo_etl_spark.similarity.gate import rp_matrix

    a, b = rp_matrix(), rp_matrix()
    assert a == b and len(a) == 16 and len(a[0]) == 64


def test_cohort_ltv_planted(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.funnel import cohort_ltv

    # cust 1 first orders 2020 (100), again 2021 (50); cust 2 joins 2021 (30)
    rows = [
        (1, dt.date(2020, 3, 1), 100.0),
        (1, dt.date(2021, 5, 1), 50.0),
        (2, dt.date(2021, 7, 1), 30.0),
    ]
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate date, o_totalprice double")
    out = {(r.cohort_year, r.year_offset): r for r in cohort_ltv(df).collect()}
    assert out[(2020, 0)].revenue_cents == 10000
    assert out[(2020, 1)].cum_revenue_cents == 15000
    assert out[(2020, 1)].ltv_per_customer_micro == 150_000_000  # $150 for 1 cust
    assert out[(2021, 0)].cohort_customers == 1
    assert out[(2021, 0)].revenue_cents == 3000


def test_rake_scores_multiword_phrase_above_frequent_single(spark):
    from data_frame_demo_etl_spark.functions.keywords import rake_keywords

    # "deep learning" co-occurs as a phrase; "data" is frequent but
    # always alone → RAKE must rank the phrase first (degree effect).
    docs = spark.createDataFrame(
        [
            (1, "deep learning is the future of data"),
            (2, "deep learning and data"),
            (3, "data is data and data"),
        ],
        "doc_id long, text string",
    )
    out = rake_keywords(docs).collect()
    assert out[0].phrase == "deep learning"
    assert out[0].n_words == 2 and out[0].n_occurrences == 2
    single = {r.phrase: r for r in out}
    assert single["deep learning"].score_ppm > single["data"].score_ppm


def test_rake_stopwords_never_appear(spark):
    from data_frame_demo_etl_spark.functions.keywords import RAKE_STOPWORDS, rake_keywords

    docs = spark.createDataFrame(
        [(1, "the cat and the hat is on the mat")], "doc_id long, text string"
    )
    for r in rake_keywords(docs).collect():
        for w in r.phrase.split(" "):
            assert w not in RAKE_STOPWORDS


# ──────────── K60–K62 + E-CAL: CCF, calibration, ABC, migration ────────────


def test_ccf_detects_planted_lag(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import cross_correlation

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # views pulse on even hours; purchases mirror the pulse 2h later →
    # CCF must peak at lag 2
    for h in range(48):
        n_views = 10 if h % 2 == 0 else 1
        for _ in range(n_views):
            rows.append((eid, base + dt.timedelta(hours=h), eid, "view", 1.0)); eid += 1
        n_buys = 10 if (h - 2) % 2 == 0 else 1
        for _ in range(n_buys):
            rows.append((eid, base + dt.timedelta(hours=h), eid, "purchase", 1.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.lag: r.corr_ppm for r in cross_correlation(df, "view", "purchase").collect()}
    assert out[2] == max(out.values()) and out[2] > 900_000
    assert out[1] < 0  # anti-phase at odd lag


def test_calibration_monotone_on_perfect_scorer(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import calibration_curve
    from pyspark.sql import functions as F

    # label = cents >= 50: low bins pure negative, high bins pure positive
    rows = [(i,) for i in range(100)]
    df = spark.createDataFrame(rows, "cents long").withColumn(
        "pos", F.col("cents") >= 50
    )
    out = calibration_curve(df, F.col("pos"), F.col("cents")).collect()
    assert [r.bin for r in out] == list(range(10))
    rates = [r.positive_rate_ppm for r in out]
    assert rates[:5] == [0] * 5 and rates[5:] == [1_000_000] * 5
    assert sum(r.n for r in out) == 100
    assert out[0].mean_score_micro == 45_000  # mean(0..9) = 4.5 cents


def test_abc_planted_pareto(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import abc_classification
    from pyspark.sql import functions as F

    # one whale (800), three mid (50 each), six minnows (~8.33 each)
    rows = [(0, 800)] + [(k, 50) for k in (1, 2, 3)] + [
        (k, 9) for k in range(4, 10)
    ]
    df = spark.createDataFrame(rows, "k long, cents long")
    out = {r.abc_class: r for r in abc_classification(df, "k", F.col("cents")).collect()}
    # total = 1004; whale cum 800/1004 = 79.7% ≤ 80% → A alone
    assert out["A"].n_keys == 1 and out["A"].revenue_cents == 800
    # next: 850/1004=84.7% (B), 900/1004=89.6% (B), 950/1004=94.6% (B)
    assert out["B"].n_keys == 3
    assert out["C"].n_keys == 6
    assert sum(r.revenue_share_ppm for r in out.values()) >= 999_997  # ppm floors


def test_rfm_migration_square_and_conserves_customers(spark, sf_dir):
    from data_frame_demo_etl_spark.analytics.features import rfm_migration
    from data_frame_demo_etl_spark.sources.catalog import load_table

    orders = load_table(spark, "orders", sf_dir)
    out = rfm_migration(orders).collect()
    assert all(1 <= r.m_before <= 5 and 1 <= r.m_after <= 5 for r in out)
    total = sum(r.n_customers for r in out)
    assert total > 0
    assert sum(r.share_ppm for r in out) <= 1_000_000  # integral floors
    # quintiles are balanced within ±1 in each margin
    from collections import Counter
    before = Counter()
    for r in out:
        before[r.m_before] += r.n_customers


def test_ap_perfect_ranking(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import average_precision

    # all positives above all negatives → AP = 1 regardless of skew
    rows = [("k", 100 + i, True) for i in range(3)] + [
        ("k", i, False) for i in range(97)
    ]
    df = spark.createDataFrame(rows, "key string, cents long, pos boolean")
    r = average_precision(df, F.col("key"), F.col("pos"), F.col("cents")).collect()[0]
    assert (r.n_pos, r.n_neg, r.ap_ppm) == (3, 97, 1_000_000)
    assert r.prevalence_ppm == 30_000  # 3/100


def test_ap_known_value_with_ties(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import average_precision

    # hand-computed (sklearn step-sum with tie blocks):
    # v=3: t=1,p=1 → P=1/1, term q = 1·1·1e6 div 1 = 1_000_000
    # v=2: t=2,p=1 → N≥=3, TP≥=2, q = 1·2·1e6 div 3 = 666_666
    # v=1: t=3,p=0 → q = 0
    # ap_ppm = (1_666_666) div 2 = 833_333
    rows = (
        [("k", 3, True)]
        + [("k", 2, True), ("k", 2, False)]
        + [("k", 1, False)] * 3
    )
    df = spark.createDataFrame(rows, "key string, cents long, pos boolean")
    r = average_precision(df, F.col("key"), F.col("pos"), F.col("cents")).collect()[0]
    assert (r.n_pos, r.n_neg, r.ap_ppm) == (2, 4, 833_333)


def test_ap_rare_positive_beats_auc_intuition(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import average_precision, roc_auc

    # 1 positive ranked 11th of 1000: ROC-AUC looks great (~0.99) but
    # AP collapses toward prevalence — the exact failure mode AP is
    # here to expose. AP = P@11 = 1/11 → 90_909 ppm.
    rows = [("k", 2000 - i, False) for i in range(10)] + [("k", 500, True)] + [
        ("k", 400 - i, False) for i in range(989)
    ]
    df = spark.createDataFrame(rows, "key string, cents long, pos boolean")
    ap = average_precision(df, F.col("key"), F.col("pos"), F.col("cents")).collect()[0]
    auc = roc_auc(df, F.col("key"), F.col("pos"), F.col("cents")).collect()[0]
    assert ap.ap_ppm == 90_909
    assert auc.auc_ppm > 950_000  # same data, flattering ROC view


def test_ap_worst_case_positive_at_bottom(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import average_precision

    # single positive ranked dead last of 4 → AP = 1/4
    rows = [("k", 4, False), ("k", 3, False), ("k", 2, False), ("k", 1, True)]
    df = spark.createDataFrame(rows, "key string, cents long, pos boolean")
    r = average_precision(df, F.col("key"), F.col("pos"), F.col("cents")).collect()[0]
    assert r.ap_ppm == 250_000


def test_brier_hand_computed_decomposition(spark):
    """4 rows, 2 bins, bin-constant forecasts — the Murphy identity
    BS = REL − RES + UNC holds exactly. Hand-walked:
    cents {0,0,10,10}, labels {F,F,T,F} → f ∈ {0, 1e6},
    BS = 1/4 → 250e9 ppm²; REL = 0.125 → 125e9; RES = 0.0625 → 62.5e9;
    UNC = 0.25·0.75 → 187.5e9."""
    from data_frame_demo_etl_spark.analytics.ml_eval import brier_decomposition

    rows = [("a", 0, False), ("b", 0, False), ("c", 10, True), ("d", 10, False)]
    df = spark.createDataFrame(rows, "id string, cents long, pos boolean")
    r = brier_decomposition(df, F.col("pos"), F.col("cents"), n_bins=2).collect()[0]
    assert (r.n, r.n_pos, r.base_rate_ppm) == (4, 1, 250_000)
    assert r.bs_ppm2 == 250_000_000_000
    assert r.reliability_ppm2 == 125_000_000_000
    assert r.resolution_ppm2 == 62_500_000_000
    assert r.uncertainty_ppm2 == 187_500_000_000
    assert r.bs_ppm2 == r.reliability_ppm2 - r.resolution_ppm2 + r.uncertainty_ppm2


def test_brier_perfect_forecast(spark):
    """Scores already equal the outcome (0 → F at lo, hi → T):
    BS = 0, REL = 0, RES = UNC (perfect discrimination)."""
    from data_frame_demo_etl_spark.analytics.ml_eval import brier_decomposition

    rows = [("a", 0, False), ("b", 0, False), ("c", 100, True), ("d", 100, True)]
    df = spark.createDataFrame(rows, "id string, cents long, pos boolean")
    r = brier_decomposition(df, F.col("pos"), F.col("cents"), n_bins=2).collect()[0]
    assert r.bs_ppm2 == 0
    assert r.reliability_ppm2 == 0
    assert r.resolution_ppm2 == r.uncertainty_ppm2 == 250_000_000_000


def test_lift_hand_computed(spark):
    """20 rows, scores 19..0 (cents), positives at the top 4 scores.
    Deciles = 2 rows each; gains: decile 0 captures 2/4, decile 1 all
    4; lift at decile 0 = (2/2)/(4/20) = 5.0."""
    from data_frame_demo_etl_spark.analytics.ml_eval import lift_table

    rows = [("r%d" % i, 19 - i, i < 4) for i in range(20)]
    df = spark.createDataFrame(rows, "id string, cents long, pos boolean")
    out = {r.decile: r for r in lift_table(df, F.col("pos"), F.col("cents")).collect()}
    assert len(out) == 10
    d0, d1, d9 = out[0], out[1], out[9]
    assert (d0.n_rows, d0.n_pos, d0.cum_pos) == (2, 2, 2)
    assert d0.gain_ppm == 500_000
    assert d0.lift_ppm == 5_000_000
    assert (d1.cum_pos, d1.gain_ppm) == (4, 1_000_000)
    # lift decays to exactly 1.0 on the full population
    assert (d9.cum_rows, d9.lift_ppm) == (20, 1_000_000)


def test_lift_tie_block_stays_whole(spark):
    """All 10 rows share one score → a single tie block lands whole in
    decile 0 (start position 0) and later deciles are absent."""
    from data_frame_demo_etl_spark.analytics.ml_eval import lift_table

    rows = [("r%d" % i, 7, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "id string, cents long, pos boolean")
    out = lift_table(df, F.col("pos"), F.col("cents")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.decile, r.n_rows, r.n_pos, r.gain_ppm, r.lift_ppm) == (
        0, 10, 5, 1_000_000, 1_000_000,
    )


def test_mcnemar_hand_computed(spark):
    """b=5, c=1 discordant: χ² = (|5−1|−1)²/(5+1) = 9/6 = 1.5 →
    1_500_000 micro (Edwards continuity correction)."""
    from data_frame_demo_etl_spark.analytics.ml_eval import mcnemar_test

    rows = (
        [("r", True, True)] * 2
        + [("r", True, False)] * 5
        + [("r", False, True)] * 1
        + [("r", False, False)] * 2
    )
    df = spark.createDataFrame(rows, "id string, a boolean, b boolean")
    r = mcnemar_test(df, F.col("a"), F.col("b")).collect()[0]
    assert (r.n, r.n_both, r.b_only, r.c_only) == (10, 2, 5, 1)
    assert r.chi2_micro == 1_500_000


def test_mcnemar_symmetric_and_degenerate(spark):
    from data_frame_demo_etl_spark.analytics.ml_eval import mcnemar_test

    # b == c → |b−c|−1 = −1 clamps to 0 → χ² = 0 (perfectly symmetric)
    rows = [("r", True, False)] * 3 + [("r", False, True)] * 3
    df = spark.createDataFrame(rows, "id string, a boolean, b boolean")
    assert mcnemar_test(df, F.col("a"), F.col("b")).collect()[0].chi2_micro == 0
    # no disagreement at all → NULL (test undefined)
    rows2 = [("r", True, True)] * 4
    df2 = spark.createDataFrame(rows2, "id string, a boolean, b boolean")
    assert mcnemar_test(df2, F.col("a"), F.col("b")).collect()[0].chi2_micro is None


def test_pr_curve_hand_computed(spark):
    """Same planted frame as the lift test (20 rows, scores 19..0,
    positives at the top 4): decile 0 keeps 2 rows, both positive →
    precision 1.0, recall 2/4 = 0.5, F1 = 2·2/(2+4) = 2/3; decile 1
    keeps 4/4 positives in 4 rows → precision 1.0, recall 1.0, F1 1.0;
    decile 9 (full population) → precision 4/20 = 0.2, recall 1.0,
    F1 = 2·4/(20+4) = 1/3."""
    from data_frame_demo_etl_spark.analytics.ml_eval import pr_curve_table

    rows = [("r%d" % i, 19 - i, i < 4) for i in range(20)]
    df = spark.createDataFrame(rows, "id string, cents long, pos boolean")
    out = {r.decile: r for r in pr_curve_table(df, F.col("pos"), F.col("cents")).collect()}
    assert len(out) == 10
    d0, d1, d9 = out[0], out[1], out[9]
    assert (d0.cum_rows, d0.cum_pos) == (2, 2)
    assert (d0.precision_ppm, d0.recall_ppm, d0.f1_ppm) == (1_000_000, 500_000, 666_666)
    assert (d1.precision_ppm, d1.recall_ppm, d1.f1_ppm) == (1_000_000, 1_000_000, 1_000_000)
    assert (d9.cum_rows, d9.precision_ppm, d9.recall_ppm, d9.f1_ppm) == (
        20, 200_000, 1_000_000, 333_333,
    )


def test_pr_curve_no_positives_null_recall(spark):
    """P = 0 → recall/f1 NULL, precision still defined (0)."""
    from data_frame_demo_etl_spark.analytics.ml_eval import pr_curve_table

    rows = [("r%d" % i, i, False) for i in range(10)]
    df = spark.createDataFrame(rows, "id string, cents long, pos boolean")
    out = pr_curve_table(df, F.col("pos"), F.col("cents")).collect()
    assert all(r.recall_ppm is None and r.f1_ppm is None for r in out)
    assert all(r.precision_ppm == 0 for r in out)


def test_ndcg_hand_computed(spark):
    """One user, 3 events: value ranking puts rel [2,0,1] at ranks
    1..3 → DCG = 2·w₁ + 1·w₃; ideal is [2,1,0] → IDCG = 2·w₁ + 1·w₂."""
    from data_frame_demo_etl_spark.analytics.ml_eval import NDCG_WEIGHTS, ndcg_by_key

    rows = [(1, 1, 2, 500), (1, 2, 0, 400), (1, 3, 1, 300)]
    df = spark.createDataFrame(rows, "u long, eid long, rel long, cents long")
    out = ndcg_by_key(
        df, F.lit("all"), F.col("u"), F.col("rel"), F.col("cents"), F.col("eid")
    ).collect()
    assert len(out) == 1
    dcg = 2 * NDCG_WEIGHTS[0] + 1 * NDCG_WEIGHTS[2]
    idcg = 2 * NDCG_WEIGHTS[0] + 1 * NDCG_WEIGHTS[1]
    assert out[0].n_groups == 1
    assert out[0].mean_ndcg_ppm == dcg * 1_000_000 // idcg == 950_234


def test_ndcg_perfect_ranking_and_zero_rel_excluded(spark):
    """User 1's value order matches relevance → ndcg 10⁶ exactly;
    user 2 has no relevant rows (IDCG 0) → excluded from the mean."""
    from data_frame_demo_etl_spark.analytics.ml_eval import ndcg_by_key

    rows = [(1, 1, 2, 900), (1, 2, 1, 800), (1, 3, 0, 100),
            (2, 4, 0, 500), (2, 5, 0, 400)]
    df = spark.createDataFrame(rows, "u long, eid long, rel long, cents long")
    out = ndcg_by_key(
        df, F.lit("all"), F.col("u"), F.col("rel"), F.col("cents"), F.col("eid")
    ).collect()
    assert (out[0].n_groups, out[0].mean_ndcg_ppm) == (1, 1_000_000)
