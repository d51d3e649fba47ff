"""K45 — 2-D Pareto frontier (skyline): planted-geometry tests."""

from data_frame_demo_etl_spark.analytics.skyline import pareto_frontier_2d


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, x long, y long")


def test_staircase_frontier(spark):
    # frontier is the strict staircase; interior points dominated
    rows = [
        (1, 1, 9),   # frontier
        (2, 3, 5),   # frontier
        (3, 6, 2),   # frontier
        (4, 3, 7),   # dominated by (3,5)
        (5, 7, 2),   # dominated by (6,2): smaller x, equal y
        (6, 6, 9),   # dominated by (3,5) and (6,2)
    ]
    out = pareto_frontier_2d(_pts(spark, rows), "x", "y", ["id"]).collect()
    assert sorted(r.id for r in out) == [1, 2, 3]


def test_duplicate_frontier_points_all_kept(spark):
    # an exact tie in BOTH criteria is not strict anywhere → no dominance
    rows = [(1, 2, 2), (2, 2, 2), (3, 5, 1), (4, 2, 3)]
    out = pareto_frontier_2d(_pts(spark, rows), "x", "y", ["id"]).collect()
    assert sorted(r.id for r in out) == [1, 2, 3]


def test_equal_one_dim_strict_other_dominates(spark):
    # (2,5) vs (2,3): same x, strictly larger y → dominated
    rows = [(1, 2, 3), (2, 2, 5)]
    out = pareto_frontier_2d(_pts(spark, rows), "x", "y", ["id"]).collect()
    assert [r.id for r in out] == [1]


def test_single_point_and_empty(spark):
    assert pareto_frontier_2d(_pts(spark, [(1, 4, 4)]), "x", "y", ["id"]).count() == 1
    assert pareto_frontier_2d(_pts(spark, []), "x", "y", ["id"]).count() == 0


# ──────────────── V8: functional-dependency g3 audit ────────────────


def test_fd_audit_planted(spark):
    from data_frame_demo_etl_spark.operators.validate import fd_audit

    rows = [
        # a → b holds exactly; a → c violated by one row in group 1
        (1, "x", "p"),
        (1, "x", "p"),
        (1, "x", "q"),   # the one c-violation in group a=1
        (2, "y", "r"),
        (2, "y", "r"),
        (None, "z", "s"),  # null lhs excluded
    ]
    df = spark.createDataFrame(rows, "a long, b string, c string")
    out = {(r.lhs, r.rhs): r for r in fd_audit(df, [("a", "b"), ("a", "c")]).collect()}
    holds = out[("a", "b")]
    assert (holds.n_groups, holds.n_rows, holds.violations, holds.g3_ppm) == (2, 5, 0, 0)
    viol = out[("a", "c")]
    assert (viol.n_groups, viol.n_rows, viol.violations) == (2, 5, 1)
    assert viol.g3_ppm == 1_000_000 // 5


def test_fd_audit_empty_input(spark):
    from data_frame_demo_etl_spark.operators.validate import fd_audit

    df = spark.createDataFrame([], "a long, b string")
    r = fd_audit(df, [("a", "b")]).collect()[0]
    assert (r.n_groups, r.n_rows, r.violations, r.g3_ppm) == (0, 0, 0, None)


# ──────────────── G6: multi-source BFS hop distance ────────────────


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_bfs_path_graph_caps_at_max_hops(spark):
    from data_frame_demo_etl_spark.analytics.bfs import bfs_hops

    # path 1-2-3-4-5-6, seed {1}, max 3 hops → 5 and 6 unreached
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    out = {r.node: r.hops for r in bfs_hops(e, _seeds(spark, [1]), 3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_min_distance_over_diamond(spark):
    from data_frame_demo_etl_spark.analytics.bfs import bfs_hops

    # 1→2→4 and 1→3→4 plus long way 1→5→6→4: node 4 is at hops 2
    e = _edges(spark, [(1, 2), (2, 4), (1, 3), (3, 4), (1, 5), (5, 6), (6, 4)])
    out = {r.node: r.hops for r in bfs_hops(e, _seeds(spark, [1]), 3).collect()}
    assert out[4] == 2 and out[6] == 2


def test_bfs_multi_source_takes_nearest_seed(spark):
    from data_frame_demo_etl_spark.analytics.bfs import bfs_hops

    # path 1-2-3-4-5, seeds {1, 5}: 3 is 2 from both, 4 is 1 from 5
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out = {r.node: r.hops for r in bfs_hops(e, _seeds(spark, [1, 5]), 3).collect()}
    assert out == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


# ──────────────── X13: hard-negative mining ────────────────


def test_hard_negatives_exclude_same_label(spark):
    from data_frame_demo_etl_spark.similarity.ann import hard_negative_topk

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.99, 0.14], 0),   # same label: must NOT appear
            (2, [0.9, 0.43], 1),    # nearest other-label
            (3, [0.0, 1.0], 1),     # orthogonal other-label
            (4, [0.7, 0.71], 2),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)], "query_id long, embedding array<double>, query_label int"
    )
    out = hard_negative_topk(corpus, q, k=3).collect()
    ids = [r.negative_id for r in out]
    assert 1 not in ids and 0 not in ids
    assert ids[0] == 2            # hardest negative first
    assert all(r.negative_label != 0 for r in out)
    assert [r.rank for r in out] == [1, 2, 3]


# ──────────────── P11: smoothed target encoding ────────────────


def test_target_encoding_shrinks_toward_global_mean(spark):
    from data_frame_demo_etl_spark.analytics.features import target_encode

    # category "big": 100 rows at 200; "rare": 1 row at 1000
    rows = [("big", 200)] * 100 + [("rare", 1000)]
    df = spark.createDataFrame(rows, "cat string, t long")
    out = {r.category: r for r in target_encode(df, "cat", "t", m=20).collect()}
    g = (100 * 200 + 1000) // 101
    assert out["big"].global_mean_micro == g
    assert out["big"].encoded_micro == (100 * 200 + 20 * g) // 120
    assert out["rare"].encoded_micro == (1000 + 20 * g) // 21
    # rare category shrinks much closer to the global mean
    assert abs(out["rare"].encoded_micro - g) < abs(1000 - g) // 2
    assert out["rare"].raw_mean_micro == 1000


def test_target_encoding_null_rows_excluded(spark):
    from data_frame_demo_etl_spark.analytics.features import target_encode

    df = spark.createDataFrame(
        [("a", 10), ("a", None), (None, 99)], "cat string, t long"
    )
    out = target_encode(df, "cat", "t").collect()
    assert len(out) == 1 and out[0].n == 1 and out[0].raw_mean_micro == 10


# ──────────────── K49: sequence trigram mining ────────────────


def test_sequence_trigrams_planted(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.features import sequence_trigrams

    base = dt.datetime(2024, 1, 1)

    def ev(eid, uid, t, s):
        return (eid, base + dt.timedelta(seconds=s), uid, t, 1.0)

    # user 1: A B C D → ABC, BCD ; user 2: A B C → ABC
    rows = [
        ev(1, 1, "A", 0), ev(2, 1, "B", 1), ev(3, 1, "C", 2), ev(4, 1, "D", 3),
        ev(5, 2, "A", 0), ev(6, 2, "B", 1), ev(7, 2, "C", 2),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {(r.t1, r.t2, r.t3): (r.n_occurrences, r.n_users) for r in sequence_trigrams(df).collect()}
    assert out == {("A", "B", "C"): (2, 2), ("B", "C", "D"): (1, 1)}


def test_sequence_trigrams_no_cross_user_bleed(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.features import sequence_trigrams

    base = dt.datetime(2024, 1, 1)
    # user 1 ends ...X Y ; user 2 starts Z... — XYZ must NOT appear
    rows = [
        (1, base, 1, "X", 1.0),
        (2, base + dt.timedelta(seconds=1), 1, "Y", 1.0),
        (3, base + dt.timedelta(seconds=2), 2, "Z", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    assert sequence_trigrams(df).count() == 0


# ──────────────── L19: Zipf-law fit ────────────────


def test_zipf_exact_power_law(spark):
    from data_frame_demo_etl_spark.functions.vocab import zipf_fit

    # corpus engineered so term k appears ~C/k times: slope ≈ -1.
    # distinct frequencies avoid ties entirely → midrank = plain rank.
    words = []
    for k, f in enumerate([64, 32, 21, 16, 12, 10, 9, 8], start=1):
        words += [f"w{k}"] * f
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    r = zipf_fit(df).collect()[0]
    assert r.n_terms == 8 and r.n_tokens == sum([64, 32, 21, 16, 12, 10, 9, 8])
    # ideal 1/k law has slope -1; this discrete approximation is close
    assert -1_150_000 < r.slope_micro < -850_000


def test_zipf_tied_frequencies_midrank(spark):
    import math

    from data_frame_demo_etl_spark.functions.vocab import zipf_fit

    # two classes: {a:4} rank 1 and {b,c,d:1} sharing midrank (2+3+4)/3=3
    df = spark.createDataFrame([("a a a a b c d",)], "text string")
    r = zipf_fit(df).collect()[0]
    # hand-computed weighted OLS on (ln1, ln4) w=1 and (ln3, ln1)=0 w=3
    qx1, qy1 = 0, math.floor(math.log(4) * 1e6 + 0.5)
    qx2, qy2 = math.floor(math.log(3) * 1e6 + 0.5), 0
    n, sx, sy = 4, qx1 + 3 * qx2, qy1
    sxx = qx1 * qx1 + 3 * qx2 * qx2
    sxy = qx1 * qy1 + 3 * qx2 * qy2
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r.slope_micro == math.floor(slope * 1e6 + 0.5)


def test_zipf_uniform_frequencies_null(spark):
    from data_frame_demo_etl_spark.functions.vocab import zipf_fit

    # all terms equally frequent → one x value → zero variance → NULL
    df = spark.createDataFrame([("a b c a b c",)], "text string")
    r = zipf_fit(df).collect()[0]
    assert r.slope_micro is None and r.intercept_micro is None


# ──────────────── D20: containment pairs ────────────────


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_catches_subset_jaccard_misses(spark):
    from data_frame_demo_etl_spark.dedup.jaccard import containment_pairs, jaccard_pairs

    quote = "the quick brown fox jumps over the lazy dog"
    host = quote + " " + " ".join(f"w{i}" for i in range(60))
    docs = _docs(spark, [(1, quote), (2, host)])
    cont = {(r.id_a, r.id_b): r.containment for r in containment_pairs(docs, threshold=0.9).collect()}
    # every shingle of the quote appears in the host → C(quote, host) = 1
    assert cont.get((1, 2)) == 1.0
    # host is NOT contained in quote
    assert (2, 1) not in cont
    # symmetric Jaccard misses the pair entirely at 0.8
    assert jaccard_pairs(docs, threshold=0.8).count() == 0


def test_containment_exact_copies_both_directions(spark):
    from data_frame_demo_etl_spark.dedup.jaccard import containment_pairs

    t = "alpha beta gamma delta epsilon zeta"
    docs = _docs(spark, [(1, t), (2, t), (3, "unrelated words only here today")])
    out = {(r.id_a, r.id_b): r.containment for r in containment_pairs(docs).collect()}
    assert out.get((1, 2)) == 1.0 and out.get((2, 1)) == 1.0
    assert not any(3 in p for p in out)


def test_containment_threshold_boundary(spark):
    from data_frame_demo_etl_spark.dedup.jaccard import containment_pairs

    # A has 10 shingles (12 words); B shares exactly 9 of them → C = 0.9
    a_words = [f"a{i}" for i in range(12)]
    b_words = a_words[:11] + [f"b{i}" for i in range(40)]  # drops last shingle
    docs = _docs(spark, [(1, " ".join(a_words)), (2, " ".join(b_words))])
    out = {(r.id_a, r.id_b): r.containment for r in containment_pairs(docs, threshold=0.9).collect()}
    assert out.get((1, 2)) == 0.9  # exactly at threshold: kept


# ──────────────── L20: Heaps-law fit ────────────────


def test_heaps_curve_counts_first_occurrences(spark):
    from data_frame_demo_etl_spark.functions.vocab import heaps_fit

    # doc order is doc_id: tokens = a b a b | c a c d  (8 tokens)
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c a c d")], "doc_id long, text string"
    )
    out = {r.mark: r.vocab for r in heaps_fit(docs).collect()}
    # marks 4 and ... 4^2=16 > 8 tokens → only mark 4
    assert out == {4: 2}  # first 4 tokens: {a, b}


def test_heaps_beta_near_one_for_all_new_tokens(spark):
    from data_frame_demo_etl_spark.functions.vocab import heaps_fit

    # every token distinct → V(n) = n exactly → β = 1
    words = " ".join(f"w{i}" for i in range(70))
    docs = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = heaps_fit(docs).collect()
    marks = {r.mark: r.vocab for r in rows}
    assert marks == {4: 4, 16: 16, 64: 64}
    assert abs(rows[0].beta_micro - 1_000_000) <= 2


def test_heaps_flat_vocab_beta_zero(spark):
    from data_frame_demo_etl_spark.functions.vocab import heaps_fit

    # one repeated token → V(n) = 1 at every mark → β = 0
    docs = spark.createDataFrame([(1, "x " * 70)], "doc_id long, text string")
    rows = heaps_fit(docs).collect()
    assert all(r.vocab == 1 for r in rows)
    assert rows[0].beta_micro == 0


# ──────────────── K51: Poisson-bootstrap CI ────────────────


def _boot_events(spark, vals, key="X"):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1), i, key, float(v)) for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from data_frame_demo_etl_spark.analytics.robust import bootstrap_mean_ci

    vals = [10, 12, 9, 11, 14, 8, 10, 13, 11, 10, 9, 12, 15, 7, 10, 11] * 4
    df = _boot_events(spark, vals)
    r1 = bootstrap_mean_ci(df).collect()[0]
    r2 = bootstrap_mean_ci(df).collect()[0]
    assert r1 == r2                       # bit-stable run to run
    assert r1.n == len(vals)
    exact_mean = sum(v * 100 for v in vals) * 1_000_000 // (len(vals) * 1)
    assert r1.mean_micro == exact_mean // 1  # exact integral division
    assert r1.ci_lo_micro <= r1.mean_micro <= r1.ci_hi_micro
    assert r1.ci_lo_micro < r1.ci_hi_micro  # non-degenerate band


def test_bootstrap_ci_constant_values_degenerate_band(spark):
    from data_frame_demo_etl_spark.analytics.robust import bootstrap_mean_ci

    # every value 5.0 → every resample mean is exactly 500*1e6 micro
    df = _boot_events(spark, [5.0] * 64)
    r = bootstrap_mean_ci(df).collect()[0]
    assert r.ci_lo_micro == r.ci_hi_micro == 500_000_000 == r.mean_micro


def test_poisson_thresholds_are_valid_cdf(spark):
    from data_frame_demo_etl_spark.analytics.robust import POISSON_THRESHOLDS

    assert list(POISSON_THRESHOLDS) == sorted(POISSON_THRESHOLDS)
    # P(w=0) = e^-1: the first threshold sits at ~0.3679 of the grid
    assert abs(POISSON_THRESHOLDS[0] / 4294967296.0 - 0.36787944) < 1e-6
    # ladder covers ~all mass by w=8
    assert POISSON_THRESHOLDS[-1] / 4294967296.0 > 0.99998


# ──────────────── P12: Horvitz–Thompson estimator audit ────────────────


def test_ht_estimate_exact_when_all_sampled(spark):
    from data_frame_demo_etl_spark.operators.weighted_sample import ht_estimate

    # one stratum with rank 1 → π = 1/2; we cannot force "all sampled"
    # through the hash, so instead verify the IDENTITY on the sampled
    # subset: est = Σ_sampled v·2/1 exactly (threshold = 2^31).
    rows = [(i, "s", 100) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    r = ht_estimate(df, "source", "n_chars", "doc_id").collect()[0]
    assert r.n_rows == 200 and r.total == 20000
    # every sampled row contributes v * 2^32/2^31 = 2v exactly
    assert r.ht_total_micro == r.n_sampled * 100 * 2 * 1_000_000
    # π=1/2 over md5 → n_sampled near 100 (law of large numbers, fixed hash)
    assert 60 < r.n_sampled < 140


def test_ht_estimate_rank_order_sets_thresholds(spark):
    from data_frame_demo_etl_spark.operators.weighted_sample import ht_estimate

    rows = [(i, "big", 10) for i in range(300)] + [
        (1000 + i, "small", 10) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r.source: r for r in ht_estimate(df, "source", "n_chars", "doc_id").collect()}
    # big is rank 1 (π=1/2), small rank 2 (π=1/4): sampled shares follow
    assert out["big"].n_sampled / 300 > out["small"].n_sampled / 50 - 0.25
    # unbiasedness identity per stratum: est = Σ_sampled v/π exactly
    assert out["small"].ht_total_micro == out["small"].n_sampled * 10 * 4 * 1_000_000


# ──────────────── L21: Flesch readability ────────────────


def test_flesch_hand_computed(spark):
    from data_frame_demo_etl_spark.functions.text import flesch_scores

    # "the cat sat. it ran!" → 5 words, 2 sentences, syllables:
    # vowel groups: e,a,a,i,a = 5 (each word exactly one)
    df = spark.createDataFrame([(1, "the cat sat. it ran!")], "id long, text string")
    r = flesch_scores(df, "text").collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (5, 2, 5)
    expect = 206_835_000 - (1_015_000 * 5) // 2 - (84_600_000 * 5) // 5
    assert r.flesch_micro == expect


def test_flesch_syllable_floor_and_fragments(spark):
    from data_frame_demo_etl_spark.functions.text import flesch_scores

    # "rhythm myth" has no aeiouy groups except y: rhythm→1(y), myth→1(y)
    # still: the per-word floor guarantees syllables >= words
    df = spark.createDataFrame(
        [(1, "xxxx zzzz"), (2, "")], "id long, text string"
    )
    rows = {r.id: r for r in flesch_scores(df, "text").collect()}
    assert rows[1].n_syllables == 2        # floored to word count
    assert rows[1].n_sentences == 1        # fragment floor
    assert rows[2].flesch_micro is None    # empty text → no words


def test_flesch_negative_score_exact(spark):
    from data_frame_demo_etl_spark.functions.text import flesch_scores

    # one absurd 40-syllable "word" drives the score negative
    word = "aba" * 40
    df = spark.createDataFrame([(1, word)], "id long, text string")
    r = flesch_scores(df, "text").collect()[0]
    expect = 206_835_000 - 1_015_000 - (84_600_000 * r.n_syllables) // 1
    assert r.flesch_micro == expect and r.flesch_micro < 0


# ──────────────── V9: calibrated noisy-count release ────────────────


def test_noisy_release_matches_inverse_cdf(spark):
    import hashlib
    import math

    from data_frame_demo_etl_spark.operators.validate import noisy_count_release

    df = spark.createDataFrame([("a",)] * 7 + [("b",)] * 3, "g string")
    out = {r.g: r.released_count_micro for r in noisy_count_release(df, "g").collect()}
    for g, n in (("a", 7), ("b", 3)):
        h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        lap = -1.0 * math.copysign(1.0, u - 0.5) * math.log(1.0 - 2.0 * abs(u - 0.5))
        expect = n * 1_000_000 + math.floor(lap * 1e6 + 0.5)
        assert abs(out[g] - expect) <= 1  # 1-micro tolerance: single libm ln


def test_noisy_release_scale_calibration(spark):
    from data_frame_demo_etl_spark.operators.validate import noisy_count_release

    df = spark.createDataFrame([("a",)] * 5, "g string")
    n1 = noisy_count_release(df, "g", epsilon_micro=1_000_000).collect()[0]
    n2 = noisy_count_release(df, "g", epsilon_micro=2_000_000).collect()[0]
    noise1 = n1.released_count_micro - 5_000_000
    noise2 = n2.released_count_micro - 5_000_000
    # same seed, double epsilon → exactly half the noise (±1 micro floor)
    assert abs(noise1 - 2 * noise2) <= 2
    assert noise1 != 0  # the draw actually perturbs


# ──────────────── K53: business-day latency ────────────────


def test_business_days_closed_form(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import business_day_latency

    # Mon 2024-01-01 → Mon 2024-01-08: exactly 5 business days.
    # Fri 2024-01-05 → Mon 2024-01-08: exactly 1 (Sat+Sun skipped).
    # Sat 2024-01-06 → Sun 2024-01-07: 0.
    orders = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1), "P1"),
            (2, dt.date(2024, 1, 5), "P2"),
            (3, dt.date(2024, 1, 6), "P3"),
        ],
        "o_orderkey long, o_orderdate date, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 8)),
            (2, dt.date(2024, 1, 8)),
            (3, dt.date(2024, 1, 7)),
        ],
        "l_orderkey long, l_shipdate date",
    )
    out = {r.o_orderpriority: r for r in business_day_latency(orders, li).collect()}
    assert out["P1"].business_days_total == 5
    assert out["P2"].business_days_total == 1
    assert out["P3"].business_days_total == 0
    assert out["P1"].mean_business_days_micro == 5_000_000


def test_business_days_first_ship_is_min(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.timeseries import business_day_latency

    orders = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), "X")],
        "o_orderkey long, o_orderdate date, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, dt.date(2024, 1, 10)), (1, dt.date(2024, 1, 3)), (1, dt.date(2024, 1, 20))],
        "l_orderkey long, l_shipdate date",
    )
    r = business_day_latency(orders, li).collect()[0]
    assert r.business_days_total == 2  # Mon 1st → Wed 3rd


# ──────────────── D21: containment sketch eval ────────────────


def test_containment_sketch_exact_when_doc_fits_in_sample(spark):
    from data_frame_demo_etl_spark.dedup.jaccard import containment_sketch_eval

    # |A| = 10 shingles ≤ k=32 → the "sample" is ALL of A → est == exact
    a_words = [f"a{i}" for i in range(12)]
    host = " ".join(a_words) + " " + " ".join(f"h{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(1, " ".join(a_words)), (2, host)], "doc_id long, text string"
    )
    out = {(r.id_a, r.id_b): r for r in containment_sketch_eval(docs, threshold=0.5).collect()}
    r = out[(1, 2)]
    assert r.exact_ppm == 1_000_000 and r.est_ppm == 1_000_000 and r.abs_err_ppm == 0


def test_containment_sketch_subsamples_large_docs(spark):
    from data_frame_demo_etl_spark.dedup.jaccard import containment_sketch_eval

    # |A| = 98 shingles (100 words), B contains all of them → exact 1.0
    # and every sampled shingle hits → est 1.0 despite k < |A|
    a_words = [f"w{i}" for i in range(100)]
    host = " ".join(a_words) + " " + " ".join(f"x{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(1, " ".join(a_words)), (2, host)], "doc_id long, text string"
    )
    out = {(r.id_a, r.id_b): r for r in containment_sketch_eval(docs, threshold=0.5).collect()}
    assert out[(1, 2)].est_ppm == 1_000_000
    # partial-containment direction: host → quote has exact < 1; its
    # estimate is a k-sample proportion — still deterministic
    if (2, 1) in out:
        r = out[(2, 1)]
        assert 0 <= r.est_ppm <= 1_000_000


# ──────────────── A11: user journey paths ────────────────


def test_user_journeys_first_depth_only(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.funnel import user_journey_paths

    base = dt.datetime(2024, 1, 1)

    def ev(eid, uid, t, s):
        return (eid, base + dt.timedelta(seconds=s), uid, t, 1.0)

    rows = (
        [ev(i, 1, t, i) for i, t in enumerate("ABCDEFG")]  # user 1: 7 events
        + [ev(100 + i, 2, t, i) for i, t in enumerate("ABCDE")]  # user 2: exactly 5
        + [ev(200 + i, 3, t, i) for i, t in enumerate("AB")]  # user 3: short journey
    )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.path: r.n_users for r in user_journey_paths(df, depth=5).collect()}
    # users 1 and 2 share the truncated first-5 path; user 3 keeps its short one
    assert out == {"A>B>C>D>E": 2, "A>B": 1}


def test_user_journeys_order_is_time_not_id(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.funnel import user_journey_paths

    base = dt.datetime(2024, 1, 1)
    # event_ids descending while time ascends: path must follow TIME
    rows = [
        (9, base + dt.timedelta(seconds=0), 1, "X", 1.0),
        (5, base + dt.timedelta(seconds=1), 1, "Y", 1.0),
        (1, base + dt.timedelta(seconds=2), 1, "Z", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = [r.path for r in user_journey_paths(df).collect()]
    assert out == ["X>Y>Z"]


# ──────────────── K55: log-log elasticity ────────────────


def test_elasticity_exact_power_law(spark):
    import math

    from data_frame_demo_etl_spark.analytics.trend import loglog_elasticity

    # q = 1000/p exactly → slope = −1 in log-log space
    rows = []
    for i, p in enumerate([1, 2, 4, 5, 10]):
        rows.append((i, 100 + i, float(p * (1000 // p)), 1000 // p))
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_extendedprice double, l_quantity long"
    )
    part = spark.createDataFrame(
        [(100 + i, "B1") for i in range(5)], "p_partkey long, p_brand string"
    )
    r = loglog_elasticity(li, part).collect()[0]
    # unit price = extendedprice/qty = p dollars = 100p cents exactly
    # ln(q) = ln(1000) − ln(p) = ln(100000) − ln(100p) → slope −1
    assert abs(r.elasticity_micro + 1_000_000) <= 3


def test_elasticity_degenerate_single_price_null(spark):
    from data_frame_demo_etl_spark.analytics.trend import loglog_elasticity

    li = spark.createDataFrame(
        [(1, 7, 500.0, 5), (2, 7, 900.0, 9)],  # unit price $100 in both
        "l_orderkey long, l_partkey long, l_extendedprice double, l_quantity long",
    )
    part = spark.createDataFrame([(7, "B9")], "p_partkey long, p_brand string")
    r = loglog_elasticity(li, part).collect()[0]
    assert r.elasticity_micro is None  # zero price variance


# ──────────────── E6: dynamic partition overwrite ────────────────


def test_dynamic_partition_overwrite_replaces_only_written_partitions(spark, tmp_path):
    """The warehouse sink contract a naive overwrite breaks: with
    partitionOverwriteMode=dynamic, INSERT OVERWRITE replaces ONLY the
    partitions present in the incoming frame — static mode would wipe
    partition 'a' while writing 'b'."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "dynpart")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        base = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 10)], "part string, v long"
        )
        base.write.partitionBy("part").mode("overwrite").parquet(path)
        patch = spark.createDataFrame([("b", 99)], "part string, v long")
        patch.write.partitionBy("part").mode("overwrite").parquet(path)
        got = {
            (r.part, r.v) for r in spark.read.parquet(path).collect()
        }
        # 'a' rows survive untouched; 'b' fully replaced by the patch
        assert got == {("a", 1), ("a", 2), ("b", 99)}
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_containment_prefix_df_cap_quarantines_hot_docs(spark):
    """The all-boilerplate worst case: every shingle of every doc is
    corpus-hot, so the rare-first prefix cannot stay cold. With
    prefix_df_cap set, those reps are DIVERTED as (id, NULL, NULL)
    quarantine rows (never silently dropped); cold docs stay exact."""
    from data_frame_demo_etl_spark.dedup.jaccard import containment_pairs

    # 30 DISTINCT 12-word texts over a 2-word vocabulary (doc i spells
    # i in binary): only 8 trigram types exist and each has df > 3, so
    # every doc's rare-first prefix is over-cap. Plus two cold docs
    # (a quote inside a host).
    hot = [
        (i, " ".join("b" + bit for bit in format(i, "012b")))
        for i in range(30)
    ]
    quote = "the quick brown fox jumps over the lazy dog"
    host = quote + " " + " ".join(f"w{k}" for k in range(60))
    docs = _docs(spark, hot + [(100, quote), (101, host)])

    out = containment_pairs(docs, threshold=0.9, prefix_df_cap=3).collect()
    quarantined = {r.id_a for r in out if r.id_b is None}
    pairs = {(r.id_a, r.id_b): r.containment for r in out if r.id_b is not None}
    hot_ids = {i for i, _ in hot}
    # every distinct hot text is quarantined (exact copies collapse
    # first; their reps are hot, members inherit the quarantine row)
    distinct_hot_reps = {min(i for i, t2 in hot if t2 == t) for _, t in hot}
    assert distinct_hot_reps <= quarantined
    # the cold pair is still exact
    assert pairs.get((100, 101)) == 1.0
    assert 100 not in quarantined and 101 not in quarantined
    # quarantine rows carry NULL containment (accounted, not scored)
    assert all(r.containment is None for r in out if r.id_b is None)


def test_containment_generous_cap_equals_exact(spark):
    from data_frame_demo_etl_spark.dedup.jaccard import containment_pairs

    quote = "the quick brown fox jumps over the lazy dog"
    host = quote + " " + " ".join(f"w{k}" for k in range(60))
    t = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [(1, quote), (2, host), (3, t), (4, t)])
    exact = {(r.id_a, r.id_b): r.containment for r in containment_pairs(docs, threshold=0.9).collect()}
    capped_rows = containment_pairs(docs, threshold=0.9, prefix_df_cap=10_000).collect()
    capped = {(r.id_a, r.id_b): r.containment for r in capped_rows}
    assert capped == exact  # no doc hits the cap -> bit-identical
    assert all(r.id_b is not None for r in capped_rows)  # empty quarantine

