"""Round-10 additions: Dunning G² keyness, duplication profile."""

from __future__ import annotations

import math


def test_keyness_planted_marker_word(spark):
    from data_frame_demo_etl_spark.functions.vocab import source_keyness

    # source A uses "zebra" constantly; the shared filler is uniform.
    filler = "common words shared by both sources here "
    docs = spark.createDataFrame(
        [("A", filler + "zebra zebra zebra zebra zebra")] * 3
        + [("B", filler + "yak yak yak yak yak")] * 3,
        "source string, text string",
    )
    rows = source_keyness(docs).collect()
    top = rows[0]
    # the planted markers dominate; both appear (symmetric corpus)
    marked = {(r.source, r.word) for r in rows[:2]}
    assert marked == {("A", "zebra"), ("B", "yak")}
    assert top.n_in_source == 15
    # shared filler words are NOT over-represented anywhere → absent
    assert all(r.word not in filler.split() for r in rows)
    # exact G² for the 2x2 table: 12 tokens/doc × 3 docs/source →
    # ns=36, N=72, cw=15 ⇒ a=15, b=0, c=21, d=36
    N, ns, cw, a = 72, 36, 15, 15
    b, c, d = cw - a, ns - a, N - ns - cw + a

    def q(o, e_num, e_den):
        return o * math.floor(math.log(o * N / (e_num * e_den)) * 1e6 + 0.5)

    g2 = 2 * (
        q(a, ns, cw)
        + (q(b, N - ns, cw) if b else 0)
        + (q(c, ns, N - cw) if c else 0)
        + (q(d, N - ns, N - cw) if d else 0)
    )
    assert top.g2_micro == g2


def test_duplication_profile_planted_groups(spark):
    from data_frame_demo_etl_spark.dedup.novelty import duplication_profile

    docs = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)],
        "text string",
    )
    rows = {r.group_size: r for r in duplication_profile(docs).collect()}
    assert rows[1].n_groups == 1 and rows[3].n_groups == 2 and rows[5].n_groups == 1
    # 12 docs total: shares 1/12, 6/12, 5/12 on the exact ppm grid
    assert rows[1].doc_share_ppm == 1_000_000 // 12
    assert rows[3].doc_share_ppm == 6_000_000 // 12
    assert rows[5].doc_share_ppm == 5_000_000 // 12


def test_burstiness_topical_vs_function_word(spark):
    from data_frame_demo_etl_spark.functions.vocab import term_burstiness

    # "the" appears once per doc (VMR = 0: constant counts);
    # "topic" clumps: 50 occurrences in one doc, absent elsewhere.
    docs = [(i, "the filler") for i in range(1, 60)]
    docs.append((60, "the " + "topic " * 50))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.word: r for r in term_burstiness(df).collect()}
    # topic: df=1, cf=50, c2=2500 → VMR = (2500-2500)/50 = 0? No:
    # df·c2 − cf² = 1·2500 − 2500 = 0 → single-doc terms have VMR 0
    # over CONTAINING docs — both are in the list; check exact values.
    assert out["the"].vmr_micro == 0  # constant 1-per-doc counts
    assert out["the"].n_docs == 60 and out["the"].n_occurrences == 60
    assert out["topic"].n_docs == 1 and out["topic"].n_occurrences == 50


def test_burstiness_known_vmr(spark):
    from data_frame_demo_etl_spark.functions.vocab import term_burstiness

    # counts per containing doc: [10, 40] → df=2, cf=50, c2=1700
    # VMR = (2·1700 − 2500)·1e6 div (2·50) = 900·1e6 div 100
    docs = [(1, "w " * 10), (2, "w " * 40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = term_burstiness(df).collect()[0]
    assert (r.word, r.n_docs, r.n_occurrences) == ("w", 2, 50)
    assert r.vmr_micro == 900 * 1_000_000 // 100


def test_kruskal_wallis_no_ties_known_h(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import kruskal_wallis
    from pyspark.sql import functions as F

    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6)]
    df = spark.createDataFrame(rows, "arm string, cents long")
    r = kruskal_wallis(df, "arm", F.col("cents")).collect()[0]
    # ranks 1..6: R_a=6, R_b=15 → H = 12/42·(12+75) − 21 = 27/7
    expect = int((12 * 87 / 42 - 21) * 1_000_000 + 0.5)
    assert (r.n_obs, r.n_groups) == (6, 2)
    assert r.h_micro == expect
    assert r.h_corrected_micro == expect  # no ties → C = 1


def test_kruskal_wallis_three_arm_separation(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import kruskal_wallis
    from pyspark.sql import functions as F

    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 5), ("c", 6)]
    df = spark.createDataFrame(rows, "arm string, cents long")
    r = kruskal_wallis(df, "arm", F.col("cents")).collect()[0]
    # R = 3, 7, 11 → Σ R²/n = 89.5 → H = 12·89.5/42 − 21
    expect = int((12 * 89.5 / 42 - 21) * 1_000_000 + 0.5)
    assert (r.n_groups, r.h_micro) == (3, expect)


def test_kruskal_wallis_all_tied_h_zero_corrected_null(spark):
    from data_frame_demo_etl_spark.analytics.quality_audit import kruskal_wallis
    from pyspark.sql import functions as F

    rows = [("a", 7), ("a", 7), ("b", 7), ("b", 7)]
    df = spark.createDataFrame(rows, "arm string, cents long")
    r = kruskal_wallis(df, "arm", F.col("cents")).collect()[0]
    # identical values: the micro-grid q_j keeps H exactly 0 (the
    # unscaled div produced −0.6 here); C = 0 → corrected NULL
    assert r.h_micro == 0
    assert r.h_corrected_micro is None


def test_tfidf_hand_computed(spark):
    """3 docs / 2 sources: df(apple)=2, df(banana)=2, df(cherry)=1 →
    idf_micro = 405465 / 405465 / 1098612; min_tf=3 prunes s2's
    single apple; scores are exact integer products."""
    from data_frame_demo_etl_spark.functions.vocab import tfidf_source_terms

    docs = spark.createDataFrame(
        [
            (1, "s1", "apple apple apple banana"),
            (2, "s1", "banana banana banana banana"),
            (3, "s2", "apple cherry cherry cherry"),
        ],
        "doc_id long, source string, text string",
    )
    got = [(r.source, r.rk, r.word, r.tf, r.df, r.tfidf_micro)
           for r in tfidf_source_terms(docs).collect()]
    assert got == [
        ("s1", 1, "banana", 5, 2, 5 * 405465),
        ("s1", 2, "apple", 3, 2, 3 * 405465),
        ("s2", 1, "cherry", 3, 1, 3 * 1098612),
    ]


def test_tfidf_ubiquitous_word_scores_zero(spark):
    """A word in EVERY document has idf ln(1) = 0 → tfidf 0, ranked
    below any concentrated term."""
    from data_frame_demo_etl_spark.functions.vocab import tfidf_source_terms

    docs = spark.createDataFrame(
        [
            (1, "s1", "the the the zebra zebra zebra"),
            (2, "s1", "the cat"),
            (3, "s2", "the dog"),
        ],
        "doc_id long, source string, text string",
    )
    got = {(r.source, r.word): r.tfidf_micro for r in tfidf_source_terms(docs).collect()}
    assert got[("s1", "the")] == 0
    assert got[("s1", "zebra")] == 3 * 1098612


def test_keyphrase_hand_computed(spark):
    """Adjacent-bigram tf with overlap ('big data' ×3 in one doc),
    df over distinct docs, idf = ln(2/1) → 693147 on the micro grid;
    sub-min_tf phrases pruned."""
    from data_frame_demo_etl_spark.functions.vocab import keyphrase_source_terms

    docs = spark.createDataFrame(
        [
            (1, "s1", "big data big data big data x"),
            (2, "s2", "alpha beta alpha beta alpha beta"),
        ],
        "doc_id long, source string, text string",
    )
    got = [(r.source, r.rk, r.phrase, r.tf, r.df, r.tfidf_micro)
           for r in keyphrase_source_terms(docs).collect()]
    assert got == [
        ("s1", 1, "big data", 3, 1, 3 * 693147),
        ("s2", 1, "alpha beta", 3, 1, 3 * 693147),
    ]


def test_keyphrase_single_token_docs_yield_nothing(spark):
    from data_frame_demo_etl_spark.functions.vocab import keyphrase_source_terms

    docs = spark.createDataFrame(
        [(1, "s1", "solo"), (2, "s1", "")], "doc_id long, source string, text string"
    )
    assert keyphrase_source_terms(docs).count() == 0
