from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_frame_demo_etl_spark import registry
from data_frame_demo_etl_spark.operators.audit import (
    assert_filters_pushed,
    assert_no_cartesian,
    plan_report,
)
from data_frame_demo_etl_spark.operators.cdc import scd2_history


def test_scd2_history(spark):
    changes = spark.createDataFrame(
        [
            (1, 1, "insert", 10.0),
            (1, 2, "update", 20.0),
            (1, 3, "update", 30.0),
            (2, 1, "insert", 5.0),
            (2, 2, "delete", None),
            (3, 1, "insert", 7.0),
        ],
        "k long, seq long, op string, val double",
    )
    hist = scd2_history(changes, key=["k"], seq_col="seq")
    rows = sorted(hist.collect(), key=lambda r: (r.k, r.valid_from))
    k1 = [r for r in rows if r.k == 1]
    assert [(r.valid_from, r.valid_to, r.is_current) for r in k1] == [
        (1, 2, False),
        (2, 3, False),
        (3, None, True),
    ]
    assert [r.val for r in k1] == [10.0, 20.0, 30.0]
    k2 = [r for r in rows if r.k == 2]
    # Deleted key: its only version is closed by the delete, not current.
    assert [(r.valid_from, r.valid_to, r.is_current) for r in k2] == [(1, 2, False)]
    k3 = [r for r in rows if r.k == 3]
    assert k3[0].is_current


def test_cdc_tiebreak_breaks_seq_ties_deterministically(spark):
    """Two changes sharing (key, seq) must resolve by the tiebreak
    column, not partition luck."""
    from data_frame_demo_etl_spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(1, "old")], ["k", "v"])
    changes = spark.createDataFrame(
        [(1, 5, "update", "a", 10), (1, 5, "update", "b", 20)],
        ["k", "seq", "op", "v", "offset"],
    )
    for n_parts in (1, 7):
        out = apply_changes(
            base, changes.repartition(n_parts), key=["k"], seq_col="seq", tiebreak=["offset"]
        ).collect()
        assert [(r.k, r.v) for r in out] == [(1, "b")]  # highest offset wins


def test_plan_audit_q2_window_not_selfjoin(spark, sf_oracle_dir):
    """The correlated-min must compile to a Window over the offers
    table, not a self-join, and the final top-100 must be a
    distributed TakeOrdered — no cartesian anywhere."""
    df = registry.queries()["q2_min_cost_supplier"](spark, sf_oracle_dir)
    rep = plan_report(df)
    assert "Window" in rep.raw
    assert "TakeOrderedAndProject" in rep.raw
    assert rep.nested_loop_joins == 0


def test_plan_audit_q1(spark, sf_oracle_dir):
    df = registry.queries()["q1_pricing_summary"](spark, sf_oracle_dir)
    rep = plan_report(df)
    assert rep.scans == 1
    assert_no_cartesian(df)
    assert_filters_pushed(df, "l_shipdate")
    # Only the aggregation shuffle — no join exchanges.
    assert rep.sort_merge_joins == 0


def test_plan_audit_q5_broadcasts(spark, sf_oracle_dir):
    df = registry.queries()["q5_local_supplier_volume"](spark, sf_oracle_dir)
    rep = plan_report(df)
    assert rep.broadcast_joins >= 2  # nation + region forced; others stats-chosen
    assert_no_cartesian(df)
    assert_filters_pushed(df, "o_orderdate")


def test_plan_audit_flags_cartesian(spark):
    a = spark.createDataFrame([(1,)], ["x"])
    b = spark.createDataFrame([(2,)], ["y"])
    with pytest.raises(AssertionError, match="cartesian"):
        assert_no_cartesian(a.crossJoin(b))


# Queries that intentionally cross-join: ANN scores a broadcast query
# set against the corpus; gap-fill builds a dense (bucket × key) grid
# from two tiny sides.
CARTESIAN_ALLOWED = {
    "ann_cosine_topk",
    # broadcast-query-set ANN shape (X1's documented pattern): the
    # cross join is corpus × 10-row broadcast query set, never
    # data × data (similarity/pq.py pq_adc_topk_gate).
    "pq_adc_topk",
    "text_retrieval_topk",
    "events_gapfill",
    # broadcast of a 1-ROW aggregate (global threshold) — the scalar-
    # subquery shape; bounded by construction, never a data-sized
    # cartesian.
    "q22_idle_rich_customers",
    "q11_important_stock",
    "q15_top_supplier",
    # broadcast-query-set ANN shape inside the fused semantic leg
    # (similarity/fusion.py — the documented ann_cosine_topk pattern).
    "retrieval_rrf_fusion",
    # dense (groups × bins × 2) spine — constant-size cross join by
    # construction (analytics/drift.py).
    "events_value_drift_psi",
    # same bounded bins-spine contract, windowed form: (windows ×
    # types × bins) dense spines (analytics/drift.py windowed_psi).
    "events_windowed_psi",
    # type-pair spine (C(T,2) over the type vocabulary) and the
    # OR-membership join of hashes into their pairs — both bounded by
    # the type domain, never by users (analytics/cms.py overlap gate).
    "events_kmv_overlap",
    # broadcast of a 1-ROW total for the ppm shares — the scalar-
    # aggregate shape (analytics/quality_audit.py).
    "orders_benford_audit",
    # broadcast of the 1-ROW corpus totals (n_docs, total_len) onto
    # the term table — the scalar-aggregate shape, r12 lazification of
    # the former driver collect (similarity/bm25.py).
    "text_bm25_topk",
    # broadcasts of 1-ROW token/bigram totals (N, NB) onto the
    # vocab-sized PMI table — the scalar-aggregate shape twice
    # (functions/vocab.py collocation_pmi).
    "docs_collocation_pmi",
    # broadcast of the 1-ROW corpus token total onto the
    # (source × vocab) term table (functions/vocab.py source_vocab_kl).
    "docs_source_vocab_kl",
    # broadcast of a 1-ROW global-min count for the temperature
    # thresholds — same scalar-aggregate shape (operators/gate.py).
    "corpus_temperature_mix",
    # per-constraint pairs of 1-ROW aggregates (total × orphan count)
    # joined into the report rows (operators/validate.py).
    "star_integrity_audit",
    # composes the exact + LSH top-k legs, each of which scores a
    # broadcast query set against the corpus — the documented
    # ann_cosine_topk shape twice (similarity/gate.py).
    "ann_recall_eval",
    # full + per-truncation-dim brute-force legs (broadcast query set,
    # the ann_cosine_topk shape) plus a constant (dims × queries)
    # spine cross — all bounded by construction (similarity/gate.py).
    "embeddings_matryoshka_recall",
    # one broadcast-query-set relevance leg (the ann_cosine_topk
    # shape) feeding a Q×POOL-bounded greedy rerank (similarity/mmr.py).
    "embeddings_mmr_rerank",
    # dense (distinct hours × type vocabulary) spine — the gapfill
    # bounded-cross contract (analytics/timeseries.py correlation).
    "events_type_correlation",
    # crossJoin(broadcast(1-ROW max-timestamp aggregate)) for the
    # right-censor edge — the q22 bounded-scalar shape
    # (analytics/survival.py).
    "users_churn_survival",
    # crossJoin(broadcast(1-ROW total-usage aggregate)) for the final
    # vocabulary log-probs (functions/unigram.py) — bounded scalar.
    "unigram_lm_vocab",
    # composes the trainer above (same bounded 1-row cross) before
    # encoding — same scalar shape (functions/unigram.py).
    "docs_unigram_tokens",
    # crossJoins of 1-ROW aggregates (MI sum × row entropy × column
    # entropy scalars) — the benford bounded-scalar shape
    # (analytics/quality_audit.py mutual_information).
    "events_mutual_information",
    # broadcast labeled-query panel against the corpus — the
    # documented ann_cosine_topk shape (similarity/ann.py
    # hard_negative_topk).
    "embeddings_hard_negatives",
    # crossJoin(broadcast(1-ROW global-mean aggregate)) for the
    # shrinkage target — the q22 bounded-scalar shape
    # (analytics/features.py target_encode).
    "customer_segment_target_encoding",
    # vocab × ≤20-marks broadcast RANGE join (fidx ≤ mark — non-equi
    # by construction, bounded by the mark ladder) plus the 1-ROW
    # slope scalar cross (functions/vocab.py heaps_fit).
    "docs_heaps_fit",
    # exact-baseline leg broadcasts the 10-query set against the
    # corpus — the documented ann_cosine_topk shape (similarity/ivf.py
    # ivf_nprobe_recall_sweep).
    "ann_ivf_nprobe_sweep",
    # crossJoin(broadcast(1-ROW epoch-midpoint bounds)) then
    # crossJoin(broadcast(1-ROW theta/global-mean aggregate)) — the
    # q22 bounded-scalar shape twice (analytics/ml_eval.py).
    "events_cuped_adjustment",
    # crossJoin(broadcast(1-ROW A/B-total aggregate)) — bounded scalar
    # (analytics/drift.py jsd_categorical).
    "events_jsd_arms",
    # crossJoins of 1-ROW aggregates (totals × conditional-entropy
    # scalar) — the mutual-information shape
    # (analytics/features.py transition_entropy).
    "events_transition_entropy",
    # crossJoin(broadcast(1-ROW n/t totals)) — bounded scalar
    # (analytics/quality_audit.py theil_index).
    "lineitem_supplier_theil",
    # full + projected brute-force legs, each a broadcast 10-query set
    # against the corpus — the ann_cosine_topk shape twice
    # (similarity/gate.py embeddings_rp_recall).
    "embeddings_rp_recall",
    # crossJoin(broadcast(1-ROW min/max score bounds)) for the binning
    # grid — the PSI bounded-scalar shape (analytics/ml_eval.py
    # calibration_curve).
    "events_value_calibration",
    # crossJoin(broadcast(1-ROW matched-total aggregate)) for the cell
    # shares, plus rfm_segments' internal 1-row anchor — bounded
    # scalars (analytics/features.py rfm_migration).
    "customer_rfm_migration",
    # crossJoin(broadcast(1-ROW corpus-norm aggregate b2)) — bounded
    # scalar (similarity/gate.py centroid_cosine_audit).
    "embeddings_centroid_drift",
    # crossJoin(broadcast(1-ROW max-timestamp aggregate)) for the
    # right-censor edge — the users_churn_survival shape
    # (analytics/survival.py na_cum_hazard).
    "users_churn_hazard",
    # same right-censor 1-ROW scalar cross (analytics/survival.py
    # logrank_test).
    "users_churn_logrank",
    # crossJoin(broadcast(1-ROW L1-total aggregate)) per HITS
    # normalization — bounded scalar ×4 (analytics/hits.py).
    "graph_hits",
    # crossJoin(broadcast(1-ROW bounds)) + crossJoin(broadcast(1-ROW
    # totals)) onto the ≤n_bins bin table — bounded scalars
    # (analytics/ml_eval.py brier_decomposition).
    "events_brier_decomposition",
    # dense (QI-classes × band-domain) spine + 1-ROW (N, m) scalar —
    # both bounded by value domains, never by rows
    # (operators/validate.py t_closeness).
    "customer_t_closeness",
    # composes the X4 anchor-PQ gate (corpus × 10-row broadcast query
    # set) with the X1 exact leg — the documented ann_cosine_topk
    # shape twice (similarity/pq.py pq_recall_eval_gate).
    "pq_recall_eval",
    # crossJoin of two 1-ROW aggregates (Σx²/t/n × top-8 CRk sums) —
    # bounded scalars (analytics/quality_audit.py market_concentration).
    "customer_concentration",
    # crossJoins of two 1-ROW quantile aggregates (depth × duration)
    # onto the 1-ROW base summary — bounded scalars
    # (streaming/events.py session_stats).
    "events_session_stats",
    # crossJoin(broadcast(1-ROW corpus-token total)) onto the
    # vocab-sized G² table (functions/vocab.py source_keyness).
    "docs_source_keyness",
    # crossJoin(broadcast(1-ROW doc total)) onto the vocab-sized
    # TF-IDF score table — bounded scalar (functions/vocab.py
    # tfidf_source_terms).
    "docs_tfidf_terms",
    # same bounded 1-ROW doc-total crossJoin, bigram form (L29).
    "docs_keyphrase_terms",
    # crossJoin(broadcast(1-ROW tie-sum aggregate)) onto the 1-row
    # arm fold (analytics/quality_audit.py kruskal_wallis).
    "events_kruskal_wallis",
    # crossJoins of 1-ROW scalars (global d-min shift, peak-hour row)
    # onto the calendar-bounded decomposition (analytics/timeseries.py
    # seasonal_strength_hourly).
    "events_seasonal_strength",
    # crossJoins of 1-ROW scalars (family size m, step-up k*) onto the
    # type-domain test table (analytics/quality_audit.py bh_fdr).
    "events_ab_fdr",
    # crossJoin(broadcast(1-ROW doc total)) onto the group-size
    # histogram (dedup/novelty.py duplication_profile).
    "docs_duplication_profile",
    # --- _keyed_prefix consumers (analytics/quality_audit.py): the r12
    # in-plan offsets carry a crossJoin(broadcast(1-ROW offset-count
    # guard)) — the q22 bounded-scalar shape; the guard row count is
    # what ENFORCES the helper's low-cardinality contract (raise_error
    # when the offset table exceeds MAX_OFFSET_ROWS), so the cross is
    # 1-row by construction.
    "events_value_pr_curve",
    "events_cliffs_delta",
    "events_dwell_transitions",
    "events_max_concurrency",
    "lineitem_supplier_gini",
    "events_cusum_changepoints",
    "events_mannwhitney",
    "events_ks_test",
    "events_spearman",
    "docs_zipf_fit",
    "events_runs_test",
    "lineitem_lorenz_curve",
    "parts_abc_classification",
    "events_value_auc",
    "events_purchase_stump",
    "customer_repurchase_cadence",
    "docs_token_budget_curve",
    "events_value_ap",
    "events_value_lift",
    "events_cvm_test",
}


# Expected nested-loop-join count per CARTESIAN_ALLOWED entry (r13,
# ADVICE item: a name-scoped exemption let any FUTURE unrelated cross
# join ride in silently on an allowlisted query). Each count is the
# audited number of bounded-scalar crossJoins in the query's plan at
# the test SF; an increase — a new nested-loop join on an exempted
# query — now fails the audit like any other query. Regenerate a
# value ONLY after verifying the new join is another ≤1-row-aggregate
# build (the q22 bounded-scalar shape).
CARTESIAN_MAX = {
    "ann_cosine_topk": 1,
    "ann_ivf_nprobe_sweep": 1, "ann_recall_eval": 2,
    "corpus_temperature_mix": 1, "customer_concentration": 1,
    "customer_repurchase_cadence": 1, "customer_rfm_migration": 1,
    "customer_segment_target_encoding": 1, "customer_t_closeness": 2,
    "docs_collocation_pmi": 2, "docs_duplication_profile": 1,
    "docs_heaps_fit": 7, "docs_keyphrase_terms": 1,
    "docs_source_keyness": 1, "docs_source_vocab_kl": 1,
    "docs_tfidf_terms": 1, "docs_token_budget_curve": 1,
    "docs_unigram_tokens": 1, "docs_zipf_fit": 1,
    "embeddings_centroid_drift": 1, "embeddings_hard_negatives": 1,
    "embeddings_matryoshka_recall": 5, "embeddings_mmr_rerank": 0,
    "embeddings_rp_recall": 2, "events_ab_fdr": 3,
    "events_brier_decomposition": 3, "events_cliffs_delta": 1,
    "events_cuped_adjustment": 3, "events_cusum_changepoints": 2,
    "events_cvm_test": 1, "events_dwell_transitions": 1,
    "events_gapfill": 1, "events_jsd_arms": 1,
    "events_kmv_overlap": 4, "events_kruskal_wallis": 2,
    "events_ks_test": 1, "events_mannwhitney": 1,
    "events_max_concurrency": 2, "events_mutual_information": 2,
    "events_purchase_stump": 1, "events_runs_test": 3,
    "events_seasonal_strength": 4, "events_session_stats": 2,
    "events_spearman": 2, "events_transition_entropy": 2,
    "events_type_correlation": 2, "events_value_ap": 1,
    "events_value_auc": 1, "events_value_calibration": 1,
    "events_value_drift_psi": 4, "events_value_lift": 1,
    "events_value_pr_curve": 1, "events_windowed_psi": 2,
    "graph_hits": 22, "lineitem_lorenz_curve": 1,
    "lineitem_supplier_gini": 1, "lineitem_supplier_theil": 1,
    "orders_benford_audit": 1, "parts_abc_classification": 1,
    "pq_adc_topk": 1, "pq_recall_eval": 2,
    "q11_important_stock": 1, "q15_top_supplier": 0,
    "q22_idle_rich_customers": 1, "retrieval_rrf_fusion": 2,
    "star_integrity_audit": 0, "text_bm25_topk": 1,
    "text_retrieval_topk": 0, "unigram_lm_vocab": 1,
    "users_churn_hazard": 1, "users_churn_logrank": 1,
    "users_churn_survival": 1,
}


@pytest.fixture(scope="module")
def registry_sweep(spark, sf_dir):
    """ONE construction + plan-inspection pass over every registry
    gate, shared by the three structural audits below (r13: the three
    audits each rebuilt all ~289 plans — 363 s of the suite wall for
    two redundant passes; the driver's pytest window is the constraint
    the r12 verdict gated on).

    The pass runs from a small thread pool (r13): per-query cost is
    driver-side plan construction — py4j round trips plus the handful
    of construction jobs some gates issue — which overlaps cleanly
    across threads (optimization guide §2.6); temp-view names are
    per-construction unique and plan inspection is read-only."""
    from concurrent.futures import ThreadPoolExecutor

    from data_frame_demo_etl_spark.operators.audit import self_join_fanouts

    def inspect(item):
        name, fn = item
        try:
            df = fn(spark, sf_dir)
            rep = plan_report(df)
            return name, {
                "error": None,
                "nested_loop_joins": rep.nested_loop_joins,
                "unpartitioned_windows": sum(
                    1
                    for line in rep.raw.splitlines()
                    if "Window [" in line and line.count("], [") == 1
                ),
                "self_joins": len(self_join_fanouts(df)),
            }
        except Exception as exc:  # pragma: no cover
            return name, {"error": f"build failed: {exc}"}

    # plan_report save-sets spark.sql.maxMetadataStringLength per call;
    # pin it for the sweep so concurrent save/restore interleavings are
    # value-identical no-ops (no thread can restore it to unset).
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    try:
        with ThreadPoolExecutor(max_workers=8) as pool:
            return dict(pool.map(inspect, registry.queries().items()))
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_no_accidental_cartesian_anywhere(registry_sweep):
    assert set(CARTESIAN_MAX) == set(CARTESIAN_ALLOWED), (
        "CARTESIAN_ALLOWED and CARTESIAN_MAX must list the same names"
    )
    bad = {}
    for name, info in registry_sweep.items():
        if info["error"]:
            bad[name] = info["error"]
            continue
        limit = CARTESIAN_MAX.get(name, 0)
        if info["nested_loop_joins"] > limit:
            bad[name] = (
                f"{info['nested_loop_joins']} nested-loop/cartesian join(s), "
                f"audited bound {limit}"
            )
    assert not bad, bad


def test_pagerank_properties(spark):
    """On a star graph (hub trades with all spokes) the hub outranks
    every spoke; total rank mass is conserved up to floor-division
    truncation; ranks are deterministic across re-runs."""
    from data_frame_demo_etl_spark.analytics.pagerank import SCALE, pagerank

    hub_edges = []
    for s in range(1, 9):
        hub_edges.append((0, s))
        hub_edges.append((s, 0))
    edges = spark.createDataFrame(hub_edges, "src long, dst long")
    r1 = pagerank(edges, n_rounds=3).toPandas().set_index("node").rank_units
    r2 = pagerank(edges, n_rounds=3).toPandas().set_index("node").rank_units
    assert r1.equals(r2)
    assert r1[0] > max(r1[s] for s in range(1, 9))
    n = 9
    assert 0.95 * n * SCALE <= r1.sum() <= n * SCALE


def test_pushed_filters_not_vacuous_on_unfiltered_scan(spark, sf_oracle_dir):
    """Regression guard for the pushdown capture: a FileScan line
    carries ', ReadSchema: struct<...>' on the SAME line as
    PushedFilters, so a to-end-of-line capture makes every read
    column 'pushed'. An unfiltered scan must report NO pushed filter
    mentioning a column it merely reads."""
    df = spark.read.parquet(f"{sf_oracle_dir}/lineitem.parquet").select(
        "l_shipdate", "l_quantity"
    )
    rep = plan_report(df)
    assert not any("l_shipdate" in f for f in rep.pushed_filters), rep.pushed_filters
    with pytest.raises(AssertionError):
        assert_filters_pushed(df, "l_shipdate")


def test_pushed_filters_keeps_in_list_brackets(spark, sf_oracle_dir):
    """In(col, [a,b]) filters contain ']' — the capture must keep the
    whole In(...) entry while still dropping the ReadSchema tail."""
    df = (
        spark.read.parquet(f"{sf_oracle_dir}/lineitem.parquet")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select("l_returnflag", "l_quantity")
    )
    rep = plan_report(df)
    assert any("l_returnflag" in f for f in rep.pushed_filters), rep.pushed_filters
    assert not any("ReadSchema" in f for f in rep.pushed_filters), rep.pushed_filters
    assert not any("l_quantity" in f for f in rep.pushed_filters), rep.pushed_filters


# Gates whose plans legitimately contain UNPARTITIONED window
# operators: every entry's window runs over a BOUNDED table (value
# domain / calendar span / top-k / answer-sized eval grid), never the
# corpus. The audit below exists so the NEXT gate that accidentally
# windows corpus-sized data through one task fails in pytest, the way
# CARTESIAN_ALLOWED guards accidental cross joins.
GLOBAL_WINDOW_ALLOWED = {
    # (cohort_year × year_offset) curve table — calendar-bounded
    "customer_cohort_ltv": "cohort×offset curve table",
    # row_number over the 8-row TakeOrdered top table
    "customer_concentration": "top-8 CRk table",
    # prefix ranks over DISTINCT-signature / candidate-eval tables;
    # the sketch eval's grid is the documented answer-sized
    # copies²-pair output (SCALING.md containment sections)
    "dedup_containment": "distinct-signature prefix tables",
    "dedup_containment_sketch_eval": "answer-sized eval grid",
    "dedup_lsh_threshold_sweep": "distinct-signature sweep grid",
    "dedup_ngram_jaccard": "distinct-text collapse tables",
    "dedup_sketch_eval": "distinct-text eval tables",
    # stratum census (value-domain) ranks
    "docs_ht_estimate": "stratum census table",
    # r12 lazy _global_rank: running offsets + total over the
    # ≤-shuffle-partitions-row per-partition counts table (the former
    # driver-side offset loop, now in-plan; bounded by n_parts)
    "customer_rfm_segments": "partition-count offset table",
    "customer_rfm_migration": "partition-count offset table",
    # cumulative gains over the 10-row decile spine (the per-row rank
    # is the two-pass keyed prefix, never a global window)
    "events_value_lift": "decile spine",
    "events_value_pr_curve": "decile spine",
    # lag windows over the dense hourly calendar spine —
    # calendar-bounded by construction (timeseries.py mase_hourly)
    "events_value_mase": "hourly calendar spine",
    # |z|-rank over the ≤types test-family table (bh_fdr)
    "events_ab_fdr": "type-domain test family",
    "events_seasonal_strength": "hourly calendar spine",
    # top-20 rank over the vocabulary-bounded phrase-score table
    "docs_rake_keywords": "phrase-score vocabulary table",
    # K29 exact distributed selection — the documented bounded
    # final-selection pass
    "events_exact_stats": "exact-selection value domain",
    # value-domain threshold candidates (distinct cents)
    "events_purchase_stump": "distinct-cents threshold table",
    # depth/duration quantiles over value-domain histograms
    # (streaming/events.py session_stats, survival.py argument)
    "events_session_stats": "depth/duration value domains",
    # distinct-tier prefix-min (the skyline bounded-window argument)
    "parts_pareto_frontier": "distinct-tier table",
    # TPC-H shapes: windows over part/supplier-bounded subtables
    "q17_small_quantity_revenue": "per-part agg table",
    "q20_promo_part_suppliers": "per-part agg table",
    "q2_min_cost_supplier": "region-filtered part-supplier table",
    # calendar-span duration tables (module docstring argument)
    "users_churn_hazard": "duration table",
    "users_churn_logrank": "duration table",
    "users_churn_survival": "duration table",
    # top-K vocabulary rank
    "vocab_coverage": "vocab-sized top-K rank",
}


def test_no_corpus_global_window_anywhere(registry_sweep):
    """Every registry gate's physical plan is free of UNPARTITIONED
    window operators unless allowlisted with a bounded-table
    justification. Detector: a `Window [...]` plan line carries three
    bracket groups when partitioned (exprs, partition spec, order
    spec) and two when global."""
    bad = {}
    for name, info in registry_sweep.items():
        if name in GLOBAL_WINDOW_ALLOWED:
            continue
        if info["error"]:
            bad[name] = info["error"]
            continue
        if info["unpartitioned_windows"]:
            bad[name] = f"{info['unpartitioned_windows']} unpartitioned window(s) in plan"
    assert not bad, bad


# Fourth structural audit (added r12, after the r11 verdict showed the
# first three are blind to aggregation fan-out): gates whose optimized
# plan contains a SELF-JOIN — a Join whose two children are
# structurally identical (same node-class tree, same normalized
# leaves) — must justify here why no single join key can emit an
# unbounded |group|² fan-out from one task (the Σdeg² wedge shape that
# made r11's G9 `weak`). Every entry names its bound.
SELF_JOIN_ALLOWED = {
    # ── ANN / embedding family: one side is the bounded query set
    # (fixed N_QUERIES rows, broadcast) or a top-k result keyed by
    # query id — per-key groups ≤ k / ≤ nlist by construction.
    "ann_cosine_topk": "broadcast fixed-query side; groups ≤ n_queries",
    "ann_lsh_topk": "LSH bucket join, query side bounded; banded buckets",
    "ann_ivf_nprobe_sweep": "probe join keyed by (query, centroid), ≤ nprobe",
    "ann_incremental_admit": "broadcast 20-row batch probes one posting list",
    "ann_recall_eval": "exact-vs-approx top-k joins on query id, groups ≤ k",
    "dedup_embedding": "banded cosine buckets with the D2 anti-cap",
    "dedup_semantic": "cluster-local pair join, clusters capped (SemDeDup)",
    "embeddings_hard_negatives": "per-query candidate join, groups ≤ k",
    "embeddings_label_separation": "label-centroid join, ≤ n_labels rows/side",
    "embeddings_matryoshka_recall": "per-dim top-k vs exact top-k on query id",
    "embeddings_rp_recall": "projected vs exact top-k on query id, ≤ k",
    "pq_adc_topk": "ADC scores join exact side on query id, groups ≤ k",
    "pq_recall_eval": "PQ vs brute-force top-k on query id, groups ≤ k",
    "ivfpq_adc_topk": "coarse-pruned residual join, ≤ nprobe·k per query",
    "retrieval_rrf_fusion": "two rank lists joined on (query, doc), ≤ k each",
    # ── dedup / fingerprint family: pair joins run on DISTINCT
    # signatures or banded buckets with documented hot-bucket
    # anti-caps (D2/D16/K8) — per-bucket group sizes are capped and
    # over-cap keys are quarantined, so |group|² is bounded by cap².
    "contamination_check": "distinct-signature equi-join (exact n-gram hit)",
    "dedup_containment": "prefix-df capped signature join (D20 quarantine)",
    "dedup_containment_sketch_eval": "answer-sized copies² eval grid (documented)",
    "dedup_incremental": "batch-vs-corpus signature join, batch side bounded",
    "dedup_lsh_threshold_sweep": "closed-form within-signature mass, distinct sigs",
    "dedup_ngram_jaccard": "distinct-text collapse + guarded bucket join",
    "dedup_simhash": "banded Hamming buckets over distinct signatures",
    "dedup_sketch_eval": "distinct-text eval join",
    "docs_decontaminate": "exact-signature anti-join build (distinct sigs)",
    "docs_winnowing_matches": "winnowing fingerprint buckets, df-capped",
    "multimodal_audio_dedup": "integer-fingerprint buckets (bounded corpus)",
    "multimodal_image_dedup": "banded-Hamming aHash buckets",
    "multimodal_video_dedup": "keyframe fingerprint buckets",
    "split_leakage_check": "signature-collapsed split join (D13)",
    # ── blocked entity resolution: per-block pair joins under the K8
    # block-size anti-cap (over-cap blocks quarantined).
    "fuzzy_name_pairs": "K8 blocked pairs, block-size cap",
    "supplier_fuzzy_matches": "K8 blocked pairs, block-size cap",
    "supplier_er_scores": "K8 blocks + Fellegi-Sunter scoring, capped",
    # ── bounded-aggregate two-sided stats: both join sides are
    # value-domain / calendar / per-type AGGREGATES (dozens-to-
    # thousands of rows), never the raw fact table.
    "customer_cohort_ltv": "cohort-year spine join (calendar-bounded)",
    "customer_rfm_migration": "two quintile snapshots joined on customer (1 row/side/key)",
    "customer_t_closeness": "QI-group vs global value-domain histograms",
    "events_approx_stats": "sketch vs exact one-row aggregates",
    "events_kmv_overlap": "KMV synopses (k-sized) joined per type-pair",
    "events_runs_test": "one-row median vs sequence aggregate",
    "events_trend_slope": "per-day aggregate joined with itself (calendar)",
    "events_type_correlation": "per-day-per-type aggregate pairs (calendar×types)",
    "events_value_drift_psi": "two per-bin histograms (fixed bin count)",
    "events_view_purchase_ccf": "per-day counts at fixed lags (calendar)",
    "events_view_purchase_interval_join": "per-user time-interval join; per-user event counts",
    "lapsed_customers_except": "EXCEPT rewrite: distinct customer keys (1 row/side/key)",
    "loyal_customers_intersect": "INTERSECT rewrite: distinct keys (1 row/side/key)",
    # ── graph: wedge self-joins with named bounds.
    "supplier_link_prediction": "KNN-sparsified wedge: per-center fan-out ≤ C(32,2)",
    "supplier_clustering_coefficient": "degree-ORIENTED wedge: Σ outdeg² = O(E^1.5)",
}


def test_no_unbounded_self_join_anywhere(registry_sweep):
    """Every registry gate is free of structurally-identical-children
    self-joins unless allowlisted with a named per-key fan-out bound.
    This is the audit that would have caught G9's uncapped Σdeg² wedge
    at landing (r11 verdict item 4)."""
    bad = {}
    for name, info in registry_sweep.items():
        if name in SELF_JOIN_ALLOWED:
            continue
        if info["error"]:
            bad[name] = info["error"]
            continue
        if info["self_joins"]:
            bad[name] = f"{info['self_joins']} self-join(s) with identical children"
    assert not bad, bad


def test_self_join_detector_planted(spark):
    """The detector fires on a textbook uncapped self-join (adjacency
    joined with itself on the center) and stays quiet on a
    different-shape join over the same table."""
    from data_frame_demo_etl_spark.operators.audit import self_join_fanouts

    und = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "w long, n long"
    )
    wedge = und.select("w", F.col("n").alias("x")).join(
        und.select("w", F.col("n").alias("y")), "w"
    )
    assert self_join_fanouts(wedge), "uncapped wedge self-join must be flagged"

    agg = und.groupBy("w").count()
    mixed = und.join(agg, "w")  # aggregate side differs structurally
    assert not self_join_fanouts(mixed)
