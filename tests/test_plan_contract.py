"""Plan contract for every driver-window (tier-1) query.

One parametrized test holds each windowed plan to the physical shape
we want at 100 TB:
- no accidental nested-loop/cartesian join (explicit allowlist for
  the documented broadcast-query-set / scalar-subquery shapes);
- predicate pushdown: queries whose WHERE touches pushable base-table
  columns must show them in the scan's PushedFilters;
- constant dims (region/nation, broadcast query sets) must be
  broadcast, not shuffled;
- declared scan-count ceilings for single-table aggregates.

If a future change un-pushes a filter, un-broadcasts a dim, or
introduces a cartesian, this fails with the offending plan.
"""

from __future__ import annotations

import pytest

from data_frame_demo_etl_spark import registry
from data_frame_demo_etl_spark.operators.audit import plan_report

# Queries that intentionally contain a broadcast nested-loop/cross
# shape, all bounded by construction:
# - ann gates broadcast a tiny query set against the corpus;
# - q22 broadcasts a 1-row global-threshold aggregate (scalar
#   subquery);
# - text_retrieval joins a broadcast query-term set.
CARTESIAN_ALLOWED = {
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_retrieval_topk",
    "q22_idle_rich_customers",
    # q11 broadcasts a 1-row scalar-aggregate (total + n_parts) for
    # the outsized-share HAVING — same bounded shape as q22.
    "q11_important_stock",
    # gapfill's dense time-grid IS a crossJoin by contract
    # (analytics/timeseries.py — caller must bound the grid).
    "events_gapfill",
    # broadcast-query-set ANN shape inside the fused semantic leg
    # (similarity/fusion.py — the documented ann_cosine_topk pattern).
    "retrieval_rrf_fusion",
    # composes ann_lsh_topk + ann_cosine_topk — both legs are the
    # bounded broadcast-query-set shape above (similarity/gate.py).
    "ann_recall_eval",
    # full + per-truncation-dim brute-force legs plus a constant
    # (dims × queries) spine — r9 rotation target, listed ahead of the
    # rotation per the both-allowlists rule (similarity/gate.py).
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
    # dense (groups × bins × 2) spine — constant-size cross join by
    # construction (analytics/drift.py).
    "events_value_drift_psi",
    # type-pair spine (C(T,2) over the type vocabulary) and the
    # OR-membership join of hashes into their pairs — both bounded by
    # the type domain, never by users (analytics/cms.py overlap gate).
    "events_kmv_overlap",
    # ≤9-digit count table × a 1-row total aggregate — the q22
    # bounded scalar-subquery shape (analytics/quality_audit.py).
    "orders_benford_audit",
    # crossJoin(broadcast(1-row min-count aggregate)) for the
    # temperature thresholds (operators/gate.py) — bounded scalar.
    "corpus_temperature_mix",
    # per-check 1-row count aggregates crossJoined into the audit
    # report rows (operators/validate.py) — bounded scalars.
    "star_integrity_audit",
    # crossJoin(broadcast(1-row total-usage aggregate)) for the final
    # vocabulary log-probs (functions/unigram.py) — bounded scalar.
    "unigram_lm_vocab",
    # composes the trainer above (same bounded 1-row cross) before
    # encoding — same scalar shape (functions/unigram.py).
    "docs_unigram_tokens",
    # --- r10 window rotation: r9b gates now inside the window, each
    #     already justified in the whole-registry audit allowlist
    #     (tests/test_audit_and_scd2.py) with the same bounded shape
    "events_mutual_information",
    "embeddings_hard_negatives",
    "customer_segment_target_encoding",
    "docs_heaps_fit",
    "events_windowed_psi",
    # --- r10 additions
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
    # --- r11 window rotation: r10 second-block gates now inside the
    #     window, each already justified in the whole-registry audit
    #     allowlist (tests/test_audit_and_scd2.py) with the same
    #     bounded shape
    # crossJoin(broadcast(1-ROW min/max-cents bounds)) for the PSI
    # binning grid — bounded scalar (analytics/ml_eval.py).
    "events_value_calibration",
    # crossJoins of 1-ROW epoch-midpoint + quintile-threshold
    # aggregates — bounded scalars (analytics/features.py).
    "customer_rfm_migration",
    # broadcasts of 1-ROW token/bigram totals onto the vocab-sized PMI
    # table — the scalar-aggregate shape twice (functions/vocab.py).
    "docs_collocation_pmi",
    # broadcast of the 1-ROW corpus token total onto the
    # (source × vocab) term table (functions/vocab.py).
    "docs_source_vocab_kl",
    # crossJoin(broadcast(1-ROW corpus-norm aggregate)) — bounded
    # scalar (similarity/gate.py centroid_cosine_audit).
    "embeddings_centroid_drift",
    # crossJoin(broadcast(1-ROW max-timestamp aggregate)) for the
    # right-censor edge (analytics/survival.py na_cum_hazard).
    "users_churn_hazard",
    # crossJoin of two 1-ROW aggregates (Σx²/t/n × top-8 CRk sums) —
    # bounded scalars (analytics/quality_audit.py).
    "customer_concentration",
    # crossJoins of two 1-ROW quantile aggregates (depth × duration)
    # (streaming/events.py session_stats).
    "events_session_stats",
    # per-source 1-ROW totals crossJoined onto the vocab-sized G²
    # table — bounded scalars (functions/vocab.py source_keyness).
    "docs_source_keyness",
    # crossJoin(broadcast(1-ROW doc total)) onto the vocab-sized
    # TF-IDF score table — bounded scalar (functions/vocab.py
    # tfidf_source_terms).
    "docs_tfidf_terms",
    # same bounded 1-ROW doc-total crossJoin, bigram form (L29).
    "docs_keyphrase_terms",
    # 1-ROW scalar crossJoins (d-min shift, peak hour) — the q22 shape
    # (analytics/timeseries.py seasonal_strength_hourly).
    "events_seasonal_strength",
    # 1-ROW scalar crossJoins (m, k*) — the q22 shape (bh_fdr).
    "events_ab_fdr",
    # composes the anchor-PQ ADC leg and the exact brute-force leg,
    # each the documented broadcast-query-set ann_cosine_topk shape
    # (similarity/pq.py pq_recall_eval_gate) — entered the window in
    # the r12 rotation.
    "pq_recall_eval",
    # crossJoin(broadcast(1-ROW corpus totals)) onto the
    # group-size histogram — bounded scalar (dedup/novelty.py).
    "docs_duplication_profile",
    # crossJoin(broadcast(1-ROW rank-variance scalars)) — the K42
    # bounded-scalar shape globalized (analytics/quality_audit.py).
    "events_kruskal_wallis",
    # --- r11 additions
    # broadcast-query-set ANN shape (X1's documented pattern): corpus
    # × 10-row broadcast query set (similarity/pq.py).
    "pq_adc_topk",
    # crossJoin(broadcast(1-ROW max-timestamp aggregate)) for the
    # right-censor edge (analytics/survival.py logrank_test).
    "users_churn_logrank",
    # crossJoin(broadcast(1-ROW L1-total aggregate)) per
    # normalization — bounded scalar ×4 (analytics/hits.py).
    "graph_hits",
    # crossJoin(broadcast(1-ROW bounds)) for the forecast grid, then
    # crossJoin(broadcast(1-ROW totals)) onto the ≤n_bins bin table —
    # bounded scalars (analytics/ml_eval.py brier_decomposition).
    "events_brier_decomposition",
    # dense (QI-classes × band-domain) spine + 1-ROW (N, m) scalar —
    # bounded by value domains (operators/validate.py t_closeness).
    "customer_t_closeness",
    # --- r12 in-window _keyed_prefix consumers: the in-plan offsets
    # carry a crossJoin(broadcast(1-ROW offset-count guard)) — the q22
    # bounded-scalar shape; the guard is what enforces the helper's
    # low-cardinality contract (analytics/quality_audit.py).
    "events_value_pr_curve",
    "events_cliffs_delta",
    "events_dwell_transitions",
}

# name -> substrings that must each appear in some PushedFilters entry.
PUSHED = {
    "q2_min_cost_supplier": ["p_type", "r_name"],
    "q10_returned_items": ["l_returnflag"],
    "q12_priority_class": ["l_shipdate"],
    "q14_promo_revenue": ["l_shipdate"],
    # The disjunction itself must reach both scans (Spark pushes the
    # whole Or tree; the line is truncated before every conjunct, so
    # assert the Or + the part-side brand predicate).
    "q19_disjunctive_revenue": ["Or(", "p_brand"],
    "sql_interface_q1": ["l_shipdate"],
    "q1_pricing_summary": ["l_shipdate"],
    # funnel: the one-pass formulation deliberately scans UNfiltered
    # (users with no funnel events must appear with nulls), so there
    # is no event_type pushdown — the contract is the 1-scan ceiling
    # below instead.
    "loyal_customers_intersect": ["o_orderdate"],
    # round-4 window additions
    "q3_shipping_priority": ["o_orderdate", "l_shipdate"],
    "q6_revenue_forecast": ["l_shipdate"],
    "query_builder_filter": ["p_brand", "p_size"],
}

# name -> minimum number of BroadcastHashJoin nodes (constant dims /
# query sets that must never become shuffle joins).
BROADCASTS = {
    "q2_min_cost_supplier": 1,
    "q10_returned_items": 1,
    "revenue_by_region": 2,
}

# name -> maximum number of FileScan nodes (catches accidental
# double-scans of the fact table).
MAX_SCANS = {
    "q1_pricing_summary": 1,
    "sql_interface_q1": 1,
    "q12_priority_class": 2,
    "q14_promo_revenue": 2,
    "events_windowed": 1,
    "events_sessionize": 1,
    "text_token_count": 1,
    # one-pass funnel: one scan, one shuffle, no joins (was 10 scans
    # as an iterative join chain).
    "funnel_view_click_purchase": 1,
}


def test_tier1_window_is_fifty():
    assert len(registry.TIER1_NAMES) == 50


@pytest.mark.parametrize("name", registry.TIER1_NAMES)
def test_plan_contract(spark, sf_dir, name):
    df = registry.queries()[name](spark, sf_dir)
    rep = plan_report(df)

    if name not in CARTESIAN_ALLOWED:
        assert rep.nested_loop_joins == 0, (
            f"{name}: nested-loop/cartesian join in plan\n{rep.raw[:4000]}"
        )

    for col in PUSHED.get(name, ()):
        assert any(col in f for f in rep.pushed_filters), (
            f"{name}: expected pushed filter on {col!r}; "
            f"PushedFilters={rep.pushed_filters}"
        )

    want_bc = BROADCASTS.get(name)
    if want_bc is not None:
        assert rep.broadcast_joins >= want_bc, (
            f"{name}: expected ≥{want_bc} broadcast joins, got {rep.broadcast_joins}"
        )

    max_scans = MAX_SCANS.get(name)
    if max_scans is not None:
        assert rep.scans <= max_scans, (
            f"{name}: {rep.scans} file scans (max {max_scans}) — accidental re-scan?"
        )


# --- round-4 additions (registered outside the rotated window) -----------

def test_packing_plan_prunes_and_single_scan(spark, sf_dir):
    """docs_sequence_packing: one documents scan, pruned to the two
    columns the packing actually needs (a scan reading lang/source/
    n_chars for a doc_id+text computation would be wrong at 100 TB)."""
    rep = plan_report(registry.queries()["docs_sequence_packing"](spark, sf_dir))
    # The final plan reads the persisted (doc_id, n_tokens) pass-1
    # intermediate; the FileScan nodes in view are the InMemoryRelation
    # rendering its cached build plan. The contract is PRUNING: every
    # scan of documents reads exactly [doc_id, text], never the unused
    # lang/source/n_chars columns.
    scan_lines = [l for l in rep.raw.splitlines() if "FileScan" in l]
    assert scan_lines, rep.raw[:2000]
    for line in scan_lines:
        assert "doc_id" in line and "text" in line, line
        for unused in ("lang", "source", "n_chars"):
            assert unused not in line, f"packing scan reads {unused}: {line[:200]}"
    assert rep.nested_loop_joins == 0


def test_salted_join_plan_no_cartesian_and_pruned(spark, sf_dir):
    rep = plan_report(registry.queries()["skew_salted_brand_revenue"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    # lineitem scan pruned to the 3 used columns
    assert any(
        "l_partkey" in s and "l_extendedprice" in s and "l_shipdate" not in s
        for s in rep.read_schemas
    ), rep.read_schemas


def test_cluster_minhash_plan_no_cartesian(spark, sf_dir):
    rep = plan_report(registry.queries()["dedup_clusters_minhash"](spark, sf_dir))
    assert rep.nested_loop_joins == 0, rep.raw[:2000]


# --- round-5 additions (registered outside the rotated window) -----------

def test_keep_best_plan_prunes_and_no_cartesian(spark, sf_dir):
    """dedup_clusters_keep_best: the quality join must not widen the
    documents scan — [doc_id, text] only, no cartesian anywhere in the
    sketch→components→window composition."""
    rep = plan_report(registry.queries()["dedup_clusters_keep_best"](spark, sf_dir))
    assert rep.nested_loop_joins == 0, rep.raw[:2000]
    doc_lines = [l for l in rep.raw.splitlines() if "FileScan" in l and "documents" in l]
    assert doc_lines, rep.raw[:2000]
    for line in doc_lines:
        for unused in ("lang", "source", "n_chars"):
            assert unused not in line, f"keep_best scan reads {unused}: {line[:200]}"


def test_bpe_packing_plan_prunes(spark, sf_dir):
    """docs_sequence_packing_bpe: both the learn and encode scans of
    documents read only [doc_id, text]."""
    rep = plan_report(registry.queries()["docs_sequence_packing_bpe"](spark, sf_dir))
    assert rep.nested_loop_joins == 0, rep.raw[:2000]
    doc_lines = [l for l in rep.raw.splitlines() if "FileScan" in l and "documents" in l]
    assert doc_lines
    for line in doc_lines:
        for unused in ("lang", "source", "n_chars"):
            assert unused not in line, f"bpe packing scan reads {unused}: {line[:200]}"


def test_png_gate_plan_prunes(spark, sf_dir):
    """multimodal_decode_png: the encode mapInPandas consumes only
    [doc_id, text] — column pruning must reach the scan through the
    Arrow boundary."""
    rep = plan_report(registry.queries()["multimodal_decode_png"](spark, sf_dir))
    doc_lines = [l for l in rep.raw.splitlines() if "FileScan" in l and "documents" in l]
    assert doc_lines
    for line in doc_lines:
        for unused in ("lang", "source", "n_chars"):
            assert unused not in line, f"png scan reads {unused}: {line[:200]}"


def test_llm_keep_best_plan_no_cartesian(spark, sf_dir):
    rep = plan_report(registry.queries()["llm_prep_keep_best"](spark, sf_dir))
    assert rep.nested_loop_joins == 0, rep.raw[:2000]


# --- round-5 additions (registered outside the rotated window) -----------

def test_ohlc_plan_single_shuffle_and_pruned(spark, sf_dir):
    """events_ohlc_hourly: the window and the groupBy share the
    (bucket, event_type) partitioning — exactly ONE hash exchange; the
    events scan must not read user_id/props."""
    rep = plan_report(registry.queries()["events_ohlc_hourly"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.exchanges == 1, f"expected 1 hash exchange, got {rep.exchanges}\n{rep.raw[:3000]}"
    for line in rep.raw.splitlines():
        if "FileScan" in line:
            for unused in ("user_id", "props"):
                assert unused not in line, f"ohlc scan reads {unused}: {line[:200]}"


def test_ewma_plan_single_shuffle(spark, sf_dir):
    """events_ewma: 16 lag terms must come from ONE window pass over
    one (event_type) exchange after the hourly agg — a plan with one
    exchange per lag would be wrong."""
    rep = plan_report(registry.queries()["events_ewma"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.exchanges <= 2, f"hourly agg + window = 2 exchanges max\n{rep.raw[:3000]}"
    assert rep.raw.count("Window") <= 2  # one logical window (+AQE rendering)


def test_bloom_probe_stays_in_scan_stage(spark, sf_dir):
    """bloom_pruned_brand_revenue: the probe is a codegen Filter over
    the lineitem scan (no UDF, no extra exchange for the prune), and
    the part side broadcasts."""
    rep = plan_report(registry.queries()["bloom_pruned_brand_revenue"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert "BatchEvalPython" not in rep.raw and "ArrowEvalPython" not in rep.raw, (
        "bloom probe left codegen for a Python eval node"
    )
    assert rep.broadcast_joins >= 1
    assert any("p_brand" in f for f in rep.pushed_filters), rep.pushed_filters


def test_zorder_gate_plan_pruned(spark, sf_dir):
    """events_zorder_stats: pure scan+agg — no joins, and the scan
    reads only user_id/event_id."""
    rep = plan_report(registry.queries()["events_zorder_stats"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.broadcast_joins == 0 and rep.sort_merge_joins == 0
    for line in rep.raw.splitlines():
        if "FileScan" in line:
            for unused in ("props", "value", "event_type"):
                assert unused not in line, f"zorder scan reads {unused}: {line[:200]}"


def test_quantile_rollup_broadcasts_summary(spark, sf_dir):
    """events_quantile_rollup: the per-type summary joins back to the
    base as a broadcast (5 rows), never a shuffle join."""
    rep = plan_report(registry.queries()["events_quantile_rollup"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.broadcast_joins >= 1, rep.raw[:3000]


def test_jpeg_gate_plan_pruned(spark, sf_dir):
    """multimodal_decode_jpeg: the documents scan feeds mapInPandas
    with ONLY doc_id — reading text for a formula-generated fixture
    would ship the whole corpus through Arrow for nothing."""
    rep = plan_report(registry.queries()["multimodal_decode_jpeg"](spark, sf_dir))
    for line in rep.raw.splitlines():
        if "FileScan" in line:
            assert "doc_id" in line, line[:200]
            for unused in ("text", "lang", "source", "n_chars"):
                assert unused not in line, f"jpeg scan reads {unused}: {line[:200]}"


# --- round-5 late additions (sequence features, sketches, fusion, ---------
# --- basket rules, drift, image dedup) ------------------------------------

def test_lag_features_single_exchange_and_pruned(spark, sf_dir):
    """events_lag_features: every feature shares one (user_id, order)
    window — exactly ONE hash exchange; the scan must not read
    props/event_type (unused by the feature row)."""
    rep = plan_report(registry.queries()["events_lag_features"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.exchanges == 1, f"expected 1 hash exchange\n{rep.raw[:3000]}"
    for line in rep.raw.splitlines():
        if "FileScan" in line:
            for unused in ("props", "event_type"):
                assert unused not in line, f"lag-features scan reads {unused}: {line[:200]}"


def test_mad_outliers_broadcasts_medians(spark, sf_dir):
    """events_mad_outliers: per-group median and MAD tables are
    group-cardinality-sized — they must come back as broadcast joins,
    and the scan must not read user_id/props."""
    rep = plan_report(registry.queries()["events_mad_outliers"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.broadcast_joins >= 2, rep.raw[:3000]
    for line in rep.raw.splitlines():
        if "FileScan" in line:
            for unused in ("user_id", "props"):
                assert unused not in line, f"mad scan reads {unused}: {line[:200]}"


def test_cms_grid_broadcast_probe_and_pruned(spark, sf_dir):
    """events_cms_heavy_hitters: the ≤ depth·width grid joins the
    probes as a broadcast; the events scan reads only user_id."""
    rep = plan_report(registry.queries()["events_cms_heavy_hitters"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.broadcast_joins >= 1, rep.raw[:3000]
    for line in rep.raw.splitlines():
        if "FileScan" in line:
            # NB: "ts" can't be substring-checked (matches "testdata"
            # in the scan path) — user_id-only is implied by the rest.
            for unused in ("props", "value", "event_type"):
                assert unused not in line, f"cms scan reads {unused}: {line[:200]}"


def test_kmv_salted_search_shape(spark, sf_dir):
    """events_kmv_distinct: the salted two-stage k-th-smallest search
    joins the (group-cardinality-sized) n_distinct and hk tables as a
    BROADCAST — never a shuffled join — and the scan reads only
    (event_type, user_id)."""
    rep = plan_report(registry.queries()["events_kmv_distinct"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.sort_merge_joins == 0
    assert rep.broadcast_joins >= 1, rep.raw[:3000]
    for line in rep.raw.splitlines():
        if "FileScan" in line:
            for unused in ("props", "value"):
                assert unused not in line, f"kmv scan reads {unused}: {line[:200]}"


def test_rrf_fusion_prunes_documents(spark, sf_dir):
    """retrieval_rrf_fusion: the BM25 leg reads only [doc_id, text]
    (the cosine leg's broadcast-query cross shape is the documented
    ann pattern)."""
    rep = plan_report(registry.queries()["retrieval_rrf_fusion"](spark, sf_dir))
    doc_lines = [l for l in rep.raw.splitlines() if "FileScan" in l and "documents" in l]
    assert doc_lines, rep.raw[:2000]
    for line in doc_lines:
        for unused in ("lang", "source", "n_chars"):
            assert unused not in line, f"rrf doc scan reads {unused}: {line[:200]}"


def test_basket_rules_broadcasts_part_and_supports(spark, sf_dir):
    """brand_association_rules: part joins lineitem as a broadcast and
    both support lookups broadcast; the lineitem scan reads only
    (l_orderkey, l_partkey)."""
    rep = plan_report(registry.queries()["brand_association_rules"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.broadcast_joins >= 3, rep.raw[:3000]
    li_lines = [l for l in rep.raw.splitlines() if "FileScan" in l and "lineitem" in l]
    assert li_lines
    for line in li_lines:
        for unused in ("l_extendedprice", "l_shipdate", "l_quantity"):
            assert unused not in line, f"basket scan reads {unused}: {line[:200]}"


def test_psi_scan_pruned(spark, sf_dir):
    """events_value_drift_psi: the dense-spine cross joins are
    constant-size by construction (groups × bins × 2); the contract
    here is pruning — the events scan must not read props/user_id."""
    rep = plan_report(registry.queries()["events_value_drift_psi"](spark, sf_dir))
    for line in rep.raw.splitlines():
        if "FileScan" in line and "events" in line:
            for unused in ("props", "user_id"):
                assert unused not in line, f"psi scan reads {unused}: {line[:200]}"


def test_image_dedup_scan_pruned(spark, sf_dir):
    """multimodal_image_dedup: the thumbnail encode consumes only
    [doc_id, text] through the Arrow boundary."""
    rep = plan_report(registry.queries()["multimodal_image_dedup"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    doc_lines = [l for l in rep.raw.splitlines() if "FileScan" in l and "documents" in l]
    assert doc_lines
    for line in doc_lines:
        for unused in ("lang", "source", "n_chars"):
            assert unused not in line, f"image-dedup scan reads {unused}: {line[:200]}"


def test_transitions_single_window_exchange(spark, sf_dir):
    """events_type_transitions: lag runs off ONE (user_id) exchange;
    the vocabulary² count agg and broadcast total join add no fact
    rescans; scan must not read props/value."""
    rep = plan_report(registry.queries()["events_type_transitions"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.broadcast_joins >= 1, rep.raw[:3000]
    for line in rep.raw.splitlines():
        if "FileScan" in line:
            for unused in ("props", "value"):
                assert unused not in line, f"transitions scan reads {unused}: {line[:200]}"


def test_rolling_distinct_no_joins(spark, sf_dir):
    """events_rolling_distinct_users: distinct → explode → count
    distinct; no joins anywhere, scan reads only (user_id, ts)."""
    rep = plan_report(registry.queries()["events_rolling_distinct_users"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.broadcast_joins == 0 and rep.sort_merge_joins == 0
    for line in rep.raw.splitlines():
        if "FileScan" in line:
            for unused in ("props", "value", "event_type"):
                assert unused not in line, f"rolling scan reads {unused}: {line[:200]}"


def test_trend_broadcast_origin_and_pruned(spark, sf_dir):
    """events_trend_slope: the per-group origin joins back broadcast;
    scan must not read props/user_id."""
    rep = plan_report(registry.queries()["events_trend_slope"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.broadcast_joins >= 1, rep.raw[:3000]
    for line in rep.raw.splitlines():
        if "FileScan" in line:
            for unused in ("props", "user_id"):
                assert unused not in line, f"trend scan reads {unused}: {line[:200]}"


def test_seasonal_anomaly_broadcasts_profile(spark, sf_dir):
    """events_seasonal_anomaly: the (types × 24) profile and the
    median/MAD tables all join back broadcast — three broadcast joins,
    no shuffled join of the fact side."""
    rep = plan_report(registry.queries()["events_seasonal_anomaly"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.broadcast_joins >= 3, rep.raw[:3000]
    assert rep.sort_merge_joins == 0


def test_k_anonymity_single_agg(spark, sf_dir):
    """customer_k_anonymity: one scan, one aggregation, no joins."""
    rep = plan_report(registry.queries()["customer_k_anonymity"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    assert rep.broadcast_joins == 0 and rep.sort_merge_joins == 0
    assert rep.scans <= 1, rep.raw[:2000]


def test_rfm_no_single_partition_window(spark, sf_dir):
    """customer_rfm_segments: quantile bands come from the two-pass
    prefix-sum rank — the plan must contain NO empty-partition-spec
    Window (the single-partition NTILE shape this replaced)."""
    rep = plan_report(registry.queries()["customer_rfm_segments"](spark, sf_dir))
    assert rep.nested_loop_joins == 0
    # A global NTILE/window would plan an Exchange SinglePartition —
    # the shape the two-pass prefix-sum rank exists to avoid.
    assert "Exchange SinglePartition" not in rep.raw, (
        "RFM plan re-grew a single-partition exchange\n" + rep.raw[:3000]
    )
