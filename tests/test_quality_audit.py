"""Benford audit, CUSUM changepoint, int8 quantization, threshold
sweep, token fertility — planted-structure unit tests (the gate/oracle
parity runs in the contract sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.analytics.quality_audit import (
    BENFORD_PPM,
    benford_audit,
    cusum_changepoint,
)
from data_frame_demo_etl_spark.similarity.quant import int8_calibrate_and_score


def test_benford_perfect_corpus_has_zero_deviation(spark):
    # A corpus whose digit counts are EXACTLY proportional to the ppm
    # table audits to observed == expected (up to the 1e-6 floor).
    rows = []
    for d, ppm in BENFORD_PPM.items():
        rows += [(float(d) * 10,)] * ppm  # ppm copies → exact shares
    # too big — scale down by gcd-ish factor while keeping proportions
    rows = []
    for d, ppm in BENFORD_PPM.items():
        rows += [(float(d) * 10,)] * max(ppm // 1000, 1)
    df = spark.createDataFrame(rows, "x double")
    out = {r.digit: r for r in benford_audit(df, "x").collect()}
    assert set(out) == set(range(1, 10))
    for d in out:
        # ±4000 ppm slack: the //1000 downscale truncates shares
        assert abs(out[d].observed_ppm - out[d].expected_ppm) < 4000


def test_benford_digit_comes_from_cents_rendering(spark):
    # 0.09 → 9 cents → digit 9; 123.45 → 12345 → 1; 0.5 → 50 → 5
    df = spark.createDataFrame([(0.09,), (123.45,), (0.5,)], "x double")
    got = {r.digit: r.n for r in benford_audit(df, "x").collect()}
    assert got == {9: 1, 1: 1, 5: 1}


def test_cusum_finds_planted_mean_shift(spark):
    import datetime

    # 50 points at 10.0 then 50 at 20.0 — the max-|CUSUM| position is
    # exactly the boundary (k = 50).
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + datetime.timedelta(minutes=i), 10.0 if i < 50 else 20.0)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = cusum_changepoint(df, "k", "ts", "v").collect()
    assert len(out) == 1 and out[0].cp_pos == 50 and out[0].n == 100


def test_cusum_constant_series_breaks_ties_earliest(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [("a", t0 + datetime.timedelta(minutes=i), 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = cusum_changepoint(df, "k", "ts", "v").collect()
    assert out[0].cp_pos == 1  # all stats are 0 → earliest position


def test_int8_quantization_error_bound(spark):
    # max reconstruction error must stay under span/255 + 1 micro per
    # dimension (affine 8-bit code with floor rounding).
    df = spark.createDataFrame(
        [([float(i) / 7, float(i * i) / 29],) for i in range(100)],
        "embedding array<float>",
    )
    for r in int8_calibrate_and_score(df).collect():
        assert 0 <= r.mae_micro <= r.max_err_micro
        assert r.max_err_micro <= r.span_micro // 255 + (r.span_micro % 255 > 0)


def test_int8_quantization_constant_dim(spark):
    # constant dimension → span clamps to 1, zero error
    df = spark.createDataFrame([([1.5, 2.0],), ([1.5, 3.0],)], "embedding array<float>")
    rows = {r.dim: r for r in int8_calibrate_and_score(df).collect()}
    assert rows[0].span_micro == 1 and rows[0].max_err_micro == 0


def test_threshold_sweep_cumulative_is_monotone(spark, sf_dir):
    from data_frame_demo_etl_spark.dedup.gate import dedup_lsh_threshold_sweep

    rows = dedup_lsh_threshold_sweep(spark, sf_dir).collect()
    assert rows, "sf0.001 corpus should produce candidate pairs"
    # ascending matches ⇒ cum_pairs non-increasing; top bucket equals its own count
    for a, b in zip(rows, rows[1:]):
        assert a.matches < b.matches and a.cum_pairs >= b.cum_pairs
    assert rows[-1].cum_pairs == rows[-1].n_pairs


def test_token_fertility_ppm_arithmetic(spark, tmp_path):
    from data_frame_demo_etl_spark.functions.gate import docs_token_fertility

    docs = spark.createDataFrame(
        [(1, "one two three", "en", "s", 13), (2, "vier fünf", "de", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in docs_token_fertility(spark, str(tmp_path)).collect()}
    assert out["en"].words == 3 and out["en"].chars == 13
    assert out["en"].tokens_per_word_ppm == out["en"].tokens * 1_000_000 // 3


def test_max_concurrency_planted_overlap(spark):
    import datetime

    from data_frame_demo_etl_spark.analytics.quality_audit import max_concurrency

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    # intervals: [0,10) [5,15) [8,12) → peak 3 at minute 8; [20,25) alone
    rows = [
        ("a", t(0), t(10)),
        ("a", t(5), t(15)),
        ("a", t(8), t(12)),
        ("a", t(20), t(25)),
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    out = max_concurrency(df, "k", "s", "e").collect()
    assert out[0].peak == 3 and out[0].peak_ts == t(8)


def test_max_concurrency_half_open_touching_intervals(spark):
    import datetime

    from data_frame_demo_etl_spark.analytics.quality_audit import max_concurrency

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    # [0,5) and [5,10) touch but never overlap: peak must be 1
    df = spark.createDataFrame(
        [("a", t(0), t(5)), ("a", t(5), t(10))], "k string, s timestamp, e timestamp"
    )
    assert max_concurrency(df, "k", "s", "e").collect()[0].peak == 1


def test_grouping_sets_shapes(spark, sf_dir):
    from data_frame_demo_etl_spark.analytics.quality_audit import events_grouping_sets

    rows = events_grouping_sets(spark, sf_dir).collect()
    gids = {r.gid for r in rows}
    assert gids == {0, 1, 3}  # detail, per-type, grand total — no per-dow set
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1 and grand[0].event_type == "ALL" and grand[0].dow == "ALL"
    assert grand[0].n_events == sum(r.n_events for r in rows if r.gid == 0)


def test_temperature_mix_rates(spark, tmp_path):
    """τ=0.5 mixing: the rarest source keeps everything; a source 4×
    the rarest keeps ~half (sqrt(1/4)); keep decisions are the
    deterministic md5 rule."""
    from data_frame_demo_etl_spark.operators.gate import corpus_temperature_mix

    rows = [(i, f"t {i}", "en", "rare" if i < 100 else "common", 5) for i in range(500)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = corpus_temperature_mix(spark, str(tmp_path)).collect()
    by_src = {}
    for r in out:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert by_src["rare"] == 100  # rate 1.0 keeps all
    assert 130 <= by_src["common"] <= 270  # 400 · 0.5, md5 variance


def test_fixed_width_reader_slices_and_trims(spark, tmp_path):
    from data_frame_demo_etl_spark.sources.gate import read_fixed_width

    f = tmp_path / "fw.txt"
    f.write_text("        42name one                    123\n", encoding="utf-8")
    spec = [("id", 1, 10), ("name", 11, 24), ("cents", 35, 7)]
    row = read_fixed_width(spark, str(f), spec).collect()[0]
    assert (row.id, row.name, row.cents) == ("42", "name one", "123")


def test_fellegi_sunter_decision_boundary(spark):
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.dedup.fuzzy import (
        FS_THRESHOLD,
        FS_WEIGHTS,
        fellegi_sunter_scores,
    )

    pairs = spark.createDataFrame(
        [(1, 2, True, True), (3, 4, True, False), (5, 6, False, True), (7, 8, False, False)],
        "id_a long, id_b long, na boolean, nt boolean",
    )
    out = {
        (r.id_a, r.id_b): (r.fs_centibits, r.is_link)
        for r in fellegi_sunter_scores(pairs, F.col("na"), F.col("nt")).collect()
    }
    w = FS_WEIGHTS
    assert out[(1, 2)] == (w["name"][0] + w["nation"][0], True)
    assert out[(3, 4)] == (w["name"][0] + w["nation"][1], True)   # 971-423=548 ≥ 500
    assert out[(5, 6)] == (w["name"][1] + w["nation"][0], False)  # -656+458 < 500
    assert out[(7, 8)][1] is False
    assert all((c >= FS_THRESHOLD) == l for c, l in out.values())


def test_star_integrity_flags_planted_violations(spark, tmp_path):
    """A duplicated PK and an orphaned FK must surface with exact
    violation counts."""
    from data_frame_demo_etl_spark.operators.validate import star_integrity_audit

    base = "/root/testdata/sf0.001"
    import shutil, os

    for t in ("customer", "part", "supplier", "nation", "region", "lineitem", "orders"):
        src = f"{base}/{t}.parquet"
        dst = str(tmp_path / f"{t}.parquet")
        shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(src, dst)
    # corrupt: duplicate one order key, orphan one lineitem order ref
    import pandas as pd

    orders = pd.read_parquet(f"{base}/orders.parquet")
    orders = pd.concat([orders, orders.iloc[[0]]])  # dup PK
    orders.to_parquet(str(tmp_path / "orders.parquet"))
    li = pd.read_parquet(f"{base}/lineitem.parquet")
    li.loc[li.index[:3], "l_orderkey"] = -999  # 3 orphans
    li.to_parquet(str(tmp_path / "lineitem.parquet"))

    out = {r.check_name: r for r in star_integrity_audit(spark, str(tmp_path)).collect()}
    assert out["pk_orders"].n_violations == 1
    assert out["fk_lineitem_orders"].n_violations == 3
    assert out["pk_customer"].n_violations == 0
    assert out["fk_nation_region"].n_violations == 0
    assert out["fk_lineitem_orders"].violation_ppm == 3 * 1_000_000 // out["fk_lineitem_orders"].n_rows


def test_lang_id_confusion_diagonal_dominates(spark, sf_oracle_dir):
    from data_frame_demo_etl_spark.functions.gate import lang_id_confusion

    rows = lang_id_confusion(spark, sf_oracle_dir).collect()
    by_actual = {}
    for r in rows:
        by_actual.setdefault(r.actual, []).append(r)
    for actual, rs in by_actual.items():
        assert sum(x.row_share_ppm for x in rs) <= 1_000_000
        diag = [x for x in rs if x.predicted == actual]
        if diag:  # the heuristic should win its own language's row
            assert diag[0].n == max(x.n for x in rs)


def test_funnel_time_to_convert_planted(spark, tmp_path):
    import datetime

    from data_frame_demo_etl_spark.analytics.funnel import funnel_time_to_convert

    t0 = datetime.datetime(2024, 1, 1)
    m = lambda mm: t0 + datetime.timedelta(minutes=mm)
    rows = [
        # user 1: view at 0, purchase at 10 → 600s
        (1, m(0), 1, "view", 1.0, "{}"),
        (2, m(10), 1, "purchase", 1.0, "{}"),
        # user 2: view at 0, purchase at 30 → 1800s
        (3, m(0), 2, "view", 1.0, "{}"),
        (4, m(30), 2, "purchase", 1.0, "{}"),
        # user 3: purchase BEFORE any view → not a conversion
        (5, m(5), 3, "purchase", 1.0, "{}"),
        (6, m(9), 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = funnel_time_to_convert(spark, str(tmp_path)).collect()[0]
    assert out.n_conversions == 2
    assert out.min_us == 600 * 1_000_000 and out.max_us == 1800 * 1_000_000
    assert out.median2_us == (600 + 1800) * 1_000_000  # doubled median


def test_ab_test_planted_effect(spark, tmp_path):
    import datetime

    from data_frame_demo_etl_spark.analytics.quality_audit import events_ab_test

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # group A (even users): 80% success; group B (odd): 20% success
    for u in range(200):
        eid += 1
        succ = (u % 10) < 8 if u % 2 == 0 else (u % 10) < 2
        rows.append((eid, t0, u, "t", 1.0 if succ else 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = events_ab_test(spark, str(tmp_path)).collect()[0]
    assert out.n_a == 100 and out.n_b == 100
    assert out.rate_diff_micro == 600_000  # 0.8 - 0.2
    assert out.z_micro > 8_000_000  # hugely significant


def test_gini_extremes(spark):
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.analytics.quality_audit import gini_skew

    # perfectly even: 4 keys × 5 rows → gini 0
    even = spark.range(20).select((F.col("id") % 4).alias("k"))
    r = gini_skew(even, "k").collect()[0]
    assert r.n_keys == 4 and r.n_rows == 20 and r.gini_micro == 0
    # extreme skew: one key owns 97 of 100 rows
    skew = spark.range(100).select(
        F.when(F.col("id") < 97, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    r2 = gini_skew(skew, "k").collect()[0]
    assert r2.n_keys == 4 and r2.gini_micro > 600_000


def test_dedup_sketch_eval_collapses_exact_duplicates(spark, tmp_path):
    """The r7 definition: the evaluation runs over DISTINCT texts —
    exact copies contribute nothing (identical signatures and Jaccard
    1 land in n_both by construction, pure count inflation), so the
    copy-pairs (1,2)/(3,4) are excluded while the genuine near-dup
    value pair (base vs base+tail) is still scored by both
    pipelines."""
    from data_frame_demo_etl_spark.dedup.gate import dedup_sketch_eval

    base = (
        "the quick brown fox jumps over the lazy dog near the old wooden "
        "bridge while other animals watch from the river bank in the rain"
    )
    alt = "completely different text about warehouse analytics engines at scale running on spark clusters every day"
    rows = [(1, base), (2, base), (3, alt), (4, alt), (5, base + " extra tail words here")]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = dedup_sketch_eval(spark, str(tmp_path)).collect()[0]
    # only distinct-text pairs count: (base, base+tail) is the one
    # exact near-dup; the copy-pairs are collapsed away
    assert out.n_exact == 1
    assert out.n_both <= min(out.n_exact, out.n_sketch)
    assert out.precision_ppm <= 1_000_000 and out.recall_ppm <= 1_000_000
    # the genuine near-dup pair is found by the sketch too
    assert out.recall_ppm == 1_000_000


def test_keyed_prefix_raises_on_high_cardinality(spark, monkeypatch):
    """The low-cardinality contract fails loudly: more (partition, key)
    offset rows than MAX_OFFSET_ROWS fails the job (lazy raise_error
    guard, r12) instead of building an unbounded offset broadcast."""
    import pytest

    from data_frame_demo_etl_spark.analytics import quality_audit as qa

    monkeypatch.setattr(qa, "MAX_OFFSET_ROWS", 16)
    wide = spark.range(200).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").alias("ord"),
        F.lit(1).alias("v"),
    )
    with pytest.raises(Exception, match="high-cardinality"):
        qa._keyed_prefix(wide, ["ord"], "v").collect()


def test_keyed_prefix_native_long_key(spark):
    """A non-string key joins back on its native type (no implicit
    cross-type casts): per-key prefix sums are exact for long keys."""
    from data_frame_demo_etl_spark.analytics.quality_audit import _keyed_prefix

    # keys 2 and 10: str-sorted '10' < '2' but native 2 < 10 — the
    # offset accumulation must not care either way
    rows = [(2, i, 1) for i in range(40)] + [(10, i, 2) for i in range(40)]
    df = spark.createDataFrame(rows, "key long, ord long, v long")
    out = _keyed_prefix(df, ["ord"], "v")
    assert out.schema["key"].dataType.typeName() == "long"
    got = {(r.key, r.k): r.cum for r in out.collect()}
    assert got[(2, 40)] == 40 and got[(10, 40)] == 80
    assert got[(2, 1)] == 1 and got[(10, 1)] == 2
    nt = {r.key: (r.n, r.t) for r in out.select("key", "n", "t").distinct().collect()}
    assert nt == {2: (40, 40), 10: (40, 80)}


def test_keyed_prefix_survives_cache_eviction(spark):
    """Recompute-safety audit (r12 verdict item 8): pass-2 correctness
    depends on pass 1's repartitionByRange layout being re-readable —
    under cache EVICTION a partition is recomputed through the range
    exchange, whose boundary sampling is deterministic for an
    unchanged, deterministic input (fixed sampling seed per RDD), so
    the result must be bit-identical. Collect the same keyed-prefix
    frame twice with every cache dropped in between: the second
    collect recomputes the whole layout from lineage — exactly the
    eviction path."""
    from data_frame_demo_etl_spark.analytics.quality_audit import _keyed_prefix

    rows = [(i % 3, (i * 7919) % 101, 1 + i % 5) for i in range(3000)]
    df = spark.createDataFrame(rows, "key long, ord long, v long")
    pre = _keyed_prefix(df, ["ord"], "v")
    first = sorted(tuple(r) for r in pre.collect())
    spark.catalog.clearCache()  # evict the layout (and any other) cache
    second = sorted(tuple(r) for r in pre.collect())
    assert first == second


def test_global_rank_survives_cache_eviction(spark, sf_dir):
    """Same eviction audit for _global_rank (features.py): the RFM
    gate's quintiles must be identical when its range layout is
    recomputed from lineage rather than served from cache."""
    from data_frame_demo_etl_spark import registry

    gate = registry.queries()["customer_rfm_segments"]
    df = gate(spark, sf_dir)
    first = sorted(tuple(r) for r in df.collect())
    spark.catalog.clearCache()
    second = sorted(tuple(r) for r in df.collect())
    assert first == second


def test_gini_empty_input_matches_oracle_shape(spark):
    """Empty input ⇒ zero rows from the gate AND from the oracle (the
    HAVING COUNT(*) > 0 guard) — no gate/oracle shape divergence on a
    degenerate corpus."""
    import duckdb

    from data_frame_demo_etl_spark.analytics.quality_audit import (
        LINEITEM_SUPPLIER_GINI_SQL,
        gini_skew,
    )

    empty = spark.createDataFrame([], "k long")
    assert gini_skew(empty, "k").count() == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem (l_suppkey BIGINT)")
    assert len(con.execute(LINEITEM_SUPPLIER_GINI_SQL).fetchall()) == 0


def test_funnel_time_to_convert_empty_matches_oracle(spark, tmp_path):
    """No conversions ⇒ one all-zero row on BOTH engines (the
    0-convention COALESCE in the oracle)."""
    import datetime

    import duckdb

    from data_frame_demo_etl_spark.analytics.funnel import (
        FUNNEL_TIME_TO_CONVERT_SQL,
        funnel_time_to_convert,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0, 1, "purchase", 1.0, "{}"), (2, t0, 2, "view", 1.0, "{}")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)
    out = funnel_time_to_convert(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert (out[0].n_conversions, out[0].min_us, out[0].max_us, out[0].median2_us) == (0, 0, 0, 0)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")
    o = con.execute(FUNNEL_TIME_TO_CONVERT_SQL).fetchall()
    assert o == [(0, 0, 0, 0)]
