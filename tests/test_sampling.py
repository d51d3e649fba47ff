from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_frame_demo_etl_spark.operators.sampling import (
    cap_per_key,
    deterministic_sample,
    pack_by_budget,
    split_by_hash,
    stratified_sample,
)
from data_frame_demo_etl_spark.sources.catalog import load_table


def test_deterministic_sample_stable_and_sized(spark, sf_oracle_dir):
    docs = load_table(spark, "documents", sf_oracle_dir)
    s1 = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.2).collect()}
    s2 = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.2).collect()}
    assert s1 == s2  # stable across runs
    n = docs.count()
    assert 0.12 * n <= len(s1) <= 0.28 * n
    # Larger fraction is a superset (threshold semantics).
    s3 = {r.doc_id for r in deterministic_sample(docs, ["doc_id"], 0.5).collect()}
    assert s1 <= s3


def test_split_by_hash_partitions(spark, sf_oracle_dir):
    docs = load_table(spark, "documents", sf_oracle_dir)
    splits = split_by_hash(docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    ids = {k: {r.doc_id for r in v.collect()} for k, v in splits.items()}
    all_ids = {r.doc_id for r in docs.collect()}
    assert ids["train"] | ids["val"] | ids["test"] == all_ids
    assert not (ids["train"] & ids["val"]) and not (ids["val"] & ids["test"])
    assert len(ids["train"]) > len(ids["val"])

    with pytest.raises(ValueError, match="sum to 1"):
        split_by_hash(docs, ["doc_id"], {"a": 0.5})


def test_stratified_sample_fractions(spark, sf_oracle_dir):
    events = load_table(spark, "events", sf_oracle_dir)
    sampled = stratified_sample(events, "event_type", {"view": 0.5, "click": 0.1})
    got = {r["event_type"]: r["cnt"] for r in sampled.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    base = {r["event_type"]: r["cnt"] for r in events.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    assert set(got) <= {"view", "click"}
    assert abs(got.get("view", 0) / base["view"] - 0.5) < 0.15


def test_cap_per_key(spark):
    df = spark.createDataFrame([(1, i) for i in range(10)] + [(2, 0)], ["k", "v"])
    out = cap_per_key(df, ["k"], ["v"], 3).collect()
    by_k = {}
    for r in out:
        by_k.setdefault(r.k, []).append(r.v)
    assert sorted(by_k[1]) == [0, 1, 2]  # earliest survive
    assert by_k[2] == [0]


def test_pack_by_budget(spark):
    rows = [("s", i, 600) for i in range(7)]  # 600 each, budget 2000 → 3 per bin
    df = spark.createDataFrame(rows, ["g", "i", "sz"])
    out = {r.i: r.bin for r in pack_by_budget(df, "g", ["i"], "sz", 2000).collect()}
    assert [out[i] for i in range(7)] == [0, 0, 0, 0, 1, 1, 1]


def test_portable_sample_properties(spark):
    """Property-style checks on the md5-prefix portable sample:
    monotone in fraction (nested thresholds), exact bounds at 0/1,
    pure-python reproducibility of the engine's row choice."""
    import hashlib

    from data_frame_demo_etl_spark.operators.sampling import portable_sample

    df = spark.createDataFrame([(i,) for i in range(2000)], ["k"])
    kept = {}
    for frac in (0.0, 0.1, 0.3, 0.7, 1.0):
        kept[frac] = {r.k for r in portable_sample(df, ["k"], frac).collect()}
    assert kept[0.0] == set()
    assert kept[1.0] == set(range(2000))
    assert kept[0.1] <= kept[0.3] <= kept[0.7]  # thresholds nest
    # Python replicates the exact membership rule (engine-portable).
    expected = {
        i for i in range(2000)
        if hashlib.md5(str(i).encode()).hexdigest()[:8] < format(int(0.3 * 16**8), "08x")
    }
    assert kept[0.3] == expected


def test_split_by_hash_property(spark):
    """Hypothesis over fraction vectors: splits are always disjoint
    and exhaustive, and a row's split assignment never changes when
    OTHER fractions of the remaining mass move."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    df = spark.createDataFrame([(i,) for i in range(500)], ["k"]).cache()
    df.count()

    @settings(max_examples=8, deadline=None)
    @given(st.floats(min_value=0.1, max_value=0.8))
    def check(train_frac):
        rest = 1.0 - train_frac
        splits = split_by_hash(
            df, ["k"], {"train": train_frac, "val": rest / 2, "test": rest / 2}
        )
        ids = {name: {r.k for r in d.collect()} for name, d in splits.items()}
        assert ids["train"] | ids["val"] | ids["test"] == set(range(500))
        assert not (ids["train"] & ids["val"]) and not (ids["val"] & ids["test"])
        assert not (ids["train"] & ids["test"])
        # first-interval stability: shrinking later splits never moves
        # a train row out (intervals are [0, f) prefixes of the hash)
        smaller = split_by_hash(df, ["k"], {"train": train_frac, "val": rest, "test": 0.0})
        assert ids["train"] == {r.k for r in smaller["train"].collect()}

    check()


def test_portable_weighted_sample_rates_and_determinism(spark):
    """Full-keep stratum keeps everything, zero stratum nothing,
    unknown strata fall to default_rate; the kept set matches a
    Python md5 replay exactly."""
    import hashlib

    from data_frame_demo_etl_spark.operators.sampling import portable_weighted_sample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "src"])
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    kept = portable_weighted_sample(df, "src", rates, ["id"]).collect()

    def keep(i, src):
        thr = int(rates.get(src, 0.0) * 2**32)
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) < thr

    expected = {(i, s) for i, s in rows if keep(i, s)}
    assert {(r.id, r.src) for r in kept} == expected
    assert all(s != "c" for _, s in expected)
    assert sum(1 for i, s in rows if s == "a") == sum(1 for _, s in expected if s == "a")

    with pytest.raises(ValueError):
        portable_weighted_sample(df, "src", {"a": 1.5}, ["id"])


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """A-ES property check: with weights 100 vs 1, heavy rows dominate
    the sample; determinism across calls; k rows returned."""
    from data_frame_demo_etl_spark.operators.weighted_sample import weighted_sample

    rows = [(i, 100) for i in range(200)] + [(1000 + i, 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    s1 = weighted_sample(df, "w", k=100).toPandas()
    s2 = weighted_sample(df, "w", k=100).toPandas()
    assert s1.equals(s2)
    assert len(s1) == 100
    heavy = (s1.doc_id < 1000).sum()
    assert heavy >= 80  # weight-100 rows should dominate


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from data_frame_demo_etl_spark.operators.weighted_sample import weighted_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, 7)], "doc_id long, w long"
    )
    got = weighted_sample(df, "w", k=10).toPandas()
    assert set(got.doc_id) == {1, 4}


# ─────────────── P10: exact-quota stratified sampling ───────────────


def _strat_docs(spark, spec):
    rows = []
    i = 0
    for src, n in spec.items():
        for _ in range(n):
            rows.append((i, f"text {i}", "en", src, 10))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_stratified_quota_exact_budget_and_allocation(spark):
    from data_frame_demo_etl_spark.operators.weighted_sample import (
        stratified_quota_sample,
    )

    # counts 7/2/1, 50% budget → N=5; floors 3/1/0, one remainder goes
    # to the largest fractional part (tie 5%≡5% between s0 and s2 →
    # smaller name wins): quotas 4/1/0.
    docs = _strat_docs(spark, {"s0": 7, "s1": 2, "s2": 1})
    out = stratified_quota_sample(docs, frac_ppm=500_000).collect()
    per = {}
    for r in out:
        per[r.source] = per.get(r.source, 0) + 1
    assert sum(per.values()) == 5
    assert per == {"s0": 4, "s1": 1}
    # pick_rank is 1..quota within each stratum
    ranks = sorted(r.pick_rank for r in out if r.source == "s0")
    assert ranks == [1, 2, 3, 4]


def test_stratified_quota_deterministic_and_gate(spark, sf_dir):
    from data_frame_demo_etl_spark.operators.weighted_sample import (
        docs_stratified_sample,
    )

    a = sorted(map(tuple, docs_stratified_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, docs_stratified_sample(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_stratified_quota_empty(spark):
    from data_frame_demo_etl_spark.operators.weighted_sample import (
        stratified_quota_sample,
    )

    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert stratified_quota_sample(docs).count() == 0
