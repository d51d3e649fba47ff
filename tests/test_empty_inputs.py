"""Empty-input behavior: every operator must return a well-formed
empty result, not crash — the difference between an engine and a
script collection."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.dedup.clusters import connected_components
from data_frame_demo_etl_spark.dedup.jaccard import jaccard_pairs
from data_frame_demo_etl_spark.dedup.minhash import minhash_near_dup_pairs
from data_frame_demo_etl_spark.dedup.simhash import simhash_near_dup_pairs
from data_frame_demo_etl_spark.operators.combine import concat_frames, merge_frames
from data_frame_demo_etl_spark.operators.dedupe import dedup_exact, dedupe_keep_first
from data_frame_demo_etl_spark.operators.profile import profile_metrics
from data_frame_demo_etl_spark.operators.sampling import cap_per_key, pack_by_budget
from data_frame_demo_etl_spark.operators.transform import (
    combine_on_aggregate,
    unpivot,
    winsorize,
)
from data_frame_demo_etl_spark.streaming.events import sessionize


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_dedup_ops_on_empty_corpus(spark):
    docs = _empty_docs(spark)
    assert jaccard_pairs(docs).count() == 0
    assert minhash_near_dup_pairs(docs).count() == 0
    assert simhash_near_dup_pairs(docs).count() == 0
    assert dedup_exact(docs, "text", "doc_id").count() == 0


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
    assert connected_components(pairs, driver_threshold=0).count() == 0


def test_transform_ops_on_empty(spark):
    df = spark.createDataFrame([], "id long, a double, b double")
    assert unpivot(df, ["id"], ["a", "b"]).count() == 0
    assert combine_on_aggregate(df, ["id"]).count() == 0
    assert winsorize(df, "a", ["id"]).count() == 0
    assert dedupe_keep_first(df, ["id"], ["a"]).count() == 0
    assert cap_per_key(df, ["id"], ["a"], 3).count() == 0
    assert pack_by_budget(df, "id", ["a"], "b", 100).count() == 0


def test_combine_and_profile_on_empty(spark):
    df = spark.createDataFrame([], "k long, v string")
    assert concat_frames([df, df]).count() == 0
    assert merge_frames([df, df], keys=["k"]).count() == 0
    metrics = profile_metrics(df)
    assert metrics["rows"] == 0 and metrics["duplicates"] == 0


def test_sessionize_empty(spark):
    df = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    assert sessionize(df).count() == 0


def test_packing_and_salted_join_on_empty(spark):
    from data_frame_demo_etl_spark.operators.packing import pack_token_sequences
    from data_frame_demo_etl_spark.operators.skew import salted_join

    assert pack_token_sequences(_empty_docs(spark), seq_len=16).count() == 0

    empty = spark.createDataFrame([], "k long, v string")
    one = spark.createDataFrame([(1, "x")], "k long, t string")
    assert salted_join(empty, one, "k").count() == 0
    assert salted_join(one, empty.select("k", F.col("v").alias("t2")), "k").count() == 0
    assert salted_join(one, empty.select("k", F.col("v").alias("t2")), "k", how="left").count() == 1


def test_round4_ops_on_empty(spark):
    from data_frame_demo_etl_spark.analytics.timeseries import interpolate_linear
    from data_frame_demo_etl_spark.analytics.triangles import count_triangles

    empty_edges = spark.createDataFrame([], "u long, v long")
    row = count_triangles(empty_edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (0, 0, 0)

    empty_series = spark.createDataFrame([], "k string, ts timestamp, v double")
    assert interpolate_linear(empty_series, "k", "ts", "v").count() == 0


def test_psi_empty_inputs(spark):
    from data_frame_demo_etl_spark.analytics.drift import psi_by_group

    empty = spark.createDataFrame([], "g string, value double")
    out = psi_by_group(empty, empty, "g", "value")
    assert out.count() == 0
    assert set(out.columns) == {"grp", "n_ref", "n_cur", "psi_micro"}


def test_rolling_distinct_empty(spark):
    from data_frame_demo_etl_spark.analytics.timeseries import rolling_distinct

    empty = spark.createDataFrame([], "user_id long, ts timestamp")
    assert rolling_distinct(empty).count() == 0


def test_association_rules_empty(spark):
    from data_frame_demo_etl_spark.analytics.market_basket import association_rules

    empty = spark.createDataFrame([], "basket_id long, item string")
    assert association_rules(empty).count() == 0


def test_mad_outliers_empty(spark):
    from data_frame_demo_etl_spark.analytics.robust import mad_outliers

    empty = spark.createDataFrame(
        [], "user_id long, event_id long, ts timestamp, value double, event_type string"
    )
    assert mad_outliers(empty).count() == 0


def test_trend_ols_empty(spark):
    from data_frame_demo_etl_spark.analytics.trend import trend_ols

    empty = spark.createDataFrame([], "grp string, x long, y long")
    assert trend_ols(empty).count() == 0


def test_kmv_empty(spark):
    from data_frame_demo_etl_spark.analytics.cms import kmv_distinct

    empty = spark.createDataFrame([], "g string, k long")
    assert kmv_distinct(empty, "g", "k").count() == 0


def test_ahash_pairs_empty(spark):
    from data_frame_demo_etl_spark.multimodal.phash import ahash_near_dup_pairs

    empty = spark.createDataFrame([], "asset_id long, ahash long")
    assert ahash_near_dup_pairs(empty).count() == 0


def test_round9_ops_on_empty(spark):
    """decontaminate, DSIR keys, and the unigram trainer on an empty
    corpus: well-formed empty results, no driver-side int(None)."""
    from data_frame_demo_etl_spark.dedup.contamination import decontaminate
    from data_frame_demo_etl_spark.functions.lm import dsir_importance_keys
    from data_frame_demo_etl_spark.functions.unigram import unigram_lm_train

    docs = _empty_docs(spark)
    assert decontaminate(docs, docs).count() == 0
    keys = dsir_importance_keys(docs, F.lit(False))
    assert keys.count() == 0
    assert set(keys.columns) == {"doc_id", "n_bigrams", "score_q", "dsir_key"}
    vocab = unigram_lm_train(docs)
    assert vocab.count() == 0
    assert set(vocab.columns) == {"piece", "n_used", "lpq"}
