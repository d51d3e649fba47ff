"""Behavioral verification for the trained quality classifier: a
planted, cleanly separable corpus must train to near-perfect held-out
accuracy; scoring must be deterministic within a session and produce a
plain relational schema."""

from __future__ import annotations

import random

from data_frame_demo_etl_spark.functions.quality_model import (
    FEATURES,
    featurize,
    score_documents,
    train_quality_classifier,
)

STOP = "the of and to in is was for on with"
PUNCT = "$%#@!^&*()!!??;;::~~"


def _corpus(n: int, seed: int):
    """Half prose-like (label 1), half punctuation soup (label 0)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            words = [rng.choice(STOP.split()) for _ in range(30)] + [
                f"word{rng.randrange(50)}" for _ in range(30)
            ]
            rng.shuffle(words)
            rows.append((i, " ".join(words), 1))
        else:
            junk = " ".join(
                "".join(rng.choice(PUNCT) for _ in range(rng.randrange(2, 8)))
                for _ in range(20)
            )
            rows.append((i, junk, 0))
    return rows


def test_classifier_separates_planted_corpus(spark):
    train = spark.createDataFrame(_corpus(200, 1), "doc_id long, text string, label int")
    test = spark.createDataFrame(_corpus(80, 2), "doc_id long, text string, label int")
    model = train_quality_classifier(train)
    scored = score_documents(model, test)
    rows = scored.collect()
    acc = sum(int(r.keep) == r.label for r in rows) / len(rows)
    assert acc >= 0.95, f"held-out accuracy {acc}"
    # plain relational output: ML vector columns dropped
    assert {"keep_probability", "keep"} <= set(scored.columns)
    assert not any(c.startswith("__") for c in scored.columns)


def test_featurize_is_deterministic_and_bounded(spark):
    df = spark.createDataFrame(_corpus(40, 3), "doc_id long, text string, label int")
    a = featurize(df).select("doc_id", *FEATURES).collect()
    b = featurize(df).select("doc_id", *FEATURES).collect()
    assert a == b
    for r in a:
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.dup_word_frac <= 1.0
        assert 0.0 <= r.alpha_word_ratio <= 1.0


def test_scores_reproducible(spark):
    train = spark.createDataFrame(_corpus(100, 4), "doc_id long, text string, label int")
    model = train_quality_classifier(train)
    s1 = {r.doc_id: r.keep_probability for r in score_documents(model, train).collect()}
    s2 = {r.doc_id: r.keep_probability for r in score_documents(model, train).collect()}
    assert s1 == s2


def test_classifier_composes_into_curation_flow(spark, sf_dir):
    """End-to-end composition on the real documents table: train on a
    planted corpus, score the corpus, keep-filter, exact-dedup the
    keepers, then pack by budget — each stage a plain DataFrame, one
    lazy plan until the final action."""
    from data_frame_demo_etl_spark.operators.dedupe import dedup_exact
    from data_frame_demo_etl_spark.operators.sampling import pack_by_budget
    from data_frame_demo_etl_spark.sources.catalog import load_table

    train = spark.createDataFrame(_corpus(120, 7), "doc_id long, text string, label int")
    model = train_quality_classifier(train)

    docs = load_table(spark, "documents", sf_dir)
    scored = score_documents(model, docs)
    kept = scored.filter("keep")
    deduped = dedup_exact(kept, text_col="text", id_col="doc_id")
    packed = pack_by_budget(
        deduped.select("doc_id", "source", "n_chars"),
        group_col="source",
        order_by=["doc_id"],
        size_col="n_chars",
        budget=2000,
    )
    n_docs, n_kept, n_dedup = docs.count(), kept.count(), deduped.count()
    assert 0 < n_dedup <= n_kept <= n_docs
    rows = packed.collect()
    assert len(rows) == n_dedup
    assert all(r.bin >= 0 for r in rows)
