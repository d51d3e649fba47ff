from __future__ import annotations

from data_frame_demo_etl_spark.pipelines_llm import prepare_corpus, prepare_training_set
from data_frame_demo_etl_spark.sources.catalog import load_table


def test_prepare_training_set(spark, sf_oracle_dir):
    docs = load_table(spark, "documents", sf_oracle_dir)
    corpus_n = prepare_corpus(docs).count()
    assert 0 < corpus_n < docs.count()  # filters + dedup actually removed rows

    splits = prepare_training_set(docs, budget=2000)
    ids = {k: {r.doc_id for r in v.collect()} for k, v in splits.items()}
    total = set().union(*ids.values())
    assert len(total) == corpus_n
    assert not (ids["train"] & ids["val"]) and not (ids["train"] & ids["test"])
    # Packing produced sane bins: bin ids start at 0 per source group.
    sample = splits["train"].filter("bin = 0").count()
    assert sample > 0


def test_prepare_training_set_with_decontamination(spark, sf_oracle_dir):
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_oracle_dir)
    # Use a handful of corpus docs themselves as the "benchmark":
    # they must disappear from every split.
    eval_set = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    splits = prepare_training_set(docs, eval_set=eval_set)
    all_ids = set()
    for df in splits.values():
        all_ids |= {r.doc_id for r in df.collect()}
    assert not (all_ids & {0, 1, 2, 3, 4})
