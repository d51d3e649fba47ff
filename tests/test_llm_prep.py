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
