"""Streaming corpus ingestion with incremental near-dup admission
(streaming/dedup_ingest.py): two micro-batches, the second containing
a near-dup of an accepted batch-1 doc, an in-batch dup pair, and a
fresh doc."""

from __future__ import annotations

import os
import time

from data_frame_demo_etl_spark.streaming.dedup_ingest import streaming_dedup_ingest

B1 = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "completely different text about distributed query engines and shuffles"),
]
B2 = [
    # near-dup (identical) of accepted doc 1 -> must be dropped
    (10, "the quick brown fox jumps over the lazy dog again and again today"),
    # fresh -> admitted
    (11, "novel content mentioning sketches bucket joins and admission rules"),
    # in-batch dup pair: 12 admitted (lowest id), 13 dropped
    (12, "twin paragraph shared by two batch documents word for word exactly"),
    (13, "twin paragraph shared by two batch documents word for word exactly"),
]
SCHEMA = "doc_id long, text string"


def test_streaming_dedup_ingest_two_batches(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(B1, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    # distinct mtimes => deterministic batch order under maxFilesPerTrigger
    time.sleep(1.1)
    spark.createDataFrame(B2, SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    for i, d in enumerate(sorted(src.iterdir())):
        for f in d.glob("*.parquet"):
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = streaming_dedup_ingest(
        stream,
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    kept = sorted(r.doc_id for r in corpus.collect())
    assert kept == [1, 2, 11, 12]

    # index grew with exactly the admitted docs
    sig_docs = sorted(
        r.doc for r in spark.read.parquet(str(tmp_path / "index" / "signatures")).collect()
    )
    assert sig_docs == [1, 2, 11, 12]

    # epoch directories exist (the replay-idempotence layout)
    assert (tmp_path / "corpus" / "batch_id=0").is_dir()
    assert (tmp_path / "corpus" / "batch_id=1").is_dir()


def test_replayed_epoch_reproduces_admission(spark, tmp_path):
    """Crash-replay semantics: epoch N's index deltas land on disk but
    the checkpoint never commits, so the engine re-runs epoch N with
    the SAME batch_id. The probe must not see the failed attempt's own
    deltas (else every admitted doc collides with its own signature
    and the replay silently wipes the batch)."""
    from data_frame_demo_etl_spark.streaming.dedup_ingest import (
        make_dedup_ingest_batch_fn,
    )

    fn = make_dedup_ingest_batch_fn(
        index_dir=str(tmp_path / "index"), out_dir=str(tmp_path / "corpus")
    )
    b1 = spark.createDataFrame(B1, SCHEMA)
    fn(b1, 0)
    first = sorted(
        r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus" / "batch_id=0")).collect()
    )
    assert first == [1, 2]

    # replay epoch 0: index deltas for batch_id=0 already exist on disk
    fn(b1, 0)
    replayed = sorted(
        r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus" / "batch_id=0")).collect()
    )
    assert replayed == first

    # a LATER epoch still sees epoch 0's index (near-dup of doc 1 dropped)
    fn(spark.createDataFrame(B2, SCHEMA), 1)
    admitted2 = sorted(
        r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus" / "batch_id=1")).collect()
    )
    assert admitted2 == [11, 12]
