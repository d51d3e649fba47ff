"""Continuous corpus ingestion with incremental near-dup admission —
the production loop a training-data pipeline actually runs: a stream
of document batches, each admitted against the LSH index of
everything accepted so far, with the index updated as part of the
same epoch.

Composition of three engine pieces:
- dedup/incremental.py's index probe (cost per batch independent of
  corpus size outside the touched buckets);
- the exactly-once foreachBatch recipe (events.idempotent_batch_writer
  precedent): every write lands in its OWN ``batch_id=N`` directory,
  so replaying a failed epoch overwrites identical data instead of
  duplicating it — admitted docs AND index deltas stay consistent;
- parquet-dir state: the index is plain parquet (signatures + capped
  band buckets), readable by any session, no driver state.

At 100 TB the index is corpus-sized but bucket-bounded per probe; the
per-batch work is |batch| signature builds + one bucket equi-join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..dedup.incremental import build_lsh_index, incremental_dedup_batch

_EMPTY_DOCS = "doc_id long, text string"


def _load_index(spark: SparkSession, index_dir: str, before_batch_id: int | None = None):
    """(signatures, buckets) for the accepted corpus; empty-but-typed
    frames when no batch has committed yet.

    ``before_batch_id`` bounds the read to index deltas from STRICTLY
    EARLIER epochs. This is what makes replay idempotent: a retried
    epoch N (crash after the ``batch_id=N`` delta dirs were written
    but before the streaming checkpoint committed) must NOT see its
    own failed attempt's deltas — otherwise every previously-admitted
    doc collides with its own signature (est_jaccard = 1.0), the whole
    batch is rejected, and the replay overwrites corpus and index with
    empty data. The filter is on the ``batch_id`` partition column, so
    it is pure partition pruning (no data read from excluded epochs).
    """
    sig_dir, bucket_dir = f"{index_dir}/signatures", f"{index_dir}/buckets"
    if os.path.isdir(sig_dir):
        sig, bb = spark.read.parquet(sig_dir), spark.read.parquet(bucket_dir)
        if before_batch_id is not None:
            sig = sig.filter(sig["batch_id"] < before_batch_id)
            bb = bb.filter(bb["batch_id"] < before_batch_id)
        return sig.drop("batch_id"), bb.drop("batch_id")
    empty = spark.createDataFrame([], _EMPTY_DOCS)
    sig, bb = build_lsh_index(empty)
    return sig, bb


def make_dedup_ingest_batch_fn(index_dir: str, out_dir: str, threshold: float = 0.8):
    """foreachBatch closure: admit, append corpus, append index —
    all under per-epoch directories (replay-idempotent)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        sig, buckets = _load_index(spark, index_dir, before_batch_id=batch_id)
        decisions = incremental_dedup_batch(
            batch_df, sig, buckets, threshold=threshold
        )
        admitted = batch_df.join(
            decisions.filter("is_kept").select("doc_id"), "doc_id"
        ).persist()
        admitted.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        new_sig, new_buckets = build_lsh_index(admitted)
        new_sig.write.mode("overwrite").parquet(
            f"{index_dir}/signatures/batch_id={batch_id}"
        )
        new_buckets.write.mode("overwrite").parquet(
            f"{index_dir}/buckets/batch_id={batch_id}"
        )
        admitted.unpersist()
        batch_df.unpersist()

    return process


def streaming_dedup_ingest(
    stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
):
    """Wire a (doc_id, text) stream into the admission loop. Returns
    the started StreamingQuery (caller awaits/stops)."""
    return (
        stream.writeStream.foreachBatch(
            make_dedup_ingest_batch_fn(index_dir, out_dir, threshold)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
