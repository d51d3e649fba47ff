"""Stream-stream join: purchases ⋈ errors within a time interval, both
sides watermarked — the Structured Streaming feature that requires
state on BOTH sides. Verified against the batch range join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.operators.temporal import range_join

T0 = dt.datetime(2024, 1, 1)
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _rows():
    out = []
    for i in range(40):
        out.append((i, T0 + dt.timedelta(minutes=i * 3), 10 + (i % 3), "purchase"))
    for i in range(30):
        out.append((1000 + i, T0 + dt.timedelta(minutes=i * 4 + 1), 10 + (i % 3), "error"))
    return out


def test_stream_stream_interval_join(spark, tmp_path):
    src = str(tmp_path / "events")
    spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("p_id"), F.col("user_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "10 minutes")
    )
    errors = (
        stream.filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("e_id"), F.col("user_id"), F.col("ts").alias("e_ts"))
        .withWatermark("e_ts", "10 minutes")
    )
    joined = purchases.join(
        errors,
        (purchases.user_id == errors.user_id)
        & (errors.e_ts >= purchases.p_ts)
        & (errors.e_ts <= purchases.p_ts + F.expr("INTERVAL 10 MINUTES")),
    ).select("p_id", "e_id")

    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.p_id, r.e_id) for r in spark.sql("SELECT * FROM ss_join").collect()}

    batch = spark.createDataFrame(_rows(), SCHEMA)
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    )
    e = batch.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), "user_id", "ts"
    )
    want = {
        (r.p_id, r.e_id_r)
        for r in range_join(p, e, on="ts", by=["user_id"], lo_seconds=0, hi_seconds=600)
        .withColumnRenamed("e_id_r", "e_id_r")
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: per-event segment enrichment from a static
    dim produces exactly the batch join's rows (availableNow drain),
    and the physical plan broadcasts the dim (no stream-side shuffle,
    no state store)."""
    from data_frame_demo_etl_spark.streaming.events import enrich_with_dim

    src = str(tmp_path / "events")
    spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(src)
    dim = spark.createDataFrame(
        [(10, "gold"), (11, "silver")], "d_user_id long, segment string"
    )

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    enriched = enrich_with_dim(stream, dim, "user_id", "d_user_id").select(
        "event_id", "segment"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("ss_enrich")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.event_id, r.segment) for r in spark.sql("SELECT * FROM ss_enrich").collect()}

    batch = spark.createDataFrame(_rows(), SCHEMA)
    want = {
        (r.event_id, r.segment)
        for r in enrich_with_dim(batch, dim, "user_id", "d_user_id")
        .select("event_id", "segment")
        .collect()
    }
    assert got == want and len(want) > 0
    # Plan shape: the dim must be broadcast, not shuffled.
    from data_frame_demo_etl_spark.operators.audit import plan_report

    rep = plan_report(enrich_with_dim(batch, dim, "user_id", "d_user_id"))
    assert rep.broadcast_joins >= 1 and rep.sort_merge_joins == 0
