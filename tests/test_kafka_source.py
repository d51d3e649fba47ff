"""Kafka wrapper tests — no broker: the options surface is pure data,
the decode stage runs on batch frames with Kafka's exact record
schema, and the reader seam is exercised with a recording fake."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_frame_demo_etl_spark.sources.kafka import (
    KAFKA_RECORD_SCHEMA,
    KafkaSourceConfig,
    decode_kafka_records,
    read_kafka_stream,
)


def test_options_subscribe_defaults():
    cfg = KafkaSourceConfig(bootstrap_servers="broker1:9092,broker2:9092", subscribe="events,orders")
    opts = cfg.options()
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events,orders",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
    }


def test_options_exactly_one_subscription_mode():
    with pytest.raises(ValueError, match="exactly one"):
        KafkaSourceConfig(bootstrap_servers="b:9092").options()
    with pytest.raises(ValueError, match="exactly one"):
        KafkaSourceConfig(
            bootstrap_servers="b:9092", subscribe="t", subscribe_pattern="t.*"
        ).options()


def test_options_offsets_and_limits():
    cfg = KafkaSourceConfig(
        bootstrap_servers="b:9092",
        assign={"events": [0, 1]},
        starting_offsets={"events": {"0": 23, "1": -2}},
        ending_offsets="latest",
        max_offsets_per_trigger=100_000,
        min_partitions=64,
        fail_on_data_loss=False,
        group_id_prefix="graft",
        kafka_options={"security.protocol": "SASL_SSL", "kafka.fetch.max.bytes": "1048576"},
    )
    opts = cfg.options()
    assert json.loads(opts["assign"]) == {"events": [0, 1]}
    assert json.loads(opts["startingOffsets"]) == {"events": {"0": 23, "1": -2}}
    assert opts["endingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["minPartitions"] == "64"
    assert opts["failOnDataLoss"] == "false"
    assert opts["groupIdPrefix"] == "graft"
    # kafka. prefix added when missing, kept when present
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.fetch.max.bytes"] == "1048576"


def test_options_rejects_bad_offset_literal():
    with pytest.raises(ValueError, match="starting_offsets"):
        KafkaSourceConfig(
            bootstrap_servers="b:9092", subscribe="t", starting_offsets="beginning"
        ).options()


class _RecordingReader:
    """Stands in for spark.readStream: records format + options."""

    def __init__(self, result):
        self.result = result
        self.fmt = None
        self.opts = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def options(self, **kw):
        self.opts.update(kw)
        return self

    def load(self):
        return self.result


def test_read_kafka_stream_hands_spark_the_right_options(spark):
    sentinel = spark.range(1)
    rec = _RecordingReader(sentinel)
    cfg = KafkaSourceConfig(bootstrap_servers="b:9092", subscribe="events")
    out = read_kafka_stream(spark, cfg, reader_factory=lambda s: rec)
    assert out is sentinel
    assert rec.fmt == "kafka"
    assert rec.opts == cfg.options()


def _kafka_batch(spark, payloads, topic="events"):
    rows = [
        (
            str(i).encode(),
            p.encode() if p is not None else None,
            topic,
            i % 2,
            i,
            None,
            0,
        )
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA).withColumn(
        "timestamp", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("offset"))
    )


def test_decode_json_with_quarantine(spark):
    good = json.dumps({"user_id": 7, "event_type": "click", "value": 1.5})
    batch = _kafka_batch(spark, [good, "{not json", None])
    out = decode_kafka_records(
        batch, "json", "user_id long, event_type string, value double"
    )
    rows = {r.offset: r for r in out.collect()}
    assert rows[0].user_id == 7 and rows[0].event_type == "click" and rows[0]._raw is None
    # Malformed payload: typed columns NULL, raw text kept for quarantine.
    assert rows[1].user_id is None and rows[1]._raw == "{not json"
    # NULL payload (tombstone): not quarantined, just NULL.
    assert rows[2].user_id is None and rows[2]._raw is None
    assert rows[0].key == "0" and rows[0].topic == "events"


def test_decode_csv_and_string(spark):
    batch = _kafka_batch(spark, ["7,click,1.5"])
    out = decode_kafka_records(
        batch, "csv", "user_id long, event_type string, value double"
    ).collect()[0]
    assert (out.user_id, out.event_type, out.value) == (7, "click", 1.5)

    s = decode_kafka_records(_kafka_batch(spark, ["hello"]), "string").collect()[0]
    assert s.text == "hello"


def test_decode_requires_schema_for_json():
    with pytest.raises(ValueError, match="schema_ddl"):
        decode_kafka_records(None, "json")


def test_kafka_shaped_stream_feeds_windowed_agg(spark, tmp_path):
    """End-to-end minus broker: a file stream carrying Kafka's record
    schema goes through decode → watermark → tumbling window — the
    wrapper's output plugs straight into the streaming operators."""
    payloads = [
        json.dumps({"user_id": u, "event_type": "view", "value": 1.0}) for u in range(20)
    ]
    src = str(tmp_path / "records")
    _kafka_batch(spark, payloads).write.parquet(src)

    stream = spark.readStream.schema(KAFKA_RECORD_SCHEMA).parquet(src)
    decoded = decode_kafka_records(
        stream, "json", "user_id long, event_type string, value double"
    )
    agg = (
        decoded.filter(F.col("_raw").isNull())
        .withWatermark("timestamp", "1 minute")
        .groupBy(F.window("timestamp", "1 minute"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("kafka_windowed")
        # complete mode: a single availableNow batch never advances
        # the watermark past the window end, so append would emit
        # nothing until a later batch arrives.
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_type, n, total FROM kafka_windowed").collect()
    assert sum(r.n for r in got) == 20
    assert all(r.event_type == "view" for r in got)
