"""Kafka source wrapper: the ``readStream.format("kafka")`` options
surface and record-decode stage, broker-free testable.

Two layers, mirroring the injectable-Transport pattern of
``sources/youtube_api.py`` (reference youtube.py:148 parity there):

1. **Options surface** (:class:`KafkaSourceConfig`): validates and
   renders the exact option dict Spark's Kafka source takes —
   exactly one of subscribe / subscribePattern / assign, offset
   specs (earliest/latest/per-partition JSON), rate limiting
   (maxOffsetsPerTrigger), and ``kafka.*`` client passthrough.
   Pure data → unit-testable with no broker.
2. **Decode stage** (:func:`decode_kafka_records`): Kafka's fixed
   record schema (key/value binary + topic/partition/offset/
   timestamp) → typed columns via JVM-side ``from_json``/``from_csv``
   /cast — never a Python UDF. Malformed payloads keep the raw bytes
   in ``_raw`` for quarantine, same discipline as the file readers.
   This is plain DataFrame code: tests run it on a batch frame with
   the same schema, so the whole serde path is real.

The only un-testable-here piece is the broker connection itself; the
``reader_factory`` seam on :func:`read_kafka_stream` lets tests
substitute a recording fake for ``spark.readStream`` and assert the
format/options handed to Spark, while production passes nothing and
gets the real source.

At scale: one Spark partition per Kafka partition; use
``minPartitions`` (passthrough option) to fan out hot topics, and
``maxOffsetsPerTrigger`` to bound micro-batch size so a backlogged
topic can't produce an unbounded first batch.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

#: The fixed schema Spark's Kafka source emits (one row per record).
KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)

_OFFSET_LITERALS = {"earliest", "latest"}


@dataclass(frozen=True)
class KafkaSourceConfig:
    """Validated Kafka source options (subscribe model + offsets +
    rate limits + client passthrough)."""

    bootstrap_servers: str
    subscribe: str | None = None
    subscribe_pattern: str | None = None
    assign: Mapping[str, list[int]] | None = None
    starting_offsets: str | Mapping[str, Mapping[str, int]] = "earliest"
    ending_offsets: str | Mapping[str, Mapping[str, int]] | None = None
    max_offsets_per_trigger: int | None = None
    min_partitions: int | None = None
    fail_on_data_loss: bool = True
    group_id_prefix: str | None = None
    kafka_options: Mapping[str, str] = field(default_factory=dict)

    def _offsets(self, spec: str | Mapping[str, Mapping[str, int]], what: str) -> str:
        if isinstance(spec, str):
            if spec not in _OFFSET_LITERALS:
                raise ValueError(
                    f"{what} must be 'earliest', 'latest', or a per-partition "
                    f"mapping, got {spec!r}"
                )
            return spec
        # {"topic": {"0": 23, "1": -2}} → JSON (-2 = earliest, -1 = latest)
        return json.dumps({t: {str(p): int(o) for p, o in parts.items()} for t, parts in spec.items()})

    def options(self) -> dict[str, str]:
        modes = {
            "subscribe": self.subscribe,
            "subscribePattern": self.subscribe_pattern,
            "assign": json.dumps({t: ps for t, ps in self.assign.items()}) if self.assign else None,
        }
        chosen = {k: v for k, v in modes.items() if v}
        if len(chosen) != 1:
            raise ValueError(
                "exactly one of subscribe / subscribe_pattern / assign is "
                f"required, got {sorted(chosen) or 'none'}"
            )
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            **chosen,
            "startingOffsets": self._offsets(self.starting_offsets, "starting_offsets"),
            "failOnDataLoss": "true" if self.fail_on_data_loss else "false",
        }
        if self.ending_offsets is not None:
            opts["endingOffsets"] = self._offsets(self.ending_offsets, "ending_offsets")
        if self.max_offsets_per_trigger is not None:
            opts["maxOffsetsPerTrigger"] = str(int(self.max_offsets_per_trigger))
        if self.min_partitions is not None:
            opts["minPartitions"] = str(int(self.min_partitions))
        if self.group_id_prefix is not None:
            opts["groupIdPrefix"] = self.group_id_prefix
        for k, v in self.kafka_options.items():
            # Client passthrough must carry the kafka. prefix Spark
            # strips before handing to the consumer.
            opts[k if k.startswith("kafka.") else f"kafka.{k}"] = str(v)
        return opts


def read_kafka_stream(
    spark: SparkSession,
    config: KafkaSourceConfig,
    reader_factory: Callable[[SparkSession], object] | None = None,
) -> DataFrame:
    """``spark.readStream.format("kafka")`` with validated options.

    ``reader_factory`` is the broker-free test seam: given the
    session it returns the object that supports
    ``.format().options().load()`` — production leaves it None and
    gets the real ``spark.readStream``.
    """
    reader = reader_factory(spark) if reader_factory else spark.readStream
    return reader.format("kafka").options(**config.options()).load()


def decode_kafka_records(
    records: DataFrame,
    value_format: str,
    schema_ddl: str | None = None,
    key_as: str = "string",
    csv_options: Mapping[str, str] | None = None,
) -> DataFrame:
    """Decode Kafka's binary key/value into typed columns (JVM-side).

    value_format: ``json`` | ``csv`` (need ``schema_ddl``), ``string``,
    or ``binary`` (passthrough). Output keeps topic/partition/offset/
    timestamp (watermark-ready) plus ``_raw`` holding the undecodable
    payload text (NULL when decode succeeded) — filter on it for the
    quarantine split, as with the file readers.
    """
    val = F.col("value").cast("string")
    if value_format in ("json", "csv"):
        if not schema_ddl:
            raise ValueError(f"{value_format} decode requires schema_ddl")
        # A malformed payload parses to an all-NULL struct (not a NULL
        # struct), so failure detection must use the parser's own
        # corrupt-record column: _raw carries the original text on
        # parse failure, NULL on success (and on NULL tombstones).
        full = schema_ddl + ", _raw string"
        opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_raw"}
        if value_format == "json":
            parsed = F.from_json(val, full, opts)
        else:
            parsed = F.from_csv(val, F.lit(full), {**opts, **dict(csv_options or {})})
    elif value_format == "string":
        parsed = F.struct(val.alias("text"), F.lit(None).cast("string").alias("_raw"))
    elif value_format == "binary":
        parsed = F.struct(
            F.col("value").alias("bytes"), F.lit(None).cast("string").alias("_raw")
        )
    else:
        raise ValueError(f"unsupported value_format {value_format!r}")

    key = F.col("key").cast("string") if key_as == "string" else F.col("key")
    decoded = records.select(
        key.alias("key"), parsed.alias("v"), "topic", "partition", "offset", "timestamp"
    )
    # v.* expands the typed columns plus _raw (last in the struct).
    return decoded.select("key", "v.*", "topic", "partition", "offset", "timestamp")
