"""Approximate/sketch aggregates and time-hierarchy rollups.

- ``events_approx_stats``: HyperLogLog++ distinct counts and
  approximate percentiles — the O(1)-memory summaries used instead of
  exact distincts at 100 TB. Rows-only gate (sketch internals are
  engine-specific); accuracy is asserted against exact values in
  pytest.
- ``events_hypertable_rollup``: continuous-aggregate-style rollup at
  multiple granularities (hour + day) in ONE grouping-sets pass over
  the fact table, instead of one scan per granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table


def approx_stats(events: DataFrame) -> DataFrame:
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("value_pcts"),
        F.count(F.lit(1)).alias("n"),
    )


def events_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    out = approx_stats(events)
    return out.select(
        "event_type",
        "approx_users",
        F.round(out.value_pcts[0], 4).alias("p50"),
        F.round(out.value_pcts[1], 4).alias("p95"),
        F.round(out.value_pcts[2], 4).alias("p99"),
        "n",
    ).orderBy("event_type")


def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(granularity, bucket, event_type) → count/sum at hour AND day
    resolution from one scan (grouping sets)."""
    events = load_table(spark, "events", sf_dir)
    bucketed = events.select(
        F.date_trunc("hour", "ts").alias("bucket_hour"),
        F.date_trunc("day", "ts").alias("bucket_day"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("value"),
    )
    gs = bucketed.groupingSets(
        [["bucket_hour", "event_type"], ["bucket_day", "event_type"]],
        "bucket_hour",
        "bucket_day",
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).cast("double").alias("value_sum"),
    )
    return gs.select(
        F.when(F.col("bucket_hour").isNotNull(), F.lit("hour")).otherwise(F.lit("day")).alias("granularity"),
        F.coalesce("bucket_hour", "bucket_day").alias("bucket"),
        "event_type",
        "n_events",
        "value_sum",
    ).orderBy("granularity", "bucket", "event_type")


EVENTS_HYPERTABLE_ROLLUP_SQL = """
WITH b AS (
  SELECT DATE_TRUNC('hour', ts) AS bucket_hour,
         DATE_TRUNC('day', ts) AS bucket_day,
         event_type,
         CAST(value AS DECIMAL(18,6)) AS value
  FROM events
)
SELECT 'hour' AS granularity, bucket_hour AS bucket, event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(value), 4) AS DOUBLE) AS value_sum
FROM b GROUP BY bucket_hour, event_type
UNION ALL
SELECT 'day', bucket_day, event_type,
       COUNT(*),
       CAST(ROUND(SUM(value), 4) AS DOUBLE)
FROM b GROUP BY bucket_day, event_type
ORDER BY granularity, bucket, event_type
"""
