"""Gate queries for the temporal join operators over `events`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table
from .temporal import asof_join, range_join


def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent view at-or-before
    that moment (as-of join)."""
    events = load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id"), F.col("value").alias("view_value")
    )
    out = asof_join(
        purchases,
        views,
        on="ts",
        by=["user_id"],
        right_payload=["view_event_id", "view_value"],
        tie_break="view_event_id",
    )
    return out.select("event_id", "user_id", "ts", "view_event_id", "view_value").orderBy(
        "event_id"
    )


ASOF_VIEW_BEFORE_PURCHASE_SQL = """
SELECT
  p.event_id, p.user_id, p.ts,
  (SELECT v.event_id FROM events v
   WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_event_id,
  (SELECT v.value FROM events v
   WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_value
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


def range_join_error_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error events within 1 hour after a purchase by the same user
    (bounded range join)."""
    events = load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    out = range_join(purchases, errors, on="ts", by=["user_id"], lo_seconds=0, hi_seconds=3600)
    return out.select(
        "event_id", F.col("event_id_r").alias("error_event_id"), "user_id"
    ).orderBy("event_id", "error_event_id")


RANGE_JOIN_ERROR_FOLLOWUPS_SQL = """
SELECT p.event_id AS event_id, e.event_id AS error_event_id, p.user_id
FROM events p
JOIN events e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND EPOCH(e.ts) - EPOCH(p.ts) >= 0
 AND EPOCH(e.ts) - EPOCH(p.ts) <= 3600
ORDER BY event_id, error_event_id
"""
