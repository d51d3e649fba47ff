"""Central registry: query name → (spark callable, DuckDB oracle SQL).

This is the single source of truth consumed by ``__spark_entry__`` and
the test harness. Every operator from SURVEY.md §2 that is SQL-
expressible registers both a Spark implementation and an oracle;
non-SQL-expressible ops register with ``oracle=None`` (rows-only
check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .analytics import engagement, tpch

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Entry:
    fn: QueryFn
    oracle: str | None


_REGISTRY: dict[str, Entry] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _REGISTRY[name] = Entry(fn=fn, oracle=oracle)


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in _REGISTRY.items() if e.oracle is not None}


# --- TPC-H-style analytics (SURVEY §2.8) ---
register("q1_pricing_summary", tpch.q1_pricing_summary, tpch.Q1_SQL)
register("q3_shipping_priority", tpch.q3_shipping_priority, tpch.Q3_SQL)
register("q5_local_supplier_volume", tpch.q5_local_supplier_volume, tpch.Q5_SQL)
register("revenue_by_region", tpch.revenue_by_region, tpch.REVENUE_BY_REGION_SQL)

# --- engagement analytics (SURVEY §2.7) ---
register("events_engagement", engagement.events_engagement, engagement.EVENTS_ENGAGEMENT_SQL)
register("top_n_orders", engagement.top_n_orders, engagement.TOP_N_ORDERS_SQL)
register("per_segment_summary", engagement.per_segment_summary, engagement.PER_SEGMENT_SUMMARY_SQL)
register("orders_per_year", engagement.orders_per_year, engagement.ORDERS_PER_YEAR_SQL)
register("iso8601_duration", engagement.iso8601_duration, engagement.ISO8601_DURATION_SQL)
