"""Relational-operator coverage queries: semi/anti joins, set
operations, window functions, pivot, rollup. Together with tpch.py
these span the full operator surface a warehouse query engine needs;
each has an exact DuckDB oracle.

Scale notes: semi/anti joins broadcast the filtering side when small
(Catalyst picks BroadcastHashJoin LeftSemi/LeftAnti); window functions
shuffle once on the partition key; pivot uses an explicit value list
(no extra distinct-collection job); rollup is one pass with grouping
sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.catalog import load_table
from .tpch import _dec, _money


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted TPC-H Q4: orders in a window having ≥1 returned line
    (left-semi join), counted per priority."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never ordered."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (EXCEPT): custkeys ordering in 1996 but not 1997."""
    orders = load_table(spark, "orders", sf_dir)

    def keys(year: int) -> DataFrame:
        return orders.filter(F.year("o_orderdate") == year).select(
            F.col("o_custkey").alias("custkey")
        )

    return keys(1996).exceptAll(keys(1997)).distinct().orderBy("custkey")


CHURNED_CUSTOMERS_SQL = """
SELECT DISTINCT custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
)
ORDER BY custkey
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer over time (window aggregate)."""
    orders = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).over(w), 2)
            .cast("double")
            .alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


WINDOW_RUNNING_TOTAL_SQL = """
SELECT
  o_custkey, o_orderkey, o_orderdate,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_total
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: 3 priciest parts per brand (dense ranking by
    price with key tie-break)."""
    part = load_table(spark, "part", sf_dir)
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "rank", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_brand", "rank")
    )


TOP_PARTS_PER_BRAND_SQL = """
SELECT p_brand, CAST(rank AS INTEGER) AS rank, p_partkey, p_name, p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rank
  FROM part
)
WHERE rank <= 3
ORDER BY p_brand, rank
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns. Explicit value
    list → single-pass pivot, stable schema."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_id")
    )


EVENTS_PIVOT_SQL = """
SELECT
  user_id,
  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
  COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation): subtotals + grand total in one
    grouping-sets pass."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    joined = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("total_sales"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


REVENUE_ROLLUP_SQL = """
SELECT
  r_name, n_name,
  COUNT(*) AS order_count,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_sales
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-scan filtered aggregate (the canonical
    predicate-pushdown benchmark)."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money(F.sum(_dec("l_extendedprice") * _dec("l_discount", "decimal(5,2)")), "revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


Q6_REVENUE_FORECAST_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(5,2))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS line_count
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 24
"""
