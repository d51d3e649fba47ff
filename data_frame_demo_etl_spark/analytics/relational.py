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
from .tpch import _dec, _disc_price, _money


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
    """Left-anti join: customers with no 1-URGENT order. (Plain
    "never ordered" is vacuous on the synthetic data — every customer
    has orders — and a 0-row gate proves nothing; the filtered
    anti-join keeps the operator shape AND returns rows at every
    test scale.)"""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
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


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    year (supplier nation ↔ customer nation)."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)

    n1 = nation.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    pair_filter = (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_2"))

    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair_filter)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_money(F.sum(_disc_price()), "revenue"), F.count(F.lit(1)).alias("line_count"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_VOLUME_SHIPPING_SQL = """
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-type revenue inside
    a region, by order year. Conditional aggregation over a 7-way
    join; the share is a ratio of two exact decimal sums."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    part = load_table(spark, "part", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)

    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _disc_price()
    target = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part.filter(F.col("p_type") == "PROMO")), F.col("l_partkey") == F.col("p_partkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _money(F.sum(target), "nation_volume"),
            _money(F.sum(vol), "total_volume"),
            F.round(
                F.sum(target).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_MARKET_SHARE_SQL = """
SELECT
  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
  CAST(ROUND(SUM(CASE WHEN n2.n_name = 'NATION_7'
      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
      ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS nation_volume,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS total_volume,
  ROUND(
    CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE),
  6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
GROUP BY o_year
ORDER BY o_year
"""


def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern: orders exceeding their customer's
    average order value (decorrelated into a join with per-customer
    aggregates — the plan Catalyst produces for the subquery form)."""
    orders = load_table(spark, "orders", sf_dir)
    avgs = orders.groupBy("o_custkey").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cust_avg")
    )
    return (
        orders.join(avgs, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        # cust_avg is emitted unrounded: the double is bit-identical in
        # both engines (exact decimal sum / integer count), while rounding
        # can land on .xx5 halves where engine rounding modes differ.
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
        .orderBy("o_orderkey")
    )


ORDERS_ABOVE_CUSTOMER_AVG_SQL = """
WITH avgs AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS cust_avg
  FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, a.cust_avg
FROM orders o JOIN avgs a ON o.o_custkey = a.o_custkey
WHERE o.o_totalprice > a.cust_avg
ORDER BY o.o_orderkey
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


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped correlated scalar subquery: for each part (of a
    filtered type — STANDARD/LARGE stand in for Q2's '%BRASS' against
    the synthetic p_type vocabulary) find the European supplier(s)
    whose offer price
    equals that part's minimum. The testdata ships no partsupp, so the
    offer table derives from lineitem as MIN(l_extendedprice) per
    (part, supplier) — pure value selection, no arithmetic, hence
    bit-exact across engines.

    Spark-first shape: the correlated `= (SELECT MIN ...)` becomes a
    single window MIN over the partkey partition — one shuffle of the
    offers table, no self-join (this is also what Catalyst's
    RewriteCorrelatedScalarSubquery produces, minus the join). Region
    filtering broadcasts the constant-size region/nation dims.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)

    offers = (
        lineitem.groupBy(
            F.col("l_partkey").alias("p_key"), F.col("l_suppkey").alias("s_key")
        )
        .agg(F.min("l_extendedprice").alias("offer_price"))
    )
    euro_sup = (
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    euro_offers = offers.join(
        euro_sup, F.col("s_key") == F.col("s_suppkey")
    )
    w = Window.partitionBy("p_key")
    best = euro_offers.withColumn("min_price", F.min("offer_price").over(w)).filter(
        F.col("offer_price") == F.col("min_price")
    )
    brass = part.filter(F.col("p_type").isin("STANDARD", "LARGE")).select(
        "p_partkey", "p_name", "p_type"
    )
    return (
        best.join(brass, F.col("p_key") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "offer_price"
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# The oracle states the SAME semantics as an actual correlated scalar
# subquery, proving the window formulation equivalent.
Q2_MIN_COST_SUPPLIER_SQL = """
WITH offers AS (
  SELECT l_partkey AS p_key, l_suppkey AS s_key, MIN(l_extendedprice) AS offer_price
  FROM lineitem GROUP BY 1, 2
),
euro AS (
  SELECT o.p_key, o.s_key, o.offer_price, s.s_name, s.s_acctbal, n.n_name
  FROM offers o
  JOIN supplier s ON o.s_key = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type, e.offer_price
FROM euro e
JOIN part p ON e.p_key = p.p_partkey
WHERE p.p_type IN ('STANDARD', 'LARGE')
  AND e.offer_price = (
    SELECT MIN(e2.offer_price) FROM euro e2 WHERE e2.p_key = e.p_key
  )
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
LIMIT 100
"""
