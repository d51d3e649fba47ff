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


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returned
    items in a quarter. 4-way join; nation broadcast; distributed
    TakeOrdered for the top-n."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(_money(F.sum(_disc_price()), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_RETURNED_ITEMS_SQL = """
SELECT c_custkey, c_name, n_name, c_mktsegment,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode column in the synthetic schema:
    l_linestatus plays the grouping role): per line status, how many
    1997-shipped lines belong to critical (1-URGENT/2-HIGH) vs other
    orders. Conditional aggregation in one pass."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~crit, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_PRIORITY_CLASS_SQL = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of revenue from PROMO parts in one month.
    Both aggregate legs are exact-decimal sums rounded to cents before
    the (double) ratio, so the single output row is bit-stable."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    promo = F.col("p_type") == "PROMO"
    agg = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _money(F.sum(F.when(promo, _disc_price()).otherwise(F.lit(0).cast("decimal(12,2)"))), "promo_revenue"),
            _money(F.sum(_disc_price()), "total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6).alias(
            "promo_pct"
        ),
    )


Q14_PROMO_REVENUE_SQL = """
WITH agg AS (
  SELECT
    CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
      ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS promo_revenue,
    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
    AND l_shipdate < TIMESTAMP '1997-10-01'
)
SELECT promo_revenue, total_revenue,
       ROUND(100.0 * promo_revenue / total_revenue, 6) AS promo_pct
FROM agg
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjunctive brand/size/
    quantity branches. The whole OR-of-ANDs predicate is one Catalyst
    filter after a broadcast part join — exercises predicate pushdown
    through a disjunction, the classic optimizer stress case."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    branch1 = (
        (F.col("p_brand") == "Brand#11")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 20))
    )
    branch2 = (
        (F.col("p_brand") == "Brand#22")
        & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity").between(10, 30))
    )
    branch3 = (
        (F.col("p_brand") == "Brand#15")
        & (F.col("p_size").between(20, 50))
        & (F.col("l_quantity").between(20, 50))
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch1 | branch2 | branch3)
        .agg(
            _money(F.sum(_disc_price()), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_DISJUNCTIVE_REVENUE_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per market segment, customers whose account
    balance beats the positive-balance average and who placed no
    order from 2000 on. The global-average threshold is evaluated as
    an integer-cents CROSS-MULTIPLY (bal·n > total) — no division, so
    the membership set is exactly reproducible in any engine."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    cust = customer.select("c_custkey", "c_mktsegment", cents.alias("bal_cents"))
    pos = cust.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("total_cents"), F.count(F.lit(1)).alias("n_pos")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))  # 1-row aggregate: broadcast literal
        .filter(F.col("bal_cents") * F.col("n_pos") > F.col("total_cents"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("bal_cents") / 100.0, 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_IDLE_RICH_CUSTOMERS_SQL = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
pos AS (
  SELECT SUM(bal_cents) AS total_cents, COUNT(*) AS n_pos
  FROM cust WHERE bal_cents > 0
)
SELECT c_mktsegment, COUNT(*) AS numcust,
       ROUND(SUM(bal_cents) / 100.0, 2) AS totacctbal
FROM cust, pos
WHERE bal_cents * n_pos > total_cents
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def loyal_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation coverage (INTERSECT): customers who placed
    orders in BOTH 1996 and 1997 — completes the set-op family
    beside churned_customers' EXCEPT and combine_concat's UNION."""
    orders = load_table(spark, "orders", sf_dir)

    def year_custs(y: int) -> DataFrame:
        return orders.filter(F.year("o_orderdate") == y).select("o_custkey")

    return year_custs(1996).intersect(year_custs(1997)).orderBy("o_custkey")


LOYAL_CUSTOMERS_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
ORDER BY o_custkey
"""


def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based feature normalization: PERCENT_RANK and NTILE(10)
    of order value within each priority class — the distribution-free
    normalization used before mixing heterogeneous feature scales.
    percent_rank = (rank-1)/(n-1) from exact integer ranks, so the
    doubles are engine-identical without quantization."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.round(F.percent_rank().over(w), 6).alias("price_pr"),
            F.ntile(10).over(w).alias("price_decile"),
        )
        .orderBy("o_orderkey")
    )


ORDER_PRICE_PERCENTILES_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       ROUND(PERCENT_RANK() OVER w, 6) AS price_pr,
       CAST(NTILE(10) OVER w AS INTEGER) AS price_decile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
ORDER BY o_orderkey
"""


def rolling_30d_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer at each order: a RANGE-frame
    window (value-based, not row-based — peers at the same timestamp
    aggregate together regardless of physical order, so the result is
    deterministic under any shuffle order).

    Frame arithmetic runs on epoch seconds with integer cents, so the
    window sum is engine-exact. One shuffle on the partition key; the
    in-partition sort is the same sort a ROWS frame would need.
    """
    orders = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    epoch = F.unix_timestamp("o_orderdate")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum(cents).over(w) / 100.0, 2).alias("trailing_30d"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


ROLLING_30D_CUSTOMER_REVENUE_SQL = """
SELECT
  o_custkey, o_orderkey, o_orderdate,
  ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
    PARTITION BY o_custkey
    ORDER BY CAST(EPOCH(o_orderdate) AS BIGINT)
    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
  ) / 100.0, 2) AS trailing_30d
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def lapsed_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference, distinct semantics): customers active
    in 1995 who placed no order in 2001 — the companion to the
    INTERSECT gate (K2), completing the set-operation surface.
    Spark's ``subtract`` IS EXCEPT DISTINCT (one aggregate per side +
    one anti semantics under the hood, no driver work)."""
    orders = load_table(spark, "orders", sf_dir)

    def active_in(year: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
        )

    return active_in(1995).subtract(active_in(2001)).orderBy("o_custkey")


LAPSED_CUSTOMERS_EXCEPT_SQL = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01' AND o_orderdate < TIMESTAMP '2002-01-01'
ORDER BY o_custkey
"""


def events_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, year): all four grouping sets — detail,
    per-type, per-year, grand total — in one pass, with
    ``grouping_id`` distinguishing subtotal levels (ROLLUP's sibling;
    completes the grouping-sets family alongside `revenue_rollup` and
    the quality dashboard's ROLLUP). COALESCE'd labels keep the
    output NULL-free so the set is hash-comparable everywhere."""
    from ..sources.catalog import load_table as _lt

    events = _lt(spark, "events", sf_dir)
    base = events.select(
        "event_type", F.year("ts").cast("long").alias("yr"), "value"
    )
    return (
        base.cube("event_type", "yr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.round(F.col("value") * 1000000).cast("long")) / 1e6, 6).alias(
                "total_value"
            ),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("yr"),
            "n_events",
            "total_value",
            "gid",
        )
        .orderBy("gid", "event_type", "yr")
    )


EVENTS_CUBE_SUMMARY_SQL = """
SELECT
  COALESCE(event_type, 'ALL') AS event_type,
  COALESCE(CAST(yr AS VARCHAR), 'ALL') AS yr,
  COUNT(*) AS n_events,
  ROUND(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) / 1e6, 6) AS total_value,
  CAST(GROUPING(event_type) * 2 + GROUPING(yr) AS BIGINT) AS gid
FROM (SELECT event_type, CAST(YEAR(ts) AS BIGINT) AS yr, value FROM events)
GROUP BY CUBE (event_type, yr)
ORDER BY gid, event_type, yr
"""
