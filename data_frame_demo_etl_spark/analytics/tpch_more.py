"""TPC-H completion set: the nine query shapes (Q9, Q11, Q13, Q15,
Q16, Q17, Q18, Q20, Q21) that, together with tpch.py (Q1/Q3/Q5) and
relational.py (Q2/Q4/Q6/Q7/Q8/Q10/Q12/Q14/Q19/Q22), give the engine
full 22-query TPC-H shape coverage.

Reference parity: these extend the reference's query surface
(query-builder filter/aggregate chains, src/api/v1 query endpoints,
engine.py combine/summary aggregation) to the full relational
repertoire a warehouse user expects — correlated scalar subqueries,
EXISTS/NOT-EXISTS double correlation, grouped-HAVING feeding joins,
two-level aggregation — per SURVEY §2.8's capability-parity-at-scale
mandate. The TPC-H query set itself is the public benchmark spec
(TPC-H v3; the shapes, not the official generator/data, are used).

The synthetic star schema has no ``partsupp`` table and no
commit/receipt dates, phone, or comment columns, so — like the
existing Q2/Q12/Q22 shapes — each query preserves the *relational
structure* of its TPC-H original (the join topology, the
correlated-aggregate or EXISTS/NOT-EXISTS nesting, the two-level
aggregation) while substituting available columns for the missing
ones. The substitution is stated in each docstring.

Determinism: money math follows the house rules (exact DECIMAL
products, or integer-cents grids with cross-multiplied threshold
comparisons instead of division) so Spark and the DuckDB oracle agree
bit-for-bit; every top-N carries a unique tie-break column.

Scale notes: constant dims (nation) are force-broadcast; scaling
tables are left to AQE; correlated aggregates are expressed as
self-aggregation + equi-join on the correlation key so the shuffle
partitioning is reused rather than re-derived per row; EXISTS /
NOT EXISTS become left-semi / left-anti joins (Catalyst's native
translation), never row-at-a-time filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .tpch import _PRICE, _RATE, _dec, _disc_price, _money


def _cents(col: str):
    """Exact integer cents from a 2-decimal-place double column.

    ``ROUND(x*100)`` on the same IEEE double yields the same integer
    in Spark and DuckDB (both round half away from zero on doubles),
    so downstream integer arithmetic is engine-portable.
    """
    return F.round(F.col(col) * 100).cast("long")


def _qty():
    """l_quantity is integer-valued (1..50) stored as double."""
    return F.col("l_quantity").cast("long")


# ──────────────────────────── Q9 ────────────────────────────


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by nation and order year for parts whose
    name matches a token.

    Substitution: no ``partsupp`` → supply cost is modeled as 40% of
    ``p_retailprice`` (a deterministic per-part constant, exactly the
    role ``ps_supplycost`` plays); the name filter uses the synthetic
    ``'%widget%'`` vocabulary instead of ``'%green%'``.

    Shape kept: 5-way join lineitem ⋈ part ⋈ supplier ⋈ orders ⋈
    nation, profit expression per line, group by (nation, year).
    All money math in exact DECIMAL (max scale 6, far below 38).
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%widget%"))
    supplier = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)

    supply_cost = _dec("p_retailprice") * F.lit(0.40).cast(_RATE)
    amount = _disc_price() - supply_cost * _dec("l_quantity")
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_money(F.sum("amount"), "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_PRODUCT_TYPE_PROFIT_SQL = """
SELECT
  n_name AS nation,
  YEAR(o_orderdate) AS o_year,
  CAST(ROUND(SUM(
    CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.40 AS DECIMAL(5,2))
      * CAST(l_quantity AS DECIMAL(12,2))
  ), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year DESC
"""


# ──────────────────────────── Q11 ────────────────────────────


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of a nation
    group's inventory value, vs a global-fraction scalar subquery.

    Substitution: no ``partsupp`` → per-part "stock value" is the
    lineitem-observed Σ(price_cents × qty) flowing through suppliers
    of two nations (``ps_supplycost × ps_availqty`` stand-in).

    Shape kept: join to supplier/nation, group by part, total via
    scalar aggregate, HAVING value > fraction × total. TPC-H scales
    the fraction by 1/SF so the row count stays stable; here the
    fraction is expressed scale-invariantly as "more than 2× the
    mean per-part value" and cross-multiplied on exact integers
    (``val · n_parts > 2 · total``) — no division, no SF knob,
    identical membership in every engine at every scale. (Headroom:
    the cross-product stays under 2^63 through ~petabyte per-part
    values; past that, pre-aggregate to whole dollars first.)
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    vals = (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey").alias("partkey"), (_cents("l_extendedprice") * _qty()).alias("v"))
        .groupBy("partkey")
        .agg(F.sum("v").alias("value_cents"))
        # Referenced twice (rows + scalar total): persist the per-part
        # aggregate or Spark re-computes the whole join subtree (6
        # scans observed). Bounded: one row per part.
        .persist()
    )
    total = vals.agg(
        F.sum("value_cents").alias("total_cents"), F.count(F.lit(1)).alias("n_parts")
    )
    # Cache lifecycle: the persist above must outlive this function
    # (the caller's action reads both branches through it), so release
    # is the session owner's job — see session.release_all_caches.
    return (
        vals.crossJoin(F.broadcast(total))  # 1-row aggregate: broadcast literal
        .filter(F.col("value_cents") * F.col("n_parts") > F.col("total_cents") * 2)
        .select("partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "partkey")
    )


Q11_IMPORTANT_STOCK_SQL = """
WITH vals AS (
  SELECT l_partkey AS partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_7')
  GROUP BY l_partkey
),
total AS (
  SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents,
         COUNT(*) AS n_parts
  FROM vals
)
SELECT partkey, value_cents
FROM vals, total
WHERE value_cents * n_parts > total_cents * 2
ORDER BY value_cents DESC, partkey
"""


# ──────────────────────────── Q13 ────────────────────────────


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count.

    Substitution: the ``o_comment NOT LIKE '%special%requests%'``
    exclusion becomes ``o_orderpriority <> '1-URGENT'`` (no comment
    column); the left-outer-join + two-level aggregation shape — the
    point of Q13 — is unchanged. Pure integer arithmetic.
    """
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_CUSTOMER_DISTRIBUTION_SQL = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders
    ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ──────────────────────────── Q15 ────────────────────────────


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum revenue over a quarter.

    Shape kept: revenue "view" (per-supplier aggregate over a 3-month
    shipdate window), then selection of the max via a scalar
    subquery. Revenue is exact integer cents, so the max-equality
    membership is engine-exact; all tied suppliers are returned, as
    in the original.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    line_cents = F.round(
        (_dec("l_extendedprice") * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE)))
        * 100
    ).cast("long")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select(F.col("l_suppkey").alias("suppkey"), line_cents.alias("cents"))
        .groupBy("suppkey")
        .agg(F.sum("cents").alias("rev_cents"))
        # Referenced twice (rows + scalar max): persist the tiny
        # per-supplier aggregate to avoid a second fact scan.
        .persist()
    )
    top = rev.agg(F.max("rev_cents").alias("max_cents"))
    # Cache lifecycle: see q11 / session.release_all_caches — the
    # persist must outlive this function; release is session-owned.
    return (
        rev.crossJoin(F.broadcast(top))  # 1-row aggregate: broadcast literal
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .join(supplier, F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_cents") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         CAST(SUM(CAST(ROUND(
           CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
             * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(rev_cents / 100.0, 2) AS total_revenue
FROM rev
JOIN supplier ON s_suppkey = suppkey
WHERE rev_cents = (SELECT MAX(rev_cents) FROM rev)
ORDER BY s_suppkey
"""


# ──────────────────────────── Q16 ────────────────────────────


def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: supplier diversity per (brand, type, size), with a
    NOT-IN supplier exclusion.

    Substitution: no ``partsupp`` → the part↔supplier relation is the
    distinct (l_partkey, l_suppkey) pairs observed in lineitem; the
    "complaints" comment filter becomes ``s_acctbal < 0`` (at tiny SF
    the exclusion set may be empty — the anti-join shape is still
    exercised; at sf0.01+ it excludes real suppliers).
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 45)
    )
    bad_suppliers = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad_suppliers, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_PARTS_SUPPLIER_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ──────────────────────────── Q17 ────────────────────────────


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of one brand —
    the per-part correlated average-quantity subquery.

    Substitution: the container predicate is dropped (no
    ``p_container``); the brand filter alone bounds the part set.

    Shape kept: the correlated ``l_quantity < 0.2 * AVG(l_quantity)``
    becomes self-aggregation on partkey + equi-join back, with the
    threshold as an exact cross-multiply
    (``qty * cnt * 5 < Σqty``  ⇔  qty < 0.2·avg). Output is the
    single avg_yearly row, from an exact cents total.
    """
    from pyspark.sql import Window

    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#3")
    # The correlated per-part aggregate as a WINDOW over the same
    # filtered join the probe side needs — one fact scan, one shuffle
    # on the correlation key (a groupBy+join-back would scan and
    # aggregate lineitem twice).
    w = Window.partitionBy("l_partkey")
    joined = lineitem.join(part, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", _qty().alias("qty"), _cents("l_extendedprice").alias("cents")
    )
    return (
        joined.withColumn("sum_qty", F.sum("qty").over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("qty") * F.col("cnt") * 5 < F.col("sum_qty"))
        .agg(F.sum("cents").alias("total_cents"))
        .select(F.round(F.col("total_cents") / 700.0, 2).alias("avg_yearly"))
    )


Q17_SMALL_QUANTITY_SQL = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#3'
  GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 700.0, 2)
         AS avg_yearly
FROM lineitem
JOIN per_part ON pk = l_partkey
WHERE CAST(l_quantity AS BIGINT) * cnt * 5 < sum_qty
"""


# ──────────────────────────── Q18 ────────────────────────────


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers who placed very large-volume orders —
    grouped-HAVING subquery feeding a 3-way join, top-100.

    Shape kept exactly (threshold 150 units; the synthetic data's
    ~4 lines/order × qty 1..50 puts the tail right where Q18 wants
    it). Tie-break on o_orderkey makes the LIMIT deterministic.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    big = (
        lineitem.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(_qty()).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("ok"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


Q18_LARGE_VOLUME_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey AS ok, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 150
) big ON o_orderkey = ok
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ──────────────────────────── Q20 ────────────────────────────


def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding a dominant position in some
    promo part — nested semi-join over a correlated quantity
    aggregate.

    Substitution: no ``ps_availqty`` → "dominant" means the supplier
    shipped more than 25% of a part's total 1997 shipped quantity
    (cross-multiplied: ``q*4 > total``), over ``p_type='PROMO'``
    parts (the ``p_name LIKE 'forest%'`` stand-in).

    Shape kept: part-filtered semi-join, per-(part,supplier)
    aggregate compared against a per-part correlated total, distinct
    suppliers out. The per-part total is a WINDOW over the
    (part,supplier) aggregate — a groupBy+self-join formulation would
    re-scan lineitem and re-aggregate it (verified in the physical
    plan); the window keeps it to ONE fact scan.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    promo_parts = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supplier = load_table(spark, "supplier", sf_dir)
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(promo_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(_qty()).alias("q"))
    )
    from pyspark.sql import Window

    tq = F.sum("q").over(Window.partitionBy("pk"))
    dominant = (
        shipped.withColumn("tq", tq)
        .filter(F.col("q") * 4 > F.col("tq"))
        .select("sk")
        .distinct()
    )
    return (
        supplier.join(dominant, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_PROMO_SUPPLIERS_SQL = """
WITH shipped AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
totals AS (SELECT pk, CAST(SUM(q) AS BIGINT) AS tq FROM shipped GROUP BY pk)
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (
  SELECT 1
  FROM shipped JOIN totals USING (pk)
  WHERE sk = s_suppkey AND q * 4 > tq
)
ORDER BY s_suppkey
"""


# ──────────────────────────── Q21 ────────────────────────────


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely at fault in multi-supplier
    finalized orders — the EXISTS + NOT-EXISTS double correlation.

    Substitution: no commit/receipt dates → "kept the order waiting"
    is proxied by ``l_returnflag = 'R'`` (the line came back). A
    supplier counts when its returned line sits in an 'F' order that
    involves another supplier (EXISTS) and no OTHER supplier's line
    in that order was returned (NOT EXISTS).

    Shape kept: left-semi then left-anti join on (same order, other
    supplier) — Catalyst's native EXISTS/NOT-EXISTS forms — then
    per-supplier count, deterministic top-100.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders_f = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    supplier = load_table(spark, "supplier", sf_dir)
    l1 = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
    )
    others = lineitem.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    others_returned = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    )
    waiting = (
        l1.join(
            others,
            (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
            "left_semi",
        )
        .join(
            others_returned,
            (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
            "left_anti",
        )
        .groupBy("sk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        waiting.join(supplier, F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("cnt").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_WAITING_SUPPLIERS_SQL = """
WITH l1 AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk
  FROM lineitem
  WHERE l_returnflag = 'R'
    AND EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM l1
JOIN supplier ON s_suppkey = sk
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.ok AND l2.l_suppkey <> l1.sk
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.ok AND l3.l_suppkey <> l1.sk
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""
