"""TPC-H-style analytical queries over the star schema.

These exercise the query capabilities the reference exposes through its
query builder / combine / summary surfaces (filter, multi-way join,
group-aggregate, top-n) at warehouse scale.

Scale notes:
- Money arithmetic is done in DECIMAL so results are exact and
  engine-independent (pandas/DuckDB/Spark agree bit-for-bit after the
  final round+cast) — and decimal sums are also the right call on a
  real cluster where non-deterministic float summation order makes
  reruns unstable.
- Broadcast policy: only constant-size dims (region, nation) are
  force-broadcast; tables that scale with the data volume (customer,
  supplier, part) are left to Catalyst/AQE, which broadcasts them at
  small SF and switches to shuffle joins when stats say otherwise.
  The remaining shuffles are the group-bys on high-cardinality agg
  keys, which AQE coalesces.
- Top-N uses ``orderBy().limit()`` which Spark executes as a
  distributed TakeOrdered (per-partition heap + driver merge), not a
  global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

# Exact decimal views of the money/rate columns. Input data carries two
# decimal places, so these casts are lossless.
_PRICE = "decimal(12,2)"
_RATE = "decimal(5,2)"


def _dec(col: str, typ: str = _PRICE):
    return F.col(col).cast(typ)


def _disc_price():
    # decimal(12,2) * decimal(5,2) -> exact scale-4 decimal in Spark and
    # DuckDB alike; no float noise.
    return _dec("l_extendedprice") * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))


def _charge():
    return _disc_price() * (F.lit(1).cast(_RATE) + _dec("l_tax", _RATE))


def _money(col, alias: str):
    """Round an exact decimal aggregate to cents and emit as double."""
    return F.round(col, 2).cast("double").alias(alias)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report.

    Reference parity: the "combine_on" group-aggregate surface
    (reference engine.py:199-221) at its analytical extreme.
    Single scan, map-side partial aggregation, 4-group output.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(_dec("l_quantity")), "sum_qty"),
            _money(F.sum(_dec("l_extendedprice")), "sum_base_price"),
            _money(F.sum(_disc_price()), "sum_disc_price"),
            _money(F.sum(_charge()), "sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 2).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 2).alias("avg_price"),
            F.round(F.sum(_dec("l_discount", _RATE)).cast("double") / F.count(F.lit(1)), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2))) * (CAST(1 AS DECIMAL(5,2)) + CAST(l_tax AS DECIMAL(5,2)))), 2) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 2) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 2) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted TPC-H Q3: top unshipped orders by revenue.

    customer ⋈ orders ⋈ lineitem with date window; deterministic
    top-10 via full tie-break (revenue desc, date, orderkey).
    """
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)

    # r12 (aggregate-before-shuffle): the filtered lineitem collapses
    # to one (orderkey, revenue-sum) row BEFORE the joins — the
    # orderkey groupBy is the exchange the join needed anyway, so the
    # custkey exchange then carries order-sized rows, and the final
    # (orderkey, orderdate) aggregation disappears (o_orderdate is
    # functionally dependent on the unique o_orderkey; an inner join
    # against it neither drops nor multiplies the per-order sums —
    # decimal arithmetic, exact).
    per_order = (
        lineitem.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(F.sum(_disc_price()).alias("__rev"))
    )
    return (
        per_order.join(
            orders.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            # customer scales with SF: let Catalyst/AQE pick broadcast
            # vs shuffle from size stats instead of forcing it.
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("l_orderkey", "o_orderdate", _money(F.col("__rev"), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT
  l_orderkey,
  o_orderdate,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted TPC-H Q5: revenue by nation for one region/year.

    Six-way join; constant-size dims broadcast, scaling tables left
    to the optimizer.
    """
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)

    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(_money(F.sum(_disc_price()), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


Q5_SQL = """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup by region and order year (combine/summary parity).

    r12 (aggregate-before-shuffle): lineitem collapses to per-order
    (revenue, line count) partials BEFORE any join — the orderkey
    groupBy is the same exchange the join needed anyway, and every
    downstream join/exchange (orders→customer on custkey) then carries
    orders-sized rows instead of lineitem-sized ones. Decimal sums are
    exact, so re-aggregating the per-order partials by (region, year)
    is value-identical to summing raw lines; an inner join against the
    unique o_orderkey neither drops nor multiplies partials."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)

    per_order = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(_disc_price()).alias("__rev"),
        F.count(F.lit(1)).alias("__lines"),
    )
    return (
        per_order.join(orders, "o_orderkey")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name"), F.year("o_orderdate").alias("order_year"))
        .agg(
            _money(F.sum("__rev"), "revenue"),
            F.sum("__lines").alias("line_count"),
        )
        .orderBy("r_name", "order_year")
    )


REVENUE_BY_REGION_SQL = """
SELECT
  r_name,
  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, order_year
ORDER BY r_name, order_year
"""
