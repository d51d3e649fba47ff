"""Skyline (Pareto-frontier) query — the classic multi-criteria
operator (Börzsönyi et al., ICDE 2001): return the rows no other row
dominates, where q dominates p iff q is ≤ p in every criterion and
strictly < in at least one (both criteria MINIMIZED here; flip signs
upstream to maximize).

The 2-D case has an exact one-pass formulation that never self-joins:
with m_eq(x) = min y within tier x and m_lt(x) = min y over all tiers
strictly below x, a row (x, y) is on the frontier iff

    y == m_eq(x)   AND   (m_lt(x) IS NULL OR y < m_lt(x))

— dominance from the same tier is "strictly cheaper same tier"
(y > m_eq), dominance from a lower tier is "lower tier at least as
cheap" (y ≥ m_lt); duplicates of a frontier point are all kept (a
tie in both criteria is not strict anywhere, hence not dominance).

Scale shape: one map-side-combined groupBy(x) min, ONE unpartitioned
prefix-min window over the DISTINCT-x table — bounded by the value
domain of the tier column (p_size: ~50 rows; it never sees data-sized
input, the same bounded-window argument the OHLC/zorder gates use; a
billion-distinct-x skyline would swap in the two-pass keyed prefix),
then a broadcast join back to the fact rows. No self-join: the naive
NOT-EXISTS dominance pair scan is O(n²) and is exactly what this
construction avoids at 100 TB.

No reference analog (/root/reference has no multi-criteria queries);
brief-mandated beyond-reference analytics. Values ride the cent grid
so both engines compare exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.catalog import load_table


def pareto_frontier_2d(
    df: DataFrame, x_col: str, y_col: str, keep_cols: list[str]
) -> DataFrame:
    """Rows of ``df`` on the (min ``x_col``, min ``y_col``) Pareto
    frontier. Both criteria must be integer-valued columns (grid them
    upstream). ``keep_cols`` are carried through unchanged."""
    pts = df.select(*keep_cols, F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
    tier = pts.groupBy("__x").agg(F.min("__y").alias("__m_eq"))
    # Unpartitioned window: input is the distinct-x table (value-domain
    # sized — see module docstring), not the fact rows.
    w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    tiers = tier.withColumn("__m_lt", F.min("__m_eq").over(w))
    return (
        pts.join(F.broadcast(tiers), "__x")
        .filter(
            (F.col("__y") == F.col("__m_eq"))
            & (F.col("__m_lt").isNull() | (F.col("__y") < F.col("__m_lt")))
        )
        .select(*keep_cols, F.col("__x").alias(x_col), F.col("__y").alias(y_col))
    )


def parts_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the cheapest-smallest frontier of the part catalog —
    parts where no other part is both at most as small and at most as
    cheap (with one strict) — minimize (p_size, price cents)."""
    part = load_table(spark, "part", sf_dir)
    pts = part.select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    return pareto_frontier_2d(pts, "p_size", "price_cents", ["p_partkey"]).orderBy(
        "p_size", "p_partkey"
    )


PARTS_PARETO_FRONTIER_SQL = """
WITH pts AS (
  SELECT p_partkey, p_size,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part
),
tier AS (
  SELECT p_size, MIN(price_cents) AS m_eq FROM pts GROUP BY p_size
),
tiers AS (
  SELECT p_size, m_eq,
         MIN(m_eq) OVER (ORDER BY p_size ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_lt
  FROM tier
)
SELECT p.p_partkey, p.p_size, p.price_cents
FROM pts p JOIN tiers t ON p.p_size = t.p_size
WHERE p.price_cents = t.m_eq AND (t.m_lt IS NULL OR p.price_cents < t.m_lt)
ORDER BY p.p_size, p.p_partkey
"""
