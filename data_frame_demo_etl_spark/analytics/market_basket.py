"""Market-basket association rules (Agrawal & Srikant 1994, the
pairwise case): support / confidence / lift over order baskets —
the co-occurrence analytics layer on top of the same basket shape the
graph ops use (triangles.copurchase_edges), but producing DIRECTED
rules with the three standard strength measures.

Spark-first shape: per-order item SETS via one groupBy
(`collect_set`), pair expansion IN-ROW with two explodes (bounded by
items-per-basket, never a table self-join), then one count per pair —
the same single-shuffle pair construction that replaced the lineitem
self-join in triangles.py (measured 2.3× there). Item supports are a
second, tiny aggregation; the rule join is pair-table × two
broadcast-size support lookups.

Basket granularity is the part BRAND (25 values): item vocabularies
in the thousands+ work identically — the explode stays bounded by
per-basket cardinality, and supports stay a vocabulary-sized table.

Determinism: support counts are exact integers; confidence and lift
ride the 1e-6 grid via FLOOR(x·1e6 + 0.5) with ONE fixed
parenthesization evaluated identically in Spark and DuckDB (the
bm25.py convention), so ranking ties are impossible to split
differently across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

MIN_SUPPORT_PCT = 1  # rule floor: pair must appear in ≥1% of baskets
TOP_RULES = 20
SCALE = 1_000_000


def association_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_support_pct: int = MIN_SUPPORT_PCT,
    top: int = TOP_RULES,
) -> DataFrame:
    """Top-``top`` directed rules a→b by lift:
    (antecedent, consequent, supp_ab, supp_a, supp_b,
    confidence_micro, lift_micro). ``baskets`` is (basket, item),
    duplicates tolerated (sets are formed internally)."""
    b = baskets.select(
        F.col(basket_col).alias("bid"), F.col(item_col).alias("item")
    )
    # r12: per_basket now feeds THREE consumers — the n_baskets scalar,
    # the item supports, and the pair explode — so it is persisted and
    # the count() doubles as the cache materialization. item_supp is
    # derived from the basket sets (supp(item) = #baskets containing
    # it = one explode of the cached sets) instead of a second
    # corpus-sized distinct-shuffle of the raw (bid, item) table: the
    # whole operator now shuffles the corpus exactly once (on bid).
    per_basket = b.groupBy("bid").agg(F.collect_set("item").alias("items")).persist()
    n_baskets = per_basket.count()
    item_supp = (
        per_basket.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("supp"))
    )
    pairs = (
        per_basket.select(F.explode("items").alias("u"), "items")
        .select("u", F.explode("items").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("supp_ab"))
        .filter(F.col("supp_ab") * 100 >= F.lit(min_support_pct * n_baskets))
    )
    # Direct both ways: a rule is ordered, a pair is not.
    directed = pairs.select(
        F.col("u").alias("a"), F.col("v").alias("b"), "supp_ab"
    ).unionByName(
        pairs.select(F.col("v").alias("a"), F.col("u").alias("b"), "supp_ab")
    )
    sa = item_supp.select(F.col("item").alias("a"), F.col("supp").alias("supp_a"))
    sb = item_supp.select(F.col("item").alias("b"), F.col("supp").alias("supp_b"))
    conf = F.floor(
        F.col("supp_ab") * F.lit(float(SCALE)) / F.col("supp_a") + 0.5
    ).cast("long")
    lift = F.floor(
        F.col("supp_ab")
        * F.lit(float(n_baskets))
        / F.col("supp_a")
        * F.lit(float(SCALE))
        / F.col("supp_b")
        + 0.5
    ).cast("long")
    ranked = (
        directed.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            "supp_ab",
            "supp_a",
            "supp_b",
            conf.alias("confidence_micro"),
            lift.alias("lift_micro"),
        )
        .orderBy(
            F.col("lift_micro").desc(),
            F.col("antecedent").asc(),
            F.col("consequent").asc(),
        )
        .limit(top)
    )
    return ranked


def brand_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: which part brands pull which others into the same order —
    top-20 brand→brand rules by lift."""
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    baskets = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("l_orderkey").alias("basket_id"), F.col("p_brand").alias("item")
    )
    return association_rules(baskets).orderBy(
        F.col("lift_micro").desc(), "antecedent", "consequent"
    )


BRAND_ASSOCIATION_RULES_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey AS bid, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT COUNT(DISTINCT bid) AS n_baskets FROM baskets),
item_supp AS (SELECT item, COUNT(*) AS supp FROM baskets GROUP BY item),
pairs AS (
  SELECT a.item AS u, b.item AS v, COUNT(*) AS supp_ab
  FROM baskets a JOIN baskets b ON a.bid = b.bid AND a.item < b.item
  GROUP BY a.item, b.item
),
kept AS (
  SELECT u, v, supp_ab FROM pairs, n WHERE supp_ab * 100 >= {MIN_SUPPORT_PCT} * n_baskets
),
directed AS (
  SELECT u AS a, v AS b, supp_ab FROM kept
  UNION ALL
  SELECT v AS a, u AS b, supp_ab FROM kept
),
rules AS (
  SELECT d.a AS antecedent, d.b AS consequent, d.supp_ab,
         sa.supp AS supp_a, sb.supp AS supp_b,
         CAST(FLOOR(d.supp_ab * {SCALE}.0 / sa.supp + 0.5) AS BIGINT) AS confidence_micro,
         CAST(FLOOR(d.supp_ab * CAST(n.n_baskets AS DOUBLE) / sa.supp * {SCALE}.0 / sb.supp + 0.5) AS BIGINT) AS lift_micro
  FROM directed d
  JOIN item_supp sa ON sa.item = d.a
  JOIN item_supp sb ON sb.item = d.b
  CROSS JOIN n
)
SELECT * FROM rules
ORDER BY lift_micro DESC, antecedent ASC, consequent ASC
LIMIT {TOP_RULES}
"""
