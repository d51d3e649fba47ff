"""Engagement analytics — Spark-native parity with the reference's
YouTube module (reference src/youtube.py:211-274), mapped onto the
`events` / `orders` tables of the synthetic schema.

- ``add_engagement_metrics``: (likes+comments)/views with zero-safe
  division (youtube.py:211-224 semantics).
- summaries: top-N, per-group, per-year (youtube.py:227-274).
- ISO-8601 duration parsing as pure Column expressions — no UDF
  (youtube.py:64-83 semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def engagement_rate(likes: Column, comments: Column, views: Column) -> Column:
    """(likes + comments) / views, 0.0 when views is 0/null.

    Parity: reference youtube.py:211-224 (replace({0: None}) then
    divide + fillna(0.0)).
    """
    total = likes.cast("double") + comments.cast("double")
    return F.when(views.isNull() | (views == 0), F.lit(0.0)).otherwise(total / views.cast("double"))


def add_engagement_metrics(df: DataFrame, likes: str = "like_count", comments: str = "comment_count", views: str = "view_count") -> DataFrame:
    rate = engagement_rate(F.col(likes), F.col(comments), F.col(views))
    return df.withColumn("engagement_rate", rate).withColumn(
        "engagement_rate_pct", F.round(rate * 100, 2)
    )


def iso8601_duration_seconds(duration: Column) -> Column:
    """ISO-8601 duration (e.g. PT1H2M3S, P2DT3H) → total seconds.

    Pure regexp_extract arithmetic — stays inside whole-stage codegen;
    unmatched/empty strings → 0 (parity with youtube.py:64-83).
    """
    pattern = r"^P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$"

    def part(idx: int) -> Column:
        raw = F.regexp_extract(duration, pattern, idx)
        return F.when(raw == "", F.lit(0)).otherwise(raw.cast("long"))

    valid = duration.isNotNull() & duration.rlike(pattern)
    total = part(1) * 86400 + part(2) * 3600 + part(3) * 60 + part(4)
    return F.when(valid, total).otherwise(F.lit(0))


def build_summaries(
    detail: DataFrame,
    top_n: int = 10,
    group_col: str = "channel_title",
    date_col: str = "published_at",
) -> dict[str, DataFrame]:
    """Summary frames for a video-shaped detail table (video_id,
    view_count, like_count, comment_count, `group_col`, `date_col`).

    Parity: reference youtube.py:227-274 — detail / top_videos /
    per_channel / per_year, as lazy Spark plans.
    """
    detail = add_engagement_metrics(detail)
    top_videos = detail.orderBy(
        F.col("view_count").desc(), F.col("like_count").desc(), F.col("video_id").asc()
    ).limit(top_n)
    per_channel = (
        detail.groupBy(group_col)
        .agg(
            F.count("video_id").alias("video_count"),
            F.sum("view_count").alias("views"),
            F.sum("like_count").alias("likes"),
            F.sum("comment_count").alias("comments"),
            F.round(F.avg("engagement_rate_pct"), 4).alias("avg_engagement_pct"),
        )
        .orderBy(F.col("views").desc())
    )
    per_year = (
        detail.withColumn("year", F.year(F.to_timestamp(date_col)))
        .groupBy("year")
        .agg(
            F.count("video_id").alias("video_count"),
            F.sum("view_count").alias("views"),
            F.sum("like_count").alias("likes"),
            F.sum("comment_count").alias("comments"),
        )
        .orderBy("year")
    )
    return {
        "detail": detail,
        "top_videos": top_videos,
        "per_channel": per_channel,
        "per_year": per_year,
    }


# ---------------------------------------------------------------------------
# Correctness-gate queries over the synthetic tables
# ---------------------------------------------------------------------------

def events_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement: clicks+purchases over views, zero-safe.

    One shuffle (groupBy user_id); counts are conditional aggregates in
    a single pass, not separate jobs.
    """
    events = load_table(spark, "events", sf_dir)
    agg = (
        events.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
        )
    )
    rate = engagement_rate(F.col("clicks"), F.col("purchases"), F.col("views"))
    return (
        agg.withColumn("engagement_rate", F.round(rate, 6))
        .withColumn("engagement_rate_pct", F.round(rate * 100, 2))
        .orderBy("user_id")
    )


EVENTS_ENGAGEMENT_SQL = """
WITH agg AS (
  SELECT
    user_id,
    COUNT(*) FILTER (WHERE event_type = 'view') AS views,
    COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
    COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases
  FROM events
  GROUP BY user_id
)
SELECT
  user_id, views, clicks, purchases,
  ROUND(CASE WHEN views = 0 THEN 0.0 ELSE (CAST(clicks AS DOUBLE) + purchases) / views END, 6) AS engagement_rate,
  ROUND(CASE WHEN views = 0 THEN 0.0 ELSE (CAST(clicks AS DOUBLE) + purchases) / views * 100 END, 2) AS engagement_rate_pct
FROM agg
ORDER BY user_id
"""


def top_n_orders(spark: SparkSession, sf_dir: str, n: int = 20) -> DataFrame:
    """Top-N orders by value (top_videos parity, youtube.py:241).

    orderBy+limit compiles to distributed TakeOrdered — no global sort.
    Fully tie-broken for determinism at any scale.
    """
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(n)
    )


TOP_N_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


def per_segment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment rollup (per_channel parity, youtube.py:243-254)."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    # customer scales with SF — no forced broadcast.
    # r12 (aggregate-before-shuffle): orders collapse to per-customer
    # (order count, sales sum) partials first — the custkey groupBy is
    # the exchange the join needed anyway, the join then carries
    # customer-sized rows, and the per-segment count_distinct becomes a
    # plain count (one joined row per ordering customer by
    # construction). Decimal sums re-aggregate exactly.
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("__orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("__sales"),
    )
    joined = per_cust.join(customer, "c_custkey")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.sum("__orders").alias("order_count"),
            F.round(F.sum("__sales"), 2).cast("double").alias("total_sales"),
            F.round(
                F.sum("__sales").cast("double") / F.sum("__orders"), 2
            ).alias("avg_order_value"),
        )
        .orderBy(F.col("total_sales").desc(), F.col("c_mktsegment").asc())
    )


PER_SEGMENT_SUMMARY_SQL = """
SELECT
  c_mktsegment,
  COUNT(DISTINCT c_custkey) AS customer_count,
  COUNT(*) AS order_count,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_sales,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*), 2) AS avg_order_value
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY total_sales DESC, c_mktsegment ASC
"""


def orders_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year rollup (per_year parity, youtube.py:256-267)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("total_sales"),
        )
        .orderBy("order_year")
    )


ORDERS_PER_YEAR_SQL = """
SELECT
  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
  COUNT(*) AS order_count,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_sales
FROM orders
GROUP BY order_year
ORDER BY order_year
"""


def iso8601_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise the ISO-8601 parser end-to-end: synthesize duration
    strings from lineitem integers, parse them back to seconds."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    minutes = F.col("l_quantity").cast("int")
    secs = F.col("l_linenumber").cast("int")
    duration = F.concat(F.lit("PT"), minutes.cast("string"), F.lit("M"), secs.cast("string"), F.lit("S"))
    return (
        lineitem.select(
            "l_orderkey",
            "l_linenumber",
            duration.alias("duration"),
            iso8601_duration_seconds(duration).alias("duration_seconds"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


ISO8601_DURATION_SQL = """
SELECT
  l_orderkey,
  l_linenumber,
  'PT' || CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) || 'M' || CAST(l_linenumber AS VARCHAR) || 'S' AS duration,
  CAST(CAST(l_quantity AS INTEGER) AS BIGINT) * 60 + l_linenumber AS duration_seconds
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""
