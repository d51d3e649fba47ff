"""Product-analytics operators on the events stream: ordered
conversion funnels and weekly cohort retention.

Both are classic warehouse workloads a pandas-era analytics module
(reference youtube.py's summaries) grows into at scale:

- funnel: per user, the ORDERED chain view → click → purchase (each
  stage's first occurrence strictly after the previous stage) — not
  mere per-type existence; one scan + one shuffle gathering each
  user's stage events, then a per-user array walk (the
  ClickHouse-windowFunnel shape).
- cohort retention: users bucketed by first-active ISO week, activity
  counted per (cohort, week-offset) — the re-engagement matrix.
  Two shuffles (first-event agg, distinct-activity agg).

Timestamps compare exactly across engines (microsecond integers), so
both gates carry full DuckDB oracles with no quantization tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.catalog import load_table

STAGES = ("view", "click", "purchase")


def funnel_stages(events: DataFrame, stages: tuple[str, ...] = STAGES) -> DataFrame:
    """Per-user ordered funnel: first occurrence of each stage
    strictly after the previous stage's chosen occurrence.
    Returns (user_id, t_<stage>..., stage_reached).

    One-pass formulation (the ClickHouse-windowFunnel shape): ONE
    scan of events, ONE shuffle gathering each user's stage events,
    then the ordered chain is a per-user array walk — the earlier
    per-stage join chain re-computed its growing join tree at every
    stage (10 events scans in the physical plan for 3 stages).
    Per-user state is that user's stage events only — the same
    bounded-activity assumption `user_event_sequences` makes, with
    `cap_events_per_user` as the whale guard upstream.

    Each t_<stage> is materialized as a real column BEFORE the next
    stage's lambda references it (HOF lambdas re-evaluate embedded
    expressions per element).
    """
    per_user = events.groupBy("user_id").agg(
        F.collect_list(
            F.when(
                F.col("event_type").isin(*stages),
                F.struct(F.col("ts").alias("ts"), F.col("event_type").alias("et")),
            )
        ).alias("evs")
    )
    def _stage_cond(stage: str, prev_col: str | None):
        # Closure factory — NOT lambda defaults: PySpark derives the
        # HOF arity from the lambda's parameter count.
        if prev_col is None:
            return lambda e: e["et"] == stage
        pc = F.col(prev_col)
        return lambda e: (e["et"] == stage) & (e["ts"] > pc)

    prev = None
    for stage in stages:
        cond = _stage_cond(stage, prev)
        per_user = per_user.withColumn(
            f"t_{stage}",
            F.array_min(F.transform(F.filter(F.col("evs"), cond), lambda e: e["ts"])),
        )
        prev = f"t_{stage}"
    reached = sum((F.col(f"t_{s}").isNotNull()).cast("int") for s in stages)
    return per_user.drop("evs").withColumn("stage_reached", reached.cast("int"))


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view->click->purchase funnel per user in one scan (windowFunnel shape)."""
    events = load_table(spark, "events", sf_dir)
    return funnel_stages(events).orderBy("user_id")


FUNNEL_VIEW_CLICK_PURCHASE_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
       CAST((v.user_id IS NOT NULL)::INT + (c.user_id IS NOT NULL)::INT
            + (p.user_id IS NOT NULL)::INT AS INTEGER) AS stage_reached
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
ORDER BY u.user_id
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_active): distinct users active in
    week cohort+offset, where cohort is the user's first-active ISO
    week."""
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = (
        events.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("act_week"),
        )
        .distinct()
    )
    return (
        act.groupBy(
            "cohort_week",
            F.expr("datediff(act_week, cohort_week) DIV 7").cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly signup-cohort retention matrix (cohort week x weeks-since, distinct users)."""
    events = load_table(spark, "events", sf_dir)
    return cohort_retention(events)


COHORT_RETENTION_WEEKLY_SQL = """
WITH first AS (
  SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id, f.cohort_week, DATE_TRUNC('week', e.ts) AS act_week
  FROM events e JOIN first f ON f.user_id = e.user_id
)
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
       CAST(DATE_DIFF('day', cohort_week, act_week) // 7 AS INTEGER) AS week_offset,
       COUNT(DISTINCT user_id) AS n_active
FROM act
GROUP BY 1, 2
ORDER BY 1, 2
"""


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion-latency summary: for each user with a
    purchase at-or-after their first view, the delta in microseconds;
    reported as one exact row (n, min, max, DOUBLED median — the
    repo's integer-exact median convention).

    r12: the median comes from the K63/A17 one-pass layout — collapse
    deltas to (d_us, count), run the two-pass keyed prefix sums, and
    read BOTH middle order statistics off the cumulative counts by
    exact integer rank comparison. The former histogram-narrowing
    selection ran up to four extra counting passes over a persisted
    delta table (17 blocking construction jobs measured at sf0.1; the
    A17 rework measured the same swap at 234 s → 20 s at sf10). One
    bounded collect assembles the answer-sized single row (the
    count_triangles literal convention), which also keeps the
    degenerate-corpus 0-convention: no conversions → zero literals,
    every column int64 (a NULL would drift the pandas dtype to
    float64 and fail the typed hash even on matching values)."""
    from pyspark.sql import functions as F

    from ..sources.catalog import load_table
    from .quality_audit import _keyed_prefix

    events = load_table(spark, "events", sf_dir)
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .join(views, "user_id")
        .filter(F.col("ts") >= F.col("vt"))
        .groupBy("user_id", "vt")
        .agg(F.min("ts").alias("pt"))
    )
    # No persist here: _keyed_prefix consumes its input exactly once
    # (its own internal layout persist is the shared intermediate), so
    # caching the collapse would only serve a REPEATED run in the same
    # session — a bench-convention artifact, not a query win (r12
    # verdict item 3).
    cnt = (
        purchases.select((F.unix_micros("pt") - F.unix_micros("vt")).alias("d_us"))
        .groupBy("d_us")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("key", F.lit(1))
    )
    pre = _keyed_prefix(cnt, ["d_us"], "c")
    r_lo = F.expr("(t + 1) div 2")  # lower-middle rank (exact integer)
    r_hi = F.expr("(t + 2) div 2")  # upper-middle rank (== r_lo when t odd)
    rows = (
        pre.groupBy("key")
        .agg(
            F.max("t").alias("n"),
            F.min("d_us").alias("min_us"),
            F.max("d_us").alias("max_us"),
            (
                F.min(F.when(F.col("cum") >= r_lo, F.col("d_us")))
                + F.min(F.when(F.col("cum") >= r_hi, F.col("d_us")))
            ).alias("med2"),
        )
        .collect()
    )
    vals = (
        (int(rows[0]["n"]), int(rows[0]["min_us"]), int(rows[0]["max_us"]), int(rows[0]["med2"]))
        if rows
        else (0, 0, 0, 0)
    )
    return spark.createDataFrame(
        [vals], "n_conversions long, min_us long, max_us long, median2_us long"
    )


FUNNEL_TIME_TO_CONVERT_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS vt FROM events WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(v.vt) AS vt, MIN(e.ts) AS pt
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.vt
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
),
d AS (SELECT EPOCH_US(pt) - EPOCH_US(vt) AS d_us FROM p)
SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(COALESCE(MIN(d_us), 0) AS BIGINT) AS min_us,
       CAST(COALESCE(MAX(d_us), 0) AS BIGINT) AS max_us,
       CAST(COALESCE(2 * QUANTILE_CONT(d_us, 0.5), 0) AS BIGINT) AS median2_us
FROM d
"""


# ─────────────── A11: user journey paths ───────────────

from pyspark.sql import Window  # noqa: E402

JOURNEY_LEN = 5
TOP_PATHS = 50


def user_journey_paths(events: DataFrame, depth: int = JOURNEY_LEN) -> DataFrame:
    """Top entry journeys: each user's FIRST ``depth`` event types in
    (ts, event_id) order joined into a path string, counted across
    users — the Sankey/top-paths view a funnel designer reads before
    committing to a fixed funnel (K49's trigrams answer "what
    sub-sequences are common ANYWHERE"; this answers "how do journeys
    START").

    Determinism: the per-user order carries the (ts, event_id) total
    tie-break; the path is built from sort_array over (position,
    type) structs, so the string is engine-identical. Top-k is a
    TakeOrdered with the (count DESC, path ASC) total order.

    Scale shape: ONE Exchange on user_id (row_number + filter ≤ depth
    inside the sorted partition — users are plentiful, the per-key
    window parallelizes), one groupBy(user) collect of ≤ depth
    structs, one map-side-combined groupBy(path) count, one
    distributed TakeOrdered. No collect_list ever exceeds ``depth``
    elements per user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("k", F.row_number().over(w))
        .filter(F.col("k") <= depth)
    )
    paths = (
        firsts.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("k"), F.col("event_type").alias("t")))
            ).alias("steps")
        )
        .select(
            F.array_join(F.transform(F.col("steps"), lambda s: s["t"]), ">").alias(
                "path"
            )
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(TOP_PATHS)
        .select("path", F.col("n_users").cast("long").alias("n_users"))
    )


def events_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: top 50 first-5-event journey paths with user support."""
    events = load_table(spark, "events", sf_dir)
    return user_journey_paths(events)


EVENTS_USER_JOURNEYS_SQL = f"""
WITH firsts AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS k
  FROM events
),
paths AS (
  SELECT user_id, STRING_AGG(event_type, '>' ORDER BY k) AS path
  FROM firsts
  WHERE k <= {JOURNEY_LEN}
  GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM paths
GROUP BY path
ORDER BY n_users DESC, path ASC
LIMIT {TOP_PATHS}
"""


# ─────────────── A12: cohort lifetime-value curves ───────────────


def cohort_ltv(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Cumulative revenue per acquisition cohort — the LTV curve that
    tells finance when a cohort pays back: customers are grouped by
    their FIRST order's year, each cohort's revenue is bucketed by
    years-since-acquisition, and cumulated along the offset axis.
    A8's retention counts heads; this follows the money.

    Shapes: cohort assignment is one min() window over the customer
    key (high-cardinality → parallel, no collect); the curve table is
    (cohort_year × offsets) — value-domain-sized — so the cumulative
    window over it is trivially bounded. Revenue rides the exact cent
    grid; the mean-LTV-per-customer lands once on the micro grid."""
    w = Window.partitionBy(cust_col)
    cents = F.round(F.col(amount_col) * 100).cast("long")
    marked = orders.select(
        F.col(cust_col).alias("cust"),
        F.year(date_col).alias("yr"),
        cents.alias("cents"),
    ).withColumn("cohort_year", F.min("yr").over(Window.partitionBy("cust")))
    curve = (
        marked.groupBy(
            "cohort_year", (F.col("yr") - F.col("cohort_year")).alias("year_offset")
        )
        .agg(
            F.countDistinct("cust").alias("n_active"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    cohort_size = (
        marked.filter(F.col("yr") == F.col("cohort_year"))
        .groupBy("cohort_year")
        .agg(F.countDistinct("cust").alias("cohort_customers"))
    )
    wc = Window.partitionBy("cohort_year").orderBy("year_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        curve.join(F.broadcast(cohort_size), "cohort_year")
        .withColumn("cum_revenue_cents", F.sum("revenue_cents").over(wc))
        .select(
            F.col("cohort_year").cast("long").alias("cohort_year"),
            F.col("year_offset").cast("long").alias("year_offset"),
            F.col("cohort_customers").cast("long").alias("cohort_customers"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("revenue_cents").cast("long").alias("revenue_cents"),
            F.col("cum_revenue_cents").cast("long").alias("cum_revenue_cents"),
            F.expr("cum_revenue_cents * 10000 div cohort_customers")
            .cast("long")
            .alias("ltv_per_customer_micro"),
        )
        .orderBy("cohort_year", "year_offset")
    )


def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: yearly-cohort cumulative LTV over orders."""
    from ..sources.catalog import load_table

    orders = load_table(spark, "orders", sf_dir)
    return cohort_ltv(orders)


CUSTOMER_COHORT_LTV_SQL = """
WITH marked AS (
  SELECT o_custkey AS cust,
         YEAR(o_orderdate) AS yr,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         MIN(YEAR(o_orderdate)) OVER (PARTITION BY o_custkey) AS cohort_year
  FROM orders
),
curve AS (
  SELECT cohort_year, yr - cohort_year AS year_offset,
         CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_active,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM marked GROUP BY 1, 2
),
cohort_size AS (
  SELECT cohort_year, CAST(COUNT(DISTINCT cust) AS BIGINT) AS cohort_customers
  FROM marked WHERE yr = cohort_year GROUP BY 1
)
SELECT CAST(c.cohort_year AS BIGINT) AS cohort_year,
       CAST(c.year_offset AS BIGINT) AS year_offset,
       s.cohort_customers,
       c.n_active,
       c.revenue_cents,
       CAST(SUM(c.revenue_cents) OVER (PARTITION BY c.cohort_year ORDER BY c.year_offset
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_revenue_cents,
       CAST(CAST(SUM(c.revenue_cents) OVER (PARTITION BY c.cohort_year ORDER BY c.year_offset
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
            * 10000 // s.cohort_customers AS BIGINT) AS ltv_per_customer_micro
FROM curve c JOIN cohort_size s USING (cohort_year)
ORDER BY cohort_year, year_offset
"""


# ───────────────────────── linear multi-touch attribution ─────────────────────────

#: Lookback window for attribution: touches at-or-before a purchase
#: within this many seconds share its revenue.
ATTRIBUTION_WINDOW_S = 7 * 24 * 3600


def linear_touch_attribution(
    events: DataFrame, window_s: int = ATTRIBUTION_WINDOW_S
) -> DataFrame:
    """Linear multi-touch revenue attribution — the marketing-science
    step past `asof_view_before_purchase`'s last-touch answer: every
    view/click in the 7-day window before a purchase shares that
    purchase's revenue EQUALLY (reference has per-type engagement
    summaries only, src/youtube.py; attribution is what a channel
    budget actually reads).

    Spark-first shape: NO interval join. Each purchase learns its
    in-window touch counts from two conditional RANGE-frame windows
    over the user's epoch-second timeline (partitioned by the
    high-cardinality user key — parallel at any corpus size, state
    per task bounded by one user's 7-day activity), then ONE
    map-side-combined aggregation folds per-purchase integral shares.

    Exactness: shares are integral cent divisions (view_cents =
    cents·n_view div total). Truncation remainders are NOT smeared —
    they surface as an explicit `rounding_remainder` row, so
    Σ attributed_cents across the four output rows ≡ Σ purchase cents
    (a conservation contract the pytest pins). Purchases with NULL
    value are excluded; `none` carries full cents of touchless
    purchases.
    """
    base = events.select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("ts_sec"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-int(window_s), 0)
    )
    cnt = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).over(w)  # noqa: E731
    touched = base.select(
        "*",
        cnt("view").alias("n_view"),
        cnt("click").alias("n_click"),
    )
    p = touched.filter(
        (F.col("event_type") == "purchase") & F.col("cents").isNotNull()
    ).withColumn("n_touch", F.col("n_view") + F.col("n_click"))
    p = p.select(
        "cents",
        "n_view",
        "n_click",
        "n_touch",
        F.when(
            F.col("n_touch") > 0,
            F.expr("(cents * n_view) div n_touch"),
        ).alias("view_cents"),
        F.when(
            F.col("n_touch") > 0,
            F.expr("(cents * n_click) div n_touch"),
        ).alias("click_cents"),
    )
    agg = p.agg(
        F.coalesce(F.sum("view_cents"), F.lit(0)).cast("long").alias("sv"),
        F.coalesce(F.sum("click_cents"), F.lit(0)).cast("long").alias("sc"),
        F.coalesce(F.sum(F.when(F.col("n_touch") == 0, F.col("cents"))), F.lit(0))
        .cast("long")
        .alias("sn"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("n_touch") > 0,
                    F.col("cents") - F.col("view_cents") - F.col("click_cents"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sr"),
        F.sum(F.when(F.col("n_view") > 0, 1).otherwise(0)).cast("long").alias("nv"),
        F.sum(F.when(F.col("n_click") > 0, 1).otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when(F.col("n_touch") == 0, 1).otherwise(0)).cast("long").alias("nn"),
        F.sum(F.when(F.col("n_touch") > 0, 1).otherwise(0)).cast("long").alias("nr"),
    )
    rows = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("channel"),
                    F.col("nv").alias("n_purchases"),
                    F.col("sv").alias("attributed_cents"),
                ),
                F.struct(
                    F.lit("click").alias("channel"),
                    F.col("nc").alias("n_purchases"),
                    F.col("sc").alias("attributed_cents"),
                ),
                F.struct(
                    F.lit("none").alias("channel"),
                    F.col("nn").alias("n_purchases"),
                    F.col("sn").alias("attributed_cents"),
                ),
                F.struct(
                    F.lit("rounding_remainder").alias("channel"),
                    F.col("nr").alias("n_purchases"),
                    F.col("sr").alias("attributed_cents"),
                ),
            )
        ).alias("r")
    ).select("r.channel", "r.n_purchases", "r.attributed_cents")
    return rows.orderBy("channel")


def purchase_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: linear multi-touch attribution of purchase revenue to the
    view/click touches in each purchase's trailing 7-day window."""
    events = load_table(spark, "events", sf_dir)
    return linear_touch_attribution(events)


PURCHASE_TOUCH_ATTRIBUTION_SQL = f"""
WITH base AS (
  SELECT user_id, event_type,
         CAST(epoch(ts) AS BIGINT) AS ts_sec,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
touched AS (
  SELECT *,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN {ATTRIBUTION_WINDOW_S} PRECEDING AND CURRENT ROW) AS n_view,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN {ATTRIBUTION_WINDOW_S} PRECEDING AND CURRENT ROW) AS n_click
  FROM base
),
p AS (
  SELECT cents, n_view, n_click, n_view + n_click AS n_touch,
         CASE WHEN n_view + n_click > 0 THEN (cents * n_view) // (n_view + n_click) END AS view_cents,
         CASE WHEN n_view + n_click > 0 THEN (cents * n_click) // (n_view + n_click) END AS click_cents
  FROM touched
  WHERE event_type = 'purchase' AND cents IS NOT NULL
),
agg AS (
  SELECT COALESCE(SUM(view_cents), 0) AS sv,
         COALESCE(SUM(click_cents), 0) AS sc,
         COALESCE(SUM(CASE WHEN n_touch = 0 THEN cents END), 0) AS sn,
         COALESCE(SUM(CASE WHEN n_touch > 0 THEN cents - view_cents - click_cents END), 0) AS sr,
         COALESCE(SUM(CASE WHEN n_view > 0 THEN 1 ELSE 0 END), 0) AS nv,
         COALESCE(SUM(CASE WHEN n_click > 0 THEN 1 ELSE 0 END), 0) AS nc,
         COALESCE(SUM(CASE WHEN n_touch = 0 THEN 1 ELSE 0 END), 0) AS nn,
         COALESCE(SUM(CASE WHEN n_touch > 0 THEN 1 ELSE 0 END), 0) AS nr
  FROM p
)
SELECT 'view' AS channel, CAST(nv AS BIGINT) AS n_purchases, CAST(sv AS BIGINT) AS attributed_cents FROM agg
UNION ALL SELECT 'click', CAST(nc AS BIGINT), CAST(sc AS BIGINT) FROM agg
UNION ALL SELECT 'none', CAST(nn AS BIGINT), CAST(sn AS BIGINT) FROM agg
UNION ALL SELECT 'rounding_remainder', CAST(nr AS BIGINT), CAST(sr AS BIGINT) FROM agg
ORDER BY channel
"""


# ─────────────── A16: funnel-step A/B significance ───────────────


def funnel_step_ab(events: DataFrame, stages: tuple[str, ...] = STAGES) -> DataFrame:
    """Two-proportion z-test per FUNNEL TRANSITION between the
    user-parity arms: for each step k→k+1 the population is the users
    who reached step k in each arm and the success is reaching k+1 —
    the question an experiment readout actually asks ("did the
    variant move click→purchase, not just raw purchases?"), which
    K36's per-event-type test cannot answer because its denominators
    are events, not funnel-stage populations.

    Machinery: one ordered-funnel pass (A7's one-scan shape) → a
    six-counter global aggregate → two transition rows exploded from
    a literal array → K36's fixed-parenthesization z pipeline
    (correctly-rounded IEEE ops only, quantized once). Same NULL
    guards: an empty reached-population or zero-variance pool yields
    NULL z."""
    sr = funnel_stages(events, stages).select(
        (F.col("user_id") % 2 == 0).alias("is_a"), "stage_reached"
    )
    g = sr.agg(
        *[
            F.count_if(F.col("is_a") & (F.col("stage_reached") >= k)).alias(f"a{k}")
            for k in range(1, len(stages) + 1)
        ],
        *[
            F.count_if(~F.col("is_a") & (F.col("stage_reached") >= k)).alias(f"b{k}")
            for k in range(1, len(stages) + 1)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(f"{stages[k - 1]}->{stages[k]}").alias("step"),
                F.col(f"a{k}").alias("n_a"),
                F.col(f"a{k + 1}").alias("s_a"),
                F.col(f"b{k}").alias("n_b"),
                F.col(f"b{k + 1}").alias("s_b"),
            )
            for k in range(1, len(stages))
        ]
    )
    t = g.select(F.explode(rows).alias("t")).select("t.*")
    p_a = F.col("s_a").cast("double") / F.nullif(F.col("n_a"), F.lit(0)).cast("double")
    p_b = F.col("s_b").cast("double") / F.nullif(F.col("n_b"), F.lit(0)).cast("double")
    p_pool = (F.col("s_a") + F.col("s_b")).cast("double") / F.nullif(
        (F.col("n_a") + F.col("n_b")), F.lit(0)
    ).cast("double")
    se = F.sqrt(
        (p_pool * (F.lit(1.0) - p_pool))
        * (
            F.lit(1.0) / F.nullif(F.col("n_a"), F.lit(0)).cast("double")
            + F.lit(1.0) / F.nullif(F.col("n_b"), F.lit(0)).cast("double")
        )
    )
    z = (p_a - p_b) / F.nullif(se, F.lit(0.0))
    return t.select(
        "step",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("s_a").cast("long").alias("s_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("s_b").cast("long").alias("s_b"),
        F.floor((p_a - p_b) * 1_000_000 + 0.5).cast("long").alias("rate_diff_micro"),
        F.floor(z * 1_000_000 + 0.5).cast("long").alias("z_micro"),
    ).orderBy("step")


def funnel_step_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (A16): per-transition funnel z between the parity arms —
    arms split the same traffic, so z should sit low; the gate
    verifies the stage-population test arithmetic."""
    from ..sources.catalog import load_table

    events = load_table(spark, "events", sf_dir)
    return funnel_step_ab(events)


FUNNEL_STEP_SIGNIFICANCE_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
),
sr AS (
  SELECT u.user_id % 2 = 0 AS is_a,
         (v.user_id IS NOT NULL)::INT + (c.user_id IS NOT NULL)::INT
           + (p.user_id IS NOT NULL)::INT AS stage_reached
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN v ON v.user_id = u.user_id
  LEFT JOIN c ON c.user_id = u.user_id
  LEFT JOIN p ON p.user_id = u.user_id
),
g AS (
  SELECT COUNT(*) FILTER (WHERE is_a AND stage_reached >= 1) AS a1,
         COUNT(*) FILTER (WHERE is_a AND stage_reached >= 2) AS a2,
         COUNT(*) FILTER (WHERE is_a AND stage_reached >= 3) AS a3,
         COUNT(*) FILTER (WHERE NOT is_a AND stage_reached >= 1) AS b1,
         COUNT(*) FILTER (WHERE NOT is_a AND stage_reached >= 2) AS b2,
         COUNT(*) FILTER (WHERE NOT is_a AND stage_reached >= 3) AS b3
  FROM sr
),
t AS (
  SELECT 'view->click' AS step, a1 AS n_a, a2 AS s_a, b1 AS n_b, b2 AS s_b FROM g
  UNION ALL
  SELECT 'click->purchase', a2, a3, b2, b3 FROM g
)
SELECT step,
       CAST(n_a AS BIGINT) AS n_a, CAST(s_a AS BIGINT) AS s_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(s_b AS BIGINT) AS s_b,
       CAST(FLOOR((CAST(s_a AS DOUBLE) / NULLIF(n_a, 0)
                   - CAST(s_b AS DOUBLE) / NULLIF(n_b, 0)) * 1000000 + 0.5) AS BIGINT) AS rate_diff_micro,
       CAST(FLOOR(
         ((CAST(s_a AS DOUBLE) / NULLIF(n_a, 0) - CAST(s_b AS DOUBLE) / NULLIF(n_b, 0))
          / NULLIF(SQRT((CAST(s_a + s_b AS DOUBLE) / NULLIF(n_a + n_b, 0)
                         * (1.0 - CAST(s_a + s_b AS DOUBLE) / NULLIF(n_a + n_b, 0)))
                        * (1.0 / NULLIF(n_a, 0) + 1.0 / NULLIF(n_b, 0))), 0.0))
         * 1000000 + 0.5) AS BIGINT) AS z_micro
FROM t
ORDER BY step
"""
