"""Kaplan–Meier survival estimation over user activity spans (K41).

Cohort retention (A8) answers "what fraction came back in week w";
the KM estimator answers the censoring-aware version: "what is the
probability a user's active lifetime exceeds d hours", WITHOUT
pretending users still active at the observation edge have churned
(Kaplan & Meier 1958 — the standard churn/lifetime curve).

Model: a user's lifetime = HOURS between their first and last event
(hour-truncated stamps — epoch arithmetic stays exact integer in
both engines); users whose last event falls within CENSOR_HOURS of
the corpus's maximum timestamp are RIGHT-CENSORED (they were still active when
observation ended — they stay in every risk set up to their span but
never count as churn events). At each distinct event duration d:

    S(d) = Π_{d' ≤ d} (1 − churn(d') / at_risk(d'))

Engine portability: risk sets and churn counts are exact integers
(at_risk via a SUFFIX sum over the duration table — no global-N
scalar join needed); each factor enters as ln(1 − churn/at_risk)
quantized to the 1e-6 grid PER TERM (the lm.py convention — libm's
1-ulp LN differences sit 9 orders below the grid), and the running
product is then an exact integer sum. Output is log-survival in
micro-nats (survival_ppm = exp of it is NOT emitted — exp is not
correctly rounded IEEE). When the last risk set churns entirely,
S = 0 and the log diverges: those rows carry NULL, propagated by a
cumulative flag, never by letting SUM skip an infinite term.

Scale note: the per-user span aggregation is the only corpus-sized
work (one map-side-combined groupBy). The duration table the windows
run over is bounded by the CALENDAR SPAN in days — not by rows — so
its single-partition ordered windows are bounded by construction
(the vocabulary-window class, not a data-sized global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.catalog import load_table

CENSOR_HOURS = 12
LOG_SCALE = 1_000_000


def km_survival(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    censor_hours: int = CENSOR_HOURS,
) -> DataFrame:
    """(duration_hours, n_risk, n_churn, log_surv_micro): the KM curve
    at every duration where at least one un-censored churn occurs."""
    spans = df.groupBy(key_col).agg(
        F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts")
    )
    edge = spans.agg(F.max("last_ts").alias("gmax"))
    per_user = spans.crossJoin(F.broadcast(edge)).select(
        F.expr(
            "(unix_timestamp(date_trunc('hour', last_ts))"
            " - unix_timestamp(date_trunc('hour', first_ts))) DIV 3600"
        ).alias("dur"),
        (
            F.col("last_ts")
            > F.col("gmax") - F.expr(f"INTERVAL {int(censor_hours)} HOURS")
        ).alias("censored"),
    )
    tab = per_user.groupBy("dur").agg(
        F.count(F.lit(1)).alias("total_d"),
        F.count_if(~F.col("censored")).alias("churn_d"),
    )
    w_suffix = Window.orderBy("dur").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_prefix = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n_risk = F.sum("total_d").over(w_suffix)
    frac = F.col("churn_d").cast("double") / F.col("n_risk").cast("double")
    term = F.when(
        F.col("churn_d") < F.col("n_risk"),
        F.floor(F.log(F.lit(1.0) - frac) * LOG_SCALE + F.lit(0.5)).cast("long"),
    )  # churn_d == n_risk → S hits 0 → NULL (log diverges)
    out = (
        tab.withColumn("n_risk", n_risk)
        .withColumn("term", term)
        .withColumn("dead", F.max(F.col("term").isNull()).over(w_prefix))
        .withColumn(
            "log_surv_micro",
            F.when(~F.col("dead"), F.sum("term").over(w_prefix)),
        )
        .filter(F.col("churn_d") > 0)
        .select(
            F.col("dur").cast("int").alias("duration_hours"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("churn_d").cast("long").alias("n_churn"),
            "log_surv_micro",
        )
        .orderBy("duration_hours")
    )
    return out


def users_churn_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the Kaplan–Meier user-lifetime curve over `events` (hour
    granularity) with a 12-hour right-censor window."""
    events = load_table(spark, "events", sf_dir)
    return km_survival(events)


USERS_CHURN_SURVIVAL_SQL = f"""
WITH spans AS (
  SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts FROM events GROUP BY user_id
),
edge AS (SELECT MAX(last_ts) AS gmax FROM spans),
per_user AS (
  SELECT (EPOCH(DATE_TRUNC('hour', last_ts)) - EPOCH(DATE_TRUNC('hour', first_ts))) // 3600 AS dur,
         last_ts > gmax - INTERVAL {CENSOR_HOURS} HOUR AS censored
  FROM spans, edge
),
tab AS (
  SELECT dur, CAST(COUNT(*) AS BIGINT) AS total_d,
         CAST(COUNT(*) FILTER (WHERE NOT censored) AS BIGINT) AS churn_d
  FROM per_user GROUP BY dur
),
risk AS (
  SELECT dur, total_d, churn_d,
         CAST(SUM(total_d) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
  FROM tab
),
terms AS (
  SELECT dur, n_risk, churn_d,
         CASE WHEN churn_d < n_risk
              THEN CAST(FLOOR(LN(1.0 - CAST(churn_d AS DOUBLE) / CAST(n_risk AS DOUBLE)) * {LOG_SCALE} + 0.5) AS BIGINT)
         END AS term
  FROM risk
),
cum AS (
  SELECT dur, n_risk, churn_d, term,
         MAX(term IS NULL) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead,
         CAST(SUM(term) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_term
  FROM terms
)
SELECT CAST(dur AS INTEGER) AS duration_hours, n_risk, churn_d AS n_churn,
       CASE WHEN NOT dead THEN cum_term END AS log_surv_micro
FROM cum
WHERE churn_d > 0
ORDER BY duration_hours
"""


# ─────────────── A14: Nelson–Aalen cumulative hazard ───────────────


def na_cum_hazard(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    censor_hours: int = CENSOR_HOURS,
) -> DataFrame:
    """Nelson–Aalen cumulative hazard over the same censored-lifetime
    model as `km_survival` — the estimator a reliability read prefers
    when risk sets get small (K-M's product collapses to 0 the moment
    one full risk set churns; N-A's sum H(d) = Σ churn(d')/at_risk(d')
    stays finite and its slope IS the hazard rate).

    Fully exact integers end-to-end — unlike K-M there is NO log:
    each increment is one integral division churn·10⁶ div at_risk,
    and the curve is a prefix sum of those exact terms (truncation
    ≤ #durations·1e-6, identical in both engines by construction).

    Same scale shape as K-M: one corpus-sized span aggregation; every
    window runs on the calendar-span-bounded duration table."""
    spans = df.groupBy(key_col).agg(
        F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts")
    )
    edge = spans.agg(F.max("last_ts").alias("gmax"))
    per_user = spans.crossJoin(F.broadcast(edge)).select(
        F.expr(
            "(unix_timestamp(date_trunc('hour', last_ts))"
            " - unix_timestamp(date_trunc('hour', first_ts))) DIV 3600"
        ).alias("dur"),
        (
            F.col("last_ts")
            > F.col("gmax") - F.expr(f"INTERVAL {int(censor_hours)} HOURS")
        ).alias("censored"),
    )
    tab = per_user.groupBy("dur").agg(
        F.count(F.lit(1)).alias("total_d"),
        F.count_if(~F.col("censored")).alias("churn_d"),
    )
    w_suffix = Window.orderBy("dur").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_prefix = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        tab.withColumn("n_risk", F.sum("total_d").over(w_suffix))
        .withColumn(
            "haz",
            F.expr("(churn_d * 1000000) div n_risk"),
        )
        .withColumn("cum_hazard_micro", F.sum("haz").over(w_prefix))
        .filter(F.col("churn_d") > 0)
        .select(
            F.col("dur").cast("int").alias("duration_hours"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("churn_d").cast("long").alias("n_churn"),
            F.col("haz").cast("long").alias("hazard_micro"),
            F.col("cum_hazard_micro").cast("long").alias("cum_hazard_micro"),
        )
        .orderBy("duration_hours")
    )
    return out


def users_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the Nelson–Aalen cumulative-hazard curve over `events`
    (hour granularity, 12-hour right-censor window)."""
    events = load_table(spark, "events", sf_dir)
    return na_cum_hazard(events)


USERS_CHURN_HAZARD_SQL = f"""
WITH spans AS (
  SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts FROM events GROUP BY user_id
),
edge AS (SELECT MAX(last_ts) AS gmax FROM spans),
per_user AS (
  SELECT (EPOCH(DATE_TRUNC('hour', last_ts)) - EPOCH(DATE_TRUNC('hour', first_ts))) // 3600 AS dur,
         last_ts > gmax - INTERVAL {CENSOR_HOURS} HOUR AS censored
  FROM spans, edge
),
tab AS (
  SELECT dur, CAST(COUNT(*) AS BIGINT) AS total_d,
         CAST(COUNT(*) FILTER (WHERE NOT censored) AS BIGINT) AS churn_d
  FROM per_user GROUP BY dur
),
risk AS (
  SELECT dur, total_d, churn_d,
         CAST(SUM(total_d) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
  FROM tab
),
haz AS (
  SELECT dur, n_risk, churn_d,
         (churn_d * 1000000) // n_risk AS haz
  FROM risk
)
SELECT CAST(dur AS INTEGER) AS duration_hours,
       n_risk,
       churn_d AS n_churn,
       CAST(haz AS BIGINT) AS hazard_micro,
       CAST(SUM(haz) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_hazard_micro
FROM haz
WHERE churn_d > 0
ORDER BY duration_hours
"""
