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


# ─────────────── A15: two-group log-rank test ───────────────


def logrank_test(
    df: DataFrame,
    group_col,
    key_col: str = "user_id",
    ts_col: str = "ts",
    censor_hours: int = CENSOR_HOURS,
) -> DataFrame:
    """Mantel–Cox log-rank test between two survival groups over the
    same censored-lifetime model as `km_survival` — the standard "are
    these two churn curves the same?" significance read that the KM /
    Nelson–Aalen estimators (A10/A14) describe but cannot test.

    At each distinct duration d with dd = churn events across both
    groups, nd at risk (n1d in group 1): observed O1 = Σ d1d;
    expected under H0 E1 = Σ dd·n1d/nd; hypergeometric variance
    V = Σ dd·(n1d/nd)·(n2d/nd)·(nd−dd)/(nd−1). The statistic
    (O1−E1)²/V is χ²(1) under H0.

    Exact-integer arithmetic (K48 quantize-before-fold): each
    per-duration term enters the fold on the micro grid —
    e1 = dd·n1d·10⁶ div nd, and the variance in two integral stages
    sized to stay inside DECIMAL(38,0) at any corpus scale
    (q1 = n1d·10⁶ div nd ≤ 10⁶, then v = dd·q1·n2d·(nd−dd) div
    (nd·(nd−1)) — the largest intermediate is ~10⁶·nd³, safe to
    nd ≈ 10¹⁰ users); χ²_micro = (O1·10⁶ − E1_micro)² div V_micro.

    Scale: one corpus-sized span aggregation (map-side combined);
    every window runs on the calendar-span-bounded duration table
    (the A10/A14 argument); the output is ONE row."""
    spans = df.groupBy(key_col).agg(
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        F.first(group_col).alias("grp"),
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
        "grp",
    )
    g1 = F.col("grp") == 1
    tab = per_user.groupBy("dur").agg(
        F.count_if(g1).alias("t1"),
        F.count_if(~g1).alias("t2"),
        F.count_if(g1 & ~F.col("censored")).alias("d1"),
        F.count_if(~g1 & ~F.col("censored")).alias("d2"),
    )
    w_suffix = Window.orderBy("dur").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    risk = (
        tab.withColumn("n1", F.sum("t1").over(w_suffix))
        .withColumn("n2", F.sum("t2").over(w_suffix))
        .filter((F.col("d1") + F.col("d2")) > 0)
    )
    dd = "(d1 + d2)"
    nd = "(n1 + n2)"
    terms = risk.select(
        F.col("d1").cast("long").alias("d1"),
        F.col("d2").cast("long").alias("d2"),
        F.expr(
            f"cast({dd} as decimal(38,0)) * cast(n1 as decimal(38,0)) * 1000000"
            f" div cast({nd} as decimal(38,0))"
        ).alias("e1_term"),
        F.when(
            F.expr(f"{nd} > 1"),
            F.expr(
                f"cast({dd} as decimal(38,0))"
                f" * (cast(n1 as decimal(38,0)) * 1000000 div cast({nd} as decimal(38,0)))"
                f" * cast(n2 as decimal(38,0)) * cast({nd} - (d1 + d2) as decimal(38,0))"
                f" div (cast({nd} as decimal(38,0)) * cast({nd} - 1 as decimal(38,0)))"
            ),
        )
        .otherwise(F.lit(0).cast("decimal(38,0)"))
        .alias("v_term"),
    )
    agg = terms.agg(
        F.sum("d1").alias("o1"),
        F.sum("d2").alias("o2"),
        F.sum("e1_term").alias("e1_micro"),
        F.sum("v_term").alias("v_micro"),
    )
    diff = "(cast(o1 as decimal(38,0)) * 1000000 - e1_micro)"
    return agg.select(
        F.col("o1").cast("long").alias("observed_1"),
        F.col("o2").cast("long").alias("observed_2"),
        F.col("e1_micro").cast("long").alias("expected_1_micro"),
        F.expr(
            "cast(o1 + o2 as decimal(38,0)) * 1000000 - e1_micro"
        ).cast("long").alias("expected_2_micro"),
        F.col("v_micro").cast("long").alias("variance_micro"),
        F.when(
            F.col("v_micro") > 0,
            F.expr(f"{diff} * {diff} div v_micro"),
        ).cast("long").alias("chi2_micro"),
    )


def users_churn_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: log-rank test of the user-parity arms' churn curves over
    `events` — the same arms K36/K42/E-AUC compare, here on censored
    lifetimes. Arms split the same traffic, so χ² should sit low; the
    gate verifies the test arithmetic, not a real treatment effect."""
    events = load_table(spark, "events", sf_dir)
    return logrank_test(
        events, F.when(F.col("user_id") % 2 == 0, 1).otherwise(2)
    )


USERS_CHURN_LOGRANK_SQL = f"""
WITH spans AS (
  SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 2 END AS grp
  FROM events GROUP BY user_id
),
edge AS (SELECT MAX(last_ts) AS gmax FROM spans),
per_user AS (
  SELECT (EPOCH(DATE_TRUNC('hour', last_ts)) - EPOCH(DATE_TRUNC('hour', first_ts))) // 3600 AS dur,
         last_ts > gmax - INTERVAL {CENSOR_HOURS} HOUR AS censored,
         grp
  FROM spans, edge
),
tab AS (
  SELECT dur,
         CAST(COUNT(*) FILTER (WHERE grp = 1) AS BIGINT) AS t1,
         CAST(COUNT(*) FILTER (WHERE grp = 2) AS BIGINT) AS t2,
         CAST(COUNT(*) FILTER (WHERE grp = 1 AND NOT censored) AS BIGINT) AS d1,
         CAST(COUNT(*) FILTER (WHERE grp = 2 AND NOT censored) AS BIGINT) AS d2
  FROM per_user GROUP BY dur
),
risk AS (
  SELECT dur, d1, d2,
         CAST(SUM(t1) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1,
         CAST(SUM(t2) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n2
  FROM tab
),
terms AS (
  SELECT d1, d2,
         CAST(d1 + d2 AS HUGEINT) * CAST(n1 AS HUGEINT) * 1000000
           // CAST(n1 + n2 AS HUGEINT) AS e1_term,
         CASE WHEN n1 + n2 > 1
              THEN CAST(d1 + d2 AS HUGEINT)
                   * (CAST(n1 AS HUGEINT) * 1000000 // CAST(n1 + n2 AS HUGEINT))
                   * CAST(n2 AS HUGEINT) * CAST(n1 + n2 - d1 - d2 AS HUGEINT)
                   // (CAST(n1 + n2 AS HUGEINT) * CAST(n1 + n2 - 1 AS HUGEINT))
              ELSE 0 END AS v_term
  FROM risk
  WHERE d1 + d2 > 0
),
agg AS (
  SELECT CAST(SUM(d1) AS HUGEINT) AS o1, CAST(SUM(d2) AS HUGEINT) AS o2,
         CAST(SUM(e1_term) AS HUGEINT) AS e1_micro,
         CAST(SUM(v_term) AS HUGEINT) AS v_micro
  FROM terms
)
SELECT CAST(o1 AS BIGINT) AS observed_1,
       CAST(o2 AS BIGINT) AS observed_2,
       CAST(e1_micro AS BIGINT) AS expected_1_micro,
       CAST((o1 + o2) * 1000000 - e1_micro AS BIGINT) AS expected_2_micro,
       CAST(v_micro AS BIGINT) AS variance_micro,
       CASE WHEN v_micro > 0
            THEN CAST((o1 * 1000000 - e1_micro) * (o1 * 1000000 - e1_micro) // v_micro AS BIGINT)
       END AS chi2_micro
FROM agg
"""
