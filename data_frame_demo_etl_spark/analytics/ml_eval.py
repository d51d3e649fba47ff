"""Model-evaluation primitives — the metrics a training-data pipeline
computes AFTER the model (or a heuristic scorer) runs: ROC-AUC,
inter-rater agreement, the best single-split stump, and CUPED
variance-reduced A/B means.

Reference parity: the reference's analytics layer stops at funnel /
engagement aggregates (src/analytics.py); this family extends the
engine to the evaluation metrics its users compute downstream, the
same way the K-family extends the statistical audits. Everything is
exact integer arithmetic on the cent/ppm grids (the K42 doubled-rank
and V7 count-algebra conventions), so every gate is fully
DuckDB-oracled with no float knife-edges.

Scale shapes: AUC rides the (key, cents) value-domain aggregation +
two-pass keyed prefix (never a per-row global window); kappa and CUPED
are one map-side-combined aggregation each; the stump enumerates the
VALUE-DOMAIN (distinct cents) as split candidates, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table
from .quality_audit import _keyed_prefix

DEC = "decimal(38,0)"


# ─────────────── ROC-AUC (rank-sum, tie-exact) ───────────────


def roc_auc(
    df: DataFrame,
    key_col,
    label_col,
    score_cents_col,
) -> DataFrame:
    """Per-key ROC-AUC of an integer score against a binary label —
    the probability a random positive outscores a random negative,
    ties counted half. Computed EXACTLY via the Mann–Whitney identity
    (AUC = U⁺/(n⁺·n⁻)) on doubled rank sums, so ties need no float
    midranks: 2·ranksum⁺ = Σ_v p_v·(2·before_v + t_v + 1) over the
    distinct-score table, U2 = 2·ranksum⁺ − n⁺(n⁺+1), and
    auc_ppm = U2·10⁶ div (2·n⁺·n⁻) — integers end to end (K42's
    construction, reused for the metric instead of the test).

    Scale: one (key, score) map-side-combined aggregation (value-
    domain-sized output), the two-pass keyed prefix, one ≤keys agg."""
    cnt = (
        df.select(
            key_col.alias("key"),
            score_cents_col.alias("cents"),
            label_col.alias("is_pos"),
        )
        .filter(F.col("cents").isNotNull() & F.col("is_pos").isNotNull())
        .groupBy("key", "cents")
        .agg(
            F.count(F.lit(1)).alias("tv"),
            F.count_if(F.col("is_pos")).alias("pv"),
        )
    )
    pre = _keyed_prefix(cnt, ["cents"], "tv")
    before = (F.col("cum") - F.col("tv")).cast(DEC)
    term = F.col("pv").cast(DEC) * (
        F.lit(2).cast(DEC) * before + F.col("tv").cast(DEC) + F.lit(1).cast(DEC)
    )
    g = (
        pre.withColumn("r2p_term", term)
        .groupBy("key")
        .agg(
            F.first("t").alias("n_rows"),
            F.sum("pv").alias("n_pos"),
            F.sum("r2p_term").alias("r2p"),
        )
    )
    npos = F.col("n_pos").cast(DEC)
    nneg = F.col("n_rows").cast(DEC) - npos
    u2 = F.col("r2p") - npos * (npos + F.lit(1).cast(DEC))
    return g.select(
        F.col("key"),
        F.col("n_pos").cast("long").alias("n_pos"),
        nneg.cast("long").alias("n_neg"),
        u2.cast("long").alias("u2_pos"),
        F.when(
            (npos > 0) & (nneg > 0),
            F.expr("(r2p - cast(n_pos as decimal(38,0)) * (cast(n_pos as decimal(38,0)) + 1)) * 1000000")
            .cast(DEC),
        ).alias("__num"),
        (F.lit(2).cast(DEC) * npos * nneg).alias("__den"),
    ).select(
        "key",
        "n_pos",
        "n_neg",
        "u2_pos",
        F.when(F.col("__den") > 0, F.expr("__num div __den")).cast("long").alias("auc_ppm"),
    )


def events_value_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: does event value predict a purchase? ROC-AUC of the cent
    score against the purchase label, per user-parity arm (the same
    arms K36/K42 test — here they measure metric stability: two arms
    of the same traffic should show the same AUC)."""
    events = load_table(spark, "events", sf_dir)
    return roc_auc(
        events.filter(F.col("value").isNotNull()),
        F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B")),
        F.col("event_type") == F.lit("purchase"),
        F.round(F.col("value") * 100).cast("long"),
    ).withColumnRenamed("key", "arm").orderBy("arm")


EVENTS_VALUE_AUC_SQL = """
WITH cnt AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS key,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS tv,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS pv
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
pre AS (
  SELECT key, tv, pv,
         SUM(tv) OVER (PARTITION BY key ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv AS before_v
  FROM cnt
),
g AS (
  SELECT key,
         CAST(SUM(tv) AS HUGEINT) AS n_rows,
         CAST(SUM(pv) AS HUGEINT) AS n_pos,
         SUM(CAST(pv AS HUGEINT) * (2 * CAST(before_v AS HUGEINT) + CAST(tv AS HUGEINT) + 1)) AS r2p
  FROM pre GROUP BY key
)
SELECT key AS arm,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_rows - n_pos AS BIGINT) AS n_neg,
       CAST(r2p - n_pos * (n_pos + 1) AS BIGINT) AS u2_pos,
       CASE WHEN n_pos > 0 AND n_rows - n_pos > 0
            THEN CAST((r2p - n_pos * (n_pos + 1)) * 1000000
                      // (2 * n_pos * (n_rows - n_pos)) AS BIGINT)
       END AS auc_ppm
FROM g
ORDER BY arm
"""


# ─────────────── average precision (PR-AUC companion) ───────────────


def average_precision(
    df: DataFrame,
    key_col,
    label_col,
    score_cents_col,
) -> DataFrame:
    """Per-key average precision (the PR-curve summary; sklearn's
    tie-exact step-sum definition): AP = Σ_v (p_v / n⁺) · P_v over
    DISTINCT score values v in descending order, where p_v is the
    positives at v and P_v = TP_{≥v} / N_{≥v} the precision of the
    score-≥v prefix. ROC-AUC (above) misleads exactly where a
    training-data pipeline lives — rare-positive labels — because the
    FPR denominator is the huge negative class; AP re-anchors on the
    positive class (its chance line is the prevalence, not 0.5).

    Arithmetic: per-threshold term quantized to the micro grid BEFORE
    the fold (the K48 convention) — q_v = p_v·TP_{≥v}·10⁶ div N_{≥v}
    on exact decimals, ap_ppm = (Σ q_v) div n⁺ — integers end to end,
    both engines floor on non-negatives.

    Scale: identical to roc_auc — one (key, cents) map-side-combined
    aggregation to the value domain, the two-pass keyed prefix (cum of
    tv AND pv in one pass), one ≤keys agg. Descending-prefix counts
    come from total − ascending-prefix + self, so the shared ASC
    layout serves both metrics."""
    cnt = (
        df.select(
            key_col.alias("key"),
            score_cents_col.alias("cents"),
            label_col.alias("is_pos"),
        )
        .filter(F.col("cents").isNotNull() & F.col("is_pos").isNotNull())
        .groupBy("key", "cents")
        .agg(
            F.count(F.lit(1)).alias("tv"),
            F.count_if(F.col("is_pos")).alias("pv"),
        )
    )
    pre = _keyed_prefix(cnt, ["cents"], ["tv", "pv"])
    n_ge = F.col("t_tv").cast(DEC) - F.col("cum_tv").cast(DEC) + F.col("tv").cast(DEC)
    tp_ge = F.col("t_pv").cast(DEC) - F.col("cum_pv").cast(DEC) + F.col("pv").cast(DEC)
    q = F.expr(
        "cast(pv as decimal(38,0)) * __tp_ge * 1000000 div __n_ge"
    )
    g = (
        pre.withColumn("__n_ge", n_ge)
        .withColumn("__tp_ge", tp_ge)
        .withColumn("__q", q)
        .groupBy("key")
        .agg(
            F.first("t_tv").alias("n_rows"),
            F.first("t_pv").alias("n_pos"),
            F.sum("__q").alias("qsum"),
        )
    )
    npos = F.col("n_pos").cast(DEC)
    return g.select(
        "key",
        F.col("n_pos").cast("long").alias("n_pos"),
        (F.col("n_rows").cast(DEC) - npos).cast("long").alias("n_neg"),
        F.when(npos > 0, F.expr("qsum div cast(n_pos as decimal(38,0))"))
        .cast("long")
        .alias("ap_ppm"),
        F.expr("cast(n_pos as decimal(38,0)) * 1000000 div cast(n_rows as decimal(38,0))")
        .cast("long")
        .alias("prevalence_ppm"),
    )


def events_value_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: average precision of event value (cents) against the
    purchase label, per user-parity arm — the rare-positive companion
    of events_value_auc on the identical score/label/arm frame, with
    the prevalence column exposing the chance line AP must clear."""
    events = load_table(spark, "events", sf_dir)
    return (
        average_precision(
            events.filter(F.col("value").isNotNull()),
            F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B")),
            F.col("event_type") == F.lit("purchase"),
            F.round(F.col("value") * 100).cast("long"),
        )
        .withColumnRenamed("key", "arm")
        .orderBy("arm")
    )


EVENTS_VALUE_AP_SQL = """
WITH cnt AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS key,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS tv,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS pv
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
pre AS (
  SELECT key, tv, pv,
         SUM(tv) OVER w AS cum_tv,
         SUM(pv) OVER w AS cum_pv,
         SUM(tv) OVER (PARTITION BY key) AS t_tv,
         SUM(pv) OVER (PARTITION BY key) AS t_pv
  FROM cnt
  WINDOW w AS (PARTITION BY key ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
terms AS (
  SELECT key, t_tv, t_pv,
         CAST(pv AS HUGEINT) * CAST(t_pv - cum_pv + pv AS HUGEINT) * 1000000
           // CAST(t_tv - cum_tv + tv AS HUGEINT) AS q
  FROM pre
)
SELECT key AS arm,
       CAST(t_pv AS BIGINT) AS n_pos,
       CAST(t_tv - t_pv AS BIGINT) AS n_neg,
       CASE WHEN t_pv > 0 THEN CAST(SUM(q) // CAST(t_pv AS HUGEINT) AS BIGINT) END AS ap_ppm,
       CAST(CAST(t_pv AS HUGEINT) * 1000000 // CAST(t_tv AS HUGEINT) AS BIGINT) AS prevalence_ppm
FROM terms
GROUP BY key, t_tv, t_pv
ORDER BY arm
"""


# ─────────────── Cohen's kappa (two deterministic raters) ───────────────


def cohens_kappa(
    df: DataFrame, rater_a_col, rater_b_col
) -> DataFrame:
    """Chance-corrected agreement between two binary raters:

        κ = (p_o − p_e) / (1 − p_e)
          = (n·agree − (r1·c1 + r0·c0)) / (n² − (r1·c1 + r0·c0))

    — one count algebra, no floats: kappa_ppm is a single integral
    division of exact integers (numerator may be negative — worse-
    than-chance agreement — which both engines truncate identically,
    tests/test_signed_divisions.py). One map-side-combined pass."""
    g = (
        df.select(rater_a_col.alias("ra"), rater_b_col.alias("rb"))
        .filter(F.col("ra").isNotNull() & F.col("rb").isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("ra") & F.col("rb")).alias("n11"),
            F.count_if(F.col("ra") & ~F.col("rb")).alias("n10"),
            F.count_if(~F.col("ra") & F.col("rb")).alias("n01"),
        )
    )
    n = F.col("n").cast(DEC)
    n11 = F.col("n11").cast(DEC)
    n10 = F.col("n10").cast(DEC)
    n01 = F.col("n01").cast(DEC)
    n00 = n - n11 - n10 - n01
    r1 = n11 + n10
    c1 = n11 + n01
    r0 = n - r1
    c0 = n - c1
    pe_num = r1 * c1 + r0 * c0
    num = (n * (n11 + n00) - pe_num) * F.lit(1_000_000).cast(DEC)
    den = n * n - pe_num
    return g.select(
        F.col("n").cast("long").alias("n"),
        F.col("n11").cast("long").alias("n_both"),
        (n11 + n00).cast("long").alias("n_agree"),
        F.when(den > 0, num.cast(DEC))
        .alias("__num"),
        den.alias("__den"),
    ).select(
        "n",
        "n_both",
        "n_agree",
        F.when(F.col("__den") > 0, F.expr("__num div __den"))
        .cast("long")
        .alias("kappa_ppm"),
    )


def events_rater_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: κ between the 'high-value' rater (value ≥ 50) and the
    'conversion-intent' rater (type ∈ {click, purchase}) — the
    label-quality audit run before trusting either as training
    signal."""
    events = load_table(spark, "events", sf_dir)
    return cohens_kappa(
        events.filter(F.col("value").isNotNull()),
        F.round(F.col("value") * 100).cast("long") >= 5000,
        F.col("event_type").isin("click", "purchase"),
    )


EVENTS_RATER_AGREEMENT_SQL = """
WITH g AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(COUNT(*) FILTER (WHERE CAST(ROUND(value * 100) AS BIGINT) >= 5000
                                 AND event_type IN ('click', 'purchase')) AS HUGEINT) AS n11,
         CAST(COUNT(*) FILTER (WHERE CAST(ROUND(value * 100) AS BIGINT) >= 5000
                                 AND event_type NOT IN ('click', 'purchase')) AS HUGEINT) AS n10,
         CAST(COUNT(*) FILTER (WHERE CAST(ROUND(value * 100) AS BIGINT) < 5000
                                 AND event_type IN ('click', 'purchase')) AS HUGEINT) AS n01
  FROM events WHERE value IS NOT NULL
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(n11 AS BIGINT) AS n_both,
       CAST(n11 + (n - n11 - n10 - n01) AS BIGINT) AS n_agree,
       CASE WHEN n * n - ((n11 + n10) * (n11 + n01) + (n - n11 - n10) * (n - n11 - n01)) > 0
            THEN CAST((n * (n11 + (n - n11 - n10 - n01))
                       - ((n11 + n10) * (n11 + n01) + (n - n11 - n10) * (n - n11 - n01))) * 1000000
                      // (n * n - ((n11 + n10) * (n11 + n01) + (n - n11 - n10) * (n - n11 - n01)))
                 AS BIGINT)
       END AS kappa_ppm
FROM g
"""


# ─────────────── decision stump (best single split by Gini) ───────────────

STUMP_TOP = 5


def gini_stump(
    df: DataFrame, label_col, score_cents_col, top: int = STUMP_TOP
) -> DataFrame:
    """The best `top` split thresholds on an integer score for a
    binary label, by weighted Gini impurity — the depth-1 tree that
    answers "is this feature worth anything?" before training spends
    real compute on it.

    A split at threshold v sends cents < v left, ≥ v right. Both
    sides' class counts come from ONE prefix pass over the distinct-
    cents table (candidates = value domain, never the corpus). The
    impurity is scored on a deterministic ppm grid:

        gini_ppm(v) = (L² − Lp² − Ln²)·10⁶ div (L·n)
                    + (R² − Rp² − Rn²)·10⁶ div (R·n)

    (two explicit floors — the GRID is the definition, so both
    engines agree bit-for-bit; the float form differs from it by
    < 2 ppm which never flips a comparison that matters at corpus
    sizes). Ties rank by smaller threshold."""
    cnt = (
        df.select(
            F.lit(1).alias("key"),
            score_cents_col.alias("cents"),
            label_col.alias("is_pos"),
        )
        .filter(F.col("cents").isNotNull() & F.col("is_pos").isNotNull())
        .groupBy("key", "cents")
        .agg(
            F.count(F.lit(1)).alias("tv"),
            F.count_if(F.col("is_pos")).alias("pv"),
        )
    )
    pre = _keyed_prefix(cnt, ["cents"], ["tv", "pv"])
    lt = (F.col("cum_tv") - F.col("tv")).cast(DEC)  # rows strictly below v
    lp = (F.col("cum_pv") - F.col("pv")).cast(DEC)
    n = F.col("t_tv").cast(DEC)
    tp = F.col("t_pv").cast(DEC)
    rt = n - lt
    rp = tp - lp
    ln_ = lt - lp
    rn_ = rt - rp
    side = lambda tot, pos, neg: (tot * tot - pos * pos - neg * neg) * F.lit(  # noqa: E731
        1_000_000
    ).cast(DEC)
    gini = F.when(
        (lt > 0) & (rt > 0),
        F.expr(
            "(__ls div __ld) + (__rs div __rd)"
        ),
    )
    scored = (
        pre.withColumn("__ls", side(lt, lp, ln_))
        .withColumn("__ld", (lt * n))
        .withColumn("__rs", side(rt, rp, rn_))
        .withColumn("__rd", (rt * n))
        .withColumn("gini_ppm", gini.cast("long"))
        .filter(F.col("gini_ppm").isNotNull())
        .select(F.col("cents").alias("threshold_cents"), "gini_ppm")
    )
    from pyspark.sql import Window

    w = Window.partitionBy().orderBy(
        F.col("gini_ppm").asc(), F.col("threshold_cents").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("threshold_cents").cast("long").alias("threshold_cents"),
            "gini_ppm",
        )
        .orderBy("rank")
    )


def events_purchase_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the 5 best value thresholds separating purchases from
    the rest — the one-feature baseline every fancier model must
    beat."""
    events = load_table(spark, "events", sf_dir)
    return gini_stump(
        events.filter(F.col("value").isNotNull()),
        F.col("event_type") == F.lit("purchase"),
        F.round(F.col("value") * 100).cast("long"),
    )


EVENTS_PURCHASE_STUMP_SQL = f"""
WITH cnt AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS tv,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS pv
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
pre AS (
  SELECT cents, tv, pv,
         CAST(SUM(tv) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tv AS HUGEINT) AS lt,
         CAST(SUM(pv) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - pv AS HUGEINT) AS lp,
         CAST(SUM(tv) OVER () AS HUGEINT) AS n,
         CAST(SUM(pv) OVER () AS HUGEINT) AS tp
  FROM cnt
),
scored AS (
  SELECT cents AS threshold_cents,
         CAST(((lt * lt - lp * lp - (lt - lp) * (lt - lp)) * 1000000 // (lt * n))
              + (((n - lt) * (n - lt) - (tp - lp) * (tp - lp)
                  - ((n - lt) - (tp - lp)) * ((n - lt) - (tp - lp))) * 1000000 // ((n - lt) * n))
           AS BIGINT) AS gini_ppm
  FROM pre
  WHERE lt > 0 AND n - lt > 0
)
SELECT CAST(rank AS BIGINT) AS rank, threshold_cents, gini_ppm FROM (
  SELECT threshold_cents, gini_ppm,
         ROW_NUMBER() OVER (ORDER BY gini_ppm ASC, threshold_cents ASC) AS rank
  FROM scored
) WHERE rank <= {STUMP_TOP}
ORDER BY rank
"""


# ─────────────── CUPED variance-reduced A/B means ───────────────


def cuped_adjusted_means(
    pre_post: DataFrame,
) -> DataFrame:
    """CUPED (Deng et al. 2013): shrink each arm's post-period mean by
    θ·(its pre-period mean − the global pre mean), θ = cov(pre, post)
    / var(pre) fit on ALL units — removing the variance explained by
    pre-experiment behavior without biasing the contrast.

    Input: one row per unit (unit_id, arm, pre_cents, post_cents).
    Grid arithmetic: θ lands once on the ppm grid
    (θ_ppm = (n·Σxy − Σx·Σy)·10⁶ div (n·Σx² − Σx²) — numerator signed,
    truncation parity verified); each arm's adjusted mean is then

        adj_micro = post_mean_micro − θ_ppm·(pre_mean_micro −
                    global_pre_mean_micro) div 10⁶

    — every intermediate an exact integer, so both engines agree
    bit-for-bit. Scale: one global agg + one per-arm agg, both
    map-side-combined; the join is a broadcast of one scalar row."""
    units = pre_post.select(
        "arm",
        F.col("pre_cents").cast("long").alias("x"),
        F.col("post_cents").cast("long").alias("y"),
    )
    glob = units.agg(
        F.count(F.lit(1)).cast(DEC).alias("n"),
        F.sum("x").cast(DEC).alias("sx"),
        F.sum("y").cast(DEC).alias("sy"),
        F.sum(F.col("x").cast(DEC) * F.col("x").cast(DEC)).alias("sxx"),
        F.sum(F.col("x").cast(DEC) * F.col("y").cast(DEC)).alias("sxy"),
    ).select(
        "n",
        "sx",
        F.when(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0,
            F.expr(
                "((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx)"
            ),
        ).alias("theta_ppm"),
        F.expr("(sx * 1000000) div n").alias("gpre_micro"),
    )
    arms = units.groupBy("arm").agg(
        F.count(F.lit(1)).cast(DEC).alias("na"),
        F.sum("x").cast(DEC).alias("sxa"),
        F.sum("y").cast(DEC).alias("sya"),
    )
    return (
        arms.crossJoin(F.broadcast(glob))
        .select(
            "arm",
            F.col("na").cast("long").alias("n_units"),
            F.expr("(sya * 1000000) div na").cast("long").alias("post_mean_micro"),
            F.col("theta_ppm").cast("long").alias("theta_ppm"),
            F.when(
                F.col("theta_ppm").isNotNull(),
                F.expr(
                    "(sya * 1000000) div na"
                    " - (theta_ppm * ((sxa * 1000000) div na - gpre_micro)) div 1000000"
                ),
            )
            .cast("long")
            .alias("adj_mean_micro"),
        )
        .orderBy("arm")
    )


def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: CUPED-adjusted per-arm mean event value. Units are users;
    pre = each user's value sum in the first half of the observed
    window, post = second half (split at the midpoint timestamp,
    computed as an exact epoch-second integral midpoint); arms are
    user parity."""
    events = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    bounds = events.agg(
        F.min(F.unix_timestamp("ts")).alias("lo"),
        F.max(F.unix_timestamp("ts")).alias("hi"),
    )
    per_user = (
        events.crossJoin(F.broadcast(bounds))
        .withColumn("__mid", F.expr("(lo + hi) div 2"))
        .groupBy(F.col("user_id"))
        .agg(
            F.sum(
                F.when(
                    F.unix_timestamp("ts") <= F.col("__mid"),
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("pre_cents"),
            F.sum(
                F.when(
                    F.unix_timestamp("ts") > F.col("__mid"),
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("post_cents"),
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B")).alias("arm"),
            "pre_cents",
            "post_cents",
        )
    )
    return cuped_adjusted_means(per_user)


EVENTS_CUPED_ADJUSTMENT_SQL = """
WITH bounds AS (
  SELECT CAST(FLOOR(MIN(EPOCH(ts))) AS BIGINT) AS lo, CAST(FLOOR(MAX(EPOCH(ts))) AS BIGINT) AS hi
  FROM events WHERE value IS NOT NULL
),
units AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(SUM(CASE WHEN CAST(FLOOR(EPOCH(ts)) AS BIGINT) <= (lo + hi) // 2
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x,
         CAST(SUM(CASE WHEN CAST(FLOOR(EPOCH(ts)) AS BIGINT) > (lo + hi) // 2
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS HUGEINT) AS y
  FROM events CROSS JOIN bounds
  WHERE value IS NOT NULL
  GROUP BY user_id
),
gall AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM units
),
g2 AS (
  SELECT n, sx,
         CASE WHEN n * sxx - sx * sx > 0
              THEN ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
         END AS theta_ppm,
         (sx * 1000000) // n AS gpre_micro
  FROM gall
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS HUGEINT) AS na,
         CAST(SUM(x) AS HUGEINT) AS sxa, CAST(SUM(y) AS HUGEINT) AS sya
  FROM units GROUP BY arm
)
SELECT arm,
       CAST(na AS BIGINT) AS n_units,
       CAST((sya * 1000000) // na AS BIGINT) AS post_mean_micro,
       CAST(theta_ppm AS BIGINT) AS theta_ppm,
       CASE WHEN theta_ppm IS NOT NULL
            THEN CAST((sya * 1000000) // na
                      - (theta_ppm * ((sxa * 1000000) // na - gpre_micro)) // 1000000
                 AS BIGINT)
       END AS adj_mean_micro
FROM arms CROSS JOIN g2
ORDER BY arm
"""


# ─────────────── calibration curve (reliability diagram) ───────────────

CAL_BINS = 10


def calibration_curve(
    df: DataFrame, label_col, score_cents_col, n_bins: int = CAL_BINS
) -> DataFrame:
    """Reliability diagram of an integer score against a binary label:
    equal-width score bins, each reporting its mean score and observed
    positive rate — the table that says WHERE a scorer is over- or
    under-confident (AUC says only that ranking works overall).

    Binning is the PSI convention: exact integer arithmetic against
    the observed [lo, hi] bounds — bin = least(bins−1,
    (cents−lo)·bins div (hi−lo+1)) — so both engines bucket every row
    identically; per-bin mean score and positive rate land once each
    on the micro/ppm grids. Only non-empty bins appear (the curve is
    read bin-by-bin; a zero row has no rate). One bounds aggregate +
    one map-side-combined binned aggregation."""
    base = df.select(
        score_cents_col.alias("cents"), label_col.alias("is_pos")
    ).filter(F.col("cents").isNotNull() & F.col("is_pos").isNotNull())
    bounds = base.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    binned = base.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(n_bins - 1),
            F.expr(f"(cents - lo) * {n_bins} div (hi - lo + 1)"),
        ).alias("bin"),
        "cents",
        "is_pos",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cents").cast(DEC)).alias("s"),
            F.count_if(F.col("is_pos")).alias("pos"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("n"),
            F.expr("(s * 10000) div cast(n as decimal(38,0))")
            .cast("long")
            .alias("mean_score_micro"),
            F.expr("pos * 1000000 div n").cast("long").alias("positive_rate_ppm"),
        )
        .orderBy("bin")
    )


def events_value_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: reliability of event value as a purchase predictor — the
    binned companion of events_value_auc (AUC says value ranks
    purchases above the rest; this says at WHICH value levels)."""
    events = load_table(spark, "events", sf_dir)
    return calibration_curve(
        events.filter(F.col("value").isNotNull()),
        F.col("event_type") == F.lit("purchase"),
        F.round(F.col("value") * 100).cast("long"),
    )


EVENTS_VALUE_CALIBRATION_SQL = f"""
WITH base AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         event_type = 'purchase' AS is_pos
  FROM events WHERE value IS NOT NULL
),
bounds AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM base),
binned AS (
  SELECT LEAST({CAL_BINS - 1}, (cents - lo) * {CAL_BINS} // (hi - lo + 1)) AS bin,
         cents, is_pos
  FROM base CROSS JOIN bounds
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST((SUM(CAST(cents AS HUGEINT)) * 10000) // COUNT(*) AS BIGINT) AS mean_score_micro,
       CAST(COUNT(*) FILTER (WHERE is_pos) * 1000000 // COUNT(*) AS BIGINT) AS positive_rate_ppm
FROM binned
GROUP BY bin
ORDER BY bin
"""


# ─────────────── Brier score decomposition (Murphy 1973) ───────────────


def brier_decomposition(
    df: DataFrame, label_col, score_cents_col, n_bins: int = CAL_BINS
) -> DataFrame:
    """Brier score of a normalized integer forecast against a binary
    label, decomposed into reliability / resolution / uncertainty
    (Murphy 1973) over the calibration gate's equal-width bins:

        BS   = (1/N) Σ_rows (f − y)²
        REL  = (1/N) Σ_k n_k (f̄_k − o_k)²   (penalty: calibration)
        RES  = (1/N) Σ_k n_k (o_k − ō)²     (credit: discrimination)
        UNC  = ō(1 − ō)                      (irreducible base-rate term)

    The forecast is the min-max-normalized score f = (cents−lo)·10⁶
    div (hi−lo) — the monotone [0,1]-mapping that makes "is the raw
    score usable as a probability?" a well-posed question (E-CAL shows
    the curve; this gate scores it). All four terms are reported in
    ppm² (Brier × 10¹²). BS = REL − RES + UNC holds exactly only for
    bin-constant forecasts; with continuous forecasts the gap is the
    within-bin forecast variance (plus ≤1-unit grid truncation), which
    the planted test pins.

    Exactness: every per-bin term quantizes to the grid BEFORE the
    fold (K48): rel_k = (Sf_k − 10⁶·p_k)² div n_k and
    res_k = (10⁶·p_k − n_k·ō_ppm)² div n_k on DECIMAL(38,0) (largest
    intermediate (10⁶·n_k)² ≤ 10³⁶ at 10¹² rows); BS folds the exact
    row-level identity Σ(f−y)² = Σf² − 2·10⁶·Σ_pos f + 10¹²·P from
    three per-bin integer sums. Scale: one bounds aggregate + one
    map-side-combined binned aggregation + bin-table (≤ n_bins rows)
    arithmetic — the E-CAL shape exactly."""
    base = df.select(
        score_cents_col.alias("cents"), label_col.alias("is_pos")
    ).filter(F.col("cents").isNotNull() & F.col("is_pos").isNotNull())
    bounds = base.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    f = F.when(
        F.col("hi") > F.col("lo"),
        F.expr("(cents - lo) * 1000000 div (hi - lo)"),
    ).otherwise(F.lit(0)).cast("long")
    binned = base.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(n_bins - 1),
            F.expr(f"(cents - lo) * {n_bins} div (hi - lo + 1)"),
        ).alias("bin"),
        f.alias("f"),
        "is_pos",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("is_pos")).alias("pos"),
        F.sum(F.col("f").cast(DEC)).alias("sf"),
        F.sum((F.col("f") * F.col("f")).cast(DEC)).alias("sf2"),
        F.sum(F.when(F.col("is_pos"), F.col("f")).otherwise(0).cast(DEC)).alias("sfp"),
    )
    totals = per_bin.agg(
        F.sum("n").alias("nn"),
        F.sum("pos").alias("pp"),
    ).select(
        "nn",
        "pp",
        F.expr("pp * 1000000 div nn").alias("obar_ppm"),
    )
    terms = per_bin.crossJoin(F.broadcast(totals)).select(
        "nn",
        "pp",
        "obar_ppm",
        F.expr(
            "(sf - cast(pos as decimal(38,0)) * 1000000)"
            " * (sf - cast(pos as decimal(38,0)) * 1000000)"
            " div cast(n as decimal(38,0))"
        ).alias("rel_k"),
        F.expr(
            "(cast(pos as decimal(38,0)) * 1000000 - cast(n as decimal(38,0)) * obar_ppm)"
            " * (cast(pos as decimal(38,0)) * 1000000 - cast(n as decimal(38,0)) * obar_ppm)"
            " div cast(n as decimal(38,0))"
        ).alias("res_k"),
        F.expr(
            "sf2 - 2 * 1000000 * sfp + cast(pos as decimal(38,0)) * 1000000 * 1000000"
        ).alias("bs_k"),
    )
    return (
        terms.groupBy("nn", "pp", "obar_ppm")
        .agg(
            F.sum("rel_k").alias("rel"),
            F.sum("res_k").alias("res"),
            F.sum("bs_k").alias("bs"),
        )
        .select(
            F.col("nn").cast("long").alias("n"),
            F.col("pp").cast("long").alias("n_pos"),
            F.col("obar_ppm").cast("long").alias("base_rate_ppm"),
            F.expr("bs div cast(nn as decimal(38,0))").cast("long").alias("bs_ppm2"),
            F.expr("rel div cast(nn as decimal(38,0))").cast("long").alias("reliability_ppm2"),
            F.expr("res div cast(nn as decimal(38,0))").cast("long").alias("resolution_ppm2"),
            F.expr("obar_ppm * (1000000 - obar_ppm)").cast("long").alias("uncertainty_ppm2"),
        )
    )


def events_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: Brier decomposition of min-max-normalized event value as
    a purchase-probability forecast — the scalar summary of the E-CAL
    reliability diagram on the identical score/label frame."""
    events = load_table(spark, "events", sf_dir)
    return brier_decomposition(
        events.filter(F.col("value").isNotNull()),
        F.col("event_type") == F.lit("purchase"),
        F.round(F.col("value") * 100).cast("long"),
    )


EVENTS_BRIER_SQL = f"""
WITH base AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         event_type = 'purchase' AS is_pos
  FROM events WHERE value IS NOT NULL
),
bounds AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM base),
binned AS (
  SELECT LEAST({CAL_BINS - 1}, (cents - lo) * {CAL_BINS} // (hi - lo + 1)) AS bin,
         CASE WHEN hi > lo THEN (cents - lo) * 1000000 // (hi - lo) ELSE 0 END AS f,
         is_pos
  FROM base CROSS JOIN bounds
),
per_bin AS (
  SELECT bin,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(COUNT(*) FILTER (WHERE is_pos) AS HUGEINT) AS pos,
         CAST(SUM(f) AS HUGEINT) AS sf,
         CAST(SUM(CAST(f AS HUGEINT) * f) AS HUGEINT) AS sf2,
         CAST(COALESCE(SUM(f) FILTER (WHERE is_pos), 0) AS HUGEINT) AS sfp
  FROM binned GROUP BY bin
),
totals AS (
  SELECT CAST(SUM(n) AS HUGEINT) AS nn, CAST(SUM(pos) AS HUGEINT) AS pp,
         CAST(SUM(pos) AS HUGEINT) * 1000000 // CAST(SUM(n) AS HUGEINT) AS obar_ppm
  FROM per_bin
),
terms AS (
  SELECT nn, pp, obar_ppm,
         (sf - pos * 1000000) * (sf - pos * 1000000) // n AS rel_k,
         (pos * 1000000 - n * obar_ppm) * (pos * 1000000 - n * obar_ppm) // n AS res_k,
         sf2 - 2 * 1000000 * sfp + pos * 1000000 * 1000000 AS bs_k
  FROM per_bin CROSS JOIN totals
)
SELECT CAST(nn AS BIGINT) AS n,
       CAST(pp AS BIGINT) AS n_pos,
       CAST(obar_ppm AS BIGINT) AS base_rate_ppm,
       CAST(SUM(bs_k) // nn AS BIGINT) AS bs_ppm2,
       CAST(SUM(rel_k) // nn AS BIGINT) AS reliability_ppm2,
       CAST(SUM(res_k) // nn AS BIGINT) AS resolution_ppm2,
       CAST(obar_ppm * (1000000 - obar_ppm) AS BIGINT) AS uncertainty_ppm2
FROM terms
GROUP BY nn, pp, obar_ppm
"""


# ─────────────── decile lift / gains table ───────────────

LIFT_DECILES = 10


def _score_decile_blocks(df: DataFrame, label_col, score_cents_col) -> DataFrame:
    """Shared E-LIFT / E-PR machinery: rank by score DESC, cut into
    10 population deciles (a tied-score block goes WHOLE to the decile
    of its first 0-based descending-rank position — d = start·10 div N
    with start = N − cum_≤v, so both engines cut identically with no
    fractional splitting), and return the 10-row cumulative table
    (decile, n, p, n_rows, n_pos, cum_rows, cum_pos).

    Scale: one (cents) value-domain aggregation + the two-pass keyed
    prefix; the decile table is 10 rows and its cumulative window is
    bounded by construction."""
    cnt = (
        df.select(score_cents_col.alias("cents"), label_col.alias("is_pos"))
        .filter(F.col("cents").isNotNull() & F.col("is_pos").isNotNull())
        .groupBy("cents")
        .agg(
            F.count(F.lit(1)).alias("tv"),
            F.count_if(F.col("is_pos")).alias("pv"),
        )
        .select(F.lit("all").alias("key"), "cents", "tv", "pv")
    )
    pre = _keyed_prefix(cnt, ["cents"], ["tv", "pv"])
    blocks = pre.select(
        "tv",
        "pv",
        F.col("t_tv").alias("n"),
        F.col("t_pv").alias("p"),
        F.expr(
            f"cast((t_tv - cum_tv) as decimal(38,0)) * {LIFT_DECILES}"
            " div cast(t_tv as decimal(38,0))"
        )
        .cast("long")
        .alias("decile"),
    )
    per_dec = blocks.groupBy("decile").agg(
        F.first("n").alias("n"),
        F.first("p").alias("p"),
        F.sum("tv").alias("n_rows"),
        F.sum("pv").alias("n_pos"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_dec.withColumn("cum_rows", F.sum("n_rows").over(w)).withColumn(
        "cum_pos", F.sum("n_pos").over(w)
    )


def lift_table(df: DataFrame, label_col, score_cents_col) -> DataFrame:
    """Decile gains/lift table — the campaign-targeting read of a
    scorer ("mail the top 10%: how many buyers do we reach?"): per
    `_score_decile_blocks`, with gain (share of all positives captured
    so far) and lift (capture rate vs random targeting).
    gain_ppm = cumP·10⁶ div P; lift_ppm = cumP·N·10⁶ div (cumN·P) —
    exact decimals end to end."""
    return (
        _score_decile_blocks(df, label_col, score_cents_col)
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("cum_rows").cast("long").alias("cum_rows"),
            F.col("cum_pos").cast("long").alias("cum_pos"),
            F.when(
                F.col("p") > 0,
                F.expr("cast(cum_pos as decimal(38,0)) * 1000000 div cast(p as decimal(38,0))"),
            ).cast("long").alias("gain_ppm"),
            F.when(
                (F.col("p") > 0) & (F.col("cum_rows") > 0),
                F.expr(
                    "cast(cum_pos as decimal(38,0)) * cast(n as decimal(38,0)) * 1000000"
                    " div (cast(cum_rows as decimal(38,0)) * cast(p as decimal(38,0)))"
                ),
            ).cast("long").alias("lift_ppm"),
        )
        .orderBy("decile")
    )


def events_value_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: decile gains/lift of event value against the purchase
    label — "target the highest-value decile" quantified, beside
    E-AUC (ranking), E-AP (rare-positive), E-CAL (calibration) and
    E-BRIER (decomposition) on the identical score/label frame."""
    events = load_table(spark, "events", sf_dir)
    return lift_table(
        events.filter(F.col("value").isNotNull()),
        F.col("event_type") == F.lit("purchase"),
        F.round(F.col("value") * 100).cast("long"),
    )


EVENTS_VALUE_LIFT_SQL = f"""
WITH cnt AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS tv,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS pv
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
pre AS (
  SELECT tv, pv,
         SUM(tv) OVER w AS cum_tv,
         SUM(tv) OVER () AS n,
         SUM(pv) OVER () AS p
  FROM cnt
  WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
blocks AS (
  SELECT tv, pv, n, p,
         CAST(n - cum_tv AS HUGEINT) * {LIFT_DECILES} // CAST(n AS HUGEINT) AS decile
  FROM pre
),
per_dec AS (
  SELECT decile, ANY_VALUE(n) AS n, ANY_VALUE(p) AS p,
         CAST(SUM(tv) AS BIGINT) AS n_rows, CAST(SUM(pv) AS BIGINT) AS n_pos
  FROM blocks GROUP BY decile
),
cum AS (
  SELECT decile, n, p, n_rows, n_pos,
         SUM(n_rows) OVER w2 AS cum_rows,
         SUM(n_pos) OVER w2 AS cum_pos
  FROM per_dec
  WINDOW w2 AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(decile AS INTEGER) AS decile,
       n_rows, n_pos,
       CAST(cum_rows AS BIGINT) AS cum_rows,
       CAST(cum_pos AS BIGINT) AS cum_pos,
       CASE WHEN p > 0
            THEN CAST(CAST(cum_pos AS HUGEINT) * 1000000 // CAST(p AS HUGEINT) AS BIGINT)
       END AS gain_ppm,
       CASE WHEN p > 0 AND cum_rows > 0
            THEN CAST(CAST(cum_pos AS HUGEINT) * CAST(n AS HUGEINT) * 1000000
                      // (CAST(cum_rows AS HUGEINT) * CAST(p AS HUGEINT)) AS BIGINT)
       END AS lift_ppm
FROM cum
ORDER BY decile
"""


# ─────────────── precision/recall-at-depth curve (E-PR) ───────────────


def pr_curve_table(df: DataFrame, label_col, score_cents_col) -> DataFrame:
    """Decile precision/recall-at-depth curve — the operating-point
    read E-AP's scalar summarizes away: at each targeting depth
    ("score the corpus, keep the top d/10"), what fraction of kept
    rows are positives (precision) and what fraction of all positives
    were kept (recall)? The rare-positive story a training-data
    pipeline reads when picking a quality-classifier threshold: AP
    says the ranking is good, THIS table says where to cut it.

    Same tie-exact decile blocks as E-LIFT (`_score_decile_blocks`);
    exact-integer metrics on the micro grid:
    precision_ppm = cumP·10⁶ div cumN, recall_ppm = cumP·10⁶ div P,
    f1_ppm = 2·cumP·10⁶ div (cumN + P) — the harmonic mean collapses
    to one floor division because both denominators share cumP.
    P = 0 → recall/f1 NULL (undefined, no positives to find)."""
    return (
        _score_decile_blocks(df, label_col, score_cents_col)
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("cum_rows").cast("long").alias("cum_rows"),
            F.col("cum_pos").cast("long").alias("cum_pos"),
            F.when(
                F.col("cum_rows") > 0,
                F.expr(
                    "cast(cum_pos as decimal(38,0)) * 1000000"
                    " div cast(cum_rows as decimal(38,0))"
                ),
            ).cast("long").alias("precision_ppm"),
            F.when(
                F.col("p") > 0,
                F.expr(
                    "cast(cum_pos as decimal(38,0)) * 1000000"
                    " div cast(p as decimal(38,0))"
                ),
            ).cast("long").alias("recall_ppm"),
            F.when(
                F.col("p") > 0,
                F.expr(
                    "cast(cum_pos as decimal(38,0)) * 2000000"
                    " div (cast(cum_rows as decimal(38,0)) + cast(p as decimal(38,0)))"
                ),
            ).cast("long").alias("f1_ppm"),
        )
        .orderBy("decile")
    )


def events_value_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (E-PR): precision/recall/F1 at each value-score decile
    against the purchase label — the operating-point curve beside
    E-AP's scalar on the identical score/label frame."""
    events = load_table(spark, "events", sf_dir)
    return pr_curve_table(
        events.filter(F.col("value").isNotNull()),
        F.col("event_type") == F.lit("purchase"),
        F.round(F.col("value") * 100).cast("long"),
    )


EVENTS_VALUE_PR_CURVE_SQL = f"""
WITH cnt AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS tv,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS pv
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
pre AS (
  SELECT tv, pv,
         SUM(tv) OVER w AS cum_tv,
         SUM(tv) OVER () AS n,
         SUM(pv) OVER () AS p
  FROM cnt
  WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
blocks AS (
  SELECT tv, pv, n, p,
         CAST(n - cum_tv AS HUGEINT) * {LIFT_DECILES} // CAST(n AS HUGEINT) AS decile
  FROM pre
),
per_dec AS (
  SELECT decile, ANY_VALUE(n) AS n, ANY_VALUE(p) AS p,
         CAST(SUM(tv) AS BIGINT) AS n_rows, CAST(SUM(pv) AS BIGINT) AS n_pos
  FROM blocks GROUP BY decile
),
cum AS (
  SELECT decile, n, p, n_rows, n_pos,
         SUM(n_rows) OVER w2 AS cum_rows,
         SUM(n_pos) OVER w2 AS cum_pos
  FROM per_dec
  WINDOW w2 AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(decile AS INTEGER) AS decile,
       n_rows, n_pos,
       CAST(cum_rows AS BIGINT) AS cum_rows,
       CAST(cum_pos AS BIGINT) AS cum_pos,
       CASE WHEN cum_rows > 0
            THEN CAST(CAST(cum_pos AS HUGEINT) * 1000000 // CAST(cum_rows AS HUGEINT) AS BIGINT)
       END AS precision_ppm,
       CASE WHEN p > 0
            THEN CAST(CAST(cum_pos AS HUGEINT) * 1000000 // CAST(p AS HUGEINT) AS BIGINT)
       END AS recall_ppm,
       CASE WHEN p > 0
            THEN CAST(CAST(cum_pos AS HUGEINT) * 2000000
                      // (CAST(cum_rows AS HUGEINT) + CAST(p AS HUGEINT)) AS BIGINT)
       END AS f1_ppm
FROM cum
ORDER BY decile
"""


# ─────────────── McNemar's test (paired rater disagreement) ───────────────


def mcnemar_test(df: DataFrame, rater_a_col, rater_b_col) -> DataFrame:
    """McNemar's χ² on the same paired-binary frame as Cohen's κ
    (E-KAP): κ asks "do the raters agree beyond chance?", McNemar asks
    the DIRECTIONAL follow-up — "when they disagree, is one rater
    systematically more positive?". Only the discordant cells matter:
    b = A∧¬B, c = ¬A∧B; χ²(1) = (|b−c|−1)²/(b+c) (Edwards continuity
    correction, the textbook form). Exact integers: counts from one
    map-side-combined aggregation, chi2_micro = (|b−c|−1)²·10⁶ div
    (b+c); b+c = 0 → NULL (no disagreement, test undefined)."""
    agg = df.select(
        rater_a_col.alias("a"), rater_b_col.alias("b")
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("a") & F.col("b")).alias("n_both"),
        F.count_if(F.col("a") & ~F.col("b")).alias("b_only"),
        F.count_if(~F.col("a") & F.col("b")).alias("c_only"),
    )
    disc = "cast(b_only + c_only as decimal(38,0))"
    corr = "cast(abs(b_only - c_only) - 1 as decimal(38,0))"
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_both").cast("long").alias("n_both"),
        F.col("b_only").cast("long").alias("b_only"),
        F.col("c_only").cast("long").alias("c_only"),
        F.when(
            (F.col("b_only") + F.col("c_only")) > 0,
            F.expr(f"greatest({corr}, cast(0 as decimal(38,0)))"
                   f" * greatest({corr}, cast(0 as decimal(38,0)))"
                   f" * 1000000 div {disc}"),
        ).cast("long").alias("chi2_micro"),
    )


def events_rater_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (E-MCN): McNemar's test between E-KAP's two raters — the
    high-value rater (cents ≥ 5000) vs the conversion-intent rater
    (click/purchase). A significant χ² says the raters' disagreement
    is one-sided, i.e. one label source is systematically looser."""
    events = load_table(spark, "events", sf_dir)
    return mcnemar_test(
        events.filter(F.col("value").isNotNull()),
        F.round(F.col("value") * 100).cast("long") >= 5000,
        F.col("event_type").isin("click", "purchase"),
    )


EVENTS_RATER_MCNEMAR_SQL = """
WITH g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE CAST(ROUND(value * 100) AS BIGINT) >= 5000
                                 AND event_type IN ('click', 'purchase')) AS BIGINT) AS n_both,
         CAST(COUNT(*) FILTER (WHERE CAST(ROUND(value * 100) AS BIGINT) >= 5000
                                 AND event_type NOT IN ('click', 'purchase')) AS BIGINT) AS b_only,
         CAST(COUNT(*) FILTER (WHERE CAST(ROUND(value * 100) AS BIGINT) < 5000
                                 AND event_type IN ('click', 'purchase')) AS BIGINT) AS c_only
  FROM events
  WHERE value IS NOT NULL
)
SELECT n, n_both, b_only, c_only,
       CASE WHEN b_only + c_only > 0
            THEN CAST(GREATEST(CAST(ABS(b_only - c_only) - 1 AS HUGEINT), 0)
                      * GREATEST(CAST(ABS(b_only - c_only) - 1 AS HUGEINT), 0)
                      * 1000000 // CAST(b_only + c_only AS HUGEINT) AS BIGINT)
       END AS chi2_micro
FROM g
"""


# ─────────────── NDCG@k ranking evaluation (E-NDCG) ───────────────

NDCG_K = 10
#: Literal micro-grid discount table w_r = round(10⁶ / log2(r+1)) for
#: ranks 1..k — computed ONCE here and embedded verbatim in both
#: engines, so the irrational log2 never enters either plan (the same
#: literal-constant policy as the anchor codebooks): parity holds by
#: construction, not by float luck.
import math as _math

NDCG_WEIGHTS = tuple(
    int(round(1_000_000 / _math.log2(r + 1))) for r in range(1, NDCG_K + 1)
)


def ndcg_by_key(
    df: DataFrame,
    key_col,
    group_col,
    rel_col,
    score_cents_col,
    tiebreak_col,
    k: int = NDCG_K,
) -> DataFrame:
    """Per-key mean NDCG@k over per-group rankings — the graded-
    relevance ranking metric (Järvelin & Kekäläinen 2002) that E-AUC's
    binary pairwise view cannot express: rank each group's rows by
    score (DESC, tiebreak ASC — a total order, so both engines walk
    identical permutations), DCG = Σ_{r≤k} rel_r · w_r with the
    literal NDCG_WEIGHTS discount, IDCG the same sum over the
    relevance-sorted ideal ranking, ndcg = DCG·10⁶ div IDCG. Groups
    with IDCG = 0 (no relevant rows) are excluded; the key row
    reports how many groups scored and the integer mean of their
    ndcg_ppm.

    Scale: two row_numbers over the SAME group-partitioned shuffle
    (groups are per-user — high cardinality, parallelizes fine), one
    group-sized agg, one key-sized agg. No global window, no join."""
    wlit = F.array(*[F.lit(w) for w in NDCG_WEIGHTS])
    from pyspark.sql import Window

    base = df.select(
        key_col.alias("key"),
        group_col.alias("grp"),
        rel_col.cast("long").alias("rel"),
        score_cents_col.alias("cents"),
        tiebreak_col.alias("tid"),
    ).filter(F.col("cents").isNotNull())
    wr = Window.partitionBy("grp").orderBy(F.col("cents").desc(), F.col("tid").asc())
    wi = Window.partitionBy("grp").orderBy(F.col("rel").desc(), F.col("tid").asc())
    ranked = base.withColumn("r", F.row_number().over(wr)).withColumn(
        "ri", F.row_number().over(wi)
    )
    per_grp = ranked.groupBy("key", "grp").agg(
        F.sum(
            F.when(F.col("r") <= k, F.col("rel") * F.element_at(wlit, F.col("r")))
            .otherwise(F.lit(0))
            .cast(DEC)
        ).alias("dcg"),
        F.sum(
            F.when(F.col("ri") <= k, F.col("rel") * F.element_at(wlit, F.col("ri")))
            .otherwise(F.lit(0))
            .cast(DEC)
        ).alias("idcg"),
    )
    scored = per_grp.filter(F.col("idcg") > 0).withColumn(
        "ndcg_ppm", F.expr("dcg * 1000000 div idcg")
    )
    return (
        scored.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.expr(
                "cast(sum(ndcg_ppm) div cast(count(1) as decimal(38,0)) as bigint)"
            ).alias("mean_ndcg_ppm"),
        )
        .orderBy("key")
    )


def events_value_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (E-NDCG): mean per-user NDCG@10 of the value ranking
    against graded engagement relevance (purchase=2, click=1, else 0),
    per user-parity arm — does sorting a user's events by value
    surface their conversion events first?"""
    events = load_table(spark, "events", sf_dir)
    return (
        ndcg_by_key(
            events.filter(F.col("value").isNotNull()),
            F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B")),
            F.col("user_id"),
            F.when(F.col("event_type") == "purchase", F.lit(2))
            .when(F.col("event_type") == "click", F.lit(1))
            .otherwise(F.lit(0)),
            F.round(F.col("value") * 100).cast("long"),
            F.col("event_id"),
        )
        .withColumnRenamed("key", "arm")
        .orderBy("arm")
    )


def _ndcg_weight_case(pos_expr: str) -> str:
    arms = " ".join(
        f"WHEN {r} THEN {w}" for r, w in enumerate(NDCG_WEIGHTS, start=1)
    )
    return f"CASE {pos_expr} {arms} ELSE 0 END"


EVENTS_VALUE_NDCG_SQL = f"""
WITH base AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         user_id AS grp,
         CASE event_type WHEN 'purchase' THEN 2 WHEN 'click' THEN 1 ELSE 0 END AS rel,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         event_id
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT arm, grp, rel,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents DESC, event_id ASC) AS r,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY rel DESC, event_id ASC) AS ri
  FROM base
),
per_grp AS (
  SELECT arm, grp,
         SUM(CAST(rel AS HUGEINT) * {_ndcg_weight_case("r")}) AS dcg,
         SUM(CAST(rel AS HUGEINT) * {_ndcg_weight_case("ri")}) AS idcg
  FROM ranked GROUP BY arm, grp
),
scored AS (
  SELECT arm, dcg * 1000000 // idcg AS ndcg_ppm FROM per_grp WHERE idcg > 0
)
SELECT arm,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(ndcg_ppm) // COUNT(*) AS BIGINT) AS mean_ndcg_ppm
FROM scored GROUP BY arm ORDER BY arm
"""
