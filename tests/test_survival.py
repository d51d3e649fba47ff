"""Planted Kaplan–Meier curves (K41): hand-computed risk sets, the
censoring rule, and the S→0 NULL propagation."""

from __future__ import annotations

import datetime as dt
import math

from data_frame_demo_etl_spark.analytics.survival import km_survival, users_churn_survival

BASE = dt.datetime(2024, 1, 1, 0, 30)


def _events(spark, spans):
    """spans: list of (user_id, first_hour, last_hour) — two events per
    user at +30 min past the hour."""
    rows = []
    eid = 0
    for uid, f, l in spans:
        for h in (f, l):
            rows.append((eid, BASE + dt.timedelta(hours=h), uid, "view", 1.0))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _micro(x: float) -> int:
    return math.floor(math.log(x) * 1e6 + 0.5)


def test_km_hand_computed_curve(spark):
    # gmax = hour 100 (user 5). Censored (within 12 h of gmax): users
    # 2 (last h99) and 5 (last h100). Churn events: user 1 at dur 1,
    # users 3 & 4 at dur 3.
    df = _events(
        spark,
        [(1, 0, 1), (2, 97, 99), (3, 10, 13), (4, 20, 23), (5, 97, 100)],
    )
    rows = km_survival(df).collect()
    assert [(r.duration_hours, r.n_risk, r.n_churn) for r in rows] == [
        (1, 5, 1),
        (3, 3, 2),
    ]
    # S(1) = 4/5; S(3) = 4/5 · 1/3 — per-term micro-nat quantization.
    assert rows[0].log_surv_micro == _micro(1 - 1 / 5)
    assert rows[1].log_surv_micro == _micro(1 - 1 / 5) + _micro(1 - 2 / 3)


def test_km_survival_zero_is_null(spark):
    # The max duration belongs ONLY to a churned user and no censored
    # user reaches it: the final risk set churns entirely → S = 0 →
    # NULL log survival (not a skipped −inf term).
    df = _events(spark, [(1, 0, 50), (2, 98, 100)])
    # gmax h100 → user 2 censored (dur 2, no churn row); user 1 churns
    # alone at dur 50 with risk set {1} → churn == risk → NULL.
    rows = km_survival(df).collect()
    assert [(r.duration_hours, r.n_risk, r.n_churn, r.log_surv_micro) for r in rows] == [
        (50, 1, 1, None)
    ]
    # single user defines gmax → censored → empty curve
    assert km_survival(_events(spark, [(1, 0, 2)])).count() == 0


def test_km_censoring_rule_is_relative_to_gmax(spark):
    # Users whose LAST event sits within 12 h of the corpus edge are
    # censored even if their span started long before: user 2's last
    # event (h12.5) is inside gmax(h22.5) − 12 h? No — 12.5 > 10.5, so
    # user 2 IS censored along with the edge user 3; only user 1
    # churns.
    df = _events(spark, [(1, 0, 2), (2, 10, 12), (3, 20, 22)])
    rows = km_survival(df).collect()
    assert [(r.duration_hours, r.n_risk, r.n_churn) for r in rows] == [(2, 3, 1)]
    assert rows[0].log_surv_micro == _micro(1 - 1 / 3)


def test_km_censored_user_holds_risk_set(spark):
    # gmax h100 (user 3, dur 5, censored); churn: users 1 & 2 at dur
    # 5, user 4 at dur 2. The censored user inflates the dur-5 risk
    # set to 3, so S(5) = (1 − 1/4)·(1 − 2/3), finite.
    df = _events(spark, [(1, 0, 5), (2, 10, 15), (3, 95, 100), (4, 20, 22)])
    rows = {
        r.duration_hours: (r.n_risk, r.n_churn, r.log_surv_micro)
        for r in km_survival(df).collect()
    }
    assert rows[2][:2] == (4, 1)
    assert rows[5][:2] == (3, 2)
    assert rows[5][2] == _micro(1 - 1 / 4) + _micro(1 - 2 / 3)


def test_users_churn_survival_gate_shape(spark, sf_dir):
    out = users_churn_survival(spark, sf_dir)
    assert out.columns == ["duration_hours", "n_risk", "n_churn", "log_surv_micro"]
    rows = out.collect()
    assert all(r.n_churn >= 1 and r.n_risk >= r.n_churn for r in rows)
    # log-survival is monotonically non-increasing over the curve
    vals = [r.log_surv_micro for r in rows if r.log_surv_micro is not None]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_logrank_hand_computed(spark):
    """Hand-computed Mantel–Cox table. Group 1 = users < 10.

    Spans (hours): u1 g1 0→5, u2 g1 0→3, u11 g2 0→5, u12 g2 0→8,
    u13 g2 96→216 (last == gmax → censored). Duration rows with
    events: d=3 (n1=2,n2=3,d1=1), d=5 (n1=1,n2=3,d1=1,d2=1),
    d=8 (n1=0,n2=2,d2=1).
      E1 = 1·2e6 div 5 + 2·1e6 div 4 + 0 = 400000 + 500000 = 900000
      V  = 1·(2e6 div 5)·3·4 div 20 + 2·(1e6 div 4)·3·2 div 12 + 0
         = 240000 + 250000 = 490000
      χ² = (2e6 − 900000)² div 490000 = 2469387 micro
    """
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.analytics.survival import logrank_test

    ev = _events(
        spark,
        [(1, 0, 5), (2, 0, 3), (11, 0, 5), (12, 0, 8), (13, 96, 216)],
    )
    r = logrank_test(ev, F.when(F.col("user_id") < 10, 1).otherwise(2)).collect()[0]
    assert (r.observed_1, r.observed_2) == (2, 2)
    assert r.expected_1_micro == 900_000
    assert r.expected_2_micro == 4_000_000 - 900_000
    assert r.variance_micro == 490_000
    assert r.chi2_micro == 2_469_387


def test_logrank_identical_groups_zero_chi2(spark):
    """Mirror-image groups churn identically → O1 == E1 exactly on
    the micro grid (every risk set splits evenly) → χ² = 0."""
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.analytics.survival import logrank_test

    spans = [(1, 0, 4), (2, 0, 7), (11, 0, 4), (12, 0, 7), (3, 96, 216), (13, 96, 216)]
    ev = _events(spark, spans)
    r = logrank_test(ev, F.when(F.col("user_id") < 10, 1).otherwise(2)).collect()[0]
    assert r.observed_1 == r.observed_2 == 2
    assert r.expected_1_micro == 2_000_000
    assert r.chi2_micro == 0
