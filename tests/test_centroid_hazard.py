"""Round-10 additions: centroid-cosine corpus audit, Nelson-Aalen."""

from __future__ import annotations

import datetime as dt
import math


def test_centroid_cosine_orthogonal_labels(spark):
    from data_frame_demo_etl_spark.similarity.gate import centroid_cosine_audit

    rows = [(1, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {r.label: r for r in centroid_cosine_audit(df).collect()}
    # both centroids sit at 45 degrees from the [1,1] corpus mean
    expect = math.floor(math.cos(math.pi / 4) * 1_000_000 + 0.5)
    assert out[1].n_vecs == 2 and out[2].n_vecs == 2
    assert out[1].cos_to_corpus_ppm == expect
    assert out[2].cos_to_corpus_ppm == expect


def test_centroid_cosine_single_label_is_one(spark):
    from data_frame_demo_etl_spark.similarity.gate import centroid_cosine_audit

    rows = [(7, [0.3, -0.4, 0.5]), (7, [0.3, -0.4, 0.5])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    assert centroid_cosine_audit(df).collect()[0].cos_to_corpus_ppm == 1_000_000


def test_nelson_aalen_exact_curve(spark):
    from data_frame_demo_etl_spark.analytics.survival import na_cum_hazard

    t0 = dt.datetime(2024, 3, 1)
    h = dt.timedelta(hours=1)
    rows = (
        [(1, t0), (1, t0 + h)]  # dur 1, churned
        + [(2, t0), (2, t0 + h)]  # dur 1, churned
        + [(3, t0), (3, t0 + 48 * h)]  # dur 48, right-censored (at gmax)
        + [(4, t0)]  # dur 0, churned
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.duration_hours: r for r in na_cum_hazard(df).collect()}
    assert set(out) == {0, 1}  # censored dur-48 row emits no churn point
    assert (out[0].n_risk, out[0].n_churn, out[0].hazard_micro) == (4, 1, 250_000)
    assert out[0].cum_hazard_micro == 250_000
    # hazard at dur 1: 2 of the 3 still at risk → floor(2e6/3)
    assert (out[1].n_risk, out[1].n_churn, out[1].hazard_micro) == (3, 2, 666_666)
    assert out[1].cum_hazard_micro == 250_000 + 666_666


def test_nelson_aalen_vs_km_risk_sets_agree(spark):
    from data_frame_demo_etl_spark.analytics.survival import km_survival, na_cum_hazard

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for u in range(30):
        rows.append((u, t0))
        rows.append((u, t0 + dt.timedelta(hours=u % 7)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    km = {r.duration_hours: (r.n_risk, r.n_churn) for r in km_survival(df).collect()}
    na = {r.duration_hours: (r.n_risk, r.n_churn) for r in na_cum_hazard(df).collect()}
    assert km == na  # same lifetime model underneath both estimators
