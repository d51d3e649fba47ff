"""Round-10 additions: session summary stats, label separation matrix."""

from __future__ import annotations

import datetime as dt
import math


def test_session_stats_planted(spark):
    from data_frame_demo_etl_spark.streaming.events import SESSION_GAP_MIN, session_stats

    t0 = dt.datetime(2024, 5, 1)
    s = dt.timedelta(seconds=60)
    gap = dt.timedelta(minutes=SESSION_GAP_MIN + 5)
    rows = [
        # u1: one 3-event session, 120 s long
        (1, 1, t0, 1.0), (2, 1, t0 + s, 1.0), (3, 1, t0 + 2 * s, 1.0),
        # u2: single-event session (bounce)
        (4, 2, t0, 1.0),
        # u3: two events past the gap → two bounces
        (5, 3, t0, 1.0), (6, 3, t0 + gap, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    r = session_stats(df).collect()[0]
    assert (r.n_sessions, r.total_events) == (4, 6)
    assert r.bounce_ppm == 750_000
    assert r.mean_events_micro == 1_500_000
    # depth domain {1:3, 3:1}; duration domain {0:3, 120:1}
    assert (r.p50_n_events, r.p90_n_events) == (1, 3)
    assert (r.p50_dur_s, r.p90_dur_s) == (0, 120)


def test_label_separation_orthogonal_and_diagonal(spark):
    from data_frame_demo_etl_spark.similarity.gate import label_separation_matrix

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {(r.label_a, r.label_b): r.cos_ppm for r in label_separation_matrix(df).collect()}
    diag = math.floor(math.cos(math.pi / 4) * 1_000_000 + 0.5)
    assert out[(1, 2)] == 0
    assert out[(1, 3)] == diag
    assert out[(2, 3)] == diag
    assert len(out) == 3  # upper triangle only, no self-pairs
