"""Structured Streaming tests: the windowed aggregation run through a
real stream (file source → memory sink, with watermark) must equal the
batch result; sessionization must respect the gap rule."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.sources.catalog import load_table
from data_frame_demo_etl_spark.streaming.events import (
    read_events_stream,
    sessionize,
    windowed_event_stats,
    with_watermark,
)


def test_stream_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    agg = windowed_event_stats(with_watermark(stream))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM win_stats").collect()
    }
    batch = windowed_event_stats(load_table(spark, "events", sf_dir))
    want = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum) for r in batch.collect()
    }
    assert got == want


def test_sessionize_gap_rule(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10, "view", 1.0, ""),
        (2, t0 + dt.timedelta(minutes=10), 10, "click", 1.0, ""),
        (3, t0 + dt.timedelta(minutes=50), 10, "view", 1.0, ""),  # gap 40min → new session
        (4, t0 + dt.timedelta(minutes=55), 10, "view", 1.0, ""),
        (5, t0, 20, "view", 2.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sessions = sessionize(df, gap_minutes=30).collect()
    by_user = {}
    for r in sessions:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[10]) == 2
    s1, s2 = sorted(by_user[10], key=lambda r: r.session_id)
    assert s1.n_events == 2 and s2.n_events == 2
    assert len(by_user[20]) == 1
