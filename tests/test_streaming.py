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


def test_watermark_drops_late_data(spark, tmp_path):
    """With update-mode windowed aggregation and a finalized watermark,
    events older than watermark are excluded from state updates."""
    import datetime as dt

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = str(tmp_path / "late_events")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    ckpt = str(tmp_path / "ckpt")

    batch1 = [
        (1, t0 + dt.timedelta(hours=0, minutes=10), 1, "view", 1.0, ""),
        (2, t0 + dt.timedelta(hours=5), 1, "view", 1.0, ""),  # advances watermark far ahead
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src).withWatermark("ts", "10 minutes")
    agg = windowed_event_stats(stream)

    sink = str(tmp_path / "sink")

    def run():
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    run()
    first = {
        (r.window_start, r.n_events) for r in spark.read.parquet(sink).collect()
    }
    # Window [0:00,1:00) finalized (watermark 4:50) with the on-time event.
    assert (t0, 1) in first

    # Batch 2 (same checkpoint → watermark persists): an event 4.5h
    # late lands behind the watermark and must be dropped.
    batch2 = [(3, t0 + dt.timedelta(minutes=20), 1, "view", 1.0, "")]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    run()
    second = {
        (r.window_start, r.n_events) for r in spark.read.parquet(sink).collect()
    }
    # No re-emission, no count bump from the late event.
    assert second == first


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids inside the watermark window are suppressed
    across micro-batches; state stays bounded by the watermark."""
    import datetime as dt

    from data_frame_demo_etl_spark.streaming.events import stream_dedup

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = str(tmp_path / "dup_events")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    batch1 = [
        (1, t0, 1, "view", 1.0, ""),
        (1, t0 + dt.timedelta(minutes=1), 1, "view", 1.0, ""),  # dup within delay
        (2, t0 + dt.timedelta(minutes=2), 1, "view", 1.0, ""),
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_dedup(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    run()
    ids = sorted(r.event_id for r in spark.read.parquet(sink).collect())
    assert ids == [1, 2]

    # Second micro-batch: another dup of 1 within the delay stays
    # suppressed (checkpointed state), a fresh id 3 passes.
    batch2 = [
        (1, t0 + dt.timedelta(minutes=3), 1, "view", 1.0, ""),
        (3, t0 + dt.timedelta(minutes=4), 1, "view", 1.0, ""),
    ]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    run()
    ids = sorted(r.event_id for r in spark.read.parquet(sink).collect())
    assert ids == [1, 2, 3]


def test_sliding_window_stream_matches_batch(spark, sf_dir):
    """The hopping-window aggregate runs unchanged under readStream
    with a watermark and equals its batch form — the ST5 claim."""
    from data_frame_demo_etl_spark.streaming.events import sliding_event_stats

    stream = read_events_stream(spark, sf_dir)
    agg = sliding_event_stats(with_watermark(stream))
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_stats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM slide_stats").collect()
    }
    batch = sliding_event_stats(load_table(spark, "events", sf_dir))
    want = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum) for r in batch.collect()
    }
    assert got == want


def test_funnel_stream_matches_batch(spark, sf_dir, tmp_path):
    """A7 under streaming: the stateful greedy funnel over time-split
    micro-batches equals the batch funnel_stages fixpoint (stream/batch
    parity beyond windowed aggregates)."""
    from data_frame_demo_etl_spark.analytics.funnel import funnel_stages
    from data_frame_demo_etl_spark.streaming.stateful import funnel_stateful

    events = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # Two event-time-ordered files → two micro-batches (the replay
    # shape where the greedy fold is exact).
    mid = events.selectExpr("percentile_approx(ts, 0.5) AS m").collect()[0].m
    src = str(tmp_path / "funnel_src")
    events.filter(F.col("ts") <= mid).coalesce(1).write.parquet(f"{src}/b0")
    events.filter(F.col("ts") > mid).coalesce(1).write.parquet(f"{src}/b1")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        funnel_stateful(stream)
        .writeStream.format("memory")
        .queryName("funnel_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {}
    for r in spark.sql("SELECT * FROM funnel_updates").collect():
        prev = got.get(r.user_id)
        if prev is None or r.stage_reached >= prev.stage_reached:
            got[r.user_id] = r
    want = {r.user_id: r for r in funnel_stages(events).collect()}
    assert set(got) == set(want)
    mism = [
        u
        for u in want
        if (
            got[u].stage_reached,
            got[u].t_view,
            got[u].t_click,
            got[u].t_purchase,
        )
        != (
            want[u].stage_reached,
            want[u].t_view,
            want[u].t_click,
            want[u].t_purchase,
        )
    ]
    assert not mism, f"{len(mism)} users diverge, e.g. {mism[:3]}"


def test_foreach_batch_sink_is_replay_idempotent(spark, tmp_path):
    """Replaying a batch id must not duplicate rows (per-epoch
    overwrite directories)."""
    from data_frame_demo_etl_spark.streaming.events import idempotent_batch_writer

    out = str(tmp_path / "sink")
    writer = idempotent_batch_writer(out)
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    writer(df, 0)
    writer(df, 0)  # replay of the same epoch
    writer(df.filter("id = 1"), 1)
    got = spark.read.parquet(out + "/batch_id=*")
    assert got.count() == 3  # 2 (epoch 0, once) + 1 (epoch 1)


def test_native_session_window_vs_lag_formulation(spark):
    """Native session_window and the lag/cumsum sessionize agree on
    every input INCLUDING the exact-gap boundary: touching windows
    merge, the split condition is strictly greater-than."""
    import datetime as dt

    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.streaming.events import sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: gaps 10min, 31min -> 2 sessions under BOTH semantics
        (1, 1, t0, 1.0),
        (2, 1, t0 + dt.timedelta(minutes=10), 1.0),
        (3, 1, t0 + dt.timedelta(minutes=41), 1.0),
        # user 2: gap of exactly 30min -> touching windows MERGE in
        # both formulations (split is strictly >)
        (4, 2, t0, 1.0),
        (5, 2, t0 + dt.timedelta(minutes=30), 1.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")

    lag_sessions = {
        r.user_id: r.n
        for r in sessionize(df).groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    native = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    native_sessions = {r.user_id: r.n for r in native.collect()}
    assert lag_sessions[1] == native_sessions[1] == 2
    assert lag_sessions[2] == 1 and native_sessions[2] == 1


def test_session_window_works_in_stream(spark, tmp_path):
    """The native session_window aggregates in a watermarked STREAM
    (update-mode memory sink, availableNow) and the final session set
    matches the batch computation on the same files."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (i, 1 + i % 2, t0 + dt.timedelta(minutes=i * 7), float(i)) for i in range(20)
    ]
    schema = "event_id long, user_id long, ts timestamp, value double"
    src = str(tmp_path / "sess_events")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("s"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_native")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.s, r.n) for r in spark.sql("SELECT * FROM sess_native").collect()
    }

    batch = (
        spark.createDataFrame(rows, schema)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("s"), "n")
    )
    want = {(r.user_id, r.s, r.n) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """ST11: the genuine two-stream join (both sides watermarked,
    event-time range bounds) through a real stream must produce
    exactly the batch pairs."""
    from data_frame_demo_etl_spark.streaming.events import (
        stream_stream_interval_join,
    )

    stream = read_events_stream(spark, sf_dir)
    views = stream.filter(F.col("event_type") == "view")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = stream_stream_interval_join(views, purchases)
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    ev = load_table(spark, "events", sf_dir)
    want = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in stream_stream_interval_join(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_left_outer_join_watermark_gated(spark, sf_dir):
    """Left-outer stream-stream join: matched pairs emit immediately;
    an UNMATCHED view emits its null row only once the watermark
    passes view_ts + max_delay (a purchase could still arrive before
    that). At query stop the final watermark is
    max(event_ts) − watermark_delay, so the exact expectation is:
    stream output == batch left join, minus the null rows of views
    with view_ts + max_delay ≥ final watermark. The final watermark is
    the MIN over the two watermark nodes (each side computes its own
    from the events flowing through it — max view_ts vs max
    purchase_ts), which is Spark's multiple-watermark policy
    default."""
    import datetime as dt

    from data_frame_demo_etl_spark.streaming.events import (
        stream_stream_interval_join,
    )

    stream = read_events_stream(spark, sf_dir)
    joined = stream_stream_interval_join(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_left")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ss_left").collect()
    }

    ev = load_table(spark, "events", sf_dir)
    batch = stream_stream_interval_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    ).collect()
    max_view = ev.filter(F.col("event_type") == "view").agg(F.max("ts")).collect()[0][0]
    max_purch = ev.filter(F.col("event_type") == "purchase").agg(F.max("ts")).collect()[0][0]
    wm_final = min(max_view, max_purch) - dt.timedelta(minutes=10)
    horizon = wm_final - dt.timedelta(minutes=30)  # view_ts + 30m < wm
    want = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in batch
        if r.purchase_id is not None or r.view_ts < horizon
    }
    # matched pairs are identical; only horizon-gated nulls differ
    got_matched = {t for t in got if t[2] is not None}
    want_matched = {t for t in want if t[2] is not None}
    assert got_matched == want_matched and len(got_matched) > 0
    got_nulls = {t for t in got if t[2] is None}
    want_nulls = {t for t in want if t[2] is None}
    assert got_nulls == want_nulls and len(want_nulls) > 0


def test_interval_join_multi_epoch_state_and_expiry(spark, tmp_path):
    """ST11 across ≥2 micro-batch epochs (checkpoint restart): a
    purchase arriving in a LATER batch than its view still pairs (the
    view is matched from restored join state); a never-matched view
    whose horizon expires mid-stream emits EXACTLY ONE null row, in
    the epoch whose watermark passed view_ts + max_delay; a view
    matched in a later batch never emits a null."""
    import datetime as dt

    from data_frame_demo_etl_spark.streaming.events import (
        stream_stream_interval_join,
    )

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, event_id long, event_type string, ts timestamp"
    T = dt.datetime(2024, 1, 1, 10, 0, 0)

    def add_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run_epoch():
        out: list = []
        stream = spark.readStream.schema(schema).parquet(str(src))
        joined = stream_stream_interval_join(
            stream.filter(F.col("event_type") == "view"),
            stream.filter(F.col("event_type") == "purchase"),
            how="left_outer",
        )
        q = (
            joined.writeStream.foreachBatch(
                lambda df, bid: out.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.user_id, r.view_id, r.purchase_id) for r in out}

    # epoch 1: three views; only user 3 purchases in this batch.
    # Watermark after: min(10:00, 10:05) − 10m = 9:50 → nothing expires.
    add_file(
        [
            (1, 101, "view", T),
            (2, 201, "view", T),
            (3, 301, "view", T),
            (3, 302, "purchase", T + dt.timedelta(minutes=5)),
        ]
    )
    e1 = run_epoch()
    assert e1 == {(3, 301, 302)}  # same-batch match only; no nulls yet

    # epoch 2: user 1's purchase arrives A BATCH LATER (10:15, inside
    # the 30m window of the stored view); user 9's late pair drives
    # the watermark to 11:20, past user 2's horizon (10:30).
    add_file(
        [
            (1, 102, "purchase", T + dt.timedelta(minutes=15)),
            (9, 901, "view", T + dt.timedelta(minutes=90)),
            (9, 902, "purchase", T + dt.timedelta(minutes=91)),
        ]
    )
    e2 = run_epoch()
    assert (1, 101, 102) in e2          # cross-batch match from state
    assert (9, 901, 902) in e2          # same-batch match
    assert (2, 201, None) in e2         # expiry emits the null HERE
    assert (1, 101, None) not in e2     # matched views never null
    assert (9, 901, None) not in e2     # horizon not yet passed
    # exactly one null emission per non-converter across all epochs
    all_rows = list(e1) + list(e2)
    assert sum(1 for t in all_rows if t[0] == 2) == 1


# ──────────────── ST12: windowed PSI drift monitor ────────────────


def test_windowed_psi_stream_counts_match_batch(spark, sf_dir):
    """The monitor's streaming deployment: the (window, type, bin)
    COUNTS stage runs under readStream (identical expression), the
    PSI finish runs over the materialized counts — stream must equal
    the batch gate bit-for-bit."""
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.analytics.drift import SCALE, N_BINS, windowed_psi
    from data_frame_demo_etl_spark.sources.catalog import load_table
    from data_frame_demo_etl_spark.streaming.events import read_events_stream

    batch_events = load_table(spark, "events", sf_dir)
    want = {
        (r.window_start, r.event_type): (r.n_ref, r.n_window, r.psi_micro)
        for r in windowed_psi(batch_events).collect()
    }

    # static bounds (yesterday's batch artifact in production)
    v = F.round(F.col("value") * SCALE).cast("long")
    b = (
        batch_events.filter(F.col("value").isNotNull())
        .agg(F.min(v).alias("lo"), F.max(v).alias("hi"))
        .collect()[0]
    )
    lo, span = int(b["lo"]), max(int(b["hi"]) - int(b["lo"]) + 1, 1)

    stream = read_events_stream(spark, sf_dir)
    counts = (
        stream.filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("grp"),
            F.date_trunc("hour", F.col("ts")).alias("w"),
            F.floor((v - F.lit(lo)) * N_BINS / F.lit(span)).cast("long").alias("bin"),
        )
        .groupBy("w", "grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("psi_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got_counts = spark.sql("SELECT * FROM psi_counts")
    # batch-side counts from the SAME binning must agree row-for-row
    batch_counts = (
        batch_events.filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("grp"),
            F.date_trunc("hour", F.col("ts")).alias("w"),
            F.floor((v - F.lit(lo)) * N_BINS / F.lit(span)).cast("long").alias("bin"),
        )
        .groupBy("w", "grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = {(r.w, r.grp, r.bin): r.c for r in got_counts.collect()}
    wantc = {(r.w, r.grp, r.bin): r.c for r in batch_counts.collect()}
    assert got == wantc
    # and the batch gate over the same corpus produced PSI rows for
    # exactly the windows the stream saw
    assert {(w, g) for (w, g, _) in got} == {(w, g) for (w, g) in want}


def test_windowed_psi_flags_planted_drift(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.analytics.drift import windowed_psi

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 10 calm hours with values 1..10 cycling, then one RARE drifted
    # hour at value 100 — rare, so the corpus reference stays calm
    # and the drifted hour alone diverges from it
    for h in range(10):
        for i in range(100):
            rows.append((eid, base + dt.timedelta(hours=h, seconds=i), 1, "X", float(1 + i % 10)))
            eid += 1
    for i in range(30):
        rows.append((eid, base + dt.timedelta(hours=10, seconds=i), 1, "X", 100.0))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.window_start.hour: r.psi_micro for r in windowed_psi(df).collect()}
    calm = max(out[h] for h in range(10))
    assert out[10] > 4 * max(calm, 1)  # the drifted hour dominates
    assert out[10] > 250_000           # above the classic 0.25 action line


def test_windowed_topk_stream_matches_batch(spark, sf_dir):
    """ST14 parity: streaming windowed counts (complete mode) ranked
    per window equal the batch gate exactly."""
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.streaming.events import (
        read_events_stream,
        windowed_topk_types,
        with_watermark,
    )

    stream = read_events_stream(spark, sf_dir)
    counts = (
        with_watermark(stream)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("win_topk_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.rk): (r.event_type, r.n_events)
        for r in spark.sql(
            """
            SELECT * FROM (
              SELECT window_start,
                     CAST(ROW_NUMBER() OVER (
                       PARTITION BY window_start
                       ORDER BY n_events DESC, event_type ASC) AS INT) AS rk,
                     event_type, n_events
              FROM win_topk_counts
            ) WHERE rk <= 3
            """
        ).collect()
    }
    from data_frame_demo_etl_spark.sources.catalog import load_table

    want = {
        (r.window_start, r.rk): (r.event_type, r.n_events)
        for r in windowed_topk_types(load_table(spark, "events", sf_dir)).collect()
    }
    assert got == want


def test_windowed_topk_tiebreak(spark):
    import datetime as dt

    from data_frame_demo_etl_spark.streaming.events import windowed_topk_types

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 1, "view", 1.0, ""),
        (2, t0, 2, "view", 1.0, ""),
        (3, t0, 3, "click", 1.0, ""),
        (4, t0, 4, "click", 1.0, ""),  # tie view/click → view first (asc)
        (5, t0, 5, "purchase", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = [(r.rk, r.event_type, r.n_events) for r in windowed_topk_types(df).collect()]
    assert got == [(1, "click", 2), (2, "view", 2), (3, "purchase", 1)]
