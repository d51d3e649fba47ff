from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_frame_demo_etl_spark.multimodal.binary_ops import (
    decode_assets,
    frame_sample,
    make_synthetic_assets,
    resize_stub,
)


@pytest.fixture(scope="module")
def assets(spark):
    return make_synthetic_assets(spark, n=32)


def test_decode_fake(spark, assets):
    decoded = decode_assets(assets, decode="fake")
    rows = {r.asset_id: r for r in decoded.collect()}
    assert len(rows) == 32
    meta = {r.asset_id: r.meta for r in assets.collect()}
    for aid, r in rows.items():
        assert (r.width, r.height, r.channels) == (
            meta[aid].width,
            meta[aid].height,
            meta[aid].channels,
        )
        assert r.n_bytes == r.width * r.height * r.channels


def test_decode_real_raises(spark, assets):
    with pytest.raises(Exception) as exc_info:
        decode_assets(assets, decode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or "decoding requires" in str(
        exc_info.value
    )


def test_resize_changes_dimensions(spark, assets):
    resized = resize_stub(assets, target_w=8, target_h=8)
    redecoded = decode_assets(resized, decode="fake")
    for r in redecoded.collect():
        assert (r.width, r.height) == (8, 8)
        assert r.n_bytes == 8 * 8 * r.channels


def test_frame_sample(spark, assets):
    frames = frame_sample(assets, every_k=2)
    counts = {r.asset_id: r["cnt"] for r in frames.groupBy("asset_id").agg(F.count("*").alias("cnt")).collect()}
    meta = {r.asset_id: r.meta for r in assets.collect()}
    for aid, cnt in counts.items():
        h = meta[aid].height
        assert cnt == (h + 1) // 2


def test_sessionize_stateful_stream(spark, tmp_path):
    """Run the applyInPandasWithState sessionizer through a real
    micro-batch stream and check closed sessions obey the gap rule."""
    import datetime as dt

    from data_frame_demo_etl_spark.streaming.stateful import sessionize_stateful

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10, "view", 1.0, ""),
        (2, t0 + dt.timedelta(minutes=5), 10, "click", 2.0, ""),
        (3, t0 + dt.timedelta(minutes=60), 10, "view", 3.0, ""),  # closes session 1
        (4, t0 + dt.timedelta(minutes=62), 10, "view", 4.0, ""),
        (5, t0, 20, "view", 5.0, ""),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = str(tmp_path / "events_in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src).withWatermark("ts", "10 minutes")
    sessions = sessionize_stateful(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM stateful_sessions").collect()
    # Only user 10's first session is CLOSED within the batch.
    assert len(got) == 1
    s = got[0]
    assert s.user_id == 10 and s.n_events == 2 and s.value_sum == 3.0
