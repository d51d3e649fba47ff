"""Quantile-rollup gate semantics on planted distributions (the
registry-wide parity test covers the sf0.01 oracle; this pins the
interpolation convention and the rank-guarantee flags on known data)."""

from __future__ import annotations

import datetime as dt

import duckdb

from data_frame_demo_etl_spark.analytics.sketches import events_quantile_rollup


def _write_events(tmp_path, rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?, ?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY e TO '{tmp_path}/events.parquet' (FORMAT PARQUET)")
    con.close()
    return str(tmp_path)


def test_quantile_rollup_known_values(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # type "u": values 1..100 → p50 = 50.5, p90 = 90.1, p99 = 99.01
    for i in range(1, 101):
        rows.append((i, t0, i, "u", float(i), "{}"))
    # type "c": constant 7 → every percentile is exactly 7
    for i in range(10):
        rows.append((1000 + i, t0, i, "c", 7.0, "{}"))
    sf = _write_events(tmp_path, rows)
    got = {r.event_type: r for r in events_quantile_rollup(spark, sf).collect()}
    M = 1_000_000
    assert got["u"].n_values == 100
    assert got["u"].p50_micro == 50.5 * M
    assert abs(got["u"].p90_micro - 90.1 * M) < 1
    assert abs(got["u"].p99_micro - 99.01 * M) < 1
    assert got["c"].p50_micro == 7.0 * M
    for t in ("u", "c"):
        assert got[t].p50_ok and got[t].p90_ok and got[t].p99_ok
