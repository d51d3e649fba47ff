"""Sign-generalization evidence for the integral-division gates.

Round-9 docstrings carried a NON-NEGATIVE-value contract on
`bootstrap_mean_ci` and `target_encode`, on the theory that Spark
``div`` truncates while DuckDB ``//`` floors. Measured on this stack
that divergence does not exist: BOTH engines truncate toward zero
(Spark ``-7 div 2 = -3`` for long and decimal(38,0); DuckDB
``-7 // 2 = -3`` for BIGINT and HUGEINT). These tests pin that parity
with signed inputs end-to-end — the Spark operator vs the literal
DuckDB translation on the same rows — so the contract exclusion is
retired with evidence rather than an offset workaround.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest


def test_div_truncation_parity_primitives(spark):
    """The primitive both gates build on: integral division of signed
    operands agrees engine-to-engine in all four sign quadrants."""
    cases = [(-7, 2), (7, -2), (-7, -2), (7, 2), (-1, 3), (1, -3)]
    got_spark = spark.sql(
        "SELECT "
        + ", ".join(
            f"cast({a} as decimal(38,0)) div cast({b} as decimal(38,0))"
            for a, b in cases
        )
    ).collect()[0]
    con = duckdb.connect()
    got_duck = con.execute(
        "SELECT "
        + ", ".join(
            f"CAST({a} AS HUGEINT) // CAST({b} AS HUGEINT)" for a, b in cases
        )
    ).fetchone()
    assert [int(v) for v in got_spark] == [int(v) for v in got_duck]
    # and both are truncation (not floor): -7/2 -> -3
    assert int(got_spark[0]) == -3 and int(got_spark[1]) == -3


def test_bootstrap_ci_signed_values_match_duckdb(spark):
    """bootstrap_mean_ci on a signed value column reproduces the
    literal DuckDB translation bit-for-bit (negative means included)."""
    from data_frame_demo_etl_spark.analytics.robust import (
        BOOT_B,
        EVENTS_BOOTSTRAP_CI_SQL,
    )
    from data_frame_demo_etl_spark.analytics.robust import bootstrap_mean_ci

    vals = [-10.5, -3.25, 4.0, -20.0, 15.75, -1.0, 0.0, -7.5] * 8
    rows = [
        (i, dt.datetime(2024, 1, 1), i, "NEG" if v < 0 else "MIX", float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {
        r.event_type: (r.n, r.mean_micro, r.ci_lo_micro, r.ci_hi_micro)
        for r in bootstrap_mean_ci(df).collect()
    }
    assert any(m < 0 for (_, m, _, _) in got.values())  # signed path exercised

    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ),
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(EVENTS_BOOTSTRAP_CI_SQL).fetchall()
    }
    assert {k: tuple(int(x) for x in v) for k, v in got.items()} == {
        k: tuple(int(x) for x in v) for k, v in want.items()
    }
    assert BOOT_B >= 16  # the 2nd/B-1st order stats are a real band


def test_target_encode_signed_targets_match_duckdb(spark):
    """target_encode on signed micro targets reproduces the literal
    DuckDB translation exactly, including negative raw and encoded
    means (the m·gmean product is signed too)."""
    from data_frame_demo_etl_spark.analytics.features import target_encode

    rows = (
        [("refund", -1_000)] * 7
        + [("refund", -333)] * 5
        + [("sale", 900)] * 11
        + [("sale", -50)] * 3
        + [("zero", 0)] * 2
    )
    df = spark.createDataFrame(rows, "cat string, t long")
    got = {
        r.category: (r.n, r.raw_mean_micro, r.encoded_micro, r.global_mean_micro)
        for r in target_encode(df, "cat", "t", m=20).collect()
    }
    assert got["refund"][1] < 0  # signed path exercised

    con = duckdb.connect()
    con.register("base", pd.DataFrame(rows, columns=["category", "t"]))
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            """
            WITH cats AS (
              SELECT category, CAST(COUNT(*) AS HUGEINT) AS n,
                     CAST(SUM(t) AS HUGEINT) AS s
              FROM base GROUP BY category
            ),
            gtot AS (
              SELECT SUM(n) AS gn,
                     CASE WHEN SUM(n) > 0 THEN SUM(s) // SUM(n) END AS gmean
              FROM cats
            )
            SELECT category, CAST(n AS BIGINT),
                   CAST(CASE WHEN n > 0 THEN s // n END AS BIGINT),
                   CAST((s + 20 * gmean) // (n + 20) AS BIGINT),
                   CAST(gmean AS BIGINT)
            FROM cats CROSS JOIN gtot
            """
        ).fetchall()
    }
    assert {k: tuple(int(x) for x in v) for k, v in got.items()} == {
        k: tuple(int(x) for x in v) for k, v in want.items()
    }
