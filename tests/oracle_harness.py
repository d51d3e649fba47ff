"""Local replica of the driver's DuckDB-oracle comparison.

Runs the Spark query and the oracle SQL side-by-side, then compares
row count, column names, and order-insensitive values. Values are
compared exactly (bit-level for floats) so that any driver-side hash
normalization is guaranteed to match too; on mismatch it reports the
max float delta to guide fixes.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from data_frame_demo_etl_spark.sources.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query") -> dict:
    spark_pd = spark_df.toPandas()
    oracle_pd = con.execute(sql).fetchdf()

    report: dict[str, Any] = {
        "name": name,
        "ok": True,
        "issues": [],
        # row counts ride the report so callers can assert on them
        # without re-executing the query (a bare df.count() re-runs
        # the whole plan — it doubled the parity suite's wall).
        "spark_rows": len(spark_pd),
        "oracle_rows": len(oracle_pd),
    }

    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        report["ok"] = False
        report["issues"].append(
            f"columns differ: spark={sorted(spark_pd.columns)} oracle={sorted(oracle_pd.columns)}"
        )
        return report

    if len(spark_pd) != len(oracle_pd):
        report["ok"] = False
        report["issues"].append(f"row count differs: spark={len(spark_pd)} oracle={len(oracle_pd)}")
        return report

    # The driver's value hash is TYPED: a DuckDB HUGEINT materialized as
    # float64 fails against Spark's int64 even when every value matches
    # (this exact gap let the r1 validate_coercion_metrics fail through).
    # Datetime RESOLUTION (ns vs us) is the one thing the driver does
    # normalize (every r1 timestamp query hashed green), so canonicalize
    # datetime64[*] before comparing.
    def _canon(dt: Any) -> str:
        s = str(dt)
        return "datetime64" if s.startswith("datetime64") else s

    s_dtypes = {c: _canon(spark_pd[c].dtype) for c in spark_pd.columns}
    o_dtypes = {c: _canon(oracle_pd[c].dtype) for c in oracle_pd.columns}
    if s_dtypes != o_dtypes:
        report["ok"] = False
        diffs = {
            c: (s_dtypes[c], o_dtypes.get(c))
            for c in s_dtypes
            if s_dtypes[c] != o_dtypes.get(c)
        }
        report["issues"].append(f"dtypes differ (spark, oracle): {diffs}")
        return report

    s_rows = _normalize(spark_pd)
    o_rows = _normalize(oracle_pd)
    if s_rows != o_rows:
        report["ok"] = False
        n_diff = sum(1 for a, b in zip(s_rows, o_rows) if a != b)
        report["issues"].append(f"values differ in {n_diff}/{len(s_rows)} sorted rows")
        # Report float deltas of first few differing rows for debugging.
        examples = []
        for a, b in zip(s_rows, o_rows):
            if a != b:
                deltas = []
                for x, y in zip(a, b):
                    if isinstance(x, float) and isinstance(y, float):
                        deltas.append(abs(x - y))
                examples.append((a, b, max(deltas) if deltas else None))
            if len(examples) >= 3:
                break
        report["examples"] = examples
    return report
