"""Data profiling — parity with the reference exporter's manifest
metrics (reference src/exporter.py:25-33: rows, columns, dtypes,
null_pct per column, duplicate count) and the schema-candidate column
heuristics (reference src/services/schema_candidates.py:10-33).

Everything is a single aggregation pass per table: at 100 TB a loop of
per-column jobs would rescan the data N times; here Catalyst fuses all
column statistics into one scan + one partial/final agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_metrics_df(df: DataFrame) -> DataFrame:
    """One-row frame: rows, duplicate_rows, null_pct_<col>...

    duplicate_rows == pandas df.duplicated().sum() == rows - distinct
    rows.
    """
    n = F.count(F.lit(1))
    aggs = [
        n.alias("rows"),
        (n - F.count_distinct(F.struct(*df.columns))).alias("duplicate_rows"),
    ]
    for c in df.columns:
        # coalesce → 0.0 keeps the empty-input case well-formed
        # (sum over zero rows is null, and 0/0 would be too).
        aggs.append(
            F.coalesce(
                F.round(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) * 100.0 / n, 2),
                F.lit(0.0),
            ).alias(f"null_pct_{c}")
        )
    return df.agg(*aggs)


def profile_metrics(df: DataFrame) -> dict:
    """Manifest-shaped metrics dict (exporter.py:25-33 parity)."""
    row = profile_metrics_df(df).collect()[0].asDict()
    return {
        "rows": int(row["rows"]),
        "columns": len(df.columns),
        "dtypes": {f.name: f.dataType.simpleString() for f in df.schema.fields},
        "null_pct": {c: float(row[f"null_pct_{c}"]) for c in df.columns},
        "duplicates": int(row["duplicate_rows"]),
    }


def column_stats_df(df: DataFrame, sample_year_range: tuple[int, int] = (1900, 2100)) -> DataFrame:
    """Per-column heuristic stats: numeric_ratio, year_like_ratio,
    avg_len — the distributed version of schema_candidates.py's
    numeric_ratio / is_year_like / is_texty_col, computed in ONE pass
    then reshaped to a row per column.
    """
    lo, hi = sample_year_range
    aggs = []
    for c in df.columns:
        s = F.col(c).cast("string")
        num = s.try_cast("double")
        aggs.append(F.round(F.avg(F.when(num.isNotNull(), 1.0).otherwise(0.0)), 4).alias(f"nr_{c}"))
        aggs.append(
            F.round(
                F.avg(F.when(num.between(lo, hi), 1.0).otherwise(0.0)), 4
            ).alias(f"yr_{c}")
        )
        aggs.append(F.round(F.avg(F.coalesce(F.length(s), F.lit(0))), 2).alias(f"len_{c}"))
    wide = df.agg(*aggs)
    # Reshape one wide row → one row per column (tiny data by now).
    stack_args = []
    for c in df.columns:
        stack_args.extend([F.lit(c), F.col(f"nr_{c}"), F.col(f"yr_{c}"), F.col(f"len_{c}")])
    n = len(df.columns)
    return wide.select(
        F.stack(F.lit(n), *stack_args).alias("column_name", "numeric_ratio", "year_like_ratio", "avg_len")
    )


def is_numeric_col(stats_row: dict) -> bool:
    """schema_candidates.is_numeric_col parity on collected stats."""
    return stats_row["numeric_ratio"] > 0.6 and not (stats_row["year_like_ratio"] > 0.6)


def is_texty_col(stats_row: dict) -> bool:
    """schema_candidates.is_texty_col parity on collected stats."""
    return stats_row["avg_len"] > 12 and stats_row["numeric_ratio"] < 0.3


# NOTE on pyspark.sql.Observation: deliberately NOT used anywhere in
# this package. In Spark 4.1 classic, SparkSession's ObservationManager
# has register/tryComplete but NO unregister — once any Observation has
# been attached, the manager's non-empty registry rides along in later
# task closures and every MLlib action in the same session dies with
# `NotSerializableException: ObservationManager` (reproduced against
# functions/quality_model.py; plain DataFrame actions are unaffected).
# Export metrics instead come from either a dedicated input-plan pass
# ("scan") or an aggregation over the just-written columnar output
# ("output") — see exporter.export_dataset.
