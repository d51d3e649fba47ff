"""Structural/cleaning transforms — Spark-first parity with the
reference engine's ``transform_data`` (reference src/api/v1/engine.py:
134-232): unpivot, provider stamping, empty-row/null-column drops,
string trimming, thousands stripping, date/numeric coercion, group
aggregation, dedupe.

All of these are pure Column-expression builders: the whole pipeline
stays one Catalyst plan (filters push to the scan, projections prune
columns) and nothing drops to Python row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType, StringType


def unpivot(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Melt wide columns into (var, value) rows.

    Parity: pandas ``df.melt`` used at engine.py:152-156. Uses Spark's
    native ``unpivot`` (STACK under the hood) — row explosion happens
    JVM-side with no shuffle at all.
    """
    ids = [c for c in id_vars if c in df.columns]
    values = list(value_vars) if value_vars else [c for c in df.columns if c not in ids]
    # Value columns must share one type; promote numerics to double.
    casted = df
    for c in values:
        if isinstance(df.schema[c].dataType, NumericType):
            casted = casted.withColumn(c, F.col(c).cast("double"))
    return casted.unpivot(ids, values, var_name, value_name)


def add_provider_id(df: DataFrame, provider: str) -> DataFrame:
    """Stamp the provider/source id (engine.py:160-163)."""
    return df.withColumn("provider_id", F.lit(provider))


def drop_empty_rows(df: DataFrame) -> DataFrame:
    """Drop rows where every column is null (engine.py:165-166)."""
    return df.na.drop(how="all")


def null_fractions(df: DataFrame) -> dict[str, float]:
    """Per-column null fraction in ONE aggregation pass (not a job per
    column — at 100 TB a per-column loop would rescan the table N
    times)."""
    n = F.count(F.lit(1))
    aggs = [
        (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) / n).alias(c) for c in df.columns
    ]
    row = df.agg(*aggs).collect()[0]
    return {c: float(row[c]) if row[c] is not None else 0.0 for c in df.columns}


def drop_null_columns(df: DataFrame, threshold: float) -> DataFrame:
    """Keep columns whose non-null fraction >= threshold
    (engine.py:168-176). One stats pass, then a projection."""
    fracs = null_fractions(df)
    keep = [c for c in df.columns if (1.0 - fracs[c]) >= threshold]
    return df.select(*keep) if keep else df


def trim_strings(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Trim whitespace on string columns (engine.py:178-180)."""
    targets = columns or [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    out = df
    for c in targets:
        out = out.withColumn(c, F.trim(F.col(c)))
    return out


def strip_thousands(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Remove ``[,\\s]`` from string columns (engine.py:182-184)."""
    targets = columns or [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    out = df
    for c in targets:
        out = out.withColumn(c, F.regexp_replace(F.col(c), r"[,\s]", ""))
    return out


def coerce_date(df: DataFrame, column: str, drop_unparseable: bool = True, fmt: str | None = None) -> DataFrame:
    """Parse a date column, optionally dropping unparseable rows
    (pd.to_datetime errors='coerce' + dropna, engine.py:186-191)."""
    parsed = F.try_to_timestamp(F.col(column), F.lit(fmt)) if fmt else F.try_to_timestamp(F.col(column))
    out = df.withColumn(column, parsed)
    return out.filter(F.col(column).isNotNull()) if drop_unparseable else out


def coerce_numeric(df: DataFrame, column: str, fill: float | None = 0.0) -> DataFrame:
    """Numeric coercion with fill for failures (pd.to_numeric
    errors='coerce' + fillna(0), engine.py:193-197)."""
    cast = F.col(column).try_cast("double")
    if fill is not None:
        cast = F.coalesce(cast, F.lit(float(fill)))
    return df.withColumn(column, cast)


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Clip `value_col` to its [lower, upper] exact percentiles,
    optionally per group — the standard outlier treatment before
    aggregate modeling.

    Exact ``percentile`` (interpolated) is computed in one aggregate
    and broadcast back; clipping itself is a pure projection. At
    extreme scale swap ``percentile`` for ``percentile_approx`` (the
    API is otherwise identical)."""
    lo, hi = F.expr(f"percentile({value_col}, {lower})"), F.expr(
        f"percentile({value_col}, {upper})"
    )
    if group_cols:
        bounds = df.groupBy(*group_cols).agg(lo.alias("__lo"), hi.alias("__hi"))
        joined = df.join(F.broadcast(bounds), list(group_cols))
    else:
        bounds = df.agg(lo.alias("__lo"), hi.alias("__hi"))
        joined = df.crossJoin(F.broadcast(bounds))
    return joined.withColumn(
        value_col,
        F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
    ).drop("__lo", "__hi")


def combine_on_aggregate(
    df: DataFrame, keys: Sequence[str], numeric_cols: Sequence[str] | None = None
) -> DataFrame:
    """Group by keys and sum every (other) numeric column
    (engine.py:199-221). Spark/SQL SUM semantics == pandas
    sum(min_count=1): all-null group → null.

    Map-side partial aggregation makes this one shuffle of partial
    sums, not of raw rows.
    """
    keys = [k for k in keys if k in df.columns]
    if numeric_cols is None:
        numeric_cols = [
            f.name
            for f in df.schema.fields
            if f.name not in keys and isinstance(f.dataType, NumericType)
        ]
    aggs = [F.sum(F.col(c)).alias(c) for c in numeric_cols]
    return df.groupBy(*keys).agg(*aggs)
