"""Grouped-map transforms (``applyInPandas``) and skew-handling joins.

``group_zscore`` is the canonical grouped-map shape for feature
pipelines: per-group normalization where the whole group must be seen
together. One shuffle on the group key; Arrow moves each group as a
pandas frame.

``salted_join`` is the classic skew mitigation when AQE's skew-join
splitting isn't available or the skew is extreme: replicate the small
side N times, scatter the big side's hot keys across N salt values,
join on (key, salt). Semantics identical to a plain inner equi-join.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def group_zscore(
    df: DataFrame, group_cols: Sequence[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score of `value_col` via applyInPandas (population
    std; groups with zero variance get 0.0)."""
    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{out_fields}, {out_col} double"

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].astype(float)
        std = vals.std(ddof=0)
        pdf[out_col] = 0.0 if (std == 0 or pd.isna(std)) else (vals - vals.mean()) / std
        return pdf

    return df.groupBy(*group_cols).applyInPandas(normalize, schema)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key` with salt-scattered hot keys.

    The big side gets a deterministic salt from a row hash; the small
    side is exploded n_salts×. Use when one key dominates the
    distribution (e.g. a null-ish default key) and a single reducer
    would otherwise receive the whole key's rows.
    """
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
