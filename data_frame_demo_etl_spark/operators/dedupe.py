"""Deduplication operators.

``dedupe_keep_first`` is the reference's ``drop_duplicates(subset,
keep='first')`` (reference src/api/v1/engine.py:223-230) made
scale-safe: pandas 'first' means file order, which is undefined on a
distributed shuffle — so the order key is an explicit, required
parameter here.

``dedup_exact`` is the LLM-pipeline exact-dedup primitive.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def dedupe_keep_first(
    df: DataFrame, subset: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Keep the first row per `subset` group, 'first' defined by
    `order_by` ascending. One shuffle (the window partition)."""
    w = Window.partitionBy(*subset).orderBy(*[F.col(c).asc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact-duplicate removal keeping the minimum id per distinct text.

    Scale path: group on a 64-bit/256-bit hash of the text so the
    shuffle moves (hash, id) pairs — not the full document bytes —
    then rejoin winners to recover payloads. At test scale the rejoin
    is the same plan shape.
    """
    winners = (
        df.select(F.sha2(F.col(text_col), 256).alias("__h"), F.col(id_col))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.withColumn("__h", F.sha2(F.col(text_col), 256)).join(
        winners, ["__h", id_col], "inner"
    ).drop("__h")
