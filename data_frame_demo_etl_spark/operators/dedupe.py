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
    `order_by` ascending (rows tied on the full order key are
    interchangeable, so any one of them is 'the' first; the min-struct
    refinement below picks deterministically among them).

    r13: one groupBy taking MIN of the (order key, remaining columns)
    struct — lexicographic struct comparison ≡ the former window's
    multi-column ascending sort. row_number shuffled and SORTED every
    row; min(struct) partial-aggregates, so each map task ships one
    partial winner per group instead of its whole row set (§2.3
    aggregate-before-shuffle). Struct buffers are not hashable, so the
    plan is a partial/final SortAggregate pair — a map-side sort by
    the GROUP key remains, but the exchange and the post-shuffle
    full-row sort are gone."""
    subset = list(subset)
    order_by = list(order_by)
    rest = [c for c in df.columns if c not in subset and c not in order_by]
    key = F.struct(*[F.col(c) for c in order_by + rest])
    won = df.groupBy(*subset).agg(F.min(key).alias("__w"))
    return won.select(
        *[
            F.col(c) if c in subset else F.col("__w").getField(c).alias(c)
            for c in df.columns
        ]
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
