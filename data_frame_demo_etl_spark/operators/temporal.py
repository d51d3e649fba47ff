"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range join.

**As-of join** (``asof_join``): for each left row, the most recent
right row with ``right.ts <= left.ts`` per key. Implemented with the
union + running ``last(ignorenulls)`` window — one shuffle on
(key), no per-row Python, no N×M blowup. This is the standard
scalable formulation (a merge along the time axis), unlike a
windowless inequality join which explodes quadratically.

**Range join** (``range_join``): pairs (l, r) with the same key and
``r.ts ∈ [l.ts + lo, l.ts + hi]``. Implemented by bucketing time into
``hi - lo``-sized bins and equi-joining on (key, bin) for the 2
candidate bins, then refining with the exact predicate — turning an
inequality join into a bounded equi-join, which is the difference
between a BroadcastNestedLoop and a hash join at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def epoch_seconds(col: Column) -> Column:
    """Fractional epoch seconds for any timestamp flavor.

    TIMESTAMP_NTZ cannot be cast to DOUBLE directly; casting through
    TIMESTAMP_LTZ first interprets the wall-clock value in the session
    time zone (pinned to UTC in session.py), which matches how DuckDB's
    ``epoch()`` treats naive timestamps — so the two engines agree
    bit-for-bit. Double keeps sub-second precision (microsecond-exact
    in IEEE754 at epoch magnitudes), which integer unix_timestamp
    would truncate.
    """
    return col.cast("timestamp_ltz").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_payload: Sequence[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join: attach the latest `right_payload` values whose
    `on` ≤ the left row's `on`, matching on `by` keys.

    `tie_break`: optional right-side column ordering rows with equal
    timestamps (larger wins); required for full determinism when the
    right side can carry duplicate timestamps per key.
    """
    by = list(by)
    payload = list(right_payload)

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"__r_{p}") for p in payload],
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by and c != on],
        F.lit(0).alias("__is_left"),
        *[F.col(p).alias(f"__r_{p}") for p in payload],
    ).select(*[c for c in l_tagged.columns])

    # Right rows sort before the left row at equal timestamps (so
    # "at-or-before" includes ties); the tie-break orders right rows
    # among themselves with the largest winning.
    order = [F.col(on).asc(), F.col("__is_left").asc()]
    if tie_break:
        tb = F.col(f"__r_{tie_break}") if tie_break in payload else F.col(tie_break)
        order.append(tb.asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__is_left"),
        *[
            F.last(f"__r_{p}", ignorenulls=True).over(w).alias(p)
            for p in payload
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop("__is_left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    lo_seconds: float,
    hi_seconds: float,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of rows with equal `by` keys and
    ``right.on - left.on ∈ [lo_seconds, hi_seconds]``, via time-bin
    bucketing + exact refine."""
    if hi_seconds <= lo_seconds:
        raise ValueError("hi_seconds must exceed lo_seconds")
    by = list(by)
    width = hi_seconds - lo_seconds

    l_ts = epoch_seconds(F.col(on))
    l_binned = left.withColumn("__bin_base", F.floor((l_ts + lo_seconds) / width))
    # A [l+lo, l+hi] window of width `width` overlaps exactly 2 bins.
    l_exploded = l_binned.withColumn(
        "__bin", F.explode(F.array(F.col("__bin_base"), F.col("__bin_base") + 1))
    ).drop("__bin_base")

    r_cols = [F.col(c).alias(c if c in by else f"{c}{suffix}") for c in right.columns]
    r_binned = right.select(*r_cols).withColumn(
        "__bin", F.floor(epoch_seconds(F.col(f"{on}{suffix}")) / width)
    )

    joined = l_exploded.join(r_binned, [*by, "__bin"]).drop("__bin")
    delta = epoch_seconds(F.col(f"{on}{suffix}")) - epoch_seconds(F.col(on))
    return joined.filter((delta >= lo_seconds) & (delta <= hi_seconds))
