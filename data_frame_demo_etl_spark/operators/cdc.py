"""Change-data-capture apply (merge/upsert/delete).

``apply_changes`` folds a change stream (op ∈ {insert, update,
delete}, ordered per key by a sequence column) into a base snapshot:

1. collapse the change stream to the LATEST change per key (window,
   one shuffle — at 100 TB this is the step that turns billions of
   change rows into per-key state),
2. anti-join base rows whose key has any change,
3. union the surviving base rows with the latest upserts.

Deterministic given a total (seq, tie-break) order; no driver loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Return the new snapshot after applying `changes` to `base`.

    `changes` columns: key cols + seq_col + op_col + the base payload
    columns (payload ignored for deletes).

    Two changes sharing a seq for the same key would otherwise pick an
    arbitrary winner (nondeterministic across runs/partitionings) —
    pass `tiebreak` columns that complete the total order, e.g. an
    ingest offset; they are appended descending after `seq_col`.

    r13: the latest-change collapse is MAX of the (seq, tiebreaks,
    remaining columns) struct — lexicographic struct comparison ≡ the
    former window's all-descending sort, identical winner under the
    contract's total (seq, tie-break) order. row_number shuffled and
    sorted the whole change stream; max(struct) partial-aggregates
    map-side, so the exchange carries one candidate per key per map
    task — the step that turns billions of change rows into per-key
    state now ships per-key state (§2.3).
    """
    key = list(key)
    payload = [c for c in base.columns if c not in key]

    ordered = [seq_col] + [c for c in tiebreak]
    rest = [c for c in changes.columns if c not in key and c not in ordered]
    latest = (
        changes.groupBy(*key)
        .agg(F.max(F.struct(*ordered, *rest)).alias("__w"))
        .select(
            *key,
            *[
                F.col("__w").getField(c).alias(c)
                for c in changes.columns
                if c not in key
            ],
        )
    )

    untouched = base.join(latest.select(*key), key, "left_anti")
    upserts = latest.filter(F.lower(F.col(op_col)) != "delete").select(*key, *payload)
    return untouched.unionByName(upserts)


def scd2_history(
    changes: DataFrame,
    key: Sequence[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream:
    one row per change version with ``valid_from`` / ``valid_to``
    (null = current) and ``is_current``.

    A delete closes the previous version without opening a new one.
    One shuffle (the per-key window); ``lead()`` supplies each
    version's expiry.
    """
    key = list(key)
    w = Window.partitionBy(*key).orderBy(F.col(seq_col).asc())
    with_next = changes.withColumn("__next_seq", F.lead(seq_col).over(w))
    versions = with_next.filter(F.lower(F.col(op_col)) != "delete")
    return versions.select(
        *key,
        *[c for c in changes.columns if c not in key and c != op_col and c != seq_col],
        F.col(seq_col).alias("valid_from"),
        F.col("__next_seq").alias("valid_to"),
        F.col("__next_seq").isNull().alias("is_current"),
    )
