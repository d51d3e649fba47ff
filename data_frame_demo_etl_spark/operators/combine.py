"""Combine operators — parity with reference src/combine_runner.py.

concat == unionByName (shuffle-free); merge == iterated equi-joins
with suffix renaming of non-key collisions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def concat_frames(frames: Sequence[DataFrame], strict_schema: bool = False) -> DataFrame:
    """Concatenate frames (combine_runner.py:19-30). With
    strict_schema, schemas must match by name; otherwise missing
    columns are null-filled (pandas concat sort=False semantics)."""
    if not frames:
        raise ValueError("concat requires at least one frame")
    if strict_schema:
        base = frames[0].columns
        for i, f in enumerate(frames[1:], start=2):
            if f.columns != base:
                raise ValueError(f"Schema mismatch in frame {i}: {f.columns} != {base}")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=not strict_schema)
    return out


def merge_frames(frames: Sequence[DataFrame], keys: Sequence[str], how: str = "inner") -> DataFrame:
    """Iteratively join frames on keys (combine_runner.py:33-46),
    suffixing colliding non-key columns `_2`, `_3`, ... like pandas.
    """
    if not keys:
        raise ValueError("Merge mode requires at least one key.")
    if not frames:
        raise ValueError("merge requires at least one frame")
    merged = frames[0]
    for idx, df in enumerate(frames[1:], start=2):
        missing_left = [k for k in keys if k not in merged.columns]
        missing_right = [k for k in keys if k not in df.columns]
        if missing_left or missing_right:
            raise ValueError(
                f"Missing merge keys. Left missing {missing_left}, right missing {missing_right}."
            )
        collisions = [c for c in df.columns if c in merged.columns and c not in keys]
        renamed = df
        for c in collisions:
            renamed = renamed.withColumnRenamed(c, f"{c}_{idx}")
        merged = merged.join(renamed, list(keys), how)
    return merged
