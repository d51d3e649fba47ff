"""Sampling, splitting, capping, and packing operators for
training-data pipelines.

All deterministic-by-construction: hash-threshold sampling and splits
depend only on row content (stable across reruns, partitionings, and
cluster sizes — `rand()`-based sampling is none of those), capping and
packing use explicit total orders.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window, functions as F

_BUCKETS = 1_000_000


def deterministic_sample(df: DataFrame, id_cols: Sequence[str], fraction: float, seed: int = 42) -> DataFrame:
    """Content-hash Bernoulli sample: keeps rows whose seeded hash of
    `id_cols` falls under `fraction`. Same rows in, same rows out —
    anywhere."""
    bucket = F.pmod(F.xxhash64(F.lit(seed), *[F.col(c) for c in id_cols]), F.lit(_BUCKETS))
    return df.filter(bucket < int(fraction * _BUCKETS))


def portable_sample(df: DataFrame, id_cols: Sequence[str], fraction: float) -> DataFrame:
    """Engine-portable deterministic sample: keeps rows whose md5 hex
    digest of the concatenated `id_cols` is lexicographically below the
    `fraction` threshold (hex string order == numeric order, so the
    keep-rate converges to `fraction`).

    Any engine with md5 (DuckDB, Trino, BigQuery, ...) reproduces the
    EXACT same row set — use this when the sample itself must be
    cross-verified. `deterministic_sample` (xxhash64) is the cheaper
    in-Spark default.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction == 1.0:
        return df
    # floor(fraction * 16^8) rendered as 8 hex chars: comparing the
    # digest's first 8 chars against it keeps ~fraction of keys.
    threshold = format(int(fraction * 16**8), "08x")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols])
    return df.filter(F.substring(F.md5(key), 1, 8) < F.lit(threshold))


def split_by_hash(
    df: DataFrame, id_cols: Sequence[str], fractions: Mapping[str, float], seed: int = 42
) -> dict[str, DataFrame]:
    """Disjoint, exhaustive train/val/test split keyed on content hash.

    Fractions must sum to 1 (±1e-9). A row's split follows it forever:
    new data never migrates old rows between splits.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = F.pmod(F.xxhash64(F.lit(seed), *[F.col(c) for c in id_cols]), F.lit(_BUCKETS))
    out: dict[str, DataFrame] = {}
    lo = 0.0
    items = list(fractions.items())
    for i, (name, frac) in enumerate(items):
        hi = 1.0 if i == len(items) - 1 else lo + frac
        out[name] = df.filter((bucket >= int(lo * _BUCKETS)) & (bucket < int(hi * _BUCKETS)))
        lo = hi
    return out


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum sampling via the native ``sampleBy``."""
    return df.sampleBy(strata_col, dict(fractions), seed)


def cap_per_key(
    df: DataFrame, key: Sequence[str], order_by: Sequence[str], n: int
) -> DataFrame:
    """Keep at most `n` rows per key (explicit order → deterministic
    survivors). The standard class-balance / per-domain quota step."""
    w = Window.partitionBy(*key).orderBy(*[F.col(c).asc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def pack_by_budget(
    df: DataFrame,
    group_col: str,
    order_by: Sequence[str],
    size_col: str,
    budget: int,
) -> DataFrame:
    """Assign rows to sequential bins of ~`budget` total `size_col`
    per group (running-sum binning — the distributed approximation of
    greedy sequence packing for LLM batch assembly).

    Adds `bin`: floor((cumsum - size) / budget), so a row starts a new
    bin once the running total crosses the budget boundary.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(*[F.col(c).asc() for c in order_by])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = F.sum(F.col(size_col)).over(w)
    return df.withColumn("bin", F.floor((running - F.col(size_col)) / budget))


def portable_weighted_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    id_cols: Sequence[str],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix operator:
    each stratum (source/domain/language) keeps its own fraction of
    rows, so a corpus can be re-weighted into a target mixture in one
    scan with no shuffle.

    Engine-portable by construction: a row is kept iff the integer
    value of the first 8 md5 hex chars of its id is below
    ``floor(rate * 2^32)`` for its stratum. Any engine with md5
    reproduces the exact row set; rate 1.0 maps to 2^32, above every
    32-bit digest prefix, so full-keep strata need no special case.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols])
    hash_int = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    mapping = F.create_map(
        *[F.lit(x) for s, r in rates.items() for x in (s, int(r * 2**32))]
    )
    threshold = F.coalesce(
        mapping[F.col(strata_col)], F.lit(int(default_rate * 2**32))
    )
    return df.filter(hash_int < threshold)
