"""Exact distributed selection (k-th order statistic / median) by
iterative histogram narrowing — the scale-correct alternative to
exact-percentile aggregates that buffer every value of a group in
executor memory (Spark's `percentile` collects per-group value lists;
fine at 10⁶ values per group, fatal at 10⁹).

Algorithm (classic distributed selection): per refinement round, rows
still in the candidate range are bucketed into ≤ FANOUT equal-width
integer bins with ONE map-side-combined aggregation; the driver
cumulates each group's (≤ FANOUT-row) histogram to find which bin
holds the target rank and re-targets the rank within it. The range
shrinks by FANOUT× per round, so 64-bit integer domains finish in
≤ 4 rounds of cheap counting scans — no sort, no window, no
per-group memory, driver work O(groups · FANOUT) per round.

`grouped_median2` returns the DOUBLED median (lower + upper middle
order statistics — always an exact integer, the repo's robust-stats
convention), bit-identical to `2 · percentile(col, 0.5)` / DuckDB
`2 · QUANTILE_CONT(v, 0.5)` on integer inputs; equality with Spark's
buffering aggregate is pinned in pytest (test_selection.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FANOUT = 65536


def grouped_kth(df: DataFrame, group_col: str, val_col: str, ranks: dict) -> dict:
    """Exact k-th smallest values: ``ranks`` maps group value →
    iterable of 1-based ranks; returns {(group, rank): value}.
    ``val_col`` must be integral (the repo's micro-grid convention).

    Driver state is one (lo, hi, adjusted-rank) triple per requested
    order statistic; each round issues ONE aggregation over the rows
    still inside any active range.
    """
    # tasks: (group, orig_rank) -> [lo, hi, remaining_rank]
    bounds = {
        r["g"]: (int(r["lo"]), int(r["hi"]))
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.min(val_col).alias("lo"), F.max(val_col).alias("hi"))
        .collect()
    }
    tasks = {
        (g, k): [bounds[g][0], bounds[g][1], k]
        for g, ks in ranks.items()
        if g in bounds
        for k in ks
    }
    out: dict = {}
    while tasks:
        done = [t for t, (lo, hi, _k) in tasks.items() if lo == hi]
        for t in done:
            out[t] = tasks.pop(t)[0]
        if not tasks:
            break
        # One bucketing pass over rows inside any active range. Each
        # task gets its own bucket column family via a task id so
        # overlapping ranges in the same group stay independent.
        conds = []
        for i, ((g, _k), (lo, hi, _rk)) in enumerate(tasks.items()):
            width = max((hi - lo + FANOUT) // FANOUT, 1)
            # integer `div`, not float floor-division: values past 2^53
            # would round in double space and could land a row in the
            # wrong bucket (vals ≥ lo here, so div == floor-division).
            # A first-round span can exceed int64 (lo near -2^63, hi
            # near 2^63-1): `val - lo` then wraps in long arithmetic
            # and misroutes rows, so route through exact DECIMAL(38,0)
            # subtraction for such tasks (`div` on decimals still
            # yields bigint; one round of narrowing brings the span
            # back under 2^49, so the fast long path resumes).
            if hi - lo > (2**63 - 1) - FANOUT:
                bucket = F.expr(
                    f"cast((cast({val_col} as decimal(38,0)) - ({lo})) div {width} as bigint)"
                )
            else:
                bucket = F.expr(f"({val_col} - ({lo})) div {width}")
            conds.append(
                F.when(
                    (F.col(group_col) == F.lit(g))
                    & (F.col(val_col) >= F.lit(lo))
                    & (F.col(val_col) <= F.lit(hi)),
                    F.struct(F.lit(i).alias("t"), bucket.alias("b")),
                )
            )
        tagged = df.select(
            F.explode(
                F.filter(F.array(*conds), lambda c: c.isNotNull())
            ).alias("tb")
        )
        hist = {
            (r["t"], r["b"]): r["c"]
            for r in tagged.groupBy(
                F.col("tb.t").alias("t"), F.col("tb.b").alias("b")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        items = list(tasks.items())
        for i, (tkey, (lo, hi, rk)) in enumerate(items):
            width = max((hi - lo + FANOUT) // FANOUT, 1)
            cum = 0
            for b in sorted(bb for (ti, bb) in hist if ti == i):
                c = hist[(i, b)]
                if cum + c >= rk:
                    new_lo = lo + b * width
                    new_hi = min(lo + (b + 1) * width - 1, hi)
                    tasks[tkey] = [new_lo, new_hi, rk - cum]
                    break
                cum += c
            else:
                raise ValueError(
                    f"rank {tkey[1]} exceeds the rows available in group "
                    f"{tkey[0]!r} — ranks must be 1..group_size"
                )
    return out


def grouped_median2(df: DataFrame, group_col: str, val_col: str) -> dict:
    """{group: doubled median} — exact, via ≤ 4 counting passes.
    Even-sized groups return lower+upper middles; odd return 2·middle.
    """
    ns = {
        r["g"]: int(r["n"])
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ranks = {g: sorted({(n + 1) // 2, (n + 2) // 2}) for g, n in ns.items() if n}
    kth = grouped_kth(df, group_col, val_col, ranks)
    out = {}
    for g, ks in ranks.items():
        if len(ks) == 1:
            out[g] = 2 * kth[(g, ks[0])]
        else:
            out[g] = kth[(g, ks[0])] + kth[(g, ks[1])]
    return out
