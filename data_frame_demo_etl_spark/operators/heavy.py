"""Exact distributed heavy hitters (top-k frequent items) via
two-pass candidate pruning.

The naive plan — explode every token and shuffle the FULL vocabulary
to count it — moves |vocab| keys through the exchange. At 100 TB the
vocabulary (terms, URLs, n-grams) can be billions of keys while only
the top-k are wanted. The classic fix (Metwally et al. 2005
"space-saving"; TPUT-style threshold merging) is:

  pass 1  per-partition exact counts, keep each partition's top-m
          (plus the m-th count as that partition's error bound —
          any item NOT in a partition's top-m has at most that count
          there);
  pass 2  exact global recount restricted to the candidate union
          (a broadcast semi-join — the candidate set is bounded by
          partitions × m, not by vocabulary size).

If the k-th candidate's exact count is at least the summed bound, the
result provably equals the exact top-k. On adversarially flat data
the guarantee can fail; this implementation then FALLS BACK to the
exact full aggregation (correct always, pruned when possible).

Ties break by item ascending, so the output is a deterministic total
order in both engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_CANDIDATE_SCHEMA = "item string, cnt long, bound long"


def _partition_topm(m: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for item, c in pdf["item"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
        if not counts:
            return
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        top = ranked[:m]
        # bound row: the count any pruned item could hide in this
        # partition (0 when nothing was pruned)
        bound = top[-1][1] if len(ranked) > m else 0
        out = pd.DataFrame(
            {
                "item": [t for t, _ in top] + [None],
                "cnt": [c for _, c in top] + [0],
                "bound": [0] * len(top) + [bound],
            }
        )
        yield out

    return gen


def top_k_exact(items: DataFrame, item_col: str, k: int, m: int | None = None) -> DataFrame:
    """Exact top-k most frequent values of `items[item_col]`.

    `m` is the per-partition candidate width (default ``4 * k``);
    larger m prunes less but makes the exactness guarantee easier to
    meet. Returns (item, cnt) ordered by (cnt desc, item asc), exact
    in all cases.
    """
    m = m or 4 * k
    src = items.select(F.col(item_col).alias("item")).filter(F.col("item").isNotNull())
    firstpass = src.mapInPandas(_partition_topm(m), _CANDIDATE_SCHEMA).persist()
    try:
        total_bound = firstpass.agg(F.sum("bound")).collect()[0][0] or 0
        candidates = firstpass.filter(F.col("item").isNotNull()).select("item").distinct()
        exact = (
            src.join(F.broadcast(candidates), "item")
            .groupBy("item")
            .agg(F.count("*").alias("cnt"))
        )
        topk = exact.orderBy(F.col("cnt").desc(), F.col("item").asc()).limit(k).collect()
        # strict >: a pruned item could reach exactly total_bound and
        # win the (cnt, item) tie-break, so equality is not enough
        if len(topk) >= k and topk[-1]["cnt"] > total_bound:
            return items.sparkSession.createDataFrame(topk, "item string, cnt long")
        # guarantee not met (flat distribution or tiny data): exact full agg
        return (
            src.groupBy("item")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("item").asc())
            .limit(k)
        )
    finally:
        firstpass.unpersist()
