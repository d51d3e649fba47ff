"""Throwaway A/B harness for conf experiments: times a subset of
headline queries with the bench methodology (warmup count, best-of-2
materialize, cache release between queries) under extra confs from
SPARK_GRAFT_EXTRA_CONF ("k=v,k=v").

Usage: python scripts/minibench.py q1 q2 ... [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_frame_demo_etl_spark import registry
from data_frame_demo_etl_spark.session import get_spark, materialize, release_all_caches

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    extra = {}
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k] = v
    spark = get_spark(app_name="minibench", master="local[32]", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(registry.queries())
    for name in names:
        qs[name](spark, SF_DIR).count()
        release_all_caches(spark)
    total = 0.0
    out = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(qs[name](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
        total += best
        release_all_caches(spark)
    print({"total": round(total, 2), "queries": out})
    spark.stop()


if __name__ == "__main__":
    main()
