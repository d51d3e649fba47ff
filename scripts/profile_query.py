"""Per-query profile: construction wall (eager checkpoints / bounded
collects happen here) vs action wall (materialize), plus the Spark job
count each phase issued — the measure-first split §1 of the
optimization guide asks for. Job count comes from the status tracker
(no UI in the sandbox).

Usage: python scripts/profile_query.py <query> [query ...] [--sf DIR] [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_frame_demo_etl_spark import registry
from data_frame_demo_etl_spark.session import get_spark, materialize, release_all_caches


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf0.1"
    reps = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(registry.queries())
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY")
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        for rep in range(reps):
            release_all_caches(spark)
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = qs[name](spark, sf)
            t1 = time.perf_counter()
            j1 = len(tracker.getJobIdsForGroup(None))
            materialize(df)
            t2 = time.perf_counter()
            j2 = len(tracker.getJobIdsForGroup(None))
            print(
                f"{name} rep{rep}: construct {t1 - t0:6.2f}s ({j1 - j0:3d} jobs)"
                f"  action {t2 - t1:6.2f}s ({j2 - j1:3d} jobs)"
                f"  total {t2 - t0:6.2f}s"
            )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
