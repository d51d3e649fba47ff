"""Capture .explain('formatted') for queries into plans/r12/<name>_<tag>.txt.

Usage: python scripts/capture_plan.py <tag> <query> [query ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_frame_demo_etl_spark import registry
from data_frame_demo_etl_spark.session import get_spark, release_all_caches


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    tag, names = args[0], args[1:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plan", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(registry.queries())
    for name in names:
        release_all_caches(spark)
        df = qs[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
