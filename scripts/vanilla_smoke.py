"""Vanilla-session smoke sweep: run every registered gate's first
action on a SparkSession with NO repo confs applied.

Motivation (round-5 verdict): the external driver builds a plain
``SparkSession.builder.master(...).getOrCreate()`` — none of
session.py's confs exist there. ``ingest_excel_datasource`` ERR'd in
round 5 because its DataSource reader required
``spark.sql.python.filterPushdown.enabled`` (set by session.py, absent
on the driver). This sweep reproduces the driver's environment so any
gate↔session-conf coupling fails in pytest, not in the round window.

Usage:  python scripts/vanilla_smoke.py [sf_dir] [name ...]
Prints one line per gate (OK/FAIL) and exits non-zero on any failure.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # Deliberately NO engine confs: mirror the driver harness. The two
    # local[] / UI settings below change capacity, not semantics.
    spark = (
        SparkSession.builder.appName("vanilla-smoke")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from data_frame_demo_etl_spark import registry

    failures: list[str] = []
    for name, fn in registry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            # First action only: plan + reader init + one real job.
            # Full value verification is verify_contract.py's job.
            df.limit(5).collect()
            print(f"OK    {name}", flush=True)
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}", flush=True)
            traceback.print_exc()
    spark.stop()
    print(f"vanilla-smoke: {len(failures)} failures", flush=True)
    if failures:
        print("failed gates:", ", ".join(failures), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
