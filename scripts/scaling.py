"""Scale-up experiment: synthesize an sf1-equivalent dataset (10× the
sf0.1 tables, key-shifted so FK relationships hold) under .tmp/, then
time headline queries at both scales to measure scaling behavior.

Usage: python scripts/scaling.py [--queries q1_pricing_summary,...]
Prints one JSON line with per-query times at each scale + the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from data_frame_demo_etl_spark import registry
from data_frame_demo_etl_spark.session import get_spark, materialize
from data_frame_demo_etl_spark.sources.catalog import TABLES, load_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED = str(Path(__file__).resolve().parents[1] / ".tmp" / "sf1")
COPIES = 10
SHIFT = 1_000_000_000

KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedupe_keep_first",
    "combine_on_agg",
]


def build_scaled(spark) -> None:
    Path(SCALED).mkdir(parents=True, exist_ok=True)
    for name in TABLES:
        out = f"{SCALED}/{name}.parquet"
        if Path(out).exists():
            continue
        df = load_table(spark, name, BASE)
        if name in ("region", "nation"):
            df.write.mode("overwrite").parquet(out)
            continue
        shifts = KEY_SHIFTS[name]
        copies = []
        for k in range(COPIES):
            c = df
            for col in shifts:
                c = c.withColumn(col, F.col(col) + F.lit(k * SHIFT))
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.write.mode("overwrite").parquet(out)
        print(f"built {name}", file=sys.stderr)


def main() -> None:
    qnames = DEFAULT_QUERIES
    for arg in sys.argv[1:]:
        if arg.startswith("--queries"):
            qnames = arg.split("=", 1)[1].split(",")

    spark = get_spark(app_name="scaling", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS','32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)

    qs = registry.queries()
    qs["q1_pricing_summary"](spark, BASE).count()  # warm the session

    results = {}
    for name in qnames:
        times = {}
        for label, d in (("sf0.1", BASE), ("sf1", SCALED)):
            # Warm THIS (query, scale) once untimed before measuring:
            # a first execution pays Python-worker spinup / codec
            # imports / per-sf_dir memoized-cache builds that later
            # runs don't. Warming only the BASE side (the pre-round-7
            # harness) produced two artifacts: bogus sub-1.0 ratios
            # (cold sf0.1 vs warm sf1 — the round-5 table) AND
            # inflated ratios for queries with per-(app, sf_dir)
            # signature caches, whose sf1 run was paying the cache
            # build the sf0.1 timed run had already amortized (the
            # round-6 threshold-sweep 4.3). Symmetric warming measures
            # steady-state at both scales.
            materialize(qs[name](spark, d))
            t0 = time.perf_counter()
            materialize(qs[name](spark, d))
            times[label] = round(time.perf_counter() - t0, 2)
        times["ratio"] = round(times["sf1"] / max(times["sf0.1"], 1e-9), 1)
        results[name] = times
    print(json.dumps({"copies": COPIES, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
