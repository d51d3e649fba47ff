"""100× spot-run: synthesize an sf10-equivalent dataset (100× the
sf0.1 tables = 10× the scaling.py sf1 set, key-shifted) and time the
heaviest queries at sf0.1 → sf1 → sf10, to catch superlinear terms
while they are cheap (round-5 verdict stretch item).

Only the tables the target queries read are synthesized (lineitem for
the graph gates, documents/embeddings for the text/retrieval gates,
orders+lineitem for basket rules) — building all ten at 100× would be
parquet-write-bound without adding signal.

Usage: python scripts/scaling100.py [--queries a,b,...]
Prints one JSON line: per query, seconds at each scale and the two
step ratios (each step is 10× the data).
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
from data_frame_demo_etl_spark.sources.catalog import load_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = str(Path(__file__).resolve().parents[1] / ".tmp" / "sf1")
SF10 = str(Path(__file__).resolve().parents[1] / ".tmp" / "sf10")
SHIFT = 1_000_000_000
SHIFT10 = 50_000_000_000  # clear of the sf1 shift range (10 * 1e9)

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
    "supplier_kcore",
    "supplier_triangles",
    "dedup_ngram_jaccard",
    "retrieval_rrf_fusion",
    "brand_association_rules",
]

# tables each default query needs at sf10 (others read from BASE via
# the table-level fallback below)
NEEDED = ["lineitem", "orders", "part", "documents", "embeddings", "events",
          "customer", "supplier", "region", "nation"]


def build_sf10(spark) -> None:
    Path(SF10).mkdir(parents=True, exist_ok=True)
    for name in NEEDED:
        out = f"{SF10}/{name}.parquet"
        if Path(out).exists():
            continue
        if name in ("region", "nation"):
            load_table(spark, name, BASE).write.mode("overwrite").parquet(out)
            continue
        # 10 key-shifted copies of the sf1 table (itself 10× sf0.1)
        df = load_table(spark, name, SF1)
        shifts = KEY_SHIFTS[name]
        copies = []
        for k in range(10):
            c = df
            for col in shifts:
                c = c.withColumn(col, F.col(col) + F.lit(k * SHIFT10))
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.write.mode("overwrite").parquet(out)
        print(f"built sf10/{name}", file=sys.stderr)


def main() -> None:
    qnames = DEFAULT_QUERIES
    for arg in sys.argv[1:]:
        if arg.startswith("--queries="):
            qnames = arg.split("=", 1)[1].split(",")

    # 100× data in one local JVM needs more heap than the 8g default
    # (on a real cluster this is per-executor memory, not one shared
    # driver heap).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(
        app_name="scaling100",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not Path(f"{SF1}/lineitem.parquet").exists():
        print("run scripts/scaling.py first (needs .tmp/sf1)", file=sys.stderr)
        sys.exit(1)
    build_sf10(spark)

    qs = registry.queries()
    results = {}
    for name in qnames:
        materialize(qs[name](spark, BASE))  # warm this query
        times = {}
        for label, d in (("sf0.1", BASE), ("sf1", SF1), ("sf10", SF10)):
            from data_frame_demo_etl_spark.analytics.triangles import (
                release_copurchase_edges,
            )

            release_copurchase_edges()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            materialize(qs[name](spark, d))
            times[label] = round(time.perf_counter() - t0, 2)
        times["ratio_1"] = round(times["sf1"] / max(times["sf0.1"], 1e-9), 1)
        times["ratio_10"] = round(times["sf10"] / max(times["sf1"], 1e-9), 1)
        results[name] = times
        print(f"{name}: {times}", file=sys.stderr)
    print(json.dumps({"results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
