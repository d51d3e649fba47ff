"""Bloom-filter row-group pruning experiment (SCALING.md follow-up).

Question: on a layout NOT clustered by the lookup key (min/max stats
useless), do parquet Bloom filters make point/IN-list probes cheaper?

Method: write lineitem (sf0.1) shuffled (destroying any natural
l_orderkey clustering) twice — with and without a Bloom filter on
l_orderkey — then time an IN-list probe of 20 existing + 20 absent
keys, several repetitions, reporting wall time and scan metrics.

Run: python scripts/bloom_experiment.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.operators.layout import write_with_bloom
from data_frame_demo_etl_spark.session import get_spark
from data_frame_demo_etl_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # Small row groups so there are enough groups for skipping to matter.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    # Shuffle so l_orderkey is uniformly spread over every row group.
    shuffled = li.repartition(16, F.col("l_partkey")).cache()
    n = shuffled.count()

    base = Path(tempfile.mkdtemp(prefix="bloom_exp_"))
    plain_path, bloom_path = str(base / "plain"), str(base / "bloom")
    w = shuffled.write.mode("overwrite").option("parquet.block.size", str(1 << 20))
    w.parquet(plain_path)
    for c in ("l_orderkey",):
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", "40000"
        )
    w.parquet(bloom_path)
    # Also exercise the layout helper API once (same options path).
    write_with_bloom(shuffled.limit(10), str(base / "api_smoke"), ["l_orderkey"], 1000)

    keys = [r.l_orderkey for r in li.select("l_orderkey").distinct().limit(20).collect()]
    max_key = li.agg(F.max("l_orderkey")).first()[0]
    absent = [max_key + 10_000 + i for i in range(20)]
    probe = keys + absent

    def probe_time(path: str, reps: int = 5) -> float:
        df = spark.read.parquet(path)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df.filter(F.col("l_orderkey").isin(probe)).agg(
                F.count(F.lit(1)), F.sum("l_quantity")
            ).collect()
            times.append(time.perf_counter() - t0)
        return min(times)

    # Warm both paths once (footer caching parity), then measure.
    probe_time(plain_path, 1), probe_time(bloom_path, 1)
    t_plain = probe_time(plain_path)
    t_bloom = probe_time(bloom_path)

    size = lambda p: sum(f.stat().st_size for f in Path(p).rglob("*.parquet"))
    out = {
        "rows": n,
        "probe_keys": len(probe),
        "plain_sec": round(t_plain, 4),
        "bloom_sec": round(t_bloom, 4),
        "speedup": round(t_plain / t_bloom, 2) if t_bloom else None,
        "plain_bytes": size(plain_path),
        "bloom_bytes": size(bloom_path),
        "bloom_overhead_pct": round(100 * (size(bloom_path) - size(plain_path)) / size(plain_path), 2),
    }
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
