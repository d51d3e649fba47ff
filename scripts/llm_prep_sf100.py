"""sf100 stretch for the composed corpus-prep flagship (r9 verdict
item 9): one more decade past the r8 sf10 measurement, making the
100 TB extrapolation two-point.

Synthesizes .tmp/sf100/documents.parquet (10 key-shifted copies of
the scaling100 sf10 documents — a 1000×-duplicated corpus vs sf0.1,
~50M docs) and times `llm_prep_pipeline` at sf10 → sf100. Only
documents is built: the pipeline reads nothing else.

Usage: python scripts/llm_prep_sf100.py
Prints one JSON line {"sf10": s, "sf100": s, "ratio": r, "rows": n}.
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

SF10 = str(Path(__file__).resolve().parents[1] / ".tmp" / "sf10")
SF100 = str(Path(__file__).resolve().parents[1] / ".tmp" / "sf100")
SF1000 = str(Path(__file__).resolve().parents[1] / ".tmp" / "sf1000")
SF10000 = str(Path(__file__).resolve().parents[1] / ".tmp" / "sf10000")
# clear of scaling100's SHIFT10 range (10 copies × 5e10)
SHIFT100 = 1_000_000_000_000
# clear of the SHIFT100 range (10 copies × 1e12)
SHIFT1000 = 100_000_000_000_000
# clear of the SHIFT1000 range (10 copies × 1e14); 10 copies × 1e16
# tops out at 1e17, well under long max
SHIFT10000 = 10_000_000_000_000_000


def _build_documents(spark, src: str, dst: str, shift: int, label: str) -> None:
    out = f"{dst}/documents.parquet"
    # Completion is keyed on a _DONE marker written AFTER the parquet
    # commit (matching scaling_boilerplate.build_corpus) — a crashed
    # partial write must NOT read as a finished corpus, or the sf100/
    # sf1000 timing ratio silently measures an undersized input.
    marker = Path(dst) / "_DONE_documents"
    if marker.exists():
        return
    Path(dst).mkdir(parents=True, exist_ok=True)
    df = load_table(spark, "documents", src)
    copies = [
        df.withColumn("doc_id", F.col("doc_id") + F.lit(k * shift)) for k in range(10)
    ]
    scaled = copies[0]
    for c in copies[1:]:
        scaled = scaled.unionByName(c)
    scaled.write.mode("overwrite").parquet(out)
    marker.touch()
    print(f"built {label}/documents", file=sys.stderr)


def build_sf100_documents(spark) -> None:
    _build_documents(spark, SF10, SF100, SHIFT100, "sf100")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name="llm_prep_sf100",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not Path(f"{SF10}/documents.parquet").exists():
        print("run scripts/scaling100.py first (needs .tmp/sf10)", file=sys.stderr)
        sys.exit(1)
    build_sf100_documents(spark)

    legs = [("sf10", SF10), ("sf100", SF100)]
    if "--sf1000" in sys.argv[1:] or "--sf10000" in sys.argv[1:]:
        build_sf100_documents(spark)
        _build_documents(spark, SF100, SF1000, SHIFT1000, "sf1000")
        legs.append(("sf1000", SF1000))
    if "--sf10000" in sys.argv[1:]:
        # 5B docs, ~54 GB parquet — the fourth decade, where shuffle
        # (not plan) is the growth term
        _build_documents(spark, SF1000, SF10000, SHIFT10000, "sf10000")
        legs.append(("sf10000", SF10000))

    q = registry.queries()["llm_prep_pipeline"]
    if "--sf10000" in sys.argv[1:]:
        # Distinct-first collapse shuffles n_tasks × local-distincts
        # (every map task emits its own copy of the ~corpus-distinct
        # hash set before the merge). At the default 128 MB split the
        # 54 GB sf10000 corpus is ~520 tasks × ~40 MB ≈ 21 GB of
        # shuffle — more than this box's free disk (measured: the r11
        # first attempt died in BypassMergeSortShuffleWriter).
        # 1 GB splits cut tasks ~8× and the shuffle to ~2.5 GB. Set for
        # ALL legs of this invocation so the four points share a conf
        # (noted in SCALING.md).
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
    # warm the JVM (codegen compile, parquet reader init) so leg 1
    # isn't charged the cold-start the other legs don't pay
    materialize(q(spark, SF10))
    times = {}
    for label, d in legs:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        materialize(q(spark, d))
        times[label] = round(time.perf_counter() - t0, 2)
        print(f"{label}: {times[label]}s", file=sys.stderr)
    times["ratio"] = round(times["sf100"] / max(times["sf10"], 1e-9), 1)
    if "sf1000" in times:
        times["ratio_1000"] = round(times["sf1000"] / max(times["sf100"], 1e-9), 1)
    if "sf10000" in times:
        times["ratio_10000"] = round(times["sf10000"] / max(times["sf1000"], 1e-9), 1)
    print(json.dumps(times))
    spark.stop()


if __name__ == "__main__":
    main()
