"""Hot-key join skew: triage → mitigation proof at sf0.1.

Plants a hot key on 30% of lineitem, shows the skew profiler flags
it, then compares three join strategies (broadcast disabled so the
shuffle path is exercised, as it would be when both sides are big):

1. plain sort-merge join, AQE skew split OFF  — one reducer gets the
   whole hot key;
2. AQE skew split ON                          — runtime splits it;
3. explicit salted_join (n_salts=8)           — the hot key scatters
   across 8 reducers by construction.

Reports the shuffle-partition row histogram of the big side under
the join's partitioning (the direct cause of task-time skew) and the
join wall time. Usage: python scripts/skew_experiment.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_frame_demo_etl_spark.operators.skew import salted_join  # noqa: E402
from data_frame_demo_etl_spark.operators.skew import key_skew_profile  # noqa: E402
from data_frame_demo_etl_spark.session import get_spark  # noqa: E402
from data_frame_demo_etl_spark.sources.catalog import load_table  # noqa: E402

HOT_KEY = 1
HOT_FRAC = 0.30
N_PARTS = 32


def partition_histogram(df, *cols):
    """Row counts per hash partition under hashpartitioning(cols)."""
    pid = df.repartition(N_PARTS, *[F.col(c) for c in cols]).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = sorted(
        r["count"] for r in pid.groupBy("__pid").count().collect()
    )
    return counts


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="skew_experiment", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, "lineitem", sf).select("l_orderkey", "l_quantity")
    # Plant the hot key deterministically on ~30% of rows.
    hot = li.withColumn(
        "l_orderkey",
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_quantity"), F.lit(100)) < HOT_FRAC * 100, F.lit(HOT_KEY)).otherwise(
            F.col("l_orderkey")
        ),
    ).persist()
    n = hot.count()
    orders = load_table(spark, "orders", sf).select("o_orderkey", "o_totalprice").persist()
    orders.count()

    print("— skew triage (key_skew_profile on planted l_orderkey) —")
    prof = key_skew_profile(hot, "l_orderkey").collect()[0]
    print(
        f"n_rows={prof.n_rows} n_keys={prof.n_keys} max_count={prof.max_count} "
        f"p50={prof.p50_count} p99={prof.p99_count} top_share={prof.top_share}"
    )
    print(f"→ max key holds {prof.max_count / prof.n_rows:.1%} of rows; mitigation required\n")

    print("— shuffle-partition histograms (rows per reducer, sorted) —")
    plain = partition_histogram(hot, "l_orderkey")
    salted = partition_histogram(
        hot.withColumn("__salt", F.pmod(F.xxhash64("l_orderkey", "l_quantity"), F.lit(8))),
        "l_orderkey",
        "__salt",
    )
    print(f"keyed(l_orderkey):        max={max(plain)} p50={plain[len(plain)//2]} ({max(plain)/n:.1%} of rows in one task)")
    print(f"keyed(l_orderkey, salt8): max={max(salted)} p50={salted[len(salted)//2]} ({max(salted)/n:.1%} of rows in worst task)\n")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def timed_join(label, fn):
        best, rows = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn().count()
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best:.3f}s ({rows} rows)")
        return rows

    print("— join wall (broadcast disabled, best of 2) —")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    r1 = timed_join(
        "plain SMJ, skew split OFF", lambda: hot.join(orders, hot.l_orderkey == orders.o_orderkey)
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
    r2 = timed_join(
        "plain SMJ, AQE skew split ON", lambda: hot.join(orders, hot.l_orderkey == orders.o_orderkey)
    )
    r3 = timed_join(
        "salted_join(n_salts=8)", lambda: salted_join(hot, orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", n_salts=8)
    )
    assert r1 == r2 == r3, (r1, r2, r3)
    print("\nresult parity: all three strategies return identical row counts")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    spark.stop()


if __name__ == "__main__":
    main()
