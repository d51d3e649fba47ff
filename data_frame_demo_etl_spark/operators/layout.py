"""Physical data-layout utilities for the 100 TB path.

- ``write_partitioned``: hive-style partition directories → partition
  pruning turns predicates on the partition column into directory
  listing, not data reads.
- ``write_bucketed``: hash-bucketed, optionally sorted table.
  Bucketing pre-shuffles the data ONCE at write time; every later
  equi-join or aggregation on the bucket key is shuffle-free.
- ``compact``: repartition + sortWithinPartitions for write-time
  clustering (row-group min/max statistics become selective, so
  filter pushdown skips row groups).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact(
    df: DataFrame, n_partitions: int, cluster_cols: Sequence[str]
) -> DataFrame:
    """Repartition on the cluster columns and sort within partitions —
    the standard pre-write step that makes parquet row-group stats
    selective for later scans."""
    return df.repartition(n_partitions, *cluster_cols).sortWithinPartitions(*cluster_cols)


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: Sequence[str],
    expected_ndv: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Parquet with column-level Bloom filters. When data is NOT
    clustered on a lookup key (so row-group min/max spans everything
    and prunes nothing), a Bloom filter per row group still answers
    "key definitely absent" — point lookups and selective IN-list
    probes skip row groups that clustering can't. Complements
    ``compact``: cluster on the primary access key, Bloom the
    secondary ones. Measured effect: SCALING.md (bloom experiment)."""
    writer = df.write.mode(mode)
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)
        )
    writer.parquet(path)


def zorder_value(x, y, bits: int = 16):
    """Morton/Z-order interleave of two non-negative ints (each
    truncated to ``bits`` low bits) as a pure column expression —
    bit i of x lands at position 2i, bit i of y at 2i+1.

    Static shift amounts keep every term inside whole-stage codegen;
    the chain is a constant-width OR fold, no UDF. Used by
    ``zorder_cluster`` so multi-column range layouts preserve locality
    in BOTH dimensions (a lexicographic sort clusters only the leading
    column; Z-order gives every column ~bits/2 effective prefix)."""
    from pyspark.sql import functions as F

    xi = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    yi = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xi, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(yi, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def zorder_cluster(
    df: DataFrame, x_col: str, y_col: str, n_partitions: int, bits: int = 16
) -> DataFrame:
    """Range-partition + sort by the Z-value of (x_col, y_col): the
    Delta/Iceberg OPTIMIZE ZORDER layout, expressed with vanilla
    repartitionByRange. Files written from the result have tight
    min/max on BOTH columns, so parquet row-group stats prune scans
    filtered on either one — the property test in test_layout.py
    measures the span shrink against a naive layout."""
    from pyspark.sql import functions as F

    with_z = df.withColumn("_z", zorder_value(F.col(x_col), F.col(y_col), bits))
    return (
        with_z.repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def events_zorder_stats(spark, sf_dir: str):
    """Gate: Z-order layout math end-to-end — interleave (user_id,
    event_id) low bits, bucket the Z-space into 4096 cells, and report
    per-cell row counts and the min/max span of BOTH source columns.
    The span columns are what row-group pruning would see: Z-cells
    bound user_id AND event_id simultaneously, which is the entire
    point of the layout (`zorder_cluster` writes files in this order).
    """
    from pyspark.sql import functions as F

    from ..sources.catalog import load_table

    events = load_table(spark, "events", sf_dir)
    x = F.col("user_id")
    y = F.col("event_id")
    z = zorder_value(x, y, bits=16)
    return (
        events.select(
            F.shiftright(z, 20).alias("z_cell"),
            "user_id",
            "event_id",
        )
        .groupBy("z_cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("user_id").alias("uid_min"),
            F.max("user_id").alias("uid_max"),
            F.min("event_id").alias("eid_min"),
            F.max("event_id").alias("eid_max"),
        )
        .orderBy("z_cell")
    )


def _zorder_sql(bits: int = 16) -> str:
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((((user_id & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((event_id & {mask}) >> {i}) & 1) << {2 * i + 1})")
    z = " | ".join(terms)
    return f"""
WITH zed AS (
  SELECT ({z}) AS z, user_id, event_id FROM events
)
SELECT (z >> 20) AS z_cell,
       COUNT(*) AS n,
       MIN(user_id) AS uid_min,
       MAX(user_id) AS uid_max,
       MIN(event_id) AS eid_min,
       MAX(event_id) AS eid_max
FROM zed
GROUP BY 1
ORDER BY z_cell
"""


EVENTS_ZORDER_STATS_SQL = _zorder_sql()
