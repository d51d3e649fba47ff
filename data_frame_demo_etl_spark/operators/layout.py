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
