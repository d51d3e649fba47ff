"""Table catalog over the parquet star schema.

Reads are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown / column pruning / partition pruning on every query. Dim
tables are flagged so join builders can ``broadcast()`` them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcastable (≤ low MBs even at huge
# scale factors; region/nation are constant-size).
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    base = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, base)
    return spark.read.parquet(f"{base}/{name}.parquet")


def _load_events(spark: SparkSession, base: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
    parquet reader rejects by default. Read nanos as long and convert
    to a microsecond timestamp with integer division (a double divide
    would lose precision at 1e18 nanos)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{base}/events.parquet")
    # Re-written copies (e.g. scaled test datasets) already carry a
    # proper TIMESTAMP ts; only the original NANOS files read as long.
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # TIMESTAMP_NTZ generations: normalize to TIMESTAMP_LTZ so the
    # same column feeds streaming watermarks (which reject NTZ) and
    # epoch arithmetic. Session tz is pinned UTC, so wall-clock values
    # — and toPandas/DuckDB comparisons — are unchanged.
    if dict(df.dtypes)["ts"] == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view for spark.sql usage."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
