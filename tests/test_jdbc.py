"""JDBC source/sink via the embedded Derby driver that ships with
Spark — S5 exercised for real, no external database needed."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.sources.readers import (
    DERBY_DRIVER,
    read_jdbc,
    write_jdbc,
)
from data_frame_demo_etl_spark.template_config import TemplateConfig

PROPS = {"driver": DERBY_DRIVER}


def _url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_roundtrip_table(spark, tmp_path):
    url = _url(tmp_path)
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None), (3, "c", -0.125)], "k long, s string, v double"
    )
    write_jdbc(df, url, "t_rt", PROPS)
    back = read_jdbc(spark, TemplateConfig(source_type="sql", sql_table="t_rt"), url, PROPS)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert dict(back.dtypes) == {"k": "bigint", "s": "string", "v": "double"}


def test_jdbc_query_pushdown(spark, tmp_path):
    """sql_query runs ON the database — only matching rows cross the
    wire (the predicate-pushdown story for warehouse pulls)."""
    url = _url(tmp_path)
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_jdbc(df, url, "t_q", PROPS)
    # Spark's JDBC writer quotes column names, so Derby stores them
    # lowercase; quote them in the pushdown query too.
    tpl = TemplateConfig(
        source_type="sql", sql_query='SELECT "k", "v" FROM t_q WHERE "k" < 10'
    )
    back = read_jdbc(spark, tpl, url, PROPS)
    assert back.count() == 10
    assert back.agg(F.max("k")).first()[0] == 9


def test_jdbc_partitioned_read_parallelism(spark, tmp_path):
    """partitionColumn/numPartitions splits the pull into parallel
    range queries: N non-empty Spark partitions, same total rows."""
    url = _url(tmp_path)
    df = spark.range(1000).select(F.col("id").alias("k"), F.lit("x").alias("s"))
    write_jdbc(df, url, "t_p", PROPS)
    back = read_jdbc(
        spark,
        TemplateConfig(source_type="sql", sql_table="t_p"),
        url,
        PROPS,
        partition_options={
            "partitionColumn": "k",
            "lowerBound": 0,
            "upperBound": 999,
            "numPartitions": 4,
        },
    )
    assert back.rdd.getNumPartitions() == 4
    sizes = back.withColumn("p", F.spark_partition_id()).groupBy("p").count().collect()
    assert sum(r["count"] for r in sizes) == 1000
    assert len(sizes) == 4 and all(r["count"] > 0 for r in sizes)


def test_jdbc_requires_url_and_source(spark):
    import pytest

    with pytest.raises(ValueError, match="connection URL"):
        read_jdbc(spark, TemplateConfig(source_type="sql", sql_table="t"))
    with pytest.raises(ValueError, match="sql_table or sql_query"):
        read_jdbc(spark, TemplateConfig(source_type="sql"), "jdbc:derby:memory:x", PROPS)
    with pytest.raises(ValueError, match="partitioned"):
        read_jdbc(
            spark,
            TemplateConfig(source_type="sql", sql_query="SELECT 1"),
            "jdbc:derby:memory:x",
            PROPS,
            partition_options={"numPartitions": 2},
        )
