"""Streaming sketch accumulation: per-micro-batch CMS partial grids,
merged, must equal the batch-mode grid — the mergeability law under
Structured Streaming's foreachBatch, which is what makes "keep a
frequency sketch continuously up to date" a per-batch append instead
of a re-scan of history."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.analytics.cms import cms_grid


def test_streaming_cms_partials_equal_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    grids = str(tmp_path / "grids")
    # 3 files → availableNow processes them (micro-batch boundaries
    # are Spark's choice; mergeability must hold for ANY split).
    for i in range(3):
        spark.range(i * 1000, (i + 1) * 1000).select(
            (F.col("id") % 137).alias("k")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("k long").parquet(src)

    def write_partial(batch_df, batch_id):
        cms_grid(batch_df).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{grids}/batch_id={batch_id}")

    q = (
        stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = (
        spark.read.parquet(grids)
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    direct = cms_grid(
        spark.range(0, 3000).select((F.col("id") % 137).alias("k"))
    )
    sym_diff = merged.exceptAll(direct).count() + direct.exceptAll(merged).count()
    assert sym_diff == 0
