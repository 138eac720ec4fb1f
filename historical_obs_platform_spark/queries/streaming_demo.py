"""Structured Streaming surface through the driver gate (rows-only):
the hourly standardization rollup (W11 streaming analog, SURVEY.md
§2.9) executed as a real stream — parquet file source → watermarked
tumbling-window aggregation → memory sink, drained synchronously with
``processAllAvailable`` (the batch-on-stream pattern of
``Trigger.AvailableNow``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..session import tune
from ..streaming.hourly import hourly_standardize_stream


@query("st_hourly_rollup_stream")
def st_hourly_rollup_stream(spark, sf_dir):
    tune(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file source wants a directory or a glob; the wildcard makes
    # the single-file path a glob
    src = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    obs = src.select(
        F.col("user_id").cast("string").alias("station"),
        F.timestamp_micros(
            (F.col("ts") / 1000).cast("long")
        ).alias("time"),
        F.col("value").alias("tas"),
        (F.col("value") % 3.0).alias("pr"),
    )
    agg = hourly_standardize_stream(
        obs, first_cols=["tas"], sum_cols=["pr"]
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("st_hourly_rollup")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_hourly_rollup")
