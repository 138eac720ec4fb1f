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
from ..streaming.stateful import gap_detect_stream


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


# The stateful stream is oracle-checkable: state carries the last-seen
# timestamp across micro-batches, so the emitted gap set equals a
# batch lag() over the full history. Both sides floor ns -> us first
# (epoch_us / timestamp_micros) so the diff arithmetic is identical.
ST_GAP_ORACLE = """
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS station, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
         ) AS prev
  FROM events
)
SELECT station,
       make_timestamp(prev) AS gap_start,
       make_timestamp(us) AS gap_end,
       CAST((us - prev + 86400000000 - 1) // 86400000000 - 1
            AS INTEGER) AS n_missing
FROM t
WHERE us - prev > 86400000000
"""


@query("st_gap_detect_stream", ST_GAP_ORACLE)
def st_gap_detect_stream(spark, sf_dir):
    """Stateful streaming gap detection (rows-only): per-user cadence
    gaps over the events stream via ``applyInPandasWithState`` — the
    last-seen timestamp survives micro-batch boundaries, so gaps that
    straddle batches are still reported (SURVEY.md §2.9 grid-infill
    analog; see ``streaming/stateful.py``)."""
    tune(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    src = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    obs = src.select(
        F.col("user_id").cast("string").alias("station"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("time"),
    )
    out = gap_detect_stream(obs, cadence_seconds=86400)
    q = (
        out.writeStream.format("memory")
        .queryName("st_gap_detect")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_gap_detect")
