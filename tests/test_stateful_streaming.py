"""applyInPandasWithState operators: per-station state must survive
micro-batch boundaries, so the source is forced to two batches
(maxFilesPerTrigger=1, two files with ordered mtimes)."""

import os
import time

import pandas as pd
import pytest

from historical_obs_platform_spark.streaming.stateful import (
    gap_detect_stream,
    value_runs_stream,
)


@pytest.fixture(scope="module")
def two_batch_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stateful_src")
    # batch 1: hourly obs 00..03 with a 3h in-batch gap (03 -> 06),
    # then 06, 07. value runs: 5.0 x4 then 9.0 x2.
    b1 = pd.DataFrame(
        {
            "station": ["S1"] * 6,
            "time": pd.to_datetime(
                [
                    "2021-01-01 00:00",
                    "2021-01-01 01:00",
                    "2021-01-01 02:00",
                    "2021-01-01 03:00",
                    "2021-01-01 06:00",
                    "2021-01-01 07:00",
                ]
            ),
            "value": [5.0, 5.0, 5.0, 5.0, 9.0, 9.0],
        }
    )
    # batch 2: resumes 4h after batch 1 ended (cross-batch gap
    # 07 -> 11); value 9.0 continues the open run, then changes.
    b2 = pd.DataFrame(
        {
            "station": ["S1"] * 3,
            "time": pd.to_datetime(
                ["2021-01-01 11:00", "2021-01-01 12:00", "2021-01-01 13:00"]
            ),
            "value": [9.0, 9.0, 4.0],
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.mode("overwrite").parquet(
        str(root / "f1")
    )
    time.sleep(1.1)
    spark.createDataFrame(b2).coalesce(1).write.mode("overwrite").parquet(
        str(root / "f2")
    )
    # file source orders by modification time; make it unambiguous
    now = time.time()
    for i, d in enumerate(["f1", "f2"]):
        for f in os.listdir(root / d):
            os.utime(root / d / f, (now + i, now + i))
    return str(root)


def _drain(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def _source(spark, path):
    schema = spark.read.parquet(f"{path}/f1").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/f*/")
    )


def test_gap_detect_crosses_batches(spark, two_batch_dir):
    src = _source(spark, two_batch_dir)
    _drain(gap_detect_stream(src, cadence_seconds=3600), "gaps_out")
    got = (
        spark.sql("SELECT * FROM gaps_out")
        .toPandas()
        .sort_values("gap_start", ignore_index=True)
    )
    assert len(got) == 2
    # in-batch gap 03 -> 06: two missing hourly points (04, 05)
    assert str(got.loc[0, "gap_start"]) == "2021-01-01 03:00:00"
    assert str(got.loc[0, "gap_end"]) == "2021-01-01 06:00:00"
    assert got.loc[0, "n_missing"] == 2
    # cross-batch gap 07 -> 11 proves state carried the last timestamp
    assert str(got.loc[1, "gap_start"]) == "2021-01-01 07:00:00"
    assert str(got.loc[1, "gap_end"]) == "2021-01-01 11:00:00"
    assert got.loc[1, "n_missing"] == 3


def test_value_runs_cross_batch_continuation(spark, two_batch_dir):
    src = _source(spark, two_batch_dir)
    _drain(value_runs_stream(src), "runs_out")
    got = (
        spark.sql("SELECT * FROM runs_out")
        .toPandas()
        .sort_values("run_start", ignore_index=True)
    )
    # closed runs only: the 5.0 x4 run, and the 9.0 run that spans the
    # batch boundary (2 obs in batch 1 + 2 in batch 2 = 4). The final
    # 4.0 run is still open and must NOT be emitted.
    assert len(got) == 2
    assert got.loc[0, "run_value"] == 5.0
    assert got.loc[0, "n_obs"] == 4
    assert got.loc[1, "run_value"] == 9.0
    assert got.loc[1, "n_obs"] == 4
    assert str(got.loc[1, "run_start"]) == "2021-01-01 06:00:00"
    assert str(got.loc[1, "run_end"]) == "2021-01-01 12:00:00"


def test_deaccumulate_stream_matches_oracle(spark, oracle_con):
    from historical_obs_platform_spark import registry

    registry.load_all()
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "st_deaccumulate_stream")


def test_deaccumulate_tws_variant(spark, tmp_path):
    """transformWithStateInPandas variant — skipped where the Python
    worker lacks protobuf (STREAMING_PYTHON_RUNNER imports
    google.protobuf at init)."""
    pytest.importorskip("google.protobuf.descriptor")
    import pandas as pd

    from historical_obs_platform_spark.streaming.stateful import (
        deaccumulate_stream_tws,
    )

    src_dir = str(tmp_path / "twsrc")
    pdf = pd.DataFrame(
        {
            "station": ["A"] * 4,
            "time": pd.date_range("2020-01-01", periods=4, freq="1h"),
            "value": [1.0, 3.0, 6.0, 10.0],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = deaccumulate_stream_tws(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_tws_deacc")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_tws_deacc").toPandas().sort_values("time")
    assert list(got.incr.fillna(-1)) == [-1, 2.0, 3.0, 4.0]
