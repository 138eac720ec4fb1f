"""Bucketed stage layout: station-keyed aggregation and co-located
joins must plan with no Exchange (shuffle-free at any scale)."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from historical_obs_platform_spark.plans.clean import write_bucketed_stage


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    times = pd.date_range("2020-01-01", periods=200, freq="h")
    pdf = pd.DataFrame(
        {
            "station": ["S%02d" % (i % 8) for i in range(200)],
            "time": times,
            "tas": [280.0 + i % 13 for i in range(200)],
        }
    )
    df = spark.createDataFrame(pdf)
    write_bucketed_stage(df, "obs_a", path=str(base / "a"), n_buckets=8)
    write_bucketed_stage(df, "obs_b", path=str(base / "b"), n_buckets=8)
    yield "obs_a", "obs_b"
    spark.sql("DROP TABLE IF EXISTS obs_a")
    spark.sql("DROP TABLE IF EXISTS obs_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_station_agg_no_shuffle(spark, bucketed_tables):
    a, _ = bucketed_tables
    agg = spark.table(a).groupBy("station").agg(F.avg("tas"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def test_colocated_join_no_shuffle(spark, bucketed_tables):
    # force sort-merge (broadcast would win at this size) to show the
    # scale path: bucket-local SMJ, no shuffle of either side
    a, b = bucketed_tables
    j = spark.table(a).hint("merge").join(spark.table(b), "station")
    plan = _plan(j)
    assert "SortMergeJoin" in plan, plan
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_roundtrip_values(spark, bucketed_tables):
    a, _ = bucketed_tables
    got = spark.table(a).agg(F.count("*"), F.sum("tas")).collect()[0]
    assert got[0] == 200
