"""Per-network cleaner quirk tables (sources/networks.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark.registry import load_all
from historical_obs_platform_spark.sources.networks import (
    NETWORKS,
    clean_network,
)

from .conftest import assert_matches_oracle

load_all()

NETWORK_QUERIES = [
    "n_cimis_clean",
    "n_scansnotel_clean",
    "n_cw3e_clean",
    "n_maritime_clean",
    "n_valleywater_clean",
]


@pytest.mark.parametrize("name", NETWORK_QUERIES)
def test_network_roundtrip_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_absent_columns_are_skipped(spark):
    """Reference guards every variable with `if ... in ds.keys()` —
    a frame missing most raw columns must clean without error."""
    df = spark.createDataFrame(
        [("CI1", "2014-01-01 00:00:00", 12.5)],
        "station string, time string, `Air Temperature (C)` double",
    ).withColumn("time", F.to_timestamp("time"))
    out = clean_network(df, "CIMIS")
    row = out.collect()[0]
    assert row["tas"] == 12.5 + 273.15
    # PST -> UTC shift applied
    assert row["time"].hour == 8
    assert "hurs" not in out.columns


def test_period_filter_drops_out_of_window(spark):
    df = spark.createDataFrame(
        [("CW1", "1979-12-31 23:00:00", 1.0), ("CW1", "2014-06-01 00:00:00", 2.0)],
        "station string, time string, `Precipitation (mm)` double",
    ).withColumn("time", F.to_timestamp("time"))
    out = clean_network(df, "CW3E")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["pr"] == 2.0


def test_qc_columns_become_strings(spark):
    df = spark.createDataFrame(
        [("S1", "2014-01-01 00:00:00", 32.0, 3)],
        "station string, time string, TOBS_value double, TOBS_flag int",
    ).withColumn("time", F.to_timestamp("time"))
    out = clean_network(df, "SCANSNOTEL")
    assert dict(out.dtypes)["tas_qc"] == "string"
    row = out.collect()[0]
    assert row["tas"] == 273.15  # 32 F exactly freezing
    assert row["tas_qc"] == "3"


def test_specs_reference_known_conversions():
    from historical_obs_platform_spark.sources.networks import CONVERSIONS

    for spec in NETWORKS.values():
        for conv in spec.conversions.values():
            assert conv in CONVERSIONS, (spec.name, conv)


def test_cleaner_plan_is_shuffle_free(spark):
    """The whole cleaner must stay a projection + filter — no
    Exchange in the plan (it pipelines into the scan at any scale)."""
    df = spark.range(10).select(
        F.concat(F.lit("CI"), F.col("id").cast("string")).alias("station"),
        F.timestamp_seconds(F.lit(1400000000) + F.col("id")).alias("time"),
        F.col("id").cast("double").alias("Air Temperature (C)"),
        F.col("id").cast("double").alias("elevation"),
    )
    plan = clean_network(df, "CIMIS")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
