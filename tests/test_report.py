"""Flag-rates report (qaqc_generate_flag_rates parity) vs the oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "report_flag_rates",
        "report_flag_rates_hourly",
        "chain_qaqc_merge_events",
        "chain_logic_hourly",
    ],
)
def test_oracle_match(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_rates_are_rates(spark):
    out = registry.QUERIES["report_flag_rates"](spark, SF_DIR)
    bad = out.where(
        (F.col("flag_rate") < 0) | (F.col("flag_rate") > 1)
    ).count()
    assert bad == 0
    # the chain flags tas on this input (world-record + streak +
    # spike), so the tas rate must be nonzero somewhere
    assert (
        out.where(
            (F.col("variable") == "tas") & (F.col("flag_rate") > 0)
        ).count()
        > 0
    )


def test_report_is_one_shuffle(spark):
    """The report must stay a single station-keyed aggregation over
    the flagged table — the unpivot adds no exchange."""
    from historical_obs_platform_spark.queries.chain_demo import (
        _chain_flagged,
        report_flag_rates,
    )

    flagged = _chain_flagged(spark, SF_DIR)
    # count exchanges downstream of the (checkpointed) flagged scan
    plan = (
        report_flag_rates(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1, plan


def test_station_coverage_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "report_station_coverage")


def test_station_coverage_bounds(spark):
    out = registry.QUERIES["report_station_coverage"](spark, SF_DIR)
    rows = out.collect()
    assert rows, "coverage report is empty"
    for r in rows:
        # an hour with >=1 obs can never exceed the month's hours
        assert 0 < r["n_hours"] <= r["expected_hours"]
        assert 0 < r["coverage_ppm"] <= 1_000_000
        assert r["n_obs"] >= r["n_hours"]
        # expected_hours is a whole number of 24-hour days, 28..31
        assert r["expected_hours"] % 24 == 0
        assert 28 <= r["expected_hours"] // 24 <= 31
