"""Window/time-series operator suite vs the DuckDB oracle."""

import pytest

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import assert_matches_oracle

TIMESERIES = [
    "w1_lag_diff_timedelta",
    "w3_event_type_runs",
    "w6_spike_flags",
    "w7_deaccumulate",
    "w8_long_run_flags",
    "w11_hourly_resample",
    "w12_hourly_grid_infill",
    "a2_group_iqr",
    "a3_histogram",
    "a4_frequent_bins",
    "a5_winsorized_climatology",
    "a8_daily_sums",
    "a9_weekly_median",
    "a12_cadence_mode",
    "a13_lag1_autocorr",
    "j6_nearest_neighbor_gap",
    "j3_keep_newer_union",
]


@pytest.mark.parametrize("name", TIMESERIES)
def test_timeseries_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


@pytest.mark.parametrize(
    "name",
    ["w6_spike_flags", "w8_long_run_flags", "j6_nearest_neighbor_gap"],
)
def test_flag_queries_nonempty(spark, name):
    """Flag-writers must flag something on the synthetic data, or the
    oracle comparison is vacuous."""
    from historical_obs_platform_spark.registry import QUERIES

    assert QUERIES[name](spark, "/root/testdata/sf0.01").count() > 0
