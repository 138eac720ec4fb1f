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


# ------------------------------------------------------- J9: asof join
def test_asof_join_matches_duckdb_native(spark, oracle_con):
    from historical_obs_platform_spark import registry

    registry.load_all()
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "j9_asof_join")


def test_asof_join_semantics(spark):
    import pandas as pd

    from historical_obs_platform_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "station": ["A", "A", "A", "B"],
                "time": pd.to_datetime(
                    ["2020-01-01 00:30", "2020-01-01 02:00",
                     "2020-01-05 00:00", "2020-01-01 01:00"]
                ),
                "obs": [1.0, 2.0, 3.0, 4.0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "station": ["A", "A", "B"],
                "time": pd.to_datetime(
                    ["2020-01-01 00:00", "2020-01-01 01:30",
                     "2020-01-02 00:00"]
                ),
                "value": [10.0, 20.0, 30.0],
            }
        )
    )
    got = (
        asof_join(left, right, value_cols=("value",),
                  tolerance_seconds=86400)
        .toPandas()
        .sort_values(["station", "time"])
    )
    # A@00:30 -> 10 (00:00); A@02:00 -> 20 (01:30);
    # A@01-05 -> beyond 1-day tolerance -> null;
    # B@01:00 -> no right row at or before -> null
    assert list(got.value_asof.fillna(-1)) == [10.0, 20.0, -1, -1]


def test_asof_join_plans_without_join(spark, oracle_con):
    """The union-window decomposition must not plan any join operator
    — one exchange on the key, not a range join."""
    from historical_obs_platform_spark import registry

    registry.load_all()
    from .conftest import SF_DIR

    df = registry.QUERIES["j9_asof_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in ("SortMergeJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan
