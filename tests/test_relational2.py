"""Second relational + timeseries wave vs the DuckDB oracle."""

import pytest

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import assert_matches_oracle

NAMES = [
    "q6_forecast_revenue",
    "q10_returned_revenue",
    "q14_promo_share",
    "q16_supplier_counts",
    "q18_large_orders",
    "w5_day_vector_repeats",
    "a10_p95_daily_outliers",
    "a11_record_length_gate",
    "w_session_agg",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


@pytest.mark.parametrize(
    "name",
    ["w5_day_vector_repeats", "a10_p95_daily_outliers", "a11_record_length_gate"],
)
def test_nonempty(spark, name):
    from historical_obs_platform_spark.registry import QUERIES

    assert QUERIES[name](spark, "/root/testdata/sf0.01").count() > 0
