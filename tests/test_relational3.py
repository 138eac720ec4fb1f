"""Third relational wave (remaining TPC-H shapes, grouping sets,
range-frame rolling window) vs the DuckDB oracle."""

import pytest

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import assert_matches_oracle

NAMES = [
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_value_concentration",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q20_part_shippers",
    "q21_sole_returner",
    "q22_dormant_customers",
    "rollup_revenue_levels",
    "cube_order_stats",
    "w_rolling_24h",
    "w_rolling_median",
    "unpivot_event_counts",
    "o10_snapshot_diff",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


@pytest.mark.parametrize("name", NAMES)
def test_nonempty(spark, name):
    from historical_obs_platform_spark.registry import QUERIES

    assert QUERIES[name](spark, "/root/testdata/sf0.01").count() > 0


def test_incremental_rollup_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "o8_incremental_rollup")
