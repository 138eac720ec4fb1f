"""Relational operator suite vs the DuckDB oracle (driver-equivalent
comparison at sf0.01)."""

import pytest

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import assert_matches_oracle

RELATIONAL = [
    "q1_pricing_summary",
    "j1_dim_enrich",
    "q5_regional_revenue",
    "q3_shipping_priority",
    "j5_semi_membership",
    "o4_anti_membership",
    "o2_dedup_first",
    "o7_keep_latest",
    "o3_union_distinct",
    "topk_per_group",
    "pivot_linestatus",
    "a6_rollup_counts",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    # the minimum end-to-end pipeline slice (chain_min_slice_hourly)
    assert {"station", "time", "tas_eraqc", "standardized_infill"} <= set(
        df.columns
    )


def test_every_query_has_oracle_or_is_registered(spark):
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= len(RELATIONAL)
