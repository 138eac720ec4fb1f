"""QAQC demo queries vs DuckDB oracle (driver-equivalent)."""

import pytest

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import assert_matches_oracle

NAMES = [
    "l1_supersaturation",
    "l6_world_record",
    "l5_calm_wind_dir",
    "p2_sentinel_normalization",
]


@pytest.mark.parametrize("name", NAMES)
def test_qaqc_demo_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


@pytest.mark.parametrize("name", NAMES[:3])
def test_flags_fire(spark, name):
    from historical_obs_platform_spark.registry import QUERIES
    import pyspark.sql.functions as F

    df = QUERIES[name](spark, "/root/testdata/sf0.01")
    flag_col = [c for c in df.columns if c.endswith("_eraqc")][0]
    n = df.where(F.col(flag_col).isNotNull()).count()
    assert n > 0, f"{name}: no flags fired — vacuous check"
