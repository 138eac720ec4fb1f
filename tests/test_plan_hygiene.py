"""Physical-plan regression guards: pushdown, pruning, and broadcast
must survive refactors (the properties the 100 TB plan relies on)."""

import pytest

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import SF_DIR


def _formatted(df) -> str:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q1_filter_pushdown_and_pruning(spark):
    plan = _formatted(registry.QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the referenced lineitem columns are read
    assert "l_comment" not in plan and "l_partkey" not in plan


def test_q5_all_dims_broadcast(spark):
    plan = _formatted(registry.QUERIES["q5_regional_revenue"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_q10_selective_filter_reaches_scan(spark):
    plan = _formatted(registry.QUERIES["q10_returned_revenue"](spark, SF_DIR))
    assert "EqualTo(l_returnflag,R)" in plan
