"""Deterministic sketches (KMV / HLL / count-min) vs the DuckDB
oracle, plus accuracy-bound and branch-coverage checks."""

import math

import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.operators import sketches as SK

registry.load_all()

from .conftest import SF_DIR, assert_matches_oracle

NAMES = [
    "sk_kmv_distinct",
    "sk_hll_distinct",
    "sk_cms_heavy_hitters",
    "sk_hll_union",
    "sk_cms_merge",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def _truth(spark, col, tbl="lineitem"):
    from historical_obs_platform_spark.queries.common import table

    return (
        table(spark, SF_DIR, tbl)
        .select(col)
        .distinct()
        .count()
    )


def test_kmv_within_theory_bound(spark):
    got = registry.QUERIES["sk_kmv_distinct"](spark, SF_DIR).toPandas()
    true = _truth(spark, "l_partkey")
    est = got.estimate[0]
    # KMV rel. std. error ~ 1/sqrt(k-2); allow 5 sigma
    assert abs(est - true) / true < 5 / math.sqrt(254)


def test_hll_within_theory_bound(spark):
    got = registry.QUERIES["sk_hll_distinct"](spark, SF_DIR).toPandas()
    true = _truth(spark, "l_orderkey")
    est = got.estimate[0]
    # HLL rel. std. error ~ 1.04/sqrt(m); allow 5 sigma
    assert abs(est - true) / true < 5 * 1.04 / math.sqrt(256)


def test_hll_linear_counting_branch(spark):
    """Tiny cardinality ⇒ most registers empty ⇒ the linear-counting
    correction fires and lands near the true count."""
    df = spark.range(30).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    got = SK.hll_distinct(df, "v").toPandas()
    assert got.v_empty[0] >= 220
    assert abs(got.estimate[0] - 30) <= 3


def test_kmv_small_exact(spark):
    """Fewer distinct values than k ⇒ the sketch degrades to the
    exact count."""
    df = spark.range(100).select((F.col("id") % 7).alias("v"))
    got = SK.kmv_distinct(df, "v", k=256).toPandas()
    assert got.estimate[0] == 7.0


def test_cms_never_undercounts(spark):
    got = registry.QUERIES["sk_cms_heavy_hitters"](spark, SF_DIR).toPandas()
    assert (got.cms_estimate >= got.exact_count).all()
    # d=4, w=512 on a tiny vocabulary: overestimates should be rare
    assert (got.cms_estimate == got.exact_count).mean() >= 0.8


def test_kmv_plans_take_ordered_not_full_sort(spark):
    """The k-smallest step must be TakeOrdered (bounded per-partition
    heaps), not a global Sort + Limit."""
    from historical_obs_platform_spark.queries.common import table

    li = table(spark, SF_DIR, "lineitem")
    plan = SK.kmv_distinct(li, "l_partkey")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bloom_semi_reduction_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "sk_bloom_semi_reduction")


def test_bloom_reduction_sandwich(spark):
    """Bloom pass-set must contain every true member (no false
    negatives) and the filter itself must be a one-row broadcast."""
    from historical_obs_platform_spark import registry
    from .conftest import SF_DIR

    row = (
        registry.QUERIES["sk_bloom_semi_reduction"](spark, SF_DIR)
        .collect()[0]
    )
    assert row["n_true_members"] <= row["n_bloom_pass"] <= row["n_big"]

    plan = (
        registry.QUERIES["sk_bloom_semi_reduction"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the probe side never shuffles on the join key: the bloom bits
    # arrive via broadcast, membership is a projection
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_cms_merge_equals_whole_corpus_sketch(spark):
    """Merged half-corpus tables probe identically to the whole-corpus
    sketch — counter addition is associative, so the estimates for
    the shared top tokens must be EQUAL, not merely close."""
    whole = {
        r["token"]: r["cms_estimate"]
        for r in registry.QUERIES["sk_cms_heavy_hitters"](
            spark, SF_DIR
        ).collect()
    }
    merged = {
        r["token"]: r["cms_merged"]
        for r in registry.QUERIES["sk_cms_merge"](
            spark, SF_DIR
        ).collect()
    }
    common = set(whole) & set(merged)
    assert len(common) >= 5
    for tok in common:
        assert whole[tok] == merged[tok]
