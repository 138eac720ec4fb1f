"""Salted join / two-phase agg must be result-identical to the plain
forms on a corpus with one dominant key."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark.operators.skew import (
    salted_count_agg,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows on one hot station
    rows = [("HOT" if i % 10 else "S%d" % i, float(i % 7)) for i in range(2000)]
    big = spark.createDataFrame(rows, "station string, v double")
    dim = spark.createDataFrame(
        [("HOT", 1), ("S10", 2), ("S20", 3)], "station string, grp int"
    )
    return big, dim


def test_salted_join_matches_plain(spark, skewed):
    big, dim = skewed
    plain = big.join(dim, "station").orderBy("station", "v", "grp")
    salted = salted_join(big, dim, "station", n_salt=4).orderBy(
        "station", "v", "grp"
    )
    assert [tuple(r) for r in plain.collect()] == [
        tuple(r) for r in salted.collect()
    ]


def test_salted_count_matches_plain(spark, skewed):
    big, _ = skewed
    plain = {
        r.station: r.n
        for r in big.groupBy("station")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {r.station: r.n for r in salted_count_agg(big, "station").collect()}
    assert plain == salted
