"""Shared pytest fixtures: one local SparkSession + a DuckDB oracle
comparator that mimics the driver's correctness gate (sort columns by
name, order-insensitive value compare)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from historical_obs_platform_spark.session import get_spark
from historical_obs_platform_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("hop-spark-tests")
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            if getattr(df[c].dt, "tz", None) is not None:
                df[c] = df[c].dt.tz_localize(None)
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v,
                na_action="ignore",
            )
    return df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")


def assert_matches_oracle(spark, oracle_con, name, sf_dir=SF_DIR, rel_tol=0.0):
    """Run a registered query + its oracle, compare like the driver."""
    from historical_obs_platform_spark.registry import ORACLES, QUERIES

    got = _canon(QUERIES[name](spark, sf_dir).toPandas())
    want = _canon(oracle_con.sql(ORACLES[name]).df())
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype(float).to_numpy()
            wa = w.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if math.isnan(x) and math.isnan(y):
                    continue
                ok = (
                    x == y
                    if rel_tol == 0.0
                    else math.isclose(x, y, rel_tol=rel_tol, abs_tol=1e-12)
                )
                assert ok, f"{name}.{c}[{i}]: {x!r} != {y!r}"
        else:
            pd.testing.assert_series_equal(
                g, w, check_names=False, check_dtype=False, obj=f"{name}.{c}"
            )
