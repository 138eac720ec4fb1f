"""Round-5 hardening: the Holt fold's time-major vectorization must be
BIT-identical to the explicit scalar recurrence, and the k-center
coreset's storage rotation must keep live persisted block sets O(1)
in k (not the O(k) lazy-localCheckpoint chain it replaces)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql

from historical_obs_platform_spark.queries.timeseries2 import (
    _holt_per_bucket,
)


def _holt_scalar(vals):
    lvl, trd = vals[0], 0.0
    for x in vals[1:]:
        new_l = (x + (lvl + trd)) / 2
        trd = ((new_l - lvl) + trd) / 2
        lvl = new_l
    return lvl, trd


def test_holt_vectorized_bit_identical_to_fold():
    rng = np.random.default_rng(20260815)
    for trial in range(15):
        n_users = int(rng.integers(1, 40))
        rows = []
        for u in range(n_users):
            n = int(rng.integers(1, 200))
            scale = 10.0 ** float(rng.integers(-8, 9))
            vals = rng.standard_normal(n) * scale
            for i, v in enumerate(vals):
                rows.append((u, i, float(v)))
        pdf = pd.DataFrame(rows, columns=["user_id", "us", "value"])
        pdf["__b"] = 0
        # shuffle row order: the implementation must sort internally
        pdf = pdf.sample(frac=1.0, random_state=trial).reset_index(
            drop=True
        )
        got = (
            _holt_per_bucket(pdf)
            .sort_values("user_id", ignore_index=True)
        )
        for _, row in got.iterrows():
            vals = (
                pdf[pdf["user_id"] == row["user_id"]]
                .sort_values(["us", "value"], kind="mergesort")["value"]
                .to_list()
            )
            lvl, trd = _holt_scalar(vals)
            assert row["n_obs"] == len(vals)
            assert row["level"] == lvl, (row["user_id"], row["level"], lvl)
            assert row["trend"] == trd, (row["user_id"], row["trend"], trd)


def test_holt_empty_bucket():
    pdf = pd.DataFrame(
        {"user_id": pd.Series(dtype="int64"),
         "us": pd.Series(dtype="int64"),
         "value": pd.Series(dtype="float64"),
         "__b": pd.Series(dtype="int64")}
    )
    out = _holt_per_bucket(pdf)
    assert len(out) == 0
    assert list(out.columns) == ["user_id", "n_obs", "level", "trend"]


def test_q9_quantizer_cross_engine_bit_parity():
    """The w13 stage-boundary quantizer rint(x*1e9)/1e9 must be
    reproduced bit-for-bit by DuckDB's round_even(x*1e9, 0)/1e9 over
    the magnitudes the pipeline produces (|x| <= ~1e3), including
    adversarial near-boundary values."""
    import duckdb

    con = duckdb.connect()
    rng = np.random.default_rng(20260815)
    xs = np.concatenate(
        [
            rng.uniform(-1000, 1000, 100000),
            rng.uniform(-1, 1, 100000),
            rng.uniform(-500, 500, 50000).round(4) + 5e-10,
        ]
    )
    df = pd.DataFrame({"x": xs})
    got = (
        con.execute(
            "SELECT round_even(x * 1000000000.0, 0) / 1000000000.0 FROM df"
        )
        .df()
        .iloc[:, 0]
        .to_numpy()
    )
    want = np.rint(xs * 1e9) / 1e9
    assert (got == want).all()
    con.close()


def test_bigint_to_double_digit_split_matches_python_float():
    """_bigint_to_double's base-2^62 digit split must equal the same
    expression in SQL (HUGEINT→DOUBLE casts are NOT correctly rounded
    in DuckDB, which is why the split exists)."""
    import random

    import duckdb

    from historical_obs_platform_spark.operators.distribution import (
        _bigint_to_double,
    )

    con = duckdb.connect()
    rng = random.Random(20260815)
    for _ in range(2000):
        v = rng.getrandbits(rng.randint(40, 80))
        got = con.execute(
            "SELECT CAST(CAST(? AS HUGEINT) // 4611686018427387904 "
            "AS DOUBLE) * 4611686018427387904.0 "
            "+ CAST(CAST(? AS HUGEINT) % 4611686018427387904 AS DOUBLE)",
            [str(v), str(v)],
        ).fetchone()[0]
        assert got == _bigint_to_double(v), v
    con.close()


def test_engine_is_launch_directory_independent(tmp_path):
    """VERDICT r4 'What's wrong #4': the pandas-UDF islands pickle
    module-level functions by reference, so a driver process launched
    OUTSIDE the repo (scratch cwd, no PYTHONPATH) used to fail with
    ModuleNotFoundError in the workers. session.ship_package
    (addPyFile of the package zip) must make this work."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "probe.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {repo!r})\n"
        "from historical_obs_platform_spark.session import get_spark\n"
        "from historical_obs_platform_spark import registry\n"
        "registry.load_all()\n"
        "spark = get_spark('launchdir-probe')\n"
        # applyInPandas island (module-level fn pickled by reference)
        "n = registry.QUERIES['w23_holt_smoothing'](\n"
        "    spark, '/root/testdata/sf0.001').count()\n"
        "assert n > 0, n\n"
        # mapInPandas multimodal decode island\n
        "m = registry.QUERIES['m_ppm_decode_stats'](\n"
        "    spark, '/root/testdata/sf0.001').count()\n"
        "assert m > 0, m\n"
        "print('LAUNCHDIR-OK')\n"
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "LAUNCHDIR-OK" in out.stdout, (out.stdout[-2000:], out.stderr[-2000:])


def test_coreset_live_persisted_blocks_bounded(spark, monkeypatch):
    """p_coreset_kcenter must never hold more than 2 persisted
    DataFrames at once (the round being read + the round being built),
    and must free everything before returning."""
    from historical_obs_platform_spark.queries.scaleops import (
        p_coreset_kcenter,
    )

    live: set[int] = set()
    peak = {"v": 0}
    orig_persist = pyspark.sql.DataFrame.persist
    orig_unpersist = pyspark.sql.DataFrame.unpersist

    def persist(self, *a, **kw):
        live.add(id(self))
        peak["v"] = max(peak["v"], len(live))
        return orig_persist(self, *a, **kw)

    def unpersist(self, *a, **kw):
        live.discard(id(self))
        return orig_unpersist(self, *a, **kw)

    monkeypatch.setattr(pyspark.sql.DataFrame, "persist", persist)
    monkeypatch.setattr(pyspark.sql.DataFrame, "unpersist", unpersist)

    out = p_coreset_kcenter(spark, "/root/testdata/sf0.001").collect()
    assert len(out) >= 1
    assert peak["v"] <= 2, f"held {peak['v']} persisted sets at once"
    assert live == set(), "persisted blocks leaked past the query"


def test_kalman_vectorized_bit_identical_to_scalar_fold():
    """w24's time-major Kalman must equal the per-user scalar
    recurrence bit-for-bit (same IEEE expression tree)."""
    from historical_obs_platform_spark.queries.timeseries2 import (
        _kalman_per_bucket,
    )

    rng = np.random.default_rng(20260815)
    for trial in range(10):
        rows = []
        n_users = int(rng.integers(1, 30))
        for u in range(n_users):
            n = int(rng.integers(1, 150))
            vals = rng.standard_normal(n) * (
                10.0 ** float(rng.integers(-6, 7))
            )
            for i, v in enumerate(vals):
                rows.append((u, i, float(v)))
        pdf = pd.DataFrame(rows, columns=["user_id", "us", "value"])
        pdf["__b"] = 0
        pdf = pdf.sample(frac=1.0, random_state=trial).reset_index(
            drop=True
        )
        got = _kalman_per_bucket(pdf).set_index("user_id")
        for u in range(n_users):
            vals = (
                pdf[pdf["user_id"] == u]
                .sort_values(["us", "value"], kind="mergesort")["value"]
                .to_list()
            )
            x, p = vals[0], 1.0
            for z in vals[1:]:
                p_pred = p + 0.1
                k = p_pred / (p_pred + 1.0)
                x = x + k * (z - x)
                p = (1.0 - k) * p_pred
            assert got.loc[u, "state"] == x
            assert got.loc[u, "variance"] == p
            assert got.loc[u, "n_obs"] == len(vals)


def test_benford_identities(spark):
    from historical_obs_platform_spark import registry

    registry.load_all()
    rows = registry.QUERIES["a30_benford_chi2"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_total"] > 0
    assert r["chi2"] >= 0.0
    assert r["reject_05"] == (r["chi2"] > 15.50731305586545)
