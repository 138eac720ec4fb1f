"""The >MAX_LOCAL_CELLS distributed-centroid regime (r7 brief #2).

The IVF family's production contract is "grow ``n_cells`` with the
corpus" (√N cells at N vectors); past ``MAX_LOCAL_CELLS`` the
driver-local collect-and-kernel form hands over to the distributed
form (broadcast crossJoin + struct-max assignment, lineage Lloyd
refinement). These tests shrink the threshold and prove the two
regimes are VALUE-IDENTICAL on the same inputs — centroids,
assignments, and the column-preserving ``attach_cells`` variant —
so the handover can never change results, only plans.
"""

from __future__ import annotations

import pytest

from historical_obs_platform_spark.operators import similarity as SIM
from historical_obs_platform_spark.queries.common import table

from .conftest import SF_SMALL


def _corpus(spark, n=60):
    return (
        table(spark, SF_SMALL, "embeddings")
        .orderBy("vec_id")
        .limit(n)
    )


def _cents_both(spark, n_cells, iters, monkeypatch):
    corpus = _corpus(spark)
    local = {
        r["cell"]: r["__cent"]
        for r in SIM.ivf_centroids(
            corpus, n_cells=n_cells, iters=iters
        ).collect()
    }
    monkeypatch.setattr(SIM, "MAX_LOCAL_CELLS", n_cells - 1)
    dist = {
        r["cell"]: r["__cent"]
        for r in SIM.ivf_centroids(
            corpus, n_cells=n_cells, iters=iters
        ).collect()
    }
    return local, dist


@pytest.mark.parametrize("iters", [1, 2])
def test_ivf_centroids_distributed_equals_local(spark, monkeypatch, iters):
    local, dist = _cents_both(spark, 8, iters, monkeypatch)
    assert set(local) == set(dist) and len(local) == 8
    for cell in local:
        a, b = local[cell], dist[cell]
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert x == pytest.approx(y, abs=1e-12)


def test_assign_cells_distributed_equals_local(spark, monkeypatch):
    corpus = _corpus(spark)
    from pyspark.sql import functions as F

    vecs = corpus.select(
        F.col("vec_id").alias("__id"),
        SIM._unit(SIM.as_double_array("embedding")).alias("__uv"),
    )
    cent = SIM.ivf_centroids(corpus, n_cells=8, iters=1)
    local = {
        r["__id"]: r["cell"]
        for r in SIM._assign_cells(vecs, cent, "__id").collect()
    }
    monkeypatch.setattr(SIM, "MAX_LOCAL_CELLS", 4)
    dist = {
        r["__id"]: r["cell"]
        for r in SIM._assign_cells(vecs, cent, "__id").collect()
    }
    assert local == dist and len(local) == 60


def test_attach_cells_distributed_equals_local(spark, monkeypatch):
    corpus = _corpus(spark)
    from pyspark.sql import functions as F

    vecs = corpus.select(
        "vec_id",
        SIM._unit(SIM.as_double_array("embedding")).alias("__uv"),
    )
    cent = SIM.ivf_centroids(corpus, n_cells=8, iters=1)
    local = {
        r["vec_id"]: r["cell"]
        for r in SIM.attach_cells(vecs, cent).collect()
    }
    monkeypatch.setattr(SIM, "MAX_LOCAL_CELLS", 4)
    dist = {
        r["vec_id"]: r["cell"]
        for r in SIM.attach_cells(vecs, cent).collect()
    }
    assert local == dist and len(local) == 60


def test_distributed_centroids_stay_a_lineage(spark, monkeypatch):
    """The >MAX_LOCAL_CELLS build must NOT collect the corpus: its
    result is a DataFrame lineage (no createDataFrame of driver rows),
    so a 10^6-cell build never materializes on the driver."""
    monkeypatch.setattr(SIM, "MAX_LOCAL_CELLS", 4)
    cent = SIM.ivf_centroids(_corpus(spark), n_cells=8, iters=1)
    plan = cent._jdf.queryExecution().logical().toString()
    assert "LocalRelation" not in plan.split("\n")[0]
