"""Scale-path operators (queries/scaleops.py): oracle matches plus
plan-shape and accuracy-bound checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.operators import rangejoin as RJ
from historical_obs_platform_spark.operators import sketches as SK
from historical_obs_platform_spark.tables import load

registry.load_all()

from .conftest import SF_DIR, assert_matches_oracle

NAMES = [
    "j10_interval_join",
    "sk_grid_quantiles",
    "m_frame_sample",
    "o9_cascade_rollup",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_interval_join_plans_as_equi_join(spark):
    """The range join must decompose to a hash-partitionable
    equi-join — no nested-loop/cartesian operator in the plan."""
    ev = load(spark, SF_DIR, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.select("user_id", F.col("ts").alias("rts"))
    j = RJ.bucketed_interval_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="rts",
        window_us=3600_000_000,
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_matches_crossfilter(spark):
    """Bucketed decomposition == the naive range predicate."""
    ev = load(spark, SF_DIR, "events").limit(800).cache()
    left = ev.select("event_id", "user_id", "ts")
    right = ev.select(
        "user_id", F.col("event_id").alias("rid"), F.col("ts").alias("rts")
    )
    w = 1800_000_000
    got = RJ.bucketed_interval_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="rts",
        window_us=w,
    ).select("event_id", "rid")
    naive = (
        left.join(right, "user_id")
        .where(
            (F.unix_micros(F.col("rts").cast("timestamp"))
               >= F.unix_micros(F.col("ts").cast("timestamp")))
            & (F.unix_micros(F.col("rts").cast("timestamp"))
               < F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(w))
        )
        .select("event_id", "rid")
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    ev.unpersist()


def test_grid_quantile_within_one_cell(spark):
    """Each grid estimate is within one cell width of the exact
    interpolated percentile."""
    ev = load(spark, SF_DIR, "events")
    est = {
        r["q"]: r["est"]
        for r in SK.grid_quantiles(
            ev, "value", 0.0, 500.0, 256, (0.5, 0.9, 0.99)
        ).collect()
    }
    exact = ev.select(
        F.expr(
            "percentile(value, array(0.5, 0.9, 0.99))"
        ).alias("p")
    ).first()["p"]
    cell = 500.0 / 256
    for q, ex in zip((0.5, 0.9, 0.99), exact):
        assert abs(est[q] - ex) <= cell + 1e-9


def test_cascade_equals_direct(spark):
    """Monthly-from-daily-from-hourly == monthly-from-raw (decimal
    partials are associative)."""
    from historical_obs_platform_spark.queries.scaleops import (
        o9_cascade_rollup,
    )

    ev = load(spark, SF_DIR, "events")
    direct = ev.groupBy(
        "event_type", F.date_trunc("month", "ts").alias("mon")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value")
    )
    got = o9_cascade_rollup(spark, SF_DIR).select(
        "event_type", "mon", "total_value"
    )
    assert got.exceptAll(direct).count() == 0
    assert direct.exceptAll(got).count() == 0


def test_merge_changeset_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "o11_merge_changeset")


def test_merge_changeset_semantics(spark):
    from historical_obs_platform_spark.plans.incremental import (
        merge_changeset,
    )
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    chg = spark.createDataFrame(
        [(2, "B", "upsert"), (3, None, "delete"), (4, "d", "upsert")],
        "k long, v string, op string",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_changeset(base, chg, keys=("k",)).collect()
    }
    assert got == {1: "a", 2: "B", 4: "d"}


def test_radius_join_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "j12_radius_join")


def test_radius_join_no_cartesian(spark):
    from historical_obs_platform_spark import registry
    from .conftest import SF_DIR

    plan = (
        registry.QUERIES["j12_radius_join"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_radius_join_boundary_cells(spark):
    """Pairs straddling cell boundaries are found exactly once."""
    from historical_obs_platform_spark.operators.geo import radius_join

    pts = spark.createDataFrame(
        [
            (1, 0.49, 0.0),   # cell (0,0)
            (2, 0.51, 0.0),   # cell (1,0) — 0.02 apart across an edge
            (3, 5.0, 5.0),    # far away
        ],
        "id long, x double, y double",
    )
    got = radius_join(pts, "id", "x", "y", 0.5).collect()
    assert len(got) == 1
    assert (got[0]["a"], got[0]["b"]) == (1, 2)


def test_salted_join_matches_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "o5_salted_join")


def test_merge_changeset_dedupes_replayed_upserts(spark):
    """Two upserts for one key (a replayed changeset) must leave
    exactly ONE row for that key — never a duplicate-key base."""
    from historical_obs_platform_spark.plans.incremental import (
        merge_changeset,
    )

    base = spark.createDataFrame(
        [("s1", "t1", 1.0)], ["station", "time", "v"]
    )
    changes = spark.createDataFrame(
        [
            ("s1", "t1", 2.0, "upsert"),
            ("s1", "t1", 3.0, "upsert"),
            ("s2", "t1", 9.0, "upsert"),
        ],
        ["station", "time", "v", "op"],
    )
    out = merge_changeset(base, changes).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r["station"], r["time"]), []).append(r["v"])
    assert all(len(vs) == 1 for vs in by_key.values())
    # deterministic survivor: highest payload ordering wins
    assert by_key[("s1", "t1")] == [3.0]


def test_resize_plan_skips_null_content(spark):
    from historical_obs_platform_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None)],
        "media_id long, content binary",
    )
    rows = MM.resize_plan(
        media, decoder=MM.FakeDecoder()
    ).collect()
    assert [r["media_id"] for r in rows] == [1]
    assert all(r["width"] >= 0 for r in rows)


def test_bloom_build_rejects_mismatched_bits(spark):
    import pytest

    from historical_obs_platform_spark.operators.sketches import (
        bloom_build,
    )

    df = spark.range(3).selectExpr("cast(id as string) AS k")
    with pytest.raises(ValueError, match="n_bits"):
        bloom_build(df, "k", n_bits=1024)


def test_entity_link_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "j13_entity_link")


def test_entity_link_blocking_semantics(spark):
    """Pairs share their blocking token, distances respect the
    confirm band, and the pair table is canonical (a < b)."""
    from historical_obs_platform_spark.registry import QUERIES
    from .conftest import SF_DIR

    rows = QUERIES["j13_entity_link"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert 1 <= r["edit_dist"] <= 3
        assert r["name_a"].split(" ")[0] == r["name_b"].split(" ")[0]
        assert r["n_rows_a"] > 0 and r["n_rows_b"] > 0


class TestCoresetKCenter:
    def test_greedy_invariants(self, spark):
        from historical_obs_platform_spark.queries.scaleops import (
            p_coreset_kcenter,
        )

        out = (
            p_coreset_kcenter(spark, SF_DIR)
            .toPandas()
            .sort_values("round")
            .reset_index(drop=True)
        )
        assert len(out) == 8
        assert out.vec_id.nunique() == 8  # no re-selection
        assert out.loc[0, "round"] == 0 and out.loc[0, "mind_sq"] == 0
        # greedy k-center: the max-min distance is non-increasing
        d = list(out.mind_sq[1:])
        assert all(a >= b for a, b in zip(d, d[1:]))
        assert all(v > 0 for v in d)

    def test_short_corpus_degrades(self, spark, tmp_path):
        """Fewer embeddings than k: min(n, k) rows, like the oracle's
        emptying sel CTEs."""
        import pandas as pd
        from historical_obs_platform_spark.queries.scaleops import (
            p_coreset_kcenter,
        )

        pd.DataFrame(
            {
                "vec_id": [1, 2, 3],
                "embedding": [[0.1, 0.2], [0.9, 0.1], [0.5, 0.5]],
                "label": [0, 1, 0],
            }
        ).to_parquet(tmp_path / "embeddings.parquet")
        out = p_coreset_kcenter(spark, str(tmp_path)).toPandas()
        assert len(out) == 3
        assert sorted(out.vec_id) == [1, 2, 3]
