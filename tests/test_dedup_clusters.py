"""Connected-components dedup clustering: unit graph cases + the
driver query vs its recursive-CTE oracle."""

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import assert_matches_oracle


def test_connected_components_merges_chains(spark):
    from historical_obs_platform_spark.operators.dedup import (
        connected_components,
    )

    # two chains and one isolated pair:
    # {1-2-3-4}, {10-11}, {20-21-22} (third chain given out of order)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 22), (20, 21)],
        ["a", "b"],
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    want = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
    assert got == want


def test_dup_cluster_summary_counts(spark):
    from historical_obs_platform_spark.operators.dedup import (
        dup_cluster_summary,
    )

    pairs = spark.createDataFrame(
        [(5, 6), (6, 7), (30, 31)], ["a", "b"]
    )
    got = {
        (r["cluster_id"], r["n_members"])
        for r in dup_cluster_summary(pairs).collect()
    }
    assert got == {(5, 3), (30, 2)}


def test_d_dup_clusters_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "d_dup_clusters")


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """With a checkpoint dir configured the loop must use reliable
    checkpoints (cluster-safe: blocks survive executor loss) and still
    converge to the same labels."""
    from historical_obs_platform_spark.operators.dedup import (
        connected_components,
    )

    sc = spark.sparkContext
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["a", "b"]
        )
        got = {
            (r["node"], r["component"])
            for r in connected_components(pairs).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
        # reliable checkpoint files actually landed in the dir
        import os

        found = []
        for root, _dirs, files in os.walk(ckpt):
            found.extend(files)
        assert found, "no reliable checkpoint data written"
    finally:
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty()
        )


def test_neardup_removal_matches_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "chain_neardup_removal")


def test_neardup_removal_consistent_with_clusters(spark):
    """n_removed equals Σ (cluster size - 1) over the cluster
    summary — one survivor per component."""
    from historical_obs_platform_spark import registry

    from .conftest import SF_DIR

    registry.load_all()
    clusters = registry.QUERIES["d_dup_clusters"](spark, SF_DIR).collect()
    removal = registry.QUERIES["chain_neardup_removal"](
        spark, SF_DIR
    ).collect()[0]
    assert removal["n_removed"] == sum(
        r["n_members"] - 1 for r in clusters
    )
