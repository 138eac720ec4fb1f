"""Round-4 pipeline-engineering ops: matched-control sampling, join
cardinality estimation, embedding drift, Benford audit."""

from __future__ import annotations

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import assert_matches_oracle


def test_matched_control_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "p_matched_control")


def test_matched_control_respects_length_and_lang(spark):
    """Every matched control is from the pool, same lang, with
    n_chars <= the treatment doc (backward match)."""
    import pandas as pd
    from historical_obs_platform_spark.registry import QUERIES

    out = QUERIES["p_matched_control"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    matched = out.dropna(subset=["control_doc_id"])
    assert len(matched) > 0
    pool = docs.set_index("doc_id")
    for _, r in matched.iterrows():
        c = pool.loc[int(r["control_doc_id"])]
        assert c["source"] != "src0"
        assert c["lang"] == r["lang"]
        assert c["n_chars"] <= r["n_chars"] or (
            c["n_chars"] == r["n_chars"]
        )
        assert int(r["control_n_chars"]) == int(c["n_chars"])


def test_join_cardinality_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "o17_join_cardinality_est")


def test_join_cardinality_exact_is_true_join_size(spark):
    """exact_pairs equals the actual self-join row count, and the
    heavy-hitter estimator lands within 10% on this corpus."""
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    row = QUERIES["o17_join_cardinality_est"](spark, sf).collect()[0]
    li = table(spark, sf, "lineitem").select("l_partkey")
    true_size = li.alias("a").join(li.alias("b"), "l_partkey").count()
    assert row["exact_pairs"] == true_size
    assert abs(row["err_ppm"]) < 100000  # within 10%


def test_embed_drift_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_embed_drift")


def test_embed_drift_detects_planted_shift(spark):
    """Shifting one dimension of the odd shard must surface as the
    max abs_drift on exactly that dimension."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd
    from historical_obs_platform_spark.registry import QUERIES

    rng = np.random.RandomState(3)
    n, d = 400, 8
    X = rng.randn(n, d).astype(np.float32) * 0.1
    X[1::2, 4] += 2.0  # planted shift in dim index 4 (pos 5)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(X),
            "label": np.zeros(n, dtype=np.int32),
        }
    )
    tmp = tempfile.mkdtemp()
    df.to_parquet(os.path.join(tmp, "embeddings.parquet"))
    out = QUERIES["s_embed_drift"](spark, tmp).toPandas()
    top = out.sort_values("abs_drift", ascending=False).iloc[0]
    assert top["pos"] == 5
    assert top["abs_drift"] > 1.5


def test_benford_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "a17_benford_audit")


def test_benford_shares_sum_and_reference_constants(spark):
    from historical_obs_platform_spark.queries.curation5 import (
        _BENFORD_PPM,
    )
    from historical_obs_platform_spark.registry import QUERIES

    df = QUERIES["a17_benford_audit"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert sorted(df["digit"]) == list(range(1, 10))
    # floor-ppm shares sum to within 9 ulps of 1e6
    assert 1000000 - 9 <= df["share_ppm"].sum() <= 1000000
    assert (
        df.set_index("digit")["benford_ppm"].to_dict() == _BENFORD_PPM
    )
    assert (
        df["dev_ppm"] == df["share_ppm"] - df["benford_ppm"]
    ).all()


def test_winnow_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "t_winnow_fingerprints")


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Two docs sharing a run of >= k+w-1 = 6 tokens must share at
    least one fingerprint (the winnowing guarantee); disjoint docs
    share none."""
    import os
    import tempfile

    import pandas as pd
    from historical_obs_platform_spark.registry import QUERIES
    from historical_obs_platform_spark.queries.curation5 import (
        WINNOW_ORACLE,
    )
    import duckdb

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, f"intro words here {shared} tail one two", "en", "s", 1),
        (1, f"completely different head {shared} other ending", "en", "s", 1),
        (2, "nothing in common with them at all whatsoever", "en", "s", 1),
    ]
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    tmp = tempfile.mkdtemp()
    df.to_parquet(os.path.join(tmp, "documents.parquet"))
    # fingerprint SETS via the oracle definition (exact), per doc
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(tmp, 'documents.parquet')}'"
    )
    sets = {}
    inner = WINNOW_ORACLE.replace(
        "SELECT doc_id,\n       CAST(count(DISTINCT fp) AS BIGINT) AS n_fp,\n"
        "       CAST(sum(DISTINCT fp) AS BIGINT) AS fp_checksum\n"
        "FROM winmin GROUP BY doc_id",
        "SELECT DISTINCT doc_id, fp FROM winmin",
    )
    for r in con.sql(inner).fetchall():
        sets.setdefault(r[0], set()).add(r[1])
    assert sets[0] & sets[1], "shared 6-token run must share a fp"
    assert not (sets[0] & sets[2])
    # and the Spark side agrees with the oracle on this corpus
    got = (
        QUERIES["t_winnow_fingerprints"](spark, tmp)
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[0, "n_fp"] == len(sets[0])
    assert got.loc[1, "fp_checksum"] == sum(sets[1])


def test_layout_pruning_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "o18_layout_pruning_stats")


def test_layout_pruning_zorder_prunes_better(spark):
    """On a corpus whose natural order is uncorrelated with the probe
    column, z-order file ranges must touch fewer files per probe."""
    from historical_obs_platform_spark.registry import QUERIES

    df = (
        QUERIES["o18_layout_pruning_stats"](
            spark, "/root/testdata/sf0.01"
        )
        .toPandas()
        .set_index("layout")
    )
    assert df.loc["zorder", "avg_files_scanned"] < (
        df.loc["natural", "avg_files_scanned"]
    )
    assert (df["n_files"] <= 32).all()


def test_ngram_novelty_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "t_ngram_novelty")


def test_ngram_novelty_planted_extremes(spark):
    """A doc duplicated verbatim has zero novelty; a doc with unique
    vocabulary has full novelty."""
    import os
    import tempfile

    import pandas as pd
    from historical_obs_platform_spark.registry import QUERIES

    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s", 1),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 1),
        (2, "zyx wvu tsr qpo nml kji hgf", "en", "s", 1),
    ]
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    tmp = tempfile.mkdtemp()
    df.to_parquet(os.path.join(tmp, "documents.parquet"))
    out = (
        QUERIES["t_ngram_novelty"](spark, tmp)
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "novelty_ppm"] == 0
    assert out.loc[1, "novelty_ppm"] == 0
    assert out.loc[2, "novelty_ppm"] == 1000000


def test_training_set_chain_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "chain_training_set")


def test_training_set_chain_consistent_with_parts(spark):
    """The chain's totals must reconcile with its subsystems: split
    totals are a subset of p_leakage_safe_split's doc counts, and
    every (split, source) row only counts pass_all survivors."""
    from historical_obs_platform_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    chain = QUERIES["chain_training_set"](spark, sf).toPandas()
    split_full = (
        QUERIES["p_leakage_safe_split"](spark, sf)
        .toPandas()
        .set_index("split")["n_docs"]
    )
    per_split = chain.groupby("split")["n_docs"].sum()
    for s, n in per_split.items():
        assert n <= split_full[s]
    assert set(chain["split"]) <= {"train", "val", "test"}
    assert (chain["n_tokens"] >= 50 * chain["n_docs"]).all()  # gate floor


def test_minhash_estimate_error_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "d_minhash_estimate_error")


def test_minhash_estimate_is_calibrated(spark):
    """Over LSH candidates (planted near-dups, true J ~ 0.9+), the
    16-hash estimate must track exact Jaccard: mean error well under
    one hash quantum (62500 ppm) x 2 and means within one quantum."""
    from historical_obs_platform_spark.registry import QUERIES

    row = (
        QUERIES["d_minhash_estimate_error"](
            spark, "/root/testdata/sf0.001"
        )
        .collect()[0]
        .asDict()
    )
    assert row["n_pairs"] > 0
    assert row["mean_abs_err_ppm"] < 125000
    assert abs(row["mean_est_ppm"] - row["mean_true_ppm"]) < 62500


def test_stats_maintenance_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "o20_stats_maintenance")


def test_stats_maintenance_merge_is_exact(spark):
    """Merged base+delta stats must equal full-scan stats exactly
    (decimal sums — no float drift)."""
    from historical_obs_platform_spark.registry import QUERIES

    df = QUERIES["o20_stats_maintenance"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert (df["matches_full"] == 1).all()
    assert set(df["col"]) == {"l_quantity", "l_extendedprice"}
