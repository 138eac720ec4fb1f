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
