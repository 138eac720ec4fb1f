"""Round-6 degenerate-input hardening (r5 judge brief #3 + advisor
notes): the hypothesis-test statistics must emit typed NULLs — on BOTH
engines, with matching row counts — rather than NaN, div-zero, or a
row-count divergence, when fed corpora with:

- no rows at all (empty after the NULL filters),
- a single category on one contingency axis (a30: dof = 0),
- fewer than two groups (a32: k < 2),
- a constant value column (a32: tie_c = 0),
- an empty A/B variant (a33: user_id parity all one way).

Each case writes a tiny synthetic corpus and runs the REGISTERED query
against its REGISTERED oracle through the driver-style comparator, so
the NULL semantics themselves are cross-engine verified, not just
asserted on the Spark side.

Also covers the coded pandas_udf escape hatch (brief #5): the
``exact=False`` variants of t_js_divergence / a34_markov_entropy_rate
must reproduce exact mode to float tolerance with zero driver-side
contingency state.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.queries.curation7 import (
    a30_cramers_v,
    a34_markov_entropy_rate,
    t_js_divergence,
)
from historical_obs_platform_spark.queries.stats import (
    a32_kruskal_wallis,
    a33_ab_test_z,
)

from .conftest import SF_SMALL, assert_matches_oracle

registry.load_all()

_TS0 = dt.datetime(2024, 1, 1)


def _write_events(path, rows):
    """rows: list of (event_id, minutes, user_id, event_type, value)."""
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [_TS0 + dt.timedelta(minutes=r[1]) for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}" for _ in rows],
        }
    ).to_parquet(f"{path}/events.parquet", index=False)


def _write_documents(path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": [len(r[1] or "") for r in rows],
        }
    ).to_parquet(f"{path}/documents.parquet", index=False)


def _check(spark, tmp, name, tables):
    con = duckdb.connect()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet'"
        )
    try:
        assert_matches_oracle(spark, con, name, sf_dir=str(tmp))
    finally:
        con.close()
    return registry.QUERIES[name](spark, str(tmp)).toPandas()


# ------------------------------------------------------------------ #
# a30_cramers_v
# ------------------------------------------------------------------ #
def test_a30_single_source_nulls_v(spark, tmp_path):
    _write_documents(
        tmp_path,
        [(1, "aa", "en", "web"), (2, "bb", "zh", "web"), (3, "cc", "en", "web")],
    )
    out = _check(spark, tmp_path, "a30_cramers_v", ["documents"])
    row = out.iloc[0]
    assert int(row.n) == 3 and int(row.dof) == 0
    assert row.chi2 == 0.0
    assert pd.isna(row.cramers_v)


def test_a30_empty_corpus_nulls_all(spark, tmp_path):
    _write_documents(tmp_path, [(1, "aa", None, "web"), (2, "bb", "en", None)])
    out = _check(spark, tmp_path, "a30_cramers_v", ["documents"])
    row = out.iloc[0]
    assert int(row.n) == 0
    assert pd.isna(row.dof) and pd.isna(row.chi2) and pd.isna(row.cramers_v)


# ------------------------------------------------------------------ #
# a32_kruskal_wallis
# ------------------------------------------------------------------ #
def test_a32_single_group_nulls_stats(spark, tmp_path):
    _write_events(
        tmp_path,
        [(i, i, i % 3, "view", float(v)) for i, v in enumerate([1, 2, 2, 3])],
    )
    out = _check(spark, tmp_path, "a32_kruskal_wallis", ["events"])
    row = out.iloc[0]
    assert int(row.n) == 4 and int(row.k) == 1
    assert pd.isna(row.h) and pd.isna(row.tie_c) and pd.isna(row.h_adj)


def test_a32_constant_values_null_h_adj(spark, tmp_path):
    _write_events(
        tmp_path,
        [
            (1, 1, 1, "view", 5.0),
            (2, 2, 2, "view", 5.0),
            (3, 3, 3, "purchase", 5.0),
            (4, 4, 4, "purchase", 5.0),
        ],
    )
    out = _check(spark, tmp_path, "a32_kruskal_wallis", ["events"])
    row = out.iloc[0]
    assert int(row.k) == 2
    assert row.h == 0.0 and row.tie_c == 0.0
    assert pd.isna(row.h_adj)


def test_a32_empty_corpus_nulls_all(spark, tmp_path):
    _write_events(tmp_path, [(1, 1, 1, "view", None)])
    out = _check(spark, tmp_path, "a32_kruskal_wallis", ["events"])
    row = out.iloc[0]
    assert int(row.n) == 0 and int(row.k) == 0
    assert pd.isna(row.h) and pd.isna(row.tie_c) and pd.isna(row.h_adj)


# ------------------------------------------------------------------ #
# a33_ab_test_z
# ------------------------------------------------------------------ #
def test_a33_empty_variant_one_null_row(spark, tmp_path):
    # every user_id even -> variant 1 has no members
    _write_events(
        tmp_path,
        [
            (1, 1, 2, "view", 1.0),
            (2, 2, 2, "purchase", 1.0),
            (3, 3, 4, "purchase", 2.0),
        ],
    )
    out = _check(spark, tmp_path, "a33_ab_test_z", ["events"])
    assert len(out) == 1
    row = out.iloc[0]
    assert int(row.n_a) == 2 and int(row.n_b) == 0
    assert pd.isna(row.conv_b) and pd.isna(row.p_b) and pd.isna(row.z)
    assert row.p_a == 0.5


def test_a33_empty_corpus_one_null_row(spark, tmp_path):
    _write_events(tmp_path, [])
    out = _check(spark, tmp_path, "a33_ab_test_z", ["events"])
    assert len(out) == 1
    row = out.iloc[0]
    assert int(row.n_a) == 0 and int(row.n_b) == 0
    assert pd.isna(row.p_a) and pd.isna(row.p_b) and pd.isna(row.z)


# ------------------------------------------------------------------ #
# exact=False escape hatches (applyInPandas, no driver contingency)
# ------------------------------------------------------------------ #
def _tol_compare(exact_df, approx_df, keys, val_cols, tol=1e-9):
    e = exact_df.sort_values(keys, ignore_index=True)
    a = approx_df.sort_values(keys, ignore_index=True)
    assert len(e) == len(a)
    for k in keys:
        assert list(e[k]) == list(a[k])
    for c in val_cols:
        assert (e[c] - a[c]).abs().max() <= tol, c


def test_js_divergence_escape_matches_exact(spark):
    exact = t_js_divergence(spark, SF_SMALL, exact=True).toPandas()
    approx = t_js_divergence(spark, SF_SMALL, exact=False).toPandas()
    _tol_compare(exact, approx, ["source"], ["js"])
    assert list(exact.sort_values("source").n_tokens) == list(
        approx.sort_values("source").n_tokens
    )


def test_markov_entropy_escape_matches_exact(spark):
    exact = a34_markov_entropy_rate(spark, SF_SMALL, exact=True).toPandas()
    approx = a34_markov_entropy_rate(spark, SF_SMALL, exact=False).toPandas()
    _tol_compare(exact, approx, ["from_type"], ["h_nats"])
    assert list(exact.sort_values("from_type").n) == list(
        approx.sort_values("from_type").n
    )


# ------------------------------------------------------------------ #
# BPE trainer: persist rotation bounds live storage at O(1) in rounds
# (r5 brief #4 — the coreset discipline applied to the merge loop)
# ------------------------------------------------------------------ #
def test_bpe_live_persisted_blocks_bounded(spark, monkeypatch):
    import pyspark

    from historical_obs_platform_spark.queries.curation6 import (
        t_bpe_train_encode,
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

    out = t_bpe_train_encode(spark, SF_SMALL, rounds=8)
    assert peak["v"] <= 2, f"held {peak['v']} persisted corpora at once"
    assert live == set(), "persisted blocks leaked past the train loop"
    assert out.count() > 0


def test_bpe_rounds_parameterized_matches_oracle(spark):
    """A non-default merge count must still be hash-exact against a
    same-rounds DuckDB unroll (the rounds knob is real, not
    cosmetic)."""
    import duckdb

    from historical_obs_platform_spark.queries.curation6 import (
        _bpe_oracle,
        t_bpe_train_encode,
    )
    from historical_obs_platform_spark.tables import TABLE_NAMES

    got = (
        t_bpe_train_encode(spark, SF_SMALL, rounds=3)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{SF_SMALL}/documents.parquet'"
        )
        want = con.sql(_bpe_oracle(rounds=3)).df().sort_values(
            "doc_id", ignore_index=True
        )
    finally:
        con.close()
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.n_symbols) == list(want.n_symbols)
    assert list(got.encoded_md5) == list(want.encoded_md5)
