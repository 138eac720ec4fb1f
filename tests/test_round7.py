"""Round-7 wave tests: degenerate-input hardening for the new
two-sample / k-sample statistics (a35-a38 must emit typed NULLs on
BOTH engines — empty corpora, single groups, constant values — never
NaN or an ANSI divide-by-zero raise), cross-engine checks for the
Poisson bootstrap, SAX motifs and peak prominence on pathological
series, the reservoir merge-equivalence proof, and structural
invariants for the new graph queries.

Each degenerate case writes a tiny synthetic corpus and runs the
REGISTERED query against its REGISTERED oracle through the
driver-style comparator, so the NULL semantics are cross-engine
verified, not just asserted Spark-side (the test_hardening_r6
pattern).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from historical_obs_platform_spark import registry

from .conftest import SF_SMALL, assert_matches_oracle

registry.load_all()

_TS0 = dt.datetime(2024, 1, 1)


def _write_events(path, rows, minutes_scale=1):
    """rows: list of (event_id, minutes, user_id, event_type, value)."""
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [
                _TS0 + dt.timedelta(minutes=r[1] * minutes_scale)
                for r in rows
            ],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}" for _ in rows],
        }
    ).to_parquet(f"{path}/events.parquet", index=False)


def _check(spark, tmp, name, tables=("events",)):
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
# a35_welch_ttest
# ------------------------------------------------------------------ #
def test_a35_single_row_groups_null_stats(spark, tmp_path):
    _write_events(
        tmp_path,
        [(1, 1, 1, "click", 3.0), (2, 2, 2, "view", 5.0)],
    )
    out = _check(spark, tmp_path, "a35_welch_ttest")
    row = out.iloc[0]
    assert int(row.n_a) == 1 and int(row.n_b) == 1
    assert row.mean_a == 3.0 and row.mean_b == 5.0
    assert pd.isna(row.var_a) and pd.isna(row.var_b)
    assert pd.isna(row.t_stat) and pd.isna(row.df_welch)


def test_a35_empty_corpus_all_null(spark, tmp_path):
    _write_events(tmp_path, [(1, 1, 1, "signup", 1.0)])
    out = _check(spark, tmp_path, "a35_welch_ttest")
    row = out.iloc[0]
    assert int(row.n_a) == 0 and int(row.n_b) == 0
    assert pd.isna(row.mean_a) and pd.isna(row.t_stat)


def test_a35_constant_values_null_t(spark, tmp_path):
    _write_events(
        tmp_path,
        [
            (1, 1, 1, "click", 7.0),
            (2, 2, 2, "click", 7.0),
            (3, 3, 3, "view", 7.0),
            (4, 4, 4, "view", 7.0),
        ],
    )
    out = _check(spark, tmp_path, "a35_welch_ttest")
    row = out.iloc[0]
    assert row.var_a == 0.0 and row.var_b == 0.0
    assert pd.isna(row.t_stat) and pd.isna(row.df_welch)


# ------------------------------------------------------------------ #
# a36_mann_whitney
# ------------------------------------------------------------------ #
def test_a36_one_group_nulls(spark, tmp_path):
    _write_events(
        tmp_path, [(i, i, i, "click", float(i)) for i in range(1, 4)]
    )
    out = _check(spark, tmp_path, "a36_mann_whitney")
    row = out.iloc[0]
    assert int(row.n_a) == 3 and int(row.n_b) == 0
    assert pd.isna(row.u_stat) and pd.isna(row.z)


def test_a36_constant_values_null_z(spark, tmp_path):
    _write_events(
        tmp_path,
        [
            (1, 1, 1, "click", 2.0),
            (2, 2, 2, "click", 2.0),
            (3, 3, 3, "view", 2.0),
        ],
    )
    out = _check(spark, tmp_path, "a36_mann_whitney")
    row = out.iloc[0]
    # all-tied sample: U defined (= n1*n2/2), z undefined (sigma = 0)
    assert row.u_stat == 1.0
    assert pd.isna(row.z)


def test_a36_exact_u_small_sample(spark, tmp_path):
    # A = {1, 2}, B = {3}: all of B above all of A -> U1 = 0
    _write_events(
        tmp_path,
        [
            (1, 1, 1, "click", 1.0),
            (2, 2, 2, "click", 2.0),
            (3, 3, 3, "view", 3.0),
        ],
    )
    out = _check(spark, tmp_path, "a36_mann_whitney")
    assert out.iloc[0].u_stat == 0.0


# ------------------------------------------------------------------ #
# a37_levene_bf
# ------------------------------------------------------------------ #
def test_a37_single_group_null_w(spark, tmp_path):
    _write_events(
        tmp_path, [(i, i, i, "view", float(i)) for i in range(1, 5)]
    )
    out = _check(spark, tmp_path, "a37_levene_bf")
    row = out.iloc[0]
    assert int(row.k) == 1 and pd.isna(row.w_stat)


def test_a37_constant_groups_null_w(spark, tmp_path):
    _write_events(
        tmp_path,
        [
            (1, 1, 1, "click", 4.0),
            (2, 2, 2, "click", 4.0),
            (3, 3, 3, "view", 9.0),
            (4, 4, 4, "view", 9.0),
        ],
    )
    out = _check(spark, tmp_path, "a37_levene_bf")
    row = out.iloc[0]
    # every |x - median| is 0 -> within_ss = 0 -> W undefined
    assert int(row.k) == 2 and pd.isna(row.w_stat)


def test_a37_empty_corpus(spark, tmp_path):
    _write_events(tmp_path, [(1, 1, 1, "view", None)])
    out = _check(spark, tmp_path, "a37_levene_bf")
    row = out.iloc[0]
    assert int(row.k) == 0 and pd.isna(row.w_stat)


# ------------------------------------------------------------------ #
# a38_effect_sizes
# ------------------------------------------------------------------ #
def test_a38_tiny_groups_null_d(spark, tmp_path):
    _write_events(
        tmp_path,
        [(1, 1, 1, "click", 1.0), (2, 2, 2, "view", 2.0)],
    )
    out = _check(spark, tmp_path, "a38_effect_sizes")
    assert len(out) == 1
    row = out.iloc[0]
    assert pd.isna(row.cohens_d) and pd.isna(row.hedges_g)
    assert row.mean_a == 1.0 and row.mean_b == 2.0


def test_a38_constant_equal_groups_null_d(spark, tmp_path):
    _write_events(
        tmp_path,
        [
            (1, 1, 1, "click", 5.0),
            (2, 2, 2, "click", 5.0),
            (3, 3, 3, "view", 5.0),
            (4, 4, 4, "view", 5.0),
        ],
    )
    out = _check(spark, tmp_path, "a38_effect_sizes")
    row = out.iloc[0]
    assert pd.isna(row.cohens_d)  # pooled variance 0


# ------------------------------------------------------------------ #
# a39_bootstrap_ci
# ------------------------------------------------------------------ #
def test_a39_interval_brackets_and_orders(spark):
    out = registry.QUERIES["a39_bootstrap_ci"](
        spark, SF_SMALL
    ).toPandas()
    assert len(out) == 5
    assert (out.boot_lo <= out.boot_hi).all()
    assert (out.n_reps == 24).all()
    # the point estimate should sit inside (or at) the band on this
    # non-degenerate corpus
    assert (
        (out["mean"] >= out.boot_lo - 1e-9)
        & (out["mean"] <= out.boot_hi + 1e-9)
    ).all()


def test_a39_tiny_corpus_cross_engine(spark, tmp_path):
    _write_events(
        tmp_path,
        [(i, i, i % 2, "click", float(i % 7)) for i in range(1, 40)],
    )
    out = _check(spark, tmp_path, "a39_bootstrap_ci")
    assert len(out) == 1
    assert out.iloc[0].boot_lo <= out.iloc[0].boot_hi


# ------------------------------------------------------------------ #
# w29_sax_motifs / w30_peak_prominence
# ------------------------------------------------------------------ #
def test_w29_constant_series_empty(spark, tmp_path):
    # one event per hour, identical counts -> zero variance -> no
    # symbols -> empty result on BOTH engines (no div-zero raise)
    _write_events(
        tmp_path,
        [(i, i, 1, "view", 1.0) for i in range(48)],
        minutes_scale=60,
    )
    out = _check(spark, tmp_path, "w29_sax_motifs")
    assert len(out) == 0


def test_w29_words_are_wellformed(spark):
    out = registry.QUERIES["w29_sax_motifs"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert len(out) > 0
    assert out.word.str.len().eq(6).all()
    assert out.word.str.fullmatch("[abcd]{6}").all()
    # counts sorted with the rank
    assert (out.sort_values("rnk").n_windows.diff().dropna() <= 0).all()


def test_w30_flat_series_no_peaks(spark, tmp_path):
    _write_events(
        tmp_path,
        [(i, i, 1, "view", 1.0) for i in range(24)],
        minutes_scale=60,
    )
    out = _check(spark, tmp_path, "w30_peak_prominence")
    assert len(out) == 0


def test_w30_planted_peak_found(spark, tmp_path):
    # hour 10 gets 5 events, every other hour 1 -> single peak,
    # score 4
    rows, eid = [], 0
    for h in range(24):
        for _ in range(5 if h == 10 else 1):
            eid += 1
            rows.append((eid, h, 1, "view", 1.0))
    _write_events(tmp_path, rows, minutes_scale=60)
    out = _check(spark, tmp_path, "w30_peak_prominence")
    assert len(out) == 1
    assert int(out.iloc[0].score) == 4 and int(out.iloc[0].cnt) == 5


# ------------------------------------------------------------------ #
# sk_reservoir_merge
# ------------------------------------------------------------------ #
def test_reservoir_merge_equals_direct(spark):
    """The merge proof in-engine: per-shard top-k then global top-k
    must equal the direct global top-k (bottom-k sketch property)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from historical_obs_platform_spark.queries.common import table

    merged = registry.QUERIES["sk_reservoir_merge"](
        spark, SF_SMALL
    ).toPandas()
    ev = table(spark, SF_SMALL, "events").select(
        "event_id", F.md5(F.col("event_id").cast("string")).alias("h")
    )
    direct = (
        ev.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy("h", "event_id")),
        )
        .where(F.col("rnk") <= 64)
        .select("rnk", "event_id", "h")
        .toPandas()
    )
    lhs = merged.sort_values("rnk").reset_index(drop=True)
    rhs = direct.sort_values("rnk").reset_index(drop=True)
    assert lhs.event_id.tolist() == rhs.event_id.tolist()
    assert lhs.h.tolist() == rhs.h.tolist()


# ------------------------------------------------------------------ #
# graph wave invariants
# ------------------------------------------------------------------ #
def test_modularity_bounds_and_fold(spark):
    out = registry.QUERIES["g_modularity"](
        spark, SF_SMALL
    ).toPandas()
    assert len(out) > 0
    q = out.q_total.iloc[0]
    assert (out.q_total == q).all()
    assert -1.0 <= q <= 1.0
    # contributions re-sum to the folded total (round-6 tolerance)
    assert abs(out.q_contrib.sum() - q) < 5e-5
    # degree identity: sum of community degrees = 2m = sum over both
    # endpoint tags of every edge
    assert out.d_tot.sum() % 2 == 0


def test_hits_ranks_and_monotonic_scores(spark):
    out = registry.QUERIES["g_hits_fixed"](spark, SF_SMALL).toPandas()
    for side in ("authority", "hub"):
        part = out[out.node_type == side].sort_values("rnk")
        assert len(part) == 10
        assert (part.score.diff().dropna() <= 0).all()
        assert (part.score > 0).all()


def test_resource_allocation_scores_positive_ordered(spark):
    out = registry.QUERIES["g_resource_allocation"](
        spark, SF_SMALL
    ).toPandas()
    assert len(out) == 20
    assert (out.node_a < out.node_b).all()
    assert (out.ra_e12 > 0).all()
    assert (out.sort_values("ra_e12", ascending=False).ra_e12.values
            == out.ra_e12.sort_values(ascending=False).values).all()
    # RA can never exceed the common-neighbor count (each term <= 1)
    assert (out.ra_score <= out.n_common + 1e-9).all()


# ------------------------------------------------------------------ #
# wave 2: quota sample / k-fold / PMI / nprobe curve
# ------------------------------------------------------------------ #
def test_quota_allocation_sums_to_k(spark):
    out = registry.QUERIES["p_quota_sample"](spark, SF_SMALL).toPandas()
    assert out.alloc.sum() == 120  # Hamilton apportionment is exact
    # proportionality: alloc within 1 seat of the exact quota
    n = out.n_docs.sum()
    for _, r in out.iterrows():
        exact = 120 * r.n_docs / n
        assert abs(r.alloc - exact) < 1.0


def test_quota_degenerate_single_source(spark, tmp_path):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a", "b", "c"],
            "lang": ["en"] * 3,
            "source": ["web"] * 3,
        }
    ).assign(n_chars=1).to_parquet(
        f"{tmp_path}/documents.parquet", index=False
    )
    out = _check(spark, tmp_path, "p_quota_sample", ["documents"])
    # budget larger than the corpus: every doc picked, alloc = k
    # is capped by... (alloc may exceed n_docs; picks cap at n_docs)
    assert len(out) == 1
    assert out.iloc[0].alloc == 120
    assert out.iloc[0].picked_id_sum == 1 + 2 + 3


def test_kfold_users_exclusive_and_balanced(spark):
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.queries.common import table

    out = registry.QUERIES["p_kfold_assign"](spark, SF_SMALL).toPandas()
    assert sorted(out.fold.tolist()) == [0, 1, 2, 3, 4]
    assert out.share_ppm.sum() <= 1_000_000  # floor-div shares
    # exclusivity: users counted once across folds = distinct users
    ev = table(spark, SF_SMALL, "events").where(
        F.col("value").isNotNull()
    )
    n_users = ev.select("user_id").distinct().count()
    assert out.n_users.sum() == n_users


def test_pmi_contract_and_symmetry(spark):
    out = registry.QUERIES["t_cooccur_pmi"](spark, SF_SMALL).toPandas()
    assert len(out) > 0
    # canonical unordered pairs; a == b is a legitimate
    # self-collocation (a token repeated within the window)
    assert (out.tok_a <= out.tok_b).all()
    assert (out.n_pair >= 5).all()
    # ranks align with pmi descending
    s = out.sort_values("rnk")
    assert (s.pmi.diff().dropna() <= 1e-12).all()


def test_ivf_nprobe_curve_monotone(spark):
    out = (
        registry.QUERIES["s_ivf_nprobe_curve"](spark, SF_SMALL)
        .toPandas()
        .sort_values("nprobe")
    )
    assert out.nprobe.tolist() == [1, 2, 4, 8]
    # recall is monotone in nprobe: more probed cells can only add
    # candidates (same build, same scoring)
    assert (out.recall.diff().dropna() >= -1e-12).all()
    assert (out.n_truth == out.n_truth.iloc[0]).all()


# ------------------------------------------------------------------ #
# wave 3: pacf / seasonal strength / lcc / heaps / cohort ltv
# ------------------------------------------------------------------ #
def test_pacf_lag1_equals_acf1(spark):
    out = registry.QUERIES["w31_pacf"](spark, SF_SMALL).toPandas()
    assert len(out) == 3
    r = out.set_index("lag")
    assert r.loc[1].acf == r.loc[1].pacf  # Durbin-Levinson level 1
    assert (out.acf.abs() <= 1.0 + 1e-9).all()


def test_seasonal_strength_bounds(spark):
    out = registry.QUERIES["w32_seasonal_strength"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    row = out.iloc[0]
    assert 0.0 <= row.f_seasonal <= 1.0
    assert 0.0 <= row.f_trend <= 1.0


def test_w32_constant_series_nulls(spark, tmp_path):
    # constant hourly counts: detrended/seasadj variance 0 -> NULLs
    _write_events(
        tmp_path,
        [(i, i, 1, "view", 1.0) for i in range(60)],
        minutes_scale=60,
    )
    out = _check(spark, tmp_path, "w32_seasonal_strength")
    row = out.iloc[0]
    assert pd.isna(row.f_seasonal) and pd.isna(row.f_trend)


def test_lcc_bounds_and_planted_triangle(spark):
    out = registry.QUERIES["g_local_clustering"](
        spark, SF_SMALL
    ).toPandas()
    assert len(out) > 0
    assert (out.lcc_ppm <= 1_000_000).all()
    assert (out.lcc_ppm >= 0).all()
    assert (out.degree >= 2).all()
    # clustering identity: t <= d(d-1)/2
    assert (
        out.n_triangles <= out.degree * (out.degree - 1) / 2
    ).all()


def test_heaps_monotone_and_beta_range(spark):
    out = (
        registry.QUERIES["t_heaps_law"](spark, SF_SMALL)
        .toPandas()
        .sort_values("i")
    )
    assert len(out) == 8
    assert (out.n_tokens.diff().dropna() >= 0).all()
    assert (out.vocab.diff().dropna() >= 0).all()
    beta = out.beta.iloc[0]
    # tiny closed vocabulary: growth saturates, beta well below 1
    assert 0.0 <= beta < 1.0
    assert (out.beta == beta).all()


def test_cohort_ltv_first_offset_has_all_users(spark):
    out = registry.QUERIES["e_cohort_ltv"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert len(out) > 3  # a real matrix, not one cell
    assert (out.week_offset >= 0).all()
    assert (out.revenue > 0).all()
    # within a cohort, active buyers can never exceed the offset-0
    # cohort size
    for wk, g in out.groupby("cohort_week"):
        base = g[g.week_offset == 0].n_users.iloc[0]
        assert (g.n_users <= base).all()
