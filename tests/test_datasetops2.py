"""Batch-2 curation queries (queries/datasetops2.py) vs the DuckDB
oracle, plus invariants: LOCF semantics, MAD robustness, rarity
monotonicity, compaction bin sizing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.queries.common import table

registry.load_all()

from .conftest import SF_DIR, assert_matches_oracle

NAMES = [
    "w14_forward_fill",
    "w15_linear_interp",
    "w16_cusum_drift",
    "a14_mad_outliers",
    "t_rarity_score",
    "o12_compaction_plan",
    "o13_table_profile",
    "a16_moment_stats",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_forward_fill_semantics(spark):
    """Filled values equal the most recent non-null; leading nulls
    stay null; non-null rows pass through unchanged."""
    out = registry.QUERIES["w14_forward_fill"](spark, SF_DIR)
    assert (
        out.where(
            F.col("v_raw").isNotNull()
            & (F.col("v_ff") != F.col("v_raw"))
        ).count()
        == 0
    )
    assert (
        out.where(F.col("was_filled") & F.col("v_ff").isNull()).count()
        == 0
    )
    # at least one row actually got filled at this SF
    assert out.where("was_filled").count() > 0


def test_mad_results_sane(spark):
    rows = registry.QUERIES["a14_mad_outliers"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] <= r["n"]


def test_rarity_rare_tokens_score_higher(spark):
    """A doc made of rare tokens outscores a doc of common tokens:
    per-token weight floor(N/c) decreases with corpus frequency, so
    avg rarity correlates negatively with token commonness. Checked
    via the corpus itself: max per-token weight >= N / max(c)."""
    out = registry.QUERIES["t_rarity_score"](spark, SF_DIR)
    row = out.agg(
        F.max((F.col("rarity") / F.col("n_tokens"))).alias("mx"),
        F.min((F.col("rarity") / F.col("n_tokens"))).alias("mn"),
    ).collect()[0]
    assert row["mx"] > row["mn"] >= 1  # floor(N/c) >= 1 always


def test_compaction_bins_near_target(spark):
    """Every bin except possibly the last holds >= target rows (the
    greedy cumsum never closes a bin early) and bins partition the
    manifest."""
    from historical_obs_platform_spark.queries.datasetops2 import (
        _CP_TARGET,
    )

    rows = registry.QUERIES["o12_compaction_plan"](
        spark, SF_DIR
    ).orderBy("bin").collect()
    li_n = table(spark, SF_DIR, "lineitem").count()
    assert sum(r["n_rows"] for r in rows) == li_n
    for r in rows[:-1]:
        # a bin only closes once the cumulative sum crosses the
        # target, so all but the final bin reach it (give 1-file
        # slack: the crossing file lands in the next bin)
        assert r["n_rows"] + rows[rows.index(r) + 1]["n_rows"] >= (
            _CP_TARGET
        )


def test_audio_energy_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "m_audio_energy")


def test_audio_energy_frame_shapes(spark):
    """Only the final frame of a clip may be short of 160 samples,
    and energy is consistent with peak (peak^2 <= energy <=
    n * peak^2)."""
    out = registry.QUERIES["m_audio_energy"](spark, SF_DIR)
    from pyspark.sql import Window

    last = F.max("frame_idx").over(Window.partitionBy("media_id"))
    assert (
        out.withColumn("__last", last)
        .where(
            (F.col("n_samples") != 160)
            & (F.col("frame_idx") != F.col("__last"))
        )
        .count()
        == 0
    )
    assert (
        out.where(
            (F.col("peak") * F.col("peak") > F.col("energy"))
            | (
                F.col("energy")
                > F.col("n_samples") * F.col("peak") * F.col("peak")
            )
        ).count()
        == 0
    )


def test_equidepth_hist_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "a15_equidepth_hist")


def test_equidepth_buckets_balanced(spark):
    """Bucket sizes differ by at most 1 within each group and bucket
    ranges don't overlap (hi of bucket b <= lo of bucket b+1)."""
    rows = (
        registry.QUERIES["a15_equidepth_hist"](spark, SF_DIR)
        .orderBy("event_type", "bucket")
        .collect()
    )
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["event_type"], []).append(r)
    for grp in by_grp.values():
        sizes = [r["n_rows"] for r in grp]
        assert max(sizes) - min(sizes) <= 1
        for prev, nxt in zip(grp, grp[1:]):
            assert prev["hi"] <= nxt["lo"]


def test_bpe_pair_stats_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "t_bpe_pair_stats")


def test_bpe_pairs_are_bigrams(spark):
    rows = registry.QUERIES["t_bpe_pair_stats"](spark, SF_DIR).collect()
    assert len(rows) == 20
    assert all(len(r["pair"]) == 2 for r in rows)
    # counts are descending within the returned top-k
    ns = [r["n"] for r in sorted(rows, key=lambda r: -r["n"])]
    assert ns == sorted(ns, reverse=True)


def test_forward_fill_equals_pandas_ffill(spark):
    """The distributed LOCF is exactly pandas groupby().ffill() on
    the same null-injected frame — the semantic every data scientist
    assumes."""
    out = (
        registry.QUERIES["w14_forward_fill"](spark, SF_DIR)
        .orderBy("station", "time", "event_id")
        .toPandas()
    )
    pdf = out[["station", "time", "event_id", "v_raw"]].copy()
    expected = (
        pdf.sort_values(["station", "time", "event_id"])
        .groupby("station")["v_raw"]
        .ffill()
    )
    pd.testing.assert_series_equal(
        out["v_ff"], expected, check_names=False
    )


def test_linear_interp_bounds_and_identity(spark):
    """Interpolated values lie within [min, max] of the two anchor
    neighbors; non-null rows pass through unchanged."""
    out = registry.QUERIES["w15_linear_interp"](spark, SF_DIR)
    assert (
        out.where(
            F.col("v_raw").isNotNull()
            & (F.abs(F.col("v_interp") - F.col("v_raw")) > 1e-9)
        ).count()
        == 0
    )
    # pandas cross-check on one station
    pdf = (
        out.where(F.col("station") == out.select("station").first()[0])
        .orderBy("time", "event_id")
        .toPandas()
    )
    s = pdf.set_index(pd.RangeIndex(len(pdf)))["v_raw"]
    lo = s.ffill()
    hi = s.bfill()
    both = lo.notna() & hi.notna()
    assert (
        (
            pdf["v_interp"][both]
            >= pd.concat([lo, hi], axis=1).min(axis=1)[both] - 1e-9
        )
    ).all()
    assert (
        (
            pdf["v_interp"][both]
            <= pd.concat([lo, hi], axis=1).max(axis=1)[both] + 1e-9
        )
    ).all()


def test_cusum_nonnegative_and_bounded(spark):
    rows = registry.QUERIES["w16_cusum_drift"](spark, SF_DIR).collect()
    assert all(r["max_cusum"] >= 0 for r in rows)
    assert all(0 <= r["n_over_threshold"] <= r["n"] for r in rows)


def test_funnel_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "w17_funnel")


def test_funnel_monotone(spark):
    r = registry.QUERIES["w17_funnel"](spark, SF_DIR).collect()[0]
    assert (
        r["n_view"] >= r["n_click"] >= r["n_signup"] >= r["n_purchase"]
    )
    assert r["n_purchase"] < r["n_view"]  # the window actually filters


def test_retention_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "w18_retention")


def test_retention_week_zero_is_cohort_size(spark):
    """k=0 counts every cohort member (everyone is active in their
    own first week) and later weeks never exceed it."""
    rows = registry.QUERIES["w18_retention"](spark, SF_DIR).collect()
    base = {
        r["cohort_week"]: r["n_active"] for r in rows if r["k"] == 0
    }
    for r in rows:
        assert r["n_active"] <= base[r["cohort_week"]]


def test_moment_stats_match_numpy(spark):
    """Exact-sum moments equal numpy's population moments (rounded to
    the same 6 decimals)."""
    import numpy as np

    ev = (
        table(spark, SF_DIR, "events")
        .select("event_type", "value")
        .toPandas()
    )
    got = {
        r["event_type"]: r
        for r in registry.QUERIES["a16_moment_stats"](
            spark, SF_DIR
        ).collect()
    }
    for et, grp in ev.groupby("event_type"):
        # quantize to cents exactly like the query
        v = np.round(grp["value"].to_numpy() * 100).astype(np.int64) / 100.0
        mean = v.mean()
        var = ((v - mean) ** 2).mean()
        skew = ((v - mean) ** 3).mean() / var**1.5
        kurt = ((v - mean) ** 4).mean() / var**2
        assert abs(got[et]["mean"] - mean) < 1e-5
        assert abs(got[et]["variance"] - var) < 1e-4
        assert abs(got[et]["skewness"] - skew) < 1e-4
        assert abs(got[et]["kurtosis"] - kurt) < 1e-4


def test_o14_profile_hll_matches_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "o14_profile_hll")


def test_o14_profile_hll_error_bounds(spark):
    """256-register HLL should land within ~10% of exact on every
    column at test scale (theoretical sigma ~1.04/sqrt(256) = 6.5%)."""
    from historical_obs_platform_spark.registry import QUERIES
    from .conftest import SF_DIR

    pdf = QUERIES["o14_profile_hll"](spark, SF_DIR).toPandas()
    assert set(pdf["column_name"]) == {"user_id", "event_type", "value"}
    assert (pdf["rel_err"] <= 0.15).all(), pdf
    assert (pdf["exact_distinct"] > 0).all()


def test_contract_checks_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "o21_contract_checks")


def test_contract_checks_semantics(spark):
    """The suite runs in one scan, covers every declared constraint,
    and pass/fail reflects observed vs threshold exactly."""
    from historical_obs_platform_spark.registry import QUERIES
    from .conftest import SF_DIR

    pdf = QUERIES["o21_contract_checks"](spark, SF_DIR).toPandas()
    assert len(pdf) == 8
    # pass is exactly the threshold comparison
    assert (
        (pdf["pass"] == 1) == (pdf["observed_ppm"] <= pdf["threshold_ppm"])
    ).all(), pdf
    # only the deliberately tight range bound may fail
    failing = pdf[pdf["pass"] == 0]
    assert set(zip(failing["chk"], failing["col"])) <= {("range", "value")}
    assert (pdf["observed_ppm"] >= 0).all()
    assert (pdf["observed_ppm"] <= 1_000_000).all()
    # at sf0.1 the data exceeds the 500 bound, so the failing-line
    # path is exercised (max value 560.21 there; 490 at sf0.01)
    big = QUERIES["o21_contract_checks"](
        spark, "/root/testdata/sf0.1"
    ).toPandas()
    bad = big[big["pass"] == 0]
    assert set(zip(bad["chk"], bad["col"])) == {("range", "value")}


def test_ks_drift_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "a18_ks_drift")


def test_ks_drift_matches_bruteforce(spark):
    """The integer KS equals a direct pandas CDF computation, and a
    planted shift drives it toward 1e6 ppm."""
    import numpy as np
    import pandas as pd

    from historical_obs_platform_spark.registry import QUERIES
    from historical_obs_platform_spark.queries.common import table
    from .conftest import SF_DIR

    row = QUERIES["a18_ks_drift"](spark, SF_DIR).collect()[0]
    ev = (
        table(spark, SF_DIR, "events")
        .where(F.col("event_type").isin("click", "view"))
        .select("event_type", "value")
        .toPandas()
    )
    a = np.sort(ev[ev.event_type == "click"].value.values)
    b = np.sort(ev[ev.event_type == "view"].value.values)
    support = np.unique(np.concatenate([a, b]))
    cum_a = np.searchsorted(a, support, side="right").astype(np.int64)
    cum_b = np.searchsorted(b, support, side="right").astype(np.int64)
    scaled = np.abs(cum_a * len(b) - cum_b * len(a)).max()
    assert row["ks_scaled"] == scaled
    assert row["n_click"] == len(a) and row["n_view"] == len(b)
    assert row["ks_ppm"] == scaled * 1_000_000 // (len(a) * len(b))
    assert 0 <= row["ks_ppm"] <= 1_000_000
    # planted drift: compare the bottom half of click against the top
    # half of view — CDFs separate almost completely
    lo = np.sort(a[a <= np.median(a)])
    hi = np.sort(b[b >= np.median(b)])
    sup2 = np.unique(np.concatenate([lo, hi]))
    c1 = np.searchsorted(lo, sup2, side="right").astype(np.int64)
    c2 = np.searchsorted(hi, sup2, side="right").astype(np.int64)
    drift_ppm = (
        np.abs(c1 * len(hi) - c2 * len(lo)).max()
        * 1_000_000
        // (len(lo) * len(hi))
    )
    assert drift_ppm > 900_000 > row["ks_ppm"]


def test_psi_drift_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "a19_psi_drift")


def test_psi_drift_matches_numpy(spark):
    """PSI equals a direct numpy recompute (same bins, same smoothing,
    same bin-ordered fold) to the rounded precision, and is ~0 for
    the near-identical click/view split."""
    import numpy as np

    from historical_obs_platform_spark.registry import QUERIES
    from .conftest import SF_DIR

    row = QUERIES["a19_psi_drift"](spark, SF_DIR).collect()[0]
    ev = (
        table(spark, SF_DIR, "events")
        .where(F.col("event_type").isin("click", "view"))
        .select("event_type", "value")
        .toPandas()
    )
    a = ev[ev.event_type == "click"].value.values
    b = ev[ev.event_type == "view"].value.values
    bins = lambda x: np.minimum(np.floor(x / 30).astype(int), 19)
    na = np.bincount(bins(a), minlength=20).astype(np.int64)
    nb = np.bincount(bins(b), minlength=20).astype(np.int64)
    pa = (na + 1) / (len(a) + 20)
    pb = (nb + 1) / (len(b) + 20)
    psi = 0.0
    for i in range(20):  # bin-ordered fold, like both engines
        psi += (pa[i] - pb[i]) * np.log(pa[i] / pb[i])
    assert abs(row["psi"] - round(psi, 6)) <= 1e-6
    assert row["n_click"] == len(a) and row["n_view"] == len(b)
    assert 0 <= row["psi"] < 0.25  # far below the retrain threshold


def test_spearman_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "a20_spearman")


def test_spearman_matches_pandas(spark):
    """rho_ppm equals a direct pandas recompute with the identical
    deterministic tiebreak, and a perfectly monotone pair gives
    exactly 1e6 ppm."""
    import numpy as np

    from historical_obs_platform_spark.registry import QUERIES
    from historical_obs_platform_spark.functions.textfns import tokens
    from .conftest import SF_DIR

    rows = {
        r["lang"]: r
        for r in QUERIES["a20_spearman"](spark, SF_DIR).collect()
    }
    docs = (
        table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.size(F.array_distinct(tokens(F.col("text"))))
            .cast("long")
            .alias("vocab"),
        )
        .toPandas()
    )
    for lang, g in docs.groupby("lang"):
        g = g.reset_index(drop=True)
        rx = np.empty(len(g), dtype=np.int64)
        rx[np.lexsort((g.doc_id.values, g.n_chars.values))] = (
            np.arange(1, len(g) + 1)
        )
        ry = np.empty(len(g), dtype=np.int64)
        ry[np.lexsort((g.doc_id.values, g.vocab.values))] = (
            np.arange(1, len(g) + 1)
        )
        n = np.int64(len(g))
        sd2 = int(((rx - ry) ** 2).sum())
        den = int(n * (n * n - 1))
        expect = (den - 6 * sd2) * 1_000_000 // den
        r = rows[lang]
        assert (r["n"], r["sum_d2"], r["rho_ppm"]) == (len(g), sd2, expect)
        # rho bounded: identical ranks would give exactly 1e6 ppm
        assert -1_000_000 <= r["rho_ppm"] <= 1_000_000


def test_twa_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "a21_time_weighted_avg")


def test_twa_matches_pandas_and_bounds(spark):
    """The integer TWA equals a direct pandas left-step integration,
    and always lies within the day's [min, max] value range."""
    import numpy as np

    from historical_obs_platform_spark.registry import QUERIES
    from .conftest import SF_DIR

    out = {
        (r["station"], r["day"]): r
        for r in QUERIES["a21_time_weighted_avg"](spark, SF_DIR).collect()
    }
    ev = (
        table(spark, SF_DIR, "events")
        .select(
            F.col("user_id").cast("string").alias("station"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
            F.round(F.col("value") * 100).cast("long").alias("centi"),
            "event_id",
        )
        .toPandas()
    )
    checked = 0
    for (st, day), g in ev.groupby(["station", "day"]):
        if (st, day) not in out:
            continue
        g = g.sort_values(["t_us", "event_id"])
        t = g.t_us.values.astype(np.int64)
        c = g.centi.values.astype(np.int64)
        dt = np.diff(t)
        if dt.sum() <= 0:
            continue
        expect = int((c[:-1] * dt).sum()) // int(dt.sum())
        r = out[(st, day)]
        assert r["twa_centi"] == expect
        assert c.min() <= r["twa_centi"] <= c.max()
        checked += 1
        if checked >= 200:
            break
    assert checked >= 100


def test_m4_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "w20_m4_downsample")


def test_m4_invariants(spark):
    """M4 witnesses are consistent: min <= first/last <= max,
    t_first <= t_last, and single-point buckets collapse to one
    value; totals preserve the row count."""
    from historical_obs_platform_spark.registry import QUERIES
    from .conftest import SF_DIR

    out = QUERIES["w20_m4_downsample"](spark, SF_DIR)
    bad = out.where(
        (F.col("v_min") > F.col("v_max"))
        | (F.col("v_first") < F.col("v_min"))
        | (F.col("v_first") > F.col("v_max"))
        | (F.col("v_last") < F.col("v_min"))
        | (F.col("v_last") > F.col("v_max"))
        | (F.col("t_first_us") > F.col("t_last_us"))
    ).count()
    assert bad == 0
    singles = out.where(
        (F.col("n") == 1)
        & (
            (F.col("v_first") != F.col("v_last"))
            | (F.col("v_min") != F.col("v_max"))
        )
    ).count()
    assert singles == 0
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == table(spark, SF_DIR, "events").count()


def test_mann_kendall_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "a22_mann_kendall")


def test_mann_kendall_matches_scipy_style(spark):
    """S equals a direct pandas pairwise recompute over exact daily
    means, and tau is bounded in [-1e6, 1e6]; a planted strictly
    increasing series gives exactly +1e6."""
    import itertools

    import numpy as np

    from historical_obs_platform_spark.registry import QUERIES
    from .conftest import SF_DIR

    rows = {
        (r["station"], r["month"]): r
        for r in QUERIES["a22_mann_kendall"](spark, SF_DIR).collect()
    }
    assert rows
    daily = (
        table(spark, SF_DIR, "events")
        .groupBy(
            F.col("user_id").cast("string").alias("station"),
            F.date_format("ts", "yyyy-MM").alias("month"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .toPandas()
    )
    checked = 0
    for (st, mo), g in daily.groupby(["station", "month"]):
        g = g.sort_values("day")
        s = g.s.values.astype(object)  # python ints: no overflow
        c = g.c.values.astype(object)
        S = sum(
            int(np.sign(s[j] * c[i] - s[i] * c[j]))
            for i, j in itertools.combinations(range(len(g)), 2)
        )
        n_pairs = len(g) * (len(g) - 1) // 2
        r = rows[(st, mo)]
        assert (r["s_stat"], r["n_pairs"]) == (S, n_pairs)
        assert -1_000_000 <= r["tau_ppm"] <= 1_000_000
        checked += 1
        if checked >= 25:
            break
    assert checked >= 10


def test_changepoint_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "w21_changepoint")


def test_changepoint_finds_planted_break(spark):
    """A constructed series with a hard level shift is located at the
    exact shift day by the centered-CUSUM argmax."""
    from historical_obs_platform_spark.queries.datasetops2 import (
        w21_changepoint,
    )

    # reuse the query's own logic by building a frame shaped like its
    # daily table: 10 days at 100 centi then 10 days at 900 centi
    rows = [
        ("s1", f"2024-01-{d:02d}", 100 if d <= 10 else 900, 1)
        for d in range(1, 21)
    ]
    daily = spark.createDataFrame(rows, "station string, day string, s long, c long")
    from pyspark.sql import Window as W

    w_pre = (
        W.partitionBy("station")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("station")
    pre = daily.select(
        "station",
        "day",
        F.sum("s").over(w_pre).alias("s_l"),
        F.sum("c").over(w_pre).alias("c_l"),
        F.sum("s").over(w_all).alias("s_tot"),
        F.sum("c").over(w_all).alias("c_tot"),
    )
    d_abs = F.abs(
        F.col("s_l") * F.col("c_tot") - F.col("s_tot") * F.col("c_l")
    )
    best = (
        pre.where(F.col("c_l") < F.col("c_tot"))
        .orderBy(d_abs.desc(), F.asc("day"))
        .first()
    )
    assert best["day"] == "2024-01-10"  # last day of the low regime
