"""Round-8 hardening (r7 judge brief #1 + advisor notes).

Covers:

- ``round_half_away`` — the driver-side rounding helper must be
  bit-identical to DuckDB's round(DOUBLE, n) on exact .xxxxxx5 tie
  values, where CPython's banker's round() diverges (advice fix).
- ``t_cooccur_pmi(exact=False)`` — the distributed escape hatch for
  past-contract pair vocabularies (the single r7-verdict
  scale-killer): marginals via relational joins + pandas_udf ln.
  Verified three ways: cell-by-cell against exact mode on the real
  sf0.001 corpus; against DuckDB's oracle on a synthetic corpus whose
  pair table EXCEEDS the (test-shrunk) driver contract while exact
  mode raises; and the registered exact path stays hash-exact (the
  sweep covers that).
- ``e_cohort_ltv`` — pre-1970 purchase timestamps bin with FLOOR
  week semantics on both engines (advice fix: truncating division
  folded days -6..6 into a 13-day week 0).
- ``a39_bootstrap_ci`` — NULL event_id rows are excluded identically
  on both engines (advice fix: concat_ws skips NULLs where the
  oracle's || propagates them into a different replicate weight).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd
import pytest

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.queries.common import round_half_away
from historical_obs_platform_spark.queries.stats2 import t_cooccur_pmi

from .conftest import SF_SMALL, assert_matches_oracle

registry.load_all()


# ------------------------------------------------------------------ #
# round_half_away ≡ DuckDB round(DOUBLE, n)
# ------------------------------------------------------------------ #
@pytest.mark.parametrize(
    "x",
    [
        2.5e-6,
        3.5e-6,
        -2.5e-6,
        -3.5e-6,
        0.1234565,
        0.1234575,
        -0.1234565,
        1.0000005,
        2.0000005,
        0.0,
        -17.123456499999,
        123.9999995,
    ],
)
def test_round_half_away_matches_duckdb(x):
    con = duckdb.connect()
    want = con.sql(
        f"SELECT round(CAST({x!r} AS DOUBLE), 6) AS r"
    ).fetchone()[0]
    assert round_half_away(x, 6) == want
    con.close()


def test_round_half_away_diverges_from_bankers_somewhere():
    # the reason the helper exists: CPython round() is half-to-even
    assert round(3.5e-6, 6) == 3e-6
    assert round_half_away(3.5e-6, 6) == 4e-6


def test_round_half_away_none_passthrough():
    assert round_half_away(None) is None


# ------------------------------------------------------------------ #
# t_cooccur_pmi exact=False — distributed scoring
# ------------------------------------------------------------------ #
def test_pmi_distributed_matches_exact_on_real_corpus(spark):
    got_exact = {
        (r["tok_a"], r["tok_b"]): r
        for r in t_cooccur_pmi(spark, SF_SMALL).collect()
    }
    got_dist = {
        (r["tok_a"], r["tok_b"]): r
        for r in t_cooccur_pmi(spark, SF_SMALL, exact=False).collect()
    }
    assert set(got_exact) == set(got_dist)
    assert len(got_exact) > 0
    for k, re_ in got_exact.items():
        rd = got_dist[k]
        assert rd["n_pair"] == re_["n_pair"]
        assert rd["rnk"] == re_["rnk"]
        assert rd["pmi"] == pytest.approx(re_["pmi"], abs=2e-6)


def _write_big_vocab_docs(path, n_docs=180, doc_len=24, vocab=120):
    """Synthetic corpus whose pair table exceeds a shrunk cell
    contract: deterministic LCG token stream over a `vocab`-word
    vocabulary, long enough that distinct within-2 pairs >> 2000."""
    rng = 1
    rows = []
    for d in range(n_docs):
        toks = []
        for _ in range(doc_len):
            rng = (1103515245 * rng + 12345) % (1 << 31)
            toks.append(f"w{rng % vocab:04d}")
        rows.append((d, " ".join(toks), "en", f"src{d % 3}"))
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(f"{path}/documents.parquet", index=False)


def test_pmi_exact_raises_past_contract_and_distributed_scores(
    spark, tmp_path
):
    _write_big_vocab_docs(tmp_path)
    sf = str(tmp_path)

    # exact mode must refuse, not collect, past the cell contract
    with pytest.raises(ValueError, match="exact=False"):
        t_cooccur_pmi(spark, sf, max_cells=2000)

    got = t_cooccur_pmi(spark, sf, exact=False).toPandas()

    from historical_obs_platform_spark.queries.stats2 import PMI_ORACLE

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf}/documents.parquet'"
    )
    want = con.sql(PMI_ORACLE).df()
    con.close()

    assert len(got) == len(want) > 0
    got = got.sort_values("rnk", ignore_index=True)
    want = want.sort_values("rnk", ignore_index=True)
    assert list(got["tok_a"]) == list(want["tok_a"])
    assert list(got["tok_b"]) == list(want["tok_b"])
    assert list(got["n_pair"]) == list(want["n_pair"])
    for g, w in zip(got["pmi"], want["pmi"]):
        assert g == pytest.approx(w, abs=2e-6)


def test_pmi_distributed_plan_has_no_driver_collect(spark):
    """The escape hatch's plan must be a pure DataFrame pipeline:
    TakeOrdered top-k, no single-partition global sort of the scored
    table (the 20-row rank window IS single-partition by design)."""
    df = t_cooccur_pmi(spark, SF_SMALL, exact=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------------------ #
# e_cohort_ltv — pre-1970 floor-week binning, cross-engine
# ------------------------------------------------------------------ #
def _write_events(path, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}" for _ in rows],
        }
    ).to_parquet(f"{path}/events.parquet", index=False)


def test_cohort_ltv_pre1970_floor_weeks(spark, tmp_path):
    # days -6 (1969-12-26) and +6 (1970-01-07) of user A must land in
    # DIFFERENT epoch-anchored weeks (-1 and 0; weeks start Thursday
    # 1970-01-01 ± k*7), not a folded 13-day "week 0"
    _write_events(
        str(tmp_path),
        [
            (1, dt.datetime(1969, 12, 26, 12), 7, "purchase", 10.0),
            (2, dt.datetime(1970, 1, 7, 12), 7, "purchase", 20.0),
            (3, dt.datetime(1970, 1, 20, 12), 8, "purchase", 5.0),
        ],
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{tmp_path}/events.parquet'"
    )
    assert_matches_oracle(
        spark, con, "e_cohort_ltv", sf_dir=str(tmp_path)
    )
    got = registry.QUERIES["e_cohort_ltv"](spark, str(tmp_path)).toPandas()
    con.close()
    a = got[got["cohort_week"] == "1969-12-25"]
    assert len(a) == 2  # week -1 (day -6) and week 0 (day +6)
    assert sorted(a["week_offset"]) == [0, 1]


# ------------------------------------------------------------------ #
# a39_bootstrap_ci — NULL event_id handled identically on both sides
# ------------------------------------------------------------------ #
def test_bootstrap_ci_null_event_id_cross_engine(spark, tmp_path):
    rows = [
        (i, dt.datetime(2024, 1, 1, i % 24), i % 5, "purchase", float(i))
        for i in range(1, 40)
    ]
    rows.append((None, dt.datetime(2024, 1, 2), 1, "purchase", 999.0))
    _write_events(str(tmp_path), rows)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{tmp_path}/events.parquet'"
    )
    assert_matches_oracle(
        spark, con, "a39_bootstrap_ci", sf_dir=str(tmp_path)
    )
    # the NULL-id row is excluded: n counts 39, not 40
    got = registry.QUERIES["a39_bootstrap_ci"](
        spark, str(tmp_path)
    ).toPandas()
    con.close()
    assert int(got["n"].sum()) == 39


# ------------------------------------------------------------------ #
# w33_pacf_lag8 — parameterized Durbin-Levinson (r7 brief #6)
# ------------------------------------------------------------------ #
def test_pacf_lag8_agrees_with_w31_at_lags_1_3(spark):
    from .conftest import SF_DIR

    w31 = {
        r["lag"]: r
        for r in registry.QUERIES["w31_pacf"](spark, SF_DIR).collect()
    }
    w33 = {
        r["lag"]: r
        for r in registry.QUERIES["w33_pacf_lag8"](
            spark, SF_DIR
        ).collect()
    }
    assert sorted(w33) == list(range(1, 9))
    for lag in (1, 2, 3):
        assert w33[lag]["acf"] == w31[lag]["acf"]
        # same recursion, different (closed-form vs iterative) float
        # trees: equal to rounding noise
        assert w33[lag]["pacf"] == pytest.approx(
            w31[lag]["pacf"], abs=2e-6
        )


def test_pacf_lag8_constant_series_all_null(spark, tmp_path):
    # zero-variance series: den = 0 -> every acf/pacf NULL, cross-engine
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), 1, "view", 1.0)
        for i in range(24)
    ]
    _write_events(str(tmp_path), rows)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{tmp_path}/events.parquet'"
    )
    assert_matches_oracle(
        spark, con, "w33_pacf_lag8", sf_dir=str(tmp_path)
    )
    got = registry.QUERIES["w33_pacf_lag8"](
        spark, str(tmp_path)
    ).toPandas()
    con.close()
    assert len(got) == 8
    assert got["acf"].isna().all() and got["pacf"].isna().all()


def test_pacf_lag8_short_series_nulls_past_length(spark, tmp_path):
    # 4 distinct hours with varying counts: lags past the series
    # length have no pairs -> NULL acf, NULL propagates through DL
    rows = []
    eid = 0
    for h, n in [(0, 1), (1, 3), (2, 2), (3, 5)]:
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
                 1, "view", 1.0)
            )
    _write_events(str(tmp_path), rows)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{tmp_path}/events.parquet'"
    )
    assert_matches_oracle(
        spark, con, "w33_pacf_lag8", sf_dir=str(tmp_path)
    )
    con.close()
    got = registry.QUERIES["w33_pacf_lag8"](
        spark, str(tmp_path)
    ).toPandas()
    assert len(got) == 8
    byl = got.set_index("lag")
    assert not pd.isna(byl.loc[1, "acf"])
    for lag in (4, 5, 6, 7, 8):
        assert pd.isna(byl.loc[lag, "acf"])


def test_pacf_parameterized_lag_runs_at_other_k(spark):
    from historical_obs_platform_spark.queries.timeseries3 import (
        w33_pacf_lag8,
    )

    got = w33_pacf_lag8(spark, SF_SMALL, k=5).toPandas()
    assert list(got["lag"]) == [1, 2, 3, 4, 5]


# ------------------------------------------------------------------ #
# lsh_star_pairs — cluster-recall equivalence with full pairing
# ------------------------------------------------------------------ #
@pytest.mark.parametrize("sf", [SF_SMALL, "/root/testdata/sf0.01"])
def test_star_pairing_same_removal_output(spark, sf):
    """Survivor set from star candidates == survivor set from the
    full B²/2 pairing on the real corpus: bucket-min chaining links
    every cluster the full pairing finds (similarity-pure buckets),
    so the keep/remove decision — the thing dedup exists for — is
    identical while candidate mass drops to B−1 per bucket."""
    from historical_obs_platform_spark.operators import dedup as DD
    from historical_obs_platform_spark.queries import textops as TX

    shingles, cand_full = TX._lsh_shared(spark, sf)
    sigs = DD.minhash_signatures(shingles, "doc_id", n_hashes=TX.LSH_N_HASHES)
    buckets = DD.lsh_buckets(
        sigs, "doc_id", n_hashes=TX.LSH_N_HASHES, bands=TX.LSH_BANDS
    )
    cand_star = DD.lsh_star_pairs(buckets, "doc_id")

    def survivors(cand):
        pairs = DD.jaccard_pairs(
            shingles, "doc_id", min_jaccard=0.5, candidates=cand
        ).select("a", "b")
        comp = DD.connected_components(pairs).withColumnRenamed(
            "node", "doc_id"
        )
        corpus = TX._near_corpus_spark(spark, sf).select("doc_id")
        joined = corpus.join(comp, "doc_id", "left")
        import pyspark.sql.functions as F

        return {
            r["doc_id"]
            for r in joined.where(
                F.col("component").isNull()
                | (F.col("component") == F.col("doc_id"))
            ).collect()
        }

    full = survivors(cand_full)
    star = survivors(cand_star)
    n_full = cand_full.count()
    n_star = cand_star.count()
    assert star == full
    assert n_star <= n_full


# ------------------------------------------------------------------
# Round-8 optimization: session-shared IVF centroid fit + kernel
# non-determinism markers (single-evaluation plans).
# ------------------------------------------------------------------
def test_ivf_cent_shared_identical_to_direct_fit(spark):
    """The session-shared coarse-quantizer build must return exactly
    the rows a direct ivf_centroids fit produces (same corpus, same
    knobs) — the sharing is a cache of a deterministic build, never a
    semantic change."""
    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.textops import (
        _ivf_cent_shared,
    )

    sf_dir = SF_SMALL
    emb = table(spark, sf_dir, "embeddings")
    direct = sorted(
        (r["cell"], tuple(r["__cent"]))
        for r in SIM.ivf_centroids(
            emb, "vec_id", "embedding", 16, 1
        ).collect()
    )
    shared = sorted(
        (r["cell"], tuple(r["__cent"]))
        for r in _ivf_cent_shared(spark, sf_dir, 16, 1).collect()
    )
    assert shared == direct
    # and the memo returns the SAME handle on a second request
    assert _ivf_cent_shared(spark, sf_dir, 16, 1) is _ivf_cent_shared(
        spark, sf_dir, 16, 1
    )


def test_kernel_nondeterministic_single_eval(spark):
    """cosine_arrow under a threshold filter must appear exactly once
    in the physical plan (the duplicated-ArrowEvalPython pattern the
    asNondeterministic marker removes), and its values must be the
    kernel's deterministic output."""
    from historical_obs_platform_spark.operators import similarity as SIM
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], [1.0, float(i)]) for i in range(50)],
        "id long, a array<double>, b array<double>",
    )
    out = df.select(
        "id", SIM.cosine_arrow(F.col("a"), F.col("b")).alias("c")
    ).where(F.col("c") >= 0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    rows = {r["id"]: r["c"] for r in out.collect()}
    import math

    for i, c in rows.items():
        a = [float(i), 1.0]
        b = [1.0, float(i)]
        d = a[0] * b[0] + a[1] * b[1]
        na = a[0] * a[0] + a[1] * a[1]
        nb = b[0] * b[0] + b[1] * b[1]
        assert math.isclose(c, d / (math.sqrt(na) * math.sqrt(nb)))


def test_dup_components_shared_identical_to_direct(spark):
    """The session-shared near-dup component table must equal the
    directly-computed connected components of the confirmed pair
    graph (min-label propagation has a unique fixpoint, so sharing
    the build cannot change any consumer's rows)."""
    from historical_obs_platform_spark.operators import dedup as DD
    from historical_obs_platform_spark.queries.textops import (
        _dup_components_shared,
        _lsh_shared,
    )

    sf_dir = SF_SMALL
    shingles, cand = _lsh_shared(spark, sf_dir)
    pairs = DD.jaccard_pairs(
        shingles, "doc_id", min_jaccard=0.5, candidates=cand
    ).select("a", "b")
    direct = sorted(
        (r["node"], r["component"])
        for r in DD.connected_components(pairs).collect()
    )
    shared = sorted(
        (r["node"], r["component"])
        for r in _dup_components_shared(spark, sf_dir).collect()
    )
    assert shared == direct
    assert _dup_components_shared(spark, sf_dir) is _dup_components_shared(
        spark, sf_dir
    )


def test_pq_sharded_codebook_shared_identical_to_direct(spark):
    """The session-shared shard-merged PQ codebook must equal a direct
    ``pq_codebooks_sharded`` fit (deterministic seeds + round-9 Lloyd
    means per shard, fixed shard order) — sharing the build cannot
    change the merge-recall harness's rows."""
    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.curation3 import (
        _PQ_POINTS,
        _pq_shared_sharded_codebook,
    )

    sf_dir = SF_SMALL
    p0 = _PQ_POINTS[0]
    emb = table(spark, sf_dir, "embeddings")
    direct = sorted(
        (r["s"], r["j"], tuple(r["__cent"]))
        for r in SIM.pq_codebooks_sharded(
            emb,
            m=p0["m"],
            ksub=p0["ksub"],
            sub_dim=p0["sub_dim"],
            n_shards=2,
            iters=1,
        ).collect()
    )
    shared = sorted(
        (r["s"], r["j"], tuple(r["__cent"]))
        for r in _pq_shared_sharded_codebook(
            spark, sf_dir, p0, n_shards=2
        ).collect()
    )
    assert shared == direct
    assert _pq_shared_sharded_codebook(
        spark, sf_dir, p0, n_shards=2
    ) is _pq_shared_sharded_codebook(spark, sf_dir, p0, n_shards=2)


def test_cos_truth_shared_identical_to_direct(spark):
    """The session-shared exact-cosine truth table must equal a direct
    cosine_topk_prepped pass (round-6 similarity, neighbor_id tie
    break — fully deterministic), so sharing it between the recall
    harnesses cannot change their recall rows."""
    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.textops import (
        _cos_truth_shared,
    )
    from pyspark.sql import functions as F

    sf_dir = SF_SMALL
    emb = table(spark, sf_dir, "embeddings")
    c = SIM.prep_corpus(emb, "vec_id", "embedding")
    q = SIM.prep_queries(
        emb.where(F.col("vec_id") < 10), "vec_id", "embedding"
    )
    direct = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rank"])
        for r in SIM.cosine_topk_prepped(c, q, k=5).collect()
    )
    shared = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rank"])
        for r in _cos_truth_shared(spark, sf_dir, k=5).collect()
    )
    assert shared == direct
    assert _cos_truth_shared(spark, sf_dir, k=5) is _cos_truth_shared(
        spark, sf_dir, k=5
    )


def test_contamination_shared_shingles_equal_fresh(spark):
    """The shared near-dup shingle handle filtered to doc_id < 1e6
    must equal a fresh word_shingles build over the documents table
    (word_shingles is per-row; the shared corpus's low ids are the
    documents verbatim)."""
    from historical_obs_platform_spark.operators import dedup as DD
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.textops import _lsh_shared
    from pyspark.sql import functions as F

    sf_dir = SF_SMALL
    docs = table(spark, sf_dir, "documents")
    fresh = sorted(
        (r["doc_id"], r["shingle"])
        for r in DD.word_shingles(docs, "doc_id", "text", n=2).collect()
    )
    sh_all, _cand = _lsh_shared(spark, sf_dir)
    shared = sorted(
        (r["doc_id"], r["shingle"])
        for r in sh_all.where(F.col("doc_id") < 1000000).collect()
    )
    assert shared == fresh


def test_prefix_shared_shingles_equal_fresh(spark):
    """The shared shingle handle filtered to pmod(id,1e6)%20==0 must
    equal a fresh shingle build over d_prefix_jaccard_pairs'
    decimated+doubled corpus (identical per-row construction)."""
    from historical_obs_platform_spark.operators import dedup as DD
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.textops import _lsh_shared
    from pyspark.sql import functions as F

    sf_dir = SF_SMALL
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 20 == 0)
        .select("doc_id", "text")
    )
    corpus = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
        )
    )
    fresh = sorted(
        (r["doc_id"], r["shingle"])
        for r in DD.word_shingles(corpus, "doc_id", "text", n=2).collect()
    )
    from historical_obs_platform_spark.queries.textops import (
        _pfx_shingles_shared,
    )

    shared = sorted(
        (r["doc_id"], r["shingle"])
        for r in _pfx_shingles_shared(spark, sf_dir).collect()
    )
    assert shared == fresh
    assert _pfx_shingles_shared(spark, sf_dir) is _pfx_shingles_shared(
        spark, sf_dir
    )


def test_pq_shared_codes_identical_to_fresh_encode(spark):
    """The session-shared encoded-corpus table must equal a fresh
    pq_encode pass against the same codebook (deterministic nearest-
    code pick), and pq_adc_topk(codes=shared) must return exactly the
    rows of the self-encoding path."""
    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.curation3 import (
        _PQ_POINTS,
        _pq_shared_codebook,
        _pq_shared_codes,
    )
    from pyspark.sql import functions as F

    sf_dir = SF_SMALL
    p0 = _PQ_POINTS[0]
    emb = table(spark, sf_dir, "embeddings")
    cents = _pq_shared_codebook(spark, sf_dir, p0)
    fresh = sorted(
        (r["neighbor_id"], r["s"], r["code"])
        for r in SIM.pq_encode(
            emb, cents, m=p0["m"], sub_dim=p0["sub_dim"]
        ).collect()
    )
    shared = sorted(
        (r["neighbor_id"], r["s"], r["code"])
        for r in _pq_shared_codes(
            spark, sf_dir, p0, cents, p0["sfx"]
        ).collect()
    )
    assert shared == fresh
    queries = emb.where(F.col("vec_id") < 10)
    self_enc = sorted(
        tuple(r) for r in SIM.pq_adc_topk(
            emb, queries, k=5, m=p0["m"], ksub=p0["ksub"],
            sub_dim=p0["sub_dim"], cents=cents,
        ).collect()
    )
    with_codes = sorted(
        tuple(r) for r in SIM.pq_adc_topk(
            emb, queries, k=5, m=p0["m"], ksub=p0["ksub"],
            sub_dim=p0["sub_dim"], cents=cents,
            codes=_pq_shared_codes(spark, sf_dir, p0, cents, p0["sfx"]),
        ).collect()
    )
    assert with_codes == self_enc


def test_vec_lsh_shared_tables_equal_fresh_builds(spark):
    """The shared 3-table vector-LSH bucket build, and its 2-table
    prefix-filtered view, must equal fresh lsh_corpus_buckets builds
    at those table counts (hyperplanes are global-plane-indexed, so
    tables 0..n-1 are construction-identical across builds)."""
    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.textops import (
        _vec_lsh_shared,
        _vec_lsh_tables,
    )

    sf_dir = SF_SMALL
    emb = table(spark, sf_dir, "embeddings")
    c_fresh = SIM.prep_corpus(emb, "vec_id", "embedding")
    c, cb3 = _vec_lsh_shared(spark, sf_dir)
    for n in (2, 3):
        fresh = sorted(
            (r["neighbor_id"], r["__b"])
            for r in SIM.lsh_corpus_buckets(
                c_fresh, dim=64, n_planes=4, n_tables=n
            ).collect()
        )
        shared = sorted(
            (r["neighbor_id"], r["__b"])
            for r in _vec_lsh_tables(cb3, n).collect()
        )
        assert shared == fresh, f"n_tables={n}"
    # prepped corpus identical to a fresh prep
    assert sorted(
        (r["neighbor_id"], tuple(r["__cv"]), r["__cn"])
        for r in c.collect()
    ) == sorted(
        (r["neighbor_id"], tuple(r["__cv"]), r["__cn"])
        for r in c_fresh.collect()
    )


def test_ivf_cells_shared_identical_to_operator_internal(spark):
    """The shared cell-assigned corpus must equal the construction
    ivf_ann_topk performs internally (same prep expressions + the
    shared centroid fit), and ivf_ann_topk(corpus_cells=shared) must
    return exactly the self-assembling path's rows."""
    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.textops import (
        _ivf_cells_shared,
        _ivf_cent_shared,
    )
    from pyspark.sql import functions as F

    sf_dir = SF_SMALL
    emb = table(spark, sf_dir, "embeddings")
    cent = _ivf_cent_shared(spark, sf_dir, 16, 1)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        SIM.as_double_array("embedding").alias("__cv"),
    ).withColumn("__cn", SIM.norm(F.col("__cv")))
    c = c.withColumn(
        "__uv", F.transform("__cv", lambda x: x / F.col("__cn"))
    )
    fresh = sorted(
        (r["neighbor_id"], r["cell"])
        for r in SIM.attach_cells(c, cent).collect()
    )
    shared = sorted(
        (r["neighbor_id"], r["cell"])
        for r in _ivf_cells_shared(spark, sf_dir, 16, 1).collect()
    )
    assert shared == fresh
    queries = emb.where(F.col("vec_id") < 10)
    self_built = sorted(
        tuple(r)
        for r in SIM.ivf_ann_topk(
            emb, queries, k=5, n_cells=16, nprobe=4, cents=cent
        ).collect()
    )
    with_cells = sorted(
        tuple(r)
        for r in SIM.ivf_ann_topk(
            emb, queries, k=5, n_cells=16, nprobe=4, cents=cent,
            corpus_cells=_ivf_cells_shared(spark, sf_dir, 16, 1),
        ).collect()
    )
    assert with_cells == self_built


def test_lsh_topk_prebuilt_index_equals_self_built(spark):
    """lsh_ann_topk / lsh_multiprobe_topk with the shared prebuilt
    (prep, buckets) must return exactly the self-building path's
    rows."""
    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.textops import (
        _vec_lsh_shared,
        _vec_lsh_tables,
    )
    from pyspark.sql import functions as F

    sf_dir = SF_SMALL
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    c, cb3 = _vec_lsh_shared(spark, sf_dir)
    plain_self = sorted(
        tuple(r)
        for r in SIM.lsh_ann_topk(
            emb, queries, dim=64, k=5, n_planes=4, n_tables=3
        ).collect()
    )
    plain_pre = sorted(
        tuple(r)
        for r in SIM.lsh_ann_topk(
            emb, queries, dim=64, k=5, n_planes=4, n_tables=3,
            prepped_corpus=c, corpus_buckets=cb3,
        ).collect()
    )
    assert plain_pre == plain_self
    mp_self = sorted(
        tuple(r)
        for r in SIM.lsh_multiprobe_topk(
            emb, queries, dim=64, k=5, n_planes=4, n_tables=2,
            n_probes=2,
        ).collect()
    )
    mp_pre = sorted(
        tuple(r)
        for r in SIM.lsh_multiprobe_topk(
            emb, queries, dim=64, k=5, n_planes=4, n_tables=2,
            n_probes=2, prepped_corpus=c,
            corpus_buckets=_vec_lsh_tables(cb3, 2),
        ).collect()
    )
    assert mp_pre == mp_self


def test_span_grams_shared_identical_to_inline_build(spark):
    """The session-shared positional gram table must equal the inline
    construction d_substring_spans previously performed per rep."""
    from historical_obs_platform_spark.operators import dedup as DD
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.curation3 import (
        _SPAN_GRAM,
        _span_grams_shared,
    )
    from pyspark.sql import functions as F

    sf_dir = SF_SMALL
    docs = table(spark, sf_dir, "documents")
    toks0 = docs.select(
        "doc_id", F.split(DD.normalize_text("text"), " ").alias("t")
    )
    corpus = toks0.select(F.col("doc_id").alias("id"), "t").unionByName(
        toks0.where(F.size("t") >= 40).select(
            (F.col("doc_id") + 1000000).alias("id"),
            F.slice("t", 6, 30).alias("t"),
        )
    )
    n = _SPAN_GRAM
    fresh = sorted(
        (r["id"], r["p"], r["gram"])
        for r in corpus.where(F.size("t") >= n)
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    lambda p: F.struct(
                        p.cast("long").alias("p"),
                        F.md5(
                            F.concat_ws(" ", F.slice("t", p, n))
                        ).alias("gram"),
                    ),
                )
            ).alias("__g"),
        )
        .select("id", F.col("__g.p").alias("p"), F.col("__g.gram").alias("gram"))
        .collect()
    )
    shared = sorted(
        (r["id"], r["p"], r["gram"])
        for r in _span_grams_shared(spark, sf_dir).collect()
    )
    assert shared == fresh
    assert _span_grams_shared(spark, sf_dir) is _span_grams_shared(
        spark, sf_dir
    )


def test_semdedup_prepped_shared_identical_and_equivalent(spark):
    """The session-shared SemDeDup clustering artifact must equal a
    fresh semdedup_prepped build on the doubled-id corpus, and
    semdedup(prepped_cells=shared) must return exactly the
    self-building path's rows."""
    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.queries.curation3 import (
        _N_CELLS,
        _SEM_THRESHOLD,
        _semdedup_corpus,
        _semdedup_prepped_shared,
    )

    sf_dir = SF_SMALL
    emb = table(spark, sf_dir, "embeddings")
    corpus = _semdedup_corpus(emb)
    fresh = sorted(
        (r["vec_id"], r["cell"])
        for r in SIM.semdedup_prepped(
            corpus, n_cells=_N_CELLS, iters=1
        ).collect()
    )
    shared = sorted(
        (r["vec_id"], r["cell"])
        for r in _semdedup_prepped_shared(spark, sf_dir).collect()
    )
    assert shared == fresh
    self_built = sorted(
        tuple(r)
        for r in SIM.semdedup(
            corpus, n_cells=_N_CELLS, iters=1, threshold=_SEM_THRESHOLD
        ).collect()
    )
    with_prepped = sorted(
        tuple(r)
        for r in SIM.semdedup(
            corpus, n_cells=_N_CELLS, iters=1, threshold=_SEM_THRESHOLD,
            prepped_cells=_semdedup_prepped_shared(spark, sf_dir),
        ).collect()
    )
    assert with_prepped == self_built
