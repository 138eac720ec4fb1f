"""Deterministic sampling / packing operators vs the DuckDB oracle."""

import pytest

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import SF_DIR, assert_matches_oracle

NAMES = [
    "p_uniform_sample",
    "p_stratified_sample",
    "p_mixture_sample",
    "p_pack_sequences",
    "p_corpus_shuffle",
    "chain_corpus_curation",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_uniform_sample_rate_and_determinism(spark):
    got = registry.QUERIES["p_uniform_sample"](spark, SF_DIR).toPandas()
    again = registry.QUERIES["p_uniform_sample"](spark, SF_DIR).toPandas()
    # deterministic: identical row set both runs
    assert sorted(got.doc_id) == sorted(again.doc_id)
    # rate ~0.25 of 500 docs, loose band
    assert 80 <= len(got) <= 170


def test_stratified_quota(spark):
    got = registry.QUERIES["p_stratified_sample"](spark, SF_DIR).toPandas()
    assert got.groupby("lang").size().max() <= 25


def test_mixture_downsamples_majority_only(spark, oracle_con):
    before = (
        oracle_con.sql("SELECT lang, count(*) n FROM documents GROUP BY lang")
        .df()
        .set_index("lang")["n"]
    )
    after = (
        registry.QUERIES["p_mixture_sample"](spark, SF_DIR)
        .toPandas()
        .groupby("lang")
        .size()
    )
    target = before.sum() / len(before)
    for lang, n0 in before.items():
        n1 = after.get(lang, 0)
        assert n1 <= n0  # never up-samples
        if n0 <= target:
            assert n1 == n0  # under-represented strata untouched
        else:  # down-sampled toward target (hash noise band)
            assert abs(n1 - target) < 0.5 * target


def test_packing_invariants(spark):
    got = registry.QUERIES["p_pack_sequences"](spark, SF_DIR).toPandas()
    assert len(got) == 500 and got.doc_id.is_unique
    # bin id is exactly the chunk of the begin offset
    assert (got.bin_id == got.begin_off // 4000).all()
    # offsets are a proper exclusive prefix sum within each shard
    for _, g in got.groupby("source"):
        g = g.sort_values("begin_off")
        assert g.begin_off.iloc[0] == 0
        assert (
            g.begin_off.iloc[1:].to_numpy()
            == (g.begin_off + g.n_chars).iloc[:-1].to_numpy()
        ).all()


def test_curation_chain_stages_compose(spark):
    got = registry.QUERIES["chain_corpus_curation"](spark, SF_DIR).toPandas()
    # dedup removed every planted clone (ids stay in the original range)
    assert got.doc_id.max() < 1_000_000 and got.doc_id.is_unique
    # mixture: no language exceeds the uniform target by more than the
    # hash-noise band
    by_lang = got.groupby("lang").size()
    assert by_lang.max() < 1.5 * by_lang.mean()
    # packing invariant survives the chain
    assert (got.bin_id == got.begin_off // 4000).all()


def test_corpus_shuffle_is_permutation(spark):
    got = registry.QUERIES["p_corpus_shuffle"](spark, SF_DIR).toPandas()
    assert len(got) == 500 and got.doc_id.is_unique
    # ranks are dense 1..n within each shard
    for _, g in got.groupby("shard"):
        assert sorted(g.shard_rank) == list(range(1, len(g) + 1))


def test_weighted_sample_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "p_weighted_sample")


def test_weighted_sample_prefers_heavy_rows(spark):
    """Selection probability rises with weight: the sampled rows'
    mean n_chars should exceed the population mean."""
    import pyspark.sql.functions as F

    from historical_obs_platform_spark.queries.common import table

    docs = table(spark, SF_DIR, "documents")
    got = registry.QUERIES["p_weighted_sample"](spark, SF_DIR).toPandas()
    pop_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert got.n_chars.mean() > pop_mean
