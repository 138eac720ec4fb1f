"""Dataset-curation queries (queries/datasetops.py) vs the DuckDB
oracle, plus semantic invariants the hash-match alone doesn't pin
down (split stability, estimate error bounds, scrub idempotence)."""

import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.queries.common import table

registry.load_all()

from .conftest import SF_DIR, assert_matches_oracle

NAMES = [
    "s11_json_props",
    "t_pii_scrub",
    "p_split_assign",
    "sk_kmv_setops",
    "s_label_centroids",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_split_proportions_and_stability(spark):
    """80/10/10 within sampling noise; assignment is a pure function
    of doc_id (rerun → identical counts)."""
    q = registry.QUERIES["p_split_assign"]
    rows = {r["split"]: r for r in q(spark, SF_DIR).collect()}
    total = sum(r["n_docs"] for r in rows.values())
    assert set(rows) == {"train", "val", "test"}
    assert abs(rows["train"]["n_docs"] / total - 0.8) < 0.08
    again = {r["split"]: r for r in q(spark, SF_DIR).collect()}
    assert {k: v["sum_doc_id"] for k, v in rows.items()} == {
        k: v["sum_doc_id"] for k, v in again.items()
    }


def test_kmv_setops_estimate_error(spark):
    """Union / intersection estimates land within KMV error bounds
    (~1/sqrt(k) ≈ 6% at k=256; allow 4x slack for the intersection,
    which compounds the Jaccard ratio error)."""
    r = registry.QUERIES["sk_kmv_setops"](spark, SF_DIR).collect()[0]
    union_true = (
        r["n_a_exact"] + r["n_b_exact"] - r["inter_exact"]
    )
    assert abs(r["union_est"] - union_true) / union_true < 0.2
    if r["inter_exact"] > 0:
        assert (
            abs(r["inter_est"] - r["inter_exact"]) / r["inter_exact"]
            < 0.35
        )


def test_pii_scrub_removes_all_pii(spark):
    """After scrubbing, no digits or @-addresses survive: re-running
    the scrub over its own output changes nothing (idempotence via
    the audit counts of a second pass)."""
    docs = table(spark, SF_DIR, "documents")
    from historical_obs_platform_spark.queries.datasetops import (
        _AUG_SQL,
        _EMAIL_RE,
        _NUM_RE,
    )

    aug = docs.select("doc_id", F.expr(_AUG_SQL).alias("t"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
        _NUM_RE,
        "<NUM>",
    )
    leftover = aug.select(
        F.sum(
            F.regexp_count(scrubbed, F.lit(_NUM_RE))
            + F.regexp_count(scrubbed, F.lit(_EMAIL_RE))
        ).alias("n")
    ).collect()[0]["n"]
    assert leftover == 0


def test_label_centroids_match_numpy(spark):
    """The quantized exact-math centroid sqnorm tracks the float
    centroid computed directly with numpy (quantization error at 1e-6
    per component stays far under the assertion tolerance)."""
    import numpy as np

    em = (
        table(spark, SF_DIR, "embeddings")
        .select("label", "embedding")
        .toPandas()
    )
    got = {
        r["label"]: r
        for r in registry.QUERIES["s_label_centroids"](
            spark, SF_DIR
        ).collect()
    }
    for label, grp in em.groupby("label"):
        mat = np.stack(grp["embedding"].to_numpy())
        sqnorm = float((mat.mean(axis=0) ** 2).sum())
        assert abs(got[label]["centroid_sqnorm"] - sqnorm) < 1e-3
        assert got[label]["n_vecs"] == len(grp)


def test_json_props_null_audit(spark):
    """n_null counts rows whose JSON lacks the key — zero on the
    clean synthetic corpus, and the groups partition the table."""
    out = registry.QUERIES["s11_json_props"](spark, SF_DIR).collect()
    n_events = table(spark, SF_DIR, "events").count()
    assert sum(r["n"] for r in out) == n_events
    assert all(r["n_null"] == 0 for r in out)
