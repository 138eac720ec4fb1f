"""Round-8 optimization batch 3 — equivalence tests for the operator
internals the final optimization pass restructured:

- ``cms_build``/``cms_probe_topk`` ``weight_col`` mode: building the
  count-min sketch from a pre-aggregated (value, count) table must be
  EXACTLY the occurrence-stream sketch (every occurrence of a value
  hashes identically, so bucket counters are sums of per-value
  counts), and the weighted exact top-k must equal the raw count.
- ``station_clean_audit`` containment rewrite: the enumerate-distinct-
  substrings equi-join must produce the same (station, error) match
  set as the ``instr(File, sfx) > 0`` broadcast theta join it
  replaced, including the empty-suffix and mid-string edge cases.
- ``_lsh_shared_full`` bucket reuse: a document's minhash signature
  (hence its band buckets) depends only on its own shingles, so the
  shared full-corpus bucket table filtered to stored ids must equal a
  fresh build over the stored slice (the streaming static-index
  reuse).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.operators import dedup as DD
from historical_obs_platform_spark.operators import sketches as SK

from .conftest import SF_SMALL

registry.load_all()


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ------------------------------------------------------------------ #
# cms weight_col ≡ occurrence stream
# ------------------------------------------------------------------ #
def test_cms_weighted_build_equals_occurrence_stream(spark):
    # skewed multiset: 'a' x40, 'b' x7, 'c' x1, plus collision fodder
    vals = ["a"] * 40 + ["b"] * 7 + ["c"] + [f"t{i}" for i in range(50)]
    raw = spark.createDataFrame([(v,) for v in vals], "tok string")
    counts = raw.groupBy(F.col("tok").alias("__v")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    t_raw = SK.cms_build(raw, "tok", depth=4, width=64)
    t_wtd = SK.cms_build(
        counts, "__v", depth=4, width=64, weight_col="__cnt"
    )
    assert _rows(t_raw, ["row", "bucket", "cnt"]) == _rows(
        t_wtd, ["row", "bucket", "cnt"]
    )


def test_cms_weighted_probe_equals_raw_probe(spark):
    vals = ["a"] * 40 + ["b"] * 7 + ["c"] + [f"t{i}" for i in range(50)]
    raw = spark.createDataFrame([(v,) for v in vals], "tok string")
    counts = raw.groupBy(F.col("tok").alias("__v")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    table = SK.cms_build(raw, "tok", depth=4, width=64)
    p_raw = SK.cms_probe_topk(raw, "tok", table, top=5, depth=4, width=64)
    p_wtd = SK.cms_probe_topk(
        counts, "__v", table, top=5, depth=4, width=64, weight_col="__cnt"
    )
    cols = ["token", "exact_count", "cms_estimate"]
    assert _rows(p_raw, cols) == _rows(p_wtd, cols)


# ------------------------------------------------------------------ #
# containment equi-rewrite ≡ instr theta join
# ------------------------------------------------------------------ #
def test_substring_enumeration_equals_instr_theta_join(spark):
    # adversarial shapes: suffix mid-string, suffix == whole file,
    # one file matching several stations (longest/greatest-id rule is
    # applied downstream — here we prove the raw MATCH SET), suffix
    # matching nothing, empty suffix (instr('x','') = 1: matches all)
    stations = spark.createDataFrame(
        [
            ("N_123", "123"),
            ("N_A123B", "A123B"),
            ("N_ZZZ", "ZZZ"),
            ("N_", ""),
        ],
        "era_id string, __sfx string",
    )
    errors = spark.createDataFrame(
        [
            ("xxA123Byy.csv",),
            ("123.csv",),
            ("plainfile.csv",),
        ],
        "File string",
    )
    theta = errors.join(
        F.broadcast(stations), F.instr(F.col("File"), F.col("__sfx")) > 0
    )
    subs = errors.select(
        "File",
        F.explode(
            F.array_distinct(
                F.expr(
                    "flatten(transform(sequence(0, length(File)), "
                    "l -> transform(sequence(1, length(File) - l + 1), "
                    "i -> substring(File, i, l))))"
                )
            )
        ).alias("__sfx"),
    )
    equi = subs.join(F.broadcast(stations), "__sfx")
    cols = ["File", "era_id", "__sfx"]
    got_theta = _rows(theta, cols)
    got_equi = _rows(equi, cols)
    assert got_theta == got_equi
    # the empty suffix must have matched every file, and the
    # mid-string suffix its containing file — the edge cases the
    # rewrite claims to preserve
    files_for_empty = {f for f, e, s in got_theta if e == "N_"}
    assert files_for_empty == {"xxA123Byy.csv", "123.csv", "plainfile.csv"}
    assert ("xxA123Byy.csv", "N_A123B", "A123B") in got_theta
    assert ("xxA123Byy.csv", "N_123", "123") in got_theta


def test_n_station_audit_runs_and_keeps_shape(spark):
    out = registry.QUERIES["n_station_audit"](spark, SF_SMALL)
    cols = out.columns
    assert "Errors" in cols and "Cleaned" in cols and "era_id" in cols
    assert out.count() > 0


# ------------------------------------------------------------------ #
# shared bucket table filtered ≡ fresh stored-corpus build
# ------------------------------------------------------------------ #
def test_lsh_shared_buckets_filter_equals_fresh_build(spark):
    from historical_obs_platform_spark.queries.textops import (
        LSH_BANDS,
        LSH_N_HASHES,
        _lsh_shared_full,
    )

    shingles, _sigs, buckets, _cand = _lsh_shared_full(spark, SF_SMALL)
    old_sh = shingles.where(F.col("doc_id") < 1000000)
    fresh = DD.lsh_buckets(
        DD.minhash_signatures(old_sh, "doc_id", n_hashes=LSH_N_HASHES),
        "doc_id",
        n_hashes=LSH_N_HASHES,
        bands=LSH_BANDS,
    )
    filtered = buckets.where(F.col("doc_id") < 1000000)
    cols = ["doc_id", "band", "bucket"]
    assert _rows(filtered, cols) == _rows(fresh, cols)
