"""Round-4 hardening regressions — the four ADVICE.md latent bugs:
nearest_cell_arrow degenerate inputs, tag_polygons null/equal tags,
merge_changeset's unorderable-payload fallback, and the PPM P6
maxval-separator byte."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------------
# nearest_cell_arrow: zero-norm vectors must degrade to a null cell
# (not silently argmax to the first cell), wrong-dimension and null
# vectors stay null, and an empty input doesn't crash the bool mask.
# --------------------------------------------------------------------
def test_nearest_cell_arrow_degenerate_inputs(spark):
    from historical_obs_platform_spark.operators.similarity import (
        nearest_cell_arrow,
    )

    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(
        [
            (0, [3.0, 0.0]),      # cell 0
            (1, [0.0, 2.0]),      # cell 1
            (2, [0.0, 0.0]),      # zero norm -> null, NOT cell 0
            (3, [1.0]),           # wrong dimension -> null
            (4, None),            # null -> null
            (5, [float("inf"), 1.0]),  # non-finite norm -> null
        ],
        schema,
    )
    got = {
        r["id"]: r["cell"]
        for r in df.select(
            "id", nearest_cell_arrow(F.col("v"), cents).alias("cell")
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: None, 3: None, 4: None, 5: None}

    empty = spark.createDataFrame([], schema)
    assert (
        empty.select(
            nearest_cell_arrow(F.col("v"), cents).alias("cell")
        ).count()
        == 0
    )


def test_nearest_cell_arrow_no_normalize_keeps_exact_vectors(spark):
    """normalize=False must score the caller's vectors untouched —
    a zero vector is then a VALID input (score 0 everywhere, smallest
    cell wins by the documented tie rule)."""
    from historical_obs_platform_spark.operators.similarity import (
        nearest_cell_arrow,
    )

    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    schema = T.StructType(
        [T.StructField("v", T.ArrayType(T.DoubleType()))]
    )
    df = spark.createDataFrame([([0.0, 0.0],), ([0.0, 5.0],)], schema)
    got = [
        r["cell"]
        for r in df.select(
            nearest_cell_arrow(F.col("v"), cents, normalize=False).alias(
                "cell"
            )
        ).collect()
    ]
    assert got == [0, 1]


# --------------------------------------------------------------------
# tag_polygons: NULL tags raise (not TypeError on the driver sort),
# and duplicate tags don't fall through to comparing geometry lists.
# --------------------------------------------------------------------
def _poly_df(spark, rows):
    return spark.createDataFrame(rows, "tag string, wkt string")


def test_tag_polygons_null_tag_raises(spark):
    from historical_obs_platform_spark.operators.geo import tag_polygons

    pts = spark.createDataFrame([(0.5, 0.5)], "lon double, lat double")
    polys = _poly_df(
        spark, [(None, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")]
    )
    with pytest.raises(ValueError, match="NULL tag"):
        tag_polygons(pts, polys)


def test_tag_polygons_equal_tags_ok(spark):
    from historical_obs_platform_spark.operators.geo import tag_polygons

    pts = spark.createDataFrame(
        [(0.5, 0.5), (2.5, 0.5), (9.0, 9.0)], "lon double, lat double"
    )
    # two disjoint polygons sharing one tag: the tuple sort would have
    # compared their coordinate lists; the keyed sort must not care
    polys = _poly_df(
        spark,
        [
            ("A", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
            ("A", "POLYGON ((2 0, 3 0, 3 1, 2 1, 2 0))"),
        ],
    )
    got = [
        r["region_tag"]
        for r in tag_polygons(pts, polys)
        .orderBy("lon")
        .collect()
    ]
    assert got == ["A", "A", None]


# --------------------------------------------------------------------
# merge_changeset: duplicate upserts whose payload is entirely
# unorderable must fail loudly (the dropDuplicates fallback picked a
# partitioning-dependent survivor); key-only changesets still dedupe.
# --------------------------------------------------------------------
def test_merge_changeset_unorderable_payload_raises(spark):
    from historical_obs_platform_spark.plans.incremental import (
        merge_changeset,
    )

    base = spark.createDataFrame(
        [(1, {"a": 1})], "k int, payload map<string,int>"
    )
    chg = spark.createDataFrame(
        [(1, {"a": 2}, "upsert"), (1, {"a": 3}, "upsert")],
        "k int, payload map<string,int>, op string",
    )
    with pytest.raises(ValueError, match="no orderable payload"):
        merge_changeset(base, chg, keys=("k",))


def test_merge_changeset_unorderable_with_precedence(spark):
    from historical_obs_platform_spark.plans.incremental import (
        merge_changeset,
    )

    base = spark.createDataFrame(
        [(1, 0, {"a": 1})], "k int, v int, payload map<string,int>"
    )
    chg = spark.createDataFrame(
        [(1, 2, {"a": 2}, "upsert"), (1, 9, {"a": 3}, "upsert")],
        "k int, v int, payload map<string,int>, op string",
    )
    out = merge_changeset(base, chg, keys=("k",), precedence="v")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["v"] == 9
    assert dict(rows[0]["payload"]) == {"a": 3}


def test_merge_changeset_key_only_dedupe(spark):
    from historical_obs_platform_spark.plans.incremental import (
        merge_changeset,
    )

    base = spark.createDataFrame([(1,), (2,)], "k int")
    chg = spark.createDataFrame(
        [(3, "upsert"), (3, "upsert"), (1, "delete")], "k int, op string"
    )
    got = sorted(r["k"] for r in merge_changeset(base, chg, keys=("k",)).collect())
    assert got == [2, 3]


# --------------------------------------------------------------------
# w19_ewma's vectorized spelling: Series.ewm(alpha=1/2, adjust=False)
# must be BIT-identical to the explicit (acc+x)/2 fold — halving is
# exact and scaling by 2^-1 commutes with round-to-nearest, so
# 0.5*s + 0.5*x rounds the same real value as (s+x)/2.
# --------------------------------------------------------------------
def test_ewm_half_alpha_bit_identical_to_fold():
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(20260814)
    for _ in range(25):
        n = int(rng.integers(1, 3000))
        x = rng.standard_normal(n) * (10.0 ** float(rng.integers(-8, 9)))
        fast = pd.Series(x).ewm(alpha=0.5, adjust=False).mean().to_numpy()
        acc, out = None, []
        for v in x:
            acc = v if acc is None else (acc + v) / 2
            out.append(acc)
        assert (fast == np.array(out)).all()


# --------------------------------------------------------------------
# PpmBmpDecoder: the byte after maxval must be a single whitespace;
# CRLF (or a header truncated at maxval) degrades to None instead of
# shifting the pixel stream by one byte.
# --------------------------------------------------------------------
def _p6(sep: bytes, w=2, h=1) -> bytes:
    return b"P6 " + f"{w} {h} 255".encode() + sep + bytes(range(w * h * 3))


def test_ppm_p6_separator_contract():
    from historical_obs_platform_spark.operators.multimodal import (
        PpmBmpDecoder,
    )

    good = PpmBmpDecoder._decode_one(_p6(b"\n"))
    assert good is not None
    w, h, arr = good
    assert (w, h) == (2, 1)
    assert arr.flatten().tolist() == list(range(6))

    # CRLF after maxval: non-conforming writer, would shift pixels
    assert PpmBmpDecoder._decode_one(_p6(b"\r\n")) is None
    # truncated exactly at maxval: no separator byte at all
    assert PpmBmpDecoder._decode_one(b"P6 2 1 255") is None
    # lone \r is still a single whitespace separator — decodes
    assert PpmBmpDecoder._decode_one(_p6(b"\r")) is not None
