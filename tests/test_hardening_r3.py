"""Round-3 hardening regressions: the latent-bug fixes called out by
the round-2 judge/advisor (VERDICT.md "What's wrong", ADVICE.md) each
get a test that fails on the pre-fix behavior.

- jaccard_pairs must stay exact under non-distinct (id, shingle) rows
- blocked_cosine_pairs must orient (a, b) byte-wise like Spark's '<'
- hll_merge / cms_merge must reject zero tables and mismatched params
- merge_changeset must tolerate unorderable payload types and honor a
  caller-supplied precedence column
- the CLI must refuse output == input (lazy read + overwrite)
- buoy_blacklist_check must cap the driver-side rules collect
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ jaccard under dup rows
def test_jaccard_pairs_exact_with_duplicate_shingle_rows(spark):
    from historical_obs_platform_spark.operators.dedup import jaccard_pairs

    # doc x: {s1, s2, s3}, doc y: {s2, s3, s4}  -> jaccard = 2/4 = 0.5
    # but every (id, shingle) row is fed TWICE: a collect_list/count
    # implementation would double sz while array_intersect dedups
    # n_common, silently halving jaccard.
    rows = [
        ("x", s) for s in ["s1", "s2", "s3"] * 2
    ] + [("y", s) for s in ["s2", "s3", "s4"] * 2]
    sh = spark.createDataFrame(rows, ["doc_id", "shingle"])

    # both code paths: inverted-index and candidate-confirm
    for cand in [None, spark.createDataFrame([("x", "y")], ["a", "b"])]:
        got = jaccard_pairs(sh, "doc_id", candidates=cand).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["a"], r["b"]) == ("x", "y")
        assert r["n_common"] == 2
        assert r["sz_a"] == 3 and r["sz_b"] == 3
        assert r["jaccard"] == 0.5


# -------------------------------------- blocked cosine non-ASCII ids
def test_blocked_cosine_pairs_byte_order_for_non_ascii_ids(spark):
    from historical_obs_platform_spark.operators.similarity import (
        blocked_cosine_pairs,
    )

    # Spark's string '<' compares UTF-8 bytes; the pandas island must
    # orient (a, b) identically or downstream joins on the pair key
    # silently drop rows. 'é_doc' (C3 A9…) sorts after 'z_doc' (7A…)
    # under both byte and codepoint order — the test pins the island's
    # orientation to whatever Spark's own '<' computes for these ids,
    # so ANY collation divergence (locale-sorted pandas, future Spark
    # collation changes) fails it.
    ids = ["é_doc", "z_doc"]
    df = spark.createDataFrame(
        [(i, "blk", [1.0, 2.0, 3.0]) for i in ids],
        ["doc_id", "block", "vec"],
    )
    got = blocked_cosine_pairs(
        df, "doc_id", "vec", "block", threshold=0.5
    ).collect()
    assert len(got) == 1
    a, b = got[0]["a"], got[0]["b"]
    # Spark-side '<' on the same two ids defines the expected order
    spark_lt = spark.createDataFrame([(ids[0], ids[1])], ["x", "y"]).select(
        (F.col("x") < F.col("y")).alias("lt")
    ).collect()[0]["lt"]
    want = (ids[0], ids[1]) if spark_lt else (ids[1], ids[0])
    assert (a, b) == want


# --------------------------------------------------- sketch merge guards
def test_hll_merge_rejects_zero_tables_and_mismatched_width(spark):
    from historical_obs_platform_spark.operators import sketches as SK

    with pytest.raises(ValueError, match="at least one"):
        SK.hll_merge()

    ev = spark.createDataFrame([(i,) for i in range(200)], ["v"])
    r2 = SK.hll_registers(ev, "v", bucket_hex=2)
    r3 = SK.hll_registers(ev, "v", bucket_hex=3)
    # matched widths merge clean and idempotently
    merged = SK.hll_merge(r2, r2, bucket_hex=2)
    assert merged.count() == r2.count()
    # mismatched widths raise at execution instead of silently
    # producing a wrong estimate
    with pytest.raises(Exception, match="bucket width"):
        SK.hll_merge(r2, r3, bucket_hex=2).count()


def test_cms_merge_rejects_zero_tables_and_wrong_grid(spark):
    from historical_obs_platform_spark.operators import sketches as SK

    with pytest.raises(ValueError, match="at least one"):
        SK.cms_merge()

    toks = spark.createDataFrame(
        [(str(i % 17),) for i in range(300)], ["tok"]
    )
    t_small = SK.cms_build(toks, "tok", depth=4, width=64)
    t_big = SK.cms_build(toks, "tok", depth=4, width=512)
    ok = SK.cms_merge(t_small, t_small, depth=4, width=64)
    assert ok.agg(F.sum("cnt")).collect()[0][0] == 600 * 4 // 1
    with pytest.raises(Exception, match="outside"):
        SK.cms_merge(t_small, t_big, depth=4, width=64).count()


# ------------------------------------------------- merge_changeset
def test_merge_changeset_with_map_payload_and_precedence(spark):
    from historical_obs_platform_spark.plans.incremental import (
        merge_changeset,
    )

    base = spark.createDataFrame(
        [("s1", 1, "old", {"k": "v0"}, 10)],
        ["station", "time", "val", "props", "version"],
    )
    # two upserts for the same key; props is a MAP (unorderable) —
    # pre-fix this threw AnalysisException from ORDER BY on a map
    changes = spark.createDataFrame(
        [
            ("s1", 1, "upsert", "newA", {"k": "v1"}, 11),
            ("s1", 1, "upsert", "newB", {"k": "v2"}, 12),
            ("s2", 2, "upsert", "ins", {"k": "v3"}, 1),
        ],
        ["station", "time", "op", "val", "props", "version"],
    )
    out = merge_changeset(base, changes, keys=("station", "time"))
    rows = {(r["station"], r["time"]): r for r in out.collect()}
    assert set(rows) == {("s1", 1), ("s2", 2)}
    # default fallback = max orderable payload wins -> val newB
    assert rows[("s1", 1)]["val"] == "newB"

    # explicit precedence column: last-write-wins on version
    out2 = merge_changeset(
        base, changes, keys=("station", "time"), precedence="version"
    )
    rows2 = {(r["station"], r["time"]): r for r in out2.collect()}
    assert rows2[("s1", 1)]["version"] == 12

    with pytest.raises(ValueError, match="precedence"):
        merge_changeset(
            base, changes, keys=("station", "time"), precedence="nope"
        )


# ----------------------------------------------------- CLI io guard
def test_cli_refuses_output_equals_input(spark, tmp_path):
    from historical_obs_platform_spark.cli import main

    src = tmp_path / "corpus"
    spark.createDataFrame(
        [("d1", "text a"), ("d2", "text b")], ["doc_id", "text"]
    ).write.parquet(str(src))

    for sub in ["split", "scrub"]:
        with pytest.raises(SystemExit, match="delete the source"):
            main(
                [sub, "--input", str(src), "--output", str(src)],
                spark=spark,
            )
    # nested output (subdir of input) is just as destructive
    with pytest.raises(SystemExit, match="delete the source"):
        main(
            [
                "compact",
                "--input",
                str(src),
                "--output",
                str(src / "sub"),
            ],
            spark=spark,
        )
    # the input must still be readable afterwards
    assert spark.read.parquet(str(src)).count() == 2


# ------------------------------------------------ buoy rules size cap
def test_buoy_blacklist_rules_size_guard(spark):
    from historical_obs_platform_spark.operators.concat import (
        buoy_blacklist_check,
    )

    obs = spark.createDataFrame(
        [("NDBC_1", "2020-01-01 00:00:00", 5.0)],
        ["station", "time", "wind_speed"],
    ).withColumn("time", F.col("time").cast("timestamp"))
    rules = spark.range(11).select(
        F.concat(F.lit("NDBC_"), F.col("id")).alias("station"),
        F.lit(None).cast("string").alias("variable"),
        F.lit(None).cast("timestamp").alias("window_start"),
        F.lit(None).cast("timestamp").alias("window_end"),
        F.lit(1).alias("flag"),
        F.lit(None).cast("int").alias("hour_start"),
        F.lit(None).cast("int").alias("hour_end"),
    )
    with pytest.raises(ValueError, match="exceeds 10 rows"):
        buoy_blacklist_check(obs, rules, max_rules=10)
    # at/under the cap still works
    out = buoy_blacklist_check(obs, rules.limit(5), max_rules=10)
    assert out.count() == 1


# ------------------------------------------ round-3 self-review fixes
def test_decoder_corrupt_header_degrades_to_none(spark):
    """A non-numeric PPM header or truncated BMP must yield None
    fields, not crash the executor task."""
    from historical_obs_platform_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [
            (1, bytearray(b"P6 abc 10 255 xxxx"), ("x", None, None, None)),
            (2, bytearray(b"BM" + b"\x00" * 20), ("x", None, None, None)),
            (3, bytearray(b"P6\n-3 2\n255\n" + b"\x00" * 64), ("x", None, None, None)),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = (
        MM.extract_features(media, decoder=MM.PpmBmpDecoder())
        .toPandas()
        .set_index("media_id")
    )
    for mid in (1, 2, 3):
        assert out.loc[mid, "feature"] is None


def test_merge_changeset_precedence_ties_are_deterministic(spark):
    """Equal-precedence upserts must resolve by the remaining
    orderable payload, not shuffle arrival order."""
    from historical_obs_platform_spark.plans.incremental import (
        merge_changeset,
    )

    base = spark.createDataFrame(
        [("s1", 1, "old", 0)], ["station", "time", "val", "version"]
    )
    changes = spark.createDataFrame(
        [
            ("s1", 1, "upsert", "alpha", 5),
            ("s1", 1, "upsert", "zeta", 5),  # same version
        ],
        ["station", "time", "op", "val", "version"],
    )
    vals = {
        merge_changeset(
            base.repartition(p),
            changes.repartition(p),
            keys=("station", "time"),
            precedence="version",
        )
        .collect()[0]["val"]
        for p in (1, 3, 7)
    }
    assert vals == {"zeta"}  # max remaining payload, every layout


def test_zorder_key_n_int_columns_high_positions(spark):
    """IntegerType inputs must interleave correctly even when target
    bit positions exceed 31 (Spark masks int shifts to 5 bits)."""
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.operators.layout import (
        zorder_key_n,
    )

    df = spark.createDataFrame(
        [(255, 255, 255, 255, 255)],
        "a int, b int, c int, d int, e int",
    )
    key = df.select(
        zorder_key_n(
            [F.col(x) for x in "abcde"], bits=8
        ).alias("k")
    ).collect()[0]["k"]
    assert key == (1 << 40) - 1  # all 40 interleaved bits set


def test_era_id_cw3e_prefix_only(spark):
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.sources.networks import era_id

    df = spark.createDataFrame([("C3AC3X",)], "STID string")
    got = df.select(era_id("CW3E").alias("e")).collect()[0]["e"]
    assert got == "CW3E_AC3X"  # only the prefix drops


def test_station_audit_suffix_with_underscore_id(spark):
    """A native id containing an underscore must match error files by
    the FULL native id, not its last segment."""
    from historical_obs_platform_spark.sources.networks import (
        station_clean_audit,
    )

    stations = spark.createDataFrame(
        [("AB_12", "x"), ("OTHER", "y")], "STID string, nm string"
    )
    cleaned = spark.createDataFrame(
        [], "ID string, Time_Cleaned string"
    )
    errors = spark.createDataFrame(
        [("CWOP_AB_12-file.csv", "2023-01-01 00:00", "boom")],
        "File string, Time string, Error string",
    )
    out = station_clean_audit(stations, cleaned, errors, "CWOP")
    rows = {r["era_id"]: r for r in out.collect()}
    assert rows["CWOP_AB_12"]["Errors"] == "boom"
    assert rows["CWOP_OTHER"]["Errors"] is None


def test_cli_guards_side_channel_sinks(spark, tmp_path):
    from historical_obs_platform_spark.cli import main

    src = tmp_path / "obs"
    spark.createDataFrame(
        [("MADIS_A", "2020-01-01 00:00:00", 280.0)],
        ["station", "time", "tas"],
    ).write.parquet(str(src))
    with pytest.raises(SystemExit, match="flag-counts"):
        main(
            [
                "merge",
                "--input",
                str(src),
                "--output",
                str(tmp_path / "out"),
                "--flag-counts",
                str(src),
            ],
            spark=spark,
        )
    assert spark.read.parquet(str(src)).count() == 1


def test_merge_station_lists_no_duplication_on_coord_collision(spark):
    """Two ASOS rows sharing (WBAN, rounded coords) with different
    NCDCIDs must NOT fan the exact-tier join out — one deterministic
    winner, one output row per ISD row."""
    from historical_obs_platform_spark.sources.networks import (
        merge_station_lists,
    )

    isd = spark.createDataFrame(
        [(1, 10.125, -20.25, "only")],
        "WBAN int, LAT double, LON double, isd_name string",
    )
    asos = spark.createDataFrame(
        [
            (1, 10.125, -20.25, 100, "2001-05-15", "older"),
            (1, 10.125, -20.25, 101, "2005-05-15", "newer"),
        ],
        "WBAN int, LAT double, LON double, NCDCID int, "
        "STARTDATE string, asos_name string",
    )
    out = merge_station_lists(isd, asos).collect()
    assert len(out) == 1
    assert out[0]["asos_name"] == "newer"  # newest STARTDATE wins


def test_cli_refuses_sink_vs_sink_collision(spark, tmp_path):
    from historical_obs_platform_spark.cli import main

    src = tmp_path / "obs"
    spark.createDataFrame(
        [("MADIS_A", "2020-01-01 00:00:00", 280.0)],
        ["station", "time", "tas"],
    ).write.parquet(str(src))
    with pytest.raises(SystemExit, match="overlapping paths"):
        main(
            [
                "merge",
                "--input",
                str(src),
                "--output",
                str(tmp_path / "out"),
                "--flag-counts",
                str(tmp_path / "out"),
            ],
            spark=spark,
        )
