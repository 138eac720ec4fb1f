"""Fifth parity wave (distribution flag-writers) vs the DuckDB oracle,
plus semantic spot-checks that the planted defects actually fire."""

import pytest

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import assert_matches_oracle

NAMES = [
    "f24_frequent_multigranularity",
    "l10_synergistic_flags",
    "f21_monthly_median_gap",
    "f22_distribution_gap",
    "chain_min_slice_hourly",
    "chain_logic_hourly",
]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_match(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_frequent_flags_fire_at_both_granularities(spark):
    from .conftest import SF_DIR

    out = (
        registry.QUERIES["f24_frequent_multigranularity"](spark, SF_DIR)
        .groupBy("tas_eraqc")
        .count()
        .toPandas()
    )
    flags = set(out["tas_eraqc"].dropna())
    assert 24.0 in flags, "whole-record dominant bin must flag 24"
    assert 25.0 in flags, "season-year dominant bin must flag 25"


def test_monthly_gap_flags_only_planted_month(spark):
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    out = registry.QUERIES["f21_monthly_median_gap"](spark, SF_DIR)
    flagged = (
        out.where(F.col("tas_eraqc") == 21.0)
        .select(F.year("time").alias("yr"), F.month("time").alias("moy"))
        .distinct()
        .collect()
    )
    assert {(r.yr, r.moy) for r in flagged} == {(2025, 3)}


def test_distribution_gap_flags_only_outliers(spark):
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    out = registry.QUERIES["f22_distribution_gap"](spark, SF_DIR)
    agg = out.agg(
        F.count(F.when(F.col("tas_eraqc") == 22.0, 1)).alias("n_flag"),
        F.count(
            F.when((F.col("tas") >= 310.0) & F.col("tas_eraqc").isNull(), 1)
        ).alias("missed"),
        F.count(
            F.when((F.col("tas") < 310.0) & F.col("tas_eraqc").isNotNull(), 1)
        ).alias("false_pos"),
    ).collect()[0]
    assert agg.n_flag > 0
    assert agg.missed == 0, "every +40 outlier must be flagged 22"
    assert agg.false_pos == 0, "no body row may be flagged"


def test_blocked_cosine_pairs_nulls_ragged_and_string_ids(spark):
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.operators.similarity import (
        blocked_cosine_pairs,
    )

    rows = [
        ("d1", "x", [1.0, 0.0]),
        ("d2", "x", [1.0, 0.0]),          # exact dup of d1
        ("d3", "x", None),                 # null vector: never pairs
        ("d4", "x", [1.0, 0.0, 0.0]),      # ragged: never pairs
        ("d5", None, [1.0, 0.0]),          # null block: never pairs
        ("d6", "y", [0.0, 1.0]),           # alone in its block
    ]
    df = spark.createDataFrame(rows, "id string, blk string, v array<double>")
    out = blocked_cosine_pairs(df, "id", "v", "blk", threshold=0.9)
    got = {(r.a, r.b, round(r.cosine_raw, 6)) for r in out.collect()}
    assert got == {("d1", "d2", 1.0)}


def test_zorder_layout_sorts_within_range_partitions(spark):
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.operators.layout import zorder_layout
    from historical_obs_platform_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.01", "events").select(
        "event_id",
        (F.col("user_id") % 256).alias("a"),
        (F.floor("value").cast("long") % 256).alias("b"),
    )
    out = zorder_layout(ev, "a", "b", bits=8)
    # ranges of different partitions must not overlap, and keys are
    # sorted within each partition (row-group stats prune on zkey)
    stats = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    prev_hi = -1
    for r in stats:
        assert r.lo > prev_hi, f"partition {r.pid} overlaps previous"
        prev_hi = r.hi


def test_zorder_layout_folds_out_of_range_keys(spark):
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.operators.layout import (
        zorder_key,
        zorder_layout,
    )

    # negative and >= 2**bits values must fold into [0, 2**bits) via
    # pmod, not arithmetic-shift into all-ones / alias silently
    df = spark.createDataFrame(
        [(-1, 300), (255, 44), (256, -5)], ["a", "b"]
    )
    out = zorder_layout(df, "a", "b", bits=8).collect()
    want = {}
    for a, b in [(-1, 300), (255, 44), (256, -5)]:
        fa, fb = a % 256, b % 256
        key = 0
        for i in range(8):
            key |= ((fa >> i) & 1) << (2 * i)
            key |= ((fb >> i) & 1) << (2 * i + 1)
        want[(a, b)] = key
    assert {(r.a, r.b): r.zkey for r in out} == want
    assert all(0 <= r.zkey < 1 << 16 for r in out)


def test_zorder_layout_enables_data_skipping(spark, tmp_path):
    """The point of Z-ordering: parquet row-group min/max ranges on
    BOTH clustered columns tighten, so a 2-D predicate can skip most
    row groups. Measured directly from the written footers: the
    fraction of row groups whose [min,max] interval on column `a`
    overlaps a small probe range must shrink by >= 3x vs the unsorted
    layout (and likewise stay selective on `b` — a plain sort on `a`
    alone would leave `b` ranges full-width)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.operators.layout import (
        zorder_layout,
    )

    n = 65536
    df = spark.range(n).select(
        (F.col("id") % 256).alias("a"),
        ((F.col("id") * 7919) % 256).alias("b"),
    )

    def overlap_fraction(path, col, lo, hi):
        import glob
        import os

        total = hit = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit / total, total

    raw = str(tmp_path / "raw")
    # id-ordered baseline: any >=256-row contiguous chunk spans the
    # full a/b domains, so every row group overlaps every probe
    df.orderBy("id").coalesce(4).write.mode("overwrite").option(
        "parquet.block.size", 64 * 1024
    ).parquet(raw)
    zo = str(tmp_path / "zo")
    zorder_layout(df, "a", "b", bits=8).write.mode(
        "overwrite"
    ).option("parquet.block.size", 64 * 1024).parquet(zo)

    fr_raw_a, n_raw = overlap_fraction(raw, "a", 10, 20)
    fr_zo_a, n_zo = overlap_fraction(zo, "a", 10, 20)
    fr_zo_b, _ = overlap_fraction(zo, "b", 10, 20)
    assert n_raw >= 4 and n_zo >= 4  # enough row groups to matter
    # id-ordered: every full-size group spans the domain (tiny tail
    # groups can miss the probe, hence 0.75 not 1.0)
    assert fr_raw_a >= 0.75
    # Z-order: BOTH dimensions become selective (a 1-D sort on `a`
    # would leave `b` ranges full-width); measured 0.32/0.24 here
    assert fr_zo_a <= 0.45
    assert fr_zo_b <= 0.45


def test_every_registered_query_has_an_oracle():
    """Round 5 retired the last rows-only registration: w13's exact
    mode + recursive-CTE IIR oracle closed the pairing-convention
    debt. From here on EVERY registered query must carry a DuckDB
    oracle — a new oracle-less registration is a regression unless the
    README documents a new pairing (in which case extend this test the
    way w13 used to be sanctioned)."""
    from historical_obs_platform_spark import registry

    registry.load_all()
    no_oracle = {n for n in registry.QUERIES if n not in registry.ORACLES}
    assert no_oracle == set(), (
        f"oracle-less queries (README pairing required): {no_oracle}"
    )


def test_zorder_key_n_three_dims(spark):
    """N-dim Morton interleave: verify against a python reference on
    3 columns, and check the 2-D case degenerates to zorder_key."""
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.operators.layout import (
        zorder_key,
        zorder_key_n,
        zorder_layout_n,
    )

    rows = [(5, 9, 2), (255, 0, 17), (0, 255, 255)]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    got = {
        (r.a, r.b, r.c): r.k
        for r in df.select(
            "a",
            "b",
            "c",
            zorder_key_n([F.col("a"), F.col("b"), F.col("c")], 8).alias(
                "k"
            ),
        ).collect()
    }
    for a, b, c in rows:
        want = 0
        for i in range(8):
            want |= ((a >> i) & 1) << (i * 3)
            want |= ((b >> i) & 1) << (i * 3 + 1)
            want |= ((c >> i) & 1) << (i * 3 + 2)
        assert got[(a, b, c)] == want
    # N=2 equals the dedicated 2-D key
    two = df.select(
        (
            zorder_key_n([F.col("a"), F.col("b")], 8)
            == zorder_key(F.col("a"), F.col("b"), 8)
        ).alias("eq")
    ).collect()
    assert all(r.eq for r in two)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="exceeds a BIGINT"):
        zorder_key_n([F.col("a")] * 8, 8)
    # folding applies per dimension
    df2 = spark.createDataFrame([(-1, 300, 256)], ["a", "b", "c"])
    out = zorder_layout_n(df2, ["a", "b", "c"], bits=8).collect()[0]
    fa, fb, fc = (-1) % 256, 300 % 256, 256 % 256
    want = 0
    for i in range(8):
        want |= ((fa >> i) & 1) << (i * 3)
        want |= ((fb >> i) & 1) << (i * 3 + 1)
        want |= ((fc >> i) & 1) << (i * 3 + 2)
    assert out.zkey == want
