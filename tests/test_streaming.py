"""Structured Streaming tests: parquet source → memory sink, driven
synchronously with processAllAvailable (guide pattern)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark.streaming.hourly import (
    dedup_keep_first_stream,
    hourly_standardize_stream,
    logic_checks_stream,
)


@pytest.fixture(scope="module")
def obs_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_src") / "obs")
    times = pd.date_range("2020-01-01", periods=200, freq="17min")
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "station": ["S1"] * 100 + ["S2"] * 100,
            "time": list(times[:100]) * 2,
            "tas": 285.0 + rng.normal(0, 1, 200),
            "pr": np.round(rng.uniform(0, 1, 200), 2),
        }
    )
    # plant a world-record violation and a duplicate delivery
    pdf.loc[10, "tas"] = 340.0
    pdf = pd.concat([pdf, pdf.iloc[[20]]], ignore_index=True)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    return path


def _schema(spark, path):
    return spark.read.parquet(path).schema


def _run(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_hourly_standardize_stream(spark, obs_dir):
    src = spark.readStream.schema(_schema(spark, obs_dir)).parquet(obs_dir)
    agg = hourly_standardize_stream(
        src, first_cols=["tas"], sum_cols=["pr"]
    )
    _run(agg, "hourly_out", "complete")
    got = spark.sql("SELECT * FROM hourly_out").toPandas()
    # batch equivalent
    want = (
        spark.read.parquet(obs_dir)
        .groupBy("station", F.date_trunc("hour", "time").alias("hour"))
        .agg(
            F.min_by("tas", "time").alias("tas_first"),
            F.sum("pr").alias("pr_sum"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .toPandas()
    )
    g = got.sort_values(["station", "hour"], ignore_index=True)
    w = want.sort_values(["station", "hour"], ignore_index=True)
    assert len(g) == len(w)
    assert (g["n_obs"] == w["n_obs"]).all()
    assert np.allclose(g["pr_sum"].astype(float), w["pr_sum"].astype(float))
    assert np.allclose(
        g["tas_first"].astype(float), w["tas_first"].astype(float)
    )


def test_dedup_stream(spark, obs_dir):
    src = spark.readStream.schema(_schema(spark, obs_dir)).parquet(obs_dir)
    dd = dedup_keep_first_stream(src)
    _run(dd, "dedup_out", "append")
    got = spark.sql("SELECT * FROM dedup_out")
    n_src = spark.read.parquet(obs_dir).count()
    n_distinct = (
        spark.read.parquet(obs_dir).dropDuplicates(["station", "time"]).count()
    )
    assert got.count() == n_distinct == n_src - 1


def test_logic_checks_stream(spark, obs_dir):
    src = spark.readStream.schema(_schema(spark, obs_dir)).parquet(obs_dir)
    flagged = logic_checks_stream(src)
    _run(flagged, "logic_out", "append")
    out = spark.sql("SELECT * FROM logic_out").toPandas()
    assert (out["tas_eraqc"] == 11).sum() == 1
    assert out.loc[out["tas_eraqc"] == 11, "tas"].iloc[0] == 340.0


# ----------------------------------------------- new driver stream ops
from historical_obs_platform_spark import registry as _registry

_registry.load_all()

from .conftest import assert_matches_oracle  # noqa: E402


@pytest.mark.parametrize(
    "name",
    [
        "st_dedup_stream",
        "st_sliding_window_stream",
        "st_interval_join_stream",
        "st_flag_rates_stream",
        "st_session_stream",
        "st_topk_stream",
    ],
)
def test_stream_queries_match_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_sliding_window_fanout(spark, obs_dir):
    """Each event lands in exactly window/slide = 2 windows."""
    from historical_obs_platform_spark.streaming.hourly import (
        sliding_rollup_stream,
    )

    src = (
        spark.readStream.schema(_schema(spark, obs_dir))
        .parquet(obs_dir)
        .withColumnRenamed("pr", "value")
    )
    out = sliding_rollup_stream(src, agg_col="value")
    _run(out, "t_sliding_fan", "complete")
    got = spark.table("t_sliding_fan")
    n_events = spark.read.parquet(obs_dir).count()
    assert got.agg(F.sum("n_obs")).first()[0] == 2 * n_events


def test_restart_from_checkpoint_exactly_once(spark, tmp_path):
    """A stopped stream resumed from its checkpointLocation must not
    re-count rows already committed (exactly-once across restart) and
    must pick up files that arrived while it was down."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, ids):
        pdf = pd.DataFrame(
            {"station": [f"S{i % 3}" for i in ids], "v": [float(i) for i in ids]}
        )
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            str(src / name)
        )

    write_batch("b0.parquet", range(100))
    schema = spark.read.parquet(str(src / "b0.parquet")).schema
    counts = (
        spark.readStream.schema(schema)
        .parquet(str(src / "*.parquet"))
        .groupBy("station")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def run_until_drained(qname):
        q = (
            counts.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {
            r["station"]: r["n"] for r in spark.table(qname).collect()
        }

    first = run_until_drained("ckpt_run1")
    assert sum(first.values()) == 100

    # new data lands while the stream is DOWN
    write_batch("b1.parquet", range(100, 160))
    second = run_until_drained("ckpt_run2")
    # restart resumes from the committed offset: 160 total, not 260
    assert sum(second.values()) == 160
    assert second["S0"] + second["S1"] + second["S2"] == 160


def test_st_neardup_stream_converges_to_batch(spark, oracle_con):
    """The stream-static near-dup must equal both its DuckDB oracle
    and the batch incremental query exactly."""
    from .conftest import SF_DIR, assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "st_neardup_stream")
    from historical_obs_platform_spark.registry import QUERIES

    got = {
        (r["new_id"], r["dup_of"], r["jaccard"])
        for r in QUERIES["st_neardup_stream"](spark, SF_DIR).collect()
    }
    batch = {
        (r["new_id"], r["dup_of"], r["jaccard"])
        for r in QUERIES["d_incremental_neardup"](spark, SF_DIR).collect()
    }
    assert got == batch


@pytest.mark.parametrize(
    "name",
    [
        "st_topk_windowed_append",
        "st_neardup_append",
        "st_semdedup_append",
    ],
)
def test_append_mode_twins_match_oracle(spark, oracle_con, name):
    """The bounded-state append-mode twins: watermarked windowed
    aggregation must emit exactly the finalized windows the oracle's
    batch recompute predicts (watermark eviction semantics are part
    of the hash)."""
    assert_matches_oracle(spark, oracle_con, name)


def test_append_twin_is_subset_of_complete(spark):
    """The append twin emits finalized windows only — a strict subset
    of the complete-mode result, identical on every emitted key."""
    from historical_obs_platform_spark.registry import QUERIES

    from .conftest import SF_DIR

    comp = {
        r["new_id"]: (r["dup_of"], r["cosine_sim"])
        for r in QUERIES["st_semdedup_stream"](spark, SF_DIR).collect()
    }
    app = {
        r["new_id"]: (r["dup_of"], r["cosine_sim"])
        for r in QUERIES["st_semdedup_append"](spark, SF_DIR).collect()
    }
    assert set(app) < set(comp)
    assert all(comp[k] == v for k, v in app.items())


def test_drift_stream_matches_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "st_drift_stream")


def test_drift_stream_flags_only_planted_dim(spark):
    """The +0.5 planted shift on dimension 5 is the only flagged dim,
    and its measured drift is ~0.5."""
    from historical_obs_platform_spark.registry import QUERIES

    df = QUERIES["st_drift_stream"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    flagged = df[df["drift_flag"] == 1]
    assert list(flagged["pos"]) == [5]
    assert abs(flagged["abs_drift"].iloc[0] - 0.5) < 1e-6
    assert (df[df["pos"] != 5]["abs_drift"] < 0.01).all()


def test_contract_stream_matches_oracle(spark, oracle_con):
    """Streaming twin of o21_contract_checks (7 predicate rows)."""
    assert_matches_oracle(spark, oracle_con, "st_contract_stream")


def test_contract_stream_equals_batch_subset(spark):
    """The streaming snapshot equals the batch suite row-for-row on
    the seven predicate checks (unique-key is batch-only)."""
    from historical_obs_platform_spark.registry import QUERIES
    from .conftest import SF_DIR

    st = {
        (r["chk"], r["col"]): (r["observed_ppm"], r["pass"])
        for r in QUERIES["st_contract_stream"](spark, SF_DIR).collect()
    }
    bt = {
        (r["chk"], r["col"]): (r["observed_ppm"], r["pass"])
        for r in QUERIES["o21_contract_checks"](spark, SF_DIR).collect()
        if r["chk"] != "unique"
    }
    assert st == bt and len(st) == 7
