"""CLI entry points driven in-process (the reference's run scripts,
SURVEY.md §3, reshaped to all-stations Spark jobs)."""

import numpy as np
import pandas as pd

from historical_obs_platform_spark.cli import main

from .conftest import SF_DIR


def _obs_parquet(spark, path):
    times = pd.date_range("2020-01-01", periods=300, freq="30min")
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "station": ["NET1_A"] * 300 + ["NET1_B"] * 300,
            "time": list(times) * 2,
            "lat": 40.0,
            "lon": -120.0,
            "elevation": 100.0,
            "tas": 285.0 + rng.normal(0, 2, 600),
            "pr": np.round(rng.uniform(0, 2, 600), 2),
        }
    )
    # dewpoint strictly below tas so the planted violation is unique
    pdf["tdps"] = pdf["tas"] - 5.0 - np.abs(rng.normal(0, 1, 600))
    pdf.loc[5, "tas"] = 350.0  # world record violation
    pdf.loc[7, "tdps"] = pdf.loc[7, "tas"] + 1.0  # supersaturation
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)


def test_cli_qaqc_then_merge(spark, tmp_path):
    src = str(tmp_path / "obs")
    flagged_dir = str(tmp_path / "flagged")
    hourly_dir = str(tmp_path / "hourly")
    counts_dir = str(tmp_path / "counts")
    _obs_parquet(spark, src)

    rc = main(
        [
            "qaqc",
            "--input", src,
            "--output", flagged_dir,
            "--no-distribution",
        ],
        spark=spark,
    )
    assert rc == 0
    flagged = spark.read.parquet(flagged_dir)
    assert "tas_eraqc" in flagged.columns
    assert "network" in flagged.columns
    assert flagged.where("tas_eraqc = 11").count() == 1  # world record
    assert flagged.where("tdps_eraqc = 12").count() == 1  # supersat

    rc = main(
        [
            "merge",
            "--input", flagged_dir,
            "--output", hourly_dir,
            "--flag-counts", counts_dir,
        ],
        spark=spark,
    )
    assert rc == 0
    hourly = spark.read.parquet(hourly_dir)
    # 300 half-hourly obs -> 150 hours per station
    assert hourly.groupBy("station").count().collect()[0]["count"] == 150
    counts = spark.read.option("header", True).csv(counts_dir)
    assert counts.count() > 0


def test_cli_station_filter(spark, tmp_path):
    src = str(tmp_path / "obs2")
    out = str(tmp_path / "flagged2")
    _obs_parquet(spark, src)
    rc = main(
        [
            "qaqc",
            "--input", src,
            "--output", out,
            "--station", "NET1_A",
            "--no-distribution",
        ],
        spark=spark,
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.select("station").distinct().collect()[0]["station"] == "NET1_A"


def test_cli_query_and_listing(spark, tmp_path, capsys):
    rc = main(
        ["query", "--name", "q6_forecast_revenue", "--show", "3"],
        spark=spark,
    )
    assert rc == 0
    rc = main(["list-queries"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "q6_forecast_revenue\toracle" in out
    # the full chain gained an exact oracle in round 2; the
    # round 5: the IIR clim-outlier island gained a recursive-CTE
    # oracle (exact mode), so the listing shows oracle for it too
    assert "chain_qaqc_merge_events\toracle" in out
    assert "w13_clim_outlier\toracle" in out
    rc = main(["query", "--name", "nope"], spark=spark)
    assert rc == 2


def test_cli_clean_network(spark, tmp_path):
    """clean-network applies a quirk table to a raw CSV prefix."""
    import csv
    import os

    raw_dir = tmp_path / "raw_cimis"
    raw_dir.mkdir()
    with open(raw_dir / "part-0.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(
            ["station", "time", "Air Temperature (C)",
             "Relative Humidity (%)", "elevation"]
        )
        w.writerow(["CI1", "2014-06-01 12:00:00", "20.5", "55.0", "1000"])
        w.writerow(["CI1", "2014-06-01 13:00:00", "-9999", "60.0", "1000"])
    out_dir = str(tmp_path / "clean_cimis")
    rc = main(
        [
            "clean-network",
            "--input", str(raw_dir),
            "--network", "CIMIS",
            "--output", out_dir,
        ],
        spark=spark,
    )
    assert rc == 0
    got = spark.read.parquet(out_dir).orderBy("time").collect()
    assert len(got) == 2
    r0 = got[0]
    assert r0["tas"] == 20.5 + 273.15          # degC -> K
    assert r0["time"].hour == 20               # PST +8h -> UTC
    assert r0["elevation"] == 1000 * 0.3048    # ft -> m
    assert got[1]["tas"] is None               # sentinel -> null


def test_cli_split_partitions_and_stability(spark, tmp_path):
    from historical_obs_platform_spark.cli import main

    out = str(tmp_path / "split_out")
    rc = main(
        ["split", "--input", f"{SF_DIR}/documents.parquet",
         "--output", out],
        spark=spark,
    )
    assert rc == 0
    import os

    parts = sorted(
        d for d in os.listdir(out) if d.startswith("split=")
    )
    assert parts == ["split=test", "split=train", "split=val"]
    back = spark.read.parquet(out)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert back.count() == n_docs
    # same assignment as the registered audit query
    from historical_obs_platform_spark import registry

    registry.load_all()
    audit = {
        r["split"]: r["n_docs"]
        for r in registry.QUERIES["p_split_assign"](
            spark, SF_DIR
        ).collect()
    }
    from pyspark.sql import functions as F

    got = {
        r["split"]: r["n"]
        for r in back.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == audit


def test_cli_scrub_and_compact(spark, tmp_path):
    from historical_obs_platform_spark.cli import main
    from pyspark.sql import functions as F

    out = str(tmp_path / "scrubbed")
    rc = main(
        ["scrub", "--input", f"{SF_DIR}/documents.parquet",
         "--output", out],
        spark=spark,
    )
    assert rc == 0
    assert (
        spark.read.parquet(out)
        .where(F.col("text").rlike("[0-9]"))
        .count()
        == 0
    )

    cout = str(tmp_path / "compacted")
    rc = main(
        ["compact", "--input", f"{SF_DIR}/events.parquet",
         "--output", cout, "--time-col", "ts",
         "--target-rows", "3000"],
        spark=spark,
    )
    assert rc == 0
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    back = spark.read.parquet(cout)
    assert back.count() == ev.count()
    assert back.columns == ev.columns


def test_cli_clean_network_preserves_qc_letter_flags(spark, tmp_path):
    """QC columns carry letter codes — the numeric try_cast must not
    null them (they are exempted via keep_strings)."""
    import csv

    raw_dir = tmp_path / "raw_cimis_qc"
    raw_dir.mkdir()
    with open(raw_dir / "part-0.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(
            ["station", "time", "Air Temperature (C)",
             "QC for Air Temperature"]
        )
        w.writerow(["CI1", "2014-06-01 12:00:00", "20.5", "Y"])
        w.writerow(["CI1", "2014-06-01 13:00:00", "21.0", "8"])
    out_dir = str(tmp_path / "clean_cimis_qc")
    rc = main(
        ["clean-network", "--input", str(raw_dir),
         "--network", "CIMIS", "--output", out_dir],
        spark=spark,
    )
    assert rc == 0
    got = spark.read.parquet(out_dir).orderBy("time").collect()
    assert got[0]["tas_qc"] == "Y"
    assert got[1]["tas_qc"] == "8"  # numeric-looking flag verbatim


def test_cli_compact_keeps_null_time_rows(spark, tmp_path):
    import pandas as pd

    src = str(tmp_path / "with_nulls")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2020-01-01", None, "2020-01-02", None]
            ),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "compacted_nulls")
    rc = main(
        ["compact", "--input", src, "--output", out,
         "--time-col", "ts", "--target-rows", "2"],
        spark=spark,
    )
    assert rc == 0
    back = spark.read.parquet(out)
    assert back.count() == 4
    assert back.where("ts IS NULL").count() == 2
