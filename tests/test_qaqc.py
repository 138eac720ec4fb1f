"""End-to-end QA/QC chain tests with planted defects (FIXTURES.md):
synthetic stations where the expected flag set is known exactly."""

import zlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark.operators import qaqc as Q
from historical_obs_platform_spark.plans.qaqc_chain import run_qaqc
from historical_obs_platform_spark.plans.merge import (
    derive_missing,
    flag_counts,
    hourly_standardize,
)

HOURS = 24 * 40  # 40 days


def _station(name, t0="2020-01-01", hours=HOURS, lat=40.0, lon=-120.0, elev=100.0):
    times = pd.date_range(t0, periods=hours, freq="h")
    # stable seed (process-salted hash() made fixtures nondeterministic)
    rng = np.random.RandomState(zlib.crc32(name.encode()) % 2**31)
    tas = 285.0 + 8 * np.sin(np.arange(hours) * 2 * np.pi / 24) + rng.normal(0, 0.3, hours)
    return pd.DataFrame(
        {
            "station": name,
            "time": times,
            "lat": lat,
            "lon": lon,
            "elevation": elev,
            "tas": tas,
            "tdps": tas - 5.0,
            "pr": np.round(rng.uniform(0, 2, hours), 2),
            "sfcWind": np.round(rng.uniform(0.5, 10, hours), 1),
            "sfcWind_dir": np.round(rng.uniform(1, 360, hours), 0),
            "ps": 95000.0 + rng.normal(0, 100, hours),
        }
    )


@pytest.fixture(scope="module")
def qaqc_result(spark):
    a = _station("NET_A")
    # D1: world record — tas above 329.92 K
    a.loc[100, "tas"] = 340.0
    # D2: supersaturation — tdps > tas on two rows
    a.loc[[200, 201], "tdps"] = a.loc[[200, 201], "tas"] + 2.0
    # D8: spike — one isolated +30 K excursion
    a.loc[300, "tas"] += 30.0
    # D4/L6 interplay: negative precip is caught by the world-record
    # minimum (0) first, exactly as in the reference order
    a.loc[400, "pr"] = -5.0
    # D5: calm wind with nonzero direction
    a.loc[500, ["sfcWind", "sfcWind_dir"]] = [0.0, 90.0]
    # D5b: moving wind with direction 0 -> rewritten 360, flag 15
    a.loc[600, ["sfcWind", "sfcWind_dir"]] = [5.0, 0.0]
    # D19: sentinel value in tas
    a.loc[700, "tas"] = -999.0

    b = _station("NET_B")
    # D3: wet-bulb streak — tas == tdps for 30 hours
    b.loc[100:129, "tdps"] = b.loc[100:129, "tas"].to_numpy()
    # D9: straight streak — constant tas for 30 hours
    b.loc[400:429, "tas"] = 280.0

    c = _station("NET_C")
    # D17: whole-station rejection — lat/lon all null
    c["lat"] = np.nan
    c["lon"] = np.nan

    d = _station("NET_D")
    # D18/L8: two elevations >50 m apart; minority flagged 36
    d.loc[: HOURS // 4, "elevation"] = 200.0  # minority (~25%)
    d.loc[HOURS // 4 + 1 :, "elevation"] = 100.0
    # D21: pressure delivered in hPa (mean < 10000)
    d["ps"] = d["ps"] / 100.0

    pdf = pd.concat([a, b, c, d], ignore_index=True)
    sdf = spark.createDataFrame(pdf)
    # 40-day records are below the ≥5-year distribution-test gate, so
    # run the structural/logic chain here; tests/test_distribution.py
    # exercises the full chain on 6-year stations.
    out = run_qaqc(
        sdf, sentinels={"tas": ["-999", "-999.0"]}, with_distribution=False
    )
    return out.toPandas().set_index(["station", "time"]).sort_index()


def _flags(res, station, var):
    s = res.loc[station][f"{var}_eraqc"]
    return s[s.notna()]


def test_d1_world_record(qaqc_result):
    f = _flags(qaqc_result, "NET_A", "tas")
    t340 = qaqc_result.loc["NET_A"].query("tas == 340.0")
    assert len(t340) == 1
    assert f.loc[t340.index[0]] == 11


def test_d2_supersaturation(qaqc_result):
    f = _flags(qaqc_result, "NET_A", "tdps")
    assert (f == 12).sum() == 2


def test_d8_spike(qaqc_result):
    f = _flags(qaqc_result, "NET_A", "tas")
    assert (f == 23).sum() >= 1


def test_d4_negative_precip_caught_by_world_record(qaqc_result):
    f = _flags(qaqc_result, "NET_A", "pr")
    pr_neg = qaqc_result.loc["NET_A"].query("pr == -5.0")
    assert f.loc[pr_neg.index[0]] == 11


def test_d5_calm_wind_dir(qaqc_result):
    a = qaqc_result.loc["NET_A"]
    bad = a[(a["sfcWind"] == 0.0) & (a["sfcWind_dir"] == 90.0)]
    assert len(bad) == 1
    assert bad["sfcWind_dir_eraqc"].iloc[0] == 14


def test_d5b_northerly_rewrite(qaqc_result):
    a = qaqc_result.loc["NET_A"]
    rewritten = a[a["sfcWind_dir_eraqc"] == 15]
    assert len(rewritten) == 1
    assert rewritten["sfcWind_dir"].iloc[0] == 360.0
    assert rewritten["sfcWind"].iloc[0] == 5.0


def test_d19_sentinel_nulled_not_flagged(qaqc_result):
    a = qaqc_result.loc["NET_A"]
    assert not (a["tas"] == -999.0).any()
    assert a["tas"].isna().sum() == 1


def test_d3_wetbulb_streak(qaqc_result):
    f = _flags(qaqc_result, "NET_B", "tdps")
    assert (f == 13).sum() == 30


def test_d9_straight_streak(qaqc_result):
    f = _flags(qaqc_result, "NET_B", "tas")
    assert (f == 28).sum() == 30


def test_d17_station_rejected(qaqc_result):
    assert "NET_C" not in qaqc_result.index.get_level_values(0)


def test_d18_elevation_minority_flagged(qaqc_result):
    d = qaqc_result.loc["NET_D"]
    flagged = d[d["elevation_eraqc"] == 36]
    assert len(flagged) > 0
    assert (flagged["elevation"] == 200.0).all()


def test_d21_pressure_units_fixed(qaqc_result):
    d = qaqc_result.loc["NET_D"]
    assert d["ps"].mean() > 90000
    assert not (d["ps_eraqc"] == 11).any()


def test_clean_twin_unflagged(qaqc_result):
    """The undisturbed remainder of NET_A must be (almost) flag-free:
    no check may over-flag clean data."""
    a = qaqc_result.loc["NET_A"]
    n = len(a)
    for var in ("tas", "tdps", "pr", "sfcWind", "ps"):
        flagged = a[f"{var}_eraqc"].notna().sum()
        assert flagged <= 0.01 * n, f"{var}: {flagged}/{n} flagged"


def test_negative_precip_flag_direct(spark):
    """Flag 10 fires when the negative-precip check runs standalone
    (in the full chain the world-record minimum 0 wins, as in the
    reference order)."""
    pdf = pd.DataFrame(
        {
            "station": ["S"] * 3,
            "time": pd.date_range("2020-01-01", periods=3, freq="h"),
            "pr": [1.0, -3.0, 0.5],
        }
    )
    df = Q.ensure_flag_columns(spark.createDataFrame(pdf))
    out = Q.negative_precip_check(df).toPandas()
    assert list(out["pr_eraqc"].fillna(0)) == [0, 10, 0]


def test_precip_accum_ordering(spark):
    pdf = pd.DataFrame(
        {
            "station": ["S"] * 3,
            "time": pd.date_range("2020-01-01", periods=3, freq="h"),
            "pr_5min": [1.0, 9.0, 0.5],
            "pr_1h": [2.0, 3.0, 1.0],
        }
    )
    df = Q.ensure_flag_columns(spark.createDataFrame(pdf))
    out = (
        Q.precip_accum_ordering_check(df)
        .toPandas()
        .sort_values("time", ignore_index=True)
    )
    assert out["pr_5min_eraqc"].fillna(0).tolist() == [0, 16, 0]
    assert out["pr_1h_eraqc"].fillna(0).tolist() == [0, 17, 0]


def test_deaccumulate_precip(spark):
    pdf = pd.DataFrame(
        {
            "station": ["S"] * 5,
            "time": pd.date_range("2020-01-01", periods=5, freq="h"),
            "accum_pr": [10.0, 12.5, 12.5, 0.0, 1.0],  # reset at idx 3
        }
    )
    from historical_obs_platform_spark.plans.qaqc_chain import (
        deaccumulate_precip,
    )

    df = Q.ensure_flag_columns(spark.createDataFrame(pdf))
    out = (
        deaccumulate_precip(df).toPandas().sort_values("time", ignore_index=True)
    )
    assert out["pr"].fillna(-1).tolist() == [-1, 2.5, 0.0, 0.0, 1.0]
    assert (out["accum_pr_eraqc"] == 35).all()


def test_derive_missing_and_synergistic_flag(spark):
    pdf = pd.DataFrame(
        {
            "station": ["S"] * 3,
            "time": pd.date_range("2020-01-01", periods=3, freq="h"),
            "tas": [290.0, 295.0, 300.0],
            "hurs": [50.0, 80.0, 100.0],
            "tas_eraqc": [None, 11.0, None],
            "hurs_eraqc": [None, None, None],
        }
    )
    out = derive_missing(spark.createDataFrame(pdf)).toPandas().sort_values(
        "time", ignore_index=True
    )
    assert "tdps_derived" in out.columns
    assert out["tdps_derived"].notna().all()
    assert (out["tdps_derived"] <= out["tas"] + 0.1).all()
    # synergistic flag 38 exactly where an input was flagged
    assert out["tdps_derived_eraqc"].fillna(0).tolist() == [0, 38, 0]


def test_hourly_standardize(spark):
    times = pd.to_datetime(
        [
            "2020-01-01 00:10",
            "2020-01-01 00:40",
            "2020-01-01 01:20",
            # hour 02 missing entirely -> infill row
            "2020-01-01 03:05",
        ]
    )
    pdf = pd.DataFrame(
        {
            "station": ["S"] * 4,
            "time": times,
            "lat": 40.0,
            "lon": -120.0,
            "elevation": 10.0,
            "tas": [280.0, 281.0, 282.0, 283.0],
            "pr": [1.0, 2.0, 0.5, np.nan],
            "tas_eraqc": [None, 23.0, None, None],
            "pr_eraqc": [None, None, None, None],
        }
    )
    out = (
        hourly_standardize(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("time", ignore_index=True)
    )
    assert len(out) == 4  # hours 00..03
    h0 = out.iloc[0]
    assert h0["tas"] == 280.0  # first in hour
    assert h0["pr"] == 3.0  # summed
    assert h0["tas_eraqc"] == "23"  # distinct flags joined
    h2 = out.iloc[2]
    assert h2["standardized_infill"] == "y"
    assert h2["lat"] == 40.0  # constant carried onto infill row
    assert pd.isna(h2["pr"])  # no obs -> null, not 0
    h3 = out.iloc[3]
    assert h3["pr"] is None or pd.isna(h3["pr"])  # all-NaN hour sums to null


def test_flag_counts(spark):
    pdf = pd.DataFrame(
        {
            "station": ["S1", "S1", "S2"],
            "time": pd.date_range("2020-01-01", periods=3, freq="h"),
            "tas": [1.0, 2.0, 3.0],
            "tas_eraqc": ["11,23", "11", None],
        }
    )
    out = flag_counts(spark.createDataFrame(pdf)).toPandas()
    got = {
        (r.station, r.variable, r.flag): r.n for r in out.itertuples()
    }
    assert got == {("S1", "tas", 11): 2, ("S1", "tas", 23): 1}


def test_sensor_height_gates(spark):
    """Flags 6/7/8/9: whole-station instrument-height gates
    (qaqc_wholestation.py:579-689) — missing → 6/8, off-nominal →
    7/9, conforming stations untouched, prior flags not overwritten."""
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.operators import qaqc as Q

    rows = [
        # station, tas, wind, dir, therm_h, anem_h
        ("miss_t", 280.0, 3.0, 90.0, None, 10.1),
        ("miss_t", 281.0, 3.0, 90.0, 2.0, 10.1),   # any-null => whole stn
        ("off_t", 280.0, 3.0, 90.0, 3.0, 10.0),
        ("ok", 280.0, 3.0, 90.0, 2.2, 9.8),
        ("miss_w", 280.0, 3.0, 90.0, 2.0, None),
        ("off_w", 280.0, 3.0, 90.0, 2.0, 12.5),
    ]
    df = spark.createDataFrame(
        rows,
        "station string, tas double, sfcWind double, sfcWind_dir double,"
        " thermometer_height_m double, anemometer_height_m double",
    )
    out = Q.sensor_height_check(df)
    got = {
        (r.station, r.tas_eraqc, r.sfcWind_eraqc, r.sfcWind_dir_eraqc)
        for r in out.collect()
    }
    assert ("miss_t", 6.0, None, None) in got
    assert ("off_t", 7.0, None, None) in got
    assert ("ok", None, None, None) in got
    assert ("miss_w", None, 8.0, 8.0) in got
    assert ("off_w", None, 9.0, 9.0) in got

    # valid-mask: a pre-existing tas flag is not overwritten
    pre = df.withColumn(
        "tas_eraqc",
        F.when(F.col("station") == "miss_t", 11.0).cast("double"),
    )
    out2 = Q.sensor_height_check(pre)
    vals = {
        r.tas_eraqc for r in out2.where(F.col("station") == "miss_t").collect()
    }
    assert vals == {11.0}
