"""Geospatial gate, co-location concat, buoy rules, elevation infill."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark.operators import concat as C
from historical_obs_platform_spark.operators import geo as G
from historical_obs_platform_spark.operators import qaqc as Q

# a simple square "region": lon -125..-115, lat 35..45
SQUARE = [[(-125.0, 35.0), (-115.0, 35.0), (-115.0, 45.0), (-125.0, 45.0)]]


def test_point_in_polygon(spark):
    df = spark.createDataFrame(
        [
            ("IN", 40.0, -120.0),
            ("OUT_E", 40.0, -110.0),
            ("OUT_N", 50.0, -120.0),
            ("NULL", None, None),
        ],
        "station string, lat double, lon double",
    )
    out = G.within_polygon(df, SQUARE).toPandas().set_index("station")
    assert out.loc["IN", "in_region"]
    assert not out.loc["OUT_E", "in_region"]
    assert not out.loc["OUT_N", "in_region"]
    assert not bool(out.loc["NULL", "in_region"])


def test_station_region_gate(spark):
    df = spark.createDataFrame(
        [("A", 40.0, -120.0), ("B", 10.0, -120.0)],
        "station string, lat double, lon double",
    )
    rejects = G.station_region_gate(df, SQUARE).toPandas()
    assert rejects["station"].tolist() == ["B"]


def test_bbox_filter_pushdown(spark):
    df = spark.createDataFrame(
        [("A", 40.0, -120.0), ("B", 10.0, -10.0)],
        "station string, lat double, lon double",
    )
    out = G.bbox_filter(df, 26, 60, -140, -100)
    assert [r.station for r in out.collect()] == ["A"]


def test_colocation_and_keep_newer_concat(spark):
    stations = spark.createDataFrame(
        [("OLD", 40.0, -120.0), ("NEW", 40.0, -120.0), ("LONER", 41.0, -121.0)],
        "station string, latitude double, longitude double",
    )
    groups = C.colocation_groups(stations)
    g = groups.toPandas().set_index("station")
    assert g.loc["OLD", "colocation_group"] == g.loc["NEW", "colocation_group"]
    assert g.loc["LONER", "n_colocated"] == 1

    times = pd.date_range("2020-01-01", periods=6, freq="h")
    obs = spark.createDataFrame(
        pd.DataFrame(
            {
                "station": ["OLD"] * 4 + ["NEW"] * 3,
                "time": list(times[:4]) + list(times[2:5]),
                "tas": [280.0, 281.0, 282.0, 283.0, 982.0, 983.0, 984.0],
            }
        )
    )
    priority = spark.createDataFrame(
        [("OLD", 1), ("NEW", 2)], "station string, priority int"
    )
    merged = (
        C.concat_colocated(obs, groups, priority)
        .toPandas()
        .sort_values("time", ignore_index=True)
    )
    # hours 0-1 from OLD, 2-4 from NEW (newer wins overlap), renamed NEW
    assert (merged["station"] == "NEW").all()
    assert merged["tas"].tolist() == [280.0, 281.0, 982.0, 983.0, 984.0]


def test_buoy_blacklist(spark):
    times = pd.date_range("2020-01-01", periods=48, freq="h")
    obs = Q.ensure_flag_columns(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "station": ["BUOY_1"] * 48,
                    "time": times,
                    "sfcWind": 5.0,
                    "tas": 285.0,
                }
            )
        )
    )
    rules = spark.createDataFrame(
        [
            # disestablished after Jan 1 23:00 -> flag 2 on all vars
            ("BUOY_1", None, "2020-01-02 00:00:00", None, 2, None, None),
            # daytime wind suspicious -> flag 1 on sfcWind 6-20h
            ("BUOY_1", "sfcWind", None, "2020-01-01 23:59:59", 1, 6, 20),
        ],
        "station string, variable string, window_start string, "
        "window_end string, flag int, hour_start int, hour_end int",
    )
    out = C.buoy_blacklist_check(obs, rules).toPandas()
    day2 = out[out["time"] >= "2020-01-02"]
    assert (day2["tas_eraqc"] == 2).all()
    assert (day2["sfcWind_eraqc"] == 2).all()
    day1_daytime = out[
        (out["time"] < "2020-01-02")
        & (out["time"].dt.hour >= 6)
        & (out["time"].dt.hour <= 20)
    ]
    assert (day1_daytime["sfcWind_eraqc"] == 1).all()
    assert day1_daytime["tas_eraqc"].isna().all()


def test_elevation_infill(spark):
    times = pd.date_range("2020-01-01", periods=4, freq="h")
    rows = []
    for st, elevs, lat, lon in [
        ("ALLNULL_DEM", [None] * 4, 40.0, -120.0),   # DEM hit -> 3
        ("ALLNULL_SEA", [None] * 4, 30.0, -130.0),   # no DEM -> 0.0, 5
        ("PARTIAL", [100.0, None, 100.0, None], 41.0, -121.0),  # 4
    ]:
        for t, e in zip(times, elevs):
            rows.append((st, t, lat, lon, e))
    obs = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["station", "time", "lat", "lon", "elevation"]
        )
    )
    dem = spark.createDataFrame(
        [(40.0, -120.0, 1234.0)], "lat double, lon double, dem_elevation double"
    )
    out = C.elevation_infill(obs, dem).toPandas()
    g = out.groupby("station")
    dem_rows = g.get_group("ALLNULL_DEM")
    assert (dem_rows["elevation"] == 1234.0).all()
    assert (dem_rows["elevation_eraqc"] == 3).all()
    sea = g.get_group("ALLNULL_SEA")
    assert (sea["elevation"] == 0.0).all()
    assert (sea["elevation_eraqc"] == 5).all()
    part = g.get_group("PARTIAL").sort_values("time")
    assert part["elevation"].tolist() == [100.0] * 4
    assert part["elevation_eraqc"].fillna(0).tolist() == [0, 4, 0, 4]


def test_parse_wkt_polygon_and_multipolygon():
    from historical_obs_platform_spark.operators.geo import parse_wkt

    p = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert len(p) == 1 and len(p[0]) == 1 and p[0][0][1] == (4.0, 0.0)
    mp = parse_wkt(
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0), "
        "(0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5)), "
        "((10 10, 12 10, 12 12, 10 12, 10 10)))"
    )
    assert len(mp) == 2
    assert len(mp[0]) == 2  # outer + hole
    assert len(mp[1]) == 1


def test_within_polygon_table_honors_holes(spark):
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.operators.geo import (
        within_polygon_table,
    )

    pts = spark.createDataFrame(
        [(0.25, 0.25), (1.0, 1.0), (11.0, 11.0), (5.0, 5.0)],
        "lon double, lat double",
    )
    polys = spark.createDataFrame(
        [
            (
                "r",
                "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0), "
                "(0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5)), "
                "((10 10, 12 10, 12 12, 10 12, 10 10)))",
            )
        ],
        "region string, wkt string",
    )
    got = {
        (r.lon, r.lat): r.in_region
        for r in within_polygon_table(pts, polys).collect()
    }
    assert got[(0.25, 0.25)] is True     # in outer ring
    assert got[(1.0, 1.0)] is False      # inside the hole
    assert got[(11.0, 11.0)] is True     # second polygon
    assert got[(5.0, 5.0)] is False      # outside everything


def test_metadata_backfill_prefers_observed_values(spark):
    from historical_obs_platform_spark.operators.concat import (
        metadata_backfill,
    )

    obs = spark.createDataFrame(
        [("s1", 1.0, None), ("s2", None, None)],
        "station string, lat double, elevation double",
    )
    meta = spark.createDataFrame(
        [
            ("s1", 2, 9.0, 90.0, "alt"),
            ("s1", 1, 8.0, 80.0, "main"),   # wins: lower rank
            ("s2", 1, 7.0, 70.0, "only"),
        ],
        "station string, pref_rank int, lat double,"
        " elevation double, station_name string",
    )
    out = metadata_backfill(
        obs,
        meta,
        rank_col="pref_rank",
        backfill=["lat", "elevation"],
        carry=["station_name"],
    )
    got = {
        r.station: (r.lat, r.elevation, r.station_name)
        for r in out.collect()
    }
    assert got["s1"] == (1.0, 80.0, "main")  # observed lat kept
    assert got["s2"] == (7.0, 70.0, "only")


def test_metadata_backfill_multirecord_no_fanout(spark):
    """A multi-record metadata table must not duplicate obs rows,
    even with no rank column; a null rank never beats a ranked one."""
    from historical_obs_platform_spark.operators.concat import (
        metadata_backfill,
    )

    obs = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 3.0)], "station string, v double"
    )
    meta = spark.createDataFrame(
        [("A", "x", 2), ("A", "y", 1), ("A", "z", None), ("B", "w", 1)],
        "station string, name string, pref int",
    )
    # default rank_col=None: deterministic, one record per station
    out = metadata_backfill(obs, meta, carry=["name"])
    assert out.count() == 3
    # ranked: min pref wins; the NULL-pref record never does
    out2 = metadata_backfill(obs, meta, rank_col="pref", carry=["name"])
    assert out2.count() == 3
    got = {r["station"]: r["name"] for r in out2.collect()}
    assert got["A"] == "y"


def test_merge_changeset_unknown_op_is_ignored(spark):
    """An unrecognized op value must not delete the base row."""
    from historical_obs_platform_spark.plans.incremental import (
        merge_changeset,
    )

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    chg = spark.createDataFrame(
        [(1, "A", "Update"), (2, "B", "upsert")], "k long, v string, op string"
    )
    got = {
        r["k"]: r["v"]
        for r in merge_changeset(base, chg, keys=("k",)).collect()
    }
    assert got == {1: "a", 2: "B"}


def test_csv_obs_empty_renames_means_none(spark, tmp_path):
    """renames={} must disable the MADIS default map entirely."""
    import csv

    from historical_obs_platform_spark.sources.csv_obs import read_csv_obs

    d = tmp_path / "raw"
    d.mkdir()
    with open(d / "f.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["station", "time", "air_temp_set_1"])
        w.writerow(["S1", "2014-01-01 00:00:00", "20.0"])
    out = read_csv_obs(spark, str(d), renames={}, period=None)
    assert "air_temp_set_1" in out.columns and "tas" not in out.columns
