"""Per-network cleaner quirk tables (sources/networks.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark.registry import load_all
from historical_obs_platform_spark.sources.networks import (
    NETWORKS,
    clean_network,
)

from .conftest import assert_matches_oracle

load_all()

NETWORK_QUERIES = [
    "n_cimis_clean",
    "n_scansnotel_clean",
    "n_cw3e_clean",
    "n_maritime_clean",
    "n_valleywater_clean",
]


@pytest.mark.parametrize("name", NETWORK_QUERIES)
def test_network_roundtrip_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_absent_columns_are_skipped(spark):
    """Reference guards every variable with `if ... in ds.keys()` —
    a frame missing most raw columns must clean without error."""
    df = spark.createDataFrame(
        [("CI1", "2014-01-01 00:00:00", 12.5)],
        "station string, time string, `Air Temperature (C)` double",
    ).withColumn("time", F.to_timestamp("time"))
    out = clean_network(df, "CIMIS")
    row = out.collect()[0]
    assert row["tas"] == 12.5 + 273.15
    # PST -> UTC shift applied
    assert row["time"].hour == 8
    assert "hurs" not in out.columns


def test_period_filter_drops_out_of_window(spark):
    df = spark.createDataFrame(
        [("CW1", "1979-12-31 23:00:00", 1.0), ("CW1", "2014-06-01 00:00:00", 2.0)],
        "station string, time string, `Precipitation (mm)` double",
    ).withColumn("time", F.to_timestamp("time"))
    out = clean_network(df, "CW3E")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["pr"] == 2.0


def test_qc_columns_become_strings(spark):
    df = spark.createDataFrame(
        [("S1", "2014-01-01 00:00:00", 32.0, 3)],
        "station string, time string, TOBS_value double, TOBS_flag int",
    ).withColumn("time", F.to_timestamp("time"))
    out = clean_network(df, "SCANSNOTEL")
    assert dict(out.dtypes)["tas_qc"] == "string"
    row = out.collect()[0]
    assert row["tas"] == 273.15  # 32 F exactly freezing
    assert row["tas_qc"] == "3"


def test_specs_reference_known_conversions():
    from historical_obs_platform_spark.sources.networks import CONVERSIONS

    for spec in NETWORKS.values():
        for conv in spec.conversions.values():
            assert conv in CONVERSIONS, (spec.name, conv)


def test_cleaner_plan_is_shuffle_free(spark):
    """The whole cleaner must stay a projection + filter — no
    Exchange in the plan (it pipelines into the scan at any scale)."""
    df = spark.range(10).select(
        F.concat(F.lit("CI"), F.col("id").cast("string")).alias("station"),
        F.timestamp_seconds(F.lit(1400000000) + F.col("id")).alias("time"),
        F.col("id").cast("double").alias("Air Temperature (C)"),
        F.col("id").cast("double").alias("elevation"),
    )
    plan = clean_network(df, "CIMIS")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


NETWORK_QUERIES_R3 = [
    "n_cwop_clean",
    "n_raws_clean",
    "n_hads_clean",
    "n_cdec_clean",
    "n_ndbc_clean",
    "n_asosawos_stations",
]


@pytest.mark.parametrize("name", NETWORK_QUERIES_R3)
def test_synoptic_roundtrip_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_ps_preference_nulls_psl_per_station(spark):
    """MADIS_clean.py:1131-1160 — a station with ANY observed ps
    drops psl on every row; a station with none keeps psl."""
    df = spark.createDataFrame(
        [
            ("CDEC_A", "2014-01-01 00:00:00", 85000.0, 101000.0),
            ("CDEC_A", "2014-01-01 01:00:00", None, 101100.0),
            ("CDEC_B", "2014-01-01 00:00:00", None, 101200.0),
        ],
        "station string, time string, pressure_set_1 double, "
        "sea_level_pressure_set_1 double",
    ).withColumn("time", F.to_timestamp("time"))
    out = clean_network(df, "CDEC")
    rows = {(r["station"], str(r["time"])): r for r in out.collect()}
    assert rows[("CDEC_A", "2014-01-01 00:00:00")]["psl"] is None
    assert rows[("CDEC_A", "2014-01-01 01:00:00")]["psl"] is None  # ANY, not row-wise
    assert rows[("CDEC_B", "2014-01-01 00:00:00")]["psl"] == 101200.0


def test_synoptic_specs_share_vocabulary():
    """CWOP/RAWS/HADS/CDEC are the same cleaner as MADIS (the
    reference runs one script over all of them)."""
    m = NETWORKS["MADIS"]
    roster = [
        "CWOP", "RAWS", "HADS", "CDEC", "CAHYDRO", "CNRFC", "CRN",
        "HNXWFO", "HOLFUY", "HPWREN", "LOXWFO", "MAP", "MTRWFO",
        "NCAWOS", "NOS-NWLON", "NOS-PORTS", "SGXWFO", "SHASAVAL",
        "VCAPCD",
    ]
    for name in roster:
        s = NETWORKS[name]
        assert s.renames == m.renames
        assert s.conversions == m.conversions
        assert s.qc_renames == m.qc_renames
        assert s.psl_only_if_no_ps


def test_merge_station_lists_tiers(spark):
    from historical_obs_platform_spark.sources.networks import (
        merge_station_lists,
    )

    isd = spark.createDataFrame(
        [
            (1, 10.125, -20.25, "exact-match"),
            (2, 11.125, -21.25, "coord-mismatch"),
            (3, 12.125, -22.25, "no-asos-row"),
        ],
        "WBAN int, LAT double, LON double, isd_name string",
    )
    asos = spark.createDataFrame(
        [
            # WBAN 1: exact coordinate match + a null-STARTDATE
            # duplicate that must lose the dedup
            (1, 10.1254, -20.2496, 100, "2001-05-15", "A1"),
            (1, 10.1254, -20.2496, 100, None, "A1-dup"),
            # WBAN 2: coordinates disagree -> WBAN-only fallback
            (2, 99.0, -99.0, 200, "2002-06-15", "A2"),
        ],
        "WBAN int, LAT double, LON double, NCDCID int, "
        "STARTDATE string, asos_name string",
    )
    out = merge_station_lists(isd, asos)
    rows = {r["WBAN"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[1]["asos_name"] == "A1"          # dedup kept dated row
    assert rows[1]["NCDCID"] == 100              # tier-1 exact join
    assert rows[2]["asos_name"] == "A2"          # tier-2 WBAN fallback
    assert rows[2]["LAT"] == 11.125              # ISD coords survive
    assert rows[3]["NCDCID"] is None             # no match -> nulls


def test_synoptic_cleaner_shuffle_free_without_pressure(spark):
    """The ps-over-psl rule is the ONLY shuffle in the Synoptic
    cleaner, and it must appear only when both pressure columns
    exist — every other frame stays projection+filter."""
    df = spark.range(10).select(
        F.concat(F.lit("CWOP_"), F.col("id").cast("string")).alias(
            "station"
        ),
        F.timestamp_seconds(F.lit(1400000000) + F.col("id")).alias("time"),
        F.col("id").cast("double").alias("air_temp_set_1"),
    )
    plan = (
        clean_network(df, "CWOP")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_station_clean_audit_semantics(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "n_station_audit")


def test_station_clean_audit_edge_cases(spark):
    """stnlist_update_clean.py clean_qa semantics: off-list cleaned
    ids append with Cleaned=Y; pre-clean errors drop; one error
    reports bare, several concatenate 'File: Error'; ambiguous
    filename matches go to the longest suffix."""
    from historical_obs_platform_spark.sources.networks import (
        station_clean_audit,
    )

    stations = spark.createDataFrame(
        [("S1", "one"), ("S12", "twelve")], "STID string, nm string"
    )
    cleaned = spark.createDataFrame(
        [
            ("CWOP_S1", "2023-01-10 00:00"),
            ("CWOP_OFFLIST", "2023-01-05 00:00"),
        ],
        "ID string, Time_Cleaned string",
    )
    errors = spark.createDataFrame(
        [
            # matches both S1 and S12 -> longest suffix wins (S12)
            ("CWOP_S12-a.csv", "2023-02-01 00:00", "bad header"),
            ("CWOP_S12-b.csv", "2023-02-02 00:00", "bad row"),
            # S1 errors: one before clean time (dropped), one after
            ("CWOP_S1-c.csv", "2023-01-01 00:00", "stale"),
            ("CWOP_S1-d.csv", "2023-01-20 00:00", "fresh"),
        ],
        "File string, Time string, Error string",
    )
    out = station_clean_audit(stations, cleaned, errors, "CWOP")
    rows = {r["era_id"]: r for r in out.collect()}
    assert set(rows) == {"CWOP_S1", "CWOP_S12", "CWOP_OFFLIST"}
    assert rows["CWOP_OFFLIST"]["Cleaned"] == "Y"
    assert rows["CWOP_OFFLIST"]["nm"] is None
    assert rows["CWOP_S1"]["Cleaned"] == "Y"
    # single surviving error -> bare message (pre-clean one dropped)
    assert rows["CWOP_S1"]["Errors"] == "fresh"
    # S12 never cleaned -> keeps both, multi format, time order
    assert rows["CWOP_S12"]["Cleaned"] == "N"
    assert rows["CWOP_S12"]["Errors"] == (
        "CWOP_S12-a.csv: bad header CWOP_S12-b.csv: bad row"
    )


def test_era_id_families(spark):
    """ERA-ID standardization rules per network family
    (stnlist_update_clean.py:214-257)."""
    from historical_obs_platform_spark.sources.networks import era_id

    def one(network, schema, row):
        df = spark.createDataFrame([row], schema)
        return df.select(era_id(network).alias("e")).collect()[0]["e"]

    assert (
        one("ASOSAWOS", "`ISD-ID` string", ("724940-23234",))
        == "ASOSAWOS_72494023234"
    )
    assert (
        one("otherisd", "`ISD-ID` string", ("999999-00123",))
        == "OTHERISD_99999900123"  # upper() applies to the whole id
    )
    assert one("CIMIS", "`Station Number` double", (7.0,)) == "CIMIS_7"
    assert one("CW3E", "STID string", ("C3XYZ",)) == "CW3E_XYZ"
    assert one("CWOP", "STID string", ("dw1234",)) == "CWOP_DW1234"
    assert one("NDBC", "STATION_ID string", ("46042",)) == "NDBC_46042"
    assert (
        one("SCANSNOTEL", "stationTriplet string", ("356:CA:SNTL",))
        == "SCANSNOTEL_356"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no ERA-ID rule"):
        era_id("UNKNOWN_NETWORK")


def test_stationlist_union_and_public_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "n_stationlist_union")
    assert_matches_oracle(spark, oracle_con, "n_public_stations")


def test_harmonize_prefers_exact_and_specific_rules(spark):
    """'time_cleaned' must land on its own canonical name, not the
    bare 'cleaned' rule; an exact name beats a substring cousin."""
    from historical_obs_platform_spark.sources.networks import (
        harmonize_station_lists,
    )

    df = spark.createDataFrame(
        [("X_1", "Y", "2020-01-01", 12.5, 40.0)],
        "`ERA-ID` string, cleaned string, Time_Cleaned string, "
        "`elevation_ft` double, `latitude` double",
    )
    out = harmonize_station_lists({"X": df})
    cols = set(out.columns)
    assert {"era_id", "cleaned", "time_cleaned", "elevation",
            "latitude", "network"} <= cols
    row = out.collect()[0]
    assert row["time_cleaned"] == "2020-01-01"
    assert row["cleaned"] == "Y"
    assert row["latitude"] == 40.0  # exact match untouched


def test_tag_polygons_first_tag_and_nulls(spark):
    from historical_obs_platform_spark.operators.geo import tag_polygons

    pts = spark.createDataFrame(
        [(1, 1.5, -1.5), (2, 5.5, -5.5), (3, 20.0, -20.0), (4, None, -1.0)],
        "id int, lat double, lon double",
    )
    # overlapping polygons: 'AA' and 'ZZ' both contain point 1 — the
    # ascending-tag rule must pick 'AA' regardless of table row order
    polys = spark.createDataFrame(
        [
            ("ZZ", "POLYGON ((-4 0, 0 0, 0 4, -4 4, -4 0))"),
            ("AA", "POLYGON ((-2 1, -1 1, -1 2, -2 2, -2 1))"),
            ("OR", "POLYGON ((-8 4, -4 4, -4 8, -8 8, -8 4))"),
        ],
        "tag string, wkt string",
    )
    out = {r["id"]: r["region_tag"] for r in tag_polygons(
        pts, polys, tag_col="tag"
    ).collect()}
    assert out[1] == "AA"
    assert out[2] == "OR"
    assert out[3] is None
    assert out[4] is None
