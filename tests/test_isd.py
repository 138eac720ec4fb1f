"""ISD fixed-width parser test with synthetic records built to the
documented field layout (FIXTURES.md §6)."""

import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark.sources.isd import (
    WECC_BBOX,
    parse_isd_lines,
)


def _record(
    usaf="722900",
    wban="23188",
    ts="202001151230",
    lat="+37735",
    lon="-122221",
    elev="+0010",
    wdir="270",
    wspd="0051",
    tas="+0256",
    tdps="+0120",
    psl="10132",
    extra="",
):
    s = [" "] * 105
    def put(start, text):
        for i, ch in enumerate(text):
            s[start + i] = ch
    put(0, "0165")
    put(4, usaf)
    put(10, wban)
    put(15, ts)
    put(27, "7")
    put(28, lat)
    put(34, lon)
    put(41, "FM-15")
    put(46, elev)
    put(51, "KSFO ")
    put(56, "V020")
    put(60, wdir)
    put(63, "1")
    put(64, "N")
    put(65, wspd)
    put(69, "1")
    put(70, "22000")
    put(75, "199")
    put(78, "016093")
    put(84, "199")
    put(87, tas)
    put(92, "1")
    put(93, tdps)
    put(98, "1")
    put(99, psl)
    put(104, "1")
    return "".join(s) + extra


@pytest.fixture(scope="module")
def parsed(spark):
    lines = [
        # full record with AA1 precip + MA1 pressure sections
        _record(extra="ADDAA101000591MA1101351100881"),
        # sentinel-coded record (temps, dewpoint, pressure missing)
        _record(
            ts="202001151330",
            tas="+9999",
            tdps="+9999",
            psl="99999",
            wdir="999",
            wspd="9999",
        ),
        # out-of-WECC record (Atlantic coast)
        _record(ts="202001151430", lat="+40700", lon="-074000"),
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    return parse_isd_lines(df).orderBy("time").toPandas()


def test_mandatory_fields(parsed):
    r = parsed.iloc[0]
    assert r["station"] == "ASOSAWOS_72290023188"
    assert str(r["time"]) == "2020-01-15 12:30:00"
    assert r["lat"] == pytest.approx(37.735)
    assert r["lon"] == pytest.approx(-122.221)
    assert r["elevation"] == pytest.approx(10.0)
    assert r["sfcWind_dir"] == pytest.approx(270.0)
    assert r["sfcWind"] == pytest.approx(5.1)
    assert r["tas"] == pytest.approx(25.6 + 273.15)
    assert r["tdps"] == pytest.approx(12.0 + 273.15)
    assert r["psl"] == pytest.approx(101320.0)


def test_optional_sections(parsed):
    r = parsed.iloc[0]
    assert r["pr"] == pytest.approx(0.5)  # AA1 depth 0005 / 10
    assert r["pr_duration_h"] == 1
    assert r["ps_altimeter"] == pytest.approx(1013.5 * 100)
    assert r["ps"] == pytest.approx(1008.8 * 100)
    # record without ADD sections -> nulls
    r2 = parsed.iloc[1]
    assert pytest.approx(r2["lat"]) == 37.735
    for c in ("pr", "ps", "ps_altimeter", "hurs", "rsds"):
        assert r2[c] is None or r2[c] != r2[c]  # null/NaN


def test_sentinels_null(parsed):
    r = parsed.iloc[1]
    for c in ("tas", "tdps", "psl", "sfcWind", "sfcWind_dir"):
        assert r[c] is None or r[c] != r[c], c


def test_bbox_filter(spark, parsed):
    from historical_obs_platform_spark.sources.isd import parse_isd_lines

    df = spark.createDataFrame(
        [(_record(ts="202001151430", lat="+40700", lon="-074000"),)],
        "value string",
    )
    out = parse_isd_lines(df).where(
        F.col("lat").between(WECC_BBOX["latmin"], WECC_BBOX["latmax"])
        & F.col("lon").between(WECC_BBOX["lonmin"], WECC_BBOX["lonmax"])
    )
    assert out.count() == 0
