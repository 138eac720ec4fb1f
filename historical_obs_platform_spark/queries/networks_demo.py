"""Per-network cleaner round-trips through the driver gate.

Same pattern as ``sources_demo``: Spark renders a raw-network-shaped
frame from ``events`` (raw column names, local clocks, imperial
units, QC-flag columns), the real ``clean_network`` quirk table
cleans it, and the DuckDB oracle computes the expected canonical
frame directly from the source numbers.  A wrong rename, a wrong
conversion constant, a missed QC column, or a broken PST→UTC shift
breaks the hash.

Unit arithmetic is float-exact on both sides (identical IEEE double
ops in the same order — see kernels.py constants vs the oracle SQL),
so these are hash oracles, not rounded ones.

Reference quirks under test, per network, are cited in
``sources/networks.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.networks import clean_network
from .common import table

# Rendered raw frames sit in Jan 2014 (events is Jan 2024, shifted
# back 10 years) so the v1 period filter keeps every row; the filter
# itself is separately gated by p5/P5 tests.
_BACK = "INTERVAL 10 YEARS"


N_CIMIS_ORACLE = """
SELECT 'CI' || CAST(user_id % 50 AS VARCHAR) AS station,
       ts - INTERVAL 10 YEAR + INTERVAL 8 HOUR AS time,
       value + 273.15 AS tas,
       value % 100.0 AS hurs,
       event_type AS tas_qc,
       CAST(user_id % 500 AS DOUBLE) * 0.3048 AS elevation
FROM events
"""


@query("n_cimis_clean", N_CIMIS_ORACLE)
def n_cimis_clean(spark, sf_dir):
    """CIMIS quirk table: °C→K, PST→UTC (+8 h), ft→m, QC renames.

    Reference: CIMIS_clean.py:234-256 (clock), :409 (elevation),
    :419-437 (tas), :500 (hurs).
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(F.lit("CI"), (F.col("user_id") % 50).cast("string")).alias(
            "station"
        ),
        (F.col("ts") - F.expr(_BACK)).alias("time"),
        F.col("value").alias("Air Temperature (C)"),
        (F.col("value") % 100.0).alias("Relative Humidity (%)"),
        F.col("event_type").alias("QC for Air Temperature"),
        (F.col("user_id") % 500).cast("double").alias("elevation"),
    )
    out = clean_network(raw, "CIMIS")
    return out.select("station", "time", "tas", "hurs", "tas_qc", "elevation")


N_SCANSNOTEL_ORACLE = """
SELECT 'SNTL' || CAST(user_id % 80 AS VARCHAR) AS station,
       ts - INTERVAL 10 YEAR AS time,
       (5.0 / 9.0) * (value - 32.0) + 273.15 AS tas,
       (20.0 + value % 10.0) * 3386.39 AS psl,
       (value % 5.0) * 25.4 AS pr,
       (value % 30.0) / 2.237 AS sfcWind,
       (value % 3.0) * 1000.0 AS pvp,
       event_type AS tas_qc
FROM events
"""


@query("n_scansnotel_clean", N_SCANSNOTEL_ORACLE)
def n_scansnotel_clean(spark, sf_dir):
    """SCAN/SNOTEL quirk table: sensor-code columns, imperial units.

    Reference: SCANSNOTEL_clean.py:383-618 (°F→K, inHg→Pa, in→mm,
    mph→m/s, kPa→Pa over ``{CODE}_value``/``{CODE}_flag`` pairs).
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(
            F.lit("SNTL"), (F.col("user_id") % 80).cast("string")
        ).alias("station"),
        (F.col("ts") - F.expr(_BACK)).alias("time"),
        F.col("value").alias("TOBS_value"),
        (F.lit(20.0) + F.col("value") % 10.0).alias("PRES_value"),
        (F.col("value") % 5.0).alias("PREC_value"),
        (F.col("value") % 30.0).alias("WSPD_value"),
        (F.col("value") % 3.0).alias("PVPV_value"),
        F.col("event_type").alias("TOBS_flag"),
    )
    out = clean_network(raw, "SCANSNOTEL")
    return out.select(
        "station", "time", "tas", "psl", "pr", "sfcWind", "pvp", "tas_qc"
    )


N_CW3E_ORACLE = """
SELECT 'CW' || CAST(user_id % 40 AS VARCHAR) AS station,
       ts - INTERVAL 10 YEAR AS time,
       value + 273.15 AS tas,
       (900.0 + value % 100.0) * 100.0 AS psl,
       value % 5.0 AS pr,
       value % 25.0 AS sfcWind
FROM events
"""


@query("n_cw3e_clean", N_CW3E_ORACLE)
def n_cw3e_clean(spark, sf_dir):
    """CW3E quirk table: °C→K, hPa→Pa, metric passthroughs.

    Reference: CW3E_clean.py:433-497.
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(F.lit("CW"), (F.col("user_id") % 40).cast("string")).alias(
            "station"
        ),
        (F.col("ts") - F.expr(_BACK)).alias("time"),
        F.col("value").alias("Air Temperature (C)"),
        (F.lit(900.0) + F.col("value") % 100.0).alias("Pressure (hPa)"),
        (F.col("value") % 5.0).alias("Precipitation (mm)"),
        (F.col("value") % 25.0).alias("Scalar Wind Speed (m/s)"),
    )
    out = clean_network(raw, "CW3E")
    return out.select("station", "time", "tas", "psl", "pr", "sfcWind")


N_MARITIME_ORACLE = """
SELECT 'NDBC' || CAST(46000 + user_id % 90 AS VARCHAR) AS station,
       ts - INTERVAL 10 YEAR AS time,
       value % 30.0 + 273.15 AS tas,
       value % 25.0 + 273.15 AS tdps,
       (980.0 + value % 50.0) * 100.0 AS ps
FROM events
"""


@query("n_maritime_clean", N_MARITIME_ORACLE)
def n_maritime_clean(spark, sf_dir):
    """MARITIME (NDBC buoy) quirk table: canonical names, metric-raw.

    Reference: MARITIME_clean.py:637-653.
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(
            F.lit("NDBC"), (F.lit(46000) + F.col("user_id") % 90).cast("string")
        ).alias("station"),
        (F.col("ts") - F.expr(_BACK)).alias("time"),
        (F.col("value") % 30.0).alias("tas"),
        (F.col("value") % 25.0).alias("tdps"),
        (F.lit(980.0) + F.col("value") % 50.0).alias("ps"),
    )
    out = clean_network(raw, "MARITIME")
    return out.select("station", "time", "tas", "tdps", "ps")


N_VALLEYWATER_ORACLE = """
SELECT 'VW' || CAST(user_id % 30 AS VARCHAR) AS station,
       ts - INTERVAL 10 YEAR AS time,
       (value % 2.0) * 25.4 AS pr
FROM events
"""


@query("n_valleywater_clean", N_VALLEYWATER_ORACLE)
def n_valleywater_clean(spark, sf_dir):
    """VALLEYWATER quirk table: precip-only, inches, UTC clock.

    Reference: VALLEYWATER_clean.py:105.
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(F.lit("VW"), (F.col("user_id") % 30).cast("string")).alias(
            "station"
        ),
        (F.col("ts") - F.expr(_BACK)).alias("time"),
        (F.col("value") % 2.0).alias("rainfall_in"),
    )
    out = clean_network(raw, "VALLEYWATER")
    return out.select("station", "time", "pr")


# ----------------------------------------------------------------------
# MADIS-family (Synoptic API) networks — the reference cleans CWOP,
# RAWS, HADS, CDEC with the same MADIS_clean.py script
# (MADIS_clean.py:1871-1875); each round-trip below exercises a
# different slice of the shared Synoptic quirk table.

N_CWOP_ORACLE = """
SELECT 'CWOP_C' || CAST(user_id % 60 AS VARCHAR) AS station,
       ts - INTERVAL 10 YEAR AS time,
       value + 273.15 AS tas,
       value % 100.0 AS hurs,
       value % 20.0 AS sfcWind,
       value % 4.0 AS pr_1h,
       event_type AS tas_qc,
       CAST(user_id % 800 AS DOUBLE) * 0.3048 AS elevation
FROM events
"""


@query("n_cwop_clean", N_CWOP_ORACLE)
def n_cwop_clean(spark, sf_dir):
    """CWOP via the shared Synoptic quirk table: °C→K, metric wind /
    precip passthrough, QC rename, elevation ft→m.

    Reference: MADIS_clean.py:1078 (tas), :1524 (hurs), :1589
    (sfcWind), :1328 (pr_1h), :782 (elevation); CWOP's
    first-letter station batching (:473-517) is ingest
    orchestration that Spark partitioning replaces.
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(
            F.lit("CWOP_C"), (F.col("user_id") % 60).cast("string")
        ).alias("station"),
        (F.col("ts") - F.expr(_BACK)).alias("time"),
        F.col("value").alias("air_temp_set_1"),
        (F.col("value") % 100.0).alias("relative_humidity_set_1"),
        (F.col("value") % 20.0).alias("wind_speed_set_1"),
        (F.col("value") % 4.0).alias("precip_accum_one_hour_set_1"),
        F.col("event_type").alias("air_temp_set_1_qc"),
        (F.col("user_id") % 800).cast("double").alias("elevation"),
    )
    out = clean_network(raw, "CWOP")
    return out.select(
        "station", "time", "tas", "hurs", "sfcWind", "pr_1h", "tas_qc",
        "elevation",
    )


N_RAWS_ORACLE = """
SELECT 'RAWS_R' || CAST(user_id % 45 AS VARCHAR) AS station,
       ts - INTERVAL 10 YEAR AS time,
       value + 273.15 AS tas,
       value % 22.0 + 273.15 AS tdps,
       value % 900.0 AS rsds,
       value % 360.0 AS sfcWind_dir,
       value % 8.0 AS pr,
       event_type AS sfcWind_dir_qc
FROM events
"""


@query("n_raws_clean", N_RAWS_ORACLE)
def n_raws_clean(spark, sf_dir):
    """RAWS via the shared Synoptic quirk table: both temperature
    conversions, solar/wind-direction/interval-precip passthrough.

    Reference: MADIS_clean.py:1227 (tdps), :1551 (rsds), :1609
    (sfcWind_dir), :1318 (pr).
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(
            F.lit("RAWS_R"), (F.col("user_id") % 45).cast("string")
        ).alias("station"),
        (F.col("ts") - F.expr(_BACK)).alias("time"),
        F.col("value").alias("air_temp_set_1"),
        (F.col("value") % 22.0).alias("dew_point_temperature_set_1"),
        (F.col("value") % 900.0).alias("solar_radiation_set_1"),
        (F.col("value") % 360.0).alias("wind_direction_set_1"),
        (F.col("value") % 8.0).alias("precip_accum_set_1"),
        F.col("event_type").alias("wind_direction_set_1_qc"),
    )
    out = clean_network(raw, "RAWS")
    return out.select(
        "station", "time", "tas", "tdps", "rsds", "sfcWind_dir", "pr",
        "sfcWind_dir_qc",
    )


N_HADS_ORACLE = """
SELECT 'HADS_H' || CAST(user_id % 35 AS VARCHAR) AS station,
       ts - INTERVAL 10 YEAR AS time,
       value % 60.0 AS pr_24h,
       value % 30.0 AS pr_localmid,
       value % 1.0 AS pr_5min,
       value % 18.0 + 273.15 AS tdps_derived,
       event_type AS pr_24h_qc
FROM events
"""


@query("n_hads_clean", N_HADS_ORACLE)
def n_hads_clean(spark, sf_dir):
    """HADS via the shared Synoptic quirk table: all three remaining
    precip-accumulation variants plus the derived dewpoint.

    Reference: MADIS_clean.py:1295 (pr_24h), :1306 (pr_localmid),
    :1340 (pr_5min), :1702 (tdps_derived °C→K).
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(
            F.lit("HADS_H"), (F.col("user_id") % 35).cast("string")
        ).alias("station"),
        (F.col("ts") - F.expr(_BACK)).alias("time"),
        (F.col("value") % 60.0).alias("precip_accum_24_hour_set_1"),
        (F.col("value") % 30.0).alias(
            "precip_accum_since_local_midnight_set_1"
        ),
        (F.col("value") % 1.0).alias("precip_accum_five_minute_set_1"),
        (F.col("value") % 18.0).alias("dew_point_temperature_set_1d"),
        F.col("event_type").alias("precip_accum_24_hour_set_1_qc"),
    )
    out = clean_network(raw, "HADS")
    return out.select(
        "station", "time", "pr_24h", "pr_localmid", "pr_5min",
        "tdps_derived", "pr_24h_qc",
    )


N_CDEC_ORACLE = """
WITH base AS (
  SELECT 'CDEC_D' || CAST(user_id % 40 AS VARCHAR) AS station,
         ts - INTERVAL 10 YEAR AS time,
         CASE WHEN user_id % 2 = 0 AND value % 7.0 < 3.0
              THEN 85000.0 + value ELSE NULL END AS ps,
         101000.0 + (value % 500.0) AS psl_raw
  FROM events)
SELECT station, time, ps,
       CASE WHEN count(ps) OVER (PARTITION BY station) > 0
            THEN NULL ELSE psl_raw END AS psl
FROM base
"""


@query("n_cdec_clean", N_CDEC_ORACLE)
def n_cdec_clean(spark, sf_dir):
    """CDEC via the shared Synoptic quirk table, exercising the
    ps-over-psl preference: a station with ANY directly observed
    station pressure drops sea-level pressure entirely (even rows
    where its ps is null), stations with none keep psl.

    Reference: MADIS_clean.py:1131-1160.
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(
            F.lit("CDEC_D"), (F.col("user_id") % 40).cast("string")
        ).alias("station"),
        (F.col("ts") - F.expr(_BACK)).alias("time"),
        F.when(
            (F.col("user_id") % 2 == 0) & (F.col("value") % 7.0 < 3.0),
            F.lit(85000.0) + F.col("value"),
        ).alias("pressure_set_1"),
        (F.lit(101000.0) + F.col("value") % 500.0).alias(
            "sea_level_pressure_set_1"
        ),
    )
    out = clean_network(raw, "CDEC")
    return out.select("station", "time", "ps", "psl")


N_NDBC_ORACLE = """
SELECT 'NDBC_' || CAST(46000 + user_id % 70 AS VARCHAR) AS station,
       ts - INTERVAL 10 YEAR AS time,
       value % 28.0 + 273.15 AS tas,
       value % 24.0 + 273.15 AS tdps,
       (990.0 + value % 45.0) * 100.0 AS ps
FROM events
"""


@query("n_ndbc_clean", N_NDBC_ORACLE)
def n_ndbc_clean(spark, sf_dir):
    """NDBC registered as its own addressable cleaner (alias of the
    MARITIME quirks — MARITIME_clean.py pulls NDBC + CDIP buoys),
    with raw pressure in hPa.

    Reference: MARITIME_clean.py:637-653.
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(
            F.lit("NDBC_"),
            (F.lit(46000) + F.col("user_id") % 70).cast("string"),
        ).alias("station"),
        (F.col("ts") - F.expr(_BACK)).alias("time"),
        (F.col("value") % 28.0).alias("tas"),
        (F.col("value") % 24.0).alias("tdps"),
        (F.lit(990.0) + F.col("value") % 45.0).alias("ps"),
    )
    out = clean_network(raw, "NDBC")
    return out.select("station", "time", "tas", "tdps", "ps")


N_ASOSAWOS_ORACLE = """
WITH isd AS (
  SELECT s_suppkey AS WBAN,
         CAST(s_suppkey % 80 AS DOUBLE) + 0.125 AS LAT,
         -CAST(s_suppkey % 160 AS DOUBLE) - 0.25 AS LON,
         s_name AS isd_name
  FROM supplier),
asos_raw AS (
  SELECT c_custkey AS WBAN,
         CAST(c_custkey % 80 AS DOUBLE)
           + CASE WHEN c_custkey % 3 = 0 THEN 0.125 ELSE 0.625 END AS LAT,
         -CAST(c_custkey % 160 AS DOUBLE) - 0.25 AS LON,
         c_custkey * 10 AS NCDCID,
         '2001-0' || CAST(1 + c_custkey % 9 AS VARCHAR) || '-15'
           AS STARTDATE,
         'A' || CAST(c_custkey AS VARCHAR) AS asos_name
  FROM customer
  UNION ALL
  SELECT c_custkey,
         CAST(c_custkey % 80 AS DOUBLE)
           + CASE WHEN c_custkey % 3 = 0 THEN 0.125 ELSE 0.625 END,
         -CAST(c_custkey % 160 AS DOUBLE) - 0.25,
         c_custkey * 10, NULL, 'A' || CAST(c_custkey AS VARCHAR)
  FROM customer WHERE c_custkey % 10 = 0),
asos_d AS (
  SELECT WBAN, LAT, LON, NCDCID, STARTDATE, asos_name FROM (
    SELECT *, row_number() OVER (
      PARTITION BY WBAN, NCDCID
      ORDER BY STARTDATE DESC NULLS LAST) AS rn
    FROM asos_raw) WHERE rn = 1),
asos AS (
  SELECT WBAN, round(LAT, 3) AS LAT, round(LON, 3) AS LON,
         NCDCID, STARTDATE, asos_name
  FROM asos_d),
matched AS (
  SELECT i.WBAN, i.LAT, i.LON, i.isd_name,
         a.NCDCID, a.STARTDATE, a.asos_name
  FROM isd i JOIN asos a
    ON i.WBAN = a.WBAN AND i.LAT = a.LAT AND i.LON = a.LON),
missed AS (
  SELECT i.* FROM isd i WHERE NOT EXISTS (
    SELECT 1 FROM asos a
    WHERE a.WBAN = i.WBAN AND a.LAT = i.LAT AND a.LON = i.LON)),
asos_w AS (
  SELECT WBAN, NCDCID, STARTDATE, asos_name FROM (
    SELECT *, row_number() OVER (
      PARTITION BY WBAN
      ORDER BY STARTDATE DESC NULLS LAST) AS rn2
    FROM asos) WHERE rn2 = 1)
SELECT * FROM matched
UNION ALL
SELECT m.WBAN, m.LAT, m.LON, m.isd_name,
       a.NCDCID, a.STARTDATE, a.asos_name
FROM missed m LEFT JOIN asos_w a ON m.WBAN = a.WBAN
"""


@query("n_asosawos_stations", N_ASOSAWOS_ORACLE)
def n_asosawos_stations(spark, sf_dir):
    """ASOS/AWOS ↔ ISD station-list merge (two-tier priority join):
    exact (WBAN, LAT, LON) first, WBAN-only fallback for relocated
    stations, after dropping less-complete duplicate rows and
    rounding coordinates to 3 decimals.

    Reference: ASOSAWOS_clean.py:71-139 (merge_station_lists).
    Synthetic lists: ISD from supplier, ASOSAWOS from customer
    (coordinates agree only for custkey % 3 == 0, so both join tiers
    carry rows; custkey % 10 == 0 contributes a null-STARTDATE
    duplicate that the dedup must drop).
    """
    from ..sources.networks import merge_station_lists

    sup = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    isd = sup.select(
        F.col("s_suppkey").alias("WBAN"),
        ((F.col("s_suppkey") % 80).cast("double") + F.lit(0.125)).alias(
            "LAT"
        ),
        (-(F.col("s_suppkey") % 160).cast("double") - F.lit(0.25)).alias(
            "LON"
        ),
        F.col("s_name").alias("isd_name"),
    )
    lat = (F.col("c_custkey") % 80).cast("double") + F.when(
        F.col("c_custkey") % 3 == 0, F.lit(0.125)
    ).otherwise(F.lit(0.625))
    base = cust.select(
        F.col("c_custkey").alias("WBAN"),
        lat.alias("LAT"),
        (-(F.col("c_custkey") % 160).cast("double") - F.lit(0.25)).alias(
            "LON"
        ),
        (F.col("c_custkey") * 10).alias("NCDCID"),
        F.concat(
            F.lit("2001-0"),
            (F.lit(1) + F.col("c_custkey") % 9).cast("string"),
            F.lit("-15"),
        ).alias("STARTDATE"),
        F.concat(F.lit("A"), F.col("c_custkey").cast("string")).alias(
            "asos_name"
        ),
    )
    dup = base.where(F.col("WBAN") % 10 == 0).withColumn(
        "STARTDATE", F.lit(None).cast("string")
    )
    asos_raw = base.unionByName(dup)
    return merge_station_lists(isd, asos_raw)


N_STATION_AUDIT_ORACLE = """
WITH st AS (
  SELECT upper('CWOP_' || 'S' || CAST(c_custkey AS VARCHAR)) AS era_id,
         'S' || CAST(c_custkey AS VARCHAR) AS STID,
         c_name AS stn_name
  FROM customer),
cleaned AS (
  SELECT 'CWOP_S' || CAST(c_custkey AS VARCHAR) AS ID,
         '2023-01-' || lpad(CAST(1 + c_custkey % 28 AS VARCHAR), 2, '0')
           || ' 00:00' AS Time_Cleaned
  FROM customer WHERE c_custkey % 3 <> 1
  UNION ALL
  SELECT 'CWOP_X' || CAST(c_custkey AS VARCHAR),
         '2023-01-' || lpad(CAST(1 + c_custkey % 28 AS VARCHAR), 2, '0')
           || ' 00:00'
  FROM customer WHERE c_custkey % 10 = 0),
audited AS (
  SELECT coalesce(s.era_id, c.ID) AS era_id, s.STID, s.stn_name,
         CASE WHEN c.ID IS NULL THEN 'N' ELSE 'Y' END AS Cleaned,
         c.Time_Cleaned
  FROM st s FULL OUTER JOIN cleaned c ON s.era_id = c.ID),
errs AS (
  SELECT 'CWOP_S' || CAST(user_id % 150 AS VARCHAR) || '-'
           || CAST(event_id AS VARCHAR) || '.csv' AS File,
         '2023-01-' || lpad(CAST(1 + user_id % 28 AS VARCHAR), 2, '0')
           || ' 00:00' AS Time,
         event_type AS Error
  FROM events WHERE event_id % 97 = 0),
sfx AS (
  -- single-underscore ids in this corpus: suffix = chars after CWOP_
  SELECT era_id, substr(era_id, 6) AS s, Time_Cleaned FROM audited),
m AS (
  SELECT a.era_id, a.Time_Cleaned, e.File, e.Time, e.Error,
         row_number() OVER (PARTITION BY e.File, e.Time, e.Error
           ORDER BY length(a.s) DESC, a.era_id DESC) AS rn
  FROM sfx a JOIN errs e ON instr(e.File, a.s) > 0),
kept AS (
  SELECT * FROM m WHERE rn = 1
    AND (Time_Cleaned IS NULL OR Time IS NULL OR Time >= Time_Cleaned)),
per AS (
  SELECT era_id, count(*) AS n, min(Error) AS single,
         string_agg(File || ': ' || Error, ' ' ORDER BY Time, File)
           AS multi
  FROM kept GROUP BY era_id)
SELECT a.era_id, a.STID, a.stn_name, a.Cleaned, a.Time_Cleaned,
       CASE WHEN p.n = 1 THEN p.single ELSE p.multi END AS Errors
FROM audited a LEFT JOIN per p USING (era_id)
"""


@query("n_station_audit", N_STATION_AUDIT_ORACLE)
def n_station_audit(spark, sf_dir):
    """Post-clean station-list bookkeeping (stnlist_update_clean.py
    clean_qa): ERA-ID standardization, Cleaned Y/N via full-outer
    join with appended off-list cleaned ids, and error-log rows
    attached by longest id-in-filename match, filtered to at/after
    each station's clean time. Synthetic: stations from customer,
    a third left uncleaned, every tenth id cleaned off-list, error
    log sampled from events.
    """
    from ..sources.networks import station_clean_audit

    cust = table(spark, sf_dir, "customer")
    ev = table(spark, sf_dir, "events")
    stations = cust.select(
        F.concat(F.lit("S"), F.col("c_custkey").cast("string")).alias(
            "STID"
        ),
        F.col("c_name").alias("stn_name"),
    )
    tc = F.concat(
        F.lit("2023-01-"),
        F.lpad((F.lit(1) + F.col("c_custkey") % 28).cast("string"), 2, "0"),
        F.lit(" 00:00"),
    )
    cleaned = (
        cust.where(F.col("c_custkey") % 3 != 1)
        .select(
            F.concat(
                F.lit("CWOP_S"), F.col("c_custkey").cast("string")
            ).alias("ID"),
            tc.alias("Time_Cleaned"),
        )
        .unionByName(
            cust.where(F.col("c_custkey") % 10 == 0).select(
                F.concat(
                    F.lit("CWOP_X"), F.col("c_custkey").cast("string")
                ).alias("ID"),
                tc.alias("Time_Cleaned"),
            )
        )
    )
    errors = ev.where(F.col("event_id") % 97 == 0).select(
        F.concat(
            F.lit("CWOP_S"),
            (F.col("user_id") % 150).cast("string"),
            F.lit("-"),
            F.col("event_id").cast("string"),
            F.lit(".csv"),
        ).alias("File"),
        F.concat(
            F.lit("2023-01-"),
            F.lpad(
                (F.lit(1) + F.col("user_id") % 28).cast("string"), 2, "0"
            ),
            F.lit(" 00:00"),
        ).alias("Time"),
        F.col("event_type").alias("Error"),
    )
    return station_clean_audit(stations, cleaned, errors, "CWOP")


N_STATIONLIST_UNION_ORACLE = """
WITH a AS (
  SELECT 'ASOSAWOS_' || CAST(s_suppkey AS VARCHAR) AS era_id,
         s_name AS name,
         CAST(s_suppkey % 80 AS DOUBLE) + 0.5 AS latitude,
         -CAST(s_suppkey % 160 AS DOUBLE) - 0.5 AS longitude,
         CAST(s_suppkey % 900 AS DOUBLE) AS elevation,
         '199' || CAST(s_suppkey % 10 AS VARCHAR) || '-01-01'
           AS start_time,
         'ASOSAWOS' AS network
  FROM supplier),
b AS (
  SELECT 'CWOP_S' || CAST(c_custkey AS VARCHAR) AS era_id,
         c_name AS name,
         CAST(c_custkey % 85 AS DOUBLE) + 0.25 AS latitude,
         -CAST(c_custkey % 170 AS DOUBLE) - 0.25 AS longitude,
         CAST(NULL AS DOUBLE) AS elevation,
         '200' || CAST(c_custkey % 10 AS VARCHAR) || '-06-15'
           AS start_time,
         'CWOP' AS network
  FROM customer),
-- the overlap: every 10th supplier id also appears in the CWOP list
-- but with NO metadata populated, so the fuller ASOSAWOS row wins
b2 AS (
  SELECT 'ASOSAWOS_' || CAST(s_suppkey AS VARCHAR) AS era_id,
         CAST(NULL AS VARCHAR) AS name,
         CAST(s_suppkey % 80 AS DOUBLE) + 0.5 AS latitude,
         CAST(NULL AS DOUBLE) AS longitude,
         CAST(NULL AS DOUBLE) AS elevation,
         CAST(NULL AS VARCHAR) AS start_time,
         'CWOP' AS network
  FROM supplier WHERE s_suppkey % 10 = 0),
u AS (SELECT * FROM a UNION ALL SELECT * FROM b
      UNION ALL SELECT * FROM b2)
SELECT era_id, name, latitude, longitude, elevation, start_time,
       network
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY era_id
    ORDER BY (CASE WHEN name IS NULL THEN 0 ELSE 1 END
            + CASE WHEN latitude IS NULL THEN 0 ELSE 1 END
            + CASE WHEN longitude IS NULL THEN 0 ELSE 1 END
            + CASE WHEN elevation IS NULL THEN 0 ELSE 1 END
            + CASE WHEN start_time IS NULL THEN 0 ELSE 1 END
            + 1) DESC, network) AS rn
  FROM u) WHERE rn = 1
"""


@query("n_stationlist_union", N_STATIONLIST_UNION_ORACLE)
def n_stationlist_union(spark, sf_dir):
    """Master station-list assembly (stationlist_generator.py):
    per-network lists with different column spellings harmonized by
    fuzzy column rules, unioned, one row per era_id (most-populated
    row wins). The ASOSAWOS list spells columns 'ERA-ID'/'NAME'/
    'LAT'/'LON'/'ELEV(M)'/'BEGIN'; the CWOP list spells them
    'era-id'/'station name'/'latitude'/'longitude'/'elevation_m'/
    'start_time' — both normalize to one schema."""
    from ..sources.networks import harmonize_station_lists

    sup = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    asos = sup.select(
        F.concat(F.lit("ASOSAWOS_"), F.col("s_suppkey").cast("string"))
        .alias("ERA-ID"),
        F.col("s_name").alias("NAME"),
        ((F.col("s_suppkey") % 80).cast("double") + 0.5).alias("LAT"),
        (-(F.col("s_suppkey") % 160).cast("double") - 0.5).alias("LON"),
        (F.col("s_suppkey") % 900).cast("double").alias("ELEV(M)"),
        F.concat(
            F.lit("199"),
            (F.col("s_suppkey") % 10).cast("string"),
            F.lit("-01-01"),
        ).alias("BEGIN"),
    )
    cwop = cust.select(
        F.concat(F.lit("CWOP_S"), F.col("c_custkey").cast("string"))
        .alias("era-id"),
        F.col("c_name").alias("station name"),
        ((F.col("c_custkey") % 85).cast("double") + 0.25).alias(
            "latitude"
        ),
        (-(F.col("c_custkey") % 170).cast("double") - 0.25).alias(
            "longitude"
        ),
        F.lit(None).cast("double").alias("elevation_m"),
        F.concat(
            F.lit("200"),
            (F.col("c_custkey") % 10).cast("string"),
            F.lit("-06-15"),
        ).alias("start_time"),
    ).unionByName(
        sup.where(F.col("s_suppkey") % 10 == 0).select(
            F.concat(
                F.lit("ASOSAWOS_"), F.col("s_suppkey").cast("string")
            ).alias("era-id"),
            F.lit(None).cast("string").alias("station name"),
            ((F.col("s_suppkey") % 80).cast("double") + 0.5).alias(
                "latitude"
            ),
            F.lit(None).cast("double").alias("longitude"),
            F.lit(None).cast("double").alias("elevation_m"),
            F.lit(None).cast("string").alias("start_time"),
        )
    )
    out = harmonize_station_lists({"ASOSAWOS": asos, "CWOP": cwop})
    return out.select(
        "era_id", "name", "latitude", "longitude", "elevation",
        "start_time", "network",
    )


_STATE_WKTS = [
    ("CA", "POLYGON ((-4 0, 0 0, 0 4, -4 4, -4 0))"),
    ("OR", "POLYGON ((-8 4, -4 4, -4 8, -8 8, -8 4))"),
]

N_PUBLIC_ORACLE = """
WITH merged AS (
  SELECT CASE WHEN c_custkey % 4 = 0
              THEN 'ASOSAWOS_' || CAST(c_custkey AS VARCHAR) || 'X'
              ELSE 'CWOP_S' || CAST(c_custkey AS VARCHAR) END AS era_id,
         CASE WHEN c_custkey % 4 = 0 THEN 'ASOSAWOS'
              ELSE 'CWOP' END AS network,
         CAST(c_custkey % 8 AS DOUBLE) + 0.5 AS latitude,
         -(CAST(c_custkey % 8 AS DOUBLE) + 0.5) AS longitude,
         CASE WHEN c_custkey % 4 = 0 AND c_custkey % 12 = 0
                THEN -30479.6952
              WHEN c_custkey % 4 = 0 AND c_custkey % 12 = 4
                THEN NULL
              ELSE CAST(c_custkey AS DOUBLE) END AS elevation,
         '1990-01-01' AS start_date, '2022-12-31' AS end_date,
         c_custkey * 7 AS total_nobs,
         CASE WHEN c_custkey % 5 = 0 THEN 'N' ELSE 'Y' END AS merged
  FROM customer),
src AS (
  SELECT CAST(c_custkey AS VARCHAR) || '-X' AS isd_id,
         CAST(c_custkey AS DOUBLE) + 0.25 AS src_elev,
         'K' || CAST(c_custkey AS VARCHAR) AS icao
  FROM customer WHERE c_custkey % 4 = 0),
j AS (
  SELECT m.*, s.src_elev, s.icao
  FROM merged m LEFT JOIN src s
    ON m.era_id = 'ASOSAWOS_' || replace(s.isd_id, '-', '')
  WHERE m.merged = 'Y')
SELECT era_id,
       CASE WHEN network = 'ASOSAWOS' THEN icao
            ELSE substring(era_id, length(network) + 2) END AS source_id,
       network, latitude, longitude,
       CASE WHEN latitude > 0 AND latitude < 4
                 AND longitude > -4 AND longitude < 0 THEN 'CA'
            WHEN latitude > 4 AND latitude < 8
                 AND longitude > -8 AND longitude < -4 THEN 'OR'
            ELSE NULL END AS state,
       CASE WHEN network = 'ASOSAWOS'
                 AND (elevation = -30479.6952 OR elevation IS NULL)
                 AND src_elev IS NOT NULL
            THEN src_elev ELSE elevation END AS elevation,
       start_date, end_date,
       CAST(total_nobs AS BIGINT) AS total_nobs,
       'POINT (' || CAST(CAST(longitude AS DECIMAL(12,6)) AS VARCHAR)
         || ' ' || CAST(CAST(latitude AS DECIMAL(12,6)) AS VARCHAR)
         || ')' AS geometry
FROM j
"""


@query("n_public_stations", N_PUBLIC_ORACLE)
def n_public_stations(spark, sf_dir):
    """Public-facing station directory
    (public_facing_stationlist_cleanup.py): merged-only filter,
    ASOSAWOS bad/missing elevation repaired from the raw ISD list,
    source-id derivation (ICAO for ASOSAWOS, era suffix otherwise),
    state assignment by point-in-polygon over a (state, wkt) table,
    WKT point geometry. Every c_custkey%4==0 station is ASOSAWOS;
    %12==0 carries the bad-elevation sentinel and %12==4 a null, both
    repaired from the source list; %5==0 stations never merged and
    drop out."""
    from ..sources.networks import public_station_directory

    cust = table(spark, sf_dir, "customer")
    is_asos = F.col("c_custkey") % 4 == 0
    merged = cust.select(
        F.when(
            is_asos,
            F.concat(
                F.lit("ASOSAWOS_"),
                F.col("c_custkey").cast("string"),
                F.lit("X"),
            ),
        )
        .otherwise(
            F.concat(F.lit("CWOP_S"), F.col("c_custkey").cast("string"))
        )
        .alias("era_id"),
        F.when(is_asos, F.lit("ASOSAWOS"))
        .otherwise(F.lit("CWOP"))
        .alias("network"),
        ((F.col("c_custkey") % 8).cast("double") + 0.5).alias("latitude"),
        (-((F.col("c_custkey") % 8).cast("double") + 0.5)).alias(
            "longitude"
        ),
        F.when(
            is_asos & (F.col("c_custkey") % 12 == 0),
            F.lit(-30479.6952),
        )
        .when(is_asos & (F.col("c_custkey") % 12 == 4), F.lit(None))
        .otherwise(F.col("c_custkey").cast("double"))
        .alias("elevation"),
        F.lit("1990-01-01").alias("start_date"),
        F.lit("2022-12-31").alias("end_date"),
        (F.col("c_custkey") * 7).cast("long").alias("total_nobs"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("N"))
        .otherwise(F.lit("Y"))
        .alias("merged"),
    )
    src = cust.where(F.col("c_custkey") % 4 == 0).select(
        F.concat(F.col("c_custkey").cast("string"), F.lit("-X")).alias(
            "ISD-ID"
        ),
        (F.col("c_custkey").cast("double") + 0.25).alias("ELEV(M)"),
        F.concat(F.lit("K"), F.col("c_custkey").cast("string")).alias(
            "ICAO"
        ),
    )
    states = spark.createDataFrame(_STATE_WKTS, "state string, wkt string")
    return public_station_directory(merged, src, states)
