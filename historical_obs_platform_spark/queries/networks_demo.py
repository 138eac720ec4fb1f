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
