"""Per-network cleaner quirk tables (S5 family, declarative).

The reference ships one ~700–1900-line pandas/xarray script per
network (``scripts/2_clean_data/{CIMIS,SCANSNOTEL,CW3E,MARITIME,
VALLEYWATER}_clean.py``); each is the same pipeline with a different
quirk table: raw→CF-style column renames, per-variable unit
conversions, QC-flag column renames, a local-time offset, and the v1
period filter.  Here the quirks ARE the table — a frozen
``NetworkSpec`` per network — and one Catalyst-only ``clean_network``
applies any of them as a single select (no shuffle, no Python UDFs;
the whole cleaner is projection + filter, so it pipelines into
whatever scan precedes it and survives 100 TB trivially).

Quirk provenance (reference file:line):

- CIMIS   — CIMIS_clean.py:419-604 (renames/conversions),
  :234-256 (PST→UTC via +8 h timedelta), :409 (elevation ft→m).
- SCANSNOTEL — SCANSNOTEL_clean.py:383-618 (``{SENSOR}_value`` /
  ``{SENSOR}_flag`` columns; °F→K, inHg→Pa, in→mm, mph→m/s, kPa→Pa).
- CW3E    — CW3E_clean.py:202,283,433-497 (°C→K, hPa→Pa, ft→m,
  period ends 2022-08-30).
- MARITIME — MARITIME_clean.py:637-653 (°C→K, hPa→Pa; buoy ids).
- VALLEYWATER — VALLEYWATER_clean.py:105 (ISO-8601 UTC time,
  precip-only network, in→mm).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import kernels as K

from .csv_obs import V1_PERIOD  # single definition of the v1 window

# Conversion registry: spec entries name the conversion, the column
# expression comes from the shared kernel (same constants as the
# reference's calc_clean.py, see functions/kernels.py docstrings).
CONVERSIONS: Mapping[str, Callable[[str], Column]] = {
    "degC_to_K": K.degc_to_k,
    "degF_to_K": K.degf_to_k,
    "hPa_to_Pa": K.hpa_to_pa,
    "kPa_to_Pa": K.kpa_to_pa,
    "inHg_to_Pa": K.inhg_to_pa,
    "kts_to_ms": K.kts_to_ms,
    "mph_to_ms": K.mph_to_ms,
    "in_to_mm": K.in_to_mm,
    "ft_to_m": K.ft_to_m,
}


@dataclass(frozen=True)
class NetworkSpec:
    """Declarative cleaner for one observation network."""

    name: str
    # raw column name -> canonical (CF-style) variable name
    renames: Mapping[str, str] = field(default_factory=dict)
    # canonical variable name -> CONVERSIONS key
    conversions: Mapping[str, str] = field(default_factory=dict)
    # raw QC column name -> canonical "<var>_qc" name (kept as string)
    qc_renames: Mapping[str, str] = field(default_factory=dict)
    # hours to ADD to the raw (local) timestamps to reach UTC
    utc_offset_hours: int = 0
    # inclusive start, exclusive end (the reference's v1 window)
    period: tuple[str, str] | None = V1_PERIOD
    # "ft" applies ft→m to the elevation column at clean time
    elevation_unit: str = "m"


NETWORKS: dict[str, NetworkSpec] = {
    # CIMIS_clean.py: hourly ag stations, local PST (fixed +8 h to
    # UTC, :254-256), elevations in feet, QC flag column per variable.
    "CIMIS": NetworkSpec(
        name="CIMIS",
        renames={
            # unicode originals (CIMIS_clean.py headers) + ASCII
            # fallbacks for re-encoded exports
            "Air Temperature (\N{DEGREE SIGN}C)": "tas",
            "Air Temperature (C)": "tas",
            "Dew Point (\N{DEGREE SIGN}C)": "tdps_derived",
            "Dew Point (C)": "tdps_derived",
            "Precipitation (mm)": "pr",
            "Relative Humidity (%)": "hurs",
            "Solar Radiation (W/m\N{SUPERSCRIPT TWO})": "rsds",
            "Solar Radiation (W/m2)": "rsds",
            "Wind Speed (m/s)": "sfcWind",
            "Wind Direction (0-360)": "sfcWind_dir",
        },
        conversions={"tas": "degC_to_K", "tdps_derived": "degC_to_K"},
        qc_renames={
            "QC for Air Temperature": "tas_qc",
            "QC for Dew Point": "tdps_derived_qc",
            "QC for Precipitation": "pr_qc",
            "QC for Relative Humidity": "hurs_qc",
            "QC for Solar Radiation": "rsds_qc",
            "QC for Wind Speed": "sfcWind_qc",
            "QC for Wind Direction": "sfcWind_dir_qc",
        },
        utc_offset_hours=8,
        elevation_unit="ft",
    ),
    # SCANSNOTEL_clean.py: USDA sensor codes, imperial units, one
    # "<CODE>_value"/"<CODE>_flag" pair per sensor.
    "SCANSNOTEL": NetworkSpec(
        name="SCANSNOTEL",
        renames={
            "TOBS_value": "tas",
            "PRES_value": "psl",
            "DPTP_value": "tdps",
            "PREC_value": "pr",          # accumulation (in)
            "PRCP_value": "pr_inc",      # increment (in)
            "PRCPSA_value": "pr_incsa",  # snow-adjusted increment
            "RHUM_value": "hurs",
            "SRAD_value": "rsds",
            "WSPD_value": "sfcWind",
            "WDIR_value": "sfcWind_dir",
            "PVPV_value": "pvp",
        },
        conversions={
            "tas": "degF_to_K",
            "psl": "inHg_to_Pa",
            "tdps": "degF_to_K",
            "pr": "in_to_mm",
            "pr_inc": "in_to_mm",
            "pr_incsa": "in_to_mm",
            "sfcWind": "mph_to_ms",
            "pvp": "kPa_to_Pa",
        },
        qc_renames={
            "TOBS_flag": "tas_qc",
            "PRES_flag": "psl_qc",
            "DPTP_flag": "tdps_qc",
            "PREC_flag": "pr_qc",
            "PRCP_flag": "pr_inc_qc",
            "PRCPSA_flag": "pr_incsa_qc",
            "RHUM_flag": "hurs_qc",
            "SRAD_flag": "rsds_qc",
            "WSPD_flag": "sfcWind_qc",
            "WDIR_flag": "sfcWind_dir_qc",
        },
        elevation_unit="ft",
    ),
    # CW3E_clean.py: metric CSVs, psl in hPa, period ends 2022-08-30.
    "CW3E": NetworkSpec(
        name="CW3E",
        renames={
            "Air Temperature (C)": "tas",
            "Pressure (hPa)": "psl",
            "Precipitation (mm)": "pr",
            "Relative Humidity (%)": "hurs",
            "Solar Radiation (W/m^2)": "rsds",
            "Scalar Wind Speed (m/s)": "sfcWind",
            "Wind Direction (deg)": "sfcWind_dir",
        },
        conversions={"tas": "degC_to_K", "psl": "hPa_to_Pa"},
        period=("1980-01-01", "2022-08-31"),
        elevation_unit="ft",
    ),
    # MARITIME_clean.py: NDBC buoys, already-canonical names but
    # metric-raw units (°C / hPa); anemometer height in metadata.
    "MARITIME": NetworkSpec(
        name="MARITIME",
        conversions={
            "tas": "degC_to_K",
            "tdps": "degC_to_K",
            "ps": "hPa_to_Pa",
        },
    ),
    # VALLEYWATER_clean.py: precip-only gauges, UTC ISO-8601 time,
    # inches.
    "VALLEYWATER": NetworkSpec(
        name="VALLEYWATER",
        renames={"rainfall_in": "pr"},
        conversions={"pr": "in_to_mm"},
    ),
    # MADIS_clean.py:1692-1694 (sensor-suffix renames), :1078/:1702
    # (°C→K), :782 (elevation ft→m); the rest of the MADIS quirk set
    # (header sniffing, sentinel cleanup) lives in
    # sources/csv_obs.read_csv_obs, which this spec composes with.
    "MADIS": NetworkSpec(
        name="MADIS",
        renames={
            "dew_point_temperature_set_1d": "tdps_derived",
            "pressure_set_1d": "ps_derived",
            "relative_humidity_set_1": "hurs",
            "air_temp_set_1": "tas",
        },
        conversions={"tas": "degC_to_K", "tdps_derived": "degC_to_K"},
        elevation_unit="ft",
    ),
}


def clean_network(
    df: DataFrame,
    spec: NetworkSpec | str,
    time_col: str = "time",
) -> DataFrame:
    """Apply one network's quirk table as a single projection.

    Renames raw columns that are present (absent ones are simply
    skipped — the reference's per-variable ``if ... in ds.keys()``
    guards), converts units through the shared kernels, renames QC
    columns (values kept verbatim as strings), shifts local time to
    UTC, converts a feet-based elevation column, and applies the
    network's period filter as a pushdown-able range predicate.
    """
    if isinstance(spec, str):
        spec = NETWORKS[spec]
    cols = set(df.columns)
    for raw, canon in spec.renames.items():
        if raw in cols:
            df = df.withColumnRenamed(raw, canon)
    for raw, canon in spec.qc_renames.items():
        if raw in cols:
            df = df.withColumnRenamed(raw, canon)
            df = df.withColumn(canon, F.col(canon).cast("string"))
    for canon, conv in spec.conversions.items():
        if canon in df.columns:
            df = df.withColumn(canon, CONVERSIONS[conv](canon))
    if spec.elevation_unit == "ft" and "elevation" in df.columns:
        df = df.withColumn("elevation", K.ft_to_m("elevation"))
    if spec.utc_offset_hours:
        df = df.withColumn(
            time_col,
            F.col(time_col)
            + F.make_interval(hours=F.lit(spec.utc_offset_hours)),
        )
    if spec.period:
        # inclusive start, EXCLUSIVE end — as documented on the spec
        # field (between() would keep the end-boundary instant)
        df = df.where(
            (F.col(time_col) >= F.lit(spec.period[0]).cast("timestamp"))
            & (F.col(time_col) < F.lit(spec.period[1]).cast("timestamp"))
        )
    return df
