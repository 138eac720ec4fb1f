"""Generic CSV observation source (S5) — the MADIS/Synoptic-style
cleaner (``scripts/2_clean_data/MADIS_clean.py:113-392``) as one
declarative scan.

The reference sniffs headers, resolves duplicated columns, drops
timeout rows, renames ``*_set_1d`` sensor columns, parses times and
applies the v1 period filter, per file, in pandas. Here:

- one ``spark.read.csv`` over the prefix (explicit schema — no
  inference in production paths);
- duplicate-column resolution = a rename map applied at select time;
- sentinel and timeout rows are predicates;
- the period filter is a pushed-down timestamp range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# MADIS sensor-suffix renames (MADIS_clean.py:1692-1694)
DEFAULT_RENAMES = {
    "dew_point_temperature_set_1d": "tdps_derived",
    "pressure_set_1d": "ps_derived",
    "relative_humidity_set_1": "hurs",
    "air_temp_set_1": "tas",
}

V1_PERIOD = ("1980-01-01", "2022-09-01")


def read_csv_obs(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    station_col: str = "station",
    time_col: str = "time",
    time_format: str | None = None,
    renames: dict[str, str] | None = None,
    sentinels: tuple[str, ...] = ("-9999", "-9999.0", "M", "MM", ""),
    period: tuple[str, str] | None = V1_PERIOD,
    keep_strings: tuple[str, ...] = (),
) -> DataFrame:
    """Scan + standardize a CSV observation prefix.

    Returns the canonical long-format frame (station, time, vars...);
    rows with unparseable station/time are dropped (the reference's
    timeout-row cleanup), sentinel strings become null before the
    numeric cast, and the period filter is a range predicate (pushed
    down; P5, MADIS_clean.py:337-345).
    """
    reader = spark.read.option("header", True)
    df = (
        reader.schema(schema).csv(path)
        if schema
        else reader.csv(path)  # inference acceptable for ad-hoc use
    )
    # `renames={}` means "no renames"; only None falls back to the
    # MADIS defaults (an empty dict is falsy — `or` would silently
    # re-enable the default map for non-MADIS networks)
    if renames is None:
        renames = DEFAULT_RENAMES
    for old, new in renames.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    ts = (
        F.to_timestamp(F.col(time_col), time_format)
        if time_format
        else F.to_timestamp(F.col(time_col))
    )
    df = df.withColumn(time_col, ts)
    df = df.where(F.col(station_col).isNotNull() & F.col(time_col).isNotNull())
    for c in df.columns:
        if c in (station_col, time_col) or c in keep_strings:
            # keep_strings: QC-flag columns whose letter codes must
            # survive verbatim (the numeric cast would null them)
            continue
        if dict(df.dtypes)[c] == "string":
            cleaned = F.when(
                F.trim(F.col(c)).isin(*sentinels), F.lit(None)
            ).otherwise(F.col(c))
            # try_cast: non-numeric junk columns become all-null
            # instead of failing the scan under ANSI mode
            df = df.withColumn(c, cleaned.try_cast("double"))
    if period:
        df = df.where(
            F.col(time_col).between(
                F.lit(period[0]).cast("timestamp"),
                F.lit(period[1]).cast("timestamp"),
            )
        )
    return df.dropDuplicates([station_col, time_col])
