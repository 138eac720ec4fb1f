"""S4 through the driver gate: ISD fixed-width round-trip.

Spark renders deterministic ISD record lines from ``events`` (lpad /
date_format — code that shares nothing with the parser), feeds them to
the real ``parse_isd_lines``, and the DuckDB oracle computes every
expected field directly from the source numbers. A misaligned slice
position, wrong scale factor, or broken unit conversion in the parser
breaks the match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.isd import parse_isd_lines
from .common import table

# AA1 optional section: duration '01' h + depth/10 mm + '00' filler.
S4_ORACLE = """
WITH src AS (
  SELECT user_id, ts, value,
         CAST(FLOOR(value * 10) AS INTEGER) % 360 AS dir_i,
         CAST(FLOOR(value * 10) AS INTEGER) % 300 AS spd_i,
         CAST(FLOOR(value * 10) AS INTEGER) % 400 AS tas_i,
         CAST(FLOOR(value * 7) AS INTEGER) % 400 AS tdps_i,
         9000 + CAST(FLOOR(value * 10) AS INTEGER) % 2000 AS psl_i,
         CAST(FLOOR(value * 10) AS INTEGER) % 5000 AS pr_i
  FROM events
)
SELECT 'ASOSAWOS_' || lpad(CAST(user_id % 100 AS VARCHAR), 6, '0')
         || '00000' AS station,
       date_trunc('minute', ts) AS time,
       40.123e0 AS lat, -120.5e0 AS lon,
       CAST(100 + user_id % 50 AS DOUBLE) AS elevation,
       CAST(dir_i AS DOUBLE) AS sfcWind_dir,
       spd_i / 10.0 AS sfcWind,
       tas_i / 10.0 + 273.15 AS tas,
       tdps_i / 10.0 + 273.15 AS tdps,
       (psl_i / 10.0) * 100.0 AS psl,
       pr_i / 10.0 AS pr,
       1 AS pr_duration_h
FROM src
"""


@query("s4_isd_roundtrip", S4_ORACLE)
def s4_isd_roundtrip(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    i = lambda c: F.floor(c).cast("int")  # noqa: E731
    src = ev.select(
        "user_id",
        "ts",
        (i(F.col("value") * 10) % 360).alias("dir_i"),
        (i(F.col("value") * 10) % 300).alias("spd_i"),
        (i(F.col("value") * 10) % 400).alias("tas_i"),
        (i(F.col("value") * 7) % 400).alias("tdps_i"),
        (F.lit(9000) + i(F.col("value") * 10) % 2000).alias("psl_i"),
        (i(F.col("value") * 10) % 5000).alias("pr_i"),
    )
    pad = lambda c, n: F.lpad(c.cast("string"), n, "0")  # noqa: E731
    line = F.concat(
        F.lit("0000"),                                   # [0:4]
        pad(F.col("user_id") % 100, 6),                  # USAF [4:10]
        F.lit("00000"),                                  # WBAN [10:15]
        F.date_format("ts", "yyyyMMddHHmm"),             # time [15:27]
        F.lit("0"),                                      # [27:28]
        F.lit("040123"),                                 # lat [28:34]
        F.lit("-120500"),                                # lon [34:41]
        F.lit("00000"),                                  # [41:46]
        pad(F.lit(100) + F.col("user_id") % 50, 5),      # elev [46:51]
        F.lit("0" * 9),                                  # [51:60]
        pad(F.col("dir_i"), 3), F.lit("1"),              # dir [60:63] qc
        F.lit("0"),                                      # [64:65]
        pad(F.col("spd_i"), 4), F.lit("1"),              # spd [65:69] qc
        F.lit("0" * 17),                                 # [70:87]
        F.lit("+"), pad(F.col("tas_i"), 4), F.lit("1"),  # tas [87:92] qc
        F.lit("+"), pad(F.col("tdps_i"), 4), F.lit("1"), # tdps [93:98] qc
        pad(F.col("psl_i"), 5), F.lit("1"),              # psl [99:104] qc
        F.lit("AA101"), pad(F.col("pr_i"), 4), F.lit("00"),  # AA1 section
    )
    parsed = parse_isd_lines(src.select(line.alias("value")))
    return parsed.select(
        "station", "time", "lat", "lon", "elevation",
        "sfcWind_dir", "sfcWind", "tas", "tdps", "psl",
        "pr", "pr_duration_h",
    )


# --------------------------------------------------------------------
# S5: CSV observation cleaner round-trip — Spark renders a MADIS-style
# CSV prefix (sensor-suffix column names, 'M' sentinels), the real
# source scans it back (rename map, sentinel → null, try_cast,
# timeout-row drop), and the oracle computes the expected frame
# directly from the source numbers (MADIS_clean.py:113-392).
# --------------------------------------------------------------------
S5_ORACLE = """
SELECT 'ST' || CAST(user_id AS VARCHAR) AS station,
       ts AS time,
       CASE WHEN value % 17.0 < 1 THEN NULL ELSE value END AS tas,
       value % 100.0 AS hurs
FROM events
"""


@query("s5_csv_obs_roundtrip", S5_ORACLE)
def s5_csv_obs_roundtrip(spark, sf_dir):
    import os

    from ..sources.csv_obs import read_csv_obs

    ev = table(spark, sf_dir, "events")
    rendered = ev.select(
        F.concat(F.lit("ST"), F.col("user_id").cast("string")).alias(
            "station"
        ),
        # full microsecond precision: second-truncated rendering made
        # two same-user events collide on (station, time) at sf0.1,
        # and the reader's reference-semantics dropDuplicates then
        # discards an arbitrary one of them (nondeterministic row)
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("time"),
        F.when(F.col("value") % 17.0 < 1, F.lit("M"))
        .otherwise(F.col("value").cast("string"))
        .alias("air_temp_set_1"),
        (F.col("value") % 100.0).cast("string").alias(
            "relative_humidity_set_1"
        ),
    )
    path = os.path.join(
        "/tmp", f"spark_graft_s5_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    rendered.coalesce(4).write.mode("overwrite").option(
        "header", True
    ).csv(path)
    out = read_csv_obs(
        spark,
        path,
        schema="station string, time string, "
        "air_temp_set_1 string, relative_humidity_set_1 string",
        period=None,
    )
    return out.select("station", "time", "tas", "hurs")
