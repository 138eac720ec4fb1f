"""QA/QC flag-writers driven through the driver's correctness gate.

The driver tables carry no weather variables, so each query first
derives deterministic pseudo-observations from ``events`` (station =
user_id, time = ts, variables = arithmetic on value), then runs the
REAL engine operators from ``operators/qaqc.py``; the oracle mirrors
the flag semantics in ANSI SQL. The full chain with planted defects is
covered in tests/test_qaqc.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import qaqc as Q
from ..registry import query
from .common import table


def _obs(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("station"),
        F.col("ts").alias("time"),
        F.col("value"),
    )


# --------------------------------------------------------------------
# L1: supersaturation — tdps > tas flags the dewpoint 12.
# --------------------------------------------------------------------
L1_ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS station, ts AS time,
       270.0 + value / 5 AS tas,
       270.0 + value / 5 - 10 + (value % 25.0) AS tdps,
       CASE WHEN (value % 25.0) > 10 THEN 12.0e0 END AS tdps_eraqc
FROM events
"""


@query("l1_supersaturation", L1_ORACLE)
def l1_supersaturation(spark, sf_dir):
    obs = _obs(spark, sf_dir).select(
        "station",
        "time",
        (F.lit(270.0) + F.col("value") / 5).alias("tas"),
        (
            F.lit(270.0)
            + F.col("value") / 5
            - 10
            + F.pmod(F.col("value"), F.lit(25.0))
        ).alias("tdps"),
    )
    obs = Q.ensure_flag_columns(obs, ["tas", "tdps"])
    out = Q.supersaturation_check(obs)
    return out.select("station", "time", "tas", "tdps", "tdps_eraqc")


# --------------------------------------------------------------------
# L6: world-record range — tas outside [210.15, 329.92] K flags 11.
# --------------------------------------------------------------------
L6_ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS station, ts AS time,
       200.0 + value / 2 AS tas,
       CASE WHEN 200.0 + value / 2 < 210.15
              OR 200.0 + value / 2 > 329.92 THEN 11.0e0 END AS tas_eraqc
FROM events
"""


@query("l6_world_record", L6_ORACLE)
def l6_world_record(spark, sf_dir):
    obs = _obs(spark, sf_dir).select(
        "station", "time", (F.lit(200.0) + F.col("value") / 2).alias("tas")
    )
    obs = Q.ensure_flag_columns(obs, ["tas"])
    out = Q.world_record_check(obs)
    return out.select("station", "time", "tas", "tas_eraqc")


# --------------------------------------------------------------------
# L5: calm-wind direction logic — flag 14 (calm but dir≠0) and flag 15
# with dir rewritten to 360 (moving but dir=0).
# --------------------------------------------------------------------
L5_ORACLE = """
WITH obs AS (
  SELECT CAST(user_id AS VARCHAR) AS station, ts AS time,
         CAST(CAST(floor(value) AS BIGINT) % 5 AS DOUBLE) AS sfcWind,
         CAST(CAST(floor(value * 7) AS BIGINT) % 361 AS DOUBLE) AS sfcWind_dir
  FROM events
)
SELECT station, time, sfcWind,
  CASE WHEN sfcWind <> 0 AND sfcWind_dir = 0 THEN 360.0
       ELSE sfcWind_dir END AS sfcWind_dir,
  CASE WHEN sfcWind = 0 AND sfcWind_dir <> 0 THEN 14.0e0
       WHEN sfcWind <> 0 AND sfcWind_dir = 0 THEN 15.0e0
  END AS sfcWind_dir_eraqc
FROM obs
"""


@query("l5_calm_wind_dir", L5_ORACLE)
def l5_calm_wind_dir(spark, sf_dir):
    obs = _obs(spark, sf_dir).select(
        "station",
        "time",
        (F.floor(F.col("value")) % 5).cast("double").alias("sfcWind"),
        (F.floor(F.col("value") * 7) % 361).cast("double").alias(
            "sfcWind_dir"
        ),
    )
    obs = Q.ensure_flag_columns(obs, ["sfcWind", "sfcWind_dir"])
    out = Q.calm_wind_dir_check(obs)
    return out.select(
        "station", "time", "sfcWind", "sfcWind_dir", "sfcWind_dir_eraqc"
    )


# --------------------------------------------------------------------
# P2: missing-sentinel normalization — sentinel codes become null,
# other values untouched, rows never dropped.
# --------------------------------------------------------------------
P2_ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS station, ts AS time,
       CASE WHEN event_id % 89 = 0 THEN NULL
            ELSE CASE WHEN event_id % 89 = 0 THEN -999.0 ELSE value END
       END AS tas
FROM events
"""


@query("p2_sentinel_normalization", P2_ORACLE)
def p2_sentinel_normalization(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    obs = ev.select(
        F.col("user_id").cast("string").alias("station"),
        F.col("ts").alias("time"),
        F.when(F.col("event_id") % 89 == 0, F.lit(-999.0))
        .otherwise(F.col("value"))
        .alias("tas"),
    )
    out = Q.normalize_sentinels(obs, {"tas": ["-999.0"]})
    return out.select("station", "time", "tas")
