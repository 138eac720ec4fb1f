"""Full-pipeline throughput query: events mapped to pseudo-
observations, run through the structural/logic QA/QC chain and the
merge stage in one job — the driver's bench gets an end-to-end
pipeline number, not just per-operator numbers.

No SQL oracle (the chain's components are individually oracle-checked
and planted-defect tested); the driver records a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.merge import flag_counts, hourly_standardize
from ..plans.qaqc_chain import run_qaqc
from ..registry import query
from .common import table


@query("chain_qaqc_merge_events")
def chain_qaqc_merge_events(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    obs = ev.select(
        F.col("user_id").cast("string").alias("station"),
        F.col("ts").alias("time"),
        F.lit(40.0).alias("lat"),
        F.lit(-120.0).alias("lon"),
        F.lit(100.0).alias("elevation"),
        (F.lit(200.0) + F.col("value") / 2).alias("tas"),
        (F.lit(195.0) + F.col("value") / 2).alias("tdps"),
        F.pmod(F.col("value"), F.lit(30.0)).alias("pr"),
        (F.floor(F.col("value")) % 25).cast("double").alias("sfcWind"),
        (F.floor(F.col("value") * 7) % 361).cast("double").alias(
            "sfcWind_dir"
        ),
    )
    # 30-day records: distribution tests are gated off by design
    # (record-length bypass would yellow-flag everything anyway)
    flagged = run_qaqc(
        obs,
        with_distribution=False,
        spike_vars=("tas",),
        streak_vars=("tas",),
    )
    hourly = hourly_standardize(flagged)
    counts = flag_counts(flagged)
    return (
        hourly.groupBy("station")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(
                F.when(F.col("standardized_infill") == "y", 1).otherwise(0)
            ).alias("n_infilled"),
        )
        .join(
            counts.groupBy("station").agg(F.sum("n").alias("n_flags")),
            "station",
            "left",
        )
        .select(
            "station",
            "n_hours",
            "n_infilled",
            F.coalesce(F.col("n_flags"), F.lit(0)).alias("n_flags"),
        )
    )


# --------------------------------------------------------------------
# The SURVEY.md §7 "minimum end-to-end slice", exact-oracle edition:
# sentinel normalization (P2) → world-record check (L6) →
# supersaturation (L1) → negative precip (L3) → one-pass hourly
# standardization with grid infill (W11/W12) — every layer of the
# engine in one DAG, hash-compared against a DuckDB restatement.
# Check order follows the reference pipeline (QAQC_pipeline.py:579-
# 965: world-record before logic checks), so a negative precip value
# draws flag 11 (world-record floor 0.0), never reaching L3 — same
# precedence as the reference; flag 10 is exercised standalone in
# l3_negative_precip.
#
# The hourly firsts are row_number()-style (value at earliest stamp,
# even if null) — matching Spark's min_by null semantics — and the
# precip hour-sum is decimal so partial-aggregation order can't
# change the hash. Infilled hours carry NULL flags; observed hours
# with no flags carry '' (the engine's array_join of an empty set) —
# the distinction is part of the contract.
# --------------------------------------------------------------------
_MS_TAS = (
    "CASE WHEN event_id % 101 = 0 THEN -9999.0 "
    "WHEN event_id % 211 = 0 THEN 340.0 "
    "ELSE 270.0 + value % 30.0 END"
)
_MS_TDPS = (
    "CASE WHEN event_id % 13 = 0 THEN 271.0 + value % 30.0 "
    "ELSE 268.0 + value % 30.0 END"
)
_MS_PR = (
    "CAST(CASE WHEN event_id % 17 = 0 THEN -1.0 "
    "ELSE value % 3.0 END AS DECIMAL(18,2))"
)

MIN_SLICE_ORACLE = f"""
WITH o AS (
  SELECT CAST(user_id % 25 AS VARCHAR) AS station, ts AS time,
         CASE WHEN event_id % 101 = 0 THEN NULL
              WHEN event_id % 211 = 0 THEN 340.0
              ELSE 270.0 + value % 30.0 END AS tas,
         {_MS_TDPS} AS tdps,
         {_MS_PR} AS pr
  FROM events
), fl AS (
  SELECT *,
         CASE WHEN tas < 210.15 OR tas > 329.92 THEN 11.0 END AS tas_f,
         CASE WHEN pr < 0 OR pr > 656 THEN 11.0 END AS pr_f,
         CASE WHEN NOT (tas < 210.15 OR tas > 329.92)
                   AND tdps > tas THEN 12.0 END AS tdps_f
  FROM o
), rn AS (
  SELECT *, row_number() OVER (
           PARTITION BY station, date_trunc('hour', time)
           ORDER BY time) AS rnk
  FROM fl
), hourly AS (
  SELECT station, date_trunc('hour', time) AS time,
         max(CASE WHEN rnk = 1 THEN tas END) AS tas,
         max(CASE WHEN rnk = 1 THEN tdps END) AS tdps,
         CAST(CASE WHEN count(pr) = 0 THEN NULL ELSE sum(pr) END
              AS DOUBLE) AS pr,
         coalesce(array_to_string(list_sort(list_distinct(
             list(CAST(CAST(tas_f AS INT) AS VARCHAR))
               FILTER (WHERE tas_f IS NOT NULL))), ','), '') AS tas_eraqc,
         coalesce(array_to_string(list_sort(list_distinct(
             list(CAST(CAST(tdps_f AS INT) AS VARCHAR))
               FILTER (WHERE tdps_f IS NOT NULL))), ','), '') AS tdps_eraqc,
         coalesce(array_to_string(list_sort(list_distinct(
             list(CAST(CAST(pr_f AS INT) AS VARCHAR))
               FILTER (WHERE pr_f IS NOT NULL))), ','), '') AS pr_eraqc,
         count(*) AS n_source_obs
  FROM rn GROUP BY 1, 2
), grid AS (
  SELECT station,
         unnest(generate_series(date_trunc('hour', min(time)),
                                date_trunc('hour', max(time)),
                                INTERVAL 1 HOUR)) AS time
  FROM o GROUP BY station
)
SELECT g.station, g.time, h.tas, h.tdps, h.pr,
       h.tas_eraqc, h.tdps_eraqc, h.pr_eraqc, h.n_source_obs,
       CASE WHEN h.n_source_obs IS NULL THEN 'y' ELSE 'n' END
         AS standardized_infill
FROM grid g LEFT JOIN hourly h
  ON g.station = h.station AND g.time = h.time
"""


@query("chain_min_slice_hourly", MIN_SLICE_ORACLE)
def chain_min_slice_hourly(spark, sf_dir):
    from ..operators import qaqc as Q

    ev = table(spark, sf_dir, "events")
    obs = ev.select(
        (F.col("user_id") % 25).cast("string").alias("station"),
        F.col("ts").alias("time"),
        F.expr(_MS_TAS).alias("tas"),
        F.expr(_MS_TDPS).alias("tdps"),
        F.expr(_MS_PR).alias("pr"),
    )
    obs = Q.normalize_sentinels(obs, {"tas": ["-9999.0"]})
    obs = Q.ensure_flag_columns(obs, ["tas", "tdps", "pr"])
    obs = Q.world_record_check(obs)
    obs = Q.supersaturation_check(obs)
    obs = Q.negative_precip_check(obs)
    hourly = hourly_standardize(obs)
    return hourly.select(
        "station",
        "time",
        "tas",
        "tdps",
        F.col("pr").cast("double").alias("pr"),
        "tas_eraqc",
        "tdps_eraqc",
        "pr_eraqc",
        "n_source_obs",
        "standardized_infill",
    )
