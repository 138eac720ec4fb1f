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
