"""Orchestrated QA/QC chain — the reference's per-station pipeline
(``scripts/3_qaqc_data/QAQC_pipeline.py:579-965``) as one Spark job
over all stations.

Order matters and is data semantics, not an optimization
(QAQC_pipeline.py:830): earlier flags exclude rows from later checks
via the valid mask. The whole chain is one Catalyst DAG — stations are
partitions, not processes; Catalyst fuses the per-variable ``when``
projections (CollapseProject), and the only shuffles are the
per-station aggregates (pressure fix, elevation stats, gates) and the
window passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import qaqc as Q
from ..operators.aggregates import group_iqr
from ..operators.windows import detect_spikes, sessionize_runs


def spike_check(
    df: DataFrame,
    var: str,
    factor: float = 6.0,
    min_points: int = 50,
    max_gap_hours: int = 12,
) -> DataFrame:
    """Flag 23: unusual jumps. crit = factor × IQR of first differences
    per (station, calendar month), months with > min_points only
    (qaqc_unusual_large_jumps.py:219-299, single-point confirmation
    form: big jump in, big opposite jump out, neighbor gaps ≤ 12 h)."""
    if var not in df.columns:
        return df
    w = Window.partitionBy("station").orderBy("time")
    d = df.withColumn("__d", F.col(var) - F.lag(var).over(w)).withColumn(
        "__month", F.date_trunc("month", F.col("time"))
    )
    crit = (
        d.where(F.col("__d").isNotNull())
        .groupBy("station", "__month")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.expr("percentile(__d, 0.75) - percentile(__d, 0.25)").alias(
                "__iqr"
            ),
        )
        .where(F.col("__n") > min_points)
        .select(
            "station",
            "__month",
            F.ceil(F.lit(factor) * F.col("__iqr")).cast("double").alias("__crit"),
        )
    )
    joined = d.join(crit, ["station", "__month"], "left")
    flagged = detect_spikes(
        joined,
        "station",
        "time",
        var,
        crit=F.col("__crit"),
        max_gap_seconds=max_gap_hours * 3600,
        out="__spike",
    )
    out = Q.write_flag(
        flagged,
        var,
        F.col("__spike") & F.col("__crit").isNotNull(),
        Q.FLAG_SPIKE,
    )
    return out.drop("__d", "__month", "__crit", "__spike")


def consecutive_streak_check(
    df: DataFrame,
    var: str,
    min_count: int = 20,
    min_span_days: float | None = 2.0,
) -> DataFrame:
    """Flag 28: straight repeated-value streaks — runs of consecutive
    identical non-null values longer than ``min_count`` observations OR
    spanning more than ``min_span_days``
    (qaqc_unusual_streaks.py:573-694; per-variable/resolution threshold
    tables at :44-122 collapse to the two knobs here)."""
    if var not in df.columns:
        return df
    runs = sessionize_runs(df, "station", "time", var, out="__run")
    w_run = Window.partitionBy("station", "__run")
    spans = (
        runs.withColumn("__run_len", F.count(F.lit(1)).over(w_run))
        .withColumn(
            "__run_days",
            (
                F.unix_timestamp(F.max("time").over(w_run))
                - F.unix_timestamp(F.min("time").over(w_run))
            )
            / F.lit(86400.0),
        )
    )
    bad = F.col(var).isNotNull() & (
        (F.col("__run_len") > min_count)
        | (
            F.lit(min_span_days is not None)
            & (F.col("__run_days") > F.lit(min_span_days or 0.0))
            & (F.col("__run_len") > 1)
        )
    )
    out = Q.write_flag(spans, var, bad, Q.FLAG_STREAK_CONSECUTIVE)
    return out.drop("__run", "__run_len", "__run_days")


def deaccumulate_precip(df: DataFrame) -> DataFrame:
    """W7/flags 34-35: recover incremental precipitation from an
    accumulated gauge column ``accum_pr`` into ``pr``; the original is
    kept and flagged 35 (qaqc_deaccumulate.py:237-386). Resets
    (drop < −50) and negative increments clamp to 0."""
    if "accum_pr" not in df.columns:
        return df
    w = Window.partitionBy("station").orderBy("time")
    d = F.col("accum_pr") - F.lag("accum_pr").over(w)
    incremental = (
        F.when(d.isNull(), F.lit(None))
        .when(d < -50.0, F.lit(0.0))
        .when(d < 0, F.lit(0.0))
        .otherwise(d)
    )
    out = df.withColumn(
        "pr",
        F.when(F.col("accum_pr").isNotNull(), incremental).otherwise(
            F.col("pr") if "pr" in df.columns else F.lit(None).cast("double")
        ),
    )
    out = Q.ensure_flag_columns(out, ["pr"])
    return out.withColumn(
        Q.eraqc("accum_pr"),
        F.when(
            F.col("accum_pr").isNotNull(),
            F.lit(float(Q.FLAG_DEACCUM_ORIGINAL)),
        ).otherwise(F.col(Q.eraqc("accum_pr"))),
    )


def run_qaqc(
    df: DataFrame,
    sentinels: dict[str, list[str]] | None = None,
    spike_vars=("tas", "tdps", "ps", "psl"),
    streak_vars=("tas", "tdps", "sfcWind"),
    dist_vars=("tas", "tdps"),
    with_distribution: bool = True,
    truncate_lineage: bool = True,
) -> DataFrame:
    """The full chain in reference order (QAQC_pipeline.py:579-965):

    sentinels → station gates → elevation consistency → pressure-units
    fix → de-accumulation → world records → cross-variable logic →
    [record-length bypass] → frequent values (+precip) → unusual gaps
    (monthly, distribution, precip) → climatological outlier
    (+precip) → streaks (hourly / consecutive / whole-day) → jumps.

    The order is data semantics, not an optimization: earlier flags
    exclude rows from later checks (QAQC_pipeline.py:830).

    Returns the flagged observations table (rejected stations removed,
    all other rows kept with ``<var>_eraqc`` populated).
    """
    from ..operators import distribution as D

    def cut(d: DataFrame) -> DataFrame:
        # Lineage truncation between check groups: each check layers
        # joins/windows on the full prior plan, and Catalyst
        # analysis/optimization time grows superlinearly with plan
        # depth (~30 self-referencing stages by the end of the chain).
        # localCheckpoint materializes the intermediate (the reference
        # re-reads from disk between stages for the same reason); on a
        # cluster, swap for reliable checkpoints or a staging table.
        if not truncate_lineage:
            return d
        return d.localCheckpoint(eager=False)

    out = Q.ensure_flag_columns(df)
    if sentinels:
        out = Q.normalize_sentinels(out, sentinels)
    gates = Q.station_gates(out)
    out = Q.apply_station_gates(out, gates)
    out = Q.elevation_consistency_check(out)
    out = Q.pressure_units_fix(out)
    out = deaccumulate_precip(out)
    out = Q.world_record_check(out)
    out = Q.supersaturation_check(out)
    out = Q.wetbulb_streak_check(out)
    out = Q.negative_precip_check(out)
    out = Q.precip_accum_ordering_check(out)
    out = Q.calm_wind_dir_check(out)
    out = cut(out)
    if with_distribution:
        for v in dist_vars:
            out = D.record_length_bypass(out, v)
        for v in dist_vars:
            out = D.frequent_values_check(out, v)
        out = D.synergistic_flag_copy(out, "tas", "tdps")
        out = D.precip_frequent_check(out, "pr")
        for v in dist_vars:
            out = D.monthly_median_gap_check(out, v)
        out = D.precip_gap_check(out, "pr")
        out = cut(out)
        for v in dist_vars:
            out = D.distribution_gap_check(out, v)
        for v in dist_vars:
            out = D.climatological_outlier_check(out, v)
        out = D.precip_clim_outlier_check(out, "pr")
        out = cut(out)
        for v in streak_vars:
            out = D.same_hour_streak_check(out, v)
    for v in streak_vars:
        out = consecutive_streak_check(out, v)
    out = cut(out)
    if with_distribution:
        for v in streak_vars:
            out = D.whole_day_streak_check(out, v)
    for v in spike_vars:
        out = spike_check(out, v)
    return out
