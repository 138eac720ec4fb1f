"""Merge stage — derive missing variables, hourly standardization,
flag accounting (``scripts/4_merge_data/MERGE_pipeline.py`` and
friends), one Spark job over all stations.

The reference splits columns into constant / instantaneous / sum /
qaqc families, resamples each with pandas, and outer-merges on time
(merge_hourly_standardization.py:97-244). Here a single
``groupBy(station, hour)`` computes all four families — the four-way
split and the outer join disappear (SURVEY.md J2/W11), then a grid
left-join marks infilled hours (W12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import kernels as K
from ..operators import qaqc as Q
from ..operators.resample import time_grid

# Variables summed over the hour (precip + radiation); everything else
# observational takes first-in-hour (merge_hourly_standardization.py:126-128).
SUM_VARS = ["pr", "pr_5min", "pr_15min", "pr_1h", "rsds"]
CONSTANT_VARS = ["lat", "lon", "elevation"]


def derive_missing(df: DataFrame) -> DataFrame:
    """L11 (merge_derive_missing.py:41-174): derive dewpoint from
    (tas, hurs), RH from (tas, tdps), each only when the source
    variable is absent from the frame; flag 38 (synergistic) where any
    input row is flagged (merge_derive_missing.py:202-250)."""
    out = df
    cols = set(df.columns)
    if "tdps" not in cols and {"tas", "hurs"} <= cols:
        out = out.withColumn(
            "tdps_derived", K.dewpoint_from_rh("tas", "hurs")
        )
        out = Q.ensure_flag_columns(out, ["tdps_derived"])
        out = out.withColumn(
            Q.eraqc("tdps_derived"),
            F.when(
                F.col(Q.eraqc("tas")).isNotNull()
                | F.col(Q.eraqc("hurs")).isNotNull(),
                F.lit(float(Q.FLAG_DERIVED_SYNERGISTIC)),
            ).otherwise(F.col(Q.eraqc("tdps_derived"))),
        )
    if "hurs" not in cols and "tas" in cols and (
        "tdps" in cols or "tdps_derived" in set(out.columns)
    ):
        dew = "tdps" if "tdps" in cols else "tdps_derived"
        out = out.withColumn(
            "hurs_derived", K.relhumid_from_dewpoint("tas", dew)
        )
        out = Q.ensure_flag_columns(out, ["hurs_derived"])
        out = out.withColumn(
            Q.eraqc("hurs_derived"),
            F.when(
                F.col(Q.eraqc("tas")).isNotNull()
                | F.col(Q.eraqc(dew)).isNotNull(),
                F.lit(float(Q.FLAG_DERIVED_SYNERGISTIC)),
            ).otherwise(F.col(Q.eraqc("hurs_derived"))),
        )
    return out


def hourly_standardize(df: DataFrame) -> DataFrame:
    """W11+W12: standardize every station to the hourly grid.

    One aggregation computes: first-in-hour for instantaneous
    variables (min_by value,time), sum-unless-empty for precip /
    radiation, comma-joined sorted distinct flags, first non-null for
    constants; then the complete hourly grid is left-joined and
    created rows get ``standardized_infill='y'`` with constants
    carried from the station (merge_hourly_standardization.py:46-244).
    """
    const_vars = [v for v in CONSTANT_VARS if v in df.columns]
    variables = [v for v in Q.present_vars(df) if v not in const_vars]
    sum_vars = [v for v in variables if v in SUM_VARS]
    inst_vars = [v for v in variables if v not in SUM_VARS]

    aggs = []
    for v in inst_vars:
        aggs.append(F.min_by(v, F.col("time")).alias(v))
    for v in sum_vars:
        aggs.append(
            F.when(F.count(v) == 0, F.lit(None))
            .otherwise(F.sum(v))
            .alias(v)
        )
    for v in variables:
        fc = Q.eraqc(v)
        if fc in df.columns:
            aggs.append(
                F.array_join(
                    F.array_sort(
                        F.collect_set(F.col(fc).cast("int").cast("string"))
                    ),
                    ",",
                ).alias(fc)
            )
    for v in const_vars:
        aggs.append(F.first(v, ignorenulls=True).alias(v))
    aggs.append(F.count(F.lit(1)).alias("n_source_obs"))

    hourly = df.groupBy(
        "station", F.date_trunc("hour", F.col("time")).alias("time")
    ).agg(*aggs)

    grid = time_grid(df, "station", "time", "1 hour").withColumnRenamed(
        "grid_ts", "time"
    )
    out = grid.join(hourly, ["station", "time"], "left")
    out = out.withColumn(
        "standardized_infill",
        F.when(F.col("n_source_obs").isNull(), "y").otherwise("n"),
    )
    # constants carried onto infilled rows from the station
    from pyspark.sql.window import Window

    w_stn = Window.partitionBy("station")
    for v in const_vars:
        out = out.withColumn(v, F.first(v, ignorenulls=True).over(w_stn))
    return out


def flag_counts(df: DataFrame) -> DataFrame:
    """A6 (merge_eraqc_counts.py:22-157): long-format flag accounting —
    one row per (station, variable, flag, n). Hourly comma-joined flag
    strings are exploded back to individual codes first."""
    flag_cols = [c for c in df.columns if c.endswith("_eraqc")]
    parts = []
    for fc in flag_cols:
        var = fc[: -len("_eraqc")]
        col = F.col(fc).cast("string")
        exploded = (
            df.select(
                "station",
                F.explode(F.split(col, ",")).alias("flag"),
            )
            .where(F.col("flag").isNotNull() & (F.col("flag") != ""))
            .withColumn("variable", F.lit(var))
        )
        parts.append(exploded)
    if not parts:
        raise ValueError("no _eraqc columns present")
    from functools import reduce

    all_flags = reduce(lambda a, b: a.unionByName(b), parts)
    return (
        all_flags.withColumn(
            "flag", F.col("flag").cast("double").cast("int")
        )
        .groupBy("station", "variable", "flag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Public output vocabulary (merge_clean_vars.py:21-97): the merged
# product carries only the standard variables, their hourly flag
# strings, constants, and the infill marker.
PUBLIC_COLUMNS = (
    ["station", "time", "lat", "lon", "elevation", "standardized_infill"]
    + Q.OBS_VARS
    + [Q.eraqc(v) for v in Q.OBS_VARS]
)


def select_public_columns(df: DataFrame) -> DataFrame:
    """Merge part 4: filter to the public vocabulary, dropping raw-QC
    and intermediate helper columns (merge_clean_vars.py:46-89)."""
    keep = [c for c in df.columns if c in PUBLIC_COLUMNS]
    return df.select(*keep)


def network_flag_rates(counts: DataFrame) -> DataFrame:
    """A6 roll-ups (qaqc_generate_flag_rates.py:96-231 /
    qaqc_success_report_tables.py:150-311): station-level flag counts
    rolled up per (network, variable, flag) and per (variable, flag)
    — sequential grouped sums, network derived from the station id."""
    with_net = counts.withColumn(
        "network", F.split(F.col("station"), "_").getItem(0)
    )
    per_network = with_net.groupBy("network", "variable", "flag").agg(
        F.sum("n").alias("n")
    )
    total = (
        with_net.groupBy("variable", "flag")
        .agg(F.sum("n").alias("n"))
        .withColumn("network", F.lit("ALL"))
    )
    return per_network.unionByName(total.select("network", "variable", "flag", "n"))


def run_merge(df: DataFrame) -> DataFrame:
    """Full merge stage: derive missing → hourly standardization →
    public-vocabulary column filter."""
    return select_public_columns(hourly_standardize(derive_missing(df)))
