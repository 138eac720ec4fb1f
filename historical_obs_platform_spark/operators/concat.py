"""Station concatenation, buoy blacklist, elevation infill.

- **J4 co-location grouping** (``qaqc_concatenate_stations.py:87-152``):
  stations sharing an exact (lat, lon) form a group (dense_rank over
  the coordinate pair).
- **J3 keep-newer concatenation** (``:206-239``, pairwise-iterated for
  >2 stations at ``:323-400``): within a group, for each timestamp the
  row from the highest-priority (newest) station wins. The reference
  folds pairwise; a single ``row_number`` over (group, time, priority)
  is the order-independent equivalent for any group size.
- **L7 buoy blacklist** (``qaqc_buoy_check.py:24-164``): broadcast
  rules table (station, optional variable, time window → flag 1/2).
- **L9 elevation infill** (``qaqc_wholestation.py:270-534``): the
  external DEM HTTP lookup is replaced by a pre-materialized
  (lat, lon) → elevation lookup table to keep the engine hermetic
  (SURVEY.md §7); flags 3 (DEM), 4 (station constant), 5 (offshore 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import qaqc as Q

FLAG_BUOY_SUSPECT = 1
FLAG_BUOY_OUT_OF_RANGE = 2
FLAG_ELEV_DEM = 3
FLAG_ELEV_STATION = 4
FLAG_ELEV_OFFSHORE = 5


# ------------------------------------------------------ J4: co-location
def colocation_groups(stations: DataFrame) -> DataFrame:
    """Stations at identical (latitude, longitude) → (station,
    colocation_group, n_colocated); groups of one keep group id for
    joinability."""
    w = Window.orderBy("latitude", "longitude")
    groups = (
        stations.groupBy("latitude", "longitude")
        .agg(
            F.collect_list("station").alias("members"),
            F.count(F.lit(1)).alias("n_colocated"),
        )
        .withColumn("colocation_group", F.dense_rank().over(w))
    )
    return groups.select(
        F.explode("members").alias("station"),
        "colocation_group",
        "n_colocated",
    )


# --------------------------------------------- J3: keep-newer concat
def concat_colocated(
    obs: DataFrame,
    groups: DataFrame,
    priority: DataFrame,
    time_col: str = "time",
) -> DataFrame:
    """Merge co-located stations into one series per group: for each
    (group, time), the row from the station with the highest
    ``priority`` (newest record, per the reference's keep-newer rule)
    survives; others are dropped. ``priority`` = (station,
    priority) — larger wins. The surviving series is renamed to the
    group's highest-priority station id.

    One window pass replaces the reference's pairwise
    ``_overlap_concat`` fold — same result for any group size,
    independent of fold order.
    """
    joined = obs.join(F.broadcast(groups), "station").join(
        F.broadcast(priority), "station"
    )
    w = Window.partitionBy("colocation_group", time_col).orderBy(
        F.desc("priority"), F.desc("station")
    )
    survivors = (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    w_grp = Window.partitionBy("colocation_group").orderBy(
        F.desc("priority"), F.desc("station")
    )
    canonical = (
        joined.select("colocation_group", "station", "priority")
        .distinct()
        .withColumn("__rk", F.row_number().over(w_grp))
        .where(F.col("__rk") == 1)
        .select(
            "colocation_group", F.col("station").alias("canonical_station")
        )
    )
    return (
        survivors.join(F.broadcast(canonical), "colocation_group")
        .withColumn("station", F.col("canonical_station"))
        .drop("canonical_station", "colocation_group", "n_colocated", "priority")
    )


# ------------------------------------------------------ L7: buoy rules
def buoy_blacklist_check(
    obs: DataFrame, rules: DataFrame, variables=None, max_rules: int = 10_000
) -> DataFrame:
    """Broadcast rules table: (station, variable|null=all,
    window_start|null, window_end|null, flag, hour_start|null,
    hour_end|null). A row matching a rule gets ``flag`` on the rule's
    variable(s) — e.g. data past a disestablishment date (flag 2) or
    daytime wind at a known-bad buoy (flag 1).

    The rules become driver-built CASE expressions, so the table must
    be dimension-sized: collection is capped at ``max_rules`` (the
    reference's blacklist is a handful of rows;
    ``qaqc_concatenate_stations.py`` hard-codes two) and an oversized
    table raises instead of OOMing the driver / exploding the plan.
    """
    out = obs
    rule_rows = rules.limit(max_rules + 1).collect()
    if len(rule_rows) > max_rules:
        raise ValueError(
            f"buoy rules table exceeds {max_rules} rows — not a "
            "dimension table; join-based flagging is required at "
            "that size"
        )
    for r in rule_rows:
        targets = (
            [r["variable"]]
            if r["variable"] is not None
            else Q.present_vars(obs, variables)
        )
        cond = F.lit(True)
        cond = cond & (F.col("station") == r["station"])
        if r["window_start"] is not None:
            cond = cond & (F.col("time") >= F.lit(r["window_start"]))
        if r["window_end"] is not None:
            cond = cond & (F.col("time") <= F.lit(r["window_end"]))
        if r["hour_start"] is not None:
            cond = cond & F.hour("time").between(
                r["hour_start"], r["hour_end"]
            )
        for var in targets:
            if var in out.columns:
                out = Q.write_flag(out, var, cond, int(r["flag"]))
    return out


# -------------------------------------------------- L9: elevation infill
def elevation_infill(
    obs: DataFrame, dem: DataFrame, offshore_default: bool = True
) -> DataFrame:
    """Fill missing elevations per station:

    - all-null elevation: DEM lookup on (lat, lon) → flag 3; no DEM
      hit → 0.0 m (offshore buoy) → flag 5;
    - partially-null: the station's constant (first non-null) → flag 4.

    ``dem`` is a (lat, lon, dem_elevation) lookup table, broadcast.
    """
    if "elevation" not in obs.columns:
        obs = obs.withColumn("elevation", F.lit(None).cast("double"))
    obs = Q.ensure_flag_columns(obs, ["elevation"])
    stats = obs.groupBy("station").agg(
        F.count("elevation").alias("__n_elev"),
        F.first("elevation", ignorenulls=True).alias("__stn_elev"),
        F.first("lat", ignorenulls=True).alias("__lat"),
        F.first("lon", ignorenulls=True).alias("__lon"),
    )
    dem_j = stats.join(
        F.broadcast(
            dem.select(
                F.col("lat").alias("__lat"),
                F.col("lon").alias("__lon"),
                F.col("dem_elevation").alias("__dem"),
            )
        ),
        ["__lat", "__lon"],
        "left",
    ).select("station", "__n_elev", "__stn_elev", "__dem")
    out = obs.join(F.broadcast(dem_j), "station", "left")
    fill_val = (
        F.when(F.col("__n_elev") > 0, F.col("__stn_elev"))
        .when(F.col("__dem").isNotNull(), F.col("__dem"))
        .otherwise(F.lit(0.0) if offshore_default else F.lit(None))
    )
    fill_flag = (
        F.when(F.col("__n_elev") > 0, F.lit(float(FLAG_ELEV_STATION)))
        .when(F.col("__dem").isNotNull(), F.lit(float(FLAG_ELEV_DEM)))
        .otherwise(
            F.lit(float(FLAG_ELEV_OFFSHORE))
            if offshore_default
            else F.lit(None)
        )
    )
    needs = F.col("elevation").isNull() & fill_val.isNotNull()
    out = (
        out.withColumn(
            Q.eraqc("elevation"),
            F.when(needs, fill_flag).otherwise(F.col(Q.eraqc("elevation"))),
        )
        .withColumn(
            "elevation", F.when(needs, fill_val).otherwise(F.col("elevation"))
        )
    )
    return out.drop("__n_elev", "__stn_elev", "__dem")


def metadata_backfill(
    obs: DataFrame,
    metadata: DataFrame,
    station_col: str = "station",
    rank_col: str | None = None,
    backfill: list[str] | None = None,
    carry: list[str] | None = None,
) -> DataFrame:
    """HOMR-style station-metadata enrichment
    (scripts/3_qaqc_data/homr_metadata.py): the reference compiles
    per-station metadata tables (names / identifiers / platforms /
    locations) keyed by the station id and uses them to backfill
    station attributes. Spark-first shape:

    1. pick ONE metadata record per station — the minimum ``rank_col``
      (e.g. a name-type preference order), deterministic tie-break on
      the remaining columns;
    2. broadcast it (metadata is dimension-sized: one row per station);
    3. ``coalesce``-backfill each ``backfill`` column (observation
       value wins unless null — enrichment never overwrites data) and
       attach each ``carry`` column verbatim.
    """
    from pyspark.sql.window import Window

    meta_cols = [c for c in metadata.columns if c != station_col]
    backfill = [c for c in (backfill or []) if c in metadata.columns]
    carry = [c for c in (carry or meta_cols) if c in metadata.columns]

    # ALWAYS reduce to one record per station — a multi-record
    # metadata table (the documented HOMR shape) would otherwise
    # fan out the observation join and duplicate obs rows. With no
    # rank_col the pick is still deterministic (ordered on every
    # metadata column); a null preference rank never beats a ranked
    # record (nulls last, matching SQL engines' ASC default).
    order = (
        [F.asc_nulls_last(rank_col)] if rank_col is not None else []
    ) + [
        F.asc_nulls_last(c) for c in meta_cols if c != rank_col
    ]
    w = Window.partitionBy(station_col).orderBy(*order)
    best = (
        metadata.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
    )
    keep = list(dict.fromkeys(backfill + carry))
    best = best.select(
        station_col, *[F.col(c).alias(f"__m_{c}") for c in keep]
    )
    out = obs.join(F.broadcast(best), station_col, "left")
    for c in backfill:
        if c in obs.columns:
            out = out.withColumn(
                c, F.coalesce(F.col(c), F.col(f"__m_{c}"))
            )
        else:
            out = out.withColumn(c, F.col(f"__m_{c}"))
    for c in carry:
        if c not in backfill and c not in obs.columns:
            out = out.withColumn(c, F.col(f"__m_{c}"))
    return out.drop(*[f"__m_{c}" for c in keep])
