"""Structured Streaming surface (SURVEY.md §2.9).

The reference is pure batch, but its incremental behaviors map onto
Structured Streaming:

- incremental pulls from the last stored timestamp
  (``update_pull.py:58-95``) → file/offset-tracked sources with
  ``Trigger.AvailableNow``;
- late/re-delivered observations resolved keep-newest per
  (station, time) (``qaqc_concatenate_stations.py:206-239``) →
  ``dropDuplicatesWithinWatermark``;
- hourly tumbling standardization (first-in-hour / sum-over-hour /
  flag union, ``merge_hourly_standardization.py:97-244``) →
  ``groupBy(window(time, '1 hour'))`` with a watermark bounding state.

Only the stateless logic checks (L1-L7) and the hourly rollup run
online; whole-history tests (climatology, frequent values) are batch
recomputes by nature (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import qaqc as Q


def with_watermark(
    stream: DataFrame, time_col: str = "time", delay: str = "2 hours"
) -> DataFrame:
    return stream.withWatermark(time_col, delay)


def dedup_keep_first_stream(
    stream: DataFrame,
    keys=("station", "time"),
    time_col: str = "time",
    delay: str = "2 hours",
) -> DataFrame:
    """Streaming O2: drop re-delivered (station, time) duplicates,
    keeping the first arrival, with state bounded by the watermark."""
    return with_watermark(stream, time_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def hourly_standardize_stream(
    stream: DataFrame,
    key: str = "station",
    time_col: str = "time",
    first_cols=(),
    sum_cols=(),
    flag_cols=(),
    delay: str = "2 hours",
) -> DataFrame:
    """Streaming W11: one tumbling-window aggregation computes the
    reference's resample families; the watermark finalizes each hour
    once late data can no longer arrive (append semantics)."""
    wm = with_watermark(stream, time_col, delay)
    aggs = []
    for c in first_cols:
        aggs.append(F.min_by(c, F.col(time_col)).alias(f"{c}_first"))
    for c in sum_cols:
        aggs.append(
            F.when(F.count(c) == 0, F.lit(None)).otherwise(F.sum(c)).alias(
                f"{c}_sum"
            )
        )
    for c in flag_cols:
        aggs.append(
            F.array_join(F.array_sort(F.collect_set(c)), ",").alias(
                f"{c}_flags"
            )
        )
    aggs.append(F.count(F.lit(1)).alias("n_obs"))
    return wm.groupBy(
        F.window(F.col(time_col), "1 hour").alias("win"), F.col(key)
    ).agg(*aggs).select(
        F.col(key),
        F.col("win.start").alias("hour"),
        *[c for c in ("n_obs",)],
        *[F.col(f"{c}_first") for c in first_cols],
        *[F.col(f"{c}_sum") for c in sum_cols],
        *[F.col(f"{c}_flags") for c in flag_cols],
    )


def logic_checks_stream(stream: DataFrame) -> DataFrame:
    """Stateless online QA/QC: the cross-variable logic checks and
    world-record gate are pure row predicates, so they run unchanged
    on a stream (flags written exactly as in batch)."""
    out = Q.ensure_flag_columns(stream)
    out = Q.world_record_check(out)
    out = Q.supersaturation_check(out)
    out = Q.negative_precip_check(out)
    out = Q.calm_wind_dir_check(out)
    return out


def sliding_rollup_stream(
    stream: DataFrame,
    key: str = "station",
    time_col: str = "time",
    agg_col: str = "value",
    window: str = "2 hours",
    slide: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """Sliding-window aggregation (window > slide ⇒ each event lands
    in window/slide overlapping windows): count + exact decimal sum
    per (key, window). Same shape as the tumbling W11 rollup, but the
    window assignment fans each row out to its covering windows —
    state per key is bounded by window/slide open windows behind the
    watermark."""
    wm = with_watermark(stream, time_col, delay)
    return (
        wm.groupBy(
            F.window(F.col(time_col), window, slide).alias("win"),
            F.col(key),
        )
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.col(agg_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col(key),
            F.col("win.start").alias("win_start"),
            "n_obs",
            "sum_value",
        )
    )


def interval_join_stream(
    obs: DataFrame,
    alerts: DataFrame,
    key: str = "station",
    time_col: str = "time",
    horizon: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner equi-join with an event-time interval:
    each alert matches the same key's observations in
    [alert_time, alert_time + horizon]. The time bound on BOTH event
    times lets Spark expire join state behind the watermarks (an
    unbounded stream-stream join would buffer both sides forever);
    inner-join matches emit as soon as both sides arrive — no
    watermark wait."""
    o = with_watermark(obs, time_col, delay).alias("o")
    a = with_watermark(alerts, time_col, delay).alias("a")
    cond = (
        (F.col(f"o.{key}") == F.col(f"a.{key}"))
        & (F.col(f"o.{time_col}") >= F.col(f"a.{time_col}"))
        & (
            F.col(f"o.{time_col}")
            <= F.col(f"a.{time_col}") + F.expr(f"INTERVAL {horizon}")
        )
    )
    return o.join(a, cond, "inner").select(
        F.col(f"o.{key}").alias(key),
        F.col(f"a.{time_col}").alias("alert_time"),
        F.col(f"o.{time_col}").alias("obs_time"),
        F.col("o.value").alias("obs_value"),
        F.col("a.value").alias("alert_value"),
    )
