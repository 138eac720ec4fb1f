"""Distribution aggregates — histograms, IQR, climatologies,
frequent-bin detection, cadence inference (SURVEY.md §2.4).

All are grouped aggregations with optional window post-passes; no
Python in the hot path. Each maps a reference pandas/numpy idiom onto
one shuffle + Catalyst expressions:

- histogram (A3): ``np.histogram`` with fixed bin width
  (``qaqc_utils.py:44-143``) → grouped count on a computed bin key.
- frequent-bin detection (A4): count vs the ±3-bin neighborhood sum
  (``qaqc_frequent.py:503-563``) → window over bin index.
- winsorized climatology (A5): clip to p5/p95 then mean
  (``qaqc_climatological_outlier.py:105-127``).
- IQR with floor (A2): ``qaqc_unusual_gaps.py:364-379``.
- cadence/resolution inference (A12): mode of successive diffs
  (``qaqc_unusual_streaks.py:143-255``).
- lag-1 autocorrelation (A13): ``qaqc_deaccumulate.py:28-71``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .windows import ordered_window


def histogram(
    df: DataFrame, group, col: str, bin_width: float, origin: float = 0.0
) -> DataFrame:
    """A3: per-group fixed-width histogram. Returns (group, bin, n)
    where bin is the left edge index ``floor((x - origin)/width)``."""
    groupl = [group] if isinstance(group, str) else list(group)
    binned = df.where(F.col(col).isNotNull()).withColumn(
        "bin", F.floor((F.col(col) - F.lit(origin)) / F.lit(bin_width))
    )
    return binned.groupBy(*groupl, "bin").agg(F.count(F.lit(1)).alias("n"))


def frequent_bins(
    hist: DataFrame,
    group,
    neighborhood: int = 3,
    dominance: float = 0.5,
    min_count: int = 30,
) -> DataFrame:
    """A4: flag histogram bins holding > ``dominance`` of their
    (2·neighborhood+1)-bin block with at least ``min_count`` values.

    The reference scans each bin's ±3 neighborhood imperatively
    (qaqc_frequent.py:503-563); here it is one range-window sum over
    the bin index — NB ``rangeBetween`` (not rows) so absent bins
    count as zero, matching np.histogram's dense bins.
    """
    groupl = [group] if isinstance(group, str) else list(group)
    w = (
        Window.partitionBy(*groupl)
        .orderBy("bin")
        .rangeBetween(-neighborhood, neighborhood)
    )
    return (
        hist.withColumn("block_n", F.sum("n").over(w))
        .withColumn(
            "is_frequent",
            (F.col("n") > F.col("block_n") * F.lit(dominance))
            & (F.col("n") > F.lit(min_count)),
        )
    )


def group_iqr(
    df: DataFrame, group, col: str, floor: float | None = None
) -> DataFrame:
    """A2: per-group exact interquartile range, optionally floored
    (the climatological outlier test floors IQR at 1.5,
    qaqc_climatological_outlier.py:129-138)."""
    groupl = [group] if isinstance(group, str) else list(group)
    iqr = F.expr(f"percentile({col}, 0.75) - percentile({col}, 0.25)")
    if floor is not None:
        iqr = F.greatest(iqr, F.lit(float(floor)))
    return df.groupBy(*groupl).agg(iqr.alias("iqr"))


def winsorized_mean(
    df: DataFrame,
    group,
    col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
) -> DataFrame:
    """A5: per-group winsorized mean — clip to [p_lower, p_upper],
    then average. Two passes over the group expressed as one agg +
    self-join-free window would need the percentiles first; we return
    (group, clim) via agg-then-join in the caller if row-level
    anomalies are needed.
    """
    groupl = [group] if isinstance(group, str) else list(group)
    pcts = df.groupBy(*groupl).agg(
        F.expr(f"percentile({col}, {lower_q})").alias("__lo"),
        F.expr(f"percentile({col}, {upper_q})").alias("__hi"),
    )
    clipped = df.join(pcts, groupl).withColumn(
        "__clipped", F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi"))
    )
    return clipped.groupBy(*groupl).agg(F.avg("__clipped").alias("clim"))


def winsorized_mean_exact(
    df: DataFrame,
    group,
    col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """A5 (exact spelling): per-group winsorized mean with every
    intermediate in the integer domain so the result is bit-identical
    across engines. Values quantize to ``round(value*scale)`` BIGINT;
    the clip bounds are NEAREST-RANK percentiles (1-based index
    ``ceil(p*n)`` computed as ``(n*5+99) DIV 100`` / ``(n*95+99) DIV
    100`` — pure integer, no float index math); the clipped sum is a
    BIGINT; the only float op is the final single division, which IEEE
    rounds identically everywhere given identical operands.

    `winsorized_mean` (interpolated percentiles + float avg) is kept
    for reference parity with qaqc_climatological_outlier.py, but its
    float summation order makes round(clim, 6) flip at rounding
    boundaries between engines — caught by the sf0.001 value sweep.

    One shuffle: rank + count + bounds all ride the same
    partitionBy(group) window; the final agg reuses the partitioning.
    """
    groupl = [group] if isinstance(group, str) else list(group)
    vm = F.round(F.col(col) * F.lit(float(scale))).cast("long")
    base = df.where(F.col(col).isNotNull()).select(
        *groupl, vm.alias("__vm")
    )
    wp = Window.partitionBy(*groupl)
    w = wp.orderBy("__vm")
    r = (
        base.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wp))
        .withColumn(
            "__lo",
            F.max(
                F.when(
                    F.col("__rn")
                    == F.expr("(__n * 5 + 99) DIV 100"),
                    F.col("__vm"),
                )
            ).over(wp),
        )
        .withColumn(
            "__hi",
            F.max(
                F.when(
                    F.col("__rn")
                    == F.expr("(__n * 95 + 99) DIV 100"),
                    F.col("__vm"),
                )
            ).over(wp),
        )
    )
    clipped = F.least(F.greatest(F.col("__vm"), F.col("__lo")), F.col("__hi"))
    return r.groupBy(*groupl).agg(
        (
            F.sum(clipped).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(float(scale)))
        ).alias("clim")
    )


def cadence_mode_seconds(
    df: DataFrame, key, time_col: str
) -> DataFrame:
    """A12: per-key modal time step in seconds (deterministic
    tie-break: smallest step wins), from successive diffs."""
    keyl = [key] if isinstance(key, str) else list(key)
    w = ordered_window(keyl, time_col)
    diffs = df.withColumn(
        "__dt",
        F.unix_timestamp(time_col) - F.unix_timestamp(F.lag(time_col).over(w)),
    ).where(F.col("__dt").isNotNull())
    counts = diffs.groupBy(*keyl, "__dt").agg(F.count(F.lit(1)).alias("__n"))
    pick = Window.partitionBy(*keyl).orderBy(F.desc("__n"), F.asc("__dt"))
    return (
        counts.withColumn("__rk", F.row_number().over(pick))
        .where(F.col("__rk") == 1)
        .select(*keyl, F.col("__dt").alias("cadence_seconds"))
    )


def lag1_autocorr(df: DataFrame, key, order, col: str) -> DataFrame:
    """A13: per-key Pearson correlation of the series with its lag-1
    (accumulation detector, qaqc_deaccumulate.py:28-71 flags series
    with autocorr > 0.8 as accumulated gauges)."""
    keyl = [key] if isinstance(key, str) else list(key)
    w = ordered_window(keyl, order)
    pairs = df.withColumn("__prev", F.lag(col).over(w)).where(
        F.col("__prev").isNotNull() & F.col(col).isNotNull()
    )
    return pairs.groupBy(*keyl).agg(
        F.corr(col, "__prev").alias("lag1_autocorr")
    )
