"""As-of (backward) join — the canonical time-series operator Spark
has no native form of (SURVEY.md §2.3 J3 is the keep-newer cousin;
DuckDB/kdb/pandas ``merge_asof`` are the reference semantics).

Each left row (key, t) is matched with the right row of the same key
having the greatest event time ≤ t (optionally within a tolerance).

Implementation is the union-window decomposition, NOT a range join:
tag both sides, union on (key, time), and carry the most recent right
value forward with ``last_value(..., ignorenulls=True)`` over a
per-key window ordered by (time, side) — right rows sort before left
rows at equal timestamps so same-instant matches are visible.

Scale shape: ONE shuffle on the key (the window sort), linear in
|L|+|R| per key — no per-pair work, no join-condition explosion, and
AQE-compatible. A range self-join would be O(|L|·|R|) per key before
pruning; at 100 TB the union-window form is the difference between a
sort and a cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "station",
    left_time: str = "time",
    right_time: str = "time",
    value_cols: tuple[str, ...] = ("value",),
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left rows gain ``<col><suffix>`` for each
    right value column, plus ``<right_time><suffix>`` (the matched
    right timestamp; null when no right row precedes the left row or
    the match is older than ``tolerance_seconds``)."""
    lcols = left.columns
    l_tag = left.select(
        F.col(key),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in (key, left_time)],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        F.lit(None).cast("timestamp").alias("__rt"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in (key, left_time)
        ],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_time).alias("__rt"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ],
        F.last("__rt", ignorenulls=True).over(w).alias("__mt"),
    )
    out = carried.where(F.col("__side") == 1)
    within: Column = F.lit(True)
    if tolerance_seconds is not None:
        # microsecond-exact (unix_timestamp would truncate to seconds
        # and disagree with an integer-microsecond oracle)
        # cast("timestamp"): unix_micros rejects TIMESTAMP_NTZ inputs
        # (parquet isAdjustedToUTC=false); session tz is pinned UTC so
        # the cast is value-preserving and output types are untouched
        within = (
            F.unix_micros(F.col("__t").cast("timestamp"))
            - F.unix_micros(F.col("__mt").cast("timestamp"))
        ) <= F.lit(int(tolerance_seconds) * 1_000_000)
    out = out.select(
        F.col(key),
        F.col("__t").alias(left_time),
        *[F.col(c) for c in lcols if c not in (key, left_time)],
        *[
            F.when(within, F.col(f"__m_{c}"))
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.when(within, F.col("__mt")).alias(f"{right_time}{suffix}"),
    )
    return out
