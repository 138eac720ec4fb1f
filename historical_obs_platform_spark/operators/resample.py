"""Time-grid resampling and gap infill.

Re-expresses the reference's hourly standardization
(``scripts/4_merge_data/merge_hourly_standardization.py:97-244``) and
the 15-min grid infill (``VALLEYWATER_clean.py:115-134``) as single
grouped aggregations / grid joins:

- the reference splits columns into constant/instantaneous/sum/qaqc
  families, resamples each separately, and outer-merges on time; here
  one ``groupBy(key, date_trunc(grain, time))`` computes all families
  at once — the outer join disappears (SURVEY.md J2/W11).
- gap infill = generate the complete time grid with ``sequence()`` +
  ``explode`` and left-join observations (S6/W12).

Scale: one shuffle on (key, bucket); the grid generator is per-key
and linear in span/step — no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hourly_bucket(time_col: str) -> Column:
    return F.date_trunc("hour", F.col(time_col))


def resample(
    df: DataFrame,
    key,
    time_col: str,
    grain: str,
    first_cols: list[str] = (),
    sum_cols: list[str] = (),
    flag_cols: list[str] = (),
    count_col: str | None = "n_obs",
) -> DataFrame:
    """One-pass resample to ``grain`` ('hour', 'day', 'week', ...).

    - ``first_cols``: instantaneous variables — first value in the
      bucket by time (reference ``.resample("1h").first()``,
      merge_hourly_standardization.py:207-212). Implemented with
      ``min_by(col, time)`` (no sort, no row_number shuffle).
    - ``sum_cols``: accumulating variables (precip/radiation) — sum,
      but null when the bucket has no observations of that column
      (reference "sum unless all-NaN", :214-218).
    - ``flag_cols``: QC flags — distinct values comma-joined in
      deterministic (sorted) order (:220-224, 25-43).
    """
    keyl = [key] if isinstance(key, str) else list(key)
    bucket = F.date_trunc(grain, F.col(time_col)).alias("bucket")
    aggs: list[Column] = []
    for c in first_cols:
        aggs.append(F.min_by(c, F.col(time_col)).alias(f"{c}_first"))
    for c in sum_cols:
        aggs.append(
            F.when(F.count(c) == 0, F.lit(None))
            .otherwise(F.sum(c))
            .alias(f"{c}_sum")
        )
    for c in flag_cols:
        aggs.append(
            F.array_join(F.array_sort(F.collect_set(c)), ",").alias(
                f"{c}_flags"
            )
        )
    if count_col:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    return df.groupBy(*keyl, bucket).agg(*aggs)


def time_grid(
    df: DataFrame, key, time_col: str, step: str = "1 hour"
) -> DataFrame:
    """Complete per-key time grid from each key's min to max bucket:
    ``sequence(min, max, interval step)`` + ``explode``.

    Replaces the reference's pandas ``resample().asfreq()`` infill
    scaffold with a distributed generator — the sequence is computed
    per key, so no single task materializes the global span.
    """
    keyl = [key] if isinstance(key, str) else list(key)
    grain = step.split()[-1].rstrip("s")  # "1 hour" -> "hour"
    spans = df.groupBy(*keyl).agg(
        F.date_trunc(grain, F.min(time_col)).alias("__t0"),
        F.date_trunc(grain, F.max(time_col)).alias("__t1"),
    )
    return spans.select(
        *keyl,
        F.explode(
            F.sequence(
                F.col("__t0"), F.col("__t1"), F.expr(f"interval {step}")
            )
        ).alias("grid_ts"),
    )


def infill(
    df: DataFrame,
    key,
    time_col: str,
    step: str = "1 hour",
    infill_col: str = "standardized_infill",
) -> DataFrame:
    """W12: align observations to the complete grid; rows the grid
    created (no source obs in that bucket) get ``infill_col='y'``
    (merge_hourly_standardization.py:46-94)."""
    keyl = [key] if isinstance(key, str) else list(key)
    grain = step.split()[-1].rstrip("s")
    grid = time_grid(df, keyl, time_col, step)
    bucketed = df.withColumn("grid_ts", F.date_trunc(grain, F.col(time_col)))
    joined = grid.join(bucketed, [*keyl, "grid_ts"], "left")
    return joined.withColumn(
        infill_col, F.when(F.col(time_col).isNull(), F.lit("y")).otherwise(F.lit("n"))
    )
