"""Ordered-per-key window operators — the engine's core competency.

The reference's QA/QC battery is a set of per-station ordered-by-time
computations (SURVEY.md §2.5, W1-W10). Re-expressed here as reusable
transforms over ``Window.partitionBy(key).orderBy(order)``:

- first difference / time delta (W1/W2 — reference
  ``scripts/3_qaqc_data/qaqc_unusual_large_jumps.py:252-262``)
- sessionization / run-length encoding (W3 —
  ``qaqc_unusual_streaks.py:573-694``'s ``(v != v.shift()).cumsum()``)
- spike detection (W6 — ``qaqc_unusual_large_jumps.py:128-299``)
- de-accumulation (W7 — ``qaqc_deaccumulate.py:74-234``)
- long-run flagging (W8 — ``qaqc_logic_checks.py:80-151``, rewritten
  from the reference's O(n·k) candidate loop to an O(n) sessionize)

Scale: each operator is a single window pass per key — one shuffle on
``key``, then linear work inside each partition. Keys (stations,
users) are numerous and bounded in size (≈4.4 M rows max in the
reference corpus), so partitions stay executor-sized at 100 TB; skew
is handled by AQE, not manual packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def ordered_window(key, order) -> WindowSpec:
    key = [key] if isinstance(key, str) else list(key)
    order = [order] if isinstance(order, (str, Column)) else list(order)
    return Window.partitionBy(*key).orderBy(*order)


def with_diff(
    df: DataFrame, key, order, col: str, out: str = "diff"
) -> DataFrame:
    """W1: first difference of ``col`` within key, ordered by ``order``."""
    w = ordered_window(key, order)
    return df.withColumn(out, F.col(col) - F.lag(col).over(w))


def with_time_delta_seconds(
    df: DataFrame, key, time_col: str, out: str = "dt_seconds"
) -> DataFrame:
    """W2: seconds elapsed since the previous row of the same key."""
    w = ordered_window(key, time_col)
    return df.withColumn(
        out,
        (
            F.unix_timestamp(time_col) - F.unix_timestamp(F.lag(time_col).over(w))
        ).cast("long"),
    )


def sessionize(
    df: DataFrame, key, order, change: Column, out: str = "run_id"
) -> DataFrame:
    """W3: run-length encoding — ``out`` increments whenever ``change``
    is true, starting at a new key. The classic
    ``(v != v.shift()).cumsum()`` sessionization as a running sum.
    """
    w = ordered_window(key, order)
    chg = F.when(change | F.isnull(change), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        out,
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sessionize_runs(
    df: DataFrame, key, order, col: str, out: str = "run_id"
) -> DataFrame:
    """Runs of consecutive equal ``col`` values per key (null-safe
    equality, so runs of nulls also group)."""
    w = ordered_window(key, order)
    chg = F.when(
        F.col(col).eqNullSafe(F.lag(col).over(w)), F.lit(0)
    ).otherwise(F.lit(1))
    return df.withColumn(
        out, F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def run_stats(
    df_with_runs: DataFrame, key, run_col: str, time_col: str, value_col: str
) -> DataFrame:
    """Per-run statistics used by every streak test: length, span,
    first/last timestamp, the run's value."""
    key = [key] if isinstance(key, str) else list(key)
    return df_with_runs.groupBy(*key, run_col).agg(
        F.count(F.lit(1)).alias("run_len"),
        F.min(time_col).alias("run_start"),
        F.max(time_col).alias("run_end"),
        F.first(value_col).alias("run_value"),
    )


def flag_long_runs(
    df: DataFrame,
    key,
    time_col: str,
    predicate: Column,
    min_span_seconds: int,
    flag_col: str,
    flag_value,
) -> DataFrame:
    """W8: flag every row inside a run where ``predicate`` holds
    continuously for at least ``min_span_seconds``.

    Reference semantics: qaqc_logic_checks.py:80-151 scans every
    candidate 24 h window (O(n·k)); the equivalent O(n) form is
    sessionize-on-predicate + span filter.
    """
    keyl = [key] if isinstance(key, str) else list(key)
    marked = df.withColumn("__pred", predicate.cast("int"))
    runs = sessionize(
        marked,
        keyl,
        time_col,
        F.col("__pred") != F.lag("__pred").over(ordered_window(keyl, time_col)),
        out="__run",
    )
    w_run = Window.partitionBy(*keyl, "__run")
    spanned = runs.withColumn(
        "__span",
        F.unix_timestamp(F.max(time_col).over(w_run))
        - F.unix_timestamp(F.min(time_col).over(w_run)),
    )
    flagged = spanned.withColumn(
        flag_col,
        F.when(
            (F.col("__pred") == 1) & (F.col("__span") >= min_span_seconds),
            F.lit(flag_value),
        ).otherwise(F.col(flag_col) if flag_col in df.columns else F.lit(None)),
    )
    return flagged.drop("__pred", "__run", "__span")


def detect_spikes(
    df: DataFrame,
    key,
    time_col: str,
    col: str,
    crit: Column,
    max_gap_seconds: int = 12 * 3600,
    out: str = "is_spike",
) -> DataFrame:
    """W6 (single-point form): a row is a spike when the jump into it
    exceeds ``crit`` and the jump out returns by more than ``crit`` in
    the opposite direction, with both neighbor gaps ≤ ``max_gap_seconds``.

    ``crit`` is a per-row Column (typically joined from a per-month
    IQR aggregate — see aggregates.monthly_iqr), mirroring
    ``crit = ceil(6 * IQR(diff))`` at qaqc_unusual_large_jumps.py:266-283.
    """
    w = ordered_window(key, time_col)
    d_in = F.col(col) - F.lag(col).over(w)
    d_out = F.lead(col).over(w) - F.col(col)
    gap_in = F.unix_timestamp(time_col) - F.unix_timestamp(
        F.lag(time_col).over(w)
    )
    gap_out = F.unix_timestamp(F.lead(time_col).over(w)) - F.unix_timestamp(
        F.col(time_col)
    )
    spike = (
        (F.abs(d_in) > crit)
        & (F.abs(d_out) > crit)
        & ((d_in > 0) != (d_out > 0))
        & (gap_in <= max_gap_seconds)
        & (gap_out <= max_gap_seconds)
    )
    return df.withColumn(out, F.coalesce(spike, F.lit(False)))


def detect_spikes_multi(
    df: DataFrame,
    key,
    time_col: str,
    col: str,
    crit: Column,
    max_gap_seconds: int = 12 * 3600,
    max_len: int = 3,
    out: str = "is_spike",
) -> DataFrame:
    """W6 full form: 1-to-``max_len``-point spikes
    (qaqc_unusual_large_jumps.py:128-216): the jump into the first
    spike point exceeds ``crit``; diffs between spike points stay
    below crit/2 (the excursion holds level); the exit jump exceeds
    ``crit`` with the opposite sign; all neighbor gaps ≤ 12 h. Every
    row inside the excursion is marked."""
    w = ordered_window(key, time_col)
    v = F.col(col)
    t = F.unix_timestamp(time_col)

    def dv(i):  # diff between offset i and i-1 (0 = entry jump)
        a = F.lead(v, i).over(w) if i > 0 else v
        b = F.lead(v, i - 1).over(w) if i > 1 else (v if i == 1 else F.lag(v).over(w))
        return a - b

    def gap(i):  # seconds between offset i and i-1
        a = F.lead(t, i).over(w) if i > 0 else t
        b = F.lead(t, i - 1).over(w) if i > 1 else (t if i == 1 else F.lag(t).over(w))
        return a - b

    d_in = dv(0)
    starts = []
    for L in range(1, max_len + 1):
        cond = (F.abs(d_in) > crit) & (gap(0) <= max_gap_seconds)
        for j in range(1, L):
            cond = (
                cond
                & (F.abs(dv(j)) <= crit / 2)
                & (gap(j) <= max_gap_seconds)
            )
        d_out = dv(L)
        cond = (
            cond
            & (F.abs(d_out) > crit)
            & ((d_in > 0) != (d_out > 0))
            & (gap(L) <= max_gap_seconds)
        )
        # exclude shorter patterns being re-detected inside longer
        # ones is unnecessary: marks are OR'd row-wise below
        starts.append(cond.alias(f"__sp{L}"))

    marked = df.select("*", *starts)
    flag = F.lit(False)
    for L in range(1, max_len + 1):
        for o in range(L):
            flag = flag | F.coalesce(
                F.lag(F.col(f"__sp{L}"), o).over(w), F.lit(False)
            )
    return marked.withColumn(out, flag).drop(
        *[f"__sp{L}" for L in range(1, max_len + 1)]
    )


def deaccumulate(
    df: DataFrame,
    key,
    time_col: str,
    col: str,
    reset_drop: float = -50.0,
    out: str = "deaccumulated",
) -> DataFrame:
    """W7: recover incremental values from an accumulated gauge.

    incremental = diff; counter resets (drop below ``reset_drop``)
    and negative increments clamp to 0 (qaqc_deaccumulate.py:167-234).
    The first row of each key yields null (no prior reading).
    """
    w = ordered_window(key, time_col)
    d = F.col(col) - F.lag(col).over(w)
    return df.withColumn(
        out,
        F.when(d.isNull(), F.lit(None))
        .when(d < F.lit(reset_drop), F.lit(0.0))
        .when(d < 0, F.lit(0.0))
        .otherwise(d),
    )
