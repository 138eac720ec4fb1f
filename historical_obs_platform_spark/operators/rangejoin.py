"""Batch interval/range join via time-bucket equi-join decomposition.

A naive range join (``l.ts <= r.ts < l.ts + W``) has no equality
predicate, so Spark plans it as BroadcastNestedLoopJoin — quadratic
work at scale. The bucketed decomposition turns it into an ordinary
equi-join: floor both sides' timestamps to W-sized buckets; any right
row matching a left row lies in the left row's bucket or the next one,
so enumerating ``{b, b+1}`` on the left side (a 2-element explode) and
equi-joining on ``(keys..., bucket)`` bounds the candidate pairs to
rows within 2W of each other, and a residual filter applies the exact
range predicate. The shuffle is hash-partitioned on (keys, bucket) —
at 100 TB this behaves like any other equi-join (AQE skew-splittable),
and output stays linear as long as per-(key, 2W) event density is
bounded, which is the same invariant the streaming interval join
(streaming/hourly.py) relies on.

Reference analog: the reference's only range-ish joins are J3/J6
(SURVEY.md §2.3, `qaqc_concatenate_stations.py:206-239`,
`qaqc_unusual_gaps.py:449-480`); this is the general batch operator
the streaming stream-stream interval join pairs with.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_BUCKET = "__ivj_bucket"


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_us: int,
) -> DataFrame:
    """Inner-join rows where ``right_ts ∈ [left_ts, left_ts + W)``
    and the ``on`` keys match, as a pure equi-join + residual filter.

    ``window_us`` is the half-open window length in integer
    microseconds (timestamp comparisons stay in integer micros — the
    engine-portable representation; see tables.py).
    """
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    # cast("timestamp") first: unix_micros rejects TIMESTAMP_NTZ, and
    # parquet timestamps written with isAdjustedToUTC=false read back
    # as NTZ; the session tz is pinned UTC so the cast is
    # value-preserving either way.
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lb = (l_us / F.lit(window_us)).cast("long")  # non-negative epochs
    l_exp = left.withColumn(
        _BUCKET, F.explode(F.array(lb, lb + F.lit(1)))
    )
    r_b = right.withColumn(_BUCKET, (r_us / F.lit(window_us)).cast("long"))
    joined = l_exp.join(r_b, [*on, _BUCKET], "inner").drop(_BUCKET)
    r_us2 = F.unix_micros(F.col(right_ts).cast("timestamp"))
    l_us2 = F.unix_micros(F.col(left_ts).cast("timestamp"))
    return joined.where(
        (r_us2 >= l_us2) & (r_us2 < l_us2 + F.lit(window_us))
    )
