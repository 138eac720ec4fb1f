"""Shared helpers for driver-facing queries.

Determinism rules for the DuckDB oracle hash-match:

- Floating-point SUMs are order-dependent, and Spark's shuffle order
  differs from DuckDB's scan order. Any aggregate a query exposes is
  therefore computed EXACTLY — cast the inputs to DECIMAL (the test
  data carries 2 decimal places), sum in decimal (associative, exact),
  and only then cast the final value back to DOUBLE, optionally
  dividing by an exact COUNT. Identical exact inputs + identical IEEE
  ops => bit-identical doubles on both engines.
- Statistical aggregates that cannot be exact (stddev, corr,
  interpolated percentiles) are rounded to a fixed number of decimals
  on BOTH sides.
- Every computed column is aliased identically in the Spark query and
  the oracle SQL (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..tables import load


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load(spark, sf_dir, name)


def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(dec(col, 18, scale)).cast("double")


def davg(col: str | Column, scale: int = 2, round_to: int = 6) -> Column:
    """Exact-sum/exact-count average surfaced as rounded double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(dec(c, 18, scale)).cast("double") / F.count(c), round_to
    )


def round_half_away(x: float | None, ndigits: int = 6) -> float | None:
    """Driver-side rounding matching DuckDB's round(DOUBLE, n).

    CPython's round() is banker's (half-to-even) on the binary double,
    while DuckDB rounds half AWAY from zero (std::round of the scaled
    value) — a latent tie divergence on exact .xxxxxx5 doubles in any
    query that folds its final scores on the driver (r8 advice fix).
    Verified bit-identical to DuckDB on tie values in
    tests/test_hardening_r8.py.
    """
    if x is None:
        return None
    import math

    p = 10.0 ** ndigits
    return math.copysign(math.floor(abs(x * p) + 0.5), x) / p
