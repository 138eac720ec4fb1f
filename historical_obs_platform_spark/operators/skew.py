"""Skew mitigation (SURVEY.md §4: "salting only if a mega-station
appears").

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in ``session.RUNTIME_CONF``), which re-splits oversized sort-merge
partitions at runtime. Salting is the explicit fallback for the cases
AQE cannot re-split — a hot key feeding a shuffled hash aggregate, or
a build side too large to broadcast joined against one mega-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int, out: str = "__salt") -> DataFrame:
    """Deterministic per-row shard in [0, n_salt): a hash of the whole
    row, not rand() — replayable across retries and engines."""
    return df.withColumn(
        out, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has one or few dominant keys: the big
    side gets a per-row salt, the small side is replicated ``n_salt``
    times, and the join key becomes (key, salt) — the hot key's rows
    spread over ``n_salt`` reducers instead of one straggler.

    Cost model: small side shuffles ×n_salt (choose the genuinely
    smaller input); big side is unchanged. Result is row-for-row
    identical to the plain join (asserted in tests)."""
    keys = [key] if isinstance(key, str) else list(key)
    b = with_salt(big, n_salt)
    salts = small.sparkSession.range(n_salt).select(
        F.col("id").cast("bigint").alias("__salt")
    )
    s = small.crossJoin(F.broadcast(salts))
    return b.join(s, [*keys, "__salt"], how).drop("__salt")


def salted_count_agg(
    df: DataFrame, key, n_salt: int = 8
) -> DataFrame:
    """Two-phase grouped count for hot keys: partial count per
    (key, salt) then merge per key. Spark's hash aggregate already
    map-side-combines algebraic aggregates, so this only pays off when
    the partial state itself is key-skewed (e.g. after an exploding
    join on the hot key)."""
    keys = [key] if isinstance(key, str) else list(key)
    partial = (
        with_salt(df, n_salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n"))
