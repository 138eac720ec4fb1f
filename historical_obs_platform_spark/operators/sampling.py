"""Deterministic sampling / packing operators for training-data pipelines.

Beyond the reference's own surface (it is a QA/QC pipeline — see
SURVEY.md §2.6 for its only subset-selection ops), a corpus-scale
training-data pipeline needs *reproducible* subset selection: uniform
down-sampling, per-domain quota sampling, domain-mixture rebalancing,
and sequence packing. Everything here derives its "randomness" from
``md5`` over a stable key column, which makes the result:

- deterministic run-to-run and engine-to-engine (the same expressions
  evaluate in DuckDB for the oracle gate),
- independent of partitioning / task scheduling (no ``rand()`` seeds
  that change with the split count),
- resumable and auditable — a row's fate is a pure function of its key.

Scale notes: the hash-fraction filter is a stateless projection
(pushes down, no shuffle); stratified top-k shuffles once on the
strata key; mixture sampling broadcasts a strata-cardinality-sized
rate table; packing shuffles once on the shard key and sorts within
shard (the shard is the parallel unit, so shard granularity — e.g.
``source`` or ``source × date`` — controls parallelism at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def md5_key(key: str) -> Column:
    """md5 hex string of a key column rendered as its string form."""
    return F.md5(F.col(key).cast("string"))


def hash_frac(key: str, digits: int = 4) -> Column:
    """Uniform [0, 1) fraction from the first ``digits`` hex chars of
    ``md5(key)``.

    Each term is an exact binary fraction (digit / 16^i), so the sum is
    IEEE-exact and bit-identical across engines — the portable
    replacement for ``rand(seed)``. 4 digits give 1/65536 resolution,
    plenty for sampling rates down to ~0.01%.
    """
    u: Column = F.lit(0.0)
    for i in range(1, digits + 1):
        digit = F.expr(
            f"instr('{HEX}', substring(md5(cast({key} as string)), {i}, 1)) - 1"
        )
        u = u + digit / F.lit(float(16**i))
    return u


def uniform_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Keep each row iff ``hash_frac(key) < rate`` — a deterministic
    Bernoulli(rate) sample that is a stateless per-row filter: it
    evaluates inside the scan stage's codegen (no shuffle, no
    aggregation state), so the unsampled fraction of a 100 TB corpus
    is dropped before any exchange. (Being an expression over md5 it
    cannot become a parquet ``PushedFilters`` entry — the scan still
    reads every row group — but nothing downstream sees dropped
    rows.)"""
    return df.where(hash_frac(key) < F.lit(rate))


def stratified_sample(
    df: DataFrame, strata: str, key: str, k: int
) -> DataFrame:
    """Deterministic per-stratum quota sample: the ``k`` rows with the
    smallest ``md5(key)`` in each stratum (one shuffle on ``strata``)."""
    w = Window.partitionBy(strata).orderBy(md5_key(key), F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    strata: str,
    key: str,
    target_share: dict[str, float] | None = None,
) -> DataFrame:
    """Rebalance strata toward target shares by down-sampling
    over-represented strata (never up-samples).

    With ``target_share=None`` the target is the uniform mixture
    (total / n_strata rows per stratum). Per-stratum keep-rate is
    ``min(1, target_rows / stratum_rows)``; a row is kept iff
    ``hash_frac(key) < rate``. Two tiny aggregates produce a
    strata-cardinality rate table that broadcasts; the data pass is a
    broadcast join + filter.
    """
    counts = df.groupBy(strata).agg(F.count(F.lit(1)).alias("__n"))
    if target_share is None:
        tgt = counts.agg(
            (F.sum("__n").cast("double") / F.count(F.lit(1))).alias("__target")
        )
        rates = counts.crossJoin(F.broadcast(tgt))
    else:
        share = F.create_map(
            *[x for kk, v in target_share.items() for x in (F.lit(kk), F.lit(v))]
        )
        total = counts.agg(F.sum("__n").cast("double").alias("__total"))
        rates = counts.crossJoin(F.broadcast(total)).withColumn(
            "__target", share[F.col(strata)] * F.col("__total")
        )
    rates = rates.select(
        strata,
        F.least(F.lit(1.0), F.col("__target") / F.col("__n")).alias("__rate"),
    )
    return (
        df.join(F.broadcast(rates), strata)
        .where(hash_frac(key) < F.col("__rate"))
        .drop("__rate")
    )


def pack_sequences(
    df: DataFrame, shard: str, key: str, size: str, budget: int
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style): within each
    shard, documents are concatenated in deterministic ``md5(key)``
    order and a sequence boundary falls every ``budget`` units; each
    document is assigned to the sequence (``bin_id``) containing its
    first unit, at stream offset ``begin_off``.

    One shuffle on the shard key + one in-shard sort; no iteration.
    The exclusive running sum is the only state, so the operator
    streams through arbitrarily large shards.
    """
    w = (
        Window.partitionBy(shard)
        .orderBy(md5_key(key), F.col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    begin = F.coalesce(F.sum(size).over(w), F.lit(0)).cast("long")
    return df.select(
        key,
        shard,
        size,
        begin.alias("begin_off"),
        F.floor(begin / F.lit(float(budget))).cast("long").alias("bin_id"),
    )


def corpus_shuffle(df: DataFrame, key: str, shard_hex_digits: int = 2) -> DataFrame:
    """Reproducible global shuffle for training order without a global
    sort: rows are bucketed by an md5-prefix shard (16^digits buckets)
    and ranked within the shard by the full hash. Reading shards in
    order (shard, shard_rank) yields a deterministic pseudo-random
    permutation of the corpus; the window is per-shard, so the sort
    parallelizes across buckets instead of funneling 100 TB through
    one range sort."""
    h = md5_key(key)
    shard = F.substring(h, 1, shard_hex_digits)
    w = Window.partitionBy(shard).orderBy(h, F.col(key))
    return df.select(
        F.col(key),
        shard.alias("shard"),
        F.row_number().over(w).alias("shard_rank"),
    )


def weighted_sample(
    df: DataFrame, strata: str, key: str, weight_col: str, k: int,
    digits: int = 8,
) -> DataFrame:
    """Deterministic weighted sample without replacement (per stratum):
    the A-ES exponential-keys scheme — row priority
    ``e = -ln(u) / w`` with ``u = hash_frac(key)`` — keeps the ``k``
    smallest-priority rows, which selects each row with probability
    proportional to its weight (Efraimidis & Spirakis). md5-derived
    ``u`` makes the draw reproducible run-to-run and engine-to-engine;
    one shuffle on ``strata``, same plan shape as
    ``stratified_sample``. Weights are floored at 1 (zero weight would
    put ``e`` at +inf)."""
    e = -F.log(hash_frac(key, digits)) / F.greatest(
        F.col(weight_col).cast("double"), F.lit(1.0)
    )
    w = Window.partitionBy(strata).orderBy(e.alias("__e"), F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
