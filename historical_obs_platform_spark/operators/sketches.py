"""Deterministic distributed sketches: KMV / HLL-style cardinality
estimation and count-min heavy-hitter estimation.

At 100 TB an exact ``count(distinct x)`` or exact token frequency
table is a full shuffle of every distinct value; a sketch answers the
same question in ONE pass with FIXED memory per task, and its merge
operator is associative (min / max / sum), so the whole computation is
a partial aggregate: map-side state is a few KB regardless of input
size, and the final combine touches only ``O(registers)`` rows.

Like ``operators/sampling.py``, all "randomness" is md5-derived
(SURVEY.md §2's training-data extension ops; reference has no sketch
surface — its only cardinality op is the exact per-month
``countDistinct(year)`` bypass check, `qaqc_utils.py:203-323`), which
makes every sketch:

- deterministic run-to-run and engine-to-engine — each estimator has
  an exact DuckDB oracle replaying the same hashes in SQL,
- independent of partitioning and scheduling (no ``rand()`` / RNG
  state, no accumulation-order sensitivity: estimates are arithmetic
  over integer counts or exact binary fractions),
- auditable: a value's register/bucket is a pure function of itself.

Estimator shapes:

- **KMV (k minimum values)**: keep the ``k`` smallest hash fractions
  of the distinct values; the k-th smallest ``h_k`` estimates
  ``(k-1)/h_k`` distinct values. Spark plan: distinct → global
  ``orderBy(h).limit(k)`` — which physically is TakeOrdered (per-
  partition top-k, then a k-row merge on the driver side of the
  exchange), NOT a full sort.
- **HLL-style**: 2-hex-digit bucket (m=256 registers), register =
  max leading-zero-run of the remaining hash bits + 1; estimate =
  alpha·m²/Σ2^(-M_j) with the standard linear-counting correction for
  small cardinalities. One ``groupBy(bucket).max`` — 256-row state.
- **Count-min**: d hash rows × w buckets of summed counts; a token's
  estimate is the min over its d buckets — always ≥ the true count,
  within ε·N with the usual (d, w) guarantees. Building the table is
  one partial-aggregating ``groupBy((row, bucket))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

# Leading zero BITS contributed by the first non-zero hex digit:
# digit 1 -> 3, 2-3 -> 2, 4-7 -> 1, 8-f -> 0.
_NZ_BITS = {d: 3 if d == 1 else 2 if d < 4 else 1 if d < 8 else 0
            for d in range(1, 16)}


def _hash_fraction_sql(inner: str, digits: int = 12) -> str:
    """Spark/DuckDB-portable SQL for a uniform [0,1) fraction from the
    first ``digits`` hex chars of ``inner`` (an expression producing
    an md5 hex string). Every term is an exact binary fraction
    (digit / 16^i) and 12 digits = 48 bits fit one double exactly, so
    the value is bit-identical across engines (same construction as
    ``sampling.hash_frac``, more resolution: expected collisions over
    n distinct values ≈ n²/2·16^-12)."""
    # NB: e-notation literals parse as DOUBLE in both Spark SQL and
    # DuckDB; plain decimal-point literals (e.g. ``16.0``) parse as
    # DECIMAL in Spark and silently truncate the division. 16^-i is a
    # power of two, so each product — and the whole sum — is IEEE-exact
    # in any evaluation order.
    terms = [
        f"(instr('{HEX}', substring({inner}, {i}, 1)) - 1) * {16.0 ** -i:.17e}"
        for i in range(1, digits + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def hash_frac_col(col_sql: str, digits: int = 12, salt: str = "") -> Column:
    """Hash fraction as a Column, from the SQL text of the source
    column (kept as one ``expr`` so the whole chain stays inside
    whole-stage codegen)."""
    salted = f"concat('{salt}', cast({col_sql} as string))" if salt else (
        f"cast({col_sql} as string)")
    return F.expr(_hash_fraction_sql(f"md5({salted})", digits))


# ------------------------------------------------------------------ KMV
def kmv_distinct(
    df: DataFrame, col_sql: str, k: int = 256, digits: int = 12
) -> DataFrame:
    """KMV distinct-count estimate for ``col_sql``.

    Returns one row ``(k, h_k, estimate)``. Distinct-reduces the
    column (map-side partial dedup), hashes each survivor to a
    fraction, and takes the k smallest via ``orderBy().limit(k)`` —
    Spark plans that as TakeOrderedAndProject (per-partition heap of
    k, single k-row merge), so no full sort and no unbounded state.
    Estimate = (k-1)/h_k, the classic KMV unbiased estimator.
    """
    kth = (
        df.select(F.expr(col_sql).alias("__v"))
        .where(F.col("__v").isNotNull())
        .distinct()
        .select(hash_frac_col("__v", digits).alias("h"))
        .orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("h_k"), F.count(F.lit(1)).alias("n_kept"))
    )
    return kth.select(
        F.lit(k).alias("k"),
        F.round(F.col("h_k"), 15).alias("h_k"),
        # fewer than k distinct values -> the sketch IS the exact count
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.round((F.lit(k) - 1) / F.col("h_k"), 6))
        .alias("estimate"),
    )


# ------------------------------------------------------------------ HLL
def _rho_expr(tail_sql: str, tail_hex_len: int) -> str:
    """Spark/DuckDB-portable SQL for (leading zero bits of the hex
    string ``tail_sql``) + 1 — the HLL rho function. Pure string ops:
    count leading '0' chars (4 bits each), then add the contribution
    of the first non-zero digit via a CASE over 15 digits."""
    zeros = f"length(regexp_extract({tail_sql}, '^0*', 0))"
    first_nz = f"substring({tail_sql}, {zeros} + 1, 1)"
    nz_case = "CASE " + " ".join(
        f"WHEN {first_nz} = '{HEX[d]}' THEN {_NZ_BITS[d]}"
        for d in range(1, 16)
    ) + f" ELSE {tail_hex_len * 4} END"  # all-zero tail
    return f"(4 * {zeros} + CASE WHEN {zeros} = {tail_hex_len} THEN 0 "\
           f"ELSE {nz_case} END + 1)"


def hll_distinct(
    df: DataFrame, col_sql: str, bucket_hex: int = 2, tail_hex: int = 12
) -> DataFrame:
    """HLL-style distinct-count estimate with m = 16^bucket_hex
    registers (default 256).

    Register j keeps the max rho (leading-zero-run + 1) of the hash
    tails landing in bucket j — a 256-row ``groupBy().max`` partial
    aggregate; merging executors' sketches is the same max. The
    estimate applies the standard bias constant alpha_m and the
    linear-counting small-range correction (V = empty registers > 0
    ⇒ m·ln(m/V)). Σ2^(-M_j) sums exact binary fractions and the
    result is rounded to 6 decimals, so engine summation order cannot
    leak into the hash comparison.

    Returns one row ``(m, v_empty, estimate)``.
    """
    return hll_estimate(
        hll_registers(df, col_sql, bucket_hex, tail_hex), bucket_hex
    )


def hll_registers(
    df: DataFrame, col_sql: str, bucket_hex: int = 2, tail_hex: int = 12
) -> DataFrame:
    """The mergeable HLL state: a ``(bucket, M)`` register table.
    Merging ANY number of register tables — across executors, data
    partitions, or time windows — is a union + groupBy max, which is
    what makes the sketch the 100 TB answer to distinct counts over
    unions of corpora (see ``sk_hll_union``)."""
    h = f"md5(cast({col_sql} as string))"
    bucket = f"substring({h}, 1, {bucket_hex})"
    rho = _rho_expr(f"substring({h}, {bucket_hex + 1}, {tail_hex})", tail_hex)
    return (
        df.where(F.expr(col_sql).isNotNull())
        .select(F.expr(bucket).alias("bucket"), F.expr(rho).alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_merge(
    *register_tables: DataFrame, bucket_hex: int | None = None
) -> DataFrame:
    """Merge register tables built with identical parameters: the
    per-bucket max — associative, commutative, idempotent.

    Tables built with different ``bucket_hex`` have incompatible
    bucket domains; merging them yields a silently wrong estimate.
    Pass ``bucket_hex`` to assert every bucket key has that hex width
    — the check is folded into the merged plan (a conditional on the
    grouping column, so it cannot be pruned) and costs nothing extra.
    """
    if not register_tables:
        raise ValueError("hll_merge: need at least one register table")
    out = register_tables[0]
    for r in register_tables[1:]:
        out = out.unionByName(r)
    if bucket_hex is not None:
        out = out.withColumn(
            "bucket",
            F.when(
                F.length("bucket") == bucket_hex, F.col("bucket")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "hll_merge: register bucket width != "
                            f"{bucket_hex} hex digits (mismatched "
                            "bucket_hex across merged tables): "
                        ),
                        F.col("bucket"),
                    )
                )
            ),
        )
    return out.groupBy("bucket").agg(F.max("M").alias("M"))


def hll_estimate(regs: DataFrame, bucket_hex: int = 2) -> DataFrame:
    """Estimate from a register table (see ``hll_distinct``)."""
    m = 16 ** bucket_hex
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = regs.agg(
        F.sum(F.expr("power(cast(2 as double), -M)")).alias("z_used"),
        F.count(F.lit(1)).alias("n_used"),
    )
    return agg.select(
        F.lit(m).alias("m"),
        (F.lit(m) - F.col("n_used")).cast("int").alias("v_empty"),
        F.round(
            F.when(
                (F.lit(m) - F.col("n_used")) > 0,
                # raw estimate small & empties exist -> linear counting
                F.when(
                    F.lit(alpha * m * m)
                    / (F.col("z_used") + (F.lit(m) - F.col("n_used")))
                    <= F.lit(2.5 * m),
                    F.lit(float(m))
                    * F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_used"))),
                ).otherwise(
                    F.lit(alpha * m * m)
                    / (F.col("z_used") + (F.lit(m) - F.col("n_used")))
                ),
            ).otherwise(F.lit(alpha * m * m) / F.col("z_used")),
            6,
        ).alias("estimate"),
    )


# ------------------------------------------------------------ count-min
def cms_bucket_expr(value_sql: str, row: int, width: int) -> str:
    """Bucket of ``value_sql`` in CMS row ``row``: first 8 hex digits
    of the salted md5 as an integer, mod width. 8 hex digits = 32
    bits — exact in BIGINT on both engines via a hex-digit
    polynomial (no conv()/from_hex dialect divergence)."""
    h = f"md5(concat('r{row}:', cast({value_sql} as string)))"
    poly = " + ".join(
        f"cast(instr('{HEX}', substring({h}, {i}, 1)) - 1 as bigint)"
        f" * {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    return f"(({poly}) % {width})"


def _bucket_of_hex(hex_col: str, width: int) -> str:
    """Bucket from an ALREADY-COMPUTED md5 hex column: first 8 hex
    digits as a bigint, mod width."""
    poly = " + ".join(
        f"cast(instr('{HEX}', substring({hex_col}, {i}, 1)) - 1 as bigint)"
        f" * {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    return f"(({poly}) % {width})"


def cms_build(
    tokens: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the count-min table: one row per (sketch row, bucket)
    with the summed count — ``depth × width`` rows total regardless
    of input size. One pass: posexplode of the d bucket keys, then a
    partial-aggregating groupBy; merging two tables is elementwise
    sum, so the combine state is ~d·w longs per task.

    The d md5 digests are projected ONCE each before the digit
    polynomial runs (inlining ``cms_bucket_expr`` would re-evaluate
    each md5 8× per row — measured 2× slower on the whole query).

    ``weight_col`` builds from a pre-aggregated (value, count) table:
    the bucket counter is the sum of weights instead of the row
    count. Since every occurrence of a value hashes identically,
    building from per-value counts is EXACTLY the occurrence-stream
    sketch while hashing each distinct value once — the guide §2.3
    "aggregate before you shuffle" shape applied to the hash work."""
    wexpr = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    hashed = tokens.select(
        wexpr.alias("__w"),
        *[
            F.expr(
                f"md5(concat('r{r}:', cast({value_col} as string)))"
            ).alias(f"__h{r}")
            for r in range(depth)
        ]
    )
    keys = F.posexplode(
        F.array(
            *[
                F.expr(_bucket_of_hex(f"__h{r}", width))
                for r in range(depth)
            ]
        )
    ).alias("row", "bucket")
    return (
        hashed.select("__w", keys)
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_heavy_hitters(
    tokens: DataFrame,
    value_col: str,
    top: int = 20,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Exact top-``top`` tokens with their count-min estimates.

    Returns (token, exact_count, cms_estimate) — the exact side is
    the ground truth the sketch is judged against (and at 100 TB the
    candidate set would come from a space-saving pass or a sampled
    exact count; the sketch table itself never exceeds d·w rows).
    cms_estimate ≥ exact_count always (counters only over-count).

    One corpus pass (r8): the occurrence stream folds to a per-value
    count table first (one partial-aggregating shuffle), and BOTH the
    sketch build and the exact top-k read that table — the d md5
    digests run once per distinct value instead of once per
    occurrence, and the corpus is scanned once instead of twice.
    Bucket counters are sums of per-value counts, which is exactly
    the occurrence-stream sketch (every occurrence hashes alike).
    """
    counts = (
        tokens.groupBy(F.expr(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        # feeds two subtrees (sketch build + exact top-k); plans are
        # trees, so without the cut the corpus explode+shuffle would
        # run twice
        .localCheckpoint(eager=False)
    )
    table = cms_build(counts, "__v", depth, width, weight_col="__cnt")
    return cms_probe_topk(
        counts,
        "__v",
        table,
        top=top,
        depth=depth,
        width=width,
        weight_col="__cnt",
    )


def cms_probe_topk(
    tokens: DataFrame,
    value_col: str,
    table: DataFrame,
    top: int = 20,
    depth: int = 4,
    width: int = 512,
    estimate_col: str = "cms_estimate",
    weight_col: str | None = None,
) -> DataFrame:
    """Probe the exact top-``top`` tokens against a (pre-built or
    merged) count-min ``table``. The (depth, width) MUST match the
    parameters the table was built with — the probes hash into the
    table's bucket space. ``weight_col`` reads ``tokens`` as a
    pre-aggregated (value, count) table (exact_count = sum of
    weights), equal by construction to counting the raw stream."""
    cnt_agg = (
        F.sum(weight_col).cast("long")
        if weight_col is not None
        else F.count(F.lit(1))
    )
    exact = (
        tokens.groupBy(F.expr(value_col).alias("token"))
        .agg(cnt_agg.alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("token"))
        .limit(top)
    )
    probes = exact.select(
        "token",
        "exact_count",
        F.posexplode(
            F.array(
                *[
                    F.expr(cms_bucket_expr("token", r, width))
                    for r in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(table), ["row", "bucket"], "left")
        .groupBy("token", "exact_count")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias(estimate_col)
        )
    )


# ------------------------------------------------------------ quantiles
def grid_quantiles(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int,
    qs: tuple[float, ...],
) -> DataFrame:
    """Mergeable fixed-grid quantile sketch: one partial-aggregating
    histogram pass over the data (``bins`` counters per task,
    associative merge = vector add), then the quantile probe runs on
    the <= ``bins``-row histogram. The 100 TB substitute for exact
    ``percentile`` whose sort/shuffle carries every row; error is
    bounded by one grid cell width ((hi-lo)/bins).

    Deterministic (integer counts + fixed grid), so unlike
    percentile_approx/t-digest the estimate is reproducible across
    engines and partitionings — each returned quantile is the upper
    edge of the first bin whose cumulative count reaches
    ``ceil(q * n)``.
    """
    from pyspark.sql import Window

    w = (hi - lo) / bins
    bin_col = (
        F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0), F.floor((F.col(col) - F.lit(lo)) / F.lit(w))
            ),
        )
    ).cast("int")
    hist = (
        df.where(F.col(col).isNotNull())
        .groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = hist.select(
        "bin",
        F.sum("cnt")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    probes = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    # probe x histogram cross join: both sides tiny (len(qs) x bins)
    return (
        probes.crossJoin(F.broadcast(cum))
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(
            F.ceil(F.col("q") * F.min("n")).cast("long").alias("rank"),
            F.round(
                F.lit(lo) + (F.min("bin") + F.lit(1)) * F.lit(w), 9
            ).alias("est"),
        )
    )


# ---------------------------------------------------------------- bloom
# Bloom-filter semi-join reduction — the standard 100 TB join-pruning
# move: build a small bit-set from the dim side's join keys, broadcast
# it, and drop big-side rows map-side before the shuffle join. (Spark
# can inject runtime bloom filters itself —
# spark.sql.optimizer.runtime.bloomFilter.enabled — but only below
# size thresholds and never cross-engine-reproducibly; this explicit
# variant is md5-deterministic so the DuckDB oracle computes the
# identical filter, false positives included.)
#
# The bit-set is represented sparsely as a sorted array of set bit
# positions (≤ n_bits values): identical semantics to a packed
# bitmap, engine-portable (no 1<<63 overflow edge), and still tiny to
# broadcast (n_bits defaults to 4096 = one 3-hex-digit position per
# hash, so no modulo is needed and both engines compute positions
# with the same instr/substring arithmetic as the other sketches).

BLOOM_BITS = 4096
BLOOM_K = 3


def bloom_pos_sql(key_sql: str, i: int) -> str:
    """Portable SQL: bit position of hash i for a key expression —
    value of the first 3 hex digits of md5('bf<i>:' || key)."""
    h = f"md5(concat('bf{i}:', {key_sql}))"
    nib = (
        lambda j: f"(instr('{HEX}', substring({h}, {j}, 1)) - 1)"
    )
    return f"({nib(1)} * 256 + {nib(2)} * 16 + {nib(3)})"


def bloom_build(df: DataFrame, key_sql: str, k: int = BLOOM_K,
                n_bits: int = BLOOM_BITS) -> DataFrame:
    """One-row frame holding the bit-set for the side's keys — a
    partial-aggregate (explode + collect_set) that broadcast-attaches
    to any probe side.

    The set is densified into an array<boolean> of length ``n_bits``
    on the (one-row) build side: the probe then tests membership with
    ``element_at`` — O(1) per hash — instead of scanning a sorted
    position list with ``array_contains`` (O(n_bits) per row per
    hash, which dominated the probe at 600 k rows × 3 hashes × 4096
    slots). Densifying costs n_bits × |set| comparisons ONCE, on one
    row."""
    if n_bits != BLOOM_BITS:
        # bloom_pos_sql derives positions from exactly 3 hex digits
        # (0..4095); a smaller bitmap would silently drop high
        # positions and break the no-false-negative invariant
        raise ValueError(
            f"n_bits must equal {BLOOM_BITS} (positions are 3-hex-"
            "digit); change bloom_pos_sql to resize the filter"
        )
    positions = F.array(
        *[F.expr(bloom_pos_sql(key_sql, i)) for i in range(k)]
    )
    sparse = (
        df.select(F.explode(positions).alias("__p"))
        .agg(F.array_sort(F.collect_set("__p")).alias("__pos"))
    )
    return sparse.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bits - 1)),
            lambda i: F.array_contains(F.col("__pos"), i),
        ).alias("bloom_bits")
    )


def bloom_member(key_sql: str, bits_col: str = "bloom_bits",
                 k: int = BLOOM_K):
    """Probe predicate: TRUE iff every hash position is set.

    ``element_at`` (1-based) into the dense bitmap — constant-time
    per hash, stays in whole-stage codegen."""
    cond = None
    for i in range(k):
        c = F.element_at(
            F.col(bits_col), F.expr(bloom_pos_sql(key_sql, i)) + 1
        )
        cond = c if cond is None else cond & c
    return cond


def cms_merge(
    *tables: DataFrame,
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Merge count-min tables built with identical (depth, width):
    element-wise counter addition — associative and commutative, so
    per-corpus/per-partition sketches combine without re-reading any
    input (the same contract as ``hll_merge``).

    Tables built with a different (depth, width) occupy different
    counter grids; summing them produces a wrong estimate with no
    error. Pass ``depth``/``width`` to assert every (row, bucket)
    lies inside the expected grid — in-plan on the grouping columns,
    so the check cannot be pruned and adds no extra job."""
    if not tables:
        raise ValueError("cms_merge: need at least one sketch table")
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)

    def _bounded(col: str, hi: int) -> None:
        nonlocal out
        out = out.withColumn(
            col,
            F.when(
                (F.col(col) >= 0) & (F.col(col) < hi), F.col(col)
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"cms_merge: {col} outside [0, {hi}) — "
                            "tables built with mismatched "
                            "(depth, width) cannot be merged: "
                        ),
                        F.col(col).cast("string"),
                    )
                )
            ),
        )

    if depth is not None:
        _bounded("row", depth)
    if width is not None:
        _bounded("bucket", width)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
