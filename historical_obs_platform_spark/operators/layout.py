"""Data-layout operators — the write-path side of 100 TB performance.

Z-order (Morton) clustering: interleaving the bits of two (or more)
dimension keys gives a single sort key under which rows close in ANY
dimension land close on disk, so min/max row-group statistics prune
scans filtered on either dimension (the technique behind
Delta/Iceberg `OPTIMIZE ZORDER BY`). The key is a pure column
expression (shiftleft/and/or arithmetic — whole-stage codegen, no
UDF); writing is just ``repartitionByRange(zkey).sortWithinPartitions``
on top of it.

Reference analog: the reference's only layout control is one zarr
chunk per station along time (`MERGE_pipeline.py:380-410`) — the
single-dimension case. Z-order generalizes it to multi-predicate
scan pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton key (a's bit i → position 2i, b's → 2i+1).
    Pure integer arithmetic — identical in any engine."""
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        parts.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_layout(
    df: DataFrame,
    a_col: str,
    b_col: str,
    bits: int = 8,
    key_name: str = "zkey",
) -> DataFrame:
    """Attach the Morton key and range-partition + sort by it — the
    shape handed to ``.write`` so parquet row-group min/max stats
    prune on BOTH dimensions. Cheap: one range shuffle, no UDF.

    Inputs are folded into [0, 2**bits) with ``pmod`` before
    interleaving: values >= 2**bits would otherwise alias onto the
    same Morton key and negative values would arithmetic-shift to
    all-ones high bits — both silently degrade clustering. pmod keeps
    the key total (every row still gets a key) while making the
    wraparound explicit; callers needing exact range clustering
    should pre-bucket (e.g. ``ntile`` or fixed-width binning) into
    the key domain."""
    dom = F.lit(1 << bits)
    keyed = df.withColumn(
        key_name,
        zorder_key(
            F.pmod(F.col(a_col).cast("long"), dom),
            F.pmod(F.col(b_col).cast("long"), dom),
            bits,
        ),
    )
    return keyed.repartitionByRange(key_name).sortWithinPartitions(key_name)


def zorder_key_n(cols: list[Column], bits: int = 8) -> Column:
    """N-dimensional Morton key: round-robin bit interleaving of any
    number of non-negative integer columns (dimension d's bit i lands
    at position i*N + d). The 2-D ``zorder_key`` is the N=2 case;
    N·bits must stay <= 63 to fit a BIGINT. Pure integer arithmetic —
    identical in any engine, whole-stage codegen."""
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key_n: need at least one column")
    if n * bits > 63:
        raise ValueError(
            f"zorder_key_n: {n} dims x {bits} bits exceeds a BIGINT"
        )
    parts = []
    for d, c in enumerate(cols):
        # cast to long HERE: Spark masks an int column's shift amount
        # to 5 bits, so shiftleft(intCol, >=32) silently aliases high
        # Morton positions onto low ones — the BIGINT-capacity guard
        # above is only honest for long inputs
        c = c.cast("long")
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + d
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_layout_n(
    df: DataFrame,
    col_names: list[str],
    bits: int = 8,
    key_name: str = "zkey",
) -> DataFrame:
    """N-dimensional ``zorder_layout``: pmod-fold each dimension into
    [0, 2**bits), interleave, range-partition + sort — parquet
    row-group min/max stats then prune on ANY of the clustered
    dimensions. Same wraparound contract as ``zorder_layout``."""
    dom = F.lit(1 << bits)
    keyed = df.withColumn(
        key_name,
        zorder_key_n(
            [F.pmod(F.col(c).cast("long"), dom) for c in col_names],
            bits,
        ),
    )
    return keyed.repartitionByRange(key_name).sortWithinPartitions(key_name)
