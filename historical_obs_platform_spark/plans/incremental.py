"""Incremental update merge (O7) — the reference's update pulls
re-download a tail window keyed on the last stored date and resolve
the overlap keep-newest (``update_pull.py:58-95`` +
``qaqc_concatenate_stations.py:206-239``).

Without a transactional table format in this environment the batch
equivalent is append + window dedup; with Delta/Iceberg on the
cluster, ``upsert()`` maps 1:1 onto ``MERGE INTO`` on
(station, time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def last_stored_time(existing: DataFrame, key: str = "station") -> DataFrame:
    """Per-key high-water mark — what an incremental pull re-reads
    from (get_last_date, update_pull.py:58-95)."""
    return existing.groupBy(key).agg(F.max("time").alias("last_time"))


def upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys=("station", "time"),
    version_col: str = "__ingest_version",
) -> DataFrame:
    """Keep-newest upsert on ``keys``: incoming rows replace existing
    rows with the same key; everything else unions through.
    Deterministic via an explicit version column (incoming=1 wins over
    existing=0). Delta equivalent: MERGE INTO ... WHEN MATCHED THEN
    UPDATE WHEN NOT MATCHED THEN INSERT.
    """
    tagged = existing.withColumn(version_col, F.lit(0)).unionByName(
        incoming.withColumn(version_col, F.lit(1)),
        allowMissingColumns=True,
    )
    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", version_col)
    )


def _orderable(dt) -> bool:
    """Whether Spark can ORDER BY a column of this type: maps are
    unorderable; arrays/structs are orderable iff their element/field
    types are."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def merge_changeset(
    existing: DataFrame,
    changes: DataFrame,
    keys=("station", "time"),
    op_col: str = "op",
    precedence=None,
) -> DataFrame:
    """Full MERGE semantics over a changeset carrying an op marker
    (``upsert`` | ``delete``): matched keys are replaced or removed,
    unmatched upserts insert. Delta/Iceberg equivalent:
    MERGE INTO ... WHEN MATCHED AND op='delete' THEN DELETE
    WHEN MATCHED THEN UPDATE WHEN NOT MATCHED AND op='upsert' THEN
    INSERT.

    Plan shape: one equi-join (anti) on the key — broadcast when the
    changeset is small, shuffle otherwise (AQE's call) — plus a
    union; nothing rescans the base twice.

    ``precedence`` (column name or list of names, e.g. a version or
    ingest-timestamp column) controls which of several same-key
    upserts survives: highest precedence wins (desc, nulls last).
    Without it the tie-break orders by every ORDERABLE payload column
    — unorderable types (maps) are skipped rather than throwing
    AnalysisException, and "max payload wins" is only a deterministic
    fallback, not last-write-wins; callers with replayed changesets
    should pass an explicit precedence column.
    """
    keys = list(keys)
    # only recognized ops participate: an unknown op value (typo,
    # wrong case) must not anti-join its key out of the base — that
    # would silently DELETE the row instead of rejecting the change
    recognized = changes.where(F.col(op_col).isin("upsert", "delete"))
    upserts = recognized.where(F.col(op_col) == "upsert").drop(op_col)
    # a replayed/overlapping changeset can carry several upserts for
    # one key; inserting them all would corrupt the base's key
    # uniqueness (Delta/Iceberg MERGE rejects multiple matches).
    # Resolve deterministically: keep ONE row per key, ordered by the
    # non-key payload so the survivor is independent of partitioning.
    payload = [c for c in upserts.columns if c not in keys]
    orderable_payload = [
        c for c in payload if _orderable(upserts.schema[c].dataType)
    ]
    if precedence is not None:
        order_cols = (
            [precedence] if isinstance(precedence, str) else list(precedence)
        )
        missing = [c for c in order_cols if c not in upserts.columns]
        if missing:
            raise ValueError(
                f"merge_changeset: precedence columns {missing} not in "
                f"changeset columns {upserts.columns}"
            )
        # precedence ties still need a deterministic survivor: append
        # the remaining orderable payload columns as tie-breakers so
        # two rows with equal precedence don't resolve by shuffle
        # arrival order
        order_cols += [
            c for c in orderable_payload if c not in order_cols
        ]
    else:
        order_cols = orderable_payload
    if order_cols:
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc_nulls_last() for c in order_cols]
        )
        upserts = (
            upserts.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    elif payload:
        # every payload column is unorderable (maps, etc.):
        # dropDuplicates' survivor would depend on partitioning and
        # execution order, breaking the deterministic-survivor
        # contract — fail loudly instead of silently varying
        raise ValueError(
            "merge_changeset: no orderable payload column to resolve "
            f"duplicate upserts deterministically (payload: {payload}); "
            "pass precedence= naming an orderable column"
        )
    else:
        # key-only changeset: duplicate rows are identical, so any
        # survivor is THE row — dropDuplicates is deterministic here
        upserts = upserts.dropDuplicates(keys)
    untouched = existing.join(
        recognized.select(*keys).distinct(), keys, "left_anti"
    )
    return untouched.unionByName(upserts)
