"""JSON-lines corpus source — the de-facto interchange format for
training-data documents (one JSON object per line, usually
gzip-compressed in an object store).

Scale rules baked in:

- **explicit schema, never inference**: schema inference reads every
  byte of the corpus twice; at 100 TB the schema is a contract, not a
  discovery. ``read_jsonl`` requires one.
- **corrupt records are data, not crashes**: PERMISSIVE mode routes
  unparseable lines into ``_corrupt_record`` so a bad shard degrades
  into an auditable row count (``corrupt_stats``) instead of a failed
  job — the behavior a multi-day ingest needs.
- **line-splittable**: uncompressed (or zstd/bzip2 seekable) JSONL
  splits by line across executors like CSV; the reader is one
  ``spark.read.json`` scan with predicate/column pruning intact
  downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the documents-table contract (TESTDATA.md) in JSONL form
DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "n_chars long, _corrupt_record string"
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """PERMISSIVE JSONL scan with an explicit schema; malformed lines
    land in ``corrupt_col`` (include it in the schema string)."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def corrupt_stats(df: DataFrame, corrupt_col: str = "_corrupt_record") -> DataFrame:
    """One-row ingest audit: (n_rows, n_corrupt). Cheap single
    aggregate — the gate a production load checks before promoting a
    shard.

    Spark refuses plans that reference ONLY the corrupt-record column
    of a raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the column is
    populated during full-row parsing, so a pruned scan would never
    fill it). Caching the parsed frame is the documented workaround;
    this computes the audit EAGERLY inside a scoped cache and
    unpersists before returning, so a per-shard ingest loop doesn't
    pin every shard's parsed rows in executor storage for the session
    lifetime. Callers that also want the good rows should cache the
    frame themselves around both uses."""
    spark = df.sparkSession
    cached = df.cache()
    try:
        row = cached.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(corrupt_col).cast("long").alias("n_corrupt"),
        ).collect()[0]
    finally:
        cached.unpersist()
    return spark.createDataFrame(
        [(row["n_rows"], row["n_corrupt"])], "n_rows long, n_corrupt long"
    )


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Line-delimited JSON sink (one object per line per file). The
    optional coalesce bounds output file count for small exports;
    leave None at scale so writers stay partition-parallel."""
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").json(path)
