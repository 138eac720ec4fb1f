"""JSONL source round-trip: write the documents table as JSON lines,
read it back with an explicit schema, verify corruption handling and
value fidelity."""

import os

from pyspark.sql import functions as F

from historical_obs_platform_spark.queries.common import table
from historical_obs_platform_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    corrupt_stats,
    read_jsonl,
    write_jsonl,
)

from .conftest import SF_DIR


def test_jsonl_roundtrip(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, partitions=2)
    back = read_jsonl(spark, out, DOCUMENTS_SCHEMA)
    assert back.count() == docs.count()
    # exact content equality both directions
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    assert (
        docs.select(cols).exceptAll(back.select(cols)).count() == 0
    )
    assert (
        back.select(cols).exceptAll(docs.select(cols)).count() == 0
    )
    stats = corrupt_stats(back).collect()[0]
    assert stats["n_corrupt"] == 0


def test_jsonl_corrupt_lines_counted_not_fatal(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s",'
        ' "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en",'
        ' "source": "s", "n_chars": 7}\n'
        '{"doc_id": "NaN-ish-wrong-type"}\n'
    )
    back = read_jsonl(spark, str(d), DOCUMENTS_SCHEMA)
    stats = corrupt_stats(back).collect()[0]
    assert stats["n_rows"] == 4
    assert stats["n_corrupt"] == 2  # the non-JSON + the type-broken row
    good = back.where(F.col("_corrupt_record").isNull())
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
