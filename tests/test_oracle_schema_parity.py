"""All-pairs oracle schema conformance: for every registered query
with a DuckDB oracle, the oracle result's column names and type
CLASSES must map 1:1 onto the Spark result schema.

This is the wholesale guard the per-query hash checks can't give:
a DATE column on one side vs a TIMESTAMP (or string) on the other
hashes differently under a strict comparator even when every value
is the same instant — the repo's determinism rule is "emit ISO
strings, never DATE columns", and this test enforces it for all
current and future pairs at once.

Both sides are bound, not executed: Spark DataFrames are lazy (the
schema is known at plan time) and a DuckDB relation exposes
``.columns`` / ``.types`` at bind time. Queries whose *construction*
executes eagerly (streaming demos, the clustering propagation loop)
still run their work once, at sf0.001, so the sweep stays cheap.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.tables import TABLE_NAMES

from .conftest import SF_SMALL

registry.load_all()


# Canonical type classes. Two engine types may share a class ONLY if
# their pandas renderings hash identically in the driver comparator
# (int widths widen to the same values; float32/64 compare by value).
# DATE, TIMESTAMP, STRING and DECIMAL are deliberately all distinct —
# those are exactly the splits this test exists to catch.
def _spark_class(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_class(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    return f"other:{dt.simpleString()}"


_DUCK_CLASS = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "HUGEINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "BLOB": "binary",
}


def _duck_class(t) -> str:
    s = str(t)
    if s in _DUCK_CLASS:
        return _DUCK_CLASS[s]
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.endswith("[]"):
        return f"list<{_duck_class(s[:-2])}>"
    if isinstance(t, str):
        return f"other:{t}"
    tid = getattr(t, "id", None)
    if tid == "list":
        return f"list<{_duck_class(t.child)}>"
    if tid == "struct":
        return "struct"
    return f"other:{s}"


@pytest.fixture(scope="module")
def small_con():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield con
    con.close()


def test_every_oracle_pair_schema_parity(spark, small_con):
    mismatches = []
    for name in sorted(registry.ORACLES):
        fn = registry.QUERIES[name]
        try:
            sdf = fn(spark, SF_SMALL)
        except Exception as e:  # construction itself must not break
            mismatches.append(f"{name}: spark build failed: {e!r}")
            continue
        spark_types = {
            f.name: _spark_class(f.dataType) for f in sdf.schema.fields
        }
        try:
            rel = small_con.sql(registry.ORACLES[name])
            duck_types = dict(
                zip(rel.columns, (_duck_class(t) for t in rel.types))
            )
        except Exception as e:
            mismatches.append(f"{name}: oracle bind failed: {e!r}")
            continue
        if set(spark_types) != set(duck_types):
            mismatches.append(
                f"{name}: columns spark={sorted(spark_types)} "
                f"!= oracle={sorted(duck_types)}"
            )
            continue
        for c in sorted(spark_types):
            if spark_types[c] != duck_types[c]:
                mismatches.append(
                    f"{name}.{c}: spark {spark_types[c]} "
                    f"!= oracle {duck_types[c]}"
                )
    assert mismatches == [], (
        f"{len(mismatches)} schema divergences:\n" + "\n".join(mismatches)
    )
