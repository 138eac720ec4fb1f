"""All-pairs oracle VALUE conformance: every registered query with a
DuckDB oracle runs at sf0.001 and must match the oracle exactly under
the driver-style comparator (row count, column names, and
order-insensitive exact values — see ``conftest.assert_matches_oracle``).

`test_oracle_schema_parity` guards the type classes wholesale; this is
its value-level twin.  Together they make "every registered pair is
hash-exact" a property checked at commit time instead of something the
external driver samples 50 rows of per round.

Runs at SF_SMALL (sf0.001) so the full sweep stays cheap: the TPC-H-ish
tables shrink 10x vs sf0.01 while `documents`/`embeddings` stay ~500
rows (see TESTDATA.md), so every code path still sees real data.

Queries registered WITHOUT an oracle (the declared rows-only pairings,
e.g. ``w13_clim_outlier`` until its CTE oracle lands) get a
construction-plus-nonnegative-rows smoke instead, mirroring the
driver's weaker check for those entries.
"""

from __future__ import annotations

import duckdb
import pytest

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.tables import TABLE_NAMES

from .conftest import SF_SMALL, assert_matches_oracle

registry.load_all()

pytestmark = pytest.mark.sweep


@pytest.fixture(scope="module")
def sweep_con():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_pair_values(spark, sweep_con, name):
    assert_matches_oracle(spark, sweep_con, name, sf_dir=SF_SMALL)


@pytest.mark.parametrize(
    "name", sorted(set(registry.QUERIES) - set(registry.ORACLES))
)
def test_rows_only_query_runs(spark, name):
    df = registry.QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
