"""Spot-check registered queries against their DuckDB oracles at any
SF dir (the optimize-loop companion to tests/test_oracle_value_sweep:
same canonicalization/compare as the driver gate, selectable queries
and scale).

Usage: python scripts/oracle_spot.py <name-or-prefix*> [...] [--sf DIR]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.session import get_spark
from historical_obs_platform_spark.tables import TABLE_NAMES


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            if getattr(df[c].dt, "tz", None) is not None:
                df[c] = df[c].dt.tz_localize(None)
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v,
                na_action="ignore",
            )
    return df.sort_values(
        by=list(df.columns), ignore_index=True, kind="mergesort"
    )


def compare(spark, con, name: str, sf_dir: str) -> str:
    got = _canon(registry.QUERIES[name](spark, sf_dir).toPandas())
    want = _canon(con.sql(registry.ORACLES[name]).df())
    if len(got) != len(want):
        return f"ROWS {len(got)} != {len(want)}"
    if list(got.columns) != list(want.columns):
        return f"COLS {list(got.columns)} != {list(want.columns)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype(float).to_numpy()
            wa = w.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return f"VAL {c}[{i}]: {x!r} != {y!r}"
        else:
            try:
                pd.testing.assert_series_equal(
                    g, w, check_names=False, check_dtype=False
                )
            except AssertionError as exc:
                return f"VAL {c}: {exc}".split("\n")[0]
    return "MATCH"


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    registry.load_all()
    selected = []
    for n in sorted(registry.ORACLES):
        for pat in names:
            if (pat.endswith("*") and n.startswith(pat[:-1])) or n == pat:
                selected.append(n)
                break
    if not selected:
        print("no oracle-paired queries matched", file=sys.stderr)
        sys.exit(1)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark("hop-oracle-spot")
    failed = 0
    for n in selected:
        res = compare(spark, con, n, sf_dir)
        print(f"{n}: {res}")
        if res != "MATCH":
            failed += 1
        spark.catalog.clearCache()
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
