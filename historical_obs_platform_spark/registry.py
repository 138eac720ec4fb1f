"""Query/oracle registry — the driver-facing catalog.

Every implemented operator from SURVEY.md §2 registers a Spark query
(``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, a
DuckDB-compatible ANSI-SQL oracle string over the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings).

Column names of the Spark result and the oracle result must match —
the driver's comparator sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a driver-facing query, optionally with its SQL oracle."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from .queries import (  # noqa: F401
        chain_demo,
        curation3,
        curation4,
        curation5,
        curation6,
        curation7,
        datasetops,
        datasetops2,
        graph,
        graph2,
        graph3,
        networks_demo,
        qaqc_demo,
        qaqc_parity,
        qaqc_parity2,
        qaqc_parity3,
        relational,
        relational2,
        relational3,
        sampling,
        scaleops,
        sketches,
        sources_demo,
        stats,
        stats2,
        stats3,
        streaming_demo,
        textops,
        textops2,
        timeseries,
        timeseries2,
        timeseries3,
    )
