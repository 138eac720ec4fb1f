"""Session-shared artifact bookkeeping.

Several query families memoize deterministic index artifacts per
(session, data dir) — the near-dup LSH index, PQ codebooks/codes,
graph edge tables, streaming static indexes, IVF centroid fits, the
table handles — each behind a lazily materialized ``localCheckpoint``.
The blocks spill MEMORY_AND_DISK, but they live for the whole
application with no eviction, so executor storage grows monotonically
with the number of (sf_dir, artifact) combinations a session touches
(r8 ADVICE item 4).

``unshare_all()`` is the eviction hook: it clears every memo dict and
drops the Python references, after which Spark's ContextCleaner
reclaims the checkpoint/broadcast blocks on the next periodic GC
(``spark.cleaner.periodicGC.interval`` is pinned to 45 s in
session.get_spark). Call it between corpora in a long-lived session,
or before benchmarking cold-path behavior. The next consumer of any
artifact simply rebuilds it — correctness is unaffected because every
memo holds a deterministic intermediate of the current parquet
inputs, never query results.
"""

from __future__ import annotations

import gc


def _memo_dicts() -> list[dict]:
    """Every module-level shared-artifact memo (lazy imports — query
    modules pull in the full operator surface)."""
    from . import tables
    from .queries import (
        chain_demo,
        curation3,
        graph,
        graph2,
        streaming_demo,
        textops,
    )

    return [
        tables._DF_MEMO,
        textops._LSH_SHARED,
        textops._DUP_COMP_SHARED,
        textops._SIMHASH_SHARED,
        textops._IVF_CENT_SHARED,
        chain_demo._CHAIN_SHARED,
        chain_demo._LOGIC_SHARED,
        graph._GRAPH_SHARED,
        graph2._TRADE_SHARED,
        curation3._PQ_SHARED,
        curation3._IVFPQ_SHARED,
        streaming_demo._NEARDUP_STATIC,
        streaming_demo._SEMDEDUP_STATIC,
    ]


def unshare_all() -> int:
    """Drop every session-shared artifact memo; returns the number of
    entries released. Safe to call at any point — consumers rebuild
    lazily on next use."""
    n = 0
    for d in _memo_dicts():
        n += len(d)
        d.clear()
    # Without live references the checkpoint RDDs become collectable;
    # a driver-side gc.collect() lets the ContextCleaner queue them
    # now instead of whenever CPython gets around to it.
    gc.collect()
    return n
