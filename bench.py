"""Benchmark harness — runs the registered headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

The FINAL stdout line is one short JSON object:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

where ``queries`` holds the headline subset only, so the line stays
well under tail-capture limits (the round-1 driver truncated a
126-entry map mid-dict).  The full per-query timing map is written to
``BENCH_QUERIES.json`` next to this file and also printed as earlier
one-query-per-line JSON records (``{"query": name, "sec": t}``).

Each query is forced end-to-end with a noop sink (full physical plan,
no driver materialization cost).

**Noise control**: each query runs ``$SPARK_GRAFT_BENCH_REPS``
(default 3) times and reports the per-query MINIMUM. This host's
co-tenant/GC load swings single-shot timings 1.2–5× (round 2's
sidecar recorded phantom 2.6–5.9× "regressions" on q7–q9/rollup that
a fresh re-run showed never happened); min-of-k is the standard
defense — the minimum is the run least polluted by external load, and
plan regressions still show because a genuinely slower plan is slower
in EVERY rep. The headline ``value`` is the sum of per-query minima
(the noise-free suite estimate); the raw wall time including all reps
is reported separately as ``wall_total``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.session import get_spark


def run_query(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    registry.load_all()
    spark = get_spark("hop-spark-bench")

    # Warm the JVM/codegen path once so per-query numbers measure the
    # engine, not first-call JIT.
    registry.QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    import gc

    timings: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    t_all = time.perf_counter()
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        runs: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                run_query(fn(spark, sf_dir))
                runs.append(round(time.perf_counter() - t0, 4))
            except Exception as exc:  # pragma: no cover
                runs.append(-1.0)
                print(f"# {name} FAILED: {exc}", file=sys.stderr)
            finally:
                # drop cached/localCheckpoint blocks so earlier
                # queries' state doesn't slow later ones (measured:
                # ~2× drift across a 68-query session without this);
                # runs in finally so a FAILED query's blocks don't
                # pollute every subsequent timing either. Cleanup
                # itself must never abort the suite — after a
                # session-fatal failure (dead gateway) the remaining
                # queries will just record -1.0 and the final JSON
                # line still prints.
                try:
                    spark.catalog.clearCache()
                    gc.collect()
                except Exception:
                    pass
            if runs[-1] < 0:
                break
        all_reps[name] = runs
        # ANY failed rep marks the query failed (-1.0): a query that
        # passes rep 1 and OOMs rep 2 is a real defect, not a timing
        timings[name] = min(runs) if all(t >= 0 for t in runs) else -1.0
    wall_total = round(time.perf_counter() - t_all, 4)
    total = round(sum(t for t in timings.values() if t >= 0), 4)

    # Full map: sidecar file + one line per query (early lines are
    # fine to truncate; only the FINAL line must parse).
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json"
    )
    # Host uptime: bench numbers shift ~25% across host boots (see
    # README bench notes), so record which boot produced this run.
    try:
        with open("/proc/uptime") as fh:
            uptime_sec = round(float(fh.read().split()[0]), 1)
    except Exception:
        uptime_sec = -1.0
    with open(sidecar, "w") as fh:
        json.dump(
            {
                "sf": sf,
                "total": total,
                "wall_total": wall_total,
                "reps": reps,
                "host_uptime_sec": uptime_sec,
                "queries": timings,
                "queries_all_reps": all_reps,
            },
            fh,
            indent=1,
        )
    for name in sorted(timings):
        print(json.dumps({"query": name, "sec": timings[name]}))

    # Headline subset keeps the final line short (< ~1 KB).
    headline = [
        "chain_min_slice_hourly",
        "chain_logic_hourly",
        "chain_qaqc_merge_events",
        "report_flag_rates",
        "q1_pricing_summary",
        "q2_min_cost_supplier",
        "q9_product_profit",
        "q18_large_orders",
        "w11_hourly_resample",
        "d_exact_dedup",
        "d_minhash_lsh_pairs",
        "d_dup_clusters",
        "s_cosine_topk",
        "s_ivf_ann_topk",
        "sk_hll_distinct",
        "t_tfidf_topterms",
        "st_hourly_rollup_stream",
    ]
    head = {k: timings[k] for k in headline if k in timings}
    print(
        json.dumps(
            {
                "metric": "suite_min_of_k_seconds",
                "value": total,
                "unit": "sec",
                "queries": head,
                "sf": sf,
                "n_queries": len(timings),
                "reps": reps,
                "wall_total": wall_total,
                # registry grows round over round — normalize so a
                # coverage increase isn't read as a perf regression
                "sec_per_query": round(total / max(len(timings), 1), 4),
                "queries_file": "BENCH_QUERIES.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
