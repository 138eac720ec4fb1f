"""Bench a subset of registered queries (same methodology as bench.py:
noop sink, min-of-k, cache-clear between reps) for the optimize loop.

Usage: python scripts/bench_subset.py <name-or-prefix> [...] [--reps N]
       [--sf DIR] [--explain OUTDIR]

Prefix match: an argument ending in '*' matches any query starting
with it. ``--explain OUTDIR`` additionally writes
``<query>.txt`` with ``explain('formatted')`` output per query.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    explain_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--explain":
            explain_dir = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    registry.load_all()
    selected = []
    for n in sorted(registry.QUERIES):
        for pat in names:
            if (pat.endswith("*") and n.startswith(pat[:-1])) or n == pat:
                selected.append(n)
                break
    if not selected:
        print("no queries matched", file=sys.stderr)
        sys.exit(1)

    spark = get_spark("hop-bench-subset")
    # JIT warm-up identical to bench.py
    registry.QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    out: dict[str, float] = {}
    for name in selected:
        fn = registry.QUERIES[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            spark.catalog.clearCache()
        runs = []
        builds = []
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                spark.sparkContext.setJobDescription(name)
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                runs.append(round(time.perf_counter() - t0, 4))
                builds.append(round(t1 - t0, 4))
            except Exception as exc:
                runs.append(-1.0)
                print(f"# {name} FAILED: {exc}", file=sys.stderr)
            finally:
                try:
                    spark.catalog.clearCache()
                    gc.collect()
                except Exception:
                    pass
            if runs[-1] < 0:
                break
        out[name] = min(runs) if all(t >= 0 for t in runs) else -1.0
        print(json.dumps({"query": name, "sec": out[name], "reps": runs,
                          "build": builds}))
    print(json.dumps({"subset_total": round(sum(v for v in out.values() if v >= 0), 4)}))
    spark.stop()


if __name__ == "__main__":
    main()
