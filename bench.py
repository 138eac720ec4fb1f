"""Benchmark harness — runs the registered headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full physical plan,
no driver materialization cost).
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
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    registry.load_all()
    spark = get_spark("hop-spark-bench")

    # Warm the JVM/codegen path once so per-query numbers measure the
    # engine, not first-call JIT.
    registry.QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    import gc

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        try:
            run_query(fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # pragma: no cover
            timings[name] = -1.0
            print(f"# {name} FAILED: {exc}", file=sys.stderr)
        # drop cached/localCheckpoint blocks so earlier queries'
        # state doesn't slow later ones (measured: ~2× drift across
        # a 68-query session without this)
        spark.catalog.clearCache()
        gc.collect()
    total = round(time.perf_counter() - t_all, 4)

    print(
        json.dumps(
            {
                "metric": "suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
