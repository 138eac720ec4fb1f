"""Write ``explain('formatted')`` for registered queries to files —
the plan-evidence companion to bench_subset (no execution, so it can
run while the host is busy; shared-handle builds may still execute
their one-time materialization on first reference).

Usage: python scripts/dump_plans.py <suffix> <query> [...] [--sf DIR]
       [--out DIR]

Writes ``<out>/<query>_<suffix>.txt`` (suffix: ``before``/``after``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from historical_obs_platform_spark import registry
from historical_obs_platform_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = "plans/r08"
    names: list[str] = []
    suffix = None
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--out":
            out_dir = args[i + 1]; i += 2
        elif suffix is None:
            suffix = a; i += 1
        else:
            names.append(a); i += 1
    if not suffix or not names:
        raise SystemExit(__doc__)
    registry.load_all()
    spark = get_spark()
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = registry.QUERIES[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
