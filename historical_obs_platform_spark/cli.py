"""Command-line entry points — the analogs of the reference's run
scripts (``QAQC_run_for_single_station.py``,
``MERGE_run_for_single_station.py``, ``<NETWORK>_clean.py``;
SURVEY.md §3), reshaped for Spark: one job processes *all* stations
(stations are partitions, not processes), and ``--station`` is an
optional pushed-down filter rather than the unit of work.

    python -m historical_obs_platform_spark qaqc  --input obs/ --output out/
    python -m historical_obs_platform_spark merge --input out/ --output hourly/
    python -m historical_obs_platform_spark clean-isd --input raw/ --output clean/
    python -m historical_obs_platform_spark query --name q1_pricing_summary
    python -m historical_obs_platform_spark list-queries

All subcommands accept parquet directories. ``main()`` takes an
optional SparkSession so tests can drive it in-process.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _check_distinct_io(args) -> None:
    """Refuse output == input (resolved paths). Every write here is
    mode('overwrite') over a LAZILY-read input: writing onto the
    source path deletes the input before/while the read executes,
    destroying the corpus. Checked once in main() for any subcommand
    carrying both paths."""
    import os

    def _canon(p):
        return os.path.realpath(os.path.abspath(p))

    def _overlap(x, y):
        return (
            x == y
            or y.startswith(x + os.sep)
            or x.startswith(y + os.sep)
        )

    inp = getattr(args, "input", None)
    # every overwrite-mode sink the subcommand can write: the main
    # --output plus the side-channel CSV sinks
    sinks = [
        (attr, getattr(args, attr, None))
        for attr in ("output", "flag_counts", "station_list")
        if getattr(args, attr, None) is not None
    ]
    if inp is not None:
        ri = _canon(inp)
        for attr, out in sinks:
            if _overlap(ri, _canon(out)):
                raise SystemExit(
                    f"--{attr.replace('_', '-')} {out!r} resolves "
                    f"into --input {inp!r}: the overwrite would "
                    "delete the source before the lazy read "
                    "finishes. Write to a different path and move "
                    "on success."
                )
    # sinks must not clobber EACH OTHER either (e.g. --flag-counts
    # equal to --output overwrites the merge result just written)
    for i, (attr_a, a) in enumerate(sinks):
        for attr_b, b in sinks[i + 1 :]:
            if _overlap(_canon(a), _canon(b)):
                raise SystemExit(
                    f"--{attr_a.replace('_', '-')} and "
                    f"--{attr_b.replace('_', '-')} resolve to "
                    f"overlapping paths ({a!r}, {b!r}): the second "
                    "write would destroy the first."
                )


def _read(spark: SparkSession, path: str, station: str | None):
    df = spark.read.parquet(path)
    if station:
        # predicate pushdown makes this the per-station run of the
        # reference: only that station's row groups are read
        df = df.where(F.col("station") == station)
    return df


def _ensure_network(df):
    if "network" not in df.columns:
        df = df.withColumn(
            "network",
            F.coalesce(
                F.split(F.col("station"), "_").getItem(0), F.lit("UNKNOWN")
            ),
        )
    return df


def cmd_qaqc(spark, args) -> int:
    from .plans.clean import write_stage
    from .plans.qaqc_chain import run_qaqc

    obs = _read(spark, args.input, args.station)
    flagged = run_qaqc(obs, with_distribution=not args.no_distribution)
    write_stage(_ensure_network(flagged), args.output)
    return 0


def cmd_merge(spark, args) -> int:
    from .plans.clean import write_stage, write_station_list_csv
    from .plans.merge import flag_counts, run_merge

    obs = _read(spark, args.input, args.station)
    merged = run_merge(obs)
    write_stage(_ensure_network(merged), args.output)
    if args.flag_counts:
        write_station_list_csv(flag_counts(obs), args.flag_counts)
    return 0


def cmd_clean_isd(spark, args) -> int:
    from .plans.clean import clean_isd, station_list, write_stage
    from .plans.clean import write_station_list_csv

    bbox = tuple(args.bbox) if args.bbox else None
    obs = clean_isd(spark, args.input, bbox=bbox)
    write_stage(_ensure_network(obs), args.output)
    if args.station_list:
        write_station_list_csv(station_list(obs), args.station_list)
    return 0


def cmd_clean_network(spark, args) -> int:
    """The reference's per-network `<NETWORK>_clean.py` entry point,
    reshaped: one Spark job over the whole raw prefix, quirks applied
    declaratively from sources/networks.NETWORKS."""
    from .plans.clean import write_stage
    from .sources.csv_obs import read_csv_obs
    from .sources.networks import NETWORKS, clean_network

    spec = NETWORKS[args.network]
    raw = read_csv_obs(
        spark,
        args.input,
        renames={},
        period=None,
        # QC columns carry letter flags — exempt them from the
        # numeric cast so clean_network can keep them verbatim
        keep_strings=tuple(spec.qc_renames),
    )
    out = clean_network(raw, spec)
    write_stage(_ensure_network(out), args.output)
    return 0


def cmd_query(spark, args) -> int:
    from . import registry

    registry.load_all()
    if args.name not in registry.QUERIES:
        print(f"unknown query {args.name!r}", file=sys.stderr)
        return 2
    df = registry.QUERIES[args.name](spark, args.sf_dir)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
    else:
        df.show(args.show, truncate=False)
    return 0


def cmd_split(spark, args) -> int:
    """Deterministic train/val/test split of a documents corpus,
    written partitionBy('split') — the assignment is a stateless
    hash-of-key projection, so the writer shuffles nothing and a
    re-run (or an incremental append) lands every doc in the same
    split."""
    from .queries.datasetops import _SPLIT_CASE

    docs = spark.read.parquet(args.input)
    out = docs.withColumn("split", F.expr(_SPLIT_CASE))
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)
    return 0


def cmd_scrub(spark, args) -> int:
    """PII-scrub a documents corpus in place of its text column
    (map-only regexp projection; see queries/datasetops.t_pii_scrub)."""
    from .queries.datasetops import _EMAIL_RE, _NUM_RE

    docs = spark.read.parquet(args.input)
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _NUM_RE,
        "<NUM>",
    )
    out = docs.withColumn("text", scrubbed)
    out.write.mode("overwrite").parquet(args.output)
    return 0


def cmd_compact(spark, args) -> int:
    """Plan + execute small-file compaction: bin the per-day row
    counts (queries/datasetops2.o12_compaction_plan logic), then
    rewrite each bin as one task via repartitioning on the bin id."""
    from pyspark.sql import Window

    df = spark.read.parquet(args.input)
    # null times coalesce to a sentinel day so those rows survive the
    # equi-join (NULL keys never match — an inner join would silently
    # drop them, and a rewrite must be row-count-preserving)
    day = F.coalesce(
        F.col(args.time_col).cast("date"), F.lit("1900-01-01").cast("date")
    ).alias("__day")
    files = df.groupBy(day).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy("__day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    plan = files.withColumn(
        "__bin",
        F.floor(
            (F.sum("__n").over(w) - F.col("__n")).cast("double")
            / F.lit(args.target_rows)
        ).cast("long"),
    ).select("__day", "__bin")
    out = df.withColumn("__day", day).join(
        F.broadcast(plan), "__day"
    )
    (
        out.repartition("__bin")
        .sortWithinPartitions(args.time_col)
        .drop("__day", "__bin")
        .write.mode("overwrite")
        .parquet(args.output)
    )
    return 0


def cmd_list_queries(spark, args) -> int:
    from . import registry

    registry.load_all()
    for name in sorted(registry.QUERIES):
        oracle = "oracle" if name in registry.ORACLES else "rows-only"
        print(f"{name}\t{oracle}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="historical_obs_platform_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("qaqc", help="run the QA/QC flag battery")
    q.add_argument("--input", required=True)
    q.add_argument("--output", required=True)
    q.add_argument("--station", default=None)
    q.add_argument(
        "--no-distribution",
        action="store_true",
        help="skip the distribution tests (short records)",
    )
    q.set_defaults(fn=cmd_qaqc)

    m = sub.add_parser("merge", help="derive + hourly-standardize")
    m.add_argument("--input", required=True)
    m.add_argument("--output", required=True)
    m.add_argument("--station", default=None)
    m.add_argument("--flag-counts", default=None)
    m.set_defaults(fn=cmd_merge)

    c = sub.add_parser("clean-isd", help="parse NOAA ISD fixed-width")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument(
        "--bbox",
        nargs=4,
        type=float,
        default=None,
        metavar=("MINLON", "MINLAT", "MAXLON", "MAXLAT"),
    )
    c.add_argument("--station-list", default=None)
    c.set_defaults(fn=cmd_clean_isd)

    n = sub.add_parser(
        "clean-network",
        help="clean a raw CSV prefix with a network's quirk table",
    )
    n.add_argument("--input", required=True)
    from .sources.networks import NETWORKS

    n.add_argument(
        "--network",
        required=True,
        choices=sorted(NETWORKS),
    )
    n.add_argument("--output", required=True)
    n.set_defaults(fn=cmd_clean_network)

    r = sub.add_parser("query", help="run a registered query")
    r.add_argument("--name", required=True)
    r.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    r.add_argument("--output", default=None)
    r.add_argument("--show", type=int, default=20)
    r.set_defaults(fn=cmd_query)

    sp = sub.add_parser(
        "split", help="train/val/test split, partitioned output"
    )
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_split)

    sc = sub.add_parser("scrub", help="PII-scrub a documents corpus")
    sc.add_argument("--input", required=True)
    sc.add_argument("--output", required=True)
    sc.set_defaults(fn=cmd_scrub)

    cp = sub.add_parser(
        "compact", help="bin-packed small-file compaction rewrite"
    )
    cp.add_argument("--input", required=True)
    cp.add_argument("--output", required=True)
    cp.add_argument("--time-col", default="ts", dest="time_col")
    cp.add_argument(
        "--target-rows", type=int, default=1_000_000, dest="target_rows"
    )
    cp.set_defaults(fn=cmd_compact)

    ls = sub.add_parser("list-queries", help="list registered queries")
    ls.set_defaults(fn=cmd_list_queries)
    return p


def main(argv=None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    _check_distinct_io(args)
    if spark is None:
        from .session import get_spark

        spark = get_spark("hop-spark-cli")
    else:
        from .session import tune

        tune(spark)
    return args.fn(spark, args)


if __name__ == "__main__":
    raise SystemExit(main())
