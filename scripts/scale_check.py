"""Measured scale checks: dedup/media chains, and the relational/
stats family.

Default mode builds a deterministically scaled `documents` corpus
(K jittered replicas per doc → planted K-way near-dup variant groups,
the adversarial case for LSH dedup), then runs the REAL registered
chains (`chain_neardup_removal`, `chain_media_curation`) at 1x and Kx
and reports wall time plus the per-stage row counts that drive shuffle
volume (shingles, LSH candidate pairs, confirmed pairs for dedup;
decoded media rows and ahash buckets for media). The claims these
numbers back: no stage is corpus-quadratic — candidates grow with
genuine duplicate mass, pixels never shuffle.

`rel` mode replicates lineitem/orders (key-offset replicas, join keys
kept aligned) and events K× and runs the headline relational/stats set
(q1, q9, q18, a27_exact_median, a29_weighted_median, e_rfm_scores,
o13_table_profile) at 1x and Kx, reporting wall time AND the executed
plan's shuffle-write bytes + spill (SQLMetrics, no UI needed) so
super-linear shuffle growth can't hide behind wall noise.

Usage:  python scripts/scale_check.py [rel] [K] [sf_dir]
Defaults: dedup/media mode, K=10, sf_dir=/root/testdata/sf0.1.
Results tables go in README "Scale checks".
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from historical_obs_platform_spark import registry  # noqa: E402
from historical_obs_platform_spark.operators import dedup as DD  # noqa: E402
from historical_obs_platform_spark.queries import textops as TX  # noqa: E402
from historical_obs_platform_spark.session import get_spark  # noqa: E402
from historical_obs_platform_spark.queries.common import table  # noqa: E402
from historical_obs_platform_spark.tables import TABLE_NAMES  # noqa: E402

registry.load_all()


def build_scaled_dir(spark, sf_dir: str, k: int) -> str:
    """K jittered replicas of documents.parquet; other tables symlink."""
    sf_dir = os.path.abspath(sf_dir)  # symlink targets must not resolve against tmp
    out = tempfile.mkdtemp(prefix=f"hop_scale_{k}x_")
    docs = table(spark, sf_dir, "documents")
    reps = []
    for i in range(k):
        r = docs.select(
            (F.col("doc_id") + i * 20_000_000).alias("doc_id"),
            # one appended token per replica: a 2-shingle corpus keeps
            # Jaccard >= ~0.9 between replicas -> genuine near-dups
            F.concat(F.col("text"), F.lit(f" variant{i}")).alias("text"),
            "source",
            *[c for c in docs.columns if c not in ("doc_id", "text", "source")],
        )
        reps.append(r)
    scaled = reps[0]
    for r in reps[1:]:
        scaled = scaled.unionByName(r)
    scaled.coalesce(8).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    for t in TABLE_NAMES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def dedup_stage_counts(spark, sf_dir: str) -> dict:
    shingles, cand = TX._lsh_shared(spark, sf_dir)
    pairs = DD.jaccard_pairs(
        shingles, "doc_id", min_jaccard=0.5, candidates=cand
    ).select("a", "b")
    return {
        "docs": TX._near_corpus_spark(spark, sf_dir).count(),
        "shingles": shingles.count(),
        "cand_pairs": cand.count(),
        "confirmed_pairs": pairs.count(),
    }


def timed(fn, *a):
    best = None
    for _ in range(2):  # min-of-2, warm second run
        t0 = time.time()
        res = fn(*a)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, res


def run_chain(spark, name: str, sf_dir: str):
    return registry.QUERIES[name](spark, sf_dir).collect()


# ------------------------------------------------------------------ #
# ann mode: IVFADC n_cells-growth contract at 1x vs Kx
# ------------------------------------------------------------------ #
def build_scaled_emb_dir(spark, sf_dir: str, k: int) -> str:
    """K jittered replicas of embeddings.parquet (direction jitter —
    the pipeline unit-normalizes, so a pure scale jitter would
    collapse replicas onto the same point); other tables symlink."""
    sf_dir = os.path.abspath(sf_dir)
    out = tempfile.mkdtemp(prefix=f"hop_ann_{k}x_")
    emb = table(spark, sf_dir, "embeddings")
    rep = F.col("rep")
    scaled = (
        emb.crossJoin(
            emb.sparkSession.range(k).withColumnRenamed("id", "rep")
        )
        .select(
            (F.col("vec_id") + rep * 20_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + 0.02
                    * (
                        (
                            F.pmod(
                                F.col("vec_id") * 31 + i * 7 + rep * 13,
                                F.lit(11),
                            )
                            - 5
                        )
                        / 5.0
                    )
                ).cast("float"),
            ).alias("embedding"),
            "label",
        )
    )
    scaled.coalesce(8).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    for t in TABLE_NAMES:
        if t != "embeddings":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def run_ann(spark, k: int, sf: str) -> None:
    """The production contract `operators/similarity.py` documents:
    'grow n_cells with the corpus' (n_cells ≈ √N). At Kx corpus the
    fixed-16-cell control's per-query candidate volume grows ∝ K
    (each probed cell holds N/16 vectors), while the √N contract
    keeps candidates ≈ nprobe·√N — serving stays near-fixed-cost.
    Codes are persisted partitioned by cell (the §V inverted-list
    layout), so the probed-cell restriction is physical partition
    pruning; build wall is reported separately from serving wall."""
    import math

    from pyspark.sql.window import Window

    from historical_obs_platform_spark.operators import (
        similarity as SIM,
    )

    NPROBE, KNN = 4, 5

    def one(sf_dir: str, n_cells: int, label: str):
        # the scaled parquet lands in ~3 scan partitions (small local
        # files); repartition so the map-only Arrow kernels actually
        # use the cores — a real corpus has real partitioning
        emb = table(spark, sf_dir, "embeddings").repartition(
            spark.sparkContext.defaultParallelism
        )
        n = emb.count()
        print(f"[{label}] start N={n:,} n_cells={n_cells}", flush=True)
        lay = tempfile.mkdtemp(prefix="hop_ann_layout_")
        t0 = time.time()
        cent, cb, codes = SIM.ivfpq_index(
            emb, "vec_id", "embedding", n_cells=n_cells,
            layout_dir=f"{lay}/codes",
        )
        cent = cent.localCheckpoint(eager=True)
        cb = cb.localCheckpoint(eager=True)
        w_build = time.time() - t0
        print(f"[{label}] index built {w_build:.1f}s", flush=True)
        queries = emb.where(F.col("vec_id") < 10)

        # per-arm candidate volume: Σ over (query, probed cell) of
        # that cell's inverted-list length
        qvec = queries.select(
            F.col("vec_id").alias("query_id"),
            SIM._unit(SIM.as_double_array("embedding")).alias("__uv"),
        )
        qscored = qvec.crossJoin(F.broadcast(cent)).withColumn(
            "__s", SIM.dot(F.col("__uv"), F.col("__cent"))
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.desc("__s"), F.asc("cell")
        )
        qprobe = (
            qscored.withColumn("__rn", F.row_number().over(wq))
            .where(F.col("__rn") <= NPROBE)
            .select("query_id", "cell")
        )
        sizes = codes.groupBy("cell").agg(
            F.countDistinct("neighbor_id").alias("n")
        )
        cand = (
            qprobe.join(sizes, "cell").agg(F.sum("n")).collect()[0][0]
        )

        w_serve, res = timed(
            lambda: SIM.ivfpq_query(
                cent, cb, codes, queries, "vec_id", "embedding",
                k=KNN, nprobe=NPROBE,
            ).collect()
        )
        shutil.rmtree(lay, ignore_errors=True)
        row = (label, n, n_cells, cand, w_build, w_serve, len(res))
        print(
            f"[{label}] N={n:,} n_cells={n_cells} cand={cand:,} "
            f"build={w_build:.2f}s serve={w_serve:.2f}s rows={len(res)}",
            flush=True,
        )
        return row

    rows = []
    for kk in (1, k):
        d = build_scaled_emb_dir(spark, sf, kk)
        try:
            n = table(spark, d, "embeddings").count()
            rows.append(one(d, 16, f"{kk}x fixed16"))
            rows.append(
                one(d, int(math.isqrt(n)), f"{kk}x sqrtN")
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(
        "\n| config | N | n_cells | probed candidates "
        "| build wall | serve wall |"
    )
    print("|---|---|---|---|---|---|")
    for label, n, nc, cand, wb, ws, _ in rows:
        print(
            f"| {label} | {n:,} | {nc} | {cand:,} "
            f"| {wb:.2f} s | {ws:.2f} s |"
        )


# ------------------------------------------------------------------ #
# rel mode: relational/stats family at 1x vs Kx with shuffle metrics
# ------------------------------------------------------------------ #
REL_QUERIES = [
    "q1_pricing_summary",
    "q9_product_profit",
    "q18_large_orders",
    "a27_exact_median",
    "a29_weighted_median",
    "e_rfm_scores",
    "o13_table_profile",
    # round-7 stats/resampling wave (events also scale Kx in rel mode)
    "a36_mann_whitney",
    "a39_bootstrap_ci",
    "g_hits_fixed",
]


def build_scaled_rel_dir(spark, sf_dir: str, k: int) -> str:
    """K replicas of lineitem/orders (orderkeys offset in lockstep so
    joins stay aligned; customers/parts/suppliers unchanged → each
    customer simply has K× the orders, the realistic growth mode) and
    K replicas of events (event_id offset, ts +i seconds, same
    users). Dimension tables symlink."""
    sf_dir = os.path.abspath(sf_dir)
    out = tempfile.mkdtemp(prefix=f"hop_scale_rel_{k}x_")
    off = 100_000_000

    def reps(df, build):
        parts = [build(df, i) for i in range(k)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    events = table(spark, sf_dir, "events")
    reps(
        orders,
        lambda df, i: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * off)
        ),
    ).coalesce(8).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    reps(
        lineitem,
        lambda df, i: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * off)
        ),
    ).coalesce(16).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    reps(
        events,
        lambda df, i: df.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 1_000_000_000)
        ).withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {i} SECOND")
        ),
    ).coalesce(8).write.mode("overwrite").parquet(f"{out}/events.parquet")
    for t in TABLE_NAMES:
        if t not in ("orders", "lineitem", "events"):
            os.symlink(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def _plan_metrics(df) -> dict:
    """Sum shuffle-write bytes / spill over the EXECUTED plan
    (AQE-final, SQLMetrics via py4j — works with the UI disabled)."""

    def kids(node):
        if node.nodeName().startswith("AdaptiveSparkPlan"):
            return [node.executedPlan()]
        try:
            return [node.plan()]  # ShuffleQueryStage / BroadcastQueryStage
        except Exception:
            pass
        out, it = [], node.children().iterator()
        while it.hasNext():
            out.append(it.next())
        return out

    def walk(node, acc):
        m, it = {}, node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            m[kv._1()] = kv._2().value()
        acc.append((node.nodeName(), m))
        for c in kids(node):
            walk(c, acc)
        return acc

    nodes = walk(df._jdf.queryExecution().executedPlan(), [])
    return {
        "shuffle_bytes": sum(
            m.get("shuffleBytesWritten", 0) for _, m in nodes
        ),
        "spill_bytes": sum(m.get("spillSize", 0) for _, m in nodes),
        "scan_rows": sum(
            m.get("numOutputRows", 0)
            for nm, m in nodes
            if nm.startswith("Scan")
        ),
    }


def run_rel(spark, k: int, sf: str) -> None:
    scaled = build_scaled_rel_dir(spark, sf, k)
    try:
        results: dict[str, dict[str, dict]] = {}
        for label, d in [("1x", sf), (f"{k}x", scaled)]:
            for name in REL_QUERIES:
                fn = registry.QUERIES[name]
                walls = []
                # min-of-3: this host shows multi-second VM-throttle /
                # full-GC stalls that land on random queries (README
                # bench note) — two reps are not enough to dodge one
                for _ in range(3):
                    t0 = time.time()  # fn() may work eagerly (a27)
                    df = fn(spark, d)
                    rows = df.collect()
                    walls.append(time.time() - t0)
                met = _plan_metrics(df)
                met["wall"] = min(walls)
                met["rows"] = len(rows)
                results.setdefault(name, {})[label] = met
                print(
                    f"[{label}] {name}: {met['wall']:.2f}s "
                    f"rows={met['rows']:,} "
                    f"shuffle={met['shuffle_bytes']:,}B "
                    f"spill={met['spill_bytes']:,}B",
                    flush=True,
                )
        kx = f"{k}x"
        print(
            "\n| query | 1x wall | 1x shuffle | "
            f"{kx} wall | {kx} shuffle | wall ratio | shuffle ratio |"
        )
        print("|---|---|---|---|---|---|---|")
        for name in REL_QUERIES:
            a, b = results[name]["1x"], results[name][kx]
            wr = b["wall"] / a["wall"] if a["wall"] else float("inf")
            sr = (
                b["shuffle_bytes"] / a["shuffle_bytes"]
                if a["shuffle_bytes"]
                else float("inf")
            )
            flag = "  **> linear**" if wr > k else ""
            print(
                f"| {name} | {a['wall']:.2f} s | {a['shuffle_bytes']:,} B "
                f"| {b['wall']:.2f} s | {b['shuffle_bytes']:,} B "
                f"| {wr:.2f}x | {sr:.2f}x |{flag}"
            )
    finally:
        shutil.rmtree(scaled, ignore_errors=True)


# ------------------------------------------------------------------ #
# graphskew mode: planted power-law hub (one supplier in ~20% of
# orders), 1x and Kx — the adversarial case for the wedge/triangle
# guards (degree orientation, qty-threshold sparsification)
# ------------------------------------------------------------------ #
GRAPH_QUERIES = [
    "g_triangle_count",
    "g_link_prediction",
    "g_kcore_peel",
    "g_pagerank_fixed",
]
_HUB_MOD = 5  # l_orderkey % 5 == 0 -> hub supplier (~20% of orders)


def build_hub_dir(spark, sf_dir: str, k: int, hub: bool = True) -> str:
    """K replicas of lineitem/orders growing the GRAPH Kx: order,
    customer AND supplier keys offset per replica (Kx nodes, flat
    non-hub degrees — the original sf0.01→sf0.1 growth mode), then
    every 5th order's lineitems rewritten to the ONE global supplier
    1 — the hub keeps its 20% share at every K, so its degree grows
    ~Kx on top of an otherwise-flat degree distribution (a planted
    power-law head)."""
    sf_dir = os.path.abspath(sf_dir)
    out = tempfile.mkdtemp(prefix=f"hop_scale_hub_{k}x_")
    off = 100_000_000  # multiple of _HUB_MOD: replicas hub identically

    def reps(df, build):
        parts = [build(df, i) for i in range(k)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    reps(
        orders,
        lambda df, i: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * off)
        ).withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(i * 10_000_000)
        ),
    ).coalesce(8).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    reps(
        lineitem,
        lambda df, i: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * off)
        ).withColumn(
            "l_suppkey", F.col("l_suppkey") + F.lit(i * 1_000_000)
        ),
    ).withColumn(
        "l_suppkey",
        F.when(
            F.lit(hub) & (F.col("l_orderkey") % _HUB_MOD == 0), F.lit(1)
        ).otherwise(F.col("l_suppkey")),
    ).coalesce(16).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )
    for t in TABLE_NAMES:
        if t not in ("orders", "lineitem"):
            os.symlink(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def graph_shape(spark, d: str) -> dict:
    """Edge count, max supplier degree, and the ORIENTED wedge mass —
    the rows the triangle join actually enumerates (sum over nodes of
    C(out_deg, 2) under (deg, id) orientation), vs the quadratic
    naive wedge mass C(deg, 2) a hub would explode."""
    from historical_obs_platform_spark.queries import graph2 as G2

    pairs = G2._trade_pairs(spark, d, namespaced=True)
    edges = pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("supp_node").alias("src"),
            F.col("cust_node").alias("dst"),
        )
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e = (
        edges.join(deg.withColumnRenamed("src", "u"), F.col("src") == F.col("u"))
        .select("src", "dst", F.col("d").alias("ds"))
        .join(deg.withColumnRenamed("src", "v"), F.col("dst") == F.col("v"))
        .select("src", "dst", "ds", F.col("d").alias("dd"))
    )
    oriented = e.where(
        (F.col("ds") < F.col("dd"))
        | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
    )
    out_deg = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    o_wedges = out_deg.agg(
        F.sum(F.expr("od * (od - 1) div 2")).cast("long").alias("w")
    ).collect()[0]["w"]
    naive_wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("w")
    ).collect()[0]["w"]
    max_supp = (
        pairs.groupBy("supp_node")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d").alias("m"))
        .collect()[0]["m"]
    )
    return {
        "edges": pairs.count(),
        "max_supp_deg": max_supp,
        "oriented_wedges": int(o_wedges or 0),
        "naive_wedges": int(naive_wedges or 0),
    }


def run_graphskew(spark, k: int, sf: str) -> None:
    hub1 = build_hub_dir(spark, sf, 1)
    basek = build_hub_dir(spark, sf, k, hub=False)
    hubk = build_hub_dir(spark, sf, k)
    try:
        rows = []
        for label, d in [
            ("1x base", sf),
            ("1x hub", hub1),
            (f"{k}x base", basek),
            (f"{k}x hub", hubk),
        ]:
            shape = graph_shape(spark, d)
            walls = {}
            for name in GRAPH_QUERIES:
                w, _ = timed(run_chain, spark, name, d)
                walls[name] = w
            rows.append((label, shape, walls))
            print(f"[{label}] {shape} walls={ {n: round(w,2) for n,w in walls.items()} }",
                  flush=True)
        hdr = " | ".join(n.replace("g_", "") for n in GRAPH_QUERIES)
        print(f"\n| variant | edges | max supp deg | oriented wedges | naive wedges | {hdr} |")
        print("|---|---|---|---|---|" + "---|" * len(GRAPH_QUERIES))
        for label, shape, walls in rows:
            cells = " | ".join(f"{walls[n]:.2f} s" for n in GRAPH_QUERIES)
            print(
                f"| {label} | {shape['edges']:,} | {shape['max_supp_deg']:,} "
                f"| {shape['oriented_wedges']:,} | {shape['naive_wedges']:,} "
                f"| {cells} |"
            )
    finally:
        shutil.rmtree(hub1, ignore_errors=True)
        shutil.rmtree(basek, ignore_errors=True)
        shutil.rmtree(hubk, ignore_errors=True)


def main() -> None:
    argv = sys.argv[1:]
    mode = "dedup"
    if argv and argv[0] in (
        "rel", "dedup", "graphskew", "ann", "dedupskew", "text"
    ):
        mode = argv[0]
        argv = argv[1:]
    k = int(argv[0]) if argv else 10
    sf = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-check")
    if mode == "rel":
        run_rel(spark, k, sf)
        return
    if mode == "graphskew":
        run_graphskew(spark, k, sf)
        return
    if mode == "ann":
        run_ann(spark, k, sf)
        return
    if mode == "dedupskew":
        run_dedupskew(spark, k, sf)
        return
    if mode == "text":
        run_text(spark, k, sf)
        return
    scaled = build_scaled_dir(spark, sf, k)
    try:
        rows = []
        for label, d in [("1x", sf), (f"{k}x", scaled)]:
            cnt = dedup_stage_counts(spark, d)
            w_dedup, res = timed(run_chain, spark, "chain_neardup_removal", d)
            cnt["n_removed"] = res[0]["n_removed"]
            w_media, mres = timed(run_chain, spark, "chain_media_curation", d)
            media_rows = sum(r["n_total"] for r in mres)
            media_kept = sum(r["n_kept"] for r in mres)
            rows.append((label, cnt, w_dedup, w_media, media_rows, media_kept))
            print(f"[{label}] dedup={w_dedup:.2f}s media={w_media:.2f}s {cnt} "
                  f"media_rows={media_rows} media_kept={media_kept}",
                  flush=True)
        print("\n| scale | docs | shingles | cand pairs | confirmed | "
              "removed | dedup wall | media rows | media kept | media wall |")
        print("|---|---|---|---|---|---|---|---|---|---|")
        for label, cnt, wd, wm, mr, mk in rows:
            print(f"| {label} | {cnt['docs']:,} | {cnt['shingles']:,} "
                  f"| {cnt['cand_pairs']:,} | {cnt['confirmed_pairs']:,} "
                  f"| {cnt['n_removed']:,} | {wd:.2f} s | {mr:,} | {mk:,} "
                  f"| {wm:.2f} s |")
    finally:
        shutil.rmtree(scaled, ignore_errors=True)




# ------------------------------------------------------------------ #
# dedupskew mode: 100x corpus, one source owning 50% of docs with a
# planted boilerplate mega-bucket — the adversarial case for LSH
# candidate generation. Measures the full-pairing candidate mass
# (count only: at Kx the planted K-way groups alone make it
# O(K²·docs)) against the star pairing's linear mass, and runs the
# star-paired removal chain end-to-end.
# ------------------------------------------------------------------ #
_BOILER = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi"
)
_SKEW_MOD = 20  # 1/20 of originals become boilerplate docs


def build_skew_dir(spark, sf_dir: str, k: int) -> str:
    """K jittered replicas (the planted near-dup groups), with the
    top half of replicas owned by ONE source (`srchub`, 50% of docs)
    and every `_SKEW_MOD`-th original's hub replicas rewritten to a
    shared 16-token boilerplate + 8 per-(doc, rep)-unique tokens —
    pairwise Jaccard ≈ 0.48 (below the 0.5 confirm threshold, so NOT
    genuine dups) while ~2/3 of each minhash lands in the shared
    shingles, so a large fraction of them collide into per-band
    mega-buckets: candidate-pair junk the full pairing pays B²/2 for
    and the star pairing pays B−1 for."""
    sf_dir = os.path.abspath(sf_dir)
    out = tempfile.mkdtemp(prefix=f"hop_skew_{k}x_")
    docs = table(spark, sf_dir, "documents")
    rep = F.col("rep")
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"u{j}x"),
                F.col("doc_id").cast("string"),
                F.lit("r"),
                rep.cast("string"),
            )
            for j in range(8)
        ],
    )
    is_boiler = (F.col("doc_id") % _SKEW_MOD == 0) & (rep >= k // 2)
    scaled = (
        docs.crossJoin(
            docs.sparkSession.range(k).withColumnRenamed("id", "rep")
        )
        .select(
            (F.col("doc_id") + rep * 20_000_000).alias("doc_id"),
            F.when(
                is_boiler, F.concat(F.lit(_BOILER + " "), uniq)
            )
            .otherwise(
                F.concat(
                    F.col("text"),
                    F.concat(F.lit(" variant"), rep.cast("string")),
                )
            )
            .alias("text"),
            F.when(rep >= k // 2, F.lit("srchub"))
            .otherwise(F.col("source"))
            .alias("source"),
            *[
                c
                for c in docs.columns
                if c not in ("doc_id", "text", "source")
            ],
        )
    )
    scaled.coalesce(16).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    for t in TABLE_NAMES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def run_dedupskew(spark, k: int, sf: str) -> None:
    from historical_obs_platform_spark.operators import dedup as DD
    from historical_obs_platform_spark.queries import textops as TX

    def one(label: str, d: str):
        t0 = time.time()
        corpus = TX._near_corpus_spark(spark, d)
        n_docs = corpus.count()
        shingles = DD.word_shingles(
            corpus, "doc_id", "text", n=2
        ).localCheckpoint(eager=True)
        n_shingles = shingles.count()
        sigs = DD.minhash_signatures(
            shingles, "doc_id", n_hashes=TX.LSH_N_HASHES
        )
        buckets = DD.lsh_buckets(
            sigs, "doc_id", n_hashes=TX.LSH_N_HASHES, bands=TX.LSH_BANDS
        ).localCheckpoint(eager=True)
        w_build = time.time() - t0

        bs = buckets.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("sz")
        )
        mx = bs.agg(
            F.max("sz").alias("mx"),
            F.sum(
                F.col("sz").cast("bigint")
                * (F.col("sz") - 1)
                / 2
            ).cast("bigint").alias("full_pairs_prebands"),
        ).collect()[0]
        # full pairing mass: distinct pairs across bands (count only
        # at Kx — materializing the confirm on O(K²·docs) pairs is
        # exactly what this mode demonstrates you must not do)
        t0 = time.time()
        n_full = DD.lsh_candidate_pairs(buckets, "doc_id").count()
        w_full_cand = time.time() - t0

        t0 = time.time()
        star = DD.lsh_star_pairs(buckets, "doc_id").localCheckpoint(
            eager=True
        )
        n_star = star.count()
        w_star_cand = time.time() - t0

        t0 = time.time()
        pairs = DD.jaccard_pairs(
            shingles, "doc_id", min_jaccard=0.5, candidates=star
        ).select("a", "b")
        comp = DD.connected_components(pairs).withColumnRenamed(
            "node", "doc_id"
        )
        joined = corpus.select("doc_id").join(comp, "doc_id", "left")
        keep = F.col("component").isNull() | (
            F.col("component") == F.col("doc_id")
        )
        res = joined.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(~keep).cast("long").alias("n_removed"),
        ).collect()[0]
        w_chain = time.time() - t0
        row = (
            label, n_docs, n_shingles, int(mx["mx"]), n_full,
            n_star, int(res["n_removed"]), w_build, w_full_cand,
            w_star_cand, w_chain,
        )
        print(
            f"[{label}] docs={n_docs:,} shingles={n_shingles:,} "
            f"max_bucket={mx['mx']:,} full_cand={n_full:,} "
            f"star_cand={n_star:,} removed={res['n_removed']:,} "
            f"build={w_build:.1f}s full_cand_count={w_full_cand:.1f}s "
            f"star={w_star_cand:.1f}s chain={w_chain:.1f}s",
            flush=True,
        )
        return row

    rows = []
    for kk in (1, k):
        d = build_skew_dir(spark, sf, kk)
        try:
            rows.append(one(f"{kk}x", d))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(
        "\n| scale | docs | shingles | max bucket | full-pair cand "
        "(count only) | star cand | removed | build | full-cand "
        "count | star cand | star confirm+components+removal |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for (label, nd, ns, mb, nf, nst, nr, wb, wf, ws, wc) in rows:
        print(
            f"| {label} | {nd:,} | {ns:,} | {mb:,} | {nf:,} "
            f"| {nst:,} | {nr:,} | {wb:.1f} s | {wf:.1f} s "
            f"| {ws:.1f} s | {wc:.1f} s |"
        )




# ------------------------------------------------------------------ #
# text mode: text-analytics family at 1x vs Kx with shuffle metrics
# (the last operator family without a published scale table)
# ------------------------------------------------------------------ #
TEXT_QUERIES = [
    "t_cooccur_pmi",
    "t_heaps_law",
    "t_ngram_novelty",
    "t_winnow_fingerprints",
    "t_bpe_train_encode",
    "t_tfidf_topterms",
    "t_textrank_keywords",
    "t_rake_keywords",
    "t_token_burstiness",
    "t_lexical_diversity",
]


def run_text(spark, k: int, sf: str) -> None:
    scaled = build_scaled_dir(spark, sf, k)
    try:
        results: dict[str, dict[str, dict]] = {}
        for label, d in [("1x", sf), (f"{k}x", scaled)]:
            for name in TEXT_QUERIES:
                fn = registry.QUERIES[name]
                walls = []
                for _ in range(3):
                    t0 = time.time()
                    df = fn(spark, d)
                    rows = df.collect()
                    walls.append(time.time() - t0)
                met = _plan_metrics(df)
                met["wall"] = min(walls)
                met["rows"] = len(rows)
                results.setdefault(name, {})[label] = met
                print(
                    f"[{label}] {name}: {met['wall']:.2f}s "
                    f"rows={met['rows']:,} "
                    f"shuffle={met['shuffle_bytes']:,}B "
                    f"spill={met['spill_bytes']:,}B",
                    flush=True,
                )
        kx = f"{k}x"
        print(
            "\n| query | 1x wall | 1x shuffle | "
            f"{kx} wall | {kx} shuffle | wall ratio | shuffle ratio |"
        )
        print("|---|---|---|---|---|---|---|")
        for name in TEXT_QUERIES:
            a, b = results[name]["1x"], results[name][kx]
            wr = b["wall"] / a["wall"] if a["wall"] else float("inf")
            sr = (
                b["shuffle_bytes"] / a["shuffle_bytes"]
                if a["shuffle_bytes"]
                else float("inf")
            )
            flag = "  **> linear**" if wr > k else ""
            print(
                f"| {name} | {a['wall']:.2f} s | {a['shuffle_bytes']:,} B "
                f"| {b['wall']:.2f} s | {b['shuffle_bytes']:,} B "
                f"| {wr:.2f}x | {sr:.2f}x |{flag}"
            )
    finally:
        shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
