"""Third graph wave over the customer↔supplier trade graph:

- g_resource_allocation — Resource-Allocation link prediction (Zhou,
  Lü & Zhang 2009): score customer pairs by Σ 1/deg(s) over shared
  suppliers. The per-neighbor term is kept as the exact integer
  1e12 DIV deg(s) ("RA micro-units"), so the wedge aggregation is a
  BIGINT sum — no float ever crosses the shuffle.
- g_modularity — Newman-Girvan modularity of the NATION partition on
  the sparsified trade graph: Q = Σ_c (L_c/m − (d_c/2m)²), all-exact
  integer edge/degree counts, one double division per community.
- g_hits_fixed — two rounds of UNNORMALIZED HITS power iteration
  (Kleinberg 1999) on the full bipartite graph: hubs = customers,
  authorities = suppliers. Normalization is a positive per-round
  scalar, so the unnormalized iteration ranks identically while
  staying exact integer end-to-end. The accumulators are
  DECIMAL(38,0) from round 1 (same plan, wider type — r8 advice
  fix: a LONG chain would raise under ANSI at extreme degrees while
  the oracle's HUGEINT promotion returned a value); the top-k
  scores cast back to BIGINT on both engines.

Fixed round counts make the iterations SQL-expressible; the oracles
unroll the same sweeps as chained CTEs (the g_pagerank_fixed /
g_components_fixed pattern, graph.py:116, graph2.py).

Reference anchor: the reference clusters co-located stations into
merge groups (scripts/4_merge_data/merge_prep.py) and ranks stations
by shared-neighborhood evidence when choosing merge order — link
scores, partition quality, and mutual-reinforcement ranking are the
corpus-scale versions of those decisions.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from .common import table
from .graph2 import _BIPAIRS_SQL, _LP_HUB_DEG_CAP, _trade_pairs

_RA_TOPK = 20
_RA_UNIT = 1_000_000_000_000  # 1e12 integer micro-units per 1/deg
_HITS_TOPK = 10

# ------------------------------------------------------------------ #
# g_resource_allocation
# ------------------------------------------------------------------ #
RA_ORACLE = f"""
WITH {_BIPAIRS_SQL},
sdeg AS (SELECT s, count(*) AS d FROM pairs GROUP BY s),
wedge AS (
  SELECT a.c AS ca, b.c AS cb,
         count(*) AS n_common,
         sum({_RA_UNIT} // sdeg.d) AS ra_e12
  FROM pairs a JOIN pairs b ON a.s = b.s AND a.c < b.c
  JOIN sdeg ON sdeg.s = a.s
  WHERE sdeg.d <= {_LP_HUB_DEG_CAP}
  GROUP BY a.c, b.c
)
SELECT CAST(ca AS BIGINT) AS node_a, CAST(cb AS BIGINT) AS node_b,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(ra_e12 AS BIGINT) AS ra_e12,
       round(CAST(ra_e12 AS DOUBLE) / {_RA_UNIT}, 6) AS ra_score
FROM (
  SELECT *, row_number() OVER (ORDER BY ra_e12 DESC, ca, cb) AS rnk
  FROM wedge
) WHERE rnk <= {_RA_TOPK}
"""


@query("g_resource_allocation", RA_ORACLE)
def g_resource_allocation(spark, sf_dir):
    """Resource-Allocation link prediction, top-20 customer pairs.

    Scale shape: identical wedge plan to g_link_prediction (work =
    Σ deg(s)² over suppliers, hub-capped at 1000) but the score is
    an exact BIGINT sum of 1e12 DIV deg(s) micro-units — RA's
    1/deg(z) weighting is also WHY the hub cap costs nothing here: a
    million-degree hub contributes 1e12/1e6 = 1e6 micro-units of
    near-noise per pair while generating (f·N)² pairs of work.
    """
    pairs = _trade_pairs(spark, sf_dir, namespaced=False)
    sdeg = pairs.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    capped = pairs.join(
        F.broadcast(sdeg.where(F.col("d") <= _LP_HUB_DEG_CAP)), "s"
    )
    a = capped.select(F.col("c").alias("ca"), "s", "d")
    b = pairs.join(
        F.broadcast(
            sdeg.where(F.col("d") <= _LP_HUB_DEG_CAP).select("s")
        ),
        "s",
        "left_semi",
    ).select(F.col("c").alias("cb"), F.col("s").alias("sb"))
    wedge = (
        a.join(b, (a.s == F.col("sb")) & (F.col("ca") < F.col("cb")))
        .groupBy("ca", "cb")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.expr(f"{_RA_UNIT} div d")).alias("ra_e12"),
        )
    )
    rw = Window.orderBy(F.desc("ra_e12"), F.asc("ca"), F.asc("cb"))
    return (
        wedge.withColumn("rnk", F.row_number().over(rw))
        .where(F.col("rnk") <= _RA_TOPK)
        .select(
            F.col("ca").cast("long").alias("node_a"),
            F.col("cb").cast("long").alias("node_b"),
            F.col("n_common").cast("long").alias("n_common"),
            F.col("ra_e12").cast("long").alias("ra_e12"),
            F.round(
                F.col("ra_e12").cast("double") / _RA_UNIT, 6
            ).alias("ra_score"),
        )
    )


# ------------------------------------------------------------------ #
# g_modularity — nation-partition modularity
# ------------------------------------------------------------------ #
MOD_ORACLE = f"""
WITH {_BIPAIRS_SQL},
ce AS (
  SELECT p.c, p.s, cu.c_nationkey AS cn, su.s_nationkey AS sn
  FROM pairs p
  JOIN customer cu ON cu.c_custkey = p.c
  JOIN supplier su ON su.s_suppkey = p.s
),
m AS (SELECT count(*) AS m FROM ce),
lin AS (
  SELECT cn AS nat, count(*) AS l_in FROM ce WHERE cn = sn GROUP BY cn
),
dsum AS (
  SELECT nat, sum(d) AS d_tot FROM (
    SELECT cn AS nat, count(*) AS d FROM ce GROUP BY cn
    UNION ALL
    SELECT sn AS nat, count(*) AS d FROM ce GROUP BY sn
  ) GROUP BY nat
),
comm AS (
  SELECT d.nat, coalesce(l.l_in, 0) AS l_in, d.d_tot
  FROM dsum d LEFT JOIN lin l ON l.nat = d.nat
),
contrib AS (
  SELECT nat, l_in, d_tot,
         CAST(l_in AS DOUBLE) / m.m
         - (CAST(d_tot AS DOUBLE) / (2 * m.m))
           * (CAST(d_tot AS DOUBLE) / (2 * m.m)) AS q_c
  FROM comm, m WHERE m.m > 0
),
qt AS (
  SELECT list_reduce(list(q_c ORDER BY nat), (a, b) -> a + b) AS q
  FROM contrib
)
SELECT n.n_name AS community, CAST(c.l_in AS BIGINT) AS l_in,
       CAST(c.d_tot AS BIGINT) AS d_tot,
       round(c.q_c, 6) AS q_contrib, round(qt.q, 6) AS q_total
FROM contrib c JOIN nation n ON n.n_nationkey = c.nat, qt
"""


@query("g_modularity", MOD_ORACLE)
def g_modularity(spark, sf_dir):
    """Newman-Girvan modularity of the NATION partition on the
    sparsified trade graph (does trade stay within nations?).

    Scale shape: two broadcast dim joins tag each edge with both
    endpoint communities; intra-edge and degree sums are one partial
    aggregation each; the Q fold runs over ≤25 community rows in
    nation order — all-integer until one double division per
    community.
    """
    pairs = _trade_pairs(spark, sf_dir, namespaced=False)
    cu = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("c"), F.col("c_nationkey").alias("cn")
    )
    su = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("s"), F.col("s_nationkey").alias("sn")
    )
    ce = pairs.join(F.broadcast(cu), "c").join(
        F.broadcast(su), "s"
    ).localCheckpoint(eager=False)
    m = ce.agg(F.count(F.lit(1)).alias("m"))
    lin = (
        ce.where(F.col("cn") == F.col("sn"))
        .groupBy(F.col("cn").alias("nat"))
        .agg(F.count(F.lit(1)).alias("l_in"))
    )
    dsum = (
        ce.groupBy(F.col("cn").alias("nat"))
        .agg(F.count(F.lit(1)).alias("d"))
        .unionByName(
            ce.groupBy(F.col("sn").alias("nat")).agg(
                F.count(F.lit(1)).alias("d")
            )
        )
        .groupBy("nat")
        .agg(F.sum("d").alias("d_tot"))
    )
    comm = dsum.join(lin, "nat", "left").select(
        "nat",
        F.coalesce("l_in", F.lit(0)).alias("l_in"),
        "d_tot",
    )
    md = F.col("m")
    q_c = F.col("l_in").cast("double") / md - (
        F.col("d_tot").cast("double") / (2 * md)
    ) * (F.col("d_tot").cast("double") / (2 * md))
    contrib = (
        comm.crossJoin(F.broadcast(m))
        .where(md > 0)
        .select("nat", "l_in", "d_tot", q_c.alias("q_c"))
    )
    qt = contrib.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("nat", F.col("q_c")))
                ),
                lambda s: s["q_c"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("q")
    )
    nat = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nat"), "n_name"
    )
    return (
        contrib.join(F.broadcast(nat), "nat")
        .crossJoin(F.broadcast(qt))
        .select(
            F.col("n_name").alias("community"),
            F.col("l_in").cast("long").alias("l_in"),
            F.col("d_tot").cast("long").alias("d_tot"),
            F.round("q_c", 6).alias("q_contrib"),
            F.round("q", 6).alias("q_total"),
        )
    )


# ------------------------------------------------------------------ #
# g_hits_fixed — 2-round unnormalized HITS on the full bipartite graph
# ------------------------------------------------------------------ #
HITS_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
a1 AS (SELECT s, count(*) AS a1 FROM pairs GROUP BY s),
h1 AS (
  SELECT p.c, sum(a1.a1) AS h1
  FROM pairs p JOIN a1 ON a1.s = p.s GROUP BY p.c
),
a2 AS (
  SELECT p.s, sum(h1.h1) AS a2
  FROM pairs p JOIN h1 ON h1.c = p.c GROUP BY p.s
),
h2 AS (
  SELECT p.c, sum(a2.a2) AS h2
  FROM pairs p JOIN a2 ON a2.s = p.s GROUP BY p.c
),
tops AS (
  SELECT 'authority' AS node_type, s AS node, a2 AS score,
         row_number() OVER (ORDER BY a2 DESC, s) AS rnk
  FROM a2
  UNION ALL
  SELECT 'hub' AS node_type, c AS node, h2 AS score,
         row_number() OVER (ORDER BY h2 DESC, c) AS rnk
  FROM h2
)
SELECT node_type, CAST(node AS BIGINT) AS node,
       CAST(score AS BIGINT) AS score, CAST(rnk AS INT) AS rnk
FROM tops WHERE rnk <= {_HITS_TOPK}
"""


@query("g_hits_fixed", HITS_ORACLE)
def g_hits_fixed(spark, sf_dir):
    """Two-round HITS hub/authority ranking, top-10 per side.

    Unnormalized power iteration: h0 ≡ 1, a1 = Aᵀh0 (= supplier
    degree), h1 = Aa1, a2 = Aᵀh1, h2 = Aa2 — per-round normalization
    is a positive scalar, so ranks match normalized HITS while every
    score stays an exact BIGINT (bound deg_max⁴; see module note).

    Scale shape: the edge list is built once and checkpointed; each
    half-round is one broadcast-or-shuffle join + partial-agg on the
    node key (the g_pagerank_fixed plan), iteration count × one
    exchange, no quadratic stage, no driver state.
    """
    from .graph import _bi_pairs

    # the full-bipartite distinct pair table is the same build
    # g_pagerank_fixed / g_kcore_peel namespace into node ids — share
    # the one checkpointed handle instead of re-joining per query
    pairs = _bi_pairs(spark, sf_dir)
    # accumulators widen to DECIMAL(38,0) from round 1 (r8 advice fix):
    # a LONG chain would RAISE under ANSI at extreme degrees while the
    # oracle's sum()→HUGEINT kept returning a value — same plan, wider
    # type; the final top-k scores still cast to BIGINT on both engines
    a1 = pairs.groupBy("s").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("a1")
    )
    # h1 is referenced exactly once (the a2 join) — plain lineage, no
    # checkpoint (each localCheckpoint compiles a physical plan
    # eagerly and materializes blocks; the g_pagerank_fixed lesson).
    # a2 keeps its checkpoint: it feeds BOTH the h2 sweep and the
    # authority top-k.
    h1 = pairs.join(a1, "s").groupBy("c").agg(F.sum("a1").alias("h1"))
    a2 = (
        pairs.join(h1, "c")
        .groupBy("s")
        .agg(F.sum("h1").alias("a2"))
        .localCheckpoint(eager=False)
    )
    h2 = pairs.join(a2, "s").groupBy("c").agg(F.sum("a2").alias("h2"))
    wa = Window.orderBy(F.desc("a2"), F.asc("s"))
    wh = Window.orderBy(F.desc("h2"), F.asc("c"))
    tops = (
        a2.select(
            F.lit("authority").alias("node_type"),
            F.col("s").alias("node"),
            F.col("a2").alias("score"),
            F.row_number().over(wa).alias("rnk"),
        )
    ).unionByName(
        h2.select(
            F.lit("hub").alias("node_type"),
            F.col("c").alias("node"),
            F.col("h2").alias("score"),
            F.row_number().over(wh).alias("rnk"),
        )
    )
    return tops.where(F.col("rnk") <= _HITS_TOPK).select(
        "node_type",
        F.col("node").cast("long").alias("node"),
        F.col("score").cast("long").alias("score"),
        F.col("rnk").cast("int").alias("rnk"),
    )


# ------------------------------------------------------------------ #
# g_local_clustering — per-node clustering coefficient, top-20
# ------------------------------------------------------------------ #
_LCC_TOPK = 20

LCC_ORACLE = f"""
WITH li AS (
  SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority = '1-URGENT'
),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
nt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b AS node FROM tri
    UNION ALL SELECT c AS node FROM tri
  ) GROUP BY node
),
lcc AS (
  SELECT deg.node, deg.d, coalesce(nt.t, 0) AS t,
         (2 * coalesce(nt.t, 0) * 1000000) // (deg.d * (deg.d - 1))
           AS lcc_ppm
  FROM deg LEFT JOIN nt ON nt.node = deg.node
  WHERE deg.d >= 2
)
SELECT CAST(node AS BIGINT) AS node, d AS degree, t AS n_triangles,
       CAST(lcc_ppm AS BIGINT) AS lcc_ppm, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY lcc_ppm DESC, node) AS rnk
  FROM lcc
) WHERE rnk <= {_LCC_TOPK}
"""


@query("g_local_clustering", LCC_ORACLE)
def g_local_clustering(spark, sf_dir):
    """Per-node local clustering coefficient over the urgent
    co-purchase graph (Watts & Strogatz 1998), exact ppm, top-20.

    Spark plan: triangles enumerate ONCE via degree orientation
    (orient each edge from its (degree, id)-smaller endpoint; every
    triangle has exactly one all-out apex, and wedge fan-out is
    bounded by out-degree ≤ O(√m) for ANY degree distribution — the
    g_triangle_count argument, here keeping per-node credit by
    exploding each found triangle to its three corners). The oracle
    is the independent canonical a<b<c triple join. lcc_ppm =
    (2t·1e6) DIV d(d−1) stays exact BIGINT end to end.
    """
    from .graph import _urgent_copurchase

    _, edges = _urgent_copurchase(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        # referenced three times (both orientation sides + the final
        # lcc row build); one materialization
        .localCheckpoint(eager=False)
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ed = edges.join(du, "u").join(dv, "v")
    lt = F.struct(F.col("du"), F.col("u")) < F.struct(
        F.col("dv"), F.col("v")
    )
    oriented = ed.select(
        F.when(lt, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lt, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lt, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).localCheckpoint(eager=False)
    o1 = oriented.select(
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        F.col("ddst").alias("db"),
    )
    o2 = oriented.select(
        F.col("src").alias("a2"),
        F.col("dst").alias("c"),
        F.col("ddst").alias("dc"),
    )
    wedge = o1.join(
        o2,
        (F.col("a") == F.col("a2"))
        & (
            F.struct(F.col("db"), F.col("b"))
            < F.struct(F.col("dc"), F.col("c"))
        ),
    )
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedge.join(closing, ["b", "c"], "left_semi").select(
        "a", "b", "c"
    )
    nt = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    lcc = (
        deg.where(F.col("d") >= 2)
        .join(nt, "node", "left")
        .select(
            "node",
            "d",
            F.coalesce("t", F.lit(0)).alias("t"),
            F.expr(
                "(2 * coalesce(t, 0) * 1000000)"
                " div (d * (d - 1))"
            ).alias("lcc_ppm"),
        )
    )
    from pyspark.sql.window import Window

    rw = Window.orderBy(F.desc("lcc_ppm"), F.asc("node"))
    return (
        lcc.withColumn("rnk", F.row_number().over(rw))
        .where(F.col("rnk") <= _LCC_TOPK)
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("d").alias("degree"),
            F.col("t").alias("n_triangles"),
            F.col("lcc_ppm").cast("long").alias("lcc_ppm"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ------------------------------------------------------------------ #
# g_harmonic_landmarks — landmark-based harmonic centrality (3 hops)
# ------------------------------------------------------------------ #
_HC_TOPK = 20

HARMONIC_ORACLE = f"""
WITH li AS (
  SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority = '1-URGENT'
),
e0 AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
),
e AS (
  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
),
h0 AS (
  SELECT DISTINCT pk AS lm, pk AS node FROM li WHERE pk % 100 = 0
),
h1 AS (
  SELECT DISTINCT h0.lm, e.v AS node FROM h0 JOIN e ON e.u = h0.node
),
h2 AS (
  SELECT DISTINCT h1.lm, e.v AS node FROM h1 JOIN e ON e.u = h1.node
),
h3 AS (
  SELECT DISTINCT h2.lm, e.v AS node FROM h2 JOIN e ON e.u = h2.node
),
md AS (
  SELECT lm, node, min(hops) AS d
  FROM (
    SELECT lm, node, 0 AS hops FROM h0
    UNION ALL SELECT lm, node, 1 FROM h1
    UNION ALL SELECT lm, node, 2 FROM h2
    UNION ALL SELECT lm, node, 3 FROM h3
  ) GROUP BY lm, node
),
hc AS (
  SELECT node,
         sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS n2,
         sum(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS n3,
         sum(CASE WHEN d = 1 THEN 6
                  WHEN d = 2 THEN 3
                  WHEN d = 3 THEN 2 ELSE 0 END) AS num6
  FROM md GROUP BY node
)
SELECT CAST(node AS BIGINT) AS node, CAST(n1 AS BIGINT) AS n_d1,
       CAST(n2 AS BIGINT) AS n_d2, CAST(n3 AS BIGINT) AS n_d3,
       round(CAST(num6 AS DOUBLE) / 6, 6) AS harmonic,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY num6 DESC, node) AS rnk
  FROM hc
) WHERE rnk <= {_HC_TOPK}
"""


@query("g_harmonic_landmarks", HARMONIC_ORACLE)
def g_harmonic_landmarks(spark, sf_dir):
    """Landmark-restricted harmonic centrality, 3-hop truncated
    (Eppstein & Wang 2004 pivot estimation shape): every node scores
    Σ over landmarks at distance d ∈ {1,2,3} of 1/d — since d is one
    of three values, the score's numerator 6·n1 + 3·n2 + 2·n3 is an
    EXACT integer, so ranking ties are exact and the only float is
    the presentation division by 6.

    Scale shape: a labeled multi-source BFS — each hop is
    (landmark, node) frontier ⋈ edges + distinct, ONE shuffle per
    hop; state is (landmarks × reached) pairs, bounded by the
    landmark budget (the knob a 100 TB run sizes: more landmarks =
    better centrality estimate, linearly more frontier). Exact
    all-pairs harmonic would be node²; landmarks make it
    budget-linear — the HyperBall/pivot trade.
    """
    from .graph import _urgent_copurchase, _urgent_sym

    items, _e0 = _urgent_copurchase(spark, sf_dir)
    edges = _urgent_sym(spark, sf_dir)
    h0 = (
        items.where(F.col("pk") % 100 == 0)
        .select(F.col("pk").alias("lm"), F.col("pk").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # DELTA multi-source BFS (the g_khop_reach move, per landmark):
    # each hop expands only the (lm, node) pairs first reached last
    # hop; an anti-join against the already-reached pairs stops
    # bounce-back re-expansion — in a small-world graph the naive
    # labeled frontier re-contains nearly the whole reach set from
    # hop 2 on, and the (landmark ×) multiplier makes this query the
    # family's most expensive. min(hops) per (lm, node) is unchanged:
    # the BFS level of a pair IS the first hop that reaches it.
    frontier = h0
    frontiers = [h0.withColumn("hops", F.lit(0))]
    for hop in range(1, 4):
        seen = frontiers[0].select("lm", "node")
        for f in frontiers[1:]:
            seen = seen.unionByName(f.select("lm", "node"))
        frontier = (
            frontier.join(edges, frontier.node == edges.u)
            .select("lm", F.col("v").alias("node"))
            .distinct()
            .join(seen, ["lm", "node"], "left_anti")
        )
        # the LAST hop's frontier is never re-expanded or anti-joined
        # against — it feeds only the scoring aggregation, so
        # materializing it (the largest table of the whole BFS,
        # ~1.8 M (lm, node) pairs at sf0.1) would be pure block-write
        # cost; earlier hops stay checkpointed because each is read
        # by every later hop's expansion AND the final union
        if hop < 3:
            frontier = frontier.localCheckpoint(eager=False)
        frontiers.append(frontier.withColumn("hops", F.lit(hop)))
    reached = frontiers[0]
    for f in frontiers[1:]:
        reached = reached.unionByName(f)
    # the delta BFS admits each (lm, node) pair in exactly ONE
    # frontier (per-hop distinct + anti-join against all earlier
    # hops), so the former min(hops) groupBy was an identity — its
    # exchange is pure cost; hops IS the BFS level d
    md = reached.select("lm", "node", F.col("hops").alias("d"))
    d = F.col("d")
    hc = md.groupBy("node").agg(
        F.sum(F.when(d == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(d == 2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(d == 3, 1).otherwise(0)).alias("n3"),
        F.sum(
            F.when(d == 1, 6)
            .when(d == 2, 3)
            .when(d == 3, 2)
            .otherwise(0)
        ).alias("num6"),
    )
    wr = Window.orderBy(F.desc("num6"), F.asc("node"))
    return (
        hc.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= _HC_TOPK)
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("n1").cast("long").alias("n_d1"),
            F.col("n2").cast("long").alias("n_d2"),
            F.col("n3").cast("long").alias("n_d3"),
            F.round(F.col("num6").cast("double") / 6, 6).alias(
                "harmonic"
            ),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
