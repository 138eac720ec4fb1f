"""Second graph wave over the SPARSIFIED customer↔supplier trade
graph (only rare high-quantity line items, so the graph has many
nontrivial components instead of one giant one):

- g_components_fixed — fixed-round min-label (hash-min) connected
  components; the registered face of dedup.connected_components.
- g_label_prop — synchronous label propagation communities
  (most-frequent-neighbor label, deterministic tie-breaks).
- g_link_prediction — Jaccard link scores on the bipartite form
  (customer pairs sharing suppliers), top-20.
- g_degree_assortativity — Newman's degree-degree Pearson r.

With a FIXED round count the iterative algorithms are
SQL-expressible — each sweep is one shuffle on the node key, and the
oracles unroll the same sweeps as chained CTEs. Everything is BIGINT
except one final double division per statistic, so every engine
computes identical results.

The graph definition is built ONCE (`_trade_pairs` / `_trade_edges`,
mirrored by the `_PAIRS_SQL`/`_EDGES_SQL` fragments every oracle
embeds) and localCheckpoint'ed, and each propagation round re-
checkpoints its state — Spark plans are TREES, so a loop whose round
references the previous state twice doubles the plan per round (the
g_kcore_peel lesson: 35.8 s → 1.8 s from exactly this discipline).

Reference anchor: the reference groups co-located stations into merge
clusters (scripts/4_merge_data/merge_prep.py) — the same "transitive
grouping of pairwise links" shape these primitives solve at corpus
scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import table

_MIN_QTY = 48  # keep only rare high-quantity trades → many components
_ROUNDS = 4
_LPA_ROUNDS = 3
_LP_TOPK = 20

# one definition of the sparsified graph, embedded by every oracle:
# namespaced node ids (customers even 2k, suppliers odd 2k+1) …
_PAIRS_SQL = f"""
pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS cust_node,
                  l.l_suppkey * 2 + 1 AS supp_node
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity >= {_MIN_QTY}
)"""

_EDGES_SQL = (
    _PAIRS_SQL
    + """,
edges AS (
  SELECT cust_node AS src, supp_node AS dst FROM pairs
  UNION ALL
  SELECT supp_node AS src, cust_node AS dst FROM pairs
)"""
)

# … and the raw bipartite (customer, supplier) key form for the
# neighborhood-overlap query, same predicate.
_BIPAIRS_SQL = f"""
pairs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity >= {_MIN_QTY}
)"""


# Session-scoped memo of the sparsified-graph builds (the graph.py
# `_GRAPH_SHARED` / textops `_lsh_shared` discipline): six queries
# across graph2/graph3 rebuild the identical lineitem ⋈ orders +
# distinct pair table per invocation; the first consumer materializes
# one lazily-localCheckpointed handle per (session, sf_dir) and the
# family reuses it. Deterministic build → observation-free memo.
_TRADE_SHARED: dict = {}


def _trade_pairs(spark, sf_dir, namespaced: bool = True):
    """Distinct pairs of the sparsified trade graph — namespaced
    (cust_node, supp_node) or raw bipartite (c, s) keys —
    localCheckpoint'ed + memoized so multi-reference consumers (and
    repeat queries) don't re-execute the lineitem⋈orders build."""
    key = (
        spark.sparkContext.applicationId, sf_dir, "pairs", namespaced,
    )
    if key not in _TRADE_SHARED:
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_quantity"
        )
        od = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        joined = li.where(F.col("l_quantity") >= _MIN_QTY).join(
            od, li.l_orderkey == od.o_orderkey
        )
        if namespaced:
            cols = [
                (F.col("o_custkey") * 2).alias("cust_node"),
                (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
            ]
        else:
            cols = [
                F.col("o_custkey").alias("c"),
                F.col("l_suppkey").alias("s"),
            ]
        _TRADE_SHARED[key] = (
            joined.select(*cols).distinct().localCheckpoint(eager=False)
        )
    return _TRADE_SHARED[key]


def _trade_edges(spark, sf_dir):
    """Symmetric directed edge list over `_trade_pairs` (both
    directions), localCheckpoint'ed + memoized for loop consumers."""
    key = (spark.sparkContext.applicationId, sf_dir, "edges")
    if key not in _TRADE_SHARED:
        pairs = _trade_pairs(spark, sf_dir)
        _TRADE_SHARED[key] = (
            pairs.select(
                F.col("cust_node").alias("src"),
                F.col("supp_node").alias("dst"),
            )
            .unionByName(
                pairs.select(
                    F.col("supp_node").alias("src"),
                    F.col("cust_node").alias("dst"),
                )
            )
            .localCheckpoint(eager=False)
        )
    return _TRADE_SHARED[key]


# ------------------------------------------------------------------ #
# g_components_fixed — fixed-round min-label connected components
# ------------------------------------------------------------------ #
def _cc_oracle(rounds: int = _ROUNDS) -> str:
    ctes = []
    for r in range(1, rounds + 1):
        prev = f"lab{r - 1}"
        ctes.append(
            f"""
lab{r} AS (
  SELECT node, min(label) AS label FROM (
    SELECT node, label FROM {prev}
    UNION ALL
    SELECT e.dst AS node, p.label
    FROM edges e JOIN {prev} p ON p.node = e.src
  ) u GROUP BY node
)"""
        )
    return f"""
WITH {_EDGES_SQL},
nodes AS (SELECT DISTINCT src AS node FROM edges),
lab0 AS (SELECT node, node AS label FROM nodes),
{",".join(ctes)}
SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
FROM lab{rounds}
"""


@query("g_components_fixed", _cc_oracle())
def g_components_fixed(spark, sf_dir):
    """Min-label propagation, _ROUNDS rounds: label(v) = min node id
    within R hops of v (= the component id once R ≥ diameter).

    Scale shape: R × (edge-join + min-agg), both shuffling on the node
    key — the classic hash-min CC; production runs use the large-star /
    small-star contraction (Kiveris et al. 2014) to cut R to
    O(log log n), but each round's plan is exactly this one. Labels
    never grow: state is one row per node per round. The keep-own-
    label half of each round rides as a SELF-LOOP row per node in the
    checkpointed edge table (min over in-neighbors ∪ self ≡ min over
    prev ∪ propagate, the oracle's spelling), so every round
    references the previous state exactly ONCE — no per-round
    localCheckpoint (each one compiles a physical plan eagerly and
    materializes blocks; the g_pagerank_fixed lesson) and the plan
    stays linear in R.
    """
    edges = _trade_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    looped = edges.unionByName(
        nodes.select(F.col("node").alias("src"), F.col("node").alias("dst"))
    ).localCheckpoint(eager=False)
    lab = nodes.select("node", F.col("node").alias("label"))
    for _ in range(_ROUNDS):
        lab = (
            looped.join(lab, looped.src == lab.node)
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
    return lab.select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
    )


# ------------------------------------------------------------------ #
# g_label_prop — synchronous label propagation communities
# ------------------------------------------------------------------ #
def _lpa_oracle(rounds: int = _LPA_ROUNDS) -> str:
    ctes = []
    for r in range(1, rounds + 1):
        prev = f"lp{r - 1}"
        ctes.append(
            f"""
lp{r} AS (
  SELECT node, label FROM (
    SELECT e.dst AS node, p.label, count(*) AS c,
           row_number() OVER (
             PARTITION BY e.dst ORDER BY count(*) DESC, p.label) AS rn
    FROM edges e JOIN {prev} p ON p.node = e.src
    GROUP BY e.dst, p.label
  ) t WHERE rn = 1
)"""
        )
    return f"""
WITH {_EDGES_SQL},
lp0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
{",".join(ctes)}
SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
FROM lp{rounds}
"""


@query("g_label_prop", _lpa_oracle())
def g_label_prop(spark, sf_dir):
    """Synchronous label propagation (Raghavan et al. 2007,
    arXiv:0709.2938), _LPA_ROUNDS fixed rounds: each node adopts its
    neighborhood's most frequent label, ties broken by smallest label
    — deterministic, so the fixed-round state is SQL-expressible and
    the oracle unrolls the same sweeps. Complements g_components_fixed
    (min-label CC): LPA converges to dense communities, not connected
    components.

    Scale shape: per round one edge-label join + one (node, label)
    count + one per-node argmax — two shuffles on the node key; state
    is one row per node, referenced exactly ONCE per round, so the
    rounds chain as plain lineage (no per-round localCheckpoint —
    each would eagerly compile a physical plan and materialize
    blocks; the g_pagerank_fixed lesson) and the plan stays linear
    in the round count.
    """
    edges = _trade_edges(spark, sf_dir)
    lab = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            edges.join(lab, edges.src == lab.node)
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        lab = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("c").alias("c"),
                        (-F.col("label")).alias("neg"),
                    )
                ).alias("b")
            )
            .select("node", (-F.col("b.neg")).alias("label"))
        )
    return lab.select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
    )


# ------------------------------------------------------------------ #
# g_link_prediction — common-neighbor / Jaccard link scores
# ------------------------------------------------------------------ #
_LP_HUB_DEG_CAP = 1000

LINKPRED_ORACLE = f"""
WITH {_BIPAIRS_SQL},
deg AS (SELECT c, count(*) AS d FROM pairs GROUP BY c),
sdeg AS (SELECT s, count(*) AS d FROM pairs GROUP BY s),
wedge AS (
  SELECT a.c AS ca, b.c AS cb, count(*) AS n_common
  FROM pairs a JOIN pairs b ON a.s = b.s AND a.c < b.c
  JOIN sdeg ON sdeg.s = a.s
  WHERE sdeg.d <= {_LP_HUB_DEG_CAP}
  GROUP BY a.c, b.c
),
scored AS (
  SELECT w.ca, w.cb, w.n_common,
         round(CAST(w.n_common AS DOUBLE)
               / CAST(da.d + db.d - w.n_common AS DOUBLE), 6) AS jaccard
  FROM wedge w
  JOIN deg da ON da.c = w.ca
  JOIN deg db ON db.c = w.cb
)
SELECT CAST(ca AS BIGINT) AS node_a, CAST(cb AS BIGINT) AS node_b,
       CAST(n_common AS BIGINT) AS n_common, jaccard
FROM scored
ORDER BY jaccard DESC, ca, cb
LIMIT {_LP_TOPK}
"""


@query("g_link_prediction", LINKPRED_ORACLE)
def g_link_prediction(spark, sf_dir):
    """Jaccard link prediction on the bipartite trade graph: score
    customer pairs by the Jaccard of their supplier neighborhoods
    (Liben-Nowell & Kleinberg 2003), top-20 deterministically.

    Scale shape: the wedge self-join is keyed on the shared supplier,
    so work is Σ deg(s)² over suppliers. That sum is only bounded if
    no single supplier is a super-hub, so suppliers above
    ``_LP_HUB_DEG_CAP`` are EXCLUDED from wedge generation (degrees in
    the Jaccard denominator still count them): a hub touching f·N
    customers contributes (f·N)²/2 pairs of near-zero evidence — the
    same reason Adamic-Adar weights common neighbors by 1/log(deg)
    and the dedup family caps shingle postings. The cap never binds
    on the registered corpus (max supplier degree 55 at sf0.1, judged
    hash-identical with and without); the measured hub stress
    (`scripts/scale_check.py graphskew`, README) shows it is the
    difference between flat and 12× wall under a planted 20%-of-
    orders hub. Pairs checkpointed (three consumers); degrees
    broadcast; jaccard is one double division of exact integers.
    """
    pairs = _trade_pairs(spark, sf_dir, namespaced=False)
    deg = pairs.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    keep_s = (
        pairs.groupBy("s")
        .agg(F.count(F.lit(1)).alias("sd"))
        .where(F.col("sd") <= _LP_HUB_DEG_CAP)
        .select("s")
    )
    capped = pairs.join(F.broadcast(keep_s), "s", "left_semi")
    a = capped.select(F.col("c").alias("ca"), "s")
    b = capped.select(F.col("c").alias("cb"), "s")
    wedge = (
        a.join(b, (a.s == b.s) & (F.col("ca") < F.col("cb")))
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    scored = (
        wedge.join(
            F.broadcast(
                deg.select(F.col("c").alias("ca"), F.col("d").alias("da"))
            ),
            "ca",
        )
        .join(
            F.broadcast(
                deg.select(F.col("c").alias("cb"), F.col("d").alias("db"))
            ),
            "cb",
        )
        .select(
            F.col("ca").cast("long").alias("node_a"),
            F.col("cb").cast("long").alias("node_b"),
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("da") + F.col("db") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.desc("jaccard"), F.asc("node_a"), F.asc("node_b")
    ).limit(_LP_TOPK)


# ------------------------------------------------------------------ #
# g_degree_assortativity — degree-degree Pearson correlation
# ------------------------------------------------------------------ #
ASSORT_ORACLE = f"""
WITH {_EDGES_SQL},
deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
de AS (
  SELECT ds.d AS x, dd.d AS y
  FROM edges e
  JOIN deg ds ON ds.node = e.src
  JOIN deg dd ON dd.node = e.dst
),
agg AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM de
)
SELECT CAST(n AS BIGINT) AS n_edges,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6)
         AS assortativity
FROM agg
"""


@query("g_degree_assortativity", ASSORT_ORACLE)
def g_degree_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002, PRL 89:208701): the Pearson
    correlation of endpoint degrees over the directed edge list (both
    directions, so the statistic is symmetric). Negative values =
    hubs attach to leaves (disassortative), the typical bipartite
    trade-graph signature.

    Scale shape: the checkpointed edge list feeds one degree count +
    two node-keyed joins back + ONE global moment aggregation — all
    moments are exact BIGINTs, with one double division + sqrt at the
    end.
    """
    edges = _trade_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    de = (
        edges.join(
            deg.select(F.col("src").alias("node"), F.col("d").alias("x")),
            edges.src == F.col("node"),
        )
        .drop("node")
        .join(
            deg.select(F.col("src").alias("node"), F.col("d").alias("y")),
            F.col("dst") == F.col("node"),
        )
        .select("x", "y")
    )
    agg = de.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_edges"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (
                    F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
                ).cast("double")
                * (
                    F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
                ).cast("double")
            ),
            6,
        ).alias("assortativity"),
    )
