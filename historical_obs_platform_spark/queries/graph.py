"""Graph analytics done Spark-first: a fixed-iteration PageRank in
integer fixed-point arithmetic over the customer↔supplier trade graph.

Iterative algorithms are usually written off as "not SQL-expressible";
with a FIXED iteration count they are — each Jacobi sweep is one
shuffle on the destination key, and the oracle unrolls the same three
sweeps as chained CTEs. All rank mass lives in BIGINT parts-per-billion
with floor division, so every engine computes bit-identical ranks (no
float sum-order divergence across 3 rounds of per-node summation).

The dedup components operator (operators/dedup.connected_components)
is the other iterative-graph op in the repo; this one exercises the
weighted-propagation shape (contributions divided by out-degree) that
ranking/centrality pipelines need.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import table

_D_NUM, _D_DEN = 85, 100  # damping 0.85 as a ratio
_SCALE = 1_000_000_000  # ranks in parts-per-billion
_ITERS = 3


def _edges(spark, sf_dir):
    """Distinct customer↔supplier trade edges, both directions, with
    namespaced node ids (customers even: 2k, suppliers odd: 2k+1) so
    the two key spaces can't collide."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    fwd = pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    )
    rev = pairs.select(
        F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
    )
    return fwd.unionByName(rev)


PAGERANK_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS cust_node,
                  l.l_suppkey * 2 + 1 AS supp_node
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT cust_node AS src, supp_node AS dst FROM pairs
  UNION ALL
  SELECT supp_node AS src, cust_node AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (
  SELECT node, CAST({_SCALE} // n AS BIGINT) AS rank FROM nodes, nn
),
r1 AS (
  SELECT n.node,
         CAST((15 * ({_SCALE} // nn.n)) // 100
              + ({_D_NUM} * coalesce(sum(c.contrib), 0)) // {_D_DEN}
              AS BIGINT) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst, r.rank // d.outdeg AS contrib
    FROM edges e JOIN r0 r ON r.node = e.src
    JOIN deg d ON d.src = e.src
  ) c ON c.dst = n.node
  GROUP BY n.node, nn.n
),
r2 AS (
  SELECT n.node,
         CAST((15 * ({_SCALE} // nn.n)) // 100
              + ({_D_NUM} * coalesce(sum(c.contrib), 0)) // {_D_DEN}
              AS BIGINT) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst, r.rank // d.outdeg AS contrib
    FROM edges e JOIN r1 r ON r.node = e.src
    JOIN deg d ON d.src = e.src
  ) c ON c.dst = n.node
  GROUP BY n.node, nn.n
),
r3 AS (
  SELECT n.node,
         CAST((15 * ({_SCALE} // nn.n)) // 100
              + ({_D_NUM} * coalesce(sum(c.contrib), 0)) // {_D_DEN}
              AS BIGINT) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst, r.rank // d.outdeg AS contrib
    FROM edges e JOIN r2 r ON r.node = e.src
    JOIN deg d ON d.src = e.src
  ) c ON c.dst = n.node
  GROUP BY n.node, nn.n
)
SELECT node, rank AS rank_ppb,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type
FROM r3
"""


@query("g_pagerank_fixed", PAGERANK_ORACLE)
def g_pagerank_fixed(spark, sf_dir):
    """3-sweep damped PageRank, BIGINT parts-per-billion.

    Plan shape at 100 TB: the edge list is built once (one join +
    distinct), degrees ride along as a broadcast-able aggregate; each
    sweep is contrib = rank div outdeg mapped over edges, then ONE
    shuffle on dst to re-aggregate — iteration count × one exchange,
    no quadratic closure, no driver collect. localCheckpoint truncates
    the growing lineage exactly like connected_components does.
    """
    edges = _edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))
    # teleport term, identical floor arithmetic to the oracle
    base = F.expr(f"(15 * ({_SCALE} div n)) div 100")
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.expr(f"{_SCALE} div n").cast("long").alias("rank")
    )
    ed = edges.join(deg, "src")
    for _ in range(_ITERS):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                "dst", F.expr("rank div outdeg").alias("contrib")
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (
                    base
                    + F.expr(
                        f"({_D_NUM} * coalesce(s, 0)) div {_D_DEN}"
                    )
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "node",
        F.col("rank").alias("rank_ppb"),
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
    )
