"""Relational operator suite — scans, joins, aggregations, set ops.

Maps the reference's relational surface (SURVEY.md §2.2/§2.3/§2.6 —
metadata equi-joins J1/J7, semi/anti membership J5/O4, union O3, dedup
O2, incremental keep-latest O7, grouped roll-ups A6) onto the driver's
TPC-H-ish tables, expressed as declarative DataFrame plans so Catalyst
supplies pushdown, pruning, and join selection.

Scale notes (100 TB): every query here joins a large fact against
small dimensions — the dimensions are broadcast (explicit
``F.broadcast``) so the fact table never shuffles for the join; the
aggregations are partial-aggregated map-side by Catalyst before the
single shuffle on the grouping key.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from .common import davg, dec, dsum, table


# --------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (grouped agg roll-up, A6).
# Reference analog: flag-rate roll-up tables
# scripts/3_qaqc_data/qaqc_generate_flag_rates.py:96-231 (grouped sums
# over the whole corpus).
# --------------------------------------------------------------------
Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))
           * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 6) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice), 6) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", Q1_ORACLE)
def q1_pricing_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------
# J1: fact ⋈ broadcast dimension enrichment (station-metadata join,
# reference: QAQC_pipeline.py:1015-1024, ASOSAWOS_clean.py:110-116).
# --------------------------------------------------------------------
J1_ORACLE = """
SELECT
  c.c_mktsegment,
  o.o_orderpriority,
  count(*) AS n_orders,
  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment, o.o_orderpriority
"""


@query("j1_dim_enrich", J1_ORACLE)
def j1_dim_enrich(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_totalprice"),
        )
    )


# --------------------------------------------------------------------
# Multi-way join with broadcast dims (TPC-H Q5 shape).
# --------------------------------------------------------------------
Q5_ORACLE = """
SELECT
  n.n_name,
  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY n.n_name
"""


@query("q5_regional_revenue", Q5_ORACLE)
def q5_regional_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------
# TPC-H Q3 shape: selective join + grouped agg + deterministic top-k.
# --------------------------------------------------------------------
Q3_ORACLE = """
SELECT
  l.l_orderkey,
  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", Q3_ORACLE)
def q3_shipping_priority(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.where(F.col("l_shipdate") > cutoff)
        .join(
            orders.where(F.col("o_orderdate") < cutoff),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------
# J5: semi-join membership ("rows whose key is in a computed set" —
# reference uses df.time.isin(bad_times), qaqc_buoy_check.py:87-89).
# --------------------------------------------------------------------
J5_ORACLE = """
SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
"""


@query("j5_semi_membership", J5_ORACLE)
def j5_semi_membership(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


# --------------------------------------------------------------------
# O4: anti-join ("~isin" overlap exclusion,
# qaqc_concatenate_stations.py:233-234).
# --------------------------------------------------------------------
O4_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
"""


@query("o4_anti_membership", O4_ORACLE)
def o4_anti_membership(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    finished = orders.where(F.col("o_orderstatus") == "F")
    return cust.join(
        finished, cust.c_custkey == finished.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


# --------------------------------------------------------------------
# O2: dedup to one row per key, deterministic keep-first-by-time
# (reference: df[~df.index.duplicated()] after sort,
# QAQC_pipeline.py:487,982).
# --------------------------------------------------------------------
O2_ORACLE = """
SELECT user_id, event_type, ts, value
FROM (
  SELECT user_id, event_type, ts, value,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts, event_id
         ) AS rn
  FROM events
) WHERE rn = 1
"""


@query("o2_dedup_first", O2_ORACLE)
def o2_dedup_first(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "value")
    )


# --------------------------------------------------------------------
# O7: incremental keep-newest per key (update_pull.py:58-95 +
# qaqc_concatenate_stations.py:206-239 keep-newer semantics).
# --------------------------------------------------------------------
O7_ORACLE = """
SELECT user_id, ts AS last_ts, event_type AS last_type, value AS last_value
FROM (
  SELECT user_id, ts, event_type, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
"""


@query("o7_keep_latest", O7_ORACLE)
def o7_keep_latest(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("user_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


# --------------------------------------------------------------------
# O3: union-by-name + distinct (pd.concat folds,
# qaqc_concatenate_stations.py:237).
# --------------------------------------------------------------------
O3_ORACLE = """
SELECT DISTINCT key, name FROM (
  SELECT c_custkey AS key, c_name AS name FROM customer
  UNION ALL
  SELECT s_suppkey AS key, s_name AS name FROM supplier
)
"""


@query("o3_union_distinct", O3_ORACLE)
def o3_union_distinct(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name")
    )
    return cust.unionByName(supp).distinct()


# --------------------------------------------------------------------
# Top-k per group (first/min_by idiom O6; window ranking).
# --------------------------------------------------------------------
TOPK_ORACLE = """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal, rk
FROM (
  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
         row_number() OVER (
           PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
         ) AS rk
  FROM customer
) WHERE rk <= 3
"""


@query("topk_per_group", TOPK_ORACLE)
def topk_per_group(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rk")
    )


# --------------------------------------------------------------------
# Pivot (wide flag-count report shape, merge_eraqc_counts.py:22-157).
# Oracle via conditional aggregation.
# --------------------------------------------------------------------
PIVOT_ORACLE = """
SELECT
  l_returnflag,
  CAST(sum(CASE WHEN l_linestatus = 'O'
       THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
  CAST(sum(CASE WHEN l_linestatus = 'F'
       THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
FROM lineitem
GROUP BY l_returnflag
"""


@query("pivot_linestatus", PIVOT_ORACLE)
def pivot_linestatus(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(
                F.when(F.col("l_linestatus") == "O", dec("l_quantity"))
            )
            .cast("double")
            .alias("qty_O"),
            F.sum(
                F.when(F.col("l_linestatus") == "F", dec("l_quantity"))
            )
            .cast("double")
            .alias("qty_F"),
        )
    )


# --------------------------------------------------------------------
# A6: value-counts roll-up with ROLLUP grouping sets (station →
# network → total roll-ups, qaqc_success_report_tables.py:150-311).
# --------------------------------------------------------------------
ROLLUP_ORACLE = """
SELECT event_type, CAST(user_id AS VARCHAR) AS user_bucket, count(*) AS n
FROM events
GROUP BY ROLLUP(event_type, CAST(user_id AS VARCHAR))
"""


@query("a6_rollup_counts", ROLLUP_ORACLE)
def a6_rollup_counts(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", F.col("user_id").cast("string"))
        .rollup("event_type", "user_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
