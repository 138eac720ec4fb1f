"""Second relational wave — more TPC-H-shaped plans exercising
selective scans with pushdown, distinct aggregation, HAVING, and
ratio-of-sums, all decimal-exact for the oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import dec, dsum, table


# --------------------------------------------------------------------
# TPC-H Q6 shape: highly selective scan + single agg — the pushdown
# showcase (predicates reach the parquet scan).
# --------------------------------------------------------------------
Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", Q6_ORACLE)
def q6_forecast_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer, top 20.
# --------------------------------------------------------------------
Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       c.c_acctbal
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_revenue", Q10_ORACLE)
def q10_returned_revenue(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------
# TPC-H Q14 shape: ratio of conditional sum to total (promo share).
# --------------------------------------------------------------------
Q14_ORACLE = """
SELECT round(
  100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
        THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
        / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
  6) AS promo_share_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
"""


@query("q14_promo_share", Q14_ORACLE)
def q14_promo_share(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", revenue))
            .cast("double")
            / F.sum(revenue).cast("double"),
            6,
        ).alias("promo_share_pct")
    )


# --------------------------------------------------------------------
# TPC-H Q16 shape: distinct-count aggregation with an anti-ish filter.
# --------------------------------------------------------------------
Q16_ORACLE = """
SELECT p.p_brand, p.p_type,
       count(DISTINCT l.l_suppkey) AS supplier_cnt,
       count(*) AS line_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size >= 20
GROUP BY p.p_brand, p.p_type
"""


@query("q16_supplier_counts", Q16_ORACLE)
def q16_supplier_counts(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(part.where(F.col("p_size") >= 20)),
            li.l_partkey == part.p_partkey,
        )
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q18 shape: HAVING on a grouped sum (large orders).
# --------------------------------------------------------------------
Q18_ORACLE = """
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 250
"""


@query("q18_large_orders", Q18_ORACLE)
def q18_large_orders(spark, sf_dir):
    # Aggregate lineitem by orderkey BEFORE touching orders: the
    # HAVING filter leaves a handful of keys, so the orders join is a
    # broadcast of the aggregate instead of a fact-vs-fact shuffle.
    # (o_orderkey is unique in orders, so grouping after the join by
    # the orders columns is equivalent to grouping lineitem alone.)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("__sum_dec"))
        .where(F.col("__sum_dec") > 250)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("__sum_dec").cast("double").alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS decorrelated to a left-semi join — orders in
# a quarter with at least one deep-discount line, counted by priority.
# --------------------------------------------------------------------
Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
  )
GROUP BY o_orderpriority
"""


@query("q4_priority_with_discount", Q4_ORACLE)
def q4_priority_with_discount(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    disc = table(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.05)
    hit = orders.join(
        disc, orders.o_orderkey == disc.l_orderkey, "left_semi"
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# --------------------------------------------------------------------
# TPC-H Q12 shape: conditional (CASE) aggregation — late-year
# shipments per linestatus split into urgent / non-urgent order counts.
# --------------------------------------------------------------------
Q12_ORACLE = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY l.l_linestatus
"""


@query("q12_priority_shipments", Q12_ORACLE)
def q12_priority_shipments(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= "1995-01-01"
    )
    orders = table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-clause predicate over a
# part-lineitem join — each OR-block combines brand, size, and
# quantity bounds (predicate simplification + broadcast join).
# --------------------------------------------------------------------
Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS n_rows
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 50)
"""


@query("q19_discounted_revenue", Q19_ORACLE)
def q19_discounted_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    blk = lambda b, s0, s1, q0, q1: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(s0, s1)
        & F.col("l_quantity").between(q0, q1)
    )
    cond = (
        blk("Brand#1", 1, 15, 1, 20)
        | blk("Brand#2", 10, 30, 10, 35)
        | blk("Brand#3", 20, 50, 20, 50)
    )
    return j.where(cond).agg(
        F.sum(
            dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )
