"""Third relational wave — the remaining TPC-H query shapes, adapted
to the driver schema (which has no ``partsupp``: the part-supplier
bridge is derived from ``lineitem``). Each query exercises a distinct
planner shape the first two waves didn't:

- correlated scalar subqueries decorrelated to window-min / agg-join
  (Q2, Q15, Q17)
- global-scalar HAVING (Q11)
- left-outer join + double aggregation (Q13)
- multi-way nation joins with disjunctive pair predicates (Q7, Q8, Q9)
- nested semi-join chains (Q20)
- EXISTS + NOT EXISTS on the same fact table (Q21)
- anti-join against facts with a scalar-subquery predicate (Q22)
- ROLLUP / CUBE grouping sets
- time-range window frames (rolling 24 h sum)

All aggregates follow the decimal-exact oracle rules in ``common.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from .common import dec, dsum, table


# --------------------------------------------------------------------
# TPC-H Q2 shape: min-cost supplier per part. The correlated scalar
# subquery (min cost over suppliers of the part in the region)
# decorrelates to a window-min over the partition — no self-join.
# --------------------------------------------------------------------
Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), j AS (
  SELECT p.p_partkey, p.p_type, eu.s_suppkey, eu.s_name, eu.s_acctbal,
         eu.n_name, ps.cost,
         min(ps.cost) OVER (PARTITION BY p.p_partkey) AS min_cost
  FROM ps
  JOIN eu ON ps.l_suppkey = eu.s_suppkey
  JOIN part p ON ps.l_partkey = p.p_partkey
  WHERE p.p_size BETWEEN 10 AND 12 AND p.p_type = 'STANDARD'
)
SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
       round(cost, 6) AS unit_cost
FROM j WHERE cost = min_cost
"""


@query("q2_min_cost_supplier", Q2_ORACLE)
def q2_min_cost_supplier(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    part = table(spark, sf_dir, "part")

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eu = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(
            F.broadcast(reg.where(F.col("r_name") == "EUROPE")),
            nat.n_regionkey == reg.r_regionkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pf = part.where(
        F.col("p_size").between(10, 12) & (F.col("p_type") == "STANDARD")
    )
    j = ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey).join(
        F.broadcast(pf), ps.l_partkey == pf.p_partkey
    )
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("min_cost", F.min("cost").over(w))
        .where(F.col("cost") == F.col("min_cost"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            "n_name",
            F.round("cost", 6).alias("unit_cost"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between two nations, both
# directions, by year — two nation joins with a disjunctive pair
# predicate.
# --------------------------------------------------------------------
Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""


@query("q7_volume_shipping", Q7_ORACLE)
def q7_volume_shipping(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    sup = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")

    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------
# TPC-H Q8 shape: market share of one supplier-nation within a
# customer region, per year — ratio of conditional decimal sums.
# --------------------------------------------------------------------
Q8_ORACLE = """
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       round(
         CAST(COALESCE(sum(CASE WHEN n1.n_name = 'NATION_3'
               THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))) END), 0)
              AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
JOIN region r   ON n2.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
GROUP BY year(o.o_orderdate)
"""


@query("q8_market_share", Q8_ORACLE)
def q8_market_share(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    sup = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")

    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    amer = (
        cust.join(
            F.broadcast(
                nat.select("n_nationkey", "n_regionkey")
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(reg.where(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == reg.r_regionkey,
        )
        .select("c_custkey")
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", revenue)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(part.where(F.col("p_type") == "ECONOMY")),
            li.l_partkey == part.p_partkey,
        )
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(amer), orders.o_custkey == amer.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.coalesce(F.sum(nation_rev), F.lit(0)).cast("double")
                / F.sum(revenue).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------
# TPC-H Q9 shape: profit by supplier nation and year. No
# ps_supplycost in this schema — p_retailprice * quantity stands in as
# the cost term (same expression shape: sum of a two-product decimal
# difference).
# --------------------------------------------------------------------
Q9_ORACLE = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
              - CAST(p.p_retailprice AS DECIMAL(18,2))
                * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_profit
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


@query("q9_product_profit", Q9_ORACLE)
def q9_product_profit(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")

    profit = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(part.where(F.col("p_name").like("%red%"))),
            li.l_partkey == part.p_partkey,
        )
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------
# TPC-H Q11 shape: value concentration — grouped sum filtered by a
# global-scalar threshold (HAVING sum > frac * total). The scalar is
# an agg broadcast-crossed back, not a collect().
# --------------------------------------------------------------------
Q11_ORACLE = """
WITH v AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name IN ('NATION_0', 'NATION_5')
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM v
WHERE CAST(val AS DOUBLE) > 0.002 * (SELECT CAST(sum(val) AS DOUBLE) FROM v)
"""


@query("q11_value_concentration", Q11_ORACLE)
def q11_value_concentration(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")

    nkeys = nat.where(F.col("n_name").isin("NATION_0", "NATION_5"))
    v = (
        li.join(
            F.broadcast(
                sup.join(
                    F.broadcast(nkeys), sup.s_nationkey == nkeys.n_nationkey
                ).select("s_suppkey")
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("val"))
    )
    total = v.agg(F.sum("val").cast("double").alias("total"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(F.col("val").cast("double") > 0.002 * F.col("total"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution — left outer
# join (zero-order customers kept) then a second aggregation over the
# first's result (count of counts).
# --------------------------------------------------------------------
Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
"""


@query("q13_order_count_distribution", Q13_ORACLE)
def q13_order_count_distribution(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------
# TPC-H Q15 shape: top supplier — grouped revenue equal to the global
# max (scalar subquery -> agg + broadcast cross join; decimal sums
# make the equality exact on both engines).
# --------------------------------------------------------------------
Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total AS DOUBLE) AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total = (SELECT max(total) FROM rev)
"""


@query("q15_top_supplier", Q15_ORACLE)
def q15_top_supplier(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).alias("total"))
    )
    mx = rev.agg(F.max("total").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total") == F.col("mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue")
        )
    )


# --------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity lines — per-part correlated AVG
# subquery decorrelated to a grouped agg joined back.
# --------------------------------------------------------------------
Q17_ORACLE = """
WITH pa AS (
  SELECT l_partkey,
         0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / count(l_quantity)) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1' AND l.l_quantity < pa.qty_threshold
"""


@query("q17_small_quantity_revenue", Q17_ORACLE)
def q17_small_quantity_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.lit(0.5)
            * (
                F.sum(dec("l_quantity")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("qty_threshold")
    )
    return (
        li.join(
            F.broadcast(part.where(F.col("p_brand") == "Brand#1")),
            li.l_partkey == part.p_partkey,
        )
        .join(pa, li.l_partkey == pa.pa_partkey)
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q20 shape: nested semi-join chain — suppliers in a nation who
# shipped a meaningful quantity of a named part family in one year.
# --------------------------------------------------------------------
Q20_ORACLE = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_4'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN
          (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 40
  )
"""


@query("q20_part_shippers", Q20_ORACLE)
def q20_part_shippers(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")

    blue = part.where(F.col("p_name").like("%blue%")).select("p_partkey")
    shippers = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(blue), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    n4 = nat.where(F.col("n_name") == "NATION_4")
    return (
        sup.join(F.broadcast(n4), sup.s_nationkey == n4.n_nationkey, "left_semi")
        .join(F.broadcast(shippers), sup.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# --------------------------------------------------------------------
# TPC-H Q21 shape: EXISTS + NOT EXISTS on the same fact table — the
# sole supplier whose line was returned in a multi-supplier order.
# --------------------------------------------------------------------
Q21_ORACLE = """
SELECT s.s_suppkey, s.s_name,
       count(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_suppkey, s.s_name
"""


@query("q21_sole_returner", Q21_ORACLE)
def q21_sole_returner(spark, sf_dir):
    # The EXISTS / NOT EXISTS pair decorrelates to per-order counts:
    # an order qualifies iff it has >1 distinct suppliers and exactly
    # one distinct supplier with an 'R' line — and that supplier (the
    # max over a one-element set) is the one charged. One shuffle on
    # l_orderkey + one on l_suppkey replaces two distinct() passes
    # plus a semi and an anti join over the fact table.
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")

    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    stats = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum("has_r").alias("nrs"),
        F.max(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias(
            "l_suppkey"
        ),
    )
    sole = stats.where((F.col("ns") > 1) & (F.col("nrs") == 1))
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count("l_orderkey").alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )


# --------------------------------------------------------------------
# TPC-H Q22 shape: dormant high-balance customers — scalar AVG
# subquery in the predicate + anti join against the fact table.
# --------------------------------------------------------------------
Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         / count(c_acctbal) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment,
       count(*) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT a FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
"""


@query("q22_dormant_customers", Q22_ORACLE)
def q22_dormant_customers(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")
        ).alias("a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(
            orders.where(F.col("o_orderpriority") == "1-URGENT"),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------
# ROLLUP grouping sets: revenue at (flag, status), (flag), and ()
# levels in one pass — partial-agg friendly, NULL levels made explicit
# with sentinel values so the hash is unambiguous.
# --------------------------------------------------------------------
ROLLUP_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_revenue_levels", ROLLUP_ORACLE)
def rollup_revenue_levels(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_extendedprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_rows",
        )
    )


# --------------------------------------------------------------------
# CUBE grouping sets: order counts across every (year, priority)
# combination including both marginals.
# --------------------------------------------------------------------
CUBE_ORACLE = """
SELECT COALESCE(CAST(year(o_orderdate) AS INTEGER), -1) AS o_year,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY CUBE (year(o_orderdate), o_orderpriority)
"""


@query("cube_order_stats", CUBE_ORACLE)
def cube_order_stats(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    return (
        orders.cube("o_year", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce("o_year", F.lit(-1)).alias("o_year"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


# --------------------------------------------------------------------
# Time-range window frame: rolling 24 h sum/count per user over the
# events stream (RANGE frame on floor-epoch seconds — ties share the
# frame, so the result is order-insensitive and exact in decimal).
# --------------------------------------------------------------------
ROLLING_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS rolling_sum_24h,
       CAST(count(*) OVER w AS BIGINT) AS rolling_n_24h
FROM events
WINDOW w AS (
  PARTITION BY user_id
  ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
  RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
)
"""


@query("w_rolling_24h", ROLLING_ORACLE)
def w_rolling_24h(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-86400, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(dec("value")).over(w).cast("double").alias("rolling_sum_24h"),
        F.count(F.lit(1)).over(w).alias("rolling_n_24h"),
    )


# --------------------------------------------------------------------
# O8 (beyond the reference): incremental rollup maintenance — the
# streaming-adjacent batch pattern for keeping a 100 TB daily rollup
# fresh without recomputing it. The base rollup (history) and the
# delta rollup (new arrivals) are merged by RE-AGGREGATING the partial
# states: counts sum, and sums stay exact because they are decimal —
# the merge is associative, so incremental == full recompute by
# construction, and the oracle IS the full recompute. At scale the
# base rollup is ~days×stations rows (tiny vs the fact table): the
# delta is the only data scanned twice.
# --------------------------------------------------------------------
O8_ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS station,
       strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*) AS n_obs,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("o8_incremental_rollup", O8_ORACLE)
def o8_incremental_rollup(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("station"),
        F.col("ts"),
        F.col("value"),
    )
    cutoff = "2024-01-24"

    def rollup(df):
        # ISO-string day key (determinism rule: DuckDB DATE vs Spark
        # TIMESTAMP under date_trunc splits a strict comparator).
        return df.groupBy(
            "station", F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(dec("value")).alias("__dsum"),
        )

    base = rollup(ev.where(F.col("ts") < F.lit(cutoff).cast("timestamp")))
    delta = rollup(ev.where(F.col("ts") >= F.lit(cutoff).cast("timestamp")))
    merged = (
        base.unionByName(delta)
        .groupBy("station", "day")
        .agg(
            F.sum("n_obs").alias("n_obs"),
            F.sum("__dsum").cast("double").alias("sum_value"),
        )
    )
    return merged


# --------------------------------------------------------------------
# Unpivot (melt): the wide per-user event-type count matrix back to
# long form via DataFrame.unpivot — the inverse of pivot_linestatus.
# Oracle: UNION ALL over the same conditional counts.
# --------------------------------------------------------------------
UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT user_id,
         count(*) FILTER (WHERE event_type = 'click') AS n_click,
         count(*) FILTER (WHERE event_type = 'view') AS n_view,
         count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
  FROM events GROUP BY user_id
)
SELECT user_id, 'n_click' AS metric, n_click AS n FROM wide
UNION ALL
SELECT user_id, 'n_view', n_view FROM wide
UNION ALL
SELECT user_id, 'n_purchase', n_purchase FROM wide
"""


@query("unpivot_event_counts", UNPIVOT_ORACLE)
def unpivot_event_counts(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in ("click", "view", "purchase")
        ]
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["n_click", "n_view", "n_purchase"],
        variableColumnName="metric",
        valueColumnName="n",
    )


# --------------------------------------------------------------------
# Z-order (Morton) clustering key — the multi-dimension data-layout
# primitive (Delta/Iceberg OPTIMIZE ZORDER): bit-interleave two
# dimension keys so row-group min/max stats prune scans on either.
# Key is pure integer arithmetic; oracle recomputes it bit-for-bit.
# --------------------------------------------------------------------
def _zorder_oracle(bits: int = 8) -> str:
    parts = []
    for i in range(bits):
        parts.append(f"(((a >> {i}) & 1) << {2 * i})")
        parts.append(f"(((b >> {i}) & 1) << {2 * i + 1})")
    expr = " | ".join(parts)
    return f"""
WITH d AS (
  SELECT event_id, user_id % 256 AS a,
         CAST(floor(value) AS BIGINT) % 256 AS b
  FROM events
)
SELECT event_id, a, b, {expr} AS zkey FROM d
"""


@query("p_zorder_key", _zorder_oracle())
def p_zorder_key(spark, sf_dir):
    from ..operators.layout import zorder_key

    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("a"),
        (F.floor("value").cast("long") % 256).alias("b"),
    )
    return d.withColumn("zkey", zorder_key(F.col("a"), F.col("b"), bits=8))


# --------------------------------------------------------------------
# Snapshot diff (CDC): row-level changes between two table versions —
# the incremental-pipeline primitive behind Delta CDF / MERGE
# planning. Full-outer join on the key; one shuffle, AQE-skew-safe.
# --------------------------------------------------------------------
O10_ORACLE = """
WITH v_old AS (
  SELECT event_id, value FROM events WHERE event_id % 10 <> 0
), v_new AS (
  SELECT event_id,
         value + CASE WHEN event_id % 13 = 0 THEN 1.0 ELSE 0.0 END AS value
  FROM events WHERE event_id % 7 <> 0
)
SELECT coalesce(o.event_id, n.event_id) AS event_id,
       CASE WHEN n.event_id IS NULL THEN 'removed'
            WHEN o.event_id IS NULL THEN 'added'
            WHEN o.value <> n.value THEN 'changed'
            ELSE 'unchanged' END AS status,
       o.value AS value_old, n.value AS value_new
FROM v_old o FULL OUTER JOIN v_new n ON o.event_id = n.event_id
"""


@query("o10_snapshot_diff", O10_ORACLE)
def o10_snapshot_diff(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    v_old = ev.where(F.col("event_id") % 10 != 0).select("event_id", "value")
    v_new = ev.where(F.col("event_id") % 7 != 0).select(
        "event_id",
        (
            F.col("value")
            + F.when(F.col("event_id") % 13 == 0, 1.0).otherwise(0.0)
        ).alias("value"),
    )
    o = v_old.select(
        F.col("event_id").alias("__ko"), F.col("value").alias("value_old")
    )
    n = v_new.select(
        F.col("event_id").alias("__kn"), F.col("value").alias("value_new")
    )
    j = o.join(n, o["__ko"] == n["__kn"], "full_outer")
    return j.select(
        F.coalesce("__ko", "__kn").alias("event_id"),
        F.when(F.col("__kn").isNull(), "removed")
        .when(F.col("__ko").isNull(), "added")
        .when(F.col("value_old") != F.col("value_new"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        "value_old",
        "value_new",
    )


def _zorder3_oracle(bits: int = 8) -> str:
    parts = []
    for i in range(bits):
        parts.append(f"(((a >> {i}) & 1) << {3 * i})")
        parts.append(f"(((b >> {i}) & 1) << {3 * i + 1})")
        parts.append(f"(((c >> {i}) & 1) << {3 * i + 2})")
    expr = " | ".join(parts)
    return f"""
WITH d AS (
  SELECT event_id, user_id % 256 AS a,
         CAST(floor(value) AS BIGINT) % 256 AS b,
         event_id % 256 AS c
  FROM events
)
SELECT event_id, a, b, c, {expr} AS zkey FROM d
"""


@query("p_zorder_key3", _zorder3_oracle())
def p_zorder_key3(spark, sf_dir):
    """3-dimensional Morton key (operators/layout.zorder_key_n) —
    the N-dim generalization, bit-for-bit against the oracle's
    arithmetic restatement."""
    from ..operators.layout import zorder_key_n

    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("a"),
        (F.floor("value").cast("long") % 256).alias("b"),
        (F.col("event_id") % 256).alias("c"),
    )
    return d.withColumn(
        "zkey",
        zorder_key_n([F.col("a"), F.col("b"), F.col("c")], bits=8),
    )


# --------------------------------------------------------------------
# O22: per-brand skyline (Pareto frontier) on (minimize retail price,
# maximize size). The textbook operator is a quadratic NOT EXISTS
# dominance test; the Spark plan is the 2-D sort-sweep instead —
# collapse to one row per (brand, price) carrying the group's max
# size, take a running max over the price order, and a part is
# dominated iff a strictly cheaper price level reaches its size
# (runmax_lt >= size) or its own-or-cheaper level strictly exceeds it
# (runmax_le > size). Two aggregations + one window + one broadcast
# join back: O(n log n) per brand, never a self-join — at 100 TB the
# window runs inside each brand partition and the price-level table
# it scans is orders of magnitude smaller than the fact rows. The
# oracle keeps the independent NOT EXISTS formulation.
# --------------------------------------------------------------------
SKYLINE_ORACLE = """
SELECT p.p_brand AS brand,
       CAST(p.p_partkey AS BIGINT) AS partkey,
       CAST(p.p_retailprice AS DOUBLE) AS price,
       CAST(p.p_size AS BIGINT) AS size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand
    AND q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


@query("o22_skyline", SKYLINE_ORACLE)
def o22_skyline(spark, sf_dir):
    """Per-brand skyline via the sort-sweep rewrite (no self-join).

    Dominance (min price, max size): q dominates p iff q is no worse
    on both axes and strictly better on one. With one row per price
    level holding the level's max size, p is dominated iff
    max size over strictly-cheaper levels >= p.size, or
    max size over cheaper-or-equal levels  >  p.size."""
    p = table(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").cast("long").alias("partkey"),
        F.col("p_retailprice").alias("price_dec"),
        F.col("p_size").cast("long").alias("size"),
    )
    levels = p.groupBy("brand", "price_dec").agg(
        F.max("size").alias("lvl_max")
    )
    w = (
        Window.partitionBy("brand")
        .orderBy("price_dec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("brand").orderBy("price_dec")
    swept = levels.select(
        "brand",
        "price_dec",
        F.max("lvl_max").over(w).alias("runmax_le"),
    ).withColumn("runmax_lt", F.lag("runmax_le").over(wl))
    return (
        p.join(F.broadcast(swept), ["brand", "price_dec"])
        .where(
            ~(
                (
                    F.coalesce(
                        F.col("runmax_lt") >= F.col("size"), F.lit(False)
                    )
                )
                | (F.col("runmax_le") > F.col("size"))
            )
        )
        .select(
            "brand",
            "partkey",
            F.col("price_dec").cast("double").alias("price"),
            "size",
        )
    )


# --------------------------------------------------------------------
# O19: SCD2 (slowly-changing-dimension type 2) history construction —
# the warehouse pattern that turns an attribute-change event stream
# into versioned validity intervals: one row per (entity, version)
# with half-open [valid_from, valid_to) bounds, valid_to = the next
# version's valid_from (NULL while current), plus an is_current flag.
# Versions open when the tracked attribute CHANGES (consecutive
# repeats collapse into the run), detected with one lag + one
# conditional prefix-sum over the (entity, time) window — the same
# run-length machinery as w3, specialized to the dimension-history
# contract. Per-entity windows keep the scan partitioned; output is
# ~versions, not ~events, so the history table stays dimension-sized
# at any fact-stream scale.
# --------------------------------------------------------------------
SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
versioned AS (
  SELECT user_id, ts, event_id, event_type,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM ordered
),
runs AS (
  SELECT user_id, CAST(version AS BIGINT) AS version,
         min(event_type) AS attr_value,
         min(ts) AS vf,
         CAST(count(*) AS BIGINT) AS n_events
  FROM versioned GROUP BY user_id, version
)
SELECT user_id, version, attr_value,
       strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(lead(vf) OVER w, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       (lead(vf) OVER w IS NULL) AS is_current,
       n_events
FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY version)
"""


@query("o19_scd2_intervals", SCD2_ORACLE)
def o19_scd2_intervals(spark, sf_dir):
    """Versioned dimension history from the event stream: lag flags
    an attribute change, a running sum numbers the version, one
    grouped agg collapses runs, and lead() closes each interval with
    the successor's start — two window passes and one aggregation,
    all sharing the (user_id, time) partitioning."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(wo).eqNullSafe(F.col("event_type")),
        F.lit(1),
    ).otherwise(F.lit(0))
    versioned = ev.withColumn(
        "version",
        F.sum(chg).over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = versioned.groupBy(
        "user_id", F.col("version").cast("long").alias("version")
    ).agg(
        F.min("event_type").alias("attr_value"),
        F.min("ts").alias("vf"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    # interval bounds leave as microsecond ISO strings (determinism
    # rule: a nullable timestamp column renders at different
    # resolutions across engines)
    iso = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return runs.select(
        "user_id",
        "version",
        "attr_value",
        F.date_format("vf", iso).alias("valid_from"),
        F.date_format(F.lead("vf").over(wv), iso).alias("valid_to"),
        F.lead("vf").over(wv).isNull().alias("is_current"),
        "n_events",
    )


# --------------------------------------------------------------------
# J14: market-basket association pairs with exact lift — the classic
# co-purchase analytics: support counts for parts and part-pairs from
# the same-order self-join (order size is schema-bounded, <= 7 items,
# so pair generation is linear in orders — the same guarantee the
# triangle census leans on), lift in exact ppm as one integer
# cross-multiplication and a final truncating division:
# lift_ppm = n_ab * N * 1e6 // (n_a * n_b). Top-20 by (lift, pair)
# with a support floor so the report is stable and tiny. Three
# aggregations + one broadcastable rank — no float enters.
# --------------------------------------------------------------------
LIFT_ORACLE = """
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
n_orders AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM li),
item AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item
         FROM li GROUP BY pk),
pair AS (
  SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS n_pair
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
)
SELECT pa, pb, n_pair, ia.n_item AS n_a, ib.n_item AS n_b,
       CAST((n_pair * no.n * 1000000) // (ia.n_item * ib.n_item)
            AS BIGINT) AS lift_ppm,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT p.*, row_number() OVER (
    ORDER BY (p.n_pair * no2.n * 1000000)
             // (ia2.n_item * ib2.n_item) DESC, p.pa, p.pb) AS rank
  FROM pair p
  JOIN item ia2 ON ia2.pk = p.pa JOIN item ib2 ON ib2.pk = p.pb
  CROSS JOIN n_orders no2
  WHERE p.n_pair >= 3
) r
JOIN item ia ON ia.pk = r.pa JOIN item ib ON ib.pk = r.pb
CROSS JOIN n_orders no
WHERE rank <= 20
"""


@query("j14_lift_pairs", LIFT_ORACLE)
def j14_lift_pairs(spark, sf_dir):
    """Top-20 co-purchase pairs by exact integer lift (ppm), support
    floor 3. Pair support comes from the bounded per-order self-join;
    item supports and the order count are broadcast onto the pair
    table, so the only data-sized shuffles are the two support
    groupBys."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_orders = li.agg(
        F.countDistinct("ok").cast("long").alias("n")
    )
    item = li.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("n_item"))
    a, b = li.alias("a"), li.alias("b")
    pair = (
        a.join(
            b,
            on=[F.col("a.ok") == F.col("b.ok"), F.col("a.pk") < F.col("b.pk")],
        )
        .groupBy(
            F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= 3)
    )
    ia = item.select(F.col("pk").alias("pa"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("pk").alias("pb"), F.col("n_item").alias("n_b"))
    scored = (
        pair.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(n_orders))
        .withColumn(
            "lift_ppm",
            F.expr("(n_pair * n * 1000000) DIV (n_a * n_b)").cast("long"),
        )
    )
    wr = Window.orderBy(F.desc("lift_ppm"), F.asc("pa"), F.asc("pb"))
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= 20)
        .select("pa", "pb", "n_pair", "n_a", "n_b", "lift_ppm", "rank")
    )


# --------------------------------------------------------------------
# O23: cross-table referential-integrity audit — the FK half of the
# data-contract suite (o21 validates single-table constraints; this
# one walks the star schema's joins): for each declared relationship,
# count child rows and orphans (children whose FK matches no parent
# key). Each relationship is one left-anti aggregate against the
# (usually broadcastable) parent key set; the report is
# relationship-sized. At 100 TB orphan counting is exactly how you
# detect a partially-landed dimension before a silent inner-join
# drops fact rows.
# --------------------------------------------------------------------
_FK_RELS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_oracle() -> str:
    rows = []
    for child, fk, parent, pk in _FK_RELS:
        rows.append(f"""
SELECT '{child}.{fk}' AS relationship, '{parent}.{pk}' AS parent_key,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(sum(CASE WHEN p.{pk} IS NULL AND c.{fk} IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
       CAST(sum(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null_fk
FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
  ON c.{fk} = p.{pk}""")
    return " UNION ALL ".join(rows)


@query("o23_fk_integrity", _fk_oracle())
def o23_fk_integrity(spark, sf_dir):
    """Orphan and null-FK counts for every declared star-schema
    relationship — one broadcast left join + conditional partial
    aggregate per relationship, report rows = relationships."""
    from ..tables import BROADCASTABLE

    out = None
    for child, fk, parent, pk in _FK_RELS:
        c = table(spark, sf_dir, child).select(F.col(fk).alias("__fk"))
        p = (
            table(spark, sf_dir, parent)
            .select(F.col(pk).alias("__pk"))
            .distinct()
        )
        # broadcast dimension-scale parents only; a fact-scale parent
        # key set (orders, ~SF x 1.5M distinct keys) must go through a
        # shuffle join or AQE's choice — forcing it to the driver is
        # exactly the OOM tables.BROADCASTABLE exists to prevent
        if parent in BROADCASTABLE:
            p = F.broadcast(p)
        row = (
            c.join(p, c.__fk == p.__pk, "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_child"),
                F.sum(
                    F.when(
                        F.col("__pk").isNull() & F.col("__fk").isNotNull(),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_orphans"),
                F.sum(F.when(F.col("__fk").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null_fk"),
            )
            .select(
                F.lit(f"{child}.{fk}").alias("relationship"),
                F.lit(f"{parent}.{pk}").alias("parent_key"),
                "n_child",
                "n_orphans",
                "n_null_fk",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------
# J16: temporal anti-join — "viewed but did NOT purchase within the
# next hour", the absence-of-event pattern behind churn, abandoned-
# cart, and SLA-breach analytics. The NOT EXISTS rides an equi-join on
# user_id with a range residual (micros arithmetic on both engines),
# i.e. one shuffle on the user key and a per-user interval scan —
# never a cross join. Counts are exact BIGINTs; the unconverted rate
# is one double division.
#
# Reference anchor: the reference's gap-marking infill
# (hourly_standardization marks hours with NO observation,
# QAQC_pipeline.py hourly stage) is the same absence-detection shape
# over time.
# --------------------------------------------------------------------
J16_ORACLE = """
WITH v AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
  WHERE event_type = 'view'
),
p AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
  WHERE event_type = 'purchase'
),
un AS (
  SELECT v.user_id, v.event_id
  FROM v
  WHERE NOT EXISTS (
    SELECT 1 FROM p
    WHERE p.user_id = v.user_id
      AND p.us > v.us AND p.us <= v.us + 3600000000
  )
),
per AS (
  SELECT v.user_id,
         count(*) AS n_views,
         (SELECT count(*) FROM un WHERE un.user_id = v.user_id)
           AS n_unconverted
  FROM v GROUP BY v.user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(n_views AS BIGINT) AS n_views,
       CAST(n_unconverted AS BIGINT) AS n_unconverted,
       round(CAST(n_unconverted AS DOUBLE) / CAST(n_views AS DOUBLE), 6)
         AS unconverted_rate
FROM per
"""


@query("j16_view_no_purchase", J16_ORACLE)
def j16_view_no_purchase(spark, sf_dir):
    """Per-user count of view events with no purchase in the following
    hour (temporal NOT EXISTS via left_anti with a range residual)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "us"
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("us").alias("pus")
    )
    un = v.join(
        p,
        (F.col("pu") == F.col("user_id"))
        & (F.col("pus") > F.col("us"))
        & (F.col("pus") <= F.col("us") + F.lit(3600000000)),
        "left_anti",
    )
    nv = v.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_views"))
    nu = un.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_unconverted")
    )
    return (
        nv.join(nu, "user_id", "left")
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("n_views").cast("long").alias("n_views"),
            F.coalesce(F.col("n_unconverted"), F.lit(0))
            .cast("long")
            .alias("n_unconverted"),
            F.round(
                F.coalesce(F.col("n_unconverted"), F.lit(0)).cast("double")
                / F.col("n_views").cast("double"),
                6,
            ).alias("unconverted_rate"),
        )
    )


# --------------------------------------------------------------------
# RFM quintile scoring — the classic customer-value segmentation:
# recency (latest event), frequency (event count), monetary (exact
# decimal purchase value), each ntile(5)-scored with deterministic
# (metric, user_id) orderings so both engines assign identical
# quintiles (SQL-standard ntile: equal buckets, larger first). Scores
# read 1 = best.
# --------------------------------------------------------------------
RFM_ORACLE = """
WITH u AS (
  SELECT user_id,
         max(epoch_us(ts)) AS last_us,
         count(*) AS freq,
         CAST(COALESCE(sum(CAST(value AS DECIMAL(18,2)))
                       FILTER (WHERE event_type = 'purchase'),
                       0) AS DECIMAL(18,2)) AS monetary
  FROM events GROUP BY user_id
),
s AS (
  SELECT user_id, last_us, freq, monetary,
         ntile(5) OVER (ORDER BY last_us DESC, user_id) AS r,
         ntile(5) OVER (ORDER BY freq DESC, user_id) AS f,
         ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m
  FROM u
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(freq AS BIGINT) AS freq,
       CAST(monetary AS DOUBLE) AS monetary,
       CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
       CAST(r * 100 + f * 10 + m AS INT) AS rfm
FROM s
"""


@query("e_rfm_scores", RFM_ORACLE)
def e_rfm_scores(spark, sf_dir):
    """Per-user RFM quintile segmentation over the event log.

    Scale shape: one per-user aggregation (shuffle on user_id), then
    three ntile windows over the USER table — customer-cardinality-
    sized, not event-sized; at larger user counts the ntile boundary
    is the a31-style range-partition + driver-offset two-stage rank.
    Monetary sums in DECIMAL (order-free exact), surfaced as double.
    """
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
            "last_us"
        ),
        F.count(F.lit(1)).alias("freq"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    dec("value"),
                )
            ),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("decimal(18,2)")
        .alias("monetary"),
    )
    r_w = Window.orderBy(F.desc("last_us"), F.asc("user_id"))
    f_w = Window.orderBy(F.desc("freq"), F.asc("user_id"))
    m_w = Window.orderBy(F.desc("monetary"), F.asc("user_id"))
    s = u.select(
        "user_id",
        "freq",
        "monetary",
        F.ntile(5).over(r_w).alias("r"),
        F.ntile(5).over(f_w).alias("f"),
        F.ntile(5).over(m_w).alias("m"),
    )
    return s.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("freq").cast("long").alias("freq"),
        F.col("monetary").cast("double").alias("monetary"),
        F.col("r").cast("int").alias("r"),
        F.col("f").cast("int").alias("f"),
        F.col("m").cast("int").alias("m"),
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
        .cast("int")
        .alias("rfm"),
    )
