"""Third statistics wave — distribution-shape and sequence tests:

- a40_jarque_bera — per-group normality test from exact CENTRAL power
  sums (Jarque & Bera 1987): skewness, excess kurtosis and the JB
  statistic. Two passes: an integer floor-mean anchor per group, then
  central sums about the anchor in exact DECIMAL; the about-the-mean
  correction runs in identical float trees on both engines.
- a41_runs_test — Wald-Wolfowitz runs test for randomness of the
  above/below-median sign sequence in event order; the exact grid
  median is the a37 move, run counting is one lag over the ordered
  sequence, the z-statistic a closed form.
- a42_grubbs — per-group maximum-studentized-deviate outlier test;
  the arg-max deviation is found on the EXACT integer |n·x − s1|
  scale so ties are decided exactly, then studentized in floats.
- a43_durbin_watson — first-order residual autocorrelation of the
  hourly count series: OLS detrend from exact integer sums, residuals
  floored to 1e-6 fixed point (the w32 move) so the DW ratio is a
  quotient of exact DECIMAL sums.
- a44_revenue_deciles — users ranked into revenue deciles (ntile
  over an exact DECIMAL revenue sum, deterministic tie-break), per
  decile user count / revenue / share — the concentration table next
  to a31's Gini.

Determinism: values lift to integer cents; every central/residual sum
is an exact DECIMAL of bit-identical integers (or floors of
bit-identical doubles); per-group outputs never sum floats across
groups; all divisions nested-CASE-guarded (Spark runs ANSI mode).

Reference anchor: the reference's distribution QAQC accepts/flags
station-months from distribution statistics
(scripts/3_qaqc_data/qaqc_dist_whole_stn.py) and inspects trend/
residual structure before climatology fits (qaqc_time_ds.py) — these
are the corresponding decision statistics at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from .common import round_half_away, table


# ------------------------------------------------------------------ #
# a40_jarque_bera
# ------------------------------------------------------------------ #
A40_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
gv AS (SELECT event_type, x, count(*) AS n_gv FROM c GROUP BY 1, 2),
anchor AS (
  SELECT event_type, sum(n_gv) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * n_gv) AS DECIMAL(38,0))
           AS s1
  FROM gv GROUP BY 1),
a2 AS (
  SELECT event_type, n, s1,
         CAST(s1 / n AS BIGINT)
           - CASE WHEN s1 < 0 AND s1 % n <> 0 THEN 1 ELSE 0 END AS m0
  FROM anchor),
cs AS (
  SELECT g.event_type, a.n, a.s1, a.m0,
         sum(CAST((g.x - a.m0) * (g.x - a.m0) AS DECIMAL(19,0))
             * g.n_gv) AS c2,
         sum(CAST((g.x - a.m0) * (g.x - a.m0) AS DECIMAL(19,0))
             * CAST(g.x - a.m0 AS DECIMAL(18,0)) * g.n_gv) AS c3,
         sum(CAST((g.x - a.m0) * (g.x - a.m0) AS DECIMAL(19,0))
             * CAST((g.x - a.m0) * (g.x - a.m0) AS DECIMAL(18,0))
             * g.n_gv) AS c4
  FROM gv g JOIN a2 a ON a.event_type = g.event_type
  GROUP BY 1, 2, 3, 4),
m AS (
  SELECT event_type, n,
         (CAST(s1 AS DOUBLE) - CAST(n AS DOUBLE) * m0)
           / n AS d,
         CAST(c2 AS DOUBLE) / n AS r2,
         CAST(c3 AS DOUBLE) / n AS r3,
         CAST(c4 AS DOUBLE) / n AS r4
  FROM cs),
mm AS (
  SELECT event_type, n, d,
         r2 - d * d AS m2,
         r3 - 3 * d * r2 + 2 * d * d * d AS m3,
         r4 - 4 * d * r3 + 6 * d * d * r2 - 3 * d * d * d * d AS m4
  FROM m)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CASE WHEN n >= 2 THEN
         CASE WHEN m2 > 0
              THEN round(m3 / (m2 * sqrt(m2)), 6) END
       END AS skewness,
       CASE WHEN n >= 2 THEN
         CASE WHEN m2 > 0
              THEN round(m4 / (m2 * m2) - 3, 6) END
       END AS ex_kurtosis,
       CASE WHEN n >= 2 THEN
         CASE WHEN m2 > 0
              THEN round((CAST(n AS DOUBLE) / 6)
                         * ((m3 / (m2 * sqrt(m2)))
                            * (m3 / (m2 * sqrt(m2)))
                            + (m4 / (m2 * m2) - 3)
                              * (m4 / (m2 * m2) - 3) / 4), 6) END
       END AS jb_stat
FROM mm
"""


@query("a40_jarque_bera", A40_ORACLE)
def a40_jarque_bera(spark, sf_dir):
    """Jarque-Bera normality test per event type.

    Scale shape: two corpus passes, both (group, value)-grid
    aggregations (the a37 shape) — pass 1 anchors each group at its
    integer floor mean m0 (so the centered powers stay small exact
    integers), pass 2 folds the central power sums in DECIMAL. The
    about-the-anchor → about-the-mean correction (d = mean − m0,
    0 ≤ d < 1 cent) is a scalar float tree written identically in the
    oracle. No float ever crosses a shuffle.
    """
    x = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    c = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", x.alias("x"))
    )
    gv = c.groupBy("event_type", "x").agg(
        F.count(F.lit(1)).alias("n_gv")
    )
    anchor = gv.groupBy("event_type").agg(
        F.sum("n_gv").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("n_gv"))
        .cast("decimal(38,0)")
        .alias("s1"),
    )
    # integer floor mean: truncate-toward-zero quotient, corrected to
    # a true floor for negative sums (same spelling in the oracle)
    a2 = anchor.select(
        "event_type",
        "n",
        "s1",
        (
            (F.col("s1") / F.col("n")).cast("bigint")
            - F.when(
                (F.col("s1") < 0) & (F.col("s1") % F.col("n") != 0), 1
            ).otherwise(0)
        ).alias("m0"),
    )
    y = F.col("x") - F.col("m0")
    y2 = (y * y).cast("decimal(19,0)")
    cs = (
        gv.join(F.broadcast(a2), "event_type")
        .groupBy("event_type", "n", "s1", "m0")
        .agg(
            F.sum(y2 * F.col("n_gv")).alias("c2"),
            F.sum(
                y2 * y.cast("decimal(18,0)") * F.col("n_gv")
            ).alias("c3"),
            F.sum(
                y2 * (y * y).cast("decimal(18,0)") * F.col("n_gv")
            ).alias("c4"),
        )
    )
    n = F.col("n")
    d = (
        F.col("s1").cast("double") - n.cast("double") * F.col("m0")
    ) / n
    m = cs.select(
        "event_type",
        n,
        d.alias("d"),
        (F.col("c2").cast("double") / n).alias("r2"),
        (F.col("c3").cast("double") / n).alias("r3"),
        (F.col("c4").cast("double") / n).alias("r4"),
    )
    dd, r2, r3, r4 = (
        F.col("d"),
        F.col("r2"),
        F.col("r3"),
        F.col("r4"),
    )
    mm = m.select(
        "event_type",
        n,
        (r2 - dd * dd).alias("m2"),
        (r3 - 3 * dd * r2 + 2 * dd * dd * dd).alias("m3"),
        (
            r4 - 4 * dd * r3 + 6 * dd * dd * r2 - 3 * dd * dd * dd * dd
        ).alias("m4"),
    )
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    skew = m3 / (m2 * F.sqrt(m2))
    exk = m4 / (m2 * m2) - 3
    ok = F.when(n >= 2, F.when(m2 > 0, F.lit(True)))
    return mm.select(
        "event_type",
        n.cast("long").alias("n"),
        F.when(n >= 2, F.when(m2 > 0, F.round(skew, 6))).alias(
            "skewness"
        ),
        F.when(n >= 2, F.when(m2 > 0, F.round(exk, 6))).alias(
            "ex_kurtosis"
        ),
        F.when(
            n >= 2,
            F.when(
                m2 > 0,
                F.round(
                    (n.cast("double") / 6)
                    * (skew * skew + exk * exk / 4),
                    6,
                ),
            ),
        ).alias("jb_stat"),
    )


# ------------------------------------------------------------------ #
# a41_runs_test
# ------------------------------------------------------------------ #
A41_ORACLE = """
WITH c AS (
  SELECT event_type, ts, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
gv AS (SELECT event_type, x, count(*) AS n_gv FROM c GROUP BY 1, 2),
cum AS (
  SELECT event_type, x, n_gv,
         sum(n_gv) OVER (PARTITION BY event_type ORDER BY x) AS cumn
  FROM gv),
ng AS (SELECT event_type, sum(n_gv) AS n_g FROM gv GROUP BY 1),
med AS (
  SELECT cu.event_type, min(cu.x) AS med_x
  FROM cum cu JOIN ng ON ng.event_type = cu.event_type
  WHERE cu.cumn >= (ng.n_g + 1) // 2
  GROUP BY cu.event_type),
s AS (
  SELECT c.event_type,
         CASE WHEN c.x > m.med_x THEN 1 ELSE 0 END AS sgn,
         lag(CASE WHEN c.x > m.med_x THEN 1 ELSE 0 END)
           OVER (PARTITION BY c.event_type
                 ORDER BY c.ts, c.event_id NULLS FIRST, c.x)
           AS prev
  FROM c JOIN med m ON m.event_type = c.event_type
  WHERE c.x <> m.med_x),
r AS (
  SELECT event_type,
         sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS n2,
         1 + sum(CASE WHEN prev IS NOT NULL AND sgn <> prev
                      THEN 1 ELSE 0 END) AS runs
  FROM s GROUP BY 1),
z AS (
  SELECT event_type, n1, n2, runs,
         CASE WHEN n1 > 0 AND n2 > 0 THEN
           1 + 2.0e0 * n1 * n2 / (n1 + n2) END AS mu,
         CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 >= 2 THEN
           2.0e0 * n1 * n2 * (2.0e0 * n1 * n2 - n1 - n2)
           / ((CAST(n1 + n2 AS DOUBLE) * (n1 + n2))
              * (n1 + n2 - 1)) END AS var
  FROM r)
SELECT event_type, CAST(n1 AS BIGINT) AS n_above,
       CAST(n2 AS BIGINT) AS n_below, CAST(runs AS BIGINT) AS runs,
       round(mu, 6) AS expected_runs,
       CASE WHEN var > 0
            THEN round((runs - mu) / sqrt(var), 6) END AS z_stat
FROM z
"""


@query("a41_runs_test", A41_ORACLE)
def a41_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test per event type: is the
    above/below-median sign sequence (in event order) random, or does
    it cluster (autocorrelation) / alternate (over-dispersion)?

    Scale shape: the exact grid median is the a37 value-distinct
    move; the sign sequence is one per-group window lag (ordered by
    (ts, event_id, x) — a deterministic total order on both engines);
    everything after is a per-group count fold. Median-equal rows are
    excluded (the standard two-sided convention).
    """
    x = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    c = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "ts", "event_id", x.alias("x"))
    )
    gv = c.groupBy("event_type", "x").agg(
        F.count(F.lit(1)).alias("n_gv")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = gv.select(
        "event_type", "x", "n_gv", F.sum("n_gv").over(wc).alias("cumn")
    )
    ng = gv.groupBy("event_type").agg(F.sum("n_gv").alias("n_g"))
    med = (
        cum.join(F.broadcast(ng), "event_type")
        .where(F.col("cumn") >= F.expr("(n_g + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("x").alias("med_x"))
    )
    sgn = F.when(F.col("x") > F.col("med_x"), 1).otherwise(0)
    wo = Window.partitionBy("event_type").orderBy(
        F.col("ts").asc(),
        F.col("event_id").asc_nulls_first(),
        F.col("x").asc(),
    )
    s = (
        c.join(F.broadcast(med), "event_type")
        .where(F.col("x") != F.col("med_x"))
        .select(
            "event_type",
            sgn.alias("sgn"),
            F.lag(sgn).over(wo).alias("prev"),
        )
    )
    r = s.groupBy("event_type").agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("sgn") == 0, 1).otherwise(0)).alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("sgn") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        ).alias("runs"),
    )
    n1, n2, runs = F.col("n1"), F.col("n2"), F.col("runs")
    both = (n1 > 0) & (n2 > 0)
    mu = F.when(both, 1 + 2.0 * n1 * n2 / (n1 + n2))
    var = F.when(
        both & (n1 + n2 >= 2),
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / (((n1 + n2).cast("double") * (n1 + n2)) * (n1 + n2 - 1)),
    )
    z = r.select(
        "event_type", n1, n2, runs, mu.alias("mu"), var.alias("var")
    )
    return z.select(
        "event_type",
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        runs.cast("long").alias("runs"),
        F.round("mu", 6).alias("expected_runs"),
        F.when(
            F.col("var") > 0,
            F.round((runs - F.col("mu")) / F.sqrt("var"), 6),
        ).alias("z_stat"),
    )


# ------------------------------------------------------------------ #
# a42_grubbs
# ------------------------------------------------------------------ #
A42_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
gv AS (SELECT event_type, x, count(*) AS n_gv FROM c GROUP BY 1, 2),
s AS (
  SELECT event_type, sum(n_gv) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * n_gv)
              AS DECIMAL(38,0)) AS s1,
         sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
             * n_gv) AS s2
  FROM gv GROUP BY 1),
dev AS (
  SELECT g.event_type, g.x, s.n, s.s1, s.s2,
         abs(CAST(g.x AS DECIMAL(38,0)) * s.n - s.s1) AS d
  FROM gv g JOIN s ON s.event_type = g.event_type),
mx AS (
  SELECT event_type, max(d) AS dmax FROM dev GROUP BY 1),
pick AS (
  SELECT d.event_type, d.n, d.s1, d.s2, m.dmax,
         min(d.x) AS x_star
  FROM dev d JOIN mx m
    ON m.event_type = d.event_type AND d.d = m.dmax
  GROUP BY 1, 2, 3, 4, 5),
v AS (
  SELECT event_type, n, x_star, dmax,
         CASE WHEN n >= 2 THEN
           (CAST(s2 AS DOUBLE)
            - (CAST(s1 AS DOUBLE) / n) * CAST(s1 AS DOUBLE))
           / (n - 1) END AS var_c
  FROM pick)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(CAST(x_star AS DOUBLE) / 100, 6) AS outlier_value,
       CASE WHEN var_c > 0
            THEN round((CAST(dmax AS DOUBLE) / n) / sqrt(var_c), 6)
       END AS g_stat
FROM v
"""


@query("a42_grubbs", A42_ORACLE)
def a42_grubbs(spark, sf_dir):
    """Grubbs' maximum-studentized-deviate test per event type: the
    most extreme observation's distance from the mean in sample-sd
    units, with the outlying value itself.

    Scale shape: one grid aggregation for the power sums; the arg-max
    deviation maximizes the EXACT integer |n·x − s1| (so ties are
    exact, broken to the smallest value); the studentization is a
    scalar float tree. The deviation scan runs on the (group, value)
    grid, not per row.
    """
    x = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    c = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", x.alias("x"))
    )
    # gv feeds the power-sum aggregation AND the deviation scan —
    # one materialized grid table instead of two corpus passes
    gv = (
        c.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("n_gv"))
        .localCheckpoint(eager=False)
    )
    xd = F.col("x").cast("decimal(19,0)")
    s = gv.groupBy("event_type").agg(
        F.sum("n_gv").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("n_gv"))
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(xd * xd * F.col("n_gv")).alias("s2"),
    )
    dev = gv.join(F.broadcast(s), "event_type").select(
        "event_type",
        "x",
        "n",
        "s1",
        "s2",
        F.abs(
            F.col("x").cast("decimal(38,0)") * F.col("n") - F.col("s1")
        ).alias("d"),
    )
    mx = dev.groupBy("event_type").agg(F.max("d").alias("dmax"))
    pick = (
        dev.join(F.broadcast(mx), "event_type")
        .where(F.col("d") == F.col("dmax"))
        .groupBy("event_type", "n", "s1", "s2", "dmax")
        .agg(F.min("x").alias("x_star"))
    )
    n = F.col("n")
    var_c = F.when(
        n >= 2,
        (
            F.col("s2").cast("double")
            - (F.col("s1").cast("double") / n)
            * F.col("s1").cast("double")
        )
        / (n - 1),
    )
    v = pick.select(
        "event_type", n, "x_star", "dmax", var_c.alias("var_c")
    )
    return v.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(F.col("x_star").cast("double") / 100, 6).alias(
            "outlier_value"
        ),
        F.when(
            F.col("var_c") > 0,
            F.round(
                (F.col("dmax").cast("double") / n)
                / F.sqrt("var_c"),
                6,
            ),
        ).alias("g_stat"),
    )


# ------------------------------------------------------------------ #
# a43_durbin_watson
# ------------------------------------------------------------------ #
_HI_SQL = (
    "(epoch_us(ts) - ((epoch_us(ts) % 3600000000) + 3600000000)"
    " % 3600000000) // 3600000000"
)
_HI_SPARK = (
    "(unix_micros(CAST(ts AS TIMESTAMP))"
    " - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000))"
    " DIV 3600000000"
)
_DW_FIX = 1000000


A43_ORACLE = f"""
WITH hv AS (
  SELECT {_HI_SQL} AS hi, count(*) AS cnt FROM events GROUP BY 1
),
t0 AS (SELECT min(hi) AS h0 FROM hv),
tv AS (
  SELECT CAST(hv.hi - t0.h0 AS BIGINT) AS t, hv.cnt FROM hv, t0
),
s AS (
  SELECT count(*) AS n, sum(t) AS st,
         sum(CAST(t AS DECIMAL(19,0)) * t) AS stt,
         sum(cnt) AS sy,
         sum(CAST(t AS DECIMAL(19,0)) * cnt) AS sty
  FROM tv),
b AS (
  SELECT n,
         CASE WHEN n >= 2 AND CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) <> 0
              THEN (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                    - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) END
           AS beta,
         CAST(sy AS DOUBLE) / n AS ybar,
         CAST(st AS DOUBLE) / n AS tbar
  FROM s),
ef AS (
  SELECT tv.t,
         CAST(floor((tv.cnt - (b.ybar + b.beta * (tv.t - b.tbar)))
                    * {_DW_FIX}) AS BIGINT) AS e,
         b.n, b.beta, b.ybar, b.tbar
  FROM tv, b WHERE b.beta IS NOT NULL),
lagd AS (
  SELECT e, lag(e) OVER (ORDER BY t) AS pe, n, beta FROM ef),
dw AS (
  SELECT max(n) AS n, max(beta) AS beta,
         sum(CAST(e AS DECIMAL(19,0)) * e) AS se2,
         sum(CASE WHEN pe IS NOT NULL THEN
               CAST(e - pe AS DECIMAL(19,0)) * (e - pe) END) AS sd2
  FROM lagd)
SELECT CAST(n AS BIGINT) AS n, round(beta, 6) AS slope,
       CASE WHEN se2 > 0
            THEN round(CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE), 6)
       END AS dw_stat
FROM dw
"""


@query("a43_durbin_watson", A43_ORACLE)
def a43_durbin_watson(spark, sf_dir):
    """Durbin-Watson first-order autocorrelation statistic of the
    OLS-detrended hourly count series — the residual-independence
    check a trend fit must pass before its standard errors mean
    anything.

    Exactness: OLS terms are exact integer/DECIMAL sums (t is the
    hour index re-anchored at the series start, y the BIGINT count);
    slope and residuals are identical float trees; residuals floor to
    1e-6 fixed point (the w32 move) so the DW quotient is a ratio of
    exact DECIMAL sums — partial-agg order cannot leak in. The
    statistic is defined on consecutive ROWS of the hour series
    (calendar gaps are one step, documented).

    Scale shape: one corpus-sized hour aggregation; everything after
    runs on the hours-sized series (the bounded single-partition lag
    is over wall-clock hours, ≤ a few thousand rows per decade).
    """
    ev = table(spark, sf_dir, "events")
    hv = (
        ev.select(F.expr(_HI_SPARK).alias("hi"))
        .groupBy("hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    t0 = hv.agg(F.min("hi").alias("h0"))
    tv = hv.crossJoin(F.broadcast(t0)).select(
        (F.col("hi") - F.col("h0")).cast("bigint").alias("t"), "cnt"
    )
    td = F.col("t").cast("decimal(19,0)")
    s = tv.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum(td * F.col("t")).alias("stt"),
        F.sum("cnt").alias("sy"),
        F.sum(td * F.col("cnt")).alias("sty"),
    )
    n = F.col("n")
    nd = n.cast("double")
    std = F.col("st").cast("double")
    sttd = F.col("stt").cast("double")
    syd = F.col("sy").cast("double")
    styd = F.col("sty").cast("double")
    den = nd * sttd - std * std
    b = s.select(
        n,
        F.when((n >= 2) & (den != 0), (nd * styd - std * syd) / den)
        .alias("beta"),
        (syd / n).alias("ybar"),
        (std / n).alias("tbar"),
    )
    ef = (
        tv.crossJoin(F.broadcast(b))
        .where(F.col("beta").isNotNull())
        .select(
            "t",
            F.floor(
                (
                    F.col("cnt")
                    - (
                        F.col("ybar")
                        + F.col("beta") * (F.col("t") - F.col("tbar"))
                    )
                )
                * _DW_FIX
            )
            .cast("bigint")
            .alias("e"),
            "n",
            "beta",
        )
    )
    wo = Window.orderBy("t")
    lagd = ef.select(
        "e", F.lag("e").over(wo).alias("pe"), "n", "beta"
    )
    ed = F.col("e").cast("decimal(19,0)")
    dw = lagd.agg(
        F.max("n").alias("n"),
        F.max("beta").alias("beta"),
        F.sum(ed * F.col("e")).alias("se2"),
        F.sum(
            F.when(
                F.col("pe").isNotNull(),
                (F.col("e") - F.col("pe")).cast("decimal(19,0)")
                * (F.col("e") - F.col("pe")),
            )
        ).alias("sd2"),
    )
    return dw.select(
        F.col("n").cast("long").alias("n"),
        F.round("beta", 6).alias("slope"),
        F.when(
            F.col("se2") > 0,
            F.round(
                F.col("sd2").cast("double")
                / F.col("se2").cast("double"),
                6,
            ),
        ).alias("dw_stat"),
    )


# ------------------------------------------------------------------ #
# a44_revenue_deciles
# ------------------------------------------------------------------ #
A44_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS revenue
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
        AND user_id IS NOT NULL
  GROUP BY user_id),
d AS (
  SELECT user_id, revenue,
         ntile(10) OVER (ORDER BY revenue DESC, user_id) AS decile
  FROM u),
t AS (SELECT sum(revenue) AS total FROM u)
SELECT CAST(d.decile AS INT) AS decile,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(d.revenue) AS DOUBLE) AS revenue,
       CASE WHEN t.total > 0
            THEN round(CAST(sum(d.revenue) AS DOUBLE)
                       / CAST(t.total AS DOUBLE), 6) END AS share
FROM d, t
GROUP BY d.decile, t.total
"""


@query("a44_revenue_deciles", A44_ORACLE)
def a44_revenue_deciles(spark, sf_dir):
    """Revenue concentration by user decile (the table a31's Gini
    summarizes): users ranked by exact DECIMAL purchase revenue,
    ntile(10) with a deterministic (revenue DESC, user_id) tie-break,
    per-decile counts / revenue / share.

    Scale shape: one user-keyed aggregation; the ntile runs on the
    users-sized table (single-partition window — users ≪ events; at
    true cluster scale swap for a two-pass quantile-boundary split).
    """
    u = (
        table(spark, sf_dir, "events")
        .where(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("revenue")
        )
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("user_id"))
    d = u.select(
        "user_id", "revenue", F.ntile(10).over(w).alias("decile")
    )
    t = u.agg(F.sum("revenue").alias("total"))
    return (
        d.crossJoin(F.broadcast(t))
        .groupBy("decile", "total")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("revenue").alias("rev"),
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("rev").cast("double").alias("revenue"),
            F.when(
                F.col("total") > 0,
                F.round(
                    F.col("rev").cast("double")
                    / F.col("total").cast("double"),
                    6,
                ),
            ).alias("share"),
        )
    )


# ------------------------------------------------------------------ #
# a45_capture_recapture
# ------------------------------------------------------------------ #
A45_ORACLE = """
WITH a AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'click' AND user_id IS NOT NULL),
b AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL),
s AS (
  SELECT (SELECT count(*) FROM a) AS n1,
         (SELECT count(*) FROM b) AS n2,
         (SELECT count(*) FROM a JOIN b USING (user_id)) AS m)
SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
       CAST(m AS BIGINT) AS n_both,
       round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1, 6)
         AS chapman_estimate,
       CASE WHEN m >= 1 THEN
         round(sqrt((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)
                     * (n1 - m) * (n2 - m))
                    / ((CAST(m + 1 AS DOUBLE) * (m + 1)) * (m + 2))), 6)
       END AS std_error
FROM s
"""


@query("a45_capture_recapture", A45_ORACLE)
def a45_capture_recapture(spark, sf_dir):
    """Chapman capture-recapture estimate of the total user
    population from two observation channels (clickers and
    purchasers): N̂ = (n1+1)(n2+1)/(m+1) − 1 with its standard error
    — the coverage estimator a pipeline uses to ask "how many users
    exist that NEITHER channel saw".

    Exactness: n1/n2/m are exact distinct counts (the only shuffles);
    the estimator is one scalar float tree, identical on both
    engines. Chapman's +1 correction keeps every divisor structurally
    positive, so no guard is needed for the estimate itself.
    """
    ev = table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    a = (
        ev.where(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
    )
    b = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    s = (
        a.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(
            a.join(b, "user_id").agg(F.count(F.lit(1)).alias("m"))
        )
    )
    n1, n2, m = F.col("n1"), F.col("n2"), F.col("m")
    est = ((n1 + 1).cast("double") * (n2 + 1)) / (m + 1) - 1
    se = F.sqrt(
        ((n1 + 1).cast("double") * (n2 + 1) * (n1 - m) * (n2 - m))
        / (((m + 1).cast("double") * (m + 1)) * (m + 2))
    )
    return s.select(
        n1.cast("long").alias("n_click"),
        n2.cast("long").alias("n_purchase"),
        m.cast("long").alias("n_both"),
        F.round(est, 6).alias("chapman_estimate"),
        F.when(m >= 1, F.round(se, 6)).alias("std_error"),
    )


# ------------------------------------------------------------------ #
# a46_theil_index
# ------------------------------------------------------------------ #
A46_ORACLE = """
WITH s AS (
  SELECT COALESCE(CAST(user_id % 10 AS VARCHAR), 'null') AS cohort,
         CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS DECIMAL(38,0))
           AS rev
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1),
t AS (SELECT count(*) AS k, sum(rev) AS total FROM s WHERE rev > 0),
e AS (
  SELECT s.cohort, s.rev, t.k, t.total,
         CAST(s.rev AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
  FROM s, t WHERE s.rev > 0)
SELECT CAST(k AS BIGINT) AS k,
       CASE WHEN k >= 2 THEN
         round(list_reduce(
           list(share * ln(share * k) ORDER BY cohort),
           (x, y) -> x + y), 6)
       END AS theil_t
FROM e GROUP BY k
"""


@query("a46_theil_index", A46_ORACLE)
def a46_theil_index(spark, sf_dir):
    """Theil T inequality index of purchase revenue across user
    cohorts (user_id mod 10): Σ share·ln(share·k) — 0 for perfectly
    even cohorts, ln(k) for total concentration; the
    decomposable-inequality companion to a31's Gini.

    The ln() fold runs DRIVER-side on the k ≤ 11-row cohort table
    with CPython libm (bit-identical to DuckDB's ln — the
    t_zipf_slope precedent; the oracle folds in cohort order, the
    driver replays the same order). Cohort revenue sums are exact
    DECIMAL cents; shares are identical double divisions.

    Scale shape: one user-cohort aggregation (the corpus-sized work);
    the driver holds k ≈ 10 rows regardless of corpus size.
    """
    import math

    s = (
        table(spark, sf_dir, "events")
        .where(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy(
            F.coalesce(
                (F.col("user_id") % 10).cast("string"), F.lit("null")
            ).alias("cohort")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("decimal(38,0)")
            .alias("rev")
        )
    )
    rows = sorted(
        (
            (r["cohort"], int(r["rev"]))
            for r in s.where(F.col("rev") > 0).collect()
        ),
        key=lambda t: t[0],
    )
    k = len(rows)
    total = sum(r for _, r in rows)
    theil = None
    if k >= 2:
        acc = None
        for _, rev in rows:
            share = float(rev) / float(total)
            term = share * math.log(share * k)
            acc = term if acc is None else acc + term
        theil = round_half_away(acc, 6)
    return spark.createDataFrame(
        [(k, theil)], "k bigint, theil_t double"
    )
