"""Second hypothesis-test / resampling statistics wave, Spark-first:

- a35_welch_ttest — Welch's unequal-variance t between two event-type
  value distributions, from exact integer-cent power sums (one
  conditional grand aggregate, the a16/a33 shape).
- a36_mann_whitney — the two-sample rank-sum test (Mann & Whitney
  1947) with exact average ranks and tie-corrected normal z, ranks
  from the value-DISTINCT domain (the a32 replaces-global-sort move).
- a37_levene_bf — Brown-Forsythe robust variance-homogeneity test
  (Levene statistic on absolute deviations from the per-group
  MEDIAN, Brown & Forsythe 1974), medians exact on the 2-decimal
  value grid.
- a38_effect_sizes — pairwise Cohen's d / Hedges' g between all
  event-type pairs from one per-group sum table (k rows, broadcast
  self-join).
- a39_bootstrap_ci — Poisson-bootstrap percentile CI of the per-type
  mean: each of B replicates reweights every row by a DETERMINISTIC
  quantized-Poisson(1) weight (hash of (event_id, replicate)), so the
  "resample" is one weighted aggregation pass — the bootstrap that
  actually runs at 100 TB, where sampling-with-replacement by index
  cannot (Chamandy et al. 2012, "Estimating uncertainty for massive
  data streams"; Kleiner et al. 2014 bag-of-little-bootstraps is the
  same spirit). B×|groups| aggregation cells, one shuffle.

Determinism: values are lifted to integer cents (exact BIGINT /
DECIMAL power sums — merge-order-free); every float expression tree
after that is written identically on both engines; statistics round
to 6; degenerate corpora (empty / one group / constant values) emit
typed NULLs on BOTH engines, never NaN or a raise.

Reference anchor: the reference's QAQC distribution layer accepts or
flags whole station-months from distribution statistics
(scripts/3_qaqc_data/qaqc_dist_whole_stn.py; qaqc_plot.py renders the
comparisons) — these are the standard two-sample / k-sample decision
statistics plus the uncertainty quantification such gates need at
corpus scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from .common import round_half_away, table

_GRP_A = "click"
_GRP_B = "view"

# hex pair -> 0..255, the established cross-engine md5-bucket spelling
_HEX = "0123456789abcdef"


def _duck_byte(h: str) -> str:
    return (
        f"((instr('{_HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substr({h}, 2, 1)) - 1))"
    )


# ------------------------------------------------------------------ #
# a35_welch_ttest
# ------------------------------------------------------------------ #
A35_ORACLE = f"""
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('{_GRP_A}', '{_GRP_B}')),
s AS (
  SELECT count(*) FILTER (WHERE event_type = '{_GRP_A}') AS na,
         count(*) FILTER (WHERE event_type = '{_GRP_B}') AS nb,
         CAST(sum(CAST(x AS DECIMAL(38,0)))
              FILTER (WHERE event_type = '{_GRP_A}') AS DOUBLE) AS s1a,
         CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
              FILTER (WHERE event_type = '{_GRP_A}') AS DOUBLE) AS s2a,
         CAST(sum(CAST(x AS DECIMAL(38,0)))
              FILTER (WHERE event_type = '{_GRP_B}') AS DOUBLE) AS s1b,
         CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
              FILTER (WHERE event_type = '{_GRP_B}') AS DOUBLE) AS s2b
  FROM c),
-- variances materialize ONLY under the n >= 2 guard (nested CASE):
-- every divisor is then structurally nonzero, so neither engine can
-- hit a divide-by-zero on degenerate corpora (Spark runs ANSI mode)
v AS (
  SELECT na, nb, s1a, s1b,
         CASE WHEN na >= 2
              THEN (s2a - (s1a / na) * s1a) / (na - 1) / 10000 END AS va,
         CASE WHEN nb >= 2
              THEN (s2b - (s1b / nb) * s1b) / (nb - 1) / 10000 END AS vb
  FROM s)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CASE WHEN na > 0 THEN round(s1a / na / 100, 6) END AS mean_a,
       CASE WHEN nb > 0 THEN round(s1b / nb / 100, 6) END AS mean_b,
       round(va, 6) AS var_a,
       round(vb, 6) AS var_b,
       CASE WHEN na >= 2 AND nb >= 2 THEN
         CASE WHEN va / na + vb / nb > 0
              THEN round(((s1a / na - s1b / nb) / 100)
                         / sqrt(va / na + vb / nb), 6) END
       END AS t_stat,
       CASE WHEN na >= 2 AND nb >= 2 THEN
         CASE WHEN (va / na) * (va / na) / (na - 1)
                   + (vb / nb) * (vb / nb) / (nb - 1) > 0
              THEN round((va / na + vb / nb) * (va / na + vb / nb)
                         / ((va / na) * (va / na) / (na - 1)
                            + (vb / nb) * (vb / nb) / (nb - 1)), 6) END
       END AS df_welch
FROM v
"""


@query("a35_welch_ttest", A35_ORACLE)
def a35_welch_ttest(spark, sf_dir):
    """Welch's t-test between two event-type value distributions.

    Scale shape: ONE conditional grand aggregate over the corpus (two
    exact power sums per arm — the mergeable state), then a scalar
    expression. No per-row float ever crosses a shuffle, so partial
    aggregation order cannot leak into the statistic.
    """
    x = (
        F.col("value").cast("decimal(18,2)") * 100
    ).cast("long")
    c = (
        table(spark, sf_dir, "events")
        .where(
            F.col("value").isNotNull()
            & F.col("event_type").isin(_GRP_A, _GRP_B)
        )
        .select("event_type", x.alias("x"))
    )
    xd = F.col("x").cast("decimal(19,0)")
    is_a = F.col("event_type") == _GRP_A
    is_b = F.col("event_type") == _GRP_B
    s = c.agg(
        F.count(F.when(is_a, 1)).alias("na"),
        F.count(F.when(is_b, 1)).alias("nb"),
        F.sum(F.when(is_a, F.col("x").cast("decimal(38,0)")))
        .cast("double")
        .alias("s1a"),
        F.sum(F.when(is_a, xd * xd)).cast("double").alias("s2a"),
        F.sum(F.when(is_b, F.col("x").cast("decimal(38,0)")))
        .cast("double")
        .alias("s1b"),
        F.sum(F.when(is_b, xd * xd)).cast("double").alias("s2b"),
    )
    na, nb = F.col("na"), F.col("nb")
    s1a, s2a = F.col("s1a"), F.col("s2a")
    s1b, s2b = F.col("s1b"), F.col("s2b")
    # identical expression trees to the oracle, term for term; the
    # variances exist only under the n >= 2 guard (nested CASE), so
    # no divisor is ever zero — Spark runs ANSI mode, where an
    # unguarded divide-by-zero in a dead branch would still raise if
    # it leaked into an eagerly-evaluated condition
    va = F.when(na >= 2, (s2a - (s1a / na) * s1a) / (na - 1) / 10000)
    vb = F.when(nb >= 2, (s2b - (s1b / nb) * s1b) / (nb - 1) / 10000)
    v = s.select(na, nb, s1a, s1b, va.alias("va"), vb.alias("vb"))
    vag, vbg = F.col("va"), F.col("vb")
    se2 = vag / na + vbg / nb
    t = ((s1a / na - s1b / nb) / 100) / F.sqrt(se2)
    dfden = (vag / na) * (vag / na) / (na - 1) + (vbg / nb) * (
        vbg / nb
    ) / (nb - 1)
    df = se2 * se2 / dfden
    both = (na >= 2) & (nb >= 2)
    return v.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.when(na > 0, F.round(s1a / na / 100, 6)).alias("mean_a"),
        F.when(nb > 0, F.round(s1b / nb / 100, 6)).alias("mean_b"),
        F.round(vag, 6).alias("var_a"),
        F.round(vbg, 6).alias("var_b"),
        F.when(both, F.when(se2 > 0, F.round(t, 6))).alias("t_stat"),
        F.when(both, F.when(dfden > 0, F.round(df, 6))).alias(
            "df_welch"
        ),
    )


# ------------------------------------------------------------------ #
# a36_mann_whitney
# ------------------------------------------------------------------ #
A36_ORACLE = f"""
WITH v AS (
  SELECT CASE WHEN event_type = '{_GRP_A}' THEN 1 ELSE 2 END AS grp,
         value
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('{_GRP_A}', '{_GRP_B}')),
cv AS (SELECT value, count(*) AS cnt FROM v GROUP BY value),
cr AS (
  SELECT value, cnt,
         2 * (sum(cnt) OVER (ORDER BY value) - cnt) + cnt + 1 AS rank2
  FROM cv
),
gv AS (SELECT grp, value, count(*) AS n_gv FROM v GROUP BY 1, 2),
rg AS (
  SELECT sum(CASE WHEN g.grp = 1 THEN g.n_gv END) AS n1,
         sum(CASE WHEN g.grp = 2 THEN g.n_gv END) AS n2,
         sum(CASE WHEN g.grp = 1
                  THEN CAST(g.n_gv AS HUGEINT) * cr.rank2 END) AS r2_1
  FROM gv g JOIN cr ON cr.value = g.value
),
tie AS (
  SELECT sum(CAST(cnt AS DECIMAL(12,0)) * CAST(cnt AS DECIMAL(12,0))
             * CAST(cnt AS DECIMAL(12,0)) - cnt) AS tsum
  FROM cv)
SELECT CAST(coalesce(n1, 0) AS BIGINT) AS n_a,
       CAST(coalesce(n2, 0) AS BIGINT) AS n_b,
       CASE WHEN coalesce(n1, 0) > 0 AND coalesce(n2, 0) > 0
            THEN CAST(r2_1 - n1 * (n1 + 1) AS DOUBLE) / 2.0e0
       END AS u_stat,
       CASE WHEN coalesce(n1, 0) > 0 AND coalesce(n2, 0) > 0 THEN
         CASE WHEN (CAST(n1 AS DOUBLE) * n2 / 12.0e0)
                   * ((n1 + n2 + 1)
                      - CAST(tie.tsum AS DOUBLE)
                        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))) > 0
              THEN round(
                (CAST(r2_1 - n1 * (n1 + 1) AS DOUBLE)
                 - CAST(n1 AS DOUBLE) * n2)
                / (2.0e0 * sqrt(
                     (CAST(n1 AS DOUBLE) * n2 / 12.0e0)
                     * ((n1 + n2 + 1)
                        - CAST(tie.tsum AS DOUBLE)
                          / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))),
                6) END
       END AS z
FROM rg, tie
"""


@query("a36_mann_whitney", A36_ORACLE)
def a36_mann_whitney(spark, sf_dir):
    """Mann-Whitney U (rank-sum) between two event types, exact
    tie-averaged ranks, tie-corrected normal z.

    Scale shape: ranks come from the value-DISTINCT table (bounded by
    measurement resolution, not rows — the a32 move), so there is no
    global per-row sort; the per-row work is one join keyed on value.
    The doubled-rank sum r2_1 accumulates as DECIMAL(38,0) on the
    Spark side and HUGEINT in the oracle (r8 advice fix: a LONG
    accumulator would *raise* under ANSI past ~1e9 qualifying rows
    while DuckDB's sum-promotion kept succeeding — an asymmetric
    exception-vs-result divergence, not just wrong numbers); the
    only floats are the final z expression.
    """
    v = (
        table(spark, sf_dir, "events")
        .where(
            F.col("value").isNotNull()
            & F.col("event_type").isin(_GRP_A, _GRP_B)
        )
        .select(
            F.when(F.col("event_type") == _GRP_A, 1)
            .otherwise(2)
            .alias("grp"),
            "value",
        )
    )
    cv = v.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("value").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cr = cv.select(
        "value",
        "cnt",
        (
            2 * (F.sum("cnt").over(w) - F.col("cnt"))
            + F.col("cnt")
            + 1
        ).alias("rank2"),
    )
    gv = v.groupBy("grp", "value").agg(F.count(F.lit(1)).alias("n_gv"))
    rg = gv.join(cr, "value").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("n_gv"))).alias("n1"),
        F.sum(F.when(F.col("grp") == 2, F.col("n_gv"))).alias("n2"),
        F.sum(
            F.when(
                F.col("grp") == 1,
                F.col("n_gv").cast("decimal(18,0)")
                * F.col("rank2").cast("decimal(19,0)"),
            )
        ).alias("r2_1"),
    )
    cnt_dec = F.col("cnt").cast("decimal(12,0)")
    tie = cv.agg(
        F.sum(cnt_dec * cnt_dec * cnt_dec - F.col("cnt")).alias("tsum")
    )
    n1 = F.coalesce(F.col("n1"), F.lit(0))
    n2 = F.coalesce(F.col("n2"), F.lit(0))
    u2 = (
        F.col("r2_1")
        - F.col("n1").cast("decimal(19,0)") * (F.col("n1") + 1)
    ).cast("double")
    sigma2 = (F.col("n1").cast("double") * F.col("n2") / F.lit(12.0)) * (
        (F.col("n1") + F.col("n2") + 1)
        - F.col("tsum").cast("double")
        / (
            (F.col("n1") + F.col("n2")).cast("double")
            * (F.col("n1") + F.col("n2") - 1)
        )
    )
    z = (u2 - F.col("n1").cast("double") * F.col("n2")) / (
        F.lit(2.0) * F.sqrt(sigma2)
    )
    defined = (n1 > 0) & (n2 > 0)
    # nested when: sigma2's divisor (n1+n2)(n1+n2-1) is only nonzero
    # under `defined`, and ANSI mode raises on /0 even in conditions
    return rg.crossJoin(F.broadcast(tie)).select(
        n1.cast("long").alias("n_a"),
        n2.cast("long").alias("n_b"),
        F.when(defined, u2 / F.lit(2.0)).alias("u_stat"),
        F.when(defined, F.when(sigma2 > 0, F.round(z, 6))).alias("z"),
    )


# ------------------------------------------------------------------ #
# a37_levene_bf
# ------------------------------------------------------------------ #
A37_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
gv AS (SELECT event_type, x, count(*) AS n_gv FROM c GROUP BY 1, 2),
cum AS (
  SELECT event_type, x, n_gv,
         sum(n_gv) OVER (PARTITION BY event_type ORDER BY x) AS cumn
  FROM gv
),
ng AS (SELECT event_type, sum(n_gv) AS n_g FROM gv GROUP BY 1),
med AS (
  SELECT cu.event_type, min(cu.x) AS med_x
  FROM cum cu JOIN ng ON ng.event_type = cu.event_type
  WHERE cu.cumn >= (ng.n_g + 1) // 2
  GROUP BY cu.event_type
),
zg AS (
  SELECT g.event_type,
         sum(g.n_gv) AS n_g,
         sum(CAST(abs(g.x - m.med_x) AS DECIMAL(38,0)) * g.n_gv) AS s_g,
         sum(CAST(abs(g.x - m.med_x) AS DECIMAL(19,0))
             * CAST(abs(g.x - m.med_x) AS DECIMAL(19,0)) * g.n_gv) AS q_g
  FROM gv g JOIN med m ON m.event_type = g.event_type
  GROUP BY g.event_type
),
tot AS (
  SELECT count(*) AS k, sum(n_g) AS n,
         CAST(sum(s_g) AS DOUBLE) AS sz
  FROM zg
),
folds AS (
  SELECT
    list_reduce(
      list(CAST(n_g AS DOUBLE)
           * (CAST(s_g AS DOUBLE) / n_g - tot.sz / tot.n)
           * (CAST(s_g AS DOUBLE) / n_g - tot.sz / tot.n)
           ORDER BY event_type),
      (a, b) -> a + b) AS between_ss,
    list_reduce(
      list(CAST(q_g AS DOUBLE)
           - (CAST(s_g AS DOUBLE) / n_g) * CAST(s_g AS DOUBLE)
           ORDER BY event_type),
      (a, b) -> a + b) AS within_ss
  FROM zg, tot
)
SELECT CAST(tot.n AS BIGINT) AS n, CAST(tot.k AS BIGINT) AS k,
       CASE WHEN tot.k >= 2 AND tot.n > tot.k AND folds.within_ss > 0
            THEN round((CAST(tot.n - tot.k AS DOUBLE) / (tot.k - 1))
                       * folds.between_ss / folds.within_ss, 6)
       END AS w_stat
FROM tot, folds
"""


@query("a37_levene_bf", A37_ORACLE)
def a37_levene_bf(spark, sf_dir):
    """Brown-Forsythe variance-homogeneity test across event types:
    the Levene W statistic on absolute deviations from each group's
    exact MEDIAN (the robust variant).

    Scale shape: per-group medians come from the value-distinct
    cumulative table (grid-sized, the a27 move — the (n_g+1) DIV 2
    lower median stays ON the 2-decimal grid so |x − med| is an exact
    integer); the deviation sums fold per (group, value) — never per
    row; the final W folds k ≈ 5 per-group float terms in event-type
    order on both engines.
    """
    x = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    c = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", x.alias("x"))
    )
    # the value-distinct count table feeds THREE branches (cumulative
    # median, group sizes, deviation sums) — materialize the
    # grid-sized table once instead of re-running the corpus
    # aggregation under each (9 scans -> 2 in the plan)
    gv = (
        c.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("n_gv"))
        .localCheckpoint(eager=False)
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = gv.select(
        "event_type", "x", "n_gv", F.sum("n_gv").over(w).alias("cumn")
    )
    ng = gv.groupBy("event_type").agg(F.sum("n_gv").alias("n_g"))
    med = (
        cum.join(F.broadcast(ng), "event_type")
        .where(
            F.col("cumn") >= F.expr("(n_g + 1) div 2")
        )
        .groupBy("event_type")
        .agg(F.min("x").alias("med_x"))
    )
    zdev = F.abs(F.col("x") - F.col("med_x"))
    zg = (
        gv.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum("n_gv").alias("n_g"),
            F.sum(
                zdev.cast("decimal(38,0)") * F.col("n_gv")
            ).alias("s_g"),
            F.sum(
                zdev.cast("decimal(19,0)")
                * zdev.cast("decimal(19,0)")
                * F.col("n_gv")
            ).alias("q_g"),
        )
    )
    tot = zg.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").cast("double").alias("sz"),
    )
    # fold the k per-group float terms in event-type order (sfold)
    folded = (
        zg.crossJoin(F.broadcast(tot))
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "event_type",
                                (
                                    F.col("n_g").cast("double")
                                    * (
                                        F.col("s_g").cast("double")
                                        / F.col("n_g")
                                        - F.col("sz") / F.col("n")
                                    )
                                    * (
                                        F.col("s_g").cast("double")
                                        / F.col("n_g")
                                        - F.col("sz") / F.col("n")
                                    )
                                ).alias("bt"),
                                (
                                    F.col("q_g").cast("double")
                                    - (
                                        F.col("s_g").cast("double")
                                        / F.col("n_g")
                                    )
                                    * F.col("s_g").cast("double")
                                ).alias("wt"),
                            )
                        )
                    ),
                    lambda s: F.struct(
                        s["bt"].alias("bt"), s["wt"].alias("wt")
                    ),
                ),
                F.struct(
                    F.lit(0.0).alias("bt"), F.lit(0.0).alias("wt")
                ),
                lambda a, b: F.struct(
                    (a["bt"] + b["bt"]).alias("bt"),
                    (a["wt"] + b["wt"]).alias("wt"),
                ),
            ).alias("f")
        )
        .select(
            F.col("f.bt").alias("between_ss"),
            F.col("f.wt").alias("within_ss"),
        )
    )
    out = tot.crossJoin(F.broadcast(folded))
    defined = (
        (F.col("k") >= 2)
        & (F.col("n") > F.col("k"))
        & (F.col("within_ss") > 0)
    )
    w_stat = (
        (F.col("n") - F.col("k")).cast("double") / (F.col("k") - 1)
    ) * F.col("between_ss") / F.col("within_ss")
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.when(defined, F.round(w_stat, 6)).alias("w_stat"),
    )


# ------------------------------------------------------------------ #
# a38_effect_sizes
# ------------------------------------------------------------------ #
A38_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS s1,
         CAST(sum(CAST(x AS DECIMAL(19,0))
                  * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS s2
  FROM c GROUP BY event_type),
-- pooled variance materializes only under the n >= 2 guards (nested
-- CASE), so no divisor is ever zero on degenerate corpora
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.n AS n_a, b.n AS n_b, a.s1 AS s1a, b.s1 AS s1b,
         CASE WHEN a.n >= 2 AND b.n >= 2
              THEN ((a.n - 1) * ((a.s2 - (a.s1 / a.n) * a.s1)
                                 / (a.n - 1) / 10000)
                    + (b.n - 1) * ((b.s2 - (b.s1 / b.n) * b.s1)
                                   / (b.n - 1) / 10000))
                   / (a.n + b.n - 2) END AS pooled
  FROM s a JOIN s b ON a.event_type < b.event_type)
SELECT type_a, type_b, n_a, n_b,
       CASE WHEN n_a > 0 THEN round(s1a / n_a / 100, 6) END AS mean_a,
       CASE WHEN n_b > 0 THEN round(s1b / n_b / 100, 6) END AS mean_b,
       CASE WHEN pooled > 0
            THEN round(((s1a / n_a - s1b / n_b) / 100) / sqrt(pooled), 6)
       END AS cohens_d,
       CASE WHEN pooled > 0
            THEN round((((s1a / n_a - s1b / n_b) / 100) / sqrt(pooled))
                       * (1 - 3.0e0 / (4 * (n_a + n_b) - 9)), 6)
       END AS hedges_g
FROM p
"""


@query("a38_effect_sizes", A38_ORACLE)
def a38_effect_sizes(spark, sf_dir):
    """Pairwise Cohen's d and Hedges' g between all event-type pairs.

    Scale shape: ONE per-group power-sum aggregate (k rows), then a
    k×k broadcast self-join — the corpus is scanned once no matter
    how many pairs are reported.
    """
    x = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    c = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", x.alias("x"))
    )
    xd = F.col("x").cast("decimal(19,0)")
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(xd * xd).cast("double").alias("s2"),
    )
    a = s.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        F.col("s1").alias("s1a"),
        F.col("s2").alias("s2a"),
    )
    b = s.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        F.col("s1").alias("s1b"),
        F.col("s2").alias("s2b"),
    )
    j = a.join(
        F.broadcast(b), F.col("type_a") < F.col("type_b")
    )
    na, nb = F.col("na"), F.col("nb")
    s1a, s2a = F.col("s1a"), F.col("s2a")
    s1b, s2b = F.col("s1b"), F.col("s2b")
    va = (s2a - (s1a / na) * s1a) / (na - 1) / 10000
    vb = (s2b - (s1b / nb) * s1b) / (nb - 1) / 10000
    pooled_expr = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    p = j.select(
        "type_a",
        "type_b",
        na.alias("n_a"),
        nb.alias("n_b"),
        s1a.alias("s1a"),
        s1b.alias("s1b"),
        F.when((na >= 2) & (nb >= 2), pooled_expr).alias("pooled"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    pooled = F.col("pooled")
    d = ((F.col("s1a") / n_a - F.col("s1b") / n_b) / 100) / F.sqrt(
        pooled
    )
    g = d * (1 - F.lit(3.0) / (4 * (n_a + n_b) - 9))
    return p.select(
        "type_a",
        "type_b",
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        F.when(n_a > 0, F.round(F.col("s1a") / n_a / 100, 6)).alias(
            "mean_a"
        ),
        F.when(n_b > 0, F.round(F.col("s1b") / n_b / 100, 6)).alias(
            "mean_b"
        ),
        F.when(pooled > 0, F.round(d, 6)).alias("cohens_d"),
        F.when(pooled > 0, F.round(g, 6)).alias("hedges_g"),
    )


# ------------------------------------------------------------------ #
# a39_bootstrap_ci — deterministic Poisson bootstrap
# ------------------------------------------------------------------ #
_B_REPS = 24
# quantized Poisson(1) pmf over 256 hash buckets:
# P(0)=P(1)=e^-1≈94/256, P(2)≈47/256, P(3)≈16/256, tail→4
_W_T0, _W_T1, _W_T2, _W_T3 = 94, 188, 235, 251

# one md5 per (row, hash-group) yields TWELVE replicate weights (one
# hex byte-pair per replicate slot), so B=24 costs 2 hashes per row,
# not 24 — the hashing is the bootstrap's only per-row CPU at scale
_A39_H = "md5(CAST(event_id AS VARCHAR) || ':' || CAST(t.b // 12 AS VARCHAR))"
_A39_BYTE = (
    f"((instr('{_HEX}', substr({_A39_H}, 2 * (t.b % 12) + 1, 1)) - 1) * 16"
    f" + (instr('{_HEX}', substr({_A39_H}, 2 * (t.b % 12) + 2, 1)) - 1))"
)

A39_ORACLE = f"""
WITH c AS (
  SELECT event_type, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
pt AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS s1
  FROM c GROUP BY event_type),
wts AS (
  SELECT c.event_type, t.b, c.x,
         CASE WHEN {_A39_BYTE} < {_W_T0} THEN 0
              WHEN {_A39_BYTE} < {_W_T1} THEN 1
              WHEN {_A39_BYTE} < {_W_T2} THEN 2
              WHEN {_A39_BYTE} < {_W_T3} THEN 3
              ELSE 4 END AS w
  FROM c, range({_B_REPS}) t(b)),
rep AS (
  SELECT event_type, b,
         CAST(sum(CAST(w AS DECIMAL(38,0)) * x) AS DOUBLE) AS swx,
         sum(w) AS sw
  FROM wts GROUP BY event_type, b
),
rm AS (
  SELECT event_type, b, swx / sw / 100 AS mean_b,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY swx / sw / 100, b) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_reps
  FROM rep WHERE sw > 0
)
SELECT pt.event_type, CAST(pt.n AS BIGINT) AS n,
       round(pt.s1 / pt.n / 100, 6) AS mean,
       round(lo.mean_b, 6) AS boot_lo,
       round(hi.mean_b, 6) AS boot_hi,
       CAST(lo.n_reps AS BIGINT) AS n_reps
FROM pt
JOIN rm lo ON lo.event_type = pt.event_type AND lo.rn = 2
JOIN rm hi ON hi.event_type = pt.event_type AND hi.rn = lo.n_reps - 1
"""


@query("a39_bootstrap_ci", A39_ORACLE)
def a39_bootstrap_ci(spark, sf_dir):
    """Poisson-bootstrap percentile CI for each event type's mean.

    Each of B=24 replicates reweights every row by a
    DETERMINISTIC quantized-Poisson(1) weight — a 256-bucket md5 hash
    of (event_id, replicate) thresholded at the Poisson(1) pmf — so a
    "resample with replacement" becomes one weighted aggregation.
    This is the bootstrap that runs at 100 TB: no index-based
    resampling, no per-replicate data copy, just B weighted partial
    aggregations sharing one corpus scan (Chamandy et al. 2012). The
    interval is the (2, B−1) order-statistic band of the replicate
    means.

    Scale shape: the explode is B× rows into a map stage feeding ONE
    partial-agg shuffle of B×k cells; replicate means and order
    statistics are k×B-sized — driver-free, corpus-scan count: 2.
    """
    x = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    # event_id participates in the replicate hash: a NULL id would be
    # silently skipped by concat_ws on the Spark side but NULL-propagate
    # through the oracle's `||` (→ ELSE weight) — filter it in BOTH
    # engines so the weight function is identical (r8 advice fix)
    c = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select("event_type", "event_id", x.alias("x"))
    )
    pt = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("s1"),
    )
    # two md5s computed BEFORE the explode (one per 12-replicate
    # hash group); after the explode each replicate reads its own
    # byte-pair slot — 2 hashes per corpus row instead of 24
    hashed = c.select(
        "event_type",
        "x",
        F.md5(
            F.concat_ws(":", F.col("event_id").cast("string"), F.lit("0"))
        ).alias("h0"),
        F.md5(
            F.concat_ws(":", F.col("event_id").cast("string"), F.lit("1"))
        ).alias("h1"),
    )
    hh = F.conv(
        F.expr(
            "substring(CASE WHEN b < 12 THEN h0 ELSE h1 END,"
            " 2 * pmod(b, 12) + 1, 2)"
        ),
        16,
        10,
    ).cast("int")
    wts = hashed.select(
        "event_type",
        "x",
        "h0",
        "h1",
        F.explode(F.sequence(F.lit(0), F.lit(_B_REPS - 1))).alias("b"),
    ).select(
        "event_type",
        "b",
        "x",
        F.when(hh < _W_T0, 0)
        .when(hh < _W_T1, 1)
        .when(hh < _W_T2, 2)
        .when(hh < _W_T3, 3)
        .otherwise(4)
        .alias("w"),
    )
    rep = wts.groupBy("event_type", "b").agg(
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("swx"),
        F.sum("w").alias("sw"),
    )
    ww = Window.partitionBy("event_type").orderBy(
        F.col("mean_b"), F.col("b")
    )
    wc = Window.partitionBy("event_type")
    rm = (
        rep.where(F.col("sw") > 0)
        .select(
            "event_type",
            "b",
            (F.col("swx") / F.col("sw") / 100).alias("mean_b"),
        )
        .select(
            "event_type",
            "mean_b",
            F.row_number().over(ww).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_reps"),
        )
    )
    # ONE conditional aggregation picks both order statistics: the
    # former separate lo/hi branches each re-executed the whole
    # B×-exploded weighted-replicate aggregation (Spark plans are
    # trees), doubling the dominant stage. max(when(...)) over the
    # per-(event_type) band rows selects exactly the rn==2 and
    # rn==n_reps-1 values the branches did.
    band = (
        rm.groupBy("event_type")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("mean_b"))).alias(
                "lo_m"
            ),
            F.max(
                F.when(
                    F.col("rn") == F.col("n_reps") - 1, F.col("mean_b")
                )
            ).alias("hi_m"),
            F.max("n_reps").alias("n_reps"),
        )
        # n_reps == 1 leaves both picks NULL; the former inner joins
        # dropped such groups — keep that contract
        .where(F.col("lo_m").isNotNull() & F.col("hi_m").isNotNull())
    )
    return (
        pt.join(F.broadcast(band), "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("s1") / F.col("n") / 100, 6).alias("mean"),
            F.round("lo_m", 6).alias("boot_lo"),
            F.round("hi_m", 6).alias("boot_hi"),
            F.col("n_reps").cast("long").alias("n_reps"),
        )
    )


# ------------------------------------------------------------------ #
# t_cooccur_pmi — windowed token co-occurrence PMI
# ------------------------------------------------------------------ #
_PMI_WIN = 2  # co-occurrence window: positions 1..2 apart
_PMI_MIN_N = 5
_PMI_TOPK = 20
_PMI_MAX_CELLS = 65536  # vocab² contract (same as t_js_divergence)

_PMI_PAIRS_SQL = f"""
tok AS (
  SELECT doc_id, pos, ws[pos + 1] AS w
  FROM (
    SELECT doc_id, ws, unnest(range(len(ws))) AS pos
    FROM (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)),
                                         '\\s+', ' ', 'g'), ' ') AS ws
      FROM documents))
  WHERE ws[pos + 1] <> ''
),
pc AS (
  SELECT least(a.w, b.w) AS ta, greatest(a.w, b.w) AS tb,
         count(*) AS n_pair
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id
   AND b.pos - a.pos BETWEEN 1 AND {_PMI_WIN}
  GROUP BY 1, 2
)"""

PMI_ORACLE = f"""
WITH {_PMI_PAIRS_SQL},
marg AS (
  SELECT w, sum(n_pair) AS m FROM (
    SELECT ta AS w, n_pair FROM pc
    UNION ALL
    SELECT tb AS w, n_pair FROM pc
  ) GROUP BY w
),
tot AS (SELECT sum(n_pair) AS t FROM pc),
scored AS (
  SELECT pc.ta, pc.tb, pc.n_pair,
         round(ln(CAST(pc.n_pair AS DOUBLE) * (2 * tot.t)
                  / (CAST(ma.m AS DOUBLE) * mb.m)), 6) AS pmi
  FROM pc
  JOIN marg ma ON ma.w = pc.ta
  JOIN marg mb ON mb.w = pc.tb, tot
  WHERE pc.n_pair >= {_PMI_MIN_N}
)
SELECT ta AS tok_a, tb AS tok_b, CAST(n_pair AS BIGINT) AS n_pair, pmi,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, ta, tb) AS rnk
  FROM scored
) WHERE rnk <= {_PMI_TOPK}
"""


@query("t_cooccur_pmi", PMI_ORACLE)
def t_cooccur_pmi(spark, sf_dir, exact=True, max_cells=None):
    """Pointwise mutual information of token pairs co-occurring
    within a ±2-position window (Church & Hanks 1990) — the
    association statistic feeding collocation mining, feature
    engineering, and embedding sanity checks. PMI uses the symmetric
    convention pmi = ln(n_ab · 2T / (m_a · m_b)) with marginals from
    the pair table itself.

    Exact mode (default, the registered/oracled path): the ln() fold
    runs DRIVER-side on the ≤{_PMI_MAX_CELLS}-cell pair table with
    CPython libm (bit-identical to DuckDB's ln — the t_zipf_slope /
    t_js_divergence precedent); past the contract bound it raises
    rather than collecting a corpus-sized table.

    ``exact=False`` is the coded escape hatch for past-contract pair
    vocabularies (the r7-verdict scale-killer): marginals are computed
    RELATIONALLY (pair counts unpivoted → one word-keyed partial agg,
    joined back on each side's word), the scalar pair total rides a
    broadcast, and ln+round run in a vectorized pandas_udf; top-k is a
    distributed TakeOrdered, never a single-partition window. The
    driver holds O(k) state regardless of vocabulary. Same statistic
    to float-noise (numpy libm vs CPython libm agree on every cell in
    the tolerance tests); compared cell-by-cell against exact mode AND
    against DuckDB on a past-contract synthetic corpus in
    tests/test_hardening_r8.py.

    Scale shape: tokenize+posexplode is map-only; the windowed
    self-join is keyed on doc_id with a ≤2-position band, so work is
    Σ len(doc)·window — linear in corpus tokens; the pair table is
    vocabulary²-bounded; the exact=False scoring adds two word-keyed
    joins (AQE broadcasts the marginal side when it fits) and one
    top-k reduction.
    """
    import math

    from ..functions.textfns import tokens

    docs = table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.posexplode(tokens(F.col("text"))).alias("pos", "w"),
        )
        .where(F.col("w") != "")
    )
    a = tok.select("doc_id", F.col("pos").alias("pa"), F.col("w").alias("wa"))
    b = tok.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pb"),
        F.col("w").alias("wb"),
    )
    pc = (
        a.join(
            b,
            (a.doc_id == F.col("doc_b"))
            & (F.col("pb") - F.col("pa") >= 1)
            & (F.col("pb") - F.col("pa") <= _PMI_WIN),
        )
        .groupBy(
            F.least("wa", "wb").alias("ta"),
            F.greatest("wa", "wb").alias("tb"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    if not exact:
        return _cooccur_pmi_distributed(pc)
    cells = max_cells if max_cells is not None else _PMI_MAX_CELLS
    rows = pc.limit(cells + 1).collect()
    if len(rows) > cells:
        raise ValueError(
            f"t_cooccur_pmi: pair table exceeds the "
            f"{cells}-cell driver contract; rerun with "
            "exact=False (distributed marginal joins + pandas_udf "
            "scoring, tolerance-compare instead of hash-compare)"
        )
    total = sum(r["n_pair"] for r in rows)
    marg: dict[str, int] = {}
    for r in rows:
        marg[r["ta"]] = marg.get(r["ta"], 0) + r["n_pair"]
        marg[r["tb"]] = marg.get(r["tb"], 0) + r["n_pair"]
    scored = [
        (
            r["ta"],
            r["tb"],
            r["n_pair"],
            round_half_away(
                math.log(
                    float(r["n_pair"])
                    * (2 * total)
                    / (float(marg[r["ta"]]) * marg[r["tb"]])
                ),
                6,
            ),
        )
        for r in rows
        if r["n_pair"] >= _PMI_MIN_N
    ]
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    out = [
        (ta, tb, n, p, i + 1)
        for i, (ta, tb, n, p) in enumerate(scored[:_PMI_TOPK])
    ]
    return spark.createDataFrame(
        out,
        "tok_a string, tok_b string, n_pair long, pmi double, rnk int",
    )


def _cooccur_pmi_distributed(pc):
    """Distributed PMI scoring over a past-contract pair table.

    Marginals come from ONE word-keyed partial aggregation of the
    unpivoted pair counts (each (ta,tb,n) contributes n to both
    words), joined back on each side's word — vocabulary-sized
    shuffles, never driver-sized collects. The scalar total rides a
    1-row broadcast. ln + half-away rounding run vectorized in a
    pandas_udf (numpy libm). Top-k is orderBy().limit(k) — Spark
    plans TakeOrderedAndProject, a per-partition heap + k-row merge,
    NOT a single-partition global sort; ranks are then numbered on
    the k-row result.
    """
    import numpy as np
    import pandas as pd

    @F.pandas_udf("double")
    def _pmi6(arg: pd.Series) -> pd.Series:
        v = np.log(arg.to_numpy(dtype=float))
        return pd.Series(
            np.copysign(np.floor(np.abs(v * 1e6) + 0.5), v) / 1e6
        )

    marg = (
        pc.select(F.col("ta").alias("w"), "n_pair")
        .unionByName(pc.select(F.col("tb").alias("w"), "n_pair"))
        .groupBy("w")
        .agg(F.sum("n_pair").alias("m"))
    )
    tot = pc.agg(F.sum("n_pair").alias("t"))
    scored = (
        pc.where(F.col("n_pair") >= _PMI_MIN_N)
        .join(marg.select(F.col("w").alias("ta"), F.col("m").alias("ma")), "ta")
        .join(marg.select(F.col("w").alias("tb"), F.col("m").alias("mb")), "tb")
        .crossJoin(F.broadcast(tot))
        .select(
            "ta",
            "tb",
            "n_pair",
            _pmi6(
                F.col("n_pair").cast("double")
                * (2 * F.col("t"))
                / (F.col("ma").cast("double") * F.col("mb"))
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(
        F.desc("pmi"), F.asc("ta"), F.asc("tb")
    ).limit(_PMI_TOPK)
    w = Window.orderBy(F.desc("pmi"), F.asc("ta"), F.asc("tb"))
    return top.select(
        F.col("ta").alias("tok_a"),
        F.col("tb").alias("tok_b"),
        F.col("n_pair").cast("long").alias("n_pair"),
        "pmi",
        F.row_number().over(w).cast("int").alias("rnk"),
    )


# ------------------------------------------------------------------ #
# t_heaps_law — vocabulary-growth (Heaps/Herdan) fit
# ------------------------------------------------------------------ #
_HEAPS_POINTS = 8

HEAPS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)),
                                     '\\s+', ' ', 'g'), ' ')) AS w
  FROM documents
),
tk AS (SELECT doc_id, w FROM tok WHERE w <> ''),
vfirst AS (SELECT w, min(doc_id) AS first_id FROM tk GROUP BY w),
dcnt AS (SELECT doc_id, count(*) AS cnt FROM tk GROUP BY doc_id),
mx AS (SELECT max(doc_id) AS mid FROM dcnt),
ck AS (
  -- empty corpus => zero checkpoint rows on both engines
  SELECT CAST(i + 1 AS INT) AS i,
         ((i + 1) * mx.mid) // {_HEAPS_POINTS} AS t
  FROM range({_HEAPS_POINTS}) r(i), mx WHERE mx.mid IS NOT NULL
),
pts AS (
  SELECT ck.i, ck.t,
         (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM dcnt
          WHERE doc_id <= ck.t) AS n_tokens,
         (SELECT CAST(count(*) AS BIGINT) FROM vfirst
          WHERE first_id <= ck.t) AS vocab
  FROM ck
),
xy AS (
  SELECT i, t, n_tokens, vocab,
         ln(CAST(n_tokens AS DOUBLE)) AS x,
         ln(CAST(vocab AS DOUBLE)) AS y
  FROM pts WHERE n_tokens > 0 AND vocab > 0
),
m AS (
  SELECT count(*) AS k,
         list_reduce(list(x ORDER BY i), (a, b) -> a + b) / count(*)
           AS xbar,
         list_reduce(list(y ORDER BY i), (a, b) -> a + b) / count(*)
           AS ybar
  FROM xy
),
dev AS (
  SELECT m.k,
         list_reduce(list((x - xbar) * (y - ybar) ORDER BY i),
                     (a, b) -> a + b) AS sxy,
         list_reduce(list((x - xbar) * (x - xbar) ORDER BY i),
                     (a, b) -> a + b) AS sxx,
         any_value(xbar) AS xbar, any_value(ybar) AS ybar
  FROM xy, m GROUP BY m.k
)
SELECT p.i, CAST(p.t AS BIGINT) AS threshold_id, p.n_tokens, p.vocab,
       CASE WHEN dev.k >= 2 AND dev.sxx > 0
            THEN round(dev.sxy / dev.sxx, 6) END AS beta,
       CASE WHEN dev.k >= 2 AND dev.sxx > 0
            THEN round(dev.ybar - (dev.sxy / dev.sxx) * dev.xbar, 6)
       END AS ln_k
FROM pts p, dev
"""


@query("t_heaps_law", HEAPS_ORACLE)
def t_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit: V(N) ≈ K·N^β from 8 corpus
    prefixes (by doc_id), the planning curve for tokenizer/vocab
    sizing as a corpus scales — β well below 1 means new data stops
    buying new vocabulary.

    Scale shape: vocabulary growth WITHOUT rescanning per prefix —
    one vocab-sized first-seen table (min doc_id per word) and one
    docs-sized per-doc token count; each prefix point is then a
    conditional aggregate over those two small tables, and the 8-point
    log-log OLS folds driver-side with CPython libm (bit-identical to
    DuckDB ln — the t_zipf_slope precedent).
    """
    import math

    from ..functions.textfns import tokens

    docs = table(spark, sf_dir, "documents")
    tk = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("w")
        )
        .where(F.col("w") != "")
    )
    vfirst = tk.groupBy("w").agg(F.min("doc_id").alias("first_id"))
    dcnt = tk.groupBy("doc_id").agg(F.count(F.lit(1)).alias("cnt"))
    mid_row = dcnt.agg(F.max("doc_id").alias("mid")).collect()
    mid = mid_row[0]["mid"] if mid_row else None
    pts = []
    if mid is not None:
        thresholds = [
            (i + 1, ((i + 1) * mid) // _HEAPS_POINTS)
            for i in range(_HEAPS_POINTS)
        ]
        nt = dcnt.agg(
            *[
                F.sum(F.when(F.col("doc_id") <= t, F.col("cnt")))
                .alias(f"n{i}")
                for i, t in thresholds
            ]
        ).collect()[0]
        vc = vfirst.agg(
            *[
                F.count(F.when(F.col("first_id") <= t, 1)).alias(
                    f"v{i}"
                )
                for i, t in thresholds
            ]
        ).collect()[0]
        pts = [
            (i, t, int(nt[f"n{i}"] or 0), int(vc[f"v{i}"]))
            for i, t in thresholds
        ]
    xy = [
        (i, math.log(float(n)), math.log(float(v)))
        for i, _, n, v in pts
        if n > 0 and v > 0
    ]
    beta = lnk = None
    if len(xy) >= 2:
        k = len(xy)
        xbar = sum(x for _, x, _ in xy) / k
        ybar = sum(y for _, _, y in xy) / k
        sxy = sum((x - xbar) * (y - ybar) for _, x, y in xy)
        sxx = sum((x - xbar) * (x - xbar) for _, x, _ in xy)
        if sxx > 0:
            beta = round_half_away(sxy / sxx, 6)
            lnk = round_half_away(ybar - (sxy / sxx) * xbar, 6)
    rows = [
        (i, t, n, v, beta, lnk) for i, t, n, v in pts
    ]
    return spark.createDataFrame(
        rows,
        "i int, threshold_id long, n_tokens long, vocab long,"
        " beta double, ln_k double",
    )


# ------------------------------------------------------------------ #
# e_cohort_ltv — acquisition-cohort revenue matrix
# ------------------------------------------------------------------ #
COHORT_ORACLE = """
WITH d AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dd,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
p AS (
  -- floor (not truncate-toward-zero) week binning via the pmod
  -- spelling, matching the repo's hour-index convention: pre-1970
  -- days -6..-1 land in week -1, not folded into a 13-day week 0
  SELECT user_id,
         CAST((dd - ((dd % 7 + 7) % 7)) // 7 AS BIGINT) AS wk, v
  FROM d
),
first AS (SELECT user_id, min(wk) AS w0 FROM p GROUP BY user_id)
SELECT strftime(DATE '1970-01-01' + CAST(f.w0 * 7 AS INT), '%Y-%m-%d')
         AS cohort_week,
       CAST(p.wk - f.w0 AS INT) AS week_offset,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users,
       CAST(sum(p.v) AS DOUBLE) AS revenue
FROM p JOIN first f ON f.user_id = p.user_id
GROUP BY f.w0, p.wk - f.w0
"""


@query("e_cohort_ltv", COHORT_ORACLE)
def e_cohort_ltv(spark, sf_dir):
    """Acquisition-cohort revenue matrix: users cohorted by first
    purchase WEEK, revenue and active-buyer counts by weeks since
    acquisition — the LTV table every retention analysis starts from
    (w18's user-retention generalized to revenue).

    Scale shape: one per-user min (users-sized, broadcast back), one
    (cohort, offset) partial aggregation; revenue sums in exact
    DECIMAL so partial-agg order can't leak into the hash.
    """
    p = (
        table(spark, sf_dir, "events")
        .where(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .select(
            "user_id",
            F.expr(
                "CAST((datediff(CAST(ts AS DATE), DATE'1970-01-01')"
                " - pmod(datediff(CAST(ts AS DATE), DATE'1970-01-01'), 7))"
                " div 7 AS BIGINT)"
            ).alias("wk"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
    )
    first = p.groupBy("user_id").agg(F.min("wk").alias("w0"))
    return (
        p.join(F.broadcast(first), "user_id")
        .groupBy("w0", (F.col("wk") - F.col("w0")).alias("off"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.sum("v").cast("double").alias("revenue"),
        )
        .select(
            F.date_format(
                F.date_add(
                    F.lit("1970-01-01").cast("date"),
                    (F.col("w0") * 7).cast("int"),
                ),
                "yyyy-MM-dd",
            ).alias("cohort_week"),
            F.col("off").cast("int").alias("week_offset"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("revenue").alias("revenue"),
        )
    )
