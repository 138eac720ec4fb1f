"""Round-4 pipeline-engineering depth: length-matched control
sampling (eval-set construction), heavy-hitter-corrected join
cardinality estimation (the planner-statistics primitive), embedding
distribution drift between ingest shards, and a Benford leading-digit
audit (numeric data-quality screening).

Every query has an exact DuckDB oracle; divisions are floor integer
division on non-negative values or round(...,6) after a deterministic
fold, per the repo's determinism rules. The reference has no analog
surface — these are beyond-reference additions (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from .common import table


# --------------------------------------------------------------------
# Length-matched control sampling: for every treatment doc (source =
# 'src0') pick the control-pool doc (any other source, same lang)
# with the greatest composite match key m = n_chars*1e9 + doc_id that
# is <= the treatment's own m — a backward as-of match on document
# length with a built-in deterministic tie-break (doc_id makes m
# unique). Used to build length-balanced eval/control sets so a
# quality comparison isn't confounded by doc length.
#
# Spark plan: union-tag both sides, ONE window per lang ordered by
# (m, side) carrying last(control m, ignorenulls) — O(n log n) per
# lang partition, the same merge-scan shape as operators/asof.py,
# never treatment x pool. The oracle uses the quadratic join+argmax
# formulation, which is fine at oracle scale.
# --------------------------------------------------------------------
MATCHED_CONTROL_ORACLE = """
WITH t AS (
  SELECT doc_id, lang, n_chars,
         n_chars * 1000000000 + doc_id AS m
  FROM documents WHERE source = 'src0'
),
pool AS (
  SELECT doc_id, lang, n_chars,
         n_chars * 1000000000 + doc_id AS m
  FROM documents WHERE source <> 'src0'
),
best AS (
  SELECT t.doc_id, max(p.m) AS ctrl_m
  FROM t JOIN pool p ON p.lang = t.lang AND p.m <= t.m
  GROUP BY t.doc_id
)
SELECT t.doc_id, t.lang, t.n_chars,
       CAST(best.ctrl_m % 1000000000 AS BIGINT) AS control_doc_id,
       CAST(best.ctrl_m // 1000000000 AS BIGINT) AS control_n_chars
FROM t LEFT JOIN best ON best.doc_id = t.doc_id
"""


@query("p_matched_control", MATCHED_CONTROL_ORACLE)
def p_matched_control(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        "source",
        (F.col("n_chars") * F.lit(1000000000) + F.col("doc_id")).alias(
            "m"
        ),
    )
    treat = docs.where(F.col("source") == "src0")
    pool = docs.where(F.col("source") != "src0")
    tagged = treat.select(
        "lang",
        "m",
        F.lit(1).alias("side"),
        "doc_id",
        "n_chars",
        F.lit(None).cast("long").alias("pm"),
    ).unionByName(
        pool.select(
            "lang",
            "m",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast("long").alias("n_chars"),
            F.col("m").alias("pm"),
        )
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("m", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "ctrl_m", F.last("pm", ignorenulls=True).over(w)
        )
        .where(F.col("side") == 1)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            (F.col("ctrl_m") % F.lit(1000000000))
            .cast("long")
            .alias("control_doc_id"),
            F.expr("ctrl_m div 1000000000")
            .cast("long")
            .alias("control_n_chars"),
        )
    )


# --------------------------------------------------------------------
# Heavy-hitter-corrected join cardinality estimation — the statistic
# a planner needs BEFORE running a self-equi-join. True output size
# of lineitem JOIN lineitem ON l_partkey is sum(cnt^2) over keys; the
# estimator spends one top-20 pass (exact cnt^2 for the heavy keys)
# and models the remainder as uniform (rest_rows^2 / rest_keys). One
# aggregation + one TakeOrderedAndProject — never the join itself.
# Reported alongside the exact value and the signed error in ppm, so
# the estimator's quality is itself measured (this corpus is
# near-uniform, making the uniform-tail model nearly exact).
# --------------------------------------------------------------------
JOIN_CARD_ORACLE = """
WITH counts AS (
  SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT key, cnt,
         row_number() OVER (ORDER BY cnt DESC, key) AS rk
  FROM counts
),
heavy AS (
  SELECT sum(CAST(cnt AS HUGEINT) * cnt) AS heavy_pairs,
         sum(cnt) AS heavy_rows,
         count(*) AS heavy_keys
  FROM ranked WHERE rk <= 20
),
tot AS (
  SELECT sum(CAST(cnt AS HUGEINT) * cnt) AS exact_pairs,
         sum(cnt) AS total_rows,
         count(*) AS n_keys
  FROM counts
)
SELECT CAST(n_keys AS BIGINT) AS n_keys,
       CAST(total_rows AS BIGINT) AS total_rows,
       CAST(exact_pairs AS BIGINT) AS exact_pairs,
       CAST(heavy_pairs
            + CASE WHEN n_keys > heavy_keys
                   THEN (CAST(total_rows - heavy_rows AS HUGEINT)
                         * (total_rows - heavy_rows))
                        // (n_keys - heavy_keys)
                   ELSE 0 END AS BIGINT) AS est_pairs,
       CAST(((heavy_pairs
              + CASE WHEN n_keys > heavy_keys
                     THEN (CAST(total_rows - heavy_rows AS HUGEINT)
                           * (total_rows - heavy_rows))
                          // (n_keys - heavy_keys)
                     ELSE 0 END) - exact_pairs) * 1000000
            // exact_pairs AS BIGINT) AS err_ppm
FROM heavy, tot
"""


@query("o17_join_cardinality_est", JOIN_CARD_ORACLE)
def o17_join_cardinality_est(spark, sf_dir):
    hug = "decimal(38,0)"
    counts = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    heavy = (
        counts.orderBy(F.desc("cnt"), F.asc("key"))
        .limit(20)
        .agg(
            F.sum(F.col("cnt").cast(hug) * F.col("cnt").cast(hug)).alias(
                "heavy_pairs"
            ),
            F.sum("cnt").alias("heavy_rows"),
            F.count(F.lit(1)).alias("heavy_keys"),
        )
    )
    tot = counts.agg(
        F.sum(F.col("cnt").cast(hug) * F.col("cnt").cast(hug)).alias(
            "exact_pairs"
        ),
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    est = (
        f"heavy_pairs + CASE WHEN n_keys > heavy_keys"
        f" THEN (CAST(total_rows - heavy_rows AS {hug})"
        f" * (total_rows - heavy_rows)) div (n_keys - heavy_keys)"
        f" ELSE 0 END"
    )
    return heavy.crossJoin(F.broadcast(tot)).select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("total_rows").cast("long").alias("total_rows"),
        F.col("exact_pairs").cast("long").alias("exact_pairs"),
        F.expr(f"CAST({est} AS BIGINT)").alias("est_pairs"),
        F.expr(
            f"CAST((CAST(({est}) AS {hug}) - exact_pairs) * 1000000"
            f" div exact_pairs AS BIGINT)"
        ).alias("err_ppm"),
    )


# --------------------------------------------------------------------
# Embedding distribution drift between ingest shards: per-dimension
# micro-quantized means for the even-vec_id and odd-vec_id shards and
# their absolute difference — the monitoring table a pipeline owner
# watches to catch a distribution shift between data batches before
# training on them. Means are round(sum_q / (n * 1e6), 6): the only
# float op is one division of exact integers, identical per engine.
# One scan, one (pos) aggregation with map-side combine.
# --------------------------------------------------------------------
EMBED_DRIFT_ORACLE = """
WITH vq AS (
  SELECT vec_id, pos,
         CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000)
              AS BIGINT) AS q
  FROM embeddings,
       unnest(generate_series(1, len(embedding))) AS u(pos)
),
agg AS (
  SELECT pos,
         sum(CASE WHEN vec_id % 2 = 0 THEN q END) AS qsum_a,
         count(*) FILTER (WHERE vec_id % 2 = 0) AS n_a,
         sum(CASE WHEN vec_id % 2 = 1 THEN q END) AS qsum_b,
         count(*) FILTER (WHERE vec_id % 2 = 1) AS n_b
  FROM vq GROUP BY pos
)
SELECT pos,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(qsum_a / (n_a * 1000000.0), 6) AS mean_a,
       round(qsum_b / (n_b * 1000000.0), 6) AS mean_b,
       round(abs(qsum_a / (n_a * 1000000.0)
                 - qsum_b / (n_b * 1000000.0)), 6) AS abs_drift
FROM agg
"""


@query("s_embed_drift", EMBED_DRIFT_ORACLE)
def s_embed_drift(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    vq = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("val").cast("double") * 1000000)
        .cast("long")
        .alias("q"),
    )
    even = F.col("vec_id") % 2 == 0
    agg = vq.groupBy("pos").agg(
        F.sum(F.when(even, F.col("q"))).alias("qsum_a"),
        F.count_if(even).alias("n_a"),
        F.sum(F.when(~even, F.col("q"))).alias("qsum_b"),
        F.count_if(~even).alias("n_b"),
    )
    mean_a = F.col("qsum_a") / (F.col("n_a") * 1000000.0)
    mean_b = F.col("qsum_b") / (F.col("n_b") * 1000000.0)
    return agg.select(
        "pos",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(F.abs(mean_a - mean_b), 6).alias("abs_drift"),
    )


# --------------------------------------------------------------------
# Benford leading-digit audit over lineitem.l_extendedprice — the
# classic screen for fabricated or corrupted numeric columns. Digit
# shares in floor ppm against the Benford expectation log10(1+1/d),
# hardcoded as the same 9 ppm constants in BOTH engines (no libm in
# the comparison path). One scan, 9-row output.
# --------------------------------------------------------------------
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_VALUES = ", ".join(
    f"({d}, {p})" for d, p in _BENFORD_PPM.items()
)

BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(abs(l_extendedprice)) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM lineitem WHERE abs(l_extendedprice) >= 1
),
counts AS (SELECT digit, count(*) AS cnt FROM digits GROUP BY digit),
tot AS (SELECT sum(cnt) AS total FROM counts),
expect(digit, benford_ppm) AS (VALUES {_BENFORD_VALUES})
SELECT e.digit,
       CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt,
       CAST(coalesce(c.cnt, 0) * 1000000 // total AS BIGINT)
         AS share_ppm,
       CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
       CAST(coalesce(c.cnt, 0) * 1000000 // total - e.benford_ppm
            AS BIGINT) AS dev_ppm
FROM expect e LEFT JOIN counts c ON c.digit = e.digit
CROSS JOIN tot
"""


@query("a17_benford_audit", BENFORD_ORACLE)
def a17_benford_audit(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_extendedprice")
    digits = li.where(F.abs(F.col("l_extendedprice")) >= 1).select(
        F.substring(
            F.floor(F.abs(F.col("l_extendedprice")))
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(F.sum("cnt").alias("total"))
    expect = table(spark, sf_dir, "lineitem").sparkSession.createDataFrame(
        [(d, p) for d, p in _BENFORD_PPM.items()],
        "digit int, benford_ppm long",
    )
    return (
        expect.join(F.broadcast(counts), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("cnt"), F.lit(0))
            .cast("long")
            .alias("cnt"),
            F.expr(
                "CAST(coalesce(cnt, 0) * 1000000 div total AS BIGINT)"
            ).alias("share_ppm"),
            F.col("benford_ppm").cast("long").alias("benford_ppm"),
            F.expr(
                "CAST(coalesce(cnt, 0) * 1000000 div total"
                " - benford_ppm AS BIGINT)"
            ).alias("dev_ppm"),
        )
    )
