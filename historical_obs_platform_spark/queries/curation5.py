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
# unique; the packing requires doc_id < 1e9 — widen the multiplier
# for larger id spaces). Used to build length-balanced eval/control
# sets so a quality comparison isn't confounded by doc length.
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


# --------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003 —
# the MOSS algorithm): hash every token 3-gram, slide a window of 4
# consecutive gram hashes, keep each window's minimum; the distinct
# selected hashes are the document's fingerprint set. Guarantees any
# shared run of >= k+w-1 tokens between two docs shares at least one
# fingerprint, at ~2/(w+1) storage density — the local substring-
# match primitive between MinHash (whole-doc) and ExactSubstr (span).
# Hashes are the repo's 40-bit md5-slice family, so both engines
# compute identical BIGINTs. Plan: explode -> two lead() + one
# sliding-min window per doc partition (O(n) merge-scan per doc,
# no self-join), then one distinct-aggregate. Docs shorter than
# k+w-1 = 6 tokens have no window and are absent on both sides.
# --------------------------------------------------------------------
WINNOW_ORACLE = """
WITH toks AS (
  SELECT doc_id, i, t[i] AS tok, len(t) AS n
  FROM (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)),
                        '\\s+', ' ', 'g'), ' ') AS t
    FROM documents
  ), unnest(generate_series(1, len(t))) AS u(i)
),
grams AS (
  SELECT doc_id, i,
         tok || ' ' || lead(tok, 1) OVER w || ' '
             || lead(tok, 2) OVER w AS gram,
         n - 2 AS n_grams
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY i <= n - 2
),
hashes AS (
  SELECT doc_id, i, n_grams,
         CAST('0x' || substring(md5('wn:' || gram), 1, 10)
              AS BIGINT) AS h
  FROM grams
),
winmin AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
           AS fp
  FROM hashes
  QUALIFY i <= n_grams - 3
)
SELECT doc_id,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_fp,
       CAST(sum(DISTINCT fp) AS BIGINT) AS fp_checksum
FROM winmin GROUP BY doc_id
"""


@query("t_winnow_fingerprints", WINNOW_ORACLE)
def t_winnow_fingerprints(spark, sf_dir):
    from ..functions.textfns import normalize_text

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("t")
    )
    toks = docs.select(
        "doc_id",
        F.size("t").alias("n"),
        F.posexplode("t").alias("i0", "tok"),
    ).select("doc_id", "n", (F.col("i0") + 1).alias("i"), "tok")
    w = Window.partitionBy("doc_id").orderBy("i")
    grams = (
        toks.withColumn(
            "gram",
            F.concat_ws(
                " ",
                F.col("tok"),
                F.lead("tok", 1).over(w),
                F.lead("tok", 2).over(w),
            ),
        )
        .where(F.col("i") <= F.col("n") - 2)
        .withColumn("n_grams", F.col("n") - 2)
    )
    hashes = grams.select(
        "doc_id",
        "i",
        "n_grams",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wn:"), F.col("gram"))), 1, 10
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    wmin = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, 3)
    )
    winmin = hashes.withColumn("fp", F.min("h").over(wmin)).where(
        F.col("i") <= F.col("n_grams") - 3
    )
    return winmin.groupBy("doc_id").agg(
        F.countDistinct("fp").cast("long").alias("n_fp"),
        F.sum_distinct(F.col("fp")).cast("long").alias("fp_checksum"),
    )


# --------------------------------------------------------------------
# Layout-pruning effectiveness: WOULD a z-order rewrite help? Assign
# every event row to one of 32 simulated files two ways — natural
# (event_id value ranges: arrival order) and z-order (Morton key of
# (user_id%256, floor(value)%256) value ranges) — record each file's
# min/max of the probe column a, then replay 16 deterministic point
# probes against the min/max index. avg files touched per probe is
# THE data-skipping metric a table owner reads before paying for a
# rewrite. Everything is map-only + two tiny aggregations; the file
# assignment is a pure-arithmetic range bucket (no global sort — a
# real write would use repartitionByRange, same boundaries).
# --------------------------------------------------------------------
def _layout_pruning_oracle(bits: int = 8) -> str:
    parts = []
    for i in range(bits):
        parts.append(f"(((a >> {i}) & 1) << {2 * i})")
        parts.append(f"(((b >> {i}) & 1) << {2 * i + 1})")
    zexpr = " | ".join(parts)
    return f"""
WITH d AS (
  SELECT event_id, user_id % 256 AS a,
         CAST(floor(value) AS BIGINT) % 256 AS b
  FROM events
),
z AS (SELECT event_id, a, b, {zexpr} AS zkey FROM d),
mx AS (SELECT max(event_id) AS me FROM d),
files AS (
  SELECT 'natural' AS layout,
         CAST((CAST(event_id AS HUGEINT) * 32) // (me + 1) AS BIGINT)
           AS file_id, a
  FROM z, mx
  UNION ALL
  SELECT 'zorder' AS layout, zkey // 2048 AS file_id, a FROM z
),
stats AS (
  SELECT layout, file_id, min(a) AS min_a, max(a) AS max_a
  FROM files GROUP BY layout, file_id
),
probes AS (SELECT unnest(generate_series(0, 255, 16)) AS v),
hits AS (
  SELECT s.layout, p.v, count(*) AS files_hit
  FROM probes p JOIN stats s
    ON p.v BETWEEN s.min_a AND s.max_a
  GROUP BY s.layout, p.v
)
SELECT layout,
       CAST((SELECT count(*) FROM stats s2
             WHERE s2.layout = hits.layout) AS BIGINT) AS n_files,
       CAST(sum(files_hit) AS BIGINT) AS total_probe_hits,
       round(sum(files_hit) / 16.0, 6) AS avg_files_scanned
FROM hits GROUP BY layout
"""


@query("o18_layout_pruning_stats", _layout_pruning_oracle())
def o18_layout_pruning_stats(spark, sf_dir):
    from ..operators.layout import zorder_key

    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("a"),
        (F.floor("value").cast("long") % 256).alias("b"),
    )
    z = d.withColumn(
        "zkey", zorder_key(F.col("a"), F.col("b"), bits=8)
    )
    mx = d.agg(F.max("event_id").alias("me"))
    nat = z.crossJoin(F.broadcast(mx)).select(
        F.lit("natural").alias("layout"),
        F.expr(
            "CAST((CAST(event_id AS decimal(38,0)) * 32)"
            " div (me + 1) AS BIGINT)"
        ).alias("file_id"),
        "a",
    )
    zor = z.select(
        F.lit("zorder").alias("layout"),
        F.expr("zkey div 2048").cast("long").alias("file_id"),
        "a",
    )
    stats = (
        nat.unionByName(zor)
        .groupBy("layout", "file_id")
        .agg(F.min("a").alias("min_a"), F.max("a").alias("max_a"))
        .localCheckpoint(eager=False)
    )
    probes = ev.sparkSession.range(0, 256, 16).select(
        F.col("id").alias("v")
    )
    hits = (
        F.broadcast(probes)
        .join(
            stats,
            (F.col("v") >= F.col("min_a"))
            & (F.col("v") <= F.col("max_a")),
        )
        .groupBy("layout", "v")
        .agg(F.count(F.lit(1)).alias("files_hit"))
    )
    nfiles = stats.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files")
    )
    return (
        hits.groupBy("layout")
        .agg(
            F.sum("files_hit").alias("tph"),
        )
        .join(F.broadcast(nfiles), "layout")
        .select(
            "layout",
            F.col("n_files").cast("long").alias("n_files"),
            F.col("tph").cast("long").alias("total_probe_hits"),
            F.round(F.col("tph") / 16.0, 6).alias("avg_files_scanned"),
        )
    )


# --------------------------------------------------------------------
# N-gram novelty: the fraction of a document's DISTINCT token
# 3-grams that occur in no other document — high novelty separates
# original content from boilerplate/templated text, and its inverse
# ranks memorization risk. Inverted-index shape: one explode to
# (gram, doc) pairs, document frequency per gram, fraction with
# df = 1 per doc. Both aggregations are map-side combinable; the
# gram shuffle key is the gram string (hash it to 64-bit at 100 TB —
# same plan, narrower key). Ratio is floor ppm on exact integers.
# --------------------------------------------------------------------
NGRAM_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)),
                      '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
),
df AS (SELECT g, count(*) AS df FROM grams GROUP BY g)
SELECT grams.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (WHERE df.df = 1) AS BIGINT)
         AS n_unique,
       CAST(count(*) FILTER (WHERE df.df = 1) * 1000000 // count(*)
            AS BIGINT) AS novelty_ppm
FROM grams JOIN df ON df.g = grams.g
GROUP BY grams.doc_id
"""


@query("t_ngram_novelty", NGRAM_NOVELTY_ORACLE)
def t_ngram_novelty(spark, sf_dir):
    from ..functions.textfns import normalize_text

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("t")
    )
    grams = (
        docs.where(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3),"
                    " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    df = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        grams.join(df, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count_if(F.col("df") == 1).cast("long").alias("n_unique"),
            F.expr(
                "CAST(count_if(df = 1) * 1000000 div count(1)"
                " AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )


# --------------------------------------------------------------------
# The corpus -> training-set chain, end to end in ONE query: Gopher
# quality gates (pass_all) ∘ near-dup removal (cluster-representative
# survivors) ∘ leakage-safe train/val/test split (split is a function
# of the near-dup cluster, so no dup pair straddles a boundary), then
# the table a pipeline owner signs off on — per (split, source) doc
# counts, token totals, and an id checksum pinning the exact survivor
# set. Composes three verified subsystems (t_gopher_rules,
# chain_neardup_removal's keep rule, p_leakage_safe_split) without
# re-deriving any of them: the survivor rule is grp == doc_id (the
# cluster representative IS the split group key), so no extra join
# beyond quality ⋈ split. At 100 TB every stage is the already-
# audited plan of its subsystem; this adds two broadcast-sized joins
# and one final aggregation.
# --------------------------------------------------------------------
def _training_set_oracle() -> str:
    from .curation4 import _SW_SQL
    from .textops import TOKS, _components_cte
    from .textops import _LSPLIT_CASE

    return (
        _components_cte()
        + f""",
gtf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest({TOKS}) AS tok FROM documents)
  WHERE tok <> '' GROUP BY doc_id, tok
),
gm AS (
  SELECT doc_id,
         CAST(sum(tf) AS BIGINT) AS n_tokens,
         (sum(tf) BETWEEN 50 AND 100000
          AND round(sum(length(tok) * tf) * 1.0 / sum(tf), 6)
              BETWEEN 3.0 AND 10.0
          AND round(sum(CASE WHEN regexp_matches(tok, '[a-z]') THEN tf
                             ELSE 0 END) * 1.0 / sum(tf), 6) >= 0.8
          AND sum(CASE WHEN tok IN {_SW_SQL} THEN tf ELSE 0 END) >= 2
          AND round(max(tf) * 1.0 / sum(tf), 6) <= 0.2) AS pass_all
  FROM gtf GROUP BY doc_id
),
rep AS (
  SELECT d.doc_id, d.source,
         coalesce(c.component, d.doc_id) AS grp
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
)
SELECT {_LSPLIT_CASE} AS split, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(rep.doc_id) AS BIGINT) AS survivor_checksum
FROM rep JOIN gm ON gm.doc_id = rep.doc_id
WHERE rep.grp = rep.doc_id AND gm.pass_all
GROUP BY 1, 2
"""
    )


@query("chain_training_set", _training_set_oracle())
def chain_training_set(spark, sf_dir):
    from .curation4 import t_gopher_rules
    from .textops import leakage_safe_split

    gates = t_gopher_rules(spark, sf_dir).select(
        "doc_id", "n_tokens", "pass_all"
    )
    assigned = leakage_safe_split(spark, sf_dir)
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        assigned.where(F.col("grp") == F.col("doc_id"))
        .join(gates.where(F.col("pass_all") == 1), "doc_id")
        .join(src, "doc_id")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("doc_id").cast("long").alias("survivor_checksum"),
        )
    )


# --------------------------------------------------------------------
# MinHash estimator error — "measure, don't guess" for the signature
# itself: over the LSH candidate pairs, compare the 16-hash agreement
# fraction (the MinHash Jaccard ESTIMATE, floor ppm) against the
# exact shingle-set Jaccard (integer ppm from n_common and set
# sizes). One row: pair count, mean/max absolute error, mean of each
# side — the calibration table that justifies every threshold the
# dedup family uses. All arithmetic is BIGINT; the signature join is
# candidates ⋈ sigs twice (signature table is one row per doc).
# --------------------------------------------------------------------
def _minhash_err_oracle() -> str:
    from .textops import LSH_N_HASHES, _lsh_pairs_oracle

    base = _lsh_pairs_oracle()  # full WITH ... SELECT of (a, b)
    cand_cte = base[base.index("WITH ") + 5 :]
    # the FINAL SELECT DISTINCT is the pair projection (the shingles
    # CTE contains an inner one, hence rindex)
    sel = cand_cte.rindex("SELECT DISTINCT")
    agree = " + ".join(
        f"CASE WHEN sa.minhash_{i} = sb.minhash_{i} THEN 1 ELSE 0 END"
        for i in range(LSH_N_HASHES)
    )
    return f"""
WITH {cand_cte[:sel]},
cand AS ({cand_cte[sel:]}),
sizes AS (
  SELECT doc_id, count(DISTINCT shingle) AS sz
  FROM shingles GROUP BY doc_id
),
inter AS (
  SELECT c.a, c.b, count(DISTINCT x.shingle) AS n_common
  FROM cand c
  JOIN shingles x ON x.doc_id = c.a
  JOIN shingles y ON y.doc_id = c.b AND y.shingle = x.shingle
  GROUP BY c.a, c.b
),
per_pair AS (
  SELECT i.a, i.b,
         ({agree}) * 1000000 // {LSH_N_HASHES} AS est_ppm,
         i.n_common * 1000000 // (sa2.sz + sb2.sz - i.n_common)
           AS true_ppm
  FROM inter i
  JOIN sigs sa ON sa.doc_id = i.a
  JOIN sigs sb ON sb.doc_id = i.b
  JOIN sizes sa2 ON sa2.doc_id = i.a
  JOIN sizes sb2 ON sb2.doc_id = i.b
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(abs(est_ppm - true_ppm)) // count(*) AS BIGINT)
         AS mean_abs_err_ppm,
       CAST(max(abs(est_ppm - true_ppm)) AS BIGINT) AS max_abs_err_ppm,
       CAST(sum(est_ppm) // count(*) AS BIGINT) AS mean_est_ppm,
       CAST(sum(true_ppm) // count(*) AS BIGINT) AS mean_true_ppm
FROM per_pair
"""


@query("d_minhash_estimate_error", _minhash_err_oracle())
def d_minhash_estimate_error(spark, sf_dir):
    from ..operators import dedup as DD
    from .textops import (
        LSH_N_HASHES,
        _lsh_doc_arrays_shared,
        _lsh_shared_full,
    )

    shingles, sigs, _buckets, cand = _lsh_shared_full(spark, sf_dir)
    pairs = DD.jaccard_pairs(
        shingles, "doc_id", min_jaccard=0.0, candidates=cand,
        doc_arrays=_lsh_doc_arrays_shared(spark, sf_dir),
    ).select("a", "b", "n_common", "sz_a", "sz_b")
    sa = sigs.select(
        F.col("doc_id").alias("a"),
        *[
            F.col(f"minhash_{i}").alias(f"ma_{i}")
            for i in range(LSH_N_HASHES)
        ],
    )
    sb = sigs.select(
        F.col("doc_id").alias("b"),
        *[
            F.col(f"minhash_{i}").alias(f"mb_{i}")
            for i in range(LSH_N_HASHES)
        ],
    )
    agree = sum(
        (F.col(f"ma_{i}") == F.col(f"mb_{i}")).cast("long")
        for i in range(LSH_N_HASHES)
    )
    per_pair = (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            (agree * 1000000 / LSH_N_HASHES)
            .cast("long")
            .alias("est_ppm"),
            F.expr(
                "n_common * 1000000 div (sz_a + sz_b - n_common)"
            ).alias("true_ppm"),
        )
    )
    err = F.abs(F.col("est_ppm") - F.col("true_ppm"))
    return per_pair.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            "CAST(sum(abs(est_ppm - true_ppm)) div count(1) AS BIGINT)"
        ).alias("mean_abs_err_ppm"),
        F.max(err).cast("long").alias("max_abs_err_ppm"),
        F.expr("CAST(sum(est_ppm) div count(1) AS BIGINT)").alias(
            "mean_est_ppm"
        ),
        F.expr("CAST(sum(true_ppm) div count(1) AS BIGINT)").alias(
            "mean_true_ppm"
        ),
    )


# --------------------------------------------------------------------
# Incremental stats maintenance: per-column (count, sum, min, max)
# computed on a 90% base and a 10% delta, merged by pure algebra
# (counts/sums add, min/max fold), and checked against the full-scan
# stats — the lake-maintenance guarantee that table statistics are
# MERGEABLE, so an ingest updates them without rescanning the table
# (the same associativity contract the sketch family proves for
# distinct counts). Sums are decimal(38,4), so base+delta == full is
# EXACT, not float-approximate. Long-form output, one row per
# (column, stat).
# --------------------------------------------------------------------
STATS_MAINT_ORACLE = """
WITH base AS (SELECT * FROM lineitem WHERE l_orderkey % 10 <> 0),
delta AS (SELECT * FROM lineitem WHERE l_orderkey % 10 = 0),
s AS (
  SELECT 'base' AS part, col, cnt, sm, mn, mx FROM (
    SELECT 'l_quantity' AS col, count(l_quantity) AS cnt,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS sm,
           CAST(min(l_quantity) AS DOUBLE) AS mn,
           CAST(max(l_quantity) AS DOUBLE) AS mx FROM base
    UNION ALL
    SELECT 'l_extendedprice', count(l_extendedprice),
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR),
           CAST(min(l_extendedprice) AS DOUBLE),
           CAST(max(l_extendedprice) AS DOUBLE) FROM base)
  UNION ALL
  SELECT 'delta', col, cnt, sm, mn, mx FROM (
    SELECT 'l_quantity' AS col, count(l_quantity) AS cnt,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS sm,
           CAST(min(l_quantity) AS DOUBLE) AS mn,
           CAST(max(l_quantity) AS DOUBLE) AS mx FROM delta
    UNION ALL
    SELECT 'l_extendedprice', count(l_extendedprice),
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR),
           CAST(min(l_extendedprice) AS DOUBLE),
           CAST(max(l_extendedprice) AS DOUBLE) FROM delta)
),
merged AS (
  SELECT col,
         sum(cnt) AS cnt,
         CAST(sum(CAST(sm AS DECIMAL(38,4))) AS VARCHAR) AS sm,
         min(mn) AS mn, max(mx) AS mx
  FROM s GROUP BY col
),
full_scan AS (
  SELECT 'l_quantity' AS col, count(l_quantity) AS cnt,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS sm,
         CAST(min(l_quantity) AS DOUBLE) AS mn,
         CAST(max(l_quantity) AS DOUBLE) AS mx FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', count(l_extendedprice),
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR),
         CAST(min(l_extendedprice) AS DOUBLE),
         CAST(max(l_extendedprice) AS DOUBLE) FROM lineitem
)
SELECT m.col,
       CAST(m.cnt AS BIGINT) AS cnt,
       m.sm AS sum_str, m.mn AS min_val, m.mx AS max_val,
       CAST(m.cnt = f.cnt AND m.sm = f.sm
            AND m.mn = f.mn AND m.mx = f.mx AS INTEGER) AS matches_full
FROM merged m JOIN full_scan f ON f.col = m.col
"""


@query("o20_stats_maintenance", STATS_MAINT_ORACLE)
def o20_stats_maintenance(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    dec = "decimal(38,4)"

    def stats(df, part):
        # ONE aggregation computes both columns' stats, unpivoted
        # in-row — the per-column union re-scanned the input once per
        # column (6 lineitem scans across the three parts; 3 after)
        cols = ["l_quantity", "l_extendedprice"]
        aggs = []
        for i, col in enumerate(cols):
            aggs += [
                F.count(col).alias(f"__cnt{i}"),
                F.sum(F.col(col).cast(dec)).cast(dec).alias(f"__sm{i}"),
                F.min(col).cast("double").alias(f"__mn{i}"),
                F.max(col).cast("double").alias(f"__mx{i}"),
            ]
        wide = df.agg(*aggs)
        return wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(part).alias("part"),
                            F.lit(col).alias("col"),
                            F.col(f"__cnt{i}").alias("cnt"),
                            F.col(f"__sm{i}").alias("sm"),
                            F.col(f"__mn{i}").alias("mn"),
                            F.col(f"__mx{i}").alias("mx"),
                        )
                        for i, col in enumerate(cols)
                    ]
                )
            ).alias("__r")
        ).select("__r.*")

    base = li.where(F.col("l_orderkey") % 10 != 0)
    delta = li.where(F.col("l_orderkey") % 10 == 0)
    s = stats(base, "base").unionByName(stats(delta, "delta"))
    merged = s.groupBy("col").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sm").cast(dec).alias("sm"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    full = (
        stats(li, "full")
        .select(
            F.col("col").alias("fcol"),
            F.col("cnt").alias("fcnt"),
            F.col("sm").alias("fsm"),
            F.col("mn").alias("fmn"),
            F.col("mx").alias("fmx"),
        )
    )
    return merged.join(
        F.broadcast(full), merged.col == F.col("fcol")
    ).select(
        "col",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("sm").cast("string").alias("sum_str"),
        F.col("mn").alias("min_val"),
        F.col("mx").alias("max_val"),
        (
            (F.col("cnt") == F.col("fcnt"))
            & (F.col("sm") == F.col("fsm"))
            & (F.col("mn") == F.col("fmn"))
            & (F.col("mx") == F.col("fmx"))
        )
        .cast("int")
        .alias("matches_full"),
    )
