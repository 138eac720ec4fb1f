"""Dataset-curation queries beyond the reference surface: JSON
side-column extraction, PII redaction, deterministic train/val/test
splitting, KMV set-operation estimates, and per-label embedding
centroid statistics.

The reference (Eagle-Rock-Analytics/historical-obs-platform) is a
QA/QC pipeline; a corpus-scale training-data platform additionally
needs these curation primitives. Every query here follows the repo's
determinism rules (queries/common.py): integer/decimal-exact
aggregates, md5-derived randomness, and oracle SQL whose expressions
are engine-portable (identical in Spark SQL and DuckDB).

Scale shapes (the 100 TB contract):

- JSON extraction / PII scrub are stateless projections — they live
  in the scan stage's codegen, shuffle nothing, and parallelize with
  the input splits.
- Split assignment is a pure hash-of-key projection (a row's fate is
  a function of its key, independent of partitioning); the per-split
  audit aggregate is one partial-agg shuffle of 3 groups.
- KMV set ops keep fixed k-row state per side (TakeOrdered), so the
  estimate costs one distinct-reduce per side however large the key
  sets are; the exact counts alongside are one semi-join.
- Label centroids are two partial aggregations ((label, pos) then
  label) — never materializing a per-label vector list anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sketches import _hash_fraction_sql
from ..registry import query
from .common import dsum, table

# ------------------------------------------------------------ JSON props
# S-family extension: the reference parses fixed-width (ISD) and CSV
# attribute payloads; event streams carry ragged JSON side-columns.
# get_json_object evaluates JVM-side inside the scan stage — the JSON
# column never leaves the executor unparsed, and non-matching/corrupt
# documents yield NULL (surfaced in the n_null audit column).

_JSON_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
       CAST(count(*) FILTER (WHERE json_extract_string(props, '$.k')
            IS NULL) AS BIGINT) AS n_null
FROM events
GROUP BY 1
"""


@query("s11_json_props", _JSON_ORACLE)
def s11_json_props(spark, sf_dir):
    """Extract a typed field from the events.props JSON side-column
    and aggregate by it — the schema-on-read path for semi-structured
    payload columns."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("sum_value"),
            F.max("k").alias("max_k"),
            F.count_if(F.col("k").isNull()).cast("long").alias("n_null"),
        )
    )


# --------------------------------------------------------------- PII scrub
# Redaction before training is a stateless regexp projection. The
# synthetic corpus contains no PII, so the query first APPENDS a
# deterministic PII-bearing suffix derived from doc_id (same
# concatenation in both engines) — the scrub logic is then exercised
# on every row rather than vacuously matching. Patterns restrict
# themselves to character classes + counted quantifiers, which behave
# identically in Java regex (Spark) and RE2 (DuckDB).

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_NUM_RE = "[0-9]+"

# identical text-augmentation expression, written once per dialect
_AUG_SQL = (
    "concat(text, ' contact user', cast(doc_id as string),"
    " '@mail-', cast(doc_id % 7 as string), '.example.com ref ',"
    " cast(doc_id * 31 as string), ' line ',"
    " cast(doc_id % 100 as string))"
)

_PII_ORACLE = f"""
WITH aug AS (SELECT doc_id, {_AUG_SQL} AS t FROM documents),
scrub AS (
  SELECT doc_id, t,
         regexp_replace(
           regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_NUM_RE}', '<NUM>', 'g') AS s
  FROM aug)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(
         regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_NUM_RE}')) AS BIGINT) AS n_nums,
       CAST(length(t) - length(s) AS BIGINT) AS chars_delta,
       md5(s) AS scrub_md5
FROM scrub
"""


@query("t_pii_scrub", _PII_ORACLE)
def t_pii_scrub(spark, sf_dir):
    """Regex PII redaction (emails, digit runs) with per-doc audit
    counts. Map-only: the whole query is one projection over the
    scan — at 100 TB it costs a single pass with no exchange."""
    docs = table(spark, sf_dir, "documents")
    aug = docs.select("doc_id", F.expr(_AUG_SQL).alias("t"))
    no_email = F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(no_email, _NUM_RE, "<NUM>")
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(no_email, F.lit(_NUM_RE))
        .cast("long")
        .alias("n_nums"),
        (F.length("t") - F.length(scrubbed)).cast("long")
        .alias("chars_delta"),
        F.md5(scrubbed.cast("binary")).alias("scrub_md5"),
    )


# ------------------------------------------------------ train/val/test split
# Hash-of-key split assignment: a document's split is a pure function
# of doc_id (stable under reruns, repartitioning, and incremental
# appends — a new file's docs land in the same splits they would have
# in a full rebuild). The fraction construction is the repo's
# engine-portable 48-bit md5 fraction.

_SPLIT_FRAC = _hash_fraction_sql(
    "md5(concat('split:', cast(doc_id as string)))"
)

_SPLIT_CASE = (
    f"CASE WHEN {_SPLIT_FRAC} < 0.8 THEN 'train' "
    f"WHEN {_SPLIT_FRAC} < 0.9 THEN 'val' ELSE 'test' END"
)

_SPLIT_ORACLE = f"""
SELECT {_SPLIT_CASE} AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
FROM documents
GROUP BY 1
"""


@query("p_split_assign", _SPLIT_ORACLE)
def p_split_assign(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment with per-split
    audit sums. The assignment column is a stateless projection (zero
    shuffle at write time — each output partitionBy('split') file
    group forms map-side); the audit aggregate shuffles 3 groups."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.expr(_SPLIT_CASE).alias("split"), "doc_id", "n_chars"
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.sum("n_chars").cast("long").alias("sum_n_chars"),
        )
    )


# ------------------------------------------------------------- KMV set ops
# Distinct-set union / intersection / Jaccard estimates from two KMV
# signatures (k smallest hash fractions per side) — the mergeable-
# sketch answer to "how much do these two corpora overlap?" without
# ever materializing either distinct set. Exact counts computed
# alongside so the estimate error is itself oracle-visible.

_SO_K = 256
_SO_FRAC = _hash_fraction_sql(
    "md5(concat('ks:', cast(v as string)))"
)


def _kmv_setops_oracle() -> str:
    return f"""
WITH a AS (SELECT DISTINCT o_custkey AS v FROM orders
           WHERE year(o_orderdate) = 1994),
b AS (SELECT DISTINCT o_custkey AS v FROM orders
      WHERE year(o_orderdate) = 1995),
ha AS (SELECT {_SO_FRAC} AS h FROM a ORDER BY h LIMIT {_SO_K}),
hb AS (SELECT {_SO_FRAC} AS h FROM b ORDER BY h LIMIT {_SO_K}),
m AS (SELECT DISTINCT h FROM (SELECT h FROM ha UNION ALL
                              SELECT h FROM hb) u
      ORDER BY h LIMIT {_SO_K}),
stats AS (
  SELECT count(*) AS k_used, max(h) AS h_k,
         count(*) FILTER (WHERE h IN (SELECT h FROM ha)
                          AND h IN (SELECT h FROM hb)) AS n_both
  FROM m),
est AS (
  SELECT k_used,
         CASE WHEN k_used < {_SO_K} THEN CAST(k_used AS DOUBLE)
              ELSE ({_SO_K} - 1) / h_k END AS union_est,
         CAST(n_both AS DOUBLE) / k_used AS jacc
  FROM stats)
SELECT CAST({_SO_K} AS INT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a_exact,
       (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b_exact,
       (SELECT CAST(count(*) AS BIGINT) FROM a
        WHERE v IN (SELECT v FROM b)) AS inter_exact,
       round(union_est, 6) AS union_est,
       round(jacc, 6) AS jaccard_est,
       round(jacc * union_est, 6) AS inter_est
FROM est
"""


@query("sk_kmv_setops", _kmv_setops_oracle())
def sk_kmv_setops(spark, sf_dir):
    """KMV union/intersection/Jaccard estimates between the 1994 and
    1995 customer sets, with exact counts alongside.

    Plan shape: each side is distinct-reduce → TakeOrdered(k) (fixed
    k-row state regardless of corpus size); everything after operates
    on ≤ 3·k rows and broadcasts. The exact branch is one aggregate +
    one semi-join — present only to expose the estimate error."""
    orders = table(spark, sf_dir, "orders")

    def year_keys(y: int):
        # materialize the (small) distinct key set: ha/hb/merged/the
        # exact branch all re-derive from it, and without the cut each
        # reference re-executes the orders scan — ~7 passes over the
        # fact table at 100 TB instead of one per side
        return (
            orders.where(F.year("o_orderdate") == y)
            .select(F.col("o_custkey").alias("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )

    a, b = year_keys(1994), year_keys(1995)
    frac = F.expr(_SO_FRAC)
    ha = a.select(frac.alias("h")).orderBy("h").limit(_SO_K)
    hb = b.select(frac.alias("h")).orderBy("h").limit(_SO_K)
    merged = (
        ha.unionByName(hb).distinct().orderBy("h").limit(_SO_K)
    )
    flagged = (
        merged.join(
            F.broadcast(ha.withColumn("inA", F.lit(1))), "h", "left"
        ).join(
            F.broadcast(hb.withColumn("inB", F.lit(1))), "h", "left"
        )
    )
    stats = flagged.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("h_k"),
        F.count_if(
            F.col("inA").isNotNull() & F.col("inB").isNotNull()
        ).alias("n_both"),
    ).select(
        "k_used",
        F.when(
            F.col("k_used") < _SO_K, F.col("k_used").cast("double")
        )
        .otherwise(F.lit(float(_SO_K - 1)) / F.col("h_k"))
        .alias("union_est"),
        (F.col("n_both").cast("double") / F.col("k_used")).alias(
            "jacc"
        ),
    )
    exact = (
        a.agg(F.count(F.lit(1)).alias("n_a_exact"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("n_b_exact")))
        .crossJoin(
            a.join(b, "v", "left_semi").agg(
                F.count(F.lit(1)).alias("inter_exact")
            )
        )
    )
    return stats.crossJoin(F.broadcast(exact)).select(
        F.lit(_SO_K).cast("int").alias("k"),
        "n_a_exact",
        "n_b_exact",
        "inter_exact",
        F.round("union_est", 6).alias("union_est"),
        F.round("jacc", 6).alias("jaccard_est"),
        F.round(F.col("jacc") * F.col("union_est"), 6).alias(
            "inter_est"
        ),
    )


# -------------------------------------------------------- label centroids
# Per-label embedding centroid statistics — the aggregation backbone
# of semantic-dedup bucketing / cluster auditing. Components are
# quantized to exact micro-units (floor(v·1e6) as BIGINT — same IEEE
# multiply then floor in both engines), so every aggregate below is
# integer/decimal-exact and associative: the result is independent of
# partial-aggregation order, which is what makes the hash oracle
# possible for float vector math.

_CL_ORACLE = """
WITH comp AS (
  SELECT label, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1.0e6) AS BIGINT)
           AS q
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
  WHERE len(embedding) = 64),
bypos AS (
  SELECT label, i, SUM(q) AS ms, count(*) AS n
  FROM comp GROUP BY label, i)
SELECT label,
       CAST(max(n) AS BIGINT) AS n_vecs,
       CAST(sum(ms) AS BIGINT) AS centroid_sum_micro,
       round(((CAST(sum(CAST(ms AS DECIMAL(19,0))
                        * CAST(ms AS DECIMAL(19,0))) AS DOUBLE)
               / max(n)) / max(n)) / 1.0e12, 6) AS centroid_sqnorm
FROM bypos
GROUP BY label
"""


@query("s_label_centroids", _CL_ORACLE)
def s_label_centroids(spark, sf_dir):
    """Per-label centroid checksum + squared-norm over the embedding
    corpus.

    Two partial aggregations — (label, pos) then label — and nothing
    else: no per-label vector list is ever materialized, so executor
    state is O(labels × dim) however many vectors flow through. At
    100 TB this is the audit/bucketing statistic for IVF-style
    semantic dedup (operators/similarity.py trains real centroids;
    this surfaces their exact-math summary)."""
    em = table(spark, sf_dir, "embeddings").where(
        F.size("embedding") == 64
    )
    ex = em.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    q = F.floor(F.col("val").cast("double") * F.lit(1.0e6)).alias("q")
    bypos = (
        ex.select("label", "pos", q)
        .groupBy("label", "pos")
        .agg(F.sum("q").alias("ms"), F.count(F.lit(1)).alias("n"))
    )
    msd = F.col("ms").cast("decimal(19,0)")
    return bypos.groupBy("label").agg(
        F.max("n").cast("long").alias("n_vecs"),
        F.sum("ms").cast("long").alias("centroid_sum_micro"),
        F.round(
            (
                (F.sum(msd * msd).cast("double") / F.max("n"))
                / F.max("n")
            )
            / F.lit(1.0e12),
            6,
        ).alias("centroid_sqnorm"),
    )
