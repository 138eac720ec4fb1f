"""Deterministic sampling / packing queries over the documents table.

Training-data pipeline operators (north-star brief; no reference
counterpart — the closest reference ops are the subset selections in
SURVEY.md §2.6). All randomness is md5-derived (see
``operators/sampling.py``) so every query has an exact DuckDB oracle:
the identical hash → fraction → threshold arithmetic runs on both
engines and matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sampling as S
from ..registry import query
from .common import table

HEX = S.HEX


def _frac_sql(md5_expr: str, digits: int = 4) -> str:
    """DuckDB fragment mirroring ``sampling.hash_frac`` term-for-term."""
    terms = [
        f"(strpos('{HEX}', substring({md5_expr}, {i}, 1)) - 1) / {float(16 ** i)}"
        for i in range(1, digits + 1)
    ]
    return "(" + " + ".join(terms) + ")"


_DOC_FRAC = _frac_sql("md5(CAST(doc_id AS VARCHAR))")


# --------------------------------------------------------------------
# Uniform Bernoulli sample — a pure filter, no shuffle; the sampled
# fraction of a 100 TB corpus never leaves the scan stage.
# --------------------------------------------------------------------
UNIFORM_ORACLE = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_DOC_FRAC} < 0.25
"""


@query("p_uniform_sample", UNIFORM_ORACLE)
def p_uniform_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return S.uniform_sample(docs, "doc_id", 0.25).select(
        "doc_id", "lang", "source", "n_chars"
    )


# --------------------------------------------------------------------
# Stratified quota sample — k smallest md5(key) per language.
# --------------------------------------------------------------------
STRATIFIED_ORACLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= 25
"""


@query("p_stratified_sample", STRATIFIED_ORACLE)
def p_stratified_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return S.stratified_sample(docs, "lang", "doc_id", 25).select(
        "doc_id", "lang"
    )


# --------------------------------------------------------------------
# Domain-mixture rebalance — down-sample over-represented languages to
# the uniform mixture. Rates are a strata-sized broadcast table.
# --------------------------------------------------------------------
MIXTURE_ORACLE = f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
     t AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS target FROM c),
     r AS (SELECT c.lang, LEAST(1.0, t.target / c.n) AS rate FROM c, t)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON d.lang = r.lang
WHERE {_DOC_FRAC.replace('doc_id', 'd.doc_id')} < r.rate
"""


@query("p_mixture_sample", MIXTURE_ORACLE)
def p_mixture_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return S.mixture_sample(docs, "lang", "doc_id").select("doc_id", "lang")


# --------------------------------------------------------------------
# Concat-and-chunk sequence packing — deterministic order within each
# source shard, boundary every 4000 chars; a document belongs to the
# sequence containing its first character.
# --------------------------------------------------------------------
PACK_ORACLE = """
WITH o AS (
  SELECT doc_id, source, n_chars,
         CAST(COALESCE(SUM(n_chars) OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS begin_off
  FROM documents)
SELECT doc_id, source, n_chars, begin_off,
       CAST(FLOOR(begin_off / 4000.0) AS BIGINT) AS bin_id
FROM o
"""


@query("p_pack_sequences", PACK_ORACLE)
def p_pack_sequences(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return S.pack_sequences(docs, "source", "doc_id", "n_chars", 4000)


# --------------------------------------------------------------------
# Flagship curation chain — the training-data analog of the QAQC
# chain: plant duplicates → exact dedup → quality filter → domain-
# mixture rebalance → sequence packing, as ONE DataFrame chain whose
# every step also composes in the single-CTE oracle. Each stage is
# one shuffle at most (dedup: fingerprint; mixture: two tiny aggs +
# broadcast; packing: shard window) — the chain stays a single DAG
# with no driver-side materialization between stages.
# --------------------------------------------------------------------
def _curation_oracle() -> str:
    from .textops import NORM, TOKS

    sw = "('the','a','of','and','to','in','is','it')"
    quality = f"""
    round(0.4 * least(len({TOKS}) / 100.0, 1.0)
        + 0.2 * (CASE WHEN
              round(list_aggregate(list_transform({TOKS}, w -> length(w)), 'sum')
                    / greatest(len({TOKS}), 1), 6) BETWEEN 3.0 AND 8.0
              THEN 1.0 ELSE 0.5 END)
        + 0.2 * least(round(len(list_filter({TOKS}, w -> w IN {sw}))
                    / greatest(len({TOKS}), 1), 6) * 4.0, 1.0)
        + 0.2 * (1.0 - least(
              round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                    / greatest(length(text), 1), 6) * 5.0, 1.0)), 6)
    """
    return f"""
WITH corpus AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, lang, source, n_chars FROM documents
), fp AS (
  SELECT *, row_number() OVER (
      PARTITION BY md5({NORM}) ORDER BY doc_id) AS rn
  FROM corpus
), kept AS (
  SELECT doc_id, text, lang, source, n_chars FROM fp WHERE rn = 1
), q AS (
  SELECT * FROM kept WHERE {quality} >= 0.5
), c AS (SELECT lang, count(*) AS n FROM q GROUP BY lang),
   t AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS target FROM c),
   r AS (SELECT c.lang, LEAST(1.0, t.target / c.n) AS rate FROM c, t),
   mx AS (
  SELECT q.* FROM q JOIN r ON q.lang = r.lang
  WHERE {_frac_sql("md5(CAST(q.doc_id AS VARCHAR))")} < r.rate
), o AS (
  SELECT doc_id, lang, source, n_chars,
         CAST(COALESCE(SUM(n_chars) OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS begin_off
  FROM mx)
SELECT doc_id, lang, source, n_chars, begin_off,
       CAST(FLOOR(begin_off / 4000.0) AS BIGINT) AS bin_id
FROM o
"""


@query("chain_corpus_curation", _curation_oracle())
def chain_corpus_curation(spark, sf_dir):
    from ..functions import textfns as TX
    from ..operators import dedup as DD

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    corpus = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    kept = DD.exact_dedup(corpus, "doc_id", "text")
    scored = kept.where(TX.quality_score("text") >= 0.5)
    # mixed feeds two branches (packing + the lang re-join); cut so the
    # dedup+quality+sample pipeline isn't recomputed per branch
    mixed = S.mixture_sample(scored, "lang", "doc_id").localCheckpoint(
        eager=False
    )
    packed = S.pack_sequences(mixed, "source", "doc_id", "n_chars", 4000)
    return packed.join(
        mixed.select("doc_id", "lang"), "doc_id"
    ).select("doc_id", "lang", "source", "n_chars", "begin_off", "bin_id")


# --------------------------------------------------------------------
# Deterministic corpus shuffle — md5-prefix shards + in-shard rank: a
# reproducible training order with per-shard parallel sorting (no
# global range sort at 100 TB).
# --------------------------------------------------------------------
SHUFFLE_ORACLE = """
SELECT doc_id,
       substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard,
       CAST(row_number() OVER (
           PARTITION BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER)
         AS shard_rank
FROM documents
"""


@query("p_corpus_shuffle", SHUFFLE_ORACLE)
def p_corpus_shuffle(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return S.corpus_shuffle(docs, "doc_id")


# --------------------------------------------------------------------
# Weighted sample (A-ES exponential keys): P(select) ∝ n_chars, per
# language, without replacement. -ln(u)/w over the md5 fraction is
# engine-portable (identical operands; ordering ties broken by
# doc_id). The 100 TB story matches stratified_sample: one shuffle on
# the stratum, per-partition top-k heaps via row_number pruning.
# --------------------------------------------------------------------
_DOC_FRAC8 = _frac_sql("md5(CAST(doc_id AS VARCHAR))", digits=8)

WEIGHTED_ORACLE = f"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY -ln({_DOC_FRAC8})
                    / greatest(CAST(n_chars AS DOUBLE), 1.0e0), doc_id
         ) AS rn
  FROM documents)
WHERE rn <= 15
"""


@query("p_weighted_sample", WEIGHTED_ORACLE)
def p_weighted_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return S.weighted_sample(docs, "lang", "doc_id", "n_chars", 15).select(
        "doc_id", "lang", "n_chars"
    )


# --------------------------------------------------------------------
# Weighted rendezvous (highest-random-weight) sharding — the
# coordination-free assignment scheme whose defining property is
# MINIMAL RESHUFFLING: adding or removing a shard only moves the keys
# that hash highest for it, unlike modulo sharding which remaps
# nearly everything. Deterministic and engine-portable: per
# (doc, shard) the uniform draw is (md5_int + 0.5) / 16^13 in (0, 1),
# the weighted score is the standard -w / ln(h) transform (one fixed
# IEEE expression), and the winner is the row_number-1 row under
# (score DESC, shard) — ties broken identically everywhere. Map-only
# per doc (5 scores per row, no shuffle until the per-shard count).
# --------------------------------------------------------------------
_SHARDS = [("s0", 1), ("s1", 1), ("s2", 2), ("s3", 3), ("s4", 3)]
_HEX13 = float(16 ** 13)


def _rdv_h(shard: str) -> str:
    """DuckDB: uniform (0,1) draw for (doc_id, shard)."""
    hx = f"substr(md5(CAST(doc_id AS VARCHAR) || ':{shard}'), 1, 13)"
    return (
        f"((CAST(CAST('0x' || {hx} AS BIGINT) AS DOUBLE) + 0.5)"
        f" / {_HEX13!r})"
    )


def _rendezvous_oracle() -> str:
    scores = " UNION ALL ".join(
        f"SELECT doc_id, '{s}' AS shard, {w} AS weight,"
        f" -({w}) / ln({_rdv_h(s)}) AS score FROM documents"
        for s, w in _SHARDS
    )
    return f"""
WITH scores AS ({scores}),
win AS (
  SELECT doc_id, shard, weight FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
      ORDER BY score DESC, shard) AS r
    FROM scores
  ) WHERE r = 1
)
SELECT shard, CAST(max(weight) AS BIGINT) AS weight,
       CAST(count(*) AS BIGINT) AS n_docs
FROM win GROUP BY shard
"""


@query("p_rendezvous_shard", _rendezvous_oracle())
def p_rendezvous_shard(spark, sf_dir):
    """Per-shard document counts under weighted rendezvous hashing
    (weights 1/1/2/3/3): the doc x shard score matrix is generated
    map-side (explode over 5 literal shards), the winner is one
    per-doc window rank, and only the tiny per-shard count shuffles."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    shards = F.array(
        *[
            F.struct(
                F.lit(s).alias("shard"), F.lit(w).alias("weight")
            )
            for s, w in _SHARDS
        ]
    )
    scored = docs.select(
        "doc_id", F.explode(shards).alias("sh")
    ).select(
        "doc_id",
        F.col("sh.shard").alias("shard"),
        F.col("sh.weight").alias("weight"),
        (
            -F.col("sh.weight").cast("double")
            / F.log(
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.col("doc_id").cast("string"),
                                    F.col("sh.shard"),
                                )
                            ),
                            1,
                            13,
                        ),
                        16,
                        10,
                    ).cast("double")
                    + 0.5
                )
                / F.lit(_HEX13)
            )
        ).alias("score"),
    )
    from pyspark.sql.window import Window as W

    r = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("shard"))
    )
    win = scored.withColumn("r", r).where(F.col("r") == 1)
    return win.groupBy("shard").agg(
        F.max("weight").cast("long").alias("weight"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


# --------------------------------------------------------------------
# Quota sample — largest-remainder (Hamilton) apportionment of a
# fixed budget k across sources, then deterministic per-source picks.
# The data-mixing planner's missing piece next to p_domain_reweight
# (which emits WEIGHTS): this emits an integer ALLOCATION that sums
# to exactly k, with the standard apportionment rule, all-integer.
# --------------------------------------------------------------------
_QUOTA_K = 120

QUOTA_ORACLE = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT sum(n_docs) AS n FROM per),
base AS (
  SELECT source, n_docs,
         ({_QUOTA_K} * n_docs) // tot.n AS base_q,
         ({_QUOTA_K} * n_docs) % tot.n AS rem
  FROM per, tot
),
seats AS (SELECT {_QUOTA_K} - sum(base_q) AS extra FROM base),
alloc AS (
  SELECT source, n_docs,
         base_q + CASE WHEN row_number() OVER
                         (ORDER BY rem DESC, source) <= seats.extra
                       THEN 1 ELSE 0 END AS alloc
  FROM base, seats
),
picked AS (
  SELECT d.source, d.doc_id
  FROM (
    SELECT source, doc_id,
           row_number() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents) d
  JOIN alloc a ON a.source = d.source AND d.rn <= a.alloc
)
SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs,
       CAST(a.alloc AS BIGINT) AS alloc,
       CAST(coalesce(p.id_sum, 0) AS BIGINT) AS picked_id_sum
FROM alloc a
LEFT JOIN (SELECT source, sum(doc_id) AS id_sum FROM picked
           GROUP BY source) p
  ON p.source = a.source
"""


@query("p_quota_sample", QUOTA_ORACLE)
def p_quota_sample(spark, sf_dir):
    """Hamilton largest-remainder quota sampling: apportion a budget
    of k=120 docs across sources proportionally (floor quotas, then
    one extra seat to the largest remainders), then pick each
    source's allocation deterministically by smallest md5(doc_id).
    ``picked_id_sum`` pins the exact survivor set without shipping
    the id list through the comparator (the d_semdedup trick).

    Scale shape: apportionment runs on the per-source count table
    (sources-sized, broadcast); the pick is one per-source top-k
    window over a corpus partitioned by source. All integer: floor
    quotas and remainders are exact on both engines, and Σ alloc = k
    by construction.
    """
    docs = table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("n"))
    base = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr(f"({_QUOTA_K} * n_docs) div n").alias("base_q"),
        F.expr(f"({_QUOTA_K} * n_docs) % n").alias("rem"),
    )
    seats = base.agg(
        (F.lit(_QUOTA_K) - F.sum("base_q")).alias("extra")
    )
    from pyspark.sql.window import Window as W

    rw = W.orderBy(F.desc("rem"), F.asc("source"))
    # alloc is referenced by the pick join AND the final report row —
    # its lineage embeds the whole per/tot/base/seats chain, so
    # without a materialization the per-source counting ran several
    # times over (9 documents scans in the before plan; 2 after).
    # Sources-sized table, trivial blocks.
    alloc = (
        base.crossJoin(F.broadcast(seats))
        .withColumn("rnk", F.row_number().over(rw))
        .select(
            "source",
            "n_docs",
            (
                F.col("base_q")
                + F.when(F.col("rnk") <= F.col("extra"), 1).otherwise(0)
            ).alias("alloc"),
        )
        .localCheckpoint(eager=False)
    )
    pw = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    picked = (
        docs.select("source", "doc_id")
        .withColumn("rn", F.row_number().over(pw))
        .join(F.broadcast(alloc.select("source", "alloc")), "source")
        .where(F.col("rn") <= F.col("alloc"))
        .groupBy("source")
        .agg(F.sum("doc_id").alias("id_sum"))
    )
    return alloc.join(picked, "source", "left").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("alloc").cast("long").alias("alloc"),
        F.coalesce("id_sum", F.lit(0)).cast("long").alias(
            "picked_id_sum"
        ),
    )


# --------------------------------------------------------------------
# Group-aware k-fold assignment — every event of a user lands in ONE
# fold (the leakage-safe split generalized to cross-validation), fold
# chosen by a hash byte so the assignment is stable under corpus
# growth (adding events never moves a user between folds).
# --------------------------------------------------------------------
_KFOLDS = 5

_KF_BYTE = (
    f"((strpos('{HEX}', substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)"
    f" * 16"
    f" + (strpos('{HEX}', substring(md5(CAST(user_id AS VARCHAR)), 2, 1))"
    f" - 1))"
)

KFOLD_ORACLE = f"""
WITH e AS (
  SELECT {_KF_BYTE} % {_KFOLDS} AS fold, user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
tot AS (SELECT count(*) AS n FROM e)
SELECT CAST(fold AS INT) AS fold,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST((1000000 * count(*)) // tot.n AS BIGINT) AS share_ppm,
       round(CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE)
             / count(*) / 100, 6) AS mean_value
FROM e, tot GROUP BY fold, tot.n
"""


@query("p_kfold_assign", KFOLD_ORACLE)
def p_kfold_assign(spark, sf_dir):
    """Group-aware k-fold cross-validation assignment audit: users
    hash into one of 5 folds (all their events follow — no
    train/test leakage through a shared user), and the audit reports
    each fold's user/event counts, exact ppm share, and mean value
    (so covariate balance is checkable before training).

    Scale shape: fold assignment is a per-row hash expression (no
    shuffle); the audit is one partial aggregation to 5 cells.
    """
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    byte = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 2),
            16,
            10,
        )
        .cast("int")
    )
    e = ev.select(
        F.pmod(byte, F.lit(_KFOLDS)).alias("fold"),
        "user_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    tot = e.agg(F.count(F.lit(1)).alias("n"))
    return (
        e.crossJoin(F.broadcast(tot))
        .groupBy("fold", "n")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("x").cast("decimal(38,0)"))
            .cast("double")
            .alias("sx"),
        )
        .select(
            F.col("fold").cast("int").alias("fold"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_events").cast("long").alias("n_events"),
            F.expr("(1000000 * n_events) div n")
            .cast("long")
            .alias("share_ppm"),
            F.round(F.col("sx") / F.col("n_events") / 100, 6).alias(
                "mean_value"
            ),
        )
    )
