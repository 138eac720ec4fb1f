"""Second batch of beyond-reference curation/maintenance queries:
forward-fill gap repair, MAD robust outliers, inverse-frequency
rarity scoring, small-file compaction planning, audio framing,
equi-depth histograms, BPE pair statistics, and linear gap
interpolation (the distributed analog of the reference's
``std[var].interpolate(method="linear")`` —
``scripts/3_qaqc_data/qaqc_climatological_outlier.py:175``).

Same determinism contract as queries/datasetops.py: integer/decimal
exact where possible, interpolated percentiles rounded on both sides,
expression text portable between Spark SQL and DuckDB.

Scale shapes:

- Forward-fill is one window pass partitioned by station (the
  reference's per-station pandas ``ffill`` re-expressed as
  ``last(ignorenulls)`` — no driver loop, no shuffle beyond the
  window's).
- MAD is two grouped percentile passes + broadcast joins of the tiny
  per-group stats (groups = event types).
- Rarity joins each token against the corpus vocabulary; the vocab
  fits broadcast at bench scale — at 100 TB swap the broadcast for a
  shuffle join or the CMS estimate (operators/sketches.py).
- Compaction planning runs over the per-file MANIFEST (one row per
  file/day), not the data — the single-partition cumulative sum is
  over thousands of rows however big the table is.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import textfns as TX
from ..registry import query
from .common import dec, table

# ------------------------------------------------------------ forward fill
# Reference analog: per-station pandas interpolation/infill during
# hourly standardization (MERGE_pipeline hourly grid). This is the
# generic LOCF (last-observation-carried-forward) repair as one
# window expression. Nulls are injected deterministically from the
# value itself so the fill logic is exercised on every run.

_FF_NULL = "floor(value * 3) % 5 = 0"  # ~20% of rows -> NULL

_FF_ORACLE = f"""
WITH obs AS (
  SELECT cast(user_id as string) AS station, ts AS time, event_id,
         CASE WHEN {_FF_NULL} THEN NULL
              ELSE CAST(value AS DECIMAL(18,2)) END AS v
  FROM events)
SELECT station, time, event_id,
       CAST(v AS DOUBLE) AS v_raw,
       CAST(last_value(v IGNORE NULLS) OVER (
              PARTITION BY station ORDER BY time, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS v_ff,
       CAST(v IS NULL AND last_value(v IGNORE NULLS) OVER (
              PARTITION BY station ORDER BY time, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            IS NOT NULL AS BOOLEAN) AS was_filled
FROM obs
"""


@query("w14_forward_fill", _FF_ORACLE)
def w14_forward_fill(spark, sf_dir):
    """Per-station LOCF gap fill: one window pass, shuffle only on
    the station partitioning — the distributed form of pandas
    ``groupby(station).ffill()``."""
    ev = table(spark, sf_dir, "events")
    obs = ev.select(
        F.col("user_id").cast("string").alias("station"),
        F.col("ts").alias("time"),
        "event_id",
        F.when(F.expr(_FF_NULL), F.lit(None)).otherwise(
            dec("value")
        ).alias("v"),
    )
    w = (
        Window.partitionBy("station")
        .orderBy("time", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ff = F.last("v", ignorenulls=True).over(w)
    return obs.select(
        "station",
        "time",
        "event_id",
        F.col("v").cast("double").alias("v_raw"),
        ff.cast("double").alias("v_ff"),
        (F.col("v").isNull() & ff.isNotNull()).alias("was_filled"),
    )


# ------------------------------------------------------------ MAD outliers
# Robust per-group outlier detection: median absolute deviation,
# immune to the outliers it hunts (the reference's distribution gap
# checks chase the same goal with Gaussian fits — A7/F22). Medians
# are interpolated (not exactly representable), so both engines round
# them to 6 decimals BEFORE the deviation pass; all comparisons then
# operate on identical doubles.

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type,
         round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS med
  FROM events GROUP BY event_type),
mad AS (
  SELECT e.event_type,
         round(quantile_cont(abs(CAST(e.value AS DOUBLE) - m.med),
                             0.5), 6) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       any_value(m.med) AS med,
       any_value(d.mad) AS mad,
       CAST(count(*) FILTER (
         WHERE abs(CAST(e.value AS DOUBLE) - m.med) > 3 * d.mad)
         AS BIGINT) AS n_outliers
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
GROUP BY e.event_type
"""


@query("a14_mad_outliers", _MAD_ORACLE)
def a14_mad_outliers(spark, sf_dir):
    """Median-absolute-deviation outlier counts per event type: two
    grouped exact-percentile passes, tiny per-group stats broadcast
    back — the robust companion to the Gaussian-fit checks (A7)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    # med feeds the MAD pass AND the final count pass, mad feeds the
    # final pass — materialize the tiny per-group stats so each exact
    # percentile (a sort aggregate over events) runs exactly once
    # instead of med 3x / mad 2x (plans are trees)
    med = (
        ev.groupBy("event_type")
        .agg(F.round(F.expr("percentile(v, 0.5)"), 6).alias("med"))
        .localCheckpoint(eager=False)
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(abs(v - med), 0.5)"), 6).alias(
            "mad"
        )
    ).localCheckpoint(eager=False)
    both = ev.join(F.broadcast(med), "event_type").join(
        F.broadcast(mad), "event_type"
    )
    return both.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("med").alias("med"),
        F.first("mad").alias("mad"),
        F.count_if(
            F.abs(F.col("v") - F.col("med")) > 3 * F.col("mad")
        ).cast("long").alias("n_outliers"),
    )


# ------------------------------------------------------------ rarity score
# Inverse-frequency document scoring — the integer-exact stand-in for
# unigram surprisal (log-based perplexity is not hash-oracle-able:
# libm ulp differences across engines). floor(N/c) weights a token by
# the reciprocal of its corpus frequency; duplicated tokens count
# every occurrence.

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

_RARITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
  FROM documents),
t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
vocab AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
n AS (SELECT count(*) AS n_total FROM t)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(floor(CAST(n.n_total AS DOUBLE) / vocab.c)
                AS BIGINT)) AS BIGINT) AS rarity
FROM t
JOIN vocab USING (tok)
CROSS JOIN n
GROUP BY t.doc_id
"""


@query("t_rarity_score", _RARITY_ORACLE)
def t_rarity_score(spark, sf_dir):
    """Integer inverse-frequency rarity per document: tokenize once,
    aggregate the vocabulary, broadcast it back over the token
    stream. At 100 TB the vocabulary outgrows a broadcast — swap the
    join for a shuffle join on tok, or score against the CMS sketch
    (sk_cms_heavy_hitters) for fixed memory."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
        )
        .where(F.col("tok") != "")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # n_total = Σ vocab counts — derived from the (small) vocabulary,
    # not from a second tokenize pass over the corpus
    n_total = vocab.agg(F.sum("c").alias("n_total"))
    scored = toks.join(F.broadcast(vocab), "tok").crossJoin(
        F.broadcast(n_total)
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.floor(
                F.col("n_total").cast("double") / F.col("c")
            ).cast("long")
        ).cast("long").alias("rarity"),
    )


# ------------------------------------------------------- compaction plan
# Small-file compaction planning — the table-maintenance operation
# every 100 TB lake needs: pack per-file row counts into target-sized
# bins by cumulative sum. Runs over the MANIFEST (one row per
# file/day — here: lineitem days), so the single-partition ordered
# window is over thousands of rows regardless of data volume; the
# plan then drives a repartition-and-rewrite of just the chosen bins.

_CP_TARGET = 50_000

_CP_ORACLE = f"""
WITH files AS (
  SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS n_rows
  FROM lineitem GROUP BY 1),
planned AS (
  SELECT day, n_rows,
         CAST(floor(CAST(sum(n_rows) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_rows AS DOUBLE) / {_CP_TARGET}) AS BIGINT) AS bin
  FROM files)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_rows) AS BIGINT) AS n_rows,
       strftime(min(day), '%Y-%m-%d') AS first_day,
       strftime(max(day), '%Y-%m-%d') AS last_day
FROM planned
GROUP BY bin
"""


@query("o12_compaction_plan", _CP_ORACLE)
def o12_compaction_plan(spark, sf_dir):
    """Greedy cumulative-sum bin packing of per-day file sizes into
    ~{target}-row compaction groups; each output bin is one rewrite
    task."""
    li = table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.col("l_shipdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    planned = files.withColumn(
        "bin",
        F.floor(
            (F.sum("n_rows").over(w) - F.col("n_rows")).cast("double")
            / F.lit(_CP_TARGET)
        ).cast("long"),
    )
    return planned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        # ISO strings, not DATE: the two engines surface dates as
        # different pandas dtypes, which trips the driver comparator
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_day"),
    )


# --------------------------------------------------------------- audio frames
# Audio leg of the multimodal surface: content = the document's UTF-8
# bytes read as unsigned-8-bit PCM (the deterministic fake decode —
# same convention as m_multimodal_features), framed into 160-sample
# windows by an Arrow mapInPandas island. The corpus is restricted to
# ASCII rows ON BOTH SIDES (octet_length(encode(text)) = length(text))
# so byte i == codepoint of char i and DuckDB can replay the island
# with unicode(substr(...)) arithmetic — integer-exact energy/peak,
# no float in sight.

_AU_FRAME = 160

_AU_ORACLE = f"""
WITH d AS (
  SELECT doc_id AS media_id, text
  FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
    AND octet_length(encode(text)) = length(text)),
frames AS (
  SELECT media_id, text,
         CAST(f AS INTEGER) AS frame_idx,
         CAST(f * {_AU_FRAME} + 1 AS INTEGER) AS lo,
         CAST(least((f + 1) * {_AU_FRAME}, length(text)) AS INTEGER) AS hi
  FROM d, unnest(generate_series(0,
         CAST(ceil(length(text) / {_AU_FRAME}.0) AS BIGINT) - 1)) AS u(f))
SELECT media_id, frame_idx,
       CAST(hi - lo + 1 AS INTEGER) AS n_samples,
       CAST(list_aggregate(list_transform(range(lo, hi + 1),
              i -> (unicode(substr(text, CAST(i AS INTEGER), 1)) - 128)
                 * (unicode(substr(text, CAST(i AS INTEGER), 1)) - 128)),
            'sum') AS BIGINT) AS energy,
       CAST(list_aggregate(list_transform(range(lo, hi + 1),
              i -> abs(unicode(substr(text, CAST(i AS INTEGER), 1)) - 128)),
            'max') AS INTEGER) AS peak
FROM frames
"""


@query("m_audio_energy", _AU_ORACLE)
def m_audio_energy(spark, sf_dir):
    """Per-frame audio energy/peak through the mapInPandas framing
    island (operators/multimodal.frame_energy). Map-only plumbing —
    one Arrow pass over the media bytes, one output row per 20 ms
    frame."""
    from ..operators import multimodal as MM

    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
        & (F.length("text") > 0)
        & (F.octet_length(F.encode("text", "UTF-8")) == F.length("text"))
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
    )
    return MM.frame_energy(media, frame_bytes=_AU_FRAME)


# ------------------------------------------------------- equi-depth histogram
# Rank-based equi-depth (equal-count) histogram — the optimizer-
# statistics companion of the fixed-width A3 histogram: bucket
# boundaries adapt to the distribution, so every bucket holds n/k
# rows. Bucket assignment is pure integer arithmetic over the rank
# (floor((rank-1)*k / n)), making the whole thing hash-exact; ties
# order on (value, event_id) deterministically on both engines.

_ED_K = 10

_ED_ORACLE = f"""
WITH r AS (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type,
       CAST(floor((rn - 1) * {_ED_K} / CAST(n AS DOUBLE)) AS INTEGER)
         AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(v) AS DOUBLE) AS lo,
       CAST(max(v) AS DOUBLE) AS hi,
       CAST(sum(v) AS DOUBLE) AS sum_v
FROM r
GROUP BY 1, 2
"""


@query("a15_equidepth_hist", _ED_ORACLE)
def a15_equidepth_hist(spark, sf_dir):
    """Per-group equi-depth histogram: one window pass for ranks, one
    grouped aggregate — at scale this is the NDV/selectivity
    statistic a cost-based planner wants, computed with one shuffle
    on the group key."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        dec("value").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bucket = F.floor(
        (F.col("rn") - 1) * _ED_K / F.col("n").cast("double")
    ).cast("int")
    return r.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("v").cast("double").alias("lo"),
        F.max("v").cast("double").alias("hi"),
        F.sum("v").cast("double").alias("sum_v"),
    )


# ------------------------------------------------------------- BPE pair stats
# The first step of BPE tokenizer training: corpus-wide adjacent
# symbol-pair frequencies (here: character pairs within words,
# weighted by word frequency). Everything is integer-exact and the
# top-k cutoff ranks on (count DESC, pair ASC) so ties can't diverge
# between engines. Scale shape: the heavy explode runs over the
# DISTINCT word list (vocabulary-sized, not corpus-sized); corpus
# frequency arrives as a weight from one groupBy.

_BPE_TOP = 20

_BPE_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents),
words AS (
  SELECT w, count(*) AS nw FROM toks
  WHERE length(w) >= 2 GROUP BY w),
pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, nw
  FROM words, unnest(generate_series(1, length(w) - 1)) AS u(i)),
counts AS (
  SELECT pair, CAST(sum(nw) AS BIGINT) AS n FROM pairs GROUP BY pair),
ranked AS (
  SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rk
  FROM counts)
SELECT pair, n FROM ranked WHERE rk <= {_BPE_TOP}
"""


@query("t_bpe_pair_stats", _BPE_ORACLE)
def t_bpe_pair_stats(spark, sf_dir):
    """Top adjacent character-pair frequencies over the corpus — the
    merge-candidate statistic of one BPE training round. The explode
    is over the distinct vocabulary (weighted by corpus counts), so
    at 100 TB the pair pass costs O(vocab), not O(corpus)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(TX.tokens(F.col("text"))).alias("w")
    ).where(
        # >= 2 chars: Spark's sequence(1, 0) counts DOWN (yields
        # [1, 0]) rather than returning empty, so 1-char words must
        # be excluded before the position explode
        F.length("w") >= 2
    )
    words = toks.groupBy("w").agg(F.count(F.lit(1)).alias("nw"))
    pairs = words.select(
        F.explode(
            F.sequence(F.lit(1), F.length("w") - 1)
        ).alias("i"),
        "w",
        "nw",
    ).select(
        F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"),
        "nw",
    )
    counts = pairs.groupBy("pair").agg(
        F.sum("nw").cast("long").alias("n")
    )
    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _BPE_TOP)
        .select("pair", "n")
    )


# --------------------------------------------------------- linear interpolation
# Within-gap linear interpolation — the reference's per-station
# pandas ``interpolate(method="linear")``
# (qaqc_climatological_outlier.py:175) as window expressions: each
# null takes the time-weighted blend of the nearest non-null
# neighbors on both sides; one-sided gaps match pandas interpolate's
# defaults — trailing nulls carry the last observation forward,
# leading nulls (no anchor yet) STAY NULL, never looking ahead.
# Both sides carry (value, epoch-microsecond) pairs through
# IGNORE-NULLS windows; the blend ratio is the only inexact step and
# is rounded identically on both engines.

_LI_NULL = _FF_NULL  # the same injected gaps as w14, by construction


def _li_oracle() -> str:
    fwd = ("ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
    bwd = ("ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING")
    return f"""
WITH obs AS (
  SELECT cast(user_id as string) AS station, ts AS time, event_id,
         epoch_us(ts) AS us,
         CASE WHEN {_LI_NULL} THEN NULL
              ELSE CAST(value AS DECIMAL(18,2)) END AS v
  FROM events),
w AS (
  SELECT station, time, event_id, us, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY station ORDER BY time, event_id {fwd}) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
           OVER (PARTITION BY station ORDER BY time, event_id {fwd})
           AS pt,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY station ORDER BY time, event_id {bwd}) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
           OVER (PARTITION BY station ORDER BY time, event_id {bwd})
           AS nt
  FROM obs)
SELECT station, time, event_id,
       CAST(v AS DOUBLE) AS v_raw,
       round(CASE
         WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
         WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
           THEN CAST(pv AS DOUBLE)
                + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                  * ((us - pt) / CAST(nt - pt AS DOUBLE))
         ELSE CAST(pv AS DOUBLE)
       END, 6) AS v_interp
FROM w
"""


@query("w15_linear_interp", _li_oracle())
def w15_linear_interp(spark, sf_dir):
    """Per-station linear gap interpolation: two IGNORE-NULLS window
    passes over one station partitioning (the forward and backward
    frames share the same Exchange), no join, no driver loop."""
    W = Window

    ev = table(spark, sf_dir, "events")
    obs = ev.select(
        F.col("user_id").cast("string").alias("station"),
        F.col("ts").alias("time"),
        "event_id",
        # ts reads as NTZ; session tz is UTC so the LTZ cast is
        # value-preserving and unix_micros == DuckDB epoch_us
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.when(F.expr(_LI_NULL), F.lit(None))
        .otherwise(dec("value"))
        .alias("v"),
    )
    fwd = (
        W.partitionBy("station")
        .orderBy("time", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    bwd = (
        W.partitionBy("station")
        .orderBy("time", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    t_of_v = F.when(F.col("v").isNotNull(), F.col("us"))
    w = obs.select(
        "station",
        "time",
        "event_id",
        "us",
        "v",
        F.last("v", ignorenulls=True).over(fwd).alias("pv"),
        F.last(t_of_v, ignorenulls=True).over(fwd).alias("pt"),
        F.first("v", ignorenulls=True).over(bwd).alias("nv"),
        F.first(t_of_v, ignorenulls=True).over(bwd).alias("nt"),
    )
    pvd = F.col("pv").cast("double")
    nvd = F.col("nv").cast("double")
    blend = pvd + (nvd - pvd) * (
        (F.col("us") - F.col("pt"))
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    return w.select(
        "station",
        "time",
        "event_id",
        F.col("v").cast("double").alias("v_raw"),
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v").cast("double"))
            .when(
                F.col("pv").isNotNull()
                & F.col("nv").isNotNull()
                & (F.col("nt") > F.col("pt")),
                blend,
            )
            .otherwise(pvd),
            6,
        ).alias("v_interp"),
    )


# ------------------------------------------------------------- table profile
# One-pass table profiling — the statistics a cost-based planner (or
# an ingest gate) collects: per-column null counts, exact distinct
# counts, and decimal-exact numeric ranges, computed in ONE aggregate
# over the scan and unpivoted to long form. At 100 TB swap the exact
# count_distinct for the HLL registers (operators/sketches.py) to
# keep the pass fixed-memory.

_PROF_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_PROF_ORACLE = " UNION ALL ".join(
    f"""
SELECT '{c}' AS col,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
       CAST(max(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
       CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
FROM lineitem"""
    for c in _PROF_COLS
)


@query("o13_table_profile", _PROF_ORACLE)
def o13_table_profile(spark, sf_dir):
    """Column statistics via unpivot + TWO-stage aggregation: the
    scan unpivots to narrow (col, value) pairs, the first partial agg
    collapses to (col, value, cnt) — map-side combine flattens the
    low-cardinality columns immediately — and the second computes
    every statistic exactly from the collapsed pairs (n_distinct =
    row count, sum = Σ value·cnt in decimal, min/max over values).
    This replaces the previous single-agg form, whose 4 exact
    countDistinct aggregates forced a 5x EXPAND of full-width rows
    through one hash aggregate (measured 4.0 s vs 1.3 s at sf0.1).
    At 100 TB swap the exact distinct for the HLL registers as
    documented above."""
    li = table(spark, sf_dir, "lineitem")
    # NULL cells stay in the unpivot as (col, NULL) pairs, so the
    # null count per column comes out of the SAME collapsed table —
    # the previous separate total-count aggregate was a second full
    # lineitem scan just to derive n_null = total - n_nonnull
    # (guide §1.2: one pass where one pass suffices). Every input row
    # contributes exactly one pair per column, so
    # sum(cnt | value IS NULL) is exactly that column's null count.
    pairs = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"), dec(c).alias("value")
                    )
                    for c in _PROF_COLS
                ]
            )
        ).alias("p")
    ).select("p.col", "p.value")
    collapsed = pairs.groupBy("col", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = collapsed.groupBy("col").agg(
        F.coalesce(
            F.sum(F.when(F.col("value").isNull(), F.col("cnt"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_null"),
        # one collapsed row per distinct non-null value
        F.count("value").cast("long").alias("n_distinct"),
        F.min("value").cast("double").alias("min_v"),
        F.max("value").cast("double").alias("max_v"),
        F.sum(F.col("value") * F.col("cnt"))
        .cast("double")
        .alias("sum_v"),
    )
    return stats.select(
        "col", "n_null", "n_distinct", "min_v", "max_v", "sum_v"
    )


# ---------------------------------------------------------------- CUSUM drift
# CUSUM change detection per station: one-sided cumulative sums of
# deviations from the station mean, reset at zero — the classic
# drift/shift detector (complements the spike checks W6, which catch
# POINT anomalies; CUSUM catches sustained level shifts). The
# recursive max(0, prev + dev) form is not a plain window sum, so
# both engines compute the equivalent prefix-min formulation:
#   cusum_i = prefix_sum_i - min(0, running_min of prefix_sum)
# over deviations from the station mean. Everything runs in EXACT
# integer arithmetic: values are 2-decimal, so deviations are scaled
# by n (dev_i = n·v_i − Σv, in cents) — no division, no float window
# sums (window sums evaluate through different addition trees across
# engines, so double prefix sums are NOT cross-engine stable). The
# single inexact step is the final per-station max, divided back by
# 100·n and rounded.

_CUSUM_THRESH = 500  # in value units

_CUSUM_ORACLE = f"""
WITH base AS (
  SELECT cast(user_id as string) AS station, ts AS time, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events),
m AS (
  SELECT station, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS total
  FROM base GROUP BY station),
d AS (
  SELECT b.station, b.time, b.event_id, m.n,
         sum(b.cents * m.n - m.total) OVER w AS ps
  FROM base b JOIN m USING (station)
  WINDOW w AS (PARTITION BY b.station ORDER BY b.time, b.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
c AS (
  SELECT station, n,
         ps - least(0, min(ps) OVER (
           PARTITION BY station ORDER BY time, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS cusum_scaled
  FROM d)
SELECT station,
       CAST(max(n) AS BIGINT) AS n,
       round(CAST(max(cusum_scaled) AS DOUBLE) / (100.0 * max(n)), 6)
         AS max_cusum,
       CAST(count(*) FILTER (
         WHERE cusum_scaled > {_CUSUM_THRESH} * 100 * n) AS BIGINT)
         AS n_over_threshold
FROM c GROUP BY station
"""


@query("w16_cusum_drift", _CUSUM_ORACLE)
def w16_cusum_drift(spark, sf_dir):
    """Per-station CUSUM drift statistics via the prefix-min
    reformulation (no recursion): two stacked window passes sharing
    one station Exchange, then a per-station rollup. All prefix math
    is integer (cent-scaled, deviation multiplied through by n), so
    the result is independent of aggregation trees on both engines;
    only the final reported maximum divides back to value units."""
    W = Window

    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("station"),
        F.col("ts").alias("time"),
        "event_id",
        (dec("value") * 100).cast("long").alias("cents"),
    )
    m = ev.groupBy("station").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("total"),
    )
    run = (
        W.partitionBy("station")
        .orderBy("time", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # deviation accumulates in decimal(38,0), not BIGINT: the prefix
    # sum is bounded by ~n² · cents-range per station, which wraps a
    # non-ANSI BIGINT beyond ~10^7 rows/station while DuckDB promotes
    # to HUGEINT — decimal keeps the two engines exact to ~10^15
    # rows/station (38 digits), far past any real per-station record
    d = ev.join(F.broadcast(m), "station").select(
        "station",
        "time",
        "event_id",
        "n",
        F.sum(
            F.col("cents").cast("decimal(20,0)") * F.col("n")
            - F.col("total")
        ).over(run).alias("ps"),
    )
    c = d.select(
        "station",
        "time",
        "event_id",
        "n",
        (
            F.col("ps")
            - F.least(
                F.lit(0).cast("decimal(38,0)"), F.min("ps").over(run)
            )
        ).alias("cusum_scaled"),
    )
    return c.groupBy("station").agg(
        F.max("n").cast("long").alias("n"),
        F.round(
            F.max("cusum_scaled").cast("double")
            / (F.lit(100.0) * F.max("n")),
            6,
        ).alias("max_cusum"),
        F.count_if(
            F.col("cusum_scaled")
            > F.lit(_CUSUM_THRESH) * 100 * F.col("n")
        ).cast("long").alias("n_over_threshold"),
    )


# --------------------------------------------------------------- funnel
# Sequential funnel analysis — per-user stage completion where each
# stage must occur STRICTLY AFTER the user's previous stage time and
# within a 3-day conversion window (view → click → signup →
# purchase; at sf0.01 the window takes conversion from 100% to
# 150→115→80→59, so every stage filter is exercised). The cascade is
# filtered-min joins over per-user minima: each stage table is one
# row per surviving user, so at 100 TB every join is co-partitioned
# on user_id (or broadcast once survivors thin out) and nothing
# rescans events more than the four stage passes. Comparisons run on
# epoch microseconds so both engines' parquet timestamp encodings
# agree.

_FUNNEL_STAGES = ["view", "click", "signup", "purchase"]
_FUNNEL_WINDOW_US = 3 * 86400 * 1_000_000  # 3-day conversion window


def _funnel_oracle() -> str:
    ctes = [
        """
s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id)"""
    ]
    for i, stage in enumerate(_FUNNEL_STAGES[1:], start=2):
        ctes.append(f"""
s{i} AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t{i}
  FROM events e JOIN s{i - 1} p ON e.user_id = p.user_id
  WHERE e.event_type = '{stage}'
    AND epoch_us(e.ts) > p.t{i - 1}
    AND epoch_us(e.ts) <= p.t{i - 1} + {_FUNNEL_WINDOW_US}
  GROUP BY e.user_id)""")
    selects = ", ".join(
        f"(SELECT CAST(count(*) AS BIGINT) FROM s{i}) AS n_{stage}"
        for i, stage in enumerate(_FUNNEL_STAGES, start=1)
    )
    checksum = (
        f"(SELECT CAST(coalesce(sum(user_id), 0) AS BIGINT) "
        f"FROM s{len(_FUNNEL_STAGES)}) AS converted_checksum"
    )
    return f"WITH {', '.join(ctes)}\nSELECT {selects}, {checksum}"


@query("w17_funnel", _funnel_oracle())
def w17_funnel(spark, sf_dir):
    """Strictly-ordered funnel completion counts per stage plus a
    converted-user checksum pinning the exact surviving set."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    # each per-user stage table is referenced by the NEXT stage's
    # filtered-min join and by the final counting pass; without a
    # materialization the cascade re-evaluated stage 1 five times,
    # stage 2 four times, ... (14 events scans in the before plan —
    # plans are trees). Four tiny checkpointed per-user tables, each
    # events pass runs once.
    stage_frames = []
    prev = None
    for i, stage in enumerate(_FUNNEL_STAGES, start=1):
        cur = ev.where(F.col("event_type") == stage)
        if prev is not None:
            cur = cur.join(prev, "user_id").where(
                (F.col("us") > F.col(f"t{i - 1}"))
                & (
                    F.col("us")
                    <= F.col(f"t{i - 1}") + _FUNNEL_WINDOW_US
                )
            )
        cur = (
            cur.groupBy("user_id")
            .agg(F.min("us").alias(f"t{i}"))
            .localCheckpoint(eager=False)
        )
        stage_frames.append(cur)
        prev = cur
    # survivors nest (s4 ⊆ s3 ⊆ s2 ⊆ s1, each one row per user), so
    # ONE left-join chain + one aggregate replaces the four separate
    # count branches and their crossJoins: count(t_i) = |s_i|
    chain = stage_frames[0]
    for nxt in stage_frames[1:]:
        chain = chain.join(nxt, "user_id", "left")
    return chain.agg(
        *[
            F.count(f"t{i}").alias(f"n_{stage}")
            for i, stage in enumerate(_FUNNEL_STAGES, start=1)
        ],
        F.coalesce(
            F.sum(
                F.when(
                    F.col(f"t{len(_FUNNEL_STAGES)}").isNotNull(),
                    F.col("user_id"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("converted_checksum"),
    )


# -------------------------------------------------------------- retention
# Weekly cohort retention — the companion of the funnel: users are
# cohorted by their first-activity week; cell (cohort, k) counts how
# many were active in week cohort+k. Two grouped passes (first-seen
# per user, then distinct user-week activity joined back) — the
# activity join is co-partitioned on user_id, and the output is
# cohorts × horizon, tiny at any corpus size. All integer arithmetic
# (epoch-week numbers), hash-exact by construction.

_RET_HORIZON = 8  # weeks tracked per cohort

_RET_ORACLE = f"""
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS week
  FROM events),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM act GROUP BY user_id),
cells AS (
  SELECT c.cohort_week, a.week - c.cohort_week AS k
  FROM act a JOIN cohort c USING (user_id)
  WHERE a.week - c.cohort_week <= {_RET_HORIZON})
SELECT cohort_week,
       CAST(k AS INTEGER) AS k,
       CAST(count(*) AS BIGINT) AS n_active
FROM cells GROUP BY cohort_week, k
"""


@query("w18_retention", _RET_ORACLE)
def w18_retention(spark, sf_dir):
    """Cohort-week retention counts: (cohort_week, k) → users active
    k weeks after their first week, k <= horizon."""
    ev = table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp"))
            / F.lit(604_800_000_000)
        ).alias("week"),
    ).distinct()
    cohort = act.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    cells = (
        act.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("k"),
        )
        .where(F.col("k") <= _RET_HORIZON)
    )
    return cells.groupBy(
        "cohort_week", F.col("k").cast("int").alias("k")
    ).agg(F.count(F.lit(1)).alias("n_active"))


# ------------------------------------------------------------- moment stats
# One-pass higher-moment statistics per group — the mergeable
# "moment sketch": exact integer power sums (values are 2-decimal →
# cents are integers; cents² ... cents⁴ sum exactly in DECIMAL(38)),
# from which mean/variance/skewness/kurtosis derive in one closed
# form. Exactness sidesteps both engines' different corrected
# skewness/kurtosis definitions AND float partial-sum ordering; the
# double arithmetic happens once per GROUP on identical exact inputs.

_MOM_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS s1,
         CAST(sum(CAST(x AS DECIMAL(19,0))
                  * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS s2,
         CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
                  * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS s3,
         CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
                  * CAST(x AS DECIMAL(19,0))
                  * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS s4
  FROM c GROUP BY event_type)
SELECT event_type, n,
       round(s1 / n / 100, 6) AS mean,
       round((s2 / n - (s1 / n) * (s1 / n)) / 10000, 6) AS variance,
       round((s3 / n - 3 * (s1 / n) * (s2 / n)
              + 2 * (s1 / n) * (s1 / n) * (s1 / n))
             / power(s2 / n - (s1 / n) * (s1 / n), 1.5), 6)
         AS skewness,
       round((s4 / n - 4 * (s1 / n) * (s3 / n)
              + 6 * (s1 / n) * (s1 / n) * (s2 / n)
              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
             / power(s2 / n - (s1 / n) * (s1 / n), 2), 6)
         AS kurtosis
FROM s
"""


@query("a16_moment_stats", _MOM_ORACLE)
def a16_moment_stats(spark, sf_dir):
    """Exact power sums → mean/variance/skewness/kurtosis per group
    in ONE partial-aggregating pass. The four sums are the mergeable
    state (addition-associative), so shards combine losslessly —
    unlike streaming float variance algorithms whose merge order
    leaks into the result."""
    ev = table(spark, sf_dir, "events")
    x = (dec("value") * 100).cast("long")
    xd = F.col("x").cast("decimal(19,0)")
    c = ev.select("event_type", x.alias("x"))
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(xd * xd).cast("double").alias("s2"),
        F.sum(xd * xd * xd).cast("double").alias("s3"),
        F.sum(xd * xd * xd * xd).cast("double").alias("s4"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n")
    m3 = F.col("s3") / F.col("n")
    m4 = F.col("s4") / F.col("n")
    var = m2 - m1 * m1
    return s.select(
        "event_type",
        "n",
        F.round(m1 / 100, 6).alias("mean"),
        F.round(var / 10000, 6).alias("variance"),
        F.round(
            (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
            / F.pow(var, F.lit(1.5)),
            6,
        ).alias("skewness"),
        F.round(
            (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2
             - 3 * m1 * m1 * m1 * m1)
            / F.pow(var, F.lit(2.0)),
            6,
        ).alias("kurtosis"),
    )


# ------------------------------------------------- o14: sketch profile
# o13's documented 100 TB swap, implemented and measured: per-column
# distinct counts via mergeable HLL registers instead of exact
# countDistinct — ONE scan (posexplode of the column array, the same
# expand shape o13 uses), one (column, bucket) shuffle whose state is
# 256 registers per column regardless of cardinality. The exact
# counts ride along at test scale solely to report the realized
# relative error; at 100 TB you drop the exact branch and keep the
# registers (they also merge across corpus versions — hll_merge).
_O14_COLS = ["user_id", "event_type", "value"]


def _o14_oracle(bucket_hex: int = 2, tail_hex: int = 12) -> str:
    from ..operators.sketches import _rho_expr

    m = 16 ** bucket_hex
    alpha = 0.7213 / (1 + 1.079 / m)
    # value renders through DECIMAL(18,2) so both engines hash the
    # same string ('123.45' — raw double->varchar rendering differs)
    srcs = " UNION ALL ".join(
        [
            "SELECT 0 AS cidx, CAST(user_id AS VARCHAR) AS val "
            "FROM events WHERE user_id IS NOT NULL",
            "SELECT 1, event_type FROM events "
            "WHERE event_type IS NOT NULL",
            "SELECT 2, CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) "
            "FROM events WHERE value IS NOT NULL",
        ]
    )
    rho = _rho_expr(f"substring(md5(val), {bucket_hex + 1}, {tail_hex})", tail_hex)
    raw = f"{alpha * m * m!r} / (z_used + ({m} - n_used))"
    return f"""
WITH src AS ({srcs}),
regs AS (
  SELECT cidx, substring(md5(val), 1, {bucket_hex}) AS bucket,
         max({rho}) AS M
  FROM src GROUP BY cidx, 2
),
agg AS (
  SELECT cidx, sum(power(CAST(2 AS DOUBLE), -M)) AS z_used,
         count(*) AS n_used
  FROM regs GROUP BY cidx
),
ex AS (SELECT cidx, count(DISTINCT val) AS exact_distinct
       FROM src GROUP BY cidx),
est AS (
  SELECT cidx,
         round(CASE
           WHEN ({m} - n_used) > 0 AND {raw} <= {2.5 * m!r}
             THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_used))
           ELSE {raw}
         END, 6) AS approx_distinct
  FROM agg
)
SELECT CASE cidx WHEN 0 THEN 'user_id' WHEN 1 THEN 'event_type'
       ELSE 'value' END AS column_name,
       est.approx_distinct,
       CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
       round(abs(est.approx_distinct - ex.exact_distinct)
             / ex.exact_distinct, 6) AS rel_err
FROM est JOIN ex USING (cidx)
"""


@query("o14_profile_hll", _o14_oracle())
def o14_profile_hll(spark, sf_dir):
    """Sketch-based table profile: per-column HLL distinct estimates
    from one scan + one 256-registers-per-column shuffle, with the
    realized error vs exact reported alongside (drop the exact branch
    at scale — the registers are the product, and they merge)."""
    from ..operators.sketches import _rho_expr

    bucket_hex, tail_hex = 2, 12
    m = 16 ** bucket_hex
    alpha = 0.7213 / (1 + 1.079 / m)
    ev = table(spark, sf_dir, "events")
    vals = ev.select(
        F.posexplode(
            F.array(
                F.col("user_id").cast("string"),
                F.col("event_type"),
                F.col("value").cast("decimal(18,2)").cast("string"),
            )
        ).alias("cidx", "val")
    ).where(F.col("val").isNotNull())
    hashed = vals.select("cidx", "val", F.md5("val").alias("__h"))
    regs = (
        hashed.select(
            "cidx",
            F.substring("__h", 1, bucket_hex).alias("bucket"),
            F.expr(
                _rho_expr(
                    f"substring(__h, {bucket_hex + 1}, {tail_hex})",
                    tail_hex,
                )
            ).alias("rho"),
        )
        .groupBy("cidx", "bucket")
        .agg(F.max("rho").alias("M"))
    )
    agg = regs.groupBy("cidx").agg(
        F.sum(F.expr("power(cast(2 as double), -M)")).alias("z_used"),
        F.count(F.lit(1)).alias("n_used"),
    )
    raw = F.lit(alpha * m * m) / (
        F.col("z_used") + (F.lit(m) - F.col("n_used"))
    )
    est = agg.select(
        "cidx",
        F.round(
            F.when(
                ((F.lit(m) - F.col("n_used")) > 0)
                & (raw <= F.lit(2.5 * m)),
                F.lit(float(m))
                * F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_used"))),
            ).otherwise(raw),
            6,
        ).alias("approx_distinct"),
    )
    exact = vals.groupBy("cidx").agg(
        F.countDistinct("val").cast("long").alias("exact_distinct")
    )
    names = F.array(*[F.lit(c) for c in _O14_COLS])
    return (
        est.join(exact, "cidx")
        .select(
            F.element_at(names, F.col("cidx") + 1).alias("column_name"),
            "approx_distinct",
            "exact_distinct",
            F.round(
                F.abs(
                    F.col("approx_distinct") - F.col("exact_distinct")
                )
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
    )


# --------------------------------------------------------------------
# Data-contract validation (the Deequ-style constraint suite, Schelter
# et al. VLDB'18): a declarative set of per-column constraints checked
# in ONE scan — every violation count is a conditional partial
# aggregate in the same pass, the wide row unpivots to the report, and
# nothing reruns per check. Violations are integer ppm (floor div on
# non-negative counts, engine-identical); the value range bound is
# deliberately tighter than the data so the report shows a failing
# contract line alongside the passing ones.
# --------------------------------------------------------------------
_CONTRACT = [
    # (check, col, bad-row SQL predicate, threshold_ppm)
    ("not_null", "event_id", "event_id IS NULL", 0),
    ("not_null", "ts", "ts IS NULL", 0),
    ("null_rate_max", "value", "value IS NULL", 50000),
    ("vocab", "event_type",
     "event_type IS NULL OR event_type NOT IN "
     "('click','error','purchase','signup','view')", 0),
    ("range", "value", "value < 0.0 OR value > 500.0", 0),
    ("non_negative", "user_id", "user_id < 0", 0),
    ("freshness", "ts",
     "ts < TIMESTAMP '2024-01-01' OR ts >= TIMESTAMP '2024-02-01'", 0),
]

_CONTRACT_ORACLE = (
    "WITH agg AS (SELECT CAST(count(*) AS BIGINT) AS total, "
    + ", ".join(
        f"CAST(count(*) FILTER (WHERE {pred}) AS BIGINT) AS bad_{i}"
        for i, (_, _, pred, _) in enumerate(_CONTRACT)
    )
    + ", CAST(count(*) - count(DISTINCT event_id) AS BIGINT)"
    " AS bad_unique FROM events) "
    + " UNION ALL ".join(
        f"""
SELECT '{chk}' AS chk, '{col}' AS col,
       (bad_{i} * 1000000) // total AS observed_ppm,
       CAST({thr} AS BIGINT) AS threshold_ppm,
       CAST(CASE WHEN (bad_{i} * 1000000) // total <= {thr}
            THEN 1 ELSE 0 END AS INTEGER) AS pass
FROM agg"""
        for i, (chk, col, _, thr) in enumerate(_CONTRACT)
    )
    + """
UNION ALL
SELECT 'unique', 'event_id',
       (bad_unique * 1000000) // total,
       CAST(0 AS BIGINT),
       CAST(CASE WHEN bad_unique = 0 THEN 1 ELSE 0 END AS INTEGER)
FROM agg"""
)


@query("o21_contract_checks", _CONTRACT_ORACLE)
def o21_contract_checks(spark, sf_dir):
    """Declarative data-contract report over events: not-null, max
    null rate, vocabulary membership, numeric range, non-negativity,
    freshness window, and key uniqueness — all counted in one
    partial-aggregating scan (conditional counts + one distinct),
    then unpivoted to (chk, col, observed_ppm, threshold_ppm, pass).
    At 100 TB this is the same single-exchange shape as
    ``o13_table_profile``: no per-check rescan, no shuffle beyond the
    final 8-row aggregate. Violations are floor-div ppm so both
    engines emit identical integers."""
    ev = table(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).cast("long").alias("total")]
    for i, (_, _, pred, _) in enumerate(_CONTRACT):
        aggs.append(
            F.count_if(F.expr(pred)).cast("long").alias(f"bad_{i}")
        )
    aggs.append(
        (F.count(F.lit(1)) - F.countDistinct("event_id"))
        .cast("long")
        .alias("bad_unique")
    )
    wide = ev.agg(*aggs)
    rows = [
        F.struct(
            F.lit(chk).alias("chk"),
            F.lit(col).alias("col"),
            F.expr(f"(bad_{i} * 1000000) DIV total").alias(
                "observed_ppm"
            ),
            F.lit(thr).cast("long").alias("threshold_ppm"),
            F.when(
                F.expr(f"(bad_{i} * 1000000) DIV total") <= F.lit(thr),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("pass"),
        )
        for i, (chk, col, _, thr) in enumerate(_CONTRACT)
    ]
    rows.append(
        F.struct(
            F.lit("unique").alias("chk"),
            F.lit("event_id").alias("col"),
            F.expr("(bad_unique * 1000000) DIV total").alias(
                "observed_ppm"
            ),
            F.lit(0).cast("long").alias("threshold_ppm"),
            F.when(F.col("bad_unique") == 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("pass"),
        )
    )
    return wide.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.chk", "r.col", "r.observed_ppm", "r.threshold_ppm", "r.pass")


# --------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov drift statistic in pure integer
# arithmetic: D = max_x |F_A(x) - F_B(x)| becomes
# max |cumA(x)*NB - cumB(x)*NA| over the pooled support, so both
# engines compare identical BIGINTs and only the final ppm is a floor
# division. The heavy stage is the distributed groupBy on the
# (2-decimal-quantized, hence bounded-cardinality) value; the CDF
# cumsum window then runs over <=56k distinct values — a deliberately
# tiny single-partition tail, not a full-data global sort.
# --------------------------------------------------------------------
_KS_ORACLE = """
WITH g AS (
  SELECT value,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
           AS n_a,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
           AS n_b
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY value
),
c AS (
  SELECT sum(n_a) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         sum(n_b) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
         sum(n_a) OVER () AS tot_a,
         sum(n_b) OVER () AS tot_b
  FROM g
)
SELECT CAST(max(tot_a) AS BIGINT) AS n_click,
       CAST(max(tot_b) AS BIGINT) AS n_view,
       CAST(max(abs(cum_a * tot_b - cum_b * tot_a)) AS BIGINT)
         AS ks_scaled,
       CAST(max(abs(cum_a * tot_b - cum_b * tot_a)) * 1000000
            // (max(tot_a) * max(tot_b)) AS BIGINT) AS ks_ppm
FROM c
"""


@query("a18_ks_drift", _KS_ORACLE)
def a18_ks_drift(spark, sf_dir):
    """Exact two-sample KS distance between the click and view value
    distributions. D's comparisons run entirely in BIGINT
    (|cumA*NB - cumB*NA|), so the statistic is cross-engine exact;
    ks_ppm = floor(scaled * 1e6 / (NA*NB)). Plan: the distributed
    stage is one groupBy on the quantized value (bounded domain →
    bounded group count); the CDF window then covers only the
    distinct-value table, so the unpartitioned cumsum is a
    constant-size tail at any corpus scale, not a global data sort."""
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "view"))
        .groupBy("value")
        .agg(
            F.count_if(F.col("event_type") == "click")
            .cast("long")
            .alias("n_a"),
            F.count_if(F.col("event_type") == "view")
            .cast("long")
            .alias("n_b"),
        )
    )
    w_cdf = (
        Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    c = ev.select(
        F.sum("n_a").over(w_cdf).alias("cum_a"),
        F.sum("n_b").over(w_cdf).alias("cum_b"),
        F.sum("n_a").over(w_all).alias("tot_a"),
        F.sum("n_b").over(w_all).alias("tot_b"),
    )
    diff = F.abs(
        F.col("cum_a") * F.col("tot_b") - F.col("cum_b") * F.col("tot_a")
    )
    return (
        c.groupBy("tot_a", "tot_b")
        .agg(F.max(diff).cast("long").alias("ks_scaled"))
        .select(
            F.col("tot_a").cast("long").alias("n_click"),
            F.col("tot_b").cast("long").alias("n_view"),
            "ks_scaled",
            F.expr("CAST(ks_scaled * 1000000 DIV (tot_a * tot_b) AS BIGINT)")
            .alias("ks_ppm"),
        )
    )


# --------------------------------------------------------------------
# Population Stability Index between the click and view value
# distributions — the industry-standard ML-ops drift score — over 20
# fixed equi-width bins with add-one smoothing (so empty bins are
# well-defined without epsilon hacks). Every per-bin probability is
# one IEEE division of exact integers (identical in both engines);
# the only libm call is ln, whose <=1-ulp spread is absorbed by the
# final round(...,6); and the 20-term sum folds in bin order on both
# sides (list ORDER BY b / aggregate over a sorted array), per the
# repo's fold-order rule for float sums.
# --------------------------------------------------------------------
_PSI_ORACLE = """
WITH ev AS (
  SELECT value, event_type FROM events
  WHERE event_type IN ('click', 'view')
),
g AS (
  SELECT CAST(least(floor(value / 30), 19) AS BIGINT) AS b,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
           AS n_a,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
           AS n_b
  FROM ev GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
           AS tot_a,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
           AS tot_b
  FROM ev
),
d AS (
  SELECT t.b AS b, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
  FROM (SELECT unnest(range(20)) AS b) t LEFT JOIN g ON g.b = t.b
),
terms AS (
  SELECT d.b,
         (CAST(n_a + 1 AS DOUBLE) / (tot_a + 20)
          - CAST(n_b + 1 AS DOUBLE) / (tot_b + 20))
         * ln((CAST(n_a + 1 AS DOUBLE) / (tot_a + 20))
              / (CAST(n_b + 1 AS DOUBLE) / (tot_b + 20))) AS t,
         tot_a, tot_b
  FROM d, tot
)
SELECT CAST(max(tot_a) AS BIGINT) AS n_click,
       CAST(max(tot_b) AS BIGINT) AS n_view,
       CAST(20 AS INTEGER) AS n_bins,
       round(list_aggregate(list(t ORDER BY b), 'sum'), 6) AS psi
FROM terms
"""


@query("a19_psi_drift", _PSI_ORACLE)
def a19_psi_drift(spark, sf_dir):
    """PSI drift between two sources' value distributions: 20 fixed
    equi-width bins, add-one smoothing, per-bin
    (pA - pB)·ln(pA/pB) summed in bin order. Distributed work is one
    groupBy on the bin id; the 20-bin densify join and the ordered
    fold are constant-size at any corpus scale. PSI > 0.25 is the
    conventional retrain/page threshold."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    g = ev.groupBy(
        F.least(F.floor(F.col("value") / 30), F.lit(19))
        .cast("long")
        .alias("b")
    ).agg(
        F.count_if(F.col("event_type") == "click")
        .cast("long")
        .alias("n_a"),
        F.count_if(F.col("event_type") == "view")
        .cast("long")
        .alias("n_b"),
    )
    tot = ev.agg(
        F.count_if(F.col("event_type") == "click")
        .cast("long")
        .alias("tot_a"),
        F.count_if(F.col("event_type") == "view")
        .cast("long")
        .alias("tot_b"),
    )
    bins = spark.range(20).select(F.col("id").alias("b"))
    d = (
        bins.join(g, "b", "left")
        .na.fill(0, ["n_a", "n_b"])
        .crossJoin(F.broadcast(tot))
    )
    pa = (F.col("n_a") + 1).cast("double") / (F.col("tot_a") + 20)
    pb = (F.col("n_b") + 1).cast("double") / (F.col("tot_b") + 20)
    terms = d.select(
        "b",
        "tot_a",
        "tot_b",
        ((pa - pb) * F.log(pa / pb)).alias("t"),
    )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("b"), F.col("t")))
    )
    return terms.groupBy().agg(
        F.max("tot_a").cast("long").alias("n_click"),
        F.max("tot_b").cast("long").alias("n_view"),
        F.lit(20).cast("int").alias("n_bins"),
        F.round(
            F.aggregate(
                arr, F.lit(0.0), lambda acc, x: acc + x["t"]
            ),
            6,
        ).alias("psi"),
    )


# --------------------------------------------------------------------
# Exact Spearman rank correlation, per language group, between
# document length (n_chars) and vocabulary richness (distinct token
# count): ranks are row_number with a doc_id tiebreak (deterministic,
# engine-identical integers — no average-rank rationals), so
# sum(d^2) is exact BIGINT and rho lands as one truncating integer
# division: rho_ppm = (n(n^2-1) - 6*sum_d2) * 1e6 div n(n^2-1)
# (Spark DIV and DuckDB // both truncate toward zero, so the signed
# quotient is engine-identical). Per-group ranking keeps the window
# partitioned — the global-sort variant is the one sequential step a
# distributed rank would range-partition at 100 TB.
# --------------------------------------------------------------------
_SP_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

_SPEARMAN_ORACLE = f"""
WITH m AS (
  SELECT doc_id, lang, n_chars,
         CAST(len(list_distinct(string_split({_SP_NORM}, ' ')))
              AS BIGINT) AS vocab
  FROM documents
),
r AS (
  SELECT lang,
         CAST(row_number() OVER (PARTITION BY lang
                ORDER BY n_chars, doc_id) AS BIGINT) AS rx,
         CAST(row_number() OVER (PARTITION BY lang
                ORDER BY vocab, doc_id) AS BIGINT) AS ry
  FROM m
),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
  FROM r GROUP BY lang
)
SELECT lang, n, sum_d2,
       CAST(((n * (n * n - 1) - 6 * sum_d2) * 1000000)
            // (n * (n * n - 1)) AS BIGINT) AS rho_ppm
FROM agg WHERE n > 1
"""


@query("a20_spearman", _SPEARMAN_ORACLE)
def a20_spearman(spark, sf_dir):
    """Per-lang Spearman rho between n_chars and distinct-token
    count, exact to the ppm: integer ranks (row_number, doc_id
    tiebreak), BIGINT sum of squared rank differences, one truncating
    division at the end. At sf scales n^3 * 1e6 fits BIGINT
    (n <= 2.1e3 per group at sf0.1); past n ~ 1.4e6 per group promote
    the quotient arithmetic to decimal(38,0) — same move as
    w16_cusum_drift's accumulator."""
    docs = table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.array_distinct(TX.tokens(F.col("text"))))
        .cast("long")
        .alias("vocab"),
    )
    rx = F.row_number().over(
        Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    )
    ry = F.row_number().over(
        Window.partitionBy("lang").orderBy("vocab", "doc_id")
    )
    r = m.select(
        "lang",
        rx.cast("long").alias("rx"),
        ry.cast("long").alias("ry"),
    )
    agg = r.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry")))
        .cast("long")
        .alias("sum_d2"),
    )
    return agg.where(F.col("n") > 1).select(
        "lang",
        "n",
        "sum_d2",
        F.expr(
            "CAST(((n * (n * n - 1) - 6 * sum_d2) * 1000000)"
            " DIV (n * (n * n - 1)) AS BIGINT)"
        ).alias("rho_ppm"),
    )


# --------------------------------------------------------------------
# Time-weighted average over irregular observations — the correct
# mean for unevenly sampled sensors (a plain AVG over-weights bursts;
# the reference's networks sample anywhere from 1 min to 1 h). Left-
# step integration per (station, day): each value holds until the
# next observation, weights are microsecond gaps. Entirely integer:
# values become exact centi-units (2-decimal data), weights are
# BIGINT microseconds, the weighted sum is BIGINT (max |value|*span
# ~ 5e15 per day — promote to decimal(38,0) only past ~millennium
# spans), and the TWA is one truncating division back to centi-units.
# --------------------------------------------------------------------
_TWA_ORACLE = """
WITH o AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         strftime(ts, '%Y-%m-%d') AS day,
         epoch_us(ts) AS t_us,
         CAST(round(value * 100) AS BIGINT) AS centi,
         event_id
  FROM events
),
stepped AS (
  SELECT station, day, centi,
         lead(t_us) OVER (PARTITION BY station, day
                          ORDER BY t_us, event_id) - t_us AS dt_us
  FROM o
),
agg AS (
  SELECT station, day,
         CAST(count(*) AS BIGINT) AS n_obs,
         CAST(sum(dt_us) AS BIGINT) AS span_us,
         CAST(sum(centi * dt_us) AS BIGINT) AS wsum
  FROM stepped WHERE dt_us IS NOT NULL
  GROUP BY station, day
)
SELECT station, day, n_obs, span_us,
       CAST(wsum // span_us AS BIGINT) AS twa_centi
FROM agg WHERE span_us > 0
"""


@query("a21_time_weighted_avg", _TWA_ORACLE)
def a21_time_weighted_avg(spark, sf_dir):
    """Left-step TWA per (station, day): one window pass partitioned
    by the group key computes each observation's hold duration
    (lead(ts) - ts in exact microseconds), then one grouped BIGINT
    aggregation divides weighted sum by span. Shuffle count: exactly
    one, on (station, day) — the window and the aggregation share the
    partitioning, and at 100 TB the per-day group bound caps window
    state the same way the QAQC chain's per-station bound does."""
    ev = table(spark, sf_dir, "events")
    o = ev.select(
        F.col("user_id").cast("string").alias("station"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        # ts may read as NTZ (native parquet) or LTZ (nanos-as-long
        # path); session tz is UTC so the cast is value-preserving
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.round(F.col("value") * 100).cast("long").alias("centi"),
        "event_id",
    )
    w = Window.partitionBy("station", "day").orderBy("t_us", "event_id")
    stepped = o.select(
        "station",
        "day",
        "centi",
        (F.lead("t_us").over(w) - F.col("t_us")).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    agg = stepped.groupBy("station", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("dt_us").cast("long").alias("span_us"),
        F.sum(F.col("centi") * F.col("dt_us")).cast("long").alias("wsum"),
    )
    return agg.where(F.col("span_us") > 0).select(
        "station",
        "day",
        "n_obs",
        "span_us",
        F.expr("CAST(wsum DIV span_us AS BIGINT)").alias("twa_centi"),
    )


# --------------------------------------------------------------------
# M4 time-series downsampling (Jugel et al. VLDB'14): the error-free
# reduction for line-chart rendering — per (series, pixel bucket)
# keep exactly the first, last, min and max points, which provably
# reproduce the pixel-perfect line at that width. Buckets here are
# calendar hours; every extreme carries a deterministic tiebreak
# ((t, event_id) for first/last, (value, t, event_id) for min/max) so
# both engines select identical witness rows. One window pass + one
# grouped aggregation, both on the same (station, hour) key — a
# single shuffle however long the series.
# --------------------------------------------------------------------
_M4_ORACLE = """
WITH o AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS h,
         epoch_us(ts) AS t_us, value, event_id
  FROM events
),
r AS (
  SELECT station, h, t_us, value,
         row_number() OVER (PARTITION BY station, h
           ORDER BY t_us, event_id) AS r_first,
         row_number() OVER (PARTITION BY station, h
           ORDER BY t_us DESC, event_id DESC) AS r_last,
         row_number() OVER (PARTITION BY station, h
           ORDER BY value, t_us, event_id) AS r_min,
         row_number() OVER (PARTITION BY station, h
           ORDER BY value DESC, t_us, event_id) AS r_max
  FROM o
)
SELECT station, h, CAST(count(*) AS BIGINT) AS n,
       CAST(max(CASE WHEN r_first = 1 THEN t_us END) AS BIGINT)
         AS t_first_us,
       max(CASE WHEN r_first = 1 THEN value END) AS v_first,
       CAST(max(CASE WHEN r_last = 1 THEN t_us END) AS BIGINT)
         AS t_last_us,
       max(CASE WHEN r_last = 1 THEN value END) AS v_last,
       max(CASE WHEN r_min = 1 THEN value END) AS v_min,
       max(CASE WHEN r_max = 1 THEN value END) AS v_max
FROM r GROUP BY station, h
"""


@query("w20_m4_downsample", _M4_ORACLE)
def w20_m4_downsample(spark, sf_dir):
    """M4 reduction to hourly pixel buckets: 4 rank orderings in one
    window pass over (station, hour), conditional aggregation picks
    the witness rows. At a 100 TB series the output is 4 points per
    (series, pixel) — the chart-serving table — and the only shuffle
    is the bucket key the window already needs."""
    ev = table(spark, sf_dir, "events")
    o = ev.select(
        F.col("user_id").cast("string").alias("station"),
        F.date_format(
            F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00"
        ).alias("h"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "value",
        "event_id",
    )
    part = Window.partitionBy("station", "h")
    r = o.select(
        "station",
        "h",
        "t_us",
        "value",
        F.row_number()
        .over(part.orderBy("t_us", "event_id"))
        .alias("r_first"),
        F.row_number()
        .over(part.orderBy(F.desc("t_us"), F.desc("event_id")))
        .alias("r_last"),
        F.row_number()
        .over(part.orderBy("value", "t_us", "event_id"))
        .alias("r_min"),
        F.row_number()
        .over(part.orderBy(F.desc("value"), F.asc("t_us"), F.asc("event_id")))
        .alias("r_max"),
    )
    pick = lambda flag, col: F.max(
        F.when(F.col(flag) == 1, F.col(col))
    )
    return r.groupBy("station", "h").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        pick("r_first", "t_us").cast("long").alias("t_first_us"),
        pick("r_first", "value").alias("v_first"),
        pick("r_last", "t_us").cast("long").alias("t_last_us"),
        pick("r_last", "value").alias("v_last"),
        pick("r_min", "value").alias("v_min"),
        pick("r_max", "value").alias("v_max"),
    )


# --------------------------------------------------------------------
# Mann-Kendall monotone-trend test per (station, month) — the
# standard nonparametric trend statistic in hydrology/climatology
# (the reference's domain). Daily means are kept as exact rational
# pairs (centi-sum, count); the pairwise sign compares them by
# integer cross-multiplication sign(s_j*c_i - s_i*c_j), so S is exact
# BIGINT with zero float ops; tau lands as one truncating division.
# The pair join runs within (station, month) groups whose size is
# calendar-bounded (<= 31 days), so the quadratic stage is O(465)
# rows per group at any corpus scale — the daily-mean collapse is the
# distributed heavy lift.
# --------------------------------------------------------------------
_MK_ORACLE = """
WITH daily AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         strftime(ts, '%Y-%m') AS month,
         strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
),
pairs AS (
  SELECT a.station, a.month,
         CASE WHEN b.s * a.c > a.s * b.c THEN 1
              WHEN b.s * a.c < a.s * b.c THEN -1
              ELSE 0 END AS sgn
  FROM daily a JOIN daily b
    ON a.station = b.station AND a.month = b.month AND a.day < b.day
),
agg AS (
  SELECT station, month, CAST(sum(sgn) AS BIGINT) AS s_stat,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY station, month
)
SELECT station, month, s_stat, n_pairs,
       CAST((s_stat * 1000000) // n_pairs AS BIGINT) AS tau_ppm
FROM agg WHERE n_pairs > 0
"""


@query("a22_mann_kendall", _MK_ORACLE)
def a22_mann_kendall(spark, sf_dir):
    """Mann-Kendall S and Kendall tau (ppm) per (station, month) over
    exact daily means: the comparison is the integer cross product
    sign(s_j*c_i - s_i*c_j) — no float enters before the final
    truncating division (Spark DIV == DuckDB // toward zero). The
    day-pair join is bounded by the calendar (<= 465 pairs/group); the
    one data-sized stage is the daily groupBy."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").cast("string").alias("station"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    # both self-join sides reference daily — materialize the tiny
    # per-day aggregate once instead of executing the events
    # aggregation twice (plans are trees); the known materialized size
    # also lets the planner broadcast one join side when small
    daily = daily.localCheckpoint(eager=False)
    a, b = daily.alias("a"), daily.alias("b")
    cross = F.col("b.s") * F.col("a.c") - F.col("a.s") * F.col("b.c")
    pairs = a.join(
        b,
        on=[
            F.col("a.station") == F.col("b.station"),
            F.col("a.month") == F.col("b.month"),
            F.col("a.day") < F.col("b.day"),
        ],
    ).select(
        F.col("a.station").alias("station"),
        F.col("a.month").alias("month"),
        F.when(cross > 0, F.lit(1))
        .when(cross < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .alias("sgn"),
    )
    agg = pairs.groupBy("station", "month").agg(
        F.sum("sgn").cast("long").alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    return agg.where(F.col("n_pairs") > 0).select(
        "station",
        "month",
        "s_stat",
        "n_pairs",
        F.expr("CAST((s_stat * 1000000) DIV n_pairs AS BIGINT)").alias(
            "tau_ppm"
        ),
    )


# --------------------------------------------------------------------
# Changepoint estimation: argmax over split days of the centered
# CUSUM |D_t| = |prefix_sum_t * total_count - total_sum * prefix_count_t|
# — the classic single-changepoint locator (the estimator whose
# exceedance w16_cusum_drift flags). Everything is integer: centi
# values, BIGINT prefix sums, and the scaled centering replaces the
# (t/n)·S_n rational with a cross-multiplication, so the argmax is
# engine-exact; ties break on the earlier day. Per-station windows
# keep the scan partitioned; at corpus scales where
# |prefix|*count leaves BIGINT (~1e12 obs/station at these values),
# promote the product to decimal(38,0) — the w16 accumulator move.
# --------------------------------------------------------------------
_CHGPT_ORACLE = """
WITH daily AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
pre AS (
  SELECT station, day,
         sum(s) OVER (PARTITION BY station ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_l,
         sum(c) OVER (PARTITION BY station ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_l,
         sum(s) OVER (PARTITION BY station) AS s_tot,
         sum(c) OVER (PARTITION BY station) AS c_tot
  FROM daily
),
scored AS (
  SELECT station, day,
         abs(s_l * c_tot - s_tot * c_l) AS d_abs,
         c_tot,
         row_number() OVER (PARTITION BY station
           ORDER BY abs(s_l * c_tot - s_tot * c_l) DESC, day) AS r
  FROM pre WHERE c_l < c_tot
)
SELECT station, CAST(c_tot AS BIGINT) AS n_obs, day AS best_day,
       CAST(d_abs AS BIGINT) AS d_abs
FROM scored WHERE r = 1
"""


@query("w21_changepoint", _CHGPT_ORACLE)
def w21_changepoint(spark, sf_dir):
    """Most-likely break date per station: argmax over split days of
    the centered integer CUSUM — one daily groupBy, one per-station
    window pass, one rank. Deterministic: earlier day wins ties, and
    no float enters at all."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").cast("string").alias("station"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    w_pre = (
        Window.partitionBy("station")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("station")
    pre = daily.select(
        "station",
        "day",
        F.sum("s").over(w_pre).alias("s_l"),
        F.sum("c").over(w_pre).alias("c_l"),
        F.sum("s").over(w_all).alias("s_tot"),
        F.sum("c").over(w_all).alias("c_tot"),
    )
    d_abs = F.abs(
        F.col("s_l") * F.col("c_tot") - F.col("s_tot") * F.col("c_l")
    )
    scored = pre.where(F.col("c_l") < F.col("c_tot")).select(
        "station",
        "day",
        d_abs.alias("d_abs"),
        "c_tot",
        F.row_number()
        .over(
            Window.partitionBy("station").orderBy(
                d_abs.desc(), F.asc("day")
            )
        )
        .alias("r"),
    )
    return scored.where(F.col("r") == 1).select(
        "station",
        F.col("c_tot").cast("long").alias("n_obs"),
        F.col("day").alias("best_day"),
        F.col("d_abs").cast("long").alias("d_abs"),
    )


# --------------------------------------------------------------------
# Theil-Sen robust slope per (station, month) — the estimator that
# pairs with a22_mann_kendall (MK decides IF there is a monotone
# trend; Sen's slope says HOW steep). Same exact-rational daily means
# (centi-sum s, count c): each pairwise slope is the double
# (s_j/c_j - s_i/c_i) / (d_j - d_i) with integer day distance, so
# both engines evaluate the identical IEEE expression tree; the
# median is interpolated identically (quantile_cont == percentile)
# and rounded to 6. The day-pair stage is calendar-bounded
# (<= 465 pairs per group) — the corpus-sized work is the daily
# collapse, exactly like Mann-Kendall.
# --------------------------------------------------------------------
_SEN_ORACLE = """
WITH daily AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         strftime(ts, '%Y-%m') AS month,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
),
slopes AS (
  SELECT a.station, a.month,
         ((CAST(b.s AS DOUBLE) / b.c) - (CAST(a.s AS DOUBLE) / a.c))
           / (b.d - a.d) AS slope
  FROM daily a JOIN daily b
    ON a.station = b.station AND a.month = b.month AND a.d < b.d
)
SELECT station, month,
       round(quantile_cont(slope, 0.5), 6) AS sen_slope,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM slopes GROUP BY station, month
"""


@query("a23_theil_sen", _SEN_ORACLE)
def a23_theil_sen(spark, sf_dir):
    """Sen's slope (median of pairwise daily-mean slopes, centi-value
    units per day) per (station, month). Inputs to every slope are
    exact integers, the slope itself is one fixed IEEE expression,
    and the median interpolation + round(6) matches DuckDB's
    quantile_cont — the same cross-engine contract as a22."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").cast("string").alias("station"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    # both self-join sides reference daily — materialize the tiny
    # per-day aggregate once instead of executing the events
    # aggregation twice (plans are trees); the known materialized size
    # also lets the planner broadcast one join side when small
    daily = daily.localCheckpoint(eager=False)
    a, b = daily.alias("a"), daily.alias("b")
    slope = (
        (F.col("b.s").cast("double") / F.col("b.c"))
        - (F.col("a.s").cast("double") / F.col("a.c"))
    ) / (F.col("b.d") - F.col("a.d"))
    pairs = a.join(
        b,
        on=[
            F.col("a.station") == F.col("b.station"),
            F.col("a.month") == F.col("b.month"),
            F.col("a.d") < F.col("b.d"),
        ],
    ).select(
        F.col("a.station").alias("station"),
        F.col("a.month").alias("month"),
        slope.alias("slope"),
    )
    return pairs.groupBy("station", "month").agg(
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("sen_slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )


# --------------------------------------------------------------------
# MASE — mean absolute scaled error of the seasonal-naive forecast
# (Hyndman & Koehler 2006), the standard scale-free forecast-accuracy
# yardstick: numerator = sum|y_t - y_{t-7}| (weekly naive), scaled by
# denominator = sum|y_t - y_{t-1}| (one-step naive). Over exact centi
# daily totals both sums are BIGINT, so the ratio is one truncating
# division to ppm — engine-exact with zero float ops. A MASE below
# 1e6 ppm means weekly seasonality genuinely predicts the series
# better than persistence. Per-station windows keep the scan
# partitioned; the daily collapse is the only corpus-sized stage.
# --------------------------------------------------------------------
_MASE_ORACLE = """
WITH daily AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT station, day, y,
         lag(y, 7) OVER w AS y_season,
         lag(y, 1) OVER w AS y_prev
  FROM daily WINDOW w AS (PARTITION BY station ORDER BY day)
),
agg AS (
  SELECT station,
         CAST(sum(CASE WHEN y_season IS NOT NULL
                       THEN abs(y - y_season) END) AS BIGINT) AS num,
         CAST(count(y_season) AS BIGINT) AS n_season,
         CAST(sum(CASE WHEN y_prev IS NOT NULL
                       THEN abs(y - y_prev) END) AS BIGINT) AS den,
         CAST(count(y_prev) AS BIGINT) AS n_prev
  FROM lagged GROUP BY station
)
SELECT station, num, den, n_season, n_prev,
       CAST(CAST(num AS HUGEINT) * n_prev * 1000000
            // (CAST(den AS HUGEINT) * n_season) AS BIGINT)
         AS mase_ppm
FROM agg WHERE den > 0 AND n_season > 0
"""


@query("a24_mase", _MASE_ORACLE)
def a24_mase(spark, sf_dir):
    """Exact-integer MASE per station: weekly seasonal-naive absolute
    error scaled by the one-step-naive error, both as BIGINT sums of
    centi-unit daily totals, normalized by their term counts and
    floored to ppm — the forecastability report at any corpus size
    costs one daily groupBy plus one per-station window pass."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").cast("string").alias("station"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    w = Window.partitionBy("station").orderBy("day")
    lagged = daily.select(
        "station",
        "y",
        F.lag("y", 7).over(w).alias("y_season"),
        F.lag("y", 1).over(w).alias("y_prev"),
    )
    agg = lagged.groupBy("station").agg(
        F.sum(
            F.when(
                F.col("y_season").isNotNull(),
                F.abs(F.col("y") - F.col("y_season")),
            )
        )
        .cast("long")
        .alias("num"),
        F.count("y_season").cast("long").alias("n_season"),
        F.sum(
            F.when(
                F.col("y_prev").isNotNull(),
                F.abs(F.col("y") - F.col("y_prev")),
            )
        )
        .cast("long")
        .alias("den"),
        F.count("y_prev").cast("long").alias("n_prev"),
    )
    # the ratio products widen to decimal(38,0) (HUGEINT in the
    # oracle): num * n_prev * 1e6 leaves BIGINT at real corpus sizes
    # — same accumulator move as a26/w16
    return agg.where((F.col("den") > 0) & (F.col("n_season") > 0)).select(
        "station",
        "num",
        "den",
        "n_season",
        "n_prev",
        F.expr(
            "CAST((CAST(num AS DECIMAL(38,0)) * n_prev * 1000000)"
            " DIV (CAST(den AS DECIMAL(38,0)) * n_season) AS BIGINT)"
        ).alias("mase_ppm"),
    )


# --------------------------------------------------------------------
# Seasonal decomposition + anomaly ranking, entirely in integers —
# STL's trend/seasonal/residual idea restated exactly: daily centi
# totals y; trend = the centered 7-day window sum T (7x the moving
# average, so no division); detrended dt = 7y - T on full windows
# only; day-of-week seasonal = the per-(station, dow) mean of dt
# (one truncating division); residual = dt - seasonal. The top-3
# |residual| days per station are the anomaly report. Day-of-week is
# (epoch_day + 4) % 7 — pure arithmetic, immune to engine calendar
# conventions. One daily groupBy + one range window + one dow agg +
# one rank: every stage shares the station partitioning.
# --------------------------------------------------------------------
_SEAS_ORACLE = """
WITH daily AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         strftime(ts, '%Y-%m-%d') AS day,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2, 3
),
win AS (
  SELECT station, day, d, y,
         CAST(sum(y) OVER w AS BIGINT) AS t7,
         CAST(count(*) OVER w AS BIGINT) AS n7,
         (d + 4) % 7 AS dow
  FROM daily
  WINDOW w AS (PARTITION BY station ORDER BY d
               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
dt AS (
  SELECT station, day, dow, y, t7, 7 * y - t7 AS dt7
  FROM win WHERE n7 = 7
),
seas AS (
  SELECT station, dow,
         CAST(sum(dt7) // count(*) AS BIGINT) AS seasonal_x7
  FROM dt GROUP BY station, dow
),
resid AS (
  SELECT d.station, d.day, d.y, d.t7, s.seasonal_x7,
         d.dt7 - s.seasonal_x7 AS resid_x7
  FROM dt d JOIN seas s ON d.station = s.station AND d.dow = s.dow
)
SELECT station, day, y, t7, seasonal_x7, resid_x7,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY station ORDER BY abs(resid_x7) DESC, day) AS rank
  FROM resid
) WHERE rank <= 3
"""


@query("a25_seasonal_anomaly", _SEAS_ORACLE)
def a25_seasonal_anomaly(spark, sf_dir):
    """Integer-exact seasonal decomposition with a top-3 residual
    anomaly report per station (trend and detrended values carried at
    7x scale so the only division is the seasonal mean's single
    truncating DIV — identical on both engines)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").cast("string").alias("station"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    w = (
        Window.partitionBy("station")
        .orderBy("d")
        .rangeBetween(-3, 3)
    )
    win = daily.select(
        "station",
        "day",
        "y",
        F.sum("y").over(w).cast("long").alias("t7"),
        F.count(F.lit(1)).over(w).cast("long").alias("n7"),
        ((F.col("d") + 4) % 7).alias("dow"),
    )
    dt = win.where(F.col("n7") == 7).withColumn(
        "dt7", 7 * F.col("y") - F.col("t7")
    )
    seas = dt.groupBy("station", "dow").agg(
        F.expr("sum(dt7) DIV count(*)").cast("long").alias("seasonal_x7")
    )
    resid = dt.join(seas, ["station", "dow"]).select(
        "station",
        "day",
        "y",
        "t7",
        "seasonal_x7",
        (F.col("dt7") - F.col("seasonal_x7")).alias("resid_x7"),
    )
    wr = Window.partitionBy("station").orderBy(
        F.abs(F.col("resid_x7")).desc(), F.asc("day")
    )
    return (
        resid.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= 3)
    )


# --------------------------------------------------------------------
# Last-touch attribution: every purchase is credited to the user's
# most recent click within a 24 h lookback — the marketing-analytics
# join every event warehouse runs. No asof self-join: one window pass
# per user carries the running "last click time" (max of the
# click-only timestamp over preceding rows), then a single equi-join
# on (user, click_ts) recovers the click's event id (min id on the
# pathological shared-timestamp tie). Purchases outside the lookback
# attribute to NULL — kept, because unattributed conversions are the
# report's point. Timestamps leave as microsecond ISO strings (the
# nullable-timestamp determinism rule).
# --------------------------------------------------------------------
_ATTR_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         max(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_ts
  FROM events
),
purch AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
         CASE WHEN last_click_ts IS NOT NULL
                   AND date_diff('second', last_click_ts, ts) <= 86400
              THEN last_click_ts END AS attr_ts
  FROM ordered WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, CAST(min(event_id) AS BIGINT) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.user_id, p.purchase_id,
       strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       c.click_id,
       strftime(p.attr_ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       CAST(date_diff('second', p.attr_ts, p.purchase_ts) AS BIGINT)
         AS latency_s
FROM purch p
LEFT JOIN clicks c ON c.user_id = p.user_id AND c.ts = p.attr_ts
"""


@query("w22_attribution", _ATTR_ORACLE)
def w22_attribution(spark, sf_dir):
    """Last-touch 24 h attribution without a range self-join: the
    running last-click timestamp rides the same (user, time) window
    every other per-user pass uses; recovering the click id is one
    join against the clicks-only slice keyed on the exact timestamp."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wo = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(wo)
    purch = (
        ev.withColumn("last_click_ts", last_click)
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.when(
                F.col("last_click_ts").isNotNull()
                & (
                    F.unix_timestamp("ts")
                    - F.unix_timestamp("last_click_ts")
                    <= 86400
                ),
                F.col("last_click_ts"),
            ).alias("attr_ts"),
        )
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").cast("long").alias("click_id"))
    )
    iso = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    joined = purch.join(
        clicks,
        on=[
            purch.user_id == clicks.user_id,
            clicks.ts == purch.attr_ts,
        ],
        how="left",
    )
    return joined.select(
        purch.user_id.alias("user_id"),
        "purchase_id",
        F.date_format("purchase_ts", iso).alias("purchase_ts"),
        "click_id",
        F.date_format("attr_ts", iso).alias("click_ts"),
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("attr_ts")
        )
        .cast("long")
        .alias("latency_s"),
    )


# --------------------------------------------------------------------
# Multi-lag autocorrelation (ACF at lags 1, 2, 3, 7) per station over
# the daily series — a13's lag-1 statistic generalized to the table a
# forecaster actually reads (the lag-7 row is the weekly-seasonality
# detector that motivates a24's MASE scale). Exactness: with n = day
# count and s = exact centi sum, the centered terms are the integers
# (n*y_t - s); numerator and denominator accumulate their products in
# decimal(38,0) (Spark) / HUGEINT (DuckDB) — the w16 accumulator move,
# so the statistic survives (n*y)^2 magnitudes at any corpus scale —
# and acf_ppm is one truncating division of exact integers. Positional
# lags via lead(k) over the (station, day) window: one shuffle, four
# lead columns in a single pass.
# --------------------------------------------------------------------
_ACF_LAGS = (1, 2, 3, 7)


def _acf_oracle() -> str:
    lead_cols = ",\n         ".join(
        f"lead(y, {k}) OVER w AS y{k}" for k in _ACF_LAGS
    )
    rows = []
    for k in _ACF_LAGS:
        rows.append(f"""
SELECT station, CAST({k} AS BIGINT) AS lag,
       CAST(count(y{k}) AS BIGINT) AS n_pairs,
       CAST(CAST(sum(CASE WHEN y{k} IS NOT NULL THEN
              CAST((n * y - s) AS HUGEINT) * (n * y{k} - s) END)
            AS HUGEINT) * 1000000
            // CAST(sum(CAST((n * y - s) AS HUGEINT) * (n * y - s))
                   AS HUGEINT)
            AS BIGINT) AS acf_ppm
FROM led GROUP BY station HAVING count(y{k}) > 0""")
    return f"""
WITH daily AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT station, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s
  FROM daily GROUP BY station
),
led AS (
  SELECT d.station, d.y, st.n, st.s,
         {lead_cols}
  FROM daily d JOIN stats st ON d.station = st.station
  WINDOW w AS (PARTITION BY d.station ORDER BY d.day)
)
{" UNION ALL ".join(rows)}
"""


@query("a26_acf", _acf_oracle())
def a26_acf(spark, sf_dir):
    """ACF table at lags 1/2/3/7 per station — exact integer centered
    cross-products in decimal(38,0), one window pass computing all
    four leads, one truncating division to ppm per row."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").cast("string").alias("station"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    stats = daily.groupBy("station").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    w = Window.partitionBy("station").orderBy("day")
    led = daily.join(F.broadcast(stats), "station").select(
        "station",
        "y",
        "n",
        "s",
        *[F.lead("y", k).over(w).alias(f"y{k}") for k in _ACF_LAGS],
    )
    big = "decimal(38,0)"
    # ONE aggregation computes every lag's (n_pairs, num) plus the
    # shared den, then an in-row explode unpivots to (station, lag)
    # rows. The previous per-lag union re-executed the whole
    # events-scan -> daily-agg -> window subtree once per lag (4
    # corpus passes; Spark plans are trees) — same exact integer
    # arithmetic, same HAVING, one pass (guide §2.4 / §1.2 "don't
    # compute things twice").
    den = F.sum(
        (F.col("n") * F.col("y") - F.col("s")).cast(big)
        * (F.col("n") * F.col("y") - F.col("s"))
    ).cast(big)
    aggs = [den.alias("__den")]
    for k in _ACF_LAGS:
        aggs.append(
            F.count(F.col(f"y{k}")).cast("long").alias(f"__np{k}")
        )
        aggs.append(
            F.sum(
                F.when(
                    F.col(f"y{k}").isNotNull(),
                    (
                        (F.col("n") * F.col("y") - F.col("s")).cast(big)
                        * (F.col("n") * F.col(f"y{k}") - F.col("s"))
                    ),
                )
            )
            .cast(big)
            .alias(f"__num{k}")
        )
    wide = led.groupBy("station").agg(*aggs)
    return (
        wide.select(
            "station",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("long").alias("lag"),
                            F.col(f"__np{k}").alias("n_pairs"),
                            F.expr(
                                f"CAST((__num{k} * 1000000) DIV __den"
                                " AS BIGINT)"
                            ).alias("acf_ppm"),
                        )
                        for k in _ACF_LAGS
                    ]
                )
            ).alias("__r"),
        )
        .select("station", "__r.lag", "__r.n_pairs", "__r.acf_ppm")
        .where(F.col("n_pairs") > 0)
    )


# --------------------------------------------------------------------
# Exponentially time-decayed trending score — the feed-ranking
# primitive: each event contributes 2^(-age_days) with a one-day
# half-life, so yesterday counts half of today. Exactness without
# rounding: every term is a binary fraction 2^-k with k <= the window
# length in days (~29 here), so every partial sum is a multiple of
# 2^-29 far below 2^53 — the float sum is EXACT and order-
# independent, the same trick the HLL register sum uses. One scan,
# one groupBy; the rank window runs over the tiny per-type table.
# --------------------------------------------------------------------
_DECAY_ORACLE = """
WITH mx AS (
  SELECT max(CAST(ts AS DATE)) AS d_max FROM events
),
scored AS (
  SELECT event_type,
         sum(power(CAST(2 AS DOUBLE),
                   -date_diff('day', CAST(ts AS DATE), mx.d_max)))
           AS decay_score,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events, mx GROUP BY event_type, mx.d_max
)
SELECT event_type, n_events, decay_score,
       CAST(row_number() OVER (ORDER BY decay_score DESC, event_type)
            AS BIGINT) AS rank
FROM scored
"""


@query("a28_decay_trend", _DECAY_ORACLE)
def a28_decay_trend(spark, sf_dir):
    """Per-event-type trending score with one-day half-life decay —
    an exact float sum (all terms are binary fractions on a common
    2^-window grid), so no rounding is needed for the cross-engine
    hash."""
    ev = table(spark, sf_dir, "events")
    d_max = ev.agg(F.max(F.col("ts").cast("date")).alias("d_max"))
    scored = (
        ev.crossJoin(F.broadcast(d_max))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.pow(
                    F.lit(2.0),
                    -F.datediff(F.col("d_max"), F.col("ts").cast("date")),
                )
            ).alias("decay_score"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    w = Window.orderBy(F.desc("decay_score"), F.asc("event_type"))
    return scored.select(
        "event_type",
        "n_events",
        "decay_score",
        F.row_number().over(w).cast("long").alias("rank"),
    )


# --------------------------------------------------- real WAV decode stats
# The REAL audio container parse behind an exact SQL oracle, the audio
# analog of m_ppm_decode_stats: a valid RIFF/WAVE clip (mono 16-bit
# PCM, 8 kHz, 8 samples) is synthesized IN-ENGINE for every document —
# a 44-byte canonical header plus 16 sample bytes from
# unhex(md5(text)) — and decoded by operators/multimodal.WavPcmDecoder
# through the same injectable mapInPandas seam a libav decoder would
# use. Because the sample bytes are a hex function of the text, DuckDB
# recomputes every statistic (peak, energy, sign changes) from the
# SAME md5 with pure integer arithmetic — the oracle checks the
# decoder's little-endian int16 interpretation bit for bit, not just
# the plumbing. Reference analog: the multimodal seam has no reference
# counterpart; registered as beyond-reference curation surface.

import struct as _struct

_WAV_DATA_BYTES = 16  # 8 little-endian int16 samples
_WAV_HDR_HEX = (
    b"RIFF"
    + _struct.pack("<I", 36 + _WAV_DATA_BYTES)
    + b"WAVE"
    + b"fmt "
    + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    + b"data"
    + _struct.pack("<I", _WAV_DATA_BYTES)
).hex()


# one hex-byte extractor for the whole repo (defined beside the PPM
# oracle it was written for) — aliased here so the WAV/ahash oracles
# can never drift from the image ones
from .qaqc_parity import _hexbyte as _wav_hexbyte


def _wav_oracle() -> str:
    # sample k (1-based) = LE int16 from bytes (2k-1, 2k) of md5
    samples = []
    for k in range(1, 9):
        u = (
            f"({_wav_hexbyte('hx', 2 * k - 1)}"
            f" + 256 * {_wav_hexbyte('hx', 2 * k)})"
        )
        samples.append(
            f"(CASE WHEN {u} >= 32768 THEN {u} - 65536 ELSE {u} END)"
        )
    cols = ",\n       ".join(
        f"{s} AS s{k}" for k, s in enumerate(samples, 1)
    )
    peak = "greatest(" + ", ".join(f"abs(s{k})" for k in range(1, 9)) + ")"
    sum_sq = " + ".join(f"s{k} * s{k}" for k in range(1, 9))
    zc = " + ".join(
        f"(CASE WHEN (s{k - 1} < 0) <> (s{k} < 0) THEN 1 ELSE 0 END)"
        for k in range(2, 9)
    )
    return f"""
WITH src AS (
  SELECT doc_id AS media_id, md5(text) AS hx
  FROM documents WHERE text IS NOT NULL
),
smp AS (
  SELECT media_id,
       {cols}
  FROM src)
SELECT media_id,
       CAST(8 AS INTEGER) AS n_samples,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST({peak} AS INTEGER) AS peak,
       CAST({sum_sq} AS BIGINT) AS sum_sq,
       CAST({zc} AS INTEGER) AS zero_cross
FROM smp
"""


@query("m_wav_decode_stats", _wav_oracle())
def m_wav_decode_stats(spark, sf_dir):
    """Integer-exact signal statistics of genuinely PARSED RIFF/WAVE
    clips (operators/multimodal.WavPcmDecoder) — map-only, the
    container walk and int16 interpretation are real."""
    from ..operators import multimodal as MM

    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.unhex(F.lit(_WAV_HDR_HEX)),
            F.unhex(F.md5("text")),
        ).alias("content"),
    )
    return MM.wav_stats(media, decoder=MM.WavPcmDecoder())


# ------------------------------------------------- image average-hash
# Image near-dup fingerprinting over REALLY decoded pixels: a 4x4
# binary PPM is synthesized in-engine (11-byte header + 48 pixel bytes
# from three chained md5s of the text), decoded by the real
# PpmBmpDecoder, and average-hashed with all-integer Rec.601 luma
# (bit p set iff 16*luma_p > sum of lumas, row-major LSB-first).
# n_bucket_peers counts other docs sharing the hash — the dedup-
# candidate grouping an image pipeline would join on. The oracle
# recomputes every pixel byte, luma compare, and the popcount from
# the same md5s in SQL — decoder arithmetic checked bit for bit.

_PPM4_HDR_HEX = b"P6\n4 4\n255\n".hex()


def _ahash_sql_parts() -> tuple:
    """(luma column defs, total expr, ahash expr, nbits expr) for the
    16-pixel integer average-hash over hex column ``hx`` — ONE
    definition consumed by both m_image_ahash's oracle and the media
    curation chain's, mirroring operators/multimodal.ahash_ints."""
    lumas = []
    for p in range(16):
        r = _wav_hexbyte("hx", 3 * p + 1)
        g = _wav_hexbyte("hx", 3 * p + 2)
        b = _wav_hexbyte("hx", 3 * p + 3)
        lumas.append(f"(299 * {r} + 587 * {g} + 114 * {b})")
    cols = ",\n       ".join(
        f"{e} AS l{p}" for p, e in enumerate(lumas)
    )
    total = " + ".join(f"l{p}" for p in range(16))
    ahash = " + ".join(
        f"(CASE WHEN 16 * l{p} > total THEN {1 << p} ELSE 0 END)"
        for p in range(16)
    )
    nbits = " + ".join(
        f"(CASE WHEN 16 * l{p} > total THEN 1 ELSE 0 END)"
        for p in range(16)
    )
    return cols, total, ahash, nbits


def _ahash_oracle() -> str:
    cols, total, ahash, nbits = _ahash_sql_parts()
    return f"""
WITH src AS (
  SELECT doc_id AS media_id,
         md5(text) || md5(text || '1') || md5(text || '2') AS hx
  FROM documents WHERE text IS NOT NULL
),
lum AS (
  SELECT media_id,
       {cols}
  FROM src),
tot AS (SELECT *, {total} AS total FROM lum),
h AS (
  SELECT media_id,
         CAST({ahash} AS BIGINT) AS ahash,
         CAST({nbits} AS INTEGER) AS n_bits_set
  FROM tot)
SELECT media_id, ahash, n_bits_set,
       CAST(count(*) OVER (PARTITION BY ahash) - 1 AS BIGINT)
         AS n_bucket_peers
FROM h
"""


def _ppm4_content():
    """In-engine 4x4 P6 PPM: header + 48 pixel bytes from three
    chained md5s of the text — shared by m_image_ahash and
    chain_media_curation."""
    return F.concat(
        F.unhex(F.lit(_PPM4_HDR_HEX)),
        F.unhex(
            F.concat(
                F.md5("text"),
                F.md5(F.concat(F.col("text"), F.lit("1"))),
                F.md5(F.concat(F.col("text"), F.lit("2"))),
            )
        ),
    )


def _ppm2_content():
    """In-engine 2x2 P6 PPM (header + unhex(md5[:24]) pixels) — the
    m_ppm_decode_stats construction (queries/qaqc_parity.py), reused
    by the media curation chain."""
    return F.concat(
        F.unhex(F.lit(b"P6\n2 2\n255\n".hex())),
        F.unhex(F.substring(F.md5("text"), 1, 24)),
    )


@query("m_image_ahash", _ahash_oracle())
def m_image_ahash(spark, sf_dir):
    """Average-hash fingerprints of genuinely decoded 4x4 PPM pixels
    (operators/multimodal.image_ahash) plus per-hash collision
    peers — decode is map-only; the peer count shuffles only the
    16-bit hash keys, never pixels."""
    from ..operators import multimodal as MM

    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        _ppm4_content().alias("content"),
    )
    hashed = MM.image_ahash(media, decoder=MM.PpmBmpDecoder())
    w = Window.partitionBy("ahash")
    return hashed.select(
        "media_id",
        "ahash",
        "n_bits_set",
        (F.count(F.lit(1)).over(w) - 1).cast("long").alias(
            "n_bucket_peers"
        ),
    )


# ------------------------------------------------ media curation chain
# End-to-end multimodal curation in one query — the image leg of what
# chain_corpus_curation does for text: decode (REAL PpmBmpDecoder) →
# quality gate (luma-contrast floor, the blank/flat-image filter every
# image pipeline runs first) → exact near-dup removal within
# average-hash buckets (keep-min-id) → per-source yield report with a
# kept-id checksum. Scale shape: decode is map-only; the only
# shuffles are the 16-bit ahash grouping and the per-source rollup —
# pixels never shuffle. The oracle recomputes the decode arithmetic,
# the gate, and the bucket survivor rule from the same md5 bytes.
_MC_STD_FLOOR = 0.15


def _media_chain_oracle() -> str:
    # 2x2 stats CTE (same float expression family as m_ppm_decode_-
    # stats: Rec.601 lumas, numpy-order mean/var, FLOAT4 narrowing)
    def hb(i):
        return _wav_hexbyte("hx2", i)

    lumas = [
        f"(0.299 * {hb(1 + 3 * p)} + 0.587 * {hb(2 + 3 * p)}"
        f" + 0.114 * {hb(3 + 3 * p)})"
        for p in range(4)
    ]
    mu = f"((({lumas[0]} + {lumas[1]}) + {lumas[2]}) + {lumas[3]}) / 4.0"
    var = (
        f"(((power({lumas[0]} - mu, 2) + power({lumas[1]} - mu, 2))"
        f" + power({lumas[2]} - mu, 2)) + power({lumas[3]} - mu, 2))"
        " / 4.0"
    )
    # 4x4 ahash CTE — the SAME generator as m_image_ahash's oracle
    cols16, total, ahash, _nbits = _ahash_sql_parts()
    return f"""
WITH src AS (
  SELECT doc_id AS media_id, source,
         substr(md5(text), 1, 24) AS hx2,
         md5(text) || md5(text || '1') || md5(text || '2') AS hx
  FROM documents WHERE text IS NOT NULL
),
st AS (
  SELECT media_id, source,
         CAST(sqrt({var.replace('mu', f'({mu})')}) / 255.0 AS FLOAT4)
           AS std_luma, hx
  FROM src),
lum AS (SELECT media_id, source, std_luma, {cols16} FROM st),
tot AS (SELECT *, {total} AS total FROM lum),
h AS (
  SELECT media_id, source, std_luma,
         CAST({ahash} AS BIGINT) AS ahash,
         (std_luma >= {_MC_STD_FLOOR}) AS qual_ok
  FROM tot),
surv AS (
  SELECT *,
         CASE WHEN qual_ok THEN
           (media_id = min(media_id) FILTER (WHERE qual_ok)
              OVER (PARTITION BY ahash))
         ELSE FALSE END AS kept
  FROM h)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN NOT qual_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_quality,
       CAST(sum(CASE WHEN qual_ok AND NOT kept THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_dropped,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN kept THEN media_id END) AS BIGINT)
         AS kept_id_sum
FROM surv GROUP BY source
"""


@query("chain_media_curation", _media_chain_oracle())
def chain_media_curation(spark, sf_dir):
    """Decode → contrast gate → ahash near-dup removal → per-source
    yield, all on really-decoded pixels; survivors pinned by
    kept_id_sum. ONE corpus scan: a combined kernel decodes both
    synthesized views and emits (std_luma, ahash) per row, so the
    only shuffles in the plan are the ahash window and the source
    rollup — no corpus-sized equi-join of separate stat legs."""
    from ..operators import multimodal as MM

    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        "source",
        _ppm2_content().alias("c_stats"),
        _ppm4_content().alias("c_hash"),
    )
    dec = MM.PpmBmpDecoder()

    def op(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [],
                "source": [],
                "std_luma": [],
                "ahash": [],
            }
            for mid, src, c2, c4 in zip(
                pdf["media_id"], pdf["source"], pdf["c_stats"],
                pdf["c_hash"],
            ):
                try:
                    d2 = dec._decode_one(bytes(c2))
                    d4 = dec._decode_one(bytes(c4))
                except Exception:
                    d2 = d4 = None
                if d2 is None or d4 is None:
                    continue
                w2, h2, a2 = d2
                feats = dec.channel_features(w2, h2, a2)
                h, _nb = MM.ahash_ints(d4[2])
                out["media_id"].append(mid)
                out["source"].append(src)
                out["std_luma"].append(feats[3])
                out["ahash"].append(h)
            yield pd.DataFrame(out)

    base = media.mapInPandas(
        op, "media_id long, source string, std_luma float, ahash long"
    ).withColumn("qual_ok", F.col("std_luma") >= _MC_STD_FLOOR)
    w = Window.partitionBy("ahash")
    surv = base.withColumn(
        "kept",
        F.when(
            F.col("qual_ok"),
            F.col("media_id")
            == F.min(
                F.when(F.col("qual_ok"), F.col("media_id"))
            ).over(w),
        ).otherwise(F.lit(False)),
    )
    return surv.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum((~F.col("qual_ok")).cast("long"))
        .cast("long")
        .alias("n_low_quality"),
        F.sum(
            (F.col("qual_ok") & ~F.col("kept")).cast("long")
        )
        .cast("long")
        .alias("n_dup_dropped"),
        F.sum(F.col("kept").cast("long")).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("media_id")))
        .cast("long")
        .alias("kept_id_sum"),
    )
