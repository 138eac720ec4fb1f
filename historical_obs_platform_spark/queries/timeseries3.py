"""Third time-series wave over the hourly event-count series:

- w29_sax_motifs — SAX symbolization (Lin et al. 2003): z-normalize
  the hourly-count series, PAA-average into 4-hour segments, map each
  segment to a 4-letter alphabet at the standard Gaussian
  breakpoints, group 6 consecutive segments into non-overlapping
  24-hour words, and report the most frequent motif words.
- w30_peak_prominence — local peaks of the hourly series (strictly
  above every neighbor within ±3 h) scored by how far the peak rises
  above its strongest neighbor, top-15.

Both run on the hour-keyed count series, so after ONE corpus-sized
count aggregation every later stage is wall-clock-hours-sized (the
w26/w27/w28 contract) — the analyses cost nothing more at 100 TB.

Determinism: counts are exact BIGINT; the z-normalization uses exact
integer power sums, and every float expression tree after that is
written identically on both engines; symbol assignment is a CASE
over bit-identical doubles. Hour and segment indices use the
floor-division spelling (pmod) so pre-epoch timestamps bin correctly.

Reference anchor: the reference flags "frequent value" bins and
repeated same-hour patterns per station (scripts/3_qaqc_data/
qaqc_dist_whole_stn.py frequent-bins; qaqc_time_ds.py same-hour
repeats) — motif discovery and peak scoring are the corpus-scale
generalizations of those pattern hunts.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from .common import table

# hour index, floor-division spelling shared with w27/w28
_HI_SQL = (
    "(epoch_us(ts) - ((epoch_us(ts) % 3600000000) + 3600000000)"
    " % 3600000000) // 3600000000"
)
_HI_SPARK = (
    "(unix_micros(CAST(ts AS TIMESTAMP))"
    " - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000))"
    " DIV 3600000000"
)

_PAA = 4  # hours per PAA segment
_WORD = 6  # segments per motif word (24 h)
_SAX_TOPK = 10
# Gaussian quartile breakpoints for a 4-letter alphabet
_B1, _B2, _B3 = -0.6745, 0.0, 0.6745

SAX_ORACLE = f"""
WITH hv AS (
  SELECT {_HI_SQL} AS hi, count(*) AS cnt FROM events GROUP BY 1
),
mom AS (
  SELECT count(*) AS n,
         sum(cnt) AS s1,
         sum(CAST(cnt AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0))) AS s2
  FROM hv
),
seg AS (
  SELECT (hi - ((hi % {_PAA}) + {_PAA}) % {_PAA}) // {_PAA} AS seg,
         sum(cnt) AS scnt, count(*) AS nh
  FROM hv GROUP BY 1
),
-- the z denominator SHARES the filter's exact expression tree
-- (num = n*s2 - s1*s1 in doubles), so num > 0 in the WHERE implies
-- the sqrt argument is positive — division-free predicate, no /0 on
-- either engine, even on a constant series
sym AS (
  SELECT seg.seg,
         CASE WHEN (CAST(seg.scnt AS DOUBLE) / {_PAA}
                    - CAST(mom.s1 AS DOUBLE) / mom.n)
                   / sqrt((CAST(mom.n AS DOUBLE) * CAST(mom.s2 AS DOUBLE)
                           - CAST(mom.s1 AS DOUBLE) * CAST(mom.s1 AS DOUBLE))
                          / (CAST(mom.n AS DOUBLE) * (mom.n - 1))) < {_B1}
                THEN 'a'
              WHEN (CAST(seg.scnt AS DOUBLE) / {_PAA}
                    - CAST(mom.s1 AS DOUBLE) / mom.n)
                   / sqrt((CAST(mom.n AS DOUBLE) * CAST(mom.s2 AS DOUBLE)
                           - CAST(mom.s1 AS DOUBLE) * CAST(mom.s1 AS DOUBLE))
                          / (CAST(mom.n AS DOUBLE) * (mom.n - 1))) < {_B2}
                THEN 'b'
              WHEN (CAST(seg.scnt AS DOUBLE) / {_PAA}
                    - CAST(mom.s1 AS DOUBLE) / mom.n)
                   / sqrt((CAST(mom.n AS DOUBLE) * CAST(mom.s2 AS DOUBLE)
                           - CAST(mom.s1 AS DOUBLE) * CAST(mom.s1 AS DOUBLE))
                          / (CAST(mom.n AS DOUBLE) * (mom.n - 1))) < {_B3}
                THEN 'c'
              ELSE 'd' END AS sym
  FROM seg, mom
  WHERE seg.nh = {_PAA} AND mom.n >= 2
    AND CAST(mom.n AS DOUBLE) * CAST(mom.s2 AS DOUBLE)
        - CAST(mom.s1 AS DOUBLE) * CAST(mom.s1 AS DOUBLE) > 0
),
words AS (
  SELECT (seg - ((seg % {_WORD}) + {_WORD}) % {_WORD}) // {_WORD} AS wslot,
         string_agg(sym, '' ORDER BY seg) AS word,
         count(*) AS nseg
  FROM sym GROUP BY 1
),
wc AS (
  SELECT word, count(*) AS n_windows
  FROM words WHERE nseg = {_WORD} GROUP BY word
)
SELECT word, CAST(n_windows AS BIGINT) AS n_windows,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY n_windows DESC, word) AS rnk
  FROM wc
) WHERE rnk <= {_SAX_TOPK}
"""


@query("w29_sax_motifs", SAX_ORACLE)
def w29_sax_motifs(spark, sf_dir):
    """SAX motif words over the hourly count series, top-10.

    Scale shape: one hour-keyed count shuffle (the only corpus-sized
    stage), then segment/word aggregations on the hours-sized series.
    The z-score uses exact integer power sums, so the symbol CASE
    compares bit-identical doubles on both engines; only segments
    with all 4 hours present and words with all 6 segments qualify.
    """
    ev = table(spark, sf_dir, "events")
    hv = (
        ev.select(F.expr(_HI_SPARK).alias("hi"))
        .groupBy("hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cd = F.col("cnt").cast("decimal(19,0)")
    mom = hv.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s1"),
        F.sum(cd * cd).alias("s2"),
    )
    seg = hv.groupBy(
        F.expr(f"(hi - pmod(hi, {_PAA})) DIV {_PAA}").alias("seg")
    ).agg(
        F.sum("cnt").alias("scnt"), F.count(F.lit(1)).alias("nh")
    )
    n = F.col("n")
    nd = n.cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    # num shares the filter's tree: num > 0 in the (division-free)
    # WHERE implies the sqrt argument is positive on both engines
    num = nd * s2d - s1d * s1d
    mean = s1d / n
    std = F.sqrt(num / (nd * (n - 1)))
    z = (F.col("scnt").cast("double") / _PAA - mean) / std
    sym = (
        seg.crossJoin(F.broadcast(mom))
        .where((F.col("nh") == _PAA) & (n >= 2) & (num > 0))
        .select(
            "seg",
            F.when(z < _B1, "a")
            .when(z < _B2, "b")
            .when(z < _B3, "c")
            .otherwise("d")
            .alias("sym"),
        )
    )
    words = sym.groupBy(
        F.expr(f"(seg - pmod(seg, {_WORD})) DIV {_WORD}").alias("wslot")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                lambda s: s["sym"],
            ),
            "",
        ).alias("word"),
        F.count(F.lit(1)).alias("nseg"),
    )
    wc = (
        words.where(F.col("nseg") == _WORD)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_windows"))
    )
    rw = Window.orderBy(F.desc("n_windows"), F.asc("word"))
    return (
        wc.withColumn("rnk", F.row_number().over(rw))
        .where(F.col("rnk") <= _SAX_TOPK)
        .select(
            "word",
            F.col("n_windows").cast("long").alias("n_windows"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ------------------------------------------------------------------ #
# w30_peak_prominence
# ------------------------------------------------------------------ #
_PK_HALF = 3
_PK_TOPK = 15

PEAK_ORACLE = f"""
WITH hv AS (
  SELECT {_HI_SQL} AS hi, count(*) AS cnt FROM events GROUP BY 1
),
nb AS (
  SELECT hi, cnt,
         max(cnt) OVER (ORDER BY hi
           RANGE BETWEEN {_PK_HALF} PRECEDING AND 1 PRECEDING) AS max_l,
         max(cnt) OVER (ORDER BY hi
           RANGE BETWEEN 1 FOLLOWING AND {_PK_HALF} FOLLOWING) AS max_r
  FROM hv
),
pk AS (
  SELECT hi, cnt,
         cnt - greatest(max_l, max_r) AS score
  FROM nb
  WHERE max_l IS NOT NULL AND max_r IS NOT NULL
    AND cnt > max_l AND cnt > max_r
)
SELECT CAST(hi AS BIGINT) AS hi, CAST(cnt AS BIGINT) AS cnt,
       CAST(score AS BIGINT) AS score, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, hi) AS rnk
  FROM pk
) WHERE rnk <= {_PK_TOPK}
"""


@query("w30_peak_prominence", PEAK_ORACLE)
def w30_peak_prominence(spark, sf_dir):
    """Top-15 local peaks of the hourly count series by neighborhood
    prominence: an hour strictly above every neighbor within ±3 h,
    scored by its margin over the strongest neighbor. Boundary hours
    (no neighbor on one side) never qualify.

    Scale shape: one hour-keyed count shuffle, then two range windows
    on the hours-sized series — all-integer arithmetic, exact on both
    engines.
    """
    ev = table(spark, sf_dir, "events")
    hv = (
        ev.select(F.expr(_HI_SPARK).alias("hi"))
        .groupBy("hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wl = Window.orderBy("hi").rangeBetween(-_PK_HALF, -1)
    wr = Window.orderBy("hi").rangeBetween(1, _PK_HALF)
    nb = hv.select(
        "hi",
        "cnt",
        F.max("cnt").over(wl).alias("max_l"),
        F.max("cnt").over(wr).alias("max_r"),
    )
    pk = nb.where(
        F.col("max_l").isNotNull()
        & F.col("max_r").isNotNull()
        & (F.col("cnt") > F.col("max_l"))
        & (F.col("cnt") > F.col("max_r"))
    ).select(
        "hi",
        "cnt",
        (F.col("cnt") - F.greatest("max_l", "max_r")).alias("score"),
    )
    rw = Window.orderBy(F.desc("score"), F.asc("hi"))
    return (
        pk.withColumn("rnk", F.row_number().over(rw))
        .where(F.col("rnk") <= _PK_TOPK)
        .select(
            F.col("hi").cast("long").alias("hi"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("score").cast("long").alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
