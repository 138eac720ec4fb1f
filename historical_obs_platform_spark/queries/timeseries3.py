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


# ------------------------------------------------------------------ #
# w31_pacf — partial autocorrelation at lags 1-3 (Durbin-Levinson)
# ------------------------------------------------------------------ #
PACF_ORACLE = f"""
WITH hv AS (
  SELECT {_HI_SQL} AS hi, count(*) AS cnt FROM events GROUP BY 1
),
st AS (SELECT count(*) AS n, sum(cnt) AS s FROM hv),
led AS (
  SELECT h.cnt AS y, st.n, st.s,
         lead(h.cnt, 1) OVER w AS y1,
         lead(h.cnt, 2) OVER w AS y2,
         lead(h.cnt, 3) OVER w AS y3
  FROM hv h, st
  WINDOW w AS (ORDER BY h.hi)
),
acf AS (
  SELECT
    CAST(sum(CAST(n * y - s AS DECIMAL(38,0)) * (n * y - s))
         AS DOUBLE) AS den,
    CAST(sum(CASE WHEN y1 IS NOT NULL THEN
           CAST(n * y - s AS DECIMAL(38,0)) * (n * y1 - s) END)
         AS DOUBLE) AS n1,
    CAST(sum(CASE WHEN y2 IS NOT NULL THEN
           CAST(n * y - s AS DECIMAL(38,0)) * (n * y2 - s) END)
         AS DOUBLE) AS n2,
    CAST(sum(CASE WHEN y3 IS NOT NULL THEN
           CAST(n * y - s AS DECIMAL(38,0)) * (n * y3 - s) END)
         AS DOUBLE) AS n3
  FROM led
),
r AS (
  SELECT CASE WHEN den > 0 THEN n1 / den END AS r1,
         CASE WHEN den > 0 THEN n2 / den END AS r2,
         CASE WHEN den > 0 THEN n3 / den END AS r3
  FROM acf
),
dl AS (
  SELECT r1, r2, r3,
         CASE WHEN 1 - r1 * r1 <> 0
              THEN (r2 - r1 * r1) / (1 - r1 * r1) END AS p22
  FROM r
),
dl2 AS (
  SELECT r1, r2, r3, p22, r1 * (1 - p22) AS p21 FROM dl
)
SELECT CAST(lag AS INT) AS lag, round(acf, 6) AS acf,
       round(pacf, 6) AS pacf
FROM (
  SELECT 1 AS lag, r1 AS acf, r1 AS pacf FROM dl2
  UNION ALL
  SELECT 2 AS lag, r2 AS acf, p22 AS pacf FROM dl2
  UNION ALL
  SELECT 3 AS lag, r3 AS acf,
         CASE WHEN 1 - p21 * r1 - p22 * r2 <> 0
              THEN (r3 - p21 * r2 - p22 * r1)
                   / (1 - p21 * r1 - p22 * r2) END AS pacf
  FROM dl2
)
"""


@query("w31_pacf", PACF_ORACLE)
def w31_pacf(spark, sf_dir):
    """ACF + PACF at lags 1-3 of the hourly count series: the
    Durbin-Levinson recursion unrolled in closed form (φ11 = r1,
    φ22 = (r2−r1²)/(1−r1²), φ33 from the level-2 coefficients) — the
    AR-order identification table next to a26's per-station ACF.

    Exactness: centered cross-products are exact DECIMAL integers
    (the a26 accumulator move); r1..r3 are then single divisions, so
    the recursion's float tree is identical on both engines; every
    denominator is CASE-guarded (constant series → NULL ACF/PACF).

    Scale shape: one hour-keyed count shuffle; the lead window and
    the grand aggregate run on the hours-sized series.
    """
    ev = table(spark, sf_dir, "events")
    hv = (
        ev.select(F.expr(_HI_SPARK).alias("hi"))
        .groupBy("hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    st = hv.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("s")
    )
    w = Window.orderBy("hi")
    led = hv.crossJoin(F.broadcast(st)).select(
        F.col("cnt").alias("y"),
        "n",
        "s",
        *[F.lead("cnt", k).over(w).alias(f"y{k}") for k in (1, 2, 3)],
    )
    big = "decimal(38,0)"
    cent = (F.col("n") * F.col("y") - F.col("s")).cast(big)
    acf = led.agg(
        F.sum(cent * (F.col("n") * F.col("y") - F.col("s")))
        .cast("double")
        .alias("den"),
        *[
            F.sum(
                F.when(
                    F.col(f"y{k}").isNotNull(),
                    cent * (F.col("n") * F.col(f"y{k}") - F.col("s")),
                )
            )
            .cast("double")
            .alias(f"n{k}")
            for k in (1, 2, 3)
        ],
    )
    den = F.col("den")
    r = acf.select(
        *[
            F.when(den > 0, F.col(f"n{k}") / den).alias(f"r{k}")
            for k in (1, 2, 3)
        ]
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    dl = r.select(
        r1,
        r2,
        r3,
        F.when(
            1 - r1 * r1 != 0, (r2 - r1 * r1) / (1 - r1 * r1)
        ).alias("p22"),
    )
    p22 = F.col("p22")
    dl2 = dl.select(r1, r2, r3, p22, (r1 * (1 - p22)).alias("p21"))
    p21 = F.col("p21")
    p33den = 1 - p21 * r1 - p22 * r2
    rows = dl2.select(
        F.lit(1).alias("lag"), r1.alias("acf"), r1.alias("pacf")
    ).unionByName(
        dl2.select(F.lit(2).alias("lag"), r2.alias("acf"), p22.alias("pacf"))
    ).unionByName(
        dl2.select(
            F.lit(3).alias("lag"),
            r3.alias("acf"),
            F.when(
                p33den != 0, (r3 - p21 * r2 - p22 * r1) / p33den
            ).alias("pacf"),
        )
    )
    return rows.select(
        F.col("lag").cast("int").alias("lag"),
        F.round("acf", 6).alias("acf"),
        F.round("pacf", 6).alias("pacf"),
    )


# ------------------------------------------------------------------ #
# w32_seasonal_strength — Hyndman trend/seasonal strength measures
# ------------------------------------------------------------------ #
_W32_FIX = 1000000  # floor fixed-point: identical doubles -> exact ints

W32_ORACLE = f"""
WITH hv AS (
  SELECT {_HI_SQL} AS hi, count(*) AS cnt FROM events GROUP BY 1
),
tr AS (
  SELECT hi, cnt,
         sum(cnt) OVER w AS tsum,
         count(*) OVER w AS tn
  FROM hv
  WINDOW w AS (ORDER BY hi RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
full_w AS (
  SELECT hi, cnt, tsum, 25 * cnt - tsum AS d25
  FROM tr WHERE tn = 25
),
seas AS (
  SELECT ((hi % 24) + 24) % 24 AS hod,
         CAST(sum(d25) AS DOUBLE) / (25.0e0 * count(*)) AS s
  FROM full_w GROUP BY 1
),
fx AS (
  SELECT
    CAST(floor((CAST(f.d25 AS DOUBLE) / 25.0e0 - seas.s) * {_W32_FIX})
         AS BIGINT) AS rf,
    CAST(floor((CAST(f.d25 AS DOUBLE) / 25.0e0) * {_W32_FIX})
         AS BIGINT) AS dtf,
    CAST(floor((CAST(f.cnt AS DOUBLE) - seas.s) * {_W32_FIX})
         AS BIGINT) AS saf
  FROM full_w f JOIN seas ON seas.hod = ((f.hi % 24) + 24) % 24
),
v AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(rf AS DECIMAL(38,0))) AS DOUBLE) AS s1r,
         CAST(sum(CAST(rf AS DECIMAL(19,0)) * CAST(rf AS DECIMAL(19,0)))
              AS DOUBLE) AS s2r,
         CAST(sum(CAST(dtf AS DECIMAL(38,0))) AS DOUBLE) AS s1d,
         CAST(sum(CAST(dtf AS DECIMAL(19,0)) * CAST(dtf AS DECIMAL(19,0)))
              AS DOUBLE) AS s2d,
         CAST(sum(CAST(saf AS DECIMAL(38,0))) AS DOUBLE) AS s1a,
         CAST(sum(CAST(saf AS DECIMAL(19,0)) * CAST(saf AS DECIMAL(19,0)))
              AS DOUBLE) AS s2a
  FROM fx
)
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN n >= 2 THEN
         CASE WHEN s2d - (s1d / n) * s1d > 0
              THEN round(greatest(0.0e0,
                     1 - (s2r - (s1r / n) * s1r)
                         / (s2d - (s1d / n) * s1d)), 6) END
       END AS f_seasonal,
       CASE WHEN n >= 2 THEN
         CASE WHEN s2a - (s1a / n) * s1a > 0
              THEN round(greatest(0.0e0,
                     1 - (s2r - (s1r / n) * s1r)
                         / (s2a - (s1a / n) * s1a)), 6) END
       END AS f_trend
FROM v
"""


@query("w32_seasonal_strength", W32_ORACLE)
def w32_seasonal_strength(spark, sf_dir):
    """Hyndman-style trend/seasonal strength of the hourly series
    from the w28 decomposition: F_seasonal = max(0, 1 −
    var(resid)/var(detrended)), F_trend = max(0, 1 −
    var(resid)/var(seasonally adjusted)) — the one-row series
    diagnostic a forecasting pipeline gates models on.

    Determinism: the decomposition components are bit-identical
    doubles (exact-integer w28 machinery), then FLOOR fixed-point
    (1e-6 units) lifts them to exact BIGINT before any variance sum —
    floor (not round) because both engines floor identically while
    double→int CASTs disagree (Spark truncates, DuckDB rounds).

    Scale shape: identical to w28 — one corpus-sized hour count, then
    hours-sized windows and one grand aggregate.
    """
    ev = table(spark, sf_dir, "events")
    hv = (
        ev.select(F.expr(_HI_SPARK).alias("hi"))
        .groupBy("hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("hi").rangeBetween(-12, 12)
    tr = hv.select(
        "hi",
        "cnt",
        F.sum("cnt").over(w).alias("tsum"),
        F.count(F.lit(1)).over(w).alias("tn"),
    )
    full_w = tr.where(F.col("tn") == 25).select(
        "hi", "cnt", (F.lit(25) * F.col("cnt") - F.col("tsum")).alias("d25")
    )
    seas = full_w.groupBy(
        F.pmod(F.col("hi"), F.lit(24)).alias("hod")
    ).agg(
        (
            F.sum("d25").cast("double") / (F.lit(25.0) * F.count(F.lit(1)))
        ).alias("s")
    )
    detr = F.col("d25").cast("double") / F.lit(25.0)
    fx = full_w.join(
        F.broadcast(seas), F.pmod(full_w.hi, F.lit(24)) == seas.hod
    ).select(
        F.floor((detr - F.col("s")) * _W32_FIX).cast("long").alias("rf"),
        F.floor(detr * _W32_FIX).cast("long").alias("dtf"),
        F.floor((F.col("cnt").cast("double") - F.col("s")) * _W32_FIX)
        .cast("long")
        .alias("saf"),
    )

    def sums(c):
        d19 = F.col(c).cast("decimal(19,0)")
        return [
            F.sum(F.col(c).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"s1{c[0]}"),
            F.sum(d19 * d19).cast("double").alias(f"s2{c[0]}"),
        ]

    v = fx.agg(
        F.count(F.lit(1)).alias("n"),
        *sums("rf"),
        *sums("dtf"),
        *sums("saf"),
    )
    n = F.col("n")

    def var(p):
        return F.col(f"s2{p}") - (F.col(f"s1{p}") / n) * F.col(f"s1{p}")

    def strength(p):
        return F.when(
            n >= 2,
            F.when(
                var(p) > 0,
                F.round(
                    F.greatest(F.lit(0.0), 1 - var("r") / var(p)), 6
                ),
            ),
        )

    return v.select(
        n.cast("long").alias("n"),
        strength("d").alias("f_seasonal"),
        strength("s").alias("f_trend"),
    )


# ------------------------------------------------------------------ #
# w33_pacf_lag8 — parameterized Durbin-Levinson PACF (lag K)
# ------------------------------------------------------------------ #
_PACF_K = 8


def _pacf_lagk_oracle(k: int) -> str:
    """Recursive-CTE Durbin-Levinson oracle at arbitrary lag K: the
    ACF r1..rK comes from the w31 exact-DECIMAL machinery; the
    recursion carries the level-k coefficient vector as a DOUBLE[]
    column, updating it with indexed list_transform lambdas and
    scoring the reflection coefficient with an explicit left-fold
    list_reduce — the same operation order the Spark island replays,
    so every float is bit-identical."""
    leads = ",\n         ".join(
        f"lead(h.cnt, {i}) OVER w AS y{i}" for i in range(1, k + 1)
    )
    accs = ",\n    ".join(
        f"CAST(sum(CASE WHEN y{i} IS NOT NULL THEN\n"
        f"           CAST(n * y - s AS DECIMAL(38,0)) * (n * y{i} - s) END)\n"
        f"         AS DOUBLE) AS n{i}"
        for i in range(1, k + 1)
    )
    rlist = ", ".join(f"n{i} / den" for i in range(1, k + 1))
    a_expr = (
        "CASE WHEN (1 - list_reduce(list_transform(phi,"
        " (xd, j) -> xd * r[j]), (a, b) -> a + b)) <> 0\n"
        "           THEN (r[k+1] - list_reduce(list_transform(phi,"
        " (xn, j) -> xn * r[k+1-j]), (a, b) -> a + b))\n"
        "                / (1 - list_reduce(list_transform(phi,"
        " (xd2, j) -> xd2 * r[j]), (a, b) -> a + b))\n"
        "      END"
    )
    return f"""
WITH RECURSIVE hv AS (
  SELECT {_HI_SQL} AS hi, count(*) AS cnt FROM events GROUP BY 1
),
st AS (SELECT count(*) AS n, sum(cnt) AS s FROM hv),
led AS (
  SELECT h.cnt AS y, st.n, st.s,
         {leads}
  FROM hv h, st
  WINDOW w AS (ORDER BY h.hi)
),
acf AS (
  SELECT
    CAST(sum(CAST(n * y - s AS DECIMAL(38,0)) * (n * y - s))
         AS DOUBLE) AS den,
    {accs}
  FROM led
),
rl AS (
  SELECT CASE WHEN den > 0 THEN [{rlist}] END AS r FROM acf
),
dl AS (
  SELECT 1 AS k, r, [r[1]] AS phi FROM rl
  UNION ALL
  SELECT k + 1, r,
    list_append(
      list_transform(phi, (x, i) -> x - ({a_expr}) * phi[k+1-i]),
      {a_expr})
  FROM dl WHERE k < {k}
)
SELECT CAST(k AS INT) AS lag, round(r[k], 6) AS acf,
       round(phi[k], 6) AS pacf
FROM dl
"""


W33_ORACLE = _pacf_lagk_oracle(_PACF_K)


@query("w33_pacf_lag8", W33_ORACLE)
def w33_pacf_lag8(spark, sf_dir, k: int = _PACF_K):
    """PACF at lags 1..K (default 8) of the hourly count series via
    the FULL Durbin-Levinson recursion — the parameterized successor
    to w31's closed-form lag-3 unroll (which cannot extend): at each
    level the reflection coefficient is
        φ_kk = (r_k − Σ_j φ_{{k−1,j}} r_{{k−j}}) / (1 − Σ_j φ_{{k−1,j}} r_j)
    and the coefficient vector updates φ_kj = φ_{{k−1,j}} − φ_kk·φ_{{k−1,k−j}}.

    Exactness: r1..rK use w31's exact-DECIMAL centered cross-products
    (one hour-keyed shuffle, one grand aggregate); the recursion runs
    in a ONE-ROW applyInPandas island with plain-Python IEEE floats
    whose fold order replays the oracle's list_reduce left fold
    term-for-term, so every level is bit-identical cross-engine;
    rounding is half-away (DuckDB round semantics). Degenerate
    series (zero variance, short series) yield NULLs that propagate
    level-to-level exactly as SQL NULL does.

    Scale shape: identical to w31 — the corpus-sized work is the
    hour-keyed count aggregation; the island sees ONE row of K
    doubles, so lag depth is free at any corpus size.
    """
    ev = table(spark, sf_dir, "events")
    hv = (
        ev.select(F.expr(_HI_SPARK).alias("hi"))
        .groupBy("hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    st = hv.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("s")
    )
    w = Window.orderBy("hi")
    led = hv.crossJoin(F.broadcast(st)).select(
        F.col("cnt").alias("y"),
        "n",
        "s",
        *[
            F.lead("cnt", i).over(w).alias(f"y{i}")
            for i in range(1, k + 1)
        ],
    )
    big = "decimal(38,0)"
    cent = (F.col("n") * F.col("y") - F.col("s")).cast(big)
    acf = led.agg(
        F.sum(cent * (F.col("n") * F.col("y") - F.col("s")))
        .cast("double")
        .alias("den"),
        *[
            F.sum(
                F.when(
                    F.col(f"y{i}").isNotNull(),
                    cent * (F.col("n") * F.col(f"y{i}") - F.col("s")),
                )
            )
            .cast("double")
            .alias(f"n{i}")
            for i in range(1, k + 1)
        ],
    )
    den = F.col("den")
    r = acf.select(
        *[
            F.when(den > 0, F.col(f"n{i}") / den).alias(f"r{i}")
            for i in range(1, k + 1)
        ]
    )

    kk = k

    def _dl(pdf):
        import pandas as pd

        from historical_obs_platform_spark.queries.common import (
            round_half_away,
        )

        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "lag": pd.Series(dtype="int32"),
                    "acf": pd.Series(dtype="float64"),
                    "pacf": pd.Series(dtype="float64"),
                }
            )
        row = pdf.iloc[0]
        rv = [
            None if pd.isna(row[f"r{i}"]) else float(row[f"r{i}"])
            for i in range(1, kk + 1)
        ]

        def fold(terms):
            acc = terms[0]
            for t in terms[1:]:
                acc = None if acc is None or t is None else acc + t
            return acc

        def mul(a, b):
            return None if a is None or b is None else a * b

        pacf = [rv[0]]
        phi = [rv[0]]
        for lvl in range(1, kk):  # building level lvl+1
            dfold = fold([mul(phi[j], rv[j]) for j in range(lvl)])
            nfold = fold(
                [mul(phi[j], rv[lvl - 1 - j]) for j in range(lvl)]
            )
            den_e = None if dfold is None else 1 - dfold
            if (
                den_e is None
                or den_e == 0
                or rv[lvl] is None
                or nfold is None
            ):
                a = None
            else:
                a = (rv[lvl] - nfold) / den_e
            phi = [
                None
                if phi[j] is None or mul(a, phi[lvl - 1 - j]) is None
                else phi[j] - a * phi[lvl - 1 - j]
                for j in range(lvl)
            ] + [a]
            pacf.append(a)
        return pd.DataFrame(
            {
                "lag": pd.Series(range(1, kk + 1), dtype="int32"),
                "acf": [round_half_away(x) for x in rv],
                "pacf": [round_half_away(x) for x in pacf],
            }
        )

    return (
        r.groupBy(F.lit(1).alias("__g"))
        .applyInPandas(_dl, "lag int, acf double, pacf double")
        .select("lag", "acf", "pacf")
    )


# ------------------------------------------------------------------ #
# w34_bollinger_breakouts — rolling-band outliers of the hourly series
# ------------------------------------------------------------------ #
_BB_WIN = 24  # trailing hours in the band
_BB_K = 2.0  # band half-width in sd units
_BB_TOPK = 15

W34_ORACLE = f"""
WITH hv AS (
  SELECT {_HI_SQL} AS hi, count(*) AS cnt FROM events GROUP BY 1
),
r AS (
  SELECT hi, cnt,
         count(*) OVER w AS wn,
         sum(cnt) OVER w AS ws,
         sum(CAST(cnt AS DECIMAL(19,0)) * cnt) OVER w AS wq
  FROM hv
  WINDOW w AS (ORDER BY hi ROWS BETWEEN {_BB_WIN} PRECEDING
               AND 1 PRECEDING)
),
b AS (
  SELECT hi, cnt, wn,
         CAST(ws AS DOUBLE) / wn AS mu,
         CASE WHEN wn >= 2 THEN
           (CAST(wq AS DOUBLE) - (CAST(ws AS DOUBLE) / wn)
            * CAST(ws AS DOUBLE)) / (wn - 1) END AS var
  FROM r WHERE wn = {_BB_WIN}
),
z AS (
  SELECT hi, cnt, mu, var,
         CASE WHEN var > 0
              THEN (cnt - mu) / sqrt(var) END AS z
  FROM b
),
hits AS (
  SELECT hi, cnt, round(mu, 6) AS band_mean, round(z, 6) AS z_score
  FROM z WHERE z IS NOT NULL AND abs(z) > {_BB_K}
)
SELECT CAST(hi AS BIGINT) AS hi, CAST(cnt AS BIGINT) AS cnt,
       band_mean, z_score, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY abs(z_score) DESC, hi) AS rnk
  FROM hits
) WHERE rnk <= {_BB_TOPK}
"""


@query("w34_bollinger_breakouts", W34_ORACLE)
def w34_bollinger_breakouts(spark, sf_dir):
    """Bollinger-band breakouts of the hourly count series: each hour
    scored against the TRAILING {_BB_WIN}-hour mean ± {_BB_K}σ band
    (strictly prior rows, so the score is causal/streamable), top
    |z| hours reported — the volatility-adaptive alternative to a
    fixed spike threshold.

    Exactness: window sums of BIGINT counts and DECIMAL squares are
    exact; mean/var/z are identical float trees; rounding half-away
    via round(…, 6) on both engines. Full-window rows only (wn = 24)
    so partial-window variance never enters.

    Scale shape: one corpus-sized hour aggregation, then hours-sized
    rows-window work (the w27/w31 contract — the single-partition
    window is over wall-clock hours, bounded).
    """
    ev = table(spark, sf_dir, "events")
    hv = (
        ev.select(F.expr(_HI_SPARK).alias("hi"))
        .groupBy("hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.orderBy("hi")
        .rowsBetween(-_BB_WIN, -1)
    )
    cd = F.col("cnt").cast("decimal(19,0)")
    r = hv.select(
        "hi",
        "cnt",
        F.count(F.lit(1)).over(w).alias("wn"),
        F.sum("cnt").over(w).alias("ws"),
        F.sum(cd * F.col("cnt")).over(w).alias("wq"),
    )
    wn = F.col("wn")
    mu = F.col("ws").cast("double") / wn
    var = F.when(
        wn >= 2,
        (
            F.col("wq").cast("double")
            - (F.col("ws").cast("double") / wn)
            * F.col("ws").cast("double")
        )
        / (wn - 1),
    )
    b = r.where(wn == _BB_WIN).select(
        "hi", "cnt", mu.alias("mu"), var.alias("var")
    )
    z = b.select(
        "hi",
        "cnt",
        "mu",
        F.when(
            F.col("var") > 0,
            (F.col("cnt") - F.col("mu")) / F.sqrt("var"),
        ).alias("z"),
    )
    hits = z.where(
        F.col("z").isNotNull() & (F.abs("z") > _BB_K)
    ).select(
        "hi",
        "cnt",
        F.round("mu", 6).alias("band_mean"),
        F.round("z", 6).alias("z_score"),
    )
    wr = Window.orderBy(F.desc(F.abs("z_score")), F.asc("hi"))
    return (
        hits.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= _BB_TOPK)
        .select(
            F.col("hi").cast("long").alias("hi"),
            F.col("cnt").cast("long").alias("cnt"),
            "band_mean",
            "z_score",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ------------------------------------------------------------------ #
# w35_max_drawdown — worst peak-to-trough of cumulative daily revenue
# ------------------------------------------------------------------ #
W35_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS rev
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1),
t AS (SELECT count(*) AS nd, sum(rev) AS total FROM d),
net AS (
  -- n-scaled demeaning keeps every term an exact DECIMAL: flow is
  -- n·rev − total (engine-identical integers in cents), so cumsum /
  -- peak / drawdown / argmax are exact; division by n happens only
  -- in the final presentation cast
  SELECT day, CAST(t.nd AS DECIMAL(38,2)) * d.rev - t.total AS flow,
         t.nd
  FROM d, t),
c AS (
  SELECT day, nd,
         sum(flow) OVER (ORDER BY day) AS cum
  FROM net),
rm AS (
  SELECT day, nd, cum,
         max(cum) OVER (ORDER BY day) AS peak
  FROM c),
dd AS (SELECT day, nd, cum, peak, peak - cum AS drawdown FROM rm),
mx AS (SELECT max(drawdown) AS mdd FROM dd)
SELECT CAST(strftime(d2.day, '%Y-%m-%d') AS VARCHAR) AS trough_day,
       round(CAST(d2.peak AS DOUBLE) / d2.nd, 6) AS peak_cum,
       round(CAST(d2.cum AS DOUBLE) / d2.nd, 6) AS trough_cum,
       round(CAST(d2.drawdown AS DOUBLE) / d2.nd, 6) AS max_drawdown
FROM dd d2, mx
WHERE d2.drawdown = mx.mdd
ORDER BY d2.day
LIMIT 1
"""


@query("w35_max_drawdown", W35_ORACLE)
def w35_max_drawdown(spark, sf_dir):
    """Maximum drawdown of the demeaned cumulative daily revenue
    series (revenue is nonnegative, so the raw cumulative sum never
    draws down; subtracting the mean daily revenue turns it into the
    net-position series a monitoring pipeline actually watches):
    running peak minus current value, maximized, with the trough day.

    Exactness: the demeaning is n-SCALED (flow = n·rev − total) so
    every term — daily sums, cumulative sums, running max, the
    drawdown and its argmax — is an exact DECIMAL in cents; the
    single division by n happens in the final presentation cast with
    an identical float tree. Ties break to the earliest day.

    Scale shape: one corpus-sized day aggregation, then days-sized
    window work (bounded single-partition window over calendar days).
    """
    d = (
        table(spark, sf_dir, "events")
        .where(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("rev")
        )
    )
    t = d.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("rev").alias("total")
    )
    net = d.crossJoin(F.broadcast(t)).select(
        "day",
        (
            F.col("nd").cast("decimal(38,2)") * F.col("rev")
            - F.col("total")
        ).alias("flow"),
        "nd",
    )
    wo = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = net.select(
        "day", "nd", F.sum("flow").over(wo).alias("cum")
    )
    rm = c.select(
        "day", "nd", "cum", F.max("cum").over(wo).alias("peak")
    )
    dd = rm.select(
        "day",
        "nd",
        "cum",
        "peak",
        (F.col("peak") - F.col("cum")).alias("drawdown"),
    )
    mx = dd.agg(F.max("drawdown").alias("mdd"))
    return (
        dd.crossJoin(F.broadcast(mx))
        .where(F.col("drawdown") == F.col("mdd"))
        .orderBy("day")
        .limit(1)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("trough_day"),
            F.round(
                F.col("peak").cast("double") / F.col("nd"), 6
            ).alias("peak_cum"),
            F.round(
                F.col("cum").cast("double") / F.col("nd"), 6
            ).alias("trough_cum"),
            F.round(
                F.col("drawdown").cast("double") / F.col("nd"), 6
            ).alias("max_drawdown"),
        )
    )
