"""Second time-series wave: whole-day replication (W5), p95 daily
outliers (A10), record-length gates (A11) — driver-checked with
planted defects where the organic data can't trigger the operator."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.windows import ordered_window
from ..registry import query
from .common import dsum, table


# --------------------------------------------------------------------
# W5: whole-day replication — a day whose full sorted value-vector
# equals the previous day's (qaqc_unusual_streaks.py:697-818). The
# organic events never repeat a day, so two copies of one day are
# planted on empty future dates.
# --------------------------------------------------------------------
W5_ORACLE = """
WITH copy_src AS (
  SELECT user_id, ts, value FROM events
  WHERE user_id = 1 AND date_trunc('day', ts) = TIMESTAMP '2024-01-05'
), corpus AS (
  SELECT user_id, ts, value FROM events
  UNION ALL SELECT user_id, ts + INTERVAL 40 DAY, value FROM copy_src
  UNION ALL SELECT user_id, ts + INTERVAL 41 DAY, value FROM copy_src
), days AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         list_sort(list(value)) AS vec
  FROM corpus GROUP BY 1, 2
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day
FROM (
  SELECT user_id, day,
         (vec = lag(vec) OVER w
          AND date_diff('day', lag(day) OVER w, day) = 1) AS rep
  FROM days WINDOW w AS (PARTITION BY user_id ORDER BY day)
) WHERE rep
"""


@query("w5_day_vector_repeats", W5_ORACLE)
def w5_day_vector_repeats(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = ev.where(
        (F.col("user_id") == 1)
        & (
            F.date_trunc("day", F.col("ts"))
            == F.lit("2024-01-05").cast("timestamp")
        )
    )
    corpus = (
        ev.unionByName(
            src.select(
                "user_id", F.expr("ts + INTERVAL 40 DAYS").alias("ts"), "value"
            )
        )
        .unionByName(
            src.select(
                "user_id", F.expr("ts + INTERVAL 41 DAYS").alias("ts"), "value"
            )
        )
    )
    days = corpus.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sort_array(F.collect_list("value")).alias("vec"))
    w = ordered_window("user_id", "day")
    rep = (F.col("vec") == F.lag("vec").over(w)) & (
        F.datediff(F.col("day"), F.lag("day").over(w)) == 1
    )
    # The day key leaves the query as an ISO string (determinism rule:
    # DuckDB DATE vs Spark TIMESTAMP would split a strict comparator).
    return (
        days.withColumn("rep", rep)
        .where(F.col("rep"))
        .select(
            "user_id", F.date_format("day", "yyyy-MM-dd").alias("day")
        )
    )


# --------------------------------------------------------------------
# A10: daily totals above a multiple of the key's p95 of positive
# dailies (qaqc_climatological_outlier.py:463-588 shape).
# --------------------------------------------------------------------
A10_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS daily_sum
  FROM events GROUP BY 1, 2
), p AS (
  SELECT user_id, round(quantile_cont(daily_sum, 0.95), 6) AS p95
  FROM daily WHERE daily_sum > 0 GROUP BY user_id
)
SELECT d.user_id, strftime(d.day, '%Y-%m-%d') AS day,
       d.daily_sum, p.p95
FROM daily d JOIN p ON d.user_id = p.user_id
WHERE d.daily_sum > 1.2 * p.p95
"""


@query("a10_p95_daily_outliers", A10_ORACLE)
def a10_p95_daily_outliers(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(dsum("value").alias("daily_sum"))
    p95 = (
        daily.where(F.col("daily_sum") > 0)
        .groupBy("user_id")
        .agg(
            F.round(F.expr("percentile(daily_sum, 0.95)"), 6).alias("p95")
        )
    )
    return (
        daily.join(p95, "user_id")
        .where(F.col("daily_sum") > 1.2 * F.col("p95"))
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "daily_sum",
            "p95",
        )
    )


# --------------------------------------------------------------------
# A11: record-length gate — keys with too few distinct observation
# days to assess (qaqc_utils.py:203-323 shape).
# --------------------------------------------------------------------
A11_ORACLE = """
SELECT user_id, count(DISTINCT date_trunc('day', ts)) AS n_days
FROM events
GROUP BY user_id
HAVING count(DISTINCT date_trunc('day', ts)) < 28
"""


@query("a11_record_length_gate", A11_ORACLE)
def a11_record_length_gate(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.countDistinct(F.date_trunc("day", F.col("ts"))).alias("n_days")
        )
        .where(F.col("n_days") < 28)
    )


# --------------------------------------------------------------------
# Session-window aggregation: Spark's native session_window groups
# events into inactivity-bounded sessions (gap >= 30 min starts a new
# one) — the dynamic-window counterpart of the fixed hourly resample
# (SURVEY.md §2.9). The oracle sessionizes with the standard
# gap-flag running-sum idiom; both sides compare gaps on floored
# epoch microseconds, and only min/max/count/sum aggregates are
# emitted so the window struct itself never has to match.
# --------------------------------------------------------------------
SESSION_ORACLE = """
WITH t AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM t
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM s GROUP BY user_id, sid
"""


@query("w_session_agg", SESSION_ORACLE)
def w_session_agg(spark, sf_dir):
    from .common import dec

    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", "30 minutes").alias("sw"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("session_value"),
        )
        .drop("sw")
    )


# --------------------------------------------------------------------
# J9 (beyond the reference): backward as-of join — every observation
# matched with its station's most recent daily-first observation at or
# before it, within a 2-day tolerance. Spark side is the union-window
# decomposition (operators/asof.py — one shuffle, no range join);
# oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, so the custom operator
# is checked against a first-class reference implementation.
# --------------------------------------------------------------------
ASOF_ORACLE = """
WITH e AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         make_timestamp(epoch_us(ts)) AS time, value
  FROM events
),
r AS (
  SELECT station, min(time) AS rt, arg_min(value, time) AS rvalue
  FROM e GROUP BY station, CAST(time AS DATE)
)
SELECT l.station, l.time, l.value,
       CASE WHEN epoch_us(l.time) - epoch_us(r.rt) <= 172800000000
            THEN r.rvalue END AS value_asof,
       CASE WHEN epoch_us(l.time) - epoch_us(r.rt) <= 172800000000
            THEN r.rt END AS time_asof
FROM e l ASOF LEFT JOIN r
  ON l.station = r.station AND l.time >= r.rt
"""


@query("j9_asof_join", ASOF_ORACLE)
def j9_asof_join(spark, sf_dir):
    from ..operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    obs = ev.select(
        F.col("user_id").cast("string").alias("station"),
        F.col("ts").alias("time"),  # tables.load already floors ns→µs
        F.col("value"),
    )
    daily_first = obs.groupBy(
        "station", F.to_date("time").alias("__d")
    ).agg(
        F.min("time").alias("time"),
        F.min_by("value", "time").alias("value"),
    ).drop("__d")
    return asof_join(
        obs,
        daily_first,
        key="station",
        value_cols=("value",),
        tolerance_seconds=172800,
    )


# --------------------------------------------------------------------
# Rolling window median — percentile as a WINDOW function (frame
# `ROWS 6 PRECEDING..CURRENT`), the trailing-k robust smoother of a
# sensor pipeline. Exact percentile over ≤7 values per frame; both
# engines sort the frame and interpolate identically, rounded to 6dp.
# Scale: partitions by station key, no global sort.
# --------------------------------------------------------------------
ROLLMED_ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS station, ts AS time,
       round(quantile_cont(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rolling_median
FROM events
"""


@query("w_rolling_median", ROLLMED_ORACLE)
def w_rolling_median(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        F.col("user_id").cast("string").alias("station"),
        F.col("ts").alias("time"),
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias(
            "rolling_median"
        ),
    )


# --------------------------------------------------------------------
# W19: exponentially-weighted moving average with α = 1/2 — the one
# EWMA that is CROSS-ENGINE EXACT: s_t = (s_{t-1} + x_t)/2 is an IEEE
# addition followed by an exponent decrement (division by 2 is exact
# in binary floats), so a sequential fold gives bit-identical doubles
# on any engine. Spark runs the O(n) per-key fold in an
# applyInPandas island (keys are the bounded dimension); the oracle
# replays it with a per-row prefix list + list_reduce (O(n²) but
# n ≤ ~100 per key in the test data).
# --------------------------------------------------------------------
EWMA_ORACLE = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us, value FROM events
),
o AS (
  SELECT user_id, us, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us, value) AS rn
  FROM t
),
p AS (
  SELECT user_id, us, value,
         list(value) OVER (PARTITION BY user_id ORDER BY rn
                           ROWS UNBOUNDED PRECEDING) AS pre
  FROM o
)
SELECT user_id, us, value,
       list_reduce(pre, (acc, x) -> (acc + x) / 2) AS ewma
FROM p
"""


@query("w19_ewma", EWMA_ORACLE)
def w19_ewma(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "value"
    )

    # Grouped-map by a SALTED BUCKET, not by user: applyInPandas makes
    # one Python call + Arrow round-trip per group, and thousands of
    # tiny per-user groups cost ~2 ms each (measured: the old per-user
    # form spent 3.4 s of its 3.9 s there at sf0.1). 32 buckets give
    # 32 calls, and pandas' groupby-ewm folds every user inside a
    # bucket in one C pass. Series.ewm(alpha=1/2, adjust=False) folds
    # s = 0.5*s + 0.5*x, which rounds the same real value as
    # (s + x)/2 (halving is exact, scaling by 2^-1 commutes with
    # round-to-nearest) — bit-identical to the explicit loop
    # (asserted in tests/test_hardening_r4.py). At 100 TB the bucket
    # count scales with the cluster while per-user grouping would
    # drown in per-group overhead.
    def per_bucket(pdf):
        pdf = pdf.drop(columns="__b").sort_values(
            ["user_id", "us", "value"], kind="mergesort", ignore_index=True
        )
        pdf["ewma"] = (
            pdf.groupby("user_id", sort=False)["value"]
            .ewm(alpha=0.5, adjust=False)
            .mean()
            .reset_index(level=0, drop=True)
        )
        return pdf

    return (
        ev.withColumn("__b", F.pmod(F.col("user_id"), F.lit(32)))
        .groupBy("__b")
        .applyInPandas(
            per_bucket,
            "user_id bigint, us bigint, value double, ewma double",
        )
    )


# --------------------------------------------------------------------
# w23: Holt double-exponential smoothing (level + trend), alpha =
# beta = 1/2 — the trend-aware sibling of w19's EWMA and the last
# classical smoother in the family. Every recursion step is adds and
# halvings only:
#     l' = (x + (l + t)) / 2
#     t' = ((l' - l) + t) / 2
# so each step's IEEE rounding is identical on both engines given the
# same fold order (same argument as w19; halving is exact). The
# oracle replays the fold with a RECURSIVE CTE walking rn per key —
# O(n) per key, a genuine two-component-state fold that list_reduce
# (scalar accumulator) cannot express. Output is ONE row per user:
# final level/trend and the one-step-ahead forecast (l + t).
#
# Scale shape: one shuffle to the salted buckets (same move as w19 —
# per-user applyInPandas groups would pay ~2 ms of Python/Arrow
# overhead each), one O(n) C-order loop per user inside the bucket,
# output rows = users.
# --------------------------------------------------------------------
HOLT_ORACLE = """
WITH RECURSIVE o AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), value) AS rn
  FROM events
),
n AS (SELECT user_id, max(rn) AS n_obs FROM o GROUP BY user_id),
s AS (
  SELECT user_id, rn, CAST(value AS DOUBLE) AS l,
         CAST(0.0 AS DOUBLE) AS t
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn,
         (o.value + (s.l + s.t)) / 2 AS l,
         (((o.value + (s.l + s.t)) / 2 - s.l) + s.t) / 2 AS t
  FROM s JOIN o ON o.user_id = s.user_id AND o.rn = s.rn + 1
)
SELECT s.user_id, CAST(n.n_obs AS BIGINT) AS n_obs,
       s.l AS level, s.t AS trend, s.l + s.t AS forecast
FROM s JOIN n ON s.user_id = n.user_id AND s.rn = n.n_obs
"""


def _holt_per_bucket(pdf):
    """Holt fold over one salted bucket, time-major vectorized.

    The fold is sequential in time but independent ACROSS users, so
    run ONE Python loop over time steps with numpy element-wise ops
    over every user in the bucket at once. Each step evaluates
    literally (x + (l + t)) / 2 and ((l' - l) + t) / 2 — numpy's
    per-element IEEE add/divide round identically to the scalar loop
    (and to the recursive-CTE oracle), so the result is bit-identical
    (fuzzed in tests/test_hardening_r5.py); the interpreted cost drops
    from O(total rows) to O(max series length) per bucket.
    """
    import numpy as np
    import pandas as pd

    pdf = pdf.drop(columns="__b")
    if len(pdf) == 0:
        return pd.DataFrame(
            {"user_id": pd.Series(dtype="int64"),
             "n_obs": pd.Series(dtype="int64"),
             "level": pd.Series(dtype="float64"),
             "trend": pd.Series(dtype="float64")}
        )
    pdf = pdf.sort_values(
        ["user_id", "us", "value"], kind="mergesort", ignore_index=True
    )
    uidx, uids = pd.factorize(pdf["user_id"], sort=False)
    rn = pdf.groupby("user_id", sort=False).cumcount().to_numpy()
    counts = np.bincount(uidx)
    n_users, m = len(uids), int(rn.max()) + 1
    V = np.zeros((m, n_users))
    V[rn, uidx] = pdf["value"].to_numpy()
    lvl = V[0].copy()
    trd = np.zeros(n_users)
    for i in range(1, m):
        act = counts > i
        x, l, t = V[i, act], lvl[act], trd[act]
        new_l = (x + (l + t)) / 2
        trd[act] = ((new_l - l) + t) / 2
        lvl[act] = new_l
    return pd.DataFrame(
        {"user_id": uids, "n_obs": counts.astype("int64"),
         "level": lvl, "trend": trd}
    )


@query("w23_holt_smoothing", HOLT_ORACLE)
def w23_holt_smoothing(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    res = (
        ev.withColumn("__b", F.pmod(F.col("user_id"), F.lit(32)))
        .groupBy("__b")
        .applyInPandas(
            _holt_per_bucket,
            "user_id bigint, n_obs bigint, level double, trend double",
        )
    )
    return res.select(
        "user_id", "n_obs", "level", "trend",
        (F.col("level") + F.col("trend")).alias("forecast"),
    )


# --------------------------------------------------------------------
# w24: 1-D Kalman filter (random-walk state, Q=0.1, R=1.0) — the
# online denoiser streaming telemetry pipelines run before
# thresholding. The covariance recursion is data-independent
#     p_pred = p + Q;  k = p_pred / (p_pred + R);  p' = (1-k)·p_pred
# so the gain sequence is shared by every series; the state fold
#     x' = x + k·(z − x)
# vectorizes time-major across users exactly like w23's Holt fold.
# The oracle replays BOTH recursions in one recursive CTE — every
# step is the same IEEE expression tree on both engines, so the
# result is bit-identical with no quantization at all.
# --------------------------------------------------------------------
KALMAN_ORACLE = """
WITH RECURSIVE o AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), value) AS rn
  FROM events
),
n AS (SELECT user_id, max(rn) AS n_obs FROM o GROUP BY user_id),
s AS (
  SELECT user_id, rn, CAST(value AS DOUBLE) AS x,
         CAST(1.0 AS DOUBLE) AS p
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn,
         s.x + ((s.p + 0.1e0) / ((s.p + 0.1e0) + 1.0e0))
               * (o.value - s.x) AS x,
         (1.0e0 - ((s.p + 0.1e0) / ((s.p + 0.1e0) + 1.0e0)))
           * (s.p + 0.1e0) AS p
  FROM s JOIN o ON o.user_id = s.user_id AND o.rn = s.rn + 1
)
SELECT s.user_id, CAST(n.n_obs AS BIGINT) AS n_obs,
       s.x AS state, s.p AS variance
FROM s JOIN n ON s.user_id = n.user_id AND s.rn = n.n_obs
"""


def _kalman_per_bucket(pdf):
    """Kalman fold over one salted bucket, time-major vectorized: the
    shared gain sequence k_i comes from the data-independent
    covariance recursion (computed once per bucket in scalar Python —
    identical IEEE ops to the oracle's CTE), then one numpy pass per
    time step updates every user's state at once."""
    import numpy as np
    import pandas as pd

    pdf = pdf.drop(columns="__b")
    if len(pdf) == 0:
        return pd.DataFrame(
            {"user_id": pd.Series(dtype="int64"),
             "n_obs": pd.Series(dtype="int64"),
             "state": pd.Series(dtype="float64"),
             "variance": pd.Series(dtype="float64")}
        )
    pdf = pdf.sort_values(
        ["user_id", "us", "value"], kind="mergesort", ignore_index=True
    )
    uidx, uids = pd.factorize(pdf["user_id"], sort=False)
    rn = pdf.groupby("user_id", sort=False).cumcount().to_numpy()
    counts = np.bincount(uidx)
    n_users, m = len(uids), int(rn.max()) + 1
    V = np.zeros((m, n_users))
    V[rn, uidx] = pdf["value"].to_numpy()
    # shared covariance/gain sequence (scalar, data-independent)
    gains = np.zeros(m)
    pvar = np.ones(m)
    p = 1.0
    for i in range(1, m):
        p_pred = p + 0.1
        k = p_pred / (p_pred + 1.0)
        p = (1.0 - k) * p_pred
        gains[i] = k
        pvar[i] = p
    x = V[0].copy()
    for i in range(1, m):
        act = counts > i
        z, xi = V[i, act], x[act]
        x[act] = xi + gains[i] * (z - xi)
    var_final = np.where(counts > 1, pvar[np.minimum(counts - 1, m - 1)], 1.0)
    return pd.DataFrame(
        {"user_id": uids, "n_obs": counts.astype("int64"),
         "state": x, "variance": var_final}
    )


@query("w24_kalman_filter", KALMAN_ORACLE)
def w24_kalman_filter(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    res = (
        ev.withColumn("__b", F.pmod(F.col("user_id"), F.lit(32)))
        .groupBy("__b")
        .applyInPandas(
            _kalman_per_bucket,
            "user_id bigint, n_obs bigint, state double, variance double",
        )
    )
    return res.select("user_id", "n_obs", "state", "variance")


# --------------------------------------------------------------------
# a30: Benford first-digit conformance — the fraud/data-quality screen
# for financial-looking columns: observed first-digit counts of
# lineitem price cents vs Benford's log10(1+1/d), chi-square statistic
# with the digit terms summed in digit order. Counts are exact
# integers; the expected frequencies are driver-computed doubles
# embedded in the oracle as CAST(repr AS DOUBLE) literals (bare SQL
# decimal literals parse as DECIMAL), and the chi2 fold is a
# Python-generated nested-paren sum so both engines add in the same
# order. The Spark side computes the 9-term statistic DRIVER-SIDE
# from the collected digit counts (dimension-sized driver math).
# --------------------------------------------------------------------
import math as _math  # noqa: E402

_BENFORD_E = [_math.log10(1.0 + 1.0 / d) for d in range(1, 10)]
_CHI2_CRIT_8DF_05 = 15.50731305586545  # chi2.ppf(0.95, 8)


def _benford_oracle() -> str:
    e_lits = {
        d: f"CAST('{_BENFORD_E[d - 1]!r}' AS DOUBLE)" for d in range(1, 10)
    }
    terms = []
    for d in range(1, 10):
        e = e_lits[d]
        terms.append(
            f"((max(CASE WHEN digit = {d} THEN nd ELSE 0 END)"
            f" - {e} * max(nt))"
            f" * (max(CASE WHEN digit = {d} THEN nd ELSE 0 END)"
            f" - {e} * max(nt)) / ({e} * max(nt)))"
        )
    fold = terms[0]
    for t in terms[1:]:
        fold = f"({fold} + {t})"
    return f"""
WITH c AS (
  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM lineitem WHERE l_extendedprice > 0
),
h AS (
  SELECT digit, count(*) AS nd, sum(count(*)) OVER () AS nt
  FROM c GROUP BY digit
)
SELECT CAST(max(nt) AS BIGINT) AS n_total,
       {fold} AS chi2,
       {fold} > CAST('{_CHI2_CRIT_8DF_05!r}' AS DOUBLE) AS reject_05
FROM h
"""


@query("a30_benford_chi2", _benford_oracle())
def a30_benford_chi2(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice") > 0
    )
    counts = (
        li.select(
            F.substring(
                F.round(F.col("l_extendedprice") * 100)
                .cast("long")
                .cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("nd"))
        .collect()
    )
    nd = {int(r["digit"]): int(r["nd"]) for r in counts}
    n_total = sum(nd.values())
    chi2 = None
    for d in range(1, 10):
        e_n = _BENFORD_E[d - 1] * n_total
        term = (nd.get(d, 0) - e_n) * (nd.get(d, 0) - e_n) / e_n
        chi2 = term if chi2 is None else chi2 + term
    return spark.createDataFrame(
        [(n_total, chi2, chi2 > _CHI2_CRIT_8DF_05)],
        "n_total long, chi2 double, reject_05 boolean",
    )


# --------------------------------------------------------------------
# w26: Holt-Winters additive triple exponential smoothing over the
# per-event-type HOURLY count series, season m=24 (the daily cycle),
# α=β=γ=1/2. Extends w23's level+trend Holt with seasonal state; the
# oracle carries the 24-slot seasonal vector as a LIST column through
# one recursive CTE, rotating it each step — every step is the same
# IEEE expression tree as the engine's fold, so the final state is
# bit-identical with NO quantization (proven the same way as
# w23/w24). Init: l=x₁, b=0, s=0²⁴ (documented simple init; any init
# shared by both engines works).
#
# Scale shape: the corpus-sized work is ONE (type, hour) count
# aggregation; the sequential island then runs over the AGGREGATED
# series, so its cost is bounded by wall-clock hours × #types, not by
# event rows — the same "fold over the rollup, not the corpus" move
# as w13's per-(station, month) islands.
# --------------------------------------------------------------------
_HW_M = 24

HW_ORACLE = f"""
WITH RECURSIVE h AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS x
  FROM events GROUP BY 1, 2
),
o AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM h
),
n AS (SELECT event_type AS et, max(rn) AS n_obs FROM o GROUP BY 1),
s AS (
  SELECT event_type, rn, CAST(x AS DOUBLE) AS l,
         CAST(0.0 AS DOUBLE) AS b,
         list_transform(range(1, {_HW_M} + 1),
                        i -> CAST(0.0 AS DOUBLE)) AS sl
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.rn,
         (o.x - s.sl[1]) / 2 + (s.l + s.b) / 2 AS l,
         (((o.x - s.sl[1]) / 2 + (s.l + s.b) / 2 - s.l) + s.b) / 2
           AS b,
         s.sl[2:{_HW_M}]
           || [((o.x - ((o.x - s.sl[1]) / 2 + (s.l + s.b) / 2))
                + s.sl[1]) / 2] AS sl
  FROM s JOIN o ON o.event_type = s.event_type AND o.rn = s.rn + 1
)
SELECT s.event_type, CAST(n.n_obs AS BIGINT) AS n_obs,
       s.l AS level, s.b AS trend, s.sl[1] AS s_next,
       s.l + s.b + s.sl[1] AS forecast
FROM s JOIN n ON s.event_type = n.et AND s.rn = n.n_obs
"""


def _hw_per_type(pdf):
    """Holt-Winters fold over ONE event type's hourly series. The
    input is the pre-aggregated rollup (one row per hour), so the
    scalar loop is bounded by wall-clock hours, not event rows; the
    per-step expressions mirror the recursive-CTE oracle literally —
    (x−s)/2 + (l+b)/2 etc. — for bit-identity."""
    import pandas as pd

    pdf = pdf.sort_values("rn")
    xs = [float(v) for v in pdf["x"]]
    et = pdf["event_type"].iloc[0]
    l, b = xs[0], 0.0
    sl = [0.0] * _HW_M
    for x in xs[1:]:
        s_old = sl[0]
        l_new = (x - s_old) / 2 + (l + b) / 2
        b = ((l_new - l) + b) / 2
        s_new = ((x - l_new) + s_old) / 2
        sl = sl[1:] + [s_new]
        l = l_new
    return pd.DataFrame(
        {
            "event_type": [et],
            "n_obs": [len(xs)],
            "level": [l],
            "trend": [b],
            "s_next": [sl[0]],
            "forecast": [l + b + sl[0]],
        }
    )


@query("w26_holt_winters", HW_ORACLE)
def w26_holt_winters(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("x"))
    w = Window.partitionBy("event_type").orderBy("hr")
    o = h.select(
        "event_type", "x", F.row_number().over(w).alias("rn")
    )
    return o.groupBy("event_type").applyInPandas(
        _hw_per_type,
        "event_type string, n_obs bigint, level double, trend double,"
        " s_next double, forecast double",
    )


# --------------------------------------------------------------------
# w27: lagged cross-correlation between the hourly 'view' and
# 'purchase' count series (lags −3..+3) — the lead/lag discovery
# statistic next to a26's autocorrelation. Every sum is an exact
# BIGINT moment (counts are integers); r's numerator and the two
# variance terms are computed in integers and cast to DOUBLE for ONE
# division and ONE sqrt, so both engines evaluate the identical IEEE
# tree. Hour index = FLOOR(epoch_us / 3.6e9), spelled as exact integer
# arithmetic ((us - posmod(us, 3.6e9)) / 3.6e9) on BOTH engines:
# Spark DIV and DuckDB's integer // each truncate toward zero, which
# binned pre-1970 timestamps wrong (hour -0.5 and +0.5 merged into
# bin 0) — the positive-mod subtraction gives true floor division
# with no double-rounding at hour boundaries.
#
# Scale shape: one hour-keyed count agg (corpus-sized work), then a
# 7-lag explode-join on the HOURLY table — wall-clock-hours-sized,
# like w26.
# --------------------------------------------------------------------
_CCF_LAGS = 3

CCF_ORACLE = f"""
WITH hv AS (
  SELECT (epoch_us(ts)
          - ((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000)
         // 3600000000 AS hi,
         count(*) FILTER (WHERE event_type = 'view') AS v,
         count(*) FILTER (WHERE event_type = 'purchase') AS p
  FROM events GROUP BY 1
),
lags AS (SELECT unnest(range(-{_CCF_LAGS}, {_CCF_LAGS} + 1)) AS lag),
pairs AS (
  SELECT l.lag, a.v AS x, b.p AS y
  FROM lags l
  CROSS JOIN hv a
  JOIN hv b ON b.hi = a.hi + l.lag
),
agg AS (
  SELECT lag, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r
FROM agg
"""


@query("w27_cross_correlation", CCF_ORACLE)
def w27_cross_correlation(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    hv = (
        ev.select(
            F.expr(
                "(unix_micros(CAST(ts AS TIMESTAMP))"
                " - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000))"
                " DIV 3600000000"
            ).alias("hi"),
            "event_type",
        )
        .groupBy("hi")
        .agg(
            F.count_if(F.col("event_type") == "view").alias("v"),
            F.count_if(F.col("event_type") == "purchase").alias("p"),
        )
    )
    a = hv.select("hi", F.col("v").alias("x")).crossJoin(
        F.broadcast(
            spark.range(-_CCF_LAGS, _CCF_LAGS + 1).select(
                F.col("id").alias("lag")
            )
        )
    )
    b = hv.select(F.col("hi").alias("hib"), F.col("p").alias("y"))
    pairs = a.join(b, F.col("hib") == F.col("hi") + F.col("lag"))
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return agg.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n"),
        F.round(
            (
                F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
            ).cast("double")
            / F.sqrt(
                (
                    F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
                ).cast("double")
                * (
                    F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
                ).cast("double")
            ),
            6,
        ).alias("r"),
    )


# --------------------------------------------------------------------
# w28: STL-style seasonal decomposition of the hourly event-count
# series (trend = centered 25-hour moving average, seasonal = mean
# detrended value per hour-of-day, residual = remainder), surfacing
# the top-10 |residual| anomalies. The decomposition sibling of the
# smoothing family (w21 EWMA, w26 Holt-Winters): it EXPLAINS where a
# count went (trend vs daily shape vs anomaly) instead of forecasting.
#
# Exact integer spine end-to-end: counts are BIGINT; the trend window
# keeps (sum, count) as integers and only FULL 25-hour windows
# qualify (tn = 25), so detrended25 = 25*cnt - tsum is an exact
# BIGINT; the per-hour-of-day seasonal mean is one double division of
# exact integers (sum25 / (25*n)); the residual subtraction is the
# identical IEEE tree on both engines. |resid| ties break by hour
# index. Hour index shares w27's floor-division spelling.
#
# Scale shape: one hour-keyed count agg (corpus-sized work, the same
# shuffle as w27), then windows/joins on the wall-clock-hours-sized
# series — the decomposition costs nothing more at 100 TB.
# --------------------------------------------------------------------
_STL_HALF = 12  # 25-hour centered window
_STL_TOPK = 10

_STL_HI = (
    "(epoch_us(ts) - ((epoch_us(ts) % 3600000000) + 3600000000)"
    " % 3600000000) // 3600000000"
)

STL_ORACLE = f"""
WITH hv AS (
  SELECT {_STL_HI} AS hi, count(*) AS cnt FROM events GROUP BY 1
),
tr AS (
  SELECT hi, cnt,
         sum(cnt) OVER w AS tsum,
         count(*) OVER w AS tn
  FROM hv
  WINDOW w AS (ORDER BY hi
               RANGE BETWEEN {_STL_HALF} PRECEDING
                     AND {_STL_HALF} FOLLOWING)
),
full_w AS (
  SELECT hi, cnt, tsum, 25 * cnt - tsum AS d25
  FROM tr WHERE tn = {2 * _STL_HALF + 1}
),
seas AS (
  SELECT ((hi % 24) + 24) % 24 AS hod,
         CAST(sum(d25) AS DOUBLE) / (25.0e0 * count(*)) AS s
  FROM full_w GROUP BY 1
),
dec AS (
  SELECT f.hi, f.cnt,
         CAST(f.tsum AS DOUBLE) / 25.0e0 AS trend,
         seas.s AS seasonal,
         CAST(f.d25 AS DOUBLE) / 25.0e0 - seas.s AS resid
  FROM full_w f JOIN seas ON seas.hod = ((f.hi % 24) + 24) % 24
)
SELECT CAST(hi AS BIGINT) AS hi, CAST(cnt AS BIGINT) AS cnt,
       round(trend, 6) AS trend, round(seasonal, 6) AS seasonal,
       round(resid, 6) AS resid, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY abs(resid) DESC, hi) AS rnk
  FROM dec
) WHERE rnk <= {_STL_TOPK}
"""


@query("w28_stl_decompose", STL_ORACLE)
def w28_stl_decompose(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    hv = (
        ev.select(
            F.expr(
                "(unix_micros(CAST(ts AS TIMESTAMP))"
                " - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000))"
                " DIV 3600000000"
            ).alias("hi")
        )
        .groupBy("hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # hours-sized series: the unpartitioned range window is bounded by
    # wall-clock hours, not corpus rows (same contract as w26/w27)
    w = Window.orderBy("hi").rangeBetween(-_STL_HALF, _STL_HALF)
    tr = hv.select(
        "hi",
        "cnt",
        F.sum("cnt").over(w).alias("tsum"),
        F.count(F.lit(1)).over(w).alias("tn"),
    )
    full_w = tr.where(F.col("tn") == 2 * _STL_HALF + 1).select(
        "hi",
        "cnt",
        "tsum",
        (F.lit(25) * F.col("cnt") - F.col("tsum")).alias("d25"),
    )
    seas = full_w.groupBy(F.pmod(F.col("hi"), F.lit(24)).alias("hod")).agg(
        (
            F.sum("d25").cast("double")
            / (F.lit(25.0) * F.count(F.lit(1)))
        ).alias("s")
    )
    dec = full_w.join(
        F.broadcast(seas), F.pmod(full_w.hi, F.lit(24)) == seas.hod
    ).select(
        "hi",
        "cnt",
        (F.col("tsum").cast("double") / F.lit(25.0)).alias("trend"),
        F.col("s").alias("seasonal"),
        (
            F.col("d25").cast("double") / F.lit(25.0) - F.col("s")
        ).alias("resid"),
    )
    rw = Window.orderBy(F.desc(F.abs(F.col("resid"))), F.asc("hi"))
    return (
        dec.withColumn("rnk", F.row_number().over(rw))
        .where(F.col("rnk") <= _STL_TOPK)
        .select(
            F.col("hi").cast("long").alias("hi"),
            F.col("cnt").cast("long").alias("cnt"),
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round("resid", 6).alias("resid"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
