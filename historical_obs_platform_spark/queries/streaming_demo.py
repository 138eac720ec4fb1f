"""Structured Streaming surface through the driver gate: real streams
(parquet file source → memory sink, drained synchronously with
``processAllAvailable``, the batch-on-stream pattern of
``Trigger.AvailableNow``). Every streaming query carries an exact
DuckDB oracle — a deterministic stream over a finite source must
converge to the batch answer, and that equality is the test:
tumbling rollup (first-in-hour via arg_min, decimal-exact hour sums),
dedup-within-watermark, sliding windows, stream-stream interval join,
stateful gap detection, stateful de-accumulation, flag-rate
maintenance, session windows, and a running top-k leaderboard."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..session import tune
from ..streaming.hourly import hourly_standardize_stream
from ..streaming.stateful import gap_detect_stream


_RAW_SCHEMA: dict = {}


def _raw_schema(spark, path):
    """Memoized raw parquet schema per (session, file): every stream
    variant re-read the footer (~75 ms of driver time) on every bench
    rep just to hand readStream its schema (guide §5: the driver
    should do almost no work). The schema of a test table never
    changes within a session — same contract as tables._DF_MEMO."""
    key = (spark.sparkContext.applicationId, path)
    if key not in _RAW_SCHEMA:
        _RAW_SCHEMA[key] = spark.read.parquet(path).schema
    return _RAW_SCHEMA[key]


def _time_col(schema):
    """``ts`` → LTZ ``time`` for either physical encoding: INT64 nanos
    (read as long under nanosAsLong → truncate to micros) or native
    parquet TIMESTAMP with isAdjustedToUTC=false (read as NTZ → cast;
    session tz is UTC so the cast is value-preserving)."""
    if isinstance(schema["ts"].dataType, T.LongType):
        return F.timestamp_micros(F.expr("ts div 1000")).alias("time")
    return F.col("ts").cast("timestamp").alias("time")


def _with_stream_shuffle(fn):
    """Size streaming state to the stream, not the batch default: 150
    station keys need 8 state-store partitions, not 32 — each stateful
    operator otherwise pays 32 store commits per micro-batch (~3× the
    wall time at sf0.1). The decorator scopes the setting to the query
    call and restores the prior value on ANY exit (including build
    errors), so a failed stream can't leak a degraded setting into the
    rest of a shared session. On a cluster, raise via
    SPARK_GRAFT_STREAM_SHUFFLE to match real key cardinality."""
    import functools
    import os
    import re

    @functools.wraps(fn)
    def wrapper(spark, sf_dir):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        # default scales with the data: ~150 keys at sf0.01 want 4
        # state partitions (each extra partition is a per-micro-batch
        # state-store commit; measured 2x wall time 8 -> 4 at sf0.01)
        m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
        default = "4" if (m and float(m.group(1)) <= 0.011) else "8"
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", default),
        )
        try:
            return fn(spark, sf_dir)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    return wrapper


# first-in-hour is arg_min over unique (station, time) stamps and the
# sum family is decimal (order-free), so the finite stream's complete-
# mode state equals the batch rollup exactly.
ST_HOURLY_ORACLE = """
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         make_timestamp(epoch_us(ts)) AS time,
         value AS tas,
         CAST(value % 3.0 AS DECIMAL(18,2)) AS pr
  FROM events
)
SELECT station, date_trunc('hour', time) AS hour,
       count(*) AS n_obs,
       arg_min(tas, time) AS tas_first,
       CAST(CASE WHEN count(pr) = 0 THEN NULL ELSE sum(pr) END
            AS DOUBLE) AS pr_sum
FROM t GROUP BY station, date_trunc('hour', time)
"""


@query("st_hourly_rollup_stream", ST_HOURLY_ORACLE)
@_with_stream_shuffle
def st_hourly_rollup_stream(spark, sf_dir):
    tune(spark)
    path = f"{sf_dir}/events.parquet"
    schema = _raw_schema(spark, path)
    # the file source wants a directory or a glob; the wildcard makes
    # the single-file path a glob
    src = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    obs = src.select(
        F.col("user_id").cast("string").alias("station"),
        _time_col(schema),
        F.col("value").alias("tas"),
        (F.col("value") % 3.0).cast("decimal(18,2)").alias("pr"),
    )
    agg = hourly_standardize_stream(
        obs, first_cols=["tas"], sum_cols=["pr"]
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("st_hourly_rollup")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_hourly_rollup").select(
        "station",
        "hour",
        "n_obs",
        "tas_first",
        F.col("pr_sum").cast("double").alias("pr_sum"),
    )


# The stateful stream is oracle-checkable: state carries the last-seen
# timestamp across micro-batches, so the emitted gap set equals a
# batch lag() over the full history. Both sides floor ns -> us first
# (epoch_us / timestamp_micros) so the diff arithmetic is identical.
ST_GAP_ORACLE = """
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS station, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
         ) AS prev
  FROM events
)
SELECT station,
       make_timestamp(prev) AS gap_start,
       make_timestamp(us) AS gap_end,
       CAST((us - prev + 86400000000 - 1) // 86400000000 - 1
            AS INTEGER) AS n_missing
FROM t
WHERE us - prev > 86400000000
"""


@query("st_gap_detect_stream", ST_GAP_ORACLE)
@_with_stream_shuffle
def st_gap_detect_stream(spark, sf_dir):
    """Stateful streaming gap detection: per-user cadence
    gaps over the events stream via ``applyInPandasWithState`` — the
    last-seen timestamp survives micro-batch boundaries, so gaps that
    straddle batches are still reported (SURVEY.md §2.9 grid-infill
    analog; see ``streaming/stateful.py``)."""
    tune(spark)
    path = f"{sf_dir}/events.parquet"
    schema = _raw_schema(spark, path)
    src = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    obs = src.select(
        F.col("user_id").cast("string").alias("station"),
        _time_col(schema),
    )
    out = gap_detect_stream(obs, cadence_seconds=86400)
    q = (
        out.writeStream.format("memory")
        .queryName("st_gap_detect")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_gap_detect")


# --------------------------------------------------------------------
# Streaming dedup-within-watermark (O2/O7 streaming analog): the
# events file is read as TWO unioned streams — every row re-delivered
# — and dropDuplicatesWithinWatermark keeps exactly one copy, state
# bounded by the watermark. Duplicates are full-row identical, so the
# kept row is deterministic and the oracle is a plain DISTINCT.
# --------------------------------------------------------------------
from ..streaming.hourly import (  # noqa: E402
    dedup_keep_first_stream,
    interval_join_stream,
    sliding_rollup_stream,
)

ST_DEDUP_ORACLE = """
SELECT DISTINCT CAST(user_id AS VARCHAR) AS station,
       make_timestamp(epoch_us(ts)) AS time, value
FROM events
"""


def _events_stream(spark, sf_dir):
    path = f"{sf_dir}/events.parquet"
    schema = _raw_schema(spark, path)
    src = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    return src.select(
        F.col("user_id").cast("string").alias("station"),
        _time_col(schema),
        F.col("value"),
    )


@query("st_dedup_stream", ST_DEDUP_ORACLE)
@_with_stream_shuffle
def st_dedup_stream(spark, sf_dir):
    tune(spark)
    doubled = _events_stream(spark, sf_dir).unionByName(
        _events_stream(spark, sf_dir)
    )
    out = dedup_keep_first_stream(
        doubled, keys=("station", "time", "value")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("st_dedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_dedup")


# --------------------------------------------------------------------
# Sliding-window rollup: 2-hour windows sliding 1 hour — each event
# belongs to exactly 2 windows. Complete-mode memory sink so the
# tail windows (still behind the watermark when the files drain) are
# included. Oracle: fan each row out to its 2 covering window starts
# with integer microsecond arithmetic.
# --------------------------------------------------------------------
ST_SLIDING_ORACLE = """
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         epoch_us(ts) - (epoch_us(ts) % 3600000000) AS hour_us,
         value
  FROM events
),
fanned AS (
  SELECT station, unnest([hour_us - 3600000000, hour_us]) AS start_us, value
  FROM t
)
SELECT station, make_timestamp(start_us) AS win_start,
       count(*) AS n_obs,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM fanned GROUP BY station, start_us
"""


@query("st_sliding_window_stream", ST_SLIDING_ORACLE)
@_with_stream_shuffle
def st_sliding_window_stream(spark, sf_dir):
    tune(spark)
    obs = _events_stream(spark, sf_dir)
    agg = sliding_rollup_stream(
        obs, agg_col="value", window="2 hours", slide="1 hour"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("st_sliding")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_sliding")


# --------------------------------------------------------------------
# Stream-stream interval join: alerts (value > 195) match the same
# station's observations within [alert_time, alert_time + 1h]. The
# two-sided event-time bound lets Spark expire join state behind the
# watermarks; inner matches emit immediately. Oracle: the same join
# in integer microseconds.
# --------------------------------------------------------------------
ST_JOIN_ORACLE = """
WITH e AS (
  SELECT CAST(user_id AS VARCHAR) AS station, epoch_us(ts) AS us, value
  FROM events
)
SELECT o.station,
       make_timestamp(a.us) AS alert_time,
       make_timestamp(o.us) AS obs_time,
       o.value AS obs_value,
       a.value AS alert_value
FROM e o JOIN e a
  ON o.station = a.station
 AND a.value > 195
 AND o.us >= a.us AND o.us <= a.us + 3600000000
"""


@query("st_interval_join_stream", ST_JOIN_ORACLE)
@_with_stream_shuffle
def st_interval_join_stream(spark, sf_dir):
    tune(spark)
    obs = _events_stream(spark, sf_dir)
    alerts = _events_stream(spark, sf_dir).where(F.col("value") > 195)
    out = interval_join_stream(obs, alerts, horizon="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("st_interval_join")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_interval_join")


# --------------------------------------------------------------------
# Stateful de-accumulation (streaming W7): per-station first
# differences with the last (time, value) carried across micro-batches
# (applyInPandasWithState; the transformWithState variant is gated on
# worker protobuf). Oracle: batch lag() over the full history —
# identical because the state seam reproduces exactly the batch
# predecessor, and the double subtraction has identical operands on
# both engines.
# --------------------------------------------------------------------
from ..streaming.stateful import deaccumulate_stream  # noqa: E402

ST_DEACC_ORACLE = """
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS station, epoch_us(ts) AS us, value,
         lag(value) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
         ) AS prev
  FROM events
)
SELECT station, make_timestamp(us) AS time, value,
       value - prev AS incr
FROM t
"""


@query("st_deaccumulate_stream", ST_DEACC_ORACLE)
@_with_stream_shuffle
def st_deaccumulate_stream(spark, sf_dir):
    tune(spark)
    obs = _events_stream(spark, sf_dir)
    out = deaccumulate_stream(obs)
    q = (
        out.writeStream.format("memory")
        .queryName("st_deacc")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_deacc")


# Streaming report maintenance: the flag-rates table kept current as
# observations arrive — stateless rule flags (world-record tas gate,
# calm-wind inconsistency) feed a running per-station aggregate in
# complete mode; counts are order-free, so the finite stream's state
# equals the batch report exactly. The 100 TB shape: the same running
# aggregate updates per micro-batch instead of re-folding the corpus
# per report build (the reference rebuilds its rates tables from all
# per-station CSVs every time, ~37 min single-process; BASELINE.md).
ST_RATES_ORACLE = """
WITH o AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         200.0 + value / 2 AS tas,
         CAST(CAST(floor(value) AS BIGINT) % 25 AS DOUBLE) AS wind,
         CAST(CAST(floor(value * 7) AS BIGINT) % 361 AS DOUBLE) AS dir
  FROM events
), f AS (
  SELECT station,
         CASE WHEN tas < 210.15 OR tas > 329.92 THEN 1 ELSE 0 END AS tf,
         CASE WHEN (wind = 0 AND dir <> 0) OR (wind <> 0 AND dir = 0)
              THEN 1 ELSE 0 END AS df
  FROM o
), agg AS (
  SELECT station, CAST(count(*) AS BIGINT) AS total_obs_count,
         CAST(sum(tf) AS BIGINT) AS n_tas,
         CAST(sum(df) AS BIGINT) AS n_dir
  FROM f GROUP BY station
)
SELECT station, 'tas' AS variable,
       CAST(n_tas AS DOUBLE) / total_obs_count AS flag_rate,
       total_obs_count FROM agg
UNION ALL
SELECT station, 'sfcWind_dir',
       CAST(n_dir AS DOUBLE) / total_obs_count,
       total_obs_count FROM agg
"""


@query("st_flag_rates_stream", ST_RATES_ORACLE)
@_with_stream_shuffle
def st_flag_rates_stream(spark, sf_dir):
    tune(spark)
    path = f"{sf_dir}/events.parquet"
    schema = _raw_schema(spark, path)
    src = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    tas = F.lit(200.0) + F.col("value") / 2
    wind = (F.floor(F.col("value")) % 25).cast("double")
    direc = (F.floor(F.col("value") * 7) % 361).cast("double")
    flags = src.select(
        F.col("user_id").cast("string").alias("station"),
        F.when((tas < 210.15) | (tas > 329.92), 1).otherwise(0).alias("tf"),
        F.when(
            ((wind == 0) & (direc != 0)) | ((wind != 0) & (direc == 0)), 1
        ).otherwise(0).alias("df"),
    )
    agg = flags.groupBy("station").agg(
        F.count(F.lit(1)).alias("total_obs_count"),
        F.sum("tf").alias("n_tas"),
        F.sum("df").alias("n_dir"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("st_flag_rates")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    snap = spark.table("st_flag_rates")
    return snap.selectExpr(
        "station",
        "stack(2, 'tas', n_tas, 'sfcWind_dir', n_dir) AS (variable, n)",
        "total_obs_count",
    ).select(
        "station",
        "variable",
        (F.col("n") / F.col("total_obs_count")).alias("flag_rate"),
        "total_obs_count",
    )


# --------------------------------------------------------------------
# Streaming session windows: Spark's native session_window groups a
# stream into inactivity-bounded sessions (>= 30 min of silence seals
# one); the dynamic-window counterpart of the fixed hourly rollup and
# the streaming analog of w_session_agg (timeseries2.py). Complete-
# mode memory sink: the finite drained stream must converge to the
# batch sessionization, which the gap-flag running-sum oracle states
# exactly. State is per-(station, open-session) — bounded by key
# cardinality, and on an unbounded stream a watermark ages sealed
# sessions out of the store.
# --------------------------------------------------------------------
ST_SESSION_ORACLE = """
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS station,
         make_timestamp(epoch_us(ts)) AS time, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT station, time, value,
         SUM(new_s) OVER (PARTITION BY station ORDER BY time
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM t
)
SELECT station,
       min(time) AS session_start,
       max(time) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         AS session_value
FROM s GROUP BY station, sid
"""


@query("st_session_stream", ST_SESSION_ORACLE)
@_with_stream_shuffle
def st_session_stream(spark, sf_dir):
    tune(spark)
    obs = _events_stream(spark, sf_dir)
    agg = (
        obs.groupBy(
            "station", F.session_window("time", "30 minutes").alias("sw")
        )
        .agg(
            F.min("time").alias("session_start"),
            F.max("time").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("session_value"),
        )
        .drop("sw")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("st_session")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_session")


# --------------------------------------------------------------------
# Streaming top-k: complete-mode running leaderboard (top event types
# by decimal-exact total value) — the monitoring companion of the CMS
# heavy-hitters sketch: tiny state (one row per key), re-ranked every
# micro-batch. Ties rank deterministically on the key so the cutoff
# can't disagree with the batch oracle.
# --------------------------------------------------------------------
ST_TOPK_ORACLE = """
WITH agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM events GROUP BY event_type),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY total DESC, event_type) AS rk
  FROM agg)
SELECT event_type, n, total FROM ranked WHERE rk <= 3
"""


@query("st_topk_stream", ST_TOPK_ORACLE)
@_with_stream_shuffle
def st_topk_stream(spark, sf_dir):
    """DEMO-ONLY complete-mode variant: keeps one state row per key
    for the life of the stream (correct for drained ingest batches,
    which is what the oracle checks; unbounded on a forever stream).
    Production entry point for unbounded streams is the bounded
    append-mode twin st_topk_windowed_append (watermark + window eviction)."""
    tune(spark)
    path = f"{sf_dir}/events.parquet"
    schema = _raw_schema(spark, path)
    src = spark.readStream.schema(schema).parquet(
        f"{sf_dir}/events*.parquet"
    )
    agg = (
        src.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy(F.col("total").desc(), "event_type")
        .limit(3)
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("st_topk")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_topk")


# --------------------------------------------------------------------
# Streaming incremental near-dup — the stream-static join pattern: a
# document stream is deduped against the STATIC stored-corpus LSH
# index with no stream-stream state. Everything per-document computes
# IN-ROW (shingle array, 16 minhashes as array_min over the array, 4
# band keys) — the batch groupBy-signature reshaped into array
# expressions so the stream needs no aggregation until the single
# final best-match state. Two stateless stream-static equi-joins
# (skinny bucket match first, THEN fetch the matched doc's shingle
# array by id — the array never rides the bucket table), row-local
# exact-Jaccard confirm, one complete-mode max-struct aggregation.
# Duplicate band collisions need no dropDuplicates: max() is
# idempotent under them. The oracle is the BATCH incremental query's
# oracle verbatim — the drained stream must converge to it.
# --------------------------------------------------------------------
def _inrow_signature(df, sh_col: str, n_hashes: int):
    """Attach minhash_0..n as row-local array minima. Two passes:
    the md5 digests compute ONCE per (shingle, md5-group) into
    intermediate hex arrays (3 hash slices share each md5 — same
    economy as the batch ``minhash_hash_col`` family; the naive
    per-hash form recomputed every md5 three times, measured 2.6×
    slower on the stream), then each hash is a slice+parse min over
    its group's array."""
    from ..operators.dedup import (
        MINHASH_SLICE_HEX,
        _minhash_md5_start,
    )

    groups = sorted({_minhash_md5_start(i)[0] for i in range(n_hashes)})
    out = df.select(
        "*",
        *[
            F.expr(
                f"transform({sh_col}, shingle -> "
                f"md5(concat('mh{m}:', shingle)))"
            ).alias(f"__h{m}")
            for m in groups
        ],
    )
    sig = [
        F.expr(
            f"array_min(transform(__h{_minhash_md5_start(i)[0]}, h -> "
            f"cast(conv(substring(h, {_minhash_md5_start(i)[1]}, "
            f"{MINHASH_SLICE_HEX}), 16, 10) as bigint)))"
        ).alias(f"minhash_{i}")
        for i in range(n_hashes)
    ]
    return out.select(
        *[c for c in df.columns], *sig
    )


def _st_neardup_oracle():
    from .textops import _incremental_oracle

    return _incremental_oracle()


def _neardup_jaccard_stream(spark, sf_dir):
    """Shared near-dup ingest pipeline: the (new_id, a, jaccard ≥ 0.8)
    candidate STREAM against the static stored-corpus LSH index, plus
    a deterministic per-document event time ``ev`` (doc_id minutes
    from a fixed epoch) for watermark-based variants. Everything up
    to the final best-match aggregation — the complete-mode and
    append-mode queries differ only in how they aggregate this."""
    from ..operators import dedup as DD
    from .textops import LSH_BANDS, LSH_N_HASHES, _lsh_shared_full

    tune(spark)
    # static stored index: buckets + per-doc shingle sets of the
    # existing corpus — built ONCE per (session, corpus version) and
    # localCheckpointed, exactly as production persists an index;
    # both the complete-mode and append-mode consumers join the same
    # materialized static side (deterministic build, so the memo is
    # observation-free).
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _NEARDUP_STATIC:
        shingles, _sigs, buckets, _cand = _lsh_shared_full(spark, sf_dir)
        old_sh = shingles.where(F.col("doc_id") < 1000000)
        # a document's minhash signature (hence its band buckets)
        # depends only on that document's own shingles, so the
        # stored-corpus bucket index == the shared full-corpus bucket
        # table filtered to stored ids — reuse the checkpointed
        # handle instead of re-running the signature aggregation
        _NEARDUP_STATIC[key] = (
            buckets.where(F.col("doc_id") < 1000000)
            .select(F.col("doc_id").alias("a"), "band", "bucket")
            .localCheckpoint(eager=False),
            old_sh.groupBy("doc_id")
            .agg(
                F.collect_set("shingle").alias("__sh_a"),
                F.countDistinct("shingle").alias("sz_a"),
            )
            .select(F.col("doc_id").alias("a"), "__sh_a", "sz_a")
            .localCheckpoint(eager=False),
        )
    idx_buckets, idx_docs = _NEARDUP_STATIC[key]

    path = f"{sf_dir}/documents.parquet"
    schema = _raw_schema(spark, path)
    src = spark.readStream.schema(schema).parquet(
        f"{sf_dir}/documents*.parquet"
    )
    # the watermark attaches at the SOURCE projection so it tracks
    # every incoming document's event time — downstream filters
    # (short docs, no candidate ≥ threshold) must not hold the
    # watermark back. Complete-mode consumers ignore it; append-mode
    # consumers use it to finalize + evict window state.
    incoming = src.select(
        (F.col("doc_id") + 1000000).alias("new_id"),
        (
            F.lit("2024-01-01").cast("timestamp")
            + F.make_interval(mins=F.col("doc_id").cast("int"))
        ).alias("ev"),
        F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
    ).withWatermark("ev", "0 seconds")
    # ONE shuffle of the skinny incoming rows right after the source:
    # the parquet batch arrives as a single scan partition, and
    # everything from here to the final aggregation is map-side
    # (in-row md5 signatures + broadcast index joins) — without the
    # spread the entire signature/confirm pipeline runs in one task
    # (profiled: addBatch 12.6 s single-task → ~3 s at 32-way; the
    # shuffled rows are (id, ev, text), trivially small). Width
    # follows the executor core count, not a local-mode constant.
    incoming = incoming.repartition(spark.sparkContext.defaultParallelism)
    toked = incoming.select(
        "new_id",
        "ev",
        F.split(DD.normalize_text("text"), " ").alias("__toks"),
    ).where(F.size("__toks") >= 2)
    # NO size(__sh_b) > 0 guard here: it is provably dead — toked
    # enforces size(__toks) >= 2, so sequence(1, size-1) has >= 1
    # element, and every shingle is concat_ws(' ', t_i, t_i+1) of two
    # non-NULL strings (split never yields NULLs), i.e. length >= 1
    # and never '' — so the filtered, distinct array is never empty.
    # The guard was also the whole pipeline's wall: Catalyst pushed it
    # below this projection, substituting (and re-evaluating) the full
    # interpreted HOF shingle build per row — measured 5.7 s with the
    # guard vs 0.8 s without on the sf0.1 batch equivalent (min-of-2,
    # noop sink), identical rows.
    shingled = toked.select(
        "new_id",
        "ev",
        F.expr(
            "filter(array_distinct(transform("
            "sequence(1, size(__toks) - 1), "
            "i -> concat_ws(' ', slice(__toks, i, 2)))), "
            "x -> x != '')"
        ).alias("__sh_b"),
    )
    signed = _inrow_signature(
        shingled.withColumn("sz_b", F.size("__sh_b")),
        "__sh_b",
        LSH_N_HASHES,
    )
    rows = LSH_N_HASHES // LSH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"minhash_{b * rows + r}")
                            for r in range(rows)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    keyed = signed.select(
        "new_id", "ev", "__sh_b", "sz_b", F.explode(bands).alias("bb")
    ).select("new_id", "ev", "__sh_b", "sz_b", "bb.band", "bb.bucket")
    cand = keyed.join(idx_buckets, ["band", "bucket"]).join(
        idx_docs, "a"
    )
    scored = cand.select(
        "new_id",
        "ev",
        "a",
        F.size(F.array_intersect("__sh_b", "__sh_a")).cast("long").alias(
            "n_common"
        ),
        "sz_a",
        "sz_b",
    ).where(F.col("n_common") > 0)
    jac = scored.select(
        "new_id",
        "ev",
        "a",
        F.round(
            F.col("n_common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
            6,
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= 0.8)
    return jac


@query("st_neardup_stream", _st_neardup_oracle())
@_with_stream_shuffle
def st_neardup_stream(spark, sf_dir):
    """DEMO-ONLY complete-mode variant: keeps one state row per key
    for the life of the stream (correct for drained ingest batches,
    which is what the oracle checks; unbounded on a forever stream).
    Production entry point for unbounded streams is the bounded
    append-mode twin st_neardup_append (watermark + window eviction)."""
    jac = _neardup_jaccard_stream(spark, sf_dir)
    best = jac.groupBy("new_id").agg(
        F.max(
            F.struct(
                F.col("jaccard").alias("j"), (-F.col("a")).alias("nega")
            )
        ).alias("b")
    )
    out = best.select(
        "new_id",
        (-F.col("b.nega")).alias("dup_of"),
        F.col("b.j").alias("jaccard"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("st_neardup")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_neardup")


# --------------------------------------------------------------------
# Streaming semantic dedup — SemDeDup's ingest half as a stream: new
# embeddings are checked against the STATIC stored corpus' k-means
# cell index. Cell assignment happens IN-ROW against the (tiny,
# collected) centroid table rendered as literal arrays — the same
# bounded-small-side move as the polygon gate — so the stream is
# map-only until one stateless stream-static equi-join on cell and a
# single complete-mode best-match aggregation. The batch-side
# centroid table is bit-identical to the oracle's (round-9 Lloyd
# means; proven by the s_ivf/d_semdedup family), so the drained
# stream converges exactly to the batch recompute.
# --------------------------------------------------------------------
_ST_SEM_CELLS = 16

# static near-dup index memo: (applicationId, sf_dir) -> (buckets,
# per-doc shingle sets), shared by the complete- and append-mode
# near-dup ingest queries (see _neardup_jaccard_stream)
_NEARDUP_STATIC: dict = {}
_SEMDEDUP_STATIC: dict = {}
_ST_SEM_THR = 0.95


def _st_semdedup_oracle(n_cells=_ST_SEM_CELLS, thr=_ST_SEM_THR) -> str:
    dot = "list_dot_product({a}, {b})"
    return f"""
WITH c AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings),
cn AS (SELECT vec_id, e, sqrt({dot.format(a='e', b='e')}) AS nrm FROM c),
u AS (SELECT vec_id, list_transform(e, x -> x / nrm) AS uv FROM cn),
cent0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
         uv AS cent
  FROM (SELECT * FROM u ORDER BY vec_id LIMIT {n_cells})
),
assign0 AS (
  SELECT vec_id, cell FROM (
    SELECT u.vec_id, c0.cell,
           row_number() OVER (PARTITION BY u.vec_id
             ORDER BY {dot.format(a='u.uv', b='c0.cent')} DESC, c0.cell) AS r
    FROM u CROSS JOIN cent0 c0) WHERE r = 1
),
means AS (
  SELECT a.cell, t.i AS pos, round(avg(u.uv[t.i + 1]), 9) AS val
  FROM u JOIN assign0 a USING (vec_id), range(64) t(i)
  GROUP BY a.cell, t.i
),
cent1 AS (
  SELECT cell,
         list_transform(m, x -> x / sqrt({dot.format(a='m', b='m')})) AS cent
  FROM (SELECT cell, list(val ORDER BY pos) AS m FROM means GROUP BY cell)
),
stored AS (
  SELECT vec_id AS a, cell FROM (
    SELECT u.vec_id, c1.cell,
           row_number() OVER (PARTITION BY u.vec_id
             ORDER BY {dot.format(a='u.uv', b='c1.cent')} DESC, c1.cell) AS r
    FROM u CROSS JOIN cent1 c1) WHERE r = 1
),
inc AS (
  SELECT vec_id + 1000000 AS new_id, e, nrm,
         list_transform(e, x -> x / nrm) AS uv
  FROM cn
),
inc_cell AS (
  SELECT new_id, cell FROM (
    SELECT inc.new_id, c1.cell,
           row_number() OVER (PARTITION BY inc.new_id
             ORDER BY {dot.format(a='inc.uv', b='c1.cent')} DESC, c1.cell) AS r
    FROM inc CROSS JOIN cent1 c1) WHERE r = 1
),
matches AS (
  SELECT i.new_id, s.a,
         round({dot.format(a='ie.e', b='ae.e')} / (ie.nrm * ae.nrm), 6)
           AS cosine_sim
  FROM inc_cell i JOIN stored s USING (cell)
  JOIN cn ie ON ie.vec_id = i.new_id - 1000000
  JOIN cn ae ON ae.vec_id = s.a
)
SELECT new_id, a AS dup_of, cosine_sim FROM (
  SELECT new_id, a, cosine_sim,
         row_number() OVER (PARTITION BY new_id
           ORDER BY cosine_sim DESC, a) AS r
  FROM matches WHERE cosine_sim >= {thr}
) WHERE r = 1
"""


@query("st_semdedup_stream", _st_semdedup_oracle())
@_with_stream_shuffle
def st_semdedup_stream(spark, sf_dir):
    """DEMO-ONLY complete-mode variant: keeps one state row per key
    for the life of the stream (correct for drained ingest batches,
    which is what the oracle checks; unbounded on a forever stream).
    Production entry point for unbounded streams is the bounded
    append-mode twin st_semdedup_append (watermark + window eviction)."""
    matched = _semdedup_matches_stream(spark, sf_dir)
    best = matched.groupBy("new_id").agg(
        F.max(
            F.struct(
                F.col("cosine_sim").alias("c"), (-F.col("a")).alias("nega")
            )
        ).alias("b")
    )
    out = best.select(
        "new_id",
        (-F.col("b.nega")).alias("dup_of"),
        F.col("b.c").alias("cosine_sim"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("st_semdedup")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_semdedup")


def _semdedup_matches_stream(spark, sf_dir):
    """Shared semantic-dedup ingest pipeline: the (new_id, a,
    cosine_sim ≥ thr) candidate STREAM against the static k-means
    cell index, plus a deterministic per-vector event time ``ev``
    (vec_id minutes from a fixed epoch) for watermark variants."""
    from ..operators import similarity as SIM

    tune(spark)
    # static index memoized per (session, corpus version) and
    # MATERIALIZED (localCheckpoint): without the cut the stored
    # side's centroid build + kernel assignment lineage re-executes
    # once per micro-batch per query — profiled as most of the
    # semdedup streams' wall (the _NEARDUP_STATIC move)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SEMDEDUP_STATIC:
        from .textops import _ivf_cent_shared

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # same (corpus, n_cells, iters) fit as the batch IVF family —
        # share the session build instead of refitting
        cent = _ivf_cent_shared(spark, sf_dir, _ST_SEM_CELLS, 1)
        # ivf_centroids already returns local rows, so this collect
        # is a local-relation scan; the rows feed the stream side's
        # in-row Arrow assignment (no extra join on the stream)
        rows = sorted(
            ((r["cell"], r["__cent"]) for r in cent.collect()),
            key=lambda t: t[0],
        )
        # cell assignment rides the stored rows in-map
        # (attach_cells), so the static side is one scan — no
        # (id, cell)⋈corpus join
        st = SIM.attach_cells(
            emb.select(
                F.col("vec_id").alias("a"),
                SIM.as_double_array("embedding").alias("__e_a"),
                SIM._unit(SIM.as_double_array("embedding")).alias(
                    "__uv"
                ),
            ),
            cent,
        ).select("a", "cell", "__e_a").localCheckpoint(eager=False)
        _SEMDEDUP_STATIC[key] = (rows, st, emb.schema)
    cent_rows, stored, schema = _SEMDEDUP_STATIC[key]

    src = spark.readStream.schema(schema).parquet(
        f"{sf_dir}/embeddings*.parquet"
    )
    # watermark at the source projection (see _neardup_jaccard_stream)
    inc = src.select(
        (F.col("vec_id") + 1000000).alias("new_id"),
        (
            F.lit("2024-01-01").cast("timestamp")
            + F.make_interval(mins=F.col("vec_id").cast("int"))
        ).alias("ev"),
        SIM.as_double_array("embedding").alias("__e_b"),
    ).withWatermark("ev", "0 seconds")
    # spread the single-partition source batch before the map-side
    # kernel work (same move as _neardup_jaccard_stream); width
    # follows the executor core count, not a local-mode constant
    inc = inc.repartition(spark.sparkContext.defaultParallelism)
    # in-row nearest centroid via the Arrow kernel (fold-order exact,
    # ties to the smallest cell — see nearest_cell_arrow for why the
    # literal-expression form is the wrong plan here)
    keyed = inc.withColumn(
        "cell", SIM.nearest_cell_arrow(F.col("__e_b"), cent_rows)
    ).select("new_id", "ev", "cell", "__e_b")
    # the within-cell confirm is the hot path (|cell| candidates per
    # incoming row); the whole cosine runs in one Arrow kernel whose
    # accumulation order replays the fold bit-exactly — composing it
    # from pre-projected norm columns instead lets Catalyst collapse
    # the projections into the join and re-fold both norms per pair
    return keyed.join(stored, "cell").select(
        "new_id",
        "ev",
        "a",
        F.round(
            SIM.cosine_arrow(F.col("__e_b"), F.col("__e_a")), 6
        ).alias("cosine_sim"),
    ).where(F.col("cosine_sim") >= _ST_SEM_THR)


# --------------------------------------------------------------------
# Append-mode twins — the BOUNDED-STATE contract for unbounded
# streams. The complete-mode demos above keep one state row per key
# forever (fine for drained ingest batches, unbounded on a forever
# stream). Each twin keys the same aggregation by a watermarked
# event-time window, runs in APPEND mode, and lets the watermark
# finalize + EVICT closed windows: state is bounded by (keys in the
# open window) × (state-store partitions), independent of stream
# length. The finite test stream converges to the batch recompute
# restricted to FINALIZED windows — the restriction is part of the
# oracle, so the watermark semantics themselves are hash-checked.
# Boundary note: a window whose end equals the final watermark
# exactly is engine-semantics-sensitive; the synthetic event times
# (id-minutes, max ids never multiples of 60; event maxima never on
# the hour) keep every SF off that boundary.
# --------------------------------------------------------------------
ST_TOPK_APPEND_ORACLE = """
WITH h AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS hour_start,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS hend,
         event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2, 3),
fin AS (SELECT * FROM h WHERE hend <= (SELECT max(ts) FROM events)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY hour_start
    ORDER BY total DESC, event_type) AS rk
  FROM fin)
SELECT hour_start, event_type, n, total FROM ranked WHERE rk <= 3
"""


@query("st_topk_windowed_append", ST_TOPK_APPEND_ORACLE)
@_with_stream_shuffle
def st_topk_windowed_append(spark, sf_dir):
    """Hourly top-3 leaderboard with BOUNDED state: watermarked
    tumbling windows in append mode — closed hours emit once and
    their state is evicted, so a forever-stream holds only the open
    hour's (event_type) rows. The per-hour ranking runs as a batch
    query over the emitted sink (ranking is not an incremental
    operator; the sink-then-serve split is the production shape).
    The unfinalized last hour is absent by watermark semantics and
    the oracle encodes that."""
    from pyspark.sql.window import Window

    tune(spark)
    path = f"{sf_dir}/events.parquet"
    schema = _raw_schema(spark, path)
    src = spark.readStream.schema(schema).parquet(
        f"{sf_dir}/events*.parquet"
    )
    ev = src.select(_time_col(schema), "event_type", "value")
    agg = (
        ev.withWatermark("time", "0 seconds")
        .groupBy(F.window("time", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
            "n",
            "total",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("st_topk_app")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink = spark.table("st_topk_app")
    w = Window.partitionBy("hour_start").orderBy(
        F.desc("total"), F.asc("event_type")
    )
    return (
        sink.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("hour_start", "event_type", "n", "total")
    )


def _st_neardup_append_oracle() -> str:
    return f"""
WITH full_result AS ({_st_neardup_oracle()})
SELECT * FROM full_result
WHERE new_id - 1000000 <
      (SELECT 60 * (max(doc_id) // 60) FROM documents)
"""


@query("st_neardup_append", _st_neardup_append_oracle())
@_with_stream_shuffle
def st_neardup_append(spark, sf_dir):
    """Near-dup ingest with BOUNDED state: the same candidate stream
    as st_neardup_stream, but the best-match aggregation keys on a
    watermarked 60-minute window of the deterministic per-document
    event time and runs in APPEND mode — each document's best match
    emits once when its window closes and the state row is evicted.
    On a forever stream the state is one row per document in the
    OPEN window, not one per document ever. The oracle is the batch
    recompute restricted to finalized windows (ids below the last
    closed 60-id boundary)."""
    jac = _neardup_jaccard_stream(spark, sf_dir)
    best = jac.groupBy(F.window("ev", "60 minutes"), "new_id").agg(
        F.max(
            F.struct(
                F.col("jaccard").alias("j"), (-F.col("a")).alias("nega")
            )
        ).alias("b")
    )
    out = best.select(
        "new_id",
        (-F.col("b.nega")).alias("dup_of"),
        F.col("b.j").alias("jaccard"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("st_neardup_app")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_neardup_app")


def _st_semdedup_append_oracle() -> str:
    return f"""
WITH full_result AS ({_st_semdedup_oracle()})
SELECT * FROM full_result
WHERE new_id - 1000000 <
      (SELECT 60 * (max(vec_id) // 60) FROM embeddings)
"""


@query("st_semdedup_append", _st_semdedup_append_oracle())
@_with_stream_shuffle
def st_semdedup_append(spark, sf_dir):
    """Semantic-dedup ingest with BOUNDED state: st_semdedup_stream's
    candidate stream aggregated per watermarked 60-minute window in
    APPEND mode — closed windows emit + evict, so state holds only
    the open window's vectors. Oracle = batch recompute over
    finalized windows."""
    matched = _semdedup_matches_stream(spark, sf_dir)
    best = matched.groupBy(F.window("ev", "60 minutes"), "new_id").agg(
        F.max(
            F.struct(
                F.col("cosine_sim").alias("c"), (-F.col("a")).alias("nega")
            )
        ).alias("b")
    )
    out = best.select(
        "new_id",
        (-F.col("b.nega")).alias("dup_of"),
        F.col("b.c").alias("cosine_sim"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("st_semdedup_app")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st_semdedup_app")


# --------------------------------------------------------------------
# Streaming drift monitor — the batch s_embed_drift as a live check:
# an embedding STREAM (planted +0.5 shift on dimension 5, so there is
# something to catch) aggregated per dimension in complete mode, then
# compared against the STATIC stored-corpus per-dimension means. The
# stream side is one explode + one 64-key aggregation (micro-quantized
# integer sums, map-side combinable); the static side is computed once
# per trigger-free batch read. Oracle = exact batch recompute of the
# same quantized means. drift_flag marks dims whose mean moved by
# more than 0.1 in original units — the alert a pipeline owner pages
# on before training ingests a shifted batch.
# --------------------------------------------------------------------
ST_DRIFT_ORACLE = """
WITH inc AS (
  SELECT vec_id + 1000000 AS new_id, pos,
         CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000)
              AS BIGINT)
         + CASE WHEN pos = 5 THEN 500000 ELSE 0 END AS q
  FROM embeddings,
       unnest(generate_series(1, len(embedding))) AS u(pos)
),
stored AS (
  SELECT pos,
         CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000)
              AS BIGINT) AS q
  FROM embeddings,
       unnest(generate_series(1, len(embedding))) AS u(pos)
),
ia AS (SELECT pos, sum(q) AS qs, count(*) AS n FROM inc GROUP BY pos),
sa AS (SELECT pos, sum(q) AS qs, count(*) AS n FROM stored GROUP BY pos)
SELECT ia.pos,
       CAST(ia.n AS BIGINT) AS n_incoming,
       round(ia.qs / (ia.n * 1000000.0), 6) AS mean_incoming,
       round(sa.qs / (sa.n * 1000000.0), 6) AS mean_stored,
       round(abs(ia.qs / (ia.n * 1000000.0)
                 - sa.qs / (sa.n * 1000000.0)), 6) AS abs_drift,
       CAST(abs(ia.qs / (ia.n * 1000000.0)
                - sa.qs / (sa.n * 1000000.0)) > 0.1 AS INTEGER)
         AS drift_flag
FROM ia JOIN sa ON sa.pos = ia.pos
"""


@query("st_drift_stream", ST_DRIFT_ORACLE)
@_with_stream_shuffle
def st_drift_stream(spark, sf_dir):
    tune(spark)
    path = f"{sf_dir}/embeddings.parquet"
    from ..tables import load as _load

    emb = _load(spark, sf_dir, "embeddings")
    schema = _raw_schema(spark, path)
    q_expr = (
        F.floor(F.col("val").cast("double") * 1000000).cast("long")
        + F.when(F.col("pos") == 5, F.lit(500000))
        .otherwise(F.lit(0))
        .cast("long")
    )
    src = spark.readStream.schema(schema).parquet(
        f"{sf_dir}/embeddings*.parquet"
    )
    inc = (
        src.select(
            (F.col("vec_id") + 1000000).alias("new_id"),
            F.posexplode("embedding").alias("pos0", "val"),
        )
        .select("new_id", (F.col("pos0") + 1).alias("pos"), "val")
        .withColumn("q", q_expr)
        .groupBy("pos")
        .agg(F.sum("q").alias("qs"), F.count(F.lit(1)).alias("n"))
    )
    qy = (
        inc.writeStream.format("memory")
        .queryName("st_drift")
        .outputMode("complete")
        .start()
    )
    try:
        qy.processAllAvailable()
    finally:
        qy.stop()
    ia = spark.table("st_drift")
    sa = (
        emb.select("vec_id", F.posexplode("embedding").alias("pos0", "val"))
        .select(
            (F.col("pos0") + 1).alias("pos"),
            F.floor(F.col("val").cast("double") * 1000000)
            .cast("long")
            .alias("q"),
        )
        .groupBy("pos")
        .agg(F.sum("q").alias("sqs"), F.count(F.lit(1)).alias("sn"))
    )
    mi = F.col("qs") / (F.col("n") * 1000000.0)
    ms = F.col("sqs") / (F.col("sn") * 1000000.0)
    return ia.join(sa, "pos").select(
        "pos",
        F.col("n").cast("long").alias("n_incoming"),
        F.round(mi, 6).alias("mean_incoming"),
        F.round(ms, 6).alias("mean_stored"),
        F.round(F.abs(mi - ms), 6).alias("abs_drift"),
        (F.abs(mi - ms) > 0.1).cast("int").alias("drift_flag"),
    )


# --------------------------------------------------------------------
# Streaming data-contract monitor — o21_contract_checks live on the
# ingest stream: the seven predicate constraints (not-null, max null
# rate, vocabulary, range, non-negative, freshness) counted by ONE
# global streaming aggregate in complete mode, snapshot unpivoted to
# the same ppm pass/fail report. The batch suite's unique-key check is
# deliberately absent here: exact COUNT(DISTINCT) is unsupported in a
# streaming aggregate — the batch query remains the uniqueness
# authority (or a keyed dedup_keep_first_stream feeds a violation
# counter upstream). State is ONE row of counters however large the
# stream — the cheapest possible always-on quality gate.
# --------------------------------------------------------------------
from .datasetops2 import _CONTRACT  # noqa: E402

ST_CONTRACT_ORACLE = (
    "WITH agg AS (SELECT CAST(count(*) AS BIGINT) AS total, "
    + ", ".join(
        f"CAST(count(*) FILTER (WHERE {pred}) AS BIGINT) AS bad_{i}"
        for i, (_, _, pred, _) in enumerate(_CONTRACT)
    )
    + " FROM events) "
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
)


@query("st_contract_stream", ST_CONTRACT_ORACLE)
@_with_stream_shuffle
def st_contract_stream(spark, sf_dir):
    tune(spark)
    path = f"{sf_dir}/events.parquet"
    schema = _raw_schema(spark, path)
    src = spark.readStream.schema(schema).parquet(
        f"{sf_dir}/events*.parquet"
    )
    if isinstance(schema["ts"].dataType, T.LongType):
        src = src.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    aggs = [F.count(F.lit(1)).cast("long").alias("total")]
    for i, (_, _, pred, _) in enumerate(_CONTRACT):
        aggs.append(
            F.count_if(F.expr(pred)).cast("long").alias(f"bad_{i}")
        )
    wide = src.groupBy().agg(*aggs)
    q = (
        wide.writeStream.format("memory")
        .queryName("st_contract")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    snap = spark.table("st_contract")
    rows = [
        F.struct(
            F.lit(chk).alias("chk"),
            F.lit(col).alias("col"),
            F.expr(f"(bad_{i} * 1000000) DIV total").alias(
                "observed_ppm"
            ),
            F.lit(thr).cast("long").alias("threshold_ppm"),
            F.when(
                F.expr(f"(bad_{i} * 1000000) DIV total")
                <= F.lit(thr),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("pass"),
        )
        for i, (chk, col, _, thr) in enumerate(_CONTRACT)
    ]
    return snap.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.chk", "r.col", "r.observed_ppm", "r.threshold_ppm", "r.pass"
    )
