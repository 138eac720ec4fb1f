"""Round-5 curation additions over ``documents``:

- t_boilerplate_spans — C4/FineWeb-style boilerplate measurement: the
  fraction of each document covered by 3-grams that recur across many
  distinct documents (the "repeated spans" filter every web-corpus
  pipeline runs). Pure integer arithmetic (ppm ratios via DIV).
- p_dsir_selection — DSIR-lite importance resampling (Xie et al. 2023,
  arXiv:2302.03169): hashed-unigram bucket counts, add-0.5-smoothed
  target/source log-likelihood ratio per bucket, per-document log
  importance as a position-ordered fold. Bucket weights are computed
  DRIVER-SIDE with CPython's libm (bit-identical to DuckDB's; the
  JVM's Math.log carries no such guarantee), then broadcast.
- report_calibration_bins — reliability-diagram bins for a
  quality-score-style classifier: integer ppm scores, per-bin counts,
  mean score and positive rate, all in BIGINT.
- t_domain_top_ngrams — per-source top-5 bigrams with deterministic
  (count DESC, bigram ASC) tie-breaks, the corpus-stats roll-up used
  to spot domain-specific boilerplate and contamination.

Reference anchor: these extend the reference's per-network summary
reporting (qaqc_generate_flag_rates.py:140-264 aggregates flag
frequencies by station/network the same count→ratio→report way)
to the LLM-corpus domain.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ..functions.textfns import tokens
from ..registry import query
from .common import table
from .textops import NORM, TOKS

# ------------------------------------------------------------------ #
# shared prep
# ------------------------------------------------------------------ #
_STOPS = ("the", "a", "of", "and", "to", "in", "is", "it")
_BOILER_MIN_DOCS = 20  # a 3-gram seen in >= this many distinct docs


# ------------------------------------------------------------------ #
# t_boilerplate_spans
# ------------------------------------------------------------------ #
T_BOILER_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {TOKS} AS t FROM documents
  WHERE text IS NOT NULL AND len({TOKS}) >= 3
),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
  FROM d
),
b AS (
  SELECT gram FROM g GROUP BY gram
  HAVING count(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
),
per AS (
  SELECT g.doc_id,
         count(*) AS n_grams,
         count(b.gram) AS n_boiler
  FROM g LEFT JOIN b USING (gram)
  GROUP BY g.doc_id
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_boiler AS BIGINT) AS n_boiler,
       CAST(n_boiler * 1000000 // n_grams AS BIGINT) AS boiler_ppm
FROM per
"""


@query("t_boilerplate_spans", T_BOILER_ORACLE)
def t_boilerplate_spans(spark, sf_dir):
    """Repeated-span (boilerplate) coverage per document: 3-grams
    occurring in >= 20 distinct documents are 'boilerplate'; emit each
    doc's gram count, boilerplate-gram count, and ppm coverage.
    Scale shape: one explode -> gram-keyed count-distinct (the
    inverted index), one gram-keyed join back — both shuffle on the
    gram key; nothing is doc-pairwise."""
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .where(F.size("t") >= 3)
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("t", i),
                    F.element_at("t", i + 1),
                    F.element_at("t", i + 2),
                ),
            )
        ).alias("gram"),
    )
    boiler = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= _BOILER_MIN_DOCS)
        .select("gram", F.lit(True).alias("is_boiler"))
    )
    per = (
        grams.join(boiler, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("is_boiler").alias("n_boiler"),
        )
    )
    return per.select(
        "doc_id",
        "n_grams",
        "n_boiler",
        F.expr("n_boiler * 1000000 DIV n_grams").alias("boiler_ppm"),
    )


# ------------------------------------------------------------------ #
# p_dsir_selection
# ------------------------------------------------------------------ #
_DSIR_B = 256  # hashed-unigram buckets = first md5 byte

_DSIR_BUCKET_SQL = (
    "((instr('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(w), 2, 1)) - 1))"
)


def _dsir_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, lang, {TOKS} AS t FROM documents
  WHERE text IS NOT NULL AND len({TOKS}) >= 1
),
tok AS (
  SELECT doc_id, lang, unnest(t) AS w,
         unnest(range(1, len(t) + 1)) AS pos
  FROM d
),
tk AS (SELECT doc_id, lang, pos, {_DSIR_BUCKET_SQL} AS b FROM tok),
tb AS (
  SELECT b,
         count(*) FILTER (WHERE lang = 'en') AS tcnt,
         count(*) AS scnt
  FROM tk GROUP BY b
),
tot AS (SELECT sum(tcnt) AS tt, sum(scnt) AS ss FROM tb),
lw AS (
  SELECT b, ln(((tcnt + 0.5e0) / (tt + 128.0e0))
               / ((scnt + 0.5e0) / (ss + 128.0e0))) AS lwb
  FROM tb, tot
),
pl AS (
  SELECT tk.doc_id, tk.lang,
         list_reduce(list(lw.lwb ORDER BY tk.pos), (a, x) -> a + x)
           AS log_importance
  FROM tk JOIN lw ON lw.b = tk.b
  GROUP BY tk.doc_id, tk.lang
)
SELECT doc_id, lang, log_importance,
       log_importance > 0.0e0 AS selected
FROM pl
"""


@query("p_dsir_selection", _dsir_oracle())
def p_dsir_selection(spark, sf_dir):
    """DSIR-lite data selection: per-document log importance weight
    log p_target/p_source under hashed-unigram (256-bucket) models,
    target = lang='en'. The 256 bucket weights are computed on the
    DRIVER with CPython libm ln (bit-identical to DuckDB's; JVM
    Math.log is not guaranteed to be) and broadcast; the per-doc
    score is a position-ordered float fold so both engines add in the
    same order. Scale shape: one explode, one 256-row broadcast join,
    one per-doc sort-fold — token-linear, never doc-pairwise."""
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "lang", tokens(F.col("text")).alias("t"))
        .where(F.size("t") >= 1)
    )
    tk = docs.select(
        "doc_id",
        "lang",
        F.posexplode("t").alias("pos0", "w"),
    ).select(
        "doc_id",
        "lang",
        (F.col("pos0") + 1).alias("pos"),
        F.conv(F.substring(F.md5("w"), 1, 2), 16, 10)
        .cast("long")
        .alias("b"),
        # read twice: the driver-side bucket-weight fold and the
        # per-doc scoring join — one explode+md5 pass, not two
    ).localCheckpoint(eager=False)
    tb = (
        tk.groupBy("b")
        .agg(
            F.count_if(F.col("lang") == "en").alias("tcnt"),
            F.count(F.lit(1)).alias("scnt"),
        )
        .collect()
    )
    tt = sum(r["tcnt"] for r in tb)
    ss = sum(r["scnt"] for r in tb)
    lw = [
        (
            int(r["b"]),
            math.log(
                ((r["tcnt"] + 0.5) / (tt + 128.0))
                / ((r["scnt"] + 0.5) / (ss + 128.0))
            ),
        )
        for r in tb
    ]
    lw_df = spark.createDataFrame(lw, "b long, lwb double")
    pl = (
        tk.join(F.broadcast(lw_df), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "lwb"))
                    ),
                    lambda s: s["lwb"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("log_importance")
        )
    )
    return pl.select(
        "doc_id",
        "lang",
        "log_importance",
        (F.col("log_importance") > 0.0).alias("selected"),
    )


# ------------------------------------------------------------------ #
# report_calibration_bins
# ------------------------------------------------------------------ #
_STOP_SQL = "('" + "','".join(_STOPS) + "')"

CALIB_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, {TOKS} AS t FROM documents
  WHERE text IS NOT NULL AND len({TOKS}) >= 1
),
s AS (
  SELECT doc_id, (lang = 'en') AS pos,
         CAST(len(list_filter(t, w -> w IN {_STOP_SQL})) * 1000000
              // len(t) AS BIGINT) AS p_ppm
  FROM d
),
b AS (SELECT least(p_ppm // 100000, 9) AS bin, pos, p_ppm FROM s)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
       CAST(sum(p_ppm) // count(*) AS BIGINT) AS mean_p_ppm,
       CAST(count(*) FILTER (WHERE pos) * 1000000 // count(*) AS BIGINT)
         AS pos_rate_ppm
FROM b GROUP BY bin
"""


@query("report_calibration_bins", CALIB_ORACLE)
def report_calibration_bins(spark, sf_dir):
    """Reliability diagram for a stopword-density 'quality score'
    against the lang='en' label: 10 score bins, per-bin volume, mean
    score and empirical positive rate — the calibration check run on
    every quality classifier before its threshold is trusted. All
    arithmetic is integer ppm (DIV), so the bins are exact."""
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "lang", tokens(F.col("text")).alias("t"))
        .where(F.size("t") >= 1)
    )
    stops = F.array(*[F.lit(s) for s in _STOPS])
    s = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("pos"),
        F.expr(
            "size(filter(t, w -> array_contains("
            + "array("
            + ",".join(f"'{w}'" for w in _STOPS)
            + "), w))) * 1000000 DIV size(t)"
        ).alias("p_ppm"),
    )
    b = s.select(
        F.least(F.expr("p_ppm DIV 100000"), F.lit(9)).alias("bin"),
        "pos",
        "p_ppm",
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if("pos").alias("n_pos"),
        F.expr("sum(p_ppm) DIV count(1)").alias("mean_p_ppm"),
        F.expr("count_if(pos) * 1000000 DIV count(1)").alias(
            "pos_rate_ppm"
        ),
    )


# ------------------------------------------------------------------ #
# t_domain_top_ngrams
# ------------------------------------------------------------------ #
TOPNG_ORACLE = f"""
WITH d AS (
  SELECT source, {TOKS} AS t FROM documents
  WHERE text IS NOT NULL AND len({TOKS}) >= 2
),
g AS (
  SELECT source,
         unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM d
),
c AS (SELECT source, bigram, count(*) AS cnt FROM g GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY cnt DESC, bigram ASC) AS rank
  FROM c
)
SELECT source, bigram, CAST(cnt AS BIGINT) AS cnt,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
"""


@query("t_domain_top_ngrams", TOPNG_ORACLE)
def t_domain_top_ngrams(spark, sf_dir):
    """Per-source top-5 bigrams (count DESC, bigram ASC): the corpus
    roll-up used to eyeball domain boilerplate. One explode + one
    (source, bigram) count + one per-source top-k window — map-side
    combine does the heavy lifting; the window input is the distinct
    bigram table, not the corpus."""
    from pyspark.sql.window import Window

    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("source", tokens(F.col("text")).alias("t"))
        .where(F.size("t") >= 2)
    )
    g = docs.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("bigram"),
    )
    c = g.groupBy("source", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("source").orderBy(
        F.desc("cnt"), F.asc("bigram")
    )
    return (
        c.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("source", "bigram", "cnt", F.col("rank").cast("long").alias("rank"))
    )


# ------------------------------------------------------------------ #
# m_audio_vad_segments — energy-threshold VAD over really-parsed PCM
# ------------------------------------------------------------------ #
import struct as _struct  # noqa: E402

from .qaqc_parity import _hexbyte  # noqa: E402

_VAD_DATA_BYTES = 64  # 4 chained md5s -> 32 int16 samples -> 8 frames
_VAD_HDR_HEX = (
    b"RIFF"
    + _struct.pack("<I", 36 + _VAD_DATA_BYTES)
    + b"WAVE"
    + b"fmt "
    + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    + b"data"
    + _struct.pack("<I", _VAD_DATA_BYTES)
).hex()
_VAD_THRESHOLD = 1_200_000_000  # ~0.28x the 4-sample max energy


def _vad_oracle() -> str:
    # sample k (1-based, 1..32) = LE int16 from hex bytes (2k-1, 2k)
    def sample(k: int) -> str:
        u = f"({_hexbyte('hx', 2 * k - 1)} + 256 * {_hexbyte('hx', 2 * k)})"
        return f"(CASE WHEN {u} >= 32768 THEN {u} - 65536 ELSE {u} END)"

    frame_es = []
    for f in range(1, 9):
        terms = " + ".join(
            f"({sample(4 * (f - 1) + j)} * {sample(4 * (f - 1) + j)})"
            for j in range(1, 5)
        )
        frame_es.append(f"CAST({terms} AS BIGINT)")
    e_list = "[" + ", ".join(frame_es) + "]"
    return f"""
WITH src AS (
  SELECT doc_id AS media_id,
         md5(text) || md5(text || '1') || md5(text || '2')
           || md5(text || '3') AS hx
  FROM documents WHERE text IS NOT NULL
),
fr AS (
  SELECT media_id,
         unnest({e_list}) AS e,
         unnest(range(1, 9)) AS fi
  FROM src
),
a AS (
  SELECT media_id, fi, (e > {_VAD_THRESHOLD}) AS act,
         CASE WHEN e > {_VAD_THRESHOLD}
                   AND NOT coalesce(lag(e > {_VAD_THRESHOLD})
                     OVER (PARTITION BY media_id ORDER BY fi), FALSE)
              THEN 1 ELSE 0 END AS is_start
  FROM fr
),
g AS (
  SELECT *, sum(is_start) OVER (PARTITION BY media_id ORDER BY fi) AS grp
  FROM a
),
runs AS (
  SELECT media_id, grp, count(*) AS len FROM g WHERE act
  GROUP BY media_id, grp
),
agg AS (
  SELECT media_id,
         CAST(count(*) AS INTEGER) AS n_frames,
         CAST(count(*) FILTER (WHERE act) AS INTEGER) AS n_active,
         CAST(sum(is_start) AS INTEGER) AS n_segments,
         CAST(coalesce(min(CASE WHEN act THEN fi END), 0) AS INTEGER)
           AS first_active
  FROM a GROUP BY media_id
)
SELECT agg.media_id, agg.n_frames, agg.n_active, agg.n_segments,
       CAST(coalesce(max(runs.len), 0) AS INTEGER) AS longest_run,
       agg.first_active
FROM agg LEFT JOIN runs ON runs.media_id = agg.media_id
GROUP BY agg.media_id, agg.n_frames, agg.n_active, agg.n_segments,
         agg.first_active
"""


@query("m_audio_vad_segments", _vad_oracle())
def m_audio_vad_segments(spark, sf_dir):
    """Voice-activity segmentation over genuinely PARSED RIFF/WAVE
    clips (32 int16 samples synthesized from chained md5s): 4-sample
    frame energies, threshold gate, run-length segments — every number
    integer-exact and recomputed by the oracle from the same md5
    bytes. Map-only; audio bytes never shuffle."""
    from ..operators import multimodal as MM

    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.unhex(F.lit(_VAD_HDR_HEX)),
            F.unhex(F.md5("text")),
            F.unhex(F.md5(F.concat(F.col("text"), F.lit("1")))),
            F.unhex(F.md5(F.concat(F.col("text"), F.lit("2")))),
            F.unhex(F.md5(F.concat(F.col("text"), F.lit("3")))),
        ).alias("content"),
    )
    return MM.wav_vad_segments(
        media, frame_len=4, energy_threshold=_VAD_THRESHOLD
    )


# ------------------------------------------------------------------ #
# s_rrf_fusion — reciprocal-rank fusion of cosine and inner-product
# retrieval (Cormack et al., SIGIR'09): the standard way to combine
# heterogeneous rankers without score calibration.
# ------------------------------------------------------------------ #
_RRF_K = 60
_RRF_TOPK = 10

_RRF_DOT = (
    "list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)),"
    " list_transform({b}, x -> CAST(x AS DOUBLE)))"
)


def _rrf_oracle() -> str:
    dot_qc = _RRF_DOT.format(a="q.qe", b="c.embedding")
    dot_qq = _RRF_DOT.format(a="q.qe", b="q.qe")
    dot_cc = _RRF_DOT.format(a="c.embedding", b="c.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({dot_qc} / (sqrt({dot_qq}) * sqrt({dot_cc})), 6) AS cs,
         round({dot_qc}, 6) AS ip
  FROM embeddings c, q WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cs DESC, neighbor_id) AS r_cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ip DESC, neighbor_id) AS r_ip
  FROM scored
),
fused AS (
  SELECT query_id, neighbor_id, r_cos, r_ip,
         1.0e0 / ({_RRF_K} + r_cos) + 1.0e0 / ({_RRF_K} + r_ip) AS rrf
  FROM ranked
)
SELECT query_id, neighbor_id,
       CAST(r_cos AS INTEGER) AS r_cos, CAST(r_ip AS INTEGER) AS r_ip,
       rrf, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, neighbor_id) AS rank
  FROM fused
) WHERE rank <= {_RRF_TOPK}
"""


@query("s_rrf_fusion", _rrf_oracle())
def s_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of the exact cosine ranking and the
    exact inner-product (MIPS) ranking: rrf = 1/(60+r_cos) +
    1/(60+r_ip), top-10 per query with deterministic tie-breaks.
    The float rrf is a fixed two-term function of integer ranks, so it
    is bit-identical across engines. ONE corpus x queries scoring pass
    computes both scores; the two rankings are windows over the same
    scored table — no second scan, no second shuffle (both windows
    share the query_id partitioning)."""
    from pyspark.sql.window import Window

    from ..operators.similarity import as_double_array, dot, norm

    emb = table(spark, sf_dir, "embeddings")
    q = (
        emb.where(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            as_double_array("embedding").alias("__qv"),
        )
        .withColumn("__qn", norm(F.col("__qv")))
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_array("embedding").alias("__cv"),
    ).withColumn("__cn", norm(F.col("__cv")))
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("__qv"), F.col("__cv"))
            / (F.col("__qn") * F.col("__cn")),
            6,
        ).alias("cs"),
        F.round(dot(F.col("__qv"), F.col("__cv")), 6).alias("ip"),
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cs"), F.asc("neighbor_id")
    )
    w_ip = Window.partitionBy("query_id").orderBy(
        F.desc("ip"), F.asc("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w_cos).alias("r_cos"),
        F.row_number().over(w_ip).alias("r_ip"),
    )
    fused = ranked.withColumn(
        "rrf",
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_cos"))
        + F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_ip")),
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .where(F.col("rank") <= _RRF_TOPK)
        .select(
            "query_id",
            "neighbor_id",
            F.col("r_cos").cast("int").alias("r_cos"),
            F.col("r_ip").cast("int").alias("r_ip"),
            "rrf",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ------------------------------------------------------------------ #
# m_image_resize_hash — decode -> nearest-neighbor downsample ->
# re-hash, on really-decoded pixels (the thumbnail dedup key an image
# pipeline computes before expensive perceptual hashing).
# ------------------------------------------------------------------ #
_PPM4_HDR_HEX = b"P6\n4 4\n255\n".hex()


def _resize_oracle() -> str:
    # NN downsample 4x4 -> 2x2 keeps pixels (0,0) (0,2) (2,0) (2,2):
    # flat index p = 4r + c, pixel bytes 3p+1..3p+3, hex chars 6p+1..6p+6
    parts = " || ".join(
        f"substr(hx, {6 * p + 1}, 6)" for p in (0, 2, 8, 10)
    )
    lumas = []
    for p in (0, 2, 8, 10):
        r_ = _hexbyte("hx", 3 * p + 1)
        g_ = _hexbyte("hx", 3 * p + 2)
        b_ = _hexbyte("hx", 3 * p + 3)
        lumas.append(f"(299 * {r_} + 587 * {g_} + 114 * {b_})")
    luma_sum = " + ".join(lumas)
    return f"""
WITH src AS (
  SELECT doc_id AS media_id,
         md5(text) || md5(text || '1') || md5(text || '2') AS hx
  FROM documents WHERE text IS NOT NULL
)
SELECT media_id,
       md5({parts}) AS resized_md5,
       CAST({luma_sum} AS BIGINT) AS luma_sum
FROM src
"""


@query("m_image_resize_hash", _resize_oracle())
def m_image_resize_hash(spark, sf_dir):
    """Thumbnail fingerprint: REAL PPM decode (4x4 from three chained
    md5s), nearest-neighbor 2x downsample (arr[::2, ::2]), md5 of the
    resized 12-byte RGB buffer + integer Rec.601 luma sum. The oracle
    reassembles the identical 12 bytes from the same md5 hex and
    rehashes — the decode + resize arithmetic is pinned bit-for-bit.
    Map-only; pixels never shuffle."""
    import hashlib as _hl

    from ..operators import multimodal as MM

    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.unhex(F.lit(_PPM4_HDR_HEX)),
            F.unhex(F.md5("text")),
            F.unhex(F.md5(F.concat(F.col("text"), F.lit("1")))),
            F.unhex(F.md5(F.concat(F.col("text"), F.lit("2")))),
        ).alias("content"),
    )
    dec = MM.PpmBmpDecoder()

    def op(batches):
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "resized_md5": [], "luma_sum": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    d = dec._decode_one(bytes(content))
                except Exception:
                    d = None
                if d is None:
                    continue
                w, h, arr = d
                if w < 4 or h < 4:
                    continue
                small = arr[::2, ::2, :]
                buf = small.tobytes()
                luma = int(
                    (
                        299 * small[:, :, 0].astype("int64")
                        + 587 * small[:, :, 1].astype("int64")
                        + 114 * small[:, :, 2].astype("int64")
                    ).sum()
                )
                out["media_id"].append(mid)
                out["resized_md5"].append(
                    _hl.md5(buf.hex().encode()).hexdigest()
                )
                out["luma_sum"].append(luma)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        op, "media_id long, resized_md5 string, luma_sum long"
    )


# ------------------------------------------------------------------ #
# p_dp_counts — deterministic-noise differential-privacy release of
# per-source document counts (Laplace mechanism, eps = 1, noise drawn
# from md5-seeded inverse-CDF so both engines compute the same value).
# ------------------------------------------------------------------ #
_DP_EPS = 1.0


def _dp_u_sql() -> str:
    """uniform in [0,1): ((first 4 md5 bytes as uint32) + 0.5) / 2^32,
    seeded by source || ':dp1'."""
    h = "md5(source || ':dp1')"
    b = [
        f"(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"
        for i in range(1, 9)
    ]
    v = (
        f"((({b[0]} * 16 + {b[1]}) * 16777216) + (({b[2]} * 16 + {b[3]})"
        f" * 65536) + (({b[4]} * 16 + {b[5]}) * 256)"
        f" + ({b[6]} * 16 + {b[7]}))"
    )
    return f"(({v} + 0.5e0) / 4294967296.0e0)"


DP_ORACLE = f"""
WITH c AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
),
u AS (
  SELECT source, n, {_dp_u_sql()} - 0.5e0 AS uc FROM c
)
SELECT source, CAST(n AS BIGINT) AS n,
       n + (CASE WHEN uc < 0 THEN 1.0e0 ELSE -1.0e0 END
            * ln(1.0e0 - 2.0e0 * abs(uc)) / {_DP_EPS!r}) AS dp_n,
       greatest(n + (CASE WHEN uc < 0 THEN 1.0e0 ELSE -1.0e0 END
            * ln(1.0e0 - 2.0e0 * abs(uc)) / {_DP_EPS!r}), 0.0e0)
         AS dp_n_clipped
FROM u
"""


@query("p_dp_counts", DP_ORACLE)
def p_dp_counts(spark, sf_dir):
    """Laplace-mechanism count release per source (eps=1) with
    DETERMINISTIC md5-seeded noise: u = (first-4-md5-bytes + 0.5)/2^32,
    noise = sign * ln(1 - 2|u - 0.5|) (inverse CDF). The noise is
    computed DRIVER-SIDE per source (dimension-sized) with CPython
    libm ln — bit-identical to the oracle's. The release pattern every
    privacy-reviewed stats endpoint uses; deterministic seeding makes
    it testable."""
    import hashlib as _hl

    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    rows = []
    for r in counts:
        src, n = r["source"], int(r["n"])
        v = int(_hl.md5(f"{src}:dp1".encode()).hexdigest()[:8], 16)
        uc = (v + 0.5) / 4294967296.0 - 0.5
        sign = 1.0 if uc < 0 else -1.0
        noise = sign * math.log(1.0 - 2.0 * abs(uc)) / _DP_EPS
        dp_n = n + noise
        rows.append((src, n, dp_n, max(dp_n, 0.0)))
    return spark.createDataFrame(
        rows, "source string, n long, dp_n double, dp_n_clipped double"
    )


# ------------------------------------------------------------------ #
# d_lsh_band_planner — the design harness behind every MinHash-LSH
# deployment: for each banding of 32 hashes, the collision probability
# curve p(J) = 1 - (1 - J^r)^b over a Jaccard grid, plus the curve's
# threshold (the J where p crosses 1/2). Lets an operator pick bands
# for a target similarity cutoff BEFORE running the corpus job.
# ------------------------------------------------------------------ #
_PLAN_N_HASHES = 32
_PLAN_BANDS = (1, 2, 4, 8, 16, 32)


def _planner_oracle() -> str:
    rows = []
    for b in _PLAN_BANDS:
        r = _PLAN_N_HASHES // b
        for jt in range(1, 10):
            rows.append(
                f"SELECT {b} AS bands, {r} AS rows_per_band,"
                f" {jt} AS j_tenths,"
                f" power(1.0e0 - power({jt} * 0.1e0, {float(r)!r}),"
                f" {float(b)!r}) AS p_miss"
            )
    unioned = " UNION ALL ".join(rows)
    return f"""
SELECT CAST(bands AS INTEGER) AS bands,
       CAST(rows_per_band AS INTEGER) AS rows_per_band,
       CAST(j_tenths AS INTEGER) AS j_tenths,
       1.0e0 - p_miss AS p_collide
FROM ({unioned})
"""


@query("d_lsh_band_planner", _planner_oracle())
def d_lsh_band_planner(spark, sf_dir):
    """Analytic LSH banding curves p(J) = 1 - (1 - J^r)^b for every
    banding of 32 minhashes over J in 0.1..0.9 — computed driver-side
    with CPython libm pow (verified bit-identical to DuckDB power).
    Pure planning table (54 rows); pairs with d_lsh_recall, which
    MEASURES the curve the planner predicts."""
    rows = []
    for b in _PLAN_BANDS:
        r = _PLAN_N_HASHES // b
        for jt in range(1, 10):
            p_miss = math.pow(
                1.0 - math.pow(jt * 0.1, float(r)), float(b)
            )
            rows.append((b, r, jt, 1.0 - p_miss))
    return spark.createDataFrame(
        rows,
        "bands int, rows_per_band int, j_tenths int, p_collide double",
    )


# ------------------------------------------------------------------ #
# o24_schema_drift — snapshot-over-snapshot column health: null-rate
# drift per column between the "old" (even event_id) and "new" (odd)
# halves of events — the data-contract monitor that catches a
# upstream schema/quality change before it poisons training data.
# ------------------------------------------------------------------ #
_DRIFT_COLS = ("ts", "user_id", "event_type", "value", "props")

def _o24_oracle() -> str:
    legs = []
    for c in _DRIFT_COLS:
        legs.append(
            f"SELECT snap, '{c}' AS col, sum(n_{c}) AS nulls,"
            " count(*) AS n_rows FROM halves GROUP BY snap"
        )
    unioned = " UNION ALL ".join(legs)
    nulls_cols = ",\n".join(
        f"         CASE WHEN {c} IS NULL THEN 1 ELSE 0 END AS n_{c}"
        for c in _DRIFT_COLS
    )
    return f"""
WITH halves AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN 'old' ELSE 'new' END AS snap,
{nulls_cols}
  FROM events
),
per AS ({unioned}),
w AS (
  SELECT col,
    max(CASE WHEN snap = 'old' THEN nulls END) AS old_nulls,
    max(CASE WHEN snap = 'old' THEN n_rows END) AS old_rows,
    max(CASE WHEN snap = 'new' THEN nulls END) AS new_nulls,
    max(CASE WHEN snap = 'new' THEN n_rows END) AS new_rows
  FROM per GROUP BY col
)
SELECT col,
  CAST(old_nulls AS BIGINT) AS old_nulls,
  CAST(old_rows AS BIGINT) AS old_rows,
  CAST(new_nulls AS BIGINT) AS new_nulls,
  CAST(new_rows AS BIGINT) AS new_rows,
  CAST(old_nulls * 1000000 // old_rows AS BIGINT) AS old_null_ppm,
  CAST(new_nulls * 1000000 // new_rows AS BIGINT) AS new_null_ppm,
  CAST(new_nulls * 1000000 // new_rows
       - old_nulls * 1000000 // old_rows AS BIGINT) AS drift_ppm
FROM w
"""


O24_ORACLE = _o24_oracle()


@query("o24_schema_drift", O24_ORACLE)
def o24_schema_drift(spark, sf_dir):
    """Null-rate drift per column between consecutive snapshots (even
    vs odd event_id halves stand in for yesterday/today): exact ppm
    null rates and their delta. ONE pass: per-row 0/1 null indicators
    fold in a single grouped sum (map-side combinable), then the tiny
    per-column table pivots old vs new — the unpivot-then-two-stage
    shape o13_table_profile proved 3x faster than EXPAND."""
    ev = table(spark, sf_dir, "events")
    snap = F.when(
        F.col("event_id") % 2 == 0, F.lit("old")
    ).otherwise(F.lit("new"))
    aggd = ev.select(
        snap.alias("snap"),
        *[
            F.when(F.col(c).isNull(), 1).otherwise(0).alias(f"n_{c}")
            for c in _DRIFT_COLS
        ],
    ).groupBy("snap").agg(
        *[F.sum(f"n_{c}").alias(f"n_{c}") for c in _DRIFT_COLS],
        F.count(F.lit(1)).alias("n_rows"),
    )
    per = aggd.unpivot(
        ["snap", "n_rows"],
        [f"n_{c}" for c in _DRIFT_COLS],
        "ncol",
        "nulls",
    ).select(
        "snap",
        F.expr("substring(ncol, 3)").alias("col"),
        "nulls",
        "n_rows",
    )
    w = per.groupBy("col").agg(
        F.max(F.when(F.col("snap") == "old", F.col("nulls"))).alias("old_nulls"),
        F.max(F.when(F.col("snap") == "old", F.col("n_rows"))).alias("old_rows"),
        F.max(F.when(F.col("snap") == "new", F.col("nulls"))).alias("new_nulls"),
        F.max(F.when(F.col("snap") == "new", F.col("n_rows"))).alias("new_rows"),
    )
    return w.select(
        "col",
        "old_nulls",
        "old_rows",
        "new_nulls",
        "new_rows",
        F.expr("old_nulls * 1000000 DIV old_rows").alias("old_null_ppm"),
        F.expr("new_nulls * 1000000 DIV new_rows").alias("new_null_ppm"),
        F.expr(
            "new_nulls * 1000000 DIV new_rows"
            " - old_nulls * 1000000 DIV old_rows"
        ).alias("drift_ppm"),
    )


# ------------------------------------------------------------------ #
# t_bpe_train_encode — a REAL byte-pair-encoding trainer + encoder,
# fully relational and oracle-checked. Symbols start as the document's
# words; each of 8 rounds finds the corpus-wide most frequent adjacent
# symbol pair (count DESC, pair ASC tie-break) and merges every
# non-overlapping left-to-right occurrence — the exact BPE training
# loop (Sennrich et al. 2016), at word granularity so the synthetic
# corpus yields meaningful merges.
#
# Determinism spine: symbol sequences are rendered as '<tok><tok>...'
# strings, so one string replace('<x><y>', '<xy>') IS the BPE merge
# with exact token boundaries (both engines' replace() is leftmost
# non-overlapping); pair counts are integers; the round's winner is a
# scalar subquery in the oracle and a collected 1-row driver action in
# Spark (the coreset pattern). Scale shape: per round one corpus scan
# for pair counts (explode -> count, map-side combinable) + one
# map-only rewrite; rounds are a fixed constant.
# ------------------------------------------------------------------ #
_BPE_ROUNDS = 8


def _bpe_corpus_sql() -> str:
    return (
        "SELECT doc_id, '<' || array_to_string({toks}, '><') || '>' AS s"
        " FROM documents WHERE text IS NOT NULL AND len({toks}) >= 1"
    ).format(toks=TOKS)


def _bpe_oracle(rounds: int = _BPE_ROUNDS) -> str:
    parts = [f"c0 AS MATERIALIZED ({_bpe_corpus_sql()})"]
    for r in range(1, rounds + 1):
        prev = f"c{r - 1}"
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT '<' || l[i] || '><' || l[i + 1] || '>' AS pair, count(*) AS cnt
  FROM (
    SELECT string_split(substr(s, 2, length(s) - 2), '><') AS l
    FROM {prev}
  ), unnest(range(1, len(l))) AS t(i)
  GROUP BY 1
),
m{r} AS MATERIALIZED (
  SELECT pair FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1
),
c{r} AS MATERIALIZED (
  SELECT doc_id,
         replace(s, coalesce((SELECT pair FROM m{r}), chr(1)),
                 coalesce('<' || replace(replace(
                            (SELECT pair FROM m{r}), '><', ''),
                          '<', ''), chr(1))
                 ) AS s
  FROM {prev}
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT doc_id,
       CAST(len(string_split(s, '><')) AS BIGINT) AS n_symbols,
       md5(s) AS encoded_md5
FROM c{rounds}
"""
    )


# truncate lineage every this many merge rounds: the persist rotation
# below bounds STORAGE at O(1) in rounds, but the logical plan still
# gains one replace() node per round — at production merge counts
# (10k+) Catalyst analysis would go quadratic without periodic cuts.
# 8-round default never hits this, so the registered pairing is
# unaffected.
_BPE_TRUNC_EVERY = 64


@query("t_bpe_train_encode", _bpe_oracle())
def t_bpe_train_encode(spark, sf_dir, rounds: int = _BPE_ROUNDS):
    """Train ``rounds`` BPE merges on the corpus and encode every
    document with them; emit the post-merge symbol count and a
    fingerprint of the encoded sequence. Each round: one integer
    pair-count aggregation (the winner collected driver-side, 1 row),
    one map-only string rewrite. The oracle unrolls the same rounds
    with scalar-subquery winners — training AND encoding are
    hash-checked end-to-end.

    Storage discipline (the p_coreset_kcenter rotation, r5 brief #4):
    round r's count job materializes the persisted round-r corpus,
    after which round r-1's blocks are freed — live storage is at most
    TWO corpus copies at any merge count, not one per round (the lazy
    localCheckpoint chain this replaces held every round's blocks;
    tests/test_hardening_r6.py asserts the bound). The final encode
    releases the last cache too and recomputes as one map-only chain —
    scan + ``rounds`` string replaces — when collected."""
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .where(F.size("t") >= 1)
        .select(
            "doc_id",
            F.concat(
                F.lit("<"), F.array_join("t", "><"), F.lit(">")
            ).alias("s"),
        )
    )
    # each round: split ONCE per row (zip_with over shifted slices —
    # re-splitting per element made the pair scan O(len^2) per doc);
    # the persist on the round's input keeps the count job and the
    # next rewrite from re-executing rounds 1..r-1 (measured
    # 47 s -> ~4 s at sf0.1 vs no reuse at all)
    pair_expr = F.expr(
        "zip_with(slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1),"
        " (x, y) -> concat('<', x, '><', y, '>'))"
    )
    cur = docs
    cached = None  # the one materialized round held for reuse
    since_trunc = 0
    for _ in range(rounds):
        nxt = cur.persist()
        sp = nxt.select(
            F.split(
                F.expr("substring(s, 2, length(s) - 2)"), "><"
            ).alias("l")
        ).where(F.size("l") >= 2)
        best = (
            sp.select(F.explode(pair_expr).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        # the collect above materialized nxt — the previous round's
        # blocks are now safe to free (rotation keeps live sets <= 2)
        if cached is not None:
            cached.unpersist()
        cached = nxt
        since_trunc += 1
        if not best:
            break
        pair = best[0]["pair"]
        merged = "<" + pair.replace("><", "").replace("<", "").replace(">", "") + ">"
        base = nxt
        if since_trunc >= _BPE_TRUNC_EVERY:
            # eager cut: materializes NOW, so the cache behind it can
            # drop and the logical plan restarts from a leaf
            base = nxt.localCheckpoint(eager=True)
            cached.unpersist()
            cached = None
            since_trunc = 0
        cur = base.select(
            "doc_id", F.replace(F.col("s"), F.lit(pair), F.lit(merged)).alias("s")
        )
    out = cur.select(
        "doc_id",
        F.size(F.split("s", "><")).cast("long").alias("n_symbols"),
        F.md5("s").alias("encoded_md5"),
    )
    if cached is not None:
        cached.unpersist()
    return out


# ------------------------------------------------------------------ #
# a31_gini_revenue — Gini coefficient of per-customer revenue, the
# concentration statistic behind "how skewed is this domain/source"
# curation decisions. Exact integer spine: revenue in cents, ranks by
# (cents, custkey), Gini = (2*Sum(i*x_i) - (n+1)*Sum(x_i)) / (n*Sum(x_i))
# emitted as exact BIGINT numerator/denominator plus their one-float-
# division ratio. Ties in cents leave Sum(i*x_i) invariant, so the
# rank tie-break never matters.
# ------------------------------------------------------------------ #
A31_ORACLE = """
WITH rev AS (
  SELECT o.o_custkey AS cust,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, cust) AS i
  FROM rev
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(2 * sum(i * cents) - (count(*) + 1) * sum(cents)
            AS BIGINT) AS gini_num,
       CAST(count(*) * sum(cents) AS BIGINT) AS gini_den,
       CAST(2 * sum(i * cents) - (count(*) + 1) * sum(cents) AS DOUBLE)
         / (count(*) * sum(cents)) AS gini
FROM r
"""


@query("a31_gini_revenue", A31_ORACLE)
def a31_gini_revenue(spark, sf_dir):
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rev = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    # Global ascending rank WITHOUT a single-partition window (the
    # a27 replaces-global-sort pattern): range-partition by the total
    # key, rank locally per partition (parallel windows), then add
    # driver-computed partition offsets (32 rows). Range boundaries
    # are sampled (nondeterministic sizes) but local-rank + offset is
    # the exact global rank for ANY boundaries since the key order is
    # total.
    rp = (
        rev.repartitionByRange(32, F.col("cents"), F.col("cust"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # pid must not be recomputed
    )
    loc = rp.withColumn(
        "lr",
        F.row_number().over(
            Window.partitionBy("pid").orderBy("cents", "cust")
        ),
    )
    sizes = {
        int(x["pid"]): int(x["c"])
        for x in rp.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    off, acc = {}, 0
    for p in sorted(sizes):
        off[p] = acc
        acc += sizes[p]
    off_df = spark.createDataFrame(
        sorted(off.items()), "pid int, off long"
    )
    r = loc.join(F.broadcast(off_df), "pid").select(
        "cents", (F.col("off") + F.col("lr")).alias("i")
    )
    agg = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("six"),
        F.sum("cents").cast("long").alias("sx"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        (F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("sx"))
        .cast("long")
        .alias("gini_num"),
        (F.col("n") * F.col("sx")).cast("long").alias("gini_den"),
        (
            (F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("sx"))
            .cast("double")
            / (F.col("n") * F.col("sx"))
        ).alias("gini"),
    )


# ------------------------------------------------------------------ #
# w25_rolling_zscore_alerts — streaming-telemetry alerting batch twin:
# per user, a 24-observation trailing window's mean/std from EXACT
# integer sums (cents, cents^2 — both BIGINT), alert when the current
# observation sits more than 2 sigma from the trailing mean with a
# full window. Window arithmetic never sums floats, so there is no
# segment-tree-vs-running-sum divergence between engines; the only
# float ops are the final mean/var/sqrt chain on identical integers.
# ------------------------------------------------------------------ #
W25_ORACLE = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT user_id, us, cents,
         sum(cents) OVER win AS s1,
         sum(cents * cents) OVER win AS s2,
         count(*) OVER win AS n
  FROM t
  WINDOW win AS (PARTITION BY user_id ORDER BY us, cents
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
),
z AS (
  SELECT user_id, us, cents, n,
         CAST(s1 AS DOUBLE) / n AS mean,
         sqrt(greatest(CAST(s2 AS DOUBLE) / n
              - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
              0.0e0)) AS sd
  FROM w
)
SELECT user_id, us, cents, mean, sd
FROM z
WHERE n = 24 AND abs(cents - mean) > 2.0e0 * sd
"""


@query("w25_rolling_zscore_alerts", W25_ORACLE)
def w25_rolling_zscore_alerts(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("us", "cents")
        .rowsBetween(-23, 0)
    )
    w = ev.select(
        "user_id",
        "us",
        "cents",
        F.sum("cents").over(win).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("s2"),
        F.count(F.lit(1)).over(win).alias("n"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        F.greatest(
            F.col("s2").cast("double") / F.col("n") - mean * mean,
            F.lit(0.0),
        )
    )
    z = w.select(
        "user_id", "us", "cents", "n",
        mean.alias("mean"), sd.alias("sd"),
    )
    return z.where(
        (F.col("n") == 24)
        & (F.abs(F.col("cents") - F.col("mean")) > 2.0 * F.col("sd"))
    ).select("user_id", "us", "cents", "mean", "sd")
