"""Second text-analytics wave — lexical profiling and unsupervised
keyword extraction:

- t_lexical_diversity — per-document type-token ratio and hapax
  ratio, the quality-filter features next to t_token_stats.
- t_source_concentration — per-source unigram Herfindahl index (how
  concentrated is a source's vocabulary) + its top token; the
  source-level boilerplate/diversity screen.
- t_rake_keywords — RAKE (Rose et al. 2010): candidate phrases are
  maximal stopword-free token runs (≤3 words); word score =
  degree/frequency over the phrase table; phrase score = Σ word
  scores. Scores are 1e-9 fixed-point floors of per-word quotients,
  so the phrase sum is an exact BIGINT fold.
- t_textrank_keywords — TextRank (Mihalcea & Tarau 2004): unweighted
  co-occurrence graph (±2 positions, stopwords dropped), 3 damped
  PageRank sweeps in BIGINT parts-per-billion — the g_pagerank_fixed
  integer spelling, so ranks are engine-exact integers.

Determinism: tokenization is the repo-wide NORM split; every score
is either an exact integer fold or a fixed-point floor of a
bit-identical double; top-k tie-breaks are total orders.

Reference anchor: the reference's QAQC layer profiles value
vocabularies per station (frequent-bins, scripts/3_qaqc_data/
qaqc_dist_whole_stn.py); these are the text-corpus counterparts a
training-data pipeline runs per source/document.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textfns import STOPWORDS
from ..registry import query
from .common import table

NORM = "regexp_replace(lower(trim(text)), '\\\\s+', ' ', 'g')"
_NORM_SPARK_SPLIT = "split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')"

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

_TOK_CTE = f"""
tok AS (
  SELECT doc_id, pos, ws[pos + 1] AS w
  FROM (
    SELECT doc_id, ws, unnest(range(len(ws))) AS pos
    FROM (SELECT doc_id, string_split({NORM}, ' ') AS ws
          FROM documents))
  WHERE ws[pos + 1] <> ''
)"""


# ------------------------------------------------------------------ #
# t_lexical_diversity
# ------------------------------------------------------------------ #
LEXDIV_ORACLE = f"""
WITH {_TOK_CTE},
wc AS (
  SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hapax_ratio
FROM wc GROUP BY doc_id
"""


@query("t_lexical_diversity", LEXDIV_ORACLE)
def t_lexical_diversity(spark, sf_dir):
    """Per-document lexical diversity: token count, type count,
    type-token ratio, and the hapax-legomena share of the vocabulary
    — the cheap repetition screen a quality gate thresholds before
    anything model-based.

    Scale shape: explode → one (doc, word) partial aggregation → one
    doc-keyed aggregation; all counts, map-side combinable.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.expr(_NORM_SPARK_SPLIT)).alias("w")
    ).where(F.col("w") != "")
    wc = d.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    return wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("c"), 6
        ).alias("ttr"),
        F.round(
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("hapax_ratio"),
    )


# ------------------------------------------------------------------ #
# t_source_concentration
# ------------------------------------------------------------------ #
SRCCONC_ORACLE = f"""
WITH {_TOK_CTE},
toks AS (
  SELECT d.source, t.w
  FROM documents d JOIN tok t ON t.doc_id = d.doc_id
),
wc AS (SELECT source, w, count(*) AS c FROM toks GROUP BY 1, 2),
s AS (
  SELECT source, sum(c) AS n_tokens, count(*) AS vocab,
         sum(CAST(c AS DECIMAL(19,0)) * c) AS c2, max(c) AS cmax
  FROM wc GROUP BY 1),
top AS (
  SELECT w.source, min(w.w) AS top_tok
  FROM wc w JOIN s ON s.source = w.source AND w.c = s.cmax
  GROUP BY 1)
SELECT s.source, CAST(s.n_tokens AS BIGINT) AS n_tokens,
       CAST(s.vocab AS BIGINT) AS vocab,
       round(CAST(s.c2 AS DOUBLE)
             / (CAST(s.n_tokens AS DOUBLE) * s.n_tokens), 6) AS hhi,
       top.top_tok
FROM s JOIN top ON top.source = s.source
"""


@query("t_source_concentration", SRCCONC_ORACLE)
def t_source_concentration(spark, sf_dir):
    """Per-source unigram Herfindahl concentration: Σ p_w² over the
    source's token distribution (1/vocab for uniform, →1 for
    boilerplate-dominated) with the most frequent token — the
    source-level screen that catches template-heavy feeds before
    near-dup detection pays for them.

    Scale shape: one (source, word) partial aggregation, one
    source-keyed fold; the top token joins on the exact integer max.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.expr(_NORM_SPARK_SPLIT)).alias("w")
    ).where(F.col("w") != "")
    wc = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    cd = F.col("c").cast("decimal(19,0)")
    s = wc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(cd * F.col("c")).alias("c2"),
        F.max("c").alias("cmax"),
    )
    top = (
        wc.join(
            F.broadcast(s.select("source", "cmax")), "source"
        )
        .where(F.col("c") == F.col("cmax"))
        .groupBy("source")
        .agg(F.min("w").alias("top_tok"))
    )
    nt = F.col("n_tokens")
    return (
        s.join(F.broadcast(top), "source")
        .select(
            "source",
            nt.cast("long").alias("n_tokens"),
            F.col("vocab").cast("long").alias("vocab"),
            F.round(
                F.col("c2").cast("double")
                / (nt.cast("double") * nt),
                6,
            ).alias("hhi"),
            "top_tok",
        )
    )


# ------------------------------------------------------------------ #
# t_rake_keywords
# ------------------------------------------------------------------ #
_RAKE_MAXLEN = 3
_RAKE_TOPK = 15
_RAKE_FIX = 1_000_000_000

RAKE_ORACLE = f"""
WITH {_TOK_CTE},
marked AS (
  SELECT doc_id, pos, w,
         CASE WHEN w IN ({_STOP_SQL}) THEN 1 ELSE 0 END AS stop
  FROM tok),
grp AS (
  SELECT doc_id, pos, w, stop,
         sum(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM marked),
phr AS (
  SELECT doc_id, g,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         count(*) AS plen
  FROM grp WHERE stop = 0
  GROUP BY doc_id, g
  HAVING count(*) <= {_RAKE_MAXLEN}),
pw AS (
  SELECT p.doc_id, p.g, p.phrase, p.plen,
         unnest(string_split(p.phrase, ' ')) AS w
  FROM phr p),
ws AS (
  SELECT w, count(*) AS freq,
         sum(plen) AS deg
  FROM pw GROUP BY w),
wsf AS (
  SELECT w,
         CAST(floor(CAST(deg AS DOUBLE) / freq * {_RAKE_FIX})
              AS BIGINT) AS s
  FROM ws),
ps AS (
  SELECT p.phrase, sum(ws2.s) AS score_fx, count(*) AS n_words
  FROM pw p JOIN wsf ws2 ON ws2.w = p.w
  GROUP BY p.doc_id, p.g, p.phrase),
agg AS (
  SELECT phrase, count(*) AS n_occur, max(score_fx) AS score_fx
  FROM ps GROUP BY phrase)
SELECT phrase, CAST(n_occur AS BIGINT) AS n_occur,
       round(CAST(score_fx AS DOUBLE) / {_RAKE_FIX}, 6) AS score,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number()
           OVER (ORDER BY score_fx DESC, phrase) AS rnk
  FROM agg
) WHERE rnk <= {_RAKE_TOPK}
"""


@query("t_rake_keywords", RAKE_ORACLE)
def t_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction: maximal stopword-free runs (≤3
    words) are candidate phrases; each word scores degree/frequency
    over the phrase table; a phrase scores the sum of its word
    scores; top-15 distinct phrases.

    Exactness: word scores floor to 1e-9 fixed point (deg/freq is
    the only division, a bit-identical double), so the phrase fold
    is an exact BIGINT sum; ranking ties break on the phrase text.

    Scale shape: the stopword run-splitter is one per-doc window
    (partitioned by doc); phrase/word tables aggregate map-side; the
    final top-k is a TakeOrdered over the distinct-phrase table.
    """
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.expr(_NORM_SPARK_SPLIT)).alias("pos", "w"),
        )
        .where(F.col("w") != "")
    )
    marked = toks.select(
        "doc_id",
        "pos",
        "w",
        F.when(F.col("w").isin(*STOPWORDS), 1).otherwise(0).alias(
            "stop"
        ),
    )
    wg = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = marked.select(
        "doc_id", "pos", "w", "stop", F.sum("stop").over(wg).alias("g")
    )
    phr = (
        grp.where(F.col("stop") == 0)
        .groupBy("doc_id", "g")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "w"))
                    ),
                    lambda s: s["w"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .where(F.col("plen") <= _RAKE_MAXLEN)
    )
    pw = phr.select(
        "doc_id",
        "g",
        "phrase",
        "plen",
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    ws = pw.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    wsf = ws.select(
        "w",
        F.floor(
            F.col("deg").cast("double") / F.col("freq") * _RAKE_FIX
        )
        .cast("bigint")
        .alias("s"),
    )
    ps = (
        pw.join(wsf, "w")
        .groupBy("doc_id", "g", "phrase")
        .agg(
            F.sum("s").alias("score_fx"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
    agg = ps.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occur"),
        F.max("score_fx").alias("score_fx"),
    )
    wr = Window.orderBy(F.desc("score_fx"), F.asc("phrase"))
    return (
        agg.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= _RAKE_TOPK)
        .select(
            "phrase",
            F.col("n_occur").cast("long").alias("n_occur"),
            F.round(
                F.col("score_fx").cast("double") / _RAKE_FIX, 6
            ).alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ------------------------------------------------------------------ #
# t_textrank_keywords
# ------------------------------------------------------------------ #
_TR_WIN = 2
_TR_SCALE = 1_000_000_000
_TR_TOPK = 15


def _tr_sweep_sql(prev: str) -> str:
    return f"""
  SELECT n.w,
         CAST((15 * ({_TR_SCALE} // nn.n)) // 100
              + (85 * coalesce(sum(c.contrib), 0)) // 100
              AS BIGINT) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst, r.rank // d.outdeg AS contrib
    FROM edges e JOIN {prev} r ON r.w = e.src
    JOIN deg d ON d.src = e.src
  ) c ON c.dst = n.w
  GROUP BY n.w, nn.n
"""


TEXTRANK_ORACLE = f"""
WITH {_TOK_CTE},
nt AS (SELECT * FROM tok WHERE w NOT IN ({_STOP_SQL})),
pairs AS (
  SELECT DISTINCT least(a.w, b.w) AS wa, greatest(a.w, b.w) AS wb
  FROM nt a JOIN nt b
    ON a.doc_id = b.doc_id
   AND b.pos - a.pos BETWEEN 1 AND {_TR_WIN}
  WHERE a.w <> b.w),
edges AS (
  SELECT wa AS src, wb AS dst FROM pairs
  UNION ALL
  SELECT wb AS src, wa AS dst FROM pairs),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT src AS w FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (
  SELECT w, CAST({_TR_SCALE} // n AS BIGINT) AS rank FROM nodes, nn
),
r1 AS ({_tr_sweep_sql("r0")}),
r2 AS ({_tr_sweep_sql("r1")}),
r3 AS ({_tr_sweep_sql("r2")})
SELECT w AS keyword, CAST(rank AS BIGINT) AS rank_ppb,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY rank DESC, w) AS rnk FROM r3
) WHERE rnk <= {_TR_TOPK}
"""


@query("t_textrank_keywords", TEXTRANK_ORACLE)
def t_textrank_keywords(spark, sf_dir):
    """TextRank keywords: an unweighted co-occurrence graph over
    non-stopword tokens (±{_TR_WIN} positions), 3 damped PageRank
    sweeps in BIGINT parts-per-billion (the g_pagerank_fixed integer
    spelling — integer floor arithmetic end-to-end, so the ranks are
    engine-exact), top-{_TR_TOPK} tokens.

    Scale shape: the pair build is the PMI window join (keyed on
    doc_id, band-limited — Σ len(doc)·window work); each sweep is
    contrib = rank div outdeg over the edge list and ONE shuffle on
    dst; vocabulary-sized state per sweep, lineage truncated between
    sweeps.
    """
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.expr(_NORM_SPARK_SPLIT)).alias("pos", "w"),
        )
        .where((F.col("w") != "") & ~F.col("w").isin(*STOPWORDS))
        # both sides of the window join read this; one materialization
        .localCheckpoint(eager=False)
    )
    a = toks.select(
        "doc_id", F.col("pos").alias("pa"), F.col("w").alias("wa0")
    )
    # banded EQUI-join (r8): fan each right-side token out to the
    # _TR_WIN positions it co-occurs with and join on (doc_id, pa)
    # EQUALITY — identical pair set to joining on doc_id alone and
    # band-filtering pb-pa afterwards, but the join evaluates
    # Σ len(doc)·window rows instead of Σ len(doc)² (the per-doc
    # cross product the band filter used to prune post-hoc).
    b = toks.select(
        "doc_id",
        F.explode(
            F.array(
                *[F.col("pos") - d for d in range(1, _TR_WIN + 1)]
            )
        ).alias("pa"),
        F.col("w").alias("wb0"),
    )
    pairs = (
        a.join(b, ["doc_id", "pa"])
        .where(F.col("wa0") != F.col("wb0"))
        .select(
            F.least("wa0", "wb0").alias("wa"),
            F.greatest("wa0", "wb0").alias("wb"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("wa").alias("src"), F.col("wb").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("wb").alias("src"), F.col("wa").alias("dst")
            )
        )
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # referenced by the rank init, every sweep's left join and the
    # final row build — one distinct instead of five
    nodes = (
        edges.select(F.col("src").alias("w"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = F.expr(f"(15 * ({_TR_SCALE} div n)) div 100")
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "w", F.expr(f"{_TR_SCALE} div n").cast("long").alias("rank")
    )
    ed = edges.join(deg, "src")
    for _ in range(3):
        contrib = (
            ed.join(ranks, ed.src == ranks.w)
            .select("dst", F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        # no per-sweep checkpoint (the g_pagerank_fixed r8 move):
        # each sweep references the previous ranks exactly once, so
        # nothing re-executes, and each eager=False checkpoint still
        # compiled the physical plan at build time (~0.5 s/sweep)
        ranks = (
            nodes.join(contrib, nodes.w == contrib.dst, "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "w",
                (base + F.expr("(85 * coalesce(s, 0)) div 100"))
                .cast("long")
                .alias("rank"),
            )
        )
    wr = Window.orderBy(F.desc("rank"), F.asc("w"))
    return (
        ranks.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= _TR_TOPK)
        .select(
            F.col("w").alias("keyword"),
            F.col("rank").cast("long").alias("rank_ppb"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ------------------------------------------------------------------ #
# t_token_burstiness
# ------------------------------------------------------------------ #
_BURST_TOPK = 20

BURST_ORACLE = f"""
WITH {_TOK_CTE},
nd AS (SELECT count(*) AS n_docs FROM documents),
dc AS (
  SELECT w, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
ws AS (
  SELECT w, sum(c) AS tf, count(*) AS df,
         sum(CAST(c AS DECIMAL(19,0)) * c) AS c2
  FROM dc GROUP BY 1),
top AS (
  SELECT w, tf, df, c2,
         row_number() OVER (ORDER BY tf DESC, w) AS rnk
  FROM ws),
st AS (
  SELECT t.w, t.tf, t.df, t.rnk, nd.n_docs,
         CAST(t.tf AS DOUBLE) / nd.n_docs AS mu,
         (CAST(t.c2 AS DOUBLE)
          - (CAST(t.tf AS DOUBLE) / nd.n_docs) * t.tf) / nd.n_docs
           AS var_p
  FROM top t, nd WHERE t.rnk <= {_BURST_TOPK})
SELECT w AS token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CASE WHEN mu > 0 THEN round(var_p / mu, 6) END AS fano,
       CASE WHEN var_p + mu * mu > 0
            THEN round((var_p - mu * mu)
                       / (var_p + mu * mu), 6) END AS burstiness,
       CAST(rnk AS INT) AS rnk
FROM st
"""


@query("t_token_burstiness", BURST_ORACLE)
def t_token_burstiness(spark, sf_dir):
    """Burstiness of the corpus' top tokens: the Fano factor
    (variance-to-mean ratio of per-document counts, zero docs
    included — 1 for Poisson scatter, ≫1 for topical clumping) and
    the Goh-Barabási burstiness (σ²−μ²)/(σ²+μ²) spelled on the
    population variance — the content/function-word separator used in
    keyword weighting.

    Exactness: per-doc counts and their squares fold in exact
    BIGINT/DECIMAL (zero-docs enter through the closed form
    var = (Σc² − μ·Σc)/N with N the corpus doc count); ratios are
    identical float trees, CASE-guarded.

    Scale shape: one (word, doc) partial aggregation, one word fold;
    top-k on the exact integer total frequency.
    """
    docs = table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    dc = (
        docs.select(
            "doc_id", F.explode(F.expr(_NORM_SPARK_SPLIT)).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cd = F.col("c").cast("decimal(19,0)")
    ws = dc.groupBy("w").agg(
        F.sum("c").alias("tf"),
        F.count(F.lit(1)).alias("df"),
        F.sum(cd * F.col("c")).alias("c2"),
    )
    wr = Window.orderBy(F.desc("tf"), F.asc("w"))
    top = ws.withColumn("rnk", F.row_number().over(wr)).where(
        F.col("rnk") <= _BURST_TOPK
    )
    mu = F.col("tf").cast("double") / F.col("n_docs")
    var_p = (
        F.col("c2").cast("double")
        - (F.col("tf").cast("double") / F.col("n_docs"))
        * F.col("tf")
    ) / F.col("n_docs")
    st = top.crossJoin(F.broadcast(nd)).select(
        "w", "tf", "df", "rnk", mu.alias("mu"), var_p.alias("var_p")
    )
    muc, vc = F.col("mu"), F.col("var_p")
    return st.select(
        F.col("w").alias("token"),
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.when(muc > 0, F.round(vc / muc, 6)).alias("fano"),
        F.when(
            vc + muc * muc > 0,
            F.round((vc - muc * muc) / (vc + muc * muc), 6),
        ).alias("burstiness"),
        F.col("rnk").cast("int").alias("rnk"),
    )


# ------------------------------------------------------------------ #
# p_greedy_cover — greedy vocabulary k-cover (facility location)
# ------------------------------------------------------------------ #
_COVER_ROUNDS = 5


def _cover_oracle(rounds: int = _COVER_ROUNDS) -> str:
    parts = [
        f"WITH {_TOK_CTE},",
        # cover the BIGRAM vocabulary: the synthetic corpus' unigram
        # vocabulary is tiny enough that one document covers it, so
        # the greedy rounds would degenerate; bigrams keep the
        # universe large and the selection meaningfully diverse
        "dt AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w AS w"
        " FROM tok a JOIN tok b"
        " ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),",
        "p1 AS (SELECT doc_id, count(*) AS gain FROM dt GROUP BY 1),",
        "s1 AS (SELECT doc_id, gain FROM p1"
        " ORDER BY gain DESC, doc_id LIMIT 1),",
        "c1 AS (SELECT DISTINCT dt.w FROM dt JOIN s1 USING (doc_id)),",
    ]
    for r in range(2, rounds + 1):
        parts.append(
            f"p{r} AS (SELECT dt.doc_id, count(*) AS gain"
            f" FROM dt LEFT JOIN c{r-1} cc ON cc.w = dt.w"
            f" WHERE cc.w IS NULL GROUP BY dt.doc_id),"
        )
        parts.append(
            f"s{r} AS (SELECT doc_id, gain FROM p{r}"
            f" ORDER BY gain DESC, doc_id LIMIT 1),"
        )
        parts.append(
            f"c{r} AS (SELECT w FROM c{r-1} UNION"
            f" SELECT dt.w FROM dt JOIN s{r} USING (doc_id)),"
        )
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, doc_id, gain FROM s{r}"
        for r in range(1, rounds + 1)
    )
    parts.append(f"picks AS ({sel})")
    return "\n".join(parts) + """
SELECT CAST(round AS INT) AS round, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(gain AS BIGINT) AS gain,
       CAST(sum(gain) OVER (ORDER BY round) AS BIGINT)
         AS covered_total
FROM picks
"""


@query("p_greedy_cover", _cover_oracle())
def p_greedy_cover(spark, sf_dir):
    """Greedy vocabulary cover: pick the document covering the most
    not-yet-covered distinct tokens, 5 rounds — the classic
    (1−1/e)-approximate facility-location selection a curation
    pipeline uses to seed a maximally-diverse subset.

    Exactness: gains are exact distinct-token counts; every argmax
    ties on (gain DESC, doc_id) — a total order; the running coverage
    total is the exact sum of gains.

    Scale shape: each round is one anti-join of the (doc, token)
    table against the covered set plus one doc-keyed count and a
    TakeOrdered(1) — rounds × three corpus-bounded stages, with the
    covered set growing by one doc's vocabulary per round (broadcast
    side). Lineage truncated between rounds.
    """
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.expr(_NORM_SPARK_SPLIT)).alias("pos", "w"),
        )
        .where(F.col("w") != "")
    )
    a = toks.select("doc_id", "pos", F.col("w").alias("w1"))
    b = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2")
    )
    dt = (
        a.join(b, ["doc_id", "pos"])
        .select(
            "doc_id", F.concat_ws(" ", "w1", "w2").alias("w")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    covered = None
    picks = []
    for r in range(1, _COVER_ROUNDS + 1):
        cand = dt
        if covered is not None:
            cand = dt.join(covered, "w", "left_anti")
        gains = cand.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("gain")
        )
        pick = (
            gains.orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(1)
            .withColumn("round", F.lit(r))
            .localCheckpoint(eager=False)
        )
        picks.append(pick)
        newly = dt.join(
            pick.select("doc_id"), "doc_id"
        ).select("w")
        covered = (
            newly
            if covered is None
            else covered.unionByName(newly).distinct()
        ).localCheckpoint(eager=False)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    wr = Window.orderBy("round").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return out.select(
        F.col("round").cast("int").alias("round"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("gain").cast("long").alias("gain"),
        F.sum("gain").over(wr).cast("long").alias("covered_total"),
    )
