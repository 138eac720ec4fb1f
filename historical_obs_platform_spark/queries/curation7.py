"""Round-5 batch 2 — corpus statistics and curation operators:

- a30_cramers_v — chi-square test of independence + Cramér's V over
  the documents lang × source contingency table. Every observed /
  marginal count is BIGINT; each cell contribution is ONE double
  division of exact integer-valued doubles, and the 100-cell sum is a
  position-ordered fold so both engines add in the same order.
- t_js_divergence — per-source Jensen-Shannon divergence between the
  source's hashed-unigram (256-bucket) distribution and the corpus
  distribution — the drift/contamination statistic corpus pipelines
  run next to PSI/KS (both already implemented, a19_psi / a18_ks).
  Bucket log terms use CPython's libm on the driver (bit-identical to
  DuckDB's ln, same as p_dsir_selection); the per-source sum is an
  ordered fold by bucket id.
- p_mmr_select — Maximal Marginal Relevance diverse top-k selection
  (Carbonell & Goldstein, SIGIR'98): ANN-style candidate narrowing to
  the top-24 most query-relevant vectors, then a greedy k=4 pick that
  trades relevance against max-similarity-to-already-selected. The
  oracle unrolls the 4 greedy rounds as chained CTEs; every pairwise
  dot is quantized to round-6 on both sides before any argmax, with
  vec_id as the deterministic tie-break.
- e_markov_transitions — first-order Markov transition matrix over
  per-user event-type sequences (lead() within user ordered by time),
  the session-behavior model next to funnel/retention (w17/w18).

Reference anchor: the reference computes per-network categorical
roll-ups and distribution-shift style summaries in its QAQC reports
(qaqc_generate_flag_rates.py:140-264); these queries are the
corpus-curation generalization of that count→ratio→report shape.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textfns import tokens
from ..operators.similarity import dot
from ..registry import query
from .common import round_half_away, table
from .textops import TOKS

# ------------------------------------------------------------------ #
# a30_cramers_v
# ------------------------------------------------------------------ #
A30_ORACLE = """
WITH d AS (
  SELECT lang, source FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
),
obs AS (SELECT lang, source, count(*) AS o FROM d GROUP BY lang, source),
rt AS (SELECT lang, count(*) AS r FROM d GROUP BY lang),
ct AS (SELECT source, count(*) AS c FROM d GROUP BY source),
tot AS (SELECT count(*) AS n FROM d),
cells AS (
  SELECT rt.lang, ct.source, rt.r, ct.c, tot.n,
         COALESCE(obs.o, 0) AS o
  FROM rt CROSS JOIN ct CROSS JOIN tot
  LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source
),
contrib AS (
  SELECT lang, source, n,
         (CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE))
           / CAST(r * c * n AS DOUBLE) AS x
  FROM cells
),
chi AS (
  SELECT list_reduce(list(x ORDER BY lang, source), (a, b) -> a + b)
           AS chi2
  FROM contrib
),
dims AS (
  SELECT (SELECT count(*) FROM rt) AS nl,
         (SELECT count(*) FROM ct) AS ns
)
-- degenerate corpora emit typed NULLs, not NaN/div-zero: an empty
-- corpus NULLs every statistic; a single-lang or single-source table
-- has dof = 0, where chi2 is identically 0 and V is undefined
SELECT CAST(tot.n AS BIGINT) AS n,
       CASE WHEN tot.n = 0 THEN NULL
            ELSE CAST((dims.nl - 1) * (dims.ns - 1) AS BIGINT) END AS dof,
       CASE WHEN tot.n = 0 THEN NULL ELSE round(chi.chi2, 6) END AS chi2,
       CASE WHEN tot.n = 0 OR least(dims.nl - 1, dims.ns - 1) = 0
            THEN NULL
            ELSE round(sqrt(chi.chi2
                       / (tot.n * least(dims.nl - 1, dims.ns - 1))), 6)
            END AS cramers_v
FROM chi CROSS JOIN dims CROSS JOIN tot
"""


@query("a30_cramers_v", A30_ORACLE)
def a30_cramers_v(spark, sf_dir):
    """Chi-square independence + Cramér's V for lang × source.

    Scale shape: three count aggregations over the corpus plus a
    (langs × sources) cell table — contingency-sized, never row-pair
    work. The final fold runs over the cell list in one 1-row agg;
    cells are sorted by (lang, source) so the float sum order matches
    the oracle bit-for-bit.
    """
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("lang").isNotNull() & F.col("source").isNotNull())
        .select("lang", "source")
    )
    # ONE corpus aggregation: the contingency cells partition the
    # corpus, so the row/column/grand totals fold exactly from the
    # materialized cell table (was 4 separate corpus passes, with the
    # row/column tables each evaluated twice more for nl/ns)
    obs = (
        d.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=False)
    )
    rt = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("c"))
    # coalesce: the old count(*) returned 0 on an empty corpus, sum
    # would return NULL — keep the degenerate-input contract exact
    tot = obs.agg(F.coalesce(F.sum("o"), F.lit(0)).cast("long").alias("n"))
    cells = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "r",
            "c",
            "n",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    contrib = cells.select(
        "lang",
        "source",
        "n",
        (
            (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
            * (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast(
                "double"
            )
            / (F.col("r") * F.col("c") * F.col("n")).cast("double")
        ).alias("x"),
    )
    nl = rt.agg(F.count(F.lit(1)).alias("nl"))
    ns = ct.agg(F.count(F.lit(1)).alias("ns"))
    chi = contrib.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lang", "source", "x"))),
                lambda s: s["x"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("chi2"),
    )
    # typed NULLs on degenerate input (empty corpus / dof = 0) —
    # mirrors the oracle's CASE guards instead of NaN from 0/0
    empty = F.col("n") == 0
    mindim = F.least(F.col("nl") - 1, F.col("ns") - 1)
    return (
        chi.crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").cast("long").alias("n"),
            F.when(
                ~empty, ((F.col("nl") - 1) * (F.col("ns") - 1)).cast("long")
            ).alias("dof"),
            F.when(~empty, F.round("chi2", 6)).alias("chi2"),
            F.when(
                (~empty) & (mindim > 0),
                F.round(
                    F.sqrt(F.col("chi2") / (F.col("n") * mindim)), 6
                ),
            ).alias("cramers_v"),
        )
    )


# ------------------------------------------------------------------ #
# t_js_divergence
# ------------------------------------------------------------------ #
_JS_BUCKET_SQL = (
    "((instr('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(w), 2, 1)) - 1))"
)

T_JS_ORACLE = f"""
WITH d AS (
  SELECT source, {TOKS} AS t FROM documents
  WHERE text IS NOT NULL AND len({TOKS}) >= 1
),
tok AS (SELECT source, unnest(t) AS w FROM d),
tk AS (SELECT source, {_JS_BUCKET_SQL} AS b FROM tok),
qc AS (SELECT b, count(*) AS qn FROM tk GROUP BY b),
qt AS (SELECT sum(qn) AS nq FROM qc),
pc AS (SELECT source, b, count(*) AS pn FROM tk GROUP BY source, b),
pt AS (SELECT source, sum(pn) AS np FROM pc GROUP BY source),
terms AS (
  SELECT pt.source, qc.b, pt.np,
         CAST(COALESCE(pc.pn, 0) AS DOUBLE) / CAST(pt.np AS DOUBLE) AS p,
         CAST(qc.qn AS DOUBLE) / CAST(qt.nq AS DOUBLE) AS q
  FROM pt CROSS JOIN qc CROSS JOIN qt
  LEFT JOIN pc ON pc.source = pt.source AND pc.b = qc.b
),
contrib AS (
  SELECT source, b, np,
         (CASE WHEN p > 0.0e0
               THEN 0.5e0 * p * ln(p / (0.5e0 * (p + q))) ELSE 0.0e0 END)
         + (CASE WHEN q > 0.0e0
                 THEN 0.5e0 * q * ln(q / (0.5e0 * (p + q))) ELSE 0.0e0 END)
           AS x
  FROM terms
)
SELECT source, CAST(any_value(np) AS BIGINT) AS n_tokens,
       round(list_reduce(list(x ORDER BY b), (a, v) -> a + v), 6) AS js
FROM contrib GROUP BY source
"""


@query("t_js_divergence", T_JS_ORACLE)
def t_js_divergence(spark, sf_dir, exact=True):
    """Per-source Jensen-Shannon divergence to the corpus unigram
    distribution over 256 md5 buckets.

    Exact mode (default, the registered/oracled path): the
    (sources × 256) contingency table is collected to the driver —
    report-sized, like report_flag_rates — and the log terms use
    CPython's libm (bit-identical to DuckDB's ln; JVM Math.log is
    not), folded in ascending bucket order. Scale shape: one explode →
    one bucket-keyed count agg; the driver never sees row-level data,
    only the report table.

    ``exact=False`` is the coded escape hatch for past-contract source
    cardinality (>64 k contingency rows): per-source scoring moves
    into a grouped ``applyInPandas`` (vectorized numpy, only the
    256-bucket CORPUS distribution rides the closure), so the driver
    holds O(256) state regardless of source count. Same statistic to
    ~1e-12 (numpy sums in a different order than the ordered fold);
    tolerance-compared against exact mode in
    tests/test_hardening_r6.py.
    """
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("source", tokens(F.col("text")).alias("t"))
        .where(F.size("t") >= 1)
    )
    tk = docs.select(
        "source",
        F.explode("t").alias("w"),
    ).select(
        "source",
        F.conv(F.substring(F.md5("w"), 1, 2), 16, 10)
        .cast("long")
        .alias("b"),
    )
    pc = tk.groupBy("source", "b").agg(F.count(F.lit(1)).alias("pn"))
    if not exact:
        return _js_divergence_pandas(spark, pc)
    # report-sized contract: sources × 256 buckets. Past 64 k rows
    # (≈256 sources) the collect stops being driver-cheap — the same
    # ≤4096-local guard rail as similarity._assign_cells, raised here
    # because the bit-stable CPython-ln scoring has no exact
    # distributed fallback (JVM Math.log carries no libm guarantee);
    # past that cardinality, call with exact=False — the
    # applyInPandas path below with tolerance-compare semantics.
    rows = pc.limit(65_537).collect()
    if len(rows) > 65_536:
        raise ValueError(
            "t_js_divergence: source × bucket contingency exceeds the "
            "driver-collect contract (>65536 rows); rerun with "
            "exact=False (distributed applyInPandas scoring, "
            "tolerance-compare instead of hash-compare)"
        )

    qc: dict[int, int] = {}
    np_: dict[str, int] = {}
    pn: dict[tuple[str, int], int] = {}
    for r in rows:
        qc[r["b"]] = qc.get(r["b"], 0) + r["pn"]
        np_[r["source"]] = np_.get(r["source"], 0) + r["pn"]
        pn[(r["source"], r["b"])] = r["pn"]
    nq = sum(qc.values())

    out = []
    for src in np_:
        acc = 0.0
        for b in sorted(qc):
            p = float(pn.get((src, b), 0)) / float(np_[src])
            q = float(qc[b]) / float(nq)
            x = 0.0
            if p > 0.0:
                x += 0.5 * p * math.log(p / (0.5 * (p + q)))
            if q > 0.0:
                x += 0.5 * q * math.log(q / (0.5 * (p + q)))
            acc = acc + x
        out.append((src, np_[src], round_half_away(acc, 6)))
    return spark.createDataFrame(
        out, "source string, n_tokens long, js double"
    )


def _js_divergence_pandas(spark, pc):
    """Distributed JS scoring: grouped applyInPandas over the
    (source, bucket, count) cells. Only the 256-double corpus
    distribution crosses the driver; per-source work is one numpy
    pass. Buckets absent from a source contribute 0.5·q·ln2 each —
    folded in via the closed-form correction 0.5·ln2·(1 − Σ_present q)
    so groups never need the absent cells materialized."""
    import numpy as np
    import pandas as pd

    qrows = pc.groupBy("b").agg(F.sum("pn").alias("qn")).collect()
    nq = float(sum(r["qn"] for r in qrows))
    qarr = np.zeros(256)
    for r in qrows:
        qarr[int(r["b"])] = r["qn"] / nq
    ln2 = math.log(2.0)

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pn = pdf["pn"].to_numpy(dtype=float)
        b = pdf["b"].to_numpy(dtype=int)
        ntok = pn.sum()
        p = pn / ntok
        q = qarr[b]
        # p > 0 for every present cell; q may be 0 (source-only token)
        x = 0.5 * p * np.log(2.0 * p / (p + q))
        with np.errstate(divide="ignore", invalid="ignore"):
            xq = np.where(q > 0.0, 0.5 * q * np.log(2.0 * q / (p + q)), 0.0)
        js = float((x + xq).sum()) + 0.5 * ln2 * (1.0 - float(q.sum()))
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_tokens": [int(ntok)],
                "js": [round_half_away(js, 6)],
            }
        )

    return pc.groupBy("source").applyInPandas(
        score, "source string, n_tokens long, js double"
    )


# ------------------------------------------------------------------ #
# p_mmr_select
# ------------------------------------------------------------------ #
_MMR_CAND = 24
_MMR_K = 4

_E_DOUBLE = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _mmr_oracle(n_cand: int = _MMR_CAND) -> str:
    rounds = []
    prev_sel = "sel1"
    for r in range(2, _MMR_K + 1):
        selected = " UNION ALL ".join(
            f"SELECT vec_id FROM sel{i}" for i in range(1, r)
        )
        rounds.append(
            f"""
picked{r} AS ({selected}),
r{r} AS (
  SELECT c.vec_id,
         round(c.rel - max(s.s), 6) AS score
  FROM cand c
  JOIN sim s ON s.ia = c.vec_id
            AND s.ib IN (SELECT vec_id FROM picked{r})
  WHERE c.vec_id NOT IN (SELECT vec_id FROM picked{r})
  GROUP BY c.vec_id, c.rel
),
sel{r} AS (
  SELECT vec_id, score FROM r{r} ORDER BY score DESC, vec_id LIMIT 1
)"""
        )
        prev_sel = f"sel{r}"
    _ = prev_sel
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, vec_id, score FROM sel{i}"
        for i in range(1, _MMR_K + 1)
    )
    return f"""
WITH e AS (SELECT vec_id, {_E_DOUBLE} AS v FROM embeddings),
qv AS (SELECT v AS q FROM e WHERE vec_id = (SELECT min(vec_id) FROM e)),
rel0 AS (
  SELECT e.vec_id, round(list_dot_product(e.v, qv.q), 6) AS rel
  FROM e CROSS JOIN qv
  WHERE e.vec_id <> (SELECT min(vec_id) FROM e)
),
cand AS (
  SELECT vec_id, rel FROM rel0 ORDER BY rel DESC, vec_id
  LIMIT {n_cand}
),
ce AS (SELECT c.vec_id, c.rel, e.v FROM cand c JOIN e USING (vec_id)),
sim AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         round(list_dot_product(a.v, b.v), 6) AS s
  FROM ce a JOIN ce b ON a.vec_id <> b.vec_id
),
sel1 AS (
  SELECT vec_id, rel AS score
  FROM cand ORDER BY rel DESC, vec_id LIMIT 1
),
{",".join(rounds)}
SELECT CAST(rank AS INT) AS rank, vec_id, score FROM ({unions}) t
"""


@query("p_mmr_select", _mmr_oracle())
def p_mmr_select(spark, sf_dir):
    """MMR diverse top-k selection over the embedding corpus.

    λ=0.5 MMR up to a positive scale: argmax(0.5·rel − 0.5·maxsim) ≡
    argmax(rel − maxsim), and the unscaled difference of two round-6
    values stays on the 1e-6 grid (halving would land scores on 5e-7
    half-boundaries where HALF_UP vs HALF_EVEN rounding diverges).

    Scale shape: the corpus-sized work is ONE relevance pass (dot with
    the broadcast query vector) + top-N — exactly an ANN probe, and
    any of the ANN queries (s_ivf_ann_topk, s_lsh_ann_topk) can stand
    in for it. The greedy MMR loop then runs on the candidate set
    only: 24 rows + a 24×24 similarity table, driver-sized by
    construction, like every production MMR re-ranker. Dots are the
    same left-fold doubles as the rest of the similarity family and
    are quantized to round-6 before every argmax (vec_id tie-break),
    so selection is bit-stable across engines.
    """
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    qid = e.agg(F.min("vec_id").alias("qid"))
    qv = (
        e.join(F.broadcast(qid), F.col("vec_id") == F.col("qid"))
        .select(F.col("v").alias("q"), "qid")
    )
    rel = (
        e.crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "vec_id",
            "v",
            F.round(dot(F.col("v"), F.col("q")), 6).alias("rel"),
        )
    )
    cand = rel.orderBy(F.desc("rel"), F.asc("vec_id")).limit(_MMR_CAND)
    rows = cand.collect()

    cands = [(r["vec_id"], r["rel"], r["v"]) for r in rows]
    sims: dict[tuple[int, int], float] = {}

    def _dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    for i, (ia, _, va) in enumerate(cands):
        for ib, _, vb in cands[i + 1 :]:
            s = round_half_away(_dot(va, vb), 6)
            sims[(ia, ib)] = s
            sims[(ib, ia)] = s

    selected: list[tuple[int, int, float]] = []
    remaining = {vid: r for vid, r, _ in cands}
    for rank in range(1, _MMR_K + 1):
        best = None
        for vid in sorted(remaining):
            r = remaining[vid]
            if selected:
                mx = max(sims[(vid, s[1])] for s in selected)
                score = round_half_away(r - mx, 6)
            else:
                score = r
            if best is None or score > best[1]:
                best = (vid, score)
        selected.append((rank, best[0], best[1]))
        del remaining[best[0]]
    return spark.createDataFrame(
        selected, "rank int, vec_id long, score double"
    )


# ------------------------------------------------------------------ #
# e_markov_transitions
# ------------------------------------------------------------------ #

def _transition_pairs(spark, sf_dir):
    """Shared (from_type, to_type, n) transition counts: one lead()
    per user (ordered by ts, event_id) over the event log — the
    single corpus-scale pass behind e_markov_transitions AND
    a34_markov_entropy_rate, defined once so the sequence key can
    never silently diverge between the two."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    return seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )


_SEQ_SQL = """
seq AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
pairs AS (
  SELECT from_type, to_type, count(*) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
tot AS (SELECT from_type, sum(n) AS tn FROM pairs GROUP BY from_type)"""


E_MARKOV_ORACLE = f"""
WITH {_SEQ_SQL}
SELECT p.from_type, p.to_type, CAST(p.n AS BIGINT) AS n,
       round(CAST(p.n AS DOUBLE) / CAST(t.tn AS DOUBLE), 6) AS p
FROM pairs p JOIN tot t USING (from_type)
"""


@query("e_markov_transitions", E_MARKOV_ORACLE)
def e_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over user event streams.

    One lead() window per user (shuffle on user_id), then a
    (from, to)-keyed count and a broadcast-joined row normalization —
    the same shape at 100 TB, with state bounded by the event-type
    vocabulary squared. Counts are BIGINT; p is a single double
    division of exact integers (identical on both engines).
    """
    pairs = _transition_pairs(spark, sf_dir)
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("tn"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n").cast("double") / F.col("tn").cast("double"), 6
        ).alias("p"),
    )


# ------------------------------------------------------------------ #
# a34_markov_entropy_rate — conditional next-event entropy per state
# ------------------------------------------------------------------ #
A34_ORACLE = f"""
WITH {_SEQ_SQL}
SELECT p.from_type, CAST(any_value(t.tn) AS BIGINT) AS n,
       round(list_reduce(
         list(-(CAST(p.n AS DOUBLE) / CAST(t.tn AS DOUBLE))
              * ln(CAST(p.n AS DOUBLE) / CAST(t.tn AS DOUBLE))
              ORDER BY p.to_type),
         (a, b) -> a + b), 6) AS h_nats
FROM pairs p JOIN tot t USING (from_type)
GROUP BY p.from_type
"""


@query("a34_markov_entropy_rate", A34_ORACLE)
def a34_markov_entropy_rate(spark, sf_dir, exact=True):
    """Per-state conditional entropy H(next | current) of the user
    event process — the predictability measure on top of
    e_markov_transitions' transition matrix. The (from, to) count
    table is vocabulary²-sized; it is collected and the -p·ln p terms
    use CPython libm (bit-identical to DuckDB's ln, like DSIR/JS),
    folded in to_type order.

    Scale shape: one lead() per user + one vocabulary²-keyed count —
    corpus-scale work is identical to e_markov_transitions; the
    entropy arithmetic runs on the report-sized table. For
    past-contract alphabets (>64 k transition cells), ``exact=False``
    scores each from-state in a grouped ``applyInPandas`` instead —
    no driver collect at any cardinality, same statistic to ~1e-12
    (tolerance-compared in tests/test_hardening_r6.py).
    """
    pairs = _transition_pairs(spark, sf_dir)
    if not exact:
        return _markov_entropy_pandas(pairs)
    # vocabulary²-sized by construction (event-type alphabet squared)
    rows = pairs.limit(65_537).collect()
    if len(rows) > 65_536:
        raise ValueError(
            "a34_markov_entropy_rate: event-type alphabet too large "
            "for the driver-collect contract (>65536 transition "
            "cells); rerun with exact=False (distributed "
            "applyInPandas scoring, tolerance-compare)"
        )
    tn: dict[str, int] = {}
    for r in rows:
        tn[r["from_type"]] = tn.get(r["from_type"], 0) + r["n"]
    out = []
    for ft in tn:
        acc = 0.0
        cells = sorted(
            (r["to_type"], r["n"]) for r in rows if r["from_type"] == ft
        )
        for _, n in cells:
            p = float(n) / float(tn[ft])
            acc = acc + (-(p) * math.log(p))
        out.append((ft, tn[ft], round_half_away(acc, 6)))
    return spark.createDataFrame(
        out, "from_type string, n long, h_nats double"
    )


def _markov_entropy_pandas(pairs):
    """Distributed per-state entropy: grouped applyInPandas over the
    (from_type, to_type, n) transition cells — one numpy -Σp·ln p per
    from-state group, zero driver-side state."""
    import numpy as np
    import pandas as pd

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = pdf["n"].to_numpy(dtype=float)
        tn = n.sum()
        p = n / tn
        h = float(-(p * np.log(p)).sum())
        return pd.DataFrame(
            {
                "from_type": [pdf["from_type"].iloc[0]],
                "n": [int(tn)],
                "h_nats": [round_half_away(h, 6)],
            }
        )

    return pairs.groupBy("from_type").applyInPandas(
        score, "from_type string, n long, h_nats double"
    )


# ------------------------------------------------------------------ #
# d_cdc_chunking — content-defined chunking dedup estimate
# ------------------------------------------------------------------ #
D_CDC_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {TOKS} AS t FROM documents
  WHERE text IS NOT NULL AND len({TOKS}) >= 1
),
b AS (
  SELECT doc_id, t, len(t) AS L,
         list_filter(range(1, len(t) + 1),
                     j -> substr(md5(t[j]), 1, 1) = '0') AS bnd
  FROM d
),
ch AS (
  SELECT doc_id,
         CASE WHEN len(bnd) = 0 THEN [array_to_string(t, ' ')]
              ELSE list_concat(
                list_transform(range(1, len(bnd) + 1),
                  j -> array_to_string(
                         t[CASE WHEN j = 1 THEN 1
                               ELSE bnd[j - 1] + 1 END : bnd[j]], ' ')),
                CASE WHEN bnd[-1] < L
                     THEN [array_to_string(t[bnd[-1] + 1 : L], ' ')]
                     ELSE [] END) END
           AS chunks
  FROM b
),
h AS (
  SELECT md5(c) AS ch, len(c) AS cl
  FROM (SELECT unnest(chunks) AS c FROM ch)
),
agg AS (
  SELECT count(*) AS total_chunks,
         count(DISTINCT ch) AS distinct_chunks,
         sum(cl) AS total_chars
  FROM h
),
sav AS (
  SELECT sum((cnt - 1) * cl) AS saved
  FROM (SELECT ch, count(*) AS cnt, min(cl) AS cl FROM h GROUP BY ch)
)
SELECT (SELECT count(*) FROM d) AS n_docs,
       CAST(total_chunks AS BIGINT) AS total_chunks,
       CAST(distinct_chunks AS BIGINT) AS distinct_chunks,
       CAST((total_chunks - distinct_chunks) * 1000000 // total_chunks
            AS BIGINT) AS dup_chunk_ppm,
       CAST(total_chars AS BIGINT) AS total_chars,
       CAST(COALESCE(saved, 0) * 1000000 // total_chars AS BIGINT)
         AS char_savings_ppm
FROM agg, sav
"""


@query("d_cdc_chunking", D_CDC_ORACLE)
def d_cdc_chunking(spark, sf_dir):
    """Content-defined chunking (Muthitacharoen et al. SOSP'01, the
    LBFS/rsync-family primitive) at WORD granularity: cut after every
    token whose md5 starts with nibble '0' (p = 1/16 → ~16-word
    expected chunks), then measure corpus-level chunk duplication —
    the savings estimate a storage-dedup layer would realize, measured
    in CHARACTERS (both engines' length() counts codepoints, not
    octets — for the zh documents in the corpus bytes != chars, so
    the columns say what they measure).
    Because cut points depend only on LOCAL content, an insertion
    shifts only the chunk it lands in — the property fixed-size
    blocking lacks, and the reason CDC finds shared spans across
    near-duplicate documents. (Byte-level CDC is the same plan with a
    rolling window as the boundary function; word granularity keeps
    the boundary test one md5 per TOKEN, not per character.)

    Scale shape: boundary detection and chunk slicing are per-row
    Catalyst expressions (map-only); the only shuffle is the
    chunk-hash aggregation, keyed on content hashes like every dedup
    query — only (hash, length) rides it, never chunk text, at scale.

    Guard: Spark's `sequence(a, b)` auto-descends when b < a (DuckDB
    `range` is empty there), so the chunk-index sequence is
    CASE-guarded for boundary-free documents; chunk reassembly
    (join of chunks == normalized text) is asserted in tests.
    """
    # the corpus ships as ONE parquet file, so without a redistribute
    # the (interpreted, non-codegen) nested-lambda chunker runs in a
    # single task; spreading rows across the executor threads is the
    # difference between 86 s and ~4 s at sf0.1 (map-only after it).
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .where(F.size("t") >= 1)
    )
    b = d.select(
        "doc_id",
        "t",
        F.expr(
            "filter(sequence(1, size(t)), "
            "j -> substring(md5(element_at(t, CAST(j AS INT))), 1, 1) = '0')"
        ).alias("bnd"),
    )
    ch = b.select(
        F.expr(
            "CASE WHEN size(bnd) = 0 THEN array(concat_ws(' ', t)) "
            "ELSE concat("
            "  transform(sequence(1, size(bnd)), "
            "    j -> concat_ws(' ', slice(t, "
            "      CAST(CASE WHEN j = 1 THEN 1 "
            "           ELSE element_at(bnd, CAST(j - 1 AS INT)) + 1 END AS INT), "
            "      CAST(element_at(bnd, CAST(j AS INT)) "
            "           - CASE WHEN j = 1 THEN 0 "
            "                  ELSE element_at(bnd, CAST(j - 1 AS INT)) END AS INT)))), "
            "  CASE WHEN element_at(bnd, -1) < size(t) "
            "       THEN array(concat_ws(' ', slice(t, "
            "            CAST(element_at(bnd, -1) + 1 AS INT), size(t)))) "
            "       ELSE CAST(array() AS ARRAY<STRING>) END) END"
        ).alias("chunks"),
    )
    # explode_OUTER on purpose: plain explode triggers the
    # InferFiltersFromGenerate rule, whose inferred size(chunks) > 0
    # predicate — containing the whole nested-lambda chunk expression —
    # gets pushed below the repartition into the SINGLE pre-exchange
    # scan task (measured 85 s vs 6 s at sf0.1). `chunks` is non-empty
    # for every surviving doc by construction, so outer adds no rows.
    h = ch.select(F.explode_outer("chunks").alias("c")).select(
        F.md5("c").alias("ch"), F.length("c").alias("cl")
    )
    # ONE pass over the (interpreted-lambda) chunker: every statistic
    # derives from the chunk-hash rollup — a second consumer of `h`
    # would re-run the whole chunk pipeline (measured 90 s vs 5.7 s
    # at sf0.1 for the two-consumer spelling).
    stats = (
        h.groupBy("ch")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("cl").alias("cl"))
        .agg(
            F.sum("cnt").alias("total_chunks"),
            F.count(F.lit(1)).alias("distinct_chunks"),
            F.sum(F.col("cnt") * F.col("cl")).alias("total_chars"),
            F.sum((F.col("cnt") - 1) * F.col("cl")).alias("saved"),
        )
    )
    nd = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .where(F.size(tokens(F.col("text"))) >= 1)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        stats.crossJoin(F.broadcast(nd))
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_chunks").cast("long").alias("total_chunks"),
            F.col("distinct_chunks").cast("long").alias("distinct_chunks"),
            F.expr(
                "(total_chunks - distinct_chunks) * 1000000"
                " DIV total_chunks"
            )
            .cast("long")
            .alias("dup_chunk_ppm"),
            F.col("total_chars").cast("long").alias("total_chars"),
            F.expr("COALESCE(saved, 0) * 1000000 DIV total_chars")
            .cast("long")
            .alias("char_savings_ppm"),
        )
    )
