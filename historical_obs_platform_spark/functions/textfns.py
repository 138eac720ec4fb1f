"""Text-analysis functions for training-data pipelines: tokenization,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions (split / filter / aggregate higher-order
functions) — no Python in the hot path, so they run at scan speed
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.dedup import normalize_text

# Marker (stop)words per language for the n-gram/lexicon language-ID
# heuristic. Deliberately tiny — the point is the operator shape
# (score per language -> deterministic argmax), not NLP accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}
LANG_PRIORITY = ["en", "es", "de", "fr", "zh"]  # argmax tie-break order

STOPWORDS = LANG_MARKERS["en"]


def tokens(col) -> Column:
    return F.split(normalize_text(col), " ")


def token_count(col) -> Column:
    t = tokens(col)
    return F.when(
        (F.size(t) == 1) & (F.element_at(t, 1) == ""), F.lit(0)
    ).otherwise(F.size(t))


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token estimate: word pieces of ≤4 chars — a cheap
    deterministic proxy for BPE token counts (ceil(len/4) per word)."""
    t = tokens(col)
    return F.aggregate(
        t,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )


def stopword_ratio(col, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    t = tokens(col)
    hits = F.size(F.filter(t, lambda w: w.isin(sw)))
    return F.round(hits / F.greatest(F.size(t), F.lit(1)), 6)


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(
        F.regexp_replace(c, r"[^\w\s]", "")
    )
    return F.round(n_punct / F.greatest(F.length(c), F.lit(1)), 6)


def mean_word_length(col) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.round(total / F.greatest(F.size(t), F.lit(1)), 6)


def quality_score(col) -> Column:
    """Composite [0,1] quality score: long-enough docs with readable
    word lengths, some stopwords, little punctuation score high
    (length / punct / stopword-ratio family of heuristics)."""
    n = token_count(col)
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    wl = mean_word_length(col)
    wl_term = F.when((wl >= 3.0) & (wl <= 8.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    sw_term = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(
        punct_ratio(col) * F.lit(5.0), F.lit(1.0)
    )
    return F.round(
        F.lit(0.4) * length_term
        + F.lit(0.2) * wl_term
        + F.lit(0.2) * sw_term
        + F.lit(0.2) * punct_term,
        6,
    )


def lang_scores(col) -> dict[str, Column]:
    t = tokens(col)
    return {
        lang: F.size(F.filter(t, lambda w: w.isin(words)))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col) -> Column:
    """Deterministic argmax over per-language marker hit counts, ties
    broken by LANG_PRIORITY; no hits at all → 'unknown'."""
    scores = lang_scores(col)
    expr = None
    # nested argmax-with-priority: lang i wins if its score >= every
    # later-priority score and > every earlier one it lost to — built
    # as a first-match CASE over the priority order with >= semantics.
    conds = []
    for i, lang in enumerate(LANG_PRIORITY):
        cond = scores[lang] > 0
        for j, other in enumerate(LANG_PRIORITY):
            if i == j:
                continue
            if j < i:
                cond = cond & (scores[lang] > scores[other])
            else:
                cond = cond & (scores[lang] >= scores[other])
        conds.append((cond, lang))
    expr = F.when(conds[0][0], conds[0][1])
    for cond, lang in conds[1:]:
        expr = expr.when(cond, lang)
    return expr.otherwise(F.lit("unknown"))


def winnow_fingerprint(col, k: int = 8) -> Column:
    """Character k-gram min-hash fingerprint (winnowing-style): the
    minimum md5 over all k-grams of the normalized text — robust to
    word reordering at the document level.

    Column form; evaluates the k-gram loop as an interpreted
    higher-order lambda (~µs per gram). For document-scale inputs use
    ``fingerprint_docs`` — same result, whole-stage-codegen plan.
    """
    norm = normalize_text(col)
    grams = F.expr(
        f"transform(sequence(1, greatest(length(regexp_replace(lower(trim("
        f"{col if isinstance(col, str) else '<col>'})), '\\\\s+', ' ')) - {k - 1}, 1)),"
        f" i -> substring(regexp_replace(lower(trim("
        f"{col if isinstance(col, str) else '<col>'})), '\\\\s+', ' '), i, {k}))"
    )
    return F.array_min(F.transform(grams, lambda g: F.md5(g)))


def fingerprint_docs(df, key: str, text_col: str, k: int = 8):
    """Same fingerprint as ``winnow_fingerprint`` as a DataFrame op:
    explode gram positions into rows so the md5 runs inside
    whole-stage codegen, then take the min per document with a
    map-side partial aggregate (the shuffle carries one (key, 32-byte
    hash) pair per doc, never the grams). ~10× the lambda form's
    throughput at corpus scale."""
    norm = normalize_text(text_col)
    n_grams = F.greatest(F.length("__t") - F.lit(k - 1), F.lit(1))
    return (
        df.select(key, norm.alias("__t"))
        .select(
            key,
            "__t",
            F.explode(F.sequence(F.lit(1), n_grams)).alias("__i"),
        )
        .select(
            key,
            F.md5(F.expr(f"substring(__t, __i, {k})")).alias("__h"),
        )
        .groupBy(key)
        .agg(F.min("__h").alias("fp"))
    )
