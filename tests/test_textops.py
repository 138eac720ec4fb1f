"""Text/dedup/similarity operator suite vs DuckDB oracle + semantic
checks (planted duplicates found; ANN recall vs exact baseline)."""

import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import SF_DIR, assert_matches_oracle

NAMES = [
    "t_tfidf_topterms",
    "t_token_stats",
    "t_quality_score",
    "t_lang_id",
    "d_exact_dedup",
    "d_minhash_lsh_pairs",
    "d_ngram_jaccard_pairs",
    "d_simhash",
    "d_contamination_overlap",
    "s_cosine_topk",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, oracle_con, name):
    assert_matches_oracle(spark, oracle_con, name)


def test_exact_dedup_removes_planted_dupes(spark):
    from historical_obs_platform_spark.registry import QUERIES

    out = QUERIES["d_exact_dedup"](spark, SF_DIR)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert out.count() == n_docs  # every planted copy removed
    assert out.where(F.col("doc_id") >= 1000000).count() == 0  # min id kept


def test_minhash_lsh_finds_planted_near_dupes(spark):
    from historical_obs_platform_spark.registry import QUERIES

    pairs = QUERIES["d_minhash_lsh_pairs"](spark, SF_DIR).toPandas()
    planted = pairs[pairs["b"] == pairs["a"] + 1000000]
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # banding is probabilistic; expect the vast majority of plants found
    assert len(planted) > 0.8 * n_docs, f"found {len(planted)}/{n_docs}"


def test_jaccard_pairs_rank_planted_highest(spark):
    from historical_obs_platform_spark.registry import QUERIES

    pairs = QUERIES["d_ngram_jaccard_pairs"](spark, SF_DIR).toPandas()
    planted = pairs[pairs["b"] == pairs["a"] + 1000000]
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # candidate set comes from LSH banding (probabilistic recall); the
    # confirm step must keep only true near-dups at high jaccard
    assert len(planted) > 0.8 * n_docs
    assert (planted["jaccard"] > 0.8).all()


def test_simhash_near_dup_small_hamming(spark):
    """A perturbed copy must land within a few bits of the original;
    random pairs must not."""
    from historical_obs_platform_spark.operators.dedup import (
        hamming_distance,
        simhash,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    orig = simhash(docs, "doc_id", "text")
    pert = simhash(
        docs.select(
            "doc_id", F.concat("text", F.lit(" zzextra")).alias("text")
        ),
        "doc_id",
        "text",
    ).withColumnRenamed("simhash", "simhash_p")
    joined = orig.join(pert, "doc_id").select(
        hamming_distance(F.col("simhash"), F.col("simhash_p")).alias("d")
    )
    dists = [r["d"] for r in joined.collect()]
    assert max(dists) <= 6
    # cross-document distances should be large on average
    cross = (
        orig.alias("x")
        .join(orig.alias("y"), F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            hamming_distance(
                F.col("x.simhash"), F.col("y.simhash")
            ).alias("d")
        )
    )
    avg_cross = cross.agg(F.avg("d")).collect()[0][0]
    assert avg_cross > 8


def test_lsh_ann_recall_vs_exact(spark):
    """The approximate path must agree with the exact baseline on a
    decent fraction of (query, neighbor) hits at k=5."""
    from historical_obs_platform_spark.registry import QUERIES

    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["s_cosine_topk"](spark, SF_DIR).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["s_lsh_ann_topk"](spark, SF_DIR).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"recall {recall:.2f}"


def test_winnow_fingerprint_order_insensitive_prefix(spark):
    """Same text → same fingerprint; different text → different."""
    from historical_obs_platform_spark.functions.textfns import (
        winnow_fingerprint,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "a different doc")],
        "id int, text string",
    )
    rows = df.select("id", winnow_fingerprint("text").alias("fp")).collect()
    fps = {r.id: r.fp for r in rows}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_fingerprint_docs_matches_column_form(spark):
    """The codegen explode+min-agg plan computes the identical
    fingerprint as the higher-order-lambda column form."""
    from historical_obs_platform_spark.functions.textfns import (
        fingerprint_docs,
        winnow_fingerprint,
    )

    df = spark.createDataFrame(
        [
            (1, "The Quick  brown fox jumps over the lazy dog"),
            (2, "short"),
            (3, "a different doc entirely, with punctuation! and MORE"),
        ],
        "id int, text string",
    )
    want = {
        r.id: r.fp
        for r in df.select(
            "id", winnow_fingerprint("text").alias("fp")
        ).collect()
    }
    got = {r.id: r.fp for r in fingerprint_docs(df, "id", "text").collect()}
    assert got == want


def test_ivf_ann_recall_vs_exact(spark):
    """IVF probing must recover a decent fraction of the exact top-k."""
    from historical_obs_platform_spark.registry import QUERIES

    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["s_cosine_topk"](spark, SF_DIR).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["s_ivf_ann_topk"](spark, SF_DIR).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"recall {recall:.2f}"


def test_repetition_signals_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "t_repetition_signals")


def test_repetition_signals_map_only(spark):
    """Both signals must compute in-row: no Exchange in the plan."""
    from historical_obs_platform_spark import registry
    from .conftest import SF_DIR

    plan = (
        registry.QUERIES["t_repetition_signals"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_repetition_signals_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a a a a a a a"),          # one word repeated
            (2, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w0"),  # all distinct
        ],
        "doc_id long, text string",
    )
    import historical_obs_platform_spark.queries.textops as T
    from historical_obs_platform_spark.operators import dedup as DD
    from pyspark.sql import functions as F

    t = df.select(
        "doc_id", F.split(DD.normalize_text("text"), " ").alias("__t")
    )
    n_words = F.size("__t")
    dup = (n_words - F.size(F.array_distinct("__t"))).cast("double") / n_words
    top = F.expr(T._TOP_BIGRAM_RUN).cast("double") / (n_words - 1)
    out = {
        r["doc_id"]: r
        for r in t.select(
            "doc_id", dup.alias("d"), top.alias("tb")
        ).collect()
    }
    assert out[1]["d"] == 0.9 and out[1]["tb"] == 1.0
    assert out[2]["d"] == 0.0 and out[2]["tb"] == 1.0 / 9.0


def test_int8_quantize_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "s_int8_quantize")


def test_int8_quantize_codes_in_range(spark):
    """Symmetric max-abs scaling must land every code in [-127, 127]
    and hit ±127 for the max-magnitude dimension."""
    from historical_obs_platform_spark import registry
    from pyspark.sql import functions as F
    from .conftest import SF_DIR

    out = registry.QUERIES["s_int8_quantize"](spark, SF_DIR)
    bad = out.where(
        (F.col("q_min") < -127) | (F.col("q_max") > 127)
    ).count()
    assert bad == 0
    # every vector's largest |code| is exactly 127 (the scale is
    # defined by the max-abs dimension; floor(127.0 + 0.5) = 127)
    hit = out.where(
        (F.col("q_max") == 127) | (F.col("q_min") == -127)
    ).count()
    assert hit == out.count()


def test_lsh_mega_bucket_guard(spark):
    """Buckets above max_bucket_size are dropped before pairing."""
    from historical_obs_platform_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    rows = [(i, 0, "mega") for i in range(10)] + [
        (100, 0, "small"),
        (101, 0, "small"),
    ]
    buckets = spark.createDataFrame(
        rows, "doc_id long, band int, bucket string"
    )
    capped = lsh_candidate_pairs(buckets, "doc_id", max_bucket_size=5)
    assert sorted(
        (r["a"], r["b"]) for r in capped.collect()
    ) == [(100, 101)]
    uncapped = lsh_candidate_pairs(buckets, "doc_id")
    assert uncapped.count() == 45 + 1


def test_char_entropy_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "t_char_entropy")


def test_char_entropy_extremes(spark):
    """Uniform chars -> 0 bits; k distinct equal-count chars -> log2 k."""
    from historical_obs_platform_spark import registry
    import historical_obs_platform_spark.queries.textops as T
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abababab"), (3, "abcdabcd")],
        "doc_id long, text string",
    )
    norm = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
    t = df.select(
        "doc_id",
        F.length(F.expr(norm)).cast("double").alias("t"),
        F.expr(T._ENTROPY_EXPR % norm).alias("acc"),
    )
    import math

    ln2 = math.log(2.0)
    out = {
        r["doc_id"]: round(
            (math.log(r["t"]) - r["acc"] / r["t"]) / ln2, 9
        )
        for r in t.collect()
    }
    assert out[1] == 0.0
    assert out[2] == 1.0
    assert out[3] == 2.0


def test_containment_pairs_matches_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "d_containment_pairs")


def test_containment_geq_jaccard(spark):
    """containment >= jaccard for every pair (min <= union), so the
    containment set is a superset of the jaccard set at equal
    thresholds."""
    from historical_obs_platform_spark.registry import QUERIES

    from .conftest import SF_DIR

    cont = QUERIES["d_containment_pairs"](spark, SF_DIR)
    jac = QUERIES["d_ngram_jaccard_pairs"](spark, SF_DIR)
    # every 0.9-jaccard pair must appear among 0.9-containment pairs
    high_j = jac.where("jaccard >= 0.9").select("a", "b")
    missing = high_j.join(cont.select("a", "b"), ["a", "b"], "left_anti")
    assert missing.count() == 0


def test_lang_confusion_matches_oracle(spark, oracle_con):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "t_lang_confusion")


def test_lang_confusion_partitions_corpus(spark):
    from historical_obs_platform_spark.queries.common import table
    from historical_obs_platform_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["t_lang_confusion"](spark, SF_DIR).collect()
    n_docs = table(spark, SF_DIR, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs


def test_multiprobe_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_lsh_multiprobe_topk")
    assert_matches_oracle(spark, oracle_con, "s_ann_recall_multiprobe")


def test_multiprobe_beats_plain_lsh_at_equal_tables(spark):
    """The documented knob: Hamming-1 probing recovers recall without
    growing corpus-side hashing. Candidate supersetting makes >= a
    structural property; on this corpus the lift is large (0.26 ->
    0.66 at sf0.01)."""
    from historical_obs_platform_spark.registry import QUERIES

    rows = {
        r["method"]: r
        for r in QUERIES["s_ann_recall_multiprobe"](spark, SF_DIR).collect()
    }
    lsh, mp = rows["lsh_t2"], rows["multiprobe_t2p2"]
    assert lsh["n_truth"] == mp["n_truth"] > 0
    assert mp["recall"] >= lsh["recall"]
    assert mp["recall"] > 0.0
    assert mp["recall"] <= 1.0


def test_hard_negatives_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_hard_negatives")


def test_hard_negatives_excludes_same_label(spark):
    from historical_obs_platform_spark.registry import QUERIES

    out = QUERIES["s_hard_negatives"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out["query_label"] != out["neighbor_label"]).all()
    assert out.groupby("query_id")["rank"].max().le(5).all()


def test_bigram_prob_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "t_bigram_prob")


def test_bigram_prob_semantics(spark):
    """Probabilities are valid and repeated text scores higher than
    a one-off scramble: feed a tiny corpus through the operator's own
    building blocks via a temp view substitution is overkill — check
    invariants on the real table instead: ppm-derived fields bounded,
    min <= mean, and every multi-token doc is scored."""
    from historical_obs_platform_spark.registry import QUERIES
    from historical_obs_platform_spark.queries.common import table as T
    from historical_obs_platform_spark.functions import textfns as TX

    out = QUERIES["t_bigram_prob"](spark, SF_DIR)
    pdf = out.toPandas()
    assert (pdf["mean_ppm"] > 0).all() and (pdf["mean_ppm"] <= 1e6).all()
    assert (pdf["min_ppm"] >= 0).all()
    assert (pdf["min_ppm"] <= pdf["mean_ppm"]).all()
    docs = T(spark, SF_DIR, "documents").select(
        "doc_id", TX.tokens(F.col("text")).alias("t")
    )
    n_multi = docs.where(F.size("t") >= 2).count()
    assert len(pdf) == n_multi


def test_incremental_neardup_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "d_incremental_neardup")


def test_incremental_neardup_finds_planted_sources(spark):
    """Each incoming (+1e6 perturbed) doc should resolve to its own
    original as the best stored match, for the vast majority of docs
    (LSH banding recall)."""
    from historical_obs_platform_spark.registry import QUERIES

    out = QUERIES["d_incremental_neardup"](spark, SF_DIR).toPandas()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(out) > 0.9 * n_docs
    assert (out["dup_of"] == out["new_id"] - 1000000).all()
    assert (out["jaccard"] >= 0.8).all()
    assert out["new_id"].is_unique


def test_leakage_safe_split_oracle_and_invariant(spark, oracle_con):
    """Group-aware split matches its oracle; no near-dup cluster may
    straddle two splits (the leakage guarantee), and near-dup pairs
    provably co-locate."""
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.queries.textops import (
        leakage_safe_split,
    )

    from .conftest import SF_DIR, assert_matches_oracle

    assert_matches_oracle(spark, oracle_con, "p_leakage_safe_split")
    assigned = leakage_safe_split(spark, SF_DIR)
    span = (
        assigned.groupBy("grp")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .count()
    )
    assert span == 0


def test_simhash_neardup_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "d_simhash_neardup")


def test_simhash_neardup_banding_complete(spark):
    """Pigeonhole recall guarantee: 4x8-bit banding at Hamming <= 3
    finds EXACTLY the brute-force all-pairs result (banding is a
    candidate filter, never a loss), and rejects an uncovered
    max_hamming."""
    import pytest as _pytest

    from historical_obs_platform_spark.operators.dedup import (
        hamming_distance,
        simhash,
        simhash_neardup_pairs,
    )
    from historical_obs_platform_spark.queries.common import table

    docs = table(spark, SF_DIR, "documents").limit(120)
    sig = simhash(docs, "doc_id", "text", bits=32).localCheckpoint()

    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup_pairs(
            sig, "doc_id", "simhash", bits=32, bands=4, max_hamming=3
        ).collect()
    }
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming_distance(
                F.col("a.simhash"), F.col("b.simhash"), 32
            )
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute and brute

    with _pytest.raises(ValueError):
        simhash_neardup_pairs(sig, max_hamming=4, bands=4)
