"""Round-3 curation depth: SemDeDup and product quantization."""

from __future__ import annotations

from historical_obs_platform_spark import registry

registry.load_all()

from historical_obs_platform_spark.operators import similarity as SIM

from .conftest import assert_matches_oracle


def test_semdedup_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "d_semdedup")


def test_semdedup_drops_planted_copy_keeps_originals(spark):
    """An exact copy (larger id) is dropped; unrelated vectors
    survive; the copy always shares its original's cell."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (10, [1.0, 0.0, 0.0, 0.0]),  # exact copy of 0
        (11, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = SIM.semdedup(
        df, n_cells=3, iters=1, threshold=0.95
    ).toPandas().set_index("vec_id")
    assert bool(out.loc[10, "dropped"])  # copy dropped
    assert bool(out.loc[11, "dropped"])  # near-dup dropped
    assert not bool(out.loc[0, "dropped"])  # canonical survives
    assert not bool(out.loc[1, "dropped"])
    assert not bool(out.loc[2, "dropped"])
    assert out.loc[10, "cell"] == out.loc[0, "cell"]


def test_pq_adc_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_pq_adc_topk")


def test_pq_adc_ranks_same_cluster_first(spark):
    """With two well-separated clusters, every query's nearest ADC
    neighbor comes from its own cluster and an exact copy of the
    query ranks first (same codes ⇒ minimal table-lookup sum)."""
    lo = [(i, [0.0 + i * 0.01] * 4) for i in range(4)]
    hi = [(10 + i, [100.0 + i * 0.01] * 4) for i in range(4)]
    df = spark.createDataFrame(
        lo + hi, "vec_id long, embedding array<double>"
    )
    queries = df.where("vec_id IN (0, 10)")
    out = SIM.pq_adc_topk(
        df, queries, k=3, m=2, ksub=4, sub_dim=2, iters=1
    ).toPandas()
    top1 = out[out["rank"] == 1].set_index("query_id")["neighbor_id"]
    assert top1[0] < 10 and top1[10] >= 10


def test_semdedup_no_cross_cell_drops(spark):
    """Orthogonal vectors land in different cells and nothing is
    dropped even at a low threshold — pruning is strictly
    within-cell."""
    rows = [(i, [1.0 if d == i else 0.0 for d in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = SIM.semdedup(df, n_cells=4, iters=1, threshold=0.5).toPandas()
    assert not out["dropped"].any()
    assert out["cell"].nunique() == 4


def test_pq_recall_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_pq_recall")


def test_domain_reweight_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "p_domain_reweight")


def test_domain_reweight_shares_sum_to_one(spark):
    from historical_obs_platform_spark.registry import QUERIES

    out = QUERIES["p_domain_reweight"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert abs(out["token_share"].sum() - 1.0) < 1e-3
    # weight is inversely proportional to token share
    ordered = out.sort_values("token_share")
    assert (ordered["weight"].diff().dropna() <= 1e-9).all()


def test_st_semdedup_stream_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "st_semdedup_stream")


def test_arrow_kernels_bit_identical_to_folds(spark):
    """cosine_arrow / dot_arrow replay the scalar fold's addition
    order — results must be BIT-identical (==, not approx) to the
    zip_with/aggregate composition, including the norm factors."""
    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(17)],
            [rnd.uniform(-1, 1) for _ in range(17)])
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )
    from pyspark.sql import functions as F

    got = df.select(
        "id",
        SIM.dot_arrow("a", "b").alias("d_arrow"),
        SIM.dot(F.col("a"), F.col("b")).alias("d_fold"),
        SIM.cosine_arrow("a", "b").alias("c_arrow"),
        (
            SIM.dot(F.col("a"), F.col("b"))
            / (SIM.norm(F.col("a")) * SIM.norm(F.col("b")))
        ).alias("c_fold"),
    ).toPandas()
    assert (got["d_arrow"] == got["d_fold"]).all()
    assert (got["c_arrow"] == got["c_fold"]).all()


def test_nearest_cell_arrow_matches_assign_cells(spark):
    """The Arrow assignment agrees with the batch broadcast-join
    assignment on every vector (same fold order, same smallest-cell
    tie rule)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = SIM.ivf_centroids(emb, "vec_id", "embedding", n_cells=8, iters=1)
    cent_rows = [(r["cell"], r["__cent"]) for r in cent.collect()]
    vecs = emb.select(
        F.col("vec_id").alias("__id"),
        SIM._unit(SIM.as_double_array("embedding")).alias("__uv"),
    )
    batch = SIM._assign_cells(vecs, cent, "__id").toPandas()
    arrow = emb.select(
        F.col("vec_id").alias("__id"),
        SIM.nearest_cell_arrow(
            SIM.as_double_array("embedding"), cent_rows
        ).alias("cell"),
    ).toPandas()
    merged = batch.merge(arrow, on="__id", suffixes=("_b", "_a"))
    assert (merged["cell_b"] == merged["cell_a"]).all()


def test_ivfpq_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_ivfpq_adc_topk")


def test_ivfpq_ranks_same_cluster_first(spark):
    """Two well-separated clusters: with nprobe=1 every query's
    candidates come from its own coarse cell, and the top ADC
    neighbor is a same-cluster vector."""
    lo = [(i, [1.0 + i * 0.01, 2.0, 0.5, 1.0] * 2) for i in range(4)]
    hi = [(10 + i, [-100.0 - i * 0.01, 3.0, 80.0, -7.0] * 2) for i in range(4)]
    df = spark.createDataFrame(
        lo + hi, "vec_id long, embedding array<double>"
    )
    queries = df.where("vec_id IN (0, 10)")
    out = SIM.ivfpq_adc_topk(
        df, queries, k=3, n_cells=2, nprobe=1, m=2, ksub=2, sub_dim=4
    ).toPandas()
    top1 = out[out["rank"] == 1].set_index("query_id")["neighbor_id"]
    assert top1[0] < 10 and top1[10] >= 10
    # nprobe=1 ⇒ no cross-cluster candidates at all
    assert (out[out["query_id"] == 0]["neighbor_id"] < 10).all()
    assert (out[out["query_id"] == 10]["neighbor_id"] >= 10).all()


def test_ivfpq_recall_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_ivfpq_recall")


def test_ivfpq_index_reuse_matches_one_shot(spark):
    """ivfpq_index + ivfpq_query composes to exactly ivfpq_adc_topk
    (the one-shot wrapper delegates, and the index is reusable)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 5")
    one = SIM.ivfpq_adc_topk(
        emb, queries, k=3, n_cells=4, nprobe=2, m=2, ksub=4, sub_dim=32
    ).toPandas()
    cent, cb, codes = SIM.ivfpq_index(
        emb, n_cells=4, m=2, ksub=4, sub_dim=32
    )
    two = SIM.ivfpq_query(
        cent, cb, codes, queries, k=3, nprobe=2, m=2, sub_dim=32
    ).toPandas()
    key = ["query_id", "neighbor_id", "approx_dist", "rank"]
    assert one.sort_values(key).reset_index(drop=True).equals(
        two.sort_values(key).reset_index(drop=True)
    )


def test_substring_spans_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "d_substring_spans")


def test_substring_spans_finds_planted_excerpts(spark):
    """Every planted 30-token excerpt is recovered as one maximal
    span with the exact start positions (a_start=6, b_start=1) and
    full length (23 grams → 30 tokens)."""
    from historical_obs_platform_spark.registry import QUERIES

    out = QUERIES["d_substring_spans"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    planted = out[(out["b"] - out["a"]) == 1000000]
    assert len(planted) > 0
    full = planted[
        (planted["a_start"] == 6)
        & (planted["b_start"] == 1)
        & (planted["span_tokens"] == 30)
    ]
    # the excerpt span must be found for every planted doc pair
    assert len(full) == planted["a"].nunique()


def test_vacuum_plan_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "o15_vacuum_plan")


def test_vacuum_plan_never_deletes_retained_or_live(spark):
    """No live file (removed_snap null) is deletable, and every
    deletable file's last referencing snapshot is older than the
    retention window."""
    from historical_obs_platform_spark.registry import QUERIES

    out = QUERIES["o15_vacuum_plan"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert out["removed_snap"].notna().all()
    # removed_snap exists only for o_orderkey%3==0, so added in
    # {0,3,6,9} and max removed = 9+1+4 = 14 = s_max; with R=3 the
    # deletable bound is s_max-R+1 = 12
    assert (out["removed_snap"] <= 12).all()
    assert (out["n_files"] > 0).all() and (out["bytes_reclaimed"] > 0).all()


def test_token_budget_plan_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "p_token_budget_plan")


def test_mips_topk_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_mips_topk")


def test_mips_lsh_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_mips_lsh_topk")


def test_mips_prefers_norm_over_cosine(spark):
    """The defining MIPS property: a big-norm vector with imperfect
    direction beats a perfectly-aligned small vector — cosine
    ranking would invert this."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # query
        (1, [0.1, 0.0, 0.0, 0.0]),        # cosine 1.0, dot 0.1
        (2, [8.0, 6.0, 0.0, 0.0]),        # cosine 0.8, dot 8.0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id = 0")
    mips = SIM.mips_topk(df, q, k=1).toPandas()
    assert mips.loc[0, "neighbor_id"] == 2
    cos = SIM.cosine_topk(df, q, k=1).toPandas()
    assert cos.loc[0, "neighbor_id"] == 1


def test_ewma_matches_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "w19_ewma")


def test_ewma_halving_semantics(spark):
    from historical_obs_platform_spark.registry import QUERIES

    out = QUERIES["w19_ewma"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    g = out.sort_values("us").groupby("user_id")
    first = g.head(1)
    # s_1 = x_1 exactly
    assert (first["ewma"] == first["value"]).all()
    # every step: s_t = (s_{t-1} + x_t) / 2 exactly (bitwise)
    for _, grp in out.sort_values("us").groupby("user_id"):
        prev = None
        for _, r in grp.iterrows():
            want = r["value"] if prev is None else (prev + r["value"]) / 2
            assert r["ewma"] == want
            prev = r["ewma"]
        break  # one station suffices for the recurrence check


def test_ivfpq_rerank_recall_oracle_and_lift(spark, oracle_con):
    """Residual re-ranking matches its oracle AND measurably lifts
    recall over plain ADC (the knob must do something)."""
    assert_matches_oracle(spark, oracle_con, "s_ivfpq_rerank_recall")
    from historical_obs_platform_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = {
        r["method"]: r["recall"]
        for r in QUERIES["s_ivfpq_rerank_recall"](spark, SF_DIR).collect()
    }
    assert rows["ivfpq_rerank25@5"] > rows["ivfpq_adc@5"]


def test_pq_shard_merge_recall_oracle(spark, oracle_con):
    """Shard-trained + union-merged codebook matches its oracle; the
    merged book must contain both shards' code ranges (0..7, 8..15)."""
    assert_matches_oracle(spark, oracle_con, "s_pq_shard_merge_recall")
    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table

    from .conftest import SF_DIR

    emb = table(spark, SF_DIR, "embeddings")
    cb = SIM.pq_codebooks_sharded(emb, m=4, ksub=8, sub_dim=16, n_shards=2)
    js = {r["j"] for r in cb.select("j").distinct().collect()}
    assert js == set(range(16))


def test_ivfpq_incremental_oracle(spark, oracle_con):
    assert_matches_oracle(spark, oracle_con, "s_ivfpq_incremental")


def test_ivfpq_encode_idempotent(spark):
    """ivfpq_encode against a prebuilt index reproduces the build-time
    codes exactly when fed the same vectors — the invariant that makes
    incremental ingest == full re-encode."""
    from pyspark.sql import functions as F

    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table
    from .conftest import SF_DIR

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.where(F.col("vec_id") % 10 != 0)
    cent, cb, codes0 = SIM.ivfpq_index(
        base, n_cells=16, m=4, ksub=8, sub_dim=16
    )
    re_encoded = SIM.ivfpq_encode(cent, cb, base, m=4, sub_dim=16)
    a = {tuple(r) for r in codes0.collect()}
    b = {tuple(r) for r in re_encoded.collect()}
    assert a == b and a
