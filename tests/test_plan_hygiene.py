"""Physical-plan regression guards: pushdown, pruning, and broadcast
must survive refactors (the properties the 100 TB plan relies on)."""

import pytest

from historical_obs_platform_spark import registry

registry.load_all()

from .conftest import SF_DIR


def _formatted(df) -> str:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q1_filter_pushdown_and_pruning(spark):
    plan = _formatted(registry.QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the referenced lineitem columns are read
    assert "l_comment" not in plan and "l_partkey" not in plan


def test_q5_all_dims_broadcast(spark):
    plan = _formatted(registry.QUERIES["q5_regional_revenue"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_q10_selective_filter_reaches_scan(spark):
    plan = _formatted(registry.QUERIES["q10_returned_revenue"](spark, SF_DIR))
    assert "EqualTo(l_returnflag,R)" in plan


def test_q7_nation_pair_joins_broadcast(spark):
    plan = _formatted(registry.QUERIES["q7_volume_shipping"](spark, SF_DIR))
    # orders-lineitem is the only big-big join; every dim side
    # broadcasts and nothing falls back to a sort-merge join
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_q21_single_fact_scan(spark):
    plan = _formatted(registry.QUERIES["q21_sole_returner"](spark, SF_DIR))
    # the EXISTS/NOT-EXISTS rewrite must not re-scan lineitem
    assert plan.count("lineitem.parquet") == 1


def test_q2_min_cost_no_self_join(spark):
    plan = _formatted(
        registry.QUERIES["q2_min_cost_supplier"](spark, SF_DIR)
    )
    # correlated-min decorrelates to a window, not a lineitem self-join
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan


def test_rolling_24h_single_exchange(spark):
    import re

    plan = _formatted(registry.QUERIES["w_rolling_24h"](spark, SF_DIR))
    # one hash partitioning on user_id feeds the range-frame window;
    # no second shuffle appears downstream
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    assert "hashpartitioning(user_id" in plan


def test_tfidf_scalar_broadcast(spark):
    plan = _formatted(registry.QUERIES["t_tfidf_topterms"](spark, SF_DIR))
    # the N-docs scalar must cross in as a broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q18_preaggregates_and_broadcasts(spark):
    plan = _formatted(registry.QUERIES["q18_large_orders"](spark, SF_DIR))
    # lineitem aggregates before the orders join; the filtered
    # aggregate broadcasts, so the only shuffle is the lineitem
    # partial/final aggregation — orders never exchanges
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("+- Exchange") == 1


def test_mixture_sample_rate_table_broadcasts(spark):
    plan = _formatted(registry.QUERIES["p_mixture_sample"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_uniform_sample_no_exchange(spark):
    plan = _formatted(registry.QUERIES["p_uniform_sample"](spark, SF_DIR))
    # stateless filter: scan → filter → project, no shuffle at all
    assert "Exchange" not in plan


def test_pack_sequences_single_shuffle(spark):
    plan = _formatted(registry.QUERIES["p_pack_sequences"](spark, SF_DIR))
    # one hash exchange on the shard key feeds the window sort
    assert plan.count("+- Exchange") == 1


def test_no_cartesian_product_anywhere(spark):
    """Sweep every batch query's physical plan: a CartesianProduct is
    never the right 100 TB answer — any pairing must ride an equi-join
    (possibly via bucketing/LSH decomposition) or an explicit
    broadcast. Streaming queries execute on build and the clustering
    query runs its propagation loop eagerly, so they are exercised by
    their own tests instead."""
    # d_dup_clusters runs its propagation loop eagerly; s5 writes its
    # round-trip CSV on build (both have their own oracle tests).
    # NB: localCheckpoint boundaries hide upstream plan segments from
    # this sweep (they print as Scan ExistingRDD) — the checkpointed
    # queries' pre-checkpoint plans are covered by their operator
    # tests, not here.
    skip = {"d_dup_clusters", "s5_csv_obs_roundtrip"}
    offenders = []
    for name, fn in sorted(registry.QUERIES.items()):
        if name.startswith("st_") or name in skip:
            continue
        plan = _formatted(fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == [], f"cartesian products in: {offenders}"


def test_pii_scrub_map_only(spark):
    """The scrub is one projection over the scan: no Exchange at all
    in the plan."""
    plan = _formatted(registry.QUERIES["t_pii_scrub"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_audio_energy_map_only(spark):
    """Arrow framing island runs in the scan stage: no Exchange."""
    plan = _formatted(registry.QUERIES["m_audio_energy"](spark, SF_DIR))
    assert "Exchange" not in plan


def _n_exchanges(plan: str) -> int:
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def test_split_assign_single_exchange(spark):
    """Hash-split audit aggregates with exactly one shuffle (the
    3-group final agg); assignment itself is a stateless projection."""
    plan = _formatted(registry.QUERIES["p_split_assign"](spark, SF_DIR))
    assert _n_exchanges(plan) == 1


def test_forward_fill_single_station_shuffle(spark):
    """LOCF is one window pass: a single Exchange on the station
    partitioning and no join anywhere."""
    plan = _formatted(registry.QUERIES["w14_forward_fill"](spark, SF_DIR))
    assert _n_exchanges(plan) == 1
    assert "Join" not in plan


def test_rarity_vocab_broadcast(spark):
    """Token-vocabulary join must broadcast (no sort-merge join of
    the token stream against itself)."""
    plan = _formatted(registry.QUERIES["t_rarity_score"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan


def test_json_props_pruned_scan(spark):
    """Only props/value reach the events scan — the JSON extraction
    must not widen the read schema."""
    plan = _formatted(registry.QUERIES["s11_json_props"](spark, SF_DIR))
    assert "event_type" not in plan and "user_id" not in plan


def test_ivfpq_layout_partition_pruning(spark, tmp_path):
    """IVFADC codes persisted partitioned by cell (layout_dir): the
    probed-cell semi-join must reach the parquet scan as DYNAMIC
    PARTITION PRUNING — only the probed cells' inverted lists are
    read at rest, making the nprobe/n_cells scan saving physical —
    and the pruned path must return byte-identical results to the
    in-memory path."""
    from historical_obs_platform_spark.operators import similarity as SIM
    from historical_obs_platform_spark.queries.common import table

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.where(emb.vec_id < 10)
    mem = SIM.ivfpq_adc_topk(emb, queries, k=5, n_cells=16, nprobe=4)
    disk = SIM.ivfpq_adc_topk(
        emb, queries, k=5, n_cells=16, nprobe=4,
        layout_dir=str(tmp_path / "ivf_codes"),
    )
    plan = _formatted(disk)
    assert "dynamicpruning" in plan, (
        "probed-cell restriction did not reach the codes scan as a "
        "dynamic partition filter"
    )
    assert "PartitionFilters" in plan
    got = sorted(map(tuple, disk.collect()))
    want = sorted(map(tuple, mem.collect()))
    assert got == want and len(got) > 0
