"""Physical-plan assertions: the plan each operator is *designed* to produce
(SCALING.md) is pinned here, so a regression that silently de-optimizes —
dropping a pushed filter, losing map-side partial aggregation, degrading a
broadcast join to cartesian — fails CI even though results stay correct.
"""

from __future__ import annotations

import re

import pytest

from daas_apps_spark.operators.partitioning import physical_plan
from daas_apps_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_SMOKE

_load_all()


def plan_of(spark, name: str) -> str:
    return physical_plan(REGISTRY[name].fn(spark, SF_SMOKE))


def test_q1_filter_pushdown_and_partial_agg(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan  # map-side partial aggregation
    # exactly two exchanges: hash for the aggregate, range for the final
    # 6-row presentation sort — nothing else may shuffle
    assert plan.count("+- Exchange") == 2


def test_q1_column_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # The fixture has 11 lineitem columns; q1 touches 7. The 4 untouched key
    # columns must be pruned out of the scan's ReadSchema.
    for unused in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert unused not in plan, f"{unused} not pruned from scan"
    for used in ("l_returnflag", "l_linestatus"):
        assert used in plan


def test_c5_broadcasts_the_dim_side(spark):
    plan = plan_of(spark, "c5_broadcast_join")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_c6_no_cartesian_and_single_fact_pipeline(spark):
    plan = plan_of(spark, "c6_multikey_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # Partial-aggregation pushdown: lineitem reduces to (partkey, suppkey)
    # partials BEFORE any join — the joins run on the reduced relation
    # (broadcast at smoke SF; AQE may pick SMJ at cluster scale).
    assert "partial_sum" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # Both sides of the self-join derive from the same lineitem aggregate:
    # the exchange must be REUSED, not recomputed — one fact-table pass.
    # Reuse is decided at runtime under AQE, so assert on the executed plan.
    df = REGISTRY["c6_multikey_join"].fn(spark, SF_SMOKE)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed


def test_i1_partial_agg_before_single_shuffle(spark):
    """The tumbling-window aggregate must combine map-side: partial
    count/sum feed ONE hash exchange — the shape that scales to 100 TB
    (shuffle volume = distinct (window, type) partials, not raw events)."""
    plan = plan_of(spark, "i1_tumbling_window")
    assert "partial_count" in plan and "partial_sum" in plan
    assert plan.count("+- Exchange") == 1
    exchange_pos = plan.index("+- Exchange")
    # the partial HashAggregate sits BELOW (after, in tree text) the exchange
    assert "HashAggregate" in plan[exchange_pos:], "no map-side combine"


def test_c7_range_join_broadcasts_band_side(spark):
    # theta join: the tiny banded side must be the broadcast build side
    plan = plan_of(spark, "c7_range_join_bands")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_f4_topk_avoids_global_sort(spark):
    plan = plan_of(spark, "f4_top_k")
    assert "TakeOrderedAndProject" in plan
    # no range-partitioned total sort for a limit-k query
    assert "rangepartitioning" not in plan.lower()


def test_asof_join_single_shuffle(spark):
    plan = plan_of(spark, "c10_asof_join")
    # union + window approach: no join node at all, no range-join blowup
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_k3_lsh_never_crossjoins(spark):
    plan = plan_of(spark, "k3_lsh_near_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anti_join_stays_anti(spark):
    plan = plan_of(spark, "c4_anti_join")
    assert "LeftAnti" in plan


def test_k1_dedup_is_window_not_selfjoin(spark):
    plan = plan_of(spark, "k1_exact_dedup")
    assert "Window" in plan
    assert "Join" not in plan


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "c1_join_orders_customer", "k6_quality_heuristics"],
)
def test_headline_queries_stay_in_codegen(spark, name):
    # whole-stage codegen spans present (the `*(n)` markers in simple mode) —
    # expressions are JVM-side, no row-at-a-time Python in the hot path.
    # AQE only finalizes (and codegens) the plan at execution, so run first.
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    df.collect()
    plan = physical_plan(df, mode="simple")
    # shuffle-free plans have no AdaptiveSparkPlan wrapper at all
    assert "isFinalPlan=false" not in plan
    assert "*(" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_h_struct_battery_compiles_without_fallback(spark):
    """The struct battery must survive whole-stage codegen STRICTLY — with
    spark.sql.codegen.fallback off, a generated-code compile error fails the
    job instead of silently demoting the stage to the interpreted path.
    Pinned because ElementAt→GetStructField codegen in this Spark build
    emits an invalid cross-expression variable reference ("isNull_N is not
    an rvalue") whenever it shares a projection with any other column;
    h_struct_functions dodges it via GetArrayItem (getItem(0)), and this
    test catches both a regression to element_at and any future expression
    that re-trips the bug."""
    old = spark.conf.get("spark.sql.codegen.fallback")
    try:
        spark.conf.set("spark.sql.codegen.fallback", "false")
        rows = REGISTRY["h_struct_functions"].fn(spark, SF_SMOKE).collect()
        assert len(rows) > 0
        assert all(r["first_elem_k"] is not None for r in rows)
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_k12_decontam_broadcasts_bench_grams(spark):
    """The eval-set gram pool is the small side at any corpus scale: the
    contamination probe must be a broadcast hash join (the corpus side
    never shuffles for it), and nothing may cartesian."""
    plan = plan_of(spark, "k12_decontam_overlap")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_k13_kmeans_broadcasts_model_state_only(spark):
    """k-means' only broadcast is the k x dims centroid relation (model
    state, bytes); the N x k scoring fan-out must be a broadcast nested
    loop over that tiny side, never a CartesianProduct of data with
    data, and the hot arithmetic stays JVM-side (no Python eval)."""
    plan = plan_of(spark, "k13_kmeans_embed")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_k15_chunk_dedup_is_window_not_selfjoin(spark):
    """Corpus-wide chunk dedup must be the K1 shape — rank-1 window on
    chunk content — never a chunk-level self-join (which would square)."""
    plan = plan_of(spark, "k15_chunk_dedup")
    assert "Window" in plan
    assert "Join" not in plan


def test_k16_semantic_dedup_joins_on_cluster_key(spark):
    """SemDeDup's pair search must be keyed on the cluster id (blocked
    pair space), never a cartesian of the corpus with itself."""
    plan = plan_of(spark, "k16_semantic_dedup")
    assert "CartesianProduct" not in plan
    # the only BNLJ allowed is the k-centroid broadcast of the assign step;
    # the pairwise stage must be a hash join on cid
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_c14_nullsafe_is_hash_join_not_bnlj(spark):
    """EqualNullSafe must stay a hash/sort-merge join key, never degrade to
    BroadcastNestedLoopJoin (which would be O(n*m) at scale)."""
    plan = plan_of(spark, "c14_nullsafe_join")
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan


def test_c15_broadcasts_dims_no_cartesian(spark):
    """The Q5-shaped chain broadcasts every dimension (region/nation/supplier)
    and never cross-joins; only the FK spine shuffles."""
    plan = plan_of(spark, "c15_regional_revenue")
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan
    assert "NestedLoop" not in plan
    # region filter reaches the scan
    assert "IsNotNull(r_name)" in plan or "r_name" in plan


def test_k20_single_shuffle_window(spark):
    """Sequence packing is one window pass: a single hash exchange on source,
    no self-join (a join-based packing would double-scan the corpus)."""
    plan = plan_of(spark, "k20_sequence_pack")
    assert "Join" not in plan


def test_a14_parquet_aggregate_pushdown(spark):
    """COUNT/MIN/MAX with no filter compute from parquet footer stats when the
    DSv2 reader is on — a metadata-only scan (no row decode). At 100 TB this
    turns full-table census queries into a footer sweep."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    old = spark.conf.get("spark.sql.sources.useV1SourceList")
    try:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").agg(
            F.count(F.lit(1)).alias("n"), F.min("l_quantity").alias("mn")
        )
        plan = physical_plan(df)
        assert "PushedAggregation: [COUNT(*), MIN(l_quantity)]" in plan
        row = df.collect()[0]
        assert row["n"] == 6000 and row["mn"] >= 0
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old)
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")


def test_runtime_bloom_filter_join_pruning(spark):
    """A selective dim-side filter injects a runtime bloom filter on the fact
    side of a shuffle join (might_contain pre-filters the shuffle input).
    This is the semi-join-reduction path AQE uses at 100 TB when the dim side
    is too big to broadcast but still selective."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        part = spark.read.parquet(f"{SF_SMOKE}/part.parquet").filter(
            F.col("p_brand") == "Brand#13"
        )
        j = li.join(part, li.l_partkey == part.p_partkey).groupBy(
            "p_brand"
        ).count()
        plan = physical_plan(j)
        assert "might_contain" in plan.lower() or "bloomfilter" in plan.lower()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            str(10 * 1024 * 1024 * 1024),
        )


def test_t4_funnel_single_user_shuffle_no_join(spark):
    # The funnel is chained running windows + per-user agg over ONE
    # (user_id) hash exchange and ONE sort — never the oracle's
    # three-round aggregate-join cascade.
    plan = plan_of(spark, "t4_funnel_analysis")
    assert "Join" not in plan
    assert plan.count("hashpartitioning(user_id") == 1
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 1


def test_t5_cohort_no_join_no_distinct_two_exchanges(spark):
    # Cohort retention must stay the collect_set form: per-user agg +
    # explode + cell agg — never the distinct→min→join-back cascade.
    plan = plan_of(spark, "t5_cohort_retention")
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 2


def test_t6_transitions_no_self_join(spark):
    # The transition matrix is a lag window, not the C11 self-join: the
    # events table must appear (and shuffle) exactly once.
    plan = plan_of(spark, "t6_event_transitions")
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_k24_bigram_score_join_is_broadcast(spark):
    # The bigram model joins back by broadcast — corpus rows never shuffle
    # for scoring — and the bigram expansion is map-side (no extra sort).
    plan = plan_of(spark, "k24_bigram_surprisal")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_k26_curation_pipeline_shape(spark):
    # One DAG: no joins, no cartesian, and at most three hash exchanges
    # (digest window, lang packing window, final report agg).
    plan = plan_of(spark, "k26_curation_pipeline")
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) <= 3


def test_c17_fuzzy_block_join_is_equi(spark):
    # The fuzzy join must hash/merge on the block key (noun) — the edit
    # distance is a post-join filter, never a nested-loop condition — and
    # pairing runs on the distinct-name vocabulary, so the part scan feeds
    # an aggregate before any join.
    plan = plan_of(spark, "c17_fuzzy_name_match")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "partial" in plan


def test_c18_fact_filter_pushed_dims_broadcast(spark):
    # Both nation filters collapse the dimension sides pre-join; the
    # lineitem date filter reaches the parquet scan.
    plan = plan_of(spark, "c18_nation_volume")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_t8_cusum_single_fact_pass(spark):
    # CUSUM = one fact aggregate (map-side partials) + two windows over
    # the tiny daily series — no join, one scan.
    plan = plan_of(spark, "t8_cusum_changepoint")
    assert "Join" not in plan
    assert "partial_sum" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_k27_bm25_model_sides_broadcast(spark):
    # Corpus stats (1 row) and per-term DF (|terms| rows) broadcast back
    # onto the token stream — the corpus never shuffles for scoring.
    plan = plan_of(spark, "k27_bm25_rank")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_k28_rrf_fuses_rank_relations_only(spark):
    # The fusion join runs on compact (doc_id, rank) relations; the only
    # nested-loop is the broadcast 1-row query vector.
    plan = plan_of(spark, "k28_hybrid_rrf")
    assert "CartesianProduct" not in plan


def test_gr1_pagerank_keyed_joins_no_cartesian(spark):
    # Every iteration joins on node keys; the only nested-loop is the
    # broadcast 1-row constants relation.
    plan = plan_of(spark, "gr1_pagerank")
    assert "CartesianProduct" not in plan


def test_dq3_cohort_filters_pushed(spark):
    # Both cohort scans push the date predicate into parquet; everything
    # after runs on the 10-row bucket spine.
    plan = plan_of(spark, "dq3_distribution_drift")
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_t10_twap_one_window_one_aggregate(spark):
    # TWAP = lead window + keyed aggregate, no join; events scanned once.
    plan = plan_of(spark, "t10_time_weighted_avg")
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_i14_dynamic_session_no_join(spark):
    # Native session_window with a dynamic gap stays a single-table
    # window aggregation — no self-join islands emulation.
    plan = plan_of(spark, "i14_dynamic_session_window")
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_k39_passage_chunking_is_mapside(spark):
    # Chunk expansion must be a map-side explode feeding the BM25
    # aggregate — no extra exchange between scan and the (unit, term)
    # count, and the model joins stay broadcast.
    plan = plan_of(spark, "k39_passage_retrieval")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the explode


def test_k41_classifier_is_pure_projection(spark):
    # Model inference = one scan + projection; no shuffle, no join.
    plan = plan_of(spark, "k41_quality_classifier")
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_registry_plan_lint(spark):
    # Whole-registry sweep (tools/plan_lint.py): no cartesian products
    # outside the declared cross join, no row-at-a-time Python
    # evaluation, no hidden persisted-relation dependencies — the
    # hand-pinned assertions above, generalized to every declared query.
    from tools.plan_lint import lint

    violations = lint(spark, SF_SMOKE)
    assert violations == {}, violations


def test_t12_ewma_single_window_pass(spark):
    # All 19 LAG taps + the current row must share ONE window over ONE
    # (event_type) exchange and ONE sort — never a window per tap.
    plan = plan_of(spark, "t12_ewma_smoothing")
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 1


def test_t11_interval_sweeps_are_windows_not_selfjoins(spark):
    # Island merge and depth sweep are ordered windows; the only joins
    # combine the two tiny per-key censuses (broadcast), never interval
    # pairs (no sort-merge, no cartesian).
    plan = plan_of(spark, "t11_interval_coverage")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) >= 2


def test_k46_pair_explode_is_over_vocabulary(spark):
    # The pair Generate must sit ABOVE the word-frequency aggregate:
    # explode fan-out scales with |vocab|, not corpus tokens — so the
    # vocab aggregate's exchange must sit between the two Generates
    # (formatted-plan node ids increase leaf-to-root).
    plan = plan_of(spark, "k46_bpe_pair_counts")
    gen_ids = [int(i) for i in re.findall(r"\((\d+)\) Generate\b", plan)]
    exch_ids = [int(i) for i in re.findall(r"\((\d+)\) Exchange\b", plan)]
    assert len(gen_ids) == 2 and len(exch_ids) == 2
    assert gen_ids[0] < exch_ids[0] < gen_ids[1]
    assert "Join" not in plan


def test_gr2_triangle_edges_exchange_reused(spark):
    # The edge relation feeds deg/oriented/e3; since round 11 the two
    # intermediates whose recompute repeats real work (the co-occurrence
    # relation inside _backbone_edges, deg) are localCheckpoint-
    # materialized, so the executed plan must contain NO parquet scan at
    # all (the backbone is built once upstream; the r10 plan re-derived
    # it 69 times) — its inputs are the checkpointed RDDs — and triangle
    # formation stays keyed (no cartesian). `edges` is a narrow filter
    # over the co RDD (its σ-threshold is an observed literal) and
    # `oriented` deliberately recomputes (Exchange reuse dedupes it
    # inside the one final job; eager ckpts of either measured slower).
    df = REGISTRY["gr2_triangle_count"].fn(spark, SF_SMOKE)
    df.collect()
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0
    assert "Scan ExistingRDD" in plan


def test_dq6_audit_is_one_fact_pass(spark):
    # The daily rollup is the only fact-table work (two scans of the same
    # rollup: bounds + counts); the day spine joins the rollup by
    # BROADCAST and the trailing window runs on the driver-scale day
    # series — no sort-merge join, no cartesian.
    plan = plan_of(spark, "dq6_volume_anomaly")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2


def test_k45_rates_broadcast_onto_corpus(spark):
    # The per-language rate relation must broadcast back onto documents —
    # the corpus never shuffles for sampling.
    plan = plan_of(spark, "k45_temperature_mix")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_t13_attribution_no_join_single_user_shuffle(spark):
    # Attribution is the as-of shape: conditional running maxes in ONE
    # (user_id) window pass — never a purchase⋈touch join.
    plan = plan_of(spark, "t13_touch_attribution")
    assert "Join" not in plan
    assert plan.count("hashpartitioning(user_id") == 1


def test_k52_draw_is_broadcast_not_shuffle(spark):
    # The corpus max is a 1-row broadcast; the acceptance draw is
    # per-row — the corpus never shuffles for sampling.
    plan = plan_of(spark, "k52_importance_sampling")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_k49_truncation_recall_stays_broadcast(spark):
    # Both rankings run broadcast-queries × streamed-candidates (BNLJ over
    # the tiny query side); only the |queries|·k recall join may sort-merge.
    plan = plan_of(spark, "k49_truncation_recall")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") >= 2


def test_gr4_topk_no_global_sort(spark):
    # gr4's top-25 must compile to TakeOrderedAndProject (per-partition
    # bounded heaps), never funnel the full non-edge candidate set — the
    # component whose size grows ~3x per data decade — through a single
    # unpartitioned row_number window. The residual rnk window runs over
    # the 25-row limit result only.
    plan = plan_of(spark, "gr4_capped")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_gr4_wedges_are_mapside_pairs_not_selfjoin(spark):
    # Candidate wedges come from ONE groupBy(midpoint) aggregate with
    # in-task pair explosion (the k3/_backbone_edges shape) — the plan
    # must show the pair Generate ABOVE an ObjectHashAggregate/collect
    # boundary, never an x⋈y self-join of the adjacency (the r11
    # rewrite; the join form shuffled the adjacency twice). The
    # remaining joins are the cap semi-join, the edges anti-join and
    # the two degree attaches — all keyed, none wedge-quadratic.
    # Pinned on the INITIAL plan: at smoke scale the capped candidate
    # set is empty and AQE folds the executed plan to EmptyRelation,
    # which would vacuously hide the shape under test.
    df = REGISTRY["gr4_capped"].fn(spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "collect_set" in plan and "Generate" in plan and "explode" in plan
    assert "CartesianProduct" not in plan
    # the backbone is built once: the executed plan reads the
    # checkpointed co relation, no parquet re-scan of lineitem
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0


def test_gr3_bfs_rounds_never_cartesian(spark):
    # Each BFS round is frontier⋈adjacency on node id + left-anti visited
    # dedup — hash joins only, never a cartesian blowup. (localCheckpoint
    # per round truncates lineage, so only the final round's plan shows.)
    plan = plan_of(spark, "gr3_bfs_hops")
    assert "CartesianProduct" not in plan


def test_c21_exists_pair_decorrelates_to_semi_and_anti(spark):
    # Catalyst must rewrite the correlated EXISTS / NOT EXISTS pair into
    # a left-semi and a left-anti join — not a nested-loop re-execution.
    plan = plan_of(spark, "c21_waiting_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_dq7_benford_single_column_scan(spark):
    # The audit reads exactly one column; every other orders column must
    # be pruned from the scan, and the digit aggregate keeps partials.
    plan = plan_of(spark, "dq7_benford_audit")
    assert "o_totalprice" in plan
    for unused in ("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"):
        assert unused not in plan, f"{unused} not pruned from scan"
    assert "partial_count" in plan


def test_t14_trend_two_level_rollup(spark):
    # Daily counts collapse map-side (partial_count before the first
    # exchange); the five regression sums are exact integer aggregates —
    # no float accumulation (regr_* would float-accumulate per row).
    plan = plan_of(spark, "t14_trend_forecast")
    assert "partial_count" in plan
    assert "regr_" not in plan


def test_e11_rolling_median_single_user_shuffle(spark):
    # One hash exchange on user_id feeds the frame window; the order
    # statistic is expression-level — no join, no second shuffle.
    plan = plan_of(spark, "e11_rolling_median")
    assert "Join" not in plan
    assert plan.count("hashpartitioning(user_id") == 1


def test_join_strategy_hints_respected(spark):
    # The optimizer's strategy hints are part of the engine contract: a
    # user can force the join algorithm per-relation when the CBO guesses
    # wrong (the manual analog of the reference's hand-scheduled stages).
    from daas_apps_spark.catalog import table
    from daas_apps_spark.operators.partitioning import physical_plan

    o = table(spark, SF_SMOKE, "orders")
    c = table(spark, SF_SMOKE, "customer")
    j_merge = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    assert "SortMergeJoin" in physical_plan(j_merge)
    j_shash = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    assert "ShuffledHashJoin" in physical_plan(j_shash)
    j_bcast = o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey)
    assert "BroadcastHashJoin" in physical_plan(j_bcast)


def test_cached_table_reused_in_plan(spark):
    # spark.catalog caching surface: a cached relation must serve
    # subsequent scans from InMemoryTableScan instead of re-reading
    # parquet — the iterative-workload accelerator (GR1/K13 would reuse
    # the same mechanism for their edge/centroid relations at scale).
    from daas_apps_spark.catalog import table
    from daas_apps_spark.operators.partitioning import physical_plan

    o = table(spark, SF_SMOKE, "orders").filter("o_totalprice > 0")
    o.cache()
    try:
        o.count()  # materialize
        plan = physical_plan(o.groupBy("o_orderstatus").count())
        assert "InMemoryTableScan" in plan
    finally:
        o.unpersist()


def test_report_operators_stack_not_unionall(spark):
    # The long-form report operators unpivot ONE wide aggregate row with
    # stack() — a unionAll-of-selects would re-execute the corpus/fact
    # aggregate once per output row (k56 measured 20 scans before the
    # rewrite; these pins hold it at the documented pass count).
    for name, max_scans in (
        ("k56_dataset_card", 4),
        ("k58_filter_ablation", 2),
        ("d19_theta_sketch_setops", 2),
    ):
        plan = plan_of(spark, name)
        n = plan.count("Scan parquet")
        assert n <= max_scans, f"{name}: {n} parquet scans (max {max_scans})"


def test_c28_not_in_plans_anti_join(spark):
    # NOT IN must plan as an anti join, never a per-row subquery
    # re-execution. (Catalyst proves the subquery key non-null here and
    # legally simplifies the null-aware form to a plain LeftAnti; a
    # nullable key would require NAAJ semantics.)
    plan = plan_of(spark, "c28_supplier_part_census")
    assert "LeftAnti" in plan


def test_c26_or_brackets_push_implied_bounds(spark):
    # The three-way OR must still push its union bounds into the part
    # scan (brand IN set, size range) — disjunctions are not an excuse
    # to scan everything.
    plan = plan_of(spark, "c26_disjunctive_brackets")
    # part side: per-bracket (brand AND size-range) conjuncts survive as
    # a pushed OR tree; lineitem side: the quantity-range union pushes.
    assert "And(EqualTo(p_brand,Brand#9)" in plan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan


def test_dq11_single_type_shuffle(spark):
    # The lateness window shuffles once on event_type; the census reuses
    # that partitioning — no second fact exchange, no join.
    plan = plan_of(spark, "dq11_out_of_orderness")
    assert "Join" not in plan
    assert plan.count("hashpartitioning(event_type") >= 1


def _embeddings_vectors(spark):
    from daas_apps_spark.catalog import table
    from daas_apps_spark.operators.similarity import as_double

    import pyspark.sql.functions as F

    e = table(spark, SF_SMOKE, "embeddings")
    corpus = e.select("vec_id", as_double("embedding").alias("v"))
    cent = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), as_double("embedding").alias("cv")
    )
    return corpus, cent


def test_centroid_assignment_is_mapside_aggregate_not_window(spark):
    # The IVF/k-means nearest-centroid argmax must be a max_by aggregate
    # whose PARTIAL stage collapses the |corpus| x n_centroids broadcast
    # fan-out map-side — the Exchange carries ONE row per vector. A
    # row_number() window here would shuffle the k-fold-expanded corpus
    # (a thousands-fold expansion at realistic nlist), the round-9
    # scale-killer this pin retires.
    from daas_apps_spark.operators.partitioning import physical_plan
    from daas_apps_spark.operators.similarity import nearest_centroid

    corpus, cent = _embeddings_vectors(spark)
    plan = physical_plan(nearest_centroid(corpus, cent, payload=("cent_id", "v")))
    assert "Window" not in plan
    assert "partial_max_by" in plan
    # partial aggregate sits in the broadcast-join stage, before the
    # single hash Exchange on vec_id
    assert plan.count("+- Exchange") == 1
    assert plan.index("partial_max_by") > plan.index("+- Exchange")  # formatted list: Exchange node printed above its child agg
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_ann_index_assignment_same_plan_shape(spark):
    from daas_apps_spark.operators.ann_index import assign_to_centroids
    from daas_apps_spark.operators.partitioning import physical_plan

    corpus, cent = _embeddings_vectors(spark)
    plan = physical_plan(assign_to_centroids(corpus, cent))
    assert "Window" not in plan
    assert "partial_max_by" in plan
    assert plan.count("+- Exchange") == 1


def test_kmeans_assign_is_mapside_min_by(spark):
    import pyspark.sql.functions as F

    from daas_apps_spark.operators.clustering import _assign
    from daas_apps_spark.operators.partitioning import physical_plan

    corpus, cent = _embeddings_vectors(spark)
    vectors = corpus.withColumn("label", F.lit("x"))
    centroids = cent.select(F.col("cent_id").alias("cid"), F.col("cv").alias("c"))
    plan = physical_plan(_assign(vectors, centroids))
    assert "Window" not in plan
    assert "partial_min_by" in plan
    assert plan.count("+- Exchange") == 1


def test_pq_encode_is_mapside_min_by(spark):
    from daas_apps_spark.operators.partitioning import physical_plan
    from daas_apps_spark.operators.similarity import pq_reconstructions

    corpus, _ = _embeddings_vectors(spark)
    plan = physical_plan(pq_reconstructions(corpus))
    # the codeword fan-out (|corpus| x PQ_M x |codebook|) must collapse
    # in a partial min_by before any Exchange; no window anywhere
    assert "Window" not in plan
    assert "partial_min_by" in plan
