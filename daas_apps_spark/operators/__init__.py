"""Operator modules. Importing this package registers every declared query.

Module map (SURVEY.md §2 categories):

- ``relational``  — A scans/provenance, B projection/filter, C joins
- ``aggregates``  — D aggregation, F sort/limit/top-k, G set ops
- ``windows``     — E window functions, R5-style dedup-by-rank
- ``scalars``     — H scalar function library (string/date/math/array/map/json)
- ``asof``        — C10 as-of join helper
- ``udfs``        — J pandas UDF / grouped-map / UDTF surface (R7/R10 analogs)
- ``dedup``       — K1-K3 exact + minhash/LSH near-dedup
- ``similarity``  — K4 embedding top-k similarity search
- ``text``        — K5/K6/K8 text analysis, quality, TF/DF
- ``multimodal``  — K7 binary-payload column handling
- ``streaming_batch`` — I1-I7 event-time logic in batch-equivalence mode
- ``corpus``      — K9-K11 corpus construction: hash sampling, splits,
  token counting, chunking, PII redaction, quality census, mini pipeline
- ``decontam``    — K12 benchmark decontamination + repetition analysis
- ``clustering``  — K13 deterministic k-means over embeddings
"""

# Registration order is deliberate: the driver's correctness budget verified
# only the first ~50 registered queries in round 1, so the modules with zero
# driver coverage (io, asof, udfs, dedup, similarity, text, multimodal,
# streaming_batch, partitioning, pipelines) register FIRST — if the budget
# truncates again, it verifies the previously-untouched surface first.
from daas_apps_spark.sources import io  # noqa: F401  (A2-A7 round-trips)
from daas_apps_spark.sources import python_datasource  # noqa: F401  (A11)
from daas_apps_spark.operators import (  # noqa: F401
    timeseries,
    mllib_lsh,
    ranking,
    graph,
    decontam,
    clustering,
    chunk_dedup,
    corpus,
    asof,
    udfs,
    dedup,
    similarity,
    text,
    multimodal,
    streaming_batch,
    partitioning,
    pipelines,
    composed,
    relational,
    aggregates,
    windows,
    scalars,
)

# Registry verification-priority order. The driver's correctness budget
# verified only the first ~50 registered queries in round 1, so ordering IS
# coverage policy:
#   1. the queries whose round-1 rows were red (representation mismatches,
#      since fixed — VERDICT.md "What's wrong" 1-2) — re-measure first;
#   2. every query with NO driver correctness row yet (all additions since
#      the round-1 snapshot, in module order above);
#   3. the queries round 1 already verified green (frozen list below from
#      CORRECTNESS_r01.json) — still checked, but last: under a truncating
#      budget the untouched surface wins the slots.
from daas_apps_spark.registry import REGISTRY as _R

_REVERIFY_FIRST = [
    "b2_computed_projection",
    "b6_conditional_expressions",
    "d6_ordered_collect",
    "h_array_functions",
    "h_map_functions",
    "h_array_nested_functions",
]
_R01_VERIFIED_LAST = [
    "a1_scan_counts", "a4_provenance_scan", "a8_sql_view_parity",
    "b4_filter_predicates", "c1_join_orders_customer", "c2_left_outer_join",
    "c2_full_outer_join", "c3_semi_join", "c4_anti_join", "c5_broadcast_join",
    "c6_multikey_join", "c7_range_join_bands", "c8_cross_join",
    "c9_interval_point_join", "c11_self_join_sequences", "q1_pricing_summary",
    "d2_global_aggregate", "d3_multi_distinct", "d4_approx_count_distinct",
    "d5_rollup", "d5_cube", "d7_stats_aggregates", "d8_argmax_argmin",
    "d9_filtered_aggregate", "d10_histogram", "f1_sorted_limit_nulls",
    "f4_top_k", "f5_top_k_per_group", "g1_union_all", "g2_union_distinct",
    "g3_intersect", "g4_except_all", "g3_intersect_all", "e1_dedup_keep_best",
    "e2_ranking_functions", "e3_lag_lead", "e4_running_total",
    "e5_sliding_frame", "e6_first_last_value", "e7_percentiles",
    "h_string_functions", "h_date_functions", "h_math_functions",
    "h_json_functions", "h_hash_null_functions",
]
_ordered = {n: _R[n] for n in _REVERIFY_FIRST if n in _R}
_ordered.update(
    {n: s for n, s in _R.items()
     if n not in _ordered and n not in _R01_VERIFIED_LAST}
)
_ordered.update({n: _R[n] for n in _R01_VERIFIED_LAST if n in _R})
_R.clear()
_R.update(_ordered)
