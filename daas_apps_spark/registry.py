"""Declared-query registry — the engine's verifiable operator contract.

Every operator in SURVEY.md §2 is declared here as a named query: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. The driver executes both sides at sf=0.01 and
hash-compares values, so each spec doubles as the operator's conformance test.

Determinism discipline (FIXTURES.md canonicalization rules) is enforced by
convention in each spec: aliased output columns matching the oracle exactly,
decimal-cast float aggregates, explicit null ordering, no nondeterministic
functions.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 ids
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] | list[str] = (),
    bench: bool = False,
):
    """Decorator: declare a query spec under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle.strip() if oracle else None,
            tags=tuple(tags),
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import daas_apps_spark.operators  # noqa: F401


# Evidence-freshness window: the round driver samples the FIRST ~50
# registered names each round, so registration order decides which
# queries get re-verified against the DuckDB oracle. This list surfaces
# (a) queries debuting this round — they must be sampled in their debut
# round — then (b) the names whose last driver evidence is oldest
# (currently rounds 1–2), so every query's oracle evidence is refreshed
# on a bounded rotation instead of only at its debut. Names not listed
# keep module registration order behind these. Recompute per round from
# CORRECTNESS_r*.json (oldest last-seen first).
WINDOW_PRIORITY: list[str] = [
    # round-8 debuts
    "a35_manifest_census",
    "a36_type_widening",
    "a37_sql_dml",
    "a38_multi_table_txn",
    "a39_snapshot_isolation",
    "a40_generated_columns",
    "a41_identity_columns",
    "a42_bloom_index",
    "a43_row_tracking",
    # last evidence round 1
    "a1_scan_counts",
    "a4_provenance_scan",
    "a8_sql_view_parity",
    "b4_filter_predicates",
    "c11_self_join_sequences",
    "c1_join_orders_customer",
    "c2_full_outer_join",
    "c2_left_outer_join",
    "c3_semi_join",
    "c4_anti_join",
    "c5_broadcast_join",
    "c6_multikey_join",
    "c7_range_join_bands",
    "c8_cross_join",
    "c9_interval_point_join",
    "d10_histogram",
    "d2_global_aggregate",
    "d3_multi_distinct",
    "d5_cube",
    "d5_rollup",
    "d7_stats_aggregates",
    "d8_argmax_argmin",
    "d9_filtered_aggregate",
    "e1_dedup_keep_best",
    "e2_ranking_functions",
    "e3_lag_lead",
    "e4_running_total",
    "e5_sliding_frame",
    "e6_first_last_value",
    "e7_percentiles",
    "f1_sorted_limit_nulls",
    "f4_top_k",
    "f5_top_k_per_group",
    "g1_union_all",
    "g2_union_distinct",
    "g3_intersect",
    "g3_intersect_all",
    "g4_except_all",
    "h_date_functions",
    "h_hash_null_functions",
    "h_json_functions",
    "h_math_functions",
    "h_string_functions",
    # q1_pricing_summary (r1 evidence) is deliberately deferred: it is
    # the flagship entry() query, smoke-run by the driver every round;
    # the remaining r1/r2 names roll into round 9's window
]


def _ordered() -> dict[str, QuerySpec]:
    front = {n: REGISTRY[n] for n in WINDOW_PRIORITY if n in REGISTRY}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    return {**front, **rest}


def get_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in _ordered().items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in _ordered().items() if spec.oracle
    }


def bench_queries() -> dict[str, QuerySpec]:
    _load_all()
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}
