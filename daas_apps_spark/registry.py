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
    # round-9 debuts (must be sampled in their debut round)
    "a44_conditional_merge",
    "a45_sql_catalog",
    "a46_copy_into",
    "a47_sql_surface_r9",
    "k69_incremental_ann",
    "k70_lakehouse_corpus_ingest",
    # last evidence round 1 (incl. the deliberately-deferred flagship)
    "q1_pricing_summary",
    "h_math_functions",
    "h_string_functions",
    # last evidence round 2
    "b2_computed_projection",
    "b6_conditional_expressions",
    "c17_fuzzy_name_match",
    "d6_ordered_collect",
    "h_array_functions",
    "h_array_nested_functions",
    "h_map_functions",
    "k17_incremental_dedup",
    "k1_exact_dedup",
    "k2_minhash_signatures",
    "k2_simhash",
    "k31_minhash_estimator_audit",
    "k3_dedup_clusters",
    "k3_lsh_near_dedup",
    "k3_ngram_jaccard",
    "k43_survivor_policies",
    "k47_leakage_safe_split",
    "k54_cross_source_dup_matrix",
    "k66_neardup_transitivity",
    # oldest round-3 evidence (B SQL front-end + the as-of trio +
    # the first TPC-H compositions); the rest of r3 rolls into r10
    "b9_correlated_exists",
    "b10_lateral_topk",
    "b11_scalar_subquery",
    "b12_parameterized_sql",
    "b13_recursive_cte",
    "b14_sql_scripting",
    "b15_null_handling",
    "b16_group_by_all",
    "b17_pipe_syntax",
    "b18_select_except",
    "b19_values_inline_table",
    "c10_asof_join",
    "c10_asof_forward",
    "c10_asof_nearest",
    "c12_shipping_priority",
    "c13_large_orders",
    "c14_nullsafe_join",
    "c15_bucketed_layout",
    "c15_regional_revenue",
    "c18_nation_volume",
    "c19_excess_stock",
    "c20_market_share",
    # c21_bucketed_layout / c21_waiting_supplier roll to round 10 (the
    # a47/k70 debut slots take precedence — debuts must be sampled in
    # their debut round)
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
