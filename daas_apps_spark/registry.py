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
    # round-10 debuts (must be sampled in their debut round)
    "a48_materialized_view",
    "a49_sql_transaction",
    "a50_create_table_clauses",
    "a51_join_mv",
    "a52_star_mv",
    "k71_corpus_stats_mv",
    # plan-changed this round (the map-side max_by centroid-assignment
    # rewrite, VERDICT r9 prescription 1): re-verify under the driver
    # gate even where r4/r5 evidence exists — changed code outranks
    # stale-but-unchanged code in the rotation
    "k4_ann_ivf_topk",
    "k4_ann_ivf_pq_topk",
    "k4_ann_ivf_pq_rerank",
    "k13_kmeans_embed",
    "k16_semantic_dedup",
    "k25_quantized_recall",
    "k49_truncation_recall",
    # last evidence round 3: the full remaining r3 cohort — incl.
    # c21_waiting_supplier / c21_bucketed_layout, rolled from round 9
    # (commit 4027184) when the a47/k70 debut slots took precedence
    "c21_bucketed_layout",
    "c21_waiting_supplier",
    "c22_small_quantity_revenue",
    "c23_sales_opportunity",
    "c24_customer_distribution",
    "c25_order_priority_check",
    "c26_disjunctive_brackets",
    "c27_top_supplier",
    "c28_supplier_part_census",
    "c29_min_cost_supplier",
    "i11_stream_left_join",
    "i14_dynamic_session_window",
    "i1_tumbling_window",
    "i2_sliding_window",
    "i3_session_window",
    "i4_watermark_lateness",
    "i5_streaming_dedup",
    "i6_stateful_running",
    "i7_stream_static_join",
    "i8_stream_stream_join",
    "j1_scalar_pandas_udf",
    "j2_grouped_map_normalize",
    "j3_grouped_agg_median",
    "j4_mapinpandas_enrich",
    "j5_cogrouped_reconcile",
    "j6_udtf_bigrams",
    "j7_sql_registered_udf",
    # oldest round-4 evidence (data-quality battery first; the rest of
    # r4 — graph kernels, remaining J/K names — rolls into round 11)
    "dq2_key_uniqueness",
    "dq3_distribution_drift",
    "dq4_constraint_audit",
    "dq5_functional_dependency",
    "dq6_volume_anomaly",
    "dq7_benford_audit",
    "dq8_offset_completeness",
    "dq9_embedding_audit",
    "dq10_embedding_drift",
    "dq11_out_of_orderness",
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
