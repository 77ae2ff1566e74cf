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


def get_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def bench_queries() -> dict[str, QuerySpec]:
    _load_all()
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}
