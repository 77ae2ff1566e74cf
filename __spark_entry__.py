"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`daas_apps_spark` — the engine's query registry
declares every implemented operator from SURVEY.md §2 as a named
(PySpark callable, DuckDB oracle SQL) pair; this module just re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from daas_apps_spark.registry import get_oracles, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return get_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator query (SURVEY.md §2)."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query."""
    return get_oracles()
