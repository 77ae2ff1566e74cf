"""Declarative pipeline-spec interpreter (R17/R20 generalized).

The reference's "plan" is a java.util.Properties file: an ordered,
fixed-topology stage list where *presence of a key enables a stage*
(MiscUtils.java:44-64, the ``maybe*`` methods at SparkCaller.java:76-116),
and every stage materializes with ``collect()`` before the next starts
(SparkCaller.java:98,111,154,172,260,310).

The engine generalizes the spec to an ordered list of stage dicts
interpreted into ONE lazy DataFrame DAG — no per-stage barriers, so Catalyst
sees the whole pipeline and can push filters past joins, prune columns
through every stage, and pick physical strategies globally (§4.2#5).

Stage elision (R17): a stage that is ``None`` or carries ``"enabled": False``
is skipped — the spec-level analog of a missing Properties key.

Sink (R16): ``mode`` defaults to ``errorifexists``, matching the reference's
refuse-to-overwrite move-commit (FileMover.java:17-26).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table


def _stage_filter(df: DataFrame, p: dict) -> DataFrame:
    return df.filter(F.expr(p["condition"]))


def _stage_select(df: DataFrame, p: dict) -> DataFrame:
    return df.selectExpr(*p["columns"])


def _stage_with_columns(df: DataFrame, p: dict) -> DataFrame:
    for name, expr in p["columns"].items():
        df = df.withColumn(name, F.expr(expr))
    return df


def _stage_join(df: DataFrame, p: dict, spark: SparkSession, sf_dir: str) -> DataFrame:
    other = table(spark, sf_dir, p["table"])
    if p.get("select"):
        other = other.selectExpr(*p["select"])
    if p.get("broadcast", False):
        other = F.broadcast(other)
    return df.join(other, on=p["on"], how=p.get("how", "inner"))


def _stage_aggregate(df: DataFrame, p: dict) -> DataFrame:
    aggs = [F.expr(expr).alias(name) for name, expr in p["aggs"].items()]
    if p.get("group_by"):
        return df.groupBy(*p["group_by"]).agg(*aggs)
    return df.agg(*aggs)


def _sort_expr(spec: str):
    """Parse 'expr [ASC|DESC] [NULLS FIRST|LAST]' into a sort Column.

    ``F.expr("x DESC")`` silently parses DESC as a column *alias* (ascending
    sort) — sort direction must be applied through the Column API.
    """
    s = spec.strip()
    low = s.lower()
    nulls = None
    for suffix, kind in ((" nulls first", "first"), (" nulls last", "last")):
        if low.endswith(suffix):
            nulls, s, low = kind, s[: -len(suffix)].rstrip(), low[: -len(suffix)].rstrip()
    desc = False
    for suffix, d in ((" desc", True), (" asc", False)):
        if low.endswith(suffix):
            desc, s = d, s[: -len(suffix)].rstrip()
            break
    col = F.expr(s)
    if desc:
        return col.desc_nulls_first() if nulls == "first" else col.desc_nulls_last() if nulls == "last" else col.desc()
    return col.asc_nulls_last() if nulls == "last" else col.asc_nulls_first() if nulls == "first" else col.asc()


def _stage_dedup(df: DataFrame, p: dict) -> DataFrame:
    """R5 dedup-keep-best: rank within key by order_by, keep rank 1."""
    from pyspark.sql import Window

    w = Window.partitionBy(*p["keys"]).orderBy(*[_sort_expr(e) for e in p["order_by"]])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _stage_sort(df: DataFrame, p: dict) -> DataFrame:
    return df.orderBy(*[_sort_expr(e) for e in p["by"]])


def _stage_limit(df: DataFrame, p: dict) -> DataFrame:
    return df.limit(p["n"])


def _stage_union(df: DataFrame, p: dict, spark: SparkSession, sf_dir: str) -> DataFrame:
    return df.unionByName(build_pipeline(spark, p["pipeline"], sf_dir))


_STAGES = {
    "filter": _stage_filter,
    "select": _stage_select,
    "with_columns": _stage_with_columns,
    "aggregate": _stage_aggregate,
    "dedup": _stage_dedup,
    "sort": _stage_sort,
    "limit": _stage_limit,
}
_CONTEXT_STAGES = {"join": _stage_join, "union": _stage_union}


def build_pipeline(
    spark: SparkSession, spec: dict[str, Any], sf_dir: str
) -> DataFrame:
    """Interpret a pipeline spec into one lazy DataFrame DAG."""
    src = spec["source"]
    if "table" in src:
        df = table(spark, sf_dir, src["table"])
    elif "path" in src:
        reader = spark.read
        if src.get("schema"):
            reader = reader.schema(src["schema"])
        df = reader.format(src.get("format", "parquet")).load(src["path"])
    else:
        raise ValueError("pipeline source needs 'table' or 'path'")

    for i, stage in enumerate(spec.get("stages", [])):
        if stage is None or stage.get("enabled", True) is False:
            continue  # R17: absent/disabled stage == identity
        op = stage.get("op")
        if op in _STAGES:
            df = _STAGES[op](df, stage)
        elif op in _CONTEXT_STAGES:
            df = _CONTEXT_STAGES[op](df, stage, spark, sf_dir)
        else:
            raise ValueError(f"stage {i}: unknown op {op!r}")
    return df


def run_pipeline(
    spark: SparkSession, spec: dict[str, Any], sf_dir: str
) -> DataFrame | None:
    """Build and, if a sink is declared, write (R16 semantics); returns the
    DataFrame when there is no sink, else None."""
    df = build_pipeline(spark, spec, sf_dir)
    sink = spec.get("sink")
    if not sink:
        return df
    writer = df.write.mode(sink.get("mode", "errorifexists"))
    if sink.get("partition_by"):
        writer = writer.partitionBy(*sink["partition_by"])
    if sink.get("single_file", False):
        writer = df.coalesce(1).write.mode(sink.get("mode", "errorifexists"))
    writer.format(sink.get("format", "parquet")).save(sink["path"])
    return None
