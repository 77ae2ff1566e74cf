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

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daas_apps_spark.catalog import TABLES, table


class PipelineSpecError(ValueError):
    """A spec defect caught by :func:`validate_pipeline` — raised with every
    problem listed, BEFORE any Spark job runs (the analyzer-style early check;
    the reference's analog is the up-front BQSR/-S dependency test,
    SparkCaller.java:401-404)."""


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


def _stage_window(df: DataFrame, p: dict) -> DataFrame:
    """Windowed analytics columns over one shared (partition_by, order_by)
    spec — the E-surface as a pipeline stage. ``cols`` maps new column
    names to window-function expressions (``row_number()``, ``sum(x)``,
    ``lag(y, 1)``, ...); optional ``frame_rows: [lo, hi]`` sets a ROWS
    frame, ``null`` meaning unbounded on that side."""
    from pyspark.sql import Window

    w = Window.partitionBy(*p["partition_by"]).orderBy(
        *[_sort_expr(e) for e in p["order_by"]]
    )
    if "frame_rows" in p:
        lo, hi = p["frame_rows"]
        w = w.rowsBetween(
            Window.unboundedPreceding if lo is None else lo,
            Window.unboundedFollowing if hi is None else hi,
        )
    for name, expr in p["cols"].items():
        df = df.withColumn(name, F.expr(expr).over(w))
    return df


def _stage_sort(df: DataFrame, p: dict) -> DataFrame:
    return df.orderBy(*[_sort_expr(e) for e in p["by"]])


def _stage_limit(df: DataFrame, p: dict) -> DataFrame:
    return df.limit(p["n"])


def _stage_sample(df: DataFrame, p: dict) -> DataFrame:
    """Deterministic hash sample (K9 semantics): keep rows whose md5-derived
    integer of ``key`` falls under ``permille``/1000. A pure content
    function — reproducible across partitionings, engines, and re-runs,
    unlike seeded ``df.sample``."""
    key, permille = p["key"], p["permille"]
    return df.filter(
        F.expr(
            f"cast(conv(substring(md5(cast({key} as string)), 1, 7), 16, 10)"
            f" as bigint) % 1000 < {int(permille)}"
        )
    )


def _stage_union(df: DataFrame, p: dict, spark: SparkSession, sf_dir: str) -> DataFrame:
    return df.unionByName(build_pipeline(spark, p["pipeline"], sf_dir))


def _stage_asof_join(
    df: DataFrame, p: dict, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """C10 as-of join as a declarative stage: enrich each row with the
    latest (or per ``direction``, nearest/next) state row from another
    table along the time axis — the composite operator reused from
    operators/asof.py, so the spec layer gets the single-shuffle plan,
    not a re-derivation."""
    from daas_apps_spark.operators.asof import asof_join

    right = table(spark, sf_dir, p["table"])
    if "right_filter" in p:
        right = right.filter(p["right_filter"])
    return asof_join(
        df,
        right,
        on=p["on"],
        left_time=p["left_time"],
        right_time=p["right_time"],
        right_payload=p["payload"],
        how=p.get("how", "inner"),
        direction=p.get("direction", "backward"),
        tolerance_secs=p.get("tolerance_secs"),
    )


_STAGES = {
    "filter": _stage_filter,
    "select": _stage_select,
    "with_columns": _stage_with_columns,
    "aggregate": _stage_aggregate,
    "dedup": _stage_dedup,
    "window": _stage_window,
    "sort": _stage_sort,
    "limit": _stage_limit,
    "sample": _stage_sample,
}
_CONTEXT_STAGES = {
    "join": _stage_join,
    "union": _stage_union,
    "asof_join": _stage_asof_join,
}


# Per-op required parameters (validated before execution).
_REQUIRED_PARAMS: dict[str, tuple[str, ...]] = {
    "filter": ("condition",),
    "select": ("columns",),
    "with_columns": ("columns",),
    "join": ("table", "on"),
    "aggregate": ("aggs",),
    "dedup": ("keys", "order_by"),
    "window": ("partition_by", "order_by", "cols"),
    "sort": ("by",),
    "limit": ("n",),
    "sample": ("key", "permille"),
    "union": ("pipeline",),
    "asof_join": ("table", "on", "left_time", "right_time", "payload"),
}
_SINK_MODES = ("errorifexists", "error", "overwrite", "append", "ignore")
_SINK_FORMATS = ("parquet", "csv", "json", "orc")
_VT_SINK_MODES = ("append", "overwrite", "merge")


def validate_pipeline(
    spec: dict[str, Any], sf_dir: str | None = None, _where: str = "pipeline"
) -> None:
    """Analyzer-style spec validation: reject structural defects up front.

    Pure Python — touches no SparkSession and runs no job, so a typo'd join
    table or sink mode fails in milliseconds with a spec-level message
    instead of surfacing as a Spark error mid-run. Checks: source presence,
    source/join table names (against the catalog and, when ``sf_dir`` is
    given, the files on disk), per-op required parameters, unknown ops, sink
    mode/format enums, and contradictory sink options. All problems are
    reported in one raise.
    """
    errors: list[str] = []

    def check_table(name: object, where: str) -> None:
        if not isinstance(name, str) or name not in TABLES:
            errors.append(f"{where}: unknown table {name!r}; known: {TABLES}")
        elif sf_dir is not None and not os.path.exists(
            os.path.join(sf_dir, f"{name}.parquet")
        ):
            errors.append(f"{where}: table {name!r} has no parquet file in {sf_dir}")

    src = spec.get("source")
    if not isinstance(src, dict) or (
        "table" not in src
        and "path" not in src
        and "versioned_table" not in src
    ):
        errors.append(
            f"{_where}.source: needs 'table', 'path', or 'versioned_table'"
        )
    elif "table" in src:
        check_table(src["table"], f"{_where}.source")
    elif "versioned_table" in src:
        v = src.get("version")
        if v is not None and not isinstance(v, int):
            errors.append(f"{_where}.source: 'version' must be an int")

    stages = spec.get("stages", [])
    if not isinstance(stages, list):
        errors.append(f"{_where}.stages: must be a list, got {type(stages).__name__}")
        stages = []
    for i, stage in enumerate(stages):
        where = f"{_where}.stages[{i}]"
        if stage is None:
            continue  # R17 elision
        if not isinstance(stage, dict):
            errors.append(f"{where}: must be a dict or None")
            continue
        op = stage.get("op")
        if op not in _REQUIRED_PARAMS:
            errors.append(
                f"{where}: unknown op {op!r}; known: {sorted(_REQUIRED_PARAMS)}"
            )
            continue
        for param in _REQUIRED_PARAMS[op]:
            if param not in stage:
                errors.append(f"{where}: op {op!r} requires {param!r}")
        if op in ("join", "asof_join") and "table" in stage:
            check_table(stage["table"], where)
        if op == "limit" and not isinstance(stage.get("n"), int):
            errors.append(f"{where}: limit 'n' must be an int")
        if op == "sample" and "permille" in stage:
            pm = stage["permille"]
            if not isinstance(pm, int) or not (0 <= pm <= 1000):
                errors.append(f"{where}: sample 'permille' must be an int in [0, 1000]")
        if op == "window":
            if "cols" in stage and (
                not isinstance(stage["cols"], dict) or not stage["cols"]
            ):
                errors.append(f"{where}: window 'cols' must be a non-empty dict")
            fr = stage.get("frame_rows")
            if fr is not None and (
                not isinstance(fr, (list, tuple))
                or len(fr) != 2
                or not all(v is None or isinstance(v, int) for v in fr)
            ):
                errors.append(
                    f"{where}: window 'frame_rows' must be [lo, hi] ints or null"
                )
        if op == "union" and isinstance(stage.get("pipeline"), dict):
            try:
                validate_pipeline(stage["pipeline"], sf_dir, f"{where}.pipeline")
            except PipelineSpecError as e:
                errors.extend(str(e).split("\n")[1:])

    sink = spec.get("sink")
    if sink is not None:
        if isinstance(sink, dict) and "versioned_table" in sink:
            # lakehouse sink: commits into the versioned table format
            # (sources/table_format.py) instead of writing loose files
            mode = sink.get("mode", "append")
            if mode not in _VT_SINK_MODES:
                errors.append(
                    f"{_where}.sink: unknown versioned-table mode {mode!r};"
                    f" known: {_VT_SINK_MODES}"
                )
            if mode == "merge" and not sink.get("merge_keys"):
                errors.append(
                    f"{_where}.sink: versioned-table mode 'merge' requires"
                    " 'merge_keys'"
                )
        elif not isinstance(sink, dict) or "path" not in sink:
            errors.append(f"{_where}.sink: needs 'path' or 'versioned_table'")
        else:
            mode = sink.get("mode", "errorifexists")
            if mode not in _SINK_MODES:
                errors.append(
                    f"{_where}.sink: unknown mode {mode!r}; known: {_SINK_MODES}"
                )
            fmt = sink.get("format", "parquet")
            if fmt not in _SINK_FORMATS:
                errors.append(
                    f"{_where}.sink: unknown format {fmt!r}; known: {_SINK_FORMATS}"
                )
            if sink.get("partition_by") and sink.get("single_file", False):
                errors.append(
                    f"{_where}.sink: partition_by and single_file are contradictory"
                    " — a partitioned layout is multiple files by definition"
                )

    if errors:
        raise PipelineSpecError(
            f"{len(errors)} spec error(s), nothing executed:\n" + "\n".join(errors)
        )


def build_pipeline(
    spark: SparkSession, spec: dict[str, Any], sf_dir: str
) -> DataFrame:
    """Interpret a pipeline spec into one lazy DataFrame DAG."""
    validate_pipeline(spec, sf_dir)
    src = spec["source"]
    if "table" in src:
        df = table(spark, sf_dir, src["table"])
    elif "versioned_table" in src:
        from daas_apps_spark.sources.table_format import VersionedTable

        df = VersionedTable(spark, src["versioned_table"]).read(
            version=src.get("version")
        )
    elif "path" in src:
        reader = spark.read
        if src.get("schema"):
            reader = reader.schema(src["schema"])
        df = reader.format(src.get("format", "parquet")).load(src["path"])
    else:
        raise ValueError(
            "pipeline source needs 'table', 'path', or 'versioned_table'"
        )

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
    if "versioned_table" in sink:
        # lakehouse sink: the pipeline's result commits as a new VERSION of
        # the table (append / overwrite / keyed merge) — time travel, change
        # feed, and the streaming source all compose with spec-driven runs
        from daas_apps_spark.sources.table_format import VersionedTable

        vt = VersionedTable(spark, sink["versioned_table"])
        mode = sink.get("mode", "append")
        if mode == "append":
            vt.append(df)
        elif mode == "overwrite":
            vt.overwrite(df)
        else:
            vt.merge(df, keys=list(sink["merge_keys"]))
        return None
    # partition_by + single_file is rejected by validate_pipeline (the pair is
    # contradictory), so exactly one shaping applies here.
    out = df.coalesce(1) if sink.get("single_file", False) else df
    writer = out.write.mode(sink.get("mode", "errorifexists"))
    if sink.get("partition_by"):
        writer = writer.partitionBy(*sink["partition_by"])
    writer.format(sink.get("format", "parquet")).save(sink["path"])
    return None


# ---------------------------------------------------------------------------
# File front-end: the "config IS the plan" lifecycle (SURVEY §3.1 step 2).
# The reference boots from a Properties file + CLI (MiscUtils.java:44-64,
# SparkCaller.java:388-426, Runner.java:73-117); the engine accepts the same
# shape — a flat key=value .properties file — plus JSON for nested specs.
# ---------------------------------------------------------------------------

_LIST_KEYS = {
    "columns", "group_by", "keys", "order_by", "by", "on", "select",
    "partition_by", "payload", "merge_keys",
}
_BOOL_KEYS = {"broadcast", "single_file", "enabled"}
_INT_KEYS = {"n", "permille", "version"}
_FLOAT_KEYS = {"tolerance_secs"}


def _coerce(key: str, value: str) -> Any:
    if key in _LIST_KEYS:
        return [v.strip() for v in value.split(",") if v.strip()]
    if key in _BOOL_KEYS:
        return value.strip().lower() in ("true", "yes", "1")
    if key in _INT_KEYS:
        return int(value.strip())
    if key in _FLOAT_KEYS:
        return float(value.strip())
    return value.strip()


def parse_properties_spec(text: str) -> dict[str, Any]:
    """Parse a flat ``key=value`` pipeline spec (Properties-style).

    Grammar (one logical line per key; ``#``/``!`` comments, blank lines ok):

    - ``source.table=lineitem`` or ``source.path=/data/x.parquet``
      (+ ``source.format=``, ``source.schema=``)
    - ``stage.<N>.op=<op>`` plus the op's params, e.g.
      ``stage.1.condition=...``; list params comma-split; per-column maps as
      ``stage.<N>.agg.<name>=<expr>`` (aggregate),
      ``stage.<N>.col.<name>=<expr>`` (with_columns), and
      ``stage.<N>.win.<name>=<expr>`` (window). Stages run in numeric
      ``<N>`` order; like the reference's Properties plan, a missing number
      is simply absent — presence of the key enables the stage (R17).
    - ``sink.path=`` / ``sink.mode=`` / ``sink.format=`` /
      ``sink.partition_by=`` / ``sink.single_file=``

    Nested pipelines (the ``union`` op) need the JSON front-end; properties
    is deliberately the flat fixed-topology subset the reference supports.
    """
    source: dict[str, Any] = {}
    sink: dict[str, Any] = {}
    stages: dict[int, dict[str, Any]] = {}
    for lineno, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        if "=" not in line:
            raise PipelineSpecError(f"line {lineno}: not a key=value pair: {line!r}")
        key, value = line.split("=", 1)
        parts = key.strip().split(".")
        if parts[0] == "source" and len(parts) == 2:
            source[parts[1]] = _coerce(parts[1], value) if parts[1] != "path" else value.strip()
        elif parts[0] == "sink" and len(parts) == 2:
            sink[parts[1]] = _coerce(parts[1], value) if parts[1] != "path" else value.strip()
        elif parts[0] == "stage" and len(parts) >= 3 and parts[1].isdigit():
            st = stages.setdefault(int(parts[1]), {})
            if len(parts) == 3:
                st[parts[2]] = _coerce(parts[2], value)
            elif len(parts) == 4 and parts[2] in ("agg", "col", "win"):
                field = {"agg": "aggs", "col": "columns", "win": "cols"}[parts[2]]
                st.setdefault(field, {})[parts[3]] = value.strip()
            else:
                raise PipelineSpecError(f"line {lineno}: unrecognized key {key!r}")
        else:
            raise PipelineSpecError(f"line {lineno}: unrecognized key {key!r}")
    spec: dict[str, Any] = {"source": source}
    if stages:
        spec["stages"] = [stages[i] for i in sorted(stages)]
    if sink:
        spec["sink"] = sink
    return spec


def load_spec(path: str) -> dict[str, Any]:
    """Load a pipeline spec file: ``.json`` → JSON, anything else →
    Properties-style ``key=value``."""
    with open(path) as fh:
        text = fh.read()
    if path.endswith(".json"):
        spec = json.loads(text)
        if not isinstance(spec, dict):
            raise PipelineSpecError(f"{path}: top-level JSON must be an object")
        return spec
    return parse_properties_spec(text)


def run_pipeline_file(
    spark: SparkSession, path: str, sf_dir: str
) -> DataFrame | None:
    """Load, validate, and run a spec file — byte-equal to the dict path."""
    return run_pipeline(spark, load_spec(path), sf_dir)


def main(argv: list[str] | None = None) -> int:
    """``python -m daas_apps_spark.plans.pipeline_spec <spec> [sf_dir]``.

    The SparkCaller.main analog: config in, pipeline out. With a sink the
    pipeline writes and prints nothing; without one the result preview is
    printed (20 rows, truncated).
    """
    import argparse

    from daas_apps_spark.catalog import DEFAULT_SF_DIR
    from daas_apps_spark.session import get_spark

    ap = argparse.ArgumentParser(
        prog="daas_apps_spark.plans.pipeline_spec",
        description="Run a declarative pipeline spec (JSON or key=value properties).",
    )
    ap.add_argument("spec", help="path to the spec file (.json or .properties)")
    ap.add_argument("sf_dir", nargs="?", default=DEFAULT_SF_DIR,
                    help=f"fixture directory (default {DEFAULT_SF_DIR})")
    ap.add_argument("--validate-only", action="store_true",
                    help="check the spec and exit without running")
    args = ap.parse_args(argv)

    spec = load_spec(args.spec)
    validate_pipeline(spec, args.sf_dir)
    if args.validate_only:
        print(f"{args.spec}: ok")
        return 0
    df = run_pipeline_file(get_spark("pipeline-spec-cli"), args.spec, args.sf_dir)
    if df is not None:
        df.show(20, truncate=False)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())


# ---------------------------------------------------------------------------
# Streaming front-end: the same declarative spec over a file STREAM, landing
# in the versioned table with the exactly-once (stream_id, batch_id) guard —
# run_stream_to_versioned_table (streaming/live.py) generalized from one
# hard-coded aggregate to spec-declared group keys and additive aggregates.
# ---------------------------------------------------------------------------

_STREAM_STATELESS = ("filter", "select", "with_columns", "sample")


def validate_stream_pipeline(spec: dict[str, Any]) -> None:
    """Analyzer-style validation for a streaming spec — pure Python.

    Shape:
      stream_source: {path, schema, format?=json, max_files_per_trigger?}
      stages: stateless ops only (filter/select/with_columns/sample)
      aggregate: {group_by: [...], aggs: {name: expr}, add: [names]}
        — ``add`` lists the agg columns that are ADDITIVE across batches
        (count/sum); they combine with + on merge. Every agg must be
        listed (non-additive aggregates don't have a batch-merge law).
      stream_sink: {versioned_table: path}
    """
    errors: list[str] = []
    src = spec.get("stream_source")
    if not isinstance(src, dict) or "path" not in src or "schema" not in src:
        errors.append("stream_source: needs 'path' and 'schema' (no inference mid-stream)")
    for i, stage in enumerate(spec.get("stages", [])):
        if stage is None:
            continue
        op = stage.get("op") if isinstance(stage, dict) else None
        if op not in _STREAM_STATELESS:
            errors.append(
                f"stages[{i}]: op {op!r} not allowed in a stream pipeline;"
                f" stateless ops only: {_STREAM_STATELESS}"
            )
    agg = spec.get("aggregate")
    if not isinstance(agg, dict) or not agg.get("group_by") or not agg.get("aggs"):
        errors.append("aggregate: needs 'group_by' and 'aggs'")
    else:
        add = set(agg.get("add", []))
        missing = set(agg["aggs"]) - add
        if missing:
            errors.append(
                f"aggregate: aggs {sorted(missing)} not declared additive in"
                " 'add' — cross-batch merge is only defined for additive"
                " (count/sum-shaped) aggregates"
            )
        unknown = add - set(agg["aggs"])
        if unknown:
            errors.append(
                f"aggregate: 'add' names {sorted(unknown)} that are not in"
                " 'aggs' — typo'd names would otherwise fail mid-stream"
            )
    sink = spec.get("stream_sink")
    if not isinstance(sink, dict) or "versioned_table" not in sink:
        errors.append("stream_sink: needs 'versioned_table'")
    if errors:
        raise PipelineSpecError(
            f"{len(errors)} spec error(s), nothing executed:\n" + "\n".join(errors)
        )


def run_stream_pipeline(
    spark: SparkSession,
    spec: dict[str, Any],
    checkpoint_dir: str,
    legacy_batch_ids_are_mine: bool = False,
) -> None:
    """Run a streaming spec to completion (availableNow) with EXACTLY-ONCE
    application into the versioned table.

    Each micro-batch applies the stateless stages, computes the declared
    aggregate, and merges it with the table's snapshot by the group keys
    — additive columns combine with +, so replay-with-merge is NOT
    idempotent by itself; idempotence comes from the (stream_id,
    batch_id) commit-metadata guard, the same Delta `txn` contract as
    run_stream_to_versioned_table (streaming/live.py), which this
    generalizes to spec-declared keys and aggregates."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import checkpoint_stream_id

    validate_stream_pipeline(spec)
    src = spec["stream_source"]
    reader = spark.readStream.schema(src["schema"])
    if src.get("max_files_per_trigger") is not None:
        reader = reader.option(
            "maxFilesPerTrigger", src["max_files_per_trigger"]
        )
    stream = getattr(reader, src.get("format", "json"))(src["path"])
    for stage in spec.get("stages", []):
        if stage is None or stage.get("enabled", True) is False:
            continue
        stream = _STAGES[stage["op"]](stream, stage)

    agg = spec["aggregate"]
    keys = list(agg["group_by"])
    add_cols = list(agg["add"])
    vt = VersionedTable(spark, spec["stream_sink"]["versioned_table"])

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from daas_apps_spark.streaming.live import applied_batch_keys

        sid = checkpoint_stream_id(checkpoint_dir)
        # legacy_batch_ids_are_mine: one-time migration switch for
        # checkpoints predating the (stream_id, batch_id) pair — see
        # streaming/live.py::applied_batch_keys
        applied = applied_batch_keys(
            vt.history(), sid, legacy_is_mine=legacy_batch_ids_are_mine
        )
        if (sid, batch_id) in applied:  # replayed batch — already committed
            return
        inc = batch_df.groupBy(*keys).agg(
            *[F.expr(e).alias(name) for name, e in agg["aggs"].items()]
        )
        try:
            state = vt.read()
        except ValueError:
            state = None
        if state is None:
            merged = inc
        else:
            s = state.select(
                *[F.col(k).alias(f"__s_{k}") for k in keys],
                *[F.col(c).alias(f"__s_{c}") for c in add_cols],
            )
            # eqNullSafe: a NULL group key is a real group in both the
            # batch aggregate and the state — a non-null-safe join would
            # grow one duplicate NULL row per micro-batch
            cond = [inc[k].eqNullSafe(s[f"__s_{k}"]) for k in keys]
            merged = inc.join(s, cond, "full_outer").select(
                *[
                    F.coalesce(inc[k], s[f"__s_{k}"]).alias(k)
                    for k in keys
                ],
                *[
                    (
                        F.coalesce(inc[c], F.lit(0))
                        + F.coalesce(s[f"__s_{c}"], F.lit(0))
                    ).alias(c)
                    for c in add_cols
                ],
            )
        vt.overwrite(
            merged, metadata={"stream_id": sid, "batch_id": batch_id}
        )

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
