#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (mirrors the reference's published protocol — each data point is
the mean of repeated runs with identical settings, genomics/README.md:108):
a GLOBAL untimed warm pass (every query once) so the JVM/JIT reaches steady
state before any measurement — a within-process A/B showed the same query
set runs ~33% faster after a few minutes of session work, so without the
global pass the alphabetically-early queries are charged JIT warm-up the
late ones aren't — then, per query, one more untimed warmup run
(codegen / parquet-footer warm-up), then the MEAN OF 3 timed runs. Each timed run rebuilds the DataFrame from
scratch (fresh scan → plan → execute → materialize) so no shuffle-stage
reuse leaks between runs; result sets are small by construction (every
headline query aggregates or limits).

Materialization protocol — symmetric columnar on both engines: Spark results
come back via Arrow ``toPandas()`` and DuckDB results via ``.df()``, so both
sides pay engine + columnar-transfer cost. Row-at-a-time ``collect()`` would
charge Spark a py4j per-row deserialization tax DuckDB doesn't pay (measured
+0.55s on i3's 95k-row result — more than the query itself).

Headline-set note (round 6): gr4_link_prediction's exact form left the set
(2.7x/decade candidate growth — not a plan one would run at 100x; its capped
production form gr4_capped keeps the row), and two lakehouse lifecycle rows
joined (a25_mor_sweep, a27_clone_restore_cycle). Their DuckDB "twin" is a
pure query recompute of the net state — it pays none of the commit/clone/
vector work — so those two rows structurally widen the headline ratio while
SCALING_CURVE.md shows the property that matters: their cost grows ~flat
per data decade (delta- and metadata-bound, not table-bound).

Storage layout: the fixtures are rewritten once into multi-row-group parquet
(`daas_apps_spark.sources.layout.compact_dir`) before timing — identical
data, scan-splittable chunking. See layout.py's docstring: single-row-group
files (a generator artifact, never a production layout) cap Spark's scan
parallelism at one core, which benchmarks the fixture writer rather than the
engine. The compaction cost itself is excluded, exactly as a deployment's
one-time ingest/OPTIMIZE pass is excluded from per-query latency.
"""

from __future__ import annotations

import json
import os
import sys
import time

from daas_apps_spark.registry import REGISTRY, _load_all
from daas_apps_spark.session import get_spark
from daas_apps_spark.sources.layout import (
    compact_dir,
    drop_persisted_rdds as _drop_persisted_rdds,
    tune_scan_confs,
)

RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    _load_all()
    specs = sorted(
        (s for s in REGISTRY.values() if s.bench), key=lambda s: s.name
    )
    try:
        run_dir = compact_dir(sf_dir)
        layout = "compacted multi-row-group parquet (see sources/layout.py)"
    except Exception:  # read-only/full tmp etc. — never fail the bench
        run_dir = sf_dir
        layout = "raw fixtures (compaction unavailable)"
    spark = get_spark("daas_apps_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    tune_scan_confs(spark)
    try:  # reclaim superseded-naming bucketed layouts before any ingest
        from daas_apps_spark.sources.bucketed import prune_stale_warehouse

        prune_stale_warehouse(spark)
    except Exception:
        pass

    for spec in specs:  # global warm pass: JIT + one-time ingests, untimed
        spec.fn(spark, run_dir).toPandas()
        _drop_persisted_rdds(spark)

    timings: dict[str, float] = {}
    for spec in specs:
        rows = spec.fn(spark, run_dir).toPandas()  # warmup, untimed
        assert rows is not None
        elapsed = 0.0
        for _ in range(RUNS):
            # No cross-run reuse: any persist() a query declares is cleared
            # (cache + checkpointed RDD blocks) so every timed run
            # re-executes the full scan→shuffle→agg pipeline against an
            # empty block store.
            spark.catalog.clearCache()
            _drop_persisted_rdds(spark)
            t0 = time.perf_counter()
            spec.fn(spark, run_dir).toPandas()
            elapsed += time.perf_counter() - t0
        timings[spec.name] = round(elapsed / RUNS, 4)
    _drop_persisted_rdds(spark)

    duck_timings = _duckdb_timings(run_dir, specs)

    total = round(sum(timings.values()), 4)
    duck_total = round(sum(duck_timings.values()), 4) if duck_timings else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wallclock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "duckdb_queries": duck_timings,
                "duckdb_total": duck_total,
                "ratio_vs_duckdb": round(total / duck_total, 2) if duck_total else None,
                "sf": sf,
                "runs_per_query": RUNS,
                "layout": layout,
            }
        )
    )
    sys.stdout.flush()


def _duckdb_timings(run_dir: str, specs) -> dict[str, float]:
    """Time each headline query's DuckDB oracle on the same parquet files.

    Committed alongside the Spark numbers so the recorded bench is
    self-contained: one JSON line carries both sides of the comparison and a
    stale external baseline can't contradict it. Same protocol: one untimed
    warmup, then the mean of RUNS timed executions.
    """
    try:
        import duckdb
    except ImportError:  # pragma: no cover
        return {}
    from daas_apps_spark.catalog import TABLES

    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        path = os.path.join(run_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    out: dict[str, float] = {}
    for spec in specs:
        if not spec.oracle:
            continue
        t0 = time.perf_counter()
        con.sql(spec.oracle).df()  # warmup
        warm = time.perf_counter() - t0
        # long-running oracles (the graph kernels take 15-20s each here)
        # get one timed run instead of three: a single-threaded DuckDB
        # query that long has negligible run-to-run variance, and three
        # runs would push the whole bench past a CI-style timeout
        runs = 1 if warm > 5.0 else RUNS
        elapsed = 0.0
        for _ in range(runs):
            t0 = time.perf_counter()
            con.sql(spec.oracle).df()
            elapsed += time.perf_counter() - t0
        out[spec.name] = round(elapsed / runs, 4)
    return out


if __name__ == "__main__":
    main()
