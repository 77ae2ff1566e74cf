"""Storage-layout compaction: rewrite fixtures with scan-splittable row groups.

Storage layout is part of the engine (SURVEY.md §6 M6): at 100 TB the ingest
path writes ~128 MB row groups so every executor core gets a split — the
Spark analog of the reference's one-chunk-per-task scatter step
(SparkCaller.java:79 ``parallelize(files, files.size())``). The driver's
fixtures are single-row-group files (convenient to generate, hostile to
Spark's split planning: a Parquet split can never be smaller than one row
group, so a single-row-group table scans on ONE core while DuckDB's decoder
parallelizes inside the group).

``compact_dir`` rewrites each fixture with ``parts`` row groups — identical
rows, identical schema, only the physical chunking changes — and caches the
result keyed by source mtimes so repeated bench runs pay nothing. This is the
local stand-in for the OPTIMIZE/compaction job a production deployment runs
after ingest.
"""

from __future__ import annotations

import json
import math
import os
import tempfile

import pyarrow.parquet as pq

from daas_apps_spark.catalog import TABLES

DEFAULT_PARTS = 32


def compact_dir(sf_dir: str, dest: str | None = None, parts: int = DEFAULT_PARTS) -> str:
    """Rewrite every fixture in ``sf_dir`` with ``parts`` row groups.

    Returns the directory holding the compacted copies. Idempotent: a marker
    file records source (path, mtime, size) triples; matching markers skip the
    rewrite entirely.
    """
    sf_dir = os.path.abspath(sf_dir)
    if dest is None:
        tag = sf_dir.strip("/").replace("/", "_")
        dest = os.path.join(tempfile.gettempdir(), f"spark_graft_layout_{tag}")
    os.makedirs(dest, exist_ok=True)

    sources = {}
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            st = os.stat(src)
            sources[t] = [src, st.st_mtime, st.st_size]

    marker = os.path.join(dest, "_LAYOUT_MARKER.json")
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                if json.load(fh) == {"parts": parts, "sources": sources}:
                    return dest
        except (json.JSONDecodeError, OSError):
            pass

    for t, (src, _, _) in sources.items():
        tbl = pq.read_table(src)
        rg = max(1024, math.ceil(tbl.num_rows / parts))
        pq.write_table(tbl, os.path.join(dest, f"{t}.parquet"), row_group_size=rg)

    with open(marker, "w") as fh:
        json.dump({"parts": parts, "sources": sources}, fh)
    return dest


def drop_persisted_rdds(spark) -> None:
    """Unpersist every RDD still pinned in the block store — the
    ``localCheckpoint()`` blocks some queries materialize multiply-
    consumed intermediates into. Shared by the bench and scaling-curve
    harnesses: without the sweep between runs, checkpointed blocks from
    every prior run accumulate in the unified memory region and push
    later queries into cache eviction, inflating their timings (the
    BENCH_r04 c6_bucketed 10.45s artifact). Consumers have fully
    materialized when this runs, so dropping the blocks is safe — the
    next run rebuilds its own checkpoint from scratch, exactly the
    no-cross-run-reuse protocol."""
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist()


def tune_scan_confs(spark) -> None:
    """Size split planning so each compacted row group becomes its own task.

    At 100 TB these stay at their defaults (128 MB splits over 128 MB row
    groups); locally the fixtures are tiny, so without this the file packer
    (``filesOpenCostInBytes`` default 4 MB) would glue all row groups of a
    small table back into one split and undo the compaction.
    """
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(16 * 1024))
    # Fewer initial reduce partitions: at sub-GB scale, per-task scheduling
    # overhead outweighs parallelism past ~half the cores (measured: 16 beats
    # 32 by ~20% on the sf0.1 headline set). AQE still coalesces further at
    # runtime; at cluster scale this would instead be ~2-3x total cores.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.shuffle.partitions", str(max(8, cpus // 2)))
    # AQE coalesce targets, sized for sub-GB local shuffles: the 64 MB default
    # advisory size would coalesce every bench shuffle to ONE partition and
    # single-thread the final aggregates (measured: c6 0.95s with these vs
    # 1.25s at defaults). At cluster scale leave the defaults — 64 MB
    # post-shuffle partitions are right when the shuffle is TBs.
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(4 * 1024 * 1024))
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", str(256 * 1024)
    )
