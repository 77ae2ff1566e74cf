"""Opt-in bucketed fixture layout: co-located joins without per-query shuffle.

A recurring join key (lineitem.l_orderkey, orders.o_orderkey) can be baked
into the STORAGE layout: `bucketBy(n, key)` hash-partitions rows into n
bucket files at write time, and Spark's scan then reports that hash
partitioning to the planner, so every join/aggregate on the key runs with NO
Exchange — the layout IS the shuffle, paid once at ingest instead of per
query. This is the Spark analog of the reference pre-splitting BAMs per
contig so each tool run reads an already-partitioned input
(SAMSplitter.java:10-43), generalized: any self-probe query shape (TPC-H
Q21/Q13/Q17-style semi/anti/aggregate probes against the same fact) becomes
exchange-free on the probe key.

At 100 TB this is the difference between shuffling the fact table three
times per Q21 run and never shuffling it at all; the bucket count is
COMPUTED per machine and table (``default_buckets``): never below the
core count (one file per bucket caps scan parallelism), and at least
table_bytes / target_partition_bytes so a single bucket fits an
executor's scan budget, rounded to a power of two for stable re-use
across scale factors.

The materialization is cached per (sf_dir, table, key, buckets) as a managed
table in the session warehouse: first call writes, later calls reuse — the
same one-time-ingest contract as layout.compact_dir (bench.py excludes both
from per-query latency by warming up untimed).
"""

from __future__ import annotations

import glob
import hashlib
import os
import re

from pyspark.sql import DataFrame, SparkSession

from daas_apps_spark.catalog import table


def _safe(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", s).strip("_").lower()


def default_buckets(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Size the bucket count to the MACHINE and the TABLE, not a constant:
    ``max(defaultParallelism, table_bytes / maxPartitionBytes)`` rounded up
    to a power of two. One file per bucket means the bucket count caps scan
    parallelism, so it must never undershoot the core count (a 16-bucket
    table on a 32-core box wastes half the machine — measured slower than
    the raw layout at sf0.1); and each bucket must fit an executor's scan
    partition budget, so at 100 TB the bytes term dominates and grows the
    count with the data. Power-of-two rounding keeps counts stable across
    nearby scale factors (reference analog: contigs-per-partition sizing,
    SparkCaller.java:191-207)."""
    cores = spark.sparkContext.defaultParallelism
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    m = re.fullmatch(r"(\d+)\s*([kmg]?)b?", raw.strip().lower())
    target = int(m.group(1)) * {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}[m.group(2)] if m else 128 << 20
    table_bytes = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(sf_dir, f"{name}.parquet", "*.parquet"))
        or glob.glob(os.path.join(sf_dir, f"{name}.parquet"))
        if os.path.isfile(f)
    )
    n = max(cores, -(-table_bytes // target))
    return 1 << (n - 1).bit_length()


# (session id, table name) → session, for tables already materialized and
# liveness-probed this session; lets repeat calls skip the guard job
# entirely. The session object is kept in the value so its id() can never
# be recycled onto a different (restarted) session (same discipline as
# catalog._DF_CACHE).
_VERIFIED: dict[tuple[int, str], SparkSession] = {}


def _table_name(sf_dir: str, name: str, key: str, n_buckets: int) -> str:
    """Managed-table cache key: embeds a short hash of the FULL sf_dir
    path (not just its basename), so two fixture dirs whose last path
    segment collides can never serve each other's cached table."""
    full = os.path.abspath(sf_dir.rstrip("/"))
    label = (
        f"{_safe(full.rsplit('/', 1)[-1])}_"
        f"{hashlib.sha256(full.encode()).hexdigest()[:8]}"
    )
    return f"bkt_{label}_{_safe(name)}_{_safe(key)}_{n_buckets}"


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str,
    n_buckets: int | None = None,
) -> str:
    """Materialize (once) and return the managed-table name of a bucketed
    copy of fixture ``name`` hash-bucketed AND sorted on ``key``.

    `repartition(n, key)` before the bucketed write makes each task hold
    exactly one bucket, so every bucket is ONE file — the layout Spark's
    reader needs to also skip the per-partition sort for sort-merge joins
    (multi-file buckets forfeit the sortedness metadata).

    ``n_buckets=None`` sizes the count to the machine and table via
    ``default_buckets``. The managed-table name embeds a short hash of the
    FULL sf_dir path (not just its basename), so two fixture dirs whose
    last path segment collides can never serve each other's cache.
    """
    if n_buckets is None:
        n_buckets = default_buckets(spark, sf_dir, name)
    tbl = _table_name(sf_dir, name, key, n_buckets)
    if (id(spark), tbl) in _VERIFIED:
        # already materialized AND liveness-probed in this session — skip
        # the catalog round-trip and the limit(1) guard job (a per-call
        # Spark job that would otherwise tax every query using the table)
        return tbl
    if spark.catalog.tableExists(tbl):
        # guard against a catalog entry whose files another session
        # removed (the warehouse dir is shared; commits are single-writer)
        try:
            spark.table(tbl).limit(1).count()
        except Exception:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    if not spark.catalog.tableExists(tbl):
        # the warehouse directory outlives the in-memory catalog (a prior
        # session may have written this table) — clear the stale location
        # so the managed-table create doesn't refuse it
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
        (
            table(spark, sf_dir, name)
            .repartition(n_buckets, key)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    _VERIFIED[(id(spark), tbl)] = spark
    return tbl


def prune_stale_warehouse(spark: SparkSession) -> list[str]:
    """Delete warehouse ``bkt_*`` dirs written under SUPERSEDED naming
    schemes (no full-path hash segment — e.g. the pre-r4 16-bucket
    layouts). Current code can never reference those names again, so
    the dirs are pure disk leakage; current-scheme dirs are left alone
    (``bucketed_table`` itself rmtree's and rewrites them on demand,
    and a concurrent session may own one). Returns the removed names.
    One warehouse layout per (fixture, key, buckets) is the invariant
    this restores after a naming/bucket-count migration."""
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    removed = []
    for d in sorted(glob.glob(os.path.join(wh, "bkt_*"))):
        name = os.path.basename(d)
        if any(
            len(s) == 8 and set(s) <= set("0123456789abcdef")
            for s in name.split("_")
        ):
            continue  # current naming scheme — potentially live
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(d, ignore_errors=True)
        removed.append(name)
    return removed


def bucketed_views(
    spark: SparkSession,
    sf_dir: str,
    keys: dict[str, str],
    n_buckets: int | None = None,
) -> dict[str, str]:
    """Bucket each ``{table: key}`` fixture and return {table: managed name}."""
    return {
        name: bucketed_table(spark, sf_dir, name, key, n_buckets)
        for name, key in keys.items()
    }


# one string literal ('' escape), line comment, or block comment — spans
# substitute_tables must never rewrite inside
_SQL_OPAQUE = re.compile(r"'(?:[^']|'')*'|--[^\n]*|/\*.*?\*/", re.DOTALL)


def substitute_tables(sql: str, mapping: dict[str, str]) -> str:
    """Replace fixture table names in ``sql`` with managed names, only in
    FROM/JOIN position and only OUTSIDE string literals / comments (so
    ``orders`` in a literal, comment, or column name can never be
    rewritten); source names are regex-escaped. Table-QUALIFIED column
    references (``orders.o_orderkey``) follow the swap. Comma-separated
    FROM lists raise rather than silently leaving an operand on the raw
    table (use explicit JOINs)."""

    def _sub(segment: str) -> str:
        for src, dst in mapping.items():
            segment = re.sub(
                rf"(?i)\b(from|join)(\s+){re.escape(src)}\b",
                lambda m, d=dst: f"{m.group(1)}{m.group(2)}{d}",
                segment,
            )
            if re.search(rf"(?i),\s*{re.escape(src)}\b(?!\s*\.)", segment):
                raise ValueError(
                    f"substitute_tables: {src!r} appears in comma position "
                    "(comma-separated FROM list?) — it would silently keep "
                    "the raw table; rewrite the query with explicit JOINs"
                )
            # (?i) matches the FROM/JOIN rewrite above: 'FROM Orders ...
            # WHERE ORDERS.o_orderkey' must rewrite BOTH or analysis fails
            # on a dangling qualifier
            segment = re.sub(
                rf"(?i)\b{re.escape(src)}\s*\.", f"{dst}.", segment
            )
        return segment

    out, pos = [], 0
    for m in _SQL_OPAQUE.finditer(sql):
        out.append(_sub(sql[pos : m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(_sub(sql[pos:]))
    return "".join(out)


def bucketed_sql(
    spark: SparkSession,
    sf_dir: str,
    sql: str,
    keys: dict[str, str],
    n_buckets: int | None = None,
) -> DataFrame:
    """Run ``sql`` with the given fixture tables swapped for bucketed copies."""
    mapping = bucketed_views(spark, sf_dir, keys, n_buckets)
    return spark.sql(substitute_tables(sql, mapping))
