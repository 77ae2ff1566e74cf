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
times per Q21 run and never shuffling it at all; the bucket count is sized
so a single bucket fits an executor's memory (n ≈ table_bytes /
target_partition_bytes, rounded to a power of two for stable re-use across
scale factors).

The materialization is cached per (sf_dir, table, key, buckets) as a managed
table in the session warehouse: first call writes, later calls reuse — the
same one-time-ingest contract as layout.compact_dir (bench.py excludes both
from per-query latency by warming up untimed).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from daas_apps_spark.catalog import table

DEFAULT_BUCKETS = 16


def _safe(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", s).strip("_").lower()


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """Materialize (once) and return the managed-table name of a bucketed
    copy of fixture ``name`` hash-bucketed AND sorted on ``key``.

    `repartition(n, key)` before the bucketed write makes each task hold
    exactly one bucket, so every bucket is ONE file — the layout Spark's
    reader needs to also skip the per-partition sort for sort-merge joins
    (multi-file buckets forfeit the sortedness metadata).
    """
    label = _safe(sf_dir.rstrip("/").rsplit("/", 1)[-1])
    tbl = f"bkt_{label}_{_safe(name)}_{_safe(key)}_{n_buckets}"
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
    return tbl


def bucketed_views(
    spark: SparkSession,
    sf_dir: str,
    keys: dict[str, str],
    n_buckets: int = DEFAULT_BUCKETS,
) -> dict[str, str]:
    """Bucket each ``{table: key}`` fixture and return {table: managed name}."""
    return {
        name: bucketed_table(spark, sf_dir, name, key, n_buckets)
        for name, key in keys.items()
    }


def substitute_tables(sql: str, mapping: dict[str, str]) -> str:
    """Replace whole-word fixture table names in ``sql`` with managed names
    (word-boundary match, so ``orders`` never rewrites ``o_orderstatus``)."""
    for src, dst in mapping.items():
        sql = re.sub(rf"\b{src}\b", dst, sql)
    return sql


def bucketed_sql(
    spark: SparkSession,
    sf_dir: str,
    sql: str,
    keys: dict[str, str],
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Run ``sql`` with the given fixture tables swapped for bucketed copies."""
    mapping = bucketed_views(spark, sf_dir, keys, n_buckets)
    return spark.sql(substitute_tables(sql, mapping))
