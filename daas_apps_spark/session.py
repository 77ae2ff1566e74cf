"""SparkSession factory with engine-pinned configuration.

Config rationale (each matters for correctness parity or 100 TB scale):

- ``spark.sql.session.timeZone=UTC`` — timestamps hash-compared against the
  DuckDB oracle at microsecond precision in UTC (FIXTURES.md canonicalization
  rule 3).
- ``spark.sql.ansi.enabled=false`` — Spark 4 defaults ANSI on; the engine pins
  it off for stable cast/overflow semantics matching the declared oracle
  queries (SURVEY.md §7 M0).
- Arrow on — all pandas UDF / toPandas traffic is Arrow-batched (UDFs are the
  slow path; Arrow keeps them ~10-100x faster than row-at-a-time pickling).
- AQE on (+ skew join + partition coalescing) — the Spark-native replacement
  for the reference's greedy contig bin-packing partitioner
  (SparkCaller.java:190-243, BinPartitioner.java:8-27): runtime re-planning
  handles skewed keys and small shuffle partitions without manual binning.
- ``spark.sql.shuffle.partitions`` — default 32 for local[32] tests; at
  cluster scale AQE coalescing makes the static number mostly irrelevant, but
  set it ~2-3x total executor cores for 100 TB runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "daas_apps_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the same entry point works in tests, bench, and driver verification.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    return builder.getOrCreate()


# id → session; the value keeps the object alive so an id can't be recycled
# onto a fresh (unpinned) session.
_PINNED: dict[int, SparkSession] = {}


def pin_session(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable confs on an externally created session.

    The verification driver constructs its own SparkSession; every registered
    query calls this first so timezone/ANSI/Arrow semantics match the declared
    oracle SQL regardless of the ambient session defaults. Idempotent and
    cached per session object — each ``conf.set`` is a py4j round-trip, and
    this runs on every catalog lookup.
    """
    if id(spark) in _PINNED:
        return spark
    _PINNED[id(spark)] = spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Spark 4 rejects parquet TIMESTAMP(NANOS) outright; read as epoch-nanos
    # long instead (catalog.table converts to a µs timestamp, matching how
    # DuckDB truncates ns→µs on read).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
