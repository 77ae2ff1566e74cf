"""Fixture catalog: table name → Parquet path → DataFrame / temp view.

Generalizes the reference's driver-side catalog step — `getFilesInFolder`
(MiscUtils.java:15-38) plus the SAM-header sequence-dictionary read
(SparkCaller.java:180-187) — into a declarative registry over the driver's
Parquet fixtures (TESTDATA.md / FIXTURES.md).
"""

from __future__ import annotations

import os
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from daas_apps_spark.session import pin_session

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (session id, sf_dir, name) → (session, analyzed DataFrame). A DataFrame is
# an immutable lazy plan, so handing the same object to every query is safe;
# rebuilding it per call costs a py4j round-trip plus a parquet footer/schema
# read (~70 ms), which dominates small-query latency. The session object is
# kept in the value so its id() can never be recycled onto a different
# (restarted) session while its plans are cached.
_DF_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (A1 Parquet scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    pin_session(spark)
    key = (id(spark), sf_dir, name)
    hit = _DF_CACHE.get(key)
    if hit is not None:
        return hit[1]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it scans as
        # epoch-nanos. Truncate (not round) to µs — DuckDB does the same.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) infers as NTZ on
        # Spark 4 (inferTimestampNTZ defaults on). Normalize to LTZ: the
        # session timezone is pinned UTC, so the instant is the wall-clock
        # value unchanged — exactly how DuckDB treats the same naive column —
        # and TZ-only functions (unix_micros, to_utc_timestamp, interval
        # arithmetic ergonomics) work uniformly across every query.
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    _DF_CACHE[key] = (spark, df)
    return df


def tables(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """Load every fixture table; attribute access: ``t.lineitem`` etc.

    Scans are lazy — unused tables cost nothing (Catalyst prunes them), so
    loading all ten up front is free.
    """
    pin_session(spark)
    return SimpleNamespace(**{n: table(spark, sf_dir, n) for n in TABLES})


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for ``spark.sql`` queries (A8)."""
    pin_session(spark)
    for n in TABLES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
