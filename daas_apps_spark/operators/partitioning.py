"""Partitioning & skew utilities — the R12 BinPartitioner analog, Spark-first.

The reference plans skew by hand: greedy least-loaded binning of contigs by
base-pair length (SparkCaller.java:190-243, BinPartitioner.java:8-27). The
engine's first line of defense is AQE (skew-join splitting + partition
coalescing, on in session.py); these helpers cover what AQE cannot see:

- :func:`salted_aggregate` — two-phase aggregation for skewed group keys
  (AQE splits skewed *join* partitions, not skewed *groupBy* keys).
- :func:`salt_column` — explicit salt for grouped-map UDFs over hot keys
  (the J2 `applyInPandas` path materializes whole groups; salting bounds
  group size exactly like the reference bounds contigs-per-task).
- :func:`sort_within_partitions` — R3's per-file sort analog: cluster rows
  inside partitions without a global shuffle (feeds Parquet row-group
  min/max stats, the R13 index analog).
- :func:`physical_plan` — explain-string helper for plan assertions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.functions.discipline import dsum, sql_dsum
from daas_apps_spark.registry import register


def salt_column(unique_col: str | Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a unique column (no rand())."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate: groupBy(keys+salt) partials → groupBy(keys) final.

    Phase 1 spreads each hot key over ``n_salts`` reducers; phase 2 combines
    ``n_salts`` rows per key — the shuffle for a hot key shrinks from
    |rows(key)| to n_salts.
    """
    salted = df.withColumn("__salt", salt_column(unique_col, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def sort_within_partitions(
    df: DataFrame, key: str | Column, *more: str | Column
) -> DataFrame:
    """R3/F2: per-partition sort (no exchange) for clustering before write."""
    return df.sortWithinPartitions(key, *more)


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The executed plan's explain string (for plan assertions in tests)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@register(
    "r12_salted_aggregate",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_extendedprice')} AS total_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("D1", "R12"),
)
def r12_salted_aggregate(spark, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregate over the 3 hot l_returnflag keys.

    Decimal partials make the result identical to the one-phase plan
    (decimal addition is associative), so salting is purely a physical
    rewrite — which is exactly why it is safe at any scale.
    """
    li = table(spark, sf_dir, "lineitem")
    partial = [
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("__s"),
    ]
    final = [
        F.sum("__n").alias("n_rows"),
        F.sum("__s").cast("double").alias("total_price"),
    ]
    return salted_aggregate(
        li, ["l_returnflag"], partial, final, unique_col="l_orderkey", n_salts=16
    )
