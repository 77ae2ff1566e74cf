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


# ---------------------------------------------------------------------------
# A13: Z-order (Morton) clustering for multi-column data layout
# ---------------------------------------------------------------------------

Z_BITS = 8  # bits per dimension → 16-bit Morton code
Z_BUCKETS = 16  # layout "files": morton // 4096


def _morton_sql_n(cols: list[str], int_div: str, bits: int = Z_BITS) -> str:
    """N-dimensional bit-interleave via arithmetic only (portable across
    engines): bit i of dimension j lands at position i·N + j, so every
    prefix range of the code bounds ALL N dimensions — the multi-column
    OPTIMIZE ZORDER key. ``int_div`` is the engine's integer-division
    operator ('div' Spark, '//' DuckDB). Code width is bits·N; keep
    N·bits ≤ 62 (bigint)."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(
                f"(({c} {int_div} {1 << i}) % 2) * {1 << (i * n + j)}"
            )
    return " + ".join(terms)


def _morton_sql(x: str, y: str, int_div: str) -> str:
    """2-D special case of ``_morton_sql_n`` (bit i of x → 2i, y → 2i+1)."""
    return _morton_sql_n([x, y], int_div)


_ZX = "(o_custkey % 256)"
_ZY_SPARK = "(cast(floor(o_totalprice / 2000) as bigint) % 256)"
_ZY_DUCK = "(CAST(FLOOR(o_totalprice / 2000) AS BIGINT) % 256)"


@register(
    "a13_zorder_layout",
    oracle=f"""
    WITH coded AS (
        SELECT o_orderkey,
               {_ZX} AS zx,
               {_ZY_DUCK} AS zy,
               ({_morton_sql(_ZX, _ZY_DUCK, '//')}) AS morton
        FROM orders
    )
    SELECT CAST(morton // 4096 AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MAX(zx) - MIN(zx) AS BIGINT) AS x_span,
           CAST(MAX(zy) - MIN(zy) AS BIGINT) AS y_span
    FROM coded GROUP BY 1
    """,
    tags=("A13", "F2"),
)
def a13_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two columns + per-bucket
    bounding-box report — the lakehouse OPTIMIZE ZORDER layout pass.

    A sort by the interleaved-bit Morton code clusters rows so that EVERY
    prefix range of the code bounds BOTH dimensions: each resulting
    bucket/file covers ≤ 2^(8 - ceil(k/2)) of each dimension's range
    (visible in the emitted x_span/y_span, vs a one-column sort where the
    second dimension's span stays full-range). At 100 TB this is the sort
    key for `sortWithinPartitions` before the sink, so Parquet row-group
    min/max stats prune scans on BOTH filter columns. The Morton code is
    pure per-row arithmetic (bit tests as division/modulus — identical on
    both engines); computing it shuffles nothing.
    """
    o = table(spark, sf_dir, "orders")
    morton = F.expr(_morton_sql(_ZX, _ZY_SPARK, "div"))
    coded = o.select(
        "o_orderkey",
        F.expr(_ZX).alias("zx"),
        F.expr(_ZY_SPARK).alias("zy"),
        morton.alias("morton"),
    )
    return (
        coded.withColumn("zbucket", F.expr("morton div 4096"))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("zx") - F.min("zx")).cast("long").alias("x_span"),
            (F.max("zy") - F.min("zy")).cast("long").alias("y_span"),
        )
    )
