"""J: the Python UDF surface — scalar pandas UDFs, grouped-map transforms,
grouped aggregates, cogrouped merges, UDTFs, SQL-registered UDFs.

This is the reference's soul generalized: SparkCaller exists to "run tool T
per contig, parameterized by a broadcast side table" (RealignIndels.java:
19-49, BQSR.java:21-54, HaplotypeCaller.java:10-32). The engine's analog is
:func:`grouped_transform`: ``groupBy(key).applyInPandas(fn)`` with an
optional broadcast side dict — Arrow-batched, schema-explicit, and
partitioned by the group key exactly like the reference's per-contig tasks.

Scale rules (SURVEY.md §7 hard-parts): ``applyInPandas`` materializes one
whole group per pandas frame — bound group cardinality (the same reason the
reference bin-packs contigs by length, SparkCaller.java:190-243) or fall
back to ``mapInPandas`` iterators; skewed group keys get the salting helper
in :mod:`daas_apps_spark.operators.partitioning`.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from daas_apps_spark.catalog import table
from daas_apps_spark.functions.discipline import sql_dsum
from daas_apps_spark.registry import register


def grouped_transform(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame, dict[str, Any]], pd.DataFrame],
    schema: str,
    side: dict[str, Any] | None = None,
) -> DataFrame:
    """Run ``fn(group_pdf, side)`` per key group (R7/R9/R10 generalized).

    ``side`` is broadcast once per executor (the reference ships its target
    HashMap in every task closure, SparkCaller.java:276-283; Spark's
    broadcast is the same idea without re-serializing per task).
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(side or {})

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf, bc.value)

    return df.groupBy(*keys).applyInPandas(_apply, schema=schema)


# ---------------------------------------------------------------------------
# J1: scalar pandas UDF
# ---------------------------------------------------------------------------


@register(
    "j1_scalar_pandas_udf",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_udf,
           ROUND(LEAST(length(text), 500) / 500.0, 4) AS len_score
    FROM documents
    """,
    tags=("J1",),
)
def j1_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF (token count + length score)."""

    @pandas_udf("long")
    def n_tokens(s: pd.Series) -> pd.Series:
        return s.str.split(" ").str.len().astype("int64")

    @pandas_udf("double")
    def len_score(s: pd.Series) -> pd.Series:
        return (s.str.len().clip(upper=500) / 500.0).round(4)

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_tokens("text").alias("n_tokens_udf"),
        len_score("text").alias("len_score"),
    )


# ---------------------------------------------------------------------------
# J2: grouped-map applyInPandas (per-contig tool run analog)
# ---------------------------------------------------------------------------


@register(
    "j2_grouped_map_normalize",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey,
           ROUND(CASE WHEN mx = mn THEN 0.5
                      ELSE (l_extendedprice - mn) / (mx - mn) END, 6) AS price_scaled
    FROM (
        SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
               MIN(l_extendedprice) OVER (PARTITION BY l_suppkey) AS mn,
               MAX(l_extendedprice) OVER (PARTITION BY l_suppkey) AS mx
        FROM lineitem
    )
    """,
    tags=("J2",),
)
def j2_grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max scaling via applyInPandas (R7/R9 shape).

    Min-max (not z-score) keeps float math exactly reproducible across
    engines: min/max are exact, and one subtraction+division per row is
    deterministic regardless of group iteration order.
    """
    li = table(spark, sf_dir, "lineitem")

    def scale(pdf: pd.DataFrame, side: dict) -> pd.DataFrame:
        x = pdf["l_extendedprice"]
        mn, mx = x.min(), x.max()
        scaled = pd.Series(0.5, index=x.index) if mx == mn else (x - mn) / (mx - mn)
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "l_suppkey": pdf["l_suppkey"],
                "price_scaled": scaled.round(6),
            }
        )

    return grouped_transform(
        li.select("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"),
        ["l_suppkey"],
        scale,
        "l_orderkey long, l_linenumber int, l_suppkey long, price_scaled double",
    )


# ---------------------------------------------------------------------------
# J3: grouped-aggregate pandas UDF
# ---------------------------------------------------------------------------


@register(
    "j3_grouped_agg_median",
    oracle="""
    SELECT p_brand,
           ROUND(median(p_retailprice), 4) AS median_price,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part GROUP BY p_brand
    """,
    tags=("J3",),
)
def j3_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: per-brand median retail price.

    Median (interpolated) is order-independent — np.median and DuckDB's
    quantile_cont(0.5) agree exactly, so the UDAF is oracle-hashable.
    """
    import numpy as np

    @pandas_udf("double")
    def median_udaf(s: pd.Series) -> float:
        return float(np.round(np.median(s.to_numpy()), 4))

    # Spark disallows mixing group-agg pandas UDFs with JVM aggregates in one
    # agg() — the row count is a second pandas UDAF for that reason.
    @pandas_udf("long")
    def count_udaf(s: pd.Series) -> int:
        return int(len(s))

    p = table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        median_udaf("p_retailprice").alias("median_price"),
        count_udaf("p_retailprice").alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# J4: mapInPandas (whole-partition iterator transform)
# ---------------------------------------------------------------------------


@register(
    "j4_mapinpandas_enrich",
    oracle="""
    SELECT o_orderkey,
           CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
           ROUND(o_totalprice / 1000.0, 5) AS price_k
    FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("J4",),
)
def j4_mapinpandas_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas row-local enrichment (R2 whole-partition analog).

    Iterator form: each Arrow batch transforms independently, so memory is
    bounded by batch size (not partition size) — the 100 TB-safe shape.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")

    def enrich(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "o_orderkey": pdf["o_orderkey"],
                    "prio_len": pdf["o_orderpriority"].str.len().astype("int64"),
                    # round at 5 decimals: a 2-decimal price / 1000 is exactly
                    # 5-decimal, so no half-way cases exist and pandas
                    # (half-even) agrees with DuckDB (half-away) bit-for-bit.
                    "price_k": (pdf["o_totalprice"] / 1000.0).round(5),
                }
            )

    return o.select("o_orderkey", "o_orderpriority", "o_totalprice").mapInPandas(
        enrich, schema="o_orderkey long, prio_len long, price_k double"
    )


# ---------------------------------------------------------------------------
# J5: cogrouped map
# ---------------------------------------------------------------------------


@register(
    "j5_cogrouped_reconcile",
    oracle=f"""
    SELECT o.o_orderkey,
           ROUND(o.o_totalprice, 2) AS header_total,
           ROUND(COALESCE({sql_dsum('l.l_extendedprice')}, 0.0), 2) AS line_total,
           CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey % 100 = 0
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
    tags=("J5",),
)
def j5_cogrouped_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: reconcile order headers vs line sums.

    The two-sided R7 analog: each key sees both groups as pandas frames.
    Line sums accumulate in sorted linenumber order; sums of 2-decimal
    values rounded back to 2 decimals are exact on both engines.

    The demo reconciles a 1/100 key slice: cogrouped-pandas pays a fixed
    Python cost PER KEY, so its scale rule is bounded key cardinality
    (measured: 150k single-order groups at sf0.1 took 79s — the overhead,
    not the data). Production cogroups reconcile at coarser keys (per
    partition-of-orders, per day) or move the all-keys case to the
    equivalent join+aggregate, which is what the oracle expresses.

    Second scale trap, observed here: AQE coalesces post-shuffle partitions
    BY BYTES, but pandas-UDF stages cost per GROUP CALL — a few-MB shuffle
    coalesces to one task and serializes every group through one Python
    worker. On a real cluster, disable
    ``spark.sql.adaptive.coalescePartitions`` (or set
    ``minPartitionNum ≈ cores``) for applyInPandas/cogroup stages.
    """
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )

    def reconcile(key, o_pdf: pd.DataFrame, l_pdf: pd.DataFrame) -> pd.DataFrame:
        if o_pdf.empty:
            return pd.DataFrame(
                columns=["o_orderkey", "header_total", "line_total", "n_lines"]
            )
        l_sorted = l_pdf.sort_values("l_linenumber")
        total = float(l_sorted["l_extendedprice"].sum()) if len(l_sorted) else 0.0
        return pd.DataFrame(
            {
                "o_orderkey": [key[0]],
                "header_total": [round(float(o_pdf["o_totalprice"].iloc[0]), 2)],
                "line_total": [round(total, 2)],
                "n_lines": [len(l_sorted)],
            }
        )

    return o.groupBy("o_orderkey").cogroup(li.groupBy("l_orderkey")).applyInPandas(
        reconcile,
        schema="o_orderkey long, header_total double, line_total double, n_lines long",
    )


# ---------------------------------------------------------------------------
# J6: Python UDTF
# ---------------------------------------------------------------------------


@register(
    "j6_udtf_bigrams",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
    )
    SELECT doc_id, CAST(i AS INTEGER) AS pos,
           tokens[i+1] || ' ' || tokens[i+2] AS bigram
    FROM toks, unnest(range(least(len(tokens) - 1, 4))) AS t(i)
    WHERE len(tokens) >= 2
    """,
    tags=("J6",),
)
def j6_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one input row → N bigram rows (R10 generative shape).

    HaplotypeCaller turns N read rows into M differently-shaped variant rows
    (HaplotypeCaller.java:10-32); a UDTF is the row-level version of that
    schema-changing expansion. ``useArrow=True`` keeps the exchange on the
    Arrow batch path (``ArrowEvalPythonUDTF`` in the plan) — without it a
    UDTF is the one API that silently reintroduces row-at-a-time pickling
    (flagged by tools/plan_lint.py's BatchEvalPython rule).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id long, pos int, bigram string", useArrow=True)
    class Bigrams:
        def eval(self, doc_id: int, text: str):
            toks = text.lower().split(" ")
            for i in range(min(len(toks) - 1, 4)):
                yield doc_id, i, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("bigrams_udtf", Bigrams)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf_src")
    return spark.sql(
        """
        SELECT b.doc_id, b.pos, b.bigram
        FROM documents_udtf_src d,
             LATERAL bigrams_udtf(d.doc_id, d.text) b
        """
    )


# ---------------------------------------------------------------------------
# J7: SQL-registered UDF
# ---------------------------------------------------------------------------


@register(
    "j7_sql_registered_udf",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS price_band
    FROM orders
    """,
    tags=("J7",),
)
def j7_sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas UDF registered into the SQL catalog and used from spark.sql."""

    @pandas_udf("string")
    def price_band(p: pd.Series) -> pd.Series:
        return pd.cut(
            p,
            bins=[float("-inf"), 100000.0, 300000.0, float("inf")],
            labels=["small", "medium", "large"],
            right=False,
        ).astype(str)

    spark.udf.register("price_band", price_band)
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_udf_src")
    return spark.sql(
        "SELECT o_orderkey, price_band(o_totalprice) AS price_band FROM orders_udf_src"
    )


# ---------------------------------------------------------------------------
# J8: mapInArrow — zero-copy Arrow-batch transform
# ---------------------------------------------------------------------------


@register(
    "j8_mapinarrow",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_no,
           l_quantity * l_extendedprice AS gross
    FROM lineitem WHERE l_linenumber <= 2
    """,
    tags=("J8", "J4"),
)
def j8_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: transform RecordBatches with pyarrow.compute directly —
    no pandas materialization at all, the cheapest Python hook Spark has.

    The arithmetic (`pc.multiply` on float64) is bit-identical to the SQL
    twin because both are plain IEEE double multiplies per row; no
    rounding, no aggregation, no order dependence. Use this shape when the
    Python side is vectorizable but pandas' index/copy overhead matters —
    at 100 TB the difference vs mapInPandas is a constant factor on every
    batch of the fact table.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") <= 2)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )

    def gross(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("l_orderkey"),
                    pc.cast(batch.column("l_linenumber"), pa.int64()),
                    pc.multiply(
                        batch.column("l_quantity"), batch.column("l_extendedprice")
                    ),
                ],
                ["l_orderkey", "line_no", "gross"],
            )

    return li.mapInArrow(gross, schema="l_orderkey long, line_no long, gross double")


@register(
    "j9_grouped_applyinarrow",
    oracle="""
    WITH st AS (
        SELECT doc_id, lang, n_chars,
               SUM(n_chars) OVER (PARTITION BY lang) AS s,
               SUM(n_chars * n_chars) OVER (PARTITION BY lang) AS ssq,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    )
    SELECT doc_id, lang, n_chars,
           ROUND((n_chars - CAST(s AS DOUBLE) / n)
                 / sqrt((ssq - CAST(s AS DOUBLE) * s / n) / n), 4) AS chars_z
    FROM st
    """,
    tags=("J9", "J2", "J8"),
)
def j9_grouped_applyinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map through the ARROW-native path (`applyInArrow`): per-lang
    z-score of document length computed directly on pyarrow Tables — the
    R7 "run logic per group" shape without ever materializing pandas
    (no index, no block manager; the cheapest grouped Python hook).

    Determinism without decimal casts: the group moments are EXACT —
    Σx and Σx² are int64 sums (order-free), so mean/variance are derived
    from exact integers with a pinned expression tree; the oracle's
    window form writes the identical tree. Only ROUND serializes.

    Scale: same bounded-group rule as J2 — one group must fit one task
    (langs are few and huge here, which is exactly when you'd pre-shard
    groups with a salt and merge moments; SCALING.md §5).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def normalize(tbl: pa.Table) -> pa.Table:
        x = tbl.column("n_chars")
        n = tbl.num_rows
        s = pc.sum(x).as_py()
        ssq = pc.sum(pc.multiply(x, x)).as_py()
        mean = s / n
        std = ((ssq - s * s / n) / n) ** 0.5
        z = pc.round(
            pc.divide(pc.subtract(pc.cast(x, pa.float64()), mean), std),
            ndigits=4,
        )
        return pa.Table.from_arrays(
            [tbl.column("doc_id"), tbl.column("lang"), x, z],
            ["doc_id", "lang", "n_chars", "chars_z"],
        )

    return d.groupBy("lang").applyInArrow(
        normalize, schema="doc_id long, lang string, n_chars long, chars_z double"
    )


@register(
    "j10_sql_udf",
    oracle=f"""
    WITH base AS (
        SELECT l_orderkey,
               l_extendedprice * (1.0 - l_discount) AS np,
               l_quantity
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
    ),
    per_order AS (
        SELECT l_orderkey,
               {sql_dsum('np')} AS order_net,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS order_qty
        FROM base GROUP BY l_orderkey
    )
    SELECT CASE WHEN order_net < 50000 THEN 'low'
                WHEN order_net < 200000 THEN 'mid'
                ELSE 'high' END AS net_tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(order_qty) AS BIGINT) AS total_qty,
           ROUND({sql_dsum('order_net')}, 2) AS tier_net
    FROM per_order
    GROUP BY 1
    """,
    tags=("J7", "J10", "B12"),
)
def j10_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL UDFs (Spark 4 ``CREATE FUNCTION ... RETURN expr``):
    a scalar ``net_price`` UDF and a scalar ``net_tier`` bucketing UDF
    defined IN SQL, then used inside an aggregation pipeline.

    Unlike the Python UDF surface (J1–J9), SQL UDFs are inlined by the
    analyzer into the calling plan — the executed plan is pure Catalyst
    expressions with no Python worker, no serialization boundary, and
    full codegen/pushdown through the UDF body, which is exactly why a
    100 TB pipeline prefers them for any logic expressible as SQL: you
    get UDF-style reuse/naming with built-in-expression performance (the
    reference's per-record transforms are opaque native calls —
    SparkCaller.java's per-stage external tools — whereas this surface
    keeps the logic inside the optimizer).

    The oracle inlines the same expressions by hand, proving the UDF
    indirection changes nothing about the result. Sum discipline: net
    prices go through the scaled-long decimal sum (dsum) on both sides.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_tier(v DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN v < 50000 THEN 'low' "
        "WHEN v < 200000 THEN 'mid' ELSE 'high' END"
    )
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("j10_lineitem")
    scaled = 10**4
    return spark.sql(
        f"""
        WITH base AS (
            SELECT l_orderkey,
                   net_price(l_extendedprice, l_discount) AS np,
                   l_quantity
            FROM j10_lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
        ),
        per_order AS (
            SELECT l_orderkey,
                   SUM(CAST(CAST(np AS DECIMAL(18,4)) * {scaled} AS BIGINT))
                       / CAST({scaled} AS DOUBLE) AS order_net,
                   SUM(CAST(l_quantity AS BIGINT)) AS order_qty
            FROM base GROUP BY l_orderkey
        )
        SELECT net_tier(order_net) AS net_tier,
               COUNT(*) AS n_orders,
               SUM(order_qty) AS total_qty,
               ROUND(SUM(CAST(CAST(order_net AS DECIMAL(18,4)) * {scaled}
                         AS BIGINT)) / CAST({scaled} AS DOUBLE), 2) AS tier_net
        FROM per_order
        GROUP BY net_tier
        """
    )


@register(
    "j11_iter_scalar_udf",
    oracle="""
    SELECT event_id,
           ROUND((value - 50.0) / 25.0, 6) AS scored
    FROM events WHERE event_type = 'view'
    """,
    tags=("J11", "J1", "J4"),
)
def j11_iter_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form scalar pandas UDF (`Iterator[pd.Series] ->
    Iterator[pd.Series]`): the variant that amortizes expensive
    per-worker setup — the "load the model once, score every Arrow
    batch" contract that the plain J1 form cannot express (its function
    body re-enters per batch with no setup scope). Here the "model" is a
    pinned (center, scale) pair initialized once before the loop; a real
    pipeline would mmap weights there (the reference pays the same
    per-task setup for each GATK process spawn, BaseGATKProgram.java —
    this is that cost amortized to once per worker, not once per batch).

    The arithmetic is one subtract + one divide of doubles — the same
    expression tree as the SQL twin, so ROUND(6) hash-matches.
    """
    @pandas_udf("double")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        center, scale = 50.0, 25.0  # "model load": once per worker
        for s in batches:
            yield ((s - center) / scale).round(6)

    e = table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "view").select(
        "event_id", score("value").alias("scored")
    )


@register(
    "j12_polymorphic_udtf",
    oracle="""
    SELECT doc_id,
           string_split(lower(text), ' ')[1] AS tok_0,
           string_split(lower(text), ' ')[2] AS tok_1,
           string_split(lower(text), ' ')[3] AS tok_2
    FROM documents
    """,
    tags=("J12", "J6"),
)
def j12_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4's static ``analyze``): the output
    SCHEMA is computed from the call's literal argument — here
    `split_cols(text, 3)` derives columns tok_0..tok_2, and a different
    width literal would derive a different relation shape at ANALYSIS
    time. This is the table-function contract j6's fixed-schema UDTF
    cannot express (pivot-style writers, schema-per-config readers); the
    oracle spells the equivalent fixed projection, pinning that the
    analyzed schema and per-row slicing agree.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitCols:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            width = n.value  # literal arg — schema derived from it
            schema = StructType()
            for i in range(width):
                schema = schema.add(f"tok_{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            toks = text.lower().split(" ")
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    spark.udtf.register("split_cols", udtf(SplitCols, useArrow=True))
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_j12_src"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.tok_0, s.tok_1, s.tok_2
        FROM documents_j12_src d, LATERAL split_cols(d.text, 3) s
        """
    )
