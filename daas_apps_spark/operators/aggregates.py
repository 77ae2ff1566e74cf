"""Aggregation (D), sort/limit/top-k (F), set operations (G).

The flagship ``q1_pricing_summary`` generalizes the reference's
aggregate-to-side-output stages (R6 IndelTargetCreator.java:19-44, R8
BQSRTargetGenerator.java:19-44): scan → filter → keyed aggregate with
map-side partial aggregation, which Spark's HashAggregate does automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import register_views, table, tables
from daas_apps_spark.functions.discipline import davg, dsum, sql_davg, sql_dsum
from daas_apps_spark.registry import register

# ---------------------------------------------------------------------------
# D. Aggregation
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "B4", "B7", "D1", "F1"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary (scan→filter→agg→sort).

    The shipdate predicate reaches the Parquet scan (predicate pushdown);
    partial aggregation runs map-side so the shuffle carries only
    (flag,status) groups — 6 groups regardless of input scale.
    """
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = net * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(net).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "d2_global_aggregate",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           {sql_dsum('l_quantity')} AS total_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           CAST(MIN(l_shipdate) AS TIMESTAMP) AS first_ship,
           CAST(MAX(l_shipdate) AS TIMESTAMP) AS last_ship
    FROM lineitem
    """,
    tags=("D2", "D3"),
)
def d2_global_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-key (global) aggregate over the fact table."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_quantity").alias("total_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "d3_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(DISTINCT l_partkey || '#' || l_suppkey) AS BIGINT) AS n_part_supp_pairs
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("D3",),
)
def d3_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple count(distinct) aggregates, incl. a multi-column distinct."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(
            F.concat_ws("#", F.col("l_partkey"), F.col("l_suppkey"))
        ).alias("n_part_supp_pairs"),
    )


@register(
    "d4_approx_count_distinct",
    oracle=None,  # approximate by construction; ε-checked in tests/test_sketches.py
    tags=("D4",),
)
def d4_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx_count_distinct next to the exact count (ε-verified).

    The two counts run as SEPARATE 1-row aggregates cross-joined at the
    end: combined in one agg, Catalyst's distinct-rewrite groups by the
    key for the exact count and drags a per-group HLL sketch (1639
    register columns at rsd=0.01) through the shuffle — ~2 GB of sketch
    state for 150k keys, 9.2s vs 0.5s at sf0.1. Split, each side is the
    plan it should be: partial HLL merge / partial distinct, a few bytes
    across the wire. rsd=0.02 because sketch update cost scales with
    precision (1.7s at rsd=0.01 vs 0.5s at 0.02 for the same scan) —
    pick the coarsest precision the error budget allows.
    """
    li = table(spark, sf_dir, "lineitem")
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders")
    )
    exact = li.agg(F.countDistinct("l_orderkey").alias("exact_orders"))
    return approx.crossJoin(exact)


@register(
    "d12_approx_percentile",
    oracle=None,  # sketch by construction; ε-vs-exact checked in tests/test_sketches.py
    tags=("D12", "D4"),
)
def d12_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (Greenwald-Khanna `approx_percentile`) next to the
    exact interpolated percentiles, per order status.

    The D4 pattern for quantiles: at 100 TB exact percentiles need a full
    sort or `percentile`'s per-group value buffer, while the GK sketch is
    fixed-size, mergeable map-side state — the only sane default for
    monitoring-grade quantiles on a fact table. Both are emitted so the
    ε-test (and any consumer) can see the sketch error directly.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr(
                "approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 1000)"
            ).alias("ap"),
            F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").alias("ep"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        # flatten to scalar columns (driver-visible outputs stay hashable)
        .select(
            "o_orderstatus",
            F.col("ap")[0].alias("approx_p25"),
            F.col("ap")[1].alias("approx_p50"),
            F.col("ap")[2].alias("approx_p75"),
            F.col("ep")[0].alias("exact_p25"),
            F.col("ep")[1].alias("exact_p50"),
            F.col("ep")[2].alias("exact_p75"),
            "n_orders",
        )
    )


@register(
    "d5_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("D5",),
)
def d5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id over (returnflag, linestatus)."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        F.grouping_id().cast("long").alias("gid"),
    )


@register(
    "d5_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("D5",),
)
def d5_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping_id."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
        F.grouping_id().cast("long").alias("gid"),
    )


@register(
    "d6_ordered_collect",
    oracle="""
    SELECT n_nationkey, array_to_string(list_sort(list(c_mktsegment)), '|') AS segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_nationkey < 5
    GROUP BY n_nationkey
    """,
    tags=("D6", "C5"),
)
def d6_ordered_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect_list per group (R14/R15 ordered-merge analog).

    The merge stages group files by parent dir then n-way merge in order
    (SparkCaller.java:170-173, BAMMerger.java:19-40); here: group rows by key
    and produce a deterministically ordered list.
    """
    t = tables(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .filter(F.col("n_nationkey") < 5)
        .groupBy("n_nationkey")
        # Serialized to a scalar string: driver-visible columns must be
        # hashable scalars (pandas sort_values dies on ndarray cells).
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("c_mktsegment")), "|"
            ).alias("segments")
        )
    )


@register(
    "d7_stats_aggregates",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS qty_stddev,
           ROUND(VAR_SAMP(l_quantity), 4) AS qty_var,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 4) AS qty_disc_covar
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("D7",),
)
def d7_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates, rounded per the canonicalization discipline."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("qty_disc_covar"),
    )


@register(
    "d8_argmax_argmin",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn_first
    FROM orders)
    SELECT m.o_custkey AS custkey,
           m.o_orderkey AS biggest_order,
           CAST(m.o_totalprice AS DOUBLE) AS biggest_price,
           f.o_orderkey AS first_order
    FROM (SELECT * FROM ranked WHERE rn_max = 1) m
    JOIN (SELECT * FROM ranked WHERE rn_first = 1) f ON m.o_custkey = f.o_custkey
    """,
    tags=("D8",),
)
def d8_argmax_argmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic arg-max/first-by via max/min over structs.

    ``max_by`` has unspecified tie-breaking; ``max(struct(ordering..., payload))``
    pins ties explicitly and stays a plain hash aggregate (no window shuffle).
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.struct("o_totalprice", "o_orderkey")).alias("_mx"),
            F.min(F.struct("o_orderdate", "o_orderkey")).alias("_fst"),
        )
        .select(
            "custkey",
            F.col("_mx.o_orderkey").alias("biggest_order"),
            F.col("_mx.o_totalprice").alias("biggest_price"),
            F.col("_fst.o_orderkey").alias("first_order"),
        )
    )


@register(
    "d9_filtered_aggregate",
    oracle=f"""
    SELECT l_linestatus,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
           {sql_dsum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END")}
               AS returned_value,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("D9",),
)
def d9_filtered_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregates (FILTER clause ≡ sum-of-CASE)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        dsum(
            F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)
        ).alias("returned_value"),
        F.count(F.lit(1)).alias("n_total"),
    )


@register(
    "d10_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS price_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS bucket_revenue
    FROM orders GROUP BY 1
    """,
    tags=("D10",),
)
def d10_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed (histogram) aggregation with fixed-width buckets."""
    o = table(spark, sf_dir, "orders")
    return (
        o.withColumn("price_bucket", F.floor(F.col("o_totalprice") / 50000))
        .groupBy("price_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("bucket_revenue"),
        )
    )


@register(
    "d11_pivot",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_p,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")}
               AS rev_f
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("D11", "D1"),
)
def d11_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts per priority × status, statuses as
    columns, plus one pivoted measure.

    ``groupBy().pivot(col, values)`` with EXPLICIT pivot values — the
    two-pass value-discovery scan is skipped and the plan is a single
    hash aggregate whose rows carry the CASE-style pivoted partials
    (identical shape to the oracle's manual CASE sums; at 100 TB the
    explicit value list is what keeps pivot one pass).
    """
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("rev"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).cast("long").alias("n_f"),
        F.coalesce("O_n", F.lit(0)).cast("long").alias("n_o"),
        F.coalesce("P_n", F.lit(0)).cast("long").alias("n_p"),
        F.coalesce("F_rev", F.lit(0.0)).alias("rev_f"),
    )


@register(
    "d11_unpivot",
    oracle="""
    SELECT s_suppkey, 'acctbal' AS metric, CAST(s_acctbal AS DOUBLE) AS value
    FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value
    FROM supplier
    """,
    tags=("D11", "G1"),
)
def d11_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long): supplier measures to (key, metric, value).

    ``df.unpivot`` is a zero-shuffle map-side expand (each input row emits
    one row per value column) — the relational dual of D11 pivot, and the
    standard prep step before a generic per-metric aggregation.
    """
    s = table(spark, sf_dir, "supplier")
    return (
        s.select(
            "s_suppkey",
            F.col("s_acctbal").cast("double").alias("acctbal"),
            F.col("s_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("s_suppkey", ["acctbal", "nationkey"], "metric", "value")
    )


# ---------------------------------------------------------------------------
# F. Sort / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "f1_sorted_limit_nulls",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null, o_totalprice
    FROM orders
    ORDER BY status_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("F1", "F3"),
)
def f1_sorted_limit_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total multi-key sort with explicit NULLS FIRST + LIMIT.

    The LIMIT makes ordering semantics observable under the driver's
    order-insensitive hash: a wrong sort yields a different top-100 set.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@register(
    "f4_top_k",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
    """,
    tags=("F4",),
)
def f4_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: orderBy+limit compiles to TakeOrderedAndProject (no full sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


@register(
    "f5_top_k_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    tags=("F5", "E1"),
)
def f5_top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window + filter."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# G. Set operations
# ---------------------------------------------------------------------------


@register(
    "g1_union_all",
    oracle="""
    SELECT custkey, src FROM (
        SELECT o_custkey AS custkey, 'big' AS src FROM orders WHERE o_totalprice > 350000
        UNION ALL
        SELECT o_custkey AS custkey, 'urgent' AS src FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
    )
    """,
    tags=("G1",),
)
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (multiset semantics verified by hash)."""
    o = table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 350000).select(
        F.col("o_custkey").alias("custkey"), F.lit("big").alias("src")
    )
    urgent = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    ).select(F.col("o_custkey").alias("custkey"), F.lit("urgent").alias("src"))
    return big.unionByName(urgent)


@register(
    "g2_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000
    UNION
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("G2",),
)
def g2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two keyed subsets."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 350000).select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@register(
    "g3_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 7000
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("G3",),
)
def g3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of nation keys from two tables."""
    t = tables(spark, sf_dir)
    a = t.customer.filter(F.col("c_acctbal") > 7000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b)


@register(
    "g4_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    tags=("G4",),
)
def g4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference) on customer keys."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000).select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


@register(
    "g3_intersect_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'O'
    """,
    tags=("G3",),
)
def g3_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection) on supplier keys."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_linestatus") == "O").select(F.col("l_suppkey").alias("suppkey"))
    return a.intersectAll(b)


@register(
    "d13_data_profile",
    oracle="""
    SELECT 'l_quantity' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_num,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_num,
           ROUND(AVG(l_quantity), 4) AS avg_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice), MIN(l_extendedprice),
           MAX(l_extendedprice), ROUND(AVG(l_extendedprice), 4), NULL, NULL
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount), MIN(l_discount), MAX(l_discount),
           ROUND(AVG(l_discount), 4), NULL, NULL
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
           COUNT(DISTINCT l_returnflag), NULL, NULL, NULL,
           MIN(l_returnflag), MAX(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
           COUNT(DISTINCT l_shipdate), NULL, NULL, NULL,
           strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'),
           strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S')
    FROM lineitem
    """,
    tags=("D13", "D2", "D3"),
)
def d13_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data profiling: per-column null / distinct / min / max /
    mean census of lineitem, emitted in long form (one row per column).

    The Spark side is a SINGLE wide aggregate over one scan — the five
    COUNT(DISTINCT)s share the pass via Catalyst's Expand rewrite — then a
    `stack` unpivots the 1-row result into the profile report. (The oracle
    reads the table five times; that's DuckDB's problem, not the plan's.)

    Scale: exact distinct counts via Expand multiply scan rows by the
    number of distinct aggregates; at 100 TB swap n_distinct to
    approx_count_distinct (single pass, no Expand, HLL mergeable) — the
    d4 query pins that path. Numeric min/max/avg stay as DOUBLE and
    date bounds are formatted to strings so every driver-visible column
    is a hashable scalar.
    """
    li = table(spark, sf_dir, "lineitem")
    num_cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("double").alias(f"mn_{c}"),
            F.max(c).cast("double").alias(f"mx_{c}"),
            F.round(F.avg(c), 4).alias(f"av_{c}"),
        ]
    aggs += [
        F.sum(F.col("l_returnflag").isNull().cast("long")).alias("nn_rf"),
        F.countDistinct("l_returnflag").alias("nd_rf"),
        F.min("l_returnflag").alias("mn_rf"),
        F.max("l_returnflag").alias("mx_rf"),
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("nn_sd"),
        F.countDistinct("l_shipdate").alias("nd_sd"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("mn_sd"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("mx_sd"),
    ]
    wide = li.agg(*aggs)
    rows = []
    for c in num_cols:
        rows.append(
            f"'{c}', n_rows, nn_{c}, nd_{c}, mn_{c}, mx_{c}, av_{c},"
            " cast(null as string), cast(null as string)"
        )
    rows.append(
        "'l_returnflag', n_rows, nn_rf, nd_rf, cast(null as double),"
        " cast(null as double), cast(null as double), mn_rf, mx_rf"
    )
    rows.append(
        "'l_shipdate', n_rows, nn_sd, nd_sd, cast(null as double),"
        " cast(null as double), cast(null as double), mn_sd, mx_sd"
    )
    stack = (
        f"stack(5, {', '.join(rows)}) AS (column_name, n_rows, n_nulls,"
        " n_distinct, min_num, max_num, avg_num, min_str, max_str)"
    )
    return wide.selectExpr(stack)


@register(
    "d14_more_aggregates",
    oracle="""
    SELECT l_returnflag,
           ROUND(median(l_quantity), 4) AS med_qty,
           bool_and(l_discount < 0.1) AS all_small_disc,
           bool_or(l_tax > 0.07) AS any_high_tax,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
           CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS line_band,
           CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS line_bor,
           CAST(bit_xor(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS line_bxor
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("D14", "D7"),
)
def d14_more_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate battery beyond D1-D13: exact median (interpolated on both
    engines), boolean every/some, conditional count, and bitwise fold
    aggregates — the bit folds are the aggregate-side complement of the
    H-bitwise scalar battery (band keys, bitmap-style summaries).

    All are single-pass hash aggregates with map-side partials; median is
    the one exception (needs the group's values — Spark runs it as a sort-
    based aggregate) and is bounded per group, not per table.
    """
    li = table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        F.bool_and(F.col("l_discount") < 0.1).alias("all_small_disc"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.bit_and(ln).alias("line_band"),
        F.bit_or(ln).alias("line_bor"),
        F.bit_xor(ln).alias("line_bxor"),
    )


@register(
    "d5_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
               AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("D5",),
)
def d5_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube specialize:
    per-flag totals, per-shipmode totals, and the grand total in ONE
    aggregate (an Expand pass replicates each row once per set, then a
    single partial+final hash aggregate — not three scans).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@register(
    "d16_ordered_set_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 4)
               AS p25_cont,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)
               AS p50_cont,
           ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice), 4)
               AS p75_cont,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                AS DOUBLE) AS p50_disc
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("D16", "D12", "D7"),
)
def d16_ordered_set_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates: exact interpolated (`percentile_cont`) and
    discrete (`percentile_disc` — smallest value whose cumulative
    distribution reaches p, always an actual data point) percentiles per
    group, via the ANSI WITHIN GROUP syntax both engines share.

    Complements D12: the GK sketch is the 100 TB default, these are the
    exact semantics it approximates — per-group sort-based aggregation,
    bounded by group size, identical interpolation rule on both engines.
    """
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(
            F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice)"), 4
        ).alias("p25_cont"),
        F.round(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 4
        ).alias("p50_cont"),
        F.round(
            F.expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice)"), 4
        ).alias("p75_cont"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
        .cast("double")
        .alias("p50_disc"),
    )


@register(
    "d15_mode",
    oracle="""
    WITH counted AS (
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_mode,
           n_group
    FROM (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY n DESC, o_orderpriority ASC) AS rn,
               CAST(SUM(n) OVER (PARTITION BY o_orderstatus)
                    AS BIGINT) AS n_group
        FROM counted
    ) WHERE rn = 1
    """,
    tags=("D15", "D1", "E1"),
)
def d15_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value): the priority
    distribution's mode per order status, ties broken toward the smallest
    value.

    Spark ships a native ``mode()`` aggregate, but its tie behavior is
    unspecified — useless under a hash-compare contract — so the engine
    uses the canonical two-level form: count per (group, value), then
    rank-1 per group by (count DESC, value ASC). Both shuffles carry only
    group/value keys; the second runs on the collapsed distribution
    (|groups| × |distinct values| rows), which is why this form is also
    the 100 TB shape — the raw table is touched once.
    """
    o = table(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_rank = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    w_grp = Window.partitionBy("o_orderstatus")
    return (
        counted.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n_group", F.sum("n").over(w_grp))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_mode"),
            "n_group",
        )
    )


@register(
    "d17_hll_sketch",
    oracle=None,  # estimates are engine-specific; ε + merge checked in tests
    tags=("D17", "D4"),
)
def d17_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, built into Spark 4):
    per-priority customer-cardinality sketches plus the UNION of those
    sketches re-estimated — the property D4's approx_count_distinct
    cannot offer: sketch STATE is a value you can store, ship, and merge,
    so per-partition/per-day sketches roll up to any grain without
    rescanning (the 100 TB cardinality-reporting design; the reference's
    merge-partial-results stages are the same shape,
    SparkCaller.java:245-248).

    tests/test_sketches.py checks each estimate within ε of the exact
    distinct count AND that the union-of-sketches estimate agrees with
    the sketch of the union to within ε (sparse→dense register promotion
    during union can shift a register or two) — the merge-consistency
    invariant that makes the rollup design sound. Declared rows-only: the estimator's exact output
    is engine-specific by construction.
    """
    o = table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk"),
        F.countDistinct("o_custkey").alias("exact_distinct"),
    )
    per_est = per.select(
        "o_orderpriority",
        F.expr("hll_sketch_estimate(sk)").cast("long").alias("est_distinct"),
        "exact_distinct",
        F.length("sk").cast("long").alias("sketch_bytes"),
    )
    merged = per.agg(
        F.lit("ALL (union of sketches)").alias("o_orderpriority"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))")
        .cast("long")
        .alias("est_distinct"),
        F.lit(None).cast("long").alias("exact_distinct"),
        F.lit(None).cast("long").alias("sketch_bytes"),
    )
    return per_est.unionAll(merged)


APPROX_TOPK_K = 5  # == |event_type| domain, and << maxItemsTracked default


@register(
    "d18_heavy_hitters",
    oracle="""
    SELECT event_type AS item,
           CAST(COUNT(*) AS BIGINT) AS est_count
    FROM events GROUP BY event_type
    """,
    tags=("D18", "D17", "F4"),
)
def d18_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via ``approx_top_k`` (Spark 4's frequent-items
    sketch), exploded to (item, est_count) rows. The oracle is EXACT
    counts — valid because the tracked-item budget (default 10⁴) exceeds
    the key domain, in which regime the sketch guarantees exact counts;
    that regime bound is the operator's documented contract, and the
    sketch's value at 100 TB is that the guarantee degrades gracefully
    (±ε·N) instead of OOMing when the domain explodes past the budget —
    the D4 sketch-vs-exact trade on the top-k axis.
    """
    e = table(spark, sf_dir, "events")
    top = e.agg(
        F.expr(f"approx_top_k(event_type, {APPROX_TOPK_K})").alias("tk")
    )
    return top.select(F.explode("tk").alias("x")).select(
        F.col("x.item").alias("item"),
        F.col("x.count").cast("long").alias("est_count"),
    )


THETA_LG_K = 14  # 16384 nominal entries — exact mode through sf0.1's key domain


@register(
    "d19_theta_sketch_setops",
    oracle="""
    WITH a AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    b AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT 'A' AS set_op,
           CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS est_distinct
    UNION ALL SELECT 'B', CAST((SELECT COUNT(*) FROM b) AS BIGINT)
    UNION ALL SELECT 'A_union_B',
        CAST((SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
             AS BIGINT)
    UNION ALL SELECT 'A_intersect_B',
        CAST((SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
             AS BIGINT)
    UNION ALL SELECT 'A_minus_B',
        CAST((SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
             AS BIGINT)
    """,
    tags=("D19", "D17", "G3", "G4"),
)
def d19_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra (Apache DataSketches, built into Spark 4):
    distinct-customer sketches for two predicates (urgent-priority
    buyers, finished-order buyers) combined with theta_union /
    theta_intersection / theta_difference and re-estimated — the audience
    -overlap query ("how many users did A AND B / A but not B") that HLL
    cannot answer (HLL unions but never intersects). Sketch STATE stays a
    storable, mergeable value, so per-day per-segment sketches roll up to
    any cross-segment overlap report without rescanning the fact table.

    The oracle pins EXACT set counts: with lgNomEntries=14 (16384 nominal
    entries) every set in the sf0.01/sf0.1 key domain stays in the
    sketch's exact regime (no sampling, theta=1), where DataSketches
    guarantees estimate == exact — the same regime contract d18 uses for
    approx_top_k. Past the nominal capacity the estimates degrade to
    ±ε bounds instead of failing: that graceful-degradation contract is
    the 100 TB design, and the exact-regime oracle is its conformance
    floor.

    Scale: two filtered single-column passes build the input sketches
    (map-side partial sketch merges — shuffle carries sketch bytes, not
    keys); the set algebra runs on two sketch VALUES in a 1-row plan.
    """
    o = table(spark, sf_dir, "orders")
    sk = o.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderpriority = '1-URGENT' "
            f"THEN o_custkey END, {THETA_LG_K})"
        ).alias("sk_a"),
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderstatus = 'F' "
            f"THEN o_custkey END, {THETA_LG_K})"
        ).alias("sk_b"),
    )
    # stack() the single sketch row (the d13 pattern): a unionAll of
    # selects would re-run the sketch-building fact scan once per set_op.
    ests = {
        "A": "theta_sketch_estimate(sk_a)",
        "B": "theta_sketch_estimate(sk_b)",
        "A_union_B": "theta_sketch_estimate(theta_union(sk_a, sk_b))",
        "A_intersect_B": "theta_sketch_estimate(theta_intersection(sk_a, sk_b))",
        "A_minus_B": "theta_sketch_estimate(theta_difference(sk_a, sk_b))",
    }
    branches = ", ".join(
        f"'{name}', cast(round({expr}) as bigint)" for name, expr in ests.items()
    )
    return sk.select(
        F.expr(f"stack({len(ests)}, {branches}) as (set_op, est_distinct)")
    )


KLL_K = 200  # DataSketches default: ~1.65% rank error, 99% confidence


@register(
    "d20_kll_quantile_sketch",
    oracle=None,  # KLL compaction is randomized; ε-vs-exact in test_sketches
    tags=("D20", "D12", "D16"),
)
def d20_kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KLL quantile sketches (Karnin-Lang-Liberty 2016, Apache
    DataSketches): per-status o_totalprice sketches queried at p25/p50/p75,
    plus the MERGE of the per-status sketches re-queried — the property
    D12's approx_percentile cannot offer: sketch state is a storable
    value, so per-partition/per-day quantile sketches roll up to any
    grain without rescanning (the same merge-don't-rescan design as D17's
    HLL and D19's theta sketches, on the quantile axis).

    Declared rows-only: KLL compaction makes coin-flip offset choices, so
    the estimate is not bit-reproducible across runs — the test contract
    is rank-ε instead: tests/test_sketches.py asserts each sketch
    quantile lands within the documented ~1.65%·n rank error of the exact
    order statistic, and that the merged sketch agrees with the sketch of
    the union within the same bound.

    Scale: the sketch aggregate carries O(k·log n) state through map-side
    partial merges — the shuffle moves kilobyte sketches, not rows; exact
    per-group percentiles (D16) by contrast sort every group's rows.
    """
    o = table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderstatus").agg(
        F.expr(f"kll_sketch_agg_double(o_totalprice, {KLL_K})").alias("sk"),
        F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").alias(
            "exact_q"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
    per_out = per.select(
        "o_orderstatus",
        F.expr(
            "kll_sketch_get_quantile_double(sk, cast(0.25 as double))"
        ).alias("p25_est"),
        F.expr(
            "kll_sketch_get_quantile_double(sk, cast(0.5 as double))"
        ).alias("p50_est"),
        F.expr(
            "kll_sketch_get_quantile_double(sk, cast(0.75 as double))"
        ).alias("p75_est"),
        F.col("exact_q")[0].alias("p25_exact"),
        F.col("exact_q")[1].alias("p50_exact"),
        F.col("exact_q")[2].alias("p75_exact"),
        "n_rows",
    )
    # kll_sketch_merge_double is the BINARY merge (sketch ⊕ sketch), so the
    # group-of-sketches rollup is a left fold over the collected list — the
    # shape a real rollup job uses when combining per-partition sketch rows.
    merged = per.agg(
        F.collect_list("sk").alias("sks"),
        F.sum("n_rows").alias("n_rows"),
    ).select(
        F.aggregate(
            # length derived from the array — a literal cap would silently
            # drop sketches past it at high group counts
            F.slice("sks", F.lit(2), F.greatest(F.size("sks") - 1, F.lit(0))),
            F.col("sks")[0],
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("msk"),
        "n_rows",
    ).select(
        F.lit("ALL (merged sketches)").alias("o_orderstatus"),
        F.expr(
            "kll_sketch_get_quantile_double(msk, cast(0.25 as double))"
        ).alias("p25_est"),
        F.expr(
            "kll_sketch_get_quantile_double(msk, cast(0.5 as double))"
        ).alias("p50_est"),
        F.expr(
            "kll_sketch_get_quantile_double(msk, cast(0.75 as double))"
        ).alias("p75_est"),
        F.lit(None).cast("double").alias("p25_exact"),
        F.lit(None).cast("double").alias("p50_exact"),
        F.lit(None).cast("double").alias("p75_exact"),
        "n_rows",
    )
    return per_out.unionAll(merged)


@register(
    "d21_listagg",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer
    WHERE c_acctbal > 9000
    GROUP BY c_mktsegment
    """,
    tags=("D21", "D6", "D1"),
)
def d21_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (`listagg ... WITHIN GROUP`, Spark 4's
    ANSI form of DuckDB's `string_agg`): the top-balance customer roster
    per segment as one delimited string — the report-cell/export shape
    D6's sorted collect_list feeds, produced directly by the engine.
    WITHIN GROUP pins element order, so the concatenation is
    deterministic and hash-matches the `string_agg(... ORDER BY)` twin.

    Scale: per-group result size is the concern, not the aggregation
    (it's one sort-based agg pass after the filter prunes) — an
    unfiltered listagg over a hot key builds a gigabyte string on one
    executor; bound group cardinality first (as the filter here does) or
    keep D6's array form and explode downstream.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
        FROM customer
        WHERE c_acctbal > 9000
        GROUP BY c_mktsegment
        """
    )


@register(
    "g8_union_by_name",
    oracle="""
    WITH a AS (
        SELECT o_orderkey AS key, o_totalprice AS amount,
               o_orderpriority AS priority, NULL AS segment
        FROM orders WHERE o_orderkey < 200
    ),
    b AS (
        SELECT c_custkey AS key, c_acctbal AS amount,
               NULL AS priority, c_mktsegment AS segment
        FROM customer WHERE c_custkey < 200
    ),
    u AS (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
    SELECT COALESCE(priority, 'none') AS priority,
           COALESCE(segment, 'none') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS total_amount
    FROM u GROUP BY 1, 2
    """,
    tags=("G8", "G1", "B1"),
)
def g8_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union with missing columns
    (`unionByName(allowMissingColumns=True)` ↔ DuckDB's
    `UNION ALL BY NAME`): two relations sharing only part of their
    schema are combined BY COLUMN NAME, absent columns null-filled — the
    multi-batch ingestion primitive when feeds evolve independently
    (A12's mergeSchema at the DataFrame level). Positional UNION would
    silently zip mismatched columns; the census over the null-filled
    markers pins that both engines align by name identically.
    """
    t = tables(spark, sf_dir)
    a = (
        t.orders.filter(F.col("o_orderkey") < 200)
        .select(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").alias("amount"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    b = (
        t.customer.filter(F.col("c_custkey") < 200)
        .select(
            F.col("c_custkey").alias("key"),
            F.col("c_acctbal").alias("amount"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy(
        F.coalesce("priority", F.lit("none")).alias("priority"),
        F.coalesce("segment", F.lit("none")).alias("segment"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("amount").alias("total_amount"),
    )
