"""Relational core: scans & provenance (A), projection/filter/expressions (B),
joins (C). SURVEY.md §2.2 categories A-C.

Reference parity notes are cited per-query; the general mapping
(SURVEY.md §1.3): file-as-record scans → Parquet DataFrame scans with
``input_file_name()`` provenance; closure-captured side maps → broadcast hash
joins; the ``-L <contig>`` interval filter → partition-/predicate-pushdown
filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daas_apps_spark.catalog import TABLES, table, tables, register_views
from daas_apps_spark.functions.discipline import dsum, sql_dsum
from daas_apps_spark.registry import register

# ---------------------------------------------------------------------------
# A. Scans, sources, sinks
# ---------------------------------------------------------------------------


@register(
    "a1_scan_counts",
    oracle="""
    SELECT 'region' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM region
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'events', COUNT(*) FROM events
    UNION ALL SELECT 'documents', COUNT(*) FROM documents
    UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
    """,
    tags=("A1",),
)
def a1_scan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan of every fixture table (R1 directory-scan analog)."""
    dfs = [
        table(spark, sf_dir, n).agg(
            F.lit(n).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for n in TABLES
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


@register(
    "a4_provenance_scan",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct_docs
    FROM documents GROUP BY source
    """,
    tags=("A4",),
)
def a4_provenance_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-columned scan: dataset-directory → ``source`` column.

    R1 keeps (inputDir, file) pairs (MiscUtils.java:15-38); the engine keeps
    provenance as a first-class column. ``input_file_name()`` provenance over
    multi-file layouts is covered by tests/test_sources.py.
    """
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_id").alias("n_distinct_docs"),
    )


@register(
    "a8_sql_view_parity",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
    tags=("A8",),
)
def a8_sql_view_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temp-view registration + ``spark.sql`` entry point (§3.4 path 3)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# B. Projection, filter, scalar expressions
# ---------------------------------------------------------------------------


@register(
    "b2_computed_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS net_price,
           CAST(CAST(l_quantity + l_tax * 100 AS DECIMAL(18,4)) AS DOUBLE) AS qty_taxish,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_kbucket,
           ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS key_mod7,
           'flag:' || l_returnflag AS tagged_flag
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
    tags=("B1", "B2", "B3", "B7"),
)
def b2_computed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection: arithmetic, pmod, floor-bucketing, lit concat (R4 analog)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        # Decimal cast fixes rounding; the double cast keeps the driver-visible
        # representation scalar-hashable (Decimal objects hash-mismatch vs
        # DuckDB's float64 pandas output). Bit-identical on both engines.
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("net_price"),
        (F.col("l_quantity") + F.col("l_tax") * 100)
        .cast("decimal(18,4)")
        .cast("double")
        .alias("qty_taxish"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kbucket"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.concat(F.lit("flag:"), F.col("l_returnflag")).alias("tagged_flag"),
    )


@register(
    "b4_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 200000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate IS NOT NULL
      AND NOT (o_orderstatus = 'P' AND o_totalprice < 150000)
    """,
    tags=("B4", "B5"),
)
def b4_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter: BETWEEN / IN / IS NOT NULL / AND-OR-NOT combinators (R19 analog)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(100000, 200000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderdate").isNotNull()
        & ~((F.col("o_orderstatus") == "P") & (F.col("o_totalprice") < 150000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "b6_conditional_expressions",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'regular'
                ELSE 'premium' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_ex,
           CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS acctbal_dec,
           CAST(CAST(c_nationkey AS BIGINT) AS DOUBLE) AS nationkey_d
    FROM customer
    """,
    tags=("B6", "B7"),
)
def b6_conditional_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / casts across types."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "regular")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_ex"
        ),
        F.col("c_acctbal").cast("decimal(18,4)").cast("double").alias("acctbal_dec"),
        F.col("c_nationkey").cast("long").cast("double").alias("nationkey_d"),
    )


# ---------------------------------------------------------------------------
# C. Joins
# ---------------------------------------------------------------------------


@register(
    "c1_join_orders_customer",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS segment_revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("C1", "D1"),
    bench=True,
)
def c1_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders⋈customer → segment revenue.

    At 100 TB both sides are large: Catalyst picks sort-merge join with both
    sides hash-partitioned on the key; AQE coalesces post-shuffle partitions.
    """
    t = tables(spark, sf_dir)
    return (
        t.orders.join(t.customer, t.orders.o_custkey == t.customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("segment_revenue"),
        )
    )


@register(
    "c2_left_outer_join",
    oracle=f"""
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           COALESCE({sql_dsum('o.o_totalprice')}, 0.0) AS customer_revenue
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("C2", "D1"),
)
def c2_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers with zero counts."""
    t = tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("customer_revenue"),
        )
    )


@register(
    "c2_full_outer_join",
    oracle="""
    WITH big AS (
        SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_big
        FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
    ),
    urgent AS (
        SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_urgent
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    )
    SELECT COALESCE(big.custkey, urgent.custkey) AS custkey,
           COALESCE(n_big, 0) AS n_big, COALESCE(n_urgent, 0) AS n_urgent
    FROM big FULL OUTER JOIN urgent ON big.custkey = urgent.custkey
    """,
    tags=("C2",),
)
def c2_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates with disjoint-ish key sets."""
    o = table(spark, sf_dir, "orders")
    big = (
        o.filter(F.col("o_totalprice") > 300000)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    joined = big.join(urgent, "custkey", "outer")
    return joined.select(
        "custkey",
        F.coalesce("n_big", F.lit(0)).alias("n_big"),
        F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
    )


@register(
    "c3_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("C3",),
)
def c3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers having at least one very large order."""
    t = tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000)
    return t.customer.join(
        big, t.customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "c4_anti_join",
    oracle="""
    SELECT c_custkey, c_nationkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("C4",),
)
def c4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders.

    Mirrors R8's known-sites exclusion (BQSRTargetGenerator.java:19-44):
    subtract a keyed side table before aggregating.
    """
    t = tables(spark, sf_dir)
    return t.customer.join(
        t.orders, t.customer.c_custkey == t.orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_nationkey")


@register(
    "c5_broadcast_join",
    oracle=f"""
    SELECT r.r_name AS region_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_dsum('c.c_acctbal')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("C5", "C1"),
    bench=True,
)
def c5_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hash join of small dims (R7/R9 target-map analog).

    nation/region are the engine's "side tables": broadcast to every task,
    exactly like the reference ships its target HashMap in task closures
    (SparkCaller.java:276-283). No shuffle of the big side.
    """
    t = tables(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == t.region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@register(
    "c6_multikey_join",
    oracle=f"""
    WITH partsupp AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem
    )
    SELECT p.p_brand, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN partsupp ps ON l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY p.p_brand, s.s_name
    """,
    tags=("C6", "C1", "C5"),
    bench=True,
)
def c6_multikey_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key + multi-table equi-join: lineitem⋈partsupp(2 keys)⋈part⋈supplier.

    Partial-aggregation pushdown through the join: lineitem is pre-aggregated
    by the join key pair (one shuffle of scaled-long partials, exact and
    associative per functions/discipline.py), so the multi-key join and the
    dimension joins run on the ~|partsupp| reduced relation instead of the
    raw fact table. No broadcast hint on the derived partsupp side — it is
    scale-proportional, so at 100 TB AQE keeps a shuffle join; at bench SF
    AQE converts it to a runtime broadcast (post-shuffle size < threshold).

    Both join sides derive from ``pre``. The derived partsupp keeps its
    measures and the join matches on the COMPLETE row (2 keys + 2 measures):
    the measure equalities are vacuously true — both sides are the same
    derivation, so per key-pair the rows are identical and the join is
    exactly the oracle's 2-key join — but keeping the measures referenced
    stops column pruning from rewriting the right branch into a keys-only
    aggregate. The two subtrees stay ``sameResult``, Catalyst's
    ReuseExchange fires, and lineitem is scanned + shuffled ONCE (measured
    2.9s → 1.2s at sf0.1; a keys-only right branch forces a second full
    scan+shuffle, and a persist() instead costs the InMemoryRelation build,
    1.7s). Same at 100 TB: one fact-table pass, reused exchange.
    """
    t = tables(spark, sf_dir)
    li = t.lineitem
    scaled_rev = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        * 10_000
    ).cast("long")
    pre = li.groupBy("l_partkey", "l_suppkey").agg(
        F.count(F.lit(1)).alias("pre_n"),
        F.sum(scaled_rev).alias("pre_rev"),
    )
    partsupp = pre.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        F.col("pre_n").alias("ps_n"),
        F.col("pre_rev").alias("ps_rev"),
    )
    return (
        pre.join(
            partsupp,
            (pre.l_partkey == partsupp.ps_partkey)
            & (pre.l_suppkey == partsupp.ps_suppkey)
            & (pre.pre_n == partsupp.ps_n)
            & (pre.pre_rev == partsupp.ps_rev),
        )
        .join(F.broadcast(t.part), pre.l_partkey == t.part.p_partkey)
        .join(F.broadcast(t.supplier), pre.l_suppkey == t.supplier.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            F.sum("pre_n").alias("n_lines"),
            (F.sum("pre_rev") / F.lit(10_000.0)).alias("revenue"),
        )
    )


@register(
    "c6_bucketed_layout",
    oracle=f"""
    WITH partsupp AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem
    )
    SELECT p.p_brand, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN partsupp ps ON l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY p.p_brand, s.s_name
    """,
    tags=("C6", "A13", "C5"),
    bench=True,
)
def c6_bucketed_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 on a BUCKETED storage layout: lineitem hash-bucketed on
    l_partkey (sources/bucketed.py), so the (l_partkey, l_suppkey)
    pre-aggregation — the query's one fact-table shuffle — runs with NO
    Exchange: HashPartitioning(l_partkey) already satisfies the
    ClusteredDistribution([l_partkey, l_suppkey]) the groupBy requires
    (partitioning keys are a subset of the grouping keys). The derived
    partsupp probe then joins key-local, and the dims broadcast.
    Identical semantics and oracle as c6_multikey_join; only the layout
    differs — the same ingest-once contract as c21_bucketed_layout.

    The pre-aggregate is ``localCheckpoint``ed before the self-probe:
    the raw plan's two aggregate subtrees collapse into one ReuseExchange
    because an Exchange is the reuse point — here there IS no exchange
    (the layout replaced it), so without the checkpoint Catalyst would
    aggregate the fact TWICE (once per probe side; measured slower than
    raw at sf0.1). Checkpointed, the bucket-local aggregation runs once
    and both probe sides read the materialized result — the same
    multiply-consumed-intermediate discipline as k3's shingle relation.

    At 100 TB: the raw-layout plan shuffles the full fact table on the
    key pair once per run; this plan never shuffles it at all. Bucketing
    by the SINGLE leading key (not the pair) keeps the layout reusable
    by every part-keyed query while still satisfying the pair groupBy.
    """
    from daas_apps_spark.sources.bucketed import bucketed_table

    t = tables(spark, sf_dir)
    li = spark.table(bucketed_table(spark, sf_dir, "lineitem", "l_partkey"))
    scaled_rev = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,4)"
        )
        * 10_000
    ).cast("long")
    pre = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("pre_n"),
            F.sum(scaled_rev).alias("pre_rev"),
        )
        .localCheckpoint()
    )
    partsupp = pre.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        F.col("pre_n").alias("ps_n"),
        F.col("pre_rev").alias("ps_rev"),
    )
    return (
        pre.join(
            partsupp,
            (pre.l_partkey == partsupp.ps_partkey)
            & (pre.l_suppkey == partsupp.ps_suppkey)
            & (pre.pre_n == partsupp.ps_n)
            & (pre.pre_rev == partsupp.ps_rev),
        )
        .join(F.broadcast(t.part), pre.l_partkey == t.part.p_partkey)
        .join(F.broadcast(t.supplier), pre.l_suppkey == t.supplier.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            F.sum("pre_n").alias("n_lines"),
            (F.sum("pre_rev") / F.lit(10_000.0)).alias("revenue"),
        )
    )


@register(
    "c7_range_join_bands",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
        VALUES ('budget', 0.0, 500.0),
               ('mid', 500.0, 1200.0),
               ('premium', 1200.0, 100000.0)
    )
    SELECT b.band_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MIN(p.p_partkey) AS BIGINT) AS min_partkey
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band_name
    """,
    tags=("C7",),
)
def c7_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against an inline band dimension (BNLJ + broadcast)."""
    p = table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 100000.0)],
        "band_name string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_partkey").cast("long").alias("min_partkey"),
        )
    )


@register(
    "c8_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    tags=("C8",),
)
def c8_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of tiny dims (region × nation = 125 rows)."""
    t = tables(spark, sf_dir)
    return t.region.crossJoin(t.nation).select("r_name", "n_name")


@register(
    "c9_interval_point_join",
    oracle="""
    WITH windows(win_id, win_start, win_end) AS (
        VALUES (1, TIMESTAMP '2024-01-03 00:00:00', TIMESTAMP '2024-01-05 00:00:00'),
               (2, TIMESTAMP '2024-01-10 12:00:00', TIMESTAMP '2024-01-12 00:00:00'),
               (3, TIMESTAMP '2024-01-20 00:00:00', TIMESTAMP '2024-01-28 06:30:00')
    )
    SELECT w.win_id, e.event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events e JOIN windows w ON e.ts >= w.win_start AND e.ts < w.win_end
    GROUP BY w.win_id, e.event_type
    """,
    tags=("C9",),
)
def c9_interval_point_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (R19 ``-L <contig>`` interval-filter analog).

    Intervals modeled as struct rows per SURVEY §1.3; broadcast the tiny
    interval table so the fact side never shuffles.
    """
    e = table(spark, sf_dir, "events")
    wins = spark.createDataFrame(
        [
            (1, "2024-01-03 00:00:00", "2024-01-05 00:00:00"),
            (2, "2024-01-10 12:00:00", "2024-01-12 00:00:00"),
            (3, "2024-01-20 00:00:00", "2024-01-28 06:30:00"),
        ],
        "win_id int, win_start string, win_end string",
    ).select(
        "win_id",
        F.col("win_start").cast("timestamp").alias("win_start"),
        F.col("win_end").cast("timestamp").alias("win_end"),
    )
    return (
        e.join(F.broadcast(wins), (e.ts >= wins.win_start) & (e.ts < wins.win_end))
        .groupBy("win_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "c11_self_join_sequences",
    oracle="""
    SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_click_purchase_pairs
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    GROUP BY c.user_id
    """,
    tags=("C11", "C9"),
)
def c11_self_join_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: purchase within one hour after a click, per user."""
    e = table(spark, sf_dir, "events")
    c = e.alias("c")
    p = e.alias("p")
    return (
        c.join(
            p,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.event_type") == "click")
            & (F.col("p.event_type") == "purchase")
            & (F.col("p.ts") > F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("c.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_click_purchase_pairs"))
    )


@register(
    "g5_upsert_merge",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
    ),
    updates AS (
        SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    merged AS (
        SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
               COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
               CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                    WHEN u.o_orderkey IS NULL THEN 'keep'
                    ELSE 'update' END AS action
        FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    )
    SELECT action,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('o_totalprice')} AS revenue
    FROM merged GROUP BY action
    """,
    tags=("G5", "C2", "A5"),
)
def g5_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert / MERGE INTO semantics as pure DataFrame algebra: base ⟗
    updates on the key, update side wins, with per-action census.

    The lakehouse MERGE (insert new keys, overwrite matched keys, keep the
    rest) without a table format: one full-outer shuffle join on the key +
    COALESCE projection. At 100 TB both sides hash-partition on the key
    once — same cost class as any fact-fact join — and the output is
    written partitioned to become the next base (the reference's R16
    write-then-swap commit generalized to keyed rows).
    """
    o = table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("b_key"), F.col("o_totalprice").alias("b_price")
    )
    updates = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("u_key"),
        (F.col("o_totalprice") * 1.1).alias("u_price"),
    )
    merged = base.join(
        updates, base.b_key == updates.u_key, "full_outer"
    ).select(
        F.coalesce("u_key", "b_key").alias("o_orderkey"),
        F.coalesce("u_price", "b_price").alias("o_totalprice"),
        F.when(F.col("b_key").isNull(), "insert")
        .when(F.col("u_key").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("revenue"),
    )


@register(
    "c12_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    tags=("C12", "C1", "D1", "F4"),
)
def c12_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped composition: 3-table join chain with selective
    filters on every side, keyed aggregation, top-10 by revenue.

    The segment filter reduces customer BEFORE the join (broadcast after
    AQE sees the filtered size); the date filters push to both fact scans.
    The final top-10 is TakeOrderedAndProject — no global sort.
    """
    t = tables(spark, sf_dir)
    c = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    o = t.orders.filter(F.col("o_orderdate") < "1997-01-01")
    li = t.lineitem.filter(F.col("l_shipdate") > "1997-01-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "c13_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_custkey, o.o_orderkey,
           {sql_dsum('o.o_totalprice')} AS total_price,
           {sql_dsum('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, o.o_orderkey
    """,
    tags=("C13", "C3", "D1"),
)
def c13_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped composition: HAVING-filtered aggregate drives a
    semi-join back onto the join chain (the "large volume customer").

    The `big` relation is a pre-aggregation of the fact table (shuffle of
    partials, then HAVING) whose surviving keys semi-join the fact chain —
    the aggregate-then-filter-then-rejoin shape; the second lineitem pass
    re-aggregates only the surviving orders.
    """
    t = tables(spark, sf_dir)
    li = t.lineitem
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li.withColumnRenamed("l_orderkey", "li_orderkey"),
              F.col("o_orderkey") == F.col("li_orderkey"))
        .join(big, F.col("o_orderkey") == big.l_orderkey, "left_semi")
        .groupBy("c_custkey", "o_orderkey")
        .agg(
            dsum("o_totalprice").alias("total_price"),
            dsum("l_quantity").alias("total_qty"),
        )
    )


@register(
    "b9_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_suppkey = s.s_suppkey
          AND l2.l_discount > 0.09 AND l2.l_quantity > 45
    )
    """,
    tags=("B9", "C3", "C4", "A8"),
)
def b9_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL front-end.

    The parser/analyzer path for correlated subqueries: Catalyst rewrites
    both predicates into left-semi and left-anti joins (the same plans the
    C3/C4 DataFrame forms produce) — asserted here by running the SAME
    text on both engines.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
        )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_suppkey = s.s_suppkey
              AND l2.l_discount > 0.09 AND l2.l_quantity > 45
        )
        """
    )


@register(
    "b15_null_handling",
    oracle="""
    WITH injected AS (
        SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS acct,
               NULLIF(c_mktsegment, 'BUILDING') AS seg
        FROM customer
    ),
    filled AS (
        SELECT COALESCE(acct, 0.0) AS acct,
               CASE COALESCE(seg, 'UNKNOWN')
                    WHEN 'HOUSEHOLD' THEN 'HOME'
                    ELSE COALESCE(seg, 'UNKNOWN') END AS seg
        FROM injected
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(acct AS DECIMAL(18,4))) AS DOUBLE) AS sum_acct
    FROM filled GROUP BY seg
    """,
    tags=("B15", "B6", "D1"),
)
def b15_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrameNaFunctions surface (`df.na.fill` / `df.na.replace`)
    — declarative null repair as API calls rather than hand-written
    CASE/COALESCE. The fixture has no nulls by construction, so the query
    first INJECTS them deterministically (negative balances → NULL,
    one segment → NULL), then repairs: fill acct with 0.0 and segment
    with 'UNKNOWN', relabel HOUSEHOLD → HOME via na.replace, and census
    the result. The oracle spells out the COALESCE/CASE equivalents —
    pinning that the na.* sugar lowers to exactly those expressions
    (they appear verbatim in the optimized plan, fully codegen).
    """
    c = table(spark, sf_dir, "customer")
    injected = c.select(
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("acct"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    )
    filled = injected.na.fill({"acct": 0.0, "seg": "UNKNOWN"}).na.replace(
        {"HOUSEHOLD": "HOME"}, subset=["seg"]
    )
    return filled.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("acct").alias("sum_acct"),
    )


_B16_SQL = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ALL
"""


@register(
    "b16_group_by_all",
    oracle=_B16_SQL,
    tags=("B16", "D1", "A8"),
)
def b16_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL through the SQL front-end: the analyzer infers the
    grouping keys from the non-aggregate select-list entries — the
    exploratory-SQL convenience both modern engines converged on. The
    SAME text runs on both engines, pinning that key inference picks the
    identical column set (a regression here silently changes grain,
    which is why it gets its own conformance query).
    """
    register_views(spark, sf_dir)
    return spark.sql(_B16_SQL)


_F6_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
"""


@register(
    "f6_pagination",
    oracle=_F6_SQL,
    tags=("F6", "F1", "F3"),
)
def f6_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination under a total order (page 3 of the
    price-ranked report) — the API-server access pattern. Deterministic
    because the sort is a TOTAL order (unique tie-break key); the SAME
    text runs on both engines. Physical note: Spark executes this as a
    single TakeOrderedAndProject of offset+limit rows (heap of 60), not
    a full sort — still, deep pagination (OFFSET 10⁶) degrades linearly,
    so production keyset-paginates (WHERE (price, key) < last_seen ORDER
    BY ... LIMIT n) — that form is index/pruning-friendly at 100 TB.
    """
    register_views(spark, sf_dir)
    return spark.sql(_F6_SQL)


_B17_ORACLE = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_big,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON c_custkey = o_custkey
WHERE o_totalprice > 200000
GROUP BY c_mktsegment
"""


@register(
    "b17_pipe_syntax",
    oracle=_B17_ORACLE,
    tags=("B17", "B9", "C1", "D1"),
)
def b17_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's `|>` operators, the GoogleSQL
    pipe-query form): scan |> filter |> join |> aggregate reads in
    dataflow order instead of inside-out SQL — the front-end surface a
    migration from dataframe-first shops actually uses. The oracle is
    the standard-SQL twin of the same plan, pinning that the pipe parser
    lowers to identical semantics (filter pushdown and the join both
    survive the rewrite — same optimized plan as the classic text).
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_totalprice > 200000
        |> JOIN customer ON c_custkey = o_custkey
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_big,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                         AS revenue
           GROUP BY c_mktsegment
        |> SELECT c_mktsegment, n_big, revenue
        """
    )


@register(
    "b18_select_except",
    oracle="""
    SELECT * EXCLUDE (o_totalprice, o_orderpriority)
    FROM orders WHERE o_orderkey < 100
    """,
    tags=("B18", "B1"),
)
def b18_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT * EXCEPT (cols)` — subtractive projection through the SQL
    front-end (DuckDB spells it EXCLUDE; the semantics are identical and
    the hash-match pins that). The practical 100 TB point: the analyzer
    resolves the subtraction to an explicit column list BEFORE
    optimization, so column pruning still reaches the scan — dropping
    two columns of a 300-column fact this way reads 298, not 300 plus a
    projection.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * EXCEPT (o_totalprice, o_orderpriority)
        FROM orders WHERE o_orderkey < 100
        """
    )


_B19_SQL = """
SELECT t.r_name, n.n_name, t.mult * n.n_nationkey AS scaled_key
FROM (VALUES ('AMERICA', 2), ('ASIA', 3), ('EUROPE', 5))
     AS t(r_name, mult)
JOIN region r ON r.r_name = t.r_name
JOIN nation n ON n.n_regionkey = r.r_regionkey
"""


@register(
    "b19_values_inline_table",
    oracle=_B19_SQL,
    tags=("B19", "B3", "C1"),
)
def b19_values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES as an inline relation joined against catalog tables — the
    parameter-table idiom (a small config list shipped in the query text
    instead of a temp table). The literal rows constant-fold and
    broadcast; the SAME text runs on both engines, pinning the derived
    column aliasing (`AS t(r_name, mult)`) and literal typing.
    """
    register_views(spark, sf_dir)
    return spark.sql(_B19_SQL)
