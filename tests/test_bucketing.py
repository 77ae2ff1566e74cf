"""Bucketed co-located joins (SCALING.md §2): pre-bucketing both sides of a
recurring join key eliminates the per-query shuffle entirely — the Spark
analog of the reference pre-splitting BAMs per contig so each tool run reads
an already-partitioned input (SAMSplitter.java:10-43).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.operators.partitioning import physical_plan
from tests.conftest import SF_ORACLE, SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped in teardown.
    for name, key, n in [("orders", "o_custkey", 8), ("customer", "c_custkey", 8)]:
        (
            table(spark, SF_SMOKE, name)
            .write.bucketBy(n, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"b_{name}")
        )
    yield
    for name in ["b_orders", "b_customer"]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # model the large⋈large regime (where bucketing matters): disable the
    # broadcast fallback the tiny fixture would otherwise trigger
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o, c = spark.table("b_orders"), spark.table("b_customer")
        joined = o.join(c, o.o_custkey == c.c_custkey, "inner")
        plan = physical_plan(joined, mode="simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket layout IS the partitioning
        # and results equal the shuffled join on the raw tables
        raw = table(spark, SF_SMOKE, "orders").join(
            table(spark, SF_SMOKE, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
            "inner",
        )
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregate_has_no_shuffle(spark, bucketed_tables):
    o = spark.table("b_orders")
    agg = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    plan = physical_plan(agg, mode="simple")
    assert "Exchange" not in plan
    assert agg.count() == table(spark, SF_SMOKE, "orders").select("o_custkey").distinct().count()


def test_c21_bucketed_probes_shuffle_free(spark):
    """c21_bucketed_layout's three fact passes (probe join to orders plus
    Catalyst's left-semi / left-anti self-probes) must run on the bucketed
    layout with ZERO Exchange on the orderkey — the bucket layout IS the
    partitioning. Dim-broadcast regime (supplier broadcasts, facts don't):
    the only remaining exchange is the final tiny group-by aggregate."""
    from daas_apps_spark.registry import REGISTRY, _load_all

    _load_all()
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(100 * 1024))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = REGISTRY["c21_bucketed_layout"].fn(spark, SF_ORACLE)
        plan = physical_plan(df, mode="simple")
        for ln in plan.splitlines():
            if "Exchange hashpartitioning" in ln:
                assert "l_orderkey" not in ln and "o_orderkey" not in ln, ln
        assert "SortMergeJoin" in plan  # the probes are real fact-fact joins
        # and the bucketed result equals the plain c21 result
        plain = REGISTRY["c21_waiting_supplier"].fn(spark, SF_ORACLE)
        assert sorted(map(tuple, df.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_c6_bucketed_groupby_shuffle_free(spark):
    """c6_bucketed_layout's (l_partkey, l_suppkey) pre-aggregation — the
    query's one fact shuffle — must run with NO Exchange on the bucketed
    scan: HashPartitioning(l_partkey) satisfies the pair groupBy's
    ClusteredDistribution (partitioning keys ⊆ grouping keys)."""
    from daas_apps_spark.registry import REGISTRY, _load_all

    _load_all()
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = REGISTRY["c6_bucketed_layout"].fn(spark, SF_ORACLE)
        plan = physical_plan(df, mode="simple")
        for ln in plan.splitlines():
            if "Exchange hashpartitioning" in ln:
                assert "l_partkey" not in ln, ln
        plain = REGISTRY["c6_multikey_join"].fn(spark, SF_ORACLE)
        assert sorted(map(tuple, df.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_c15_bucketed_fact_join_shuffle_free(spark):
    """c15_bucketed_layout: lineitem⋈orders must run bucket-local (zero
    Exchange on the orderkey — the raw plan's only fact-sized shuffle);
    the surviving exchanges carry pre-aggregated rows only."""
    from daas_apps_spark.registry import REGISTRY, _load_all

    _load_all()
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = REGISTRY["c15_bucketed_layout"].fn(spark, SF_ORACLE)
        plan = physical_plan(df, mode="simple")
        for ln in plan.splitlines():
            if "Exchange hashpartitioning" in ln:
                assert "l_orderkey" not in ln and "o_orderkey" not in ln, ln
        plain = REGISTRY["c15_regional_revenue"].fn(spark, SF_ORACLE)
        assert sorted(map(tuple, df.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_a13_zorder_buckets_bound_both_dimensions(spark):
    """The defining Z-order property: each of the 16 top-level Morton
    buckets fixes the top 2 bits of BOTH dimensions, so every bucket's
    bounding box spans <= 1/4 of each dimension's 0-255 range — the
    reason row-group min/max stats prune on both filter columns. A
    one-column sort would leave the other dimension's span at full range."""
    from daas_apps_spark.registry import get_queries
    from tests.conftest import SF_ORACLE

    rows = get_queries()["a13_zorder_layout"](spark, SF_ORACLE).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.x_span <= 63, (r.zbucket, r.x_span)
        assert r.y_span <= 63, (r.zbucket, r.y_span)


def test_default_buckets_sized_to_machine_and_pow2(spark):
    """One file per bucket means bucket count caps scan parallelism, so
    the default must never undershoot the core count, and must be a
    power of two for stable reuse across scale factors."""
    from daas_apps_spark.sources.bucketed import default_buckets

    n = default_buckets(spark, SF_SMOKE, "lineitem")
    assert n >= spark.sparkContext.defaultParallelism
    assert n & (n - 1) == 0  # power of two


def test_substitute_tables_only_rewrites_from_join_positions():
    from daas_apps_spark.sources.bucketed import substitute_tables

    sql = (
        "SELECT 'from orders' AS lit, o_orderkey -- join orders\n"
        "FROM orders o /* from orders */ "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE o.note = 'it''s from orders'"
    )
    out = substitute_tables(sql, {"orders": "B_O", "lineitem": "B_L"})
    assert out.count("B_O") == 1 and out.count("B_L") == 1
    assert "'from orders'" in out and "-- join orders" in out
    assert "/* from orders */" in out and "'it''s from orders'" in out


def test_bucketed_table_cache_key_distinguishes_full_paths(tmp_path):
    """Two fixture dirs with the same basename must never share a managed
    table (the cache key embeds a hash of the FULL path)."""
    from daas_apps_spark.sources.bucketed import _table_name

    a = str(tmp_path / "x" / "sfsame")
    b = str(tmp_path / "y" / "sfsame")
    ta = _table_name(a, "orders", "o_custkey", 32)
    tb = _table_name(b, "orders", "o_custkey", 32)
    assert ta != tb
    # and the key is stable for the same path however it's spelled
    assert _table_name(a + "/", "orders", "o_custkey", 32) == ta


def test_substitute_tables_follows_qualified_refs_and_rejects_comma_lists():
    from daas_apps_spark.sources.bucketed import substitute_tables

    out = substitute_tables(
        "SELECT orders.o_orderkey FROM orders WHERE orders.o_totalprice > 0",
        {"orders": "B_O"},
    )
    assert out == "SELECT B_O.o_orderkey FROM B_O WHERE B_O.o_totalprice > 0"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="comma position"):
        substitute_tables(
            "SELECT * FROM orders, lineitem WHERE 1=1",
            {"orders": "B_O", "lineitem": "B_L"},
        )


def test_substitute_tables_case_insensitive_qualified_refs():
    """FROM/JOIN rewriting is case-insensitive; qualified column refs
    must follow with the SAME case-insensitivity, or 'FROM Orders ...
    WHERE ORDERS.x' leaves a dangling qualifier that fails analysis."""
    from daas_apps_spark.sources.bucketed import substitute_tables

    sql = (
        "SELECT ORDERS.o_orderkey FROM Orders "
        "WHERE ORDERS.o_totalprice > 5 AND orders.o_orderkey < 9"
    )
    out = substitute_tables(sql, {"orders": "bkt_o"})
    assert "FROM bkt_o" in out
    assert out.count("bkt_o.") == 3
    assert "ORDERS." not in out and "orders." not in out


def test_prune_stale_warehouse_removes_only_old_naming(spark, tmp_path):
    """The janitor deletes bkt_* dirs from superseded naming schemes
    (no full-path-hash segment) and leaves current-scheme dirs alone."""
    import os
    from urllib.parse import urlparse

    from daas_apps_spark.sources.bucketed import prune_stale_warehouse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    stale = os.path.join(wh, "bkt_sf0_001_lineitem_l_orderkey_16")
    current = os.path.join(wh, "bkt_sf0_001_0a1b2c3d_lineitem_l_orderkey_32")
    os.makedirs(stale, exist_ok=True)
    os.makedirs(current, exist_ok=True)
    removed = prune_stale_warehouse(spark)
    assert "bkt_sf0_001_lineitem_l_orderkey_16" in removed
    assert not os.path.exists(stale)
    assert os.path.exists(current)
    os.rmdir(current)


def test_substitute_tables_comma_guard_is_case_insensitive():
    """A capitalized comma-position operand must raise like a lowercase
    one — otherwise the FROM keeps the raw table while the (?i)
    qualifier rewrite half-applies."""
    import pytest

    from daas_apps_spark.sources.bucketed import substitute_tables

    with pytest.raises(ValueError, match="comma position"):
        substitute_tables(
            "SELECT * FROM Orders, Lineitem "
            "WHERE Lineitem.l_orderkey = Orders.o_orderkey",
            {"orders": "bkt_o", "lineitem": "bkt_l"},
        )
