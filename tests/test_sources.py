"""Source/sink & partitioning properties: provenance (A4), partition pruning
(B8), per-partition sort (F2/R3), salted-aggregate physical rewrite (R12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.operators.partitioning import (
    physical_plan,
    salt_column,
    sort_within_partitions,
)
from tests.conftest import SF_SMOKE


def test_input_file_provenance(spark, tmp_path):
    """A4/R1: multi-file layout → input_file_name() recovers provenance."""
    path = str(tmp_path / "multi")
    table(spark, SF_SMOKE, "orders").repartition(4).write.parquet(path)
    df = spark.read.parquet(path).withColumn("src_file", F.input_file_name())
    n_files = df.select("src_file").distinct().count()
    assert n_files == 4
    # recursive lookup over nested dirs (R1 recurses into subfolders)
    nested = str(tmp_path / "nested")
    table(spark, SF_SMOKE, "region").write.parquet(nested + "/ds1")
    table(spark, SF_SMOKE, "region").write.parquet(nested + "/ds2")
    rec = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(nested)
        .withColumn("src_file", F.input_file_name())
    )
    assert rec.count() == 10
    assert rec.filter(F.col("src_file").contains("ds2")).count() == 5


def test_partition_pruning_in_plan(spark, tmp_path):
    """B8/R19: a filter on the partition column prunes at planning time."""
    path = str(tmp_path / "parted")
    table(spark, SF_SMOKE, "orders").write.partitionBy("o_orderstatus").parquet(path)
    pruned = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = physical_plan(pruned)
    assert "PartitionFilters" in plan
    full = spark.read.parquet(path)
    assert pruned.count() < full.count()


def test_sort_within_partitions_monotonic(spark):
    """F2/R3: rows are nondecreasing inside each partition, no exchange."""
    li = table(spark, SF_SMOKE, "lineitem").repartition(8, "l_suppkey")
    sorted_df = sort_within_partitions(li, "l_shipdate")
    plan = physical_plan(sorted_df)
    # exactly one Exchange node (the repartition) — the sort adds none
    assert plan.count("+- Exchange") == 1

    def check(it):
        prev = None
        for row in it:
            if prev is not None and row.l_shipdate < prev:
                yield {"violation": 1}
            prev = row.l_shipdate

    violations = sorted_df.rdd.mapPartitions(
        lambda it: check(it)
    ).count()
    assert violations == 0


def test_salt_column_deterministic_and_bounded(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    salted = li.withColumn("s", salt_column("l_orderkey", 16))
    stats = salted.agg(
        F.min("s").alias("lo"), F.max("s").alias("hi"), F.countDistinct("s").alias("n")
    ).first()
    assert stats.lo >= 0 and stats.hi < 16 and stats.n > 8
    a = salted.groupBy("s").count().toPandas().sort_values("s").reset_index(drop=True)
    b = (
        li.repartition(7)
        .withColumn("s", salt_column("l_orderkey", 16))
        .groupBy("s")
        .count()
        .toPandas()
        .sort_values("s")
        .reset_index(drop=True)
    )
    assert a.equals(b)  # salt is content-derived, partition-independent


def test_broadcast_join_in_plan(spark):
    """C5: explicit broadcast produces a BroadcastHashJoin, no big-side shuffle."""
    t_c = table(spark, SF_SMOKE, "customer")
    t_n = table(spark, SF_SMOKE, "nation")
    joined = t_c.join(F.broadcast(t_n), t_c.c_nationkey == t_n.n_nationkey)
    assert "BroadcastHashJoin" in physical_plan(joined)


def test_csv_malformed_row_modes(spark, tmp_path):
    """A15: the three CSV malformed-row policies — PERMISSIVE nulls the bad
    fields and captures the raw line, DROPMALFORMED silently drops the
    row, FAILFAST raises — the ingestion-robustness contract a 100 TB
    landing zone depends on (one bad line must not kill a billion-row
    load unless the pipeline asked for exactly that)."""
    import pytest
    from pyspark.sql import functions as F

    path = str(tmp_path / "dirty.csv")
    rows = ["1,alpha,10.5", "2,beta,not_a_number", "3,gamma,7.25"]
    with open(path, "w") as fh:
        fh.write("\n".join(rows))
    schema = "id INT, name STRING, score DOUBLE, _corrupt STRING"

    permissive = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    ).collect()
    assert len(permissive) == 3
    bad = [r for r in permissive if r._corrupt is not None]
    assert len(bad) == 1 and bad[0].id == 2 and bad[0].score is None
    assert bad[0]._corrupt == "2,beta,not_a_number"

    dropped = (
        spark.read.schema("id INT, name STRING, score DOUBLE")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    ).collect()
    assert sorted(r.id for r in dropped) == [1, 3]

    with pytest.raises(Exception) as exc:
        (
            spark.read.schema("id INT, name STRING, score DOUBLE")
            .option("mode", "FAILFAST")
            .csv(path)
        ).collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_a16_parquet_bloom_filter_written_and_effective(spark, tmp_path):
    """A16: point-lookup data skipping via parquet bloom filters. The
    writer option must physically embed the filter (observable as the
    bloom bytes in the file — pyarrow 16 doesn't expose the offset, so
    the check is the deterministic size delta on identical data), and a
    point-predicate read over the bloom'd file stays correct. At 100 TB
    this is the difference between touching every row group of a
    billion-key table and touching the handful whose filter might
    contain the key (dictionary/min-max stats can't help on high-NDV
    scattered keys)."""
    import glob
    import os

    df = (
        table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .coalesce(1)
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    df.write.parquet(plain)
    (
        df.write.option("parquet.bloom.filter.enabled#o_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_orderkey", "2000")
        .parquet(bloomed)
    )
    size = lambda d: sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(d, "*.parquet"))
    )
    assert size(bloomed) > size(plain) + 1024, "bloom filter bytes missing"
    want = sorted(map(tuple, df.filter(F.col("o_orderkey") == 42).collect()))
    got = sorted(
        map(
            tuple,
            spark.read.parquet(bloomed)
            .filter(F.col("o_orderkey") == 42)
            .collect(),
        )
    )
    assert got == want


def test_a18_analyze_table_statistics_feed_cbo(spark, tmp_path):
    """A18: catalog statistics (ANALYZE TABLE ... COMPUTE STATISTICS) — the
    reference reads per-key sizes driver-side to plan partitions
    (SparkCaller.java:180-243, contig lengths from SAM headers); the
    engine's analog is table/column stats in the catalog feeding Spark's
    cost-based optimizer. The test pins that stats are recorded (row
    count + size visible in DESCRIBE EXTENDED) and surfaced to the
    planner (optimizedPlan stats carry the exact row count instead of a
    size-only estimate)."""
    spark.sql("DROP TABLE IF EXISTS a18_stats_demo")
    # saveAsTable lands in the session warehouse dir (spark-warehouse/,
    # gitignored); the table is dropped in the finally below.
    table(spark, SF_SMOKE, "customer").write.mode("overwrite").saveAsTable(
        "a18_stats_demo"
    )
    try:
        spark.sql(
            "ANALYZE TABLE a18_stats_demo COMPUTE STATISTICS FOR ALL COLUMNS"
        )
        desc = spark.sql("DESCRIBE TABLE EXTENDED a18_stats_demo").collect()
        stats_row = [r for r in desc if r.col_name == "Statistics"]
        assert stats_row and "rows" in stats_row[0].data_type
        n = spark.table("a18_stats_demo").count()
        assert f"{n} rows" in stats_row[0].data_type
        # Planner-visible: with the cost-based optimizer on, plan stats
        # carry the exact analyzed row count, not just a byte-size guess.
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            # drop the pre-ANALYZE cached relation so the plan picks up
            # the new catalog stats
            spark.sql("REFRESH TABLE a18_stats_demo")
            jstats = (
                spark.table("a18_stats_demo")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert jstats.rowCount().isDefined()
            # py4j renders scala.math.BigInt to a plain int/str
            assert int(str(jstats.rowCount().get())) == n
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
    finally:
        spark.sql("DROP TABLE IF EXISTS a18_stats_demo")
