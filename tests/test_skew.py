"""Skew handling (R12 / SCALING.md §2): results and plans under pathological
key distributions — one key carrying ~99% of rows, the regime the reference
handled with greedy contig bin-packing (SparkCaller.java:190-243).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from daas_apps_spark.operators.partitioning import physical_plan, salted_aggregate


@pytest.fixture(scope="module")
def skewed(spark):
    """200k rows: 99% on key 0, the rest uniform over 1..99."""
    return (
        spark.range(200_000)
        .select(
            F.when(F.col("id") < 198_000, 0)
            .otherwise((F.col("id") % 99) + 1)
            .alias("k"),
            F.col("id").alias("uid"),
            (F.col("id") % 7).cast("double").alias("v"),
        )
    )


def test_skewed_join_matches_expected_counts(spark, skewed):
    """AQE skew-split must not change join semantics."""
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    joined = skewed.join(dim, "k", "inner")
    assert joined.count() == 200_000
    hot = joined.filter(F.col("k") == 0).count()
    assert hot == skewed.filter(F.col("k") == 0).count()


def test_skewed_aggregate_partial_combine_bounds_shuffle(spark, skewed):
    """Map-side combine means the shuffle carries K×partitions rows, so the
    hot key cannot overload one reducer; result equals a per-key sum."""
    out = {r.k: (r.n, r.s) for r in
           skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()}
    assert out[0][0] == 198_000
    assert len(out) == 100
    plan = physical_plan(skewed.groupBy("k").agg(F.sum("v")), mode="simple")
    assert "partial_sum" in plan


def test_salted_aggregate_on_skewed_keys(spark, skewed):
    plain = {r.k: r.n for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {
        r.k: r.n
        for r in salted_aggregate(
            skewed,
            ["k"],
            partial_aggs=[F.count(F.lit(1)).alias("__n")],
            final_aggs=[F.sum("__n").alias("n")],
            unique_col="uid",
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_aqe_skew_join_enabled_in_session(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
