"""Property tests for K1-K3 dedup (idempotence + planted-duplicate recovery).

The sf fixtures contain no exact duplicates, so exact-dedup behavior is
exercised on a corpus doubled in-memory (documents ∪ copy with shifted ids) —
mirroring how the reference validated scatter-gather invariance: operator on
a transformed input must behave predictably (SURVEY.md §5.2#3).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_ORACLE, SF_SMOKE

_load_all()


def _dedup_keep_first(df):
    w = Window.partitionBy("content_hash").orderBy(F.col("doc_id").asc())
    return (
        df.withColumn("content_hash", F.sha2("text", 256))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def test_exact_dedup_removes_planted_duplicates(spark):
    d = table(spark, SF_SMOKE, "documents")
    n = d.count()
    doubled = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    deduped = _dedup_keep_first(doubled)
    assert deduped.count() == n
    # keep-first: every survivor is an original id, not a shifted copy
    assert deduped.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_exact_dedup_idempotent(spark):
    d = table(spark, SF_SMOKE, "documents")
    once = _dedup_keep_first(d)
    twice = _dedup_keep_first(once.drop("content_hash"))
    assert once.count() == twice.count()


def test_lsh_finds_planted_near_duplicates(spark):
    """The corpus has ~25 shingle-jaccard>=0.5 pairs; LSH must surface most."""
    pairs = REGISTRY["k3_lsh_near_dedup"].fn(spark, SF_ORACLE).toPandas()
    assert len(pairs) >= 15
    assert (pairs["jaccard"] >= 0.5).all()


def test_minhash_signature_is_partition_independent(spark):
    base = REGISTRY["k2_minhash_signatures"].fn(spark, SF_ORACLE)
    repartitioned = base.repartition(17).toPandas().sort_values("doc_id").reset_index(drop=True)
    plain = base.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert plain.equals(repartitioned)
