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


def _cdc_chunks_py(text: str) -> list[str]:
    """Pure-python reference of k51's boundary rule (polynomial 4-gram)."""
    W, DIV = 4, 16
    cps = [ord(c) for c in text]
    bnd = [
        i
        for i in range(W, len(text) + 1)
        if (cps[i - 4] * 29791 + cps[i - 3] * 961 + cps[i - 2] * 31
            + cps[i - 1]) % DIV == 0
    ]
    starts = [1] + [x + 1 for x in bnd]
    ends = bnd + [len(text)]
    return [
        text[s - 1: e] for s, e in zip(starts, ends) if e - s + 1 > 0
    ]


def test_cdc_chunks_reassemble_and_are_edit_stable():
    base = (
        "key agg row scan slow fast table value part hash value table part "
        "a row fast merge batch part value fast spark a a the line sort"
    )
    chunks = _cdc_chunks_py(base)
    assert "".join(chunks) == base  # reassembly identity

    # single-char insertion perturbs only boundary-local chunks: every
    # boundary beyond the edit window shifts by exactly +1, so the chunk
    # SUFFIX after the first post-edit boundary is identical
    pos = len(base) // 2
    edited = base[:pos] + "X" + base[pos:]
    echunks = _cdc_chunks_py(edited)
    assert "".join(echunks) == edited
    tail = [c for c in chunks if len(c) > 0][-2:]
    etail = [c for c in echunks if len(c) > 0][-2:]
    assert tail == etail  # far-from-edit chunks unchanged


def test_k51_cdc_census_matches_python_reference(spark):
    from collections import defaultdict

    from daas_apps_spark.registry import REGISTRY

    got = {
        r["lang"]: (r["n_docs"], r["total_chunks"], r["distinct_chunks"])
        for r in REGISTRY["k51_cdc_chunking"].fn(spark, SF_ORACLE).collect()
    }
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, lang, text FROM read_parquet('{SF_ORACLE}/documents.parquet') WHERE LENGTH(text) >= 4"
    ).fetchall()
    agg = defaultdict(lambda: [set(), 0, set()])
    for doc_id, lang, text in docs:
        a = agg[lang]
        a[0].add(doc_id)
        for c in _cdc_chunks_py(text):
            a[1] += 1
            a[2].add(c)
    want = {
        lang: (len(a[0]), a[1], len(a[2])) for lang, a in agg.items()
    }
    assert got == want


def test_k55_mllib_lsh_recalls_handrolled_pairs(spark):
    """The MLlib MinHashLSH path and the hand-rolled SQL LSH path must
    agree: every oracle-verified near-dup pair (exact Jaccard ≥ 0.5 from
    k3) should be recovered by the MLlib candidate join (6 hash tables
    make a miss on a ≥0.5-similar pair vanishingly unlikely), and every
    MLlib pair at the threshold must be genuinely similar per its own
    exact-on-vectors distance."""
    from daas_apps_spark.registry import REGISTRY

    truth = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["k3_lsh_near_dedup"].fn(spark, SF_ORACLE).collect()
    }
    got_rows = REGISTRY["k55_mllib_minhash_lsh"].fn(spark, SF_ORACLE).collect()
    got = {(r.doc_a, r.doc_b) for r in got_rows}
    assert truth, "hand-rolled path found no pairs — fixture changed?"
    missed = truth - got
    assert len(missed) <= max(1, len(truth) // 10), (
        f"MLlib LSH missed {len(missed)}/{len(truth)} verified pairs"
    )
    for r in got_rows:
        assert r.jaccard >= 0.49, (r.doc_a, r.doc_b, r.jaccard)
