"""K9-K11 corpus-operator invariants beyond oracle parity: the semantic
properties a training-data pipeline relies on (split partitioning, sample
containment, chunk reconstruction, redaction idempotence).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.operators import corpus  # noqa: F401  (registers)
from daas_apps_spark.registry import REGISTRY
from tests.conftest import SF_SMOKE


def test_train_test_split_is_a_partition(spark):
    """Every document lands in exactly one split; censuses sum to the corpus."""
    total = table(spark, SF_SMOKE, "documents").count()
    rows = REGISTRY["k9_train_test_split"].fn(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rows) == total
    splits = {r.split for r in rows}
    assert splits <= {"train", "valid", "test"}


def test_split_is_stable_under_repartitioning(spark):
    """Hash-based membership must not depend on physical layout."""
    fn = REGISTRY["k9_hash_sample"].fn
    baseline = {r.doc_id for r in fn(spark, SF_SMOKE).collect()}
    repart = {
        r.doc_id
        for r in fn(spark, SF_SMOKE).repartition(13).collect()
    }
    assert baseline == repart and baseline


def test_samples_are_subsets_with_expected_rate(spark):
    docs = table(spark, SF_SMOKE, "documents")
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    sample = {r.doc_id for r in REGISTRY["k9_hash_sample"].fn(spark, SF_SMOKE).collect()}
    assert sample <= all_ids
    # ~8% nominal; md5 is uniform, so allow a generous band on 500 docs
    assert 0.02 <= len(sample) / len(all_ids) <= 0.16


def test_chunks_reconstruct_the_document(spark):
    """Stride-40/size-80 chunks: every even-index chunk starts at a stride
    boundary and the concatenation of stride-aligned prefixes rebuilds the
    full text exactly."""
    out = REGISTRY["k10_chunk_documents"].fn(spark, SF_SMOKE)
    chunks = out.orderBy("doc_id", "chunk_id").collect()
    docs = {
        r.doc_id: r.text
        for r in table(spark, SF_SMOKE, "documents")
        .filter((F.col("doc_id") % 20 == 0) & (F.length("text") > 0))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(docs)
    for doc_id, cs in by_doc.items():
        text = docs[doc_id]
        # chunk i covers text[i*40 : i*40+80]
        for c in cs:
            assert c.chunk == text[c.chunk_id * 40 : c.chunk_id * 40 + 80]
        rebuilt = "".join(c.chunk[:40] for c in cs[:-1]) + cs[-1].chunk
        assert rebuilt == text, f"doc {doc_id} not reconstructed"


def test_redaction_counts_consistent(spark):
    """Exactly one synthetic e-mail and at least the synthetic id digits are
    found per doc; redacted text never contains an e-mail pattern."""
    rows = REGISTRY["k10_pii_redact"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_emails == 1
        assert r.n_num_spans >= 0
        assert r.redacted_len > 0


def test_corpus_pipeline_counts_bounded_by_census(spark):
    """The dedup→sample pipeline can never report more docs per lang than
    the raw census."""
    census = {
        r.lang: r.n_docs
        for r in REGISTRY["k11_quality_report"].fn(spark, SF_SMOKE).collect()
    }
    for r in REGISTRY["k11_corpus_pipeline"].fn(spark, SF_SMOKE).collect():
        assert r.n_docs <= census[r.lang]


def test_k15_unique_docs_reassemble_exactly(spark):
    """A document none of whose chunks duplicate another doc's must come
    back byte-identical from the dedup-reassembly pipeline."""
    out = REGISTRY["k15_chunk_dedup"].fn(spark, SF_SMOKE)
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    joined = out.join(docs, "doc_id").collect()
    full = [r for r in joined if r.n_kept == r.n_chunks]
    assert full, "fixture should contain fully-unique documents"
    for r in full:
        assert r.cleaned_text == r.text, f"doc {r.doc_id} not reassembled"
    # and dedup must actually fire somewhere
    assert any(r.n_kept < r.n_chunks for r in joined)


def test_k12_decontam_excludes_bench_docs(spark):
    """Benchmark-slice documents must never appear as scored corpus docs,
    and contamination is a fraction of each doc's own gram count."""
    out = REGISTRY["k12_decontam_overlap"].fn(spark, SF_SMOKE).collect()
    bench_ids = {
        r.doc_id
        for r in table(spark, SF_SMOKE, "documents")
        .filter(
            F.expr(
                "cast(conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10)"
                " as bigint) % 1000 < 30"
            )
        )
        .collect()
    }
    assert bench_ids, "bench slice empty — threshold drifted"
    assert not ({r.doc_id for r in out} & bench_ids)
    for r in out:
        assert 0 <= r.n_hit_grams <= r.n_grams
        assert 0.0 <= r.contamination <= 1.0


def test_k13_assignments_partition_the_vectors(spark):
    """Cluster census sizes must sum to the vector count (every vector
    assigned exactly once) across exactly k clusters at most."""
    emb_n = table(spark, SF_SMOKE, "embeddings").count()
    rows = REGISTRY["k13_kmeans_embed"].fn(spark, SF_SMOKE).collect()
    assert sum(r.n_points for r in rows) == emb_n
    assert len(rows) <= 10


def test_k14_mix_is_subset_with_budgeted_total(spark):
    """The mixed sample never exceeds its per-domain candidate pool, and
    realized rates are <= target rates (hash thresholding can only
    undershoot the nominal rate, never overshoot past quantization)."""
    rows = REGISTRY["k14_domain_mix"].fn(spark, SF_SMOKE).collect()
    assert {r.domain for r in rows} == {"web", "books", "code"}
    for r in rows:
        assert 0 < r.n_sampled <= r.n_candidates
        assert r.realized_rate <= r.target_rate + 0.1
