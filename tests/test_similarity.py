"""Property tests for the K4 similarity operators (SURVEY.md §5.2#3)."""

from __future__ import annotations

from daas_apps_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_ORACLE

_load_all()


def test_ann_recall_vs_brute_force(spark):
    """Multi-probe LSH must recover a meaningful share of true top-k."""
    brute = REGISTRY["k4_cosine_topk"].fn(spark, SF_ORACLE).toPandas()
    ann = REGISTRY["k4_ann_lsh_topk"].fn(spark, SF_ORACLE).toPandas()
    truth = {(r.query_id, r.cand_id) for r in brute.itertuples()}
    got = {(r.query_id, r.cand_id) for r in ann.itertuples()}
    recall = len(truth & got) / len(truth)
    # Deterministic construction → stable recall; floor set below measured.
    assert recall >= 0.3, f"ANN recall collapsed: {recall:.2f}"


def test_ann_is_deterministic(spark):
    a = REGISTRY["k4_ann_lsh_topk"].fn(spark, SF_ORACLE).toPandas()
    b = REGISTRY["k4_ann_lsh_topk"].fn(spark, SF_ORACLE).toPandas()
    key = ["query_id", "rnk"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_ivf_recall_vs_brute_force(spark):
    """IVF-Flat probe (N_PROBE of ~40 lists) must recover most of true top-k."""
    brute = REGISTRY["k4_cosine_topk"].fn(spark, SF_ORACLE).toPandas()
    ivf = REGISTRY["k4_ann_ivf_topk"].fn(spark, SF_ORACLE).toPandas()
    truth = {(r.query_id, r.cand_id) for r in brute.itertuples()}
    got = {(r.query_id, r.cand_id) for r in ivf.itertuples()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"
    # every query must still return a full top-k page
    assert (ivf.groupby("query_id").size() == 5).all()


def test_ivf_pq_recall_vs_brute_force(spark):
    """IVF-PQ (coreset codebooks, reconstructed-vector scoring) must keep
    most of the true top-k despite quantization loss."""
    brute = REGISTRY["k4_cosine_topk"].fn(spark, SF_ORACLE).toPandas()
    pq = REGISTRY["k4_ann_ivf_pq_topk"].fn(spark, SF_ORACLE).toPandas()
    truth = {(r.query_id, r.cand_id) for r in brute.itertuples()}
    got = {(r.query_id, r.cand_id) for r in pq.itertuples()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.4, f"IVF-PQ recall collapsed: {recall:.2f}"


def test_ivf_pq_reconstruction_matches_numpy_argmin(spark):
    """The decode must snap every sub-vector to the L2-nearest coreset
    codeword of ITS subspace, concatenated in subspace order — checked
    against a direct numpy argmin (ties broken by code id, matching the
    operator's ORDER BY)."""
    import numpy as np

    from daas_apps_spark.catalog import table as _table
    from daas_apps_spark.operators.similarity import (
        PQ_M,
        PQ_MOD,
        PQ_SUB,
        as_double,
        pq_reconstructions,
    )
    from pyspark.sql import functions as F

    e = _table(spark, SF_ORACLE, "embeddings")
    corpus = e.select("vec_id", as_double("embedding").alias("v"))
    got = {
        r.vec_id: np.array(r.rv)
        for r in pq_reconstructions(corpus).collect()
    }
    vecs = {r.vec_id: np.array(r.v) for r in corpus.collect()}
    code_ids = sorted(v for v in vecs if v % PQ_MOD == 0)
    for vid, v in list(sorted(vecs.items()))[:40]:
        expect = []
        for m in range(PQ_M):
            xm = v[m * PQ_SUB : (m + 1) * PQ_SUB]
            d2 = [
                float(np.dot(e_, e_) - 2 * np.dot(xm, e_))
                for e_ in (
                    vecs[c][m * PQ_SUB : (m + 1) * PQ_SUB]
                    for c in code_ids
                )
            ]
            best = code_ids[int(np.argmin(d2))]  # argmin ties → lowest idx
            expect.append(vecs[best][m * PQ_SUB : (m + 1) * PQ_SUB])
        assert np.allclose(got[vid], np.concatenate(expect)), vid
    assert all(len(rv) == PQ_M * PQ_SUB for rv in got.values())


def test_ivf_pq_rerank_recovers_ivf_ceiling(spark):
    """Exact re-rank of the PQ shortlist must lift recall to (or near)
    the IVF probe ceiling — quantization error may only cost recall via
    shortlist MISSES, not misordering."""
    brute = REGISTRY["k4_cosine_topk"].fn(spark, SF_ORACLE).toPandas()
    ivf = REGISTRY["k4_ann_ivf_topk"].fn(spark, SF_ORACLE).toPandas()
    rr = REGISTRY["k4_ann_ivf_pq_rerank"].fn(spark, SF_ORACLE).toPandas()
    pq = REGISTRY["k4_ann_ivf_pq_topk"].fn(spark, SF_ORACLE).toPandas()
    truth = {(r.query_id, r.cand_id) for r in brute.itertuples()}

    def recall(df):
        got = {(r.query_id, r.cand_id) for r in df.itertuples()}
        return len(truth & got) / len(truth)

    r_ivf, r_rr, r_pq = recall(ivf), recall(rr), recall(pq)
    assert r_rr >= r_pq, f"re-rank below raw PQ: {r_rr:.2f} < {r_pq:.2f}"
    assert r_rr >= r_ivf - 0.1, (
        f"re-rank {r_rr:.2f} fell far below IVF ceiling {r_ivf:.2f}"
    )
