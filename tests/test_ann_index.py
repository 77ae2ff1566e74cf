"""CDC-maintained IVF index (K69): operators/ann_index.py.

The registry row pins maintained ≡ rebuilt on the fixture lifecycle;
these tests pin the edge semantics: ambiguous feed pairs (insert-then-
delete vs delete-then-reinsert inside one window), no-op windows,
resume watermarks, and the drift signal.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from daas_apps_spark.operators.ann_index import (
    assign_to_centroids,
    build_ivf_index,
    index_source_version,
    ivf_drift,
    maintain_ivf_index,
    probe_topk,
)
from daas_apps_spark.sources.table_format import VersionedTable

DIMS = 8


def _vec(i: int) -> list[float]:
    # deterministic, direction-varied vectors
    return [float((i * 7 + d * 3) % 13 - 6) for d in range(DIMS)]


def _vectors_df(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture()
def cent(spark):
    return _vectors_df(spark, [0, 5, 9]).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )


def _idx_rows(idx):
    return sorted(
        (r.vec_id, r.cent_id) for r in idx.read().collect()
    )


def _rebuild(spark, src, cent, path):
    return _idx_rows(build_ivf_index(spark, src, path, cent))


def test_maintain_equals_rebuild_through_append_and_delete(
    spark, tmp_path, cent
):
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_vectors_df(spark, range(0, 20)))  # v1
    idx = build_ivf_index(spark, src, str(tmp_path / "idx"), cent)
    assert index_source_version(idx) == 1
    src.append(_vectors_df(spark, range(20, 30)))  # v2
    src.delete("vec_id % 4 = 0")  # v3 (COW)
    head = maintain_ivf_index(spark, src, idx, cent)
    assert head == 3 and index_source_version(idx) == 3
    assert _idx_rows(idx) == _rebuild(spark, src, cent, str(tmp_path / "rb"))


def test_ambiguous_pairs_resolve_against_head(spark, tmp_path, cent):
    """MOR deletes make the feed emit PAIRED rows: an id inserted then
    DV-deleted inside the window must end ABSENT; one DV-deleted then
    re-inserted must end PRESENT. Both look identical in the feed."""
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_vectors_df(spark, range(0, 10)))  # v1
    idx = build_ivf_index(spark, src, str(tmp_path / "idx"), cent)
    # window: insert 100 (v2), MOR-delete it (v3)  -> absent
    #         MOR-delete 3 (v3), re-insert 3 (v4)  -> present
    src.append(_vectors_df(spark, [100]))  # v2
    src.delete("vec_id = 100 OR vec_id = 3", mode="mor")  # v3
    src.append(_vectors_df(spark, [3]))  # v4
    maintain_ivf_index(spark, src, idx, cent)
    rows = _idx_rows(idx)
    ids = [i for i, _ in rows]
    assert 100 not in ids and 3 in ids
    assert rows == _rebuild(spark, src, cent, str(tmp_path / "rb"))


def test_noop_window_commits_nothing(spark, tmp_path, cent):
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_vectors_df(spark, range(0, 10)))
    idx = build_ivf_index(spark, src, str(tmp_path / "idx"), cent)
    before = idx.latest_version()
    assert maintain_ivf_index(spark, src, idx, cent) == 1
    assert idx.latest_version() == before  # no empty commit


def test_maintenance_resumes_from_watermark(spark, tmp_path, cent):
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_vectors_df(spark, range(0, 10)))
    idx = build_ivf_index(spark, src, str(tmp_path / "idx"), cent)
    src.append(_vectors_df(spark, range(10, 15)))
    maintain_ivf_index(spark, src, idx, cent)
    src.append(_vectors_df(spark, range(15, 20)))
    maintain_ivf_index(spark, src, idx, cent)  # only (2, 3] applied
    assert _idx_rows(idx) == _rebuild(spark, src, cent, str(tmp_path / "rb"))


def test_probe_topk_identical_on_maintained_index(spark, tmp_path, cent):
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_vectors_df(spark, range(0, 25)))
    idx = build_ivf_index(spark, src, str(tmp_path / "idx"), cent)
    src.append(_vectors_df(spark, range(25, 40)))
    src.delete("vec_id % 3 = 1")
    maintain_ivf_index(spark, src, idx, cent)
    rebuilt = build_ivf_index(spark, src, str(tmp_path / "rb"), cent)
    q = src.read().filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    a = probe_topk(idx, q, cent, n_probe=2, top_k=3)
    b = probe_topk(rebuilt, q, cent, n_probe=2, top_k=3)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ivf_drift_signal(spark, tmp_path, cent):
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_vectors_df(spark, range(0, 30)))
    idx = build_ivf_index(spark, src, str(tmp_path / "idx"), cent)
    base_v = idx.latest_version()
    assert ivf_drift(idx, base_v) == pytest.approx(0.0, abs=1e-9)
    # skewed arrivals: many copies of ONE direction shift the lists
    skew = spark.createDataFrame(
        [(1000 + i, _vec(5)) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    src.append(skew)
    maintain_ivf_index(spark, src, idx, cent)
    assert ivf_drift(idx, base_v) > 0.1  # retrain signal fires


def test_assignment_is_deterministic_on_ties(spark, cent):
    # identical vector equidistant to all centroids of its own value:
    # the cent_id-asc tiebreak picks the same list every time
    df = spark.createDataFrame(
        [(1, _vec(0)), (2, _vec(0))], "vec_id long, v array<double>"
    )
    a = assign_to_centroids(df.select("vec_id", "v"), cent).collect()
    b = assign_to_centroids(df.select("vec_id", "v"), cent).collect()
    assert sorted((r.vec_id, r.cent_id) for r in a) == sorted(
        (r.vec_id, r.cent_id) for r in b
    )


def test_foreign_index_refuses(spark, tmp_path, cent):
    vt = VersionedTable(spark, str(tmp_path / "plain"))
    vt.append(_vectors_df(spark, [1]))
    with pytest.raises(ValueError, match="no recorded source version"):
        index_source_version(vt)
