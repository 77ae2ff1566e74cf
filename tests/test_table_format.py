"""Versioned table format (sources/table_format.py): commit-log semantics.

The contract under test is Delta/Iceberg's core discipline reduced to its
essentials: immutable parquet data dirs + a replayable JSON commit log, so
overwrite/merge are atomic (readers see whole versions or nothing), old
snapshots stay readable (time travel), and a torn data write is invisible
(no commit references it).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from daas_apps_spark.sources.table_format import (
    ConstraintViolationError,
    VersionedTable,
)


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "tbl"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_append_accumulates_versions(spark, vt):
    assert vt.append(_df(spark, [(1, "a")])) == 1
    assert vt.append(_df(spark, [(2, "b")])) == 2
    got = sorted((r.k, r.v) for r in vt.read().collect())
    assert got == [(1, "a"), (2, "b")]
    assert [c["operation"] for c in vt.history()] == ["append", "append"]


def test_overwrite_retires_prior_files_but_keeps_them_readable(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.overwrite(_df(spark, [(3, "c")]))
    assert [r.k for r in vt.read().collect()] == [3]
    # time travel: v1 still reads the retired files
    assert sorted(r.k for r in vt.read(version=1).collect()) == [1, 2]


def test_merge_upserts_matched_and_inserts_new(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.merge(_df(spark, [(2, "B"), (3, "c")]), keys=["k"])
    got = dict((r.k, r.v) for r in vt.read().collect())
    assert got == {1: "a", 2: "B", 3: "c"}
    # and the pre-merge snapshot is unchanged
    old = dict((r.k, r.v) for r in vt.read(version=1).collect())
    assert old == {1: "a", 2: "b"}


def test_orphan_data_dir_is_invisible(spark, vt):
    """A torn write (data dir present, commit absent) must not surface."""
    vt.append(_df(spark, [(1, "a")]))
    orphan = os.path.join(vt.path, "data", "v9-deadbeef")
    _df(spark, [(99, "zz")]).write.parquet(orphan)
    assert [r.k for r in vt.read().collect()] == [1]


def test_read_missing_version_raises(spark, vt):
    with pytest.raises(ValueError):
        vt.read()
    vt.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError):
        vt.read(version=0)


def test_commit_log_is_contiguous_and_replayable(spark, vt):
    for i in range(4):
        vt.append(_df(spark, [(i, str(i))]))
    hist = vt.history()
    assert [c["version"] for c in hist] == [1, 2, 3, 4]
    # every referenced data dir exists; every add set is disjoint
    seen = set()
    for c in hist:
        for d in c["add"]:
            assert os.path.isdir(os.path.join(vt.path, "data", d))
            assert d not in seen
            seen.add(d)


def test_merge_is_copy_on_write_not_in_place(spark, vt):
    """The merge commit must add a NEW dir and retire (not delete) the old
    ones — in-place mutation would break every older snapshot."""
    vt.append(_df(spark, [(1, "a")]))
    before = set(os.listdir(os.path.join(vt.path, "data")))
    vt.merge(_df(spark, [(1, "A")]), keys=["k"])
    after = set(os.listdir(os.path.join(vt.path, "data")))
    assert before < after  # old dirs still on disk, new dir added
    last = vt.history()[-1]
    assert last["operation"] == "merge"
    assert set(last["remove"]) == before


def test_optimize_compacts_without_changing_rows(spark, vt):
    for i in range(4):
        vt.append(_df(spark, [(i, str(i))]))
    before = sorted((r.k, r.v) for r in vt.read().collect())
    v = vt.optimize()
    assert vt.history()[-1]["operation"] == "optimize"
    assert sorted((r.k, r.v) for r in vt.read().collect()) == before
    # one live dir now, and old versions still time-travel
    assert len(vt._live_dirs()) == 1
    assert sorted(r.k for r in vt.read(version=2).collect()) == [0, 1]
    assert v == 5


def test_vacuum_reclaims_unreferenced_and_orphans(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.overwrite(_df(spark, [(2, "b")]))
    orphan = os.path.join(vt.path, "data", "v9-torn")
    _df(spark, [(99, "zz")]).write.parquet(orphan)
    deleted = vt.vacuum(keep_versions=0)
    # v1's retired dir and the orphan are gone; latest still reads
    assert any(d.startswith("v1-") for d in deleted)
    assert "v9-torn" in deleted
    assert [r.k for r in vt.read().collect()] == [2]
    with pytest.raises(Exception):
        vt.read(version=1).collect()


def test_commit_records_footer_stats(spark, vt):
    vt.append(_df(spark, [(1, "a"), (5, "b")]))
    stats = vt.history()[-1]["stats"]
    (dir_stats,) = stats.values()
    assert dir_stats["k"] == [1, 5, 0]  # [min, max, null_count]
    assert dir_stats["v"] == ["a", "b", 0]


def test_pruned_read_skips_disjoint_dirs_and_keeps_semantics(spark, vt):
    """Three appends with disjoint key ranges: a range-pruned read must
    scan ONLY the intersecting dir(s) (manifest-level file skipping) and
    return exactly the rows a full-scan filter would."""
    vt.append(_df(spark, [(1, "a"), (10, "b")]))
    vt.append(_df(spark, [(100, "c"), (110, "d")]))
    vt.append(_df(spark, [(1000, "e")]))
    pruned = vt.read(prune=("k", 100, 200))
    # only the middle dir intersects [100, 200]
    scanned = pruned.inputFiles()
    assert all("v2-" in f for f in scanned), scanned
    got = sorted(r.k for r in pruned.filter("k BETWEEN 100 AND 200").collect())
    want = sorted(
        r.k for r in vt.read().filter("k BETWEEN 100 AND 200").collect()
    )
    assert got == want == [100, 110]
    # fully disjoint range: empty result, zero dirs scanned
    assert vt.read(prune=("k", 5000, 9000)).count() == 0


def test_pruned_read_is_conservative_without_stats(spark, vt):
    """A column absent from the recorded stats must never prune."""
    vt.append(_df(spark, [(1, "a")]))
    # prune on a non-existent stats key: dir kept, read still works
    assert vt.read(prune=("nope", 0, 0)).count() == 1


def test_changes_between_append_only_uses_manifest_only(spark, vt):
    """Append-only range: the change feed must read ONLY the dirs the
    range's commits added (manifest fast path — no snapshot diff)."""
    vt.append(_df(spark, [(1, "a")]))
    vt.append(_df(spark, [(2, "b")]))
    vt.append(_df(spark, [(3, "c")]))
    feed = vt.changes_between(1, 3)
    assert all(("v2-" in f or "v3-" in f) for f in feed.inputFiles())
    got = sorted((r.k, r._change_type) for r in feed.collect())
    assert got == [(2, "insert"), (3, "insert")]
    # empty range
    assert vt.changes_between(3, 3).count() == 0


def test_changes_between_with_rewrite_diffs_snapshots(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.merge(_df(spark, [(2, "B"), (3, "c")]), keys=["k"])
    got = sorted(
        (r.k, r.v, r._change_type) for r in vt.changes_between(1).collect()
    )
    assert got == [
        (2, "B", "insert"),
        (2, "b", "delete"),
        (3, "c", "insert"),
    ]


def test_optimize_zorder_bits_tighten_high_cardinality(spark, tmp_path):
    """Configurable Z-order resolution: on a HIGH-cardinality 2-D key
    with many output files, 12-bit codes keep subdividing where 8-bit
    codes plateau (an 8-bit 2-D code has only 16 bits — beyond 2^16/N
    files the extra files stop shrinking any bounding box), so the mean
    per-file x-span must be strictly tighter at 12 bits."""
    import glob

    import pyarrow.parquet as pq

    from daas_apps_spark.sources.table_format import VersionedTable

    # 4096 x 4096 sparse grid — far beyond 8-bit's 256 cells/dimension
    data = spark.range(40000).selectExpr(
        "cast((id * 2654435761) % 4096 as long) as x",
        "cast((id * 40503) % 4096 as long) as y",
    )

    def mean_x_span(bits: int) -> float:
        vt = VersionedTable(spark, str(tmp_path / f"vt_{bits}"))
        vt.append(data)
        vt.optimize(
            target_partitions=64, zorder_by=("x", "y"), zorder_bits=bits
        )
        (live_dir,) = vt._live_dirs()
        spans = []
        for f in glob.glob(os.path.join(live_dir, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            col = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.row_group(0).num_columns)
            }["x"]
            mn = min(
                md.row_group(r).column(col).statistics.min
                for r in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(r).column(col).statistics.max
                for r in range(md.num_row_groups)
            )
            spans.append(mx - mn)
        return sum(spans) / len(spans)

    assert mean_x_span(12) < mean_x_span(8)

    # the bigint guard scales with bits: 12-bit allows at most 5 columns
    vt = VersionedTable(spark, str(tmp_path / "vt_guard"))
    vt.append(data)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bigint"):
        vt.optimize(
            zorder_by=("x", "y", "x", "y", "x", "y"), zorder_bits=12
        )


def test_optimize_zorder_bounds_both_dimensions(spark, vt):
    """OPTIMIZE ZORDER: over a full 2-D grid, each of the 4 output files
    must bound BOTH columns to roughly half their range (a one-column
    sort would leave the other column spanning the full range in every
    file) — checked from the parquet footers."""
    import glob

    import pyarrow.parquet as pq

    grid = spark.range(64 * 64).selectExpr(
        "cast(id % 64 as long) as x", "cast(id div 64 as long) as y"
    )
    vt.append(grid)
    vt.optimize(target_partitions=4, zorder_by=("x", "y"))
    assert vt.read().count() == 64 * 64
    (live_dir,) = vt._live_dirs()
    files = glob.glob(os.path.join(live_dir, "*.parquet"))
    assert len(files) == 4
    for f in files:
        md = pq.ParquetFile(f).metadata
        spans = {}
        for i in range(md.row_group(0).num_columns):
            name = md.row_group(0).column(i).path_in_schema
            mn = min(
                md.row_group(r).column(i).statistics.min
                for r in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(r).column(i).statistics.max
                for r in range(md.num_row_groups)
            )
            spans[name] = mx - mn
        # half-range + slack for sampling-based range boundaries
        assert spans["x"] <= 40, spans
        assert spans["y"] <= 40, spans


def test_schema_carries_through_merge(spark, vt):
    df = spark.range(3).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("n"),
        F.lit("x").alias("tag"),
    )
    vt.append(df)
    vt.merge(
        spark.range(2).select(
            F.col("id").alias("k"),
            (F.col("id") * 100).alias("n"),
            F.lit("y").alias("tag"),
        ),
        keys=["k"],
    )
    out = vt.read()
    assert set(out.columns) == {"k", "n", "tag"}
    got = {r.k: (r.n, r.tag) for r in out.collect()}
    assert got == {0: (0, "y"), 1: (100, "y"), 2: (20, "x")}


def test_log_checkpoint_written_and_equivalent(spark, vt):
    """At CHECKPOINT_EVERY commits a checkpoint snapshot is written; the
    replay-from-checkpoint state must equal the full replay, and commit
    files OLDER than the checkpoint become droppable (log retention):
    latest reads survive their deletion, pre-checkpoint time travel is
    gone — the VACUUM trade, applied to the log."""
    from daas_apps_spark.sources.table_format import CHECKPOINT_EVERY

    for i in range(CHECKPOINT_EVERY + 2):
        vt.append(_df(spark, [(i, str(i))]))
    ck_file = os.path.join(
        vt.path, "_log", f"{CHECKPOINT_EVERY:08d}.checkpoint.json"
    )
    assert os.path.exists(ck_file)
    want = sorted(r.k for r in vt.read().collect())
    # drop every commit file the checkpoint covers
    for v in range(1, CHECKPOINT_EVERY + 1):
        os.remove(os.path.join(vt.path, "_log", f"{v:08d}.json"))
    assert sorted(r.k for r in vt.read().collect()) == want
    assert vt.latest_version() == CHECKPOINT_EVERY + 2
    with pytest.raises(ValueError):
        vt.read(version=3)  # history before the checkpoint is truncated


def test_change_feed_refuses_truncated_log(spark, vt):
    """Log retention (post-checkpoint commit-file deletion) must make a
    change-feed range that reaches into the truncated region FAIL LOUDLY
    — silently missing the dropped commits' adds would corrupt every
    downstream incremental consumer."""
    from daas_apps_spark.sources.table_format import (
        CHECKPOINT_EVERY,
        added_dirs_between,
    )

    for i in range(CHECKPOINT_EVERY + 1):
        vt.append(_df(spark, [(i, str(i))]))
    for v in range(1, 4):  # drop commits 1-3 (checkpoint at 10 covers them)
        os.remove(os.path.join(vt.path, "_log", f"{v:08d}.json"))
    with pytest.raises(ValueError, match="truncated"):
        vt.changes_between(0)
    with pytest.raises(ValueError, match="truncated"):
        added_dirs_between(vt.path, 0)
    # ranges entirely within surviving commits still work
    feed = vt.changes_between(CHECKPOINT_EVERY - 1)
    assert feed.count() == 2


def test_lakehouse_end_to_end(spark, tmp_path):
    """The full arc composed: batch ingest commits -> table-as-stream ->
    streaming transform -> exactly-once sink into a SECOND versioned
    table -> OPTIMIZE -> stats-pruned read -> VACUUM. Each piece is
    tested alone above/in test_streaming_live; this pins that they
    compose without stepping on each other's state."""
    from daas_apps_spark.streaming.live import (
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, x double")
    )
    src.append(
        spark.createDataFrame([(3, 30.0), (4, 40.0)], "k long, x double")
    )

    # stream the source table, double x, land in a second versioned table
    out = VersionedTable(spark, str(tmp_path / "out"))

    def apply_batch(batch_df, batch_id):
        applied = {
            c.get("metadata", {}).get("batch_id") for c in out.history()
        }
        if batch_id in applied:
            return
        out.append(
            batch_df.selectExpr("k", "x * 2 AS x2"),
            metadata={"batch_id": batch_id},
        )

    stream = (
        spark.readStream.format("table_changes")
        .option("path", src.path)
        .option("tableschema", "k long, x double")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted((r.k, r.x2) for r in out.read().collect()) == [
        (1, 20.0),
        (2, 40.0),
        (3, 60.0),
        (4, 80.0),
    ]

    # maintenance: compact, then a stats-pruned read, then reclaim
    out.optimize()
    pruned = out.read(prune=("k", 3, 4))
    assert sorted(r.k for r in pruned.filter("k >= 3").collect()) == [3, 4]
    out.vacuum(keep_versions=0)
    assert sorted(r.k for r in out.read().collect()) == [1, 2, 3, 4]

    # and a second streaming run on the same checkpoint is a no-op
    before = out.latest_version()
    q = (
        spark.readStream.format("table_changes")
        .option("path", src.path)
        .option("tableschema", "k long, x double")
        .load()
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert out.latest_version() == before


def test_schema_evolution_merge_read(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double")
    )
    merged = vt.read(merge_schema=True)
    assert set(merged.columns) == {"k", "v", "score"}
    got = {r.k: r.score for r in merged.collect()}
    assert got[1] is None and got[2] == 9.5


def test_vacuum_min_age_spares_young_dirs(spark, vt):
    """The retention window: an unreferenced dir younger than
    min_age_seconds is indistinguishable from a concurrent writer's
    in-flight (not-yet-committed) dir, so vacuum must spare it — Delta's
    VACUUM retention contract. Backdating the dir makes it reclaimable."""
    vt.append(_df(spark, [(1, "a")]))
    vt.overwrite(_df(spark, [(2, "b")]))
    in_flight = os.path.join(vt.path, "data", "v9-inflight")
    _df(spark, [(99, "zz")]).write.parquet(in_flight)
    deleted = vt.vacuum(keep_versions=0, min_age_seconds=3600)
    assert deleted == []  # everything unreferenced is still "young"
    assert os.path.isdir(in_flight)
    # age the in-flight dir past the window; now it's a reclaimable orphan
    old = 1_000_000_000
    os.utime(in_flight, (old, old))
    deleted = vt.vacuum(keep_versions=0, min_age_seconds=3600)
    assert deleted == ["v9-inflight"]
    assert [r.k for r in vt.read().collect()] == [2]


def test_changes_between_empty_range_on_empty_table(spark, vt):
    """An empty version range on an EMPTY table (v_to == 0) must return an
    empty change feed, not raise — the fallback can't read a snapshot that
    never existed."""
    feed = vt.changes_between(0, 0)
    assert feed.count() == 0
    assert "_change_type" in feed.columns


def test_changes_between_empty_range_keeps_schema(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    feed = vt.changes_between(1, 1)
    assert feed.count() == 0
    assert set(feed.columns) == {"k", "v", "_change_type"}


def test_all_pruned_read_keeps_merged_schema(spark, vt):
    """When manifest pruning excludes EVERY dir, the zero-row result must
    still surface the same (merged) schema the un-pruned read would — a
    narrower schema breaks downstream unions."""
    vt.append(_df(spark, [(1, "a")]))
    vt.append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double")
    )
    got = vt.read(prune=("k", 100, 200), merge_schema=True)
    assert got.count() == 0
    assert set(got.columns) == {"k", "v", "score"}


def test_merge_is_file_level_cow(spark, vt):
    """A MERGE whose update keys intersect only ONE dir's recorded range
    must rewrite only that dir; range-disjoint dirs survive the commit
    untouched — at 100 TB a 1-row MERGE rewrites one file's worth of
    data, not the table."""
    vt.append(_df(spark, [(1, "a"), (2, "b")]))  # dir 1: k ∈ [1, 2]
    vt.append(_df(spark, [(100, "x"), (200, "y")]))  # dir 2: k ∈ [100, 200]
    live_before = [os.path.basename(p) for p in vt._live_dirs()]
    vt.merge(_df(spark, [(2, "B")]), keys=["k"])
    last = vt.history()[-1]
    assert last["operation"] == "merge"
    assert len(last["remove"]) == 1  # only the intersecting dir retired
    assert last["remove"][0] == live_before[0]
    live_after = [os.path.basename(p) for p in vt._live_dirs()]
    assert live_before[1] in live_after  # disjoint dir untouched
    got = sorted((r.k, r.v) for r in vt.read().collect())
    assert got == [(1, "a"), (2, "B"), (100, "x"), (200, "y")]


def test_merge_disjoint_keys_is_pure_insert(spark, vt):
    """Updates whose key range intersects NO live dir append without
    retiring anything — an append-only commit the change feed's manifest
    fast path still accepts."""
    vt.append(_df(spark, [(1, "a")]))
    vt.merge(_df(spark, [(50, "z")]), keys=["k"])
    assert vt.history()[-1]["remove"] == []
    got = sorted((r.k, r.v) for r in vt.read().collect())
    assert got == [(1, "a"), (50, "z")]
    # append-only range → manifest-only change feed works across it
    feed = vt.changes_between(1, 2)
    assert [(r.k, r.v) for r in feed.collect()] == [(50, "z")]


def test_file_level_merge_equals_full_rewrite_semantics(spark, vt):
    """File-level COW is an OPTIMIZATION, not a semantics change: across a
    table whose dirs have overlapping, disjoint, and stats-less key
    ranges, merge() must produce exactly the rows a whole-table
    anti-join + union would."""
    import pandas as pd

    vt.append(_df(spark, [(1, "a"), (5, "b")]))
    vt.append(_df(spark, [(4, "c"), (9, "d")]))  # overlaps dir 1's range
    vt.append(_df(spark, [(100, "e"), (150, "f")]))  # disjoint
    updates = [(5, "B2"), (9, "D2"), (7, "new")]
    before = vt.read().toPandas()
    expect = {k: v for k, v in zip(before.k, before.v)}
    expect.update({k: v for k, v in updates})
    vt.merge(_df(spark, updates), keys=["k"])
    got = {r.k: r.v for r in vt.read().collect()}
    assert got == expect
    # the fully-disjoint dir survived, the two overlapping dirs retired
    last = vt.history()[-1]
    assert len(last["remove"]) == 2
    # time travel still sees the pre-merge state
    old = {r.k: r.v for r in vt.read(version=3).collect()}
    assert old == {k: v for k, v in zip(before.k, before.v)}


def test_stats_prune_and_merge_on_date_keys(spark, vt):
    """DATE columns participate in manifest stats (normalized to ISO
    strings, lexicographic == chronological), so time-keyed pruning and
    file-level COW merge — the commonest 100 TB partitioning axis —
    work exactly like integer keys."""
    import datetime

    def ddf(rows):
        return spark.createDataFrame(rows, "d date, v string")

    jan = [(datetime.date(2024, 1, i), f"j{i}") for i in (1, 15)]
    jun = [(datetime.date(2024, 6, i), f"u{i}") for i in (1, 15)]
    vt.append(ddf(jan))
    vt.append(ddf(jun))
    stats = vt._live_stats()
    d_ranges = [st["d"] for st in stats.values()]
    assert ["2024-01-01", "2024-01-15", 0] in d_ranges
    assert ["2024-06-01", "2024-06-15", 0] in d_ranges
    # prune with date objects AND with ISO strings — both hit one dir
    for lo, hi in [
        (datetime.date(2024, 1, 1), datetime.date(2024, 2, 1)),
        ("2024-01-01", "2024-02-01"),
    ]:
        pruned = vt.read(prune=("d", lo, hi))
        assert pruned.inputFiles() and len(pruned.inputFiles()) < len(
            vt.read().inputFiles()
        )
        assert {r.v for r in pruned.collect()} == {"j1", "j15"}
    # date-keyed merge rewrites only the January dir
    vt.merge(ddf([(datetime.date(2024, 1, 15), "J15!")]), keys=["d"])
    last = vt.history()[-1]
    assert len(last["remove"]) == 1
    got = {r.v for r in vt.read().collect()}
    assert got == {"j1", "J15!", "u1", "u15"}


def test_a25_temporal_prune_scans_one_commit(spark):
    """The registered temporal-prune query must actually skip the other
    commits' dirs — only the 1996 commit's dir may appear in inputFiles."""
    from daas_apps_spark.registry import REGISTRY, _load_all
    from tests.conftest import SF_SMOKE

    _load_all()
    df = REGISTRY["a25_temporal_prune"].fn(spark, SF_SMOKE)
    dirs = {f.rsplit("/", 2)[-2] for f in df.inputFiles()}
    assert len(dirs) == 1 and next(iter(dirs)).startswith("v2-"), dirs


def test_delete_range_three_way_partitions_dirs(spark, vt):
    """DELETE of a key range must leave disjoint dirs untouched, drop
    fully-covered dirs without reading a row, and rewrite only the
    straddling dir — pure manifest arithmetic plus one boundary file."""
    vt.append(_df(spark, [(1, "a"), (5, "b")]))  # disjoint (below)
    vt.append(_df(spark, [(10, "c"), (20, "d")]))  # fully inside [10, 30]
    vt.append(_df(spark, [(25, "e"), (40, "f")]))  # straddles hi boundary
    live_before = [os.path.basename(p) for p in vt._live_dirs()]
    vt.delete_range("k", 10, 30)
    last = vt.history()[-1]
    assert last["operation"] == "delete"
    # dropped dir 2 and rewrote dir 3; dir 1 untouched
    assert set(last["remove"]) == set(live_before[1:])
    assert len(last["add"]) == 1
    got = sorted((r.k, r.v) for r in vt.read().collect())
    assert got == [(1, "a"), (5, "b"), (40, "f")]
    # time travel still sees the pre-delete rows
    assert len(vt.read(version=3).collect()) == 6


def test_delete_range_keeps_null_keys(spark, vt):
    """NULL never matches BETWEEN, so NULL-keyed rows survive a range
    delete — including in dirs whose non-null range sits inside the
    deleted interval (min/max stats ignore NULLs; the recorded null
    count blocks the whole-dir drop)."""
    vt.append(
        spark.createDataFrame([(10, "x"), (None, "n")], "k long, v string")
    )
    vt.delete_range("k", 0, 100)
    got = [(r.k, r.v) for r in vt.read().collect()]
    assert got == [(None, "n")]


def test_delete_condition_copy_on_write(spark, vt):
    vt.append(_df(spark, [(1, "keep"), (2, "drop"), (3, "keep")]))
    vt.delete("v = 'drop'")
    assert sorted(r.k for r in vt.read().collect()) == [1, 3]
    # NULL predicate keeps the row (SQL DELETE semantics)
    vt.append(
        spark.createDataFrame([(9, None)], "k long, v string")
    )
    vt.delete("v = 'drop'")
    assert sorted(r.k for r in vt.read().collect()) == [1, 3, 9]


def test_merge_schema_evolution(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    wide = spark.createDataFrame(
        [(2, "B", 9.5)], "k long, v string, score double"
    )
    with pytest.raises(Exception):  # evolution is opt-in
        vt.merge(wide, keys=["k"])
    vt.merge(wide, keys=["k"], allow_schema_evolution=True)
    out = vt.read(merge_schema=True)
    assert set(out.columns) == {"k", "v", "score"}
    got = {r.k: (r.v, r.score) for r in out.collect()}
    assert got == {1: ("a", None), 2: ("B", 9.5)}


def test_optimize_incremental_folds_only_small_dirs(spark, vt):
    """OPTIMIZE with a size threshold folds only the small-dir tail; a
    right-sized dir survives untouched, and rows are unchanged."""
    big = spark.range(100_000).selectExpr(
        "id AS k", "sha2(cast(id AS string), 256) AS v"  # incompressible
    )
    vt.append(big)
    vt.append(_df(spark, [(1_000_001, "a")]))
    vt.append(_df(spark, [(1_000_002, "b")]))
    live_before = [os.path.basename(p) for p in vt._live_dirs()]
    rows_before = vt.read().count()
    v = vt.optimize(max_dir_bytes=1 << 20)  # 1 MiB: big dir is over
    last = vt.history()[-1]
    assert last["operation"] == "optimize"
    assert set(last["remove"]) == set(live_before[1:])  # only the 2 small
    assert live_before[0] in [os.path.basename(p) for p in vt._live_dirs()]
    assert vt.read().count() == rows_before
    assert len(vt._live_dirs()) == 2  # big + folded
    # idempotent: a second pass finds one (already-folded) small dir → no-op
    assert vt.optimize(max_dir_bytes=1 << 20) == v


def test_change_feed_skips_optimize_commits(spark, vt):
    """Compaction and the change feed coexist: an OPTIMIZE between two
    appends is a pure rewrite (data_change: false), so the feed across it
    still takes the manifest fast path and yields exactly the appended
    rows — no raise, no phantom inserts, no duplicates."""
    vt.append(_df(spark, [(1, "a")]))
    vt.append(_df(spark, [(2, "b")]))
    vt.optimize()  # v3: rewrites v1+v2 into one dir, same rows
    vt.append(_df(spark, [(3, "c")]))
    feed = vt.changes_between(1, 4)
    got = sorted((r.k, r._change_type) for r in feed.collect())
    assert got == [(2, "insert"), (3, "insert")]
    # and only the append dirs are scanned — manifest fast path held
    assert all(("v2-" in f or "v4-" in f) for f in feed.inputFiles())


def test_version_offset_stream_survives_optimize(spark, vt):
    """added_dirs_between must skip the OPTIMIZE commit the way Delta's
    dataChange=false does, and still raise on a REAL rewrite (merge)."""
    from daas_apps_spark.sources.table_format import added_dirs_between

    vt.append(_df(spark, [(1, "a")]))
    vt.optimize()
    vt.append(_df(spark, [(2, "b")]))
    dirs, v_to = added_dirs_between(vt.path, 1, 3)
    assert v_to == 3
    assert len(dirs) == 1 and "v3-" in dirs[0]
    vt.merge(_df(spark, [(1, "A")]), keys=["k"])
    with pytest.raises(ValueError, match="append-only"):
        added_dirs_between(vt.path, 1, 4)


def test_full_range_delete_leaves_readable_empty_table(spark, vt):
    """Deleting every row must leave the table READABLE as zero rows with
    its schema — not an unreadable no-snapshot state."""
    vt.append(_df(spark, [(1, "a")]))
    vt.append(_df(spark, [(2, "b")]))
    vt.delete_range("k", 0, 100)
    out = vt.read()
    assert out.count() == 0
    assert set(out.columns) == {"k", "v"}
    # and it comes back to life on the next append
    vt.append(_df(spark, [(3, "c")]))
    assert [r.k for r in vt.read().collect()] == [3]


def test_merge_with_empty_updates_is_pure_insert_noop(spark, vt):
    """An empty updates frame has no key bounds — and a NULL/absent bound
    means NO row can equality-match, so the merge must touch ZERO dirs
    (pure no-op insert), not conservatively rewrite the table."""
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    before = sorted((r.k, r.v) for r in vt.read().collect())
    vt.merge(_df(spark, []).limit(0), keys=["k"])
    assert vt.history()[-1]["remove"] == []  # nothing rewritten
    assert sorted((r.k, r.v) for r in vt.read().collect()) == before


def test_ivm_null_group_keys_merge_not_split(spark, vt):
    """A NULL group key is a real group: the IVM state-delta join must be
    null-safe, or the NULL group splits into duplicate rows and the
    maintained view diverges from a recompute."""
    from daas_apps_spark.sources.table_format import (
        maintain_additive_aggregate,
    )

    def gdf(rows):
        return spark.createDataFrame(rows, "g string, x long")

    vt.append(gdf([("a", 1), (None, 10)]))
    vt.append(gdf([(None, 5), ("a", 2)]))
    view = maintain_additive_aggregate(
        vt, v_from=1, v_to=None, group_by=["g"], count_col="n",
        sums={"sx": "x"},
    ).toPandas()
    assert len(view) == 2  # groups: 'a' and NULL — one row each
    null_row = view[view.g.isna()]
    assert int(null_row.n.iloc[0]) == 2 and int(null_row.sx.iloc[0]) == 15


def test_rewrites_preserve_evolved_schema(spark, vt):
    """After a schema-evolving merge leaves heterogeneous dirs, every
    rewriting op (delete, merge, optimize) must read with mergeSchema —
    a plain read would adopt one file's schema and silently drop the
    evolved column's data."""
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.merge(
        spark.createDataFrame([(3, "c", 9.5)], "k long, v string, score double"),
        keys=["k"],
        allow_schema_evolution=True,
    )
    vt.delete("k = 1")
    out = vt.read(merge_schema=True)
    assert set(out.columns) == {"k", "v", "score"}
    got = {r.k: r.score for r in out.collect()}
    assert got == {2: None, 3: 9.5}
    vt.optimize()
    got = {r.k: r.score for r in vt.read().collect()}
    assert got == {2: None, 3: 9.5}


def test_stat_key_normalizes_tz_aware_to_utc():
    import datetime

    from daas_apps_spark.sources.table_format import _stat_key

    naive = datetime.datetime(2024, 3, 1, 7, 0, 0)
    aware = datetime.datetime(
        2024, 2, 29, 23, 0, 0,
        tzinfo=datetime.timezone(datetime.timedelta(hours=-8)),
    )
    assert _stat_key(naive) == _stat_key(aware)  # same instant in UTC


def test_optimize_rejects_incremental_plus_zorder(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="mutually exclusive"):
        vt.optimize(max_dir_bytes=1 << 20, zorder_by=("k", "k"))


def test_merge_on_unorderable_key_upserts_not_duplicates(spark, vt):
    """A merge keyed on a type the stats normalization can't order
    (DECIMAL, BOOLEAN) must fall back to the conservative full rewrite —
    NOT the pure-insert branch, which would silently duplicate matched
    keys (the _stat_key-None ambiguity: NULL bounds vs unorderable
    bounds)."""
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("1.10"), "a"), (Decimal("2.20"), "b")],
        "k decimal(10,2), v string",
    )
    vt.append(df)
    vt.merge(
        spark.createDataFrame(
            [(Decimal("2.20"), "B"), (Decimal("3.30"), "c")],
            "k decimal(10,2), v string",
        ),
        keys=["k"],
    )
    got = {(str(r.k), r.v) for r in vt.read().collect()}
    assert got == {("1.10", "a"), ("2.20", "B"), ("3.30", "c")}

    bt = spark.createDataFrame([(True, 1), (False, 2)], "flag boolean, n long")
    vt2 = __import__(
        "daas_apps_spark.sources.table_format", fromlist=["VersionedTable"]
    ).VersionedTable(spark, vt.path + "_bool")
    vt2.append(bt)
    vt2.merge(
        spark.createDataFrame([(True, 10)], "flag boolean, n long"),
        keys=["flag"],
    )
    assert {(r.flag, r.n) for r in vt2.read().collect()} == {
        (True, 10),
        (False, 2),
    }


def test_merge_pure_insert_validates_schema(spark, vt):
    """The pure-insert branch (no dir intersects the update key range)
    must apply the same fail-loudly schema contract as the COW branch
    when allow_schema_evolution=False — a typo'd column name raises
    instead of committing a silently heterogeneous dir."""
    vt.append(_df(spark, [(1, "a")]))
    bad = spark.createDataFrame([(100, "x")], "k long, vv string")
    with pytest.raises(Exception, match="(?i)vv|unresolved|union|column"):
        vt.merge(bad, keys=["k"])
    # nothing was committed by the failed merge
    assert vt.latest_version() == 1
    # and the same frame IS accepted when evolution is opted into
    vt.merge(bad, keys=["k"], allow_schema_evolution=True)
    out = vt.read(merge_schema=True)
    assert set(out.columns) == {"k", "v", "vv"}


def test_change_feed_fast_path_merges_evolved_schema(spark, vt):
    """Append-only fast path across heterogeneous dirs: a schema-evolved
    pure-insert commit must surface the evolved column in the feed, not
    adopt one dir's narrower schema."""
    vt.append(_df(spark, [(1, "a")]))
    vt.merge(
        spark.createDataFrame([(100, "x", 5)], "k long, v string, w long"),
        keys=["k"],
        allow_schema_evolution=True,
    )
    feed = vt.changes_between(0)
    assert "w" in feed.columns
    got = {(r.k, r.w, r._change_type) for r in feed.collect()}
    assert got == {(1, None, "insert"), (100, 5, "insert")}


def test_change_feed_snapshot_diff_aligns_evolved_schema(spark, vt):
    """Snapshot-diff path under schema evolution: cur/base are read
    merged and aligned to the union schema, so rows differing only in
    the evolved column appear in the feed instead of vanishing (the IVM
    corruption class)."""
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    # touches key 1 → rewriting commit → snapshot diff in the feed
    vt.merge(
        spark.createDataFrame([(1, "A", 7)], "k long, v string, w long"),
        keys=["k"],
        allow_schema_evolution=True,
    )
    feed = vt.changes_between(1)
    assert "w" in feed.columns
    got = {(r.k, r.v, r.w, r._change_type) for r in feed.collect()}
    assert (1, "A", 7, "insert") in got
    assert (1, "a", None, "delete") in got
    # untouched row 2 must NOT phantom through the diff
    assert not any(r[0] == 2 for r in got)


def test_cdf_plan_raises_on_vacuumed_preimage_file(spark, tmp_path):
    """A deletion vector whose preimage FILE was reclaimed must fail at
    PLANNING time with the loud vacuumed-past-horizon error — never as
    a FileNotFoundError inside an executor read task (and never as
    silently missing delete rows)."""
    import glob as _glob
    import shutil as _shutil

    import pytest as _pytest

    from daas_apps_spark.sources.table_format import (
        VersionedTable,
        cdf_rows_between,
    )

    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    vt.delete("k = 1", mode="mor")
    (data_dir,) = _glob.glob(os.path.join(tbl, "data", "*"))
    _shutil.rmtree(data_dir)  # simulate vacuum past the replay horizon
    with _pytest.raises(ValueError, match="no longer on disk|vacuumed"):
        cdf_rows_between(tbl, 1)  # range holds only the MOR delete
    with _pytest.raises(ValueError, match="vacuumed|no parquet files"):
        cdf_rows_between(tbl, 0)  # full range: the add dir is gone too


def test_stats_columns_allowlist_bounds_manifest(spark, tmp_path):
    """set_stats_columns bounds manifest growth: later commits record
    per-file stats ONLY for listed columns; pruning on a listed column
    still skips files; operations keyed on an UNLISTED column stay
    correct by falling back to conservative rewrites; None restores
    full harvesting; a checkpoint folds the setting; a clone carries
    it."""
    import glob as _glob
    import json as _json

    from daas_apps_spark.sources.table_format import VersionedTable

    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    df = spark.createDataFrame(
        [(k, k * 10, f"v{k}") for k in range(40)], "k long, x long, v string"
    ).repartitionByRange(4, "k")
    vt.append(df)  # v1: full stats
    [(rel1, fs1)] = vt.history()[-1]["file_stats"].items()
    assert {"k", "x", "v"} <= set(next(iter(fs1.values())))

    vt.set_stats_columns(["k"])  # v2 (metadata-only)
    assert vt.stats_columns() == ["k"]
    vt.append(df)  # v3: truncated stats
    [(rel3, fs3)] = vt.history()[-1]["file_stats"].items()
    assert all(set(cols) == {"k"} for cols in fs3.values())

    # pruning on the listed column still skips files of the new commit
    pruned = vt.read(prune=("k", 0, 5))
    full = vt.read()
    assert pruned.count() < full.count() or len(fs3) == 1
    assert pruned.filter("k <= 5").count() == 2 * 6  # both commits' rows

    # delete_range on an UNLISTED column: no stats -> conservative
    # rewrite, result still exact
    vt.delete_range("x", 100, 150)
    got = sorted(r.k for r in vt.read().collect())
    want = sorted(
        [k for k in range(40) if not (100 <= k * 10 <= 150)] * 2
    )
    assert got == want

    # restore full harvesting
    vt.set_stats_columns(None)
    assert vt.stats_columns() is None
    vt.append(spark.createDataFrame([(99, 990, "z")], "k long, x long, v string"))
    last_fs = vt.history()[-1]["file_stats"]
    assert {"k", "x", "v"} <= set(next(iter(next(iter(last_fs.values())).values())))

    # checkpoint folds the setting: force enough commits for a checkpoint
    vt2 = VersionedTable(spark, str(tmp_path / "vt2"))
    vt2.set_stats_columns(["k"])
    one = spark.createDataFrame([(1, 2, "a")], "k long, x long, v string")
    for _ in range(12):
        vt2.append(one)
    cks = sorted(_glob.glob(str(tmp_path / "vt2" / "_log" / "*checkpoint*")))
    assert cks, "expected a checkpoint after 10+ commits"
    ck = _json.load(open(cks[-1]))
    assert ck.get("stats_columns") == ["k"]
    assert vt2.stats_columns() == ["k"]

    # a clone bootstraps the setting
    clone = vt2.clone_to(str(tmp_path / "vt2_clone"))
    assert clone.stats_columns() == ["k"]
    clone.append(one)
    fs = clone.history()[-1]["file_stats"]
    assert all(
        set(cols) == {"k"}
        for files in fs.values()
        for cols in files.values()
    )


def test_read_change_batches_matches_tuple_path(spark, tmp_path):
    """The arrow fast path (read_change_batches) must produce exactly
    the rows of the tuple path (read_change_unit) for every planned
    unit of an append + MOR-delete + MOR-update + schema-evolution
    range — including comma-bearing types (decimal, map) and a column
    added mid-range (typed-null fill)."""
    from decimal import Decimal

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import _parse_datatype_string

    from daas_apps_spark.sources.table_format import (
        VersionedTable,
        change_plan_between,
        read_change_batches,
        read_change_unit,
    )

    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    schema = "k long, amt decimal(18,4), m map<string,int>"
    vt.append(
        spark.createDataFrame(
            [(i, Decimal(i) / 4, {"a": i}) for i in range(8)], schema
        )
    )
    vt.delete("k < 2", mode="mor")
    vt.update("k = 5", {"amt": "amt * 2"}, mode="mor")
    # schema evolution: later commit carries an extra column
    evolved = "k long, amt decimal(18,4), m map<string,int>, extra string"
    vt.append(
        spark.createDataFrame([(100, Decimal("1.5"), {"z": 9}, "new")], evolved)
    )

    declared = evolved + ", _change_type string"
    cols = ["k", "amt", "m", "extra"]
    arrow_schema = to_arrow_schema(_parse_datatype_string(declared))
    units, _ = change_plan_between(tbl, 0, None, mode="cdf")
    assert any(u["kind"] == "delete" for u in units)
    n_rows = 0
    for u in units:
        want = read_change_unit(u, columns=cols, tag=True)
        batches = read_change_batches(u, arrow_schema, tag=True)
        got = [
            tuple(
                dict(v) if isinstance(v, list) and v and isinstance(v[0], tuple)
                else v
                for v in row
            )
            for b in batches
            for row in zip(*(b.column(i).to_pylist() for i in range(b.num_columns)))
        ]
        assert got == want, u
        n_rows += len(got)
    assert n_rows > 0


def test_change_plan_collision_after_range_stays_replayable(spark, tmp_path):
    """Basename ownership is resolved AS OF the plan's v_to: a basename
    collision introduced by a commit AFTER the range must not poison
    replay of the older range (a stream resuming from an old checkpoint
    replays exactly such ranges) — the preimage was uniquely placed at
    that point in history."""
    import json as _json

    from daas_apps_spark.sources.table_format import (
        VersionedTable,
        change_plan_between,
    )

    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    )  # v1
    vt.delete("k = 1", mode="mor")  # v2: vector references v1's file
    basename = next(iter(vt._commits()[0]["file_stats"]["".join(
        vt._commits()[0]["add"]
    )]))
    # fabricate a LATER commit whose manifest places the same basename
    # under a different dir — the collision exists only as of v3
    entry = {
        "version": 3,
        "operation": "append",
        "add": ["other-dir"],
        "remove": [],
        "data_change": True,
        "ts": 0.0,
        "metadata": {},
        "stats": {"other-dir": {}},
        "file_stats": {"other-dir": {basename: {}}},
        "dv_add": [],
        "dv_remove": [],
        "features": [],
    }
    with open(os.path.join(tbl, "_log", "00000003.json"), "w") as f:
        _json.dump(entry, f)
    # the historical range (1, 2] must still plan: ownership as of v2 is
    # unambiguous (pre-fix this raised a basename-collision ValueError)
    units, _ = change_plan_between(tbl, 1, 2, mode="cdf")
    assert [u["kind"] for u in units] == ["delete"]
    assert units[0]["positions"] == [0]


_RACE_WORKER = r"""
import os, sys, time, uuid

sys.path.insert(0, sys.argv[4])
from daas_apps_spark.sources.table_format import (
    VersionedTable,
    retry_on_conflict,
)
import pyarrow as pa
import pyarrow.parquet as pq

tbl, wid, go = sys.argv[1], sys.argv[2], sys.argv[3]
# the commit path is pure-filesystem (footer harvest + log CAS) — no
# SparkSession needed, which is exactly what makes a real second OS
# process cheap enough to race here
vt = VersionedTable(None, tbl)
while not os.path.exists(go):
    time.sleep(0.005)
for i in range(5):
    rel = f"w{wid}-{i}-{uuid.uuid4().hex[:6]}"
    d = os.path.join(tbl, "data", rel)
    os.makedirs(d)
    pq.write_table(
        pa.table({"k": [int(wid) * 100 + i], "w": [int(wid)]}),
        os.path.join(d, "part-0.parquet"),
    )
    retry_on_conflict(
        lambda: vt._commit(
            "append", add=[rel], remove=[], metadata={"writer": wid, "i": i}
        ),
        attempts=100,
    )
"""


def test_two_process_commit_race_all_land(spark, tmp_path):
    """The deployment claim behind _publish_commit: the os.link CAS
    holds across OS PROCESS boundaries. Two real child processes race 5
    retry_on_conflict appends each against the same table; afterwards
    the log must hold exactly 10 contiguous versions (no lost commit,
    no duplicate version file, no torn JSON), every writer's 5 commits
    present, and the snapshot read must see all 10 rows."""
    import subprocess
    import sys as _sys

    tbl = str(tmp_path / "vt")
    from daas_apps_spark.sources.table_format import VersionedTable

    VersionedTable(spark, tbl)  # create the dir skeleton
    go = str(tmp_path / "go")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", _RACE_WORKER, tbl, wid, go, repo],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for wid in ("1", "2")
    ]
    open(go, "w").close()  # starting gun: both racers loop until it exists
    for p in procs:
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-2000:]

    vt = VersionedTable(spark, tbl)
    commits = vt.history()
    assert [c["version"] for c in commits] == list(range(1, 11))
    by_writer = {}
    for c in commits:
        by_writer.setdefault(c["metadata"]["writer"], []).append(
            c["metadata"]["i"]
        )
    assert sorted(by_writer) == ["1", "2"]
    assert sorted(by_writer["1"]) == list(range(5))
    assert sorted(by_writer["2"]) == list(range(5))
    rows = sorted((r.w, r.k) for r in vt.read().collect())
    assert rows == sorted(
        (w, w * 100 + i) for w in (1, 2) for i in range(5)
    )
    # no stranded .tmp commit files in the log after the race settles
    assert not [
        f for f in os.listdir(os.path.join(tbl, "_log"))
        if f.startswith(".tmp")
    ]


def test_racing_commit_one_winner_one_conflict(spark, vt):
    """Two writers racing the same version: exactly one commit survives
    and the loser raises a retriable CommitConflictError — the log is
    never silently overwritten (os.link EEXIST semantics, the local
    analog of Delta's LogStore CAS)."""
    import json as _json

    from daas_apps_spark.sources.table_format import CommitConflictError

    vt.append(_df(spark, [(1, "a")]))
    # both writers read latest=1 and build a version-2 commit; the winner
    # publishes first, then the loser's publish hits the same final path
    final = os.path.join(vt.path, "_log", "00000002.json")
    winner = {
        "version": 2,
        "operation": "append",
        "add": [],
        "remove": [],
        "data_change": True,
        "metadata": {"writer": "winner"},
        "stats": {},
    }
    with open(final, "w") as f:
        _json.dump(winner, f)
    tmp = os.path.join(vt.path, "_log", ".tmp-loser.json")
    with open(tmp, "w") as f:
        _json.dump({**winner, "metadata": {"writer": "loser"}}, f)
    with pytest.raises(CommitConflictError, match="00000002"):
        vt._publish_commit(tmp, final)
    # winner's commit intact; loser's tmp cleaned up
    assert vt.history()[-1]["metadata"] == {"writer": "winner"}
    assert not [
        n for n in os.listdir(os.path.join(vt.path, "_log"))
        if n.startswith(".tmp-")
    ]
    # the conflict is retriable: a rebased attempt lands as version 3
    assert vt.append(_df(spark, [(3, "c")])) == 3
    assert sorted(r.k for r in vt.read().collect()) == [1, 3]


def test_checkpoint_republish_is_benign(spark, vt):
    """Checkpoints are derived state with idempotent content — a
    collision on republish is swallowed, unlike commit files."""
    vt.append(_df(spark, [(1, "a")]))
    vt._write_checkpoint(1)
    vt._write_checkpoint(1)  # identical bytes — must not raise
    assert [r.k for r in vt.read().collect()] == [1]


def test_merge_into_multifile_dir_rewrites_one_file(spark, vt):
    """Per-FILE manifest stats: a 1-row MERGE into a dir holding several
    key-disjoint files rewrites ONE file's data; the others are carried
    by hard link (same inode, no data movement)."""
    # one commit dir, 4 files with disjoint key ranges
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(40)], "k long, v string"
    ).repartitionByRange(4, "k")
    vt.append(df)
    [(rel, fstats)] = vt.history()[-1]["file_stats"].items()
    data_files = sorted(fstats)
    assert len(data_files) == 4
    inode_before = {
        f: os.stat(os.path.join(vt.path, "data", rel, f)).st_ino
        for f in data_files
    }
    hit = [f for f, st in fstats.items() if st["k"][0] <= 5 <= st["k"][1]]
    assert len(hit) == 1

    vt.merge(
        spark.createDataFrame([(5, "V5")], "k long, v string"), keys=["k"]
    )
    entry = vt.history()[-1]
    assert entry["remove"] == [rel]
    # one carry dir (3 linked files) + one rewrite dir
    carries = [d for d in entry["add"] if "-carry-" in d]
    rewrites = [d for d in entry["add"] if "-carry-" not in d]
    assert len(carries) == 1 and len(rewrites) == 1
    carried = sorted(os.listdir(os.path.join(vt.path, "data", carries[0])))
    assert carried == sorted(set(data_files) - set(hit))
    for f in carried:  # same inode — zero bytes moved
        assert (
            os.stat(os.path.join(vt.path, "data", carries[0], f)).st_ino
            == inode_before[f]
        )
    got = {r.k: r.v for r in vt.read().collect()}
    assert got == {k: ("V5" if k == 5 else f"v{k}") for k in range(40)}


def test_delete_range_drops_and_carries_at_file_level(spark, vt):
    """delete_range three-ways FILES: fully-inside files drop unread,
    disjoint files carry by link, only straddlers are rewritten."""
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(40)], "k long, v string"
    ).repartitionByRange(4, "k")
    vt.append(df)
    [(rel, fstats)] = vt.history()[-1]["file_stats"].items()
    # ranges are [0..9] [10..19] [20..29] [30..39]; delete 10..25:
    # file2 fully inside (dropped), file3 straddles (rewritten),
    # files 1/4 disjoint (carried)
    vt.delete_range("k", 10, 25)
    entry = vt.history()[-1]
    assert entry["remove"] == [rel]
    carries = [d for d in entry["add"] if "-carry-" in d]
    assert len(carries) == 1
    assert (
        len(os.listdir(os.path.join(vt.path, "data", carries[0]))) == 2
    )
    got = sorted(r.k for r in vt.read().collect())
    assert got == [k for k in range(40) if not (10 <= k <= 25)]


def test_pruned_read_skips_disjoint_files_within_a_dir(spark, vt):
    """Manifest pruning acts at file granularity: a range hitting one
    file of a 4-file commit dir scans exactly that file."""
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(40)], "k long, v string"
    ).repartitionByRange(4, "k")
    vt.append(df)
    pruned = vt.read(prune=("k", 12, 17))
    scanned = pruned.inputFiles()
    assert len(scanned) == 1, scanned
    got = sorted(r.k for r in pruned.filter("k BETWEEN 12 AND 17").collect())
    assert got == list(range(12, 18))


def test_pinned_reader_survives_optimize_and_vacuum(spark, vt):
    """A reader that resolved its snapshot at version N keeps working
    through a LATER compaction (OPTIMIZE never deletes files) and a
    VACUUM whose retention still covers N — the concurrent-reader
    contract Delta's retention window exists for. Only the version
    vacuum actually aged out becomes unreadable."""
    vt.append(_df(spark, [(1, "a")]))              # v1
    vt.overwrite(_df(spark, [(2, "b"), (3, "c")]))  # v2 retires v1's dir
    pinned = vt.read(version=2)  # lazy: file list resolved now
    vt.optimize()                                   # v3 compaction
    vt.vacuum(keep_versions=1)  # retention covers v2..v3; reclaims v1 only
    # the pinned reader still materializes its full snapshot
    assert sorted(r.k for r in pinned.collect()) == [2, 3]
    assert sorted(r.k for r in vt.read(version=2).collect()) == [2, 3]
    # v1 aged out of retention
    with pytest.raises(Exception):
        vt.read(version=1).collect()


def test_vacuum_after_file_level_merge_keeps_carried_links(spark, vt):
    """VACUUM rmtree's the retired dir whose untouched files were
    hard-linked into a carry dir: the shared inodes must survive (link
    count), so the current snapshot reads intact after reclamation."""
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(40)], "k long, v string"
    ).repartitionByRange(4, "k")
    vt.append(df)
    vt.merge(
        spark.createDataFrame([(5, "V5")], "k long, v string"), keys=["k"]
    )
    deleted = vt.vacuum(keep_versions=0)
    assert any(d.startswith("v1-") for d in deleted)  # retired dir gone
    got = {r.k: r.v for r in vt.read().collect()}
    assert got == {k: ("V5" if k == 5 else f"v{k}") for k in range(40)}
    # and OPTIMIZE folds carry + rewrite dirs back into one
    vt.optimize()
    assert len(vt._live_dirs()) == 1
    assert {r.k for r in vt.read().collect()} == set(range(40))


def test_crash_orphaned_tmp_log_file_is_invisible(spark, vt):
    """A writer crash can orphan a .tmp-*.json in the log (between link
    and unlink) — it must never parse as a commit: a stale commit-tmp
    would double-apply its adds, and a stale checkpoint-tmp (different
    shape) would crash replay."""
    import json as _json

    from daas_apps_spark.sources.table_format import read_log

    vt.append(_df(spark, [(1, "a")]))
    commit1 = vt.history()[0]
    log = os.path.join(vt.path, "_log")
    # stale commit tmp duplicating commit 1's adds
    with open(os.path.join(log, ".tmp-deadbeef.json"), "w") as f:
        _json.dump(commit1, f)
    # stale checkpoint tmp (snapshot shape: no add/remove keys)
    with open(os.path.join(log, ".tmp-cafebabe.json"), "w") as f:
        _json.dump({"version": 1, "live": [], "stats": {}}, f)
    assert [r.k for r in vt.read().collect()] == [1]  # no double rows
    assert len(vt.history()) == 1
    assert len(read_log(vt.path)) == 1
    assert vt.append(_df(spark, [(2, "b")])) == 2  # versioning unharmed


def test_checkpoint_prunes_dead_dir_stats(spark, vt):
    """Checkpoints carry stats only for LIVE dirs — an overwrite-per-
    batch workload must not accumulate per-file stats for every dir ever
    written."""
    for i in range(10):  # version 10 writes a checkpoint
        vt.overwrite(_df(spark, [(i, str(i))]))
    [ck] = [
        n for n in os.listdir(os.path.join(vt.path, "_log"))
        if n.endswith(".checkpoint.json")
    ]
    import json as _json

    with open(os.path.join(vt.path, "_log", ck)) as f:
        snap = _json.load(f)
    assert len(snap["live"]) == 1
    assert set(snap["stats"]) == set(snap["live"])
    assert set(snap["file_stats"]) == set(snap["live"])
    # and replay through the pruned checkpoint still time-travels
    assert [r.k for r in vt.read(version=9).collect()] == [8]


def test_zorder_plus_file_stats_prune_on_both_columns(spark, vt):
    """OPTIMIZE ZORDER x per-FILE manifest stats: after a Z-order
    rewrite, a range read on EITHER clustered column scans a strict
    subset of the dir's files — the synergy the two features exist for
    (clustering bounds both columns per file; the manifest records the
    bounds; pruning skips at file granularity)."""
    grid = spark.range(64 * 64).selectExpr(
        "cast(id % 64 as long) as x", "cast(id div 64 as long) as y"
    )
    vt.append(grid)
    vt.optimize(target_partitions=4, zorder_by=("x", "y"))
    total_files = len(vt.read().inputFiles())
    assert total_files == 4
    for col in ("x", "y"):
        pruned = vt.read(prune=(col, 0, 15))
        assert len(pruned.inputFiles()) < total_files, col
        got = pruned.filter(f"{col} BETWEEN 0 AND 15").count()
        assert got == 16 * 64


def test_retry_on_conflict_rebases_and_lands(spark, vt):
    """The optimistic-concurrency loop: a writer that loses the version
    race retries, recomputes its version from the fresh log, and lands —
    both racers' rows end up committed exactly once."""
    from daas_apps_spark.sources.table_format import (
        CommitConflictError,
        retry_on_conflict,
    )

    vt.append(_df(spark, [(1, "a")]))
    original_publish = vt._publish_commit
    fail_once = {"armed": True}

    def racing_publish(tmp, final):
        if fail_once["armed"]:
            # a concurrent writer lands this version first, exactly once
            fail_once["armed"] = False
            import json as _json

            with open(final, "w") as f:
                _json.dump(
                    {
                        "version": int(os.path.basename(final)[:8]),
                        "operation": "append",
                        "add": [],
                        "remove": [],
                        "data_change": True,
                        "metadata": {"writer": "racer"},
                        "stats": {},
                    },
                    f,
                )
        return original_publish(tmp, final)

    vt._publish_commit = racing_publish
    try:
        v = retry_on_conflict(
            lambda: vt.append(_df(spark, [(2, "b")]))
        )
    finally:
        vt._publish_commit = original_publish
    assert v == 3  # rebased past the racer's version 2
    assert [c["metadata"].get("writer") for c in vt.history()].count(
        "racer"
    ) == 1
    assert sorted(r.k for r in vt.read().collect()) == [1, 2]

    # exhausted attempts re-raise
    vt._publish_commit = lambda tmp, final: (_ for _ in ()).throw(
        CommitConflictError("always")
    )
    try:
        import pytest as _pytest

        with _pytest.raises(CommitConflictError):
            retry_on_conflict(
                lambda: vt.append(_df(spark, [(3, "c")])), attempts=2
            )
    finally:
        vt._publish_commit = original_publish


def test_delete_range_on_evolved_column_skips_pre_evolution_files(spark, vt):
    """delete_range on a column only SOME dirs have: pre-evolution files
    (no stats for the column → straddle set) hold only NULLs for it, so
    nothing matches — the delete must carry them through, not crash on
    an unresolvable column."""
    vt.append(_df(spark, [(1, "a"), (2, "b")]))  # pre-evolution: k, v
    vt.merge(
        spark.createDataFrame([(100, "x", 25)], "k long, v string, w long"),
        keys=["k"],
        allow_schema_evolution=True,
    )
    vt.delete_range("w", 20, 30)  # hits the evolved row only
    out = vt.read(merge_schema=True)
    got = {(r.k, r.v) for r in out.collect()}
    assert got == {(1, "a"), (2, "b")}  # w=25 row deleted, legacy kept
    # the last file carrying w is gone, so the schema-on-read narrows —
    # the file-derived-schema trade this format makes (Delta's table-level
    # schema would instead keep an all-NULL w)
    assert set(out.columns) == {"k", "v"}


def test_zorder_all_null_column_fails_loud(spark, vt):
    vt.append(
        spark.createDataFrame(
            [(1, None), (2, None)], "x long, y long"
        )
    )
    with pytest.raises(ValueError, match="entirely NULL"):
        vt.optimize(target_partitions=2, zorder_by=("x", "y"))


def test_retry_on_conflict_rejects_zero_attempts():
    from daas_apps_spark.sources.table_format import retry_on_conflict

    with pytest.raises(ValueError, match="attempts"):
        retry_on_conflict(lambda: 1, attempts=0)


def test_log_names_sort_numerically_past_width_rollover(tmp_path):
    """Version 1e8 produces a 9-digit name; replay order and visibility
    must survive the zero-padded width rollover."""
    from daas_apps_spark.sources.table_format import (
        _COMMIT_NAME,
        _log_names,
    )

    log = tmp_path / "log"
    log.mkdir()
    for name in (
        "99999999.json",
        "100000000.json",
        "00000001.json",
        ".tmp-abc.json",
        "00000005.checkpoint.json",
    ):
        (log / name).write_text("{}")
    assert _log_names(str(log), _COMMIT_NAME) == [
        "00000001.json",
        "99999999.json",
        "100000000.json",
    ]


# -- A27 shallow clone ------------------------------------------------------


def test_clone_is_zero_copy_and_isolated(spark, tmp_path):
    """Every cloned file shares its inode with the source (st_nlink >= 2,
    zero bytes copied); afterwards the branches evolve independently —
    a clone append is invisible to the source and vice versa."""
    import glob

    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a"), (2, "b")]))
    src.append(_df(spark, [(3, "c")]))
    clone = src.clone_to(str(tmp_path / "dst"))
    cloned_files = glob.glob(
        os.path.join(clone.path, "data", "*", "*.parquet")
    )
    assert cloned_files
    assert all(os.stat(f).st_nlink >= 2 for f in cloned_files)
    assert sorted(r.k for r in clone.read().collect()) == [1, 2, 3]
    clone.append(_df(spark, [(4, "d")]))
    src.append(_df(spark, [(5, "e")]))
    assert sorted(r.k for r in clone.read().collect()) == [1, 2, 3, 4]
    assert sorted(r.k for r in src.read().collect()) == [1, 2, 3, 5]


def test_clone_at_version_carries_stats_for_pruning(spark, tmp_path):
    """A version-pinned clone sees exactly that snapshot, and the carried
    manifest stats still prune: a disjoint range read lists no files."""
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a"), (2, "b")]))
    src.append(_df(spark, [(100, "z")]))
    clone = src.clone_to(str(tmp_path / "dst"), version=1)
    assert sorted(r.k for r in clone.read().collect()) == [1, 2]
    # stats carried: a k-range disjoint from [1, 2] prunes everything
    assert clone.read(prune=("k", 500, 900)).count() == 0
    assert clone.read(prune=("k", 1, 5)).count() == 2


def test_clone_survives_source_vacuum(spark, tmp_path):
    """The upgrade over Delta's shallow clone: after the SOURCE rewrites
    and vacuums away the cloned-from files, the clone still reads — the
    hard links keep the shared inodes alive."""
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a"), (2, "b")]))
    clone = src.clone_to(str(tmp_path / "dst"))
    src.overwrite(_df(spark, [(9, "z")]))  # retires v1's dir
    deleted = src.vacuum(keep_versions=0)
    assert deleted  # the cloned-from dir really was reclaimed at source
    assert sorted((r.k, r.v) for r in clone.read().collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_clone_refuses_nonempty_destination(spark, tmp_path):
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a")]))
    dst = VersionedTable(spark, str(tmp_path / "dst"))
    dst.append(_df(spark, [(2, "b")]))
    with pytest.raises(ValueError, match="not empty"):
        src.clone_to(dst.path)


# -- A28 CHECK constraints --------------------------------------------------


def test_constraint_rejects_batch_atomically(spark, vt):
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
    )

    vt.add_constraint("k_positive", "k > 0")
    vt.append(_df(spark, [(1, "a")]))
    before = vt.latest_version()
    with pytest.raises(ConstraintViolationError, match="k_positive"):
        vt.append(_df(spark, [(2, "ok"), (-3, "bad")]))
    # all-or-nothing: the valid row of the poisoned batch didn't land
    assert vt.latest_version() == before
    assert [r.k for r in vt.read().collect()] == [1]


def test_constraint_null_passes_false_rejects(spark, vt):
    """SQL CHECK semantics: NULL/unknown passes, only FALSE violates."""
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
    )

    vt.add_constraint("v_nonempty", "length(v) > 0")
    vt.append(_df(spark, [(1, None)]))  # NULL -> unknown -> passes
    with pytest.raises(ConstraintViolationError):
        vt.append(_df(spark, [(2, "")]))
    assert [r.k for r in vt.read().collect()] == [1]


def test_add_constraint_validates_existing_rows(spark, vt):
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
    )

    vt.append(_df(spark, [(1, "a"), (-2, "b")]))
    with pytest.raises(ConstraintViolationError, match="k_positive"):
        vt.add_constraint("k_positive", "k > 0")
    assert vt.constraints() == {}  # the failed add left no constraint


def test_constraint_enforced_on_merge_and_dropped(spark, vt):
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
    )

    vt.add_constraint("k_positive", "k > 0")
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    with pytest.raises(ConstraintViolationError):
        vt.merge(_df(spark, [(-2, "B")]), keys=["k"])
    vt.drop_constraint("k_positive")
    vt.merge(_df(spark, [(-2, "B")]), keys=["k"])
    assert sorted(r.k for r in vt.read().collect()) == [-2, 1, 2]


def test_constraints_survive_checkpoint_fold(spark, vt):
    """Constraints added before a checkpoint must replay from it: the
    checkpoint carries the active set, so dropping pre-checkpoint commit
    files (log retention) cannot lose the table's invariants."""
    import json

    from daas_apps_spark.sources.table_format import (
        CHECKPOINT_EVERY,
        ConstraintViolationError,
    )

    vt.add_constraint("k_positive", "k > 0")
    for i in range(CHECKPOINT_EVERY):  # push past a checkpoint boundary
        vt.append(_df(spark, [(i + 1, "x")]))
    log = os.path.join(vt.path, "_log")
    cks = [n for n in os.listdir(log) if n.endswith("checkpoint.json")]
    assert cks
    with open(os.path.join(log, sorted(cks)[-1])) as f:
        assert json.load(f)["constraints"] == {"k_positive": "k > 0"}
    # drop every commit file at-or-before the checkpoint (retention)
    ck_v = int(sorted(cks)[-1].split(".")[0])
    for n in list(os.listdir(log)):
        if n.endswith(".json") and "checkpoint" not in n:
            if int(n.split(".")[0]) <= ck_v:
                os.unlink(os.path.join(log, n))
    assert vt.constraints() == {"k_positive": "k > 0"}
    with pytest.raises(ConstraintViolationError):
        vt.append(_df(spark, [(-1, "bad")]))


def test_write_after_retention_stays_visible(spark, vt):
    """Version minting survives log retention: with every commit file
    at-or-below a checkpoint dropped, the next write must take
    checkpoint_version + 1 — a commits-only latest_version() would mint
    v1, which replay (floor = checkpoint version) silently SKIPS: a
    published-but-invisible commit, i.e. data loss."""
    from daas_apps_spark.sources.table_format import CHECKPOINT_EVERY

    for i in range(CHECKPOINT_EVERY):
        vt.append(_df(spark, [(i, "x")]))
    log = os.path.join(vt.path, "_log")
    cks = sorted(n for n in os.listdir(log) if n.endswith("checkpoint.json"))
    ck_v = int(cks[-1].split(".")[0])
    for n in list(os.listdir(log)):
        if n.endswith(".json") and "checkpoint" not in n:
            if int(n.split(".")[0]) <= ck_v:
                os.unlink(os.path.join(log, n))
    assert vt.latest_version() == ck_v
    v = vt.append(_df(spark, [(100, "new")]))
    assert v == ck_v + 1
    assert sorted(r.k for r in vt.read().collect()) == [*range(10), 100]


def test_parquet_manifest_checkpoint(spark, vt, monkeypatch):
    """Large checkpoints externalize the per-file stats/sizes maps to a
    parquet MANIFEST sidecar (Iceberg's manifest-file shape — at
    millions of files the JSON checkpoint is the scaling bottleneck).
    Replay, manifest pruning, file-level COW and byte accounting all
    work off the sidecar after log retention; a missing sidecar fails
    loudly instead of silently losing bounds."""
    import json as _json

    import daas_apps_spark.sources.table_format as tf

    monkeypatch.setattr(tf, "PARQUET_MANIFEST_MIN_FILES", 1)
    for i in range(tf.CHECKPOINT_EVERY):
        vt.append(
            spark.createDataFrame(
                [(i * 100 + j, "x") for j in range(50)], "k long, v string"
            ).repartitionByRange(2, "k")
        )
    log = os.path.join(vt.path, "_log")
    cks = sorted(n for n in os.listdir(log) if n.endswith("checkpoint.json"))
    assert cks
    with open(os.path.join(log, cks[-1])) as f:
        snap = _json.load(f)
    assert snap["manifest"] == f"{snap['version']:08d}.checkpoint.manifest.parquet"
    assert snap["file_stats"] == {} and snap["file_sizes"] == {}
    assert os.path.isfile(os.path.join(log, snap["manifest"]))
    # retention: drop every commit file at-or-before the checkpoint
    ck_v = int(cks[-1].split(".")[0])
    for n in list(os.listdir(log)):
        if n.endswith(".json") and "checkpoint" not in n:
            if int(n.split(".")[0]) <= ck_v:
                os.unlink(os.path.join(log, n))
    # snapshot reads, manifest pruning, and file-level COW off the sidecar
    assert vt.read().count() == 500
    pr = vt.read(prune=("k", 0, 49))
    assert len(pr.inputFiles()) < len(vt.read().inputFiles())
    assert sorted(r.k for r in pr.filter("k < 50").collect()) == list(
        range(50)
    )
    vt.merge(
        spark.createDataFrame([(1, "Z")], "k long, v string"), keys=["k"]
    )
    assert any("-carry-" in r for r in vt._commits()[-1]["add"])
    got = sorted((r.k, r.v) for r in vt.read().collect())
    assert len(got) == 500 and (1, "Z") in got
    # byte accounting reconstructed: sizes of pre-checkpoint files known
    _, _, _, file_sizes = vt._replay(None)
    assert sum(len(v) for v in file_sizes.values()) >= 20
    # a missing sidecar is a LOUD corruption error, not silent unbounds
    os.unlink(os.path.join(log, snap["manifest"]))
    with pytest.raises(ValueError, match="manifest sidecar"):
        vt.read()


def test_partition_evolution_set_layout(spark, vt, monkeypatch):
    """set_layout is a metadata commit: writes FROM it on land range-
    clustered (disjoint per-file stats on the declared axes → manifest
    pruning bites), OLD dirs stay readable as-is, the feed is
    unaffected, the spec folds into checkpoints, and an old writer
    refuses via the clustered-layout writer feature."""
    import json as _json

    import daas_apps_spark.sources.table_format as tf
    from daas_apps_spark.sources.table_format import (
        CHECKPOINT_EVERY,
        UnsupportedTableFeatureError,
    )

    # era 1: one unclustered single-file commit
    vt.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "k long, v string"
        ).coalesce(1)
    )
    with pytest.raises(ValueError, match="unknown column"):
        vt.set_layout(["nope"])
    vt.set_layout(["k"], target_files=4)  # v2: metadata only
    assert "clustered-layout" in vt.writer_features()
    entry = vt._commits()[-1]
    assert entry["add"] == [] and entry["data_change"] is False
    # era 2: a ONE-partition append lands as 4 range-disjoint files
    vt.append(
        spark.createDataFrame(
            [(100 + i, "x") for i in range(100)], "k long, v string"
        ).coalesce(1)
    )
    [(rel, fstats)] = vt._commits()[-1]["file_stats"].items()
    assert len(fstats) == 4
    ranges = sorted((st["k"][0], st["k"][1]) for st in fstats.values())
    assert all(a[1] < b[0] for a, b in zip(ranges, ranges[1:]))  # disjoint
    # mixed-era snapshot reads as one table
    assert vt.read().count() == 200
    # manifest prune on the new axis scans fewer files, same answer
    pr = vt.read(prune=("k", 150, 160))
    got = sorted(
        r.k for r in pr.filter("k between 150 and 160").collect()
    )
    assert got == list(range(150, 161))
    assert len(pr.inputFiles()) < len(vt.read().inputFiles())
    # the change feed / CDF are unaffected by the layout commit
    feed = vt.changes_between(1, 3)
    assert feed.count() == 100  # era-2 inserts only, layout commit skipped
    # old writer refuses
    monkeypatch.setattr(
        tf, "SUPPORTED_WRITER_FEATURES", {"deletion-vectors"}
    )
    with pytest.raises(UnsupportedTableFeatureError, match="clustered"):
        vt.append(_df(spark, [(999, "z")]))
    monkeypatch.undo()
    # clearing restores unclustered writes; checkpoint folds the spec
    vt.set_layout(["k"], target_files=2)
    for i in range(CHECKPOINT_EVERY):
        vt.append(_df(spark, [(1000 + i, "y")]))
    log = os.path.join(vt.path, "_log")
    cks = sorted(n for n in os.listdir(log) if n.endswith("checkpoint.json"))
    with open(os.path.join(log, cks[-1])) as f:
        assert _json.load(f)["layout"] == {
            "cluster_by": ["k"],
            "target_files": 2,
        }
    vt.set_layout(None)
    assert vt.layout() is None


def test_rename_column_is_metadata_only(spark, vt, monkeypatch):
    """rename_column publishes ONE metadata commit: zero data dirs
    added/removed, head reads surface the new name, time travel before
    the rename surfaces the old one, post-rename writes store the
    immutable PHYSICAL name (files stay homogeneous), and a reader
    without the column-mapping feature refuses instead of
    mis-projecting."""
    import glob as _glob

    import pyarrow.parquet as pq

    import daas_apps_spark.sources.table_format as tf
    from daas_apps_spark.sources.table_format import (
        UnsupportedTableFeatureError,
    )

    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    dirs_before = sorted(os.listdir(os.path.join(vt.path, "data")))
    vt.rename_column("v", "label")
    entry = vt._commits()[-1]
    assert entry["add"] == [] and entry["remove"] == []
    assert entry["data_change"] is False
    assert entry["features"] == ["column-mapping"]
    assert "column-mapping" in vt.writer_features()
    assert sorted(os.listdir(os.path.join(vt.path, "data"))) == dirs_before
    assert vt.read().columns == ["k", "label"]
    assert sorted((r.k, r.label) for r in vt.read().collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # time travel BEFORE the rename: the mapping is versioned state
    assert vt.read(version=1).columns == ["k", "v"]
    # post-rename append (new logical name) stores the PHYSICAL name
    vt.append(spark.createDataFrame([(3, "c")], "k long, label string"))
    new_dir = [
        d
        for d in os.listdir(os.path.join(vt.path, "data"))
        if d not in dirs_before
    ]
    f = _glob.glob(os.path.join(vt.path, "data", new_dir[0], "*.parquet"))[0]
    assert pq.ParquetFile(f).schema_arrow.names == ["k", "v"]
    assert sorted(r.label for r in vt.read().collect()) == ["a", "b", "c"]
    # renaming to an existing name refuses; unknown column refuses
    with pytest.raises(ValueError, match="already exists"):
        vt.rename_column("label", "k")
    with pytest.raises(ValueError, match="does not exist"):
        vt.rename_column("nope", "x")
    # a pre-mapping reader refuses loudly (it would surface physical
    # names / resurrect dropped columns)
    monkeypatch.setattr(tf, "SUPPORTED_FEATURES", {"deletion-vectors"})
    with pytest.raises(UnsupportedTableFeatureError, match="column-mapping"):
        vt.read()


def test_drop_column_is_metadata_only_and_optimize_materializes(spark, vt):
    """drop_column hides the physical column without touching a file;
    time travel still reads it; OPTIMIZE's rewrite materializes the
    logical schema so the bytes come back; the last column and
    constraint-referenced columns refuse."""
    import glob as _glob

    import pyarrow.parquet as pq

    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.add_constraint("k_pos", "k > 0")
    # a constraint-referenced column can be neither dropped nor renamed
    # (its expression would silently stop resolving)
    with pytest.raises(ValueError, match="constraint"):
        vt.drop_column("k")
    with pytest.raises(ValueError, match="constraint"):
        vt.rename_column("k", "key")
    vt.drop_column("v")
    assert vt.read().columns == ["k"]
    assert vt.read(version=1).columns == ["k", "v"]  # history intact
    vt.append(spark.createDataFrame([(3,)], "k long"))
    assert sorted(r.k for r in vt.read().collect()) == [1, 2, 3]
    vt.optimize()
    # the compacted files no longer carry the dropped physical column
    live = vt._live_dirs()
    assert len(live) == 1
    for f in _glob.glob(os.path.join(live[0], "*.parquet")):
        assert pq.ParquetFile(f).schema_arrow.names == ["k"]
    vt.drop_constraint("k_pos")
    with pytest.raises(ValueError, match="last column"):
        vt.drop_column("k")


def test_cdf_and_feed_across_rename(spark, vt):
    """The change feed aligns BOTH snapshots on the newer logical names
    across a rename — batch feed, MOR fast path, and the pure-filesystem
    CDF reader all surface the renamed column for pre-rename rows."""
    from daas_apps_spark.sources.table_format import cdf_rows_between

    vt.append(_df(spark, [(1, "a"), (2, "b")]))  # v1
    vt.delete("k = 2", mode="mor")  # v2 (pre-rename MOR delete)
    vt.rename_column("v", "label")  # v3
    vt.append(
        spark.createDataFrame([(3, "c")], "k long, label string")
    )  # v4
    # (1, 4]: the MOR fast path applies (the vector's preimage file is
    # OUTSIDE the range) — the delete surfaces under the NEW name
    feed = vt.changes_between(1, 4)
    assert set(feed.columns) == {"k", "label", "_change_type"}
    got = sorted((r.k, r.label, r._change_type) for r in feed.collect())
    assert got == [(2, "b", "delete"), (3, "c", "insert")]
    # (0, 4]: the vector references an in-range file → snapshot-diff
    # fallback, which NETS the insert+delete pair (documented feed
    # semantics) — still aligned on the new logical names
    net = sorted(
        (r.k, r.label, r._change_type)
        for r in vt.changes_between(0, 4).collect()
    )
    assert net == [(1, "a", "insert"), (3, "c", "insert")]
    # pure-filesystem CDF reader (what the stream source runs): the
    # planner replays the delete unit-by-unit, so the pair is explicit
    rows, v_to = cdf_rows_between(vt.path, 1, None, columns=["k", "label"])
    assert v_to == 4
    assert sorted(rows) == [(2, "b", "delete"), (3, "c", "insert")]
    rows0, _ = cdf_rows_between(vt.path, 0, None, columns=["k", "label"])
    assert sorted(rows0) == [
        (1, "a", "insert"),
        (2, "b", "delete"),
        (2, "b", "insert"),
        (3, "c", "insert"),
    ]


def test_clone_and_checkpoint_carry_column_mapping(spark, tmp_path):
    """A clone at head carries the mapping (and its protocol features);
    a clone at a pre-rename version surfaces the old names; checkpoints
    fold the mapping so log retention cannot lose it."""
    from daas_apps_spark.sources.table_format import (
        CHECKPOINT_EVERY,
        VersionedTable,
    )

    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a")]))  # v1
    src.rename_column("v", "label")  # v2
    head_clone = src.clone_to(str(tmp_path / "dst_head"))
    assert head_clone.read().columns == ["k", "label"]
    assert "column-mapping" in head_clone.writer_features()
    old_clone = src.clone_to(str(tmp_path / "dst_old"), version=1)
    assert old_clone.read().columns == ["k", "v"]
    # checkpoint fold
    for i in range(CHECKPOINT_EVERY):
        src.append(
            spark.createDataFrame([(10 + i, "x")], "k long, label string")
        )
    log = os.path.join(src.path, "_log")
    cks = sorted(n for n in os.listdir(log) if n.endswith("checkpoint.json"))
    assert cks
    ck_v = int(cks[-1].split(".")[0])
    for n in list(os.listdir(log)):
        if n.endswith(".json") and "checkpoint" not in n:
            if int(n.split(".")[0]) <= ck_v:
                os.unlink(os.path.join(log, n))
    assert src.column_mapping() is not None
    assert src.read().columns == ["k", "label"]


def test_rename_lazily_registers_post_bootstrap_evolved_column(spark, vt):
    """A column that evolved into the table AFTER the mapping was
    bootstrapped (unmapped: physical == logical) can still be renamed —
    the rename lazily registers it with a fresh field id; reads resolve
    old (pre-evolution) files as NULL under the new name."""
    vt.append(_df(spark, [(1, "a")]))
    vt.rename_column("v", "label")  # bootstrap: fields k, v->label
    vt.merge(
        spark.createDataFrame(
            [(2, "b", 7.5)], "k long, label string, score double"
        ),
        keys=["k"],
        allow_schema_evolution=True,
    )  # 'score' evolves in unmapped
    assert sorted(
        (r.k, r.label, r.score)
        for r in vt.read(merge_schema=True).collect()
    ) == [(1, "a", None), (2, "b", 7.5)]
    vt.rename_column("score", "quality")  # lazy registration + rename
    m = vt.column_mapping()
    assert {f["name"] for f in m["fields"]} == {"k", "label", "quality"}
    assert {f["physical"] for f in m["fields"]} == {"k", "v", "score"}
    assert sorted(
        (r.k, r.label, r.quality)
        for r in vt.read(merge_schema=True).collect()
    ) == [(1, "a", None), (2, "b", 7.5)]
    # and the lazily-registered field renames again / drops normally
    vt.drop_column("quality")
    assert sorted(vt.read(merge_schema=True).columns) == ["k", "label"]


def test_write_under_old_physical_name_refuses_with_guidance(spark, vt):
    """After a rename, a frame still using the OLD (physical) name
    refuses with the logical name named in the message — instead of the
    parquet writer's cryptic duplicate-column error (the mapped column
    also renames onto that physical)."""
    vt.append(_df(spark, [(1, "a")]))
    vt.rename_column("v", "label")
    with pytest.raises(ValueError, match="logical name.*label"):
        vt.append(_df(spark, [(2, "stale")]))  # still says "v"
    vt.append(spark.createDataFrame([(2, "b")], "k long, label string"))
    assert sorted((r.k, r.label) for r in vt.read().collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_dropped_physical_name_cannot_be_silently_reused(spark, vt):
    """Writing a NEW unmapped column whose name matches a DROPPED
    physical refuses loudly — it would land under the reserved physical
    name and every read's drop-projection would silently hide it.
    Renaming an EXISTING column onto the freed logical name is fine
    (its physical stays distinct)."""
    vt.append(
        spark.createDataFrame([(1, "a", 2.0)], "k long, v string, w double")
    )
    vt.drop_column("v")
    with pytest.raises(ValueError, match="DROPPED"):
        vt.append(
            spark.createDataFrame([(2, "sneaky")], "k long, v string")
        )
    # renaming an existing column onto the freed name maps it to its own
    # distinct physical — reads stay correct
    vt.rename_column("w", "v")
    vt.append(spark.createDataFrame([(2, 3.5)], "k long, v double"))
    got = sorted((r.k, r.v) for r in vt.read(merge_schema=True).collect())
    assert got == [(1, 2.0), (2, 3.5)]
    # time travel still surfaces the ORIGINAL v
    assert sorted(
        (r.k, r.v, r.w) for r in vt.read(version=1).collect()
    ) == [(1, "a", 2.0)]


def test_dml_on_renamed_key_translates_manifest_stats(spark, vt):
    """File-level COW after a rename: the merge key is the LOGICAL name,
    manifest stats key the PHYSICAL one — the bounding must translate,
    so a 1-row merge still carries range-disjoint files instead of
    rewriting them (and delete_range still three-way-partitions)."""
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    ).repartitionByRange(2, "k")
    vt.append(df)
    vt.rename_column("k", "id")
    vt.merge(
        spark.createDataFrame([(1, "Z")], "id long, v string"), keys=["id"]
    )
    entry = vt._commits()[-1]
    assert any("-carry-" in r for r in entry["add"])  # disjoint file kept
    got = sorted((r.id, r.v) for r in vt.read().collect())
    assert got[1] == (1, "Z") and len(got) == 100
    vt.delete_range("id", 90, 200)
    assert vt.read().count() == 90


def test_manifest_records_file_sizes(spark, vt):
    """Every commit records per-file byte sizes (basename → bytes) —
    what byte-budgeted stream triggers, byte-aware OPTIMIZE and the
    byte-reporting VACUUM dry run read; carry dirs and checkpoints
    preserve them."""
    from daas_apps_spark.sources.table_format import CHECKPOINT_EVERY

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    ).repartitionByRange(2, "k")
    vt.append(df)
    [(rel, sizes)] = vt._commits()[-1]["file_sizes"].items()
    assert len(sizes) == 2
    root = os.path.join(vt.path, "data", rel)
    for f, n in sizes.items():
        assert os.path.getsize(os.path.join(root, f)) == n
    # a range delete carries the disjoint file by hard link — the carry
    # dir's sizes come along as manifest arithmetic
    vt.delete_range("k", 0, 40)
    entry = vt._commits()[-1]
    carry_rels = [r for r in entry["add"] if "-carry-" in r]
    assert carry_rels
    for crel in carry_rels:
        csizes = entry["file_sizes"][crel]
        assert csizes
        for f, n in csizes.items():
            assert (
                os.path.getsize(os.path.join(vt.path, "data", crel, f)) == n
            )
    # checkpoint folds sizes for exactly the live dirs
    for i in range(CHECKPOINT_EVERY):
        vt.append(_df(spark, [(200 + i, "x")]))
    import json as _json

    log = os.path.join(vt.path, "_log")
    cks = sorted(n for n in os.listdir(log) if n.endswith("checkpoint.json"))
    with open(os.path.join(log, cks[-1])) as f:
        snap = _json.load(f)
    assert set(snap["file_sizes"]) == set(snap["live"])


def test_vacuum_report_prices_reclaim_in_bytes(spark, vt):
    """vacuum_report returns the dry-run candidate set priced in bytes
    (manifest sizes for committed dirs, a listing for orphans) and
    deletes nothing."""
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.overwrite(_df(spark, [(3, "c")]))  # v1's dir goes dead
    # an orphan (torn write no commit references) is also priced
    orphan = os.path.join(vt.path, "data", "torn-orphan")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "wb") as f:
        f.write(b"x" * 1234)
    report = vt.vacuum_report()
    assert set(report["dirs"]) == set(vt.vacuum(dry_run=True))
    assert "torn-orphan" in report["dirs"]
    want = 0
    for name in report["dirs"]:
        root = os.path.join(vt.path, "data", name)
        for f in os.listdir(root):
            # manifest pricing counts data files; Spark's _SUCCESS/.crc
            # sidecars are deliberately ignored (docstring contract) —
            # the orphan's junk file is fs-walked and fully counted
            if name == "torn-orphan" or (
                f.endswith(".parquet") and not f.startswith(".")
            ):
                want += os.path.getsize(os.path.join(root, f))
    assert report["total_bytes"] == want > 0
    assert report["per_dir"]["torn-orphan"] == 1234
    # nothing deleted: all candidate dirs still on disk, table intact
    for name in report["dirs"]:
        assert os.path.isdir(os.path.join(vt.path, "data", name))
    assert vt.read().count() == 1


def test_change_plan_units_carry_sizes(spark, vt):
    """Planned stream units carry the bytes an executor will read —
    insert units their file's size, delete units the preimage's."""
    from daas_apps_spark.sources.table_format import change_plan_between

    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.delete("k = 1", mode="mor")
    units, _ = change_plan_between(vt.path, 0, None, mode="cdf")
    assert {u["kind"] for u in units} == {"insert", "delete"}
    for u in units:
        assert u["size"] == os.path.getsize(u["file"]) > 0


def test_writer_protocol_old_writer_refused(spark, vt, monkeypatch):
    """The write-side protocol guard: once a commit declares a writer
    feature, a writer lacking it refuses EVERY write path loudly —
    otherwise an old writer appends rows that bypass active CHECK
    constraints and publishes (the write-side analog of the
    resurrect-deleted-rows bug the reader guard prevents). Reads stay
    allowed: reader-only processes are always safe."""
    import daas_apps_spark.sources.table_format as tf
    from daas_apps_spark.sources.table_format import (
        UnsupportedTableFeatureError,
    )

    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.add_constraint("k_positive", "k > 0")
    last = vt._commits()[-1]
    assert last["writer_features"] == ["check-constraints"]
    assert vt.writer_features() == {"check-constraints"}

    # simulate an OLD writer: code that predates check-constraints
    monkeypatch.setattr(
        tf, "SUPPORTED_WRITER_FEATURES", {"deletion-vectors"}
    )
    for attempt in (
        lambda: vt.append(_df(spark, [(3, "c")])),
        lambda: vt.overwrite(_df(spark, [(3, "c")])),
        lambda: vt.merge(_df(spark, [(1, "z")]), keys=["k"]),
        lambda: vt.update("k = 1", {"v": "'z'"}),
        lambda: vt.update("k = 1", {"v": "'z'"}, mode="mor"),
        lambda: vt.delete("k = 1"),
        lambda: vt.delete("k = 1", mode="mor"),
        lambda: vt.delete_range("k", 1, 2),
        lambda: vt.optimize(),
    ):
        with pytest.raises(UnsupportedTableFeatureError, match="writer"):
            attempt()
    # no commit landed, no orphan data dirs were written
    assert vt.latest_version() == 2
    # reading is still fine — the requirement binds writers only
    assert vt.read().count() == 2
    # the current writer works again once the feature is supported
    monkeypatch.setattr(
        tf,
        "SUPPORTED_WRITER_FEATURES",
        {"deletion-vectors", "check-constraints"},
    )
    vt.append(_df(spark, [(3, "c")]))
    assert vt.read().count() == 3


def test_writer_feature_unknown_future_blocks_writes_not_reads(spark, vt):
    """A commit declaring a FUTURE writer feature (written by a newer
    writer) blocks this writer's commits but not its reads."""
    import json as _json

    from daas_apps_spark.sources.table_format import (
        UnsupportedTableFeatureError,
    )

    vt.append(_df(spark, [(1, "a")]))
    entry = {
        "version": 2,
        "operation": "frobnicate",
        "add": [],
        "remove": [],
        "data_change": False,
        "ts": 0.0,
        "metadata": {},
        "stats": {},
        "file_stats": {},
        "dv_add": [],
        "dv_remove": [],
        "features": [],  # readers unaffected
        "writer_features": ["fancy-future-thing"],
    }
    with open(os.path.join(vt.path, "_log", "00000002.json"), "w") as f:
        _json.dump(entry, f)
    assert vt.read().count() == 1  # reads unaffected
    with pytest.raises(
        UnsupportedTableFeatureError, match="fancy-future-thing"
    ):
        vt.append(_df(spark, [(2, "b")]))


def test_writer_features_survive_checkpoint_fold_and_mor_declares(
    spark, vt
):
    """Writer features fold into checkpoints (retention can't lose the
    requirement), accumulate monotonically (dropping the constraint does
    NOT retract the feature), and MOR commits declare deletion-vectors
    on the writer side too."""
    from daas_apps_spark.sources.table_format import CHECKPOINT_EVERY

    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.add_constraint("k_positive", "k > 0")
    vt.delete("k = 2", mode="mor")
    assert vt._commits()[-1]["writer_features"] == ["deletion-vectors"]
    vt.drop_constraint("k_positive")  # monotone: feature stays required
    for i in range(CHECKPOINT_EVERY):
        vt.append(_df(spark, [(10 + i, "x")]))
    log = os.path.join(vt.path, "_log")
    cks = sorted(
        n for n in os.listdir(log) if n.endswith("checkpoint.json")
    )
    assert cks
    ck_v = int(cks[-1].split(".")[0])
    for n in list(os.listdir(log)):
        if n.endswith(".json") and "checkpoint" not in n:
            if int(n.split(".")[0]) <= ck_v:
                os.unlink(os.path.join(log, n))
    assert vt.writer_features() == {
        "check-constraints",
        "deletion-vectors",
    }


def test_clone_carries_writer_features(spark, tmp_path):
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.add_constraint("k_positive", "k > 0")
    src.append(_df(spark, [(1, "a")]))
    clone = src.clone_to(str(tmp_path / "dst"))
    assert "check-constraints" in clone.writer_features()


def test_clone_carries_constraints(spark, tmp_path):
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
    )

    src = VersionedTable(spark, str(tmp_path / "src"))
    src.add_constraint("k_positive", "k > 0")
    src.append(_df(spark, [(1, "a")]))
    clone = src.clone_to(str(tmp_path / "dst"))
    assert clone.constraints() == {"k_positive": "k > 0"}
    with pytest.raises(ConstraintViolationError):
        clone.append(_df(spark, [(-1, "bad")]))


# -- refs / timestamp time travel ---------------------------------------------


def test_refs_pin_versions_by_name(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.set_ref("prod")  # tags v1 (the head)
    vt.append(_df(spark, [(2, "b")]))
    assert vt.refs() == {"prod": 1}
    # a ref is FROZEN: later writes don't move it
    assert [r.k for r in vt.read(ref="prod").collect()] == [1]
    assert sorted(r.k for r in vt.read().collect()) == [1, 2]
    vt.set_ref("prod", version=3)  # retag to the append's commit
    assert vt.refs() == {"prod": 3}
    vt.drop_ref("prod")
    assert vt.refs() == {}
    with pytest.raises(ValueError, match="unknown ref"):
        vt.read(ref="prod")


def test_ref_cannot_point_past_head(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="cannot tag"):
        vt.set_ref("future", version=99)


def test_timestamp_as_of_resolves_between_commits(spark, vt):
    """TIMESTAMP AS OF picks the newest commit at-or-before the given
    time; a time before the table existed fails loudly."""
    import json

    vt.append(_df(spark, [(1, "a")]))
    vt.append(_df(spark, [(2, "b")]))
    log = os.path.join(vt.path, "_log")
    commits = {}
    for n in sorted(os.listdir(log)):
        if n.endswith(".json") and "checkpoint" not in n and not n.startswith("."):
            with open(os.path.join(log, n)) as f:
                e = json.load(f)
            commits[e["version"]] = e["ts"]
    assert set(commits) == {1, 2} and commits[1] <= commits[2]
    # exactly at v1's publish time -> v1; between v1 and v2 inclusive -> as given
    assert [r.k for r in vt.read(as_of=commits[1]).collect()] == [1]
    assert sorted(
        r.k for r in vt.read(as_of=commits[2] + 60).collect()
    ) == [1, 2]
    with pytest.raises(ValueError, match="did not exist"):
        vt.read(as_of=commits[1] - 60)
    with pytest.raises(ValueError, match="at most one"):
        vt.read(version=1, as_of=commits[1])


def test_refs_survive_checkpoint_fold(spark, vt):
    from daas_apps_spark.sources.table_format import CHECKPOINT_EVERY

    vt.append(_df(spark, [(1, "a")]))
    vt.set_ref("stable")  # pins v1
    for i in range(CHECKPOINT_EVERY):
        vt.append(_df(spark, [(i + 10, "x")]))
    log = os.path.join(vt.path, "_log")
    cks = sorted(n for n in os.listdir(log) if n.endswith("checkpoint.json"))
    assert cks
    ck_v = int(cks[-1].split(".")[0])
    for n in list(os.listdir(log)):
        if n.endswith(".json") and "checkpoint" not in n and not n.startswith("."):
            if int(n.split(".")[0]) <= ck_v:
                os.unlink(os.path.join(log, n))
    assert vt.refs() == {"stable": 1}


def test_clone_at_ref(spark, tmp_path):
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a")]))
    src.set_ref("blessed")
    src.append(_df(spark, [(2, "b")]))
    clone = src.clone_to(str(tmp_path / "dst"), ref="blessed")
    assert [r.k for r in clone.read().collect()] == [1]


def test_add_constraint_rejects_malformed_expression(spark, vt):
    with pytest.raises(ValueError, match="does not parse"):
        vt.add_constraint("broken", "k > ")
    assert vt.constraints() == {}


def test_vacuum_spares_ref_pinned_snapshots(spark, vt):
    """A named ref protects its snapshot from expiration (Iceberg's
    retention rule); dropping the ref releases the storage."""
    vt.append(_df(spark, [(1, "a")]))
    vt.set_ref("pinned")
    vt.overwrite(_df(spark, [(9, "z")]))
    assert vt.vacuum(keep_versions=0) == []  # the ref'd dir survived
    assert [r.k for r in vt.read(ref="pinned").collect()] == [1]
    vt.drop_ref("pinned")
    assert vt.vacuum(keep_versions=0)  # now it's reclaimable
    assert [r.k for r in vt.read().collect()] == [9]


def test_constraint_on_evolved_column_passes_as_null(spark, vt):
    """A schema-evolving merge whose narrower updates lack a constrained
    column must see NULL for it (what a reader of the written rows sees)
    — CHECK passes — not an unresolved-column crash; a FALSE evaluation
    still rejects."""
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
    )

    vt.append(
        spark.createDataFrame([(1, "a", 5)], "k long, v string, score long")
    )
    vt.add_constraint("score_pos", "score > 0")
    vt.merge(
        _df(spark, [(2, "b")]),  # no score column -> NULL -> passes
        keys=["k"],
        allow_schema_evolution=True,
    )
    got = {r.k: r.score for r in vt.read(merge_schema=True).collect()}
    assert got == {1: 5, 2: None}
    with pytest.raises(ConstraintViolationError):
        vt.append(
            spark.createDataFrame(
                [(3, "c", -1)], "k long, v string, score long"
            )
        )


# ---------------------------------------------------------------------------
# Deletion vectors (merge-on-read DELETE): the commit records (file
# basename, row position) pairs instead of rewriting data files; reads
# anti-join them away. The invariants: no data file is touched, every
# read path (snapshot, time travel, prune, rewrite-reads inside
# merge/delete_range/optimize) subtracts live vectors, full rewrites
# purge them, vacuum/clone/checkpoint treat them as table state.


def _data_dirs(vt):
    root = os.path.join(vt.path, "data")
    return sorted(os.listdir(root)) if os.path.isdir(root) else []


def test_mor_delete_touches_no_data_file(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    before = _data_dirs(vt)
    v = vt.delete("k = 2", mode="mor")
    assert v == 2
    assert _data_dirs(vt) == before  # zero data dirs added or removed
    c = vt.history()[-1]
    assert c["add"] == [] and c["remove"] == []
    assert len(c["dv_add"]) == 1
    assert c["metadata"]["rows_deleted"] == 1
    assert sorted(r.k for r in vt.read().collect()) == [1, 3]
    # time travel to the pre-delete snapshot still sees the row
    assert sorted(r.k for r in vt.read(version=1).collect()) == [1, 2, 3]


def test_mor_delete_noop_commits_nothing(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    assert vt.delete("k = 99", mode="mor") == 1  # nothing matched
    assert len(vt.history()) == 1


def test_mor_deletes_compose_and_never_double_count(spark, vt):
    vt.append(_df(spark, [(i, "x") for i in range(6)]))
    vt.delete("k < 2", mode="mor")
    vt.delete("k < 4", mode="mor")  # overlaps the first delete's range
    assert sorted(r.k for r in vt.read().collect()) == [4, 5]
    # the second vector holds only the NEWLY deleted positions (2, 3) —
    # the matching scan is itself DV-applied
    assert vt.history()[-1]["metadata"]["rows_deleted"] == 2


def test_merge_rewrite_does_not_resurrect_mor_deleted_rows(spark, vt):
    """A COW merge reads intersecting files raw — it must subtract their
    deletion vectors or the deleted rows reappear in the rewrite."""
    vt.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    vt.delete("k = 2", mode="mor")
    vt.merge(_df(spark, [(3, "C"), (4, "d")]), keys=["k"])
    got = dict((r.k, r.v) for r in vt.read().collect())
    assert got == {1: "a", 3: "C", 4: "d"}  # no resurrected (2, "b")


def test_delete_range_rewrite_does_not_resurrect_mor_deleted_rows(spark, vt):
    vt.append(_df(spark, [(i, "x") for i in range(10)]))
    vt.delete("k = 7", mode="mor")
    vt.delete_range("k", 5, 6)  # straddling rewrite reads files raw
    assert sorted(r.k for r in vt.read().collect()) == [0, 1, 2, 3, 4, 8, 9]


def test_optimize_purges_deletion_vectors(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    vt.delete("k = 2", mode="mor")
    assert vt._live_dvs()  # vector live before the purge
    vt.optimize(target_partitions=1)
    assert vt._live_dvs() == []  # full rewrite retired it
    assert sorted(r.k for r in vt.read().collect()) == [1, 3]
    # the pre-optimize MOR snapshot still applies its vector
    assert sorted(r.k for r in vt.read(version=2).collect()) == [1, 3]
    assert sorted(r.k for r in vt.read(version=1).collect()) == [1, 2, 3]


def test_incremental_optimize_applies_vectors_of_folded_files(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.append(_df(spark, [(2, "b")]))
    vt.delete("k = 2", mode="mor")
    vt.optimize(target_partitions=1, max_dir_bytes=10**9)  # folds both dirs
    assert sorted(r.k for r in vt.read().collect()) == [1]
    # fold is data_change=False: the feed over the whole range shows the
    # MOR delete (via snapshot diff) but no phantom rows from the fold
    feed = vt.changes_between(0)
    rows = sorted((r.k, r._change_type) for r in feed.collect())
    assert rows == [(1, "insert")]


def test_change_feed_surfaces_mor_delete(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    v1 = vt.latest_version()
    vt.delete("k = 1", mode="mor")
    feed = vt.changes_between(v1)
    rows = sorted((r.k, r.v, r._change_type) for r in feed.collect())
    assert rows == [(1, "a", "delete")]


def test_version_offset_stream_rejects_mor_delete(spark, vt):
    from daas_apps_spark.sources.table_format import added_dirs_between

    vt.append(_df(spark, [(1, "a")]))
    vt.delete("k = 1", mode="mor")
    with pytest.raises(ValueError, match="append-only"):
        added_dirs_between(vt.path, 0, None)


def test_cow_delete_and_overwrite_retire_vectors(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    vt.delete("k = 1", mode="mor")
    vt.delete("k = 2", mode="cow")  # full rewrite applies + retires
    assert vt._live_dvs() == []
    assert sorted(r.k for r in vt.read().collect()) == [3]
    vt.delete("k = 3", mode="mor")
    vt.overwrite(_df(spark, [(9, "z")]))
    assert vt._live_dvs() == []
    assert [r.k for r in vt.read().collect()] == [9]


def test_read_prune_applies_deletion_vectors(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.append(_df(spark, [(10, "x"), (11, "y")]))
    vt.delete("k = 10", mode="mor")
    snap = vt.read(prune=("k", 9, 12))
    assert sorted(r.k for r in snap.collect()) == [11]


def test_vacuum_reclaims_dead_vectors_and_spares_live(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.delete("k = 1", mode="mor")  # v2: vector live
    assert vt.vacuum(keep_versions=0) == []  # live vector spared
    assert sorted(r.k for r in vt.read().collect()) == [2]
    vt.optimize(target_partitions=1)  # v3 purges the vector
    deleted = vt.vacuum(keep_versions=0)
    assert any(d.startswith("_dv/") for d in deleted)
    assert sorted(r.k for r in vt.read().collect()) == [2]


def test_vacuum_spares_ref_pinned_vectors(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.delete("k = 1", mode="mor")
    vt.set_ref("mor-pin")
    vt.optimize(target_partitions=1)  # purges vectors at HEAD
    assert not any(
        d.startswith("_dv/") for d in vt.vacuum(keep_versions=0)
    )  # pinned snapshot still needs its vector
    assert sorted(r.k for r in vt.read(ref="mor-pin").collect()) == [2]


def test_clone_carries_deletion_vectors(spark, vt, tmp_path):
    vt.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    vt.delete("k = 2", mode="mor")
    clone = vt.clone_to(str(tmp_path / "clone"))
    assert sorted(r.k for r in clone.read().collect()) == [1, 3]
    # clone state is independent: purging the SOURCE's vectors does not
    # resurrect rows in the clone (and vice versa)
    vt.optimize(target_partitions=1)
    assert sorted(r.k for r in clone.read().collect()) == [1, 3]
    clone.delete("k = 3", mode="mor")
    assert sorted(r.k for r in vt.read().collect()) == [1, 3]


def test_checkpoint_folds_deletion_vectors(spark, vt):
    """Replay from a checkpoint must reproduce DV state: vectors recorded
    only in pre-checkpoint commits would otherwise vanish from replay."""
    from daas_apps_spark.sources.table_format import CHECKPOINT_EVERY

    vt.append(_df(spark, [(i, "x") for i in range(4)]))
    vt.delete("k = 0", mode="mor")  # v2
    for i in range(CHECKPOINT_EVERY):  # push a checkpoint past v2
        vt.append(_df(spark, [(100 + i, "y")]))
    ck = os.path.join(
        vt.path, "_log", f"{CHECKPOINT_EVERY:08d}.checkpoint.json"
    )
    assert os.path.exists(ck)
    import json

    with open(ck) as f:
        assert json.load(f)["dvs"]  # the vector survived the fold
    got = sorted(r.k for r in vt.read().collect())
    assert 0 not in got and got[:3] == [1, 2, 3]


def test_mor_delete_null_predicate_keeps_row(spark, vt):
    """NULL predicate result keeps the row — SQL DELETE semantics on the
    MOR path too."""
    vt.append(
        spark.createDataFrame([(1, None), (2, "b")], "k long, v string")
    )
    vt.delete("v = 'b'", mode="mor")  # NULL v -> unknown -> kept
    assert sorted(r.k for r in vt.read().collect()) == [1]


# ---------------------------------------------------------------------------
# UPDATE ... SET (the third DML verb): COW rewrites with CASE WHEN; MOR
# pairs a deletion vector (old positions) with a new data dir (updated
# rows) in ONE atomic commit.


def test_cow_update_rewrites_and_time_travels(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    v = vt.update("k >= 2", {"v": "upper(v)"}, mode="cow")
    assert v == 2
    got = dict((r.k, r.v) for r in vt.read().collect())
    assert got == {1: "a", 2: "B", 3: "C"}
    old = dict((r.k, r.v) for r in vt.read(version=1).collect())
    assert old == {1: "a", 2: "b", 3: "c"}


def test_mor_update_touches_no_existing_file(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    before = _data_dirs(vt)
    vt.update("k = 2", {"v": "'B'"}, mode="mor")
    after = _data_dirs(vt)
    assert set(before) < set(after) and len(after) == len(before) + 1
    c = vt.history()[-1]
    assert c["operation"] == "update"
    assert c["remove"] == [] and len(c["add"]) == 1 and len(c["dv_add"]) == 1
    assert c["metadata"]["rows_updated"] == 1
    got = dict((r.k, r.v) for r in vt.read().collect())
    assert got == {1: "a", 2: "B", 3: "c"}
    # pre-update snapshot unchanged
    assert dict(
        (r.k, r.v) for r in vt.read(version=1).collect()
    ) == {1: "a", 2: "b", 3: "c"}


def test_update_set_sees_old_values_per_row(spark, vt):
    """Standard UPDATE semantics: the SET expression evaluates against
    the row's OLD values, on both paths."""
    vt.append(_df(spark, [(1, "x"), (2, "y")]))
    vt.update("k = 1", {"v": "concat(v, '!')"}, mode="mor")
    vt.update("k = 2", {"v": "concat(v, '?')"}, mode="cow")
    got = dict((r.k, r.v) for r in vt.read().collect())
    assert got == {1: "x!", 2: "y?"}


def test_mor_update_composes_with_mor_delete_and_merge(spark, vt):
    vt.append(_df(spark, [(i, "x") for i in range(5)]))
    vt.update("k in (1, 2)", {"v": "'u'"}, mode="mor")
    vt.delete("k = 2", mode="mor")  # deletes the UPDATED row, not the old
    vt.merge(_df(spark, [(3, "m")]), keys=["k"])
    got = dict((r.k, r.v) for r in vt.read().collect())
    assert got == {0: "x", 1: "u", 3: "m", 4: "x"}


def test_update_unknown_column_raises(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="unknown column"):
        vt.update("k = 1", {"nope": "'x'"})
    assert len(vt.history()) == 1


def test_update_violating_constraint_rejected_whole(spark, vt):
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
    )

    vt.append(spark.createDataFrame([(1, 5), (2, 7)], "k long, score long"))
    vt.add_constraint("score_pos", "score > 0")
    for mode in ("mor", "cow"):
        with pytest.raises(ConstraintViolationError):
            vt.update("k = 1", {"score": "-1"}, mode=mode)
    assert dict(
        (r.k, r.score) for r in vt.read().collect()
    ) == {1: 5, 2: 7}


def test_mor_update_noop_commits_nothing(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    assert vt.update("k = 99", {"v": "'x'"}, mode="mor") == 1
    assert len(vt.history()) == 1


def test_mor_update_noop_leaves_no_staged_dirs(spark, vt):
    # the vector and updated-rows writes run CONCURRENTLY (two driver
    # threads over the one checkpointed matched set), so the no-match
    # path must discard BOTH staged dirs — data/ and _dv/ stay exactly
    # as they were, not just uncommitted
    vt.append(_df(spark, [(1, "a")]))
    data_before = _data_dirs(vt)
    dv_root = os.path.join(vt.path, "_dv")
    dv_before = sorted(os.listdir(dv_root)) if os.path.isdir(dv_root) else []
    assert vt.update("k = 99", {"v": "'x'"}, mode="mor") == 1
    assert _data_dirs(vt) == data_before
    dv_after = sorted(os.listdir(dv_root)) if os.path.isdir(dv_root) else []
    assert dv_after == dv_before


def test_change_feed_surfaces_mor_update_as_delete_insert(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    v1 = vt.latest_version()
    vt.update("k = 1", {"v": "'A'"}, mode="mor")
    feed = vt.changes_between(v1)
    rows = sorted((r.k, r.v, r._change_type) for r in feed.collect())
    assert rows == [(1, "A", "insert"), (1, "a", "delete")]


def test_update_null_condition_keeps_row_unchanged(spark, vt):
    vt.append(
        spark.createDataFrame([(1, None), (2, "b")], "k long, v string")
    )
    vt.update("v = 'b'", {"v": "'B'"}, mode="mor")  # NULL v -> unchanged
    got = dict((r.k, r.v) for r in vt.read().collect())
    assert got == {1: None, 2: "B"}


# ---------------------------------------------------------------------------
# MOR delta fast path in the change feed: a range whose only row removals
# are deletion vectors prices the feed by |delta| (vector'd files +
# added dirs), never by two full-snapshot exceptAlls.


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_change_feed_mor_fast_path_skips_snapshot_diff(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))  # pre-range
    v1 = vt.latest_version()
    vt.append(_df(spark, [(4, "d")]))
    vt.delete("k = 2", mode="mor")
    vt.update("k = 3", {"v": "'C'"}, mode="mor")
    feed = vt.changes_between(v1)
    rows = sorted((r.k, r.v, r._change_type) for r in feed.collect())
    assert rows == [
        (2, "b", "delete"),
        (3, "C", "insert"),
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]
    # structural pin: the manifest path, not the exceptAll diff
    # (exceptAll optimizes to a replicaterows Generate, not an Except node)
    assert "replicaterows" not in _optimized_plan(feed)


def test_change_feed_mor_delete_only_range(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    v1 = vt.latest_version()
    vt.delete("k = 1", mode="mor")
    feed = vt.changes_between(v1)
    rows = sorted((r.k, r.v, r._change_type) for r in feed.collect())
    assert rows == [(1, "a", "delete")]
    assert "replicaterows" not in _optimized_plan(feed)


def test_change_feed_nets_same_range_insert_and_delete(spark, vt):
    """A row appended AND vector-deleted inside the range must net to
    nothing (diff semantics) — the MOR fast path now nets the pair out
    itself (delete side reads only pre-range files, insert side
    anti-joins the same-range vector positions) instead of falling back
    to the snapshot diff, so the plan stays |delta|-sized: no
    ``exceptAll`` (replicaterows) over the table."""
    vt.append(_df(spark, [(1, "a")]))
    v1 = vt.latest_version()
    vt.append(_df(spark, [(2, "b"), (3, "c")]))  # in-range insert
    vt.delete("k = 2", mode="mor")  # deletes an in-range row
    feed = vt.changes_between(v1)
    rows = sorted((r.k, r.v, r._change_type) for r in feed.collect())
    assert rows == [(3, "c", "insert")]  # the (2,b) pair netted out
    assert "replicaterows" not in _optimized_plan(feed)


def test_change_feed_nets_mixed_old_and_new_deletes(spark, vt):
    """One MOR delete spanning a pre-range file and a same-range file:
    the pre-range row surfaces as a delete, the same-range pair nets
    out, still with no snapshot diff."""
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    v1 = vt.latest_version()
    vt.append(_df(spark, [(3, "c"), (4, "d")]))  # in-range insert
    vt.delete("k IN (1, 3)", mode="mor")  # old row + in-range row
    feed = vt.changes_between(v1)
    rows = sorted((r.k, r.v, r._change_type) for r in feed.collect())
    assert rows == [(1, "a", "delete"), (4, "d", "insert")]
    assert "replicaterows" not in _optimized_plan(feed)


def test_change_feed_falls_back_when_vector_hits_optimized_file(spark, vt):
    """A vector on a file written by an in-range OPTIMIZE may target a
    pre-range row the diff must surface — the manifest cannot prove
    which, so the fast path declines and the snapshot diff answers."""
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    v1 = vt.latest_version()
    vt.append(_df(spark, [(3, "c")]))
    vt.optimize()  # rewrites both dirs into one (data_change: false)
    vt.delete("k = 1", mode="mor")  # vector lands on the rewritten file
    feed = vt.changes_between(v1)
    rows = sorted((r.k, r.v, r._change_type) for r in feed.collect())
    assert rows == [(1, "a", "delete"), (3, "c", "insert")]
    assert "replicaterows" in _optimized_plan(feed)


def test_ivm_over_mor_deletes_matches_recompute(spark, vt):
    """maintain_additive_aggregate fed by the MOR fast path lands exactly
    where a full recompute does."""
    from daas_apps_spark.sources.table_format import (
        maintain_additive_aggregate,
    )

    vt.append(
        spark.createDataFrame(
            [(i, "g%d" % (i % 3), i * 10) for i in range(12)],
            "k long, g string, x long",
        )
    )
    v1 = vt.latest_version()
    vt.delete("k in (1, 4, 7)", mode="mor")
    vt.update("k = 2", {"x": "x + 1000"}, mode="mor")
    view = maintain_additive_aggregate(
        vt, v_from=v1, v_to=None, group_by=["g"], count_col="n",
        sums={"sx": "x"},
    )
    got = {(r.g, r.n, r.sx) for r in view.collect()}
    expect = {
        (r.g, r.n, r.sx)
        for r in vt.read()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
        )
        .collect()
    }
    assert got == expect


def test_compact_vectors_folds_to_one_and_preserves_reads(spark, vt):
    vt.append(_df(spark, [(i, "x") for i in range(8)]))
    vt.delete("k = 1", mode="mor")
    vt.delete("k = 3", mode="mor")
    vt.update("k = 5", {"v": "'u'"}, mode="mor")
    assert len(vt._live_dvs()) == 3
    v = vt.compact_vectors()
    assert len(vt._live_dvs()) == 1
    got = dict((r.k, r.v) for r in vt.read().collect())
    assert got == {0: "x", 2: "x", 4: "x", 5: "u", 6: "x", 7: "x"}
    # metadata-only: data_change=False, so the feed skips the fold
    c = vt.history()[-1]
    assert c["operation"] == "compact_vectors"
    assert c["data_change"] is False and c["add"] == []
    # time travel BEFORE the fold still reads the original vectors
    assert dict(
        (r.k, r.v) for r in vt.read(version=v - 1).collect()
    ) == got
    # fewer than two live vectors: no-op
    assert vt.compact_vectors() == v


def test_compact_vectors_drops_stale_entries(spark, vt):
    """An incremental OPTIMIZE fold applies vectors physically but leaves
    them live — their entries for the folded files become dead weight the
    vector fold prunes."""
    import glob

    import pyarrow.parquet as pq

    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.delete("k = 1", mode="mor")
    vt.append(_df(spark, [(3, "c"), (4, "d")]))
    vt.delete("k = 4", mode="mor")
    vt.optimize(target_partitions=1, max_dir_bytes=10**9)  # folds both dirs
    vt.delete("k = 3", mode="mor")  # fresh vector on the folded file
    assert len(vt._live_dvs()) == 3
    vt.compact_vectors()
    [rel] = vt._live_dvs()
    n = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(
            os.path.join(vt.path, "_dv", rel, "*.parquet")
        )
    )
    assert n == 1  # only the live file's entry survived the fold
    assert sorted(r.k for r in vt.read().collect()) == [2]


# ---------------------------------------------------------------------------
# RESTORE: roll back to an earlier snapshot as a NEW commit — pure
# manifest arithmetic over dirs still on disk, history preserved.


def test_restore_rolls_back_and_preserves_history(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))  # v1 — good
    vt.overwrite(_df(spark, [(9, "bad")]))  # v2 — bad load
    v = vt.restore(version=1)
    assert v == 3
    assert sorted(r.k for r in vt.read().collect()) == [1, 2]
    # the bad version stays time-travelable (unlike a log rewind)
    assert [r.k for r in vt.read(version=2).collect()] == [9]
    assert vt.history()[-1]["operation"] == "restore"
    assert vt.history()[-1]["metadata"]["restored_version"] == 1


def test_restore_carries_deletion_vectors(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    vt.delete("k = 2", mode="mor")  # v2: snapshot is {1, 3}
    vt.optimize(target_partitions=1)  # v3 purges the vector
    vt.append(_df(spark, [(4, "d")]))  # v4
    vt.restore(version=2)
    assert sorted(r.k for r in vt.read().collect()) == [1, 3]
    assert len(vt._live_dvs()) == 1  # the vector is live state again


def test_restore_feed_shows_rollback_as_changes(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.append(_df(spark, [(2, "b")]))  # v2
    v2 = vt.latest_version()
    vt.restore(version=1)
    feed = vt.changes_between(v2)
    rows = sorted((r.k, r._change_type) for r in feed.collect())
    assert rows == [(2, "delete")]


def test_restore_refuses_vacuumed_snapshot(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.overwrite(_df(spark, [(2, "b")]))
    vt.vacuum(keep_versions=0)  # reclaims v1's dir
    with pytest.raises(ValueError, match="vacuumed"):
        vt.restore(version=1)


def test_restore_to_ref_and_arg_validation(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.set_ref("good")
    vt.overwrite(_df(spark, [(9, "z")]))
    with pytest.raises(ValueError, match="exactly one"):
        vt.restore()
    with pytest.raises(ValueError, match="exactly one"):
        vt.restore(version=1, ref="good")
    vt.restore(ref="good")
    assert [r.k for r in vt.read().collect()] == [1]


def test_optimize_zorder_three_columns_bounds_all(spark, vt):
    """Multi-column ZORDER (N-D Morton): over a full 3-D grid, each of
    the 8 output files must bound ALL THREE columns to a fraction of
    their range — a 2-col interleave would leave the third column
    spanning the full range in every file."""
    import glob

    import pyarrow.parquet as pq

    grid = spark.range(16 * 16 * 16).selectExpr(
        "cast(id % 16 as long) as x",
        "cast((id div 16) % 16 as long) as y",
        "cast(id div 256 as long) as z",
    )
    vt.append(grid)
    vt.optimize(target_partitions=8, zorder_by=("x", "y", "z"))
    assert vt.read().count() == 16 * 16 * 16
    (live_dir,) = vt._live_dirs()
    files = glob.glob(os.path.join(live_dir, "*.parquet"))
    assert len(files) == 8
    for f in files:
        md = pq.ParquetFile(f).metadata
        spans = {}
        for i in range(md.row_group(0).num_columns):
            name = md.row_group(0).column(i).path_in_schema
            mn = min(
                md.row_group(r).column(i).statistics.min
                for r in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(r).column(i).statistics.max
                for r in range(md.num_row_groups)
            )
            spans[name] = mx - mn
        # 8 files over a 16^3 grid: each bounds every dim to ≤ ~2/3 range
        assert all(s <= 11 for s in spans.values()), (f, spans)


def test_optimize_zorder_rejects_bad_column_counts(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="2 to"):
        vt.optimize(zorder_by=("k",))


def test_detail_reports_operational_summary(spark, vt):
    vt.append(_df(spark, [(i, "x") for i in range(6)]))
    vt.append(_df(spark, [(10, "y")]))
    vt.delete("k in (1, 2)", mode="mor")
    vt.add_constraint("k_nonneg", "k >= 0")
    vt.set_ref("pin")
    d = vt.detail()
    assert d["num_data_dirs"] == 2 and d["num_files"] >= 2
    assert d["num_deletion_vector_dirs"] == 1
    assert d["num_deleted_positions"] == 2
    assert d["num_constraints"] == 1 and "pin" in d["refs"]
    assert d["total_bytes"] > 0 and d["num_small_files"] == d["num_files"]
    # time travel: the pre-delete version reports no vectors
    d1 = vt.detail(version=2)
    assert d1["num_deletion_vector_dirs"] == 0 and d1["version"] == 2


def test_unknown_reader_feature_fails_loud(spark, vt):
    """A commit declaring a feature this reader lacks must refuse ALL
    state resolution (reading on would give wrong answers, not missing
    ones) — the Delta reader-protocol guard."""
    import json

    from daas_apps_spark.sources.table_format import (
        UnsupportedTableFeatureError,
        read_log,
    )

    vt.append(_df(spark, [(1, "a")]))
    # hand-forge a future commit declaring an unknown feature
    entry = {
        "version": 2,
        "operation": "append",
        "add": [],
        "remove": [],
        "data_change": True,
        "ts": 0,
        "metadata": {},
        "stats": {},
        "file_stats": {},
        "features": ["row-tracking-v9"],
    }
    with open(os.path.join(vt.path, "_log", "00000002.json"), "w") as f:
        json.dump(entry, f)
    with pytest.raises(UnsupportedTableFeatureError, match="row-tracking-v9"):
        vt.read()
    with pytest.raises(UnsupportedTableFeatureError):
        read_log(vt.path)  # the streaming workers' reader refuses too


def test_mor_commits_declare_the_dv_feature(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.delete("k = 1", mode="mor")
    assert vt.history()[-1]["features"] == ["deletion-vectors"]
    assert vt.history()[0].get("features", []) == []  # plain append: none


def test_vacuum_dry_run_reports_without_deleting(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.overwrite(_df(spark, [(2, "b")]))
    would = vt.vacuum(keep_versions=0, dry_run=True)
    assert would  # v1's dir is reclaimable...
    assert sorted(r.k for r in vt.read(version=1).collect()) == [1]  # ...but intact
    assert vt.vacuum(keep_versions=0) == would  # the real run matches the report
    with pytest.raises(Exception):
        vt.read(version=1).collect()  # now it's gone


def test_rename_of_clustering_key_rewrites_layout_in_same_commit(spark, vt):
    """Renaming a column named by the active clustered layout must carry
    the layout to the new logical name IN THE SAME metadata commit —
    otherwise every future write's key lookup misses and files silently
    land unclustered while the table still declares the
    clustered-layout writer feature readers budget scans by."""
    vt.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "k long, v string"
        ).coalesce(1)
    )
    vt.set_layout(["k"], target_files=4)
    vt.rename_column("k", "key")
    entry = vt._commits()[-1]
    # ONE commit carries both the mapping and the rewritten layout
    assert "column_mapping_set" in entry["metadata"]
    assert entry["metadata"]["layout_set"]["cluster_by"] == ["key"]
    assert vt.layout() == {"cluster_by": ["key"], "target_files": 4}
    # a post-rename write still clusters: 4 range-disjoint files
    vt.append(
        spark.createDataFrame(
            [(100 + i, "x") for i in range(100)], "key long, v string"
        ).coalesce(1)
    )
    [(_, fstats)] = vt._commits()[-1]["file_stats"].items()
    assert len(fstats) == 4
    ranges = sorted((st["k"][0], st["k"][1]) for st in fstats.values())
    assert all(a[1] < b[0] for a, b in zip(ranges, ranges[1:]))


def test_drop_of_clustering_key_refuses(spark, vt):
    """Dropping a clustering key would leave the layout pointing at
    nothing — refuse loudly (like constraints do) instead of letting
    future writes land unclustered."""
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.set_layout(["v"])
    with pytest.raises(ValueError, match="clustering key"):
        vt.drop_column("v")
    vt.set_layout(None)
    vt.drop_column("v")  # clear the layout first → drop proceeds
    assert vt.read().columns == ["k"]


def test_write_missing_clustering_key_refuses(spark, vt):
    """A write that lacks a declared clustering column must refuse, not
    silently land unclustered files under a table that declares the
    clustered-layout writer feature."""
    vt.append(_df(spark, [(1, "a")]))
    vt.set_layout(["v"])
    with pytest.raises(ValueError, match="missing clustering key"):
        vt.append(spark.createDataFrame([(2,)], "k long"))
    # a write carrying the key still lands
    vt.append(_df(spark, [(2, "b")]))
    assert sorted(r.k for r in vt.read().collect()) == [1, 2]


def test_drop_last_mapped_field_with_unmapped_evolved_columns(spark, vt):
    """The mapping registers post-bootstrap evolved columns lazily, so
    its field list can understate the live logical width: dropping the
    last MAPPED field must succeed when unmapped evolved columns still
    exist in the live files."""
    vt.append(spark.createDataFrame([(1,)], "k long"))
    vt.rename_column("k", "key")  # mapping bootstraps with ONE field
    # schema evolution: a later append introduces v (never renamed →
    # never registered in the mapping)
    vt.append(spark.createDataFrame([(2, "b")], "key long, v string"))
    vt.drop_column("key")  # v remains — NOT the last column
    assert vt.read(merge_schema=True).columns == ["v"]
    # and the true last column still refuses
    with pytest.raises(ValueError, match="last column"):
        vt.drop_column("v")


def test_stream_colmap_raises_on_vanished_declared_column(spark, vt):
    """A stream's declared schema is fixed at start while the mapping
    keeps evolving: a declared logical name renamed AWAY mid-stream (or
    the old physical name of a renamed column) must raise at plan time,
    never silently null-fill."""
    from daas_apps_spark.sources.table_format import resolve_stream_colmap

    vt.append(_df(spark, [(1, "a")]))
    vt.rename_column("v", "label")
    # declared with the current name: resolves to the physical
    assert resolve_stream_colmap(vt.path, ["k", "label"]) == {
        "k": "k",
        "label": "v",
    }
    # the OLD name of a renamed column: vanished → raise
    with pytest.raises(ValueError, match="no longer resolve"):
        resolve_stream_colmap(vt.path, ["k", "v"])
    # rename AGAIN: a stream declared between the renames vanishes too
    vt.rename_column("label", "tag")
    with pytest.raises(ValueError, match="label"):
        resolve_stream_colmap(vt.path, ["k", "label"])
    assert resolve_stream_colmap(vt.path, ["tag"]) == {
        "k": "k",
        "tag": "v",
    }
    # an unmapped evolved column passes through untouched
    vt.append(spark.createDataFrame([(2, "x", 1.0)], "k long, tag string, w double"))
    assert resolve_stream_colmap(vt.path, ["w"])["tag"] == "v"


def test_change_plan_stat_fallback_raises_descriptive_error(spark, vt):
    """A pre-size-manifest commit whose file was vacuumed must fail at
    PLAN time with the planner's descriptive vacuumed-range error, not a
    bare FileNotFoundError from a stat call; a manifest-recorded 0-byte
    size is a real size, not a missing entry."""
    import glob as _glob
    import json as _json

    from daas_apps_spark.sources.table_format import change_plan_between

    vt.append(_df(spark, [(1, "a")]))
    log = os.path.join(vt.path, "_log", "00000001.json")
    with open(log) as f:
        entry = _json.load(f)
    entry.pop("file_sizes", None)  # simulate an old writer's commit
    with open(log, "w") as f:
        _json.dump(entry, f)
    units, _ = change_plan_between(vt.path, 0, 1)  # stat fallback works
    assert all(u["size"] > 0 for u in units)
    for fpath in _glob.glob(
        os.path.join(vt.path, "data", entry["add"][0], "*.parquet")
    ):
        os.remove(fpath)
    with pytest.raises(ValueError, match="vacuumed"):
        change_plan_between(vt.path, 0, 1)


def test_manifest_count_zero_data_reads(spark, vt, tmp_path):
    """COUNT(*) answered from the manifest alone — commit log + deletion
    vectors, zero data-file opens (pinned by chmod-ing every data dir
    unreadable): the 100 TB census costs one log read, not a scan. DV
    rows subtract exactly; time travel counts the old snapshot; a clone
    carries the row counts."""
    vt.append(
        spark.createDataFrame(
            [(i, "a") for i in range(100)], "k long, v string"
        ).repartitionByRange(2, "k")
    )
    vt.append(
        spark.createDataFrame(
            [(100 + i, "b") for i in range(50)], "k long, v string"
        ).repartitionByRange(2, "k")
    )
    assert vt.manifest_count() == 150
    # MOR delete in the MIDDLE of the range: count subtracts the vector,
    # min/max stay provably exact (no DV on an extreme-attaining file)
    vt.delete("k >= 110 and k < 120", mode="mor")
    dest = vt.clone_to(str(tmp_path / "clone"))
    data = os.path.join(vt.path, "data")
    dirs = [os.path.join(data, d) for d in os.listdir(data)]
    for d in dirs:
        os.chmod(d, 0)
    try:
        assert vt.manifest_count() == 140
        assert vt.manifest_count(version=1) == 100
        assert vt.manifest_min_max("k") == (0, 149)
        assert dest.manifest_count() == 140
    finally:
        for d in dirs:
            os.chmod(d, 0o755)
    # the scan agrees once the files are readable again
    assert vt.read().count() == 140


def test_manifest_min_max_refuses_when_inexact(spark, vt):
    """manifest_min_max refuses LOUDLY instead of guessing: a deletion
    vector on every file attaining the extreme (the extreme row may be
    deleted), or a live file with no recorded stats for the column
    (set_stats_columns narrowed the manifest)."""
    vt.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "k long, x double"
        ).repartitionByRange(2, "k")
    )
    assert vt.manifest_min_max("k") == (0, 99)
    assert vt.manifest_min_max("x") == (0.0, 99.0)
    vt.delete("k = 0", mode="mor")  # the vector touches the MIN file
    assert vt.manifest_count() == 99  # count stays exact
    with pytest.raises(ValueError, match="deletion vector"):
        vt.manifest_min_max("k")
    # time travel BEFORE the delete is still provably exact
    assert vt.manifest_min_max("k", version=1) == (0, 99)
    # a column outside the stats allowlist refuses by name
    vt.set_stats_columns(["k"])
    vt.append(spark.createDataFrame([(200, 200.0)], "k long, x double"))
    with pytest.raises(ValueError, match="no recorded"):
        vt.manifest_min_max("x")
    # OPTIMIZE purges the vector -> min/max provable again (allowlist
    # restored first so the rewrite records stats for both columns)
    vt.set_stats_columns(None)
    vt.optimize()
    assert vt.manifest_min_max("k") == (1, 200)
    assert vt.manifest_count() == 100


def test_manifest_count_survives_checkpoint_sidecar_and_retention(
    spark, vt, monkeypatch
):
    """The per-file row counts fold into checkpoints, externalize to the
    parquet manifest sidecar, and survive log retention — and a COW
    merge's carry dirs keep them (pure manifest arithmetic, no footer
    re-reads)."""
    import daas_apps_spark.sources.table_format as tf

    monkeypatch.setattr(tf, "PARQUET_MANIFEST_MIN_FILES", 1)
    for i in range(tf.CHECKPOINT_EVERY):
        vt.append(
            spark.createDataFrame(
                [(i * 100 + j, "x") for j in range(50)], "k long, v string"
            ).repartitionByRange(2, "k")
        )
    log = os.path.join(vt.path, "_log")
    cks = sorted(n for n in os.listdir(log) if n.endswith("checkpoint.json"))
    ck_v = int(cks[-1].split(".")[0])
    for n in list(os.listdir(log)):
        if n.endswith(".json") and "checkpoint" not in n:
            if int(n.split(".")[0]) <= ck_v:
                os.unlink(os.path.join(log, n))
    assert vt.manifest_count() == 50 * tf.CHECKPOINT_EVERY
    # file-level COW: the carry dirs inherit the sidecar's row counts
    vt.merge(
        spark.createDataFrame([(1, "Z")], "k long, v string"), keys=["k"]
    )
    data = os.path.join(vt.path, "data")
    dirs = [os.path.join(data, d) for d in os.listdir(data)]
    for d in dirs:
        os.chmod(d, 0)
    try:
        assert vt.manifest_count() == 50 * tf.CHECKPOINT_EVERY
    finally:
        for d in dirs:
            os.chmod(d, 0o755)


def test_type_widening_is_metadata_only_and_reads_mixed_eras(spark, vt):
    """widen_column publishes ONE metadata commit: zero data dirs
    touched, old (narrow) files upcast at scan time via the explicit
    widened schema, new writes land the wide type physically, time
    travel before the widen surfaces the narrow type."""
    import glob as _glob

    import pyarrow.parquet as pq

    vt.append(
        spark.createDataFrame([(1, 1.5), (2, 2.5)], "k int, x float")
    )  # v1: narrow era
    dirs_before = sorted(os.listdir(os.path.join(vt.path, "data")))
    assert vt.widen_column("k", "bigint") == 2
    entry = vt._commits()[-1]
    assert entry["add"] == [] and entry["remove"] == []
    assert entry["data_change"] is False
    assert "type-widening" in entry["features"]
    assert "type-widening" in vt.writer_features()
    assert sorted(os.listdir(os.path.join(vt.path, "data"))) == dirs_before
    assert dict(vt.read().dtypes)["k"] == "bigint"
    # a post-widen append overflows int32 — the reason the user widened
    vt.append(spark.createDataFrame([(2**40, 9.5)], "k long, x float"))
    got = sorted((r.k, r.x) for r in vt.read().collect())
    assert got == [(1, 1.5), (2, 2.5), (2**40, 9.5)]
    # the NEW file physically stores the wide type (write-funnel cast)
    new_dir = [
        d
        for d in os.listdir(os.path.join(vt.path, "data"))
        if d not in dirs_before
    ]
    f = _glob.glob(os.path.join(vt.path, "data", new_dir[0], "*.parquet"))[0]
    assert str(pq.ParquetFile(f).schema_arrow.field("k").type) == "int64"
    # time travel BEFORE the widen surfaces the narrow type
    assert dict(vt.read(version=1).dtypes)["k"] == "int"
    # float -> double widens too, and chains read together
    vt.widen_column("x", "double")
    assert dict(vt.read().dtypes)["x"] == "double"
    assert vt.read().filter("k > 100").count() == 1


def test_type_widening_refuses_narrowing_and_old_protocols(
    spark, vt, monkeypatch
):
    """Narrowing/cross-family changes refuse; same-type is a no-op
    without a commit; pre-widening readers AND writers refuse via the
    type-widening feature."""
    import daas_apps_spark.sources.table_format as tf
    from daas_apps_spark.sources.table_format import (
        UnsupportedTableFeatureError,
    )

    vt.append(spark.createDataFrame([(1, 1.5)], "k int, x double"))
    with pytest.raises(ValueError, match="cannot widen"):
        vt.widen_column("x", "float")  # narrowing
    with pytest.raises(ValueError, match="cannot widen"):
        vt.widen_column("k", "string")  # cross-family
    with pytest.raises(ValueError, match="does not exist"):
        vt.widen_column("nope", "bigint")
    v = vt.latest_version()
    assert vt.widen_column("k", "int") == v  # no-op: no commit published
    assert vt.latest_version() == v
    vt.widen_column("k", "bigint")
    monkeypatch.setattr(tf, "SUPPORTED_FEATURES", {"deletion-vectors"})
    with pytest.raises(UnsupportedTableFeatureError, match="type-widening"):
        vt.read()
    monkeypatch.undo()
    monkeypatch.setattr(tf, "SUPPORTED_WRITER_FEATURES", {"deletion-vectors"})
    with pytest.raises(UnsupportedTableFeatureError, match="type-widening"):
        vt.append(spark.createDataFrame([(2, 2.0)], "k long, x double"))


def test_type_widening_checkpoint_fold_feed_and_cow(spark, vt):
    """The widening map folds into checkpoints (survives log
    retention); the change feed spans both eras on the widened type;
    file-level COW (merge) and MOR delete work across the mixed era;
    OPTIMIZE materializes the wide type physically."""
    import glob as _glob
    import json as _json

    import pyarrow.parquet as pq
    from daas_apps_spark.sources.table_format import CHECKPOINT_EVERY

    vt.append(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)],
                              "k int, v string")
    )  # v1: narrow
    vt.widen_column("k", "bigint")  # v2
    vt.append(
        spark.createDataFrame([(2**40, "big")], "k long, v string")
    )  # v3: wide era
    # the feed spans both eras, aligned on the widened type
    feed = vt.changes_between(0, 3)
    assert dict(feed.dtypes)["k"] == "bigint"
    assert feed.count() == 11
    # MOR delete + merge across the mixed era
    vt.delete("k = 3", mode="mor")  # v4
    vt.merge(
        spark.createDataFrame([(1, "ONE"), (2**41, "huge")],
                              "k long, v string"),
        keys=["k"],
    )  # v5
    got = dict((r.k, r.v) for r in vt.read().collect())
    assert got[1] == "ONE" and got[2**41] == "huge" and 3 not in got
    assert len(got) == 11
    # checkpoint folds the widening map; retention keeps it working
    for i in range(CHECKPOINT_EVERY):
        vt.append(
            spark.createDataFrame([(100 + i, "x")], "k long, v string")
        )
    log = os.path.join(vt.path, "_log")
    cks = sorted(n for n in os.listdir(log) if n.endswith("checkpoint.json"))
    with open(os.path.join(log, cks[-1])) as f:
        snap = _json.load(f)
    assert snap["type_widening"] == {"k": "bigint"}
    assert "type-widening" in snap["features"]
    ck_v = int(cks[-1].split(".")[0])
    for n in list(os.listdir(log)):
        if n.endswith(".json") and "checkpoint" not in n:
            if int(n.split(".")[0]) <= ck_v:
                os.unlink(os.path.join(log, n))
    assert dict(vt.read().dtypes)["k"] == "bigint"
    assert vt.read().count() == 11 + CHECKPOINT_EVERY
    # OPTIMIZE's rewrite materializes the wide type physically
    vt.optimize()
    for d in vt._live_dirs():
        for f in _glob.glob(os.path.join(d, "*.parquet")):
            assert str(pq.ParquetFile(f).schema_arrow.field("k").type) == (
                "int64"
            )


def test_type_widening_resolves_through_column_mapping(spark, vt):
    """widen_column takes the LOGICAL name: the map keys on the
    immutable physical name, so renames before/after the widen are
    orthogonal."""
    vt.append(spark.createDataFrame([(7, "a")], "k int, v string"))
    vt.rename_column("k", "key")
    vt.widen_column("key", "bigint")  # logical name resolves
    assert vt.type_widening() == {"k": "bigint"}  # keyed physically
    assert dict(vt.read().dtypes)["key"] == "bigint"
    vt.rename_column("key", "ident")  # rename AFTER the widen
    assert dict(vt.read().dtypes)["ident"] == "bigint"
    assert [r.ident for r in vt.read().collect()] == [7]


def test_multi_table_txn_atomic_visibility(spark, tmp_path):
    """Commits staged under a MultiTableTxn occupy version slots but
    contribute NOTHING until the coordinator's single atomic marker —
    then every participant flips visible at once. A reader between the
    staged commits can never observe the half-state; plain commits
    refuse while the txn is unresolved (no retroactive flip)."""
    from daas_apps_spark.sources.table_format import (
        CommitConflictError,
        MultiTableTxn,
        VersionedTable,
    )

    a = VersionedTable(spark, str(tmp_path / "a"))
    b = VersionedTable(spark, str(tmp_path / "b"))
    a.append(_df(spark, [(1, "a")]))
    b.append(_df(spark, [(10, "x")]))
    coord = MultiTableTxn(str(tmp_path / "coord"))
    txn = coord.begin()
    assert coord.status(txn) == "pending"
    a.append(_df(spark, [(2, "b")]), txn=txn)  # staged
    # the half-state a non-atomic fan-out exposes is IMPOSSIBLE here:
    # the staged commit consumed a version slot but shows no rows
    assert a.latest_version() == 2
    assert [r.k for r in a.read().collect()] == [1]
    assert a.manifest_count() == 1
    b.overwrite(_df(spark, [(10, "x"), (11, "y")]), txn=txn)  # staged
    assert [r.k for r in b.read().collect()] == [10]
    # plain commits refuse while the txn is unresolved
    with pytest.raises(CommitConflictError, match="pending"):
        a.append(_df(spark, [(9, "z")]))
    coord.commit(txn)  # THE atomic visibility point
    assert coord.status(txn) == "committed"
    assert sorted(r.k for r in a.read().collect()) == [1, 2]
    assert sorted(r.k for r in b.read().collect()) == [10, 11]
    assert a.manifest_count() == 2
    assert "txn-markers" in a.history()[-1]["features"]
    assert "txn-markers" in a.writer_features()
    a.append(_df(spark, [(3, "c")]))  # resolved: plain commits again
    assert a.latest_version() == 3
    # commit() is idempotent; abort after commit refuses
    coord.commit(txn)
    with pytest.raises(ValueError, match="already committed"):
        coord.abort(txn)


def test_multi_table_txn_presumed_abort(spark, tmp_path):
    """A txn never marked committed is dead: abort (or the restart
    sweep abort_abandoned) makes its staged commits permanently
    invisible consumed slots; the table accepts plain commits again and
    a late commit() of the dead txn refuses."""
    from daas_apps_spark.sources.table_format import (
        MultiTableTxn,
        VersionedTable,
    )

    a = VersionedTable(spark, str(tmp_path / "a"))
    a.append(_df(spark, [(1, "a")]))
    coord = MultiTableTxn(str(tmp_path / "coord"))
    txn = coord.begin()
    a.append(_df(spark, [(2, "b")]), txn=txn)
    assert coord.abort_abandoned() == [txn["id"]]  # the restart sweep
    assert coord.status(txn) == "aborted"
    assert [r.k for r in a.read().collect()] == [1]  # invisible forever
    a.append(_df(spark, [(3, "c")]))  # slot 2 consumed, v3 lands plain
    assert a.latest_version() == 3
    assert sorted(r.k for r in a.read().collect()) == [1, 3]
    with pytest.raises(ValueError, match="already aborted"):
        coord.commit(txn)
    # time travel around the dead slot stays consistent
    assert [r.k for r in a.read(version=2).collect()] == [1]


def test_txn_pending_stalls_feed_and_checkpoint(spark, tmp_path):
    """The change feed refuses a range containing a pending staged
    commit (planning past it would be retroactively wrong), and the
    auto-checkpoint DEFERS while a txn is unresolved (a fold would
    freeze the staged state below the replay floor) — then fires at the
    next multiple with the flipped state included."""
    from daas_apps_spark.sources.table_format import (
        CHECKPOINT_EVERY,
        MultiTableTxn,
        VersionedTable,
        change_plan_between,
    )

    a = VersionedTable(spark, str(tmp_path / "a"))
    coord = MultiTableTxn(str(tmp_path / "coord"))
    for i in range(CHECKPOINT_EVERY - 1):  # v1..v9
        a.append(_df(spark, [(i, "x")]))
    txn = coord.begin()
    a.append(_df(spark, [(100, "staged")]), txn=txn)  # v10: would fold
    log = os.path.join(a.path, "_log")
    assert not [n for n in os.listdir(log) if n.endswith("checkpoint.json")]
    with pytest.raises(ValueError, match="pending"):
        change_plan_between(a.path, 9, 10)
    coord.commit(txn)
    units, _ = change_plan_between(a.path, 9, 10)  # resolved: plans fine
    assert units and all(u["kind"] == "insert" for u in units)
    for i in range(CHECKPOINT_EVERY):  # v11..v20: next multiple folds
        a.append(_df(spark, [(200 + i, "y")]))
    cks = [n for n in os.listdir(log) if n.endswith("checkpoint.json")]
    assert cks  # deferral ended at the next multiple
    assert a.read().count() == (CHECKPOINT_EVERY - 1) + 1 + CHECKPOINT_EVERY


def test_vacuum_spares_pending_txn_staged_dirs(spark, tmp_path):
    """VACUUM must not reap a pending txn's staged (invisible) data
    dirs — they flip live at commit; an aborted txn's dirs ARE
    reclaimable (permanently dead)."""
    from daas_apps_spark.sources.table_format import (
        MultiTableTxn,
        VersionedTable,
    )

    a = VersionedTable(spark, str(tmp_path / "a"))
    a.append(_df(spark, [(1, "a")]))
    coord = MultiTableTxn(str(tmp_path / "coord"))
    txn = coord.begin()
    a.append(_df(spark, [(2, "staged")]), txn=txn)
    staged_rel = [
        e for e in a._commits() if e.get("_txn_pending")
    ][0]["_txn_staged_add"][0]
    # aggressive vacuum (no age window) keeps the staged dir
    would = a.vacuum(keep_versions=0, min_age_seconds=0, dry_run=True)
    assert staged_rel not in would
    coord.commit(txn)
    assert sorted(r.k for r in a.read().collect()) == [1, 2]
    # an ABORTED txn's staged dir is reclaimable
    dead = coord.begin()
    a.append(_df(spark, [(3, "dead")]), txn=dead)
    dead_rel = [
        e for e in a._commits() if e.get("_txn_pending")
    ][0]["_txn_staged_add"][0]
    coord.abort(dead)
    assert dead_rel in a.vacuum(keep_versions=0, min_age_seconds=0)
    assert sorted(r.k for r in a.read().collect()) == [1, 2]


def test_clone_carries_type_widening(spark, tmp_path):
    """A clone of a mixed-era widened table must carry the widening map:
    without it the clone reads the linked files with the NARROW schema
    and crashes on the first wide file (regression — round 8)."""
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(spark.createDataFrame([(1, 10.0)], "k int, x double"))
    src.widen_column("k", "bigint")
    src.append(
        spark.createDataFrame([(4_000_000_000, 20.0)], "k long, x double")
    )
    dst = src.clone_to(str(tmp_path / "dst"))
    assert dst.type_widening() == {"k": "bigint"}
    assert sorted(r.k for r in dst.read().collect()) == [1, 4_000_000_000]
    assert dict(dst.read().dtypes)["k"] == "bigint"
    # a version-pinned clone taken BEFORE the widen stays narrow
    early = src.clone_to(str(tmp_path / "early"), version=1)
    assert early.type_widening() == {}
    assert dict(early.read().dtypes)["k"] == "int"


def test_clone_carries_clustered_layout(spark, tmp_path):
    """A clone must inherit the active clustered layout — losing it
    would land unclustered files while the table still declares the
    clustered-layout writer feature (regression — round 8)."""
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.append(spark.createDataFrame([(1, 10.0)], "k int, x double"))
    src.set_layout(["k"], target_files=2)
    dst = src.clone_to(str(tmp_path / "dst"))
    assert dst.layout() == src.layout()
    dst.append(spark.createDataFrame([(2, 30.0)], "k int, x double"))
    assert sorted(r.k for r in dst.read().collect()) == [1, 2]


# -- generated columns (A40) ------------------------------------------------


def test_generated_column_computed_validated_and_recomputed(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_generated_column("bucket", "k % 10")
    t.append(spark.createDataFrame([(5,), (12,)], "k int"))  # computed
    assert sorted((r.k, r.bucket) for r in t.read().collect()) == [
        (5, 5),
        (12, 2),
    ]
    # a frame PROVIDING the column is validated: wrong values refuse
    with pytest.raises(ConstraintViolationError, match="generated:bucket"):
        t.append(spark.createDataFrame([(7, 99)], "k int, bucket int"))
    # correct provided values pass
    t.append(spark.createDataFrame([(7, 7)], "k int, bucket int"))
    # UPDATE refuses direct SET and recomputes after a base-column SET
    with pytest.raises(ValueError, match="cannot SET generated"):
        t.update("k = 5", {"bucket": "3"})
    t.update("k = 12", {"k": "k + 1"})
    assert (13, 3) in {(r.k, r.bucket) for r in t.read().collect()}
    # merge computes the column for frames lacking it
    t.merge(spark.createDataFrame([(7, ), (24,)], "k int"), keys=["k"])
    assert (24, 4) in {(r.k, r.bucket) for r in t.read().collect()}
    # dropping the rule makes the column ordinary
    t.drop_generated_column("bucket")
    t.append(spark.createDataFrame([(1, 99)], "k int, bucket int"))
    assert (1, 99) in {(r.k, r.bucket) for r in t.read().collect()}


def test_generated_column_declaration_rules(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(5, 99)], "k int, b int"))
    # an existing column must already satisfy the expression
    with pytest.raises(ValueError, match="violate the generation"):
        t.set_generated_column("b", "k % 10")
    with pytest.raises(ValueError, match="does not parse"):
        t.set_generated_column("c", "k +")
    with pytest.raises(ValueError, match="references the column itself"):
        t.set_generated_column("c", "c + 1")
    t.set_generated_column("c", "k * 2")
    with pytest.raises(ValueError, match="already has a generation"):
        t.set_generated_column("c", "k * 3")
    # base and rule columns are pinned against rename/drop; the rule
    # column must exist physically before rename/drop resolve it
    t.append(spark.createDataFrame([(2, 198, 4)], "k int, b int, c int"))
    with pytest.raises(ValueError, match="generated"):
        t.drop_column("k")
    with pytest.raises(ValueError, match="generated"):
        t.rename_column("k", "kk")
    with pytest.raises(ValueError, match="generated"):
        t.rename_column("c", "d")
    # the declaring commit requires the writer feature
    assert "generated-columns" in t.writer_features()


def test_generated_column_survives_checkpoint_and_clone(spark, tmp_path):
    from daas_apps_spark.sources.table_format import CHECKPOINT_EVERY

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_generated_column("bucket", "k % 10")
    for i in range(CHECKPOINT_EVERY):
        t.append(spark.createDataFrame([(i,)], "k int"))
    assert any(
        ck["version"] >= CHECKPOINT_EVERY for ck in t._checkpoints()
    )
    assert t.generated_columns() == {"bucket": "k % 10"}
    c = t.clone_to(str(tmp_path / "c"))
    assert c.generated_columns() == {"bucket": "k % 10"}
    c.append(spark.createDataFrame([(33,)], "k int"))
    assert (33, 3) in {(r.k, r.bucket) for r in c.read().collect()}


def test_generated_column_prunes_as_clustering_axis(spark, tmp_path):
    """The 100 TB shape: a generated day/bucket column declared as the
    clustering axis gives file-level pruning on the derived predicate
    without any expression rewrite."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_generated_column("bucket", "k % 4")
    t.set_layout(["bucket"], target_files=4)
    t.append(spark.createDataFrame([(i,) for i in range(400)], "k int"))
    pruned = t.read(prune=("bucket", 2, 2))
    assert sorted(r.k % 4 for r in pruned.collect()) == [2] * 100
    assert len(pruned.inputFiles()) < len(t.read().inputFiles())


# -- identity columns (A41) -------------------------------------------------


def test_identity_assignment_unique_monotone_across_batches(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_identity_column("rid", start=100, step=1)
    t.append(spark.createDataFrame([(i,) for i in range(50)], "k int"))
    first = [r.rid for r in t.read().collect()]
    assert len(set(first)) == 50 and min(first) >= 100
    high1 = t.identity_columns()["rid"]["high"]
    assert high1 == max(first)
    t.append(spark.createDataFrame([(i,) for i in range(50)], "k int"))
    second = [
        r.rid for r in t.changes_between(2, 3).collect()
    ]
    assert len(set(second)) == 50 and min(second) > high1
    allr = [r.rid for r in t.read().collect()]
    assert len(set(allr)) == 100  # unique across batches


def test_identity_declaration_and_refusals(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1,)], "k int"))
    with pytest.raises(ValueError, match="already exists in the live"):
        t.set_identity_column("k")
    with pytest.raises(ValueError, match="step must be non-zero"):
        t.set_identity_column("rid", step=0)
    t.set_identity_column("rid")
    with pytest.raises(ValueError, match="already an identity"):
        t.set_identity_column("rid")
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS IDENTITY"):
        t.append(spark.createDataFrame([(2, 5)], "k int, rid long"))
    with pytest.raises(ValueError, match="cannot SET identity"):
        t.update("k = 1", {"rid": "1"})
    with pytest.raises(ValueError, match="cannot mint identity"):
        t.merge(spark.createDataFrame([(9,)], "k int"), keys=["k"])
    t.append(spark.createDataFrame([(3,)], "k int"))  # materialize rid
    with pytest.raises(ValueError, match="IDENTITY"):
        t.drop_column("rid")
    assert "identity-columns" in t.writer_features()


def test_identity_watermark_survives_checkpoint_overwrite_and_clone(
    spark, tmp_path
):
    from daas_apps_spark.sources.table_format import CHECKPOINT_EVERY

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_identity_column("rid")
    for i in range(CHECKPOINT_EVERY):
        t.append(spark.createDataFrame([(i,)], "k int"))
    high = t.identity_columns()["rid"]["high"]
    assert high is not None
    assert any(ck["version"] >= CHECKPOINT_EVERY for ck in t._checkpoints())
    # overwrite replaces rows but the watermark never rewinds
    t.overwrite(spark.createDataFrame([(99,)], "k int"))
    assert t.identity_columns()["rid"]["high"] > high
    new_rid = t.read().first().rid
    assert new_rid > high
    c = t.clone_to(str(tmp_path / "c"))
    c.append(spark.createDataFrame([(7,)], "k int"))
    clone_rids = {r.rid for r in c.read().collect()}
    assert len(clone_rids) == 2  # carried watermark: no id reuse
    assert max(clone_rids) > new_rid


# -- bloom-filter file skipping (A42) ----------------------------------------


def _bloom_table(spark, tmp_path, n_batches=4, rows=800):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_bloom_columns(["name"])
    for i in range(n_batches):
        df = spark.range(i * rows, (i + 1) * rows).select(
            F.col("id").alias("k"),
            F.concat(
                F.lit("user_"),
                F.format_string("%05d", (F.col("id") * 7919) % 100000),
            ).alias("name"),
        )
        t.append(df.coalesce(1))
    return t


def test_bloom_prunes_points_where_stats_cannot(spark, tmp_path):
    """The batches' name RANGES overlap almost fully (hashed order), so
    min/max stats keep every file for a point probe — the bloom is what
    cuts the scan."""
    t = _bloom_table(spark, tmp_path)
    allfiles = len(t.read().inputFiles())
    probe = t.read().filter("k = 2500").first().name
    pruned = t.read(prune=("name", probe, probe))
    assert len(pruned.inputFiles()) < allfiles
    assert [r.k for r in pruned.collect() if r.name == probe] == [2500]
    # a value in NO file prunes everything (zero-file scans still give
    # the right schema and zero rows)
    none = t.read(prune=("name", "user_zzzzz", "user_zzzzz"))
    assert none.count() == 0 and none.columns == pruned.columns


def test_bloom_never_false_negative(spark, tmp_path):
    t = _bloom_table(spark, tmp_path, n_batches=3, rows=400)
    for r in t.read().collect()[::37]:
        hit = (
            t.read(prune=("name", r.name, r.name))
            .filter(F.col("name") == r.name)
            .count()
        )
        assert hit >= 1, (r.k, r.name)


def test_bloom_degrades_conservatively_and_stops_on_none(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame([(1, "aaa")], "k int, name string")
    t.append(df1)  # BEFORE the declaration: no sidecar
    t.set_bloom_columns(["name"])
    t.append(spark.createDataFrame([(2, "bbb")], "k int, name string"))
    t.set_bloom_columns(None)
    t.append(spark.createDataFrame([(3, "ccc")], "k int, name string"))
    import os

    sidecars = (
        sorted(os.listdir(os.path.join(t.path, "_bloom")))
        if os.path.isdir(os.path.join(t.path, "_bloom"))
        else []
    )
    assert len(sidecars) == 1  # only the in-window write built one
    # pre/post-window files degrade to "maybe": never pruned by bloom
    got = t.read(prune=("name", "aaa", "aaa")).collect()
    assert [r.k for r in got if r.name == "aaa"] == [1]
    assert t.read(prune=("name", "ccc", "ccc")).filter("k = 3").count() == 1
    # range prunes ignore blooms entirely
    assert t.read(prune=("name", "aaa", "ccc")).count() == 3


def test_bloom_sidecar_travels_with_clone_and_vacuum(spark, tmp_path):
    import os

    t = _bloom_table(spark, tmp_path, n_batches=2, rows=300)
    probe = t.read().filter("k = 100").first().name
    c = t.clone_to(str(tmp_path / "c"))
    assert c.bloom_columns() == {"cols": ["name"], "fpp": 0.01}
    pruned = c.read(prune=("name", probe, probe))
    assert len(pruned.inputFiles()) < len(c.read().inputFiles())
    # vacuum reclaims the sidecar with its data dir
    t.delete("k >= 0")  # rewrite: old dirs become unreferenced
    removed = t.vacuum()
    gone = [d for d in removed if "/" not in d]
    assert gone
    for d in gone:
        assert not os.path.exists(os.path.join(t.path, "_bloom", d))


def test_bloom_follows_column_rename(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_bloom_columns(["name"])
    t.append(spark.createDataFrame([(1, "aaa")], "k int, name string"))
    t.rename_column("name", "label")
    t.append(spark.createDataFrame([(2, "bbb")], "k int, label string"))
    # probe through the NEW logical name reaches both eras' blooms
    assert t.read(prune=("label", "aaa", "aaa")).filter(
        "k = 1"
    ).count() == 1
    assert t.read(prune=("label", "bbb", "bbb")).filter(
        "k = 2"
    ).count() == 1


def test_bloom_declaration_refusals(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="non-empty"):
        t.set_bloom_columns([])
    with pytest.raises(ValueError, match="fpp"):
        t.set_bloom_columns(["k"], fpp=1.5)


# -- row tracking (A43) -------------------------------------------------------


def _rids(vt):
    return {
        r["k"]: r["__row_id"]
        for r in vt.read(with_row_ids=True).collect()
    }


def test_row_tracking_ids_hidden_unique_and_stable(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_row_tracking()
    t.append(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, x double"
        )
    )
    assert t.read().columns == ["k", "x"]  # hidden by default
    ids0 = _rids(t)
    assert len(set(ids0.values())) == 3
    # COW update, MOR update, OPTIMIZE, Z-order: same ids throughout
    t.update("k = 2", {"x": "x + 5"})
    assert _rids(t) == ids0
    t.update("k = 3", {"x": "x * 2"}, mode="mor")
    assert _rids(t) == ids0
    t.optimize()
    assert _rids(t) == ids0
    t.optimize(zorder_by=("k", "x"), target_partitions=2)
    assert _rids(t) == ids0
    # appends allocate past the watermark — never reuse
    t.append(spark.createDataFrame([(9, 90.0)], "k int, x double"))
    ids1 = _rids(t)
    assert ids1[9] not in ids0.values()


def test_row_tracking_merge_inherits_and_mints(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_row_tracking()
    t.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, x double"))
    ids0 = _rids(t)
    t.merge(
        spark.createDataFrame([(2, 99.0), (4, 40.0)], "k int, x double"),
        keys=["k"],
    )
    ids1 = _rids(t)
    assert ids1[2] == ids0[2]  # matched row keeps its identity
    assert ids1[1] == ids0[1]  # untouched row untouched
    assert ids1[4] not in ids0.values()  # insert minted fresh
    assert len(set(ids1.values())) == 3
    # pure-insert merge (no key overlap) mints for every row
    t.merge(spark.createDataFrame([(7, 70.0)], "k int, x double"), keys=["k"])
    ids2 = _rids(t)
    assert len(set(ids2.values())) == 4


def test_row_tracking_feed_pairs_update_images(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_row_tracking()
    t.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, x double"))
    t.update("k = 2", {"x": "x + 1"})  # v3 (COW)
    feed = t.changes_between(2, 3).collect()
    got = sorted((r["_change_type"], r["k"], r["x"]) for r in feed)
    assert got == [
        ("update_postimage", 2, 21.0),
        ("update_preimage", 2, 20.0),
    ]
    # the pair shares one id — that IS the row's lineage
    by_type = {r["_change_type"]: r["__row_id"] for r in feed}
    assert by_type["update_preimage"] == by_type["update_postimage"]
    # MOR update pairs identically (delta fast path)
    t.update("k = 1", {"x": "x * 3"}, mode="mor")
    feed2 = t.changes_between(3, 4).collect()
    got2 = sorted((r["_change_type"], r["k"], r["x"]) for r in feed2)
    assert got2 == [
        ("update_postimage", 1, 30.0),
        ("update_preimage", 1, 10.0),
    ]
    # plain inserts/deletes keep their two-type tags
    t.append(spark.createDataFrame([(5, 50.0)], "k int, x double"))
    assert [
        r["_change_type"] for r in t.changes_between(4, 5).collect()
    ] == ["insert"]
    t.delete("k = 5")
    assert [
        r["_change_type"] for r in t.changes_between(5, 6).collect()
    ] == ["delete"]


def test_row_tracking_declaration_rules_and_carry(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1.0)], "k int, x double"))
    with pytest.raises(ValueError, match="EMPTY table"):
        t.enable_row_tracking()
    t2 = VersionedTable(spark, str(tmp_path / "t2"))
    t2.enable_row_tracking()
    with pytest.raises(ValueError, match="already enabled"):
        t2.enable_row_tracking()
    assert {"row-tracking", "identity-columns"} <= t2.writer_features()
    t2.append(spark.createDataFrame([(1, 1.0)], "k int, x double"))
    # a frame smuggling the hidden column refuses (GENERATED ALWAYS)
    with pytest.raises(ValueError, match="IDENTITY"):
        t2.append(
            spark.createDataFrame(
                [(2, 2.0, 1)], "k int, x double, __row_id long"
            )
        )
    c = t2.clone_to(str(tmp_path / "c"))
    assert c.row_tracking()
    before = _rids(t2)
    c.append(spark.createDataFrame([(3, 3.0)], "k int, x double"))
    after = _rids(c)
    assert set(before.items()) <= set(after.items())  # ids carried
    assert len(set(after.values())) == 2  # watermark carried: no reuse


def test_generated_column_rejects_nondeterministic_expression(spark, tmp_path):
    """Generation expressions must be deterministic (Delta's rule):
    UPDATE recomputes every generated column during a COW rewrite, so a
    rand()/current_timestamp() expression would silently change
    untouched rows. Declaration refuses; deterministic forms (and
    columns merely NAMED like the functions) still pass."""
    import pytest as _pytest

    from daas_apps_spark.sources.table_format import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "nondet"))
    vt.append(spark.createDataFrame([(1, 5)], "k long, now int"))
    for expr in [
        "k + rand()",
        "uuid()",
        "current_timestamp",
        "CURRENT_DATE",
        "unix_timestamp()",
        "cast(now() as string)",
        "monotonically_increasing_id()",
    ]:
        with _pytest.raises(ValueError, match="nondeterministic"):
            vt.set_generated_column("g", expr)
    assert vt.generated_columns() == {}
    # a column literally named "now" is data, not a call — legal
    vt.set_generated_column("g", "now * 2")
    # unix_timestamp WITH an argument is deterministic — legal
    vt.set_generated_column("h", "unix_timestamp(timestamp'2024-01-01')")
    assert set(vt.generated_columns()) == {"g", "h"}


def test_manifest_scale_many_tiny_files(spark, tmp_path):
    """The file-count axis SCALING_CURVE's row-count decades never
    exercise — and the one Delta deployments actually fear: a table of
    ~10k tiny files (big manifest, negligible data). Manifest-only
    aggregates, checkpoint+sidecar replay, pruning selection, and
    stream planning must stay fast and DATA-READ-FREE at this file
    count (chmod-unreadable data dirs pin the zero-open claim; the
    wall-clock bounds have ~30x headroom over measured-on-idle, so
    they catch an O(files)-data-opens regression, not machine noise).
    Override SPARK_GRAFT_SCALE_FILES to push further (100k verified
    manually)."""
    import time as _time

    from daas_apps_spark.sources.table_format import change_plan_between

    n = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "10000"))
    rows = 4 * n
    vt = VersionedTable(spark, str(tmp_path / "many"))
    # range partitioning over dense ints: every one of the n partitions
    # gets ~4 rows, so ~n FILES land (hash partitioning would leave
    # e^-4 of them empty and fileless)
    vt.append(
        spark.range(rows)
        .selectExpr("id AS k", "CAST(id AS DOUBLE) AS x")
        .repartitionByRange(n, "k")
    )
    head = vt.latest_version()
    vt._write_checkpoint(head)  # >= sidecar threshold: parquet manifest
    assert os.path.isfile(
        os.path.join(
            vt.path, "_log", f"{head:08d}.checkpoint.manifest.parquet"
        )
    )
    data = os.path.join(vt.path, "data")
    dirs = [os.path.join(data, d) for d in os.listdir(data)]
    for d in dirs:
        os.chmod(d, 0)
    try:
        t0 = _time.perf_counter()
        assert vt.manifest_count() == rows
        assert vt.manifest_min_max("k") == (0, rows - 1)
        manifest_s = _time.perf_counter() - t0
        # fresh instance: replays through the checkpoint + sidecar, no
        # warm in-process state
        t0 = _time.perf_counter()
        cold = VersionedTable(spark, vt.path)
        assert cold.manifest_count() == rows
        cold_s = _time.perf_counter() - t0
        # stream planning: unit-granular plan over the 10k-file commit,
        # built from the manifest alone
        t0 = _time.perf_counter()
        plan, v_to = change_plan_between(vt.path, 0, head)
        plan_s = _time.perf_counter() - t0
        assert v_to == head and len(plan) >= 0.9 * n
        # prune SELECTION (which files survive) is manifest arithmetic
        t0 = _time.perf_counter()
        pruned = vt.read(prune=("k", 100, 110))
        prune_s = _time.perf_counter() - t0
    finally:
        for d in dirs:
            os.chmod(d, 0o755)
    assert manifest_s < 2.5, f"manifest aggregates took {manifest_s:.2f}s"
    assert cold_s < 5.0, f"cold checkpoint replay took {cold_s:.2f}s"
    assert plan_s < 5.0, f"stream planning took {plan_s:.2f}s"
    assert prune_s < 10.0, f"prune planning took {prune_s:.2f}s"
    # executing the pruned scan opens only the intersecting files
    assert pruned.filter("k BETWEEN 100 AND 110").count() == 11


def test_commit_metadata_is_metadata_only(spark, tmp_path):
    # r11 optimization surface: a metadata-only commit bumps the version
    # and records its payload WITHOUT touching data files — no new data
    # dir, snapshot unchanged, and the change feed (data_change=False)
    # surfaces no rows for it.
    from daas_apps_spark.sources.table_format import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.append(spark.range(5).selectExpr("id AS k", "id * 2 AS v"))
    v1 = vt.latest_version()
    dirs_before = sorted(os.listdir(tmp_path / "t" / "data"))
    v2 = vt.commit_metadata({"watermark": {"src": 7}})
    assert v2 == v1 + 1
    assert sorted(os.listdir(tmp_path / "t" / "data")) == dirs_before
    assert vt.read().count() == 5
    entry = [c for c in vt.history() if c["version"] == v2][0]
    assert entry["metadata"] == {"watermark": {"src": 7}}
    assert entry.get("data_change", True) is False
    assert vt.changes_between(v1, v2).count() == 0
