"""COPY INTO (A46): idempotent batch file ingestion, exactly-once by
file identity (path + size + mtime) recorded in commit metadata and
folded into checkpoints."""

from __future__ import annotations

import glob
import json
import os

import pytest

from daas_apps_spark.sources.sql_dml import run_sql
from daas_apps_spark.sources.table_format import (
    CHECKPOINT_EVERY,
    CommitConflictError,
    VersionedTable,
)


@pytest.fixture()
def landing(spark, tmp_path):
    src = str(tmp_path / "landing")
    spark.createDataFrame(
        [(i, float(i)) for i in range(300)], "k long, x double"
    ).repartition(3).write.parquet(src)
    return src


def _files(src):
    return sorted(glob.glob(src + "/*.parquet"))


def test_double_copy_is_a_noop(spark, tmp_path, landing):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    r1 = vt.copy_into(landing)
    assert r1["num_loaded_files"] == 3 and r1["num_skipped_files"] == 0
    r2 = vt.copy_into(landing)
    assert r2["num_loaded_files"] == 0 and r2["num_skipped_files"] == 3
    assert r2["version"] == r1["version"]  # no second commit
    assert vt.manifest_count() == 300
    # only the new arrival loads on the third run
    spark.createDataFrame([(1000, 1.0)], "k long, x double").coalesce(
        1
    ).write.mode("append").parquet(landing)
    r3 = vt.copy_into(landing)
    assert r3["num_loaded_files"] == 1 and r3["num_skipped_files"] == 3
    assert vt.manifest_count() == 301


def test_crash_before_commit_then_rerun_is_exactly_once(
    spark, tmp_path, landing
):
    """A crash anywhere before the single commit records nothing: the
    re-run does the full work once — no duplicates, no lost files."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    orig = vt._commit
    vt._commit = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("injected crash before commit")
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        vt.copy_into(landing)
    vt._commit = orig
    assert vt.latest_version() == 0  # nothing visible
    r = vt.copy_into(landing)
    assert r["num_loaded_files"] == 3
    assert vt.manifest_count() == 300


def test_loaded_registry_survives_checkpoint_retention(
    spark, tmp_path, landing
):
    """The loaded-file registry folds into checkpoints: after log
    retention drops the COPY's commit file, a re-run still skips."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.copy_into(landing)
    while vt.latest_version() < CHECKPOINT_EVERY:
        vt.append(
            spark.createDataFrame([(9_999, 0.0)], "k long, x double")
        )
    log = os.path.join(vt.path, "_log")
    for n in sorted(os.listdir(log)):
        if n.endswith(".json") and ".checkpoint." not in n:
            os.unlink(os.path.join(log, n))
    r = vt.copy_into(landing)
    assert r["num_loaded_files"] == 0 and r["num_skipped_files"] == 3


def test_registry_travels_with_clones(spark, tmp_path, landing):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.copy_into(landing)
    fork = vt.clone_to(str(tmp_path / "fork"))
    r = fork.copy_into(landing)
    assert r["num_loaded_files"] == 0 and r["num_skipped_files"] == 3


def test_changed_file_refuses_force_reloads(spark, tmp_path, landing):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.copy_into(landing)
    p = _files(landing)[0]
    os.utime(p, ns=(1, 1))  # identity changed
    with pytest.raises(ValueError, match="changed since"):
        vt.copy_into(landing)
    r = vt.copy_into(p, force=True)
    assert r["num_loaded_files"] == 1
    # the new identity is now the recorded one: re-run skips again
    r2 = vt.copy_into(landing)
    assert r2["num_loaded_files"] == 0 and r2["num_skipped_files"] == 3


def test_concurrent_overlapping_copies_land_exactly_once(
    spark, tmp_path, landing
):
    """Two writers COPYing overlapping files: the conflict matrix makes
    the loser replan, and its files then skip as already loaded."""
    a = VersionedTable(spark, str(tmp_path / "t"))
    b = VersionedTable(spark, str(tmp_path / "t"))
    orig = a._write_data_dir
    fired = {"n": 0}

    def wrapper(*args, **kwargs):
        if not fired["n"]:
            fired["n"] = 1
            b.copy_into(landing)  # lands between a's plan and commit
        return orig(*args, **kwargs)

    a._write_data_dir = wrapper
    r = a.copy_into(landing)
    # a replanned: every file was already ingested by b
    assert r["num_loaded_files"] == 0 and r["num_skipped_files"] == 3
    assert a.manifest_count() == 300  # exactly once


def test_conflict_guard_raises_without_the_retry_loop(
    spark, tmp_path, landing
):
    """The raw append path (no replanning loop) must refuse a commit
    whose copy_into_add overlaps a concurrent one."""
    a = VersionedTable(spark, str(tmp_path / "t"))
    rv = a.latest_version()
    b = VersionedTable(spark, str(tmp_path / "t"))
    b.copy_into(landing)
    ident = dict(b.copied_files())
    df = spark.createDataFrame([(1, 1.0)], "k long, x double")
    rel = a._write_data_dir(df, 99)
    with pytest.raises(CommitConflictError, match="COPY INTO"):
        a._commit(
            "append",
            add=[rel],
            remove=[],
            metadata={"copy_into_add": ident},
            read_version=rv,
        )


def test_sql_verb_and_csv_options(spark, tmp_path, landing):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    t = {"t": vt}
    r = run_sql(
        spark, f"COPY INTO t FROM '{landing}' FILEFORMAT = PARQUET", t
    ).first()
    assert (r.num_loaded_files, r.num_skipped_files) == (3, 0)
    csvdir = tmp_path / "csv"
    csvdir.mkdir()
    (csvdir / "a.csv").write_text("k|x\n5000|9.5\n")
    r = run_sql(
        spark,
        f"COPY INTO t FROM '{csvdir}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS ('header' = 'true', 'sep' = '|')",
        t,
    ).first()
    assert r.num_loaded_files == 1
    got = {x.k for x in vt.read().collect()}
    assert 5000 in got and len(got) == 301
    # the funnel applies: constraints validate COPY'd rows too
    vt.add_constraint("k_bounds", "k < 6000")
    (csvdir / "b.csv").write_text("k|x\n7000|1.0\n")
    with pytest.raises(Exception, match="k_bounds|constraint"):
        run_sql(
            spark,
            f"COPY INTO t FROM '{csvdir}' FILEFORMAT = CSV "
            "FORMAT_OPTIONS ('header' = 'true', 'sep' = '|')",
            t,
        )
    with pytest.raises(ValueError, match="unsupported COPY"):
        run_sql(spark, "COPY INTO t FROM landing", t)
    with pytest.raises(ValueError, match="FILEFORMAT"):
        run_sql(spark, f"COPY INTO t FROM '{landing}' FILEFORMAT = avro", t)


def test_missing_source_is_an_idempotent_noop(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.append(spark.createDataFrame([(1, 1.0)], "k long, x double"))
    r = vt.copy_into(str(tmp_path / "nowhere"))
    assert r["num_loaded_files"] == 0 and r["num_skipped_files"] == 0
    assert vt.manifest_count() == 1


def test_identity_recorded_in_commit_metadata(spark, tmp_path, landing):
    """The commit itself carries the identities (auditable lineage)."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.copy_into(landing)
    with open(
        os.path.join(vt.path, "_log", f"{vt.latest_version():08d}.json")
    ) as f:
        md = json.load(f)["metadata"]
    assert sorted(md["copy_into_add"]) == [
        os.path.abspath(p) for p in _files(landing)
    ]


def test_glob_skips_marker_files_like_directory_source(spark, tmp_path):
    """'<dir>/*' and '<dir>' must ingest the same files: Spark marker
    sidecars (_SUCCESS, .crc, _started…) are skipped by BOTH branches
    (the round-10 glob-parity fix — before it, a glob matched _SUCCESS
    and failed the load or ingested junk)."""
    import os

    land = tmp_path / "landing"
    os.makedirs(land)
    spark.range(5).toDF("k").coalesce(1).write.parquet(str(land / "part"))
    # flatten: move the real parquet up, plant marker junk beside it
    real = [
        n for n in os.listdir(land / "part") if n.endswith(".parquet")
    ][0]
    os.rename(land / "part" / real, land / "rows.parquet")
    for junk in ("_SUCCESS", ".hidden.crc", "_started_123"):
        with open(land / junk, "w") as f:
            f.write("x")
    vt_glob = VersionedTable(spark, str(tmp_path / "tg"))
    out = vt_glob.copy_into(str(land / "*"))
    assert out["num_loaded_files"] == 1
    assert vt_glob.read().count() == 5
    vt_dir = VersionedTable(spark, str(tmp_path / "td"))
    out2 = vt_dir.copy_into(str(land))
    assert out2["num_loaded_files"] == 1
    assert vt_dir.read().count() == 5
