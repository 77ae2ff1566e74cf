"""Snapshot-isolation conflict matrix (A39).

The CAS in ``_publish_commit`` only catches two writers racing for the
SAME version number. These tests pin the other half of optimistic
concurrency: a commit whose version minting silently skipped PAST a
concurrent writer's commit (plan at v, concurrent commit lands v+1, our
commit mints v+2) must either rebase safely (blind appends, disjoint
compactions) or raise a retriable ``CommitConflictError`` so
``retry_on_conflict`` replans — never silently erase or resurrect the
concurrent writer's rows (Delta's conflict-resolution matrix).

Interleavings are injected deterministically: a second VersionedTable
instance on the same path commits inside a method the victim's
operation calls AFTER its plan read the log but BEFORE its _commit.
"""

from __future__ import annotations

import pytest

from daas_apps_spark.sources.table_format import (
    CommitConflictError,
    VersionedTable,
    retry_on_conflict,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v int")


def _race_once(victim, method: str, fire):
    """Wrap ``victim.<method>`` so ``fire()`` runs once before the first
    call — after the victim's plan read the log, before its commit."""
    orig = getattr(victim, method)
    state = {"fired": 0}

    def wrapper(*args, **kwargs):
        if not state["fired"]:
            state["fired"] = 1
            fire()
        return orig(*args, **kwargs)

    setattr(victim, method, wrapper)
    return state


def test_cow_delete_conflicts_with_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10), (2, 20)]))
    state = _race_once(
        victim,
        "_write_data_dir",
        lambda: other.append(_df(spark, [(3, 5)])),
    )
    with pytest.raises(CommitConflictError, match="snapshot changed"):
        victim.delete("v < 10")
    assert state["fired"] == 1
    # the failed delete committed NOTHING: both writers' rows intact,
    # including the raced-in row the stale plan never saw
    assert sorted(r.k for r in victim.read().collect()) == [1, 2, 3]


def test_retry_on_conflict_replans_and_serializes(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10), (2, 3)]))
    _race_once(
        victim,
        "_write_data_dir",
        lambda: other.append(_df(spark, [(3, 5), (4, 40)])),
    )
    attempts = {"n": 0}

    def op():
        attempts["n"] += 1
        return victim.delete("v < 10")

    retry_on_conflict(op)
    # attempt 1 planned at v1 and conflicted; attempt 2 replanned at v2,
    # so the predicate applied to the raced-in rows too — the
    # serializable outcome (delete ran atomically after the append)
    assert attempts["n"] == 2
    assert sorted(r.k for r in victim.read().collect()) == [1, 4]


def test_blind_append_rebases_past_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10)]))
    state = _race_once(
        victim,
        "_write_data_dir",
        lambda: other.append(_df(spark, [(2, 20)])),
    )
    victim.append(_df(spark, [(3, 30)]))  # no conflict: new files only
    assert state["fired"] == 1
    assert sorted(r.k for r in victim.read().collect()) == [1, 2, 3]


def test_blind_append_conflicts_with_concurrent_add_constraint(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10)]))
    _race_once(
        victim,
        "_write_data_dir",
        lambda: other.add_constraint("v_pos", "v > 0"),
    )
    # the victim's batch violates the constraint that landed mid-flight;
    # its plan never validated against it, so the commit must NOT land
    with pytest.raises(CommitConflictError, match="snapshot changed"):
        victim.append(_df(spark, [(2, -1)]))
    assert sorted(r.k for r in victim.read().collect()) == [1]
    # the retried (replanned) append now validates — and fails loudly
    # on the constraint itself, not on the conflict
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
    )

    with pytest.raises(ConstraintViolationError):
        retry_on_conflict(lambda: victim.append(_df(spark, [(2, -1)])))


def test_add_constraint_conflicts_with_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10)]))
    _race_once(
        victim,
        "_validate",
        lambda: other.append(_df(spark, [(2, -5)])),
    )
    # rows landed after the validation scan — they were never checked
    with pytest.raises(CommitConflictError, match="never checked"):
        victim.add_constraint("v_pos", "v > 0")
    assert victim.constraints() == {}


def test_optimize_rebases_past_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10)]))
    victim.append(_df(spark, [(2, 20)]))
    state = _race_once(
        victim,
        "_write_data_dir",
        lambda: other.append(_df(spark, [(3, 30)])),
    )
    v = victim.optimize()  # concurrent ingest must never abort compaction
    assert state["fired"] == 1
    assert sorted(r.k for r in victim.read().collect()) == [1, 2, 3]
    # the raced-in dir survived the rewrite: the compaction removed only
    # the dirs it read, and the appended dir stayed live beside it
    assert sorted(r.k for r in victim.read(version=v).collect()) == [1, 2, 3]


def test_optimize_conflicts_with_concurrent_cow_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10)]))
    victim.append(_df(spark, [(2, 20)]))
    _race_once(
        victim,
        "_write_data_dir",
        lambda: other.delete("k = 1"),
    )
    # the delete retired the dirs this compaction also retires —
    # carrying on would resurrect the deleted row from the rewrite
    with pytest.raises(CommitConflictError, match="also retires"):
        victim.optimize()
    assert sorted(r.k for r in victim.read().collect()) == [2]


def test_optimize_conflicts_with_concurrent_mor_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10)]))
    victim.append(_df(spark, [(2, 20)]))
    _race_once(
        victim,
        "_write_data_dir",
        lambda: other.delete("k = 1", mode="mor"),
    )
    # the concurrent vector references a file this rewrite replaces;
    # landing the rewrite would resurrect the deleted row
    with pytest.raises(CommitConflictError, match="deletion vectors"):
        victim.optimize()
    assert sorted(r.k for r in victim.read().collect()) == [2]
    # replanned compaction applies the vector physically and lands
    retry_on_conflict(victim.optimize)
    assert sorted(r.k for r in victim.read().collect()) == [2]


def test_mor_delete_conflicts_with_concurrent_optimize(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10)]))
    victim.append(_df(spark, [(2, 3)]))
    _race_once(
        victim,
        "_write_dv_dir",
        lambda: other.optimize(),
    )
    # the vector's (file, pos) pairs reference pre-compaction basenames
    # that just left the live set — landing it would silently no-op
    with pytest.raises(CommitConflictError, match="snapshot changed"):
        victim.delete("v < 10", mode="mor")
    assert sorted(r.k for r in victim.read().collect()) == [1, 2]
    retry_on_conflict(lambda: victim.delete("v < 10", mode="mor"))
    assert sorted(r.k for r in victim.read().collect()) == [1]


def test_merge_conflicts_with_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10), (2, 20)]))
    _race_once(
        victim,
        "_write_data_dir",
        lambda: other.append(_df(spark, [(2, 99)])),
    )
    # the raced-in row duplicates a merge key the stale plan already
    # resolved — landing it would leave two rows for k=2
    with pytest.raises(CommitConflictError, match="snapshot changed"):
        victim.merge(_df(spark, [(2, 21)]), keys=["k"])
    retry_on_conflict(lambda: victim.merge(_df(spark, [(2, 21)]), keys=["k"]))
    rows = {r.k: r.v for r in victim.read().collect()}
    assert rows == {1: 10, 2: 21}


def test_benign_metadata_does_not_conflict(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10), (2, 3)]))
    state = _race_once(
        victim,
        "_write_data_dir",
        lambda: other.set_ref("before_delete"),
    )
    victim.delete("v < 10")  # a concurrent tag invalidates nothing
    assert state["fired"] == 1
    assert sorted(r.k for r in victim.read().collect()) == [1]
    assert "before_delete" in other.refs()


def test_write_invalidating_metadata_conflicts_with_everything(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10), (2, 3)]))
    _race_once(
        victim,
        "_write_data_dir",
        lambda: other.widen_column("v", "bigint"),
    )
    # a type change landed after the plan resolved the schema — the
    # conflict matrix replans rather than reasoning about era mixes
    with pytest.raises(CommitConflictError, match="snapshot changed"):
        victim.delete("v < 10")
    retry_on_conflict(lambda: victim.delete("v < 10"))
    assert sorted(r.k for r in victim.read().collect()) == [1]


def test_concurrent_rename_refuses_at_the_write_funnel(spark, tmp_path):
    # a rename landing mid-flight is caught EARLIER than the conflict
    # matrix: the write funnel refuses the stale physical name outright
    # (a loud, if non-retriable, failure — never a silent split schema)
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10), (2, 3)]))
    _race_once(
        victim,
        "_write_data_dir",
        lambda: other.rename_column("v", "val"),
    )
    with pytest.raises(ValueError, match="old PHYSICAL name"):
        victim.delete("v < 10")
    assert sorted(r.k for r in victim.read().collect()) == [1, 2]


def test_update_conflicts_with_concurrent_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10), (2, 20)]))
    _race_once(
        victim,
        "_write_data_dir",
        lambda: other.delete("k = 2"),
    )
    # the stale rewrite still contains k=2 — landing it would resurrect
    # the row the concurrent delete just removed
    with pytest.raises(CommitConflictError, match="snapshot changed"):
        victim.update("k = 1", {"v": "v + 1"})
    assert sorted(r.k for r in victim.read().collect()) == [1]
    retry_on_conflict(lambda: victim.update("k = 1", {"v": "v + 1"}))
    rows = {r.k: r.v for r in victim.read().collect()}
    assert rows == {1: 11}


def test_identity_allocation_conflicts_between_concurrent_appends(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.set_identity_column("rid")
    _race_once(
        victim,
        "_write_data_dir",
        lambda: other.append(_df(spark, [(1, 10)])),
    )
    # both writers allocated ids from the same watermark — an ordinary
    # blind append would rebase, but overlapping id ranges must replan
    with pytest.raises(CommitConflictError, match="identity"):
        victim.append(_df(spark, [(2, 20)]))
    retry_on_conflict(lambda: victim.append(_df(spark, [(2, 20)])))
    rids = [r.rid for r in victim.read().collect()]
    assert len(rids) == 2 and len(set(rids)) == 2


def test_real_concurrent_appends_all_land_exactly_once(spark, tmp_path):
    """True thread-level races (not injected interleavings): N writers
    append concurrently through retry_on_conflict. Every batch must land
    exactly once — the CAS serializes version minting, and rebased blind
    appends must never drop or duplicate a concurrent batch."""
    import threading

    path = str(tmp_path / "t")
    VersionedTable(spark, path).append(_df(spark, [(0, 0)]))
    n = 8
    errors = []

    def worker(i):
        try:
            vt = VersionedTable(spark, path)
            retry_on_conflict(
                lambda: vt.append(_df(spark, [(i + 1, (i + 1) * 10)])),
                attempts=30,
            )
        except Exception as e:  # noqa: BLE001 — surface in main thread
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    vt = VersionedTable(spark, path)
    assert sorted(r.k for r in vt.read().collect()) == list(range(n + 1))
    assert vt.latest_version() == n + 1  # one commit per batch, no holes


def test_real_concurrent_identity_appends_stay_unique(spark, tmp_path):
    """Thread-level identity allocation: every writer races the same
    watermark; the conflict matrix forces losers to replan, so the final
    id set must be duplicate-free."""
    import threading

    path = str(tmp_path / "t")
    VersionedTable(spark, path).set_identity_column("rid")
    errors = []

    def worker(i):
        try:
            vt = VersionedTable(spark, path)
            retry_on_conflict(
                lambda: vt.append(_df(spark, [(i, i), (i + 100, i)])),
                attempts=30,
            )
        except Exception as e:  # noqa: BLE001
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    vt = VersionedTable(spark, path)
    rids = [r.rid for r in vt.read().collect()]
    assert len(rids) == 12 and len(set(rids)) == 12


def test_concurrent_widens_conflict_instead_of_last_writer_wins(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10)]))
    _race_once(
        victim,
        "column_mapping",
        lambda: other.widen_column("v", "bigint"),
    )
    # the victim's whole-map rewrite was bootstrapped from a stale read
    # — landing it would silently erase the concurrent widen
    with pytest.raises(CommitConflictError, match="snapshot changed"):
        victim.widen_column("k", "bigint")
    assert victim.type_widening() == {"v": "bigint"}
    retry_on_conflict(lambda: victim.widen_column("k", "bigint"))
    assert victim.type_widening() == {"k": "bigint", "v": "bigint"}


def test_concurrent_renames_conflict_instead_of_reverting(spark, tmp_path):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10)]))
    _race_once(
        victim,
        "column_mapping",
        lambda: other.rename_column("v", "val"),
    )
    with pytest.raises(CommitConflictError, match="snapshot changed"):
        victim.rename_column("k", "key")
    # the concurrent rename survived; the victim's never landed
    assert sorted(victim.read().columns) == ["k", "val"]
    retry_on_conflict(lambda: victim.rename_column("k", "key"))
    assert sorted(victim.read().columns) == ["key", "val"]


def test_zorder_optimize_rebases_without_erasing_concurrent_append(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    victim = VersionedTable(spark, path)
    other = VersionedTable(spark, path)
    victim.append(_df(spark, [(1, 10), (2, 20)]))
    victim.append(_df(spark, [(3, 30)]))
    # the append lands DURING the Z-order write job: the rewrite's
    # remove list is pinned to the plan snapshot, so the raced-in dir
    # must survive beside the clustered rewrite
    state = _race_once(
        victim,
        "_to_physical",
        lambda: other.append(_df(spark, [(9, 90)])),
    )
    victim.optimize(zorder_by=("k", "v"), target_partitions=2)
    assert state["fired"] == 1
    assert sorted(r.k for r in victim.read().collect()) == [1, 2, 3, 9]


def test_conflict_window_past_retention_floor_refuses(spark, tmp_path):
    """A writer whose read_version predates the log-retention floor
    cannot verify the conflict window (retention dropped the commit
    files a checkpoint covers) — the matrix must refuse conservatively
    (retriable), never scan the incomplete window and commit past an
    unseen conflict."""
    import os

    from daas_apps_spark.sources.table_format import CHECKPOINT_EVERY

    vt = VersionedTable(spark, str(tmp_path / "floor"))
    for i in range(CHECKPOINT_EVERY):
        vt.append(_df(spark, [(i, i)]))
    ck = vt.latest_version()
    # retention: drop every commit file at-or-before the checkpoint
    log = str(tmp_path / "floor" / "_log")
    for n in sorted(os.listdir(log)):
        if n.endswith(".json") and ".checkpoint." not in n:
            if int(n.split(".")[0]) <= ck:
                os.unlink(os.path.join(log, n))
    # a stale plan (read_version below the floor) cannot be verified
    with pytest.raises(CommitConflictError, match="retention"):
        vt._commit("delete", add=[], remove=[], read_version=1)
    # a fresh plan (read_version == latest) commits normally
    vt.delete("k = 0")
    assert vt.latest_version() == ck + 1


def test_txn_status_cache_survives_coordinator_recreation(spark, tmp_path):
    """A coordinator directory deleted and recreated at the same path
    (a reset deployment / reused fixture path) must NOT serve the old
    incarnation's cached terminal verdicts — the cache keys on
    directory identity, not the path string."""
    import shutil

    from daas_apps_spark.sources.table_format import MultiTableTxn

    coord = str(tmp_path / "coord")
    c1 = MultiTableTxn(coord)
    txn = c1.begin()
    c1.commit(txn)
    assert c1.status(txn) == "committed"  # cached terminal verdict
    shutil.rmtree(coord)
    c2 = MultiTableTxn(coord)  # same path, new incarnation
    assert c2.status(txn["id"]) == "pending"  # no stale alias


def test_txn_status_cache_is_bounded(spark, tmp_path):
    """The terminal-status cache is a bounded FIFO: resolving far more
    txns than the cap leaves the cache at the cap (evictions just
    re-stat two files), never an unbounded driver-lifetime leak."""
    import daas_apps_spark.sources.table_format as tf

    coord = tf.MultiTableTxn(str(tmp_path / "bound"))
    old_cap = tf._TXN_STATUS_CACHE_CAP
    tf._TXN_STATUS_CACHE_CAP = 8
    try:
        tf._TXN_STATUS_CACHE.clear()
        for _ in range(30):
            t = coord.begin()
            coord.commit(t)
            assert coord.status(t) == "committed"
        assert len(tf._TXN_STATUS_CACHE) <= 8
        # evicted entries still resolve correctly from disk
        assert coord.status(t) == "committed"
    finally:
        tf._TXN_STATUS_CACHE_CAP = old_cap


def test_txn_gc_bounds_markers_and_preserves_visibility(spark, tmp_path):
    """MultiTableTxn.gc folds resolved verdicts into the coordinator
    checkpoint: the directory stays bounded by in-flight txns, and a
    folded-committed txn's staged commits remain visible (a folded-
    aborted one's stay invisible) through log replay alone."""
    import os

    import daas_apps_spark.sources.table_format as tf

    base = tmp_path / "gc"
    coord = tf.MultiTableTxn(str(base / "coord"))
    va = VersionedTable(spark, str(base / "a"))
    vb = VersionedTable(spark, str(base / "b"))
    df = _df(spark, [(1, 1), (2, 2)])
    good = coord.begin()
    va.append(df, txn=good)
    vb.append(df, txn=good)
    coord.commit(good)
    dead = coord.begin()
    va.append(df, txn=dead)
    coord.abort(dead)
    for _ in range(10):  # lifetime throughput the dir must NOT retain
        t = coord.begin()
        coord.commit(t)
    inflight = coord.begin()  # still pending: must survive gc
    res = coord.gc()
    assert res["folded"] == 12 and res["pending_markers"] == 1
    names = set(os.listdir(coord.path))
    markers = [n for n in names if n.endswith(".json") and n != "_checkpoint.json"]
    assert markers == [f"{inflight['id']}.begin.json"]
    # visibility through a FRESH process-state path (cache cleared,
    # pure-filesystem read_log): folded verdicts must still resolve
    tf._TXN_STATUS_CACHE.clear()
    assert coord.status(good) == "committed"
    assert coord.status(dead) == "aborted"
    assert coord.status(inflight) == "pending"
    assert VersionedTable(spark, str(base / "a")).manifest_count() == 2
    assert VersionedTable(spark, str(base / "b")).manifest_count() == 2
    log = tf.read_log(str(base / "a"))
    aborted_entry = [e for e in log if e.get("txn", {}).get("id") == dead["id"]]
    assert aborted_entry and not aborted_entry[0]["add"]  # stays neutered
    # abort_abandoned now lists only the in-flight marker
    assert coord.abort_abandoned() == [inflight["id"]]
    # a second gc folds the newly-aborted one too; idempotent after
    coord.gc()
    assert coord.gc()["folded"] == 0


def test_txn_gc_crash_between_checkpoint_and_unlink(spark, tmp_path):
    """Crash ordering: checkpoint replaced first, markers unlinked
    after — if both exist they agree, and the next gc finishes."""
    import json
    import os

    import daas_apps_spark.sources.table_format as tf

    coord = tf.MultiTableTxn(str(tmp_path / "coord"))
    t = coord.begin()
    coord.commit(t)
    coord.gc()
    # simulate the torn state: marker re-created AFTER the fold (as a
    # crash between checkpoint write and unlink would leave it)
    coord._publish(f"{t['id']}.committed.json")
    tf._TXN_STATUS_CACHE.clear()
    assert coord.status(t) == "committed"  # both records agree
    coord.gc()  # finishes the unlink
    assert not os.path.exists(
        os.path.join(coord.path, f"{t['id']}.committed.json")
    )
    ck = json.load(open(os.path.join(coord.path, "_checkpoint.json")))
    assert t["id"] in ck["committed"]


def test_committed_wins_over_stale_aborted_marker_after_gc(spark, tmp_path):
    """The round-10 committed-wins ordering fix: after gc folds a
    COMMITTED verdict (its marker unlinked, verdict in the checkpoint),
    a stale .aborted.json published by a crashed/racing abort() must
    NOT flip the txn — both committed records are consulted before any
    aborted record, and the staged commits stay visible."""
    import json
    import os

    import daas_apps_spark.sources.table_format as tf

    base = tmp_path / "cw"
    coord = tf.MultiTableTxn(str(base / "coord"))
    vt = VersionedTable(spark, str(base / "t"))
    txn = coord.begin()
    vt.append(_df(spark, [(1, 1)]), txn=txn)
    coord.commit(txn)
    coord.gc()  # committed marker folded away
    # a zombie abort() writes its marker directly (the public abort()
    # would refuse — this is the crashed-writer race the fix covers)
    with open(
        os.path.join(coord.path, f"{txn['id']}.aborted.json"), "w"
    ) as f:
        json.dump({"ts": 0}, f)
    tf._TXN_STATUS_CACHE.clear()
    assert coord.status(txn) == "committed"
    assert vt.read().count() == 1  # staged commit still visible
    # and the next gc folds the stale marker away under committed-wins
    coord.gc()
    tf._TXN_STATUS_CACHE.clear()
    assert coord.status(txn) == "committed"


def test_gc_serializes_via_lock(tmp_path):
    """A concurrent gc (simulated by a held lock file) SKIPS instead of
    interleaving read-modify-write on the checkpoint; a stale crashed
    lock is broken."""
    import os
    import time

    import daas_apps_spark.sources.table_format as tf

    coord = tf.MultiTableTxn(str(tmp_path / "coord"))
    t = coord.begin()
    coord.commit(t)
    lock = os.path.join(coord.path, ".gc.lock")
    with open(lock, "w") as f:
        f.write("held")
    out = coord.gc()
    assert out["folded"] == 0 and "skipped" in out
    assert coord.status(t) == "committed"  # nothing was dropped
    # stale lock (crashed gc): broken and the fold proceeds
    os.utime(lock, (time.time() - 600, time.time() - 600))
    out = coord.gc()
    assert out["folded"] == 1
    assert not os.path.exists(lock)
    assert coord.status(t) == "committed"
