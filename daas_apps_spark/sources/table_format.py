"""Minimal versioned table format: Delta/Iceberg-style commit log on parquet.

The A21 dynamic-partition-overwrite surface stops where concurrent writers
and time travel begin — the jump SCALING.md names to a TABLE FORMAT: data
files are immutable parquet, and table STATE is a numbered chain of JSON
commit files, each recording the data directories it adds and removes. A
reader resolves a snapshot by replaying the log to a version; a writer
never mutates data in place, only appends a new commit. That single
discipline buys atomic overwrite, upsert (MERGE as copy-on-write), time
travel, and crash safety (a torn write leaves an orphan data dir that no
commit references — invisible to readers).

Layout:
    <table>/_log/00000001.json   {"version","operation","add":[...],"remove":[...]}
    <table>/_log/00000002.json
    <table>/data/v1-<uuid>/part-*.parquet     (immutable, one dir per commit)

Commit atomicity here is `os.rename` of a tmp file into the log — the
single-writer filesystem contract. A multi-writer deployment swaps exactly
that one primitive for a compare-and-swap commit service (what Delta's
LogStore / Iceberg's catalog provide); everything else is unchanged. Reads
scale because a snapshot is just a list of parquet directories handed to
``spark.read.parquet`` — partition pruning, pushdown, and scan parallelism
all apply per normal.

MERGE is FILE-LEVEL copy-on-write: the commit-recorded per-dir key
[min, max] stats bound which live dirs can hold a matched key, and only
those are rewritten (snapshot-slice ⟕ updates via anti-join + union) into
one new dir; range-disjoint dirs survive the commit untouched. Same log
schema as a full rewrite, smaller `remove` sets — at 100 TB a 1-row MERGE
rewrites one file's worth of data, not the table.

DELETE additionally has a MERGE-ON-READ path (``delete(cond,
mode="mor")``): instead of rewriting any data file, the commit adds a
DELETION VECTOR — a tiny parquet of (file basename, row position) pairs
under ``<table>/_dv/`` — and every snapshot read anti-joins it against
the scan's ``_metadata.file_name``/``row_index``. Delta's deletion
vectors / Iceberg's position deletes, reduced to one broadcast anti-join:
at 100 TB, deleting 3 rows from a 1 GB file writes KILOBYTES, not the
gigabyte COW would. Vector keys are file BASENAMES (globally unique per
write — Spark part files embed a job UUID), so hard-link carries and
shallow clones keep vectors valid without rewriting them. OPTIMIZE (a
full rewrite) PURGES: it applies outstanding vectors physically and drops
them from table state.
"""

from __future__ import annotations

import json
import os
import time as _time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"
_DV = "_dv"  # deletion-vector dirs (merge-on-read position deletes)
_BLOOM = "_bloom"  # per-file bloom-index sidecars (equality file skipping)
_ROWID = "__row_id"  # hidden stable row id (row tracking, A43)
CHECKPOINT_EVERY = 10  # write a log checkpoint every N commits
# Checkpoints whose live set reaches this many FILES externalize the
# per-file stats/sizes maps to a parquet MANIFEST sidecar instead of
# inline JSON — Iceberg's manifest-file shape: at millions of files the
# JSON checkpoint is the scaling bottleneck (gigabytes of text, parsed
# on every replay), while the same maps as parquet are ~10x smaller and
# columnar-parsed. Small tables keep the simpler inline form.
PARQUET_MANIFEST_MIN_FILES = 10_000

import re as _re

# {version:08d} grows past 8 digits at version 1e8 — match and sort
# NUMERICALLY so a rollover neither hides commits nor missorts replay
_COMMIT_NAME = _re.compile(r"(\d{8,})\.json")
_CHECKPOINT_NAME = _re.compile(r"(\d{8,})\.checkpoint\.json")


def _log_names(log_dir: str, pattern) -> list[str]:
    """Log file names matching ``pattern``, in VERSION order (numeric —
    lexicographic order breaks when the zero-padded width rolls over)."""
    out = [
        (int(m.group(1)), name)
        for name in os.listdir(log_dir)
        if (m := pattern.fullmatch(name))
    ]
    return [name for _, name in sorted(out)]


# Reader feature flags (Delta's protocol actions, reduced to a set): a
# commit DECLARES the features a reader must understand to resolve the
# snapshot it creates; replay REFUSES commits declaring unknown features.
# Without this, a reader predating deletion vectors would silently
# resurrect deleted rows — the guard turns format evolution into a loud
# version error instead of wrong answers.
SUPPORTED_FEATURES = {
    "deletion-vectors",
    "column-mapping",
    "type-widening",
    "txn-markers",
}

# WRITER feature flags (Delta's writerFeatures/minWriterVersion, reduced
# to a set): a commit DECLARES the features any FUTURE WRITER must
# implement to publish a correct commit against the table's state. The
# guard is the write-side twin of the reader guard: without it an old
# writer process appends rows that bypass active CHECK constraints, or
# COW-rewrites a file without applying its deletion vector (resurrecting
# deleted rows) — silent wrongness classes the reader guard alone cannot
# prevent, because the bad state is CREATED at write time. Reads are
# deliberately NOT affected: a reader-only process consuming a table with
# unknown writer features is always safe. Declarations are monotone
# (never retracted by drops), Delta's rule — retracting would let a
# writer that raced the drop publish a stale-featured commit.
SUPPORTED_WRITER_FEATURES = {
    "deletion-vectors",
    "check-constraints",
    "column-mapping",
    "clustered-layout",
    "type-widening",
    "txn-markers",
    "generated-columns",
    "identity-columns",
    "row-tracking",
}

# Lossless type widenings ``widen_column`` accepts (Delta's type
# widening, reduced to the integer chain + float→double — the two
# families whose parquet encodings Spark's vectorized reader upcasts
# natively, so OLD files need zero rewrites). Keys/values are Spark
# simpleString type names.
_WIDEN_OK = {
    "tinyint": {"smallint", "int", "bigint"},
    "smallint": {"int", "bigint"},
    "int": {"bigint"},
    "float": {"double"},
}


class UnsupportedTableFeatureError(RuntimeError):
    """The commit log declares a feature this reader does not implement;
    reading on would produce WRONG results (not just missing ones)."""


class CommitConflictError(RuntimeError):
    """Two writers raced to publish the same commit version; the loser
    gets this (retriable) instead of silently clobbering the winner."""


class ConstraintViolationError(RuntimeError):
    """A write contained rows that fail an active CHECK constraint; the
    whole batch is rejected and NO commit is published (the write is
    all-or-nothing, so a half-valid batch can never land)."""


def _stat_key(v):
    """Normalize a stats/bound value to a JSON-safe, ORDER-PRESERVING key.

    int/float/str pass through; ``datetime.date`` / ``datetime.datetime``
    (what parquet DATE/TIMESTAMP footer stats and Spark min/max aggregates
    both surface) become FIXED-WIDTH ISO strings, whose lexicographic
    order is chronological — so range intersection tests compare
    like-with-like across the footer side and the query side. Returns
    None for unorderable types (bool included: its stats can't prune),
    which callers treat as "no bound" — conservatively keep/rewrite."""
    import datetime

    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        # pyarrow footer stats for TIMESTAMP(isAdjustedToUTC) are tz-AWARE
        # while Spark aggregate bounds are naive in the session tz (pinned
        # UTC engine-wide, session.py) — normalize both to naive UTC so
        # the two sides compare like-with-like
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    return None


def _rollup_stats(per_file: dict) -> dict:
    """Fold per-file column stats up to dir level: min of mins, max of
    maxs, None-propagating null-count sum. A column missing from ANY
    file is dropped — a partial dir range would prune incorrectly."""
    if not per_file:
        return {}
    common = set.intersection(*(set(fs) for fs in per_file.values()))
    out = {}
    for name in common:
        lo = min(fs[name][0] for fs in per_file.values())
        hi = max(fs[name][1] for fs in per_file.values())
        ncs = [fs[name][2] for fs in per_file.values()]
        out[name] = [lo, hi, None if any(n is None for n in ncs) else sum(ncs)]
    return out


# Operations whose concurrent landing invalidates ANY in-flight write
# plan regardless of what data it read: they change what a correct write
# must have DONE — validated rows (add_constraint), clustered files
# (set_layout), typed a column (widen_column), or resolved logical names
# (rename_column / drop_column). Even a blind append planned before one
# of these landed must replan (its rows were never checked against the
# new constraint, its files never clustered by the new layout).
_WRITE_INVALIDATING_OPS = frozenset(
    {
        "add_constraint",
        "set_layout",
        "set_generated_column",
        "set_identity_column",
        "enable_row_tracking",
        "widen_column",
        "rename_column",
        "drop_column",
    }
)


def retry_on_conflict(fn, attempts: int = 5):
    """Run ``fn`` (a VersionedTable operation closure), rebasing and
    retrying on ``CommitConflictError`` up to ``attempts`` times — the
    optimistic-concurrency loop Delta/Iceberg writers run around their
    CAS commit. Rebase is free here because every operation re-reads the
    log and replans when re-run; ``_check_snapshot_conflict`` (the
    Delta-style conflict matrix) turns any commit whose plan a
    concurrent writer invalidated into exactly this retriable error, so
    the loop IS the serialization point: each successful commit behaves
    as if its whole operation ran atomically at its commit version.
    Returns fn()'s result; re-raises the final conflict when attempts
    are exhausted."""
    if attempts < 1:
        raise ValueError("retry_on_conflict: attempts must be >= 1")
    for i in range(attempts):
        try:
            return fn()
        except CommitConflictError:
            if i == attempts - 1:
                raise


def _check_features(entry: dict, where: str) -> None:
    """Refuse to resolve state through a commit/checkpoint declaring a
    reader feature this code does not implement — reading on would give
    WRONG answers (e.g. resurrected rows), not merely incomplete ones."""
    unknown = set(entry.get("features", [])) - SUPPORTED_FEATURES
    if unknown:
        raise UnsupportedTableFeatureError(
            f"{where} requires reader feature(s) {sorted(unknown)}; this "
            f"reader supports {sorted(SUPPORTED_FEATURES)} — upgrade the "
            "reader before touching this table"
        )


# (coordinator incarnation, coordinator path, txn id) -> terminal
# status. Bounded FIFO (a long-lived driver resolving millions of txns
# must not grow it without bound — an evicted entry just re-reads two
# files), and keyed on the coordinator's INCARNATION marker (a uuid
# minted when the coordinator directory is created), so a coordinator
# deleted and recreated at the same path (a reset deployment, test
# fixtures reusing tmp paths) can never alias a stale cached verdict —
# (st_dev, st_ino) is not enough, the filesystem reuses freed inodes.
_TXN_STATUS_CACHE: dict = {}
_TXN_STATUS_CACHE_CAP = 65536
_INCARNATION = "_incarnation"


def _coordinator_identity(coordinator: str) -> str | None:
    try:
        with open(os.path.join(coordinator, _INCARNATION)) as f:
            return f.read().strip() or None
    except OSError:
        return None  # legacy / vanished coordinator: uncacheable


def _coordinator_checkpoint(coordinator: str) -> dict:
    """The coordinator's GC checkpoint: terminal txn verdicts folded out
    of per-txn marker files ({"committed": [...], "aborted": [...]}).
    Missing file = nothing folded yet."""
    try:
        with open(os.path.join(coordinator, "_checkpoint.json")) as f:
            return json.load(f)
    except (FileNotFoundError, NotADirectoryError):
        return {"committed": [], "aborted": []}


def _txn_status(coordinator: str, txn_id: str) -> str:
    """'committed' | 'aborted' | 'pending' for a multi-table transaction,
    read from the coordinator directory — the SINGLE atomic visibility
    point the staged commits of every participating table share. A
    verdict lives either in a per-txn marker file or, after
    ``MultiTableTxn.gc`` folded it, in the coordinator checkpoint —
    both are checked, so a folded-committed txn's staged commits stay
    visible through marker GC. Terminal states are process-cached: a
    verdict never changes (within one coordinator incarnation), and
    without the cache every log read re-stats two files per resolved
    txn commit for the rest of the log's life."""
    ident = _coordinator_identity(coordinator)
    key = (ident, coordinator, txn_id)
    if ident is not None:
        hit = _TXN_STATUS_CACHE.get(key)
        if hit is not None:
            return hit

    def _cache(status: str) -> str:
        if ident is not None:
            if len(_TXN_STATUS_CACHE) >= _TXN_STATUS_CACHE_CAP:
                _TXN_STATUS_CACHE.pop(next(iter(_TXN_STATUS_CACHE)))
            _TXN_STATUS_CACHE[key] = status
        return status

    # committed-wins resolution order: BOTH committed records (live
    # marker, then gc-folded checkpoint) are consulted before ANY
    # aborted record — otherwise, after gc folds a COMMITTED verdict
    # (unlinking its marker), a stale .aborted.json published by a
    # crashed/racing abort() would resolve the txn 'aborted', cache the
    # wrong terminal verdict forever, and hide the staged commits
    if os.path.isfile(os.path.join(coordinator, f"{txn_id}.committed.json")):
        return _cache("committed")
    ck = _coordinator_checkpoint(coordinator)
    if txn_id in ck["committed"]:
        return _cache("committed")
    if os.path.isfile(os.path.join(coordinator, f"{txn_id}.aborted.json")):
        return _cache("aborted")
    if txn_id in ck["aborted"]:
        return _cache("aborted")
    return "pending"  # non-terminal: never cached


def _resolve_txn_entries(entries: list[dict]) -> list[dict]:
    """Visibility resolution for multi-table-transaction commits: an
    entry staged under a txn marker contributes NO table state until
    its coordinator records the txn committed — both participating
    tables' commits therefore become visible together (the coordinator
    file appears) or not at all. Pending/aborted entries are NEUTERED,
    not dropped: their version numbers must keep participating in
    version minting and range-contiguity checks (an aborted txn's slot
    is consumed forever — presumed-abort 2PC, no completion logic).
    Pending entries carry a transient ``_txn_pending`` flag (never
    serialized) so planners can stall instead of skipping past a commit
    that may yet become visible."""
    out = []
    for e in entries:
        t = e.get("txn")
        if not t:
            out.append(e)
            continue
        status = _txn_status(t["coordinator"], t["id"])
        if status == "committed":
            out.append(e)
            continue
        ne = {
            **e,
            "add": [],
            "remove": [],
            "dv_add": [],
            "dv_remove": [],
            "metadata": {},
            "stats": {},
            "file_stats": {},
            "file_sizes": {},
            "file_rows": {},
            "data_change": False,
        }
        if status == "pending":
            ne["_txn_pending"] = True
            # transient (never serialized): what the txn staged, so
            # VACUUM can protect dirs that will flip live at commit
            # (an aborted txn's dirs stay unprotected — reclaimable)
            ne["_txn_staged_add"] = list(e.get("add", []))
            ne["_txn_staged_dv_add"] = list(e.get("dv_add", []))
            # whether the staged commit REWRITES state — a second
            # same-txn write on this table must then refuse (see
            # _commit's same-txn rewrite guard)
            ne["_txn_staged_rewrite"] = bool(
                e.get("remove")
                or e.get("dv_add")
                or e.get("dv_remove")
                or t.get("exclusive")
            )
        out.append(ne)
    return out


def read_log(path: str) -> list[dict]:
    """Pure-filesystem commit-log read (no SparkSession) — the piece a
    streaming source worker needs: it runs outside the driver's session,
    so table state must be resolvable from files alone. Refuses logs
    that declare reader features this code lacks (protocol guard).
    Multi-table-transaction commits resolve through their coordinator
    (``_resolve_txn_entries``): staged-but-uncommitted state is
    invisible here exactly as it is to the in-session reader."""
    log_dir = os.path.join(path, _LOG)
    entries = []
    # same strict match + numeric order as VersionedTable._commits: never
    # parse a crash-orphaned .tmp-*.json, never missort on width rollover
    for name in _log_names(log_dir, _COMMIT_NAME):
        with open(os.path.join(log_dir, name)) as f:
            entry = json.load(f)
        _check_features(entry, f"commit {name}")
        entries.append(entry)
    return _resolve_txn_entries(entries)


def column_mapping_at(
    path: str, version: int | None = None, commits: list | None = None
) -> dict | None:
    """Pure-filesystem replay of the COLUMN MAPPING active at ``version``
    (latest by default) — the piece the SparkSession-free stream/CDF
    readers need. The mapping (Delta's column mapping / Iceberg's
    field-id resolution, reduced to a name table) is
    ``{"fields": [{"id", "name", "physical"}], "dropped": [...],
    "next_id": N}``: ``name`` is the LOGICAL column users query,
    ``physical`` the immutable name stored in parquet files. Renames and
    drops update this table in a metadata commit — zero data rewritten.
    Replays from the newest covering checkpoint (retention may drop the
    setting commit) then forward through commit metadata. ``None`` =
    mapping never activated (logical == physical throughout)."""
    log_dir = os.path.join(path, _LOG)
    mapping = None
    floor = 0
    for name in _log_names(log_dir, _CHECKPOINT_NAME):
        v = int(_CHECKPOINT_NAME.fullmatch(name).group(1))
        if version is not None and v > version:
            break
        with open(os.path.join(log_dir, name)) as f:
            ck = json.load(f)
        _check_features(ck, f"checkpoint {name}")
        mapping = ck.get("column_mapping")
        floor = v
    commits = read_log(path) if commits is None else commits
    for c in commits:
        if c["version"] <= floor:
            continue
        if version is not None and c["version"] > version:
            break
        md = c.get("metadata") or {}
        if "column_mapping_set" in md:
            mapping = md["column_mapping_set"]
    return mapping


def resolve_stream_colmap(
    path: str,
    columns: list[str] | None,
    commits: list | None = None,
    where: str = "table stream",
) -> dict[str, str]:
    """Logical→physical resolution for a STREAM's declared columns — the
    latest mapping (physical names are immutable, so it resolves every
    planned unit), plus a vanish guard: the declared schema is FIXED at
    stream start while the mapping keeps evolving, so a declared logical
    name that any historical mapping registered but the CURRENT mapping
    no longer lists (renamed again mid-stream, or dropped) resolves to
    neither the mapping nor any physical column — null-filling it from
    that point on would be silent data loss. Raise at plan time
    instead."""
    commits = read_log(path) if commits is None else commits
    mapping = column_mapping_at(path, commits=commits)
    if mapping and columns:
        current = {f["name"].lower() for f in mapping["fields"]}
        historical: set[str] = set()
        for c in commits:
            m = (c.get("metadata") or {}).get("column_mapping_set")
            if m:
                historical.update(f["name"].lower() for f in m["fields"])
                historical.update(
                    f["physical"].lower() for f in m["fields"]
                )
                historical.update(d.lower() for d in m.get("dropped", []))
        vanished = [
            c
            for c in columns
            if c.lower() in historical and c.lower() not in current
        ]
        if vanished:
            raise ValueError(
                f"{where}: declared stream column(s) {vanished} no "
                "longer resolve through the table's current column "
                "mapping (renamed or dropped after the stream was "
                "declared) — restart the stream with the current "
                "logical schema"
            )
    return logical_to_physical(mapping)


class MultiTableTxn:
    """ATOMIC multi-table visibility for versioned tables — presumed-
    abort two-phase commit with one directory as the coordinator log
    (the catalog-level atomicity Iceberg's REST catalog provides for
    multi-table transactions, reduced to one marker file).

    Protocol: ``begin()`` mints a txn marker; each participating write
    passes it as ``txn=`` (append/overwrite), which publishes a commit
    that OCCUPIES a version slot but contributes NO visible state;
    ``commit()`` atomically creates ``<id>.committed.json`` — the single
    swap after which EVERY participant's staged commit resolves visible
    at once. A reader between the staged commits can never observe the
    half-state, because visibility is the coordinator file's existence,
    not the staged commits' — the fault-injection tests crash between
    the two stages and between stage and commit to pin exactly this.

    Crash recovery is PRESUMED ABORT: a txn never marked committed is
    dead — ``abort_abandoned()`` (run at coordinator restart; there is
    one coordinator per log directory by construction) marks every
    pending txn aborted, its staged commits stay invisible forever as
    consumed version slots, and the caller simply re-runs the work
    under a fresh txn. No completion/redo logic exists to get wrong.
    Until a txn resolves, further commits to the participating tables
    refuse (``_commit``'s pending guard) — a later commit would make
    the flip-to-visible retroactive — and auto-checkpoints defer so a
    fold can never freeze a staged commit below the replay floor.
    Staged commits declare the ``txn-markers`` reader AND writer
    feature: an old reader would apply half a transaction, an old
    writer lacks the pending guard. Commit-vs-abort races resolve
    committed-wins (status checks the committed marker first)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        # incarnation marker: lets the terminal-status cache distinguish
        # this coordinator from a deleted-and-recreated one at the same
        # path (O_EXCL: first creator wins, concurrent constructors race
        # safely to one marker)
        marker = os.path.join(path, _INCARNATION)
        if not os.path.isfile(marker):
            tmp = os.path.join(path, f".tmp-inc-{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                f.write(uuid.uuid4().hex)
            try:
                os.link(tmp, marker)
            except FileExistsError:
                pass
            os.unlink(tmp)

    def _publish(self, name: str) -> None:
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"ts": _time.time()}, f)
        try:
            os.link(tmp, os.path.join(self.path, name))
        except FileExistsError:
            pass  # idempotent: the marker is content-free
        os.unlink(tmp)

    @staticmethod
    def _id(txn) -> str:
        return txn["id"] if isinstance(txn, dict) else txn

    def begin(self) -> dict:
        txn_id = uuid.uuid4().hex
        self._publish(f"{txn_id}.begin.json")
        return {"id": txn_id, "coordinator": self.path}

    def status(self, txn) -> str:
        return _txn_status(self.path, self._id(txn))

    def commit(self, txn) -> None:
        txn_id = self._id(txn)
        if self.status(txn_id) == "aborted":
            raise ValueError(
                f"txn {txn_id} is already aborted — its staged commits "
                "are permanently invisible; re-run the work under a "
                "fresh txn"
            )
        self._publish(f"{txn_id}.committed.json")

    def abort(self, txn) -> None:
        txn_id = self._id(txn)
        if self.status(txn_id) == "committed":
            raise ValueError(f"txn {txn_id} is already committed")
        self._publish(f"{txn_id}.aborted.json")

    def abort_abandoned(self) -> list[str]:
        """Mark every pending txn aborted — the coordinator-restart
        cleanup (anything pending at startup is abandoned by
        definition: there is one coordinator per log dir). Returns the
        aborted ids. After ``gc``, only not-yet-folded txns still have
        begin markers, so this listing stays bounded by the IN-FLIGHT
        set, not the coordinator's lifetime txn count."""
        dead = []
        for name in sorted(os.listdir(self.path)):
            if not name.endswith(".begin.json"):
                continue
            txn_id = name[: -len(".begin.json")]
            if self.status(txn_id) == "pending":
                self.abort(txn_id)
                dead.append(txn_id)
        return dead

    def gc(self) -> dict:
        """Fold every RESOLVED txn's verdict into the coordinator
        checkpoint and remove its marker files, bounding the directory
        (and ``abort_abandoned``'s listing) by the in-flight txn count
        instead of lifetime throughput.

        Invariant (pinned by tests): a folded txn's status resolves
        identically through the checkpoint — a folded-COMMITTED txn's
        staged table commits stay visible forever, a folded-ABORTED
        one's stay invisible. Crash-safe ordering: the checkpoint is
        REPLACED first (atomic), markers unlinked after — a crash
        between the two leaves both records agreeing, and the next gc
        finishes the unlink. Pending txns are untouched. If a commit/
        abort race ever left BOTH markers, committed wins here exactly
        as it does in ``status``.

        Concurrency: the fold is a read-modify-write of
        ``_checkpoint.json``, so gc serializes through an O_EXCL lock
        file — a second concurrent gc SKIPS (folding is idempotent; the
        next call finishes any remainder) instead of interleaving with
        the first and replacing away verdicts whose markers the first
        already unlinked. A lock left by a crashed gc is broken after
        its mtime goes stale; as defense in depth the current
        checkpoint is re-merged immediately before the replace, so even
        a broken-lock double-entry can only ADD verdicts, never drop
        one."""
        lock = os.path.join(self.path, ".gc.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                stale = _time.time() - os.stat(lock).st_mtime > 120
            except FileNotFoundError:
                stale = False
            if stale:
                try:
                    os.unlink(lock)
                except FileNotFoundError:
                    pass
                return self.gc()
            remaining = sum(
                1
                for n in os.listdir(self.path)
                if n.endswith(".begin.json")
            )
            return {
                "folded": 0,
                "pending_markers": remaining,
                "skipped": "concurrent gc holds the lock",
            }
        try:
            ck = _coordinator_checkpoint(self.path)
            committed = set(ck["committed"])
            aborted = set(ck["aborted"])
            folded: set[str] = set()
            for name in sorted(os.listdir(self.path)):
                if name.endswith(".committed.json"):
                    txn_id = name[: -len(".committed.json")]
                    committed.add(txn_id)
                    folded.add(txn_id)
                elif name.endswith(".aborted.json"):
                    txn_id = name[: -len(".aborted.json")]
                    aborted.add(txn_id)
                    folded.add(txn_id)
            # re-merge the checkpoint as written NOW: union with any
            # verdicts a racing writer folded since our read above
            ck2 = _coordinator_checkpoint(self.path)
            committed |= set(ck2["committed"])
            aborted |= set(ck2["aborted"])
            aborted -= committed  # committed-wins, same rule as status()
            tmp = os.path.join(self.path, f".tmp-ck-{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "committed": sorted(committed),
                        "aborted": sorted(aborted),
                    },
                    f,
                )
            os.replace(tmp, os.path.join(self.path, "_checkpoint.json"))
            for txn_id in folded:
                for suffix in (
                    ".begin.json",
                    ".committed.json",
                    ".aborted.json",
                ):
                    try:
                        os.unlink(
                            os.path.join(self.path, f"{txn_id}{suffix}")
                        )
                    except FileNotFoundError:
                        pass
        finally:
            os.close(fd)
            try:
                os.unlink(lock)
            except FileNotFoundError:
                pass
        remaining = sum(
            1
            for n in os.listdir(self.path)
            if n.endswith(".begin.json")
        )
        return {"folded": len(folded), "pending_markers": remaining}


def logical_to_physical(mapping: dict | None) -> dict[str, str]:
    """{lower-cased logical name: exact physical name} for a mapping
    (empty when mapping is None) — what read paths use to resolve the
    column a user asked for to the name parquet files actually store."""
    if not mapping:
        return {}
    return {f["name"].lower(): f["physical"] for f in mapping["fields"]}


def added_dirs_between(path: str, v_from: int, v_to: int | None = None):
    """(absolute added dirs, resolved v_to) for the append-only commit
    range (v_from, v_to]. Commits marked ``data_change: false`` (OPTIMIZE
    compactions — pure rewrites of already-delivered rows) are SKIPPED,
    Delta's dataChange contract, so streaming and compaction coexist;
    any other rewriting commit raises — the append-only contract a
    version-offset stream requires."""
    commits = read_log(path)
    latest = commits[-1]["version"] if commits else 0
    v_to = latest if v_to is None else v_to
    dirs: list[str] = []
    present: set[int] = set()
    for c in commits:
        if v_from < c["version"] <= v_to:
            present.add(c["version"])
            if c.get("data_change", True) is False:
                continue  # compaction: same rows, already streamed
            if c["remove"] or c.get("dv_add"):
                # dv_add deletes rows without removing a dir (merge-on-read)
                # — just as append-only-breaking as a rewrite
                raise ValueError(
                    f"commit {c['version']} ({c['operation']}) rewrites or "
                    "deletes data; a version-offset change stream requires "
                    "append-only"
                )
            dirs.extend(
                os.path.join(path, _DATA, d) for d in c["add"]
            )
    # log retention may have dropped commit files the checkpoint covers —
    # a range reaching into the truncated region would silently MISS adds,
    # so demand contiguous coverage and fail loudly instead
    missing = set(range(v_from + 1, v_to + 1)) - present
    if missing:
        raise ValueError(
            f"commit files missing for versions {sorted(missing)} — the "
            "log was truncated past this range; reprocess from a full "
            "snapshot instead of the change feed"
        )
    return dirs, v_to


def change_plan_between(
    path: str,
    v_from: int,
    v_to: int | None = None,
    mode: str = "cdf",
    commits: list | None = None,
):
    """(read units, resolved v_to) for the commit range (v_from, v_to] —
    the metadata-only PLANNING half of the change feed, split from the
    data-reading half (``read_change_unit``) so a streaming source can
    run planning on the driver and ship one unit per file to executors
    (the partition-parallel `DataSourceStreamReader` shape). Planning
    cost is manifest-sized: commit-log JSON plus the deletion-vector
    parquet (positions, not rows — |delta|-bounded), never the data.

    Each unit is a plain serializable dict (``size`` = the bytes an
    executor will read for the unit, from the manifest's per-file sizes
    — what lets a stream trigger budget by BYTES, not file count):

      {"kind": "insert", "file": <abs parquet path>, "size": <bytes>}
      {"kind": "delete", "file": <abs parquet path>, "positions": [...],
       "size": <preimage bytes>}

    Units are ordered per commit as Delta CDF orders changes: delete
    preimages first (sorted by basename), then inserts (add dirs in
    commit order, files sorted) — a MOR UPDATE commit therefore plans
    its delete preimages before its insert postimages.

    ``mode="append"`` is the append-only contract (the ``table_changes``
    stream): deletion vectors raise like dir rewrites do. ``mode="cdf"``
    replays MOR deletes as delete units. In both modes:
    data_change=False commits (OPTIMIZE, vector compaction) are skipped;
    a commit that REMOVES dirs raises (its row delta needs a snapshot
    diff, which the offset log cannot replay); a truncated log raises;
    a planned dir that yields ZERO parquet files raises (the dir was
    vacuumed past the replay horizon — silence here would drop change
    rows with no error); and a deletion vector whose basename maps to
    TWO different data dirs raises (basename collision — reading the
    preimage from either candidate would be a silent guess).

    ``commits`` lets a caller planning MANY single-commit ranges (the
    stream reader) pass one pre-read log snapshot instead of paying a
    full read_log per call — commits are immutable, so any snapshot
    covering ``v_to`` is equivalent to a fresh read."""
    if mode not in ("cdf", "append"):
        raise ValueError(f"mode must be 'cdf' or 'append', got {mode!r}")
    import glob as _glob

    import pyarrow.parquet as pq

    commits = read_log(path) if commits is None else commits
    latest = commits[-1]["version"] if commits else 0
    v_to = latest if v_to is None else v_to
    # Basename ownership is resolved AS OF v_to: a collision introduced
    # by a commit AFTER v_to must not poison replay of an older range
    # where the preimage was still uniquely placed — a stream resuming
    # from an old checkpoint replays exactly such ranges
    owner: dict[str, str] = {}
    collide: set[str] = set()
    fsize: dict[str, int] = {}  # basename → manifest-recorded bytes
    for c in commits:
        if c["version"] > v_to:
            break
        for rel, fstats in (c.get("file_stats") or {}).items():
            for basename in fstats:
                if basename in owner and owner[basename] != rel:
                    collide.add(basename)
                owner[basename] = rel
        for sizes in (c.get("file_sizes") or {}).values():
            fsize.update(sizes)

    def _unit_size(path_on_disk: str) -> int:
        # manifest first; pre-size-manifest commits fall back to one
        # stat call (metadata-only — planning never opens the file).
        # `is not None` (not `or`): a recorded 0-byte size is a real
        # size, not a missing entry. Collided basenames skip the
        # manifest — two commits recorded sizes for different files of
        # the same name, so the surviving map entry would be a guess.
        basename = os.path.basename(path_on_disk)
        if basename not in collide:
            s = fsize.get(basename)
            if s is not None:
                return s
        try:
            return os.path.getsize(path_on_disk)
        except OSError:
            # planner-side, descriptive — match the planner's other
            # vacuumed-past-replay-range errors instead of leaking a
            # bare FileNotFoundError from a stat call
            raise ValueError(
                f"{path_on_disk} is no longer on disk — it was vacuumed "
                "past this replay range; reprocess from a full snapshot"
            ) from None

    units: list[dict] = []
    present: set[int] = set()
    for c in commits:
        if not (v_from < c["version"] <= v_to):
            continue
        present.add(c["version"])
        if c.get("_txn_pending"):
            # a staged-but-unresolved multi-table txn: planning past it
            # would silently exclude state that may yet become visible,
            # making this range's answer retroactively wrong. The live
            # stream sources cap their offsets BEFORE the first pending
            # version, so they stall instead of hitting this.
            raise ValueError(
                f"commit {c['version']} is staged under a pending "
                "multi-table transaction — wait for the coordinator to "
                "commit or abort it before reading this change range"
            )
        if c.get("data_change", True) is False:
            continue
        if c["remove"]:
            raise ValueError(
                f"commit {c['version']} ({c['operation']}) rewrites data; "
                "the change-data-feed stream can replay appends and "
                "merge-on-read deletes only — reprocess rewrites from a "
                "snapshot diff"
            )
        if mode == "append" and c.get("dv_add"):
            # dv_add deletes rows without removing a dir (merge-on-read)
            # — just as append-only-breaking as a rewrite
            raise ValueError(
                f"commit {c['version']} ({c['operation']}) rewrites or "
                "deletes data; a version-offset change stream requires "
                "append-only"
            )
        # delete preimages first (Delta CDF's update ordering)
        by_file: dict[str, list[int]] = {}
        for dvrel in c.get("dv_add", []) if mode == "cdf" else []:
            dv_files = sorted(
                _glob.glob(os.path.join(path, _DV, dvrel, "*.parquet"))
            )
            if not dv_files:
                raise ValueError(
                    f"commit {c['version']}: deletion-vector dir {dvrel} "
                    "holds no parquet files — it was vacuumed past this "
                    "replay range; reprocess from a full snapshot"
                )
            for f in dv_files:
                t = pq.read_table(f)
                for basename, pos in zip(
                    t.column("file").to_pylist(), t.column("pos").to_pylist()
                ):
                    by_file.setdefault(basename, []).append(pos)
        for basename in sorted(by_file):
            if basename not in owner:
                raise ValueError(
                    f"commit {c['version']}: deletion vector references "
                    f"{basename}, which no commit's manifest places — "
                    "cannot stream this delete"
                )
            if basename in collide:
                raise ValueError(
                    f"commit {c['version']}: deletion vector references "
                    f"{basename}, which two different commits' manifests "
                    "place in different dirs — cannot resolve the "
                    "preimage file unambiguously"
                )
            full = os.path.join(path, _DATA, owner[basename], basename)
            if not os.path.isfile(full):
                # fail at PLANNING time (driver-side, loud) instead of a
                # FileNotFoundError inside an executor read task
                raise ValueError(
                    f"commit {c['version']}: deletion vector references "
                    f"{owner[basename]}/{basename}, which is no longer on "
                    "disk — it was vacuumed past this replay range; "
                    "reprocess from a full snapshot"
                )
            units.append(
                {
                    "kind": "delete",
                    "file": full,
                    "positions": sorted(by_file[basename]),
                    # budgeted by the PREIMAGE file's bytes: the reader
                    # pays a full read of it before taking positions
                    "size": _unit_size(full),
                }
            )
        for d in c["add"]:
            add_files = sorted(
                _glob.glob(os.path.join(path, _DATA, d, "*.parquet"))
            )
            if not add_files:
                raise ValueError(
                    f"commit {c['version']}: added dir {d} holds no "
                    "parquet files — it was vacuumed past this replay "
                    "range; reprocess from a full snapshot"
                )
            units.extend(
                {"kind": "insert", "file": f, "size": _unit_size(f)}
                for f in add_files
            )
    missing = set(range(v_from + 1, v_to + 1)) - present
    if missing:
        raise ValueError(
            f"commit files missing for versions {sorted(missing)} — the "
            "log was truncated past this range; reprocess from a full "
            "snapshot instead of the change feed"
        )
    return units, v_to


def _pylist_converter(dtype):
    """Value converter (or None for identity) turning pyarrow's
    ``to_pylist`` representation into what Spark's Python data-source
    row path expects: arrow MAP values surface as [(k, v), ...] pair
    lists but the engine's variant converter asserts dict — recurse
    through list/struct nesting so map<...> works at any depth."""
    import pyarrow as pa

    if pa.types.is_map(dtype):
        kc = _pylist_converter(dtype.key_type) or (lambda v: v)
        vc = _pylist_converter(dtype.item_type) or (lambda v: v)
        return lambda v: (
            None if v is None else {kc(k): vc(x) for k, x in v}
        )
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype):
        inner = _pylist_converter(dtype.value_type)
        if inner is None:
            return None
        return lambda v: None if v is None else [inner(x) for x in v]
    if pa.types.is_struct(dtype):
        subs = {
            f.name: _pylist_converter(f.type)
            for f in dtype
            if _pylist_converter(f.type) is not None
        }
        if not subs:
            return None
        return lambda v: (
            None
            if v is None
            else {k: subs[k](x) if k in subs else x for k, x in v.items()}
        )
    return None


def read_change_unit(
    unit: dict,
    columns: list[str] | None = None,
    tag: bool = True,
    colmap: dict[str, str] | None = None,
) -> list[tuple]:
    """Materialize ONE planned change unit (``change_plan_between``) as
    Python row tuples — the data-reading half the streaming source runs
    per-partition on executors (pyarrow only, no SparkSession). Values
    are emitted by column NAME in ``columns`` order when given (missing
    columns → None, so schema evolution can't mis-slot values), else in
    file order. ``colmap`` ({lower logical: physical},
    ``logical_to_physical``) resolves requested LOGICAL names to the
    physical names files store when the table has an active column
    mapping — files written before a rename keep streaming correctly.
    ``tag=True`` appends the '_change_type' value ('insert' /
    'delete'); the append-only ``table_changes`` stream passes
    ``tag=False``."""
    import pyarrow.parquet as pq

    colmap = colmap or {}
    t = pq.read_table(unit["file"])
    if unit["kind"] == "delete":
        t = t.take(unit["positions"])
    cols = columns or t.column_names
    data = []
    for n in cols:
        fn = colmap.get(n.lower(), n)
        if fn not in t.column_names:
            data.append([None] * t.num_rows)
            continue
        vals = t.column(fn).to_pylist()
        conv = _pylist_converter(t.schema.field(fn).type)
        data.append([conv(v) for v in vals] if conv else vals)
    suffix = (unit["kind"],) if tag else ()
    return [
        tuple(col[i] for col in data) + suffix for i in range(t.num_rows)
    ]


def read_change_batches(
    unit: dict,
    arrow_schema,
    tag: bool = True,
    colmap: dict[str, str] | None = None,
):
    """Arrow fast path for ``read_change_unit``: materialize ONE planned
    change unit as pyarrow RecordBatches already cast to the stream's
    declared arrow schema (``to_arrow_schema(return_type)`` — the same
    derivation Spark's data-source worker uses for the tuple path), so
    the executor ships columnar buffers straight through instead of
    round-tripping every row via Python objects. Missing columns
    (schema evolution) fill with typed nulls; ``tag`` appends the
    '_change_type' literal column. Raises on any arrow-level type
    incompatibility — the caller falls back to the tuple path, which is
    always correct."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    colmap = colmap or {}
    t = pq.read_table(unit["file"])
    if unit["kind"] == "delete":
        t = t.take(unit["positions"])
    names = list(arrow_schema.names)
    data_names = names[:-1] if tag else names
    cols = []
    for name in data_names:
        fn = colmap.get(name.lower(), name)
        if fn in t.column_names:
            cols.append(t.column(fn))
        else:
            cols.append(pa.nulls(t.num_rows, type=arrow_schema.field(name).type))
    if tag:
        cols.append(
            pa.array(
                [unit["kind"]] * t.num_rows,
                type=arrow_schema.field(names[-1]).type,
            )
        )
    out = pa.table(cols, names=names).cast(arrow_schema)
    return out.combine_chunks().to_batches()


def cdf_rows_between(
    path: str,
    v_from: int,
    v_to: int | None = None,
    columns: list[str] | None = None,
):
    """(change rows, resolved v_to) for the commit range (v_from, v_to] —
    the PURE-FILESYSTEM change-data-feed reader (no SparkSession:
    commit-log replay + pyarrow only). Each row is the table row's
    values (in ``columns`` order when given, else file order) with the
    change type ('insert' / 'delete') appended.

    Single-process composition of the two halves the partition-parallel
    stream source runs split: ``change_plan_between`` (planning) +
    ``read_change_unit`` per unit (reading). Semantics — MOR
    delete-preimage/insert-postimage ordering, data_change=False skips,
    rewrite/truncation/vacuumed-dir/basename-collision errors — live in
    the planner; see its docstring. ``columns`` are LOGICAL names; an
    active column mapping resolves them to the files' physical names."""
    units, v_to = change_plan_between(path, v_from, v_to, mode="cdf")
    colmap = logical_to_physical(column_mapping_at(path, v_to))
    rows: list[tuple] = []
    for u in units:
        rows.extend(read_change_unit(u, columns=columns, colmap=colmap))
    return rows, v_to


def additive_aggregate_state(
    df: DataFrame,
    group_by: list[str],
    count_col: str,
    sums: dict[str, str] | None = None,
    where: str | None = None,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
) -> DataFrame:
    """The full-recompute form of the additive aggregate
    ``maintain_additive_aggregate`` advances incrementally — the SAME
    count/sum (and min/max) expressions, so a state bootstrapped here
    and one folded forward from the change feed are schema- and
    value-identical (CREATE MATERIALIZED VIEW builds with this;
    REFRESH maintains)."""
    from pyspark.sql import functions as F

    if where is not None:
        df = df.filter(where)
    return df.groupBy(*group_by).agg(
        F.count(F.lit(1)).alias(count_col),
        *[
            F.sum(F.expr(e)).alias(name)
            for name, e in (sums or {}).items()
        ],
        *[
            F.min(F.expr(e)).alias(name)
            for name, e in (mins or {}).items()
        ],
        *[
            F.max(F.expr(e)).alias(name)
            for name, e in (maxs or {}).items()
        ],
    )


def maintain_additive_aggregate(
    vt: "VersionedTable",
    v_from: int,
    v_to: int | None,
    group_by: list[str],
    count_col: str,
    sums: dict[str, str] | None = None,
    state: DataFrame | None = None,
    where: str | None = None,
) -> DataFrame:
    """Incremental view maintenance: advance a grouped additive aggregate
    (counts + sums) from its state at ``v_from`` to ``v_to`` using ONLY
    the change feed — cost ∝ |delta|, never table size. ``where``
    restricts the view to a row slice: selection commutes with the
    signed aggregation, so the same predicate filters the base snapshot
    and every feed row and the maintained state stays exact.

    The feed's rows are signed (insert +1, delete −1; an update is its
    delete+insert pair), so the per-group delta is ``sum(sign)`` for the
    count and ``sum(sign * expr)`` for each declared summand — the
    classic IVM algebra for distributive aggregates. The delta
    full-outer-merges with the prior state and groups whose count
    reaches zero vanish, so the maintained view is EXACTLY the aggregate
    a full recompute at ``v_to`` would produce (hash-checked end-to-end
    by the a25_incremental_view oracle). ``state=None`` computes the
    ``v_from`` state with one direct aggregate over that snapshot.

    Only count/sum are maintainable this way (avg derives as sum/count;
    min/max are not distributive under deletes — recompute those).
    Summands should be EXACT types (decimal/long, the engine's scaled-
    sum discipline) so +delta/−delta cancel bit-for-bit."""
    from pyspark.sql import functions as F

    sums = sums or {}

    def aggregate(df: DataFrame, sign: str | None) -> DataFrame:
        if where is not None:
            df = df.filter(where)
        factor = F.col(sign) if sign else F.lit(1)
        return df.groupBy(*group_by).agg(
            F.sum(factor).cast("long").alias(count_col),
            *[
                F.sum(factor * F.expr(e)).alias(name)
                for name, e in sums.items()
            ],
        )

    if state is None:
        state = aggregate(vt.read(version=v_from), None)
    feed = _sign_change_feed(vt.changes_between(v_from, v_to))
    delta = aggregate(feed, "__sign")
    return merge_aggregate_state(state, delta, group_by, count_col, sums)


def _sign_change_feed(feed: DataFrame) -> DataFrame:
    """Sign a change feed for IVM: rows that ADD state (+1) are
    'insert' AND 'update_postimage' — a row-tracked source (A43)
    surfaces Delta CDF's four change types, and treating a postimage
    as anything but +1 silently drifts every maintained count by -2
    per updated row. The preimage/'delete' side is -1. Drops the
    tag (and the hidden row id, present only on tracked feeds) so
    the signed rows union/join cleanly with untracked snapshots."""
    from pyspark.sql import functions as F

    return feed.withColumn(
        "__sign",
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1)),
    ).drop("_change_type", _ROWID)


def merge_aggregate_state(
    state: DataFrame,
    delta: DataFrame,
    group_by: list[str],
    count_col: str,
    sums: dict[str, str] | None = None,
) -> DataFrame:
    """Fold a signed per-group delta into a prior aggregate state:
    union the two per-group aggregates and re-aggregate, groups whose
    count telescopes to zero dropped — the merge half of
    ``maintain_additive_aggregate``, shared by the single-table and
    join (``maintain_join_additive_aggregate``) IVM paths.

    Union + re-aggregate rather than a full-outer join on the group
    keys: the result is identical (groupBy makes a NULL key one group,
    exactly the eqNullSafe semantics; the trailing coalesce reproduces
    the old ``coalesce(x,0)+coalesce(y,0)`` NULL-sum handling) but the
    plan is ONE hash-aggregate Exchange over ≤|state|+|delta| pre-
    aggregated rows instead of two Exchanges + sorts + a full-outer
    SortMergeJoin (full outer cannot broadcast-hash, so the join paid
    the SMJ machinery even for tiny frames)."""
    from pyspark.sql import functions as F

    sums = sums or {}
    cols = [*group_by, count_col, *sums]
    both = state.select(*cols).unionByName(delta.select(*cols))
    merged = both.groupBy(*group_by).agg(
        F.coalesce(F.sum(count_col), F.lit(0)).cast("long").alias(count_col),
        *[F.coalesce(F.sum(c), F.lit(0)).alias(c) for c in sums],
    )
    return merged.filter(F.col(count_col) > 0)


def _normalize_chain_keys(chain_keys: list[list]) -> list[list[list[str]]]:
    """Each chain leg is a list of KEY PAIRS ``[left_col, right_col]``
    (the join may key differently-named columns, the real-star-schema
    shape — ``orders.o_custkey = customer.c_custkey``). A bare string
    ``k`` (the pre-aliased-keys catalog format) means ``[k, k]``, so
    MV definitions recorded by older catalogs keep maintaining."""
    return [
        [[k, k] if isinstance(k, str) else list(k) for k in keys]
        for keys in chain_keys
    ]


def _join_adjacent(
    left: DataFrame, right: DataFrame, keys: list[list[str]]
) -> DataFrame:
    """Equi-join two adjacent chain frames on key pairs. Same-named
    pairs join USING-style (one surviving key column); an aliased pair
    joins on the expression and BOTH columns survive — each side's key
    stays addressable by its own name downstream (group columns,
    later chain legs)."""
    if all(l == r for l, r in keys):
        return left.join(right, [l for l, _ in keys])
    cond = None
    for l, r in keys:
        leg = left[l] == right[r]
        cond = leg if cond is None else (cond & leg)
    out = left.join(right, cond)
    for l, r in keys:
        if l == r:
            out = out.drop(right[r])
    return out


def chain_join(
    sources: list["VersionedTable"],
    chain_keys: list[list],
    versions: list[int],
) -> DataFrame:
    """``T0 ⋈(k0) T1 ⋈(k1) T2 …`` with each table read at its given
    version — the consistent frame the join-IVM algebra aggregates."""
    chain_keys = _normalize_chain_keys(chain_keys)
    df = sources[0].read(version=versions[0], merge_schema=True)
    for j in range(1, len(sources)):
        df = _join_adjacent(
            df,
            sources[j].read(version=versions[j], merge_schema=True),
            chain_keys[j - 1],
        )
    return df


def maintain_join_additive_aggregate(
    sources: list["VersionedTable"],
    chain_keys: list[list[str]],
    froms: list[int],
    tos: list[int],
    group_by: list[str],
    count_col: str,
    sums: dict[str, str] | None = None,
    state: DataFrame | None = None,
    where: str | None = None,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
) -> DataFrame:
    """Incremental view maintenance over an N-table EQUI-JOIN CHAIN
    ``T0 ⋈(k0) T1 ⋈(k1) T2 …`` (``chain_keys[j]`` joins ``sources[j]``
    and ``sources[j+1]``; each key is a ``[left_col, right_col]`` pair,
    so differently-named star-schema keys join without renaming — a
    bare string means the same name on both sides): advance a
    grouped additive aggregate from its state at ``froms`` to ``tos``
    with the telescoping signed delta-join rule —

        Δ(T0⋈…⋈Tn) = Σ_i  T0_new ⋈ … ⋈ T(i-1)_new ⋈ ΔTi
                            ⋈ T(i+1)_old ⋈ … ⋈ Tn_old

    (each term's left neighbors read at their NEW version, right
    neighbors at their OLD version, so the sum telescopes exactly to
    new-minus-old; all cross terms are absorbed because every feed row
    is signed insert +1 / delete −1 and multiplicities multiply
    through the joins — classic DBToaster/delta-join maintenance). The
    old/new snapshots come from time travel on each source's own
    commit log: the versioned table hands the algebra its consistent
    frames for free. Per refresh, term i costs the delta-join of
    |ΔTi| against its neighbors — manifest-prunable on the keys, tiny
    deltas AQE-broadcast — never a recompute of the full join.
    ``where`` filters the JOINED row before aggregation.

    ``mins``/``maxs`` maintain MIN/MAX columns by the affected-group
    recompute rule: inserts FOLD (``least``/``greatest`` against the
    prior extremum — extrema are insert-monotone), and a delete only
    forces work when it could have CARRIED the group's extremum
    (deleted min ≤ stored min, resp. ≥ for max) — those groups, and
    only those, recompute from the base relation at ``tos`` behind a
    semi-join on the group keys. Cost: fold is delta-priced like the
    additive path; the recompute term is |affected groups|-pruned,
    zero when deletes never touch a carrier."""
    from pyspark.sql import functions as F

    sums = sums or {}
    mins = mins or {}
    maxs = maxs or {}
    n = len(sources)
    if not (len(chain_keys) == n - 1 == len(froms) - 1 == len(tos) - 1):
        raise ValueError(
            "maintain_join_additive_aggregate: need N sources, N-1 "
            "chain_keys, N froms, N tos"
        )
    chain_keys = _normalize_chain_keys(chain_keys)

    def aggregate(df: DataFrame, sign) -> DataFrame:
        if where is not None:
            df = df.filter(where)
        aggs = [F.sum(sign).cast("long").alias(count_col)]
        aggs += [
            F.sum(sign * F.expr(e)).alias(name) for name, e in sums.items()
        ]
        # extrema deltas ride the same per-term shuffle: the inserted
        # rows' extremum folds, the deleted rows' extremum decides
        # whether the group must recompute
        for name, e in mins.items():
            aggs.append(
                F.min(F.when(sign > 0, F.expr(e))).alias(f"__ins_{name}")
            )
            aggs.append(
                F.min(F.when(sign < 0, F.expr(e))).alias(f"__del_{name}")
            )
        for name, e in maxs.items():
            aggs.append(
                F.max(F.when(sign > 0, F.expr(e))).alias(f"__ins_{name}")
            )
            aggs.append(
                F.max(F.when(sign < 0, F.expr(e))).alias(f"__del_{name}")
            )
        return df.groupBy(*group_by).agg(*aggs)

    if state is None:
        state = additive_aggregate_state(
            chain_join(sources, chain_keys, froms),
            group_by,
            count_col,
            sums,
            where=where,
            mins=mins,
            maxs=maxs,
        )

    def signed_feed(vt, v_from, v_to) -> DataFrame | None:
        if v_to <= v_from:
            return None
        return _sign_change_feed(vt.changes_between(v_from, v_to))

    parts: list[DataFrame] = []
    for i in range(n):
        di = signed_feed(sources[i], froms[i], tos[i])
        if di is None:
            continue
        df = di
        for j in range(i - 1, -1, -1):  # left neighbors at NEW versions
            df = _join_adjacent(
                sources[j].read(version=tos[j], merge_schema=True),
                df,
                chain_keys[j],
            )
        for j in range(i + 1, n):  # right neighbors at OLD versions
            df = _join_adjacent(
                df,
                sources[j].read(version=froms[j], merge_schema=True),
                chain_keys[j - 1],
            )
        parts.append(aggregate(df, F.col("__sign")))
    if not parts:
        return state
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.unionByName(p)
    if len(parts) > 1:
        delta = delta.groupBy(*group_by).agg(
            F.sum(count_col).cast("long").alias(count_col),
            *[F.sum(c).alias(c) for c in sums],
            *[F.min(f"__ins_{c}").alias(f"__ins_{c}") for c in mins],
            *[F.min(f"__del_{c}").alias(f"__del_{c}") for c in mins],
            *[F.max(f"__ins_{c}").alias(f"__ins_{c}") for c in maxs],
            *[F.max(f"__del_{c}").alias(f"__del_{c}") for c in maxs],
        )
    merged = merge_aggregate_state(state, delta, group_by, count_col, sums)
    if not (mins or maxs):
        return merged

    def base_at_tos() -> DataFrame:
        df = chain_join(sources, chain_keys, tos)
        return df.filter(where) if where is not None else df

    return _maintain_extrema(
        merged, state, delta, group_by, mins, maxs, base_at_tos
    )


def _maintain_extrema(
    merged: DataFrame,
    state: DataFrame,
    delta: DataFrame,
    group_by: list[str],
    mins: dict[str, str],
    maxs: dict[str, str],
    base_at_tos,
) -> DataFrame:
    """Resolve maintained MIN/MAX columns onto the post-merge state.

    Per group and extremum: no delete touched the stored carrier →
    FOLD (``least(old, inserted_min)`` / ``greatest(old,
    inserted_max)``, both null-skipping, so a delta-less group keeps
    its value and a brand-new group takes the inserted one). A delete
    that ties-or-beats the stored extremum — or any delete against a
    group with no stored state (join-algebra hybrid frames can emit
    one) — marks the group AFFECTED: its extrema recompute from the
    base relation at the target versions behind a semi-join on the
    affected keys, so the scan is pruned to those groups and every
    other group never touches the base. Groups whose count telescoped
    to zero are already gone from ``merged`` and are never recomputed.
    Conservative and exact: a tie triggers a recompute that returns
    the same value; a missed carrier is impossible because every
    removed joined row surfaces as a signed −1 row in some term."""
    from pyspark.sql import functions as F

    ext = [("min", c) for c in mins] + [("max", c) for c in maxs]
    s = state.select(
        *[F.col(k).alias(f"__sk_{k}") for k in group_by],
        *[F.col(c).alias(f"__old_{c}") for _, c in ext],
    )
    d = delta.select(
        *[F.col(k).alias(f"__dk_{k}") for k in group_by],
        *[F.col(f"__ins_{c}") for _, c in ext],
        *[F.col(f"__del_{c}") for _, c in ext],
    )
    j = merged.join(
        s,
        [merged[k].eqNullSafe(s[f"__sk_{k}"]) for k in group_by],
        "left",
    ).join(
        d,
        [merged[k].eqNullSafe(d[f"__dk_{k}"]) for k in group_by],
        "left",
    )
    affected = F.lit(False)
    for kind, c in ext:
        old, de = F.col(f"__old_{c}"), F.col(f"__del_{c}")
        hit = de.isNotNull() & (
            old.isNull() | ((de <= old) if kind == "min" else (de >= old))
        )
        affected = affected | hit
    j = j.withColumn("__affected", affected)
    keys_aff = j.filter(F.col("__affected")).select(
        *[F.col(k).alias(f"__ak_{k}") for k in group_by]
    )
    base = base_at_tos()
    rec = (
        base.join(
            keys_aff,
            [base[k].eqNullSafe(keys_aff[f"__ak_{k}"]) for k in group_by],
            "left_semi",
        )
        .groupBy(*group_by)
        .agg(
            *[F.min(F.expr(e)).alias(f"__rec_{c}") for c, e in mins.items()],
            *[F.max(F.expr(e)).alias(f"__rec_{c}") for c, e in maxs.items()],
        )
    )
    r = rec.select(
        *[F.col(k).alias(f"__rk_{k}") for k in group_by],
        *[F.col(f"__rec_{c}") for _, c in ext],
    )
    j = j.join(
        r,
        [j[k].eqNullSafe(r[f"__rk_{k}"]) for k in group_by],
        "left",
    )
    keep = [c for c in merged.columns]
    out_cols = [F.col(c) for c in keep]
    for kind, c in ext:
        fold = (
            F.least(F.col(f"__old_{c}"), F.col(f"__ins_{c}"))
            if kind == "min"
            else F.greatest(F.col(f"__old_{c}"), F.col(f"__ins_{c}"))
        )
        out_cols.append(
            F.when(F.col("__affected"), F.col(f"__rec_{c}"))
            .otherwise(fold)
            .alias(c)
        )
    return j.select(*out_cols)


class VersionedTable:
    """A parquet table whose state is a replayable JSON commit log."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, _LOG), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA), exist_ok=True)

    # -- log plumbing ------------------------------------------------------

    def _log_dir(self) -> str:
        return os.path.join(self.path, _LOG)

    def _commits(self) -> list[dict]:
        # strict name match: a crash between link and unlink in
        # _publish_commit leaves a .tmp-*.json — parsing it as a commit
        # would double-apply its adds (torn LOG writes must be as
        # invisible as torn data writes)
        entries = []
        for name in _log_names(self._log_dir(), _COMMIT_NAME):
            with open(os.path.join(self._log_dir(), name)) as f:
                entry = json.load(f)
            _check_features(entry, f"commit {name}")
            entries.append(entry)
        return _resolve_txn_entries(entries)

    def _checkpoints(self) -> list[dict]:
        out = []
        for name in _log_names(self._log_dir(), _CHECKPOINT_NAME):
            with open(os.path.join(self._log_dir(), name)) as f:
                ck = json.load(f)
            _check_features(ck, f"checkpoint {name}")
            out.append(ck)
        return out

    def latest_version(self) -> int:
        """Newest version across commit files AND checkpoints. The
        checkpoint matters after log retention: with every commit file
        at-or-below a checkpoint dropped, a commits-only answer would
        be 0 — and the next write would mint a version BELOW the
        checkpoint floor, publishing a commit that replay silently
        skips (data loss). Max over both sources keeps version minting
        monotone through retention."""
        commits = self._commits()
        v = commits[-1]["version"] if commits else 0
        cks = self._checkpoints()
        if cks:
            v = max(v, cks[-1]["version"])
        return v

    def _check_snapshot_conflict(
        self,
        read_version: int,
        latest: int,
        commits: list[dict],
        *,
        operation: str,
        remove: list[str],
        dv_add: list[str],
        dv_remove: list[str],
        data_change: bool,
        identity_alloc: dict | None = None,
        copy_add: dict | None = None,
    ) -> None:
        """Delta-style conflict-resolution matrix for optimistic
        concurrency (snapshot isolation): decide whether a commit whose
        plan read ``read_version`` may still land now that the table is
        at ``latest``, or must replan.

        - A commit declaring writer features this writer lacks, or one
          of ``_WRITE_INVALIDATING_OPS`` (new constraint, new layout,
          type widen, column rename/drop), conflicts with EVERYTHING —
          the plan's validation/clustering/name resolution is stale.
        - A **blind append** (new files only: no remove, no vectors)
          rebases past any concurrent data commit — its files are new,
          so no concurrent remove/add can overlap what it read (Delta:
          AddFile-only transactions never conflict under
          WriteSerializable).
        - A **compaction** (data_change=False rewrite: OPTIMIZE,
          Z-order, compact_vectors) rebases past commits that touch
          none of the files it retires — concurrent ingest must never
          abort compaction at 100 TB — but conflicts when a concurrent
          commit removed one of those files (double-retire) or added a
          deletion vector (the vector may reference a file this rewrite
          replaces; carrying on would resurrect its deleted rows).
        - Every other shape (COW delete/update/merge, MOR vectors,
          overwrite, restore) READ the table to build its plan, so any
          concurrent commit that changed data invalidates it.

        Raises ``CommitConflictError`` (retriable — every operation
        re-reads the log when re-run, so ``retry_on_conflict`` IS the
        rebase loop)."""

        def _conflict(why: str, culprit: dict) -> None:
            raise CommitConflictError(
                f"snapshot changed since this {operation} was planned "
                f"(read v{read_version}, table now v{latest}): {why} "
                f"(v{culprit['version']} {culprit.get('operation')}) — "
                "re-run the operation against the current snapshot "
                "(retry_on_conflict does this automatically)"
            )

        # log retention may have dropped commit files covered by a
        # checkpoint: a writer whose read_version predates the retention
        # floor would otherwise scan an INCOMPLETE window and commit past
        # undetected conflicts. If any version in (read_version, latest]
        # has no surviving commit file, refuse conservatively (retriable
        # — the retry replans against the current snapshot, whose window
        # is fully covered).
        if latest > read_version:
            covered = {e["version"] for e in commits}
            gap = [
                v
                for v in range(read_version + 1, latest + 1)
                if v not in covered
            ]
            if gap:
                raise CommitConflictError(
                    f"snapshot changed since this {operation} was planned "
                    f"(read v{read_version}, table now v{latest}) and log "
                    f"retention dropped the commit file(s) for version(s) "
                    f"{gap[:5]}{'...' if len(gap) > 5 else ''} — the "
                    "conflict window cannot be verified; re-run against "
                    "the current snapshot (retry_on_conflict does this "
                    "automatically)"
                )
        between = []
        for e in commits:
            if not (read_version < e["version"] <= latest):
                continue
            # an ABORTED txn's neutered slot contributes no state and
            # never will — it cannot conflict with anything
            if e.get("txn") and _txn_status(
                e["txn"]["coordinator"], e["txn"]["id"]
            ) == "aborted":
                continue
            between.append(e)
        for e in between:
            unknown = (
                set(e.get("writer_features", [])) - SUPPORTED_WRITER_FEATURES
            )
            if unknown:
                _conflict(
                    f"a concurrent commit declared writer feature(s) "
                    f"{sorted(unknown)} this writer does not implement",
                    e,
                )
            if e.get("operation") in _WRITE_INVALIDATING_OPS:
                _conflict(
                    "a concurrent metadata change altered what a correct "
                    "write must do (constraints/layout/types/names)",
                    e,
                )
        if data_change and not remove and not dv_add and not dv_remove:
            # blind append: new files only, nothing read to go stale —
            # UNLESS it allocated identity values: two writers allocating
            # from the same watermark issue overlapping ids
            if identity_alloc:
                for e in between:
                    overlap = set(identity_alloc) & set(
                        (e.get("metadata") or {}).get("identity_alloc")
                        or {}
                    )
                    if overlap:
                        _conflict(
                            f"a concurrent commit allocated identity "
                            f"value(s) for column(s) {sorted(overlap)} "
                            "from the same watermark",
                            e,
                        )
            if copy_add:
                # two COPY INTOs racing on overlapping source files:
                # letting both land would ingest those files twice
                for e in between:
                    overlap = set(copy_add) & set(
                        (e.get("metadata") or {}).get("copy_into_add")
                        or {}
                    )
                    if overlap:
                        _conflict(
                            f"a concurrent COPY INTO already ingested "
                            f"source file(s) {sorted(overlap)[:3]}",
                            e,
                        )
            return
        if not data_change and (remove or dv_remove or dv_add):
            # compaction rewrite (OPTIMIZE / Z-order / compact_vectors)
            ours = set(remove) | set(dv_remove)
            for e in between:
                hit = (
                    set(e.get("remove", [])) | set(e.get("dv_remove", []))
                ) & ours
                if hit:
                    _conflict(
                        f"a concurrent commit retired file dir(s) "
                        f"{sorted(hit)[:3]} this rewrite also retires",
                        e,
                    )
                if e.get("dv_add"):
                    _conflict(
                        "a concurrent commit added deletion vectors that "
                        "may reference files this rewrite replaces",
                        e,
                    )
            return
        if not data_change:
            # pure metadata commit. add_constraint is the one whose plan
            # validated DATA (every existing row against the new expr) —
            # rows landing after that validation were never checked
            if operation == "add_constraint":
                for e in between:
                    if e.get("data_change", True) and (
                        e.get("add") or e.get("dv_add") or e.get("dv_remove")
                    ):
                        _conflict(
                            "rows changed after this constraint validated "
                            "the table — the new rows were never checked",
                            e,
                        )
            return
        for e in between:
            if (
                e.get("data_change", True)
                or e.get("remove")
                or e.get("dv_add")
                or e.get("dv_remove")
            ):
                _conflict(
                    "a concurrent commit changed table state this "
                    "read-write plan depends on",
                    e,
                )
        # only benign metadata landed (refs, dropped constraints,
        # stats-allowlist changes): the plan stands

    def _commit(
        self,
        operation: str,
        add: list[str],
        remove: list[str],
        metadata: dict | None = None,
        data_change: bool = True,
        known_stats: dict | None = None,
        dv_add: list[str] | None = None,
        dv_remove: list[str] | None = None,
        writer_features: list[str] | None = None,
        reader_features: list[str] | None = None,
        txn: dict | None = None,
        read_version: int | None = None,
    ) -> int:
        """``known_stats`` maps an added rel to its precomputed
        (dir_stats, file_stats, file_sizes, file_rows) — carry dirs pass
        the source
        commit's recorded per-file entries through, so carrying N files
        is pure manifest arithmetic (zero footer reads), as _carry_dir
        advertises. A source predating the row-count manifest passes an
        empty rows map; the manifest-only COUNT falls back to one footer
        read per such file. ``dv_add``/``dv_remove`` track deletion-vector dirs
        (under ``_dv/``) the same way add/remove track data dirs.
        ``writer_features`` lets an operation declare NEW writer-protocol
        requirements this commit introduces (deletion-vector commits
        declare theirs automatically); the commit itself is guarded by
        the accumulated requirement set — EVERY write funnels here, so
        no path can bypass the writer-protocol check.

        ``txn`` ({"id", "coordinator"}) STAGES the commit under a
        multi-table transaction: it occupies a version slot immediately
        but contributes NO visible state until the coordinator records
        the txn committed (``MultiTableTxn``). A pending foreign txn
        blocks further commits — a later commit landing before the txn
        resolves would make the flip-to-visible retroactive, changing
        what an already-read version number means.

        ``read_version`` pins the SNAPSHOT the operation planned
        against. When commits landed between that version and the one
        this commit is about to mint, the CAS in ``_publish_commit``
        alone cannot see them (the version numbers differ, so no
        collision fires) — without the pin, a COW rewrite planned at v
        would silently erase a concurrent writer's v+1 (lost update) or
        resurrect its deleted rows. ``_check_snapshot_conflict`` applies
        the Delta-style conflict matrix: blind appends rebase freely,
        compactions rebase past non-overlapping data commits, every
        other read-write plan raises a retriable ``CommitConflictError``
        so ``retry_on_conflict`` replans against the new snapshot."""
        self._check_writer_features()
        commits = self._commits()
        pending = {
            e["txn"]["id"]
            for e in commits
            if e.get("_txn_pending")
        }
        if pending - ({txn["id"]} if txn else set()):
            raise CommitConflictError(
                f"table has pending multi-table transaction(s) "
                f"{sorted(pending)} — commit or abort them first "
                "(committing past a pending txn would make its "
                "visibility flip retroactive)"
            )
        if txn is not None:
            # same-txn rewrite guard: every statement in a txn plans
            # against the PRE-transaction snapshot (its own staged
            # commits are neutered), so two rewriting plans on one
            # table would stage overlapping removes — double-retiring
            # dirs and resurrecting rewritten rows at the visibility
            # flip. Blind appends are order-independent and may repeat;
            # any combination involving a rewrite refuses.
            mine = [
                e
                for e in commits
                if e.get("_txn_pending") and e["txn"]["id"] == txn["id"]
            ]
            rewriting = bool(
                remove or dv_add or dv_remove or txn.get("exclusive")
            )
            if mine and (
                rewriting
                or any(e.get("_txn_staged_rewrite") for e in mine)
            ):
                raise CommitConflictError(
                    "this transaction already staged a write on this "
                    "table and one of the two is a REWRITE (DELETE/"
                    "UPDATE/TRUNCATE/OVERWRITE) — each statement plans "
                    "against the pre-transaction snapshot, so the "
                    "staged removes would conflict at the visibility "
                    "flip; repeated blind INSERTs are fine, otherwise "
                    "COMMIT and start a new transaction"
                )
        # latest derives from the SAME snapshot the conflict scan reads:
        # a second log listing here could see a commit the scan's list
        # lacks, and a plan would slip past both the matrix (entry not
        # in `commits`) and the CAS (different version number). With one
        # snapshot, any commit landing after it collides at os.link.
        latest = commits[-1]["version"] if commits else 0
        cks = self._checkpoints()
        if cks:
            latest = max(latest, cks[-1]["version"])
        if read_version is not None and latest > read_version:
            self._check_snapshot_conflict(
                read_version,
                latest,
                commits,
                operation=operation,
                remove=remove,
                dv_add=dv_add or [],
                dv_remove=dv_remove or [],
                data_change=data_change,
                identity_alloc=(metadata or {}).get("identity_alloc"),
                copy_add=(metadata or {}).get("copy_into_add"),
            )
        version = latest + 1
        known_stats = known_stats or {}
        harvested = {
            rel: known_stats.get(rel) or self._harvest_stats(rel)
            for rel in add
        }
        dv_files = self._harvest_dv_files(dv_add) if dv_add else None
        entry = {
            "version": version,
            "operation": operation,
            "add": add,
            "remove": remove,
            # False = a pure rewrite of existing rows (OPTIMIZE): readers
            # of the change feed / version-offset stream skip it — Delta's
            # dataChange flag
            "data_change": data_change,
            # wall-clock publish time (epoch seconds) — what TIMESTAMP AS
            # OF resolves against; informational only, never replayed into
            # table state, so clock skew can't corrupt anything
            "ts": _time.time(),
            "metadata": metadata or {},
            "stats": {rel: h[0] for rel, h in harvested.items()},
            # per-FILE manifest stats (basename → {col: [min, max, nulls]})
            # — what bounds pruning and COW at file, not commit, granularity
            "file_stats": {rel: h[1] for rel, h in harvested.items()},
            # per-FILE byte sizes (basename → bytes) — what lets stream
            # triggers budget by BYTES (maxBytesPerTrigger: a 10-file
            # commit of 1 GB files and of 1 KB files must not plan
            # identically), OPTIMIZE select dirs by bytes without
            # listing the filesystem, and VACUUM dry-run report
            # reclaimable bytes. One int per file: manifest growth is
            # negligible next to the stats maps
            "file_sizes": {rel: h[2] for rel, h in harvested.items()},
            # per-FILE exact row counts (basename → rows) — what answers
            # COUNT(*) from the manifest alone (one JSON read at 100 TB,
            # zero data-file opens); carries from pre-row-count commits
            # contribute empty maps and fall back to a footer read
            "file_rows": {
                rel: (h[3] if len(h) > 3 else {})
                for rel, h in harvested.items()
            },
            # deletion-vector dirs this commit activates/retires (absent
            # keys read as [] — commits from before the MOR path replay
            # unchanged)
            "dv_add": dv_add or [],
            "dv_remove": dv_remove or [],
            # per-vector-dir distinct data-file basenames (rel →
            # [basename]) — lets the change feed place a range's deletes
            # by pure manifest arithmetic instead of a distinct-collect
            # job over the vectors; absent (old commits, or a vector too
            # big to harvest driver-side) falls back to that job
            **({"dv_files": dv_files} if dv_files is not None else {}),
            # multi-table transaction marker: staged under this txn,
            # visible only once its coordinator records it committed
            **({"txn": txn} if txn else {}),
            # reader-protocol declaration: features a reader must
            # implement to resolve this commit's snapshot correctly
            "features": sorted(
                set(reader_features or [])
                | ({"deletion-vectors"} if dv_add or dv_remove else set())
                # an old reader would apply a staged commit's state
                # before (or despite never) the txn committing
                | ({"txn-markers"} if txn else set())
            ),
            # writer-protocol declaration: NEW requirements this commit
            # places on future writers (accumulated monotonically by
            # writer_features(); vector commits declare theirs here too —
            # an old writer COW-rewriting a vector-carrying file without
            # subtracting it would resurrect deleted rows)
            "writer_features": sorted(
                set(writer_features or [])
                | ({"deletion-vectors"} if dv_add or dv_remove else set())
                # an old writer lacks the pending-txn guard and could
                # land a commit past an unresolved txn (retroactive flip)
                | ({"txn-markers"} if txn else set())
            ),
        }
        tmp = os.path.join(self._log_dir(), f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        self._publish_commit(
            tmp, os.path.join(self._log_dir(), f"{version:08d}.json")
        )
        if version % CHECKPOINT_EVERY == 0:
            # DEFER the fold while any txn is unresolved (incl. one this
            # commit just staged): a checkpoint folding a pending txn's
            # neutered state would permanently exclude its adds if the
            # txn later commits — the raw commit would sit below the
            # checkpoint floor, which replay skips. The fold happens at
            # the next multiple after resolution.
            if not any(e.get("_txn_pending") for e in self._commits()):
                self._write_checkpoint(version)
        return version

    def _publish_commit(self, tmp: str, final: str) -> None:
        """THE atomicity primitive — the single swap site a multi-writer
        deployment overrides. ``os.link`` + unlink has rename's atomicity
        but FAILS LOUDLY (EEXIST) on a version collision instead of
        silently overwriting — the local analog of Delta's LogStore /
        Iceberg's catalog compare-and-swap, which replace exactly this
        call. A crashed-and-retried writer therefore surfaces a
        ``CommitConflictError`` (retriable: re-read the log, rebase,
        re-commit) rather than dropping the raced commit. Everything else
        — log replay, checkpoints, stats, pruning — is unchanged by that
        swap."""
        try:
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            raise CommitConflictError(
                f"version file {os.path.basename(final)} already exists — "
                "a concurrent (or crashed-and-retried) writer committed "
                "this version first; re-read the log and retry the "
                "operation against the new snapshot"
            ) from None
        os.unlink(tmp)

    def _write_checkpoint(self, version: int) -> None:
        """Fold the log into one snapshot file so readers replay O(N %
        CHECKPOINT_EVERY) commits instead of O(N) — Delta's checkpoint
        parquet, reduced to JSON. Commit files OLDER than a checkpoint
        become droppable (log retention); time travel before the oldest
        surviving state is then gone, the same trade VACUUM makes for
        data."""
        live, stats, file_stats, file_sizes = self._replay(version)
        live_set = set(live)
        snap = {
            "version": version,
            "live": live,
            # prune stats to LIVE dirs: replay from this checkpoint never
            # needs a dead dir's stats (earlier versions replay from an
            # earlier checkpoint or the raw commits, which still carry
            # theirs), and without the prune checkpoints grow with total
            # HISTORICAL file count — unbounded for an overwrite-per-batch
            # streaming sink
            "stats": {d: s for d, s in stats.items() if d in live_set},
            "file_stats": {
                d: s for d, s in file_stats.items() if d in live_set
            },
            "file_sizes": {
                d: s for d, s in file_sizes.items() if d in live_set
            },
            "file_rows": {
                d: r
                for d, r in self._replay_file_rows(version).items()
                if d in live_set and r
            },
            # fold the active constraint set and refs too: replay-from-
            # checkpoint must reproduce ALL table state, and retention may
            # drop the commits that added these
            "constraints": self.constraints(version),
            "stats_columns": self.stats_columns(version),
            "refs": self.refs(version),
            "layout": self.layout(version),
            # the column mapping is table state like constraints are: a
            # replay that lost it would surface physical names (or
            # resurrect dropped columns)
            "column_mapping": self.column_mapping(version),
            # the widening map too: a replay that lost it would scan the
            # mixed-era files with a narrow (crashing) schema
            "type_widening": self.type_widening(version),
            # generated-column rules: a replay that lost them would stop
            # computing/validating the column on writes
            "generated": self.generated_columns(version),
            # identity declarations + high watermarks: a lost watermark
            # would reissue already-committed ids after retention
            "identity": self.identity_columns(version),
            # the bloom-index spec (sidecars themselves live beside the
            # data; only the declaration is log state)
            "bloom_columns": self.bloom_columns(version),
            # the row-tracking flag (its watermark folds with identity)
            "row_tracking": self.row_tracking(version),
            # COPY INTO's loaded-file registry: retention must never
            # forget a loaded file, or a re-run would duplicate its rows
            "copy_into": self.copied_files(version),
            # live deletion-vector dirs are table state exactly like live
            # data dirs: a replay that lost them would resurrect deleted rows
            "dvs": self._live_dvs(version),
        }
        # fold the protocol too: retention may drop the commits that
        # declared a feature, but the checkpoint STATE still requires it
        snap["features"] = sorted(
            ({"deletion-vectors"} if snap["dvs"] else set())
            | ({"column-mapping"} if snap["column_mapping"] else set())
            | ({"type-widening"} if snap["type_widening"] else set())
        )
        # writer features are monotone table state (never retracted), so
        # the fold carries the full accumulated set — an old writer must
        # refuse even after retention drops the declaring commits
        snap["writer_features"] = sorted(self.writer_features(version))
        n_files = len(
            {
                (rel, f)
                for rel, m in snap["file_stats"].items()
                for f in m
            }
            | {
                (rel, f)
                for rel, m in snap["file_sizes"].items()
                for f in m
            }
        )
        if n_files >= PARQUET_MANIFEST_MIN_FILES:
            # externalize the per-file maps to a parquet manifest sidecar
            # (written FIRST: a crash between sidecar and JSON leaves an
            # orphan parquet no checkpoint references — harmless, exactly
            # like a torn data write)
            mname = f"{version:08d}.checkpoint.manifest.parquet"
            self._write_manifest_parquet(
                snap["file_stats"],
                snap["file_sizes"],
                snap["file_rows"],
                mname,
            )
            snap["file_stats"] = {}
            snap["file_sizes"] = {}
            snap["file_rows"] = {}
            snap["manifest"] = mname
        tmp = os.path.join(self._log_dir(), f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(snap, f)
        # checkpoints are derived state (idempotent content for a given
        # version), so colliding writers publish identical bytes — a
        # collision here is benign and swallowed, unlike commit files
        try:
            self._publish_commit(
                tmp,
                os.path.join(
                    self._log_dir(), f"{version:08d}.checkpoint.json"
                ),
            )
        except CommitConflictError:
            pass

    def _write_manifest_parquet(
        self, file_stats: dict, file_sizes: dict, file_rows: dict, name: str
    ) -> None:
        """One row per (dir, file): rel, file, size_bytes, rows, stats
        (the
        per-file column-stats map as a JSON cell — stats values are
        heterogeneous across columns, and the manifest's consumers
        rebuild the same dicts the JSON checkpoint would carry).
        Published via tmp + atomic replace; content is derived state, so
        concurrent checkpointers write identical bytes."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rels: list[str] = []
        files: list[str] = []
        sizes: list = []
        nrows: list = []
        stats: list = []
        for rel in sorted(set(file_stats) | set(file_sizes) | set(file_rows)):
            st = file_stats.get(rel) or {}
            sz = file_sizes.get(rel) or {}
            rw = file_rows.get(rel) or {}
            for f in sorted(set(st) | set(sz) | set(rw)):
                rels.append(rel)
                files.append(f)
                sizes.append(sz.get(f))
                nrows.append(rw.get(f))
                stats.append(json.dumps(st[f]) if f in st else None)
        table = pa.table(
            {
                "rel": pa.array(rels, pa.string()),
                "file": pa.array(files, pa.string()),
                "size_bytes": pa.array(sizes, pa.int64()),
                "rows": pa.array(nrows, pa.int64()),
                "stats": pa.array(stats, pa.string()),
            }
        )
        tmp = os.path.join(
            self._log_dir(), f".tmp-{uuid.uuid4().hex}.parquet"
        )
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self._log_dir(), name))

    def _read_manifest_parquet(self, name: str) -> tuple[dict, dict, dict]:
        """(file_stats, file_sizes, file_rows) rebuilt from a
        checkpoint's parquet
        manifest sidecar. A missing sidecar fails LOUDLY: the JSON
        checkpoint externalized its per-file maps there, so replaying
        without it would silently lose pruning/COW bounds AND byte
        budgets — and retention may have dropped the raw commits that
        could rebuild them. Sidecars written before the row-count
        manifest lack the ``rows`` column — their rows map is empty and
        the manifest-only COUNT falls back to footer reads."""
        import pyarrow.parquet as pq

        full = os.path.join(self._log_dir(), name)
        if not os.path.isfile(full):
            raise ValueError(
                f"checkpoint references manifest sidecar {name}, which is "
                "missing — the log is corrupted (or the sidecar was "
                "deleted without its checkpoint); restore it or replay "
                "from raw commits before retention drops them"
            )
        t = pq.read_table(full)
        file_stats: dict = {}
        file_sizes: dict = {}
        file_rows: dict = {}
        nrows = (
            t.column("rows").to_pylist()
            if "rows" in t.column_names
            else [None] * t.num_rows
        )
        for rel, f, size, rw, st in zip(
            t.column("rel").to_pylist(),
            t.column("file").to_pylist(),
            t.column("size_bytes").to_pylist(),
            nrows,
            t.column("stats").to_pylist(),
        ):
            if st is not None:
                file_stats.setdefault(rel, {})[f] = json.loads(st)
            if size is not None:
                file_sizes.setdefault(rel, {})[f] = size
            if rw is not None:
                file_rows.setdefault(rel, {})[f] = rw
        return file_stats, file_sizes, file_rows

    def _replay(
        self, version: int | None = None
    ) -> tuple[list, dict, dict, dict]:
        """(live rel-dirs, dir stats, per-file stats, per-file byte
        sizes) at ``version``, replaying from the newest checkpoint
        at-or-before it rather than from the beginning. Commits written
        before the per-file manifest simply contribute nothing to
        ``file_stats``/``file_sizes`` — callers fall back to dir
        granularity (or a filesystem stat) for those dirs."""
        base = None
        for ck in self._checkpoints():
            if version is None or ck["version"] <= version:
                base = ck
        live: list[str] = list(base["live"]) if base else []
        stats: dict = dict(base["stats"]) if base else {}
        file_stats: dict = dict(base.get("file_stats", {})) if base else {}
        file_sizes: dict = dict(base.get("file_sizes", {})) if base else {}
        if base and base.get("manifest"):
            # large checkpoint: the per-file maps live in the parquet
            # manifest sidecar (the inline JSON maps are empty)
            m_stats, m_sizes, _ = self._read_manifest_parquet(
                base["manifest"]
            )
            file_stats.update(m_stats)
            file_sizes.update(m_sizes)
        floor = base["version"] if base else 0
        for entry in self._commits():
            if entry["version"] <= floor:
                continue
            if version is not None and entry["version"] > version:
                break
            live = [d for d in live if d not in set(entry["remove"])]
            live.extend(entry["add"])
            stats.update(entry.get("stats", {}))
            file_stats.update(entry.get("file_stats", {}))
            file_sizes.update(entry.get("file_sizes", {}))
        return live, stats, file_stats, file_sizes

    def _replay_file_rows(self, version: int | None = None) -> dict:
        """Per-file EXACT row counts (rel → {basename: rows}) at
        ``version``, replayed checkpoint-first exactly like ``_replay``
        — kept out of ``_replay``'s hot 4-tuple because only the
        manifest-only aggregates and the checkpoint fold consume it.
        Commits (and carry sources) from before the row-count manifest
        contribute nothing; their files fall back to one footer read
        each in ``manifest_count``."""
        base = None
        for ck in self._checkpoints():
            if version is None or ck["version"] <= version:
                base = ck
        rows: dict = dict(base.get("file_rows", {})) if base else {}
        if base and base.get("manifest"):
            _, _, m_rows = self._read_manifest_parquet(base["manifest"])
            rows.update(m_rows)
        floor = base["version"] if base else 0
        for entry in self._commits():
            if entry["version"] <= floor:
                continue
            if version is not None and entry["version"] > version:
                break
            rows.update(entry.get("file_rows", {}))
        return rows

    def _live_dirs(self, version: int | None = None) -> list[str]:
        live, _, _, _ = self._replay(version)
        return [os.path.join(self.path, _DATA, d) for d in live]

    def _live_dvs(self, version: int | None = None) -> list[str]:
        """Live deletion-vector dirs (rel names under ``_dv/``) at
        ``version``, replayed exactly like live data dirs: from the
        newest checkpoint at-or-before the version, then the commits'
        dv_add/dv_remove. Pre-MOR commits and checkpoints contribute
        nothing (missing keys read as empty)."""
        base = None
        for ck in self._checkpoints():
            if version is None or ck["version"] <= version:
                base = ck
        dvs: list[str] = list(base.get("dvs", [])) if base else []
        floor = base["version"] if base else 0
        for entry in self._commits():
            if entry["version"] <= floor:
                continue
            if version is not None and entry["version"] > version:
                break
            rm = set(entry.get("dv_remove", []))
            dvs = [d for d in dvs if d not in rm]
            dvs.extend(entry.get("dv_add", []))
        return dvs

    def _live_sets_at(
        self, versions: list[int]
    ) -> tuple[set[str], set[str]]:
        """(live data-dir basenames, live dv rel-dirs) UNIONED over the
        given sorted versions, in ONE forward replay: start from the
        newest checkpoint at-or-before the oldest wanted version, apply
        commits in order, and snapshot both live sets as each wanted
        version is reached. Equivalent to ∪_v _live_dirs(v) ∪-paired
        with ∪_v _live_dvs(v), but O(commits) instead of O(versions)
        full replays — vacuum's retention scan on a long log."""
        keep: set[str] = set()
        dv_keep: set[str] = set()
        if not versions:
            return keep, dv_keep
        base = None
        for ck in self._checkpoints():
            if ck["version"] <= versions[0]:
                base = ck
        live: list[str] = list(base["live"]) if base else []
        dvs: list[str] = list(base.get("dvs", [])) if base else []
        floor = base["version"] if base else 0
        commits = [e for e in self._commits() if e["version"] > floor]
        i = 0
        for v in versions:
            while i < len(commits) and commits[i]["version"] <= v:
                e = commits[i]
                rm = set(e["remove"])
                live = [d for d in live if d not in rm]
                live.extend(e["add"])
                dv_rm = set(e.get("dv_remove", []))
                dvs = [d for d in dvs if d not in dv_rm]
                dvs.extend(e.get("dv_add", []))
                i += 1
            keep.update(live)
            dv_keep.update(dvs)
        return keep, dv_keep

    def _apply_dv(self, df: DataFrame, dvs: list[str]) -> DataFrame:
        """Subtract the deletion vectors from a parquet scan: anti-join on
        (file basename, row position) via the scan's ``_metadata`` struct.
        The vector side is tiny by construction (positions, not rows) —
        an explicit broadcast keeps the scan side shuffle-free, so a MOR
        read costs one map-side anti-join over the plan COW would run
        anyway. No-op (same plan object) when no vectors are live."""
        if not dvs:
            return df
        from pyspark.sql import functions as F

        dv = self._read_dvs(dvs)
        orig = df.columns
        return (
            df.withColumn("__dv_file", F.col("_metadata.file_name"))
            .withColumn("__dv_pos", F.col("_metadata.row_index").cast("long"))
            .join(
                F.broadcast(
                    dv.select(
                        F.col("file").alias("__dv_file"),
                        F.col("pos").cast("long").alias("__dv_pos"),
                    )
                ),
                ["__dv_file", "__dv_pos"],
                "left_anti",
            )
            .select(*orig)
        )

    def _write_dv_dir(self, df: DataFrame, version_hint: int) -> str:
        """Write a (file string, pos long) deletion-vector frame as one
        small parquet dir under ``_dv/``; returns the rel name."""
        rel = f"v{version_hint}-{uuid.uuid4().hex[:8]}"
        dest = os.path.join(self.path, _DV, rel)
        try:
            df.coalesce(1).write.mode("overwrite").parquet(dest)
        except BaseException:
            # a failed write job may leave a partial staging dir; it is
            # invisible to every reader (uncommitted), but sweep it so a
            # failure doesn't leak disk (ADVICE r11)
            import shutil

            shutil.rmtree(dest, ignore_errors=True)
            raise
        return rel

    def _read_dvs(self, rel_dirs: list[str]) -> DataFrame:
        """Scan deletion-vector dirs with their fixed ``(file, pos)``
        schema pinned explicitly — every vector is written by
        ``_write_dv_dir`` with exactly this shape, and an explicit
        schema skips the footer-inference job a bare ``read.parquet``
        runs at DataFrame-build time (once per DML/read on a vector-
        carrying table)."""
        return self.spark.read.schema("file string, pos bigint").parquet(
            *[os.path.join(self.path, _DV, d) for d in rel_dirs]
        )

    def _harvest_dv_files(
        self, rel_dirs: list[str], budget_bytes: int = 64 * 1024 * 1024
    ) -> dict[str, list[str]] | None:
        """Distinct data-file basenames each vector dir references
        (rel → sorted [basename]), read driver-side off the vector
        parquet's dictionary-encoded ``file`` column at COMMIT time —
        the change feed then places a range's deletes by manifest
        arithmetic alone, with no distinct-collect Spark job per feed
        build. Returns None (key omitted; readers fall back to the
        distributed distinct) past ``budget_bytes`` of vector bytes —
        a nightly GDPR sweep's vectors can be arbitrarily large, and
        an unbounded driver read would be the scale bug this manifest
        exists to avoid."""
        import glob as _glob

        try:
            import pyarrow.parquet as pq

            total = 0
            out: dict[str, list[str]] = {}
            for rel in rel_dirs:
                names: set[str] = set()
                for f in sorted(
                    _glob.glob(
                        os.path.join(self.path, _DV, rel, "*.parquet")
                    )
                ):
                    total += os.path.getsize(f)
                    if total > budget_bytes:
                        return None
                    col = pq.read_table(f, columns=["file"]).column("file")
                    names.update(col.unique().to_pylist())
                out[rel] = sorted(names)
            return out
        except Exception:  # noqa: BLE001 — harvest is advisory
            return None

    def _live_stats(self, version: int | None = None) -> dict:
        """{relative dir: {col: [min, max]}} for the snapshot's live dirs."""
        live, stats, _, _ = self._replay(version)
        return {d: stats.get(d, {}) for d in live}

    def writer_features(self, version: int | None = None) -> set[str]:
        """Writer-protocol requirements accumulated at ``version`` (latest
        by default): the union of every commit's ``writer_features``
        declarations plus the newest covering checkpoint's fold.
        Monotone by design — dropping a constraint does not retract
        ``check-constraints`` (Delta's rule: retraction would let a
        writer racing the drop publish a stale-featured commit)."""
        base = None
        for ck in self._checkpoints():
            if version is None or ck["version"] <= version:
                base = ck
        feats: set[str] = set(base.get("writer_features", [])) if base else set()
        floor = base["version"] if base else 0
        for entry in self._commits():
            if entry["version"] <= floor:
                continue
            if version is not None and entry["version"] > version:
                break
            feats.update(entry.get("writer_features", []))
        return feats

    def _check_writer_features(self) -> None:
        """Refuse to PUBLISH a commit against a table whose log requires
        a writer feature this code does not implement. Writing on would
        create wrong state, not just read it wrongly: an old writer
        appends rows that bypass active CHECK constraints, or rewrites a
        vector-carrying file without subtracting the vector (resurrected
        rows). Reads are unaffected — reader-only processes never hit
        this guard. The write-side analog of ``_check_features``; the
        reference's analog is its eager early validation
        (SparkCaller.java:401-404)."""
        unknown = self.writer_features() - SUPPORTED_WRITER_FEATURES
        if unknown:
            raise UnsupportedTableFeatureError(
                f"table {self.path} requires writer feature(s) "
                f"{sorted(unknown)}; this writer supports "
                f"{sorted(SUPPORTED_WRITER_FEATURES)} — upgrade the writer "
                "before publishing commits to this table (reading remains "
                "safe)"
            )

    def _fold_state(self, version: int | None, seed, apply_md):
        """The shared checkpoint-then-commits metadata fold every
        versioned-state accessor (constraints, layout, mapping, widening,
        generated/identity/bloom/row-tracking, refs) runs: seed from the
        newest checkpoint at-or-before ``version`` (``seed(base)``,
        base=None when no checkpoint qualifies), then apply each later
        in-range commit's metadata in order (``apply_md(state, md)``).
        One definition means one place for any future replay-semantics
        change (e.g. a new txn rule) instead of nine copies."""
        base = None
        for ck in self._checkpoints():
            if version is None or ck["version"] <= version:
                base = ck
        state = seed(base)
        floor = base["version"] if base else 0
        for entry in self._commits():
            if entry["version"] <= floor:
                continue
            if version is not None and entry["version"] > version:
                break
            state = apply_md(state, entry.get("metadata") or {})
        return state

    def constraints(self, version: int | None = None) -> dict:
        """Active CHECK constraints ``{name: sql_expr}`` at ``version``
        (latest by default). Constraint ops live in commit METADATA
        (data_change=False commits add/drop them; a clone bootstraps the
        full set via ``constraints_set``) and are folded into checkpoints
        alongside the live-dir list, so replay stays O(N mod
        CHECKPOINT_EVERY) and log retention can't lose them."""
        def apply(active: dict, md: dict) -> dict:
            if "constraints_set" in md:
                active = dict(md["constraints_set"])
            op = md.get("constraint")
            if op:
                if op["op"] == "add":
                    active[op["name"]] = op["expr"]
                else:
                    active.pop(op["name"], None)
            return active

        return self._fold_state(
            version,
            lambda b: dict(b.get("constraints", {})) if b else {},
            apply,
        )

    def add_constraint(self, name: str, expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT ``name`` CHECK (``expr``): existing
        rows must already satisfy it (one validation scan now — Delta's
        rule), and every subsequent append/overwrite/merge validates its
        incoming batch before committing (Delta invariants). SQL CHECK
        semantics: NULL/unknown passes; only expr IS FALSE violates.
        Recorded as a data_change=False metadata commit, so the change
        feed and version-offset stream skip it like a compaction."""
        # Eager SYNTAX check so a malformed expression fails HERE, not at
        # the first append against an empty table (F.expr parses lazily).
        # Column resolution still waits for data — an empty table has no
        # schema to resolve against. Internal-parser access degrades
        # gracefully: only a genuine ParseException rejects the add.
        try:
            parser = self.spark._jsparkSession.sessionState().sqlParser()
            parser.parseExpression(expr)
        except Exception as e:  # noqa: BLE001 — classify, don't swallow
            if "ParseException" in type(e).__name__ or "PARSE_SYNTAX" in str(
                e
            ):
                raise ValueError(
                    f"constraint expression does not parse: {expr!r}"
                ) from e
        if name in self.constraints():
            raise ValueError(f"constraint {name!r} already exists")
        rv = self.latest_version()
        if self._live_dirs():
            self._validate(self.read(merge_schema=True), {name: expr})
        return self._commit(
            "add_constraint",
            add=[],
            remove=[],
            metadata={"constraint": {"op": "add", "name": name, "expr": expr}},
            data_change=False,
            # rows landing between the validation scan and this commit
            # were never checked — the conflict matrix replans on them
            read_version=rv,
            # a writer unaware of constraints would append violating rows
            # and publish — the exact silent-wrongness class the writer
            # protocol exists for; declare the requirement with the state
            writer_features=["check-constraints"],
        )

    def drop_constraint(self, name: str) -> int:
        if name not in self.constraints():
            raise ValueError(f"constraint {name!r} does not exist")
        return self._commit(
            "drop_constraint",
            add=[],
            remove=[],
            metadata={"constraint": {"op": "drop", "name": name}},
            data_change=False,
        )

    def stats_columns(self, version: int | None = None) -> list | None:
        """The manifest-stats column allowlist active at ``version``
        (None = every column gets per-file stats, the default). Like
        constraints, the setting lives in commit METADATA and is folded
        into checkpoints, so log retention cannot lose it."""
        return self._fold_state(
            version,
            lambda b: b.get("stats_columns") if b else None,
            lambda active, md: (
                md["stats_columns_set"]
                if "stats_columns_set" in md
                else active
            ),
        )

    def set_stats_columns(self, cols: list | None) -> int:
        """Bound manifest/checkpoint growth on a very wide or very large
        table: restrict per-FILE [min,max,null_count] harvesting to
        ``cols`` (the clustering/partitioning axes pruning actually
        uses). Commit/checkpoint JSON then grows with |files| x |cols|
        instead of |files| x |schema|. Columns OUTSIDE the list degrade
        exactly like pre-manifest commits already do: reads keep
        unpruned files conservatively, file-level COW falls back to
        rewriting, correctness unchanged (pinned by test). ``None``
        restores full harvesting. Applies to stats recorded by LATER
        commits only — already-recorded stats are history, exactly like
        schema evolution. Recorded as a data_change=False metadata
        commit (the change feed and version-offset stream skip it)."""
        if cols is not None:
            cols = list(cols)
            if not cols:
                raise ValueError(
                    "set_stats_columns: pass a non-empty list, or None "
                    "to restore full-stat harvesting"
                )
        return self._commit(
            "set_stats_columns",
            add=[],
            remove=[],
            metadata={"stats_columns_set": cols},
            data_change=False,
        )

    def generated_columns(self, version: int | None = None) -> dict:
        """Active generated-column rules ``{column_lower: sql_expr}`` at
        ``version`` (latest by default) — Delta's generated columns.
        Rules live in commit METADATA like constraints (a clone
        bootstraps the full map via ``generated_set``) and fold into
        checkpoints, so log retention cannot lose them."""
        def apply(active: dict, md: dict) -> dict:
            if "generated_set" in md:
                active = dict(md["generated_set"] or {})
            op = md.get("generated")
            if op:
                if op["op"] == "add":
                    active[op["col"].lower()] = op["expr"]
                else:
                    active.pop(op["col"].lower(), None)
            return active

        return self._fold_state(
            version,
            lambda b: dict(b.get("generated", {})) if b else {},
            apply,
        )

    def set_generated_column(self, col: str, expr: str) -> int:
        """Declare ``col`` GENERATED ALWAYS AS (``expr``) — Delta's
        generated columns. From this commit on, every write computes the
        column when the incoming frame lacks it and VALIDATES it
        (null-safe equality with the expression) when the frame provides
        it, so the stored values are the expression by construction —
        which is what makes filtering on the generated column prunable:
        it is a physical column with per-file manifest stats, typically
        declared as a clustering axis (``set_layout``) so `date(ts)`
        style predicates skip files without any expression rewrite.

        If the column already exists in the live schema, its current
        values must already equal the expression (one validation scan —
        the add is refused otherwise, like ``add_constraint``).
        UPDATE refuses direct assignments to a generated column and
        recomputes it after applying the SET clause. Commits declare
        the ``generated-columns`` WRITER feature (an old writer would
        land the column NULL or stale); a metadata-only,
        data_change=False commit."""
        import re as _re

        try:
            parser = self.spark._jsparkSession.sessionState().sqlParser()
            parser.parseExpression(expr)
        except Exception as e:  # noqa: BLE001 — classify, don't swallow
            if "ParseException" in type(e).__name__ or "PARSE_SYNTAX" in str(
                e
            ):
                raise ValueError(
                    f"generation expression does not parse: {expr!r}"
                ) from e
        if col.lower() in self.generated_columns():
            raise ValueError(
                f"column {col!r} already has a generation expression — "
                "drop_generated_column it first"
            )
        if _re.search(
            rf"(?i)(?<![A-Za-z0-9_]){_re.escape(col)}(?![A-Za-z0-9_])", expr
        ):
            raise ValueError(
                f"generation expression for {col!r} references the "
                "column itself"
            )
        # generation expressions must be DETERMINISTIC (Delta's rule,
        # for the same reason the reference restricts them): UPDATE
        # recomputes every generated column during its COW rewrite, so a
        # rand()/current_timestamp() expression would silently change
        # UNTOUCHED rows on every rewrite, and _validate would spuriously
        # reject frames that provide the column. Refuse at declaration.
        nondet = (
            # function-call forms (a bare identifier like a column named
            # "now" is not a call and stays legal)
            _re.search(
                r"(?i)(?<![A-Za-z0-9_])("
                r"rand|randn|random|uuid|shuffle|randstr|uniform|now|"
                r"curdate|monotonically_increasing_id|spark_partition_id|"
                r"input_file_name|input_file_block_start|"
                r"input_file_block_length"
                r")\s*\(",
                expr,
            )
            # niladic SQL forms, legal without parens
            or _re.search(
                r"(?i)(?<![A-Za-z0-9_])"
                r"(current_timestamp|current_date|localtimestamp)"
                r"(?![A-Za-z0-9_])",
                expr,
            )
            # unix_timestamp() with NO argument reads the current clock
            or _re.search(
                r"(?i)(?<![A-Za-z0-9_])unix_timestamp\s*\(\s*\)", expr
            )
        )
        if nondet:
            raise ValueError(
                f"generation expression for {col!r} uses nondeterministic "
                f"function {nondet.group(0)!r} — generated columns are "
                "recomputed on every rewrite, so the expression must be "
                "deterministic"
            )
        rv = self.latest_version()
        live = self._live_dirs()
        if live and col.lower() in self._logical_columns(
            [os.path.basename(p) for p in live]
        ):
            from pyspark.sql import functions as F

            bad = (
                self.read(merge_schema=True)
                .filter(~F.col(col).eqNullSafe(F.expr(expr)))
                .limit(1)
                .count()
            )
            if bad:
                raise ValueError(
                    f"existing rows violate the generation expression "
                    f"({col} <=> {expr}); fix the data (or declare a "
                    "different expression) first"
                )
        return self._commit(
            "set_generated_column",
            add=[],
            remove=[],
            metadata={"generated": {"op": "add", "col": col, "expr": expr}},
            data_change=False,
            # rows landing between the validation scan and this commit
            # were never checked against the expression
            read_version=rv,
            writer_features=["generated-columns"],
        )

    def drop_generated_column(self, col: str) -> int:
        """Remove the generation rule — the column stays, as ordinary
        data (Delta's semantics: dropping the expression, not the
        bytes)."""
        if col.lower() not in self.generated_columns():
            raise ValueError(
                f"column {col!r} has no generation expression; active: "
                f"{sorted(self.generated_columns())}"
            )
        return self._commit(
            "drop_generated_column",
            add=[],
            remove=[],
            metadata={"generated": {"op": "drop", "col": col}},
            data_change=False,
        )

    def copied_files(self, version: int | None = None) -> dict:
        """Source-file identities COPY INTO already ingested:
        ``{absolute path: [size_bytes, mtime_ns]}``. Lives in commit
        METADATA (``copy_into_add`` per load; ``copy_into_set``
        bootstrap on clone) and folds into checkpoints like constraints
        do — log retention must never forget a loaded file, or a
        re-run of the same COPY would silently duplicate its rows."""

        def apply(active: dict, md: dict) -> dict:
            if "copy_into_set" in md:
                active = dict(md["copy_into_set"] or {})
            if "copy_into_add" in md:
                active = {**active, **md["copy_into_add"]}
            return active

        return self._fold_state(
            version,
            lambda b: dict(b.get("copy_into") or {}) if b else {},
            apply,
        )

    def copy_into(
        self,
        source: str,
        format: str = "parquet",
        options: dict | None = None,
        force: bool = False,
    ) -> dict:
        """Idempotent batch file ingestion — Delta's COPY INTO. ``source``
        is a file, directory, or glob; every matched file is ingested
        EXACTLY ONCE, keyed on its identity (absolute path + size +
        mtime_ns) recorded in commit metadata: re-running the same COPY
        is a no-op (``num_skipped_files``), and a crash anywhere before
        the single commit leaves nothing recorded, so the re-run simply
        does the work again — no duplicate rows, no completion logic.

        A matched file whose recorded identity CHANGED (same path, new
        size/mtime) refuses loudly — silently re-ingesting would
        duplicate the old rows, silently skipping would lose the new
        ones; ``force=True`` re-ingests every matched file regardless
        (Delta's FORCE copy option). Two concurrent COPYs of overlapping
        files cannot both land: the blind-append conflict matrix treats
        overlapping ``copy_into_add`` paths like concurrent identity
        allocation, and the loser replans (its files then skip as
        already loaded).

        Non-parquet formats read under the table's own schema when one
        exists (schema-on-read pinned to the target, minus engine-
        assigned identity/generated columns); all ingested files land as
        ONE append commit through the standard write funnel, so
        constraints validate and identity/generated columns assign
        exactly like any other write. Returns ``{"version",
        "num_loaded_files", "num_skipped_files"}``."""
        import glob as _glob

        fmt = format.lower()
        if fmt not in ("parquet", "csv", "json", "orc"):
            raise ValueError(
                f"copy_into: unsupported FILEFORMAT {format!r} "
                "(parquet|csv|json|orc)"
            )
        if any(ch in source for ch in "*?["):
            # same marker-file filter as the directory branch: a glob
            # like '<dir>/*' must not ingest _SUCCESS/.crc sidecars (or
            # behave differently from COPY INTO t FROM '<dir>')
            cands = sorted(
                p
                for p in _glob.glob(source)
                if os.path.isfile(p)
                and not os.path.basename(p).startswith((".", "_"))
            )
        elif os.path.isdir(source):
            cands = sorted(
                os.path.join(source, n)
                for n in os.listdir(source)
                if not n.startswith((".", "_"))
                and os.path.isfile(os.path.join(source, n))
            )
        elif os.path.isfile(source):
            cands = [source]
        else:
            cands = []  # nothing there (yet/anymore): an idempotent no-op
        for _attempt in range(5):
            loaded = self.copied_files()
            new: list[str] = []
            ident: dict = {}
            changed: list[str] = []
            skipped = 0
            for p in cands:
                ap = os.path.abspath(p)
                st = os.stat(p)
                ide = [st.st_size, st.st_mtime_ns]
                rec = loaded.get(ap)
                if rec is not None and not force:
                    if list(rec) != ide:
                        changed.append(ap)
                    else:
                        skipped += 1
                    continue
                new.append(ap)
                ident[ap] = ide
            if changed:
                raise ValueError(
                    f"copy_into: source file(s) {changed[:3]} changed "
                    "since they were loaded (size/mtime differ) — "
                    "re-ingesting would duplicate their old rows; pass "
                    "force=True to reload them deliberately"
                )
            if not new:
                return {
                    "version": self.latest_version(),
                    "num_loaded_files": 0,
                    "num_skipped_files": skipped,
                }
            reader = self.spark.read.format(fmt)
            for k, v in (options or {}).items():
                reader = reader.option(k, v)
            if fmt != "parquet":
                try:
                    base = self.read(merge_schema=True)
                except ValueError:
                    pass  # no schema yet: reader options/inference decide
                else:
                    from pyspark.sql import types as T

                    ids = set(self.identity_columns())
                    gen = set(self.generated_columns())
                    reader = reader.schema(
                        T.StructType(
                            [
                                f
                                for f in base.schema.fields
                                if f.name.lower() not in ids | gen
                            ]
                        )
                    )
            df = reader.load(new)
            try:
                v = self.append(df, metadata={"copy_into_add": ident})
            except CommitConflictError:
                continue  # a concurrent COPY overlapped: replan — its
                # files now read as loaded and skip
            return {
                "version": v,
                "num_loaded_files": len(new),
                "num_skipped_files": skipped,
            }
        raise CommitConflictError(
            "copy_into: could not land after 5 replans (sustained "
            "concurrent ingestion of overlapping files)"
        )

    def bloom_columns(self, version: int | None = None) -> dict | None:
        """The bloom-index spec active at ``version``:
        ``{"cols": [...], "fpp": float}`` or None. Like the stats
        allowlist, it applies to writes FROM the declaring commit on;
        files written before it (and carry dirs, which hard-link without
        a rewrite) simply have no bloom and degrade to "maybe" — so no
        reader or writer protocol feature is needed: absence is always
        conservative."""
        return self._fold_state(
            version,
            lambda b: b.get("bloom_columns") if b else None,
            lambda active, md: (
                md["bloom_columns_set"]
                if "bloom_columns_set" in md
                else active
            ),
        )

    def set_bloom_columns(
        self, cols: list | None, fpp: float = 0.01
    ) -> int:
        """Declare a per-FILE bloom index on ``cols`` — Delta's bloom
        filter index, as manifest-adjacent sidecars. Every dir written
        from this commit on gets one small parquet under ``_bloom/``
        holding a bitmap per (file, column), built by ONE extra
        column-pruned pass over the just-written batch (an Arrow-batched
        grouped-map job — the writer-side price Delta also pays).
        Equality prunes (``read(prune=(col, v, v))``) then drop files
        whose bloom proves the value absent — the needle-in-100-TB
        lookup on a high-cardinality UNSORTED column that min/max stats
        cannot prune (stats prune ranges; blooms prune points).
        ``None`` stops building blooms for future writes."""
        if cols is not None:
            cols = [c.lower() for c in cols]
            if not cols:
                raise ValueError(
                    "set_bloom_columns: pass a non-empty list, or None "
                    "to stop building blooms"
                )
            if not (0 < fpp < 1):
                raise ValueError(f"set_bloom_columns: fpp in (0,1), got {fpp}")
        return self._commit(
            "set_bloom_columns",
            add=[],
            remove=[],
            metadata={
                "bloom_columns_set": (
                    {"cols": cols, "fpp": fpp} if cols is not None else None
                )
            },
            data_change=False,
        )

    def _build_bloom_sidecar(self, rel: str, spec: dict) -> None:
        """One Arrow-batched pass over the just-written dir ``rel``:
        per (file, column) bloom bitmaps, written as a small parquet
        sidecar under ``_bloom/<rel>``. Double hashing (Kirsch-
        Mitzenmacher): bit positions are ``(h1 + i*h2) mod m`` from two
        xxhash64 values computed JVM-side on the STORED column type —
        the probe recomputes the same two hashes, so build and probe
        can never diverge on type coercion."""
        import math

        from pyspark.sql import functions as F

        path = os.path.join(self.path, _DATA, rel)
        scan = self._scan([path])
        byname = {c.lower(): c for c in scan.columns}
        # spec columns are declared LOGICAL; files store physical names
        l2p = logical_to_physical(self.column_mapping())
        cols = [
            byname[p]
            for p in (l2p.get(c, c) for c in spec["cols"])
            if p in byname
        ]
        if not cols:
            return
        fpp = spec["fpp"]
        sel = [F.col("_metadata.file_name").alias("__file")]
        dtypes = {}
        for c in cols:
            dtypes[c] = dict(scan.dtypes)[c]
            sel.append(F.xxhash64(F.col(c)).alias(f"__h1_{c}"))
            sel.append(F.xxhash64(F.lit("bloom2"), F.col(c)).alias(f"__h2_{c}"))
        hashed = scan.select(*sel)

        def build(pdf):
            import numpy as np
            import pandas as pd

            n = len(pdf)
            out = []
            # size for the file's ACTUAL row count; m rounded to bytes
            m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
            m = ((m + 7) // 8) * 8
            k = max(1, round(m / max(n, 1) * math.log(2)))
            for c in cols:
                bits = np.zeros(m // 8, dtype=np.uint8)
                h1 = pdf[f"__h1_{c}"].to_numpy(dtype="int64") % m
                h2 = pdf[f"__h2_{c}"].to_numpy(dtype="int64") % m
                for i in range(k):
                    pos = (h1 + i * h2) % m
                    np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
                out.append(
                    (pdf["__file"].iloc[0], c, n, m, k, bits.tobytes(),
                     dtypes[c])
                )
            return pd.DataFrame(
                out, columns=["file", "col", "n", "m", "k", "bits", "dtype"]
            )

        result = hashed.groupBy("__file").applyInPandas(
            build,
            "file string, col string, n long, m long, k int, "
            "bits binary, dtype string",
        )
        result.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.path, _BLOOM, rel)
        )

    def _bloom_maybe_contains(
        self, rels: list[str], col: str, value
    ) -> dict:
        """``{file_basename: False}`` for every file whose bloom PROVES
        ``value`` absent from physical column ``col`` (files without a
        bloom are simply not in the map — "maybe"). Sidecars are tiny
        (one bitmap per file); reading them is driver-side pyarrow, no
        Spark job. The probe's two hashes run as one 1-row JVM job so
        they coerce the value exactly like the build did."""
        import glob as _glob

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        entries = []  # (file, n, m, k, bits, dtype)
        for rel in rels:
            side = os.path.join(self.path, _BLOOM, rel)
            if not os.path.isdir(side):
                continue
            for f in sorted(_glob.glob(os.path.join(side, "*.parquet"))):
                t = pq.read_table(f).to_pylist()
                entries.extend(
                    e for e in t if e["col"].lower() == col.lower()
                )
        if not entries:
            return {}
        hashes = {}
        for dtype in {e["dtype"] for e in entries}:
            row = (
                self.spark.range(1)
                .select(
                    F.xxhash64(F.lit(value).cast(dtype)).alias("h1"),
                    F.xxhash64(
                        F.lit("bloom2"), F.lit(value).cast(dtype)
                    ).alias("h2"),
                )
                .first()
            )
            hashes[dtype] = (row.h1, row.h2)
        out = {}
        for e in entries:
            h1, h2 = hashes[e["dtype"]]
            m, k = e["m"], e["k"]
            bits = e["bits"]
            a, b = h1 % m, h2 % m
            hit = True
            for i in range(k):
                pos = (a + i * b) % m
                if not (bits[pos // 8] >> (pos % 8)) & 1:
                    hit = False
                    break
            if not hit:
                out[e["file"]] = False
        return out

    def identity_columns(self, version: int | None = None) -> dict:
        """Active identity columns at ``version``:
        ``{column_lower: {"start": int, "step": int, "high": int|None}}``
        — Delta's GENERATED ALWAYS AS IDENTITY. ``high`` is the highest
        value any committed write has allocated (None before the first
        allocation); the declaration and every allocation live in commit
        METADATA and fold into checkpoints, so the watermark survives
        log retention — reusing an id after retention would be silent
        key duplication."""
        def apply(active: dict, md: dict) -> dict:
            if "identity_set" in md:
                active = {
                    k: dict(v) for k, v in (md["identity_set"] or {}).items()
                }
            op = md.get("identity")
            if op:
                active[op["col"].lower()] = {
                    "start": op["start"],
                    "step": op["step"],
                    "high": None,
                }
            for col, high in (md.get("identity_alloc") or {}).items():
                if col in active:
                    cur = active[col]["high"]
                    step = active[col]["step"]
                    # max/min by step direction: watermarks are monotone
                    if cur is None or (
                        high > cur if step > 0 else high < cur
                    ):
                        active[col]["high"] = high
            return active

        return self._fold_state(
            version,
            lambda b: (
                {k: dict(v) for k, v in (b.get("identity") or {}).items()}
                if b
                else {}
            ),
            apply,
        )

    def set_identity_column(
        self, col: str, start: int = 1, step: int = 1
    ) -> int:
        """Declare ``col`` GENERATED ALWAYS AS IDENTITY (START WITH
        ``start`` INCREMENT BY ``step``) — Delta's identity columns.
        Every subsequent append/overwrite ASSIGNS the column (a frame
        providing it is refused — ALWAYS semantics): values are unique
        and follow the step direction, but are NOT gap-free (Delta's
        documented contract) — each row gets
        ``base + step * (monotonically_increasing_id() + 1)``, a pure
        per-row JVM expression with no shuffle and no driver loop, and
        the commit records the batch's high watermark harvested from
        the WRITTEN files' footers (metadata-only), so the next write
        allocates strictly past it regardless of executor scheduling.
        Two writers allocating concurrently from the same watermark
        would collide — the snapshot-isolation matrix makes the second
        one replan (identity allocation disqualifies the blind-append
        rebase). The column must be NEW (not in the live schema):
        adopting existing values would inherit unknown duplicates."""
        if step == 0:
            raise ValueError("set_identity_column: step must be non-zero")
        if col.lower() in self.identity_columns():
            raise ValueError(f"column {col!r} is already an identity column")
        if col.lower() in self.generated_columns():
            raise ValueError(
                f"column {col!r} has a generation expression — a column "
                "cannot be both generated and identity"
            )
        live = self._live_dirs()
        if live and col.lower() in self._logical_columns(
            [os.path.basename(p) for p in live]
        ):
            raise ValueError(
                f"column {col!r} already exists in the live schema — "
                "identity columns must be NEW (existing values could "
                "hide duplicates the watermark never issued)"
            )
        return self._commit(
            "set_identity_column",
            add=[],
            remove=[],
            metadata={
                "identity": {"col": col, "start": start, "step": step}
            },
            data_change=False,
            writer_features=["identity-columns"],
        )

    def row_tracking(self, version: int | None = None) -> bool:
        """Whether row tracking is enabled at ``version`` — Delta's row
        tracking: every row carries a hidden stable id (``__row_id``)
        assigned at first write and PRESERVED across COW rewrites, so
        the change feed can pair an update's pre/post images and
        incremental consumers can follow a row through rewrites."""
        return self._fold_state(
            version,
            lambda b: bool(b.get("row_tracking")) if b else False,
            lambda active, md: (
                bool(md["row_tracking_set"])
                if "row_tracking_set" in md
                else active
            ),
        )

    def enable_row_tracking(self) -> int:
        """Enable row tracking (one metadata commit, empty table only —
        backfilling ids onto existing files would either rewrite them or
        mint unstable ids at each read). Internally ``__row_id`` is a
        hidden IDENTITY column, so the watermark machinery — footer
        harvest, checkpoint fold, clone carry, and the concurrent-
        allocation conflict — is shared with A41. Ordinary ``read()``
        hides the column; ``read(with_row_ids=True)`` (and the change
        feed on tracked tables) surfaces it. Commits declare the
        ``row-tracking`` writer feature: an old writer's appends would
        land NULL ids, silently breaking the uniqueness contract."""
        if self.row_tracking():
            raise ValueError("row tracking is already enabled")
        # zero-ROW, not zero-commit: SQL CREATE TABLE pins its schema
        # with an empty data dir, and refusing that shape would make
        # CREATE TABLE + ENABLE ROW TRACKING impossible to sequence
        if self._live_dirs() and not self.read().isEmpty():
            raise ValueError(
                "row tracking must be enabled on an EMPTY table — "
                "existing files have no ids to carry (create a new "
                "tracked table and append this one's rows)"
            )
        return self._commit(
            "enable_row_tracking",
            add=[],
            remove=[],
            metadata={
                "row_tracking_set": True,
                "identity": {"col": _ROWID, "start": 1, "step": 1},
            },
            data_change=False,
            writer_features=["identity-columns", "row-tracking"],
        )

    def _mint_row_ids(self, df: DataFrame) -> DataFrame:
        """Fill NULL ``__row_id`` slots with fresh ids past the
        watermark (merge inserts); non-NULL (inherited) ids pass
        through. Same allocation expression as ``_assign_identity``."""
        from pyspark.sql import functions as F

        spec = self.identity_columns()[_ROWID]
        base = (
            spec["high"]
            if spec["high"] is not None
            else spec["start"] - spec["step"]
        )
        fresh = (
            F.lit(base)
            + F.lit(spec["step"])
            * (F.monotonically_increasing_id() + F.lit(1))
        ).cast("long")
        return df.withColumn(
            _ROWID, F.coalesce(F.col(_ROWID).cast("long"), fresh)
        )

    def _assign_identity(self, df: DataFrame, ids: dict) -> DataFrame:
        """Assign every declared identity column (refusing frames that
        provide one — GENERATED ALWAYS). Values are
        ``base + step * (mono_id + 1)`` with base = high watermark (or
        start - step before the first allocation): unique within the
        batch by monotonically_increasing_id's construction, unique
        across batches because the next base is this batch's recorded
        high."""
        from pyspark.sql import functions as F

        have = {c.lower() for c in df.columns}
        provided = sorted(c for c in ids if c in have)
        if provided:
            raise ValueError(
                f"column(s) {provided} are GENERATED ALWAYS AS IDENTITY "
                "— the engine assigns them; remove them from the frame"
            )
        cols = {}
        for col, spec in ids.items():
            base = (
                spec["high"]
                if spec["high"] is not None
                else spec["start"] - spec["step"]
            )
            cols[col] = (
                F.lit(base)
                + F.lit(spec["step"])
                * (F.monotonically_increasing_id() + F.lit(1))
            ).cast("long")
        return df.withColumns(cols)

    def _harvest_identity_high(self, rel: str, ids: dict) -> dict:
        """Per-column extreme actually WRITTEN to dir ``rel``, read from
        parquet footers (metadata-only — the files were just written by
        this operation). Footer stats, not a Spark job: the watermark
        must reflect the bytes on disk, not a recomputation that a
        nondeterministic re-evaluation could skew."""
        import glob as _glob

        import pyarrow.parquet as pq

        out: dict = {}
        for f in sorted(
            _glob.glob(os.path.join(self.path, _DATA, rel, "*.parquet"))
        ):
            pf = pq.ParquetFile(f)
            schema_names = [c.name for c in pf.schema_arrow]
            meta = pf.metadata
            for col, spec in ids.items():
                try:
                    idx = [n.lower() for n in schema_names].index(col)
                except ValueError:
                    continue
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"identity watermark harvest: {f} has no "
                            f"min/max statistics for {col!r} — refusing "
                            "to commit an allocation with an unknown high"
                        )
                    ext = st.max if spec["step"] > 0 else st.min
                    cur = out.get(col)
                    if cur is None or (
                        ext > cur if spec["step"] > 0 else ext < cur
                    ):
                        out[col] = ext
        return out

    def _fill_generated(self, df: DataFrame) -> DataFrame:
        """Compute every generated column the frame lacks (write-side,
        single funnel backstop) — frames that already carry the column
        are validated instead (``_validate``)."""
        rules = self.generated_columns()
        if not rules:
            return df
        from pyspark.sql import functions as F

        have = {c.lower() for c in df.columns}
        missing = {
            col: F.expr(expr)
            for col, expr in rules.items()
            if col not in have
        }
        return df.withColumns(missing) if missing else df

    def layout(self, version: int | None = None) -> dict | None:
        """The clustered-layout spec active at ``version`` (None = no
        declared layout). Iceberg's partition-spec evolution reduced to
        write-side clustering: ``{"cluster_by": [cols...],
        "target_files": N|None}``. Replayed like stats_columns
        (metadata commits + checkpoint fold)."""
        return self._fold_state(
            version,
            lambda b: b.get("layout") if b else None,
            lambda active, md: (
                md["layout_set"] if "layout_set" in md else active
            ),
        )

    def set_layout(
        self,
        cluster_by: list[str] | None,
        target_files: int | None = None,
    ) -> int:
        """PARTITION EVOLUTION as a metadata commit (Iceberg's
        partition-spec evolution, Delta's clustered tables): declare the
        clustering axes for FUTURE writes. Every subsequent data write
        (append/overwrite/merge/update rewrites, OPTIMIZE folds) range-
        repartitions + sorts on ``cluster_by`` before landing, so new
        files carry tight disjoint per-file [min, max] manifest stats on
        those axes and manifest pruning cuts scans to the matching
        files. OLD dirs are untouched and stay readable — a mixed-era
        snapshot reads as one table, old files just prune conservatively
        until the next OPTIMIZE re-clusters them. Re-layout on a new key
        is therefore one JSON commit, never a 100 TB rewrite-now.
        ``target_files`` bounds files per write (None = keep the
        incoming partition count). ``cluster_by=None`` clears the
        layout. Declares the ``clustered-layout`` WRITER feature: an
        old writer would land unclustered files that silently degrade
        the layout contract readers budget scans by."""
        rv = self.latest_version()
        if cluster_by is not None:
            cluster_by = list(cluster_by)
            if not cluster_by:
                raise ValueError(
                    "set_layout: pass non-empty cluster_by, or None to "
                    "clear the layout"
                )
            if target_files is not None and target_files < 1:
                raise ValueError("set_layout: target_files must be >= 1")
            live, _, _, _ = self._replay(None)
            if live:
                # declared-but-unmaterialized generated/identity columns
                # are legal clustering axes: the write funnel computes
                # them on every data write, so the very first clustered
                # file already carries the column
                have = (
                    set(self._logical_columns(live))
                    | set(self.generated_columns())
                    | set(self.identity_columns())
                )
                missing = [c for c in cluster_by if c.lower() not in have]
                if missing:
                    raise ValueError(
                        f"set_layout: unknown column(s) {missing}; table "
                        f"has {sorted(have)}"
                    )
        spec = (
            None
            if cluster_by is None
            else {"cluster_by": cluster_by, "target_files": target_files}
        )
        return self._commit(
            "set_layout",
            add=[],
            remove=[],
            metadata={"layout_set": spec},
            data_change=False,
            # two concurrent layout declarations are last-writer-wins by
            # value; the pin makes the loser replan instead (the matrix
            # conflicts on any intervening write-invalidating op)
            read_version=rv,
            writer_features=(["clustered-layout"] if spec else []),
        )

    # -- column mapping (metadata-only rename/drop) -------------------------

    def column_mapping(self, version: int | None = None) -> dict | None:
        """The column mapping active at ``version`` (None = never
        activated; logical == physical). Delta's column mapping /
        Iceberg's field-id resolution reduced to a name table: files
        store immutable PHYSICAL names; users query LOGICAL names;
        ``rename_column``/``drop_column`` update the table in a
        data_change=False metadata commit — at 100 TB a column rename
        must not rewrite the table. Replayed like constraints
        (metadata commits + checkpoint fold)."""
        return self._fold_state(
            version,
            lambda b: b.get("column_mapping") if b else None,
            lambda mapping, md: (
                md["column_mapping_set"]
                if "column_mapping_set" in md
                else mapping
            ),
        )

    @staticmethod
    def _to_logical(df: DataFrame, mapping: dict | None) -> DataFrame:
        """Project a PHYSICAL-schema frame (a raw parquet scan) to the
        mapping's logical schema: mapped physicals are aliased to their
        logical names, dropped physicals vanish, unmapped columns (late
        schema evolution, internal helper columns) pass through
        unchanged. No-op without a mapping."""
        if not mapping:
            return df
        from pyspark.sql import functions as F

        phys2log = {
            f["physical"].lower(): f["name"] for f in mapping["fields"]
        }
        dropped = {d.lower() for d in mapping.get("dropped", [])}
        out = []
        for c in df.columns:
            cl = c.lower()
            if cl in dropped:
                continue
            if cl in phys2log:
                out.append(F.col(c).alias(phys2log[cl]))
            else:
                out.append(F.col(c))
        return df.select(*out)

    @staticmethod
    def _to_physical(df: DataFrame, mapping: dict | None) -> DataFrame:
        """Rename a LOGICAL-schema frame to physical names for writing —
        every data dir stores physical names, so files are homogeneous
        across renames and a rename never rewrites them. Unmapped
        columns (schema evolution) keep their names: physical == logical
        until a later rename lazily registers them."""
        if not mapping:
            return df
        from pyspark.sql import functions as F

        log2phys = {
            f["name"].lower(): f["physical"] for f in mapping["fields"]
        }
        return df.select(
            *[
                F.col(c).alias(log2phys[c.lower()])
                if c.lower() in log2phys
                else F.col(c)
                for c in df.columns
            ]
        )

    def _table_schema_names(self, live: list[str]) -> list[str]:
        """Ordered PHYSICAL column names across the live dirs (first-seen
        order: first dir's footer order, later dirs' new columns
        appended) — one footer read per dir, no Spark job."""
        import glob

        import pyarrow.parquet as pq

        names: list[str] = []
        seen: set[str] = set()
        for rel in live:
            files = sorted(
                glob.glob(os.path.join(self.path, _DATA, rel, "*.parquet"))
            )
            if not files:
                continue
            for n in pq.ParquetFile(files[0]).schema_arrow.names:
                if n.lower() not in seen:
                    seen.add(n.lower())
                    names.append(n)
        return names

    def _bootstrap_mapping(self) -> dict:
        """The current mapping, deep-copied for editing — bootstrapped
        from the live footers (physical == logical, ids assigned in
        schema order) on first use."""
        m = self.column_mapping()
        if m is not None:
            return json.loads(json.dumps(m))  # deep copy, JSON-safe
        live, _, _, _ = self._replay(None)
        cols = self._table_schema_names(live)
        if not cols:
            raise ValueError(
                "column mapping needs an existing schema — write data "
                "before renaming/dropping columns"
            )
        return {
            "fields": [
                {"id": i + 1, "name": c, "physical": c}
                for i, c in enumerate(cols)
            ],
            "dropped": [],
            "next_id": len(cols) + 1,
        }

    def _commit_mapping(
        self,
        operation: str,
        mapping: dict,
        extra_metadata: dict | None = None,
        read_version: int | None = None,
    ) -> int:
        md: dict = {"column_mapping_set": mapping}
        if extra_metadata:
            md.update(extra_metadata)
        return self._commit(
            operation,
            add=[],
            remove=[],
            metadata=md,
            data_change=False,
            # the mapping is a whole-state rewrite bootstrapped from the
            # caller's read — a concurrent rename/drop would be silently
            # reverted without the pin (the matrix conflicts on any
            # intervening write-invalidating op and replans)
            read_version=read_version,
            # an old reader would surface physical names / resurrect
            # dropped columns; an old writer would write files under
            # logical names, splitting the physical schema
            reader_features=["column-mapping"],
            writer_features=["column-mapping"],
        )

    def _mapping_field(self, mapping: dict, name: str) -> dict:
        """The mapping field for logical ``name``, lazily registering a
        post-bootstrap evolved column (physical == logical) so it too
        can be renamed/dropped."""
        for f in mapping["fields"]:
            if f["name"].lower() == name.lower():
                return f
        live, _, _, _ = self._replay(None)
        dropped = {d.lower() for d in mapping.get("dropped", [])}
        mapped_phys = {f["physical"].lower() for f in mapping["fields"]}
        for c in self._table_schema_names(live):
            if (
                c.lower() == name.lower()
                and c.lower() not in dropped
                and c.lower() not in mapped_phys
            ):
                field = {"id": mapping["next_id"], "name": c, "physical": c}
                mapping["next_id"] += 1
                mapping["fields"].append(field)
                return field
        raise ValueError(
            f"column {name!r} does not exist; table has "
            f"{[f['name'] for f in mapping['fields']]}"
        )

    def _refuse_constrained_column(self, name: str, verb: str) -> None:
        import re

        pat = re.compile(rf"(?i)(?<![A-Za-z0-9_]){re.escape(name)}(?![A-Za-z0-9_])")
        hits = {
            cname: expr
            for cname, expr in self.constraints().items()
            if pat.search(expr)
        }
        if hits:
            raise ValueError(
                f"cannot {verb} column {name!r}: referenced by CHECK "
                f"constraint(s) {sorted(hits)} — drop them first (their "
                "expressions would silently stop resolving)"
            )
        # generated-column rules pin names the same two ways: the rule's
        # own column, and any base column its expression reads
        gen = self.generated_columns()
        gen_hits = sorted(
            col
            for col, expr in gen.items()
            if col == name.lower() or pat.search(expr)
        )
        if gen_hits:
            raise ValueError(
                f"cannot {verb} column {name!r}: bound to generated "
                f"column rule(s) {gen_hits} — drop_generated_column "
                "first (the rule would silently stop resolving)"
            )
        # identity columns are engine-assigned state keyed by name
        if name.lower() in self.identity_columns():
            raise ValueError(
                f"cannot {verb} column {name!r}: it is an IDENTITY "
                "column (its watermark is keyed by name)"
            )

    def rename_column(self, old: str, new: str) -> int:
        """ALTER TABLE RENAME COLUMN — a METADATA-ONLY commit: the field
        keeps its id and physical name, only the logical name changes,
        so zero data files are rewritten and pre-rename files (and
        their deletion vectors, keyed by basename) stay valid. Time
        travel before the rename surfaces the old name (the mapping is
        versioned state); the change feed and streams resolve requested
        logical names through the mapping, so a stream declared with
        the NEW name reads files written before the rename correctly.
        Commits declare the ``column-mapping`` reader AND writer
        feature: an old reader would mis-project, an old writer would
        split the physical schema. TOP-LEVEL columns only (a
        struct-typed column renames as a unit; renaming a field INSIDE
        a struct is not supported — restructure with an expression
        instead), matching the engine's DDL surface."""
        self._check_writer_features()
        rv = self.latest_version()
        m = self._bootstrap_mapping()
        field = self._mapping_field(m, old)
        if new.lower() != old.lower():
            taken = {f["name"].lower() for f in m["fields"]}
            live, _, _, _ = self._replay(None)
            dropped = {d.lower() for d in m.get("dropped", [])}
            mapped_phys = {f["physical"].lower() for f in m["fields"]}
            unmapped = {
                c.lower()
                for c in self._table_schema_names(live)
                if c.lower() not in mapped_phys and c.lower() not in dropped
            }
            if new.lower() in taken or new.lower() in unmapped:
                raise ValueError(
                    f"cannot rename {old!r} to {new!r}: a column of that "
                    "name already exists"
                )
        self._refuse_constrained_column(old, "rename")
        field["name"] = new
        # an active clustered layout naming the OLD logical name must
        # follow the rename IN THE SAME COMMIT — otherwise every future
        # write's byname lookup misses and files silently land
        # unclustered while the table still declares the
        # clustered-layout writer feature readers budget scans by
        extra = None
        layout = self.layout()
        if layout and any(
            k.lower() == old.lower() for k in layout["cluster_by"]
        ):
            spec = dict(layout)
            spec["cluster_by"] = [
                new if k.lower() == old.lower() else k
                for k in layout["cluster_by"]
            ]
            extra = {"layout_set": spec}
        return self._commit_mapping(
            "rename_column", m, extra, read_version=rv
        )

    def drop_column(self, name: str) -> int:
        """ALTER TABLE DROP COLUMN — metadata-only: the physical column
        stays in every existing file (time travel still reads it); the
        mapping's ``dropped`` list makes every current-version read
        project it away. At 100 TB dropping a column costs one JSON
        commit, not a table rewrite; the bytes come back at the next
        OPTIMIZE (whose rewrite materializes the logical schema)."""
        self._check_writer_features()
        rv = self.latest_version()
        m = self._bootstrap_mapping()
        field = self._mapping_field(m, name)
        if len(m["fields"]) == 1:
            # the mapping registers post-bootstrap evolved columns
            # lazily, so its field list can understate the live logical
            # width — count the real remaining columns (live physical
            # schema minus dropped minus this field) before refusing
            live, _, _, _ = self._replay(None)
            dropped = {d.lower() for d in m.get("dropped", [])}
            remaining = [
                c
                for c in self._table_schema_names(live)
                if c.lower() not in dropped
                and c.lower() != field["physical"].lower()
            ]
            if not remaining:
                raise ValueError("cannot drop the table's last column")
        layout = self.layout()
        if layout and any(
            k.lower() == name.lower() for k in layout["cluster_by"]
        ):
            raise ValueError(
                f"cannot drop column {name!r}: it is a clustering key of "
                "the active layout — clear or re-declare the layout "
                "(set_layout) first, or future writes could not cluster"
            )
        self._refuse_constrained_column(name, "drop")
        m["fields"].remove(field)
        m["dropped"].append(field["physical"])
        return self._commit_mapping("drop_column", m, read_version=rv)

    # -- type widening (metadata-only ALTER COLUMN TYPE) ---------------------

    def type_widening(self, version: int | None = None) -> dict:
        """The TYPE-WIDENING map active at ``version``: {lower-cased
        PHYSICAL column name: widened Spark DDL type}. Delta's type
        widening: ``widen_column`` records the wider type in a
        data_change=False metadata commit — zero data files rewritten —
        and every read scans with an EXPLICIT widened schema (Spark's
        parquet reader upcasts int→bigint / float→double natively), so
        pre-widen files surface the wide type. Keyed by physical name:
        renames are orthogonal (the mapping stays valid across them).
        Replayed like constraints/layout (metadata commits + checkpoint
        fold). Empty dict = never widened."""
        return self._fold_state(
            version,
            lambda b: dict(b.get("type_widening") or {}) if b else {},
            lambda widening, md: (
                dict(md["type_widening_set"])
                if "type_widening_set" in md
                else widening
            ),
        )

    def _physical_type(self, pcol: str) -> str:
        """Current FILE-LEVEL type of physical column ``pcol`` (Spark
        simpleString), from the first live footer that carries it — one
        metadata read, never row data."""
        import glob as _glob

        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        live, _, _, _ = self._replay(None)
        for rel in live:
            files = sorted(
                _glob.glob(os.path.join(self.path, _DATA, rel, "*.parquet"))
            )
            if not files:
                continue
            sch = from_arrow_schema(pq.ParquetFile(files[0]).schema_arrow)
            for f in sch.fields:
                if f.name.lower() == pcol:
                    return f.dataType.simpleString()
        raise ValueError(
            f"column {pcol!r} does not exist in any live data file"
        )

    def widen_column(self, col: str, new_type: str) -> int:
        """ALTER TABLE ALTER COLUMN TYPE — WIDENING only, as a
        METADATA-ONLY commit (the third leg of the evolution triad:
        add = schema evolution, rename/drop = column mapping, widen =
        this). The first time an int32 id overflows, the fix is one
        JSON commit, never a 100 TB rewrite: old files keep their
        narrow physical type and every read upcasts them through an
        explicit scan schema; writes FROM this commit cast up at the
        single write funnel so new files carry the wide type. Time
        travel before the widen surfaces the old type (the map is
        versioned state); the change feed and streams cast to their
        declared/newest schema. Declares the ``type-widening`` reader
        AND writer feature: an old reader's plain mixed-era scan would
        crash or mis-type; an old writer wouldn't upcast. Supported
        widenings: the lossless integer chain (tinyint→smallint→int→
        bigint) and float→double — exactly what Spark's vectorized
        parquet reader promotes natively. ``col`` is the LOGICAL name
        (resolved through any active column mapping)."""
        self._check_writer_features()
        rv = self.latest_version()
        from pyspark.sql.types import _parse_datatype_string

        try:
            target = _parse_datatype_string(new_type).simpleString()
        except Exception:
            raise ValueError(
                f"widen_column: cannot parse type {new_type!r}"
            ) from None
        mapping = self.column_mapping()
        pcol = logical_to_physical(mapping).get(col.lower(), col).lower()
        if mapping and col.lower() in {
            d.lower() for d in mapping.get("dropped", [])
        }:
            raise ValueError(f"column {col!r} was dropped")
        widening = self.type_widening()
        cur = widening.get(pcol) or self._physical_type(pcol)
        if target == cur:
            return self.latest_version()  # already that type: no-op
        allowed = _WIDEN_OK.get(cur, set())
        if target not in allowed:
            raise ValueError(
                f"cannot widen column {col!r} from {cur} to {target}; "
                f"supported widenings: "
                f"{ {k: sorted(v) for k, v in _WIDEN_OK.items()} } "
                "(narrowing or cross-family changes require a rewrite)"
            )
        widening = dict(widening)
        widening[pcol] = target
        return self._commit(
            "widen_column",
            add=[],
            remove=[],
            metadata={"type_widening_set": widening},
            data_change=False,
            # the whole-map rewrite bootstrapped from a stale read would
            # erase a concurrent widen — the pin makes it replan instead
            read_version=rv,
            # an old reader's plain scan crashes (or mis-types) on the
            # mixed-era files; an old writer would land narrow files and
            # never upcast reads
            reader_features=["type-widening"],
            writer_features=["type-widening"],
        )

    def _widened_schema(self, paths: list[str], widening: dict):
        """EXPLICIT scan schema for ``paths`` (data dirs or single
        parquet files): the first-seen footer union with the widening
        map's types overriding — what lets ONE ``spark.read.schema``
        scan span pre- and post-widen files (a plain or mergeSchema
        read raises CANNOT_MERGE_SCHEMAS on the int/bigint mix). One
        footer read per path, metadata only."""
        import glob as _glob

        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import (
            StructField,
            StructType,
            _parse_datatype_string,
        )

        fields: dict[str, StructField] = {}
        order: list[str] = []
        for p in paths:
            files = (
                [p]
                if p.endswith(".parquet")
                else sorted(_glob.glob(os.path.join(p, "*.parquet")))
            )
            if not files:
                continue
            sch = from_arrow_schema(pq.ParquetFile(files[0]).schema_arrow)
            for f in sch.fields:
                low = f.name.lower()
                if low not in fields:
                    fields[low] = f
                    order.append(low)
        for low, ddl in widening.items():
            if low in fields:
                fields[low] = StructField(
                    fields[low].name, _parse_datatype_string(ddl), True
                )
        return StructType([fields[c] for c in order])

    def _scan(
        self,
        paths: list[str],
        merge_schema: bool = False,
        version: int | None = None,
    ) -> DataFrame:
        """The single DATA-file scan helper every read/rewrite path
        funnels through: a plain ``spark.read.parquet`` (optionally
        mergeSchema) until a type widening is active at ``version``,
        then an explicit footer-unioned schema with the widened types —
        Spark's parquet reader upcasts the narrow files natively, where
        plain/mergeSchema reads would crash on the mixed-era table.
        (The explicit schema also unions evolved columns, so it
        subsumes mergeSchema.) Deletion-vector parquets are NOT data
        files and scan directly."""
        widening = self.type_widening(version)
        if widening:
            return self.spark.read.schema(
                self._widened_schema(paths, widening)
            ).parquet(*paths)
        # No widening: still pass an EXPLICIT schema from footer metadata —
        # schema inference (and mergeSchema doubly so) runs a Spark job at
        # DataFrame-build time, ~5x the latency of a driver-side footer
        # read locally, and a footer job over every file at 100 TB. Each
        # data dir holds one commit's homogeneous files, so one footer per
        # dir is exact: merge_schema unions first-seen fields across dirs
        # (same result as parquet mergeSchema on this format — evolution
        # only ever ADDS columns; conflicting types require a declared
        # widening, handled above); a plain read adopts the first
        # footer-bearing path's schema, the deterministic version of
        # Spark's sample-one-file inference. Any footer-harvest surprise
        # falls back to the inference reader.
        try:
            sch = self._widened_schema(
                paths if merge_schema else self._first_footer_path(paths),
                {},
            )
            if sch.fields:
                return self.spark.read.schema(sch).parquet(*paths)
        except Exception:  # noqa: BLE001 — fall back to inference
            pass
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    @staticmethod
    def _first_footer_path(paths: list[str]) -> list[str]:
        """First path that actually holds a parquet file (a zero-row
        write can land an empty dir) — the single-schema scan source."""
        import glob as _glob

        for p in paths:
            if p.endswith(".parquet") or _glob.glob(
                os.path.join(p, "*.parquet")
            ):
                return [p]
        return []

    def _validate(self, df: DataFrame, active: dict | None = None) -> None:
        """Reject ``df`` if any row fails any active constraint. ONE
        aggregate job counts violations for every constraint at once (the
        batch is about to be written anyway, so this is the one extra
        column-pruned pass Delta's invariant check also pays); the error
        names each violated constraint with its row count so the producer
        can fix data, not play twenty questions.

        Table columns the batch lacks (a schema-evolving merge's narrower
        updates) are aligned in as NULLs first, so a constraint on such a
        column evaluates exactly what a reader of the written rows will
        see — NULL, which CHECK semantics pass — instead of failing
        resolution."""
        from pyspark.sql import functions as F

        if active is None:
            active = dict(self.constraints())
            # generated columns the frame PROVIDES must equal their
            # expression (frames lacking them are computed by
            # _fill_generated instead) — same one-pass aggregate, named
            # so the error says which rule, with null-safe equality
            # (NULL <=> NULL holds; a NULL mismatch violates)
            have = {c.lower() for c in df.columns}
            for col, expr in self.generated_columns().items():
                if col in have:
                    active[f"generated:{col}"] = f"{col} <=> ({expr})"
        if not active:
            return
        live, _, _, _ = self._replay(None)
        if live:
            missing = self._logical_columns(live) - {
                c.lower() for c in df.columns
            }
            if missing:
                df = df.withColumns(
                    {c: F.lit(None) for c in sorted(missing)}
                )
        names = list(active)
        counts = df.agg(
            *[
                F.sum(
                    F.when(
                        ~F.coalesce(F.expr(active[n]), F.lit(True)), 1
                    ).otherwise(0)
                ).alias(f"c{i}")
                for i, n in enumerate(names)
            ]
        ).first()
        bad = {
            n: int(counts[i] or 0)
            for i, n in enumerate(names)
            if (counts[i] or 0) > 0
        }
        if bad:
            raise ConstraintViolationError(
                "write rejected — CHECK constraint violations: "
                + ", ".join(
                    f"{n} ({active[n]}): {c} rows" for n, c in bad.items()
                )
            )

    def refs(self, version: int | None = None) -> dict:
        """Named version tags ``{name: version}`` — Iceberg's refs/tags:
        a ref is a FROZEN pointer ('prod', 'eval-2026-08') that survives
        further writes, so consumers pin a blessed snapshot by name
        instead of circulating raw version numbers. Stored and replayed
        exactly like constraints (metadata commits + checkpoint fold)."""
        def apply(active: dict, md: dict) -> dict:
            op = md.get("ref")
            if op:
                if op["op"] == "set":
                    active[op["name"]] = op["version"]
                else:
                    active.pop(op["name"], None)
            return active

        return self._fold_state(
            version,
            lambda b: dict(b.get("refs", {})) if b else {},
            apply,
        )

    def set_ref(self, name: str, version: int | None = None) -> int:
        """Tag ``version`` (default: the current head) as ``name``,
        overwriting an existing tag of that name. data_change=False: the
        change feed and streams skip it."""
        target = version if version is not None else self.latest_version()
        if not 1 <= target <= self.latest_version():
            raise ValueError(
                f"cannot tag version {target}: table is at "
                f"v{self.latest_version()}"
            )
        return self._commit(
            "set_ref",
            add=[],
            remove=[],
            metadata={"ref": {"op": "set", "name": name, "version": target}},
            data_change=False,
        )

    def drop_ref(self, name: str) -> int:
        if name not in self.refs():
            raise ValueError(f"ref {name!r} does not exist")
        return self._commit(
            "drop_ref",
            add=[],
            remove=[],
            metadata={"ref": {"op": "drop", "name": name}},
            data_change=False,
        )

    def _resolve_as_of(self, as_of) -> int:
        """Version whose commit is the newest published at-or-before
        ``as_of`` (epoch seconds, datetime, or ISO string) — Delta's
        TIMESTAMP AS OF. Resolution uses the commit log's informational
        ``ts`` field; pre-``ts`` commits (older log formats) count as
        arbitrarily old, which can only resolve the query to an OLDER
        snapshot, never a too-new one."""
        import datetime

        if isinstance(as_of, str):
            try:
                as_of = float(as_of)  # "1723670000.5" — epoch seconds
            except ValueError:
                as_of = datetime.datetime.fromisoformat(as_of)
        if isinstance(as_of, datetime.datetime):
            if as_of.tzinfo is None:
                as_of = as_of.replace(tzinfo=datetime.timezone.utc)
            as_of = as_of.timestamp()
        best = None
        for entry in self._commits():
            if (entry.get("ts") or 0.0) <= as_of:
                best = entry["version"]
        if best is None:
            raise ValueError(
                f"no commit at or before {as_of!r} — the table did not "
                "exist yet"
            )
        return best

    def clone_to(
        self,
        dest_path: str,
        version: int | None = None,
        ref: str | None = None,
    ):
        """SHALLOW CLONE at ``version`` (latest by default): a NEW table
        whose first commit references the source snapshot's data by
        HARD-LINKING every live file — zero bytes copied, O(files)
        metadata ops, and stats carried from the source manifest (zero
        footer re-reads). Unlike Delta's shallow clone (a path reference
        the source's VACUUM silently breaks), shared inodes keep the data
        alive until the LAST referencing table vacuums it — each table
        then evolves and reclaims independently. Active constraints at
        the cloned version carry over (``constraints_set`` bootstrap).
        An object-store deployment swaps the links for a manifest listing
        source files plus retention coordination, exactly as it swaps
        _publish_commit for a CAS. Dest must be on the same filesystem
        and must not already be a table. ``ref`` clones a named tag
        instead of a raw version number; refs themselves are NOT carried
        (they name SOURCE version numbers, meaningless in the clone's
        own log)."""
        import glob

        if ref is not None:
            if version is not None:
                raise ValueError("pass at most one of version / ref")
            tags = self.refs()
            if ref not in tags:
                raise ValueError(f"unknown ref {ref!r}; have {sorted(tags)}")
            version = tags[ref]
        live, stats, file_stats, file_sizes = self._replay(version)
        if not live:
            raise ValueError(f"no snapshot at version {version} to clone")
        dest = VersionedTable(self.spark, dest_path)
        if dest._commits():
            raise ValueError(f"clone destination {dest_path} is not empty")
        known: dict = {}
        src_rows = self._replay_file_rows(version)
        for rel in live:
            src_dir = os.path.join(self.path, _DATA, rel)
            dst_dir = os.path.join(dest_path, _DATA, rel)
            os.makedirs(dst_dir)
            # bloom sidecars travel with the files they describe —
            # without them the clone's equality prunes degrade to maybe
            src_bloom = os.path.join(self.path, _BLOOM, rel)
            if os.path.isdir(src_bloom):
                dst_bloom = os.path.join(dest_path, _BLOOM, rel)
                os.makedirs(dst_bloom)
                for f in sorted(
                    glob.glob(os.path.join(src_bloom, "*.parquet"))
                ):
                    os.link(f, os.path.join(dst_bloom, os.path.basename(f)))
            sizes: dict = {}
            for f in sorted(glob.glob(os.path.join(src_dir, "*.parquet"))):
                os.link(f, os.path.join(dst_dir, os.path.basename(f)))
                sizes[os.path.basename(f)] = os.path.getsize(f)
            if rel in file_stats:
                known[rel] = (
                    stats.get(rel, {}),
                    file_stats[rel],
                    file_sizes.get(rel) or sizes,
                    src_rows.get(rel) or {},
                )
        # deletion vectors are PART of the snapshot: a clone that dropped
        # them would resurrect deleted rows. Vectors key on file basename,
        # which the hard links preserve — link the dirs, carry the state.
        dvs = self._live_dvs(version)
        for rel in dvs:
            src_dir = os.path.join(self.path, _DV, rel)
            dst_dir = os.path.join(dest_path, _DV, rel)
            os.makedirs(dst_dir)
            for f in sorted(glob.glob(os.path.join(src_dir, "*.parquet"))):
                os.link(f, os.path.join(dst_dir, os.path.basename(f)))
        resolved = version if version is not None else self.latest_version()
        src_mapping = self.column_mapping(version)
        src_widening = self.type_widening(version)
        dest._commit(
            "clone",
            add=list(live),
            remove=[],
            metadata={
                "clone_source": self.path,
                "clone_source_version": resolved,
                "constraints_set": self.constraints(version),
                "stats_columns_set": self.stats_columns(version),
                # the mapping is part of the snapshot: without it the
                # clone would surface physical names and resurrect
                # dropped columns
                "column_mapping_set": src_mapping,
                # the widening map too: a clone of a mixed-era table
                # without it reads the linked files with the NARROW
                # schema and crashes on the first wide file
                "type_widening_set": src_widening,
                # and the clustered layout: losing it would let the
                # clone land unclustered files while still declaring
                # the clustered-layout writer feature
                "layout_set": self.layout(version),
                # and the generated-column rules, for the same reason
                "generated_set": self.generated_columns(version),
                # and the identity declarations WITH their watermarks —
                # a clone reissuing the source's ids would collide on
                # the first downstream join of the two tables
                "identity_set": self.identity_columns(version),
                # and the bloom-index declaration (sidecars are linked
                # below beside the data files they describe)
                "bloom_columns_set": self.bloom_columns(version),
                # COPY INTO's loaded-file registry travels with the
                # clone: a COPY re-run against the fork must skip what
                # the source already ingested
                "copy_into_set": self.copied_files(version),
                # and the row-tracking flag (ids + watermark carry via
                # the data links and identity_set)
                "row_tracking_set": self.row_tracking(version),
            },
            known_stats=known,
            dv_add=dvs,
            reader_features=(
                (["column-mapping"] if src_mapping else [])
                + (["type-widening"] if src_widening else [])
            ),
            # carried state (constraints, vectors, mapping) carries its
            # writer-protocol requirements with it — a clone must not be
            # a loophole an old writer can append through
            writer_features=sorted(self.writer_features(version)),
        )
        return dest

    def _write_data_dir(self, df: DataFrame, version_hint: int) -> str:
        # the single data-write funnel. Generated columns are computed
        # FIRST (backstop — operation entry points fill before their
        # validation pass) so a declared clustered layout may cluster on
        # a generated column
        df = self._fill_generated(df)
        # Declared clustered layout next
        # (logical names): range-repartition + sort so every new file
        # carries tight disjoint manifest stats on the clustering axes —
        # partition evolution applies to writes FROM the declaring
        # commit on, old dirs stay as they were
        layout = self.layout()
        if layout:
            byname = {c.lower(): c for c in df.columns}
            keys = [byname.get(k.lower()) for k in layout["cluster_by"]]
            if not all(keys):
                # refuse loudly, like _refuse_constrained_column does for
                # constraints: silently landing unclustered files would
                # break the clustered-layout contract readers budget
                # scans by while the table still declares the feature
                missing = [
                    k
                    for k, r in zip(layout["cluster_by"], keys)
                    if r is None
                ]
                raise ValueError(
                    f"write is missing clustering key column(s) {missing} "
                    f"declared by the active layout {layout['cluster_by']} "
                    "— include them, or clear/re-declare the layout "
                    "(set_layout) first"
                )
            n = layout.get("target_files") or max(
                df.rdd.getNumPartitions(), 1
            )
            df = df.repartitionByRange(n, *keys).sortWithinPartitions(
                *keys
            )
        # column mapping second: frames arrive LOGICAL and files store
        # PHYSICAL names, so data written after a rename stays
        # homogeneous with data before it
        mapping = self.column_mapping()
        if mapping:
            dropped = {d.lower() for d in mapping.get("dropped", [])}
            logical = {f["name"].lower() for f in mapping["fields"]}
            # an UNMAPPED new column whose name matches a DROPPED
            # physical would land in files under that physical name —
            # and every read's drop-projection would silently hide it
            # (physical names here are original names, not Delta's
            # per-field UUIDs, so reuse must refuse loudly)
            bad = [
                c
                for c in df.columns
                if c.lower() in dropped and c.lower() not in logical
            ]
            if bad:
                raise ValueError(
                    f"column name(s) {bad} were DROPPED from this table; "
                    "their physical names are still reserved by existing "
                    "files (time travel reads them) — pick a different "
                    "name, or rename an existing column onto it "
                    "(rename_column maps it to a distinct physical)"
                )
            # a frame carrying a RENAMED column's old (physical) name
            # would collide with the mapped column at write time —
            # refuse with the logical name instead of a cryptic
            # duplicate-column error from the parquet writer
            phys2log = {
                f["physical"].lower(): f["name"]
                for f in mapping["fields"]
                if f["physical"].lower() != f["name"].lower()
            }
            stale = [
                c
                for c in df.columns
                if c.lower() in phys2log and c.lower() not in logical
            ]
            if stale:
                raise ValueError(
                    "write uses the old PHYSICAL name(s) "
                    f"{stale} of renamed column(s) — use the logical "
                    f"name(s) {[phys2log[c.lower()] for c in stale]}"
                )
        df = self._to_physical(df, mapping)
        # type widening third: writes FROM the widening commit cast up
        # at this single funnel, so every NEW file carries the widened
        # type (old files upcast at scan time via _scan's explicit
        # schema — the mixed era is read-side, never write-side)
        widening = self.type_widening()
        if widening:
            from pyspark.sql import functions as F

            casts = {
                c: F.col(c).cast(widening[c.lower()])
                for c in df.columns
                if c.lower() in widening
            }
            if casts:
                df = df.withColumns(casts)
        rel = f"v{version_hint}-{uuid.uuid4().hex[:8]}"
        dest = os.path.join(self.path, _DATA, rel)
        try:
            df.write.mode("overwrite").parquet(dest)
        except BaseException:
            # sweep the partial staging dir on a failed write job (it is
            # uncommitted, hence invisible — this is disk hygiene only)
            import shutil

            shutil.rmtree(dest, ignore_errors=True)
            raise
        # bloom index last: one extra column-pruned pass over the files
        # just written (the sidecar must describe the BYTES on disk, so
        # it reads them back rather than re-evaluating the frame)
        bloom = self.bloom_columns()
        if bloom:
            self._build_bloom_sidecar(rel, bloom)
        return rel

    def _table_columns(self, live: list[str]) -> set[str]:
        """Lower-cased union of column names across the live dirs, read
        from ONE parquet footer per dir (each dir holds a single write's
        homogeneous files) — metadata-only schema resolution for
        validation, no Spark job."""
        import glob

        import pyarrow.parquet as pq

        cols: set[str] = set()
        for rel in live:
            files = sorted(
                glob.glob(os.path.join(self.path, _DATA, rel, "*.parquet"))
            )
            if not files:
                continue
            # an unreadable footer fails LOUD: swallowing it would either
            # spuriously reject a correct updates frame (missing dir's
            # columns) or silently skip the validation this exists for
            schema = pq.ParquetFile(files[0]).schema_arrow
            cols.update(name.lower() for name in schema.names)
        return cols

    def _logical_columns(self, live: list[str]) -> set[str]:
        """``_table_columns`` projected through the column mapping:
        lower-cased LOGICAL names — what incoming (logical-schema)
        frames are compared against."""
        cols = self._table_columns(live)
        m = self.column_mapping()
        if not m:
            return cols
        phys2log = {
            f["physical"].lower(): f["name"].lower() for f in m["fields"]
        }
        dropped = {d.lower() for d in m.get("dropped", [])}
        return {phys2log.get(c, c) for c in cols if c not in dropped}

    def _carry_dir(
        self,
        src_rel: str,
        files: list[str],
        version_hint: int,
        src_file_stats: dict,
        src_file_rows: dict | None = None,
    ) -> tuple[str, tuple[dict, dict, dict, dict]]:
        """Hard-link the UNTOUCHED files of a partially-rewritten dir into
        a fresh dir — the 'keep' half of file-level COW without moving a
        byte of data (files are immutable, so sharing inodes is safe; an
        object-store deployment swaps this for a manifest that lists
        files individually, exactly as it swaps _publish_commit for a
        CAS). The old dir stays intact for time travel; VACUUM reclaims
        it later, and the link count keeps shared files alive until the
        LAST referencing dir is vacuumed. Returns (rel, (dir_stats,
        file_stats)) with the stats SLICED from the source commit's
        recorded entries — carrying is pure manifest arithmetic, zero
        footer reads — for _commit's ``known_stats`` pass-through."""
        new = f"v{version_hint}-carry-{uuid.uuid4().hex[:8]}"
        dst = os.path.join(self.path, _DATA, new)
        os.makedirs(dst)
        sizes: dict = {}
        for f in files:
            src = os.path.join(self.path, _DATA, src_rel, f)
            os.link(src, os.path.join(dst, f))
            # one stat per just-linked file: exact even when the source
            # commit predates the size manifest
            sizes[f] = os.path.getsize(src)
        fsub = {f: src_file_stats[f] for f in files}
        # rows carry only when the SOURCE commit recorded them (a footer
        # read here would break the zero-footer-reads carry contract);
        # missing entries fall back at manifest_count time
        rsub = {
            f: (src_file_rows or {})[f]
            for f in files
            if f in (src_file_rows or {})
        }
        return new, (_rollup_stats(fsub), fsub, sizes, rsub)

    def _harvest_stats(self, rel: str) -> tuple[dict, dict, dict, dict]:
        """(dir-level stats, per-FILE stats, per-FILE byte sizes, per-FILE
        row counts) for a
        data dir, harvested from the parquet FOOTERS the write already produced
        — no second scan, the Iceberg manifest-stats approach. int/float/
        str are kept as-is; DATE and TIMESTAMP stats are normalized to
        FIXED-WIDTH ISO strings (``_stat_key``), whose lexicographic order
        is chronological — so manifest pruning and file-level COW work on
        time keys, the commonest partitioning axis at 100 TB. A column
        with any stats-less row group is dropped for that FILE (a partial
        range would prune incorrectly), and consequently at the dir-level
        rollup. The per-file map (keyed by basename) is what lets pruning
        and COW act on ONE file instead of one commit's worth of files —
        a commit dir can hold many."""
        import glob

        import pyarrow.parquet as pq

        per_file: dict = {}
        sizes: dict = {}
        rows: dict = {}  # basename → exact row count (footer metadata)
        for f in sorted(
            glob.glob(os.path.join(self.path, _DATA, rel, "*.parquet"))
        ):
            mins: dict = {}
            maxs: dict = {}
            nulls: dict = {}  # per-column null count; None = unknown
            unsafe: set = set()
            md = pq.ParquetFile(f).metadata
            sizes[os.path.basename(f)] = os.path.getsize(f)
            rows[os.path.basename(f)] = md.num_rows
            if md.num_rows == 0:
                # zero-row part files (a many-task write artifact) carry
                # no data: omitting them from the manifest is safe — a
                # scan that skips them reads the same rows, and COW has
                # nothing to carry or rewrite — and keeps them from
                # poisoning the dir rollup's column intersection
                continue
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for i in range(row_group.num_columns):
                    col = row_group.column(i)
                    name = col.path_in_schema
                    st = col.statistics
                    try:
                        lo = (
                            _stat_key(st.min)
                            if st and st.has_min_max
                            else None
                        )
                        hi = (
                            _stat_key(st.max)
                            if st and st.has_min_max
                            else None
                        )
                    except NotImplementedError:
                        # pyarrow can't surface stats for some physical
                        # types (e.g. DECIMAL as FIXED_LEN_BYTE_ARRAY) —
                        # treat as stats-less, never crash the commit
                        lo = hi = None
                    if lo is None or hi is None:
                        unsafe.add(name)
                        continue
                    nc = st.null_count if st.has_null_count else None
                    if name not in nulls:
                        nulls[name] = nc
                    elif nulls[name] is not None:
                        nulls[name] = None if nc is None else nulls[name] + nc
                    if name not in mins or lo < mins[name]:
                        mins[name] = lo
                    if name not in maxs or hi > maxs[name]:
                        maxs[name] = hi
            per_file[os.path.basename(f)] = {
                name: [mins[name], maxs[name], nulls.get(name)]
                for name in mins
                if name not in unsafe
            }
        keep = self.stats_columns()
        if keep is not None:
            # the allowlist names LOGICAL columns; footers store physical
            log2phys = logical_to_physical(self.column_mapping())
            keep_l = {log2phys.get(c.lower(), c).lower() for c in keep}
            per_file = {
                f: {c: v for c, v in cols.items() if c.lower() in keep_l}
                for f, cols in per_file.items()
            }
        # sizes and row counts are NOT subject to the stats_columns
        # allowlist: one int per file each, byte budgeting and the
        # manifest-only COUNT(*) must keep working on wide tables
        return _rollup_stats(per_file), per_file, sizes, rows

    # -- operations --------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        metadata: dict | None = None,
        txn: dict | None = None,
    ) -> int:
        # fail BEFORE the data write (the _commit guard would catch it
        # anyway, but only after paying for an orphan dir)
        self._check_writer_features()
        rv = self.latest_version()
        ids = self.identity_columns()
        if ids and txn is not None:
            # identity allocation reads the committed watermark; a
            # staged sibling's identity_alloc metadata is NEUTERED
            # until the txn flips, so a second same-txn append would
            # silently reallocate the same ids — mark the commit
            # txn-exclusive so the same-txn guard refuses the sibling
            txn = {**txn, "exclusive": True}
        if ids:
            df = self._assign_identity(df, ids)
        df = self._fill_generated(df)
        self._validate(df)
        rel = self._write_data_dir(df, rv + 1)
        md = dict(metadata or {})
        if ids:
            alloc = self._harvest_identity_high(rel, ids)
            if alloc:
                md["identity_alloc"] = alloc
        return self._commit(
            "append",
            add=[rel],
            remove=[],
            metadata=md,
            txn=txn,
            read_version=rv,
        )

    def commit_metadata(
        self, metadata: dict, operation: str = "stamp"
    ) -> int:
        """Metadata-only commit: records ``metadata`` in a new log entry
        without touching a single data file (``add=[]``, ``data_change``
        False — the change feed and version-offset stream skip it, no
        row changed). The cheap way to stamp bookkeeping a process reads
        back off the log — e.g. re-anchoring a cloned materialized
        view's source watermark — where a zero-row ``append`` would pay
        a full Spark write job for an empty dir."""
        self._check_writer_features()
        return self._commit(
            operation,
            add=[],
            remove=[],
            metadata=metadata,
            data_change=False,
            read_version=self.latest_version(),
        )

    def overwrite(
        self,
        df: DataFrame,
        metadata: dict | None = None,
        txn: dict | None = None,
    ) -> int:
        self._check_writer_features()
        rv = self.latest_version()
        ids = self.identity_columns()
        if ids and txn is not None:
            # same identity-vs-staged-watermark hazard as append
            txn = {**txn, "exclusive": True}
        if ids:
            # the watermark is MONOTONE across overwrites: replaced rows'
            # ids are never reissued (Delta's identity contract)
            df = self._assign_identity(df, ids)
        df = self._fill_generated(df)
        self._validate(df)
        old = [os.path.basename(p) for p in self._live_dirs()]
        rel = self._write_data_dir(df, rv + 1)
        md = dict(metadata or {})
        if ids:
            alloc = self._harvest_identity_high(rel, ids)
            if alloc:
                md["identity_alloc"] = alloc
        return self._commit(
            "overwrite",
            add=[rel],
            remove=old,
            metadata=md,
            # every file the vectors referenced is retired with this commit
            dv_remove=self._live_dvs(),
            txn=txn,
            read_version=rv,
        )

    def truncate(self, txn: dict | None = None) -> int:
        """Delete EVERY row in one manifest commit — Delta's TRUNCATE
        TABLE. No data file is read: all live dirs and deletion vectors
        retire, and one fresh EMPTY dir carrying the current (merged)
        schema lands in their place, so the truncated table remains a
        first-class target (schema intact for positional INSERT / MERGE
        / COUNT, history intact for time travel — the old snapshots
        stay readable until VACUUM). Declared state (constraints,
        generated/identity rules, refs, layout) survives: truncate is a
        data operation, not a reset."""
        self._check_writer_features()
        rv = self.latest_version()
        live = self._live_dirs()
        if not live:
            raise ValueError(f"no snapshot to truncate in {self.path}")
        schema = self.read(merge_schema=True, with_row_ids=True).schema
        empty = self.spark.createDataFrame([], schema)
        rel = self._write_data_dir(empty, rv + 1)
        return self._commit(
            "truncate",
            add=[rel],
            remove=[os.path.basename(p) for p in live],
            dv_remove=self._live_dvs(),
            txn=txn,
            read_version=rv,
        )

    def add_column(self, name: str, dtype: str) -> int:
        """ADD COLUMN — schema evolution without touching a data byte:
        one EMPTY dir carrying the widened schema lands (existing files
        are untouched and surface NULL for the new column under
        ``merge_schema=True``, exactly like a schema-evolving merge).
        The new column is ordinary data; declare generated/identity
        columns through their own verbs. Refuses on a column-mapped
        table — there, append a frame carrying the new column instead
        (mergeSchema evolution registers it through the mapping)."""
        from pyspark.sql import types as T

        self._check_writer_features()
        if not _re.fullmatch(r"[A-Za-z_]\w*", name) or name.startswith("__"):
            raise ValueError(
                f"add_column: {name!r} is not a legal plain column name"
            )
        if self.column_mapping() is not None:
            raise ValueError(
                "add_column on a column-mapped table is not supported — "
                "append a frame carrying the new column (mergeSchema "
                "evolution) so the mapping registers it"
            )
        rv = self.latest_version()
        live = self._live_dirs()
        if not live:
            raise ValueError(
                f"no snapshot in {self.path} — create the table with its "
                "full schema instead"
            )
        try:
            new_field = T.StructType.fromDDL(f"`{name}` {dtype}")
        except Exception as e:  # noqa: BLE001 — classify, don't swallow
            raise ValueError(
                f"add_column: type {dtype!r} does not parse"
            ) from e
        schema = self.read(merge_schema=True, with_row_ids=True).schema
        if name.lower() in {f.name.lower() for f in schema.fields}:
            raise ValueError(
                f"add_column: column {name!r} already exists "
                f"({[f.name for f in schema.fields]})"
            )
        empty = self.spark.createDataFrame(
            [], T.StructType(list(schema.fields) + list(new_field.fields))
        )
        rel = self._write_data_dir(empty, rv + 1)
        return self._commit(
            "add_column",
            add=[rel],
            remove=[],
            # zero rows: the change feed must not surface this commit
            data_change=False,
            read_version=rv,
        )

    def delete_range(self, col: str, lo, hi) -> int:
        """DELETE WHERE ``col`` BETWEEN lo AND hi at FILE granularity:
        the commit-recorded per-file [min, max, nulls] three-way
        partitions each live dir's files — files DISJOINT from the range
        survive (hard-linked into a carry dir, zero data movement), files
        fully INSIDE it with a PROVEN zero null count are dropped without
        reading a row (their every row matches), and only files
        STRADDLING a boundary are read, filtered, and rewritten. At
        100 TB "delete last March" rewrites only March's two boundary
        FILES; the bulk of the deletion is manifest arithmetic plus
        links. Dirs from pre-file-stats commits fall back to the same
        three-way at dir granularity; files/dirs without stats for
        ``col`` are conservatively rewritten. Bounds accept the same
        types the stats normalization does (int/float/str/date/
        datetime)."""
        from pyspark.sql import functions as F

        self._check_writer_features()
        rv = self.latest_version()
        klo, khi = _stat_key(lo), _stat_key(hi)
        live, stats, file_stats, _sizes = self._replay(None)
        all_rows = self._replay_file_rows(None)
        mapping = self.column_mapping()
        # manifest stats key on PHYSICAL names; the filter below runs on
        # the logical projection, so only the stat lookups translate
        pcol = logical_to_physical(mapping).get(col.lower(), col)
        vhint = rv + 1
        remove: list[str] = []
        add: list[str] = []
        known: dict = {}  # carry-dir stats passed through, no re-harvest
        rewrite_paths: list[str] = []  # straddling FILES (or whole dirs)

        def _classify(rng):
            """'disjoint' | 'inside' (provably all-matching, null-free) |
            'straddle' for one [min, max, nulls] record."""
            if rng is None or klo is None or khi is None:
                return "straddle"
            if rng[1] < klo or rng[0] > khi:
                return "disjoint"  # NULL rows never match BETWEEN
            if (
                klo <= rng[0]
                and rng[1] <= khi
                # min/max ignore NULLs, and NULL never matches BETWEEN —
                # a whole-file drop is only sound with a PROVEN zero null
                # count (unknown counts rewrite instead)
                and len(rng) > 2
                and rng[2] == 0
            ):
                return "inside"
            return "straddle"

        for rel in live:
            fstats = file_stats.get(rel)
            if not fstats:
                # pre-file-stats commit: dir-granularity fallback
                cls = _classify(stats.get(rel, {}).get(pcol))
                if cls == "disjoint":
                    continue
                remove.append(rel)
                if cls == "straddle":
                    rewrite_paths.append(os.path.join(self.path, _DATA, rel))
                continue
            cls = {f: _classify(st.get(pcol)) for f, st in fstats.items()}
            if all(c == "disjoint" for c in cls.values()):
                continue  # dir untouched
            remove.append(rel)
            carry = sorted(f for f, c in cls.items() if c == "disjoint")
            if carry:
                cdir, known[cdir] = self._carry_dir(
                    rel, carry, vhint, fstats, all_rows.get(rel)
                )
                add.append(cdir)
            rewrite_paths.extend(
                os.path.join(self.path, _DATA, rel, f)
                for f, c in cls.items()
                if c == "straddle"
            )
        if rewrite_paths:
            # DV-applied raw read: a straddling file may carry deletion
            # vectors, and rewriting it without subtracting them would
            # RESURRECT the deleted rows in the new file
            kept = self._to_logical(
                self._apply_dv(
                    self._scan(sorted(rewrite_paths), merge_schema=True),
                    self._live_dvs(),
                ),
                mapping,
            )
            if col.lower() in {c.lower() for c in kept.columns}:
                # NULL fails BETWEEN, so NULL rows are NOT matched: keep them
                kept = kept.filter(
                    F.col(col).isNull() | ~F.col(col).between(lo, hi)
                )
            # else: every rewrite file PREDATES the column (schema
            # evolution) — the column is NULL for all their rows, nothing
            # matches, the rewrite is a carry-through, not a crash
            add.append(self._write_data_dir(kept, vhint))
        elif not add and remove and len(remove) == len(live):
            # every live file dropped: write a zero-row dir carrying the
            # schema so the table stays READABLE as empty (a full DELETE
            # must not make read() raise "no snapshot")
            empty = self._to_logical(
                self._scan(
                    [os.path.join(self.path, _DATA, d) for d in remove],
                    merge_schema=True,
                ).limit(0),
                mapping,
            )
            add.append(self._write_data_dir(empty, vhint))
        return self._commit(
            "delete", add=add, remove=remove, known_stats=known, read_version=rv
        )

    def delete(
        self, condition: str, mode: str = "cow", txn: dict | None = None
    ) -> int:
        """DELETE WHERE ``condition`` (any SQL predicate).

        ``mode="cow"`` (default): whole-table copy-on-write — the
        snapshot is rewritten without the matching rows. For range
        predicates on a single column prefer ``delete_range`` — it skips
        and drops files by manifest stats instead of reading everything.

        ``mode="mor"`` (merge-on-read): NO data file is touched — the
        commit adds a deletion vector (a tiny parquet of (file basename,
        row position) pairs under ``_dv/``) that every subsequent read
        anti-joins away. Delta's deletion vectors / Iceberg's position
        deletes: at 100 TB, a delete matching 3 rows in a 1 GB file
        writes kilobytes instead of rewriting the gigabyte. The write
        cost is one scan of the (manifest-prunable) table to find the
        matching positions; read cost is one broadcast anti-join until
        OPTIMIZE purges the vectors physically. Manifest stats stay
        sound (a vector only SHRINKS a file's live rows, so recorded
        [min, max, nulls] remain valid upper bounds for pruning)."""
        from pyspark.sql import functions as F

        if mode not in ("cow", "mor"):
            raise ValueError(f"delete: unknown mode {mode!r} (cow|mor)")
        self._check_writer_features()
        if mode == "mor":
            return self._delete_mor(condition, txn=txn)
        rv = self.latest_version()
        # a row is deleted only when the predicate is TRUE; NULL (unknown)
        # keeps the row — SQL DELETE semantics. with_row_ids: a COW
        # rewrite must carry surviving rows' stable ids through
        kept = self.read(merge_schema=True, with_row_ids=True).filter(
            ~F.coalesce(F.expr(condition), F.lit(False))
        )
        old = [os.path.basename(p) for p in self._live_dirs()]
        rel = self._write_data_dir(kept, rv + 1)
        return self._commit(
            "delete",
            add=[rel],
            remove=old,
            # the rewrite applied every outstanding vector physically —
            # retire them with the files they referenced
            dv_remove=self._live_dvs(),
            txn=txn,
            read_version=rv,
        )

    def _delete_mor(self, condition: str, txn: dict | None = None) -> int:
        """Merge-on-read DELETE: record matching (file, position) pairs as
        a deletion vector, touching no data file. Positions come from the
        scan's own ``_metadata`` struct; already-deleted rows are excluded
        (the matching scan is itself DV-applied), so vectors never
        duplicate entries across successive deletes."""
        import glob as _glob

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        rv = self.latest_version()
        live = self._live_dirs()
        if not live:
            raise ValueError(f"no snapshot to delete from in {self.path}")
        vhint = rv + 1
        scan = self._to_logical(
            self._scan(live, merge_schema=True)
            .withColumn("__dv_file", F.col("_metadata.file_name"))
            .withColumn("__dv_pos", F.col("_metadata.row_index").cast("long")),
            self.column_mapping(),
        )
        prior = self._live_dvs()
        if prior:
            dv = self._read_dvs(prior)
            scan = scan.join(
                F.broadcast(
                    dv.select(
                        F.col("file").alias("__dv_file"),
                        F.col("pos").cast("long").alias("__dv_pos"),
                    )
                ),
                ["__dv_file", "__dv_pos"],
                "left_anti",
            )
        hit = scan.filter(
            F.coalesce(F.expr(condition), F.lit(False))
        ).select(
            F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos")
        )
        rel = self._write_dv_dir(hit, vhint)
        # footer-count the vector (metadata-only) to decide no-op vs commit
        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(os.path.join(self.path, _DV, rel, "*.parquet"))
        )
        if n == 0:
            import shutil

            shutil.rmtree(os.path.join(self.path, _DV, rel), ignore_errors=True)
            return self.latest_version()  # nothing matched: no commit
        return self._commit(
            "delete",
            add=[],
            remove=[],
            dv_add=[rel],
            metadata={"mode": "merge-on-read", "rows_deleted": n},
            txn=txn,
            read_version=rv,
        )

    def update(
        self,
        condition: str,
        assignments: dict[str, str],
        mode: str = "cow",
        txn: dict | None = None,
    ) -> int:
        """UPDATE ... SET — the third DML verb, completing
        append/merge/delete. ``assignments`` maps column name → SQL
        expression (evaluated against the row's OLD values, standard
        UPDATE semantics); rows where ``condition`` is not TRUE are
        untouched (NULL = unknown keeps the row unchanged, like DELETE).

        ``mode="cow"``: whole-table rewrite with CASE WHEN applied —
        simple, and the right choice when the update touches a large
        fraction of rows.

        ``mode="mor"``: ONE commit pairing a deletion vector (the old
        positions) with a new data dir (the updated rows) — Delta's
        DV-backed UPDATE. No existing file is rewritten: at 100 TB,
        updating 100 rows writes one tiny vector plus one tiny dir, and
        readers see the swap atomically because vector and dir land in
        the same commit. The change feed surfaces it as delete+insert
        pairs (the commit's dv_add disqualifies the append-only fast
        path). CHECK constraints validate the updated rows before
        anything is written."""
        import glob as _glob

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        if mode not in ("cow", "mor"):
            raise ValueError(f"update: unknown mode {mode!r} (cow|mor)")
        self._check_writer_features()
        rv = self.latest_version()
        live = self._live_dirs()
        if not live:
            raise ValueError(f"no snapshot to update in {self.path}")
        vhint = rv + 1
        generated = self.generated_columns()
        banned = [c for c in assignments if c.lower() in generated]
        if banned:
            raise ValueError(
                f"UPDATE cannot SET generated column(s) {banned} — they "
                "are recomputed from their expressions after the SET "
                "clause (drop_generated_column to make them ordinary)"
            )
        idbad = [
            c for c in assignments if c.lower() in self.identity_columns()
        ]
        if idbad:
            raise ValueError(
                f"UPDATE cannot SET identity column(s) {idbad} — they "
                "are GENERATED ALWAYS (engine-assigned)"
            )
        cond = F.coalesce(F.expr(condition), F.lit(False))

        def _assigned(df: DataFrame, always: bool) -> DataFrame:
            """Apply the SET clause; ``always`` skips the CASE WHEN for a
            frame already filtered to matching rows."""
            cols = {c.lower(): c for c in df.columns}
            missing = [c for c in assignments if c.lower() not in cols]
            if missing:
                raise ValueError(
                    f"update: unknown column(s) {missing}; table has "
                    f"{sorted(cols.values())}"
                )
            out = []
            byname = {cols[c.lower()]: e for c, e in assignments.items()}
            for c in df.columns:
                if c in byname:
                    new = F.expr(byname[c]).cast(df.schema[c].dataType)
                    out.append(
                        (new if always else F.when(cond, new).otherwise(
                            F.col(c)
                        )).alias(c)
                    )
                else:
                    out.append(F.col(c))
            return df.select(*out)

        def _regen(df: DataFrame) -> DataFrame:
            # a SET touching a base column invalidates the generated
            # columns derived from it — recompute them all (deterministic
            # expressions: untouched rows recompute to the same value)
            if not generated:
                return df
            return df.withColumns(
                {c: F.expr(e) for c, e in generated.items()}
            )

        if mode == "cow":
            cur = self.read(merge_schema=True, with_row_ids=True)
            updated = _regen(_assigned(cur, always=False))
            self._validate(updated)
            old = [os.path.basename(p) for p in live]
            rel = self._write_data_dir(updated, vhint)
            return self._commit(
                "update",
                add=[rel],
                remove=old,
                dv_remove=self._live_dvs(),  # rewrite applied every vector
                txn=txn,
                read_version=rv,
            )
        # merge-on-read: deletion vector for the old positions + a new dir
        # with the updated rows, in one atomic commit
        scan = self._to_logical(
            self._scan(live, merge_schema=True)
            .withColumn("__dv_file", F.col("_metadata.file_name"))
            .withColumn("__dv_pos", F.col("_metadata.row_index").cast("long")),
            self.column_mapping(),
        )
        prior = self._live_dvs()
        if prior:
            dv = self._read_dvs(prior)
            scan = scan.join(
                F.broadcast(
                    dv.select(
                        F.col("file").alias("__dv_file"),
                        F.col("pos").cast("long").alias("__dv_pos"),
                    )
                ),
                ["__dv_file", "__dv_pos"],
                "left_anti",
            )
        # hit feeds TWO outputs (the deletion vector's positions and the
        # updated-rows dir); without materialization each write re-runs
        # the full table scan + DV anti-join + predicate. One
        # localCheckpoint bounds the commit at ONE pass over the table —
        # the materialized set is |matched| rows, the same magnitude as
        # the data this commit writes anyway.
        hit = scan.filter(cond).localCheckpoint()
        data_cols = [c for c in scan.columns if c not in ("__dv_file", "__dv_pos")]
        updated = _regen(_assigned(hit.select(*data_cols), always=True))
        self._validate(updated)  # reject BEFORE any dir is written
        # The vector write and the updated-rows write are INDEPENDENT
        # jobs over the same checkpointed |matched| set — overlap them
        # from two driver threads (guide §2.6: actions are sequential
        # only because driver code calls them sequentially). Both land
        # in uuid-named staging dirs invisible until _commit, so
        # atomicity is unchanged; on the nothing-matched path the
        # (small, |matched|=0) data dir is discarded alongside the
        # vector instead of never being written.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            dv_fut = pool.submit(
                self._write_dv_dir,
                hit.select(
                    F.col("__dv_file").alias("file"),
                    F.col("__dv_pos").alias("pos"),
                ),
                vhint,
            )
            data_fut = pool.submit(self._write_data_dir, updated, vhint)
            # If either write raises, the sibling future still completes
            # (each writer sweeps its OWN partial dir on failure); sweep
            # the sibling's completed staged dir too before re-raising so
            # a half-failed UPDATE leaks nothing (ADVICE r11).
            dv_rel = rel = None
            errs: list[BaseException] = []
            for fut in (dv_fut, data_fut):
                try:
                    if fut is dv_fut:
                        dv_rel = fut.result()
                    else:
                        rel = fut.result()
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    errs.append(e)
        if errs:
            import shutil

            if dv_rel is not None:
                shutil.rmtree(
                    os.path.join(self.path, _DV, dv_rel), ignore_errors=True
                )
            if rel is not None:
                shutil.rmtree(
                    os.path.join(self.path, _DATA, rel), ignore_errors=True
                )
            raise errs[0]
        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(
                os.path.join(self.path, _DV, dv_rel, "*.parquet")
            )
        )
        if n == 0:
            import shutil

            shutil.rmtree(
                os.path.join(self.path, _DV, dv_rel), ignore_errors=True
            )
            shutil.rmtree(
                os.path.join(self.path, _DATA, rel), ignore_errors=True
            )
            return self.latest_version()  # nothing matched: no commit
        return self._commit(
            "update",
            add=[rel],
            remove=[],
            dv_add=[dv_rel],
            metadata={"mode": "merge-on-read", "rows_updated": n},
            txn=txn,
            read_version=rv,
        )

    def _bound_cow_rewrite(
        self,
        updates: DataFrame,
        keys: list[str],
        phys_keys: list[str],
        live: list[str],
        stats: dict,
        file_stats: dict,
        all_rows: dict,
        vhint: int,
    ) -> tuple[list[str], list[str], dict, list[str]]:
        """File-level COW bounding shared by ``merge`` and ``merge_into``:
        from the updates frame's [min, max] per key column and the
        commit-recorded per-file stats, decide which live files can
        possibly hold a matching key. Returns ``(remove, carries, known,
        rewrite_paths)``: dirs to retire, hard-linked carry dirs for the
        provably-disjoint files of touched dirs (with their pass-through
        stats in ``known``), and the intersecting file paths to actually
        read and rewrite. Empty/all-NULL key bounds prove ZERO possible
        matches (NULL never equality-matches) → nothing rewritten;
        unorderable key types (decimal/bool/binary) force the
        conservative full rewrite."""
        from pyspark.sql import functions as F

        bounds = updates.agg(
            *[f(k) for k in keys for f in (F.min, F.max)]
        ).first()
        remove: list[str] = []
        carries: list[str] = []
        known: dict = {}  # carry-dir stats passed through, no re-harvest
        rewrite_paths: list[str] = []  # intersecting FILES (or whole dirs)

        def _intersects(st: dict) -> bool:
            for i, _k in enumerate(phys_keys):
                rng = st.get(_k)
                lo = _stat_key(bounds[2 * i])
                hi = _stat_key(bounds[2 * i + 1])
                if rng is not None and (rng[1] < lo or rng[0] > hi):
                    return False
            return True

        if any(
            bounds[2 * i] is None or bounds[2 * i + 1] is None
            for i in range(len(keys))
        ):
            # a RAW None min/max means the updates frame is empty or a key
            # column is entirely NULL — and NULL never equality-matches,
            # so ZERO files can hold a matched row: pure insert, not the
            # conservative full rewrite
            pass
        elif any(
            _stat_key(bounds[2 * i]) is None
            or _stat_key(bounds[2 * i + 1]) is None
            for i in range(len(keys))
        ):
            # non-None bound of an UNORDERABLE key type (decimal/bool/
            # binary): stats can't prove any file disjoint, and treating
            # it as a pure insert would silently DUPLICATE matched keys —
            # conservative full rewrite, mirroring delete_range's handling
            remove = list(live)
            rewrite_paths = [
                os.path.join(self.path, _DATA, d) for d in live
            ]
        else:
            for rel in live:
                fstats = file_stats.get(rel)
                if not fstats:
                    # pre-file-stats commit: dir-granularity fallback
                    if _intersects(stats.get(rel, {})):
                        remove.append(rel)
                        rewrite_paths.append(
                            os.path.join(self.path, _DATA, rel)
                        )
                    continue
                hit = {f: _intersects(st) for f, st in fstats.items()}
                if not any(hit.values()):
                    continue  # dir untouched
                remove.append(rel)
                carry = sorted(f for f, h in hit.items() if not h)
                if carry:
                    cdir, known[cdir] = self._carry_dir(
                        rel, carry, vhint, fstats, all_rows.get(rel)
                    )
                    carries.append(cdir)
                rewrite_paths.extend(
                    os.path.join(self.path, _DATA, rel, f)
                    for f, h in hit.items()
                    if h
                )
        return remove, carries, known, rewrite_paths

    def merge(
        self,
        updates: DataFrame,
        keys: list[str],
        allow_schema_evolution: bool = False,
        txn: dict | None = None,
    ) -> int:
        """Upsert (copy-on-write): rows matching on ``keys`` are replaced,
        the rest inserted.

        ``allow_schema_evolution=True`` lets ``updates`` carry columns the
        table lacks (and vice versa): the rewritten dirs take the UNION
        schema with NULLs for the missing side — Delta's mergeSchema.
        Untouched (range-disjoint) dirs keep their narrower files; read
        them with ``merge_schema=True`` to surface the union. Off by
        default so a typo'd column name fails loudly instead of quietly
        widening the table.

        FILE-LEVEL COW: the commit-recorded per-FILE [min, max] stats
        (the same plumbing manifest pruning reads) bound which files can
        possibly hold a matching key — a file whose range for ANY key
        column is disjoint from the updates' range cannot contain a
        matched row, so its bytes are never read or rewritten: disjoint
        files of a touched dir are hard-linked into a carry dir, and only
        INTERSECTING files are read, anti-joined, and rewritten into one
        new dir. At 100 TB a 1-row MERGE therefore rewrites ONE FILE, not
        one commit's worth of files (Delta/Iceberg's merge-on-read-free
        COW shape). Dirs from pre-file-stats commits fall back to the
        same bounding at dir granularity; files/dirs with no recorded
        stats for a key column are conservatively rewritten. A merge that
        touches nothing is a pure insert — an append-only commit the
        change feed's manifest fast path still accepts."""
        from pyspark.sql import functions as F

        self._check_writer_features()
        rv = self.latest_version()
        ids = self.identity_columns()
        lack = sorted(
            c
            for c in ids
            if c != _ROWID  # row-tracking ids are inherited-or-minted below
            and c not in {u.lower() for u in updates.columns}
        )
        if lack:
            raise ValueError(
                f"merge cannot mint identity column(s) {lack}: carry the "
                "existing ids in the updates frame (they come from a "
                "prior read); APPEND new rows instead of merging them"
            )
        updates = self._fill_generated(updates)
        # carried/anti-joined rows were validated when first written;
        # only the incoming side needs the invariant check
        self._validate(updates)
        live, stats, file_stats, _sizes = self._replay(None)
        all_rows = self._replay_file_rows(None)
        mapping = self.column_mapping()
        # manifest stats are keyed by PHYSICAL names; keys are logical
        phys_keys = [
            logical_to_physical(mapping).get(k.lower(), k) for k in keys
        ]
        vhint = rv + 1
        remove, carries, known, rewrite_paths = self._bound_cow_rewrite(
            updates, keys, phys_keys, live, stats, file_stats, all_rows,
            vhint,
        )
        if rewrite_paths:
            # always mergeSchema on the rewrite read: an EARLIER evolved
            # merge may have left heterogeneous files, and a plain read
            # would adopt one file's schema and silently drop the rest.
            # DV-applied: rewriting a vector-carrying file without
            # subtracting its deletion vector would resurrect deleted rows.
            # _to_logical: the raw scan carries physical names; the
            # anti-join keys (and the written union) are logical
            current = self._to_logical(
                self._apply_dv(
                    self._scan(sorted(rewrite_paths), merge_schema=True),
                    self._live_dvs(),
                ),
                mapping,
            )
            if self.row_tracking():
                # inherit-or-mint: a matched key keeps its (minimum)
                # existing id — the row's identity survives the rewrite;
                # an unmatched (insert) row gets a fresh id past the
                # watermark. Matches can only live in the rewrite files
                # (the stats bounding is what chose them), so the
                # inherit join is delta-sized.
                cur_ids = current.groupBy(*keys).agg(
                    F.min(_ROWID).alias(_ROWID)
                )
                updates = self._mint_row_ids(
                    updates.drop(_ROWID).join(cur_ids, keys, "left")
                )
            merged = current.join(updates, keys, "left_anti").unionByName(
                updates, allowMissingColumns=allow_schema_evolution
            )
        else:
            if self.row_tracking():
                # pure insert: every updates row is new — all minted
                updates = self._mint_row_ids(
                    updates.withColumn(_ROWID, F.lit(None).cast("long"))
                )
            merged = updates
            if not allow_schema_evolution and live:
                # the COW branch's unionByName validates the updates schema
                # as a side effect; the pure-insert path must apply the
                # same fail-loudly contract, or a typo'd column lands as a
                # silently heterogeneous dir. Column names come from ONE
                # parquet footer per live dir (each dir is one write, so
                # intra-dir schemas are homogeneous) — metadata-only, no
                # whole-table Spark inference job on the cheap append path
                table_cols = self._logical_columns(live) - {_ROWID}
                mine = {c.lower() for c in updates.columns} - {_ROWID}
                if table_cols and mine != table_cols:
                    raise ValueError(
                        "merge: updates schema does not match the table "
                        f"(updates-only: {sorted(mine - table_cols)}, "
                        f"table-only: {sorted(table_cols - mine)}); pass "
                        "allow_schema_evolution=True to widen the table"
                    )
        rel = self._write_data_dir(merged, vhint)
        md: dict = {}
        if ids:
            alloc = self._harvest_identity_high(rel, ids)
            if alloc:
                md["identity_alloc"] = alloc
        return self._commit(
            "merge",
            add=carries + [rel],
            remove=remove,
            known_stats=known,
            metadata=md or None,
            # "exclusive": even a pure-insert merge decided its plan
            # from the pre-txn snapshot — it must not share a table
            # with any other same-txn write (see the same-txn guard)
            txn=({**txn, "exclusive": True} if txn else None),
            read_version=rv,
        )

    def merge_into(
        self,
        source: DataFrame,
        keys: list[str],
        *,
        matched: list[dict] | None = None,
        not_matched: list[dict] | None = None,
        not_matched_by_source: list[dict] | None = None,
        target_alias: str = "t",
        source_alias: str = "s",
        commit_metadata: dict | None = None,
        on_condition: str | None = None,
        txn: dict | None = None,
    ) -> int:
        """CONDITIONAL merge — the full ANSI/Delta MERGE clause set,
        lowered to ONE copy-on-write commit (SQL surface: sql_dml.py):

            matched:  [{"action": "update", "condition": cond|None,
                        "set": {col: expr} | "*"},
                       {"action": "delete", "condition": cond|None}, ...]
            not_matched: [{"condition": cond|None,
                           "columns": [c...]|None, "values": [e...]|"*"}]
            not_matched_by_source: [{"action": "update"|"delete",
                                     "condition": cond|None, "set": {...}}]

        Per row-pair the FIRST clause (in list order) whose condition is
        TRUE fires; conditions and expressions are SQL text resolved by
        Catalyst against the declared aliases (``target_alias``/
        ``source_alias``), never re-implemented. ``set``/``values`` of
        ``"*"`` expand by name from the source. ``on_condition`` adds
        residual ON legs beyond the key equalities (ANSI MERGE's theta
        ON): a key-matched pair failing them is NOT matched on either
        side.

        Plan shape (Spark-first): the bounded rewrite set FULL OUTER
        JOINs the source on the keys; one generated SELECT computes every
        output column as a first-match CASE over the clause conditions
        plus a keep flag, so the whole merge is a single Catalyst plan —
        no per-clause passes. File-level COW bounding is shared with
        ``merge`` (``_bound_cow_rewrite``): without NOT MATCHED BY SOURCE
        clauses, only files whose key stats intersect the source's key
        range are read or rewritten — at 100 TB a 1-row conditional merge
        rewrites one file; BY SOURCE clauses touch unmatched target rows
        anywhere, forcing the full rewrite. A matched/BY-SOURCE-free
        merge degenerates to a pure-insert append (no join at all when
        stats prove zero matches).

        Cardinality (Delta's rule): a target row matched by MULTIPLE
        source rows raises when any of its pairs fires an update/delete
        clause (ambiguous result); all-passthrough multi-matches
        deduplicate to one copy. Row-tracking ids survive updates and
        mint for inserts; generated columns recompute after the clauses
        (deterministic by declaration); identity tables refuse — a
        conditional merge cannot tell inherited ids from minted ones."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        self._check_writer_features()
        matched = list(matched or [])
        not_matched = list(not_matched or [])
        nmbs = list(not_matched_by_source or [])
        if not (matched or not_matched or nmbs):
            raise ValueError("merge_into: declare at least one WHEN clause")
        if not keys:
            raise ValueError("merge_into: at least one key column required")
        ta, sa = target_alias, source_alias
        for a in (ta, sa):
            if not _re.fullmatch(r"[A-Za-z_]\w*", a):
                raise ValueError(f"merge_into: alias {a!r} is not a plain "
                                 "identifier")
        if ta.lower() == sa.lower():
            raise ValueError(
                f"merge_into: target and source aliases collide ({ta!r})"
            )
        plain_ids = [c for c in self.identity_columns() if c != _ROWID]
        if plain_ids:
            raise ValueError(
                f"merge_into cannot target a table with identity "
                f"column(s) {plain_ids} — a conditional merge cannot "
                "tell inherited ids from minted ones; use merge() with "
                "carried ids, or append"
            )
        generated = self.generated_columns()
        rv = self.latest_version()
        try:
            base = self.read(merge_schema=True, with_row_ids=True)
        except ValueError:
            raise ValueError(
                "merge_into: the target table has no schema yet — INSERT "
                "clauses have nothing to map onto; append or CTAS first"
            ) from None
        tcols = list(base.columns)
        ttypes = {f.name: f.dataType for f in base.schema.fields}
        tl = {c.lower(): c for c in tcols}
        sl = {c.lower(): c for c in source.columns}
        for k in keys:
            if k.lower() not in tl:
                raise ValueError(f"merge_into: key {k!r} not in the table "
                                 f"({sorted(tcols)})")
            if k.lower() not in sl:
                raise ValueError(f"merge_into: key {k!r} not in the source "
                                 f"({sorted(source.columns)})")

        def _ty(c: str) -> str:
            return ttypes[c].simpleString()

        def _t(c: str) -> str:
            return f"`{ta}`.`{c}`"

        def _s(c: str) -> str:
            return f"`{sa}`.`{c}`"

        def _cast(expr: str, c: str) -> str:
            return f"CAST(({expr}) AS {_ty(c)})"

        def _null(c: str) -> str:
            return f"CAST(NULL AS {_ty(c)})"

        def _norm_set(raw, where: str, star_ok: bool) -> dict[str, str]:
            """{exact target col: sql expr}; '*' expands by name from
            the source (engine/generated columns excluded)."""
            if raw == "*":
                if not star_ok:
                    raise ValueError(f"merge_into: SET * is not valid in "
                                     f"{where}")
                out = {}
                for c in tcols:
                    if c == _ROWID or c.lower() in generated:
                        continue
                    if c.lower() not in sl:
                        raise ValueError(
                            f"merge_into: {where} UPDATE SET * needs "
                            f"source column {c!r}, which the source lacks"
                        )
                    out[c] = _s(sl[c.lower()])
                return out
            out = {}
            for col, expr in dict(raw or {}).items():
                name = col
                m = _re.fullmatch(rf"(?i){_re.escape(ta)}\.(\w+)", name)
                if m:
                    name = m.group(1)
                if name.lower() not in tl:
                    raise ValueError(
                        f"merge_into: {where} SET targets unknown column "
                        f"{col!r}; table has {sorted(tcols)}"
                    )
                c = tl[name.lower()]
                if c == _ROWID:
                    raise ValueError("merge_into: cannot SET the row-"
                                     "tracking id")
                if c.lower() in generated:
                    raise ValueError(
                        f"merge_into: {where} cannot SET generated column "
                        f"{c!r} — it is recomputed from its expression"
                    )
                out[c] = str(expr)
            if not out:
                raise ValueError(f"merge_into: {where} UPDATE needs a "
                                 "non-empty SET")
            return out

        m_norm: list[dict] = []
        for i, cl in enumerate(matched):
            act = (cl.get("action") or "").lower()
            if act not in ("update", "delete"):
                raise ValueError(
                    f"merge_into: matched[{i}] action must be update|"
                    f"delete, got {cl.get('action')!r}"
                )
            m_norm.append({
                "action": act,
                "condition": cl.get("condition"),
                "set": _norm_set(cl.get("set"), f"matched[{i}]", True)
                if act == "update"
                else {},
            })
        b_norm: list[dict] = []
        for i, cl in enumerate(nmbs):
            act = (cl.get("action") or "").lower()
            if act not in ("update", "delete"):
                raise ValueError(
                    f"merge_into: not_matched_by_source[{i}] action must "
                    f"be update|delete, got {cl.get('action')!r}"
                )
            b_norm.append({
                "action": act,
                "condition": cl.get("condition"),
                "set": _norm_set(
                    cl.get("set"), f"not_matched_by_source[{i}]", False
                )
                if act == "update"
                else {},
            })
        i_norm: list[dict] = []
        for i, cl in enumerate(not_matched):
            vals = cl.get("values")
            if vals == "*":
                vmap = {}
                for c in tcols:
                    if c == _ROWID:
                        continue
                    if c.lower() in sl:
                        vmap[c] = _s(sl[c.lower()])
                    elif c.lower() in generated:
                        continue  # recomputed after the clauses
                    else:
                        raise ValueError(
                            f"merge_into: not_matched[{i}] INSERT * needs "
                            f"source column {c!r}, which the source lacks"
                        )
            else:
                cols = cl.get("columns") or []
                vals = list(vals or [])
                if len(cols) != len(vals) or not cols:
                    raise ValueError(
                        f"merge_into: not_matched[{i}] needs matching "
                        "non-empty columns/values lists (or values='*')"
                    )
                vmap = {}
                for col, expr in zip(cols, vals):
                    if col.lower() not in tl:
                        raise ValueError(
                            f"merge_into: not_matched[{i}] INSERT targets "
                            f"unknown column {col!r}; table has "
                            f"{sorted(tcols)}"
                        )
                    c = tl[col.lower()]
                    if c == _ROWID:
                        raise ValueError("merge_into: cannot INSERT the "
                                         "row-tracking id")
                    vmap[c] = str(expr)
            i_norm.append({"condition": cl.get("condition"), "values": vmap})

        def _case(branches: list[str], default: str) -> str:
            if not branches:
                return default
            return "CASE " + " ".join(branches) + f" ELSE {default} END"

        def _branches(clauses, value_of) -> list[str]:
            return [
                f"WHEN ({cl.get('condition') or 'TRUE'}) "
                f"THEN {value_of(cl)}"
                for cl in clauses
            ]

        def _col_sql(c: str, with_target: bool) -> str:
            ins = _case(
                _branches(
                    i_norm,
                    lambda cl: _cast(cl["values"][c], c)
                    if c in cl["values"]
                    else _null(c),
                ),
                _null(c),
            )
            if not with_target:
                return f"{ins} AS `{c}`"
            mat = _case(
                _branches(
                    m_norm,
                    lambda cl: _cast(cl["set"][c], c)
                    if c in cl["set"]
                    else _t(c),
                ),
                _t(c),
            )
            bys = _case(
                _branches(
                    b_norm,
                    lambda cl: _cast(cl["set"][c], c)
                    if c in cl["set"]
                    else _t(c),
                ),
                _t(c),
            )
            return (
                f"CASE WHEN {is_matched} THEN {mat} "
                f"WHEN {t_present} THEN {bys} "
                f"ELSE {ins} END AS `{c}`"
            )

        def _keep_sql(with_target: bool) -> str:
            ins = _case(
                _branches(i_norm, lambda cl: "TRUE"), "FALSE"
            )
            if not with_target:
                return f"{ins} AS `{H_KEEP}`"
            mat = _case(
                _branches(
                    m_norm,
                    lambda cl: "FALSE" if cl["action"] == "delete"
                    else "TRUE",
                ),
                "TRUE",
            )
            bys = _case(
                _branches(
                    b_norm,
                    lambda cl: "FALSE" if cl["action"] == "delete"
                    else "TRUE",
                ),
                "TRUE",
            )
            return (
                f"CASE WHEN {is_matched} THEN {mat} "
                f"WHEN {t_present} THEN {bys} "
                f"ELSE {ins} END AS `{H_KEEP}`"
            )

        h = uuid.uuid4().hex[:8]
        H_TP, H_SP = f"__tp_{h}", f"__sp_{h}"
        H_RID, H_KEEP = f"__trid_{h}", f"__keep_{h}"
        H_MAT, H_FIRED = f"__mat_{h}", f"__fired_{h}"
        t_present = f"`{ta}`.`{H_TP}` IS NOT NULL"
        is_matched = f"({t_present} AND `{sa}`.`{H_SP}` IS NOT NULL)"

        def _finish(df: DataFrame) -> DataFrame:
            if generated:
                df = df.withColumns(
                    {c: F.expr(e) for c, e in generated.items()}
                )
            if self.row_tracking():
                df = self._mint_row_ids(df)
            self._validate(df)
            return df

        live, stats, file_stats, _sizes = self._replay(None)
        all_rows = self._replay_file_rows(None)
        mapping = self.column_mapping()
        phys_keys = [
            logical_to_physical(mapping).get(k.lower(), k) for k in keys
        ]
        vhint = rv + 1
        if nmbs:
            # BY SOURCE clauses touch UNMATCHED target rows, which can
            # live in any file — stats on the source's keys bound nothing
            remove = list(live)
            carries, known = [], {}
            rewrite_paths = [
                os.path.join(self.path, _DATA, d) for d in live
            ]
        else:
            remove, carries, known, rewrite_paths = self._bound_cow_rewrite(
                source, [sl[k.lower()] for k in keys], phys_keys, live,
                stats, file_stats, all_rows, vhint,
            )
        if not rewrite_paths:
            # stats prove ZERO possible matches (the bounding found no
            # intersecting file, or the source's key bounds are empty/
            # all-NULL): pure insert, no join — every source row is
            # unmatched by construction. alias()+selectExpr, no temp
            # views: the plan is session-agnostic, so a foreachBatch
            # micro-batch frame (cloned session) works unchanged
            out = (
                source.alias(sa)
                .selectExpr(
                    *[_col_sql(c, with_target=False) for c in tcols],
                    _keep_sql(with_target=False),
                )
                .filter(F.col(H_KEEP))
                .select(*[f"`{c}`" for c in tcols])
            )
            result = _finish(out)
            rel = self._write_data_dir(result, vhint)
            return self._commit(
                "merge",
                add=[rel],
                remove=[],
                metadata=commit_metadata,
                txn=({**txn, "exclusive": True} if txn else None),
                read_version=rv,
            )
        cur = self._to_logical(
            self._apply_dv(
                self._scan(sorted(rewrite_paths), merge_schema=True),
                self._live_dvs(),
            ),
            mapping,
        )
        for c in tcols:
            if c not in cur.columns:
                cur = cur.withColumn(c, F.lit(None).cast(ttypes[c]))
        cur = (
            cur.select(*[f"`{c}`" for c in tcols])
            .withColumn(H_TP, F.lit(True))
            .withColumn(H_RID, F.monotonically_increasing_id())
        )
        src = source.withColumn(H_SP, F.lit(True))
        on = " AND ".join(
            f"`{ta}`.`{tl[k.lower()]}` = `{sa}`.`{sl[k.lower()]}`"
            for k in keys
        )
        if on_condition:
            # residual ON legs beyond the key equalities: a key-matched
            # pair failing them counts as NOT matched on BOTH sides
            # (standard MERGE ON semantics) — which falls out of making
            # the residual part of the join condition itself. Key-based
            # file bounding stays correct: matches still require key
            # equality, the residual only shrinks the match set.
            on = f"{on} AND ({on_condition})"
        fired = _case(
            _branches(m_norm, lambda cl: "TRUE"), "FALSE"
        ) if m_norm else "FALSE"
        # alias()+selectExpr instead of temp views + spark.sql: the
        # clause expressions still resolve through the declared aliases
        # verbatim, and the plan is SESSION-AGNOSTIC — a foreachBatch
        # source frame (cloned session) merges without view-visibility
        # games
        joined = (
            cur.alias(ta)
            .join(src.alias(sa), F.expr(on), "full_outer")
            .selectExpr(
                *[_col_sql(c, with_target=True) for c in tcols],
                _keep_sql(with_target=True),
                f"{is_matched} AS `{H_MAT}`",
                f"CASE WHEN {is_matched} THEN {fired} ELSE FALSE END "
                f"AS `{H_FIRED}`",
                f"`{ta}`.`{H_RID}` AS `{H_RID}`",
            )
        )
        # one window pass: multi-match cardinality + passthrough dedup.
        # Source-only rows (NULL rid) get synthetic unique partition keys
        # so they never collapse into one skewed partition.
        wk = F.when(
            F.col(H_RID).isNotNull(),
            F.concat(F.lit("t"), F.col(H_RID).cast("string")),
        ).otherwise(
            F.concat(
                F.lit("s"),
                F.monotonically_increasing_id().cast("string"),
            )
        )
        joined = joined.withColumn(f"{H_RID}_w", wk)
        w = Window.partitionBy(f"{H_RID}_w")
        joined = joined.withColumn(
            f"{H_RID}_rn", F.row_number().over(w.orderBy(F.lit(1)))
        )
        cond = F.col(H_KEEP) & (F.col(f"{H_RID}_rn") == 1)
        if m_norm:
            joined = joined.withColumn(
                f"{H_MAT}_n",
                F.sum(F.when(F.col(H_MAT), 1).otherwise(0)).over(w),
            ).withColumn(
                f"{H_FIRED}_n",
                F.sum(F.when(F.col(H_FIRED), 1).otherwise(0)).over(w),
            )
            err = (
                F.col(H_RID).isNotNull()
                & (F.col(f"{H_MAT}_n") > 1)
                & (F.col(f"{H_FIRED}_n") >= 1)
            )
            cond = (
                F.when(
                    err,
                    F.raise_error(
                        F.lit(
                            "merge_into: a target row matches multiple "
                            "source rows and an update/delete clause "
                            "fires — the result is ambiguous (Delta's "
                            "multiple-source-rows rule); deduplicate "
                            "the source on the merge keys"
                        )
                    ).cast("boolean"),
                ).otherwise(F.lit(True))
                & cond
            )
        out = joined.filter(cond).select(*[f"`{c}`" for c in tcols])
        result = _finish(out)
        rel = self._write_data_dir(result, vhint)
        return self._commit(
            "merge",
            add=carries + [rel],
            remove=remove,
            known_stats=known,
            metadata=commit_metadata,
            txn=({**txn, "exclusive": True} if txn else None),
            read_version=rv,
        )

    def restore(self, version: int | None = None, ref: str | None = None) -> int:
        """RESTORE TABLE TO VERSION/REF — roll the table back to an
        earlier snapshot as a NEW commit (Delta's RESTORE): the commit
        re-references the target version's data dirs and deletion
        vectors and retires the current ones. Nothing is copied — the
        old dirs are still on disk (that is what time travel reads), so
        restore is pure manifest arithmetic; history is preserved (the
        bad version remains time-travelable, unlike a log rewind) and
        the restore itself shows in the log. Fails if VACUUM already
        reclaimed any of the target's dirs — restore needs the data,
        not just the manifest. Stats are carried from the target
        commit's recorded entries (zero footer reads)."""
        if (version is None) == (ref is None):
            raise ValueError("restore: pass exactly one of version / ref")
        rv = self.latest_version()
        if ref is not None:
            tags = self.refs()
            if ref not in tags:
                raise ValueError(f"unknown ref {ref!r}; have {sorted(tags)}")
            version = tags[ref]
        live_now, _, _, _ = self._replay(None)
        target, stats, file_stats, file_sizes = self._replay(version)
        if not target:
            raise ValueError(f"no snapshot at version {version} to restore")
        missing = [
            rel
            for rel in target
            if not os.path.isdir(os.path.join(self.path, _DATA, rel))
        ]
        if missing:
            raise ValueError(
                f"restore: data dirs {missing} of version {version} were "
                "vacuumed — the snapshot is no longer materializable"
            )
        dvs_now = self._live_dvs()
        dvs_then = self._live_dvs(version)
        dv_missing = [
            d
            for d in dvs_then
            if not os.path.isdir(os.path.join(self.path, _DV, d))
        ]
        if dv_missing:
            raise ValueError(
                f"restore: deletion-vector dirs {dv_missing} of version "
                f"{version} were vacuumed — the snapshot is no longer "
                "materializable"
            )
        _rows = self._replay_file_rows(version)
        known = {
            rel: (
                stats.get(rel, {}),
                file_stats.get(rel, {}),
                file_sizes.get(rel, {}),
                _rows.get(rel, {}),
            )
            for rel in target
            if rel in file_stats
        }
        return self._commit(
            "restore",
            add=[rel for rel in target if rel not in set(live_now)],
            remove=[rel for rel in live_now if rel not in set(target)],
            metadata={"restored_version": version},
            known_stats=known,
            dv_add=[d for d in dvs_then if d not in set(dvs_now)],
            dv_remove=[d for d in dvs_now if d not in set(dvs_then)],
            read_version=rv,
        )

    def compact_vectors(self) -> int:
        """Fold every live deletion-vector dir into ONE — metadata-only
        maintenance (data_change=False: the feed and the version-offset
        stream skip it, no row changed). A busy MOR table accumulates a
        tiny dir per delete/update; each adds a file listing to every
        read's anti-join side. Folding restores a single small vector at
        the cost of reading kilobytes — the vector-side analog of
        incremental OPTIMIZE, for when a full purge (which rewrites data)
        is not yet worth it. Stale entries whose file is no longer live
        are dropped during the fold (they can never match a scan again).
        No-op (current version, no commit) with fewer than two live
        vector dirs."""
        from pyspark.sql import functions as F

        rv = self.latest_version()
        dvs = self._live_dvs()
        if len(dvs) < 2:
            return rv
        live, _, file_stats, _ = self._replay(None)
        live_files = {
            basename
            for rel in live
            for basename in (file_stats.get(rel) or {})
        }
        dv = self._read_dvs(dvs)
        # drop entries for dead basenames (their file left the live set
        # via COW/optimize); pre-manifest dirs have no recorded basenames,
        # so only prune when the manifest is authoritative. Semi-join (not
        # an isin literal list): the live-file set is manifest-sized but
        # unbounded at 100 TB. When every vector dir's referenced
        # basenames are recorded in the commit log (dv_files) and all of
        # them are still live, the prune is provably a no-op — skip the
        # semi-join and its BroadcastExchange job entirely (guide §2.4):
        # the common busy-MOR case (deletes/updates, no intervening
        # rewrite) folds with pure manifest arithmetic plus one write.
        if live_files and all(rel in file_stats for rel in live):
            # Harvest dv_files NEWEST-FIRST and stop as soon as every
            # live vector dir is resolved: a rel's mapping is recorded
            # by the one commit that added it, so on a long-lived busy
            # table the proof reads the few newest log entries instead
            # of replaying the whole history (ADVICE r11 — the
            # O(history) replay could cost more than the join it skips).
            recorded: dict[str, list[str]] = {}
            pending = set(dvs)
            for name in reversed(_log_names(self._log_dir(), _COMMIT_NAME)):
                if not pending:
                    break
                try:
                    with open(os.path.join(self._log_dir(), name)) as f:
                        entry = json.load(f)
                except (OSError, json.JSONDecodeError):
                    continue  # torn write — as invisible as in _commits
                for rel_name, files in (entry.get("dv_files") or {}).items():
                    if rel_name in pending:
                        recorded[rel_name] = files
                        pending.discard(rel_name)
            prune_noop = all(rel in recorded for rel in dvs) and all(
                f in live_files for rel in dvs for f in recorded[rel]
            )
            if not prune_noop:
                live_df = self.spark.createDataFrame(
                    [(f,) for f in sorted(live_files)], "file string"
                )
                dv = dv.join(F.broadcast(live_df), "file", "left_semi")
        rel = self._write_dv_dir(dv, rv + 1)
        return self._commit(
            "compact_vectors",
            add=[],
            remove=[],
            data_change=False,
            dv_add=[rel],
            dv_remove=dvs,
            read_version=rv,
        )

    def optimize(
        self,
        target_partitions: int = 1,
        zorder_by: tuple[str, str] | None = None,
        max_dir_bytes: int | None = None,
        zorder_bits: int = 8,
    ) -> int:
        """Compaction: rewrite the live snapshot into ``target_partitions``
        files in one new dir and retire the fragmented dirs — logically a
        no-op (same rows), so readers of ANY version are unaffected. The
        small-files problem is the table format's chronic disease (every
        append adds a dir; scan cost grows with file count, not bytes);
        OPTIMIZE is the periodic cure, exactly Delta's.

        ``max_dir_bytes`` makes the compaction INCREMENTAL, like Delta's
        file-size threshold: only dirs smaller than the bound are folded
        into the new dir; already-right-sized dirs survive untouched, so
        the periodic OPTIMIZE pass over a 100 TB table costs the small
        tail, not a full rewrite. A no-op (fewer than two small dirs)
        commits nothing and returns the current version.

        ``zorder_by=(x, y)`` additionally clusters the rewrite on the
        Morton interleave of the two columns (each linearly scaled to
        0..255 from its observed range — one tiny pre-aggregate), via
        ``repartitionByRange`` + ``sortWithinPartitions`` on the code:
        every output file then bounds BOTH columns, so parquet row-group
        min/max stats — and this format's own per-dir stats — prune
        scans filtered on either column. OPTIMIZE ZORDER, reduced to
        arithmetic (see operators/partitioning.py::a13 for the bit math
        and the bounding-box property test).

        ``zorder_bits`` is the per-dimension code RESOLUTION (default 8
        → 256 cells per dimension). A high-cardinality key on a large
        table wants more: with only 2^bits cells per dimension, files
        beyond bits·N code width stop subdividing, so bounding boxes
        plateau; 12-bit 2-D (16.7M cells) keeps tightening where 8-bit
        flattens out (pinned by test). Constraint: N·bits ≤ 62 (the
        code must fit a bigint)."""
        from pyspark.sql import functions as F

        self._check_writer_features()
        rv = self.latest_version()
        if max_dir_bytes is not None and zorder_by is not None:
            raise ValueError(
                "optimize: max_dir_bytes (incremental fold) and zorder_by "
                "(full clustered rewrite) are mutually exclusive — a "
                "Z-order rewrite is whole-table by definition; run them as "
                "separate passes"
            )
        if max_dir_bytes is not None:
            # pin the WHOLE plan to the rv snapshot: a dir listed after
            # a concurrent commit would be retired without its rows in
            # the rewrite, and the compaction conflict rule (which
            # rebases past non-overlapping ingest) could not see it
            live, _, _, file_sizes = self._replay(rv)

            def dir_bytes(rel: str) -> int:
                # manifest first (no filesystem listing — at 100 TB on an
                # object store a LIST per dir is the expensive part);
                # pre-size-manifest dirs fall back to one listing
                recorded = file_sizes.get(rel)
                if recorded:
                    return sum(recorded.values())
                root = os.path.join(self.path, _DATA, rel)
                return sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in os.listdir(root)
                    if os.path.isfile(os.path.join(root, f))
                )

            small = [rel for rel in live if dir_bytes(rel) < max_dir_bytes]
            if len(small) < 2:
                return rv  # nothing worth folding
            # DV-applied fold: a folded file's deletion vector must be
            # subtracted before its rows land in the compacted file (the
            # vectors of UNTOUCHED dirs stay live — this fold only purges
            # the folded files' entries physically)
            folded = self._apply_dv(
                self._scan(
                    [os.path.join(self.path, _DATA, d) for d in small],
                    merge_schema=True,
                ),
                self._live_dvs(rv),
            ).coalesce(target_partitions)
            rel = self._write_data_dir(folded, rv + 1)
            return self._commit(
                "optimize",
                add=[rel],
                remove=small,
                data_change=False,
                read_version=rv,
            )

        # the full rewrite reads, retires, and purges the rv snapshot
        # EXACTLY — any commit landing after rv is the conflict matrix's
        # problem (blind appends rebase and keep their dirs; overlapping
        # retires replan), never silently folded into the remove list
        current = self.read(version=rv, merge_schema=True, with_row_ids=True)
        if zorder_by is None:
            current = current.coalesce(target_partitions)
        else:
            from daas_apps_spark.operators.partitioning import (
                _morton_sql_n,
            )

            cols = list(zorder_by)
            if zorder_bits < 1:
                raise ValueError(
                    f"optimize(zorder_bits=...): need >= 1, got {zorder_bits}"
                )
            if len(cols) < 2 or len(cols) * zorder_bits > 62:
                raise ValueError(
                    "optimize(zorder_by=...): pass 2 to "
                    f"{62 // zorder_bits} columns at {zorder_bits} bits "
                    f"(N*bits must fit a bigint; got {len(cols)})"
                )
            bounds = current.agg(
                *[f(c) for c in cols for f in (F.min, F.max)]
            ).first()
            for i, c in enumerate(cols):
                if bounds[2 * i] is None or bounds[2 * i + 1] is None:
                    # min/max ignore NULLs: a None bound means the column
                    # has no non-NULL values — no range to interleave;
                    # fail with intent instead of a NoneType comparison
                    raise ValueError(
                        f"optimize(zorder_by=...): column {c!r} is "
                        "entirely NULL (or the table is empty) — Z-order "
                        "needs a value range on every column"
                    )

            zmax = (1 << zorder_bits) - 1

            def scaled(col: str, lo, hi) -> str:
                span = hi - lo if hi > lo else 1
                return (
                    f"(cast(floor(({col} - ({lo})) * {zmax}.0 / ({span})) "
                    "as bigint))"
                )

            morton = _morton_sql_n(
                [
                    scaled(c, bounds[2 * i], bounds[2 * i + 1])
                    for i, c in enumerate(cols)
                ],
                "div",
                bits=zorder_bits,
            )
            # Split files on the EXACT code prefix (bucket = z div width),
            # not on sampled raw-code ranges: a sampled boundary can land
            # inside a quadrant and hand one file a sliver of the next
            # quadrant — whose OTHER dimension resets to 0 — destroying
            # that file's bounding box. The hive partitioned writer splits
            # by VALUE (never by sample), so each output file holds exactly
            # one bucket; the files are then moved up into a flat data dir
            # (the bucket id has done its job — it is not a data column).
            # Cost: file-size balance follows the data's code-space
            # distribution — the pruning-over-balance trade OPTIMIZE wants.
            import glob
            import shutil

            width = max(
                (1 << (len(cols) * zorder_bits)) // target_partitions, 1
            )
            rel = f"v{rv + 1}-{uuid.uuid4().hex[:8]}"
            tmp_out = os.path.join(self.path, _DATA, f".tmp-{rel}")
            (
                # _to_physical: this bypasses _write_data_dir, so the
                # column-mapping rename happens here (helper cols are
                # unmapped and pass through)
                self._to_physical(
                    current.withColumn("_zorder", F.expr(morton))
                    .withColumn("_zbucket", F.expr(f"_zorder div {width}"))
                    .repartition(target_partitions, "_zbucket")
                    .sortWithinPartitions("_zbucket", "_zorder")
                    .drop("_zorder"),
                    self.column_mapping(),
                )
                .write.partitionBy("_zbucket")
                .mode("overwrite")
                .parquet(tmp_out)
            )
            final = os.path.join(self.path, _DATA, rel)
            os.makedirs(final, exist_ok=True)
            idx = 0
            # the dir's own uuid suffix keeps z-file BASENAMES globally
            # unique — deletion vectors key on basename, so two zorder
            # rewrites must never mint the same file name
            ztag = rel.rsplit("-", 1)[-1]
            for sub in sorted(glob.glob(os.path.join(tmp_out, "_zbucket=*"))):
                for f in sorted(glob.glob(os.path.join(sub, "*.parquet"))):
                    os.rename(
                        f,
                        os.path.join(
                            final, f"z{idx:05d}-{ztag}.snappy.parquet"
                        ),
                    )
                    idx += 1
            shutil.rmtree(tmp_out, ignore_errors=True)
            old = [os.path.basename(p) for p in self._live_dirs(rv)]
            # ``current`` came from read(version=rv) and is therefore
            # DV-applied: a full rewrite PURGES the rv snapshot's vectors
            return self._commit(
                "optimize",
                add=[rel],
                remove=old,
                data_change=False,
                dv_remove=self._live_dvs(rv),
                read_version=rv,
            )
        old = [os.path.basename(p) for p in self._live_dirs(rv)]
        rel = self._write_data_dir(current, rv + 1)
        return self._commit(
            "optimize",
            add=[rel],
            remove=old,
            data_change=False,
            dv_remove=self._live_dvs(rv),
            read_version=rv,
        )

    def changes_between(
        self, v_from: int, v_to: int | None = None
    ) -> DataFrame:
        """Row-level change feed between two versions: rows tagged
        ``_change_type`` 'insert' or 'delete' (an update surfaces as the
        delete+insert pair — Delta CDF's pre/post-image, reduced to full
        rows).

        Fast path: when every commit in the range only ADDS dirs
        (append-only), the inserts are exactly the added dirs — read
        straight off the manifest, no snapshot diff, no shuffle; the scan
        touches only the new data regardless of table size. Rewriting
        commits (overwrite/merge/optimize) in the range fall back to a
        snapshot diff (two ``exceptAll``s) — correct everywhere, priced
        by the smaller snapshot.

        On a ROW-TRACKED table (A43) the feed also surfaces
        ``__row_id`` and pairs an update's two rows as
        ``update_preimage``/``update_postimage`` (Delta CDF's four
        change types): a stable id present on both sides of the diff IS
        an update, with no key declaration needed."""
        from pyspark.sql import functions as F

        v_to = self.latest_version() if v_to is None else v_to
        in_range = [
            c for c in self._commits() if v_from < c["version"] <= v_to
        ]
        missing = set(range(v_from + 1, v_to + 1)) - {
            c["version"] for c in in_range
        }
        if missing:
            raise ValueError(
                f"commit files missing for versions {sorted(missing)} — the "
                "log was truncated past this range; reprocess from a full "
                "snapshot instead of the change feed"
            )
        # OPTIMIZE commits are pure rewrites (data_change: false): row-wise
        # no-ops the feed skips, so compaction inside the range neither
        # breaks the manifest fast path nor surfaces phantom changes
        changing = [c for c in in_range if c.get("data_change", True)]
        if all(not c["remove"] for c in changing):
            added = [
                os.path.join(self.path, _DATA, d)
                for c in changing
                for d in c["add"]
            ]
            dv_rels = [
                d for c in changing for d in c.get("dv_add", [])
            ]
            # feed rows surface LOGICAL names as of v_to — both fast
            # paths read raw (physical-name) files
            mapping = self.column_mapping(v_to)
            if not dv_rels:
                if not added:
                    return self._empty_feed(v_to)
                # mergeSchema across the added dirs: commits after a
                # schema-evolving merge carry wider files, and a plain read
                # would adopt one dir's schema and drop the evolved column
                return self._to_logical(
                    self._scan(added, merge_schema=True),
                    mapping,
                ).withColumn("_change_type", F.lit("insert"))
            # MOR delta fast path: deletes are exactly the in-range
            # vectors' positions — read ONLY the referenced files and
            # semi-join, cost ∝ |delta| like the insert side
            mor = self._mor_delta_feed(in_range, added, dv_rels, mapping)
            if mor is not None:
                return self._pair_update_images(mor)
        # snapshot diff under schema evolution: read BOTH sides merged and
        # align them to the union schema (NULL for a side that predates a
        # column) — exceptAll requires identical schemas, and a narrower
        # base would either raise or silently drop rows that differ only
        # in the evolved column, corrupting downstream IVM
        # mapping_as_of=v_to on the BASE read: across a rename, both
        # snapshots must align on the same (newer) logical names or the
        # exceptAll pair would see disjoint schemas
        tracked = self.row_tracking(v_to)
        cur = self.read(
            version=v_to, merge_schema=True, with_row_ids=tracked
        )
        try:
            base = self.read(
                version=v_from,
                merge_schema=True,
                mapping_as_of=v_to,
                with_row_ids=tracked,
            )
        except ValueError:
            # v_from predates the first snapshot (e.g. 0): the base is the
            # empty table — every current row is an insert. The fast path
            # used to absorb this case; a MOR delete in the range routes
            # it here instead
            base = cur.limit(0)
        cur_types = {f.name: f.dataType for f in cur.schema.fields}
        base_types = {f.name: f.dataType for f in base.schema.fields}
        names = list(dict.fromkeys([*cur_types, *base_types]))

        def _align(df, have):
            return df.select(
                *[
                    F.col(n)
                    if n in have
                    else F.lit(None)
                    .cast(cur_types.get(n) or base_types[n])
                    .alias(n)
                    for n in names
                ]
            )

        cur, base = _align(cur, cur_types), _align(base, base_types)
        return self._pair_update_images(
            cur.exceptAll(base)
            .withColumn("_change_type", F.lit("insert"))
            .unionByName(
                base.exceptAll(cur).withColumn("_change_type", F.lit("delete"))
            )
        )

    def _pair_update_images(self, feed: DataFrame) -> DataFrame:
        """Row-tracking CDF upgrade: an id on BOTH sides of the feed is
        one row that changed — retag its delete as ``update_preimage``
        and its insert as ``update_postimage`` (Delta CDF's four change
        types). One delta-sized aggregation + one join; no-op (same
        plan object) when the feed carries no ids. Net-range semantics
        make this sound: a transient row (inserted then deleted inside
        the range) never survives the diff, and the MOR fast path nets
        same-range insert+delete pairs out before this pairing runs."""
        if _ROWID not in feed.columns:
            return feed
        from pyspark.sql import functions as F

        both = (
            feed.groupBy(_ROWID)
            .agg(
                F.sum(
                    F.when(F.col("_change_type") == "insert", 1).otherwise(0)
                ).alias("__i"),
                F.sum(
                    F.when(F.col("_change_type") == "delete", 1).otherwise(0)
                ).alias("__d"),
            )
            .filter("__i > 0 AND __d > 0")
            .select(_ROWID, F.lit(True).alias("__upd"))
        )
        # no forced broadcast: both sides are delta-sized (a nightly
        # delta can be GBs); AQE picks broadcast when the id set is small
        return (
            feed.join(both, _ROWID, "left")
            .withColumn(
                "_change_type",
                F.when(
                    F.col("__upd") & (F.col("_change_type") == "insert"),
                    F.lit("update_postimage"),
                )
                .when(
                    F.col("__upd") & (F.col("_change_type") == "delete"),
                    F.lit("update_preimage"),
                )
                .otherwise(F.col("_change_type")),
            )
            .drop("__upd")
        )

    def _mor_delta_feed(
        self,
        in_range: list[dict],
        added: list[str],
        dv_rels: list[str],
        mapping: dict | None = None,
    ) -> DataFrame | None:
        """Manifest fast path for a commit range whose only row removals
        are MERGE-ON-READ vectors (no dir rewrites): inserts are the
        added dirs (as in the append-only path), and deletes are the
        in-range vectors' (file, position) pairs — resolved by reading
        ONLY the referenced files and semi-joining the positions. Cost is
        ∝ |delta| on both sides; the snapshot diff it replaces scans the
        table twice. At 100 TB this is what keeps incremental view
        maintenance affordable after a night of GDPR deletes: the feed
        prices the deletes, not the corpus.

        A vector referencing a file ADDED in the same range is a row
        inserted AND deleted inside the range: the snapshot diff nets
        the pair to nothing, so the fast path reproduces that exactly —
        the delete side reads only pre-range files, and the insert side
        anti-joins those same-range positions away. Both sides stay
        ∝ |delta|.

        Returns None — caller falls back to the snapshot diff — when the
        path cannot be proven exactly net-equivalent to the diff: files
        from pre-manifest commits whose basenames the log cannot place,
        or basenames the log places in two dirs."""
        from pyspark.sql import functions as F

        dv = self._read_dvs(dv_rels)
        # manifest arithmetic: basename -> owning data dir, from every
        # commit's recorded per-file stats (tiny driver-side maps, the
        # same scale as the live-dir bookkeeping)
        owner: dict[str, str] = {}
        collide: set[str] = set()
        for c in self._commits():
            for rel, fstats in (c.get("file_stats") or {}).items():
                for basename in fstats:
                    if basename in owner and owner[basename] != rel:
                        collide.add(basename)
                    owner[basename] = rel
        changing_files = {
            basename
            for c in in_range
            if c.get("data_change", True)
            for fstats in (c.get("file_stats") or {}).values()
            for basename in fstats
        }
        rewrite_files = {
            basename
            for c in in_range
            if not c.get("data_change", True)
            for fstats in (c.get("file_stats") or {}).values()
            for basename in fstats
        }
        # the vector side is manifest-sized: commits record each
        # vector's referenced basenames (dv_files), so placing the
        # deletes is pure manifest arithmetic; a commit predating the
        # key (or whose vector was too big to harvest) falls back to
        # one distinct-basename pull
        recorded: dict[str, list[str]] = {}
        for c in in_range:
            recorded.update(c.get("dv_files") or {})
        if all(rel in recorded for rel in dv_rels):
            touched = sorted(
                {f for rel in dv_rels for f in recorded[rel]}
            )
        else:
            touched = [
                r.file for r in dv.select("file").distinct().collect()
            ]
        if any(f not in owner for f in touched):
            return None  # pre-manifest file: cannot place it
        if any(f in collide for f in touched):
            # basename placed in TWO dirs by different commits (e.g.
            # legacy fixed-name zorder files across historical OPTIMIZE
            # runs resurfaced by RESTORE): last-writer-wins would read
            # the preimage from a silently-guessed file — fall back to
            # the snapshot diff, which never resolves by basename
            return None
        if any(f in rewrite_files for f in touched):
            # file written by an in-range OPTIMIZE: its rows may mix
            # pre-range rows (the diff emits their delete) with
            # same-range inserts (the diff nets them out), and the
            # manifest cannot tell them apart — fall back
            return None
        # split the vector targets: pre-range files feed the delete
        # side; same-range files mark transient rows (inserted AND
        # deleted inside the range) that the diff nets out, so they are
        # anti-joined off the insert side instead of emitted
        new_touched = {f for f in touched if f in changing_files}
        old_touched = [f for f in touched if f not in new_touched]
        dv_pairs = dv.select(
            F.col("file").alias("__dv_file"),
            F.col("pos").cast("long").alias("__dv_pos"),
        )
        deletes = None
        if old_touched:
            paths = sorted(
                os.path.join(self.path, _DATA, owner[f], f)
                for f in old_touched
            )
            deletes = self._to_logical(
                self._scan(paths, merge_schema=True)
                .withColumn("__dv_file", F.col("_metadata.file_name"))
                .withColumn(
                    "__dv_pos", F.col("_metadata.row_index").cast("long")
                )
                .join(
                    F.broadcast(dv_pairs),
                    ["__dv_file", "__dv_pos"],
                    "left_semi",
                )
                .drop("__dv_file", "__dv_pos"),
                mapping,
            ).withColumn("_change_type", F.lit("delete"))
        if not added:
            return deletes if deletes is not None else self._empty_feed(
                in_range[-1]["version"]
            )
        inserts = self._scan(added, merge_schema=True)
        if new_touched:
            inserts = (
                inserts.withColumn(
                    "__dv_file", F.col("_metadata.file_name")
                )
                .withColumn(
                    "__dv_pos", F.col("_metadata.row_index").cast("long")
                )
                .join(
                    F.broadcast(
                        dv_pairs.filter(
                            F.col("__dv_file").isin(list(new_touched))
                        )
                    ),
                    ["__dv_file", "__dv_pos"],
                    "left_anti",
                )
                .drop("__dv_file", "__dv_pos")
            )
        inserts = self._to_logical(inserts, mapping).withColumn(
            "_change_type", F.lit("insert")
        )
        if deletes is None:
            return inserts
        # union by name with NULL fill: deleted rows come from files that
        # may predate an evolved column the inserts carry (and vice versa)
        return inserts.unionByName(deletes, allowMissingColumns=True)

    def _empty_feed(self, v_to: int) -> DataFrame:
        """Zero-row change feed carrying the table's schema. An empty
        version range on an EMPTY table has no snapshot to ``read`` (and
        even historical commits may be vacuumed), so fall back through:
        snapshot at v_to → any data dir still on disk from the log →
        a bare ``_change_type`` column."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        try:
            return self.read(version=v_to).limit(0).withColumn(
                "_change_type", F.lit("insert")
            )
        except ValueError:
            pass
        for c in reversed(self._commits()):
            for rel in c["add"]:
                d = os.path.join(self.path, _DATA, rel)
                if os.path.isdir(d):
                    return self._to_logical(
                        self._scan([d]).limit(0),
                        self.column_mapping(v_to),
                    ).withColumn("_change_type", F.lit("insert"))
        return self.spark.createDataFrame(
            [], T.StructType([T.StructField("_change_type", T.StringType())])
        )

    def vacuum(
        self,
        keep_versions: int = 0,
        min_age_seconds: float = 0.0,
        dry_run: bool = False,
    ) -> list[str]:
        """Delete data dirs unreferenced by any version newer than
        ``latest - keep_versions`` — the storage-reclaim step that
        TRADES time travel (older snapshots become unreadable) for
        space. Snapshots pinned by a named ref (set_ref) are always
        spared. Orphan dirs (torn writes no commit references) are also
        reclaimed. Returns the deleted dir names.

        ``min_age_seconds`` is the retention window Delta's VACUUM has
        for the same reason: a concurrent in-flight writer's
        not-yet-committed dir is indistinguishable from a torn-write
        orphan, so dirs younger than the threshold are spared. The
        default 0 reclaims everything immediately and therefore REQUIRES
        writer quiescence (the single-writer deployments this format's
        os.rename commit already assumes); the CLI defaults to a safer
        1h window.

        ``dry_run=True`` reports what WOULD be reclaimed (same list, same
        age/ref/retention rules) without deleting anything — the sanity
        read before trading away time travel, Delta's VACUUM DRY RUN;
        ``vacuum_report`` prices the same candidate set in bytes."""
        import shutil
        import time

        horizon = self.latest_version() - keep_versions
        # a named ref PROTECTS its snapshot from expiration (Iceberg's
        # retention rule): a tag that vacuum can silently break is no
        # pin at all — drop the ref first to release its storage.
        # Deletion-vector dirs expire by the same rule: keep any vector
        # live in a retained or ref-pinned snapshot, reclaim the rest.
        # One incremental replay snapshots BOTH live sets at every
        # protected version — O(commits) total, not O(versions) full
        # replays (each of which re-reads every checkpoint/commit JSON).
        wanted = sorted(
            set(range(max(horizon, 1), self.latest_version() + 1))
            | set(self.refs().values())
        )
        keep, dv_keep = self._live_sets_at(wanted)
        # a PENDING multi-table txn's staged dirs are invisible to every
        # replay but flip live at its commit — reaping them would turn
        # the txn's eventual commit into dangling references (aborted
        # txns' dirs stay unprotected: permanently dead, reclaimable)
        for e in self._commits():
            if e.get("_txn_pending"):
                keep = set(keep) | set(e.get("_txn_staged_add", []))
                dv_keep = set(dv_keep) | set(
                    e.get("_txn_staged_dv_add", [])
                )
        now = time.time()
        deleted = []
        for root, protected, prefix in (
            (os.path.join(self.path, _DATA), keep, ""),
            (os.path.join(self.path, _DV), dv_keep, f"{_DV}/"),
        ):
            if not os.path.isdir(root):
                continue
            for d in sorted(os.listdir(root)):
                if d in protected:
                    continue
                full = os.path.join(root, d)
                try:
                    age = now - os.path.getmtime(full)
                except OSError:
                    continue
                if age < min_age_seconds:
                    continue
                if not dry_run:
                    shutil.rmtree(full, ignore_errors=True)
                    if prefix == "":
                        # a data dir's bloom sidecar describes files
                        # that no longer exist — reclaim it with them
                        shutil.rmtree(
                            os.path.join(self.path, _BLOOM, d),
                            ignore_errors=True,
                        )
                deleted.append(prefix + d)
        return deleted

    def vacuum_report(
        self, keep_versions: int = 0, min_age_seconds: float = 0.0
    ) -> dict:
        """Byte-reporting VACUUM dry run: what ``vacuum`` with the same
        arguments would reclaim, priced in bytes — the number an
        operator actually weighs against losing time travel. Candidate
        dirs come from the same dry-run listing (same age/ref/retention
        rules); bytes come from the manifest's per-file sizes where the
        dir was committed with them, one filesystem listing otherwise
        (orphan dirs from torn writes are never in the manifest).
        Manifest pricing counts DATA files; writer sidecars (_SUCCESS,
        .crc) are a rounding error it deliberately ignores.
        Returns ``{"dirs": [...], "total_bytes": N, "per_dir": {...}}``;
        nothing is deleted."""
        # rel → recorded sizes across ALL commits (dead dirs included —
        # the live replay drops exactly the dirs vacuum reclaims)
        recorded: dict = {}
        for c in self._commits():
            recorded.update(c.get("file_sizes") or {})
        candidates = self.vacuum(
            keep_versions, min_age_seconds, dry_run=True
        )
        per_dir: dict[str, int] = {}
        for name in candidates:
            rel = name[len(_DV) + 1 :] if name.startswith(f"{_DV}/") else name
            sizes = None if name.startswith(f"{_DV}/") else recorded.get(rel)
            if sizes:
                per_dir[name] = sum(sizes.values())
                continue
            root = os.path.join(
                self.path, _DV if name.startswith(f"{_DV}/") else _DATA, rel
            )
            total = 0
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(dirpath, f))
                    except OSError:
                        pass
            per_dir[name] = total
        return {
            "dirs": candidates,
            "total_bytes": sum(per_dir.values()),
            "per_dir": per_dir,
        }

    def read(
        self,
        version: int | None = None,
        prune: tuple[str, object, object] | None = None,
        merge_schema: bool = False,
        as_of=None,
        ref: str | None = None,
        mapping_as_of: int | None = None,
        with_row_ids: bool = False,
    ) -> DataFrame:
        """Snapshot read — latest by default; time travel with ``version``
        (VERSION AS OF), ``as_of`` (TIMESTAMP AS OF: epoch seconds,
        datetime, or ISO string), or ``ref`` (a named tag from set_ref).
        The three selectors are mutually exclusive.

        ``prune=(col, lo, hi)`` is manifest-level FILE skipping: files
        whose commit-recorded [min, max] for ``col`` cannot intersect
        [lo, hi] are excluded from the scan ENTIRELY (they are never
        listed, opened, or footer-read) — the Iceberg manifest-pruning
        step that sits ABOVE parquet's own row-group pruning. A dir
        whose ROLLUP range is disjoint is dropped without per-file
        checks; otherwise its per-file stats cut the scan to the
        intersecting files (a commit dir can hold many). Dirs from
        pre-file-stats commits, and files/dirs with no recorded stats
        for the column, are conservatively kept. The caller still
        applies the actual filter; pruning only shrinks the scan, never
        the semantics.

        Column names (output schema and the ``prune`` column) are
        LOGICAL: with an active column mapping the scan's physical names
        are projected to the logical schema as of the read's version —
        time travel before a rename surfaces the old name.
        ``mapping_as_of`` overrides the mapping version (the change
        feed aligns both of its snapshots on the NEWER mapping so their
        schemas match across a rename)."""
        if sum(x is not None for x in (version, as_of, ref)) > 1:
            raise ValueError("pass at most one of version / as_of / ref")
        if ref is not None:
            tags = self.refs()
            if ref not in tags:
                raise ValueError(f"unknown ref {ref!r}; have {sorted(tags)}")
            version = tags[ref]
        elif as_of is not None:
            version = self._resolve_as_of(as_of)
        live, stats, file_stats, _ = self._replay(version)
        dvs = self._live_dvs(version)
        mapping = self.column_mapping(
            version if mapping_as_of is None else mapping_as_of
        )
        dirs = [os.path.join(self.path, _DATA, d) for d in live]
        if not dirs:
            raise ValueError(f"no snapshot at version {version} in {self.path}")

        def _out(df: DataFrame) -> DataFrame:
            # the row-tracking id is ENGINE state, not user data: hidden
            # from ordinary reads; internal rewrite paths (and change-feed
            # pairing) ask for it explicitly so rewrites preserve it
            if not with_row_ids and _ROWID in df.columns:
                df = df.drop(_ROWID)
            return df

        def reader_parquet(paths):
            # schema evolution: commits may add columns over time; the
            # merged read surfaces the union schema with NULLs for rows
            # written before a column existed (parquet mergeSchema). An
            # active type widening switches to an explicit widened
            # schema (which subsumes the merge) — _scan decides.
            return self._scan(paths, merge_schema=merge_schema,
                              version=version)

        if prune is not None:
            col, lo, hi = prune
            # manifest stats are keyed by PHYSICAL names (footer
            # harvest); resolve the logical prune column through the
            # mapping
            col = logical_to_physical(mapping).get(col.lower(), col)
            lo, hi = _stat_key(lo), _stat_key(hi)

            def _keeps(rng) -> bool:
                return (
                    rng is None
                    or lo is None
                    or hi is None
                    or not (rng[1] < lo or rng[0] > hi)
                )

            # equality prune: the bloom sidecars can disqualify files
            # whose [min, max] range spans the probe but whose bitmap
            # proves the exact value absent — points, where range stats
            # are blind on high-cardinality unsorted columns. Files
            # without a bloom stay "maybe" (conservative).
            bloom_no = (
                self._bloom_maybe_contains(live, col, prune[1])
                if (lo is not None and lo == hi and prune[1] is not None)
                else {}
            )
            kept = []
            for rel in live:
                if not _keeps(stats.get(rel, {}).get(col)):
                    continue  # whole dir provably disjoint
                fstats = file_stats.get(rel)
                full = os.path.join(self.path, _DATA, rel)
                if not fstats:
                    kept.append(full)  # pre-file-stats commit: keep dir
                    continue
                kept.extend(
                    os.path.join(full, f)
                    for f in sorted(fstats)
                    if _keeps(fstats[f].get(col))
                    and bloom_no.get(f, True)
                )
            if not kept:
                # all files pruned: zero rows, but keep the same (possibly
                # merged) schema the un-pruned read would surface
                return _out(
                    self._to_logical(reader_parquet(dirs).limit(0), mapping)
                )
            return _out(
                self._to_logical(
                    self._apply_dv(reader_parquet(kept), dvs), mapping
                )
            )
        return _out(
            self._to_logical(
                self._apply_dv(reader_parquet(dirs), dvs), mapping
            )
        )

    def history(self) -> list[dict]:
        return self._commits()

    def files(self, version: int | None = None) -> DataFrame:
        """The live-file inventory at ``version`` as a DataFrame —
        Delta/Iceberg's ``files`` metadata table: one row per live data
        file with its dir, byte size, and per-column [min, max,
        null_count] stats (JSON cell; stats are heterogeneous across
        columns). Pure manifest arithmetic — no data file is opened —
        so it is the cheap input for layout audits ('how skewed are my
        file sizes', 'are stats tight on the clustering key') that
        would otherwise need a filesystem crawl."""
        from pyspark.sql import types as T

        live, _, file_stats, file_sizes = self._replay(version)
        file_rows = self._replay_file_rows(version)
        rows = []
        for rel in live:
            st = file_stats.get(rel) or {}
            sz = file_sizes.get(rel) or {}
            rw = file_rows.get(rel) or {}
            for f in sorted(set(st) | set(sz) | set(rw)):
                rows.append(
                    (
                        rel,
                        f,
                        sz.get(f),
                        rw.get(f),
                        json.dumps(st[f]) if f in st else None,
                    )
                )
        schema = T.StructType(
            [
                T.StructField("dir", T.StringType()),
                T.StructField("file", T.StringType()),
                T.StructField("size_bytes", T.LongType()),
                T.StructField("rows", T.LongType()),
                T.StructField("stats", T.StringType()),
            ]
        )
        return self.spark.createDataFrame(rows, schema)

    def _dv_deleted_positions(self, version: int | None = None) -> dict:
        """{file basename: set of live deleted row positions} from the
        live deletion-vector parquets at ``version`` — positions, not
        rows, so the read is |delta|-bounded; pyarrow only, the DATA
        files are never opened. Duplicate (file, pos) pairs across
        vector dirs collapse (the read-side anti-join dedups the same
        way)."""
        import glob as _glob

        import pyarrow.parquet as pq

        out: dict[str, set] = {}
        for rel in self._live_dvs(version):
            for f in sorted(
                _glob.glob(os.path.join(self.path, _DV, rel, "*.parquet"))
            ):
                t = pq.read_table(f, columns=["file", "pos"])
                for b, p in zip(
                    t.column("file").to_pylist(), t.column("pos").to_pylist()
                ):
                    out.setdefault(b, set()).add(p)
        return out

    def manifest_count(self, version: int | None = None) -> int:
        """Exact ``COUNT(*)`` at ``version`` answered from the MANIFEST
        alone — commit log + checkpoint (+ parquet manifest sidecar),
        minus the live deletion vectors' per-file position counts. Zero
        data-file opens on any table written by this writer: at 100 TB
        "how many rows is this table" costs one log read, not a scan.
        The A14 footer-aggregate pushdown idea (tests/test_plans.py)
        applied to the versioned table's own manifest. Files from
        commits predating the row-count manifest fall back to ONE
        parquet FOOTER read each (metadata pages only, never row data).
        Generalizes the reference's per-interval record accounting
        (SparkCaller.java:79-126) to manifest arithmetic."""
        import glob as _glob

        import pyarrow.parquet as pq

        live, _, _, file_sizes = self._replay(version)
        rows_map = self._replay_file_rows(version)
        rows_by_base: dict[str, int] = {}
        for rel in live:
            rw = rows_map.get(rel) or {}
            sz = file_sizes.get(rel) or {}
            universe = set(rw) | set(sz)
            if not universe:
                # pre-manifest commit: one listing + footer read per file
                for f in sorted(
                    _glob.glob(
                        os.path.join(self.path, _DATA, rel, "*.parquet")
                    )
                ):
                    rows_by_base[os.path.basename(f)] = pq.ParquetFile(
                        f
                    ).metadata.num_rows
                continue
            for f in universe:
                n = rw.get(f)
                if n is None:
                    n = pq.ParquetFile(
                        os.path.join(self.path, _DATA, rel, f)
                    ).metadata.num_rows
                rows_by_base[f] = n
        total = sum(rows_by_base.values())
        # merge-on-read deletes: each live (file, pos) pair hides exactly
        # one row of a live file
        for b, poss in self._dv_deleted_positions(version).items():
            if b in rows_by_base:
                total -= len(poss)
        return total

    def manifest_min_max(self, col: str, version: int | None = None):
        """Exact ``(MIN(col), MAX(col))`` at ``version`` from the
        per-file manifest stats — zero data reads. SQL semantics: NULLs
        are ignored (parquet stats already exclude them); an empty table
        returns ``(None, None)``. DATE/TIMESTAMP extremes return the
        manifest's fixed-width ISO strings (``_stat_key``).

        Refuses LOUDLY instead of guessing when the manifest cannot
        prove exactness: a live file with no recorded [min, max] for the
        column (not stats-listed — widen ``set_stats_columns`` and
        OPTIMIZE — or an unorderable/all-NULL file, or a pre-file-stats
        commit), or a deletion vector touching EVERY file that attains
        the extreme (the vector may have deleted the extreme row itself
        — OPTIMIZE/compact first, or scan)."""
        live, _, file_stats, file_sizes = self._replay(version)
        rows_map = self._replay_file_rows(version)
        mapping = self.column_mapping(version)
        pcol = logical_to_physical(mapping).get(col.lower(), col)
        mins: list[tuple] = []  # (stat value, file basename)
        maxs: list[tuple] = []
        for rel in live:
            fstats = file_stats.get(rel)
            rw = rows_map.get(rel) or {}
            universe = (
                set(rw) | set(file_sizes.get(rel) or {}) | set(fstats or {})
            )
            if fstats is None or not universe:
                raise ValueError(
                    f"manifest_min_max({col!r}): live dir {rel} predates "
                    "the per-file stats manifest — OPTIMIZE to rewrite it "
                    "with stats, or run the scan-based aggregate"
                )
            for f in universe:
                st = (fstats.get(f) or {}).get(pcol)
                if st is None:
                    if rw.get(f) == 0:
                        continue  # zero-row part file: no data, no stats
                    raise ValueError(
                        f"manifest_min_max({col!r}): live file {rel}/{f} "
                        f"has no recorded [min, max] for {pcol!r} — the "
                        "column is not stats-listed (set_stats_columns) "
                        "or stats were unavailable at write time; the "
                        "manifest cannot answer exactly, scan instead"
                    )
                mins.append((st[0], f))
                maxs.append((st[1], f))
        if not mins:
            return (None, None)
        gmin = min(v for v, _ in mins)
        gmax = max(v for v, _ in maxs)
        dv = self._dv_deleted_positions(version)
        if dv:
            for g, side, lst in (
                (gmin, "MIN", mins),
                (gmax, "MAX", maxs),
            ):
                attaining = [f for v, f in lst if v == g]
                if all(f in dv for f in attaining):
                    raise ValueError(
                        f"manifest_min_max({col!r}): every file attaining "
                        f"the global {side} carries a deletion vector — "
                        "the vector may have deleted the extreme row, so "
                        "the manifest cannot answer exactly; OPTIMIZE (or "
                        "purge vectors) first, or scan"
                    )
        return (gmin, gmax)

    def snapshots(self) -> DataFrame:
        """The commit log as a DataFrame — Delta's DESCRIBE HISTORY /
        Iceberg's ``snapshots`` metadata table: one row per commit with
        version, operation, publish timestamp, add/remove counts, the
        data_change flag, and declared features."""
        from pyspark.sql import types as T

        rows = [
            (
                c["version"],
                c["operation"],
                float(c["ts"]) if c.get("ts") else None,
                len(c["add"]),
                len(c["remove"]),
                len(c.get("dv_add", [])),
                bool(c.get("data_change", True)),
                ",".join(c.get("features", [])),
                ",".join(c.get("writer_features", [])),
            )
            for c in self._commits()
        ]
        schema = T.StructType(
            [
                T.StructField("version", T.LongType()),
                T.StructField("operation", T.StringType()),
                T.StructField("ts", T.DoubleType()),
                T.StructField("n_add", T.IntegerType()),
                T.StructField("n_remove", T.IntegerType()),
                T.StructField("n_dv_add", T.IntegerType()),
                T.StructField("data_change", T.BooleanType()),
                T.StructField("reader_features", T.StringType()),
                T.StructField("writer_features", T.StringType()),
            ]
        )
        return self.spark.createDataFrame(rows, schema)

    def detail(self, version: int | None = None) -> dict:
        """DESCRIBE DETAIL — the operational summary a table owner reads
        before deciding to OPTIMIZE / compact vectors / VACUUM: live
        dir/file counts and bytes, small-file count, live deletion-vector
        dirs and their recorded delete counts, constraints, refs, and log
        depth. Pure manifest + filesystem arithmetic (file sizes via
        os.stat on the live set — O(files) metadata ops, no data read,
        no Spark job)."""
        live, _, file_stats, file_sizes = self._replay(version)
        n_files = 0
        total_bytes = 0
        small_files = 0
        for rel in live:
            recorded = file_sizes.get(rel)
            if recorded:
                # manifest sizes: no filesystem listing (the expensive
                # call per dir on an object store)
                for size in recorded.values():
                    n_files += 1
                    total_bytes += size
                    if size < 4 << 20:
                        small_files += 1
                continue
            root = os.path.join(self.path, _DATA, rel)
            for f in os.listdir(root):
                full = os.path.join(root, f)
                if not (os.path.isfile(full) and f.endswith(".parquet")):
                    continue
                n_files += 1
                size = os.path.getsize(full)
                total_bytes += size
                if size < 4 << 20:
                    small_files += 1
        dvs = self._live_dvs(version)
        dv_rows = 0
        if dvs:
            import glob as _glob

            import pyarrow.parquet as pq

            dv_rows = sum(
                pq.ParquetFile(f).metadata.num_rows
                for d in dvs
                for f in _glob.glob(
                    os.path.join(self.path, _DV, d, "*.parquet")
                )
            )
        resolved = (
            version if version is not None else self.latest_version()
        )
        return {
            "version": resolved,
            "num_data_dirs": len(live),
            "num_files": n_files,
            "total_bytes": total_bytes,
            "num_small_files": small_files,  # < 4 MiB: OPTIMIZE candidates
            "num_deletion_vector_dirs": len(dvs),
            "num_deleted_positions": dv_rows,
            "num_constraints": len(self.constraints(version)),
            "stats_columns": self.stats_columns(version),
            "refs": self.refs(version),
            "log_commits": len(self._commits()),
        }
