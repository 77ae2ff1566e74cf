"""Persistent name→path catalog for versioned tables (A45).

Completes the SQL surface: with a catalog, an operator session is PURE
SQL end-to-end — ``CREATE TABLE`` through ``MERGE`` to ``VACUUM`` —
with zero Python table handles (the ``tables=`` dict ``run_sql`` needed
before). The catalog is the reference's "the Properties file IS the
plan" idea (MiscUtils.java:44-64) applied to table NAMES: a directory
of one small JSON file per table, so the mapping survives the session
and two sessions on the same directory see the same names.

Durability/atomicity contract (same discipline as the commit log):
- CREATE claims a name atomically via hard-link publish (O_EXCL
  semantics): two concurrent CREATEs of the same name — one wins, the
  loser gets the "already exists" error, never a torn entry.
- One file per table: concurrent CREATE/DROP of DIFFERENT names never
  contend.
- Names are case-insensitive (stored lowercased), matching the SQL
  resolution rule ``run_sql`` already applies to the tables dict.

Managed vs external: a table created without LOCATION lives under the
catalog's ``tables/`` root and DROP removes its data; a LOCATION table
is external — DROP forgets the name, the data stays (Delta/Hive's
managed-vs-external split).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from daas_apps_spark.sources.table_format import VersionedTable

_NAME_RE = re.compile(r"[A-Za-z_]\w*")

_MV_CONTINUOUS_RE = re.compile(
    r"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<t>[A-Za-z_]\w*)\s+"
    r"CONTINUOUS\s*;?\s*$",
    re.I,
)
_MV_STOP_REFRESH_RE = re.compile(
    r"^\s*STOP\s+REFRESH\s+(?P<t>[A-Za-z_]\w*)\s*;?\s*$", re.I
)
_MV_MANUAL_REFRESH_RE = re.compile(
    r"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<t>[A-Za-z_]\w*)"
    r"(?:\s+FULL)?\s*;?\s*$",
    re.I,
)


class TableCatalog:
    """Directory-backed table catalog: ``<dir>/<name>.json`` entries plus
    a ``tables/`` root for managed data."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.join(path, "tables"), exist_ok=True)

    def _entry_path(self, name: str) -> str:
        return os.path.join(self.path, f"{name.lower()}.json")

    @staticmethod
    def _check_name(name: str) -> str:
        if not _NAME_RE.fullmatch(name):
            raise ValueError(
                f"catalog table name {name!r} must be a plain identifier"
            )
        return name.lower()

    def create(
        self,
        name: str,
        location: str | None = None,
        if_not_exists: bool = False,
        extra: dict | None = None,
    ) -> str:
        """Claim ``name`` atomically; returns the table path. Without
        ``location`` the table is MANAGED (data under the catalog's
        ``tables/`` root, DROP removes it). ``extra`` fields (``kind``,
        ``sql``, ``mv``) ride in the entry — one claim protocol for
        tables, views, and materialized views alike."""
        key = self._check_name(name)
        managed = location is None
        path = (
            os.path.join(self.path, "tables", key) if managed else location
        )
        entry = {
            "name": key,
            "path": os.path.abspath(path),
            "managed": managed,
            "ts": time.time(),
            **(extra or {}),
        }
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        try:
            os.link(tmp, self._entry_path(key))
        except FileExistsError:
            if if_not_exists:
                return self.resolve(name)
            raise ValueError(
                f"{self.kind(name)} {name!r} already exists in the "
                f"catalog ({self.resolve(name)}); DROP it first"
            ) from None
        finally:
            os.unlink(tmp)
        return entry["path"]

    def create_view(
        self, name: str, sql: str, if_not_exists: bool = False
    ) -> None:
        """Register a plain SQL view: stored text, inlined at every
        resolution (no data, no path — DROP VIEW just forgets the
        name). Same atomic hard-link claim as tables, so a view and a
        table can never concurrently take one name."""
        key = self._check_name(name)
        entry = {
            "name": key,
            "path": None,
            "managed": False,
            "ts": time.time(),
            "kind": "view",
            "sql": sql,
        }
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        try:
            os.link(tmp, self._entry_path(key))
        except FileExistsError:
            if if_not_exists:
                return
            raise ValueError(
                f"{self.kind(name)} {name!r} already exists in the "
                "catalog; DROP it first"
            ) from None
        finally:
            os.unlink(tmp)

    def kind(self, name: str) -> str:
        """'table' | 'view' | 'materialized_view' (absent field =
        table, so round-9 catalogs read unchanged)."""
        try:
            return self.entry(name).get("kind", "table")
        except FileNotFoundError:
            return "table"

    def resolve(self, name: str) -> str:
        key = self._check_name(name)
        try:
            with open(self._entry_path(key)) as f:
                return json.load(f)["path"]
        except FileNotFoundError:
            raise KeyError(
                f"table {name!r} is not in the catalog; known: "
                f"{sorted(self.names())}"
            ) from None

    def entry(self, name: str) -> dict:
        with open(self._entry_path(self._check_name(name))) as f:
            return json.load(f)

    def names(self) -> list[str]:
        return sorted(
            n[:-5]
            for n in os.listdir(self.path)
            if n.endswith(".json") and not n.startswith(".tmp-")
        )

    def drop(self, name: str, if_exists: bool = False) -> bool:
        """Forget ``name``; a MANAGED table's data directory is removed
        too (external LOCATIONs stay — the catalog never owned them).

        Ordering matters for two races: the managed data dir is renamed
        to a unique tombstone BEFORE the entry is unlinked, so a
        concurrent CREATE that reclaims the name (and with it the
        managed path) can never have its fresh files swept by this
        drop's still-running delete; and a concurrent DROP of the same
        name resolves as already-dropped instead of crashing on the
        second unlink."""
        key = self._check_name(name)
        try:
            entry = self.entry(key)
        except FileNotFoundError:
            if if_exists:
                return False
            raise KeyError(
                f"table {name!r} is not in the catalog; known: "
                f"{sorted(self.names())}"
            ) from None
        tomb = None
        if entry["managed"] and entry["path"] and os.path.isdir(entry["path"]):
            tomb = f"{entry['path']}.dropped-{uuid.uuid4().hex[:8]}"
            try:
                os.rename(entry["path"], tomb)
            except FileNotFoundError:
                tomb = None  # a racing drop already moved it
        try:
            os.unlink(self._entry_path(key))
        except FileNotFoundError:
            if not if_exists and tomb is None:
                raise KeyError(
                    f"table {name!r} was dropped concurrently"
                ) from None
        if tomb is not None:
            shutil.rmtree(tomb, ignore_errors=True)
        return True

    def table(self, spark: SparkSession, name: str) -> VersionedTable:
        return VersionedTable(spark, self.resolve(name))


class SqlSession:
    """A pure-SQL operator session: every statement resolves table names
    through the catalog (plus optional ad-hoc ``tables`` overrides), so
    the whole lakehouse lifecycle — CREATE TABLE, INSERT, MERGE,
    time-travel SELECT, OPTIMIZE, VACUUM, DROP TABLE — runs as text with
    zero Python table handles."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: TableCatalog | str,
        tables: dict | None = None,
    ):
        self.spark = spark
        self.catalog = (
            catalog
            if isinstance(catalog, TableCatalog)
            else TableCatalog(catalog)
        )
        self.tables = dict(tables or {})
        self._txn: dict | None = None
        # name -> running StreamingQuery for REFRESH ... CONTINUOUS;
        # session-owned: STOP REFRESH stops it, a discarded session
        # leaves it running until the SparkSession ends (the checkpoint
        # makes the next CONTINUOUS resume exactly where it left off)
        self._streams: dict = {}

    def sql(self, text: str) -> DataFrame | int | VersionedTable:
        """Run one statement. ``BEGIN [TRANSACTION]`` / ``COMMIT`` /
        ``ROLLBACK`` are SESSION state: statements between them stage
        under one A38 MultiTableTxn (coordinator in the catalog
        directory, shared by every session on it), and COMMIT is the
        single swap that makes every staged write — across however many
        tables the block touched — visible at once. Inside a block,
        INSERT/DELETE/UPDATE/MERGE/TRUNCATE stage (one write statement
        per table per transaction, except repeated blind INSERTs — the
        same-txn rewrite guard enforces it) and SELECT reads the
        pre-transaction snapshot; other verbs refuse. A session dropped mid-transaction leaves
        the txn pending — invisible, and swept by the coordinator's
        ``abort_abandoned()`` at restart (presumed abort)."""
        from daas_apps_spark.sources.sql_dml import (
            _BEGIN_RE,
            _COMMIT_RE,
            _ROLLBACK_RE,
            run_sql,
            txn_coordinator,
        )

        if _BEGIN_RE.match(text):
            if self._txn is not None:
                raise ValueError(
                    "nested BEGIN — COMMIT or ROLLBACK the open "
                    "transaction first"
                )
            self._txn = txn_coordinator(self.catalog).begin()
            return self._txn["id"]
        if _COMMIT_RE.match(text):
            if self._txn is None:
                raise ValueError("COMMIT without an open transaction")
            txn_coordinator(self.catalog).commit(self._txn)
            self._txn = None
            return 1
        if _ROLLBACK_RE.match(text):
            if self._txn is None:
                raise ValueError("ROLLBACK without an open transaction")
            txn_coordinator(self.catalog).abort(self._txn)
            self._txn = None
            return 0
        m = _MV_CONTINUOUS_RE.match(text)
        if m:
            return self._start_continuous_refresh(m.group("t"))
        m = _MV_STOP_REFRESH_RE.match(text)
        if m:
            return self._stop_continuous_refresh(m.group("t"))
        m = _MV_MANUAL_REFRESH_RE.match(text)
        if m:
            q = self._streams.get(m.group("t").lower())
            if q is not None and q.isActive:
                raise ValueError(
                    f"materialized view {m.group('t')!r} has a CONTINUOUS "
                    "refresh running in this session — STOP REFRESH it "
                    "before refreshing manually (two concurrent "
                    "maintainers would race on the state table)"
                )
        return run_sql(
            self.spark,
            text,
            self.tables,
            catalog=self.catalog,
            txn=self._txn,
        )

    def script(self, text: str) -> list:
        """Run a multi-statement ``;``-separated script through this
        session — statement splitting is quote- and paren-aware, and
        BEGIN/COMMIT/ROLLBACK participate in the SESSION's transaction
        state (a block may open in one script and close in a later
        statement or script). Returns the per-statement results.

        A statement that raises mid-script aborts any transaction the
        SCRIPT ITSELF opened before re-raising — a staged-but-pending
        txn would otherwise block every future commit on its tables
        until abort_abandoned(). A txn opened BEFORE this script (the
        interactive cross-script case the session exists for) is left
        open: the caller owns it and must ROLLBACK after the failure."""
        from daas_apps_spark.sources.sql_dml import (
            _split_top_level,
            txn_coordinator,
        )

        entry_txn = self._txn
        out = []
        try:
            for stmt in _split_top_level(text, sep=";"):
                if stmt.strip():
                    out.append(self.sql(stmt))
        except BaseException:
            if self._txn is not None and self._txn is not entry_txn:
                txn_coordinator(self.catalog).abort(self._txn)
                self._txn = None
            raise
        return out

    def _start_continuous_refresh(self, name: str):
        """``REFRESH MATERIALIZED VIEW <name> CONTINUOUS``: start the
        always-on CDF→IVM loop (streaming/live.py::
        start_continuous_mv_refresh) against the MV's source and state
        tables, floor it at the current watermark + 1 (everything below
        is already materialized), and return the session-owned
        StreamingQuery handle. Every micro-batch commit stamps the same
        ``mv_source_versions`` watermark the batch REFRESH writes, so
        after STOP REFRESH the manual path resumes exactly where the
        stream stopped. Single-table additive MVs only: join MVs need
        the two-sided delta rule and MIN/MAX the affected-group
        recompute — both batch REFRESH steps, refused here loudly."""
        from daas_apps_spark.sources.sql_dml import (
            _MV_VERS_KEY,
            _canonical_mv_state,
        )
        from daas_apps_spark.streaming.live import (
            start_continuous_mv_refresh,
        )

        try:
            e = self.catalog.entry(name)
        except FileNotFoundError:
            raise KeyError(
                f"materialized view {name!r} is not in the catalog; "
                f"known: {sorted(self.catalog.names())}"
            ) from None
        if e.get("kind") != "materialized_view":
            raise ValueError(
                f"{name!r} is a {e.get('kind', 'table').replace('_', ' ')},"
                " not a materialized view"
            )
        mv = e["mv"]
        if len(mv["sources"]) > 1:
            raise ValueError(
                "CONTINUOUS refresh maintains single-table MVs — a join "
                "MV's delta rule needs consistent frames of BOTH sides "
                "per step; REFRESH it manually"
            )
        if mv.get("mins") or mv.get("maxs"):
            raise ValueError(
                "CONTINUOUS refresh maintains additive aggregates only "
                "(COUNT/SUM/AVG) — MIN/MAX need the affected-group "
                "recompute, a batch REFRESH step"
            )
        key = name.lower()
        q = self._streams.get(key)
        if q is not None and q.isActive:
            raise ValueError(
                f"continuous refresh already running for {name!r} in "
                "this session — STOP REFRESH it first"
            )
        mv_vt = VersionedTable(self.spark, e["path"])
        src_name = mv["sources"][0]
        applied = [
            c["metadata"][_MV_VERS_KEY]
            for c in mv_vt.history()
            if _MV_VERS_KEY in (c.get("metadata") or {})
        ]
        if not applied:
            raise ValueError(
                f"materialized view {name!r} has no recorded source "
                "versions — its state table was not created by CREATE "
                "MATERIALIZED VIEW"
            )
        watermark = max(d.get(src_name, 0) for d in applied)
        src_path = self.catalog.resolve(src_name)
        src_vt = VersionedTable(self.spark, src_path)
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in src_vt.read().schema.fields
        )
        q = start_continuous_mv_refresh(
            self.spark,
            src_path,
            e["path"],
            os.path.join(e["path"], "_continuous_checkpoint"),
            schema,
            mv["group_by"],
            mv["count_col"],
            mv["sums"],
            where=mv.get("where"),
            starting_version=watermark + 1,
            watermark_metadata=lambda v: {_MV_VERS_KEY: {src_name: v}},
            finalize=lambda df: _canonical_mv_state(
                df.select(*mv["order"])
            ),
        )
        self._streams[key] = q
        return q

    def _stop_continuous_refresh(self, name: str) -> int:
        """``STOP REFRESH <name>``: stop this session's continuous
        refresh stream for the MV (the checkpoint persists, so a later
        CONTINUOUS resumes where it stopped, and the per-batch
        watermarks let a manual REFRESH take over immediately)."""
        q = self._streams.pop(name.lower(), None)
        if q is None:
            raise ValueError(
                f"no continuous refresh running for {name!r} in this "
                "session"
            )
        if q.isActive:
            q.stop()
        q.awaitTermination(30)
        return 0
