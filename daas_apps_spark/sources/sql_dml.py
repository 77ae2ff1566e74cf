"""SQL DML front-end for the versioned table (A37).

A THIN, loudly-refusing translator from the four DML/query shapes every
Delta/Iceberg operator types daily to the existing ``VersionedTable``
calls — the reference's "the Properties file IS the plan" idea
(MiscUtils.java:44-64) applied to DML text. The translator parses the
STATEMENT SHAPE only; predicates, SET expressions, and subqueries pass
through verbatim to Spark SQL, so expression semantics are Catalyst's,
never a re-implementation:

    DELETE FROM t WHERE <pred>
    UPDATE t SET c = <expr>, ... WHERE <pred>
    INSERT INTO|OVERWRITE t [(c1, c2, ...)]
        SELECT ... | VALUES (...), (...)
    TRUNCATE TABLE t
    CREATE TABLE [IF NOT EXISTS] t (col type, ...,
        [col GENERATED ALWAYS AS (expr),]
        [col BIGINT GENERATED ALWAYS AS IDENTITY [(START WITH n
            INCREMENT BY m)],]
        [CONSTRAINT name CHECK (expr),] ...)
        [USING versioned] [LOCATION '<path>'] [CLUSTER BY (c1, ...)]
        -- clause declarations lower to the post-create ALTER sequence,
        -- commit-for-commit
    CREATE TABLE [IF NOT EXISTS] t [CLUSTER BY (c1, ...)] AS SELECT ...
    DROP TABLE [IF EXISTS] t        -- catalog; managed data removed
    SHOW TABLES                     -- catalog listing
    CREATE VIEW [IF NOT EXISTS] v AS SELECT ...   -- stored SQL text,
        -- planned at CREATE, re-inlined at every reference
    CREATE MATERIALIZED VIEW [IF NOT EXISTS] mv AS
        SELECT <group cols>, COUNT(*) AS n[, SUM(expr) AS s ...]
        FROM t [WHERE pred] GROUP BY <group cols>
        -- materialized into a managed versioned state table
    REFRESH MATERIALIZED VIEW mv    -- advance from t's change feed:
        -- cost ∝ |delta| (maintain_additive_aggregate), never |t|
    DROP [MATERIALIZED] VIEW [IF EXISTS] v
    SHOW VIEWS
    COPY INTO t FROM '<file|dir|glob>' [FILEFORMAT = <fmt>]
        [FORMAT_OPTIONS ('k' = 'v', ...)] [FORCE = TRUE]
    MERGE INTO t [AS a] USING <src|(subquery)> [AS b] ON <equi-keys>
        WHEN MATCHED [AND <cond>] THEN UPDATE SET <a = e, ...|*> | DELETE
        WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN
            INSERT * | INSERT (cols) VALUES (exprs)
        WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
            UPDATE SET <a = e, ...> | DELETE
      (clauses fire first-match in order; the unconditional
       UPDATE SET * / INSERT * pair routes to the upsert fast path,
       everything else to VersionedTable.merge_into)
    SELECT ... FROM t [VERSION AS OF n | TIMESTAMP AS OF 'ts'] ...
    SELECT ... FROM TABLE_CHANGES(t, v_from[, v_to]) ...

plus the DDL/maintenance verbs a lakehouse operator runs (each a thin
call into the corresponding ``VersionedTable`` method — Delta's SQL
surface for the same operations):

    ALTER TABLE t ADD CONSTRAINT name CHECK (<expr>)
    ALTER TABLE t DROP CONSTRAINT name
    ALTER TABLE t RENAME COLUMN old TO new
    ALTER TABLE t DROP COLUMN c
    ALTER TABLE t ADD COLUMN c <type>
    ALTER TABLE t ALTER COLUMN c TYPE <wider-type>
    ALTER TABLE t ADD COLUMN c GENERATED ALWAYS AS (<expr>)
    ALTER TABLE t ADD COLUMN c GENERATED ALWAYS AS IDENTITY
        [(START WITH n INCREMENT BY m)]
    ALTER TABLE t ALTER COLUMN c DROP EXPRESSION
    ALTER TABLE t ENABLE ROW TRACKING
    ALTER TABLE t CLUSTER BY (c1, c2[, ...]) | CLUSTER BY NONE
    CREATE BLOOMFILTER INDEX ON t (c1[, c2]) [WITH FPP p]
    DROP BLOOMFILTER INDEX ON t
    OPTIMIZE t [ZORDER BY (x, y[, ...])]
    VACUUM t [RETAIN n VERSIONS] [DRY RUN]
    RESTORE TABLE t TO VERSION AS OF n
    DESCRIBE HISTORY t

``tables`` maps the SQL-level table names to ``VersionedTable``s (or
their paths). DML verbs return the committed version (parity with the
Python API is commit-for-commit — tests/test_table_format.py pins it);
SELECT returns the DataFrame. An optional leading ``/*+ MOR */`` hint
routes DELETE/UPDATE through the merge-on-read path.

Anything outside these shapes raises ``ValueError`` with the supported
grammar — a thin front-end that guesses would corrupt tables silently.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from daas_apps_spark.sources.table_format import VersionedTable

_HINT_RE = re.compile(r"^\s*/\*\+\s*(?P<hint>\w+)\s*\*/", re.S)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<target>[A-Za-z_][\w]*)\s+"
    r"WHERE\s+(?P<pred>.+?)\s*;?\s*$",
    re.I | re.S,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<target>[A-Za-z_][\w]*)\s+SET\s+(?P<sets>.+?)\s+"
    r"WHERE\s+(?P<pred>.+?)\s*;?\s*$",
    re.I | re.S,
)
_MERGE_HEAD_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[A-Za-z_][\w]*)"
    r"(?:\s+AS\s+(?P<talias>\w+))?\s+USING\s+",
    re.I | re.S,
)
_MERGE_TAIL_RE = re.compile(
    r"^(?:\s+AS\s+(?P<salias>\w+))?\s+"
    r"ON\s+(?P<cond>.+?)\s+(?P<whens>WHEN\s+.+?)\s*;?\s*$",
    re.I | re.S,
)
_UPSERT_WHENS_RE = re.compile(
    r"^WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*$"
    r"|^WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s+"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*$",
    re.I | re.S,
)
_WHEN_MATCHED_RE = re.compile(
    r"^WHEN\s+MATCHED(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?:UPDATE\s+SET\s+(?P<sets>.+)|(?P<del>DELETE))\s*$",
    re.I | re.S,
)
_WHEN_NMBS_RE = re.compile(
    r"^WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE"
    r"(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?:UPDATE\s+SET\s+(?P<sets>.+)|(?P<del>DELETE))\s*$",
    re.I | re.S,
)
_WHEN_NM_RE = re.compile(
    r"^WHEN\s+NOT\s+MATCHED(?:\s+BY\s+TARGET)?"
    r"(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+INSERT\s+(?P<body>.+?)\s*$",
    re.I | re.S,
)
_INSERT_BODY_RE = re.compile(
    r"^\(\s*(?P<cols>[^)]+?)\s*\)\s*VALUES\s*\((?P<vals>.+)\)\s*$",
    re.I | re.S,
)
_TRAVEL_RE_TMPL = (
    r"\b{name}\b"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<version>\d+)"
    r"|\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']*)')?"
)


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth zero — `SET a = f(x, y)`
    must not split inside the call, nor inside a string literal."""
    parts: list[str] = []
    depth = 0
    quote: str | None = None
    cur: list[str] = []
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            cur.append(ch)
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _split_whens(text: str) -> list[str]:
    """Split a MERGE's WHEN-clause text into one string per clause at
    top-level ``WHEN`` keywords — quote-, paren-, AND ``CASE WHEN``-aware
    (a CASE expression inside a clause condition nests its own WHENs,
    which must not start a new merge clause)."""
    starts: list[int] = []
    depth = 0
    case_depth = 0
    quote: str | None = None
    i, n = 0, len(text)

    def _word_at(j: int, w: str) -> bool:
        if text[j : j + len(w)].upper() != w:
            return False
        if j > 0 and (text[j - 1].isalnum() or text[j - 1] == "_"):
            return False
        k = j + len(w)
        return k >= n or not (text[k].isalnum() or text[k] == "_")

    while i < n:
        ch = text[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            i += 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and _word_at(i, "CASE"):
            case_depth += 1
            i += 4
            continue
        elif depth == 0 and case_depth and _word_at(i, "END"):
            case_depth -= 1
            i += 3
            continue
        elif depth == 0 and case_depth == 0 and _word_at(i, "WHEN"):
            starts.append(i)
            i += 4
            continue
        i += 1
    if not starts or starts[0] != 0:
        raise ValueError(f"MERGE WHEN clauses do not start with WHEN: "
                         f"{text[:60]!r}")
    bounds = starts + [n]
    return [text[a:b].strip() for a, b in zip(bounds, bounds[1:])]


def _parse_set_clause(sets_text: str):
    """``SET`` body → ``"*"`` or {column: sql expr} (split at top level,
    so ``SET a = f(x, y), b = 2`` parses correctly)."""
    s = sets_text.strip()
    if s == "*":
        return "*"
    out: dict[str, str] = {}
    for part in _split_top_level(s):
        am = re.match(r"\s*((?:\w+\.)?\w+)\s*=\s*(.+)$", part, re.S)
        if not am:
            raise ValueError(f"cannot parse MERGE SET assignment {part!r}")
        out[am.group(1)] = am.group(2).strip()
    return out


def _parse_merge_whens(whens: str) -> tuple[list, list, list]:
    """The full conditional MERGE grammar → merge_into clause lists:

        WHEN MATCHED [AND cond] THEN UPDATE SET <assignments|*> | DELETE
        WHEN NOT MATCHED [BY TARGET] [AND cond] THEN INSERT * |
            INSERT (cols) VALUES (exprs)
        WHEN NOT MATCHED BY SOURCE [AND cond] THEN
            UPDATE SET <assignments> | DELETE
    """
    matched: list[dict] = []
    not_matched: list[dict] = []
    nmbs: list[dict] = []
    for clause in _split_whens(whens):
        m = _WHEN_NMBS_RE.match(clause)
        if m:
            nmbs.append(
                {
                    "action": "delete" if m.group("del") else "update",
                    "condition": m.group("cond"),
                    **(
                        {"set": _parse_set_clause(m.group("sets"))}
                        if m.group("sets")
                        else {}
                    ),
                }
            )
            continue
        m = _WHEN_MATCHED_RE.match(clause)
        if m:
            matched.append(
                {
                    "action": "delete" if m.group("del") else "update",
                    "condition": m.group("cond"),
                    **(
                        {"set": _parse_set_clause(m.group("sets"))}
                        if m.group("sets")
                        else {}
                    ),
                }
            )
            continue
        m = _WHEN_NM_RE.match(clause)
        if m:
            body = m.group("body").strip()
            if body == "*":
                not_matched.append(
                    {"condition": m.group("cond"), "values": "*"}
                )
                continue
            bm = _INSERT_BODY_RE.match(body)
            if not bm:
                raise ValueError(
                    f"unsupported MERGE INSERT body {body!r}; supported: "
                    "INSERT * | INSERT (c1, c2, ...) VALUES (e1, e2, ...)"
                )
            not_matched.append(
                {
                    "condition": m.group("cond"),
                    "columns": [
                        c.strip() for c in bm.group("cols").split(",")
                    ],
                    "values": [
                        v.strip()
                        for v in _split_top_level(bm.group("vals"))
                    ],
                }
            )
            continue
        raise ValueError(
            f"unsupported MERGE WHEN clause {clause[:80]!r}; supported: "
            "WHEN MATCHED [AND cond] THEN UPDATE SET <a|*> | DELETE; "
            "WHEN NOT MATCHED [BY TARGET] [AND cond] THEN INSERT * | "
            "INSERT (cols) VALUES (exprs); WHEN NOT MATCHED BY SOURCE "
            "[AND cond] THEN UPDATE SET <a> | DELETE"
        )
    return matched, not_matched, nmbs


class ViewDef:
    """A catalog VIEW: stored SQL text, inlined at every resolution.
    Carried as a ``tables``-dict value so name lookup, shadowing, and
    collision rules are identical for tables and views; anything that
    needs a TABLE (DML targets, time travel, TABLE_CHANGES) refuses a
    ViewDef loudly instead of guessing."""

    def __init__(self, name: str, sql: str):
        self.name = name
        self.sql = sql


def _lookup(tables: dict, name: str):
    """The declared value for ``name`` (case-insensitive), or None."""
    for k, v in tables.items():
        if k.lower() == name.lower():
            return v
    return None


def _expand_view(spark: SparkSession, tables: dict, vd: ViewDef) -> str:
    """Inline a view: rewrite its stored SELECT against every OTHER
    declared name (the view itself is removed first, so a reference
    cycle fails with Spark's unresolved-relation error instead of
    recursing forever) and return the rewritten text."""
    rest = {k: v for k, v in tables.items() if k.lower() != vd.name.lower()}
    return _rewrite_tables(spark, vd.sql, rest)


def _resolve(spark: SparkSession, tables: dict, name: str) -> VersionedTable:
    for k, v in tables.items():
        if k.lower() == name.lower():
            if isinstance(v, ViewDef):
                raise ValueError(
                    f"{name!r} is a VIEW (stored SQL, no storage) — it "
                    "resolves in queries only, never as a DML/DDL "
                    "target; DROP VIEW it and CREATE TABLE if you need "
                    "a table"
                )
            return v if isinstance(v, VersionedTable) else VersionedTable(
                spark, v
            )
    raise ValueError(
        f"unknown table {name!r}; declared tables: {sorted(tables)}"
    )


def _merge_keys(
    cond: str, talias: str, salias: str
) -> tuple[list[str], str | None]:
    """(key columns, residual condition) from a MERGE ON clause. Key
    legs are ``t.k = s.k`` equalities (either side order, aliases
    optional when the raw column names match) — at least one is
    required: the keys drive the file-level COW bounding and the upsert
    routing. Every other top-level AND leg becomes the RESIDUAL: it
    joins the key-equal pairs (a key-matched pair failing it counts as
    NOT matched on both sides, standard MERGE ON semantics), passed to
    Catalyst verbatim."""
    keys: list[str] = []
    residual: list[str] = []
    # split on top-level AND (quote/paren-aware; the word, not a char,
    # so _split_top_level does not apply)
    i = 0
    legs: list[str] = []
    depth = 0
    quote: str | None = None
    start = 0
    text = cond.strip()
    while i < len(text):
        ch = text[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif (
            depth == 0
            and text[i : i + 3].upper() == "AND"
            and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_"))
            and (
                i + 3 >= len(text)
                or not (text[i + 3].isalnum() or text[i + 3] == "_")
            )
        ):
            legs.append(text[start:i].strip())
            i += 3
            start = i
            continue
        i += 1
    legs.append(text[start:].strip())
    for leg in legs:
        m = re.fullmatch(
            r"\s*(?:(?P<la>\w+)\.)?(?P<lc>\w+)\s*=\s*"
            r"(?:(?P<ra>\w+)\.)?(?P<rc>\w+)\s*",
            leg,
        )
        if not m or m.group("lc").lower() != m.group("rc").lower():
            residual.append(f"({leg})")
            continue
        ok = True
        for a in (m.group("la"), m.group("ra")):
            if a and a.lower() not in (talias.lower(), salias.lower()):
                raise ValueError(
                    f"MERGE ON references unknown alias {a!r} "
                    f"(declared: {talias!r}, {salias!r})"
                )
        if ok:
            keys.append(m.group("lc"))
    if not keys:
        raise ValueError(
            f"MERGE ON clause {cond!r} has no key equality leg "
            "(t.k = s.k) — the keys drive file-level COW bounding; "
            "add at least one"
        )
    return keys, (" AND ".join(residual) if residual else None)


def run_sql(
    spark: SparkSession,
    text: str,
    tables: dict | None = None,
    catalog=None,
    txn: dict | None = None,
) -> DataFrame | int:
    """Execute one DML/query statement against versioned tables. See
    the module docstring for the supported grammar. Returns the
    committed version (DELETE/UPDATE/MERGE) or the result DataFrame
    (SELECT).

    ``tables`` maps ad-hoc SQL names to VersionedTables/paths;
    ``catalog`` (a ``sql_catalog.TableCatalog``) resolves every other
    name persistently and enables the catalog verbs — CREATE TABLE
    (schema or AS SELECT), DROP TABLE, SHOW TABLES. Ad-hoc names shadow
    catalog names."""
    tables = dict(tables or {})
    if catalog is not None:
        # catalog names resolve exactly like declared paths; ad-hoc
        # names win on collision (session-scoped shadowing). Entries are
        # snapshotted via entry() with a tolerant read: a concurrent
        # DROP between names() and entry() just drops out of the
        # snapshot — it must not fail a statement that never referenced
        # the dropped name. VIEW entries resolve to their stored SQL
        # (inlined at reference); materialized views to their state
        # table's path.
        snap: dict = {}
        for n in catalog.names():
            try:
                e = catalog.entry(n)
            except (FileNotFoundError, KeyError):
                continue
            kind = e.get("kind", "table")
            if kind == "view":
                snap[n] = ViewDef(n, e["sql"])
            elif kind == "materialized_view":
                # EVERY MV reads through a view over its state table —
                # DML against the MV name then refuses uniformly (a
                # direct write would silently corrupt the maintained
                # state), AVG items derive from their hidden maintained
                # (sum, non-null count) pair, and the state table stays
                # reachable as __mvstate_<name> (DESCRIBE, time travel,
                # OPTIMIZE)
                mv = e["mv"]
                state = f"__mvstate_{n}"
                snap[state] = e["path"]
                derived = mv.get("derived") or {}
                by_sum = {
                    pair[0]: (alias, pair[1])
                    for alias, pair in derived.items()
                }
                cnt_cols = {pair[1] for pair in derived.values()}
                items = []
                for c in mv["order"]:
                    if c in by_sum:
                        alias, cnt = by_sum[c]
                        # SQL AVG semantics: NULL contributions leave
                        # the denominator; an all-NULL group reads NULL
                        items.append(
                            f"CAST({c} AS double) / "
                            f"NULLIF(CAST({cnt} AS double), 0) AS {alias}"
                        )
                    elif c in cnt_cols:
                        continue  # hidden denominator, never surfaced
                    else:
                        items.append(c)
                snap[n] = ViewDef(
                    n, f"SELECT {', '.join(items)} FROM {state}"
                )
            else:
                snap[n] = e["path"]
        tables = {**snap, **tables}
    mode = "cow"
    mh = _HINT_RE.match(text)
    if mh:
        hint = mh.group("hint").lower()
        if hint not in ("mor", "cow"):
            raise ValueError(f"unknown hint {hint!r} (MOR|COW)")
        mode = hint
        text = text[mh.end():]
    stripped = text.lstrip()
    verb = stripped.split(None, 1)[0].upper() if stripped.strip() else ""
    if txn is not None and verb not in (
        "SELECT",
        "WITH",
        "INSERT",
        "DELETE",
        "UPDATE",
        "MERGE",
        "TRUNCATE",
    ):
        raise ValueError(
            f"{verb or text!r} is not supported inside BEGIN…COMMIT — a "
            "transaction block stages DML writes only (INSERT INTO|"
            "OVERWRITE, DELETE, UPDATE, MERGE, TRUNCATE TABLE — one "
            "write statement per table per transaction except repeated "
            "blind INSERTs; SELECT reads the pre-transaction snapshot, "
            "staged writes become visible atomically at COMMIT); "
            "COMMIT or ROLLBACK first"
        )
    if verb == "DELETE":
        m = _DELETE_RE.match(text)
        if not m:
            raise ValueError(
                "unsupported DELETE shape; supported: "
                "DELETE FROM <table> WHERE <predicate>"
            )
        vt = _resolve(spark, tables, m.group("target"))
        return vt.delete(m.group("pred"), mode=mode, txn=txn)
    if verb == "UPDATE":
        m = _UPDATE_RE.match(text)
        if not m:
            raise ValueError(
                "unsupported UPDATE shape; supported: "
                "UPDATE <table> SET c = expr[, ...] WHERE <predicate>"
            )
        vt = _resolve(spark, tables, m.group("target"))
        assignments: dict[str, str] = {}
        for part in _split_top_level(m.group("sets")):
            am = re.match(r"\s*(\w+)\s*=\s*(.+)$", part, re.S)
            if not am:
                raise ValueError(f"cannot parse SET assignment {part!r}")
            assignments[am.group(1)] = am.group(2).strip()
        return vt.update(m.group("pred"), assignments, mode=mode, txn=txn)
    if verb == "MERGE":
        bad = ValueError(
            "unsupported MERGE shape; supported: MERGE INTO <table> "
            "[AS a] USING <source|(subquery)> [AS b] ON <k equalities> "
            "followed by WHEN MATCHED [AND c] THEN UPDATE SET <a|*> | "
            "DELETE; WHEN NOT MATCHED [AND c] THEN INSERT * | "
            "INSERT (cols) VALUES (exprs); WHEN NOT MATCHED BY SOURCE "
            "[AND c] THEN UPDATE SET <a> | DELETE"
        )
        head = _MERGE_HEAD_RE.match(text)
        if not head:
            raise bad
        rest = text[head.end():]
        if rest.startswith("("):
            # balanced-paren scan: the subquery may nest parens and
            # quotes, so a regex cannot bound it
            depth = 0
            quote: str | None = None
            end = -1
            for i, ch in enumerate(rest):
                if quote:
                    if ch == quote:
                        quote = None
                    continue
                if ch in ("'", '"'):
                    quote = ch
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            if end < 0:
                raise bad
            src = rest[: end + 1]
            rest = rest[end + 1:]
        else:
            sm = re.match(r"[A-Za-z_]\w*", rest)
            if not sm:
                raise bad
            src = sm.group(0)
            rest = rest[sm.end():]
        tail = _MERGE_TAIL_RE.match(rest)
        if not tail:
            raise bad
        whens_raw = tail.group("whens").strip()
        vt = _resolve(spark, tables, head.group("target"))
        if src.startswith("("):
            # declared tables (incl. VERSION AS OF) resolve inside the
            # USING subquery too — "backfill from my own v1" is MERGE
            # USING (SELECT ... FROM t VERSION AS OF 1)
            source_df = spark.sql(
                _rewrite_tables(spark, src[1:-1], tables)
            )
            salias = tail.group("salias")
        else:
            val = _lookup(tables, src)
            if isinstance(val, ViewDef):
                source_df = spark.sql(_expand_view(spark, tables, val))
            elif val is not None:
                # merged schema, like every SQL read (_rewrite_tables):
                # a schema-evolved source column must reach the clauses
                source_df = _resolve(spark, tables, src).read(
                    merge_schema=True
                )
            else:
                source_df = spark.table(src)  # temp view / catalog table
            salias = tail.group("salias") or src
        talias = head.group("talias") or head.group("target")
        keys, residual = _merge_keys(
            tail.group("cond"), talias, salias or src
        )
        plain_upsert = bool(
            _UPSERT_WHENS_RE.match(re.sub(r"\s+", " ", whens_raw))
        )
        if plain_upsert and residual is None:
            # the full unconditional upsert pair: the anti-join/union
            # fast path (no outer join, no clause CASEs)
            return vt.merge(source_df, keys, txn=txn)
        if plain_upsert:
            # same pair under a residual ON: only merge_into implements
            # partial-match semantics — expand to the clause form
            matched: list = [{"action": "update", "set": "*"}]
            not_matched: list = [{"values": "*"}]
            nmbs: list = []
        else:
            matched, not_matched, nmbs = _parse_merge_whens(whens_raw)
        if salias is None:
            raise ValueError(
                "alias the USING (subquery) (e.g. USING (...) AS s) "
                "when the MERGE has conditional clauses — clause "
                "expressions need a name for the source side"
            )
        return vt.merge_into(
            source_df,
            keys,
            matched=matched,
            not_matched=not_matched,
            not_matched_by_source=nmbs,
            target_alias=talias,
            source_alias=salias,
            on_condition=residual,
            txn=txn,
        )
    if verb in ("SELECT", "WITH"):
        # manifest fast path: a bare COUNT(*) over one declared table
        # answers from the commit log + checkpoint sidecar with ZERO
        # data-file opens (A35) — at 100 TB the census costs one
        # manifest read, not a scan; DV-exact, time-travel-aware
        fast = re.match(
            r"^\s*SELECT\s+COUNT\(\s*\*\s*\)\s*(?:AS\s+(?P<alias>\w+))?"
            r"\s+FROM\s+(?P<t>[A-Za-z_]\w*)"
            r"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?\s*;?\s*$",
            text,
            re.I,
        )
        if fast and not isinstance(
            _lookup(tables, fast.group("t")), (ViewDef, type(None))
        ):
            vt = _resolve(spark, tables, fast.group("t"))
            n = vt.manifest_count(
                version=int(fast.group("v")) if fast.group("v") else None
            )
            name = fast.group("alias") or "count(1)"  # Spark's default
            return spark.createDataFrame([(n,)], f"`{name}` long")
        rw = _try_mv_rewrite(spark, text, tables, catalog)
        if rw is not None:
            return spark.sql(_rewrite_tables(spark, rw[0], tables))
        return spark.sql(_rewrite_tables(spark, text, tables))
    if verb == "INSERT":
        m = re.match(
            r"^\s*INSERT\s+(?P<over>OVERWRITE|INTO)\s+"
            r"(?P<t>[A-Za-z_]\w*)\s+(?P<src>.+?)\s*;?\s*$",
            text,
            re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported INSERT shape; supported: INSERT INTO|"
                "OVERWRITE <table> SELECT ... | VALUES (...), (...)"
            )
        vt = _resolve(spark, tables, m.group("t"))
        src = m.group("src").strip()
        # optional COLUMN LIST: INSERT INTO t (c1, c2) <source>. The
        # first balanced paren group is a column list iff its content is
        # not itself a query and a source follows — "INSERT INTO t
        # (SELECT ...)" stays a parenthesized source
        collist: list[str] | None = None
        if src.startswith("("):
            depth = 0
            quote2: str | None = None
            gend = -1
            for j, ch in enumerate(src):
                if quote2:
                    if ch == quote2:
                        quote2 = None
                    continue
                if ch in ("'", '"'):
                    quote2 = ch
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        gend = j
                        break
            if gend >= 0:
                grp = src[1:gend].strip()
                rest_src = src[gend + 1 :].strip()
                if rest_src and not re.match(
                    r"^(SELECT|WITH|VALUES)\b", grp, re.I
                ):
                    collist = [c.strip() for c in grp.split(",")]
                    if not all(
                        re.fullmatch(r"[A-Za-z_]\w*", c) for c in collist
                    ):
                        raise ValueError(
                            f"INSERT column list does not parse: ({grp})"
                        )
                    src = rest_src
        if src.startswith("(") and src.endswith(")"):
            # strip ONLY a single enclosing group: "(SELECT..) UNION
            # (SELECT..)" starts and ends with parens but stripping its
            # outer characters would mangle balanced SQL
            depth = 0
            quote: str | None = None
            enclosing = True
            for j, ch in enumerate(src):
                if quote:
                    if ch == quote:
                        quote = None
                    continue
                if ch in ("'", '"'):
                    quote = ch
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0 and j < len(src) - 1:
                        enclosing = False
                        break
            if enclosing:
                src = src[1:-1].strip()
        if not re.match(r"^(\(|SELECT\b|WITH\b|VALUES\b)", src, re.I):
            raise ValueError(
                "unsupported INSERT source; supported: a SELECT/WITH "
                "query (declared tables and VERSION AS OF allowed) or "
                "a VALUES list"
            )
        if re.match(r"^VALUES\b", src, re.I):
            df = spark.sql(f"SELECT * FROM ({src})")
        else:
            df = spark.sql(_rewrite_tables(spark, src, tables))
        # positional column mapping + store-assignment CAST onto the
        # table schema (SQL INSERT semantics — a VALUES literal arrives
        # as decimal/int and must land as the column's declared type,
        # or a later mixed-schema read would misscale it); an empty
        # table adopts the source's own names and types
        try:
            # merged schema: a just-declared generated column (or an
            # evolved column) may exist in only SOME live files, and the
            # positional target list must still include it
            fields = vt.read(merge_schema=True).schema.fields
        except ValueError:
            fields = None
        if fields is None and collist is not None:
            raise ValueError(
                "INSERT with a column list needs an existing table "
                "schema to map onto (the table is empty with no "
                "declared schema)"
            )
        if fields is not None:
            # identity columns are GENERATED ALWAYS — the engine assigns
            # them, so they are never INSERT targets (the append funnel
            # refuses frames that provide one). Generated columns may be
            # OMITTED (the funnel computes them) or provided (the funnel
            # validates them). With a COLUMN LIST the source maps onto
            # the named columns and every unnamed plain column lands
            # NULL; positionally, the arity decides the target list.
            ids = set(vt.identity_columns())
            gen = set(vt.generated_columns())
            if collist is not None:
                byname = {f.name.lower(): f for f in fields}
                seen: set[str] = set()
                target = []
                for c in collist:
                    lc = c.lower()
                    if lc in seen:
                        raise ValueError(
                            f"INSERT column list names {c!r} twice"
                        )
                    seen.add(lc)
                    if lc in ids:
                        raise ValueError(
                            f"column {c!r} is GENERATED ALWAYS AS "
                            "IDENTITY — the engine assigns it; remove "
                            "it from the column list"
                        )
                    if lc in byname:
                        target.append(byname[lc])
                    elif lc in gen:
                        # declared generated column not yet present in
                        # any live file: no stored type to assign to —
                        # pass the value through, the write funnel
                        # validates it against the expression
                        target.append(lc)
                    else:
                        raise ValueError(
                            f"INSERT column list names unknown column "
                            f"{c!r}; table has "
                            f"{[f.name for f in fields]}"
                        )
                if len(df.columns) != len(target):
                    raise ValueError(
                        f"INSERT provides {len(df.columns)} column(s) "
                        f"for a {len(target)}-column list ({collist})"
                    )
            else:
                plain = [
                    f for f in fields if f.name.lower() not in ids | gen
                ]
                withgen = [f for f in fields if f.name.lower() not in ids]
                if len(df.columns) == len(plain):
                    target = plain
                elif len(df.columns) == len(withgen):
                    target = withgen
                else:
                    raise ValueError(
                        f"INSERT provides {len(df.columns)} column(s); "
                        f"the positional target list is "
                        f"{[f.name for f in plain]}"
                        + (
                            f" (optionally + generated {sorted(gen)})"
                            if gen
                            else ""
                        )
                        + (
                            f"; identity column(s) {sorted(ids)} are "
                            "engine-assigned and cannot be inserted"
                            if ids
                            else ""
                        )
                    )
            # rename FIRST via toDF (pure positional, no name resolution
            # — a literal-derived source column can be NAMED "70.0",
            # which any column lookup would parse as a nested reference),
            # THEN apply store-assignment casts on clean names:
            # try_cast + raise on non-NULL→NULL, so an un-castable or
            # overflowing VALUES literal FAILS the statement instead of
            # landing NULL/wrapped under Spark's default non-ANSI cast
            # (ANSI store-assignment semantics, statement-scoped)
            from pyspark.sql import functions as F

            def _store_assign(f):
                src = F.col(f"`{f.name}`")
                casted = src.try_cast(f.dataType)
                return (
                    F.when(
                        src.isNotNull() & casted.isNull(),
                        F.raise_error(
                            F.format_string(
                                f"INSERT: value %s cannot be stored in "
                                f"column {f.name} "
                                f"({f.dataType.simpleString()}) — "
                                "store-assignment refuses lossy casts",
                                src.cast("string"),
                            )
                        ).cast(f.dataType),
                    )
                    .otherwise(casted)
                    .alias(f.name)
                )

            tnames = [
                f if isinstance(f, str) else f.name for f in target
            ]
            df = df.toDF(*tnames).select(
                *[
                    F.col(f"`{f}`").alias(f)
                    if isinstance(f, str)
                    else _store_assign(f)
                    for f in target
                ]
            )
            if collist is not None:
                # unnamed plain columns land NULL (identity is engine-
                # assigned, omitted generated columns are computed by
                # the write funnel); output in schema order, then any
                # named-but-unmaterialized generated columns
                named = {n.lower() for n in tnames}
                for f in fields:
                    lc = f.name.lower()
                    if lc not in ids | gen | named:
                        df = df.withColumn(
                            f.name, F.lit(None).cast(f.dataType)
                        )
                order = [
                    f.name
                    for f in fields
                    if f.name.lower() not in ids
                    and (f.name.lower() not in gen or f.name.lower() in named)
                ] + [f for f in target if isinstance(f, str)]
                df = df.select(*[f"`{c}`" for c in order])
                # a named-but-unmaterialized generated column has no
                # stored type yet: align the provided value to the type
                # its generation EXPRESSION resolves to, or this file
                # and the funnel-computed files of later inserts would
                # carry unmergeable schemas (INT vs BIGINT)
                rules = vt.generated_columns()
                for g in [f for f in target if isinstance(f, str)]:
                    gty = df.select(
                        F.expr(rules[g]).alias("_t")
                    ).schema[0].dataType
                    df = df.withColumn(g, F.col(f"`{g}`").cast(gty))
        if m.group("over").upper() == "OVERWRITE":
            return vt.overwrite(df, txn=txn)
        return vt.append(df, txn=txn)
    if verb == "TRUNCATE":
        m = re.match(
            r"^\s*TRUNCATE\s+TABLE\s+(?P<t>[A-Za-z_]\w*)\s*;?\s*$",
            text,
            re.I,
        )
        if not m:
            raise ValueError(
                "unsupported TRUNCATE shape; supported: "
                "TRUNCATE TABLE <table>"
            )
        return _resolve(spark, tables, m.group("t")).truncate(txn=txn)
    if verb == "COPY":
        m = re.match(
            r"^\s*COPY\s+INTO\s+(?P<t>[A-Za-z_]\w*)\s+FROM\s+"
            r"'(?P<src>[^']+)'"
            r"(?:\s+FILEFORMAT\s*=\s*(?P<fmt>\w+))?"
            r"(?:\s+FORMAT_OPTIONS\s*\((?P<opts>[^)]*)\))?"
            r"(?:\s+FORCE\s*=\s*(?P<force>TRUE|FALSE))?\s*;?\s*$",
            text,
            re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported COPY shape; supported: COPY INTO <table> "
                "FROM '<file|dir|glob>' [FILEFORMAT = PARQUET|CSV|JSON|"
                "ORC] [FORMAT_OPTIONS ('k' = 'v', ...)] [FORCE = TRUE]"
            )
        opts: dict = {}
        for pair in _split_top_level(m.group("opts") or ""):
            pm = re.fullmatch(
                r"\s*'([^']+)'\s*=\s*'([^']*)'\s*", pair
            )
            if not pm:
                raise ValueError(
                    f"cannot parse FORMAT_OPTIONS pair {pair!r} "
                    "(expected 'key' = 'value')"
                )
            opts[pm.group(1)] = pm.group(2)
        vt = _resolve(spark, tables, m.group("t"))
        res = vt.copy_into(
            m.group("src"),
            format=(m.group("fmt") or "parquet").lower(),
            options=opts or None,
            force=bool(m.group("force"))
            and m.group("force").upper() == "TRUE",
        )
        return spark.createDataFrame(
            [
                (
                    res["num_loaded_files"],
                    res["num_skipped_files"],
                    res["version"],
                )
            ],
            "num_loaded_files long, num_skipped_files long, version long",
        )
    if verb == "ALTER":
        return _run_alter(spark, text, tables)
    if verb == "EXPLAIN":
        return _run_explain(spark, text, tables, catalog)
    if verb == "SHOW" and re.match(
        r"^\s*SHOW\s+CREATE\s+TABLE\b", text, re.I
    ):
        return _run_show_create(spark, text, tables, catalog)
    if verb == "CREATE" and re.match(
        r"^\s*CREATE\s+TABLE\b", text, re.I
    ):
        return _run_create(spark, text, tables, catalog)
    if verb == "CREATE" and re.match(
        r"^\s*CREATE\s+(MATERIALIZED\s+)?VIEW\b", text, re.I
    ):
        return _run_create_view(spark, text, tables, catalog)
    if verb == "DROP" and re.match(
        r"^\s*DROP\s+(MATERIALIZED\s+)?VIEW\b", text, re.I
    ):
        return _run_drop_view(spark, text, catalog)
    if verb == "REFRESH":
        return _run_refresh_mv(spark, text, tables, catalog)
    if verb == "SHOW" and re.match(r"^\s*SHOW\s+VIEWS\s*;?\s*$", text, re.I):
        if catalog is None:
            raise ValueError("SHOW VIEWS needs a catalog")
        vrows = []
        for n in catalog.names():
            try:
                e = catalog.entry(n)
            except (FileNotFoundError, KeyError):
                continue
            kind = e.get("kind", "table")
            if kind == "view":
                vrows.append((e["name"], "view", e["sql"]))
            elif kind == "materialized_view":
                vrows.append((e["name"], "materialized_view", e["mv"]["sql"]))
        return spark.createDataFrame(
            vrows, "name string, kind string, definition string"
        )
    if verb == "DROP" and re.match(r"^\s*DROP\s+TABLE\b", text, re.I):
        m = re.match(
            r"^\s*DROP\s+TABLE\s+(?:(?P<ie>IF\s+EXISTS)\s+)?"
            r"(?P<t>[A-Za-z_]\w*)\s*;?\s*$",
            text,
            re.I,
        )
        if not m:
            raise ValueError(
                "unsupported DROP TABLE shape; supported: "
                "DROP TABLE [IF EXISTS] <name>"
            )
        if catalog is None:
            raise ValueError(
                "DROP TABLE needs a catalog (pass catalog= / use "
                "SqlSession) — ad-hoc tables dict entries are "
                "session-scoped, there is nothing durable to drop"
            )
        kind = catalog.kind(m.group("t"))
        if kind != "table":
            raise ValueError(
                f"{m.group('t')!r} is a {kind.replace('_', ' ')} — "
                f"use DROP {'MATERIALIZED VIEW' if kind == 'materialized_view' else 'VIEW'}"
            )
        return int(
            catalog.drop(m.group("t"), if_exists=bool(m.group("ie")))
        )
    if verb == "SHOW" and re.match(r"^\s*SHOW\s+TABLES\s*;?\s*$", text, re.I):
        if catalog is None:
            raise ValueError("SHOW TABLES needs a catalog")
        rows = []
        for n in catalog.names():
            try:
                e = catalog.entry(n)
            except (FileNotFoundError, KeyError):
                continue
            if e.get("kind", "table") == "table":
                rows.append((e["name"], e["path"], e["managed"]))
        return spark.createDataFrame(
            rows, "name string, path string, managed boolean"
        )
    if verb in ("CREATE", "DROP") and re.match(
        r"^\s*(CREATE|DROP)\s+BLOOMFILTER\s+INDEX\b", text, re.I
    ):
        m = re.match(
            r"^\s*CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+(?P<t>[A-Za-z_]\w*)"
            r"\s*\((?P<cols>[^)]+)\)"
            r"(?:\s+WITH\s+FPP\s+(?P<fpp>0?\.\d+))?\s*;?\s*$",
            text,
            re.I,
        )
        if m:
            return _resolve(spark, tables, m.group("t")).set_bloom_columns(
                [c.strip() for c in m.group("cols").split(",")],
                fpp=float(m.group("fpp") or 0.01),
            )
        m = re.match(
            r"^\s*DROP\s+BLOOMFILTER\s+INDEX\s+ON\s+(?P<t>[A-Za-z_]\w*)"
            r"\s*;?\s*$",
            text,
            re.I,
        )
        if m:
            return _resolve(spark, tables, m.group("t")).set_bloom_columns(
                None
            )
        raise ValueError(
            "unsupported BLOOMFILTER INDEX shape; supported: CREATE "
            "BLOOMFILTER INDEX ON <table> (c1[, c2]) [WITH FPP p] | "
            "DROP BLOOMFILTER INDEX ON <table>"
        )
    if verb == "OPTIMIZE":
        m = re.match(
            r"^\s*OPTIMIZE\s+(?P<t>[A-Za-z_]\w*)"
            r"(?:\s+ZORDER\s+BY\s*\((?P<cols>[^)]+)\))?\s*;?\s*$",
            text,
            re.I,
        )
        if not m:
            raise ValueError(
                "unsupported OPTIMIZE shape; supported: "
                "OPTIMIZE <table> [ZORDER BY (c1, c2[, ...])]"
            )
        vt = _resolve(spark, tables, m.group("t"))
        if m.group("cols"):
            cols = [c.strip() for c in m.group("cols").split(",")]
            return vt.optimize(zorder_by=tuple(cols))
        return vt.optimize()
    if verb == "VACUUM":
        m = re.match(
            r"^\s*VACUUM\s+(?P<t>[A-Za-z_]\w*)"
            r"(?:\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS)?"
            r"(?:\s+(?P<dry>DRY\s+RUN))?\s*;?\s*$",
            text,
            re.I,
        )
        if not m:
            raise ValueError(
                "unsupported VACUUM shape; supported: "
                "VACUUM <table> [RETAIN n VERSIONS] [DRY RUN]"
            )
        vt = _resolve(spark, tables, m.group("t"))
        removed = vt.vacuum(
            keep_versions=int(m.group("n") or 0),
            dry_run=bool(m.group("dry")),
        )
        return spark.createDataFrame(
            [(d,) for d in removed], "path string"
        )
    if verb == "RESTORE":
        m = re.match(
            r"^\s*RESTORE\s+TABLE\s+(?P<t>[A-Za-z_]\w*)\s+TO\s+"
            r"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
            r"|REF\s+'(?P<ref>[^']+)')\s*;?\s*$",
            text,
            re.I,
        )
        if not m:
            raise ValueError(
                "unsupported RESTORE shape; supported: RESTORE TABLE "
                "<table> TO VERSION AS OF n | TO REF '<name>'"
            )
        vt = _resolve(spark, tables, m.group("t"))
        if m.group("v") is not None:
            return vt.restore(version=int(m.group("v")))
        return vt.restore(ref=m.group("ref"))
    if verb == "DESCRIBE":
        m = re.match(
            r"^\s*DESCRIBE\s+(?P<kind>HISTORY|DETAIL)\s+"
            r"(?P<t>[A-Za-z_]\w*)\s*;?\s*$",
            text,
            re.I,
        )
        if not m:
            raise ValueError(
                "unsupported DESCRIBE shape; supported: "
                "DESCRIBE HISTORY <table> | DESCRIBE DETAIL <table>"
            )
        vt = _resolve(spark, tables, m.group("t"))
        if m.group("kind").upper() == "HISTORY":
            return vt.snapshots()
        detail = vt.detail()
        return spark.createDataFrame(
            [(json.dumps(detail, sort_keys=True, default=str),)],
            "detail string",
        )
    raise ValueError(
        f"unsupported statement {verb or text!r}; supported verbs: "
        "DELETE / UPDATE / MERGE / INSERT / SELECT (incl. VERSION AS "
        "OF / TIMESTAMP AS OF) / CREATE TABLE (schema | AS SELECT) / "
        "DROP TABLE / SHOW TABLES / CREATE [MATERIALIZED] VIEW / "
        "REFRESH MATERIALIZED VIEW / DROP [MATERIALIZED] VIEW / SHOW "
        "VIEWS / COPY INTO / TRUNCATE TABLE / ALTER "
        "TABLE / OPTIMIZE / VACUUM / RESTORE TABLE / DESCRIBE HISTORY "
        "/ CREATE|DROP BLOOMFILTER INDEX / EXPLAIN <query> / SHOW "
        "CREATE TABLE / BEGIN|COMMIT|ROLLBACK (script/session)"
    )


_BEGIN_RE = re.compile(r"^\s*BEGIN(\s+TRANSACTION)?\s*;?\s*$", re.I)
_COMMIT_RE = re.compile(r"^\s*COMMIT\s*;?\s*$", re.I)
_ROLLBACK_RE = re.compile(r"^\s*ROLLBACK\s*;?\s*$", re.I)


def txn_coordinator(catalog):
    """The catalog's 2PC coordinator (A38 MultiTableTxn) — one per
    catalog, living in the catalog directory, so every session on the
    same catalog shares one atomic-visibility point."""
    from daas_apps_spark.sources.table_format import MultiTableTxn

    if catalog is None:
        raise ValueError(
            "BEGIN/COMMIT/ROLLBACK need a catalog (pass catalog= / use "
            "SqlSession) — the transaction coordinator lives in the "
            "catalog directory"
        )
    return MultiTableTxn(os.path.join(catalog.path, "_txns"))


def run_sql_script(
    spark: SparkSession,
    script: str,
    tables: dict | None = None,
    catalog=None,
) -> list:
    """Execute a multi-statement script (statements separated by
    top-level ``;`` — quote- and paren-aware, so literals and subqueries
    survive). Statements run in order, each through ``run_sql``; returns
    the per-statement results.

    ``BEGIN [TRANSACTION]; …; COMMIT`` brackets lower to the A38
    MultiTableTxn coordinator: every DML write inside the block (INSERT
    INTO|OVERWRITE, DELETE, UPDATE, MERGE, TRUNCATE — one write
    statement per table per transaction, except repeated blind
    INSERTs) stages its commit under one txn marker (occupying a version slot, contributing
    no visible state), and COMMIT is the single atomic swap after which
    every staged write across every touched table resolves visible at
    once — ``ROLLBACK`` leaves them invisible forever (presumed abort).
    Statements outside a block commit on their own exactly as
    standalone. A script that ends inside an open block ABORTS it and
    raises — half-applied scripts must never linger pending."""
    results = []
    txn = None
    coord = None
    for stmt in _split_top_level(script, sep=";"):
        if not stmt.strip():
            continue
        if _BEGIN_RE.match(stmt):
            if txn is not None:
                raise ValueError(
                    "nested BEGIN — COMMIT or ROLLBACK the open "
                    "transaction first"
                )
            coord = txn_coordinator(catalog)
            txn = coord.begin()
            results.append(txn["id"])
            continue
        if _COMMIT_RE.match(stmt):
            if txn is None:
                raise ValueError("COMMIT without an open transaction")
            coord.commit(txn)
            txn = None
            results.append(1)
            continue
        if _ROLLBACK_RE.match(stmt):
            if txn is None:
                raise ValueError("ROLLBACK without an open transaction")
            coord.abort(txn)
            txn = None
            results.append(0)
            continue
        try:
            results.append(
                run_sql(spark, stmt, tables, catalog=catalog, txn=txn)
            )
        except BaseException:
            if txn is not None:
                # a failing statement inside an open block must not
                # leave the txn pending — pending wedges every staged
                # table against all future writes until a manual sweep
                coord.abort(txn)
            raise
    if txn is not None:
        coord.abort(txn)
        raise ValueError(
            "script ended inside an open transaction — it was ABORTED "
            "(presumed abort: staged writes stay invisible); add "
            "COMMIT or ROLLBACK"
        )
    return results


def _rewrite_tables(spark: SparkSession, text: str, tables: dict) -> str:
    """Rewrite every declared table reference (with optional VERSION /
    TIMESTAMP AS OF) and every ``TABLE_CHANGES(t, v_from[, v_to])``
    call to temp views over the corresponding snapshot / change-feed
    reads; Spark SQL then runs the text verbatim.

    This is a QUOTE-AWARE single-pass scan, not a blind regex sub: a
    table name inside a string literal is data and must survive
    untouched (a blind sub would silently change results), a name
    qualified by an alias (``x.t``) is a column reference, and every
    occurrence of the same (table, travel-spec) resolves to ONE view —
    so ``SELECT t.x FROM t`` keeps a consistent qualifier and two
    references read one snapshot, not two separately-timed ones."""
    if not tables:
        return text
    byname = {k.lower() for k in tables}
    byval = {k.lower(): v for k, v in tables.items()}
    token_re = re.compile(
        r"TABLE_CHANGES\s*\(\s*(?P<ct>[A-Za-z_]\w*)\s*,\s*(?P<v1>\d+)"
        r"(?:\s*,\s*(?P<v2>\d+))?\s*\)"
        r"|(?P<t>[A-Za-z_]\w*)"
        r"(?:\s+VERSION\s+AS\s+OF\s+(?P<version>\d+)"
        r"|\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']*)')?",
        re.I,
    )
    views: dict = {}

    def _view(key, build) -> str:
        if key not in views:
            view = f"__dml_{key[0]}_{uuid.uuid4().hex[:8]}"
            build().createOrReplaceTempView(view)
            views[key] = view
        return views[key]

    out: list[str] = []
    i, n = 0, len(text)
    quote: str | None = None
    while i < n:
        ch = text[i]
        if quote:
            out.append(ch)
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            out.append(ch)
            i += 1
            continue
        boundary = i == 0 or not (
            text[i - 1].isalnum() or text[i - 1] in "_."
        )
        if boundary and (ch.isalpha() or ch == "_"):
            m = token_re.match(text, i)
            if m and m.group("ct") and m.group("ct").lower() in byname:
                tname, v1, v2 = m.group("ct"), m.group("v1"), m.group("v2")
                if isinstance(byval[tname.lower()], ViewDef):
                    raise ValueError(
                        f"TABLE_CHANGES({tname}): {tname!r} is a VIEW — "
                        "it has no commit log; query the underlying "
                        "table's change feed"
                    )
                out.append(
                    _view(
                        ("changes_" + tname.lower(), v1, v2),
                        lambda: _resolve(spark, tables, tname)
                        .changes_between(int(v1), int(v2) if v2 else None),
                    )
                )
                i = m.end()
                continue
            if m and m.group("t") and m.group("t").lower() in byname:
                tname = m.group("t")
                ver, ts = m.group("version"), m.group("ts")
                end = m.end()
                if ver is None and ts is None:
                    end = m.end("t")
                    if re.match(r"\s*\(", text[end : end + 8]):
                        # identifier immediately applied like a function:
                        # not a table reference — copy it untouched
                        out.append(tname)
                        i = end
                        continue
                vd = byval[tname.lower()]
                if isinstance(vd, ViewDef):
                    if ver is not None or ts is not None:
                        raise ValueError(
                            f"{tname!r} is a VIEW — views have no "
                            "versions to travel to; time-travel the "
                            "underlying table inside the view, or "
                            "query the table directly"
                        )
                    out.append(
                        _view(
                            ("view_" + tname.lower(), None, None),
                            lambda _vd=vd: spark.sql(
                                _expand_view(spark, tables, _vd)
                            ),
                        )
                    )
                    i = end
                    continue

                def _read(_t=tname, _v=ver, _ts=ts):
                    # merge_schema always: SQL reads the TABLE schema
                    # (the union), never one file's — an ADD COLUMN or
                    # schema-evolving merge leaves mixed-width files,
                    # and a plain read would adopt whichever file's
                    # schema came first and hide the evolved column
                    vt = _resolve(spark, tables, _t)
                    if _v is not None:
                        return vt.read(version=int(_v), merge_schema=True)
                    if _ts is not None:
                        return vt.read(as_of=_ts, merge_schema=True)
                    return vt.read(merge_schema=True)

                out.append(_view((tname.lower(), ver, ts), _read))
                i = end
                continue
            # ordinary identifier: copy wholesale so its inner
            # characters are never re-inspected as boundaries
            ident = re.match(r"[A-Za-z_]\w*", text[i:]).group(0)
            out.append(ident)
            i += len(ident)
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _run_create(spark: SparkSession, text: str, tables: dict, catalog):
    """CREATE TABLE dispatch:

        CREATE TABLE [IF NOT EXISTS] t (col type, ...)
            [USING versioned] [LOCATION '<path>']   -- schema create
        CREATE TABLE [IF NOT EXISTS] t AS SELECT ...  -- CTAS

    A schema create commits ONE empty data directory carrying the
    declared schema, so the empty table is immediately a first-class
    target: positional INSERT maps onto it, MERGE reads it, DESCRIBE
    works — no special empty-table state anywhere downstream. Catalog
    registration is atomic (TableCatalog.create's hard-link claim);
    without LOCATION the table is managed under the catalog root."""
    bad = ValueError(
        "unsupported CREATE TABLE shape; supported: CREATE TABLE "
        "[IF NOT EXISTS] <name> (col type | col GENERATED ALWAYS AS "
        "(expr) | col BIGINT GENERATED ALWAYS AS IDENTITY [(START WITH "
        "n INCREMENT BY m)] | CONSTRAINT name CHECK (expr), ...) "
        "[USING versioned] [LOCATION '<path>'] [CLUSTER BY (c1, ...)] "
        "| CREATE TABLE [IF NOT EXISTS] <name> [CLUSTER BY (c1, ...)] "
        "AS SELECT ..."
    )
    head = re.match(
        r"^\s*CREATE\s+TABLE\s+(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?"
        r"(?P<t>[A-Za-z_]\w*)\s*(?P<rest>.*?)\s*;?\s*$",
        text,
        re.I | re.S,
    )
    if not head:
        raise bad
    name = head.group("t")
    ine = bool(head.group("ine"))
    rest = head.group("rest").strip()

    def _known() -> bool:
        return any(k.lower() == name.lower() for k in tables)

    def _target(location: str | None):
        """Resolve-or-register the table path: ad-hoc names win, then
        the catalog registers (atomic claim)."""
        if _known():
            return _resolve(spark, tables, name)
        if catalog is None:
            raise ValueError(
                f"CREATE TABLE {name}: the name is not in the tables "
                "dict and no catalog was passed — pass catalog= (or use "
                "SqlSession) so the name can be registered"
            )
        return VersionedTable(
            spark, catalog.create(name, location, if_not_exists=ine)
        )

    m = re.match(
        r"^(?:CLUSTER\s+BY\s*\((?P<cl>[^)]+)\)\s+)?"
        r"AS\s+(?P<src>(SELECT|WITH)\b.+)$",
        rest,
        re.I | re.S,
    )
    if m:
        vt = _target(None)
        if vt.latest_version() > 0:
            if ine:
                return vt
            raise ValueError(
                f"table {name!r} already exists "
                f"(v{vt.latest_version()}) — INSERT INTO it, or DROP "
                "TABLE it first"
            )
        if m.group("cl"):
            # layout declared BEFORE the data lands, so the CTAS write
            # itself range-partitions on the clustering axes
            vt.set_layout([c.strip() for c in m.group("cl").split(",")])
        df = spark.sql(_rewrite_tables(spark, m.group("src"), tables))
        vt.append(df)
        return vt
    if rest.startswith("("):
        # balanced scan: column types nest parens (decimal(18,4))
        depth = 0
        quote: str | None = None
        end = -1
        for i, ch in enumerate(rest):
            if quote:
                if ch == quote:
                    quote = None
                continue
            if ch in ("'", '"'):
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end < 0:
            raise bad
        cols_ddl = rest[1:end].strip()
        tail = rest[end + 1 :].strip()
        # tail clauses in any order: USING <fmt>, LOCATION '<path>',
        # CLUSTER BY (c1, c2[, ...])
        fmt = loc = None
        cluster: list[str] | None = None
        tt = tail
        while tt:
            mu = re.match(r"^USING\s+(\w+)\s*", tt, re.I)
            if mu and fmt is None:
                fmt = mu.group(1)
                tt = tt[mu.end():]
                continue
            ml = re.match(r"^LOCATION\s+'([^']+)'\s*", tt, re.I)
            if ml and loc is None:
                loc = ml.group(1)
                tt = tt[ml.end():]
                continue
            mc = re.match(r"^CLUSTER\s+BY\s*\(([^)]+)\)\s*", tt, re.I)
            if mc and cluster is None:
                cluster = [c.strip() for c in mc.group(1).split(",")]
                tt = tt[mc.end():]
                continue
            raise bad
        if fmt and fmt.lower() != "versioned":
            raise ValueError(
                f"unsupported table format {fmt!r}; this "
                "catalog creates USING versioned tables only"
            )
        # column-list items: plain `c type`, table CONSTRAINTs, and
        # generated/identity column clauses — one-shot DDL parity with
        # the post-create ALTER sequence (lowered to exactly those
        # calls, commit-for-commit; pinned in tests/test_sql_dml.py)
        plain_cols: list[str] = []
        constraints: list[tuple[str, str]] = []
        generated: list[tuple[str, str, str | None]] = []
        identities: list[tuple[str, int, int]] = []
        for item in _split_top_level(cols_ddl):
            it = item.strip()
            mcon = re.match(
                r"^CONSTRAINT\s+(\w+)\s+CHECK\s*\((?P<e>.+)\)\s*$",
                it,
                re.I | re.S,
            )
            if mcon:
                constraints.append((mcon.group(1), mcon.group("e").strip()))
                continue
            mid = re.match(
                r"^(?P<c>\w+)(?:\s+(?P<ty>[A-Za-z_][\w(),\s]*?))?\s+"
                r"GENERATED\s+ALWAYS\s+AS\s+IDENTITY"
                r"(?:\s*\(\s*START\s+WITH\s+(?P<start>-?\d+)"
                r"(?:\s+INCREMENT\s+BY\s+(?P<step>-?\d+))?\s*\))?\s*$",
                it,
                re.I,
            )
            if mid:
                if mid.group("ty") and mid.group("ty").strip().lower() not in (
                    "bigint",
                    "long",
                ):
                    raise ValueError(
                        f"identity column {mid.group('c')!r} must be "
                        f"BIGINT (the engine assigns 64-bit values), "
                        f"got {mid.group('ty').strip()!r}"
                    )
                identities.append(
                    (
                        mid.group("c"),
                        int(mid.group("start") or 1),
                        int(mid.group("step") or 1),
                    )
                )
                continue
            mgen = re.match(
                r"^(?P<c>\w+)(?:\s+(?P<ty>[A-Za-z_][\w(),\s]*?))?\s+"
                r"GENERATED\s+ALWAYS\s+AS\s*\((?P<e>.+)\)\s*$",
                it,
                re.I | re.S,
            )
            if mgen:
                generated.append(
                    (
                        mgen.group("c"),
                        mgen.group("e").strip(),
                        (mgen.group("ty") or "").strip() or None,
                    )
                )
                continue
            plain_cols.append(it)
        if not plain_cols:
            raise ValueError(
                f"CREATE TABLE {name}: at least one plain column is "
                "required (identity/generated columns are engine-"
                "computed and cannot be the whole schema)"
            )
        try:
            empty = spark.createDataFrame([], ", ".join(plain_cols))
        except Exception as e:  # noqa: BLE001 — classify, don't swallow
            raise ValueError(
                f"CREATE TABLE {name}: column definitions do not parse "
                f"as a schema: {cols_ddl!r}"
            ) from e
        # a declared generated-column type must match what its
        # expression resolves to over the plain columns — a silent
        # mismatch would surprise every later read
        for c, e, ty in generated:
            if ty is None:
                continue
            got = empty.selectExpr(
                f"CAST(NULL AS {ty}) AS _d", f"{e} AS _g"
            ).schema
            if got["_g"].dataType != got["_d"].dataType:
                raise ValueError(
                    f"generated column {c!r}: declared type {ty!r} but "
                    f"the expression resolves to "
                    f"{got['_g'].dataType.simpleString()!r} — drop the "
                    "type or fix the expression"
                )
        vt = _target(loc)
        if vt.latest_version() > 0:
            if constraints or generated or identities or cluster:
                if ine:
                    return vt
                raise ValueError(
                    f"table {name!r} already exists — CREATE TABLE "
                    "clause declarations (CONSTRAINT/GENERATED/"
                    "IDENTITY/CLUSTER BY) cannot be re-applied to an "
                    "existing table; use ALTER TABLE"
                )
            if loc:
                # registering an EXISTING external table: the declared
                # schema must name the same columns as the data on disk
                # (a silent mismatch would misdirect every later INSERT)
                have = sorted(
                    f.name.lower()
                    for f in vt.read(merge_schema=True).schema.fields
                    if not f.name.startswith("__")
                )
                want = sorted(f.name.lower() for f in empty.schema.fields)
                if have != want:
                    raise ValueError(
                        f"CREATE TABLE {name} LOCATION: declared columns "
                        f"{want} do not match the existing table's "
                        f"{have}"
                    )
                return vt
            if ine:
                return vt
            raise ValueError(
                f"table {name!r} already exists (v{vt.latest_version()})"
            )
        vt.append(empty)  # v1: the declared schema, zero rows
        # clause lowering, one commit each in declaration-class order —
        # generated columns, identity columns, constraints, clustering —
        # EXACTLY the post-create ALTER sequence (commit-for-commit
        # parity pinned in tests), so one-shot migration DDL and the
        # incremental path produce indistinguishable tables
        for c, e, _ty in generated:
            vt.set_generated_column(c, e)
        for c, st, sp in identities:
            vt.set_identity_column(c, start=st, step=sp)
        for cname, e in constraints:
            vt.add_constraint(cname, e)
        if cluster:
            vt.set_layout(cluster)
        return vt
    raise bad


def _run_alter(spark: SparkSession, text: str, tables: dict) -> int:
    """ALTER TABLE dispatch — each arm is one VersionedTable call; the
    CHECK expression passes through verbatim (Catalyst parses it at the
    add, exactly like the Python API)."""
    bad = ValueError(
        "unsupported ALTER shape; supported: ALTER TABLE t "
        "ADD CONSTRAINT name CHECK (<expr>) | DROP CONSTRAINT name | "
        "RENAME COLUMN old TO new | DROP COLUMN c | ADD COLUMN c <type> | "
        "ALTER COLUMN c TYPE <wider-type> | "
        "ALTER COLUMN c DROP EXPRESSION | "
        "ADD COLUMN c GENERATED ALWAYS AS (<expr>) | "
        "ADD COLUMN c GENERATED ALWAYS AS IDENTITY "
        "[(START WITH n INCREMENT BY m)] | "
        "CLUSTER BY (c1, c2[, ...]) | CLUSTER BY NONE"
    )
    head = re.match(
        r"^\s*ALTER\s+TABLE\s+(?P<t>[A-Za-z_]\w*)\s+(?P<rest>.+?)\s*;?\s*$",
        text,
        re.I | re.S,
    )
    if not head:
        raise bad
    vt = _resolve(spark, tables, head.group("t"))
    rest = head.group("rest")
    m = re.match(
        r"^ADD\s+CONSTRAINT\s+(?P<name>\w+)\s+CHECK\s*\((?P<expr>.+)\)\s*$",
        rest,
        re.I | re.S,
    )
    if m:
        return vt.add_constraint(m.group("name"), m.group("expr").strip())
    m = re.match(r"^DROP\s+CONSTRAINT\s+(?P<name>\w+)\s*$", rest, re.I)
    if m:
        return vt.drop_constraint(m.group("name"))
    m = re.match(
        r"^RENAME\s+COLUMN\s+(?P<old>\w+)\s+TO\s+(?P<new>\w+)\s*$", rest, re.I
    )
    if m:
        return vt.rename_column(m.group("old"), m.group("new"))
    m = re.match(r"^DROP\s+COLUMN\s+(?P<c>\w+)\s*$", rest, re.I)
    if m:
        return vt.drop_column(m.group("c"))
    m = re.match(
        r"^ADD\s+COLUMN\s+(?P<c>\w+)\s+GENERATED\s+ALWAYS\s+AS\s+IDENTITY"
        r"(?:\s*\(\s*START\s+WITH\s+(?P<start>-?\d+)"
        r"(?:\s+INCREMENT\s+BY\s+(?P<step>-?\d+))?\s*\))?\s*$",
        rest,
        re.I,
    )
    if m:
        return vt.set_identity_column(
            m.group("c"),
            start=int(m.group("start") or 1),
            step=int(m.group("step") or 1),
        )
    m = re.match(
        r"^ADD\s+COLUMN\s+(?P<c>\w+)\s+GENERATED\s+ALWAYS\s+AS\s+"
        r"\((?P<expr>.+)\)\s*$",
        rest,
        re.I | re.S,
    )
    if m:
        return vt.set_generated_column(m.group("c"), m.group("expr").strip())
    m = re.match(
        r"^ALTER\s+COLUMN\s+(?P<c>\w+)\s+DROP\s+EXPRESSION\s*$", rest, re.I
    )
    if m:
        return vt.drop_generated_column(m.group("c"))
    m = re.match(
        r"^ALTER\s+COLUMN\s+(?P<c>\w+)\s+TYPE\s+(?P<ty>\w+)\s*$", rest, re.I
    )
    if m:
        return vt.widen_column(m.group("c"), m.group("ty").lower())
    m = re.match(
        r"^ADD\s+COLUMN\s+(?P<c>\w+)\s+(?P<ty>[A-Za-z_][\w(),\s]*?)\s*$",
        rest,
        re.I,
    )
    if m:
        return vt.add_column(m.group("c"), m.group("ty"))
    m = re.match(r"^ENABLE\s+ROW\s+TRACKING\s*$", rest, re.I)
    if m:
        return vt.enable_row_tracking()
    m = re.match(r"^CLUSTER\s+BY\s+NONE\s*$", rest, re.I)
    if m:
        return vt.set_layout(None)
    m = re.match(r"^CLUSTER\s+BY\s*\((?P<cols>[^)]+)\)\s*$", rest, re.I)
    if m:
        return vt.set_layout([c.strip() for c in m.group("cols").split(",")])
    raise bad


_MV_VERS_KEY = "mv_source_versions"  # {source name: covered version}

_MV_QUERY_RE = re.compile(
    r"^\s*SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<from>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"\s+GROUP\s+BY\s+(?P<keys>.+?)\s*;?\s*$",
    re.I | re.S,
)


def _parse_mv_from(from_text: str) -> tuple[list[str], list[str]]:
    """(table names, per-adjacent-pair ON texts) for an MV FROM clause:
    ``t0 [JOIN t1 ON … [JOIN t2 ON … …]]`` — an equi-join CHAIN, each
    ON clause keying the two ADJACENT tables (the shape the telescoping
    delta-join maintenance walks)."""
    parts = re.split(r"\s+JOIN\s+", from_text.strip(), flags=re.I)
    if not re.fullmatch(r"[A-Za-z_]\w*", parts[0].strip()):
        raise ValueError(
            f"materialized view FROM must start with a plain table "
            f"name, got {parts[0].strip()!r}: {_MV_GRAMMAR}"
        )
    names = [parts[0].strip()]
    ons: list[str] = []
    for p in parts[1:]:
        m = re.match(r"^([A-Za-z_]\w*)\s+ON\s+(.+)$", p.strip(), re.I | re.S)
        if not m:
            raise ValueError(
                f"cannot parse MV JOIN clause {p.strip()!r}: {_MV_GRAMMAR}"
            )
        names.append(m.group(1))
        ons.append(m.group(2).strip())
    if len(set(n.lower() for n in names)) != len(names):
        raise ValueError(
            "materialized view joins each table at most once "
            f"(got {names}); self-joins are not maintainable by the "
            "chain rule"
        )
    return names, ons


def _parse_mv_join_keys(on_text: str, a: str, b: str) -> list[list[str]]:
    """Equi-join legs for a join MV: every top-level AND leg must be
    ``<a>.<k1> = <b>.<k2>`` (either side order, column names may
    differ — the real-star-schema shape, ``orders.o_custkey =
    customer.c_custkey``). Returns ORIENTED ``[a_col, b_col]`` pairs:
    the delta-join maintenance joins adjacent snapshots on the pairs,
    so a leg written ``b.k2 = a.k1`` normalizes to the chain order."""
    keys: list[list[str]] = []
    for leg in re.split(r"\s+AND\s+", on_text.strip(), flags=re.I):
        m = re.fullmatch(r"\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*", leg)
        if not m or {m.group(1).lower(), m.group(3).lower()} != {
            a.lower(),
            b.lower(),
        }:
            raise ValueError(
                f"join-MV ON leg {leg!r} must be an equality between "
                f"the ADJACENT tables {a} and {b} "
                f"({a}.<k1> = {b}.<k2>)"
            )
        if m.group(1).lower() == a.lower():
            keys.append([m.group(2), m.group(4)])
        else:
            keys.append([m.group(4), m.group(2)])
    return keys

_MV_GRAMMAR = (
    "materialized views support ONE additive-aggregate block — "
    "SELECT <group cols>, COUNT(*) AS <name>[, SUM(<expr>) AS <name>, "
    "AVG(<expr>) AS <name>, MIN(<expr>) AS <name>, MAX(<expr>) AS "
    "<name> ...] FROM <versioned table> "
    "[JOIN <versioned table> ON a.k1 = b.k2 [AND ...]] [WHERE <pred>] "
    "GROUP BY <group cols> — the shape the change-feed IVM algebra can "
    "maintain exactly (count/sum are distributive under insert +1 / "
    "delete -1; AVG derives as a maintained hidden sum over the "
    "maintained count; a two-table equi-join maintains via the signed "
    "delta-join rule dA*B_old + A_new*dB, and the ON keys may name "
    "DIFFERENT columns on each side; MIN/MAX maintain by the "
    "affected-group recompute rule — inserts fold for free, and a "
    "delete that could carry a group's extremum recomputes JUST that "
    "group from the base behind a semi-join on its keys, so refresh "
    "cost stays |delta| + |affected groups|, never base size). Declared semantics: a maintained SUM folds NULL contributions as 0, so a group whose inputs are ALL NULL reads 0 where SQL SUM reads NULL — COALESCE in the expression if the distinction matters; AVG is exact (hidden non-null denominator)"
)


def _parse_mv_items(items_text: str) -> dict:
    """Parse an additive-aggregate SELECT list into the maintained-MV
    shape: plain group columns, COUNT(*), SUM/AVG/MIN/MAX items (AVG
    stores a hidden maintained (sum, non-null count) pair and derives
    at read time). Shared by CREATE MATERIALIZED VIEW and the
    aggregate-to-MV query rewrite, so "the shape an MV can maintain"
    and "the shape a query must have to be served from one" can never
    drift apart. Raises ValueError on any other item."""
    group_cols: list[str] = []
    count_col: str | None = None
    sums: dict[str, str] = {}
    mins: dict[str, str] = {}
    maxs: dict[str, str] = {}
    derived: dict[str, list] = {}  # avg alias -> [hidden sum, hidden cnt]
    order: list[str] = []
    for it in _split_top_level(items_text):
        it = it.strip()
        cm = re.fullmatch(r"COUNT\s*\(\s*\*\s*\)\s+AS\s+(\w+)", it, re.I)
        if cm:
            if count_col is not None:
                raise ValueError("duplicate COUNT(*) select item")
            count_col = cm.group(1)
            order.append(count_col)
            continue
        sm = re.fullmatch(
            r"SUM\s*\((?P<e>.+)\)\s+AS\s+(?P<a>\w+)", it, re.I | re.S
        )
        if sm:
            sums[sm.group("a")] = sm.group("e").strip()
            order.append(sm.group("a"))
            continue
        am = re.fullmatch(
            r"AVG\s*\((?P<e>.+)\)\s+AS\s+(?P<a>\w+)", it, re.I | re.S
        )
        if am:
            # AVG is NOT directly maintainable, but sum/count is: store
            # a hidden maintained sum AND a hidden maintained non-null
            # count (SQL AVG excludes NULL contributions from the
            # denominator — COUNT(*) would misprice groups with NULLs)
            # and derive the average in the MV's read projection
            alias, expr = am.group("a"), am.group("e").strip()
            hsum, hcnt = f"__sum_{alias}", f"__cnt_{alias}"
            sums[hsum] = expr
            sums[hcnt] = f"CAST(({expr}) IS NOT NULL AS INT)"
            derived[alias] = [hsum, hcnt]
            order.append(alias)
            continue
        mm = re.fullmatch(
            r"(?P<f>MIN|MAX)\s*\((?P<e>.+)\)\s+AS\s+(?P<a>\w+)",
            it,
            re.I | re.S,
        )
        if mm:
            # maintained by the affected-group recompute rule: inserts
            # fold; a delete that could carry the extremum recomputes
            # just that group from the base (see _MV_GRAMMAR cost note)
            target = mins if mm.group("f").upper() == "MIN" else maxs
            target[mm.group("a")] = mm.group("e").strip()
            order.append(mm.group("a"))
            continue
        if re.fullmatch(r"[A-Za-z_]\w*", it):
            group_cols.append(it)
            order.append(it)
            continue
        raise ValueError(f"unsupported select item {it!r}: {_MV_GRAMMAR}")
    return {
        "group_cols": group_cols,
        "count_col": count_col,
        "sums": sums,
        "mins": mins,
        "maxs": maxs,
        "derived": derived,
        "order": order,
    }


def _canon_sql(s: str | None) -> str | None:
    """Whitespace-collapsed comparison form for MV-rewrite matching;
    case-folded only when the fragment carries no string literal (a
    literal's case is data, a keyword's is not)."""
    if s is None:
        return None
    out = re.sub(r"\s+", " ", s.strip())
    if "'" not in out and '"' not in out:
        out = out.lower()
    return out


def _try_mv_rewrite(
    spark: SparkSession, text: str, tables: dict, catalog
) -> tuple[str, str] | None:
    """Aggregate-to-MV query rewrite: when a SELECT is exactly the
    additive-aggregate shape (_parse_mv_items over _MV_QUERY_RE), a
    registered materialized view has the SAME sources / join keys /
    WHERE / GROUP BY, every select item maps onto a maintained column,
    and the MV's watermark is CURRENT at every source's head, the query
    is rewritten to read the |groups|-sized maintained state instead of
    scanning the base — ``(rewritten SELECT text, mv name)``, or None
    when no MV qualifies (the query then runs directly, so a STALE MV
    can never serve stale rows). EXPLAIN surfaces the decision as a
    ``== Materialized View Rewrite ==`` header.

    Semantics note: the rewrite serves the MV's DECLARED semantics
    (_MV_GRAMMAR) — a maintained SUM folds NULL contributions as 0, so
    an all-NULL group reads 0 where direct SQL reads NULL; result types
    are the state's canonical decimal(38) forms. Any shape deviation
    opts a query out — a WITH wrapper is the canonical explicit form.
    First qualifying MV by name wins — deterministic, and overlapping
    MV definitions are rare enough that a cost model would be
    speculation."""
    if catalog is None:
        return None
    q = _MV_QUERY_RE.match(text.strip().rstrip(";"))
    if not q:
        return None
    try:
        src_names, on_texts = _parse_mv_from(q.group("from"))
        chain_keys = [
            _parse_mv_join_keys(on, src_names[i], src_names[i + 1])
            for i, on in enumerate(on_texts)
        ]
        u = _parse_mv_items(q.group("items"))
    except ValueError:
        return None
    want_sources = [n.lower() for n in src_names]
    want_keys = [
        [[a.lower(), b.lower()] for a, b in leg] for leg in chain_keys
    ]
    want_where = _canon_sql(q.group("where"))
    ukeys = [k.strip().lower() for k in _split_top_level(q.group("keys"))]
    for name in sorted(catalog.names()):
        try:
            e = catalog.entry(name)
        except (FileNotFoundError, KeyError):
            continue
        if e.get("kind") != "materialized_view":
            continue
        mv = e["mv"]
        if mv["sources"] != want_sources:
            continue
        have_keys = [
            [
                [a.lower(), b.lower()]
                for a, b in ([k, k] if isinstance(k, str) else k
                             for k in leg)
            ]
            for leg in mv["chain_keys"]
        ]
        if have_keys != want_keys:
            continue
        if _canon_sql(mv.get("where")) != want_where:
            continue
        if sorted(c.lower() for c in mv["group_by"]) != sorted(ukeys):
            continue
        proj = _map_items_to_mv(u, mv)
        if proj is None:
            continue
        # freshness gate: every source's head must equal the covered
        # watermark — a stale MV never serves
        mv_vt = VersionedTable(spark, e["path"])
        applied = [
            c["metadata"][_MV_VERS_KEY]
            for c in mv_vt.history()
            if _MV_VERS_KEY in (c.get("metadata") or {})
        ]
        if not applied:
            continue
        current = True
        for nm in mv["sources"]:
            try:
                src = _resolve(spark, tables, nm)
            except ValueError:
                current = False
                break
            covered = max(d.get(nm, 0) for d in applied)
            if src.latest_version() != covered:
                current = False
                break
        if not current:
            continue
        return f"SELECT {', '.join(proj)} FROM {name}", name
    return None


def _map_items_to_mv(u: dict, mv: dict) -> list[str] | None:
    """Map each parsed user select item onto a maintained MV column
    (aliased back to the user's name), or None if any item has no
    maintained counterpart. Hidden AVG carriers are matched through
    the MV's derived AVG alias, never surfaced raw."""
    derived = mv.get("derived") or {}
    hidden = {c for pair in derived.values() for c in pair}
    group_by = {c.lower(): c for c in mv["group_by"]}

    def find(d: dict, expr: str) -> str | None:
        want = _canon_sql(expr)
        for alias, e in d.items():
            if alias not in hidden and _canon_sql(e) == want:
                return alias
        return None

    proj: list[str] = []
    for o in u["order"]:
        if o == u["count_col"]:
            src = mv["count_col"]
        elif o in u["derived"]:
            src = None
            for alias, pair in derived.items():
                if _canon_sql(mv["sums"][pair[0]]) == _canon_sql(
                    u["sums"][u["derived"][o][0]]
                ):
                    src = alias
                    break
        elif o in u["sums"]:
            src = find(mv["sums"], u["sums"][o])
        elif o in u["mins"]:
            src = find(mv.get("mins") or {}, u["mins"][o])
        elif o in u["maxs"]:
            src = find(mv.get("maxs") or {}, u["maxs"][o])
        else:  # plain group column
            src = group_by.get(o.lower())
        if src is None:
            return None
        proj.append(src if src == o else f"{src} AS {o}")
    return proj


def _canonical_mv_state(df: DataFrame) -> DataFrame:
    """Pin every decimal aggregate to decimal(38, scale): the signed
    coalesce-and-add refresh arithmetic widens decimal precision a step
    per refresh until Spark's 38 cap — storing at the fixpoint from the
    start keeps the state table's schema identical across CREATE and
    every REFRESH (no per-refresh schema evolution commits)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DecimalType

    for f in df.schema.fields:
        if isinstance(f.dataType, DecimalType):
            df = df.withColumn(
                f.name, F.col(f.name).cast(DecimalType(38, f.dataType.scale))
            )
    return df


def _run_create_view(spark: SparkSession, text: str, tables: dict, catalog):
    """CREATE [MATERIALIZED] VIEW dispatch.

    Plain view: the body is validated (planned) against the current
    snapshot so a typo fails at CREATE, then the TEXT is stored — each
    later reference re-inlines it, so a view always reflects its
    tables' head state.

    Materialized view: the body must be the additive-aggregate shape
    (see _MV_GRAMMAR). CREATE materializes the aggregate over the
    source's current snapshot into a MANAGED versioned state table and
    records the covered source version in the commit metadata; REFRESH
    MATERIALIZED VIEW then advances the state from the source's change
    feed (maintain_additive_aggregate — cost ∝ |delta|, never source
    size) and commits the new watermark. Every refresh is itself a
    time-travelable version of the state table."""
    m = re.match(
        r"^\s*CREATE\s+(?P<mat>MATERIALIZED\s+)?VIEW\s+"
        r"(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?(?P<t>[A-Za-z_]\w*)\s+AS\s+"
        r"(?P<src>(SELECT|WITH)\b.+?)\s*;?\s*$",
        text,
        re.I | re.S,
    )
    if not m:
        raise ValueError(
            "unsupported CREATE VIEW shape; supported: CREATE "
            "[MATERIALIZED] VIEW [IF NOT EXISTS] <name> AS SELECT ..."
        )
    if catalog is None:
        raise ValueError(
            "CREATE VIEW needs a catalog (pass catalog= / use "
            "SqlSession) — a view is a persistent name"
        )
    name, ine, body = m.group("t"), bool(m.group("ine")), m.group("src").strip()
    if not m.group("mat"):
        # plan the body NOW (typos/missing columns fail the CREATE, not
        # the first reader); the text is what's stored
        spark.sql(_rewrite_tables(spark, body, tables)).schema
        catalog.create_view(name, body, if_not_exists=ine)
        return 0
    q = _MV_QUERY_RE.match(body)
    if not q:
        raise ValueError(_MV_GRAMMAR)
    src_names, on_texts = _parse_mv_from(q.group("from"))
    src_vts: list[VersionedTable] = []
    for nm in src_names:
        if isinstance(_lookup(tables, nm), ViewDef):
            raise ValueError(
                f"materialized view source {nm!r} is a VIEW — IVM "
                "maintenance needs a versioned table's change feed"
            )
        src_vts.append(_resolve(spark, tables, nm))
    chain_keys = [
        _parse_mv_join_keys(on, src_names[i], src_names[i + 1])
        for i, on in enumerate(on_texts)
    ]
    parsed = _parse_mv_items(q.group("items"))
    group_cols = parsed["group_cols"]
    count_col = parsed["count_col"]
    sums = parsed["sums"]
    mins = parsed["mins"]
    maxs = parsed["maxs"]
    derived = parsed["derived"]
    order = parsed["order"]
    keys = [k.strip() for k in _split_top_level(q.group("keys"))]
    if not all(re.fullmatch(r"[A-Za-z_]\w*", k) for k in keys):
        raise ValueError(f"GROUP BY must list plain columns: {_MV_GRAMMAR}")
    if sorted(c.lower() for c in group_cols) != sorted(
        k.lower() for k in keys
    ):
        raise ValueError(
            "the plain select columns must be exactly the GROUP BY "
            f"keys (select {group_cols} vs GROUP BY {keys})"
        )
    if count_col is None:
        raise ValueError(
            "a materialized view needs COUNT(*) AS <name> — the IVM "
            "algebra tracks group liveness through the signed count"
        )
    from daas_apps_spark.sources.table_format import additive_aggregate_state

    from daas_apps_spark.sources.table_format import chain_join

    state_order: list[str] = []
    for o in order:
        state_order.extend(derived[o] if o in derived else [o])
    versions = [vt.latest_version() for vt in src_vts]
    init = additive_aggregate_state(
        chain_join(src_vts, chain_keys, versions),
        group_cols,
        count_col,
        sums,
        where=q.group("where"),
        mins=mins,
        maxs=maxs,
    )
    init = _canonical_mv_state(init.select(*state_order))
    mvdef = {
        "sources": [nm.lower() for nm in src_names],
        "chain_keys": chain_keys,
        "group_by": group_cols,
        "count_col": count_col,
        "sums": sums,
        "mins": mins,
        "maxs": maxs,
        "derived": derived,
        "where": q.group("where"),
        "order": state_order,
        "sql": body,
    }
    if ine:
        # IF NOT EXISTS must still refuse a name held by a DIFFERENT
        # kind: create(if_not_exists=True) returns resolve(name), and
        # a plain view's path is None (VersionedTable would fail
        # obscurely) while a plain table's path would be silently
        # misread as MV state with no MV definition recorded
        try:
            held = catalog.entry(name).get("kind", "table")
        except FileNotFoundError:
            held = None
        if held is not None and held != "materialized_view":
            verb = {"table": "DROP TABLE", "view": "DROP VIEW"}[held]
            raise ValueError(
                f"{name!r} is a {held.replace('_', ' ')} — use {verb}"
            )
    path = catalog.create(
        name,
        None,
        if_not_exists=ine,
        extra={"kind": "materialized_view", "mv": mvdef},
    )
    mv_vt = VersionedTable(spark, path)
    if mv_vt.latest_version() == 0:
        mv_vt.append(
            init,
            metadata={
                _MV_VERS_KEY: dict(
                    zip(mvdef["sources"], versions)
                )
            },
        )
    return mv_vt.latest_version()


def _run_refresh_mv(spark: SparkSession, text: str, tables: dict, catalog):
    """REFRESH MATERIALIZED VIEW <name>: advance the state table from
    the source's change feed — (last covered version, head] only, the
    maintain_additive_aggregate IVM algebra — and record the new
    watermark in the refresh commit's metadata. A no-delta refresh is a
    no-op (returns the current state version, commits nothing).
    ``REFRESH … FULL`` recomputes the aggregate from the source's HEAD
    snapshot instead — the escape hatch when log retention has dropped
    the change-feed window past the MV's watermark (the incremental
    path then raises its missing-commits error)."""
    m = re.match(
        r"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<t>[A-Za-z_]\w*)"
        r"(?:\s+(?P<full>FULL)|\s+(?P<cont>CONTINUOUS))?\s*;?\s*$",
        text,
        re.I,
    )
    if not m:
        raise ValueError(
            "unsupported REFRESH shape; supported: "
            "REFRESH MATERIALIZED VIEW <name> [FULL | CONTINUOUS]"
        )
    if m.group("cont"):
        raise ValueError(
            "REFRESH MATERIALIZED VIEW ... CONTINUOUS needs a SqlSession"
            " — the session owns the stream handle (and STOP REFRESH "
            "stops it)"
        )
    if catalog is None:
        raise ValueError("REFRESH MATERIALIZED VIEW needs a catalog")
    name = m.group("t")
    try:
        e = catalog.entry(name)
    except FileNotFoundError:
        raise KeyError(
            f"materialized view {name!r} is not in the catalog; known: "
            f"{sorted(catalog.names())}"
        ) from None
    if e.get("kind") != "materialized_view":
        raise ValueError(
            f"{name!r} is a {e.get('kind', 'table').replace('_', ' ')}, "
            "not a materialized view"
        )
    from daas_apps_spark.sources.table_format import (
        additive_aggregate_state,
        chain_join,
        maintain_join_additive_aggregate,
    )

    mv = e["mv"]
    mv_vt = VersionedTable(spark, e["path"])
    # one log replay harvests every source's watermark (the covered
    # versions ride as ONE dict in each build/refresh commit)
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
    src_vts = [_resolve(spark, tables, nm) for nm in mv["sources"]]
    froms = [
        max(d.get(nm, 0) for d in applied) for nm in mv["sources"]
    ]
    tos = [vt.latest_version() for vt in src_vts]
    watermarks = {"mv_source_versions": dict(zip(mv["sources"], tos))}
    if m.group("full"):
        full = additive_aggregate_state(
            chain_join(src_vts, mv["chain_keys"], tos),
            mv["group_by"],
            mv["count_col"],
            mv["sums"],
            where=mv.get("where"),
            mins=mv.get("mins"),
            maxs=mv.get("maxs"),
        )
        return mv_vt.overwrite(
            _canonical_mv_state(full.select(*mv["order"])),
            metadata=watermarks,
        )
    if all(t <= f for t, f in zip(tos, froms)):
        return mv_vt.latest_version()
    new = maintain_join_additive_aggregate(
        src_vts,
        mv["chain_keys"],
        froms,
        tos,
        mv["group_by"],
        mv["count_col"],
        mv["sums"],
        state=mv_vt.read(),
        where=mv.get("where"),
        mins=mv.get("mins"),
        maxs=mv.get("maxs"),
    )
    return mv_vt.overwrite(
        _canonical_mv_state(new.select(*mv["order"])),
        metadata=watermarks,
    )


def _run_drop_view(spark: SparkSession, text: str, catalog):
    m = re.match(
        r"^\s*DROP\s+(?P<mat>MATERIALIZED\s+)?VIEW\s+"
        r"(?:(?P<ie>IF\s+EXISTS)\s+)?(?P<t>[A-Za-z_]\w*)\s*;?\s*$",
        text,
        re.I,
    )
    if not m:
        raise ValueError(
            "unsupported DROP VIEW shape; supported: "
            "DROP [MATERIALIZED] VIEW [IF EXISTS] <name>"
        )
    if catalog is None:
        raise ValueError("DROP VIEW needs a catalog")
    name = m.group("t")
    want = "materialized_view" if m.group("mat") else "view"
    try:
        e = catalog.entry(name)
    except FileNotFoundError:
        if m.group("ie"):
            return 0
        raise KeyError(
            f"{want.replace('_', ' ')} {name!r} is not in the catalog; "
            f"known: {sorted(catalog.names())}"
        ) from None
    kind = e.get("kind", "table")
    if kind != want:
        verb = {
            "table": "DROP TABLE",
            "view": "DROP VIEW",
            "materialized_view": "DROP MATERIALIZED VIEW",
        }[kind]
        raise ValueError(
            f"{name!r} is a {kind.replace('_', ' ')} — use {verb}"
        )
    return int(catalog.drop(name, if_exists=bool(m.group("ie"))))


def _run_explain(
    spark: SparkSession, text: str, tables: dict, catalog=None
) -> DataFrame:
    """EXPLAIN [SIMPLE|EXTENDED|FORMATTED|COST|CODEGEN] <query>: the
    query plans through the same table rewriting as SELECT (declared
    tables, VERSION AS OF, views, TABLE_CHANGES) and the chosen
    explain-mode string comes back as a one-row DataFrame — Spark's own
    EXPLAIN surface over the versioned-table front-end."""
    m = re.match(
        r"^\s*EXPLAIN\s+"
        r"(?:(?P<mode>SIMPLE|EXTENDED|FORMATTED|COST|CODEGEN)\s+)?"
        r"(?P<q>(SELECT|WITH)\b.+?)\s*;?\s*$",
        text,
        re.I | re.S,
    )
    if not m:
        raise ValueError(
            "unsupported EXPLAIN shape; supported: EXPLAIN [SIMPLE|"
            "EXTENDED|FORMATTED|COST|CODEGEN] SELECT ..."
        )
    from daas_apps_spark.operators.partitioning import physical_plan

    header = ""
    body = m.group("q")
    rw = _try_mv_rewrite(spark, body, tables, catalog)
    if rw is not None:
        body, mv_name = rw
        header = (
            "== Materialized View Rewrite ==\n"
            f"SELECT served from materialized view {mv_name} "
            "(shape match, watermark current at source head); "
            f"rewritten: {body}\n\n"
        )
    df = spark.sql(_rewrite_tables(spark, body, tables))
    plan = header + physical_plan(
        df, (m.group("mode") or "simple").lower()
    )
    return spark.createDataFrame([(plan,)], "plan string")


def _run_show_create(
    spark: SparkSession, text: str, tables: dict, catalog
) -> DataFrame:
    """SHOW CREATE TABLE <t>: reconstruct the one-shot DDL — plain
    columns from the merged table schema, generated/identity columns
    from their declared rules, CHECK constraints, CLUSTER BY from the
    active layout, LOCATION for external catalog entries — as a
    statement _run_create would lower back to the very same commit
    sequence (round-trip pinned in tests). The migration story's other
    half: a50 takes one-shot DDL in; this emits it back out."""
    m = re.match(
        r"^\s*SHOW\s+CREATE\s+TABLE\s+(?P<t>[A-Za-z_]\w*)\s*;?\s*$",
        text,
        re.I,
    )
    if not m:
        raise ValueError(
            "unsupported SHOW CREATE shape; supported: "
            "SHOW CREATE TABLE <name>"
        )
    name = m.group("t")
    vt = _resolve(spark, tables, name)
    gen = vt.generated_columns()
    ids = vt.identity_columns()
    cons = vt.constraints()
    layout = vt.layout()
    items: list[str] = []
    seen: set[str] = set()
    try:
        fields = vt.read(merge_schema=True).schema.fields
    except ValueError:
        fields = []
    for f in fields:
        lc = f.name.lower()
        if lc.startswith("__"):
            continue  # engine-internal (row tracking)
        seen.add(lc)
        if lc in ids:
            d = ids[lc]
            items.append(
                f"{f.name} BIGINT GENERATED ALWAYS AS IDENTITY "
                f"(START WITH {d['start']} INCREMENT BY {d['step']})"
            )
        elif lc in gen:
            items.append(f"{f.name} GENERATED ALWAYS AS ({gen[lc]})")
        else:
            items.append(f"{f.name} {f.dataType.simpleString()}")
    # declared-but-unmaterialized rules (no live file carries them yet)
    for c, e in gen.items():
        if c not in seen:
            items.append(f"{c} GENERATED ALWAYS AS ({e})")
    for c, d in ids.items():
        if c not in seen:
            items.append(
                f"{c} BIGINT GENERATED ALWAYS AS IDENTITY "
                f"(START WITH {d['start']} INCREMENT BY {d['step']})"
            )
    for cname, expr in sorted(cons.items()):
        items.append(f"CONSTRAINT {cname} CHECK ({expr})")
    stmt = f"CREATE TABLE {name} (\n  " + ",\n  ".join(items) + "\n)"
    stmt += "\nUSING versioned"
    if catalog is not None:
        try:
            e = catalog.entry(name)
            if not e.get("managed", True):
                stmt += f"\nLOCATION '{e['path']}'"
        except FileNotFoundError:
            pass  # ad-hoc table: no catalog entry, no LOCATION clause
    if layout and layout.get("cluster_by"):
        stmt += f"\nCLUSTER BY ({', '.join(layout['cluster_by'])})"
    return spark.createDataFrame([(stmt,)], "createtab_stmt string")
