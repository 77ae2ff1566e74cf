"""SQL DML front-end (sources/sql_dml.py): text ≡ Python API, commit for
commit.

The translator's contract is THIN: statement shape parsed, expressions
passed through to Catalyst verbatim, everything else refused loudly. The
parity tests drive twin tables — one via SQL text, one via the Python
API — and require identical commit operations AND identical final rows.
"""

from __future__ import annotations

import pytest

from daas_apps_spark.sources.sql_dml import run_sql
from daas_apps_spark.sources.table_format import VersionedTable


@pytest.fixture()
def twins(spark, tmp_path):
    a = VersionedTable(spark, str(tmp_path / "sql"))
    b = VersionedTable(spark, str(tmp_path / "api"))
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, v string, x double",
    )
    a.append(df)
    b.append(df)
    return a, b


def _rows(vt):
    return sorted((r.k, r.v, r.x) for r in vt.read().collect())


def _ops(vt):
    return [(c["operation"], bool(c.get("dv_add"))) for c in vt.history()]


def test_delete_parity(spark, twins):
    a, b = twins
    v = run_sql(spark, "DELETE FROM t WHERE k = 2", {"t": a})
    assert v == b.delete("k = 2") == 2
    assert _rows(a) == _rows(b)
    assert _ops(a) == _ops(b)


def test_mor_hint_routes_delete_through_deletion_vectors(spark, twins):
    a, b = twins
    run_sql(spark, "/*+ MOR */ DELETE FROM t WHERE k = 2", {"t": a})
    b.delete("k = 2", mode="mor")
    assert _rows(a) == _rows(b)
    assert _ops(a) == _ops(b)
    assert a.history()[-1]["dv_add"]  # merge-on-read, not a rewrite


def test_update_parity_multi_assignment(spark, twins):
    a, b = twins
    sql = "UPDATE t SET v = upper(v), x = x * 2 WHERE k >= 2"
    va = run_sql(spark, sql, {"t": a})
    vb = b.update("k >= 2", {"v": "upper(v)", "x": "x * 2"})
    assert va == vb
    assert _rows(a) == _rows(b) == [
        (1, "a", 10.0),
        (2, "B", 40.0),
        (3, "C", 60.0),
    ]
    assert _ops(a) == _ops(b)


def test_update_set_list_respects_nested_commas(spark, twins):
    a, _ = twins
    run_sql(
        spark,
        "UPDATE t SET v = concat_ws(',', v, 'z'), x = round(x, 1) "
        "WHERE k = 1",
        {"t": a},
    )
    got = dict((r.k, r.v) for r in a.read().collect())
    assert got[1] == "a,z"


def test_merge_parity_subquery_source(spark, twins):
    a, b = twins
    upd = spark.createDataFrame(
        [(2, "B2", 99.0), (4, "d", 40.0)], "k long, v string, x double"
    )
    upd.createOrReplaceTempView("updates_v")
    va = run_sql(
        spark,
        "MERGE INTO t USING (SELECT * FROM updates_v) AS s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": a},
    )
    vb = b.merge(upd, keys=["k"])
    assert va == vb
    assert _rows(a) == _rows(b)
    assert (2, "B2", 99.0) in _rows(a) and (4, "d", 40.0) in _rows(a)
    assert _ops(a) == _ops(b)


def test_merge_named_view_source_and_when_order(spark, twins):
    a, _ = twins
    spark.createDataFrame(
        [(3, "CCC", 3.0)], "k long, v string, x double"
    ).createOrReplaceTempView("src_v")
    run_sql(
        spark,
        "MERGE INTO t AS tgt USING src_v AS s ON tgt.k = s.k "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN MATCHED THEN UPDATE SET *",
        {"t": a},
    )
    assert dict((r.k, r.v) for r in a.read().collect())[3] == "CCC"


def test_select_with_version_as_of(spark, twins):
    a, _ = twins
    run_sql(spark, "DELETE FROM t WHERE k = 1", {"t": a})
    head = run_sql(
        spark, "SELECT count(*) AS n FROM t", {"t": a}
    ).first()
    old = run_sql(
        spark, "SELECT count(*) AS n FROM t VERSION AS OF 1", {"t": a}
    ).first()
    assert (head.n, old.n) == (2, 3)
    joined = run_sql(
        spark,
        "SELECT count(*) AS gone FROM t VERSION AS OF 1 "
        "WHERE k NOT IN (SELECT k FROM t)",
        {"t": a},
    ).first()
    assert joined.gone == 1


def test_refusals_are_loud(spark, twins):
    a, _ = twins
    # TRUNCATE TABLE graduated from refusal to feature in round 9 and
    # REFRESH (MATERIALIZED VIEW) in round 10; a verb outside the
    # grammar still refuses with the supported list, and a supported
    # verb with an unsupported shape refuses with ITS grammar
    with pytest.raises(ValueError, match="supported verbs"):
        run_sql(spark, "GRANT SELECT ON t TO alice", {"t": a})
    with pytest.raises(ValueError, match="REFRESH MATERIALIZED VIEW"):
        run_sql(spark, "REFRESH TABLE t", {"t": a})
    with pytest.raises(ValueError, match="key equality"):
        run_sql(
            spark,
            "MERGE INTO t USING t AS s ON t.k > s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            {"t": a},
        )
    # WHEN MATCHED THEN DELETE graduated from refusal to feature in the
    # conditional-merge round (tests/test_merge_into.py); a clause shape
    # OUTSIDE the grammar still refuses with the supported list
    with pytest.raises(ValueError, match="WHEN clause"):
        run_sql(
            spark,
            "MERGE INTO t USING t AS s ON t.k = s.k "
            "WHEN MATCHED THEN TRUNCATE",
            {"t": a},
        )
    with pytest.raises(ValueError, match="unknown table"):
        run_sql(spark, "DELETE FROM nope WHERE k = 1", {"t": a})
    with pytest.raises(ValueError, match="unknown hint"):
        run_sql(spark, "/*+ FAST */ DELETE FROM t WHERE k = 1", {"t": a})
    with pytest.raises(ValueError, match="unsupported DELETE"):
        run_sql(spark, "DELETE FROM t", {"t": a})  # no WHERE: refuse


def test_select_count_star_answers_from_manifest(spark, twins, tmp_path):
    """A bare SELECT COUNT(*) over a declared table takes the
    manifest-only fast path: exact (DV-subtracted), time-travel-aware,
    and ZERO data-file opens — pinned by chmod-ing the data dirs
    unreadable."""
    import os

    a, _ = twins
    run_sql(spark, "/*+ MOR */ DELETE FROM t WHERE k = 2", {"t": a})
    data = os.path.join(a.path, "data")
    dirs = [os.path.join(data, d) for d in os.listdir(data)]
    for d in dirs:
        os.chmod(d, 0)
    try:
        assert run_sql(spark, "SELECT COUNT(*) FROM t", {"t": a}).first()[0] == 2
        got = run_sql(
            spark, "SELECT count(*) AS n FROM t VERSION AS OF 1", {"t": a}
        ).first()
        assert got.n == 3
    finally:
        for d in dirs:
            os.chmod(d, 0o755)
    # a WHERE clause disqualifies the fast path but still answers
    assert (
        run_sql(
            spark, "SELECT count(*) AS n FROM t WHERE k = 1", {"t": a}
        ).first().n
        == 1
    )


def test_alter_constraint_parity(spark, twins):
    a, b = twins
    va = run_sql(
        spark, "ALTER TABLE t ADD CONSTRAINT x_pos CHECK (x > 0)", {"t": a}
    )
    vb = b.add_constraint("x_pos", "x > 0")
    assert va == vb
    assert a.constraints() == b.constraints() == {"x_pos": "x > 0"}
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
    )

    bad = spark.createDataFrame([(9, "z", -1.0)], "k long, v string, x double")
    with pytest.raises(ConstraintViolationError):
        a.append(bad)
    va = run_sql(spark, "ALTER TABLE t DROP CONSTRAINT x_pos", {"t": a})
    vb = b.drop_constraint("x_pos")
    assert va == vb and a.constraints() == {}
    assert _ops(a) == _ops(b)


def test_alter_column_evolution_parity(spark, twins):
    a, b = twins
    run_sql(spark, "ALTER TABLE t RENAME COLUMN v TO label", {"t": a})
    b.rename_column("v", "label")
    run_sql(spark, "ALTER TABLE t ALTER COLUMN k TYPE bigint", {"t": a})
    b.widen_column("k", "bigint")
    run_sql(spark, "ALTER TABLE t DROP COLUMN x", {"t": a})
    b.drop_column("x")
    assert sorted(a.read().columns) == sorted(b.read().columns) == [
        "k",
        "label",
    ]
    assert _ops(a) == _ops(b)


def test_alter_cluster_by_and_optimize_parity(spark, twins):
    a, b = twins
    va = run_sql(spark, "ALTER TABLE t CLUSTER BY (k, x)", {"t": a})
    vb = b.set_layout(["k", "x"])
    assert va == vb
    assert a.layout() == b.layout()
    assert run_sql(spark, "OPTIMIZE t", {"t": a}) == b.optimize()
    va = run_sql(spark, "ALTER TABLE t CLUSTER BY NONE", {"t": a})
    assert a.layout() is None and va == b.set_layout(None)
    run_sql(spark, "OPTIMIZE t ZORDER BY (k, x)", {"t": a})
    b.optimize(zorder_by=("k", "x"))
    assert _rows(a) == _rows(b)
    assert _ops(a) == _ops(b)


def test_restore_and_describe_history(spark, twins):
    a, b = twins
    run_sql(spark, "DELETE FROM t WHERE k = 2", {"t": a})
    b.delete("k = 2")
    va = run_sql(spark, "RESTORE TABLE t TO VERSION AS OF 1", {"t": a})
    vb = b.restore(version=1)
    assert va == vb
    assert _rows(a) == _rows(b)
    hist = run_sql(spark, "DESCRIBE HISTORY t", {"t": a})
    api = a.snapshots()
    assert hist.columns == api.columns
    assert hist.count() == api.count() == 3
    import json as _json

    detail = _json.loads(
        run_sql(spark, "DESCRIBE DETAIL t", {"t": a}).first().detail
    )
    assert detail == _json.loads(
        _json.dumps(a.detail(), sort_keys=True, default=str)
    )


def test_vacuum_sql_dry_run_then_real(spark, twins):
    import os

    a, _ = twins

    def full(rel):  # vacuum reports rel names: "<dir>" or "_dv/<dir>"
        return (
            os.path.join(a.path, rel)
            if rel.startswith("_dv/")
            else os.path.join(a.path, "data", rel)
        )

    run_sql(spark, "DELETE FROM t WHERE k = 2", {"t": a})  # v2 rewrite
    dry = run_sql(spark, "VACUUM t RETAIN 0 VERSIONS DRY RUN", {"t": a})
    cands = [r.path for r in dry.collect()]
    assert cands  # v1's dir is unreferenced by the head snapshot
    for p in cands:
        assert os.path.isdir(full(p))  # DRY RUN deleted nothing
    real = run_sql(spark, "VACUUM t", {"t": a})
    removed = [r.path for r in real.collect()]
    assert sorted(removed) == sorted(cands)
    for p in removed:
        assert not os.path.exists(full(p))
    assert sorted(r.k for r in a.read().collect()) == [1, 3]


def test_ddl_refusals_are_loud(spark, twins):
    a, _ = twins
    # ALTER TABLE ADD COLUMN graduated from refusal to feature in
    # round 9 (see test_add_column_and_truncate_via_sql)
    for sql in [
        "ALTER TABLE t ADD COLUMN",
        "OPTIMIZE t FULL",
        "VACUUM t RETAIN VERSIONS",
        "RESTORE TABLE t",
        "DESCRIBE STATS t",
        "ALTER TABLE t CLUSTER BY ()",
    ]:
        with pytest.raises(ValueError, match="supported"):
            run_sql(spark, sql, {"t": a})


def test_generated_and_identity_columns_via_sql(spark, twins):
    a, b = twins
    va = run_sql(
        spark,
        "ALTER TABLE t ADD COLUMN bucket GENERATED ALWAYS AS (k % 10)",
        {"t": a},
    )
    vb = b.set_generated_column("bucket", "k % 10")
    assert va == vb
    assert a.generated_columns() == b.generated_columns()
    va = run_sql(
        spark,
        "ALTER TABLE t ADD COLUMN rid GENERATED ALWAYS AS IDENTITY "
        "(START WITH 1000 INCREMENT BY 2)",
        {"t": a},
    )
    vb = b.set_identity_column("rid", start=1000, step=2)
    assert va == vb
    assert a.identity_columns() == b.identity_columns()
    df = spark.createDataFrame([(9, "z", 1.0)], "k long, v string, x double")
    a.append(df)
    b.append(df)
    ra = {r.k: (r.bucket, r.rid) for r in a.read(merge_schema=True).collect()}
    assert ra[9][0] == 9 and ra[9][1] >= 1000 and ra[9][1] % 2 == 0
    va = run_sql(
        spark, "ALTER TABLE t ALTER COLUMN bucket DROP EXPRESSION", {"t": a}
    )
    vb = b.drop_generated_column("bucket")
    assert va == vb and a.generated_columns() == {}
    assert _ops(a) == _ops(b)


def test_bloomfilter_index_via_sql(spark, twins):
    a, b = twins
    va = run_sql(
        spark,
        "CREATE BLOOMFILTER INDEX ON t (v) WITH FPP 0.05",
        {"t": a},
    )
    vb = b.set_bloom_columns(["v"], fpp=0.05)
    assert va == vb
    assert a.bloom_columns() == b.bloom_columns() == {
        "cols": ["v"],
        "fpp": 0.05,
    }
    va = run_sql(spark, "DROP BLOOMFILTER INDEX ON t", {"t": a})
    assert va == b.set_bloom_columns(None)
    assert a.bloom_columns() is None
    assert _ops(a) == _ops(b)
    with pytest.raises(ValueError, match="BLOOMFILTER INDEX shape"):
        run_sql(spark, "CREATE BLOOMFILTER INDEX ON t", {"t": a})


def test_enable_row_tracking_via_sql(spark, tmp_path):
    from daas_apps_spark.sources.table_format import VersionedTable

    a = VersionedTable(spark, str(tmp_path / "rt"))
    v = run_sql(spark, "ALTER TABLE t ENABLE ROW TRACKING", {"t": a})
    assert v == 1 and a.row_tracking()
    a.append(
        spark.createDataFrame([(1, "x", 1.0)], "k long, v string, x double")
    )
    assert "__row_id" in a.read(with_row_ids=True).columns
    with pytest.raises(ValueError, match="already enabled"):
        run_sql(spark, "ALTER TABLE t ENABLE ROW TRACKING", {"t": a})


def test_insert_and_ctas_via_sql(spark, twins, tmp_path):
    from daas_apps_spark.sources.table_format import VersionedTable

    a, b = twins
    # VALUES insert maps positionally onto the table schema
    va = run_sql(
        spark, "INSERT INTO t VALUES (9, 'z', 90.0), (10, 'y', 100.0)",
        {"t": a},
    )
    vb = b.append(
        spark.createDataFrame(
            [(9, "z", 90.0), (10, "y", 100.0)], "k long, v string, x double"
        )
    )
    assert va == vb
    assert _rows(a) == _rows(b)
    # SELECT insert reads declared tables (time travel allowed)
    run_sql(
        spark,
        "INSERT INTO t SELECT k + 100, v, x FROM t VERSION AS OF 1",
        {"t": a},
    )
    assert a.read().count() == 8 and {101, 102, 103} <= {
        r.k for r in a.read().collect()
    }
    # INSERT OVERWRITE replaces the snapshot
    run_sql(spark, "INSERT OVERWRITE t VALUES (1, 'only', 1.0)", {"t": a})
    assert _rows(a) == [(1, "only", 1.0)]
    # CTAS into a declared empty path
    path = str(tmp_path / "ctas")
    out = run_sql(
        spark,
        "CREATE TABLE dst AS SELECT k, x FROM t WHERE k = 1",
        {"t": a, "dst": path},
    )
    assert isinstance(out, VersionedTable)
    assert [(r.k, r.x) for r in out.read().collect()] == [(1, 1.0)]
    with pytest.raises(ValueError, match="already exists"):
        run_sql(spark, "CREATE TABLE dst AS SELECT * FROM t",
                {"t": a, "dst": path})
    # wrong arity refuses loudly
    with pytest.raises(ValueError, match="column"):
        run_sql(spark, "INSERT INTO t VALUES (1, 'a')", {"t": a})


def test_table_changes_tvf_via_sql(spark, twins):
    a, _ = twins
    run_sql(spark, "DELETE FROM t WHERE k = 2", {"t": a})
    got = run_sql(
        spark,
        "SELECT _change_type, count(*) AS n "
        "FROM TABLE_CHANGES(t, 1, 2) GROUP BY 1 ORDER BY 1",
        {"t": a},
    ).collect()
    assert [(r._change_type, r.n) for r in got] == [("delete", 1)]
    # open-ended range reads to head; composes with ordinary references
    joined = run_sql(
        spark,
        "SELECT count(*) AS n FROM TABLE_CHANGES(t, 1) c "
        "JOIN t VERSION AS OF 1 o ON c.k = o.k",
        {"t": a},
    ).first()
    assert joined.n == 1


def test_rewriter_is_quote_aware_and_alias_safe(spark, twins):
    a, _ = twins
    # a table name inside a string literal is DATA, not a reference
    got = run_sql(
        spark, "SELECT count(*) AS n FROM t WHERE v <> 't'", {"t": a}
    ).first()
    assert got.n == 3
    # self-qualified references resolve through ONE shared view
    got = run_sql(
        spark, "SELECT t.k, upper(t.v) AS u FROM t WHERE t.k = 1", {"t": a}
    ).first()
    assert (got.k, got.u) == (1, "A")
    # two references in one statement read one snapshot
    got = run_sql(
        spark,
        "SELECT count(*) AS n FROM t x JOIN t y ON x.k = y.k",
        {"t": a},
    ).first()
    assert got.n == 3


def test_insert_parenthesized_compound_source(spark, twins):
    a, _ = twins
    run_sql(
        spark,
        "INSERT INTO t (SELECT 7, 'u', 70.0) UNION (SELECT 8, 'w', 80.0)",
        {"t": a},
    )
    ks = {r.k for r in a.read().collect()}
    assert {7, 8} <= ks and len(ks) == 5


def test_insert_store_assignment_refuses_lossy_values(spark, twins):
    """SQL INSERT runs under store-assignment semantics: a VALUES
    literal that cannot be stored in the column's declared type FAILS
    the statement instead of landing NULL (Spark's default non-ANSI
    cast would silently null it) — and a clean INSERT still lands."""
    a, _ = twins
    before = a.latest_version()
    with pytest.raises(Exception, match="store-assignment"):
        run_sql(spark, "INSERT INTO t VALUES (4, 'd', 'oops')", {"t": a})
    assert a.latest_version() == before  # nothing committed
    run_sql(spark, "INSERT INTO t VALUES (4, 'd', 40.0)", {"t": a})
    assert (4, "d", 40.0) in _rows(a)


def test_insert_store_assignment_refuses_overflow(spark, tmp_path):
    """An out-of-range literal into a narrower integer column raises —
    non-ANSI cast would WRAP it silently."""
    vt = VersionedTable(spark, str(tmp_path / "ovf"))
    vt.append(spark.createDataFrame([(1, 10)], "k long, n int"))
    with pytest.raises(Exception, match="store-assignment"):
        run_sql(
            spark, "INSERT INTO t VALUES (2, 4000000000)", {"t": vt}
        )
    assert vt.manifest_count() == 1
    run_sql(spark, "INSERT INTO t VALUES (2, 2000000000)", {"t": vt})
    assert {r.n for r in vt.read().collect()} == {10, 2000000000}


def test_insert_excludes_identity_and_generated_columns(spark, tmp_path):
    """Positional INSERT maps onto the ASSIGNABLE columns: identity
    columns are engine-assigned (never a target), generated columns may
    be omitted (computed) or provided in full (validated)."""
    vt = VersionedTable(spark, str(tmp_path / "idg"))
    vt.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t = {"t": vt}
    run_sql(
        spark,
        "ALTER TABLE t ADD COLUMN rid GENERATED ALWAYS AS IDENTITY",
        t,
    )
    # identity excluded: two VALUES columns map onto (k, v)
    run_sql(spark, "INSERT INTO t VALUES (2, 'b')", t)
    rows = {r.k: r for r in vt.read(merge_schema=True).collect()}
    assert rows[2].v == "b" and rows[2].rid >= 1
    run_sql(
        spark,
        "ALTER TABLE t ADD COLUMN bucket GENERATED ALWAYS AS (k % 10)",
        t,
    )
    # generated omitted: computed by the write funnel
    run_sql(spark, "INSERT INTO t VALUES (13, 'c')", t)
    # generated provided: validated (correct value passes)
    run_sql(spark, "INSERT INTO t VALUES (24, 'd', 4)", t)
    rows = {r.k: r for r in vt.read(merge_schema=True).collect()}
    assert rows[13].bucket == 3 and rows[24].bucket == 4
    # generated provided WRONG: the funnel's validation rejects it
    with pytest.raises(Exception, match="(?i)generat|violate"):
        run_sql(spark, "INSERT INTO t VALUES (35, 'e', 9)", t)
    # arity that matches neither target list refuses with the list
    with pytest.raises(ValueError, match="positional target list"):
        run_sql(spark, "INSERT INTO t VALUES (1, 'x', 1, 99)", t)


def test_add_column_and_truncate_via_sql(spark, twins, tmp_path):
    """Round-9 surface: plain ADD COLUMN (schema evolution, zero data
    bytes) and TRUNCATE TABLE (delete-all in one manifest commit,
    schema/history/declared state survive)."""
    a, b = twins
    va = run_sql(spark, "ALTER TABLE t ADD COLUMN note string", {"t": a})
    vb = b.add_column("note", "string")
    assert va == vb
    # existing rows surface NULL; new writes can carry it
    assert a.read(merge_schema=True).filter("note IS NULL").count() == 3
    run_sql(spark, "INSERT INTO t VALUES (9, 'z', 90.0, 'hi')", {"t": a})
    got = {r.k: r.note for r in a.read(merge_schema=True).collect()}
    assert got[9] == "hi" and got[1] is None
    # the evolution commit is invisible to the change feed (zero rows)
    assert (
        a.changes_between(va - 1, va).count() == 0
    )
    with pytest.raises(ValueError, match="already exists"):
        run_sql(spark, "ALTER TABLE t ADD COLUMN note string", {"t": a})
    # TRUNCATE: all rows gone, schema + constraints + history intact
    a.add_constraint("k_pos", "k >= 0")
    head = run_sql(spark, "TRUNCATE TABLE t", {"t": a})
    assert a.manifest_count() == 0
    assert a.constraints() == {"k_pos": "k >= 0"}
    assert a.manifest_count(version=head - 2) > 0  # time travel survives
    # the truncated table is still a first-class INSERT target
    run_sql(spark, "INSERT INTO t VALUES (1, 'a', 1.0, 'n')", {"t": a})
    assert a.manifest_count() == 1
    with pytest.raises(ValueError, match="TRUNCATE"):
        run_sql(spark, "TRUNCATE t", {"t": a})


def test_insert_with_column_list(spark, tmp_path):
    """INSERT INTO t (c1, c2): named mapping — unnamed plain columns
    land NULL, identity/generated columns stay engine-owned, and the
    '(SELECT ...)' parenthesized-source shape still parses as a
    source."""
    vt = VersionedTable(spark, str(tmp_path / "cl"))
    vt.append(
        spark.createDataFrame(
            [(1, "a", 10.0)], "k long, v string, x double"
        )
    )
    t = {"t": vt}
    run_sql(spark, "INSERT INTO t (x, k) VALUES (20.0, 2)", t)
    rows = {r.k: (r.v, r.x) for r in vt.read().collect()}
    assert rows[2] == (None, 20.0)  # named cols mapped, v NULL-filled
    run_sql(spark, "INSERT INTO t (k, v) SELECT 3, 'c'", t)
    rows = {r.k: (r.v, r.x) for r in vt.read().collect()}
    assert rows[3] == ("c", None)
    # parenthesized source is NOT a column list
    run_sql(spark, "INSERT INTO t (SELECT 4, 'd', 40.0)", t)
    assert 4 in {r.k for r in vt.read().collect()}
    # generated column may be named (validated) or omitted (computed)
    vt.set_generated_column("bucket", "k % 10")
    run_sql(spark, "INSERT INTO t (k, bucket) VALUES (15, 5)", t)
    run_sql(spark, "INSERT INTO t (k) VALUES (26)", t)
    got = {
        r.k: r.bucket
        for r in vt.read(merge_schema=True).collect()
        if r.k in (15, 26)
    }
    assert got == {15: 5, 26: 6}
    # identity column refuses by name; unknown/dup names refuse
    vt.set_identity_column("rid")
    with pytest.raises(ValueError, match="IDENTITY"):
        run_sql(spark, "INSERT INTO t (k, rid) VALUES (7, 1)", t)
    with pytest.raises(ValueError, match="unknown column"):
        run_sql(spark, "INSERT INTO t (nope) VALUES (1)", t)
    with pytest.raises(ValueError, match="twice"):
        run_sql(spark, "INSERT INTO t (k, k) VALUES (1, 2)", t)
    with pytest.raises(ValueError, match="column list"):
        run_sql(spark, "INSERT INTO t (k, v) VALUES (1)", t)


def test_create_table_clauses_commit_parity(spark, tmp_path):
    """One-shot CREATE TABLE with GENERATED / IDENTITY / CONSTRAINT /
    CLUSTER BY clauses produces EXACTLY the commit sequence of the
    incremental CREATE + ALTER path — (operation, metadata) pairs equal
    commit-for-commit — so migration DDL and organic evolution yield
    indistinguishable tables."""
    import json
    import os

    from daas_apps_spark.sources.sql_catalog import SqlSession

    s = SqlSession(spark, str(tmp_path / "cat"))
    s.sql(
        """CREATE TABLE oneshot (
            ts timestamp, amount decimal(10,2),
            day date GENERATED ALWAYS AS (to_date(ts)),
            rid BIGINT GENERATED ALWAYS AS IDENTITY
                (START WITH 100 INCREMENT BY 10),
            CONSTRAINT pos CHECK (amount > 0)
        ) CLUSTER BY (day)"""
    )
    s.script(
        """
        CREATE TABLE stepwise (ts timestamp, amount decimal(10,2));
        ALTER TABLE stepwise ADD COLUMN day GENERATED ALWAYS AS
            (to_date(ts));
        ALTER TABLE stepwise ADD COLUMN rid GENERATED ALWAYS AS IDENTITY
            (START WITH 100 INCREMENT BY 10);
        ALTER TABLE stepwise ADD CONSTRAINT pos CHECK (amount > 0);
        ALTER TABLE stepwise CLUSTER BY (day)
        """
    )

    def commits(name):
        p = s.catalog.resolve(name)
        out = []
        for n in sorted(os.listdir(os.path.join(p, "_log"))):
            if n.endswith(".json") and not n.startswith("."):
                with open(os.path.join(p, "_log", n)) as f:
                    c = json.load(f)
                out.append(
                    (
                        c.get("operation"),
                        json.dumps(c.get("metadata"), sort_keys=True),
                    )
                )
        return out

    assert commits("oneshot") == commits("stepwise")
    # both tables behave identically under a write: identity assigned,
    # generated computed, constraint enforced, layout applied
    for t in ("oneshot", "stepwise"):
        s.sql(
            f"INSERT INTO {t} VALUES "
            "(TIMESTAMP '2026-01-03 10:00:00', 5.00), "
            "(TIMESTAMP '2026-02-01 00:00:00', 7.50)"
        )
        rows = s.sql(
            f"SELECT rid, CAST(day AS string) AS day FROM {t} "
            "ORDER BY rid"
        ).collect()
        assert [r.day for r in rows] == ["2026-01-03", "2026-02-01"]
        assert all(r.rid >= 100 and r.rid % 10 == 0 for r in rows)


def test_create_table_clause_refusals(spark, tmp_path):
    from daas_apps_spark.sources.sql_catalog import SqlSession

    s = SqlSession(spark, str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="must be BIGINT"):
        s.sql("CREATE TABLE b1 (id INT GENERATED ALWAYS AS IDENTITY, x int)")
    with pytest.raises(ValueError, match="declared type"):
        s.sql(
            "CREATE TABLE b2 (ts timestamp, "
            "d int GENERATED ALWAYS AS (to_date(ts)))"
        )
    with pytest.raises(ValueError, match="at least one plain column"):
        s.sql("CREATE TABLE b3 (id BIGINT GENERATED ALWAYS AS IDENTITY)")
    # clause DDL over an existing table must go through ALTER
    s.sql("CREATE TABLE t1 (k bigint)")
    with pytest.raises(ValueError, match="ALTER TABLE"):
        s.sql(
            "CREATE TABLE t1 (k bigint, CONSTRAINT c CHECK (k > 0))"
        )


def test_ctas_cluster_by_lands_clustered(spark, tmp_path):
    """CREATE TABLE ... CLUSTER BY (c) AS SELECT: the layout commit
    precedes the data commit, so the CTAS write itself lands
    range-partitioned on the axis (disjoint per-file min/max)."""
    from daas_apps_spark.sources.sql_catalog import SqlSession
    from daas_apps_spark.sources.table_format import VersionedTable

    s = SqlSession(spark, str(tmp_path / "cat"))
    spark.range(0, 10000).selectExpr(
        "id AS k", "id % 97 AS v"
    ).createOrReplaceTempView("ctas_src")
    s.sql("CREATE TABLE clus CLUSTER BY (k) AS SELECT k, v FROM ctas_src")
    vt = VersionedTable(spark, s.catalog.resolve("clus"))
    assert vt.layout()["cluster_by"] == ["k"]
    # the CTAS data commit follows the layout commit and carries
    # per-file k stats with DISJOINT ranges (range-partitioned write)
    data = vt.history()[-1]
    assert data["operation"] == "append"
    spans = sorted(
        (fs["k"][0], fs["k"][1])
        for files in data["file_stats"].values()
        for fs in files.values()
    )
    assert len(spans) > 1
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_show_create_table_round_trips(spark, tmp_path):
    """SHOW CREATE TABLE emits DDL that _run_create lowers back to the
    IDENTICAL commit sequence — the a50 migration story closed in both
    directions."""
    import json
    import os

    from daas_apps_spark.sources.sql_catalog import SqlSession

    s = SqlSession(spark, str(tmp_path / "cat"))
    ddl = (
        """CREATE TABLE src (
            ts timestamp, amount decimal(10,2),
            day date GENERATED ALWAYS AS (to_date(ts)),
            rid BIGINT GENERATED ALWAYS AS IDENTITY
                (START WITH 7 INCREMENT BY 3),
            CONSTRAINT pos CHECK (amount > 0)
        ) CLUSTER BY (day)"""
    )
    s.sql(ddl)
    stmt = s.sql("SHOW CREATE TABLE src").first().createtab_stmt
    assert "GENERATED ALWAYS AS (to_date(ts))" in stmt
    assert "START WITH 7 INCREMENT BY 3" in stmt
    assert "CONSTRAINT pos CHECK (amount > 0)" in stmt
    assert "CLUSTER BY (day)" in stmt
    # round trip: run the emitted DDL under a new name
    s.sql(stmt.replace("CREATE TABLE src", "CREATE TABLE clone", 1))

    def commits(name):
        p = s.catalog.resolve(name)
        out = []
        for n in sorted(os.listdir(os.path.join(p, "_log"))):
            if n.endswith(".json") and not n.startswith("."):
                with open(os.path.join(p, "_log", n)) as f:
                    c = json.load(f)
                out.append(
                    (
                        c.get("operation"),
                        json.dumps(c.get("metadata"), sort_keys=True),
                    )
                )
        return out

    assert commits("src") == commits("clone")


def test_explain_verb(spark, twins):
    a, _ = twins
    out = run_sql(
        spark, "EXPLAIN SELECT k, sum(x) AS s FROM t GROUP BY k", {"t": a}
    ).first()
    assert "Physical Plan" in out.plan
    out = run_sql(
        spark,
        "EXPLAIN FORMATTED SELECT count(*) AS n FROM t WHERE k > 1",
        {"t": a},
    ).first()
    assert "HashAggregate" in out.plan or "Aggregate" in out.plan
    with pytest.raises(ValueError, match="unsupported EXPLAIN"):
        run_sql(spark, "EXPLAIN DELETE FROM t WHERE k = 1", {"t": a})
