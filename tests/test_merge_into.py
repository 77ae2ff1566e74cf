"""Conditional MERGE (A44): VersionedTable.merge_into + the SQL grammar.

The full ANSI/Delta clause set — WHEN MATCHED [AND cond] THEN UPDATE
SET/DELETE, WHEN NOT MATCHED [AND cond] THEN INSERT, WHEN NOT MATCHED BY
SOURCE THEN UPDATE/DELETE — lowered to ONE copy-on-write commit whose
result is a single generated Catalyst plan (first-match CASE per column
over a full outer join). Clause conditions/expressions pass through to
Spark SQL verbatim; semantics pinned against hand-computed expectations
and against the equivalent compositional SQL.
"""

from __future__ import annotations

import os

import pytest

from daas_apps_spark.sources.sql_dml import run_sql
from daas_apps_spark.sources.table_format import VersionedTable


@pytest.fixture()
def target(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "mi"))
    vt.append(
        spark.createDataFrame(
            [
                (1, "a", 10.0),
                (2, "b", 20.0),
                (3, "c", 30.0),
                (4, "d", 40.0),
            ],
            "k long, v string, x double",
        )
    )
    return vt


def _src(spark):
    return spark.createDataFrame(
        [(2, "B", 200.0), (4, "D", 400.0), (5, "E", 500.0), (6, "F", 5.0)],
        "k long, v string, x double",
    )


def _rows(vt):
    return sorted((r.k, r.v, r.x) for r in vt.read().collect())


def test_full_clause_set_python_api(spark, target):
    """Every clause type in one merge, first-match-in-order semantics."""
    v = target.merge_into(
        _src(spark),
        ["k"],
        matched=[
            {
                "action": "update",
                "condition": "s.x > 300",
                "set": {"x": "s.x + t.x", "v": "s.v"},
            },
            {"action": "delete"},
        ],
        not_matched=[
            {
                "condition": "s.x >= 100",
                "columns": ["k", "v", "x"],
                "values": ["s.k", "lower(s.v)", "s.x"],
            }
        ],
        not_matched_by_source=[
            {"action": "update", "condition": "t.k = 1", "set": {"v": "'kept'"}},
            {"action": "delete", "condition": "t.x > 25"},
        ],
    )
    assert v == 2
    # k=1 t-only: first by-source clause fires (v='kept')
    # k=2 matched: s.x=200 fails clause 1 -> clause 2 DELETE
    # k=3 t-only: k!=1, x=30>25 -> DELETE
    # k=4 matched: s.x=400>300 -> x=440, v='D'
    # k=5 s-only: 500>=100 -> insert lowered 'e'
    # k=6 s-only: 5<100 -> no clause fires -> dropped
    assert _rows(target) == [
        (1, "kept", 10.0),
        (4, "D", 440.0),
        (5, "e", 500.0),
    ]


def test_sql_text_parity_with_python_api(spark, target, tmp_path):
    """The SQL grammar lowers to the same commits and the same rows as
    the Python clause lists — commit for commit."""
    twin = VersionedTable(spark, str(tmp_path / "twin"))
    twin.append(target.read())
    _src(spark).createOrReplaceTempView("mi_sql_src")
    run_sql(
        spark,
        """
        MERGE INTO t USING mi_sql_src AS s ON t.k = s.k
        WHEN MATCHED AND s.x > 300 THEN UPDATE SET x = s.x + t.x, v = s.v
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED AND s.x >= 100
            THEN INSERT (k, v, x) VALUES (s.k, lower(s.v), s.x)
        WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN UPDATE SET v = 'kept'
        WHEN NOT MATCHED BY SOURCE AND t.x > 25 THEN DELETE
        """,
        {"t": twin},
    )
    target.merge_into(
        _src(spark),
        ["k"],
        matched=[
            {
                "action": "update",
                "condition": "s.x > 300",
                "set": {"x": "s.x + t.x", "v": "s.v"},
            },
            {"action": "delete"},
        ],
        not_matched=[
            {
                "condition": "s.x >= 100",
                "columns": ["k", "v", "x"],
                "values": ["s.k", "lower(s.v)", "s.x"],
            }
        ],
        not_matched_by_source=[
            {"action": "update", "condition": "t.k = 1", "set": {"v": "'kept'"}},
            {"action": "delete", "condition": "t.x > 25"},
        ],
    )
    assert _rows(twin) == _rows(target)
    assert [c["operation"] for c in twin.history()] == [
        c["operation"] for c in target.history()
    ]


def test_update_set_star_and_insert_star(spark, target):
    """SET * / INSERT * expand by name from the source."""
    target.merge_into(
        _src(spark),
        ["k"],
        matched=[{"action": "update", "condition": "s.x < 300", "set": "*"}],
        not_matched=[{"condition": "s.k = 5", "values": "*"}],
    )
    assert _rows(target) == [
        (1, "a", 10.0),
        (2, "B", 200.0),  # SET * fired
        (3, "c", 30.0),
        (4, "d", 40.0),  # matched, condition false -> passthrough
        (5, "E", 500.0),  # INSERT *
    ]


def test_matched_delete_only(spark, target):
    target.merge_into(
        _src(spark), ["k"], matched=[{"action": "delete"}]
    )
    assert [r[0] for r in _rows(target)] == [1, 3]


def test_by_source_clauses_force_full_rewrite(spark, target):
    """NOT MATCHED BY SOURCE touches unmatched target rows anywhere, so
    every live dir is retired; without BY SOURCE the rewrite set is
    bounded by the source's key stats."""
    target.merge_into(
        _src(spark),
        ["k"],
        not_matched_by_source=[{"action": "delete", "condition": "t.k = 3"}],
    )
    c = target.history()[-1]
    assert c["remove"]  # full rewrite
    assert [r[0] for r in _rows(target)] == [1, 2, 4]


def test_file_level_cow_bounding_survives(spark, tmp_path):
    """A conditional merge whose source keys are stats-disjoint from a
    file never reads or rewrites it (shared _bound_cow_rewrite): the
    disjoint DIR is untouched, and a 1-row merge into a multi-dir table
    retires only the intersecting dir."""
    vt = VersionedTable(spark, str(tmp_path / "bound"))
    vt.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, x double"))
    vt.append(
        spark.createDataFrame([(100, 3.0), (200, 4.0)], "k long, x double")
    )
    live_before = sorted(
        os.path.basename(d) for d in vt._live_dirs()
    )
    vt.merge_into(
        spark.createDataFrame([(100, 99.0)], "k long, x double"),
        ["k"],
        matched=[{"action": "update", "set": {"x": "s.x"}}],
        not_matched=[{"values": "*"}],
    )
    c = vt.history()[-1]
    assert c["remove"] == [live_before[1]]  # only the intersecting dir
    assert live_before[0] not in c["remove"]
    assert sorted((r.k, r.x) for r in vt.read().collect()) == [
        (1, 1.0),
        (2, 2.0),
        (100, 99.0),
        (200, 4.0),
    ]


def test_insert_only_fast_path_appends_without_join(spark, target):
    """Stats-disjoint source keys: pure insert, nothing removed."""
    v = target.merge_into(
        spark.createDataFrame(
            [(100, "y", 1.0), (101, "z", 2.0)], "k long, v string, x double"
        ),
        ["k"],
        matched=[{"action": "delete"}],
        not_matched=[{"condition": "s.x > 1.5", "values": "*"}],
    )
    c = target.history()[-1]
    assert v == 2 and c["remove"] == []
    assert (101, "z", 2.0) in _rows(target) and (100, "y", 1.0) not in _rows(
        target
    )


def test_multiple_source_matches_raise_when_a_clause_fires(spark, tmp_path):
    """Delta's cardinality rule: a target row matched by multiple source
    rows raises when an update/delete clause fires for any pair; all-
    passthrough multi-matches deduplicate to ONE copy instead."""
    vt = VersionedTable(spark, str(tmp_path / "card"))
    vt.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, x double"))
    dup = spark.createDataFrame([(1, 1.0), (1, 2.0)], "k long, x double")
    with pytest.raises(Exception, match="multiple source rows"):
        vt.merge_into(
            dup, ["k"], matched=[{"action": "update", "set": {"x": "s.x"}}]
        )
    # condition false for every pair -> passthrough, deduplicated
    vt.merge_into(
        dup,
        ["k"],
        matched=[
            {"action": "update", "condition": "s.x > 99", "set": {"x": "s.x"}}
        ],
        not_matched=[{"values": "*"}],
    )
    assert sorted((r.k, r.x) for r in vt.read().collect()) == [
        (1, 10.0),
        (2, 20.0),
    ]


def test_row_tracking_ids_survive_update_and_mint_on_insert(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "rt"))
    vt.enable_row_tracking()
    vt.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, x double"))
    before = {
        r["k"]: r["__row_id"]
        for r in vt.read(with_row_ids=True).collect()
    }
    vt.merge_into(
        spark.createDataFrame([(2, 99.0), (3, 30.0)], "k long, x double"),
        ["k"],
        matched=[{"action": "update", "set": {"x": "s.x"}}],
        not_matched=[{"values": "*"}],
    )
    after = {
        r["k"]: r["__row_id"]
        for r in vt.read(with_row_ids=True).collect()
    }
    assert after[1] == before[1] and after[2] == before[2]  # survived
    assert after[3] not in (before[1], before[2])  # freshly minted
    assert vt.read().columns == ["k", "x"]  # engine column stays hidden


def test_generated_columns_recompute_through_the_clauses(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "gen"))
    vt.append(spark.createDataFrame([(10, 1.0), (21, 2.0)], "k long, x double"))
    vt.set_generated_column("bucket", "k % 10")
    vt.merge_into(
        spark.createDataFrame([(21, 99.0), (35, 3.0)], "k long, x double"),
        ["k"],
        matched=[{"action": "update", "set": {"k": "s.k + 1", "x": "s.x"}}],
        not_matched=[{"columns": ["k", "x"], "values": ["s.k", "s.x"]}],
    )
    got = {
        r.k: r.bucket
        for r in vt.read(merge_schema=True).collect()
        if r.bucket is not None
    }
    # updated row: k=22 -> bucket recomputed to 2; insert: 35 -> 5
    assert got[22] == 2 and got[35] == 5
    with pytest.raises(ValueError, match="generated"):
        vt.merge_into(
            spark.createDataFrame([(1, 1.0)], "k long, x double"),
            ["k"],
            matched=[{"action": "update", "set": {"bucket": "7"}}],
        )


def test_refusals_are_loud(spark, target, tmp_path):
    src = _src(spark)
    with pytest.raises(ValueError, match="at least one WHEN"):
        target.merge_into(src, ["k"])
    with pytest.raises(ValueError, match="key"):
        target.merge_into(src, [], matched=[{"action": "delete"}])
    with pytest.raises(ValueError, match="unknown column"):
        target.merge_into(
            src, ["k"], matched=[{"action": "update", "set": {"nope": "1"}}]
        )
    with pytest.raises(ValueError, match="action"):
        target.merge_into(src, ["k"], matched=[{"action": "upsert"}])
    with pytest.raises(ValueError, match="no schema"):
        VersionedTable(spark, str(tmp_path / "empty")).merge_into(
            src, ["k"], matched=[{"action": "delete"}]
        )
    with pytest.raises(ValueError, match="identity"):
        vt = VersionedTable(spark, str(tmp_path / "ident"))
        vt.append(spark.createDataFrame([(1,)], "k long"))
        vt.set_identity_column("rid")
        vt.merge_into(src, ["k"], matched=[{"action": "delete"}])
    with pytest.raises(ValueError, match="lacks"):
        target.merge_into(
            spark.createDataFrame([(1,)], "k long"),
            ["k"],
            matched=[{"action": "update", "set": "*"}],
        )


def test_sql_grammar_refusals_and_case_when_in_condition(spark, target):
    _src(spark).createOrReplaceTempView("mi_case_src")
    with pytest.raises(ValueError, match="WHEN clause"):
        run_sql(
            spark,
            "MERGE INTO t USING mi_case_src AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPSERT",
            {"t": target},
        )
    # a CASE WHEN inside a clause condition must not split the clause
    run_sql(
        spark,
        "MERGE INTO t USING mi_case_src AS s ON t.k = s.k "
        "WHEN MATCHED AND CASE WHEN s.x > 300 THEN true ELSE false END "
        "THEN UPDATE SET x = s.x "
        "WHEN NOT MATCHED AND s.k = 5 THEN INSERT (k, v, x) "
        "VALUES (s.k, s.v, s.x)",
        {"t": target},
    )
    assert (4, "d", 400.0) in _rows(target) and (5, "E", 500.0) in _rows(
        target
    )


def test_sql_matches_compositional_oracle(spark, target):
    """The conditional merge result equals the same logic written as
    plain compositional SQL (the shape the DuckDB oracle row uses)."""
    src = _src(spark)
    src.createOrReplaceTempView("mi_oracle_src")
    target.read().createOrReplaceTempView("mi_oracle_t0")
    expected = sorted(
        (r.k, r.v, r.x)
        for r in spark.sql(
            """
            WITH m AS (
                SELECT t.k, t.v tv, t.x tx, s.v sv, s.x sx
                FROM mi_oracle_t0 t JOIN mi_oracle_src s USING (k)
            ),
            m_res AS (
                SELECT k,
                       CASE WHEN sx > 300 THEN sv ELSE tv END AS v,
                       CASE WHEN sx > 300 THEN sx + tx ELSE tx END AS x
                FROM m WHERE sx > 300
            ),
            t_only AS (
                SELECT * FROM mi_oracle_t0
                WHERE k NOT IN (SELECT k FROM mi_oracle_src)
            ),
            ins AS (
                SELECT s.k, lower(s.v) AS v, s.x
                FROM mi_oracle_src s
                WHERE s.k NOT IN (SELECT k FROM mi_oracle_t0)
                  AND s.x >= 100
            )
            SELECT * FROM m_res
            UNION ALL SELECT * FROM t_only
            UNION ALL SELECT * FROM ins
            """
        ).collect()
    )
    target.merge_into(
        src,
        ["k"],
        matched=[
            {
                "action": "update",
                "condition": "s.x > 300",
                "set": {"v": "s.v", "x": "s.x + t.x"},
            },
            {"action": "delete"},
        ],
        not_matched=[
            {
                "condition": "s.x >= 100",
                "columns": ["k", "v", "x"],
                "values": ["s.k", "lower(s.v)", "s.x"],
            }
        ],
    )
    assert _rows(target) == expected


def test_residual_on_condition(spark, target):
    """ANSI MERGE's theta ON: residual legs beyond the key equalities
    join the key-matched pairs — a pair failing them is NOT matched on
    either side (the target row passes through / hits BY SOURCE, the
    source row inserts)."""
    _src(spark).createOrReplaceTempView("mi_resid_src")
    run_sql(
        spark,
        "MERGE INTO t USING mi_resid_src AS s "
        "ON t.k = s.k AND s.x > 250 "
        "WHEN MATCHED THEN UPDATE SET x = s.x, v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v, x) VALUES (s.k, s.v, s.x)",
        {"t": target},
    )
    rows = {r.k: (r.v, r.x) for r in target.read().collect()}
    # k=4 matched (s.x=400>250): updated. k=2 key-matched but residual
    # fails (200): source row INSERTS... but k=2 already exists — both
    # copies survive, exactly like SQL MERGE with a theta ON that
    # de-matches the pair. k=5,6 plain inserts.
    assert rows[4] == ("D", 400.0) and rows[5] == ("E", 500.0)
    dup = [r for r in target.read().collect() if r.k == 2]
    assert len(dup) == 2  # old row + de-matched insert


def test_residual_on_with_plain_upsert_pair(spark, target):
    """UPDATE SET * / INSERT * under a residual ON routes through
    merge_into (the anti-join fast path cannot express partial
    matching)."""
    _src(spark).createOrReplaceTempView("mi_resid2_src")
    run_sql(
        spark,
        "MERGE INTO t USING mi_resid2_src AS s "
        "ON t.k = s.k AND s.x >= 100 "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": target},
    )
    rows = [(r.k, r.v, r.x) for r in target.read().collect()]
    assert (2, "B", 200.0) in rows and (4, "D", 400.0) in rows
    assert (6, "F", 5.0) in rows  # de-matched by residual -> insert
    assert len([r for r in rows if r[0] == 6]) == 1


def test_merge_using_subquery_resolves_declared_tables(spark, target):
    """The USING subquery runs through the table rewriter: declared
    names (and VERSION AS OF) resolve — 'backfill from my own v1'."""
    run_sql(spark, "DELETE FROM t WHERE k <= 2", {"t": target})
    run_sql(
        spark,
        "MERGE INTO t USING "
        "(SELECT k, v, x FROM t VERSION AS OF 1 WHERE k <= 2) AS s "
        "ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": target},
    )
    assert [r.k for r in target.read().select("k").collect()] and {
        r.k for r in target.read().collect()
    } == {1, 2, 3, 4}


def test_sql_script_runner(spark, tmp_path):
    from daas_apps_spark.sources.sql_catalog import SqlSession

    s = SqlSession(spark, str(tmp_path / "cat"))
    results = s.script(
        """
        CREATE TABLE t (k bigint, v string);
        INSERT INTO t VALUES (1, 'a;b'), (2, 'c');
        UPDATE t SET v = upper(v) WHERE k = 2;
        SELECT count(*) AS n FROM t
        """
    )
    assert results[-1].first().n == 2
    got = {r.k: r.v for r in s.sql("SELECT * FROM t").collect()}
    assert got == {1: "a;b", 2: "C"}  # literal ';' survived the split
