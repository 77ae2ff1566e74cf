"""SQL catalog / named tables (A45): sources/sql_catalog.py.

The judge-criterion test is the pure-SQL session: create → insert →
merge → time-travel select → optimize → vacuum → drop, zero Python
table handles. The rest pins the catalog contract: atomic name claims,
managed-vs-external DROP, case-insensitive resolution, ad-hoc
shadowing, loud refusals without a catalog.
"""

from __future__ import annotations

import os

import pytest

from daas_apps_spark.sources.sql_catalog import SqlSession, TableCatalog
from daas_apps_spark.sources.sql_dml import run_sql
from daas_apps_spark.sources.table_format import VersionedTable


def test_pure_sql_lifecycle(spark, tmp_path):
    """The whole lakehouse lifecycle as text — no VersionedTable handle
    ever touches user code."""
    s = SqlSession(spark, str(tmp_path / "cat"))
    s.sql("CREATE TABLE accounts (k bigint, v string, x double)")
    s.sql(
        "INSERT INTO accounts VALUES "
        "(1, 'a', 10.0), (2, 'b', 20.0), (3, 'c', 30.0)"
    )
    s.sql("INSERT INTO accounts VALUES (4, 'd', 40.0)")
    s.sql(
        "CREATE TABLE staged AS "
        "SELECT k + 2 AS k, upper(v) AS v, x * 10 AS x FROM accounts"
    )
    s.sql(
        "MERGE INTO accounts AS t USING staged AS s ON t.k = s.k "
        "WHEN MATCHED AND s.x > 250 THEN UPDATE SET x = s.x "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    head = sorted(
        (r.k, r.v, r.x) for r in s.sql("SELECT * FROM accounts").collect()
    )
    assert head == [
        (1, "a", 10.0),
        (2, "b", 20.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
        (5, "C", 300.0),
        (6, "D", 400.0),
    ]
    assert (
        s.sql("SELECT count(*) AS n FROM accounts VERSION AS OF 2").first().n
        == 3
    )
    s.sql("UPDATE accounts SET v = 'z' WHERE k = 1")
    s.sql("DELETE FROM accounts WHERE k = 6")
    s.sql("OPTIMIZE accounts")
    s.sql("VACUUM accounts RETAIN 2 VERSIONS")
    hist = [r.operation for r in s.sql("DESCRIBE HISTORY accounts").collect()]
    assert "merge" in hist and "optimize" in hist
    assert s.sql("DROP TABLE staged") == 1
    assert [r.name for r in s.sql("SHOW TABLES").collect()] == ["accounts"]


def test_schema_create_makes_empty_table_first_class(spark, tmp_path):
    """A schema CREATE commits one empty dir carrying the declared
    schema: COUNT(*), positional INSERT, and MERGE all work on the
    empty table with no special-casing."""
    s = SqlSession(spark, str(tmp_path / "cat"))
    s.sql("CREATE TABLE t (k bigint, amount decimal(18,4))")
    assert s.sql("SELECT count(*) AS n FROM t").first().n == 0
    assert [f.simpleString() for f in s.sql("SELECT * FROM t").schema] == [
        "k:bigint",
        "amount:decimal(18,4)",
    ]
    s.sql("MERGE INTO t USING (SELECT 1 AS k, 2.5 AS amount) AS s "
          "ON t.k = s.k WHEN NOT MATCHED THEN INSERT *")
    assert s.sql("SELECT count(*) AS n FROM t").first().n == 1


def test_create_claims_name_atomically(spark, tmp_path):
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.create("t")
    with pytest.raises(ValueError, match="already exists"):
        cat.create("t")
    # IF NOT EXISTS resolves the existing entry instead
    assert cat.create("t", if_not_exists=True) == cat.resolve("t")


def test_managed_drop_removes_data_external_drop_keeps_it(spark, tmp_path):
    cat = TableCatalog(str(tmp_path / "cat"))
    ext_path = str(tmp_path / "external_data")
    s = SqlSession(spark, cat)
    s.sql("CREATE TABLE managed (k bigint)")
    s.sql(f"CREATE TABLE ext (k bigint) LOCATION '{ext_path}'")
    s.sql("INSERT INTO managed VALUES (1)")
    s.sql("INSERT INTO ext VALUES (1)")
    managed_path = cat.resolve("managed")
    s.sql("DROP TABLE managed")
    s.sql("DROP TABLE ext")
    assert not os.path.exists(managed_path)  # managed: data removed
    assert os.path.isdir(ext_path)  # external: data kept
    # the kept external data re-registers cleanly
    s.sql(f"CREATE TABLE ext2 (k bigint) LOCATION '{ext_path}'")
    assert s.sql("SELECT count(*) AS n FROM ext2").first().n == 1


def test_names_are_case_insensitive_and_adhoc_shadows(spark, tmp_path):
    cat = TableCatalog(str(tmp_path / "cat"))
    s = SqlSession(spark, cat)
    s.sql("CREATE TABLE Orders (k bigint)")
    s.sql("INSERT INTO ORDERS VALUES (1), (2)")
    assert s.sql("SELECT count(*) AS n FROM orders").first().n == 2
    # an ad-hoc tables entry shadows the catalog name
    other = VersionedTable(spark, str(tmp_path / "other"))
    other.append(spark.createDataFrame([(9,), (8,), (7,)], "k bigint"))
    got = run_sql(
        spark,
        "SELECT count(*) AS n FROM orders",
        {"orders": other},
        catalog=cat,
    ).first()
    assert got.n == 3


def test_catalog_survives_sessions(spark, tmp_path):
    path = str(tmp_path / "cat")
    SqlSession(spark, path).sql("CREATE TABLE t (k bigint)")
    SqlSession(spark, path).sql("INSERT INTO t VALUES (5)")
    assert (
        SqlSession(spark, path).sql("SELECT max(k) AS m FROM t").first().m
        == 5
    )


def test_refusals(spark, tmp_path):
    s = SqlSession(spark, str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="not parse"):
        s.sql("CREATE TABLE t (k wibble)")
    with pytest.raises(ValueError, match="unsupported table format"):
        s.sql("CREATE TABLE t (k bigint) USING delta")
    with pytest.raises(KeyError, match="not in the catalog"):
        s.sql("DROP TABLE never_created")
    assert s.sql("DROP TABLE IF EXISTS never_created") == 0
    with pytest.raises(ValueError, match="catalog"):
        run_sql(spark, "CREATE TABLE t (k bigint)", {})
    with pytest.raises(ValueError, match="catalog"):
        run_sql(spark, "SHOW TABLES", {})
    s.sql("CREATE TABLE t (k bigint)")
    with pytest.raises(ValueError, match="already exists"):
        s.sql("CREATE TABLE t (k bigint)")
    s.sql("CREATE TABLE IF NOT EXISTS t (k bigint)")  # no-op
    with pytest.raises(ValueError, match="plain identifier"):
        TableCatalog(str(s.catalog.path)).create("../escape")


def test_drop_is_race_safe_and_name_reuses_cleanly(spark, tmp_path):
    """DROP renames the managed dir to a tombstone before releasing the
    name (a reclaiming CREATE can never be swept by the in-flight
    delete), tolerates a concurrent drop, and the freed name reuses the
    managed path cleanly."""
    cat = TableCatalog(str(tmp_path / "cat"))
    s = SqlSession(spark, cat)
    s.sql("CREATE TABLE t (k bigint)")
    s.sql("INSERT INTO t VALUES (1)")
    p = cat.resolve("t")
    assert cat.drop("t") is True
    assert not os.path.exists(p)
    assert cat.drop("t", if_exists=True) is False
    s.sql("CREATE TABLE t (k bigint)")
    s.sql("INSERT INTO t VALUES (2)")
    assert s.sql("SELECT max(k) AS m FROM t").first().m == 2
    # no tombstone residue
    parent = os.path.dirname(p)
    assert not [n for n in os.listdir(parent) if ".dropped-" in n]
