"""SQL-level multi-table transactions (A49): BEGIN/COMMIT/ROLLBACK in
SqlSession / run_sql_script, lowered to the A38 MultiTableTxn 2PC
coordinator (one per catalog directory, shared across sessions).

Pins: all-or-nothing visibility across the block's tables, ROLLBACK
invisibility, pre-transaction snapshot reads inside the block, verb
refusals inside a block, nested/unmatched bracket refusals, the
script-end abort guard, crash-between-statements recovery (presumed
abort + re-run), and cross-session coordinator sharing.
"""

from __future__ import annotations

import pytest

from daas_apps_spark.sources.sql_catalog import SqlSession
from daas_apps_spark.sources.sql_dml import run_sql_script, txn_coordinator


@pytest.fixture()
def sess(spark, tmp_path):
    s = SqlSession(spark, str(tmp_path / "cat"))
    s.script(
        "CREATE TABLE debit (k bigint, amt double);"
        "CREATE TABLE credit (k bigint, amt double)"
    )
    return s


def _counts(s):
    return (
        s.sql("SELECT count(*) AS n FROM debit").first().n,
        s.sql("SELECT count(*) AS n FROM credit").first().n,
    )


def test_commit_is_atomic_across_tables(sess):
    sess.script(
        """
        BEGIN;
        INSERT INTO debit VALUES (1, 10.0), (2, 20.0);
        INSERT INTO credit VALUES (1, -10.0), (2, -20.0);
        COMMIT
        """
    )
    assert _counts(sess) == (2, 2)
    # both writes share ONE txn id in their commit metadata
    from daas_apps_spark.sources.table_format import VersionedTable

    ids = set()
    for t in ("debit", "credit"):
        vt = VersionedTable(sess.spark, sess.catalog.resolve(t))
        with open(
            vt._log_dir() + "/" + sorted(__import__("os").listdir(vt._log_dir()))[-1]
        ) as f:
            import json

            ids.add(json.load(f)["txn"]["id"])
    assert len(ids) == 1


def test_mid_txn_reads_pre_txn_snapshot_and_rollback(sess):
    sess.sql("INSERT INTO debit VALUES (1, 1.0)")
    sess.sql("BEGIN")
    sess.sql("INSERT INTO debit VALUES (2, 2.0)")
    sess.sql("INSERT INTO credit VALUES (2, -2.0)")
    # staged writes are invisible inside the block AND to other sessions
    assert _counts(sess) == (1, 0)
    other = SqlSession(sess.spark, sess.catalog)
    assert _counts(other) == (1, 0)
    sess.sql("ROLLBACK")
    assert _counts(sess) == (1, 0)  # invisible forever (presumed abort)
    # the consumed version slot does not disturb later commits
    sess.sql("INSERT INTO debit VALUES (3, 3.0)")
    assert _counts(sess) == (2, 0)


def test_refusals(sess):
    sess.sql("INSERT INTO debit VALUES (1, 1.0)")
    sess.sql("BEGIN")
    for stmt in (
        "CREATE TABLE t2 (k bigint)",
        "OPTIMIZE debit",
        "VACUUM debit",
        "COPY INTO debit FROM '/nonexistent'",
    ):
        with pytest.raises(ValueError, match="BEGIN"):
            sess.sql(stmt)
    with pytest.raises(ValueError, match="nested BEGIN"):
        sess.sql("BEGIN")
    sess.sql("ROLLBACK")
    with pytest.raises(ValueError, match="without an open"):
        sess.sql("COMMIT")
    with pytest.raises(ValueError, match="without an open"):
        sess.sql("ROLLBACK")


def test_script_end_inside_block_aborts(spark, sess):
    with pytest.raises(ValueError, match="ended inside an open"):
        run_sql_script(
            spark,
            "BEGIN; INSERT INTO debit VALUES (9, 9.0)",
            {},
            catalog=sess.catalog,
        )
    assert _counts(sess) == (0, 0)  # the half-script stayed invisible


def test_crash_between_statements_presumed_abort(spark, sess):
    """The a38 fault shape at the SQL layer: a session stages one of
    two inserts and dies. The staged half is invisible; coordinator
    restart sweeps it aborted; the re-run commits cleanly."""
    dead = SqlSession(spark, sess.catalog)
    dead.sql("BEGIN")
    dead.sql("INSERT INTO debit VALUES (1, 10.0)")
    del dead  # crash: no COMMIT ever arrives
    assert _counts(sess) == (0, 0)
    swept = txn_coordinator(sess.catalog).abort_abandoned()
    assert len(swept) == 1
    # re-run the work under a fresh txn — the standard recovery
    sess.script(
        "BEGIN; INSERT INTO debit VALUES (1, 10.0);"
        "INSERT INTO credit VALUES (1, -10.0); COMMIT"
    )
    assert _counts(sess) == (1, 1)


def test_txn_spans_sql_calls_and_scripts(sess):
    sess.sql("BEGIN")
    sess.script("INSERT INTO debit VALUES (1, 1.0)")
    sess.sql("INSERT INTO credit VALUES (1, -1.0)")
    assert _counts(sess) == (0, 0)
    sess.sql("COMMIT")
    assert _counts(sess) == (1, 1)


def test_gc_folds_sql_txverdicts(sess):
    """The coordinator the SQL layer uses is the same a38 object: gc
    folds resolved verdicts and visibility survives the fold."""
    sess.script(
        "BEGIN; INSERT INTO debit VALUES (1, 1.0); COMMIT;"
        "BEGIN; INSERT INTO debit VALUES (2, 2.0); ROLLBACK"
    )
    coord = txn_coordinator(sess.catalog)
    out = coord.gc()
    assert out["folded"] == 2
    assert _counts(sess) == (1, 0)


def test_delete_update_truncate_stage_in_txn(sess):
    """Round-10 extension: DELETE / UPDATE (COW and MOR) and TRUNCATE
    stage under the txn exactly like INSERT — invisible until COMMIT,
    gone forever on ROLLBACK."""
    sess.script(
        "INSERT INTO debit VALUES (1, 10.0), (2, 20.0), (3, 30.0);"
        "INSERT INTO credit VALUES (1, -10.0), (2, -20.0)"
    )
    # rollback twin: a staged MOR delete + COW update vanish
    sess.script(
        "BEGIN;"
        "/*+ MOR */ DELETE FROM debit WHERE k = 1;"
        "UPDATE credit SET amt = 0 WHERE k = 2;"
        "ROLLBACK"
    )
    assert _counts(sess) == (3, 2)
    assert sess.sql(
        "SELECT amt FROM credit WHERE k = 2"
    ).first().amt == -20.0
    # commit twin: delete one table, update the other, atomically
    sess.script(
        "BEGIN;"
        "/*+ MOR */ DELETE FROM debit WHERE k = 1;"
        "UPDATE credit SET amt = amt * 2 WHERE k = 2;"
        "COMMIT"
    )
    assert _counts(sess) == (2, 2)
    assert sess.sql(
        "SELECT amt FROM credit WHERE k = 2"
    ).first().amt == -40.0
    # truncate one side + reload it in one atomic swap
    sess.script(
        "BEGIN;"
        "TRUNCATE TABLE credit;"
        "INSERT INTO debit VALUES (9, 9.0);"
        "COMMIT"
    )
    assert _counts(sess) == (3, 0)


def test_same_txn_rewrite_guard(sess):
    """Repeated blind INSERTs on one table inside a txn are
    order-independent and allowed; any combination involving a REWRITE
    (DELETE/UPDATE/TRUNCATE/OVERWRITE) refuses — each statement plans
    against the pre-transaction snapshot, so two rewriting plans would
    stage overlapping removes and corrupt the visibility flip."""
    from daas_apps_spark.sources.table_format import CommitConflictError

    sess.sql("INSERT INTO debit VALUES (1, 1.0)")
    sess.sql("BEGIN")
    sess.sql("INSERT INTO debit VALUES (2, 2.0)")
    sess.sql("INSERT INTO debit VALUES (3, 3.0)")  # append+append: fine
    with pytest.raises(CommitConflictError, match="REWRITE"):
        sess.sql("DELETE FROM debit WHERE k = 1")  # rewrite after write
    sess.sql("COMMIT")
    assert _counts(sess)[0] == 3
    sess.sql("BEGIN")
    sess.sql("UPDATE debit SET amt = 0 WHERE k = 1")  # rewrite first
    with pytest.raises(CommitConflictError, match="REWRITE"):
        sess.sql("INSERT INTO debit VALUES (4, 4.0)")  # write after rewrite
    sess.sql("ROLLBACK")
    assert sess.sql(
        "SELECT amt FROM debit WHERE k = 1"
    ).first().amt == 1.0


def test_merge_stages_in_txn(sess):
    """MERGE (both the upsert fast path and the conditional grammar)
    stages under the txn; it is txn-EXCLUSIVE on its table — even its
    pure-insert path planned against the pre-txn snapshot, so it
    cannot share the table with another same-txn write."""
    from daas_apps_spark.sources.table_format import CommitConflictError

    sess.sql("INSERT INTO debit VALUES (1, 1.0), (2, 2.0)")
    sess.script(
        "BEGIN;"
        "MERGE INTO debit AS t USING (SELECT 1 AS k, 10.0 AS amt "
        "UNION ALL SELECT 3, 30.0) AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt "
        "WHEN NOT MATCHED THEN INSERT *;"
        "INSERT INTO credit VALUES (1, -10.0);"
        "ROLLBACK"
    )
    assert _counts(sess) == (2, 0)
    assert sess.sql("SELECT amt FROM debit WHERE k = 1").first().amt == 1.0
    sess.script(
        "BEGIN;"
        "MERGE INTO debit AS t USING (SELECT 1 AS k, 10.0 AS amt "
        "UNION ALL SELECT 3, 30.0) AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt "
        "WHEN NOT MATCHED THEN INSERT *;"
        "INSERT INTO credit VALUES (1, -10.0);"
        "COMMIT"
    )
    assert _counts(sess) == (3, 1)
    assert sess.sql("SELECT amt FROM debit WHERE k = 1").first().amt == 10.0
    # exclusivity: merge + any other write on the SAME table refuses
    sess.sql("BEGIN")
    sess.sql(
        "MERGE INTO debit AS t USING (SELECT 9 AS k, 9.0 AS amt) AS s "
        "ON t.k = s.k WHEN NOT MATCHED THEN INSERT *"
    )
    with pytest.raises(CommitConflictError, match="REWRITE"):
        sess.sql("INSERT INTO debit VALUES (8, 8.0)")
    sess.sql("ROLLBACK")


def test_script_error_aborts_script_opened_txn(sess):
    """A statement raising mid-script must abort the txn the SCRIPT
    opened (a pending txn blocks every future commit on its staged
    tables); a txn opened BEFORE the script belongs to the caller and
    survives the failure for an explicit ROLLBACK."""
    with pytest.raises(Exception):
        sess.script(
            "BEGIN; INSERT INTO debit VALUES (1, 1.0);"
            "SELECT nope FROM debit; COMMIT"
        )
    assert sess._txn is None  # aborted, not left pending
    # the tables are NOT wedged: a fresh block commits immediately
    sess.script(
        "BEGIN; INSERT INTO debit VALUES (2, 2.0); COMMIT"
    )
    assert _counts(sess) == (1, 0)
    # pre-existing txn: the script failure leaves it open for the caller
    sess.sql("BEGIN")
    with pytest.raises(Exception):
        sess.script("INSERT INTO credit VALUES (3, 3.0); SELECT nope FROM credit")
    assert sess._txn is not None
    sess.sql("ROLLBACK")
    assert _counts(sess) == (1, 0)
