"""Aggregate-to-MV query rewrite (round 11): a SELECT in the
additive-aggregate shape over base tables routes to a registered
materialized view's maintained state when sources, join keys, WHERE,
GROUP BY, and every select item match and the watermark is CURRENT at
every source's head (sql_dml.py::_try_mv_rewrite).

Pins: rewritten ≡ direct recompute, alias remapping, the EXPLAIN
``== Materialized View Rewrite ==`` header, and every gate that must
REFUSE — stale watermark (a stale MV can never serve stale rows),
WHERE mismatch, item mismatch, join-key mismatch — plus the leading-
comment opt-out.
"""

from __future__ import annotations

import pytest

from daas_apps_spark.sources.sql_catalog import SqlSession


@pytest.fixture()
def sess(spark, tmp_path):
    s = SqlSession(spark, str(tmp_path / "cat"))
    s.script(
        """
        CREATE TABLE t (k string, amt double);
        INSERT INTO t VALUES ('a', 1.5), ('a', 2.5), ('b', 10.0),
            ('c', 5.0);
        CREATE MATERIALIZED VIEW mv AS
            SELECT k, COUNT(*) AS n, SUM(amt) AS total, AVG(amt) AS mean,
                   MAX(amt) AS hi
            FROM t GROUP BY k
        """
    )
    return s


_Q = (
    "SELECT k, COUNT(*) AS c, SUM(amt) AS s, AVG(amt) AS m, "
    "MAX(amt) AS top FROM t GROUP BY k"
)


def _direct(s, q=_Q):
    return sorted(
        tuple(r)
        for r in s.sql(
            "WITH b AS (SELECT * FROM t) " + q.replace("FROM t", "FROM b")
        ).collect()
    )


def _explained(s, q=_Q):
    return s.sql("EXPLAIN " + q).first().plan


def test_rewrite_serves_maintained_state_with_user_aliases(sess):
    plan = _explained(sess)
    assert "Materialized View Rewrite" in plan and " mv" in plan
    df = sess.sql(_Q)
    assert df.columns == ["k", "c", "s", "m", "top"]  # user aliases win
    assert sorted(tuple(r) for r in df.collect()) == _direct(sess)


def test_stale_watermark_never_serves(sess):
    sess.sql("INSERT INTO t VALUES ('d', 7.0)")  # head > watermark
    assert "Materialized View Rewrite" not in _explained(sess)
    rows = sorted(tuple(r) for r in sess.sql(_Q).collect())
    assert ("d", 1, 7.0, 7.0, 7.0) in rows  # fresh data, direct path
    sess.sql("REFRESH MATERIALIZED VIEW mv")
    assert "Materialized View Rewrite" in _explained(sess)
    assert sorted(tuple(r) for r in sess.sql(_Q).collect()) == _direct(sess)


def test_shape_gates_refuse(sess):
    for q in (
        # WHERE the MV doesn't carry
        "SELECT k, COUNT(*) AS c FROM t WHERE amt > 2 GROUP BY k",
        # item the MV doesn't maintain
        "SELECT k, COUNT(*) AS c, MIN(amt) AS lo FROM t GROUP BY k",
        # expression mismatch
        "SELECT k, COUNT(*) AS c, SUM(amt * 2) AS s FROM t GROUP BY k",
        # different grouping
        "SELECT amt, COUNT(*) AS c FROM t GROUP BY amt",
    ):
        assert "Materialized View Rewrite" not in _explained(sess, q), q
    # the documented opt-out is any shape deviation — a WITH wrapper
    # being the canonical one (WITH never matches the rewrite regex)
    assert "Materialized View Rewrite" not in sess.sql(
        "EXPLAIN WITH b AS (SELECT * FROM t) "
        "SELECT k, COUNT(*) AS c FROM b GROUP BY k"
    ).first().plan


def test_join_mv_rewrite_with_aliased_keys(spark, tmp_path):
    s = SqlSession(spark, str(tmp_path / "cat"))
    s.script(
        """
        CREATE TABLE f (ck bigint, amt double);
        CREATE TABLE d (dk bigint, seg string);
        INSERT INTO f VALUES (1, 10.0), (2, 20.0), (1, 3.0);
        INSERT INTO d VALUES (1, 'X'), (2, 'Y');
        CREATE MATERIALIZED VIEW rev AS
            SELECT seg, COUNT(*) AS n, SUM(amt) AS total
            FROM f JOIN d ON f.ck = d.dk GROUP BY seg
        """
    )
    # same join in REVERSED leg orientation still matches (keys are
    # orientation-normalized on both sides)
    q = (
        "SELECT seg, COUNT(*) AS c, SUM(amt) AS s "
        "FROM f JOIN d ON d.dk = f.ck GROUP BY seg"
    )
    plan = s.sql("EXPLAIN " + q).first().plan
    assert "Materialized View Rewrite" in plan
    got = sorted(tuple(r) for r in s.sql(q).collect())
    want = sorted(
        tuple(r)
        for r in s.sql(
            "WITH b AS (SELECT * FROM f) SELECT seg, COUNT(*) AS c, "
            "SUM(amt) AS s FROM b JOIN d ON d.dk = b.ck GROUP BY seg"
        ).collect()
    )
    assert got == want
    # a different key pairing must NOT match
    q2 = (
        "SELECT seg, COUNT(*) AS c FROM f JOIN d ON f.amt = d.dk "
        "GROUP BY seg"
    )
    assert "Materialized View Rewrite" not in s.sql(
        "EXPLAIN " + q2
    ).first().plan
    # dim-side DML staleness gates the join MV too
    s.sql("INSERT INTO d VALUES (3, 'Z')")
    assert "Materialized View Rewrite" not in s.sql(
        "EXPLAIN " + q
    ).first().plan
