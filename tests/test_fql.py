"""Full-query logging (w20 surface): record/replay fidelity, prepared
binding, failed-statement exclusion, log queryability."""

from __future__ import annotations

import pytest

from cassandra_spark.cql_session import CqlSession
from cassandra_spark.cql_dml import CQLError


def _workload(sess: CqlSession) -> None:
    sess.execute(
        "CREATE TABLE msgs (room text, seq int, author text, body text, "
        "tags set<text>, PRIMARY KEY (room, seq))"
    )
    sess.execute(
        "INSERT INTO msgs (room, seq, author, body, tags) "
        "VALUES ('r1', 1, 'ann', 'hi', {'a', 'b'})"
    )
    sess.execute(
        "UPDATE msgs SET tags = tags + {'c'} WHERE room = 'r1' AND seq = 1"
    )
    ps = sess.prepare(
        "INSERT INTO msgs (room, seq, author, body) VALUES (?, ?, ?, ?)"
    )
    ps.execute("r1", 2, "bob", "it's quoted")
    ps.execute("r2", 1, "cid", "yo")
    sess.execute("DELETE body FROM msgs WHERE room = 'r1' AND seq = 1")
    # LWT: one applied, one not
    sess.execute(
        "INSERT INTO msgs (room, seq, author) VALUES ('r2', 1, 'dup') "
        "IF NOT EXISTS"
    )
    sess.execute(
        "UPDATE msgs SET author = 'eve' WHERE room = 'r2' AND seq = 1 "
        "IF author = 'cid'"
    )
    sess.execute(
        "BEGIN BATCH "
        "INSERT INTO msgs (room, seq, author) VALUES ('r3', 1, 'fay'); "
        "DELETE FROM msgs WHERE room = 'r1' AND seq = 2; "
        "APPLY BATCH"
    )


def _snap(sess: CqlSession):
    return sorted(
        tuple(r) for r in sess.table("msgs").snapshot().collect()
    )


def test_fql_replay_reproduces_state(spark):
    a = CqlSession(spark)
    a.enable_fql()
    _workload(a)
    b = CqlSession(spark)
    n = a.fql_replay(b)
    assert n == a.fql_log().count()
    assert _snap(a) == _snap(b)


def test_fql_logs_bound_values_and_order(spark):
    a = CqlSession(spark)
    a.enable_fql()
    _workload(a)
    rows = a.fql_log().orderBy("seq").collect()
    stmts = [r.stmt for r in rows]
    assert stmts[0].startswith("CREATE TABLE msgs")
    # prepared executions appear with values bound (escaped quote intact)
    assert any("'it''s quoted'" in s or "it's quoted" in s for s in stmts)
    assert [r.seq for r in rows] == list(range(1, len(rows) + 1))


def test_fql_excludes_failed_statements(spark):
    a = CqlSession(spark)
    a.enable_fql()
    a.execute("CREATE TABLE t (pk text, v int, PRIMARY KEY (pk))")
    before = len(a._fql)
    with pytest.raises(CQLError):
        a.execute("INSERT INTO nope (pk, v) VALUES ('x', 1)")
    assert len(a._fql) == before
    # and the replay of a log containing only valid statements succeeds
    b = CqlSession(spark)
    a.fql_replay(b)
    assert "session.t" in b.tables


def test_fql_disabled_by_default(spark):
    a = CqlSession(spark)
    a.execute("CREATE TABLE t2 (pk text, v int, PRIMARY KEY (pk))")
    assert a._fql is None
    assert a.fql_log().count() == 0
