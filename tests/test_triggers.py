"""CREATE TRIGGER surface: registration, firing on the write path,
augment atomicity with LWT, cascade bounds, auth, and the
system_schema.triggers view."""

from __future__ import annotations

import pytest

from cassandra_spark.cql_session import CqlSession, CQLError


def _audit_fn(sess, table, cells):
    return [
        f"INSERT INTO audit (k, src_col, v) VALUES "
        f"('{c[0]}', '{c[2]}', '{c[4]}')"
        for c in cells
        if c[5] == "cell"
    ]


def _mk(spark):
    sess = CqlSession(spark)
    sess.execute("CREATE TABLE acct (k text PRIMARY KEY, v int)")
    sess.execute(
        "CREATE TABLE audit (k text, src_col text, v text, "
        "PRIMARY KEY (k, src_col))"
    )
    sess.register_trigger_class("AuditTrigger", _audit_fn)
    sess.execute("CREATE TRIGGER aud ON acct USING 'AuditTrigger'")
    return sess


def test_trigger_fires_on_insert_update_delete(spark):
    sess = _mk(spark)
    sess.execute("INSERT INTO acct (k, v) VALUES ('a', 1)")
    sess.execute("UPDATE acct SET v = 2 WHERE k = 'a'")
    rows = {
        (r.k, r.src_col, r.v)
        for r in sess.execute("SELECT k, src_col, v FROM audit").collect()
    }
    assert ("a", "v", "2") in rows  # LWW: the update's cell won
    # DELETE appends a tombstone, not a data cell — no audit row added
    n = sess.execute("SELECT count(*) AS n FROM audit").collect()[0].n
    sess.execute("DELETE FROM acct WHERE k = 'a'")
    assert (
        sess.execute("SELECT count(*) AS n FROM audit").collect()[0].n == n
    )


def test_drop_trigger_stops_firing(spark):
    sess = _mk(spark)
    sess.execute("INSERT INTO acct (k, v) VALUES ('a', 1)")
    sess.execute("DROP TRIGGER aud ON acct")
    sess.execute("INSERT INTO acct (k, v) VALUES ('b', 2)")
    ks = {r.k for r in sess.execute("SELECT k FROM audit").collect()}
    assert ks == {"a"}
    with pytest.raises(CQLError, match="unknown trigger"):
        sess.execute("DROP TRIGGER aud ON acct")
    sess.execute("DROP TRIGGER IF EXISTS aud ON acct")  # no-op


def test_rejected_lwt_does_not_fire(spark):
    sess = _mk(spark)
    sess.execute("INSERT INTO acct (k, v) VALUES ('a', 1)")
    before = sess.execute("SELECT count(*) AS n FROM audit").collect()[0].n
    applied = sess.execute(
        "INSERT INTO acct (k, v) VALUES ('a', 9) IF NOT EXISTS"
    )
    assert applied is False
    after = sess.execute("SELECT count(*) AS n FROM audit").collect()[0].n
    assert after == before


def test_unregistered_class_and_unknown_table_rejected(spark):
    sess = CqlSession(spark)
    sess.execute("CREATE TABLE t1 (k text PRIMARY KEY)")
    with pytest.raises(CQLError, match="not registered"):
        sess.execute("CREATE TRIGGER x ON t1 USING 'NoSuchClass'")
    sess.register_trigger_class("C", lambda s, t, c: [])
    with pytest.raises(CQLError, match="unknown table"):
        sess.execute("CREATE TRIGGER x ON missing USING 'C'")
    sess.execute("CREATE TRIGGER x ON t1 USING 'C'")
    with pytest.raises(CQLError, match="already exists"):
        sess.execute("CREATE TRIGGER x ON t1 USING 'C'")
    sess.execute("CREATE TRIGGER IF NOT EXISTS x ON t1 USING 'C'")


def test_superuser_only(spark):
    sess = _mk(spark)
    sess.execute("CREATE ROLE pleb WITH LOGIN = true")
    sess.execute("GRANT ALL ON ALL KEYSPACES TO pleb")
    sess.login("pleb")
    with pytest.raises(CQLError, match="superuser"):
        sess.execute("CREATE TRIGGER t2 ON acct USING 'AuditTrigger'")
    # but the trigger still fires for the non-superuser's writes, and
    # the augment bypasses the client's own permissions (server-side)
    sess.execute("INSERT INTO acct (k, v) VALUES ('z', 9)")
    sess.login("cassandra")
    ks = {r.k for r in sess.execute("SELECT k FROM audit").collect()}
    assert "z" in ks


def test_cascade_depth_bounded(spark):
    sess = CqlSession(spark)
    sess.execute("CREATE TABLE ping (k text PRIMARY KEY, v int)")
    sess.register_trigger_class(
        "Loop",
        lambda s, t, cells: [
            f"INSERT INTO ping (k, v) VALUES ('{cells[0][0]}x', 1)"
        ],
    )
    sess.execute("CREATE TRIGGER l ON ping USING 'Loop'")
    with pytest.raises(CQLError, match="cascade exceeds"):
        sess.execute("INSERT INTO ping (k, v) VALUES ('a', 1)")


def test_fql_replay_does_not_double_apply(spark):
    sess = _mk(spark)
    sess.enable_fql()
    sess.execute("INSERT INTO acct (k, v) VALUES ('a', 1)")
    log = list(sess._fql)
    # only the triggering statement is logged, never its augments
    assert log == ["INSERT INTO acct (k, v) VALUES ('a', 1)"]


def test_system_schema_triggers_view(spark):
    sess = _mk(spark)
    rows = sess.execute(
        "SELECT table_name, trigger_name, options "
        "FROM system_schema.triggers"
    ).collect()
    assert [(r.table_name, r.trigger_name, r.options) for r in rows] == [
        ("acct", "aud", "AuditTrigger")
    ]
