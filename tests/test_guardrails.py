"""Guardrails (the Cassandra 4.1 framework): warn -> client warning,
fail -> aborted operation, per guardrail — items_per_collection (write),
partition_keys_in_select (read), columns_per_table (DDL),
tombstones_per_read (the TombstoneOverwhelmingException analogue on the
per-partition read)."""

from __future__ import annotations

import pytest

from cassandra_spark.cql_session import CqlSession, CQLError


@pytest.fixture()
def sess(spark, tmp_path):
    s = CqlSession(spark, spill_dir=str(tmp_path))
    s.execute("CREATE TABLE g (k text PRIMARY KEY, tags set<text>, v int)")
    return s


def test_unknown_guardrail_rejected(sess):
    with pytest.raises(CQLError, match="unknown guardrail"):
        sess.set_guardrail("nope", fail=1)
    with pytest.raises(CQLError, match="warn threshold must be <="):
        sess.set_guardrail("items_per_collection", warn=9, fail=3)


def test_items_per_collection(sess):
    sess.set_guardrail("items_per_collection", warn=2, fail=4)
    sess.execute("INSERT INTO g (k, tags) VALUES ('a', {'x', 'y'})")
    assert sess.pop_warnings() == []
    sess.execute("INSERT INTO g (k, tags) VALUES ('b', {'1', '2', '3'})")
    w = sess.pop_warnings()
    assert len(w) == 1 and "items_per_collection" in w[0]
    with pytest.raises(CQLError, match="items_per_collection"):
        sess.execute(
            "INSERT INTO g (k, tags) VALUES "
            "('c', {'1', '2', '3', '4', '5'})"
        )
    # the failed write left nothing behind
    assert sess.execute("SELECT k FROM g WHERE k = 'c'").count() == 0
    # both None removes the guardrail
    sess.set_guardrail("items_per_collection")
    sess.execute(
        "INSERT INTO g (k, tags) VALUES ('c', {'1', '2', '3', '4', '5'})"
    )


def test_partition_keys_in_select(sess):
    for i in range(6):
        sess.execute(f"INSERT INTO g (k, v) VALUES ('k{i}', {i})")
    sess.set_guardrail("partition_keys_in_select", warn=2, fail=4)
    assert sess.execute(
        "SELECT k FROM g WHERE k IN ('k0', 'k1')"
    ).count() == 2
    assert sess.pop_warnings() == []
    assert sess.execute(
        "SELECT k FROM g WHERE k IN ('k0', 'k1', 'k2')"
    ).count() == 3
    assert any("partition_keys_in_select" in w for w in sess.pop_warnings())
    with pytest.raises(CQLError, match="partition_keys_in_select"):
        sess.execute(
            "SELECT k FROM g WHERE k IN ('k0','k1','k2','k3','k4')"
        )
    # commas inside string literals never miscount (quote-masked)
    assert sess.execute(
        "SELECT k FROM g WHERE k IN ('a,b,c,d,e', 'k1')"
    ).count() == 1


def test_columns_per_table(sess):
    sess.set_guardrail("columns_per_table", fail=3)
    with pytest.raises(CQLError, match="columns_per_table"):
        sess.execute(
            "CREATE TABLE wide (k text PRIMARY KEY, a int, b int, c int)"
        )
    assert "wide" not in sess.tables  # nothing half-registered
    sess.execute("CREATE TABLE slim (k text PRIMARY KEY, a int)")


def test_tombstones_per_read(sess):
    # a delete-churned partition: many row tombstones under one pk
    sess.execute(
        "CREATE TABLE churn (k text, c text, v int, PRIMARY KEY (k, c))"
    )
    for i in range(12):
        sess.execute(f"INSERT INTO churn (k, c, v) VALUES ('hot', 'c{i}', {i})")
        if i % 2 == 0:
            sess.execute(f"DELETE FROM churn WHERE k = 'hot' AND c = 'c{i}'")
    sess.set_guardrail("tombstones_per_read", warn=3, fail=100)
    # the LWT read phase drives the per-partition reconcile
    applied = sess.execute(
        "INSERT INTO churn (k, c, v) VALUES ('hot', 'c1', 0) IF NOT EXISTS"
    )
    assert applied is False
    assert any("tombstones_per_read" in w for w in sess.pop_warnings())
    sess.set_guardrail("tombstones_per_read", fail=3)
    with pytest.raises(CQLError, match="tombstones_per_read"):
        sess.execute(
            "INSERT INTO churn (k, c, v) VALUES ('hot', 'c1', 0) "
            "IF NOT EXISTS"
        )


def test_failed_statement_is_atomic(sess):
    """Pre-existing hazard fixed alongside guardrails: a statement that
    errors mid-application (here, a wrong collection literal AFTER the
    row marker was emitted) must leave NOTHING behind — the reference
    applies a statement's mutation atomically or not at all."""
    with pytest.raises(CQLError, match="needs a"):
        sess.execute("INSERT INTO g (k, tags, v) VALUES ('z', ['w'], 5)")
    assert sess.execute("SELECT k FROM g WHERE k = 'z'").count() == 0
    assert len(sess.table("g")._log) == 0
