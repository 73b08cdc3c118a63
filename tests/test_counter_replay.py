"""Counter-table DML (cql_dml counter=True): parser pinning, reconcile
semantics, and rejection rules."""

from __future__ import annotations

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_dml import CqlTable, TableSchema
from cassandra_spark.operators.counter_replay import (
    COUNTER_SCRIPT,
    EXPECTED_LOG,
    HITS_SCHEMA,
    w10_counter_replay,
)


def test_script_compiles_to_pinned_log():
    # parsing is driver-side only — no Spark session needed
    table = CqlTable(None, HITS_SCHEMA)
    for stmt in COUNTER_SCRIPT:
        table.execute(stmt)
    assert tuple(table._log) == EXPECTED_LOG


def test_counter_visible_state(spark):
    got = {
        (r.pk, r.ck): (r.views, r.clicks)
        for r in w10_counter_replay(spark, "unused").collect()
    }
    assert got == {
        ("a", "1"): (11, 1),   # views: only the post-delete +11 survives
        ("b", "1"): (None, 9),  # partition tomb wiped -2; +9 resurrects
        ("c", "1"): (2, None),  # batch of two +1s at one shared timestamp
    }
    # a/2 has no cell newer than its row tombstone → row invisible


def test_counter_rejections():
    table = CqlTable(None, HITS_SCHEMA)
    for bad in [
        "INSERT INTO hits (pk, ck, views) VALUES ('a', '1', 1)",
        "UPDATE hits SET views = 5 WHERE pk = 'a' AND ck = '1'",
        "UPDATE hits SET views = clicks + 1 WHERE pk = 'a' AND ck = '1'",
        "UPDATE hits USING TIMESTAMP 9 SET views = views + 1 "
        "WHERE pk = 'a' AND ck = '1'",
        "UPDATE hits SET nope = nope + 1 WHERE pk = 'a' AND ck = '1'",
    ]:
        with pytest.raises(CQLError):
            table.execute(bad)


def test_non_counter_table_rejects_counter_form():
    plain = CqlTable(None, TableSchema("t", "pk", "ck", {"v": "int"}))
    with pytest.raises(CQLError):
        plain.execute("UPDATE t SET v = v + 1 WHERE pk = 'a' AND ck = '1'")


def test_counter_batch_kind_gate(spark, tmp_path):
    """Counter mutations require BEGIN COUNTER BATCH; a COUNTER batch
    may hold nothing else — both directions, single- and multi-table."""
    import pytest as _pytest

    from cassandra_spark.cql import CQLError
    from cassandra_spark.cql_session import CqlSession

    s = CqlSession(spark, spill_dir=str(tmp_path))
    s.execute("CREATE TABLE c (k text PRIMARY KEY, n counter)")
    s.execute("CREATE TABLE p (k text PRIMARY KEY, v int)")
    with _pytest.raises(CQLError, match="counter statement in a logged"):
        s.execute(
            "BEGIN BATCH UPDATE c SET n = n + 1 WHERE k = 'a'; APPLY BATCH"
        )
    with _pytest.raises(CQLError, match="counter statement in a unlogged"):
        s.execute(
            "BEGIN UNLOGGED BATCH UPDATE c SET n = n + 1 WHERE k = 'a'; "
            "APPLY BATCH"
        )
    with _pytest.raises(CQLError, match="non-counter statement"):
        s.execute(
            "BEGIN COUNTER BATCH INSERT INTO p (k, v) VALUES ('a', 1); "
            "APPLY BATCH"
        )
    with _pytest.raises(CQLError):  # mixed multi-table, any kind
        s.execute(
            "BEGIN COUNTER BATCH UPDATE c SET n = n + 1 WHERE k = 'a'; "
            "INSERT INTO p (k, v) VALUES ('a', 1); APPLY BATCH"
        )
    # the faithful spellings work, and the gate left nothing behind
    s.execute(
        "BEGIN COUNTER BATCH UPDATE c SET n = n + 1 WHERE k = 'a'; "
        "UPDATE c SET n = n + 2 WHERE k = 'a'; APPLY BATCH"
    )
    assert {r.k: r.n for r in s.execute(
        "SELECT k, n FROM c").collect()} == {"a": 3}
    s.execute(
        "BEGIN BATCH INSERT INTO p (k, v) VALUES ('b', 2); APPLY BATCH"
    )
    assert s.execute("SELECT k FROM p").count() == 1
