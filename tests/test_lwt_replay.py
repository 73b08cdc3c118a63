"""LWT (conditional DML) in cql_dml: applied-flag sequence, log pinning,
visible-state parity, and rejection rules."""

from __future__ import annotations

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_dml import CqlTable, TableSchema
from cassandra_spark.operators.dml_replay import KV_SCHEMA
from cassandra_spark.operators.lwt_replay import (
    EXPECTED_LOG,
    LWT_SCRIPT,
    w12_lwt_replay,
)

COUNTER_SCHEMA = TableSchema(
    name="hits", partition_key="pk", clustering="ck",
    regular={"views": "long"}, counter=True,
)


def test_script_applied_flags_and_pinned_log():
    # parsing + condition reads are driver-side only — no Spark needed
    table = CqlTable(None, KV_SCHEMA)
    got_flags = [table.execute(stmt) for stmt, _ in LWT_SCRIPT]
    assert got_flags == [exp for _, exp in LWT_SCRIPT]
    assert tuple(table._log) == EXPECTED_LOG


def test_visible_state(spark):
    got = {
        (r.pk, r.ck): (r.v, r.s)
        for r in w12_lwt_replay(spark, "unused").collect()
    }
    assert got == {
        ("a", "1"): (21, None),     # s deleted by the t15 conditional
        ("a", "2"): (None, "batch"),  # written by the applied t12 batch
        ("b", "1"): (30, None),     # s shadowed by the t8 row tombstone
    }
    # c/1: its only cell TTL-expired → row invisible
    # a/3: only in the REJECTED t13 batch → never written


def test_condition_reads_are_isolated_per_key():
    # a failing condition must not consume the value another key sees
    table = CqlTable(None, KV_SCHEMA)
    table.execute("INSERT INTO kv (pk, ck, v) VALUES ('x', '1', 5)")
    assert table.execute(
        "UPDATE kv SET v = 6 WHERE pk = 'y' AND ck = '1' IF v = 5"
    ) is False
    assert table.execute(
        "UPDATE kv SET v = 6 WHERE pk = 'x' AND ck = '1' IF v = 5"
    ) is True


def test_null_and_ordering_pinning():
    table = CqlTable(None, KV_SCHEMA)
    table.execute("INSERT INTO kv (pk, ck, v) VALUES ('x', '1', 5)")
    # unset cell: = NULL true, != NULL false, ordering vs unset false
    assert table.execute(
        "UPDATE kv SET s = 'a' WHERE pk = 'x' AND ck = '1' IF s = NULL"
    ) is True
    assert table.execute(
        "UPDATE kv SET s = 'b' WHERE pk = 'x' AND ck = '1' IF s = NULL"
    ) is False  # s was just set
    assert table.execute(
        "UPDATE kv SET v = 9 WHERE pk = 'z' AND ck = '1' IF v > 1"
    ) is False  # missing row: ordering never satisfied
    # conjunction: both legs must hold
    assert table.execute(
        "UPDATE kv SET v = 6 WHERE pk = 'x' AND ck = '1' "
        "IF v = 5 AND s = 'a'"
    ) is True


def test_lwt_rejections():
    table = CqlTable(None, KV_SCHEMA)
    with pytest.raises(CQLError):  # custom timestamp with a condition
        table.execute(
            "UPDATE kv USING TIMESTAMP 5 SET v = 1 "
            "WHERE pk = 'a' AND ck = '1' IF v = 0"
        )
    with pytest.raises(CQLError):  # condition without the full primary key
        table.execute("DELETE FROM kv WHERE pk = 'a' IF EXISTS")
    with pytest.raises(CQLError):  # multi-partition conditional batch
        table.execute(
            "BEGIN BATCH "
            "UPDATE kv SET v = 1 WHERE pk = 'a' AND ck = '1' IF v = 0; "
            "UPDATE kv SET v = 1 WHERE pk = 'b' AND ck = '1'; "
            "APPLY BATCH"
        )
    counter = CqlTable(None, COUNTER_SCHEMA)
    with pytest.raises(CQLError):  # LWT on a counter table
        counter.execute(
            "UPDATE hits SET views = views + 1 "
            "WHERE pk = 'a' AND ck = '1' IF EXISTS"
        )


def test_failed_batch_leaves_no_trace():
    table = CqlTable(None, KV_SCHEMA)
    table.execute("INSERT INTO kv (pk, ck, v) VALUES ('a', '1', 1)")
    n = len(table._log)
    assert table.execute(
        "BEGIN BATCH "
        "UPDATE kv SET v = 2 WHERE pk = 'a' AND ck = '1' IF v = 99; "
        "INSERT INTO kv (pk, ck, v) VALUES ('a', '2', 3); "
        "APPLY BATCH"
    ) is False
    assert len(table._log) == n
