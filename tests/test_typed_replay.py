"""w14_typed_replay: pin session DDL → schema, parser output ≡ the oracle's
VALUES literal, and the typed visibility rules directly."""

from __future__ import annotations

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_dml import parse_duration, struct_json
from cassandra_spark.cql_session import CqlSession
from cassandra_spark.operators.typed_replay import (
    ASOF,
    CREATE_TABLE,
    CREATE_TYPES,
    EXPECTED_LOG,
    PROFILES_SCHEMA,
    TYPED_SCRIPT,
    UDTS,
    w14_typed_replay,
)


def test_session_registers_pinned_udts():
    sess = CqlSession(None)
    for stmt in CREATE_TYPES:
        sess.execute(stmt)
    assert sess.types == UDTS
    sess.execute(CREATE_TABLE)
    assert sess.table("profiles").schema == PROFILES_SCHEMA


def test_script_compiles_to_pinned_log():
    sess = CqlSession(None)
    for stmt in (*CREATE_TYPES, CREATE_TABLE, *TYPED_SCRIPT):
        sess.execute(stmt)
    log = sess.table("profiles")._log
    assert tuple(log) == EXPECTED_LOG
    assert max(r[6] for r in log) + 1 == ASOF


def test_replay_visible_rows(spark):
    got = {
        (r.pk, r.ck): (
            r.addr, r.loc, str(r.pay), r.ip, r.dur, r.home, r.owner,
            r.note, r.hq,
        )
        for r in w14_typed_replay(spark, "unused").collect()
    }
    assert got == {
        # addr overwritten at t3 (t5's stale TIMESTAMP 2 write loses LWW)
        ("u1", 1): (
            '{"street":"9 Elm St","zip":61820}',
            '{"c0":7,"c1":"west"}',
            "123456789012345678901234567890",
            "10.0.0.1",
            '{"months":0,"days":0,"nanos":45000000000000}',
            None,
            '{"name":"ann","addr":{"street":"2 Pine","zip":30301}}',
            "alpha",
            '{"street":"HQ Plaza","zip":10001}',
        ),
        # partial UDT keeps only zip; tuple tombstoned at t6; duration
        # overwritten to 3w at t4
        ("u1", 2): (
            '{"zip":12}',
            None,
            "-42",
            "::1",
            '{"months":0,"days":21,"nanos":0}',
            None,
            None,
            "beta",
            '{"street":"HQ Plaza","zip":10001}',
        ),
        # JSON insert; TTL'd home expired by the horizon; no static for u2
        ("u2", 1): (
            '{"street":"7 Maple","zip":2139}',
            None,
            "314",
            "192.168.0.7",
            None,
            None,
            None,
            "gamma",
            None,
        ),
        # ("u2", 2) row-tombstoned at t11
    }


def test_duration_parsing():
    assert parse_duration("12h30m") == (0, 0, 45_000_000_000_000)
    assert parse_duration("1y2mo3d") == (14, 3, 0)
    assert parse_duration("2w") == (0, 14, 0)
    assert parse_duration("-1y2d") == (-12, -2, 0)
    assert parse_duration("1s500ms") == (0, 0, 1_500_000_000)
    for bad in ("", "3", "h", "1x", "1h 2m"):
        with pytest.raises(CQLError):
            parse_duration(bad)


def test_struct_json_canonical_forms():
    t = "struct<a: int, b: string>"
    # declared order regardless of literal order; null fields omitted
    assert struct_json("{b: 'x', a: 1}", t) == '{"a":1,"b":"x"}'
    assert struct_json("{b: NULL, a: 1}", t) == '{"a":1}'
    assert struct_json("(1, 'x')", t) == '{"a":1,"b":"x"}'
    assert struct_json("NULL", t) is None
    with pytest.raises(CQLError):
        struct_json("{c: 1}", t)  # unknown field
    with pytest.raises(CQLError):
        struct_json("(1, 'x', 2)", t)  # too many tuple fields


def test_typed_rejections():
    sess = CqlSession(None)
    for stmt in CREATE_TYPES:
        sess.execute(stmt)
    with pytest.raises(CQLError):  # duplicate type
        sess.execute("CREATE TYPE address (a int)")
    sess.execute("CREATE TYPE IF NOT EXISTS address (a int)")  # no-op
    assert sess.types == UDTS
    with pytest.raises(CQLError):  # UDT as a key column
        sess.execute(
            "CREATE TABLE bad (pk frozen<address> PRIMARY KEY, v int)"
        )
    sess.execute(CREATE_TABLE)
    with pytest.raises(CQLError):  # type in use
        sess.execute("DROP TYPE address")
    table = sess.table("profiles")
    with pytest.raises(CQLError):  # IF on a struct column
        table.execute(
            "UPDATE profiles SET note = 'x' WHERE pk = 'p' AND ck = 1 "
            "IF addr = 'y'"
        )
    sess.execute("DROP TABLE profiles")
    sess.execute("DROP TYPE contact")
    sess.execute("DROP TYPE address")
    assert sess.types == {}
    with pytest.raises(CQLError):
        sess.execute("DROP TYPE address")
    sess.execute("DROP TYPE IF EXISTS address")  # no-op


def test_drop_type_guards_nested_and_collection_use():
    """DROP TYPE must see uses INSIDE other registered UDTs (containment,
    not struct-string equality); collection-of-UDT columns are rejected at
    CREATE TABLE time (the snapshot pivot cannot cast struct elements)."""
    sess = CqlSession(None)
    sess.execute("CREATE TYPE address (street text, city text)")
    sess.execute("CREATE TYPE contact (addr frozen<address>, email text)")
    # address is embedded in contact: dropping it must fail even with no
    # table using it
    with pytest.raises(CQLError, match="in use"):
        sess.execute("DROP TYPE address")
    sess.execute("DROP TYPE contact")
    sess.execute("DROP TYPE address")  # now free

    sess.execute("CREATE TYPE address (street text, city text)")
    # collection-of-UDT columns are SUPPORTED since round 11 — and a
    # type used only inside a collection element still blocks DROP TYPE
    sess.execute(
        "CREATE TABLE tl (k text PRIMARY KEY, addrs list<frozen<address>>)"
    )
    with pytest.raises(CQLError, match="in use"):
        sess.execute("DROP TYPE address")
    # frozen nested collections are supported since round 12; only the
    # non-frozen spelling is rejected (the reference's rule)
    sess.execute(
        "CREATE TABLE tn (k text PRIMARY KEY, "
        "m map<text, frozen<list<int>>>)"
    )
    with pytest.raises(CQLError, match="frozen"):
        sess.execute(
            "CREATE TABLE tn2 (k text PRIMARY KEY, m map<text, list<int>>)"
        )
    # plain scalar collections still pass
    sess.execute(
        "CREATE TABLE t (k text PRIMARY KEY, tags set<text>)"
    )
