"""Dropped-column timestamp semantics (round 13; `[C*
schema/DroppedColumn — CASSANDRA-3919 lineage; ALTER ... DROP ... USING
TIMESTAMP — CASSANDRA-7784, unverified]`): a re-added column name never
resurrects pre-drop cells; a future-stamped cell survives the drop."""

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_session import CqlSession


def _sess(spark):
    s = CqlSession(spark, None)
    s.execute(
        "CREATE TABLE dc (pk int, ck int, v int, w text, "
        "st int STATIC, PRIMARY KEY (pk, ck))"
    )
    return s


def test_drop_purges_and_readd_does_not_resurrect(spark):
    s = _sess(spark)
    s.execute("INSERT INTO dc (pk, ck, v, w) VALUES (1, 1, 10, 'a')")
    s.execute("INSERT INTO dc (pk, ck, v, w) VALUES (1, 2, 20, 'b')")
    s.execute("ALTER TABLE dc DROP v")
    assert "v" not in {
        f.name for f in s.execute("SELECT * FROM dc").schema.fields
    }
    s.execute("ALTER TABLE dc ADD v int")
    got = {(r.ck, r.v) for r in s.execute("SELECT ck, v FROM dc").collect()}
    assert got == {(1, None), (2, None)}
    # fresh writes are visible; writetime starts over
    s.execute("INSERT INTO dc (pk, ck, v) VALUES (1, 1, 99)")
    got = {(r.ck, r.v) for r in s.execute("SELECT ck, v FROM dc").collect()}
    assert got == {(1, 99), (2, None)}


def test_future_stamped_cell_survives_drop(spark):
    s = _sess(spark)
    s.execute(
        "INSERT INTO dc (pk, ck, v) VALUES (1, 1, 30) "
        "USING TIMESTAMP 999999"
    )
    s.execute("INSERT INTO dc (pk, ck, v) VALUES (1, 2, 40)")
    s.execute("ALTER TABLE dc DROP v")
    s.execute("ALTER TABLE dc ADD v int")
    got = {(r.ck, r.v) for r in s.execute("SELECT ck, v FROM dc").collect()}
    assert got == {(1, 30), (2, None)}


def test_late_write_with_predrop_timestamp_is_shadowed(spark):
    s = _sess(spark)
    s.execute("INSERT INTO dc (pk, ck, v) VALUES (1, 1, 10)")
    s.execute("ALTER TABLE dc DROP v")
    s.execute("ALTER TABLE dc ADD v int")
    s.execute("INSERT INTO dc (pk, ck, v) VALUES (1, 1, 77) USING TIMESTAMP 1")
    got = s.execute("SELECT ck, v FROM dc WHERE pk = 1").collect()
    assert {(r.ck, r.v) for r in got} == {(1, None)}
    # writetime of a shadowed cell is NULL (the cell does not exist)
    wt = s.execute("SELECT writetime(v) AS wt FROM dc WHERE pk = 1").collect()
    assert [r.wt for r in wt] == [None]


def test_readd_type_and_kind_validation(spark):
    s = _sess(spark)
    s.execute("INSERT INTO dc (pk, ck, v) VALUES (1, 1, 10)")
    s.execute("ALTER TABLE dc DROP v")
    with pytest.raises(CQLError, match="incompatible with previous type"):
        s.execute("ALTER TABLE dc ADD v text")
    with pytest.raises(CQLError, match="different kind"):
        s.execute("ALTER TABLE dc ADD v int STATIC")
    s.execute("ALTER TABLE dc DROP st")
    with pytest.raises(CQLError, match="different kind"):
        s.execute("ALTER TABLE dc ADD st int")
    s.execute("ALTER TABLE dc ADD st int STATIC")
    s.execute("ALTER TABLE dc ADD v int")


def test_drop_using_timestamp_pinned_workload(spark):
    """A pinned wall-µs workload passes its own drop time: cells above
    it survive, at-or-below are purged, and the shadow binds to it."""
    s = _sess(spark)
    s.execute(
        "INSERT INTO dc (pk, ck, v) VALUES (1, 1, 10) "
        "USING TIMESTAMP 1000000"
    )
    s.execute(
        "INSERT INTO dc (pk, ck, v) VALUES (1, 2, 20) "
        "USING TIMESTAMP 3000000"
    )
    s.execute("ALTER TABLE dc DROP v USING TIMESTAMP 2000000")
    s.execute("ALTER TABLE dc ADD v int")
    got = {(r.ck, r.v) for r in s.execute("SELECT ck, v FROM dc").collect()}
    assert got == {(1, None), (2, 20)}
    s.execute(
        "INSERT INTO dc (pk, ck, v) VALUES (1, 1, 11) "
        "USING TIMESTAMP 2000000"
    )  # == drop time: still shadowed (rule is wt > drop time)
    s.execute(
        "INSERT INTO dc (pk, ck, v) VALUES (1, 1, 12) "
        "USING TIMESTAMP 2000001"
    )
    got = {(r.ck, r.v) for r in s.execute("SELECT ck, v FROM dc").collect()}
    assert got == {(1, 12), (2, 20)}


def test_flushed_segments_respect_the_horizon(spark):
    s = _sess(spark)
    s.execute("INSERT INTO dc (pk, ck, v) VALUES (1, 1, 10)")
    s.execute(
        "INSERT INTO dc (pk, ck, v) VALUES (1, 2, 50) "
        "USING TIMESTAMP 888888"
    )
    t = s.table("dc")
    t.flush()
    assert t._segments, "flush produced no segment"
    s.execute("ALTER TABLE dc DROP v")
    s.execute("ALTER TABLE dc ADD v int")
    got = {(r.ck, r.v) for r in s.execute("SELECT ck, v FROM dc").collect()}
    assert got == {(1, None), (2, 50)}


def test_redrop_advances_the_horizon(spark):
    s = _sess(spark)
    s.execute("INSERT INTO dc (pk, ck, v) VALUES (1, 1, 10)")
    s.execute("ALTER TABLE dc DROP v")
    s.execute("ALTER TABLE dc ADD v int")
    s.execute("INSERT INTO dc (pk, ck, v) VALUES (1, 1, 20)")
    s.execute("ALTER TABLE dc DROP v")  # second drop, later clock
    s.execute("ALTER TABLE dc ADD v int")
    got = s.execute("SELECT ck, v FROM dc").collect()
    assert {(r.ck, r.v) for r in got} == {(1, None)}


def test_dropped_columns_virtual_table(spark):
    s = _sess(spark)
    s.execute("INSERT INTO dc (pk, ck, v) VALUES (1, 1, 10)")
    s.execute("ALTER TABLE dc DROP v")
    s.execute("ALTER TABLE dc DROP w")
    rows = s.execute(
        "SELECT table_name, column_name, type, kind "
        "FROM system_schema.dropped_columns"
    ).collect()
    assert {(r.table_name, r.column_name, r.type, r.kind) for r in rows} == {
        ("dc", "v", "int", "regular"),
        ("dc", "w", "string", "regular"),
    }


def test_snapshot_restore_preserves_the_registry(spark, tmp_path):
    s = _sess(spark)
    s.execute("INSERT INTO dc (pk, ck, v) VALUES (1, 1, 10)")
    s.execute("ALTER TABLE dc DROP v")
    s.snapshot_keyspace(str(tmp_path / "snap"))
    s2 = CqlSession(spark, None)
    s2.restore_keyspace(str(tmp_path / "snap"))
    with pytest.raises(CQLError, match="incompatible with previous type"):
        s2.execute("ALTER TABLE dc ADD v text")
    s2.execute("ALTER TABLE dc ADD v int")
    s2.execute(
        "INSERT INTO dc (pk, ck, v) VALUES (1, 1, 77) USING TIMESTAMP 1"
    )
    got = s2.execute("SELECT ck, v FROM dc").collect()
    assert {(r.ck, r.v) for r in got} == {(1, None)}
