"""Non-frozen UDT columns (round 13; `[C* cql3/CQL3Type — bare UDT
spellings are multi-cell since 3.6, unverified]`): each field its own
cell, per-field LWW, `SET u.f = v` / `DELETE u.f`, replace semantics on
full assignment, null when no field cell is live."""

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_session import CqlSession


def _sess(spark):
    s = CqlSession(spark, None)
    s.execute("CREATE TYPE addr (street text, zip int)")
    s.execute(
        "CREATE TABLE ppl (id bigint PRIMARY KEY, home addr, "
        "fr frozen<addr>)"
    )
    return s


def test_bare_udt_is_multicell_frozen_is_not(spark):
    s = _sess(spark)
    assert s.table("ppl").schema.nonfrozen == {"home"}
    s.execute("ALTER TABLE ppl ADD office addr")
    s.execute("ALTER TABLE ppl ADD office2 frozen<addr>")
    assert s.table("ppl").schema.nonfrozen == {"home", "office"}


def test_field_update_keeps_sibling_fields(spark):
    s = _sess(spark)
    s.execute("INSERT INTO ppl (id, home) VALUES (1, {street: 'a', zip: 7})")
    s.execute("UPDATE ppl SET home.street = 'b' WHERE id = 1")
    got = s.execute("SELECT home FROM ppl WHERE id = 1").collect()[0].home
    assert (got.street, got.zip) == ("b", 7)
    # the frozen twin rejects per-field writes
    with pytest.raises(CQLError, match="non-frozen"):
        s.execute("UPDATE ppl SET fr.street = 'x' WHERE id = 1")
    with pytest.raises(CQLError, match="non-frozen"):
        s.execute("DELETE fr.street FROM ppl WHERE id = 1")
    with pytest.raises(CQLError, match="unknown field"):
        s.execute("UPDATE ppl SET home.nope = 'x' WHERE id = 1")


def test_full_assignment_replaces(spark):
    s = _sess(spark)
    s.execute("INSERT INTO ppl (id, home) VALUES (1, {street: 'a', zip: 7})")
    s.execute("UPDATE ppl SET home = {street: 'z'} WHERE id = 1")
    got = s.execute("SELECT home FROM ppl WHERE id = 1").collect()[0].home
    assert (got.street, got.zip) == ("z", None)  # zip replaced away
    # null assignment tombstones the whole column
    s.execute("UPDATE ppl SET home = null WHERE id = 1")
    assert s.execute(
        "SELECT home FROM ppl WHERE id = 1"
    ).collect()[0].home is None


def test_all_fields_deleted_reads_null(spark):
    s = _sess(spark)
    s.execute("INSERT INTO ppl (id, home) VALUES (1, {street: 'a', zip: 7})")
    s.execute("DELETE home.street FROM ppl WHERE id = 1")
    got = s.execute("SELECT home FROM ppl WHERE id = 1").collect()[0].home
    assert (got.street, got.zip) == (None, 7)
    s.execute("DELETE home.zip FROM ppl WHERE id = 1")
    assert s.execute(
        "SELECT home FROM ppl WHERE id = 1"
    ).collect()[0].home is None


def test_per_field_lww_and_replace_shadow(spark):
    s = _sess(spark)
    s.execute(
        "INSERT INTO ppl (id, home) VALUES (1, {street: 'a', zip: 7}) "
        "USING TIMESTAMP 100"
    )
    # an OLDER field write loses per-field LWW
    s.execute(
        "UPDATE ppl USING TIMESTAMP 50 SET home.street = 'old' "
        "WHERE id = 1"
    )
    got = s.execute("SELECT home FROM ppl WHERE id = 1").collect()[0].home
    assert got.street == "a"
    # a replace's tombstone (ts-1) shadows older field cells entirely
    s.execute(
        "UPDATE ppl USING TIMESTAMP 200 SET home = {street: 'n'} "
        "WHERE id = 1"
    )
    s.execute(
        "UPDATE ppl USING TIMESTAMP 150 SET home.zip = 9 WHERE id = 1"
    )
    got = s.execute("SELECT home FROM ppl WHERE id = 1").collect()[0].home
    assert (got.street, got.zip) == ("n", None)
    # a NEWER field write over the replace wins
    s.execute(
        "UPDATE ppl USING TIMESTAMP 300 SET home.zip = 11 WHERE id = 1"
    )
    got = s.execute("SELECT home FROM ppl WHERE id = 1").collect()[0].home
    assert (got.street, got.zip) == ("n", 11)


def test_writetime_shadow_and_maxwritetime(spark):
    s = _sess(spark)
    s.execute(
        "INSERT INTO ppl (id, home) VALUES (1, {street: 'a', zip: 7}) "
        "USING TIMESTAMP 100"
    )
    s.execute(
        "UPDATE ppl USING TIMESTAMP 140 SET home.zip = 9 WHERE id = 1"
    )
    rows = s.execute(
        "SELECT writetime(home) AS wt, maxwritetime(home) AS mwt "
        "FROM ppl WHERE id = 1"
    ).collect()
    assert rows[0].wt is None          # multi-cell: no single writetime
    assert rows[0].mwt == 140          # max live field-cell writetime


def test_flush_and_snapshot_restore(spark, tmp_path):
    s = _sess(spark)
    s.execute("INSERT INTO ppl (id, home) VALUES (1, {street: 'a', zip: 7})")
    s.table("ppl").flush()
    s.execute("UPDATE ppl SET home.street = 'b' WHERE id = 1")
    s.snapshot_keyspace(str(tmp_path / "snap"))
    s2 = CqlSession(spark, None)
    s2.restore_keyspace(str(tmp_path / "snap"))
    assert s2.table("ppl").schema.nonfrozen == {"home"}
    got = s2.execute("SELECT home FROM ppl WHERE id = 1").collect()[0].home
    assert (got.street, got.zip) == ("b", 7)
    # per-field semantics still live after restore
    s2.execute("DELETE home.zip FROM ppl WHERE id = 1")
    got = s2.execute("SELECT home FROM ppl WHERE id = 1").collect()[0].home
    assert (got.street, got.zip) == ("b", None)


def test_lwt_condition_gated(spark):
    s = _sess(spark)
    s.execute("INSERT INTO ppl (id, home) VALUES (1, {street: 'a', zip: 7})")
    with pytest.raises(CQLError, match="non-frozen UDT"):
        s.execute(
            "UPDATE ppl SET fr = {street: 'q', zip: 2} WHERE id = 1 "
            "IF home = {street: 'a', zip: 7}"
        )


def test_vector_dimension_enforced(spark):
    """vector<T, n> (5.0): fixed length enforced at write time — wrong
    arity rejected, element ops rejected, whole-value rewrite fine."""
    s = CqlSession(spark, None)
    s.execute(
        "CREATE TABLE vec (id int PRIMARY KEY, emb vector<float, 3>)"
    )
    assert s.table("vec").schema.vector_dims == {"emb": 3}
    s.execute("INSERT INTO vec (id, emb) VALUES (1, [0.1, 0.2, 0.3])")
    with pytest.raises(CQLError, match="expected 3 elements"):
        s.execute("INSERT INTO vec (id, emb) VALUES (2, [0.1, 0.2])")
    with pytest.raises(CQLError, match="expected 3 elements"):
        s.execute("UPDATE vec SET emb = [1.0] WHERE id = 1")
    with pytest.raises(CQLError, match="fixed-length"):
        s.execute("UPDATE vec SET emb = emb + [1.0] WHERE id = 1")
    with pytest.raises(CQLError, match="fixed-length"):
        s.execute("UPDATE vec SET emb[0] = 9.0 WHERE id = 1")
    s.execute("UPDATE vec SET emb = [1.0, 2.0, 3.0] WHERE id = 1")
    got = s.execute("SELECT emb FROM vec WHERE id = 1").collect()[0].emb
    assert [round(x, 1) for x in got] == [1.0, 2.0, 3.0]
    # the dimension survives snapshot/restore and ALTER ADD declares it
    s.execute("ALTER TABLE vec ADD emb2 vector<float, 2>")
    assert s.table("vec").schema.vector_dims == {"emb": 3, "emb2": 2}
