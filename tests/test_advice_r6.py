"""Round-6 ADVICE regressions (cql_session.py): mask bypass via
qualified table names, DROP KEYSPACE of a non-current keyspace,
GRANT/REVOKE AUTHORIZE checked against the granted resource, tablestats
keyspace ownership, and COPY FROM CSV cell validation."""

from __future__ import annotations

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_session import CqlSession


def test_mask_applies_to_qualified_name(spark):
    # high: SELECT ssn FROM session.ppl must mask exactly like
    # SELECT ssn FROM ppl — qualifying the name is not an UNMASK
    s = CqlSession(spark)
    s.execute("CREATE TABLE ppl (k text PRIMARY KEY, "
              "ssn text MASKED WITH mask_replace('xxx'))")
    s.execute("INSERT INTO ppl (k, ssn) VALUES ('a', '123-45-6789')")
    bare = [r.ssn for r in s.execute("SELECT ssn FROM ppl").collect()]
    qual = [r.ssn
            for r in s.execute("SELECT ssn FROM session.ppl").collect()]
    assert bare == ["xxx"]
    assert qual == ["xxx"]
    # UNMASK still lifts the mask on both spellings (superuser holds it)
    s.execute("GRANT UNMASK ON TABLE ppl TO cassandra")
    assert [r.ssn for r in
            s.execute("SELECT ssn FROM session.ppl").collect()] == \
        ["123-45-6789"]


def test_drop_noncurrent_keyspace_with_tables(spark):
    # medium: DROP KEYSPACE must drop owned tables even when the session
    # is USE'd into a different keyspace (bare-name resolution trap)
    s = CqlSession(spark)
    s.execute("CREATE KEYSPACE a6 WITH replication = "
              "{'class': 'SimpleStrategy', 'replication_factor': '1'}")
    s.execute("USE a6")
    s.execute("CREATE TABLE vic (k text PRIMARY KEY, v int)")
    s.execute("INSERT INTO vic (k, v) VALUES ('x', 1)")
    s.execute("USE session")  # now a6 is NOT current
    s.execute("DROP KEYSPACE a6")
    assert "a6" not in s.keyspaces
    assert not any(s._key_bare(k) == "vic" for k in s.tables)


def test_drop_table_accepts_qualified_name(spark):
    s = CqlSession(spark)
    s.execute("CREATE KEYSPACE q6 WITH replication = "
              "{'class': 'SimpleStrategy', 'replication_factor': '1'}")
    s.execute("USE q6")
    s.execute("CREATE TABLE qt (k text PRIMARY KEY)")
    s.execute("USE session")
    with pytest.raises(CQLError, match="unknown table"):
        s.execute("DROP TABLE qt")  # bare name scoped to current ks
    s.execute("DROP TABLE q6.qt")
    assert not any(s._key_bare(k) == "qt" for k in s.tables)
    s.execute("DROP TABLE IF EXISTS q6.qt")  # no error
    s.execute("DROP TABLE IF EXISTS nope.qt")  # unknown ks + IF EXISTS


def test_grant_requires_authorize_on_target_resource(spark):
    # medium: AUTHORIZE on keyspace A must not allow granting on B
    s = CqlSession(spark)
    for ks in ("ka", "kb"):
        s.execute(f"CREATE KEYSPACE {ks} WITH replication = "
                  "{'class': 'SimpleStrategy', 'replication_factor': '1'}")
    s.execute("USE ka")
    s.execute("CREATE TABLE ta (k text PRIMARY KEY)")
    s.execute("USE kb")
    s.execute("CREATE TABLE tb (k text PRIMARY KEY)")
    s.execute("CREATE ROLE deleg WITH LOGIN = true")
    s.execute("CREATE ROLE pawn WITH LOGIN = true")
    s.execute("GRANT AUTHORIZE ON KEYSPACE ka TO deleg")
    s.login("deleg")
    s.execute("USE ka")
    # within the authorized keyspace: table grant and keyspace grant ok
    s.execute("GRANT SELECT ON TABLE ta TO pawn")
    s.execute("GRANT SELECT ON KEYSPACE ka TO pawn")
    # outside it: denied, regardless of USE
    with pytest.raises(CQLError, match="no AUTHORIZE permission"):
        s.execute("GRANT SELECT ON TABLE kb.tb TO pawn")
    with pytest.raises(CQLError, match="no AUTHORIZE permission"):
        s.execute("GRANT SELECT ON KEYSPACE kb TO pawn")
    with pytest.raises(CQLError, match="no AUTHORIZE permission"):
        s.execute("GRANT SELECT ON ALL KEYSPACES TO pawn")
    # REVOKE is gated the same way
    with pytest.raises(CQLError, match="no AUTHORIZE permission"):
        s.execute("REVOKE SELECT ON TABLE kb.tb FROM pawn")
    s.execute("REVOKE SELECT ON TABLE ta FROM pawn")
    # AUTHORIZE on ALL KEYSPACES covers everything
    s.login("cassandra")
    s.execute("GRANT AUTHORIZE ON ALL KEYSPACES TO deleg")
    s.login("deleg")
    s.execute("GRANT SELECT ON TABLE kb.tb TO pawn")


def test_tablestats_reports_owning_keyspace(spark):
    s = CqlSession(spark)
    s.execute("CREATE TABLE home (k text PRIMARY KEY)")
    s.execute("CREATE KEYSPACE away WITH replication = "
              "{'class': 'SimpleStrategy', 'replication_factor': '1'}")
    s.execute("USE away")
    s.execute("CREATE TABLE road (k text PRIMARY KEY)")
    stats = {r.table_name: r.keyspace_name
             for r in s.tablestats().collect()}
    assert stats["home"] == "session"
    assert stats["road"] == "away"


def test_copy_from_validates_cells_before_applying(spark, tmp_path):
    # low: a malformed numeric cell must abort BEFORE any row applies,
    # naming the line and column — not surface as a CQL parse error
    s = CqlSession(spark)
    s.execute("CREATE TABLE cf (k text PRIMARY KEY, n int, f double, "
              "b boolean)")
    bad = tmp_path / "bad.csv"
    bad.write_text("k,n,f,b\nr1,1,1.5,true\nr2,oops,2.5,false\n")
    with pytest.raises(CQLError, match=r"line 3.*'n'.*invalid int"):
        s.execute(f"COPY cf FROM '{bad}'")
    # two-phase: the valid first row must NOT have been applied
    assert s.execute("SELECT count(*) AS c FROM cf").collect()[0].c == 0
    with pytest.raises(CQLError, match="invalid boolean"):
        bad.write_text("k,n,f,b\nr1,1,1.5,maybe\n")
        s.execute(f"COPY cf FROM '{bad}'")
    ok = tmp_path / "ok.csv"
    ok.write_text("k,n,f,b\nr1, 1 ,1.5,TRUE\nr2,2,,false\n")
    assert s.execute(f"COPY cf FROM '{ok}'") == 2
    rows = {r.k: (r.n, r.f, r.b)
            for r in s.execute("SELECT * FROM cf").collect()}
    assert rows["r1"] == (1, 1.5, True)
    assert rows["r2"] == (2, None, False)
