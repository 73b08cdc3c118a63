"""CREATE KEYSPACE / USE / DROP KEYSPACE and qualified table names
(SURVEY.md §2.13). Since round 11 the registry keys tables by the
QUALIFIED name, so ks1.t and ks2.t coexist like the reference."""

from __future__ import annotations

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_session import CqlSession


def test_create_use_and_qualified_names(spark):
    s = CqlSession(spark)
    s.execute(
        "CREATE KEYSPACE app WITH replication = "
        "{'class': 'SimpleStrategy', 'replication_factor': '3'}"
    )
    s.execute("CREATE KEYSPACE IF NOT EXISTS app WITH replication = "
              "{'class': 'SimpleStrategy', 'replication_factor': '3'}")
    with pytest.raises(CQLError, match="already exists"):
        s.execute(
            "CREATE KEYSPACE app WITH replication = "
            "{'class': 'SimpleStrategy', 'replication_factor': '1'}"
        )
    s.execute("USE app")
    s.execute("CREATE TABLE ev (k text PRIMARY KEY, n int)")
    s.execute("INSERT INTO ev (k, n) VALUES ('a', 1)")
    # qualified names resolve from anywhere; wrong keyspace rejected
    s.execute("USE session")
    s.execute("INSERT INTO app.ev (k, n) VALUES ('b', 2)")
    rows = {r.k: r.n for r in s.execute("SELECT * FROM app.ev").collect()}
    assert rows == {"a": 1, "b": 2}
    with pytest.raises(CQLError, match="unknown table"):
        s.execute("SELECT * FROM session.ev")
    with pytest.raises(CQLError, match="unknown keyspace"):
        s.execute("SELECT * FROM nope.ev")
    # the keyspaces view reflects replication params
    ks = {
        r.keyspace_name: r.replication
        for r in s.execute("SELECT * FROM system_schema.keyspaces").collect()
    }
    assert "'replication_factor': '3'" in ks["app"]
    assert "session" in ks


def test_replication_validation_and_nts(spark):
    s = CqlSession(spark)
    with pytest.raises(CQLError, match="replication_factor"):
        s.execute(
            "CREATE KEYSPACE bad WITH replication = "
            "{'class': 'SimpleStrategy'}"
        )
    with pytest.raises(CQLError, match="unsupported replication class"):
        s.execute(
            "CREATE KEYSPACE bad WITH replication = "
            "{'class': 'OldNetworkTopologyStrategy', 'replication_factor': '1'}"
        )
    s.execute(
        "CREATE KEYSPACE geo WITH replication = "
        "{'class': 'NetworkTopologyStrategy', 'dc1': '3', 'dc2': '2'} "
        "AND durable_writes = true"
    )
    ks = {
        r.keyspace_name: r.replication
        for r in s.execute("SELECT * FROM system_schema.keyspaces").collect()
    }
    assert "'dc1': '3'" in ks["geo"] and "'dc2': '2'" in ks["geo"]


def test_cross_keyspace_same_name_coexists(spark):
    # round 11: the flat-namespace reduction is lifted — ks1.t and
    # ks2.t coexist like the reference's per-keyspace schema
    s = CqlSession(spark)
    s.execute("CREATE TABLE t1 (k text PRIMARY KEY, v int)")
    s.execute("INSERT INTO t1 (k, v) VALUES ('sess', 1)")
    s.execute(
        "CREATE KEYSPACE other WITH replication = "
        "{'class': 'SimpleStrategy', 'replication_factor': '1'}"
    )
    s.execute("USE other")
    s.execute("CREATE TABLE t1 (k text PRIMARY KEY, v int)")
    s.execute("INSERT INTO t1 (k, v) VALUES ('oth', 2)")
    # bare names scope to the current keyspace
    assert {r.k for r in s.execute("SELECT * FROM t1").collect()} == {"oth"}
    # qualified names reach both from anywhere
    assert {
        r.k for r in s.execute("SELECT * FROM session.t1").collect()
    } == {"sess"}
    assert {
        r.k for r in s.execute("SELECT * FROM other.t1").collect()
    } == {"oth"}
    # DML routes by qualifier; DESCRIBE shows both under their keyspaces
    s.execute("INSERT INTO session.t1 (k, v) VALUES ('sess2', 3)")
    assert s.execute("SELECT * FROM session.t1").count() == 2
    desc = {
        (r.keyspace_name, r.name)
        for r in s.execute("DESCRIBE TABLES").collect()
    }
    assert {("session", "t1"), ("other", "t1")} <= desc
    # dropping one leaves the other intact
    s.execute("DROP TABLE other.t1")
    assert s.execute("SELECT * FROM session.t1").count() == 2
    # re-creating the same-ks duplicate still rejects
    with pytest.raises(CQLError, match="already exists"):
        s.execute("CREATE TABLE session.t1 (k text PRIMARY KEY)")


def test_drop_keyspace_drops_tables_and_unselects(spark):
    s = CqlSession(spark)
    s.execute(
        "CREATE KEYSPACE tmp WITH replication = "
        "{'class': 'SimpleStrategy', 'replication_factor': '1'}"
    )
    s.execute("USE tmp")
    s.execute("CREATE TABLE gone (k text PRIMARY KEY)")
    s.execute("INSERT INTO gone (k) VALUES ('x')")
    s.execute("DROP KEYSPACE tmp")
    with pytest.raises(CQLError, match="no keyspace selected"):
        s.execute("CREATE TABLE orphan (k text PRIMARY KEY)")
    with pytest.raises(CQLError, match="no keyspace selected"):
        s.execute("SELECT * FROM gone")
    s.execute("USE session")
    with pytest.raises(CQLError, match="unconfigured table"):
        s.execute("SELECT * FROM gone")
    s.execute("DROP KEYSPACE IF EXISTS tmp")  # no error
    with pytest.raises(CQLError, match="unknown keyspace"):
        s.execute("DROP KEYSPACE tmp")


def test_describe_keyspaces_and_snapshot_roundtrip(spark, tmp_path):
    s = CqlSession(spark, spill_dir=str(tmp_path / "a"))
    s.execute(
        "CREATE KEYSPACE app WITH replication = "
        "{'class': 'SimpleStrategy', 'replication_factor': '2'}"
    )
    s.execute("USE app")
    s.execute("CREATE TABLE t (k text PRIMARY KEY, n int)")
    s.execute("INSERT INTO t (k, n) VALUES ('a', 1)")
    desc = {r.name: r.create_statement for r in s.execute("DESCRIBE KEYSPACES").collect()}
    assert "'replication_factor': '2'" in desc["app"]
    assert "session" in desc
    snap = str(tmp_path / "snap")
    s.snapshot_keyspace(snap)
    s2 = CqlSession(spark, spill_dir=str(tmp_path / "b"))
    s2.restore_keyspace(snap)
    # keyspace registry + tags survive: qualified reads work, tag enforced
    assert {r.k: r.n for r in s2.execute("SELECT * FROM app.t").collect()} == {"a": 1}
    import pytest as _pytest

    from cassandra_spark.cql import CQLError as _E

    with _pytest.raises(_E, match="unknown table"):
        s2.execute("SELECT * FROM session.t")


def test_copy_to_from_roundtrip(spark, tmp_path):
    """cqlsh COPY: export the reconciled snapshot to one CSV, import it
    through the normal INSERT path (quotes/commas escaped, empty cells
    unset), and the copy reconciles identically."""
    s = CqlSession(spark)
    s.execute("CREATE TABLE src (k text PRIMARY KEY, v text, n int)")
    s.execute("INSERT INTO src (k, v, n) VALUES ('a', 'x,y', 1)")
    s.execute("INSERT INTO src (k, v, n) VALUES ('b', 'it''s', 2)")
    s.execute("INSERT INTO src (k, n) VALUES ('c', 3)")  # v unset
    s.execute("UPDATE src SET n = 9 WHERE k = 'a'")      # LWW applies
    path = str(tmp_path / "out.csv")
    assert s.execute(f"COPY src TO '{path}'") == 3
    s.execute("CREATE TABLE dst (k text PRIMARY KEY, v text, n int)")
    assert s.execute(f"COPY dst FROM '{path}'") == 3
    a = sorted(tuple(r) for r in s.execute("SELECT k, v, n FROM src").collect())
    b = sorted(tuple(r) for r in s.execute("SELECT k, v, n FROM dst").collect())
    assert a == b == [("a", "x,y", 9), ("b", "it's", 2), ("c", None, 3)]
    # column-subset export
    p2 = str(tmp_path / "kn.csv")
    s.execute(f"COPY src (k, n) TO '{p2}'")
    with open(p2) as fh:
        assert fh.readline().strip() == "k,n"


def test_alter_keyspace_replication(spark):
    s = CqlSession(spark)
    s.execute(
        "CREATE KEYSPACE m WITH replication = "
        "{'class': 'SimpleStrategy', 'replication_factor': '1'}"
    )
    s.execute(
        "ALTER KEYSPACE m WITH replication = "
        "{'class': 'NetworkTopologyStrategy', 'dc1': '3'}"
    )
    ks = {
        r.keyspace_name: r.replication
        for r in s.execute("SELECT * FROM system_schema.keyspaces").collect()
    }
    assert "'dc1': '3'" in ks["m"]
    with pytest.raises(CQLError, match="unknown keyspace"):
        s.execute(
            "ALTER KEYSPACE nope WITH replication = "
            "{'class': 'SimpleStrategy', 'replication_factor': '1'}"
        )


def test_second_review_fixes(spark, tmp_path):
    """Round-5 second-review pins: (1) view reads enforce base-table
    SELECT; (2) DROP TABLE with dependent views is rejected; (3) snapshot
    carries new schema fields + views; (4) CREATE TABLE ks.t honors the
    qualifier; (5) composite view partition keys rejected; (6) grants on
    NEW keyspaces work and keyspace grants don't leak across keyspaces;
    (7) qualified DML inside BATCH works; (8) DESCRIBE emits the owning
    keyspace; (9) table/view name collisions rejected; (10) COPY rejects
    collection columns."""
    s = CqlSession(spark, spill_dir=str(tmp_path / "a"))
    s.execute(
        "CREATE KEYSPACE app WITH replication = "
        "{'class': 'SimpleStrategy', 'replication_factor': '1'}"
    )
    # (4) qualified CREATE honors the keyspace while session is current
    s.execute("CREATE TABLE app.ev (k text PRIMARY KEY, n int)")
    s.execute("INSERT INTO app.ev (k, n) VALUES ('a', 1)")
    assert [r.n for r in s.execute("SELECT n FROM app.ev").collect()] == [1]
    with pytest.raises(CQLError, match="unknown table"):
        s.execute("SELECT * FROM session.ev")
    # (8) DESCRIBE names the owning keyspace
    ddl = s.execute("DESCRIBE TABLE ev").collect()[0].create_statement
    assert "CREATE TABLE app.ev" in ddl
    # (7) qualified DML inside a batch
    s.execute(
        "BEGIN BATCH INSERT INTO app.ev (k, n) VALUES ('b', 2); "
        "INSERT INTO app.ev (k, n) VALUES ('c', 3); APPLY BATCH"
    )
    assert s.execute("SELECT * FROM app.ev").count() == 3
    # (6) grants on the new keyspace work; session grants don't leak
    s.execute("CREATE TABLE base (k text PRIMARY KEY, v text)")
    s.execute("INSERT INTO base (k, v) VALUES ('x', 'y')")
    s.execute("CREATE ROLE r1 WITH LOGIN = true")
    s.execute("GRANT SELECT ON KEYSPACE session TO r1")
    s.login("r1")
    s.execute("SELECT * FROM base")
    with pytest.raises(CQLError, match="no SELECT"):
        s.execute("SELECT * FROM app.ev")  # session grant must not leak
    s.login("cassandra")
    s.execute("GRANT SELECT ON KEYSPACE app TO r1")
    s.login("r1")
    s.execute("SELECT * FROM app.ev")
    s.login("cassandra")
    # (1) view reads enforce base SELECT; (9) name collision; (2) DROP gate
    s.execute(
        "CREATE MATERIALIZED VIEW by_v AS SELECT k, v FROM base "
        "WHERE v IS NOT NULL AND k IS NOT NULL PRIMARY KEY (v, k)"
    )
    with pytest.raises(CQLError, match="is a materialized view"):
        s.execute("CREATE TABLE by_v (k text PRIMARY KEY)")
    s.execute("CREATE ROLE novis WITH LOGIN = true")
    s.execute("GRANT MODIFY ON TABLE base TO novis")
    s.login("novis")
    with pytest.raises(CQLError, match="no SELECT"):
        s.execute("SELECT * FROM by_v")
    s.login("cassandra")
    with pytest.raises(CQLError, match="depend on it"):
        s.execute("DROP TABLE base")
    # (5) composite view partition key rejected
    with pytest.raises(CQLError, match="composite view partition"):
        s.execute(
            "CREATE MATERIALIZED VIEW bad AS SELECT k, v FROM base "
            "WHERE v IS NOT NULL AND k IS NOT NULL PRIMARY KEY ((v, k))"
        )
    # (10) COPY rejects collections
    s.execute("CREATE TABLE coll (k text PRIMARY KEY, tags set<text>)")
    with pytest.raises(CQLError, match="scalar columns only"):
        s.execute(f"COPY coll TO '{tmp_path}/x.csv'")
    # (3) snapshot carries options + views + DESC order
    s.execute(
        "CREATE TABLE opts2 (k text, c int, v int, PRIMARY KEY (k, c)) "
        "WITH CLUSTERING ORDER BY (c DESC) AND "
        "compression = {'class': 'ZstdCompressor'}"
    )
    snap = str(tmp_path / "snap")
    s.snapshot_keyspace(snap)
    s2 = CqlSession(spark, spill_dir=str(tmp_path / "b"))
    s2.restore_keyspace(snap)
    sch = s2.table("opts2").schema
    assert sch.clustering_desc == ("c",)
    assert sch.compression == "ZstdCompressor"
    assert "session.by_v" in s2.mat_views
    assert {r.k for r in s2.execute("SELECT * FROM by_v").collect()} == {"x"}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# mini-fuzz over the keyspace/DDL surface: random interleavings of
# CREATE KEYSPACE / USE / CREATE TABLE / DROP KEYSPACE / INSERT against
# a 20-line python model of the namespace rules — the session must agree
# on which statements succeed AND on the final namespace state.
_op_st = st.lists(
    st.one_of(
        st.tuples(st.just("cks"), st.sampled_from("ab")),
        st.tuples(st.just("use"), st.sampled_from("ab")),
        st.tuples(st.just("ct"), st.sampled_from(["t1", "t2"])),
        st.tuples(st.just("dks"), st.sampled_from("ab")),
        st.tuples(st.just("ins"), st.sampled_from(["t1", "t2"])),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_op_st)
def test_keyspace_namespace_fuzz(spark, ops):
    s = CqlSession(spark)
    # model state: tables live per (keyspace, name) — the round-11
    # per-keyspace namespace, matching the reference
    m_ks = {"session"}
    m_cur = "session"
    m_tab: set[tuple[str, str]] = set()  # (keyspace, table)
    m_rows: dict[tuple[str, str], int] = {}
    for kind, arg in ops:
        if kind == "cks":
            ok = arg not in m_ks
            try:
                s.execute(
                    f"CREATE KEYSPACE {arg} WITH replication = "
                    "{'class': 'SimpleStrategy', 'replication_factor': '1'}"
                )
                assert ok, f"CREATE KEYSPACE {arg} should have failed"
                m_ks.add(arg)
            except CQLError:
                assert not ok
        elif kind == "use":
            ok = arg in m_ks
            try:
                s.execute(f"USE {arg}")
                assert ok
                m_cur = arg
            except CQLError:
                assert not ok
        elif kind == "ct":
            ok = m_cur is not None and (m_cur, arg) not in m_tab
            try:
                s.execute(f"CREATE TABLE {arg} (k text PRIMARY KEY, n int)")
                assert ok, f"CREATE TABLE {arg} should have failed"
                m_tab.add((m_cur, arg))
                m_rows[(m_cur, arg)] = 0
            except CQLError:
                assert not ok
        elif kind == "dks":
            ok = arg in m_ks
            try:
                s.execute(f"DROP KEYSPACE {arg}")
                assert ok
                m_ks.discard(arg)
                for kt in [kt for kt in m_tab if kt[0] == arg]:
                    m_tab.discard(kt)
                    del m_rows[kt]
                if m_cur == arg:
                    m_cur = None
            except CQLError:
                assert not ok
        elif kind == "ins":
            ok = m_cur is not None and (m_cur, arg) in m_tab
            try:
                s.execute(
                    f"INSERT INTO {arg} (k, n) "
                    f"VALUES ('k{m_rows.get((m_cur, arg), 0)}', 1)"
                )
                assert ok, f"INSERT INTO {arg} should have failed"
                m_rows[(m_cur, arg)] += 1
            except CQLError:
                assert not ok
    # final state agrees: keyspaces, table ownership, row counts
    got_ks = {
        r.keyspace_name
        for r in s.execute("SELECT * FROM system_schema.keyspaces").collect()
    }
    assert got_ks == m_ks
    assert {
        (s._key_ks(k), s._key_bare(k)) for k in s.tables
    } == m_tab
    for (ks, t), n in m_rows.items():
        got_n = s.table(f"{ks}.{t}").snapshot().count()
        assert got_n == len({f"k{i}" for i in range(n)})
