"""CqlSession: CREATE TABLE DDL + DML + SELECT through one endpoint."""

from __future__ import annotations

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_session import CqlSession, parse_create_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def sess(spark):
    return CqlSession(spark, SF_SMOKE)


DDL = """
CREATE TABLE msgs (
  room text,
  posted int,
  author text,
  body text,
  tags set<text>,
  topic text STATIC,
  PRIMARY KEY (room, posted)
) WITH CLUSTERING ORDER BY (posted ASC)
"""


def test_parse_create_table_shapes():
    s = parse_create_table(DDL)
    assert s.partition_key == "room"
    assert s.clustering == ("posted",)
    assert s.key_types == {"room": "string", "posted": "int"}
    assert s.regular == {
        "author": "string", "body": "string", "tags": "set<string>",
    }
    assert s.static == {"topic": "string"}
    # counter + composite-partition rejections
    with pytest.raises(CQLError, match="composite partition"):
        parse_create_table(
            "CREATE TABLE t (a text, b text, v int, PRIMARY KEY ((a, b)))"
        )
    with pytest.raises(CQLError, match="counter"):
        parse_create_table(
            "CREATE TABLE t (a text PRIMARY KEY, c counter, v int)"
        )
    with pytest.raises(CQLError, match="PRIMARY KEY"):
        parse_create_table("CREATE TABLE t (a text, v int)")


def test_ddl_dml_select_roundtrip(sess):
    sess.execute(DDL)
    sess.execute(
        "INSERT INTO msgs (room, posted, author, body, tags) VALUES "
        "('dev', 1, 'ana', 'hello', {'intro'})"
    )
    sess.execute(
        "INSERT INTO msgs (room, posted, author, body) VALUES "
        "('dev', 2, 'bo', 'hey')"
    )
    sess.execute("UPDATE msgs SET topic = 'greetings' WHERE room = 'dev'")
    sess.execute("DELETE body FROM msgs WHERE room = 'dev' AND posted = 2")
    rows = sess.execute(
        "SELECT posted, author, body, topic FROM msgs WHERE room = 'dev' "
        "ORDER BY posted ASC"
    ).collect()
    assert [(r.posted, r.author, r.body, r.topic) for r in rows] == [
        (1, "ana", "hello", "greetings"),
        (2, "bo", None, "greetings"),
    ]


def test_select_restrictions_apply_to_session_tables(sess):
    sess.execute(DDL)
    sess.execute(
        "INSERT INTO msgs (room, posted, author) VALUES ('dev', 1, 'ana')"
    )
    # non-key predicate without ALLOW FILTERING: same guardrail as fixtures
    with pytest.raises(CQLError, match="ALLOW FILTERING"):
        sess.execute("SELECT posted FROM msgs WHERE author = 'ana'")
    assert (
        sess.execute(
            "SELECT posted FROM msgs WHERE author = 'ana' ALLOW FILTERING"
        ).count()
        == 1
    )


def test_writetime_selector_reads_real_cell_metadata(sess):
    """On a session table WRITETIME() projects the DML log's actual
    writetimes — no synthesis involved."""
    sess.execute(DDL)
    sess.execute(
        "INSERT INTO msgs (room, posted, author) VALUES ('dev', 1, 'ana') "
        "USING TIMESTAMP 1111"
    )
    sess.execute(
        "UPDATE msgs USING TIMESTAMP 2222 SET body = 'later' "
        "WHERE room = 'dev' AND posted = 1"
    )
    r = sess.execute(
        "SELECT WRITETIME(author), WRITETIME(body) FROM msgs "
        "WHERE room = 'dev'"
    ).collect()[0]
    assert (r.writetime_author, r.writetime_body) == (1111, 2222)


def test_lwt_flag_and_fixture_fallback(sess):
    sess.execute(DDL)
    assert sess.execute(
        "INSERT INTO msgs (room, posted, author) VALUES ('x', 1, 'a') "
        "IF NOT EXISTS"
    ) is True
    assert sess.execute(
        "INSERT INTO msgs (room, posted, author) VALUES ('x', 1, 'b') "
        "IF NOT EXISTS"
    ) is False
    # unknown-table DML is an error; fixture SELECT still works
    with pytest.raises(CQLError, match="unknown table"):
        sess.execute("INSERT INTO nope (a) VALUES (1)")
    assert sess.execute("SELECT * FROM region").count() == 5


def test_counter_table_through_session(sess):
    sess.execute(
        "CREATE TABLE hits (page text, day text, views counter, "
        "PRIMARY KEY (page, day))"
    )
    sess.execute("UPDATE hits SET views = views + 3 WHERE page = 'p' AND day = 'd'")
    sess.execute("UPDATE hits SET views = views + 4 WHERE page = 'p' AND day = 'd'")
    r = sess.execute("SELECT views FROM hits WHERE page = 'p'").collect()
    assert [x.views for x in r] == [7]


def test_session_query_pinned_log():
    from cassandra_spark.cql_dml import CqlTable
    from cassandra_spark.operators.cql_queries import (
        SESSION_ASOF, SESSION_DML, SESSION_LOG, _SESSION_SCHEMA)

    t = CqlTable(None, _SESSION_SCHEMA)
    for s in SESSION_DML:
        t.execute(s)
    assert tuple(t._log) == SESSION_LOG
    assert max(r[6] for r in t._log) + 1 == SESSION_ASOF
