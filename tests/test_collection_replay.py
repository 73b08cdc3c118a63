"""w13_collection_replay: pin parser output ≡ the oracle's VALUES literal
and assert the collection/range/static visibility rules directly."""

from __future__ import annotations

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_dml import CqlTable, TableSchema
from cassandra_spark.operators.collection_replay import (
    ASOF,
    COLLECTION_SCRIPT,
    EXPECTED_LOG,
    NOTES_SCHEMA,
    w13_collection_replay,
)


def test_script_compiles_to_pinned_log():
    # parsing is driver-side only — no Spark session needed
    table = CqlTable(None, NOTES_SCHEMA)
    for stmt in COLLECTION_SCRIPT:
        table.execute(stmt)
    assert tuple(table._log) == EXPECTED_LOG
    assert max(r[6] for r in table._log) + 1 == ASOF


def test_replay_visible_rows(spark):
    got = {
        (r.pk, r.ck1, r.ck2): (r.v, r.tags, r.steps, r.attrs, r.owner)
        for r in w13_collection_replay(spark, "unused").collect()
    }
    assert got == {
        # list order: prepend 0, then 1,2 (insert), then 3,4 (append);
        # set: red removed, green added; map: k1/k3 deleted, k2 lives
        ("a", "x", 1): (
            10, '["blue","green"]', "[0,1,2,3,4]",
            '[{"key":"k2","value":"v2"}]', "olivia",
        ),
        # tags overwritten to {solo}; steps deleted; attrs never live;
        # empty collections are NULL, not []
        ("a", "x", 2): (None, '["solo"]', None, None, "olivia"),
        ("a", "y", 1): (21, None, None, None, "olivia"),  # below the slice
        # ck2 ∈ (1,3] range-deleted; 2 resurrected by a newer INSERT
        ("a", "y", 2): (42, None, None, None, "olivia"),
        # ck2=10 survives ONLY under numeric comparison ('10' < '3' lexically)
        ("a", "y", 10): (30, None, None, None, "olivia"),
        # b/x/* killed by the clustering-prefix tombstone; z row lives,
        # its TTL'd 'tmp' tag expired, batch added steps/attrs
        ("b", "z", 5): (
            52, '["keep"]', "[9]", '[{"key":"bk","value":"bv"}]', None,
        ),
        # static-only partition: one NULL-clustering row
        ("c", None, None): (None, None, None, None, "nobody"),
    }


def test_collection_rejections(spark):
    table = CqlTable(spark, NOTES_SCHEMA)
    for bad in [
        # list removal by value needs read-before-write — unsupported
        "UPDATE notes SET steps = steps - [1] WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
        # indexed assignment on a non-map
        "UPDATE notes SET steps[0] = 9 WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
        # scalar literal into a collection column
        "UPDATE notes SET tags = 'red' WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
        # collection literal into a scalar column
        "UPDATE notes SET v = [1] WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
        # range WHERE outside DELETE
        "UPDATE notes SET v = 1 WHERE pk = 'a' AND ck1 = 'x' AND ck2 > 1",
        # range DELETE must bound the NEXT clustering column
        "DELETE FROM notes WHERE pk = 'a' AND ck2 > 1",
        # clustering equalities must form a prefix
        "DELETE FROM notes WHERE pk = 'a' AND ck2 = 1",
        # IF on a collection column
        "UPDATE notes SET v = 1 WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1 IF tags = 'x'",
        # static collections are rejected at schema build time (below)
    ]:
        with pytest.raises(CQLError):
            table.execute(bad)
    with pytest.raises(CQLError):
        TableSchema("t", "pk", None, {}, static={"s": "set<int>"})


def test_composite_ck_lwt(spark):
    """LWT over a 2-column clustering key: full-key conditions still work."""
    table = CqlTable(None, NOTES_SCHEMA)
    assert table.execute(
        "INSERT INTO notes (pk, ck1, ck2, v) VALUES ('p', 'q', 7, 1) "
        "IF NOT EXISTS"
    ) is True
    assert table.execute(
        "INSERT INTO notes (pk, ck1, ck2, v) VALUES ('p', 'q', 7, 2) "
        "IF NOT EXISTS"
    ) is False
    assert table.execute(
        "UPDATE notes SET v = 3 WHERE pk = 'p' AND ck1 = 'q' AND ck2 = 7 "
        "IF v = 1"
    ) is True
    # a different ck2 is a different row
    assert table.execute(
        "UPDATE notes SET v = 9 WHERE pk = 'p' AND ck1 = 'q' AND ck2 = 8 "
        "IF EXISTS"
    ) is False
    with pytest.raises(CQLError):  # partial clustering key
        table.execute(
            "UPDATE notes SET v = 1 WHERE pk = 'p' AND ck1 = 'q' IF v = 1"
        )


def test_range_tombstone_shadows_in_lwt_read(spark):
    """The LWT read phase must apply range-tombstone shadowing too."""
    table = CqlTable(None, NOTES_SCHEMA)
    table.execute("INSERT INTO notes (pk, ck1, ck2, v) VALUES ('r', 's', 5, 1)")
    table.execute("DELETE FROM notes WHERE pk = 'r' AND ck1 = 's' AND ck2 >= 5")
    assert table.execute(
        "INSERT INTO notes (pk, ck1, ck2, v) VALUES ('r', 's', 5, 2) "
        "IF NOT EXISTS"
    ) is True  # the range tombstone killed the old row


def test_static_lwt_on_pk_only(spark):
    table = CqlTable(None, NOTES_SCHEMA)
    assert table.execute(
        "UPDATE notes SET owner = 'me' WHERE pk = 's' IF owner = NULL"
    ) is True
    assert table.execute(
        "UPDATE notes SET owner = 'you' WHERE pk = 's' IF owner = NULL"
    ) is False
    assert table.execute(
        "UPDATE notes SET owner = 'you' WHERE pk = 's' IF owner = 'me'"
    ) is True


def test_list_index_script_pinned_log():
    from cassandra_spark.operators.collection_replay import (
        LIST_INDEX_ASOF,
        LIST_INDEX_LOG,
        LIST_INDEX_SCHEMA,
        LIST_INDEX_SCRIPT,
    )

    t = CqlTable(None, LIST_INDEX_SCHEMA)
    for s in LIST_INDEX_SCRIPT:
        t.execute(s)
    assert tuple(t._log) == LIST_INDEX_LOG
    assert max(r[6] for r in t._log) + 1 == LIST_INDEX_ASOF


def test_list_index_bounds_and_kind_rejections():
    import pytest

    from cassandra_spark.cql import CQLError

    schema = TableSchema(
        name="t",
        partition_key="k",
        clustering=(),
        regular={"l": "list<string>", "s": "set<string>"},
    )
    t = CqlTable(None, schema)
    t.execute("INSERT INTO t (k, l, s) VALUES ('a', ['x'], {'m'})")
    with pytest.raises(CQLError, match="out of bounds"):
        t.execute("UPDATE t SET l[5] = 'q' WHERE k = 'a'")
    with pytest.raises(CQLError, match="out of bounds"):
        t.execute("DELETE l[1] FROM t WHERE k = 'a'")
    with pytest.raises(CQLError, match="integer"):
        t.execute("UPDATE t SET l['x'] = 'q' WHERE k = 'a'")
    with pytest.raises(CQLError, match="map or list"):
        t.execute("UPDATE t SET s[0] = 'q' WHERE k = 'a'")
    with pytest.raises(CQLError, match="map or list"):
        t.execute("DELETE s[0] FROM t WHERE k = 'a'")
    # index resolution sees earlier statements in the same session
    t.execute("UPDATE t SET l = l + ['y', 'z'] WHERE k = 'a'")
    t.execute("DELETE l[2] FROM t WHERE k = 'a'")  # drops 'z'
    assert [r[4] for r in t._log if r[5] == "cell" and r[2] == "l"] == [
        "x", "y", "z"
    ]
