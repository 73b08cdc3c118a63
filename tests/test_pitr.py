"""Point-in-time restore (snapshot_pitr): as-of LWW cutoff, TTL expiry
evaluated AT the target time, tombstones newer than the target not yet
in existence, identity at the clock head, counter as-of sums, and the
full snapshot → restore → PITR loop surviving flush + major compaction."""

from __future__ import annotations

import pytest

from cassandra_spark.cql_session import CqlSession


@pytest.fixture()
def sess(spark, tmp_path):
    s = CqlSession(spark, spill_dir=str(tmp_path))
    s.execute("CREATE TABLE pt (k text PRIMARY KEY, v int)")
    return s


def _rows(df):
    return {r.k: r.v for r in df.collect()}


def test_pitr_cutoff_vs_lww(sess):
    sess.execute("INSERT INTO pt (k, v) VALUES ('a', 1) USING TIMESTAMP 100")
    sess.execute("INSERT INTO pt (k, v) VALUES ('a', 2) USING TIMESTAMP 200")
    sess.execute("INSERT INTO pt (k, v) VALUES ('b', 3) USING TIMESTAMP 300")
    t = sess.table("pt")
    assert _rows(t.snapshot_pitr(150)) == {"a": 1}
    assert _rows(t.snapshot_pitr(250)) == {"a": 2}
    assert _rows(t.snapshot_pitr(300)) == {"a": 2, "b": 3}
    # the head view equals the plain snapshot
    assert _rows(t.snapshot_pitr(10**9)) == _rows(t.snapshot())


def test_pitr_deletes_not_yet_in_existence(sess):
    sess.execute("INSERT INTO pt (k, v) VALUES ('a', 1) USING TIMESTAMP 100")
    sess.execute("DELETE FROM pt USING TIMESTAMP 200 WHERE k = 'a'")
    t = sess.table("pt")
    assert _rows(t.snapshot_pitr(150)) == {"a": 1}
    assert _rows(t.snapshot_pitr(200)) == {}
    assert _rows(t.snapshot()) == {}


def test_pitr_ttl_evaluated_at_target(sess):
    # TTL is in logical-clock units in the session model: written @100
    # with TTL 50 -> expires strictly after 150
    sess.execute(
        "INSERT INTO pt (k, v) VALUES ('a', 1) "
        "USING TIMESTAMP 100 AND TTL 50"
    )
    sess.execute("INSERT INTO pt (k, v) VALUES ('b', 2) USING TIMESTAMP 400")
    t = sess.table("pt")
    assert _rows(t.snapshot_pitr(120)) == {"a": 1}
    assert _rows(t.snapshot_pitr(160)) == {}  # expired by then, b not yet
    assert _rows(t.snapshot()) == {"b": 2}


def test_pitr_counter_as_of_sum(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute("CREATE TABLE ct (k text PRIMARY KEY, c counter)")
    # counter updates reject USING TIMESTAMP (reference-faithful), so
    # cut on the logical clock the increments actually took
    sess.execute("UPDATE ct SET c = c + 5 WHERE k = 'a'")
    t = sess.table("ct")
    wt1 = t._max_wt
    sess.execute("UPDATE ct SET c = c + 7 WHERE k = 'a'")
    assert {r.k: r.c for r in t.snapshot_pitr(wt1).collect()} == {"a": 5}
    assert {r.k: r.c for r in t.snapshot_pitr(t._max_wt).collect()} == {
        "a": 12
    }


def test_pitr_survives_flush_compact_restore(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path / "live"))
    sess.execute("CREATE TABLE pt (k text PRIMARY KEY, v int)")
    t = sess.table("pt")
    for i in range(10):
        sess.execute(
            f"INSERT INTO pt (k, v) VALUES ('k{i}', {i}) USING TIMESTAMP 100"
        )
    t.flush()
    for i in range(0, 10, 2):
        sess.execute(
            f"INSERT INTO pt (k, v) VALUES ('k{i}', {i + 100}) "
            f"USING TIMESTAMP 200"
        )
    t.flush()
    t.compact_segments()
    for i in range(0, 10, 3):
        sess.execute(f"DELETE FROM pt USING TIMESTAMP 300 WHERE k = 'k{i}'")
    t.flush()
    snap = str(tmp_path / "snap")
    sess.snapshot_keyspace(snap)
    restored = CqlSession(spark, spill_dir=str(tmp_path / "restored"))
    restored.restore_keyspace(snap)
    rt = restored.table("pt")
    exp_250 = {f"k{i}": (i + 100 if i % 2 == 0 else i) for i in range(10)}
    assert _rows(rt.snapshot_pitr(250)) == exp_250
    exp_now = {k: v for k, v in exp_250.items() if int(k[1:]) % 3 != 0}
    assert _rows(rt.snapshot()) == exp_now
    # as-of-100 view: the first generation only
    assert _rows(rt.snapshot_pitr(100)) == {f"k{i}": i for i in range(10)}
