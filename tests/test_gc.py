"""nodetool garbagecollect analogue: tombstone purge past gc_grace,
shadowed-data drop under young AND old tombstones, the expired-TTL
resurrection guard, counter purge, physical reduction, history
recording — and a differential fuzz pinning head-snapshot equality."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_spark.cql_session import CqlSession


def _rows(df):
    return {r.k: r.v for r in df.collect()}


def _mk(spark, tmp_path):
    s = CqlSession(spark, spill_dir=str(tmp_path))
    s.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    return s, s.table("t")


def test_old_tombstone_and_shadowed_data_purged(spark, tmp_path):
    sess, t = _mk(spark, tmp_path)
    sess.execute("INSERT INTO t (k, v) VALUES ('a', 1) USING TIMESTAMP 100")
    sess.execute("DELETE FROM t USING TIMESTAMP 200 WHERE k = 'a'")
    sess.execute("INSERT INTO t (k, v) VALUES ('b', 2) USING TIMESTAMP 150")
    before = _rows(sess.execute("SELECT k, v FROM t"))
    stats = t.garbage_collect(gc_horizon_us=300)
    # dropped: a's marker+cell (shadowed) and the tombstone (old)
    assert stats["dropped"] == 3
    assert _rows(sess.execute("SELECT k, v FROM t")) == before == {"b": 2}
    assert t.mutation_log().count() == 2  # b's marker + cell only
    assert t.compaction_history[-1][1] == "gc"


def test_young_tombstone_survives_its_victims_drop(spark, tmp_path):
    sess, t = _mk(spark, tmp_path)
    sess.execute("INSERT INTO t (k, v) VALUES ('a', 1) USING TIMESTAMP 100")
    sess.execute("DELETE FROM t USING TIMESTAMP 200 WHERE k = 'a'")
    t.garbage_collect(gc_horizon_us=150)  # tombstone younger than grace
    kinds = [r.kind for r in t.mutation_log().collect()]
    assert kinds and all(k not in ("CELL", "MARKER") for k in kinds), (
        "shadowed data drops even under a young tombstone"
    )
    assert _rows(sess.execute("SELECT k, v FROM t")) == {}
    # a late-arriving older write stays dead (the marker still shadows)
    sess.execute("INSERT INTO t (k, v) VALUES ('a', 9) USING TIMESTAMP 120")
    assert _rows(sess.execute("SELECT k, v FROM t")) == {}


def test_expired_ttl_resurrection_guard(spark, tmp_path):
    sess, t = _mk(spark, tmp_path)
    sess.execute("INSERT INTO t (k, v) VALUES ('a', 1) USING TIMESTAMP 100")
    sess.execute(
        "INSERT INTO t (k, v) VALUES ('a', 2) "
        "USING TIMESTAMP 200 AND TTL 50"
    )
    # advance the clock past expiry (ticks once per statement)
    for i in range(260):
        sess.execute(f"INSERT INTO t (k, v) VALUES ('pad{i % 5}', {i})")
    before = _rows(sess.execute("SELECT k, v FROM t"))
    assert before.get("a") is None  # expired, and expiry never resurrects
    t.garbage_collect(gc_horizon_us=250)
    after = _rows(sess.execute("SELECT k, v FROM t"))
    assert after == before, (
        "purging the expired winner must take the older v=1 with it"
    )
    # both generations of 'a' are physically gone
    assert t.mutation_log().filter("pk = 'a'").count() == 0


def test_counter_purge(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute("CREATE TABLE c (k text PRIMARY KEY, n counter)")
    t = sess.table("c")
    sess.execute("UPDATE c SET n = n + 5 WHERE k = 'a'")
    sess.execute("DELETE FROM c WHERE k = 'a'")
    sess.execute("UPDATE c SET n = n + 7 WHERE k = 'a'")
    before = {r.k: r.n for r in sess.execute("SELECT k, n FROM c").collect()}
    t.garbage_collect(gc_horizon_us=t._clock + 1)
    after = {r.k: r.n for r in sess.execute("SELECT k, n FROM c").collect()}
    assert after == before == {"a": 7}


op_st = st.tuples(
    st.sampled_from(["w", "w", "w", "d", "ttl"]),
    st.integers(0, 4),
    st.integers(-9, 9),
)
hist_st = st.lists(op_st, min_size=1, max_size=16)


@given(history=hist_st, horizon_i=st.integers(0, 20))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gc_never_changes_the_head_snapshot(
    spark, tmp_path_factory, history, horizon_i
):
    base = tmp_path_factory.mktemp("gc_fuzz")
    sess = CqlSession(spark, spill_dir=str(base))
    sess.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    t = sess.table("t")
    for i, (kind, k, v) in enumerate(history):
        ts = 10 * (i + 1)
        if kind == "w":
            sess.execute(
                f"INSERT INTO t (k, v) VALUES ('k{k}', {v}) "
                f"USING TIMESTAMP {ts}"
            )
        elif kind == "ttl":
            sess.execute(
                f"INSERT INTO t (k, v) VALUES ('k{k}', {v}) "
                f"USING TIMESTAMP {ts} AND TTL 25"
            )
        else:
            sess.execute(f"DELETE FROM t USING TIMESTAMP {ts} WHERE k = 'k{k}'")
        if i % 5 == 4:
            t.flush()
    before = _rows(sess.execute("SELECT k, v FROM t"))
    log_before = t.mutation_log().count()
    stats = t.garbage_collect(gc_horizon_us=10 * horizon_i)
    assert _rows(sess.execute("SELECT k, v FROM t")) == before
    assert stats["kept"] + stats["dropped"] == log_before
    # GC is idempotent at the same horizon
    t.garbage_collect(gc_horizon_us=10 * horizon_i)
    assert _rows(sess.execute("SELECT k, v FROM t")) == before


def test_gc_grace_seconds_option_is_the_default_horizon(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute(
        "CREATE TABLE gg (k text PRIMARY KEY, v int) "
        "WITH gc_grace_seconds = 2"
    )
    t = sess.table("gg")
    assert t.schema.gc_grace_seconds == 2
    ddl = sess.execute("DESCRIBE TABLE gg").collect()[0].create_statement
    assert "gc_grace_seconds = 2" in ddl
    # wall-µs pinned workload: tombstone at now-5s is past a 2s grace
    import time

    now = int(time.time() * 1_000_000)
    sess.execute(
        f"INSERT INTO gg (k, v) VALUES ('a', 1) USING TIMESTAMP {now - 9_000_000}"
    )
    sess.execute(
        f"DELETE FROM gg USING TIMESTAMP {now - 5_000_000} WHERE k = 'a'"
    )
    t._clock = now  # the session clock tracks max writetime ~ wall µs
    stats = t.garbage_collect()  # horizon from gc_grace_seconds
    assert stats["dropped"] == 3 and stats["kept"] == 0
