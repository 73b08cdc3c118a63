"""Differential fuzz for the round-9 session additions.

- UCS layout-independence: a random insert/delete history with random
  flush points under a random UnifiedCompactionStrategy configuration,
  compacted, must read exactly like the same statements executed in a
  memtable-only session — compaction strategy and segment layout are
  invisible to LWW semantics (the same property the STCS/TWCS/LCS
  suites pin pointwise; here Hypothesis drives the history).

- PITR prefix equivalence: statements carry strictly increasing pinned
  timestamps; for a random cut j, ``snapshot_pitr(ts_j)`` on the full
  (flushed, compacted) table must equal the plain snapshot of a fresh
  session that executed only the first j+1 statements — the defining
  property of commitlog-replay-to-a-timestamp."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_spark.cql_session import CqlSession

op_st = st.tuples(
    st.sampled_from(["w", "w", "w", "d"]),  # writes dominate
    st.integers(0, 5),  # key
    st.integers(-50, 50),  # value (ignored for deletes)
    st.booleans(),  # flush after this statement?
)
history_st = st.lists(op_st, min_size=1, max_size=18)


def _run(sess, history, pinned=False, upto=None):
    t = None
    for i, (kind, k, v, flush) in enumerate(history):
        if upto is not None and i > upto:
            break
        using = f" USING TIMESTAMP {10 * (i + 1)}" if pinned else ""
        if kind == "w":
            sess.execute(
                f"INSERT INTO t (k, v) VALUES ('k{k}', {v}){using}"
            )
        else:
            sess.execute(f"DELETE FROM t{using} WHERE k = 'k{k}'")
        if flush:
            t = sess.table("t")
            t.flush()
    return sess


def _rows(df):
    return {r.k: r.v for r in df.collect()}


@given(
    history=history_st,
    scaling=st.sampled_from(["T2", "T3", "L4", "N", "T2, L4"]),
    distributed=st.booleans(),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ucs_layout_invisible_to_lww(
    spark, tmp_path_factory, history, scaling, distributed
):
    base = tmp_path_factory.mktemp("ucs_fuzz")
    ucs = CqlSession(spark, spill_dir=str(base / "ucs"))
    ucs.execute(
        "CREATE TABLE t (k text PRIMARY KEY, v int) WITH compaction = "
        "{'class': 'UnifiedCompactionStrategy', 'scaling_parameters': '"
        + scaling + "', 'target_sstable_size': '1KiB'}"
    )
    _run(ucs, history)
    ucs.table("t").flush()
    if distributed:  # force the Spark merge path
        ucs.table("t").distributed_merge_bytes = 1
    ucs.table("t").ucs_compact()

    plain = CqlSession(spark, spill_dir=str(base / "plain"))
    plain.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    _run(plain, history)

    q = "SELECT k, v FROM t"
    assert _rows(ucs.execute(q)) == _rows(plain.execute(q))


@given(history=history_st, cut=st.integers(0, 17))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pitr_equals_prefix_replay(spark, tmp_path_factory, history, cut):
    cut = min(cut, len(history) - 1)
    base = tmp_path_factory.mktemp("pitr_fuzz")
    full = CqlSession(spark, spill_dir=str(base / "full"))
    full.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    _run(full, history, pinned=True)
    t = full.table("t")
    t.flush()
    t.compact_segments()

    prefix = CqlSession(spark, spill_dir=str(base / "prefix"))
    prefix.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    _run(prefix, history, pinned=True, upto=cut)

    got = _rows(t.snapshot_pitr(10 * (cut + 1)).select("k", "v"))
    want = _rows(prefix.execute("SELECT k, v FROM t"))
    assert got == want
