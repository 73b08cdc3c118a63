"""Distributed compaction merges (input bytes >= distributed_merge_bytes
run as one Spark job): read-equivalence with the driver pyarrow path,
UCS shard invariants under the range-partitioned writer, STCS N->1
contract, history recording, and the never-whole-droppable safe default
for stamp-less executor-written segments."""

from __future__ import annotations

from cassandra_spark.cql_session import CqlSession


def _fill(sess, tbl, n=60, flushes=3):
    t = sess.table(tbl)
    per = n // flushes
    i = 0
    for _ in range(flushes):
        for _ in range(per):
            sess.execute(f"INSERT INTO {tbl} (k, v) VALUES ('k{i:04d}', {i})")
            i += 1
        t.flush()
    return t, i


def test_spark_merge_equals_driver_merge(spark, tmp_path):
    a = CqlSession(spark, spill_dir=str(tmp_path / "a"))
    a.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    ta, n = _fill(a, "t")
    ta.compact_segments()  # driver path (default threshold)

    b = CqlSession(spark, spill_dir=str(tmp_path / "b"))
    b.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    tb, _ = _fill(b, "t")
    tb.distributed_merge_bytes = 1  # force the Spark path
    path = tb.compact_segments()
    assert path is not None and tb._segments == [path]
    assert "-compact" in path  # canonical segment naming preserved
    ra = {r.k: r.v for r in a.execute("SELECT k, v FROM t").collect()}
    rb = {r.k: r.v for r in b.execute("SELECT k, v FROM t").collect()}
    assert ra == rb == {f"k{i:04d}": i for i in range(n)}
    rec = tb.compaction_history[-1]
    assert rec[1] == "compact" and rec[3] == 3 and rec[4] == 1
    assert rec[7] == rec[8] == 2 * n  # marker + cell per insert, kept

    # LWT read phase consults the executor-written segment (bloom
    # rebuilds lazily, the bulk_load precedent)
    assert (
        b.execute("INSERT INTO t (k, v) VALUES ('k0000', 9) IF NOT EXISTS")
        is False
    )


def test_spark_sharded_ucs_merge_invariants(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute(
        "CREATE TABLE u (k text PRIMARY KEY, v int) WITH compaction = "
        "{'class': 'UnifiedCompactionStrategy', 'scaling_parameters': "
        "'T3', 'target_sstable_size': '2KiB'}"
    )
    t, n = _fill(sess, "u", n=120, flushes=3)
    t.distributed_merge_bytes = 1
    created = t.ucs_compact()
    assert len(created) >= 2, "byte budget must shard the Spark output"
    assert all(t._seg_level[p] == 1 for p in created)
    ranges = sorted(t._seg_token_range(p) for p in created)
    for (alo, ahi), (blo, bhi) in zip(ranges, ranges[1:]):
        assert ahi < blo, f"shard token ranges overlap: {ranges}"
    # whole-partition rule: every pk in exactly one shard
    import pyarrow.parquet as pq

    seen = {}
    for p in created:
        for pk in set(
            pq.read_table(p, columns=["pk"]).column("pk").to_pylist()
        ):
            assert pk not in seen
            seen[pk] = p
    assert len(seen) == n
    # disjoint shards = singleton runs: a second pass is a no-op
    assert t.ucs_compact() == []
    got = {r.k: r.v for r in sess.execute("SELECT k, v FROM u").collect()}
    assert got == {f"k{i:04d}": i for i in range(n)}


def test_spark_merged_segment_is_never_whole_droppable(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    t, _ = _fill(sess, "t", n=20, flushes=2)
    t.distributed_merge_bytes = 1
    t.compact_segments()
    # executor-written segments carry no max-deletion stamp: they read
    # as -1 = some row can never expire (safe TWCS whole-drop default)
    _, _, mdl = t._seg_stats(t._segments[0])
    assert mdl == -1
    # ...but writetime row-group statistics survive (TWCS bucketing)
    mn, mx, _ = t._seg_stats(t._segments[0])
    assert mn is not None and mx is not None and mn <= mx
