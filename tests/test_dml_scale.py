"""Bounded driver-log behavior of the CQL DML front-end.

The session front-end accumulates mutations in a Python list; measured
cost is ~1 KB of driver RSS per mutation plus O(N) driver CPU in the
log→DataFrame conversion (numbers pinned in BASELINE.md "DML front-end").
These tests hold the two escape hatches:

- Arrow-batched, chunked ``mutation_log()`` conversion;
- ``spill_dir``: memtable→parquet-segment flush that keeps the in-memory
  list under ``spill_threshold`` forever, with the LWT read phase and
  TRUNCATE/DROP consulting segments correctly.
"""

from __future__ import annotations

import os

from cassandra_spark.cql_dml import CqlTable, TableSchema
from cassandra_spark.cql_session import CqlSession


def _kv_schema() -> TableSchema:
    return TableSchema(
        name="kv",
        partition_key="k",
        clustering=(),
        regular={"v": "string", "n": "int"},
    )


def _workload(n: int):
    """Deterministic INSERT/UPDATE/DELETE mix touching n statements."""
    for i in range(n):
        key = f"k{i % (n // 10 or 1)}"
        if i % 7 == 3:
            yield f"UPDATE kv SET v = 'u{i}' WHERE k = '{key}'"
        elif i % 23 == 11:
            yield f"DELETE FROM kv WHERE k = '{key}'"
        else:
            yield f"INSERT INTO kv (k, v, n) VALUES ('{key}', 'v{i}', {i})"


def test_spill_bounds_driver_log_and_preserves_results(spark, tmp_path):
    """20k mutations with an 1k spill threshold: the in-memory list never
    exceeds the threshold, segments land on disk, and the reconciled
    snapshot is IDENTICAL to an unspilled twin fed the same statements."""
    n = 20_000
    spilled = CqlTable(
        spark, _kv_schema(), spill_dir=str(tmp_path / "seg"),
        spill_threshold=1_000,
    )
    plain = CqlTable(spark, _kv_schema())
    high_water = 0
    for stmt in _workload(n):
        spilled.execute(stmt)
        plain.execute(stmt)
        high_water = max(high_water, len(spilled._log))
    assert high_water <= 1_000, "in-memory log must stay under the threshold"
    assert len(spilled._segments) >= 19, "most of the log should be on disk"
    assert sum(1 for _ in (tmp_path / "seg").glob("*.parquet")) == len(
        spilled._segments
    )

    a = sorted(map(tuple, spilled.snapshot().collect()))
    b = sorted(map(tuple, plain.snapshot().collect()))
    assert a == b
    # the full log row count also survives the segment round-trip
    assert spilled.mutation_log().count() == plain.mutation_log().count()


def test_lwt_reads_flushed_segments(spark, tmp_path):
    """A condition evaluated AFTER a flush must see pre-flush writes: the
    LWT read phase consults parquet segments via a pk-filtered read."""
    t = CqlTable(
        spark, _kv_schema(), spill_dir=str(tmp_path / "seg"),
        spill_threshold=10_000,
    )
    t.execute("INSERT INTO kv (k, v, n) VALUES ('a', 'old', 1)")
    t.execute("INSERT INTO kv (k, v, n) VALUES ('b', 'keep', 2)")
    assert t.flush() is not None and t._log == []

    # IF reads the flushed cell value
    assert t.execute("UPDATE kv SET v = 'new' WHERE k = 'a' IF v = 'old'") is True
    assert t.execute("UPDATE kv SET v = 'x' WHERE k = 'a' IF v = 'old'") is False
    # IF NOT EXISTS sees flushed rows
    assert (
        t.execute("INSERT INTO kv (k, v, n) VALUES ('b', 'no', 9) IF NOT EXISTS")
        is False
    )
    rows = {r.k: r.v for r in t.snapshot().collect()}
    assert rows == {"a": "new", "b": "keep"}


def test_truncate_and_drop_table_remove_segments(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path), spill_threshold=100)
    sess.execute(
        "CREATE TABLE kv (k text PRIMARY KEY, v text, n int)"
    )
    for stmt in _workload(500):
        sess.execute(stmt)
    table = sess.table("kv")
    assert table._segments, "threshold 100 must have flushed"
    seg_paths = list(table._segments)
    sess.execute("TRUNCATE kv")
    assert table._segments == [] and table._log == []
    assert not any(os.path.exists(p) for p in seg_paths)
    assert table.snapshot().count() == 0
    # post-truncate writes are visible (clock stayed monotonic)
    sess.execute("INSERT INTO kv (k, v, n) VALUES ('z', 'back', 1)")
    assert table.snapshot().count() == 1


def test_drop_column_rewrites_segments(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path), spill_threshold=2)
    sess.execute("CREATE TABLE kv (k text PRIMARY KEY, v text, n int)")
    sess.execute("INSERT INTO kv (k, v, n) VALUES ('a', 'va', 1)")
    sess.execute("INSERT INTO kv (k, v, n) VALUES ('b', 'vb', 2)")
    table = sess.table("kv")
    assert table._segments
    sess.execute("ALTER TABLE kv DROP n")
    log = table.mutation_log().collect()
    assert all(r.col != "n" for r in log)
    rows = {r.k: r.v for r in table.snapshot().collect()}
    assert rows == {"a": "va", "b": "vb"}


def test_mutation_log_chunked_conversion_matches(spark):
    """The chunked Arrow conversion must reproduce the exact log, chunk
    boundaries included."""
    t = CqlTable(spark, _kv_schema())
    t._ARROW_CHUNK = 7  # force many chunks
    for stmt in _workload(100):
        t.execute(stmt)
    got = t.mutation_log().collect()
    assert len(got) == len(t._log)
    assert sorted(r[8] for r in got) == list(range(1, len(got) + 1))
    # exact row-for-row equality with the in-memory log
    assert sorted(map(tuple, got), key=lambda r: r[8]) == sorted(
        t._log, key=lambda r: r[8]
    )


def test_compact_segments_preserves_history(spark, tmp_path):
    """Minor compaction of the spill segments: N files merge into one with
    the mutation history byte-identical (snapshot AND an asof snapshot
    unchanged), and LWT reads keep working against the compacted file."""
    t = CqlTable(
        spark, _kv_schema(), spill_dir=str(tmp_path / "seg"),
        spill_threshold=500,
    )
    for stmt in _workload(5_000):
        t.execute(stmt)
    assert len(t._segments) >= 8
    before = sorted(map(tuple, t.snapshot().collect()))
    before_asof = sorted(map(tuple, t.snapshot(asof_us=2_000).collect()))
    log_before = t.mutation_log().count()

    path = t.compact_segments()
    assert path is not None and t._segments == [path]
    assert t.mutation_log().count() == log_before
    assert sorted(map(tuple, t.snapshot().collect())) == before
    assert sorted(map(tuple, t.snapshot(asof_us=2_000).collect())) == before_asof

    # LWT read phase consults the compacted segment
    k = before[0][0]
    assert (
        t.execute(f"INSERT INTO kv (k, v, n) VALUES ('{k}', 'x', 1) IF NOT EXISTS")
        is False
    )
    # compacting a single segment is a no-op
    assert t.compact_segments() is None


def test_lazy_readers_survive_compaction(spark, tmp_path):
    """A snapshot()/mutation_log() DataFrame is lazy: the files it listed
    must stay readable after a later (implicitly write-triggered)
    compaction. Compaction retires superseded segments instead of deleting
    them; purge_retired() is the explicit GC point."""
    t = CqlTable(
        spark, _kv_schema(), spill_dir=str(tmp_path / "seg"),
        spill_threshold=200, compact_threshold=4,
    )
    for stmt in _workload(1_000):
        t.execute(stmt)
    t.execute("INSERT INTO kv (k, v, n) VALUES ('post', 'p', 1)")
    t.flush()  # ensure a second live segment beside any auto-compacted one
    assert len(t._segments) >= 2
    snap_before = t.snapshot()          # lazy — not collected yet
    log_before = t.mutation_log()       # lazy
    expected = sorted(map(tuple, t.snapshot().collect()))
    expected_log = t.mutation_log().count()

    path = t.compact_segments()
    assert path is not None and t._retired
    # the pre-compaction plans still execute (files retired, not removed)
    assert sorted(map(tuple, snap_before.collect())) == expected
    assert log_before.count() == expected_log

    # purge is the GC point: retired files disappear, live reads unaffected
    removed = t.purge_retired()
    assert removed > 0 and not t._retired
    assert sorted(map(tuple, t.snapshot().collect())) == expected


def test_cdc_glob_excludes_compacted_generations(spark, tmp_path):
    """The CDC feed reads only the immutable -seg* flush files: after a
    compaction (which writes a -compact* generation and retires the old
    files in place), an availableNow drain over the same directory must
    deliver each flushed mutation exactly once — no re-delivery from the
    merged file, no FileNotFoundException from a deleted one."""
    from cassandra_spark.streaming.jobs import cdc_stream, run_available_now

    t = CqlTable(
        spark, _kv_schema(), spill_dir=str(tmp_path / "cdcseg"),
        spill_threshold=200,
    )
    t.schema.cdc = True  # the feed is gated on WITH cdc = true
    for stmt in _workload(1_000):
        t.execute(stmt)
    t.flush()
    flushed = t.mutation_log().count()
    assert t.compact_segments() is not None  # -compact* now on disk too
    run_available_now(cdc_stream(spark, t), "cdc_compact_t", output_mode="append")
    assert spark.sql("SELECT count(*) c FROM cdc_compact_t").collect()[0].c == flushed


def test_auto_compaction_bounds_segment_count(spark, tmp_path):
    t = CqlTable(
        spark, _kv_schema(), spill_dir=str(tmp_path / "seg"),
        spill_threshold=100, compact_threshold=5,
    )
    plain = CqlTable(spark, _kv_schema())
    for stmt in _workload(3_000):
        t.execute(stmt)
        plain.execute(stmt)
    assert len(t._segments) < 5 + 1, "auto-compaction must bound segments"
    assert sorted(map(tuple, t.snapshot().collect())) == sorted(
        map(tuple, plain.snapshot().collect())
    )


def test_spill_is_default_on_with_auto_dir(spark):
    """No spill_dir configured: crossing the threshold auto-provisions a
    temp dir and flushes — the O(threshold) bound holds BY DEFAULT."""
    t = CqlTable(spark, _kv_schema(), spill_threshold=500)
    plain = CqlTable(spark, _kv_schema(), spill_threshold=None)
    high_water = 0
    for stmt in _workload(5_000):
        t.execute(stmt)
        plain.execute(stmt)
        high_water = max(high_water, len(t._log))
    assert high_water <= 500
    assert t.spill_dir is not None and len(t._segments) >= 1
    assert os.path.isdir(t.spill_dir)
    assert sorted(map(tuple, t.snapshot().collect())) == sorted(
        map(tuple, plain.snapshot().collect())
    )


def test_spill_opt_out_keeps_log_in_memory(spark):
    """spill_threshold=None is the explicit opt-out: the log grows
    unbounded in memory and nothing lands on disk."""
    t = CqlTable(spark, _kv_schema(), spill_threshold=None)
    for stmt in _workload(2_000):
        t.execute(stmt)
    assert t.spill_dir is None and not t._segments
    assert len(t._log) >= 2_000


def test_session_auto_spill_threads_through_tables(spark):
    """CqlSession without spill_dir still bounds every table's log."""
    sess = CqlSession(spark, spill_threshold=300)
    sess.execute(
        "CREATE TABLE s_auto (k text PRIMARY KEY, v text, n int)"
    )
    for i in range(1_000):
        sess.execute(
            f"INSERT INTO s_auto (k, v, n) VALUES ('k{i % 50}', 'v{i}', {i})"
        )
    t = sess.table("s_auto")
    assert len(t._log) <= 300 and len(t._segments) >= 1
    assert t.spill_dir is not None
