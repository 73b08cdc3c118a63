"""Per-segment partition-key Bloom filters (the SSTable Filter.db
analogue): unit properties of the filter itself, and the read-path
integration — point reads skip definitely-absent segments, and the
skip NEVER changes an answer (SURVEY.md §2.13)."""

from __future__ import annotations

import os

import pytest

from cassandra_spark.operators.bloom import (
    BloomFilter,
    bloom_for_segment,
    sidecar_path,
)


def test_bloom_no_false_negatives():
    keys = [f"user{i}" for i in range(500)]
    bf = BloomFilter.for_keys(keys)
    assert all(bf.might_contain(k) for k in keys)
    # None key (static-row partitions) is a first-class member
    bf2 = BloomFilter.for_keys([None, "a"])
    assert bf2.might_contain(None) and bf2.might_contain("a")


def test_bloom_fp_rate_near_nominal():
    keys = [f"k{i}" for i in range(2000)]
    bf = BloomFilter.for_keys(keys, fp=0.01)
    probes = [f"absent{i}" for i in range(20000)]
    fp = sum(bf.might_contain(p) for p in probes) / len(probes)
    assert fp < 0.03  # 1% nominal; generous CI bound


def test_bloom_roundtrip_and_double_hashing(tmp_path):
    from cassandra_spark.operators.murmur3 import murmur3_x64_128

    bf = BloomFilter.for_keys(["x", "y", "z"])
    path = str(tmp_path / "f.bloom")
    bf.save(path)
    lf = BloomFilter.load(path)
    assert (lf.m, lf.k, bytes(lf.bits)) == (bf.m, bf.k, bytes(bf.bits))
    # probe positions are Kirsch-Mitzenmacher over the Murmur3-128 halves
    h1, h2 = murmur3_x64_128(b"x")
    assert list(bf._positions(b"x")) == [
        (h1 + i * h2) % bf.m for i in range(bf.k)
    ]


def test_point_reads_skip_absent_segments(spark, tmp_path):
    """Sequentially-flushed segments hold disjoint key ranges; an LWT
    condition read for a late key must bloom-skip the early segments and
    still return the exact same answer as an unfiltered session."""
    from cassandra_spark.cql_session import CqlSession

    sess = CqlSession(
        spark, spill_dir=str(tmp_path / "spill"), spill_threshold=50
    )
    sess.execute("CREATE TABLE kv (k text PRIMARY KEY, v text, n int)")
    for i in range(300):
        sess.execute(f"INSERT INTO kv (k, v, n) VALUES ('key{i}', 'v{i}', {i})")
    t = sess.table("kv")
    assert len(t._segments) >= 3  # several flushed generations
    for p in t._segments:
        assert os.path.exists(sidecar_path(p))  # Filter.db persisted

    # LWT read of a key that lives in the LAST segment only
    before = dict(t.bloom_stats)
    applied = sess.execute(
        "UPDATE kv SET v = 'upd' WHERE k = 'key299' IF n = 299"
    )
    assert applied is True
    assert t.bloom_stats["checked"] > before["checked"]
    assert t.bloom_stats["skipped"] > before["skipped"]

    # the skipped read is still CORRECT: reconcile the full table
    rows = {r.k: r.v for r in t.snapshot().collect()}
    assert rows["key299"] == "upd"
    assert rows["key0"] == "v0"
    assert len(rows) == 300


def test_bloom_survives_compaction_and_truncate(spark, tmp_path):
    from cassandra_spark.cql_session import CqlSession

    sess = CqlSession(
        spark, spill_dir=str(tmp_path / "spill"), spill_threshold=20
    )
    sess.execute("CREATE TABLE kv (k text PRIMARY KEY, v text)")
    for i in range(100):
        sess.execute(f"INSERT INTO kv (k, v) VALUES ('c{i}', 'v{i}')")
    t = sess.table("kv")
    t.compact_segments()
    assert len(t._segments) == 1
    assert os.path.exists(sidecar_path(t._segments[0]))
    # compacted bloom covers every key ever flushed
    bf = t._bloom_for(t._segments[0])
    flushed = {f"c{i}" for i in range(100)} - {
        r[0] for r in t._log
    }  # tail still in memory is not in segments
    assert all(bf.might_contain(k) for k in flushed)
    # LWT against the compacted generation answers correctly
    assert sess.execute("UPDATE kv SET v = 'x' WHERE k = 'c3' IF EXISTS")
    seg_dir = os.path.dirname(t._segments[0])
    sess.execute("TRUNCATE kv")
    assert t._segments == [] and t._blooms == {}
    assert not [f for f in os.listdir(seg_dir) if f.endswith(".bloom")]


def test_bloom_rebuilds_after_restore(spark, tmp_path):
    """Keyspace restore re-attaches segments; sidecars ride along, and
    even with sidecars DELETED the lazy rebuild path serves point reads
    correctly (never-wrong-only-slower)."""
    from cassandra_spark.cql_session import CqlSession

    sess = CqlSession(
        spark, spill_dir=str(tmp_path / "spill"), spill_threshold=40
    )
    sess.execute("CREATE TABLE kv (k text PRIMARY KEY, n int)")
    for i in range(200):
        sess.execute(f"INSERT INTO kv (k, n) VALUES ('r{i}', {i})")
    snap = str(tmp_path / "snap")
    sess.snapshot_keyspace(snap)

    sess2 = CqlSession(spark, spill_dir=str(tmp_path / "spill2"))
    sess2.restore_keyspace(snap)
    t2 = sess2.table("kv")
    assert len(t2._segments) >= 2
    # restored sidecars present (copied with the segments)
    assert all(os.path.exists(sidecar_path(p)) for p in t2._segments)
    # now delete them: reads must rebuild lazily and stay correct
    for p in t2._segments:
        os.remove(sidecar_path(p))
    t2._blooms.clear()
    assert sess2.execute("UPDATE kv SET n = -1 WHERE k = 'r7' IF n = 7")
    rows = {r.k: r.n for r in t2.snapshot().collect()}
    assert rows["r7"] == -1 and rows["r8"] == 8 and len(rows) == 200
    assert t2.bloom_stats["checked"] > 0
