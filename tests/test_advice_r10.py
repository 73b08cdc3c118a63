"""Round-10 ADVICE pins.

1. (medium) garbage_collect's expired-TTL group purge keys on EXPIRY
   (wt + ttl = the reference's localDeletionTime), not write time: a
   cell with wt < horizon < wt+ttl is still live after the horizon and
   must stay PITR-restorable through GC.
2. (low) shadow-drops and post-horizon PITR: the documented contract is
   "PITR before the newest covering tombstone may be lossy" — pinned
   both ways (lossy below the tombstone, exact at/after it).
3. (low) _spark_write_merge removes its -dist-<uuid> temp dir even
   though Spark leaves _SUCCESS/.crc markers behind.
4. (low) UCS target_sstable_size accepts only binary units (KiB/MiB/
   GiB); the decimal spellings raise instead of silently aliasing.
"""

from __future__ import annotations

import os

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_session import CqlSession


def _pitr(t, ts):
    return {r.k: r.v for r in t.snapshot_pitr(ts).collect()}


def test_gc_ttl_purge_gates_on_expiry_not_writetime(spark, tmp_path):
    """wt=200, ttl=50 → expiry 250. A horizon at 230 (wt < horizon <
    expiry) must NOT purge the group: PITR at 240 still sees the live
    cell. Only a horizon past the expiry purges."""
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    t = sess.table("t")
    sess.execute("INSERT INTO t (k, v) VALUES ('a', 1) USING TIMESTAMP 100")
    sess.execute(
        "INSERT INTO t (k, v) VALUES ('a', 2) USING TIMESTAMP 200 AND TTL 50"
    )
    # the logical clock ticks once per statement: push it past expiry
    for i in range(260):
        sess.execute(f"INSERT INTO t (k, v) VALUES ('pad{i % 3}', {i})")
    assert _pitr(t, 240).get("a") == 2
    t.garbage_collect(gc_horizon_us=230)
    assert t.mutation_log().filter("pk = 'a'").count() > 0
    assert _pitr(t, 240).get("a") == 2, (
        "PITR between horizon and expiry must survive GC"
    )
    assert _pitr(t, 150).get("a") == 1
    t.garbage_collect(gc_horizon_us=251)  # expiry 250 < 251: purge
    assert t.mutation_log().filter("pk = 'a'").count() == 0


def test_gc_shadow_drop_pitr_contract(spark, tmp_path):
    """insert@100, delete@400, horizon=200: the shadowed insert drops
    (young-tombstone shadow drop, the reference's compaction rule), so
    PITR(300) is lossy — and PITR at/after the covering tombstone (400)
    stays exact. Both directions of the documented contract."""
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    t = sess.table("t")
    sess.execute("INSERT INTO t (k, v) VALUES ('a', 1) USING TIMESTAMP 100")
    sess.execute("DELETE FROM t USING TIMESTAMP 400 WHERE k = 'a'")
    assert _pitr(t, 300) == {"a": 1}
    before_at_tomb = _pitr(t, 400)
    t.garbage_collect(gc_horizon_us=200)
    assert _pitr(t, 300) == {}, "below the covering tombstone: lossy"
    assert _pitr(t, 400) == before_at_tomb == {}
    assert _pitr(t, 500) == {}


def test_spark_write_merge_cleans_its_temp_dir(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute("CREATE TABLE t (k text PRIMARY KEY, v int)")
    t = sess.table("t")
    for i in range(40):
        sess.execute(f"INSERT INTO t (k, v) VALUES ('k{i:03d}', {i})")
        if i % 10 == 9:
            t.flush()
    t.distributed_merge_bytes = 1
    t.compact_segments()
    leaks = [d for d in os.listdir(tmp_path) if "-dist-" in d]
    assert leaks == [], f"leaked distributed-merge temp dirs: {leaks}"


def test_ucs_decimal_units_rejected(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    for bad in ("2KB", "2MB", "1GB"):
        with pytest.raises(CQLError, match="binary units"):
            sess.execute(
                "CREATE TABLE bad (k text PRIMARY KEY, v int) WITH "
                "compaction = {'class': 'UnifiedCompactionStrategy', "
                f"'target_sstable_size': '{bad}'}}"
            )
    sess.execute(
        "CREATE TABLE ok (k text PRIMARY KEY, v int) WITH compaction = "
        "{'class': 'UnifiedCompactionStrategy', "
        "'target_sstable_size': '2MiB'}"
    )
    assert sess.table("ok").schema.ucs_target_bytes == 2 << 20
