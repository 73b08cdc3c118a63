"""WITH compression / compaction table options and the sstablemetadata
surface: the CQL compressor classes map onto segment parquet codecs,
SizeTieredCompactionStrategy runs tiered minor compactions, and segment
metadata is served from footers only (SURVEY.md §2.13)."""

from __future__ import annotations

import os

import pytest

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_session import CqlSession


def test_compression_option_sets_segment_codec(spark, tmp_path):
    s = CqlSession(spark, spill_dir=str(tmp_path), spill_threshold=30)
    s.execute(
        "CREATE TABLE z (k text PRIMARY KEY, v text) "
        "WITH compression = {'class': 'ZstdCompressor'}"
    )
    for i in range(80):
        s.execute(f"INSERT INTO z (k, v) VALUES ('k{i}', 'v{i}')")
    t = s.table("z")
    assert t._segments, "should have flushed"
    import pyarrow.parquet as pq

    md = pq.ParquetFile(t._segments[0]).metadata
    assert md.row_group(0).column(0).compression == "ZSTD"
    # reads reconcile exactly as before
    assert s.execute("SELECT count(*) AS n FROM z").collect()[0].n == 80
    # metadata surface reports it (footer-only read)
    meta = {r.generation: r for r in t.sstable_metadata().collect()}
    for r in meta.values():
        assert r.compression == "ZSTD"
        assert r.rows > 0 and r.bytes > 0
        assert r.min_writetime <= r.max_writetime


def test_unknown_compressor_rejected(spark):
    s = CqlSession(spark)
    with pytest.raises(CQLError, match="unsupported compressor"):
        s.execute(
            "CREATE TABLE z (k text PRIMARY KEY) "
            "WITH compression = {'class': 'BrotliCompressor'}"
        )
    with pytest.raises(CQLError, match="SizeTieredCompactionStrategy"):
        s.execute(
            "CREATE TABLE z (k text PRIMARY KEY) "
            "WITH compaction = {'class': 'LeveledCompactionStrategy'}"
        )


def test_stcs_merges_only_full_tiers(spark, tmp_path):
    """Flush N similar-size segments: once a size tier reaches
    min_threshold members they merge into ONE segment (others left
    alone), blooms follow, and the data reconciles identically."""
    s = CqlSession(spark, spill_dir=str(tmp_path), spill_threshold=25)
    s.execute(
        "CREATE TABLE e (k text PRIMARY KEY, n int) WITH compaction = "
        "{'class': 'SizeTieredCompactionStrategy', 'min_threshold': '3'}"
    )
    t = s.table("e")
    seen_multi = False
    for i in range(200):
        s.execute(f"INSERT INTO e (k, n) VALUES ('k{i}', {i})")
        seen_multi = seen_multi or len(t._segments) > 1
    # tiers merged along the way: segment count stays below the flush
    # count (200/25 = 8 flushes) because full tiers collapsed
    assert seen_multi
    assert len(t._segments) < 8
    assert any("stcs" in os.path.basename(p) for p in t._segments)
    # every live segment has a live bloom source and reads stay exact
    rows = {r.k: r.n for r in t.snapshot().collect()}
    assert rows == {f"k{i}": i for i in range(200)}
    assert s.execute("UPDATE e SET n = -1 WHERE k = 'k7' IF n = 7") is True
    # retired pre-merge segments are tracked for GC
    assert t._retired
    t.purge_retired()
    assert not t._retired


def test_describe_round_trips_options(spark):
    s = CqlSession(spark)
    ddl = (
        "CREATE TABLE opts (k text PRIMARY KEY, v int) WITH "
        "default_time_to_live = 60 AND "
        "compression = {'class': 'LZ4Compressor'} AND compaction = "
        "{'class': 'SizeTieredCompactionStrategy', 'min_threshold': '6'}"
    )
    s.execute(ddl)
    out = s.execute("DESCRIBE TABLE opts").collect()[0].create_statement
    assert "default_time_to_live = 60" in out
    assert "compression = {'class': 'LZ4Compressor'}" in out
    assert "'min_threshold': '6'" in out
    # the emitted DDL re-parses to the same options
    s2 = CqlSession(spark)
    s2.execute(out)
    sch = s2.table("opts").schema
    assert sch.compression == "LZ4Compressor"
    assert sch.compaction == "SizeTieredCompactionStrategy"
    assert sch.compaction_min_threshold == 6
    assert sch.default_ttl == 60


def test_alter_table_with_options(spark, tmp_path):
    """ALTER TABLE ... WITH changes future behavior: new segments take
    the new codec, the new default TTL applies to subsequent writes, and
    DESCRIBE reflects the change; bad options rejected."""
    s = CqlSession(spark, spill_dir=str(tmp_path), spill_threshold=20)
    s.execute("CREATE TABLE aw (k text PRIMARY KEY, v text)")
    for i in range(25):
        s.execute(f"INSERT INTO aw (k, v) VALUES ('a{i}', 'x')")
    t = s.table("aw")
    import pyarrow.parquet as pq

    old_codec = pq.ParquetFile(t._segments[0]).metadata.row_group(0).column(0).compression
    assert old_codec == "SNAPPY"
    s.execute(
        "ALTER TABLE aw WITH compression = {'class': 'ZstdCompressor'} "
        "AND default_time_to_live = 7"
    )
    for i in range(25):
        s.execute(f"INSERT INTO aw (k, v) VALUES ('b{i}', 'y')")
    # old segment untouched, new segment on the new codec
    codecs = {
        pq.ParquetFile(p).metadata.row_group(0).column(0).compression
        for p in t._segments
    }
    assert codecs == {"SNAPPY", "ZSTD"}
    assert t.schema.default_ttl == 7
    ddl = s.execute("DESCRIBE TABLE aw").collect()[0].create_statement
    assert "ZstdCompressor" in ddl and "default_time_to_live = 7" in ddl
    with pytest.raises(CQLError, match="unsupported compressor"):
        s.execute("ALTER TABLE aw WITH compression = {'class': 'Nope'}")
    with pytest.raises(CQLError, match="unsupported ALTER TABLE options"):
        s.execute("ALTER TABLE aw WITH read_repair_chance = 0.1")
