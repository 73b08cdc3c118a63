"""Source seam: connector detection and the gated error path (SURVEY.md
§2.1 Src2 — jar absent in this container by design)."""

from __future__ import annotations

import pytest

from cassandra_spark.catalog import Catalog
from cassandra_spark.sources import (
    connector_available,
    read_cassandra_table,
    write_cassandra_table,
)
from tests.conftest import SF_SMOKE


def test_connector_absent_detected(spark):
    assert connector_available(spark) is False


def test_read_seam_raises_with_instructions(spark):
    with pytest.raises(NotImplementedError, match="--packages"):
        read_cassandra_table(spark, "ks", "t")


def test_write_seam_raises_with_instructions(spark):
    df = Catalog(spark, SF_SMOKE).nation
    with pytest.raises(NotImplementedError, match="--packages"):
        write_cassandra_table(df, "ks", "t")


# --- the seam EXECUTES against a stand-in DataSource (round-8) -----------
#
# The real format string stays hard-gated above; here the classpath probe
# and format name are patched to a tiny in-test Python DataSource (the
# DSv2 registration path the connector itself uses), so the read/write
# option plumbing — keyspace/table options, mode mapping, load/save
# round-trip — executes rather than stopping at the raise.

def _fake_source(sink_path: str):
    import json
    from dataclasses import dataclass, field

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclass
    class _Msg(WriterCommitMessage):
        rows: list = field(default_factory=list)

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.options = options

        def read(self, partition):
            # surface the options the seam passed, as data — the test
            # asserts the keyspace/table plumbing arrived intact
            yield (self.options.get("keyspace"), self.options.get("table"), 1)

    class _Writer(DataSourceWriter):
        def __init__(self, options, overwrite):
            self.options = dict(options)
            self.mode = "overwrite" if overwrite else "append"

        def write(self, rows):
            # executor-side: ship the rows to the driver via the commit
            # message (the DSv2 task→driver channel)
            return _Msg(rows=[tuple(r) for r in rows])

        def commit(self, messages):
            # driver-side: persist what arrived, plus the seam's options
            out = {
                "rows": sorted(r for m in messages for r in m.rows),
                "mode": self.mode,
                "options": self.options,
            }
            with open(sink_path, "w") as fh:
                json.dump(out, fh)

        def abort(self, messages):
            pass

    class FakeCassandra(DataSource):
        @classmethod
        def name(cls):
            return "fake_cassandra"

        def schema(self):
            return "keyspace string, tbl string, n int"

        def reader(self, schema):
            return _Reader(self.options)

        def writer(self, schema, overwrite):
            return _Writer(self.options, overwrite)

    return FakeCassandra


def test_read_plumbing_executes_against_fake_source(
    spark, monkeypatch, tmp_path
):
    import cassandra_spark.sources as src

    spark.dataSource.register(_fake_source(str(tmp_path / "sink.json")))
    monkeypatch.setattr(src, "CASSANDRA_FORMAT", "fake_cassandra")
    monkeypatch.setattr(src, "connector_available", lambda s: True)
    df = src.read_cassandra_table(spark, "media", "events")
    rows = df.collect()
    assert [tuple(r) for r in rows] == [("media", "events", 1)], (
        "keyspace/table options must reach the DataSource"
    )
    assert df.columns == ["keyspace", "tbl", "n"]


def test_write_plumbing_executes_against_fake_source(
    spark, monkeypatch, tmp_path
):
    import json

    import cassandra_spark.sources as src

    sink = tmp_path / "sink.json"
    spark.dataSource.register(_fake_source(str(sink)))
    monkeypatch.setattr(src, "CASSANDRA_FORMAT", "fake_cassandra")
    monkeypatch.setattr(src, "connector_available", lambda s: True)
    df = spark.createDataFrame(
        [("media", "events", 7), ("media", "events", 8)],
        "keyspace string, tbl string, n int",
    )
    src.write_cassandra_table(df, "media", "events")
    got = json.loads(sink.read_text())
    assert sorted(map(tuple, got["rows"])) == [
        ("media", "events", 7), ("media", "events", 8)
    ]
    assert got["mode"] == "append", (
        "append is the only Cassandra-semantics mode (every write upserts)"
    )
    assert got["options"].get("keyspace") == "media"
    assert got["options"].get("table") == "events"


def test_real_format_still_hard_gated(spark):
    # patching nothing: the production format string must still raise
    import cassandra_spark.sources as src

    assert src.CASSANDRA_FORMAT == "org.apache.spark.sql.cassandra"
    with pytest.raises(NotImplementedError, match="--packages"):
        src.read_cassandra_table(spark, "ks", "t")
