"""w9_dml_replay: pin parser output ≡ the oracle's VALUES literal, so the
Spark and DuckDB reconciles provably consume identical mutation logs."""

from __future__ import annotations

from cassandra_spark.cql_dml import CqlTable
from cassandra_spark.operators.dml_replay import (
    ASOF,
    DML_SCRIPT,
    EXPECTED_LOG,
    KV_SCHEMA,
    w9_dml_replay,
)


def test_script_compiles_to_pinned_log(spark):
    table = CqlTable(spark, KV_SCHEMA)
    for stmt in DML_SCRIPT:
        table.execute(stmt)
    assert tuple(table._log) == EXPECTED_LOG
    assert max(r[6] for r in table._log) + 1 == ASOF


def test_replay_visible_rows(spark):
    got = {
        (r.pk, r.ck): (r.v, r.s, r.st)
        for r in w9_dml_replay(spark, "unused").collect()
    }
    assert got == {
        # partition tombstone then resurrect; static written after the tomb
        ("a", "3"): (12, "eps", "own-a"),
        # row tombstone shadows older cells only; static written then deleted
        ("b", "1"): (31, None, None),
        ("c", "1"): (None, "delta", None),  # TTL'd winner expired — no resurrect
        ("e", "1"): (None, None, None),  # INSERT marker outlives its cells
        # static-only partition: one NULL-clustering row
        ("f", None): (None, None, "own-f"),
        ("g", "1"): (71, None, None),   # below the range tombstone's slice
        # in the deleted slice, but written after the range tombstone
        ("g", "3"): (74, None, None),
        ("h", "1"): (80, "json-row", None),  # INSERT JSON
        ("h", "2"): (81, None, None),  # DEFAULT NULL tombstoned s
    }
