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
    assert max(r[5] for r in table._log) + 1 == ASOF


def test_replay_visible_rows(spark):
    got = {
        (r.pk, r.ck): (r.v, r.s)
        for r in w9_dml_replay(spark, "unused").collect()
    }
    assert got == {
        ("a", "3"): (12, "eps"),   # partition tombstone then resurrect
        ("b", "1"): (31, None),    # row tombstone shadows older cells only
        ("c", "1"): (None, "delta"),  # TTL'd winner expired — no resurrect
        ("e", "1"): (None, None),  # INSERT marker outlives its cells
    }
