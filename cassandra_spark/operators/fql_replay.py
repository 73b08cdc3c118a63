"""w20: full-query-log record → replay — the reference's FQL workflow
(`[C* fql/FullQueryLogger, tools/fqltool replay, unverified]`) driven
end-to-end under the oracle gate.

A live session records every executed statement (DDL included, prepared
statements with values bound — see CqlSession.enable_fql); the log is then
replayed verbatim into a FRESH session, and the query returns the REPLAYED
session's reconciled table. The oracle is w9's: the same mutation-log
reconcile in DuckDB. Passing therefore proves the full loop — parse →
log → re-parse → re-execute — reproduces bit-identical state, which is
exactly the property `fqltool replay` exists to check before an upgrade.

Determinism: logical clocks are per-table, seeded at table creation, and
tick once per statement, so an unpinned-timestamp workload replays to the
same writetimes; explicit USING TIMESTAMP statements carry their own.

Scale posture: the log is driver-side O(statements) text (spill-bounded
sessions flush mutations, not the FQL text — a production FQL sink is an
append-only file the driver rotates, the reference's binlog). Replay cost
equals original execution cost; the snapshot reconcile is the same
distributed LWW plan w9 measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_spark.cql_session import CqlSession
from cassandra_spark.operators.dml_replay import DML_SCRIPT, _ORACLE
from cassandra_spark.registry import query

KV_DDL = (
    "CREATE TABLE kv (pk text, ck text, v int, s text, st text STATIC, "
    "PRIMARY KEY (pk, ck))"
)


@query("w20_fql_replay", oracle=_ORACLE)
def w20_fql_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record w9's statement script through a logging session, replay the
    log into a fresh session, return the replayed table's visible rows
    (fixture-independent — ``sf_dir`` unused by construction)."""
    recorded = CqlSession(spark)
    recorded.enable_fql()
    recorded.execute(KV_DDL)
    for stmt in DML_SCRIPT:
        recorded.execute(stmt)

    replayed = CqlSession(spark)
    n = recorded.fql_replay(replayed)
    assert n == len(DML_SCRIPT) + 1  # DDL + every DML statement logged
    return (
        replayed.table("kv").snapshot().select("pk", "ck", "v", "s", "st")
    )
