"""w9: CQL DML replay — the cql_dml front-end driven end-to-end under the
oracle gate.

A fixed, deterministic CQL statement script (INSERT / UPDATE / DELETE /
BATCH / USING TIMESTAMP / USING TTL / range DELETE / static columns) runs
through :mod:`cassandra_spark.cql_dml`; the query returns the reconciled
visible table. The oracle is NOT a hard-coded answer: it re-derives the
result in DuckDB by running the SAME LWW reconcile (per-cell window winner
→ tombstone shadowing incl. range tombstones → TTL expiry → static join →
wide pivot) over the mutation log the parser provably emits for the script
(``tests/test_dml_replay.py`` pins log ≡ VALUES literal, so the two
engines reconcile identical inputs).

This closes the loop on SURVEY.md §2.9: the W-tier semantics are checked
not just as batch operators over fixtures but as the product of real
statement text — reference lifecycle `[C* cql3/statements/
ModificationStatement → db/Mutation → read-path reconcile, unverified]`.
Range-tombstone scope per `[C* db/RangeTombstone, unverified]`; static
cells per `[C* schema/ColumnMetadata#isStatic, unverified]`.

Scale posture: the statement log here is tiny by construction (DML arrives
row-at-a-time; this query pins semantics, not throughput). The 100 TB form
of the same reconcile is operators/compaction.py (bucketed LWW merge) and
streaming/jobs.streaming_upsert (continuous micro-batch folding) — all
three share the W4 ordering (writetime desc, tombstone beats write, arrival
seq) so a correctness proof here transfers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_spark.cql_dml import CqlTable, TableSchema, mut_row
from cassandra_spark.dml_oracle import dml_oracle_sql
from cassandra_spark.registry import query

# Deterministic script: every statement either carries USING TIMESTAMP or
# relies on the table's logical clock (1 tick per statement — reproducible).
DML_SCRIPT: tuple[str, ...] = (
    "INSERT INTO kv (pk, ck, v, s) VALUES ('a', '1', 10, 'alpha')",
    "INSERT INTO kv (pk, ck, v, s) VALUES ('a', '2', 20, 'beta')",
    "INSERT INTO kv (pk, ck, v) VALUES ('b', '1', 30)",
    "UPDATE kv SET v = 11 WHERE pk = 'a' AND ck = '1'",
    # stale explicit timestamp: arrives later, must lose
    "UPDATE kv USING TIMESTAMP 2 SET v = 99 WHERE pk = 'a' AND ck = '1'",
    "UPDATE kv SET s = 'gamma' WHERE pk = 'b' AND ck = '1'",
    "BEGIN BATCH "
    "INSERT INTO kv (pk, ck, v) VALUES ('c', '1', 40); "
    "UPDATE kv SET s = 'delta' WHERE pk = 'c' AND ck = '1'; "
    "APPLY BATCH",
    "DELETE s FROM kv WHERE pk = 'a' AND ck = '2'",
    "DELETE FROM kv WHERE pk = 'b' AND ck = '1'",
    "UPDATE kv SET v = 31 WHERE pk = 'b' AND ck = '1'",
    # TTL 2 ticks: expired at the default asof → cell gone, no resurrect
    "UPDATE kv USING TTL 2 SET v = 77 WHERE pk = 'c' AND ck = '1'",
    "UPDATE kv SET v = 50 WHERE pk = 'd' AND ck = '1'",
    "DELETE v FROM kv WHERE pk = 'd' AND ck = '1'",
    "INSERT INTO kv (pk, ck, v) VALUES ('e', '1', 60)",
    "DELETE v FROM kv WHERE pk = 'e' AND ck = '1'",
    "DELETE FROM kv WHERE pk = 'a'",
    "INSERT INTO kv (pk, ck, v, s) VALUES ('a', '3', 12, 'eps')",
    # --- static cells: partition-scoped, LWW per (pk, col) ----------------
    "UPDATE kv SET st = 'own-a' WHERE pk = 'a'",
    # static-only INSERT: the partition is visible with NULL clustering
    "INSERT INTO kv (pk, st) VALUES ('f', 'own-f')",
    "UPDATE kv SET st = 'own-b' WHERE pk = 'b'",
    "DELETE st FROM kv WHERE pk = 'b'",
    # --- range tombstones: clustering slice deletes -----------------------
    "INSERT INTO kv (pk, ck, v) VALUES ('g', '1', 71)",
    "INSERT INTO kv (pk, ck, v) VALUES ('g', '2', 72)",
    "INSERT INTO kv (pk, ck, v) VALUES ('g', '3', 73)",
    "DELETE FROM kv WHERE pk = 'g' AND ck >= '2'",
    # newer write into the deleted slice resurrects that row only
    "INSERT INTO kv (pk, ck, v) VALUES ('g', '3', 74)",
    # --- INSERT JSON: document form of the same upsert ---------------------
    "INSERT INTO kv JSON '{\"pk\": \"h\", \"ck\": \"1\", \"v\": 80, "
    "\"s\": \"json-row\"}'",
    # DEFAULT NULL tombstones the omitted regular column (s), not statics
    "INSERT INTO kv JSON '{\"pk\": \"h\", \"ck\": \"2\", \"v\": 81}' "
    "DEFAULT NULL",
)

KV_SCHEMA = TableSchema(
    name="kv", partition_key="pk", clustering="ck",
    regular={"v": "int", "s": "string"},
    static={"st": "string"},
)

# The mutation log DML_SCRIPT compiles to (pinned by tests/test_dml_replay.py)
# — the oracle reconciles exactly these rows in SQL.
EXPECTED_LOG: tuple[tuple, ...] = (
    mut_row("a", "1", None, None, "marker", 1, 0, 1),
    mut_row("a", "1", "v", "10", "cell", 1, 0, 2),
    mut_row("a", "1", "s", "alpha", "cell", 1, 0, 3),
    mut_row("a", "2", None, None, "marker", 2, 0, 4),
    mut_row("a", "2", "v", "20", "cell", 2, 0, 5),
    mut_row("a", "2", "s", "beta", "cell", 2, 0, 6),
    mut_row("b", "1", None, None, "marker", 3, 0, 7),
    mut_row("b", "1", "v", "30", "cell", 3, 0, 8),
    mut_row("a", "1", "v", "11", "cell", 4, 0, 9),
    mut_row("a", "1", "v", "99", "cell", 2, 0, 10),
    mut_row("b", "1", "s", "gamma", "cell", 6, 0, 11),
    mut_row("c", "1", None, None, "marker", 7, 0, 12),
    mut_row("c", "1", "v", "40", "cell", 7, 0, 13),
    mut_row("c", "1", "s", "delta", "cell", 7, 0, 14),
    mut_row("a", "2", "s", None, "cell_tomb", 8, 0, 15),
    mut_row("b", "1", None, None, "row_tomb", 9, 0, 16),
    mut_row("b", "1", "v", "31", "cell", 10, 0, 17),
    mut_row("c", "1", "v", "77", "cell", 11, 2, 18),
    mut_row("d", "1", "v", "50", "cell", 12, 0, 19),
    mut_row("d", "1", "v", None, "cell_tomb", 13, 0, 20),
    mut_row("e", "1", None, None, "marker", 14, 0, 21),
    mut_row("e", "1", "v", "60", "cell", 14, 0, 22),
    mut_row("e", "1", "v", None, "cell_tomb", 15, 0, 23),
    mut_row("a", None, None, None, "part_tomb", 16, 0, 24),
    mut_row("a", "3", None, None, "marker", 17, 0, 25),
    mut_row("a", "3", "v", "12", "cell", 17, 0, 26),
    mut_row("a", "3", "s", "eps", "cell", 17, 0, 27),
    mut_row("a", None, "st", "own-a", "cell", 18, 0, 28),
    mut_row("f", None, "st", "own-f", "cell", 19, 0, 29),
    mut_row("b", None, "st", "own-b", "cell", 20, 0, 30),
    mut_row("b", None, "st", None, "cell_tomb", 21, 0, 31),
    mut_row("g", "1", None, None, "marker", 22, 0, 32),
    mut_row("g", "1", "v", "71", "cell", 22, 0, 33),
    mut_row("g", "2", None, None, "marker", 23, 0, 34),
    mut_row("g", "2", "v", "72", "cell", 23, 0, 35),
    mut_row("g", "3", None, None, "marker", 24, 0, 36),
    mut_row("g", "3", "v", "73", "cell", 24, 0, 37),
    mut_row("g", "", None, None, "range_tomb", 25, 0, 38,
            lo="2", hi=None, lo_incl=True, hi_incl=False),
    mut_row("g", "3", None, None, "marker", 26, 0, 39),
    mut_row("g", "3", "v", "74", "cell", 26, 0, 40),
    mut_row("h", "1", None, None, "marker", 27, 0, 41),
    mut_row("h", "1", "v", "80", "cell", 27, 0, 42),
    mut_row("h", "1", "s", "json-row", "cell", 27, 0, 43),
    mut_row("h", "2", None, None, "marker", 28, 0, 44),
    mut_row("h", "2", "v", "81", "cell", 28, 0, 45),
    mut_row("h", "2", "s", None, "cell_tomb", 28, 0, 46),
)

ASOF = 29  # default snapshot horizon: max writetime + 1

_ORACLE = dml_oracle_sql(KV_SCHEMA, EXPECTED_LOG, ASOF)


@query("w9_dml_replay", oracle=_ORACLE)
def w9_dml_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay DML_SCRIPT through the CQL DML front-end; return the visible
    table (fixture-independent — ``sf_dir`` unused by construction)."""
    table = CqlTable(spark, KV_SCHEMA)
    for stmt in DML_SCRIPT:
        table.execute(stmt)
    return table.snapshot().select("pk", "ck", "v", "s", "st")
