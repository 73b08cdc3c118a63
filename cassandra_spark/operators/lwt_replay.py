"""w12: lightweight-transaction (LWT) replay — compare-and-set DML driven
from real statement text, differentially checked like w9/w10.

LWT semantics `[C* service/paxos/*, cql3 conditional statements,
unverified]`: ``INSERT .. IF NOT EXISTS``, ``UPDATE/DELETE .. IF EXISTS |
IF col op lit`` read the row's current visible state, apply the mutation
only if the condition holds, and return an ``[applied]`` flag; custom
timestamps are rejected (paxos owns the write time); a conditional BATCH
is single-partition and all-or-nothing with every condition reading the
pre-batch state. The condition read is driver-side pure Python by design
(one row per statement — the reference serves it from one replica's read
path, never a scan); the *reconcile* of the resulting log is the same
Spark LWW path every other W-tier operator uses.

The oracle re-derives the visible table in DuckDB over the VALUES literal
of the pinned post-LWT mutation log (log ≡ engine output and the
[applied] flag sequence are both asserted in tests/test_lwt_replay.py) —
so the differential check covers exactly the rows that conditional
execution let through.

Scale posture: LWT is a point read-modify-write; its cost at 100 TB is
paxos round-trips, not data volume — nothing here shuffles. The batch
analytics form of "apply only the winning write" is the W4 LWW merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_spark.cql_dml import CqlTable, TableSchema, mut_row
from cassandra_spark.dml_oracle import dml_oracle_sql
from cassandra_spark.operators.dml_replay import KV_SCHEMA
from cassandra_spark.registry import query

# Each entry: (statement, expected [applied] flag; None = unconditional).
LWT_SCRIPT: tuple[tuple[str, bool | None], ...] = (
    # t1: fresh row — IF NOT EXISTS applies
    ("INSERT INTO kv (pk, ck, v, s) VALUES ('a', '1', 10, 'one') "
     "IF NOT EXISTS", True),
    # t2: same key — rejected, leaves no trace in the log
    ("INSERT INTO kv (pk, ck, v) VALUES ('a', '1', 99) IF NOT EXISTS", False),
    # t3: condition true (v = 10)
    ("UPDATE kv SET v = 11 WHERE pk = 'a' AND ck = '1' IF v = 10", True),
    # t4: condition now false (v = 11)
    ("UPDATE kv SET v = 12 WHERE pk = 'a' AND ck = '1' IF v = 10", False),
    # t5: IF EXISTS on a missing row
    ("UPDATE kv SET s = 'two' WHERE pk = 'b' AND ck = '1' IF EXISTS", False),
    # t6: unconditional UPDATE creates the cell-only row
    ("UPDATE kv SET v = 20 WHERE pk = 'b' AND ck = '1'", None),
    # t7: '= NULL' is true iff the cell is unset
    ("UPDATE kv SET s = 'set-on-null' WHERE pk = 'b' AND ck = '1' "
     "IF s = NULL", True),
    # t8: ordering condition on the live value (v = 20)
    ("DELETE FROM kv WHERE pk = 'b' AND ck = '1' IF v >= 15", True),
    # t9: the row tombstone above makes the row NOT EXIST again
    ("INSERT INTO kv (pk, ck, v) VALUES ('b', '1', 30) IF NOT EXISTS", True),
    # t10: TTL 1 tick — the cell will be expired at the t11 condition read
    ("UPDATE kv USING TTL 1 SET s = 'fleeting' WHERE pk = 'c' AND ck = '1'",
     None),
    # t11: EXISTS sees through TTL expiry
    ("DELETE FROM kv WHERE pk = 'c' AND ck = '1' IF EXISTS", False),
    # t12: conditional batch, single partition, condition true → all applied
    ("BEGIN BATCH "
     "UPDATE kv SET v = 100 WHERE pk = 'a' AND ck = '1' IF v = 11; "
     "UPDATE kv SET s = 'batch' WHERE pk = 'a' AND ck = '2'; "
     "APPLY BATCH", True),
    # t13: conditional batch, condition false → NOTHING applied
    ("BEGIN BATCH "
     "UPDATE kv SET v = 200 WHERE pk = 'a' AND ck = '1' IF v = 999; "
     "INSERT INTO kv (pk, ck, v) VALUES ('a', '3', 300); "
     "APPLY BATCH", False),
    # t14: != against a live value
    ("UPDATE kv SET v = 21 WHERE pk = 'a' AND ck = '1' IF v != 11", True),
    # t15: conditional cell delete
    ("DELETE s FROM kv WHERE pk = 'a' AND ck = '1' IF s = 'one'", True),
)

# The mutation log LWT_SCRIPT compiles to (pinned by tests/test_lwt_replay.py)
# — only the applied statements appear; rejected ones left no rows.
EXPECTED_LOG: tuple[tuple, ...] = (
    mut_row("a", "1", None, None, "marker", 1, 0, 1),
    mut_row("a", "1", "v", "10", "cell", 1, 0, 2),
    mut_row("a", "1", "s", "one", "cell", 1, 0, 3),
    mut_row("a", "1", "v", "11", "cell", 3, 0, 4),
    mut_row("b", "1", "v", "20", "cell", 6, 0, 5),
    mut_row("b", "1", "s", "set-on-null", "cell", 7, 0, 6),
    mut_row("b", "1", None, None, "row_tomb", 8, 0, 7),
    mut_row("b", "1", None, None, "marker", 9, 0, 8),
    mut_row("b", "1", "v", "30", "cell", 9, 0, 9),
    mut_row("c", "1", "s", "fleeting", "cell", 10, 1, 10),
    mut_row("a", "1", "v", "100", "cell", 12, 0, 11),
    mut_row("a", "2", "s", "batch", "cell", 12, 0, 12),
    mut_row("a", "1", "v", "21", "cell", 14, 0, 13),
    mut_row("a", "1", "s", None, "cell_tomb", 15, 0, 14),
)

ASOF = 16  # max writetime + 1


@query("w12_lwt_replay", oracle=dml_oracle_sql(KV_SCHEMA, EXPECTED_LOG, ASOF))
def w12_lwt_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay LWT_SCRIPT through the conditional DML path; return the
    visible table (fixture-independent)."""
    table = CqlTable(spark, KV_SCHEMA)
    for stmt, _expected in LWT_SCRIPT:
        table.execute(stmt)
    return table.snapshot().select("pk", "ck", "v", "s", "st")
