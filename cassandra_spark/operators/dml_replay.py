"""w9: CQL DML replay — the cql_dml front-end driven end-to-end under the
oracle gate.

A fixed, deterministic CQL statement script (INSERT / UPDATE / DELETE /
BATCH / USING TIMESTAMP / USING TTL) runs through :mod:`cassandra_spark.
cql_dml`; the query returns the reconciled visible table. The oracle is NOT
a hard-coded answer: it re-derives the result in DuckDB by running the SAME
LWW reconcile (per-cell window winner → tombstone shadowing → TTL expiry →
wide pivot) over the mutation log the parser provably emits for the script
(``tests/test_dml_replay.py`` pins log ≡ VALUES literal, so the two engines
reconcile identical inputs).

This closes the loop on SURVEY.md §2.9: the W-tier semantics are checked
not just as batch operators over fixtures but as the product of real
statement text — reference lifecycle `[C* cql3/statements/
ModificationStatement → db/Mutation → read-path reconcile, unverified]`.

Scale posture: the statement log here is tiny by construction (DML arrives
row-at-a-time; this query pins semantics, not throughput). The 100 TB form
of the same reconcile is operators/compaction.py (bucketed LWW merge) and
streaming/jobs.streaming_upsert (continuous micro-batch folding) — all
three share the W4 ordering (writetime desc, tombstone beats write, arrival
seq) so a correctness proof here transfers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_spark.cql_dml import CqlTable, TableSchema
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
)

KV_SCHEMA = TableSchema(
    name="kv", partition_key="pk", clustering="ck",
    regular={"v": "int", "s": "string"},
)

# The mutation log DML_SCRIPT compiles to (pinned by tests/test_dml_replay.py)
# — the oracle reconciles exactly these rows in SQL.
EXPECTED_LOG: tuple[tuple, ...] = (
    ("a", "1", None, None, "marker", 1, 0, 1),
    ("a", "1", "v", "10", "cell", 1, 0, 2),
    ("a", "1", "s", "alpha", "cell", 1, 0, 3),
    ("a", "2", None, None, "marker", 2, 0, 4),
    ("a", "2", "v", "20", "cell", 2, 0, 5),
    ("a", "2", "s", "beta", "cell", 2, 0, 6),
    ("b", "1", None, None, "marker", 3, 0, 7),
    ("b", "1", "v", "30", "cell", 3, 0, 8),
    ("a", "1", "v", "11", "cell", 4, 0, 9),
    ("a", "1", "v", "99", "cell", 2, 0, 10),
    ("b", "1", "s", "gamma", "cell", 6, 0, 11),
    ("c", "1", None, None, "marker", 7, 0, 12),
    ("c", "1", "v", "40", "cell", 7, 0, 13),
    ("c", "1", "s", "delta", "cell", 7, 0, 14),
    ("a", "2", "s", None, "cell_tomb", 8, 0, 15),
    ("b", "1", None, None, "row_tomb", 9, 0, 16),
    ("b", "1", "v", "31", "cell", 10, 0, 17),
    ("c", "1", "v", "77", "cell", 11, 2, 18),
    ("d", "1", "v", "50", "cell", 12, 0, 19),
    ("d", "1", "v", None, "cell_tomb", 13, 0, 20),
    ("e", "1", None, None, "marker", 14, 0, 21),
    ("e", "1", "v", "60", "cell", 14, 0, 22),
    ("e", "1", "v", None, "cell_tomb", 15, 0, 23),
    ("a", None, None, None, "part_tomb", 16, 0, 24),
    ("a", "3", None, None, "marker", 17, 0, 25),
    ("a", "3", "v", "12", "cell", 17, 0, 26),
    ("a", "3", "s", "eps", "cell", 17, 0, 27),
)

ASOF = 18  # default snapshot horizon: max writetime + 1


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def kv_lww_oracle(log: tuple, asof: int) -> str:
    """DuckDB LWW reconcile over a pinned kv-schema mutation log: window
    winner per (pk, ck, col) with tombstone-beats-write-then-seq tie order,
    row/partition tombstone shadowing, TTL horizon, then the wide pivot.
    Shared by w9 (unconditional DML) and w12 (LWT) — both replay onto the
    same kv table shape."""
    values = ",\n        ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in log
    )
    return f"""
WITH log(pk, ck, col, val, kind, writetime, ttl, seq) AS (
    VALUES
        {values}
),
part_tombs AS (
    SELECT pk, max(writetime) AS pt FROM log
    WHERE kind = 'part_tomb' GROUP BY pk
),
row_tombs AS (
    SELECT pk, ck, max(writetime) AS rt FROM log
    WHERE kind = 'row_tomb' GROUP BY pk, ck
),
winners AS (
    SELECT *, row_number() OVER (
        PARTITION BY pk, ck, col
        ORDER BY writetime DESC, (kind = 'cell_tomb') DESC, seq DESC
    ) AS rn
    FROM log WHERE kind IN ('cell', 'marker', 'cell_tomb')
),
live AS (
    SELECT w.* FROM winners w
    LEFT JOIN part_tombs p ON w.pk = p.pk
    LEFT JOIN row_tombs r ON w.pk = r.pk AND w.ck = r.ck
    WHERE w.rn = 1 AND w.kind <> 'cell_tomb'
      AND (w.ttl = 0 OR w.writetime + w.ttl > {asof})
      AND (p.pt IS NULL OR w.writetime > p.pt)
      AND (r.rt IS NULL OR w.writetime > r.rt)
)
SELECT pk, ck,
    CAST(max(CASE WHEN col = 'v' THEN val END) AS INTEGER) AS v,
    max(CASE WHEN col = 's' THEN val END) AS s
FROM live GROUP BY pk, ck
"""


_ORACLE = kv_lww_oracle(EXPECTED_LOG, ASOF)


@query("w9_dml_replay", oracle=_ORACLE)
def w9_dml_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay DML_SCRIPT through the CQL DML front-end; return the visible
    table (fixture-independent — ``sf_dir`` unused by construction)."""
    table = CqlTable(spark, KV_SCHEMA)
    for stmt in DML_SCRIPT:
        table.execute(stmt)
    return table.snapshot().select("pk", "ck", "v", "s")
