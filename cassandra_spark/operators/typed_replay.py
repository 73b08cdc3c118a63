"""w14: typed-column DML replay — UDT, nested UDT, tuple, varint, duration,
and inet columns driven from real CQL text through the full session surface
(CREATE TYPE → CREATE TABLE → DML → snapshot), differentially checked like
w9/w13.

Type mapping exercised here (SURVEY §1.2 rows that were previously mapped on
paper only):

- **UDT** (`CREATE TYPE address (street text, zip int)`) → Spark
  ``struct<street:string, zip:int>`` `[C* db/marshal/UserType, unverified]`.
  Frozen semantics pinned: a UDT cell is written/replaced whole. Non-frozen
  per-FIELD UDT updates (``SET addr.zip = 1``) are the one unpinned corner —
  upstream stores each field as its own cell path; this engine would model
  it exactly like a map's per-element cells, but no test pins it yet.
- **nested UDT** (`CREATE TYPE contact (name text, addr frozen<address>)`)
  → nested struct.
- **tuple<int, text>** → ``struct<c0:int, c1:string>`` (tuples are always
  frozen in the reference) `[C* db/marshal/TupleType, unverified]`.
- **varint** → ``decimal(38,0)`` (arbitrary-precision integer; 38 digits is
  the Spark bound — documented truncation of the unbounded upstream type)
  `[C* db/marshal/IntegerType, unverified]`.
- **duration** → ``struct<months:int, days:int, nanos:bigint>`` — the
  reference's three-component duration, which deliberately does NOT order
  (1mo vs 30d is indeterminate), so it is stored, not compared
  `[C* cql3/Duration, unverified]`.
- **inet** → string in canonical text form `[C* db/marshal/InetAddressType,
  unverified]`.

Log encoding: a struct cell's value is the canonical JSON of the struct
(declared field order, null fields omitted, compact separators) — exactly
what Spark's ``to_json`` emits, so Spark snapshot output and the DuckDB
oracle (which reconciles the raw strings) compare byte-identical.

The mutation log this script compiles to is pinned as EXPECTED_LOG
(asserted ≡ parser output in tests/test_typed_replay.py); the oracle
re-derives the visible table from that literal in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.cql_dml import mut_row
from cassandra_spark.cql_session import CqlSession, parse_create_table
from cassandra_spark.dml_oracle import dml_oracle_sql
from cassandra_spark.registry import query

CREATE_TYPES: tuple[str, ...] = (
    "CREATE TYPE address (street text, zip int)",
    "CREATE TYPE contact (name text, addr frozen<address>)",
)

CREATE_TABLE = """
CREATE TABLE profiles (
    pk text,
    ck int,
    addr frozen<address>,
    loc frozen<tuple<int, text>>,
    pay varint,
    ip inet,
    dur duration,
    home address,
    owner contact,
    note text,
    hq address STATIC,
    PRIMARY KEY (pk, ck)
)
"""

# What CqlSession._create_type registers for CREATE_TYPES (pinned literal;
# test_typed_replay asserts the live session derives exactly these).
UDTS: dict[str, str] = {
    "address": "struct<street: string, zip: int>",
    "contact": "struct<name: string, addr: struct<street: string, zip: int>>",
}

PROFILES_SCHEMA = parse_create_table(CREATE_TABLE, UDTS)

TYPED_SCRIPT: tuple[str, ...] = (
    # t1: full typed row — UDT, tuple, 30-digit varint, inet, duration
    "INSERT INTO profiles (pk, ck, addr, loc, pay, ip, dur, note) VALUES "
    "('u1', 1, {street: '1 Oak Ave', zip: 94107}, (7, 'west'), "
    "123456789012345678901234567890, '10.0.0.1', 12h30m, 'alpha')",
    # t2: partial UDT (null field omitted), tuple with NULL component,
    # negative varint, IPv6, negative duration
    "INSERT INTO profiles (pk, ck, addr, loc, pay, ip, dur, note) VALUES "
    "('u1', 2, {zip: 12}, (3, NULL), -42, '::1', -1y2d, 'beta')",
    # t3: whole-cell UDT overwrite (frozen LWW)
    "UPDATE profiles SET addr = {street: '9 Elm St', zip: 61820} "
    "WHERE pk = 'u1' AND ck = 1",
    # t4: duration overwrite via calendar units (3w = 21 days)
    "UPDATE profiles SET dur = 3w WHERE pk = 'u1' AND ck = 2",
    # t5: stale write — USING TIMESTAMP 2 loses to t3's timestamp 3
    "UPDATE profiles USING TIMESTAMP 2 SET addr = {street: 'stale', zip: 0} "
    "WHERE pk = 'u1' AND ck = 1",
    # t6: struct cell tombstone
    "UPDATE profiles SET loc = null WHERE pk = 'u1' AND ck = 2",
    # t7: STATIC UDT cell (partition-scoped)
    "UPDATE profiles SET hq = {street: 'HQ Plaza', zip: 10001} "
    "WHERE pk = 'u1'",
    # t8: nested UDT literal onto a NON-FROZEN column (round 13: bare
    # spellings are multi-cell — a replace tombstone + one cell per field)
    "UPDATE profiles SET owner = "
    "{name: 'ann', addr: {street: '2 Pine', zip: 30301}} "
    "WHERE pk = 'u1' AND ck = 1",
    # t9: INSERT JSON with a struct field (the JSON front-door)
    "INSERT INTO profiles JSON "
    "'{\"pk\": \"u2\", \"ck\": 1, "
    "\"addr\": {\"street\": \"7 Maple\", \"zip\": 2139}, "
    "\"pay\": 314, \"ip\": \"192.168.0.7\"}'",
    # t10-t11: row born and deleted
    "INSERT INTO profiles (pk, ck, note) VALUES ('u2', 2, 'temp')",
    "DELETE FROM profiles WHERE pk = 'u2' AND ck = 2",
    # t12: TTL'd struct cell — expired at the default snapshot horizon
    "UPDATE profiles USING TTL 2 SET home = {street: 'tmp', zip: 1} "
    "WHERE pk = 'u2' AND ck = 1",
    # t13: advance the horizon so t12 has expired
    "UPDATE profiles SET note = 'gamma' WHERE pk = 'u2' AND ck = 1",
)

# TYPED_SCRIPT compiles to this log (pinned by tests/test_typed_replay.py).
A1 = '{"street":"1 Oak Ave","zip":94107}'
A3 = '{"street":"9 Elm St","zip":61820}'
EXPECTED_LOG: tuple[tuple, ...] = (
    mut_row("u1", "1", None, None, "marker", 1, 0, 1),
    mut_row("u1", "1", "addr", A1, "cell", 1, 0, 2),
    mut_row("u1", "1", "loc", '{"c0":7,"c1":"west"}', "cell", 1, 0, 3),
    mut_row("u1", "1", "pay", "123456789012345678901234567890", "cell", 1, 0, 4),
    mut_row("u1", "1", "ip", "10.0.0.1", "cell", 1, 0, 5),
    mut_row(
        "u1", "1", "dur",
        '{"months":0,"days":0,"nanos":45000000000000}', "cell", 1, 0, 6,
    ),
    mut_row("u1", "1", "note", "alpha", "cell", 1, 0, 7),
    mut_row("u1", "2", None, None, "marker", 2, 0, 8),
    mut_row("u1", "2", "addr", '{"zip":12}', "cell", 2, 0, 9),
    mut_row("u1", "2", "loc", '{"c0":3}', "cell", 2, 0, 10),
    mut_row("u1", "2", "pay", "-42", "cell", 2, 0, 11),
    mut_row("u1", "2", "ip", "::1", "cell", 2, 0, 12),
    mut_row(
        "u1", "2", "dur",
        '{"months":-12,"days":-2,"nanos":0}', "cell", 2, 0, 13,
    ),
    mut_row("u1", "2", "note", "beta", "cell", 2, 0, 14),
    mut_row("u1", "1", "addr", A3, "cell", 3, 0, 15),
    mut_row(
        "u1", "2", "dur",
        '{"months":0,"days":21,"nanos":0}', "cell", 4, 0, 16,
    ),
    mut_row("u1", "1", "addr", '{"street":"stale","zip":0}', "cell", 2, 0, 17),
    mut_row("u1", "2", "loc", None, "cell_tomb", 6, 0, 18),
    mut_row("u1", None, "hq", '{"street":"HQ Plaza","zip":10001}', "cell", 7, 0, 19),
    # owner is a bare (NON-FROZEN) UDT since round 13: the full
    # assignment compiles to a replace tombstone at ts-1 plus one cell
    # per present field (nested frozen structs stay canonical JSON)
    mut_row("u1", "1", "owner", None, "coll_tomb", 7, 0, 20),
    mut_row("u1", "1", "owner", "ann", "cell", 8, 0, 21, elem="name"),
    mut_row(
        "u1", "1", "owner",
        '{"street":"2 Pine","zip":30301}', "cell", 8, 0, 22, elem="addr",
    ),
    mut_row("u2", "1", None, None, "marker", 9, 0, 23),
    mut_row("u2", "1", "addr", '{"street":"7 Maple","zip":2139}', "cell", 9, 0, 24),
    mut_row("u2", "1", "pay", "314", "cell", 9, 0, 25),
    mut_row("u2", "1", "ip", "192.168.0.7", "cell", 9, 0, 26),
    mut_row("u2", "2", None, None, "marker", 10, 0, 27),
    mut_row("u2", "2", "note", "temp", "cell", 10, 0, 28),
    mut_row("u2", "2", None, None, "row_tomb", 11, 0, 29),
    # home too: the TTL'd full assignment writes per-field TTL'd cells
    mut_row("u2", "1", "home", None, "coll_tomb", 11, 0, 30),
    mut_row("u2", "1", "home", "tmp", "cell", 12, 2, 31, elem="street"),
    mut_row("u2", "1", "home", "1", "cell", 12, 2, 32, elem="zip"),
    mut_row("u2", "1", "note", "gamma", "cell", 13, 0, 33),
)

ASOF = 14  # default horizon: max writetime + 1

# varint compares as its canonical digit string: DuckDB's pandas bridge
# degrades DECIMAL(38,0) to float64 (silently lossy at 30 digits), so both
# engines project the digits — the snapshot itself keeps decimal(38,0).
_ORACLE = f"""
SELECT pk, ck, addr, loc, CAST(pay AS VARCHAR) AS pay, ip, dur, home,
       owner, note, hq
FROM ({dml_oracle_sql(PROFILES_SCHEMA, EXPECTED_LOG, ASOF)}) t
"""


def build_session(spark: SparkSession) -> CqlSession:
    """Replay the DDL + DML through a fresh session."""
    sess = CqlSession(spark)
    for stmt in (*CREATE_TYPES, CREATE_TABLE, *TYPED_SCRIPT):
        sess.execute(stmt)
    return sess


@query("w14_typed_replay", oracle=_ORACLE)
def w14_typed_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay TYPED_SCRIPT through the full session surface; return the
    visible table with struct columns rendered to_json (canonical forms
    match the generated DuckDB oracle byte-for-byte)."""
    sess = build_session(spark)
    snap = sess.table("profiles").snapshot()
    return snap.select(
        "pk",
        "ck",
        F.to_json("addr").alias("addr"),
        F.to_json("loc").alias("loc"),
        F.col("pay").cast("string").alias("pay"),
        "ip",
        F.to_json("dur").alias("dur"),
        F.to_json("home").alias("home"),
        F.to_json("owner").alias("owner"),
        "note",
        F.to_json("hq").alias("hq"),
    )
