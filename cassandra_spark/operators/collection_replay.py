"""w13: collection-mutation DML replay — list/set/map writes, composite
clustering keys, typed range tombstones, and static cells driven from real
CQL text, differentially checked like w9.

Collection semantics (`[C* db/rows/ComplexColumnData, cql3/Lists|Sets|Maps,
unverified]`): non-frozen collections are per-ELEMENT cells — list elements
keyed by position (timeuuid upstream; pinned here as arrival order), set
members keyed by value, map entries keyed by key. Appends/puts are plain
element writes; removals are element tombstones; whole-collection
assignment writes a collection tombstone at ``writetime - 1`` (the
reference's ``setComplexDeletionTimeForOverwrite``) so the new elements at
``writetime`` survive while every older element dies; an empty collection
IS null.

The table uses a two-column clustering key with a typed second component
(``ck2 int``) — the bounded range DELETE must compare numerically (10 > 1
but '10' < '3' lexically), which the oracle checks bit-for-bit.

The oracle (cassandra_spark.dml_oracle) re-derives the visible table in
DuckDB over the pinned VALUES literal of the mutation log this script
compiles to (log ≡ parser output asserted in
tests/test_collection_replay.py). Collection columns are compared as
``to_json`` strings — byte-identical across engines.

Scale posture: same as w9 — the reconcile is one shuffle on the partition
key; element cells are ordinary rows of the mutation stream, so the 100 TB
form is identical (compaction.compact / streaming_upsert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.cql_dml import CqlTable, TableSchema, mut_row
from cassandra_spark.dml_oracle import dml_oracle_sql
from cassandra_spark.registry import query

NOTES_SCHEMA = TableSchema(
    name="notes",
    partition_key="pk",
    clustering=("ck1", "ck2"),
    regular={
        "v": "int",
        "tags": "set<string>",
        "steps": "list<int>",
        "attrs": "map<string,string>",
    },
    static={"owner": "string"},
    key_types={"ck2": "int"},
)

COLLECTION_SCRIPT: tuple[str, ...] = (
    # t1: INSERT with every collection kind
    "INSERT INTO notes (pk, ck1, ck2, v, tags, steps, attrs) VALUES "
    "('a', 'x', 1, 10, {'red', 'blue'}, [1, 2], {'k1': 'v1'})",
    # t2-t3: list append / prepend (positions are arrival-ordered)
    "UPDATE notes SET steps = steps + [3, 4] "
    "WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
    "UPDATE notes SET steps = [0] + steps "
    "WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
    # t4-t5: set add / remove
    "UPDATE notes SET tags = tags + {'green'} "
    "WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
    "UPDATE notes SET tags = tags - {'red'} "
    "WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
    # t6-t8: map put / put-all (overwriting k1) / remove-key
    "UPDATE notes SET attrs['k2'] = 'v2' "
    "WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
    "UPDATE notes SET attrs = attrs + {'k3': 'v3', 'k1': 'v1b'} "
    "WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
    "UPDATE notes SET attrs = attrs - {'k3'} "
    "WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
    # t9: map element DELETE
    "DELETE attrs['k1'] FROM notes WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 1",
    # t10-t13: second row — overwrite assignment, collection delete, null
    "INSERT INTO notes (pk, ck1, ck2, tags, steps) VALUES "
    "('a', 'x', 2, {'p', 'q'}, [7])",
    "UPDATE notes SET tags = {'solo'} WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 2",
    "DELETE steps FROM notes WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 2",
    "UPDATE notes SET attrs = null WHERE pk = 'a' AND ck1 = 'x' AND ck2 = 2",
    # t14: static cell (pk-only WHERE)
    "UPDATE notes SET owner = 'olivia' WHERE pk = 'a'",
    # t15-t18: a second clustering prefix with a numeric ck2 spread
    "INSERT INTO notes (pk, ck1, ck2, v) VALUES ('a', 'y', 1, 21)",
    "INSERT INTO notes (pk, ck1, ck2, v) VALUES ('a', 'y', 2, 22)",
    "INSERT INTO notes (pk, ck1, ck2, v) VALUES ('a', 'y', 3, 23)",
    "INSERT INTO notes (pk, ck1, ck2, v) VALUES ('a', 'y', 10, 30)",
    # t19: bounded typed range delete: kills ck2 ∈ (1, 3]; ck2=10 survives
    # BECAUSE the bound compares as int ('10' < '3' lexically — the trap)
    "DELETE FROM notes WHERE pk = 'a' AND ck1 = 'y' AND ck2 > 1 AND ck2 <= 3",
    # t20: resurrect one deleted row with a newer write
    "INSERT INTO notes (pk, ck1, ck2, v) VALUES ('a', 'y', 2, 42)",
    # t21-t23: another partition — unbounded clustering-prefix delete
    "INSERT INTO notes (pk, ck1, ck2, v) VALUES ('b', 'x', 1, 51)",
    "INSERT INTO notes (pk, ck1, ck2, v, tags) VALUES "
    "('b', 'z', 5, 52, {'keep'})",
    "DELETE FROM notes WHERE pk = 'b' AND ck1 = 'x'",
    # t24: TTL'd set element — expired at the default asof
    "UPDATE notes USING TTL 2 SET tags = tags + {'tmp'} "
    "WHERE pk = 'b' AND ck1 = 'z' AND ck2 = 5",
    # t25: static-only INSERT — partition visible as a NULL-clustering row
    "INSERT INTO notes (pk, owner) VALUES ('c', 'nobody')",
    # t26: batch sharing one timestamp across collection ops
    "BEGIN BATCH "
    "UPDATE notes SET steps = steps + [9] WHERE pk = 'b' AND ck1 = 'z' AND ck2 = 5; "
    "UPDATE notes SET attrs['bk'] = 'bv' WHERE pk = 'b' AND ck1 = 'z' AND ck2 = 5; "
    "APPLY BATCH",
)

# The mutation log COLLECTION_SCRIPT compiles to (pinned by
# tests/test_collection_replay.py). ck is the SEP-joined clustering tuple;
# list elems are positional strings around 1_000_000_000.
X = "\x1f"
EXPECTED_LOG: tuple[tuple, ...] = (
    mut_row("a", f"x{X}1", None, None, "marker", 1, 0, 1),
    mut_row("a", f"x{X}1", "v", "10", "cell", 1, 0, 2),
    mut_row("a", f"x{X}1", "tags", None, "coll_tomb", 0, 0, 3),
    mut_row("a", f"x{X}1", "tags", "red", "cell", 1, 0, 4, elem="red"),
    mut_row("a", f"x{X}1", "tags", "blue", "cell", 1, 0, 5, elem="blue"),
    mut_row("a", f"x{X}1", "steps", None, "coll_tomb", 0, 0, 6),
    mut_row("a", f"x{X}1", "steps", "1", "cell", 1, 0, 7, elem="1000000001"),
    mut_row("a", f"x{X}1", "steps", "2", "cell", 1, 0, 8, elem="1000000002"),
    mut_row("a", f"x{X}1", "attrs", None, "coll_tomb", 0, 0, 9),
    mut_row("a", f"x{X}1", "attrs", "v1", "cell", 1, 0, 10, elem="k1"),
    mut_row("a", f"x{X}1", "steps", "3", "cell", 2, 0, 11, elem="1000000003"),
    mut_row("a", f"x{X}1", "steps", "4", "cell", 2, 0, 12, elem="1000000004"),
    mut_row("a", f"x{X}1", "steps", "0", "cell", 3, 0, 13, elem="1000000000"),
    mut_row("a", f"x{X}1", "tags", "green", "cell", 4, 0, 14, elem="green"),
    mut_row("a", f"x{X}1", "tags", None, "cell_tomb", 5, 0, 15, elem="red"),
    mut_row("a", f"x{X}1", "attrs", "v2", "cell", 6, 0, 16, elem="k2"),
    mut_row("a", f"x{X}1", "attrs", "v3", "cell", 7, 0, 17, elem="k3"),
    mut_row("a", f"x{X}1", "attrs", "v1b", "cell", 7, 0, 18, elem="k1"),
    mut_row("a", f"x{X}1", "attrs", None, "cell_tomb", 8, 0, 19, elem="k3"),
    mut_row("a", f"x{X}1", "attrs", None, "cell_tomb", 9, 0, 20, elem="k1"),
    mut_row("a", f"x{X}2", None, None, "marker", 10, 0, 21),
    mut_row("a", f"x{X}2", "tags", None, "coll_tomb", 9, 0, 22),
    mut_row("a", f"x{X}2", "tags", "p", "cell", 10, 0, 23, elem="p"),
    mut_row("a", f"x{X}2", "tags", "q", "cell", 10, 0, 24, elem="q"),
    mut_row("a", f"x{X}2", "steps", None, "coll_tomb", 9, 0, 25),
    mut_row("a", f"x{X}2", "steps", "7", "cell", 10, 0, 26, elem="1000000005"),
    mut_row("a", f"x{X}2", "tags", None, "coll_tomb", 10, 0, 27),
    mut_row("a", f"x{X}2", "tags", "solo", "cell", 11, 0, 28, elem="solo"),
    mut_row("a", f"x{X}2", "steps", None, "coll_tomb", 12, 0, 29),
    mut_row("a", f"x{X}2", "attrs", None, "coll_tomb", 13, 0, 30),
    mut_row("a", None, "owner", "olivia", "cell", 14, 0, 31),
    mut_row("a", f"y{X}1", None, None, "marker", 15, 0, 32),
    mut_row("a", f"y{X}1", "v", "21", "cell", 15, 0, 33),
    mut_row("a", f"y{X}2", None, None, "marker", 16, 0, 34),
    mut_row("a", f"y{X}2", "v", "22", "cell", 16, 0, 35),
    mut_row("a", f"y{X}3", None, None, "marker", 17, 0, 36),
    mut_row("a", f"y{X}3", "v", "23", "cell", 17, 0, 37),
    mut_row("a", f"y{X}10", None, None, "marker", 18, 0, 38),
    mut_row("a", f"y{X}10", "v", "30", "cell", 18, 0, 39),
    mut_row("a", "y", None, None, "range_tomb", 19, 0, 40,
            lo="1", hi="3", lo_incl=False, hi_incl=True),
    mut_row("a", f"y{X}2", None, None, "marker", 20, 0, 41),
    mut_row("a", f"y{X}2", "v", "42", "cell", 20, 0, 42),
    mut_row("b", f"x{X}1", None, None, "marker", 21, 0, 43),
    mut_row("b", f"x{X}1", "v", "51", "cell", 21, 0, 44),
    mut_row("b", f"z{X}5", None, None, "marker", 22, 0, 45),
    mut_row("b", f"z{X}5", "v", "52", "cell", 22, 0, 46),
    mut_row("b", f"z{X}5", "tags", None, "coll_tomb", 21, 0, 47),
    mut_row("b", f"z{X}5", "tags", "keep", "cell", 22, 0, 48, elem="keep"),
    mut_row("b", "x", None, None, "range_tomb", 23, 0, 49,
            lo=None, hi=None, lo_incl=False, hi_incl=False),
    mut_row("b", f"z{X}5", "tags", "tmp", "cell", 24, 2, 50, elem="tmp"),
    mut_row("c", None, "owner", "nobody", "cell", 25, 0, 51),
    mut_row("b", f"z{X}5", "steps", "9", "cell", 26, 0, 52, elem="1000000006"),
    mut_row("b", f"z{X}5", "attrs", "bv", "cell", 26, 0, 53, elem="bk"),
)

ASOF = 27  # default snapshot horizon: max writetime + 1

_ORACLE = dml_oracle_sql(NOTES_SCHEMA, EXPECTED_LOG, ASOF)


@query("w13_collection_replay", oracle=_ORACLE)
def w13_collection_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay COLLECTION_SCRIPT through the DML front-end; return the
    visible table with collections rendered to_json (fixture-independent).
    Column set and JSON forms match the generated DuckDB oracle exactly."""
    table = CqlTable(spark, NOTES_SCHEMA)
    for stmt in COLLECTION_SCRIPT:
        table.execute(stmt)
    snap = table.snapshot()
    return snap.select(
        "pk",
        "ck1",
        "ck2",
        "v",
        F.to_json("tags").alias("tags"),
        F.to_json("steps").alias("steps"),
        F.to_json(F.map_entries("attrs")).alias("attrs"),
        "owner",
    )


# --- w15: list INDEX operations (SET l[i] = v / DELETE l[i]) ----------------
#
# CQL's list index writes are read-before-write operations: the statement
# names a POSITION, the storage layer resolves it to the element's
# position key by reading the row (`[C* cql3/Lists.SetterByIndex /
# DiscarderByIndex, unverified]`), then writes an ordinary element cell or
# tombstone. The front-end mirrors that: _list_elem_at reconciles the live
# positions at execution time (same LWW/tombstone/TTL rules as the
# snapshot) and emits against the resolved elem — so a later append can be
# retargeted by index exactly like upstream.

LIST_INDEX_SCHEMA = TableSchema(
    name="lidx",
    partition_key="pk",
    clustering=(),
    regular={"steps": "list<int>", "label": "string"},
)

LIST_INDEX_SCRIPT: tuple[str, ...] = (
    "INSERT INTO lidx (pk, steps, label) VALUES ('a', [10, 20, 30], 'first')",
    "UPDATE lidx SET steps[1] = 99 WHERE pk = 'a'",    # [10, 99, 30]
    "DELETE steps[0] FROM lidx WHERE pk = 'a'",        # [99, 30]
    "UPDATE lidx SET steps = steps + [40] WHERE pk = 'a'",  # [99, 30, 40]
    "UPDATE lidx SET steps[2] = 44 WHERE pk = 'a'",    # [99, 30, 44]
    "UPDATE lidx SET steps[0] = NULL WHERE pk = 'a'",  # [30, 44]
    "INSERT INTO lidx (pk, steps, label) VALUES ('b', [7], 'second')",
)

# pinned log ≡ parser output (asserted in tests/test_collection_replay.py):
# note the index writes landing on RESOLVED position elems — steps[1] hits
# position 2, and after the head delete steps[2] hits position 4
LIST_INDEX_LOG: tuple[tuple, ...] = (
    mut_row('a', '', None, None, 'marker', 1, 0, 1),
    mut_row('a', '', 'steps', None, 'coll_tomb', 0, 0, 2),
    mut_row('a', '', 'steps', '10', 'cell', 1, 0, 3, elem='1000000001'),
    mut_row('a', '', 'steps', '20', 'cell', 1, 0, 4, elem='1000000002'),
    mut_row('a', '', 'steps', '30', 'cell', 1, 0, 5, elem='1000000003'),
    mut_row('a', '', 'label', 'first', 'cell', 1, 0, 6),
    mut_row('a', '', 'steps', '99', 'cell', 2, 0, 7, elem='1000000002'),
    mut_row('a', '', 'steps', None, 'cell_tomb', 3, 0, 8, elem='1000000001'),
    mut_row('a', '', 'steps', '40', 'cell', 4, 0, 9, elem='1000000004'),
    mut_row('a', '', 'steps', '44', 'cell', 5, 0, 10, elem='1000000004'),
    mut_row('a', '', 'steps', None, 'cell_tomb', 6, 0, 11, elem='1000000002'),
    mut_row('b', '', None, None, 'marker', 7, 0, 12),
    mut_row('b', '', 'steps', None, 'coll_tomb', 6, 0, 13),
    mut_row('b', '', 'steps', '7', 'cell', 7, 0, 14, elem='1000000005'),
    mut_row('b', '', 'label', 'second', 'cell', 7, 0, 15),
)

LIST_INDEX_ASOF = 8


@query(
    "w15_list_index_replay",
    oracle=dml_oracle_sql(LIST_INDEX_SCHEMA, LIST_INDEX_LOG, LIST_INDEX_ASOF),
)
def w15_list_index_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay LIST_INDEX_SCRIPT (index writes, index deletes, a NULL-write
    element delete, interleaved with appends) through the front-end; the
    oracle reconciles the pinned log, so a wrong index→position resolution
    is a hash mismatch (fixture-independent)."""
    table = CqlTable(spark, LIST_INDEX_SCHEMA)
    for stmt in LIST_INDEX_SCRIPT:
        table.execute(stmt)
    return table.snapshot().select(
        "pk", F.to_json("steps").alias("steps"), "label"
    )
