"""Randomized-history verification — the mini-Harry (SURVEY.md §5.1: the
reference fuzzes write/delete histories and checks the storage engine
converges to the model's answer; `[C* test/harry/**]`, unverified).

Hypothesis generates arbitrary interleaved write/delete histories; the
engine's answer = the W-tier pipeline (LWW merge via
operators/compaction.lww_merge + partition-tombstone shadowing); the
model's answer = a 10-line sequential Python reduction of the same
history. They must agree exactly, including timestamp ties (write vs
write: higher seq wins; write vs delete at equal ts: delete wins)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra_spark.operators.compaction import lww_merge

write_st = st.tuples(
    st.just("w"),
    st.integers(0, 3),  # pk
    st.integers(0, 2),  # ck
    st.integers(0, 9),  # ts
    st.integers(-100, 100),  # value
)
delete_st = st.tuples(
    st.just("d"),
    st.integers(0, 3),  # pk
    st.just(-1),
    st.integers(0, 9),  # ts (partition tombstone)
    st.just(0),
)
history_st = st.lists(write_st | delete_st, min_size=1, max_size=25)


def model(history):
    """Sequential reference semantics: newest write per (pk, ck) — ties by
    arrival order — visible iff no partition tombstone at ts >= its ts."""
    best: dict[tuple[int, int], tuple[int, int, int]] = {}
    tomb: dict[int, int] = {}
    for seq, (kind, pk, ck, ts, val) in enumerate(history):
        if kind == "w":
            cur = best.get((pk, ck))
            if cur is None or (ts, seq) > (cur[0], cur[1]):
                best[(pk, ck)] = (ts, seq, val)
        else:
            tomb[pk] = max(tomb.get(pk, -1), ts)
    return {
        (pk, ck): (ts, val)
        for (pk, ck), (ts, seq, val) in best.items()
        if tomb.get(pk, -1) < ts
    }


def engine(spark, history):
    writes = [
        (pk, ck, ts, seq, val)
        for seq, (kind, pk, ck, ts, val) in enumerate(history)
        if kind == "w"
    ]
    deletes = [
        (pk, ts) for (kind, pk, ck, ts, val) in history if kind == "d"
    ]
    if not writes:
        return {}
    cells = spark.createDataFrame(
        writes, "pk int, ck int, writetime int, seq int, value int"
    )
    merged = lww_merge(
        cells, ["pk"], ["ck"], writetime_col="writetime", tiebreak=["seq"]
    )
    if deletes:
        tombs = (
            spark.createDataFrame(deletes, "pk int, tomb_ts int")
            .groupBy("pk")
            .agg(F.max("tomb_ts").alias("tomb_ts"))
        )
        merged = (
            merged.join(F.broadcast(tombs), "pk", "left")
            .filter(
                F.col("tomb_ts").isNull()
                | (F.col("writetime") > F.col("tomb_ts"))
            )
            .drop("tomb_ts")
        )
    return {
        (r.pk, r.ck): (r.writetime, r.value) for r in merged.collect()
    }


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=history_st)
def test_lww_plus_tombstones_match_model(spark, history):
    assert engine(spark, history) == model(history)


# --- CQL-layer fuzz incl. RANGE tombstones over a composite clustering key

from cassandra_spark.cql_dml import CqlTable, TableSchema  # noqa: E402

_FUZZ_SCHEMA = TableSchema(
    "t", "pk", ("ck1", "ck2"), {"v": "int"}, key_types={"ck2": "int"}
)
# ck2 domain includes 10 so numeric-vs-lexical range comparison matters
_CK2 = (0, 1, 2, 3, 10)

cql_write_st = st.tuples(
    st.just("w"), st.sampled_from("ab"), st.sampled_from("xy"),
    st.sampled_from(_CK2), st.integers(1, 9), st.integers(0, 99),
)
cql_insert_st = st.tuples(
    st.just("i"), st.sampled_from("ab"), st.sampled_from("xy"),
    st.sampled_from(_CK2), st.integers(1, 9), st.integers(0, 99),
)
cql_rowdel_st = st.tuples(
    st.just("dr"), st.sampled_from("ab"), st.sampled_from("xy"),
    st.sampled_from(_CK2), st.integers(1, 9), st.just(0),
)
cql_rangedel_st = st.tuples(
    st.just("rt"), st.sampled_from("ab"), st.sampled_from("xy"),
    st.tuples(
        st.none() | st.sampled_from(_CK2),  # lo
        st.none() | st.sampled_from(_CK2),  # hi
        st.booleans(),  # lo inclusive
        st.booleans(),  # hi inclusive
    ),
    st.integers(1, 9), st.just(0),
)
cql_partdel_st = st.tuples(
    st.just("dp"), st.sampled_from("ab"), st.just("x"), st.just(0),
    st.integers(1, 9), st.just(0),
)
cql_history_st = st.lists(
    cql_write_st | cql_insert_st | cql_rowdel_st | cql_rangedel_st
    | cql_partdel_st,
    min_size=1,
    max_size=14,
)


def _cql_model(history):
    """Sequential reference semantics incl. range-tombstone coverage."""
    cells: dict = {}
    markers: dict = {}
    row_t: dict = {}
    part_t: dict = {}
    ranges: list = []

    def put(store, key, wt, is_tomb, val, seq):
        cur = store.get(key)
        if cur is None or (wt, is_tomb, seq) > (cur[0], cur[1], cur[2]):
            store[key] = (wt, is_tomb, seq, val)

    for seq, (op, pk, ck1, x, ts, v) in enumerate(history):
        if op == "w":
            put(cells, (pk, ck1, x), ts, 0, v, seq)
        elif op == "i":
            put(cells, (pk, ck1, x), ts, 0, v, seq)
            put(markers, (pk, ck1, x), ts, 0, None, seq)
        elif op == "dr":
            key = (pk, ck1, x)
            row_t[key] = max(row_t.get(key, -1), ts)
        elif op == "rt":
            lo, hi, li, hi_i = x
            ranges.append((pk, ck1, lo, hi, li, hi_i, ts))
        else:
            part_t[pk] = max(part_t.get(pk, -1), ts)

    def horizon(key):
        pk, ck1, ck2 = key
        h = max(part_t.get(pk, -1), row_t.get(key, -1))
        for rpk, rck1, lo, hi, li, hi_i, ts in ranges:
            if rpk != pk or rck1 != ck1:
                continue
            if lo is not None and not (ck2 >= lo if li else ck2 > lo):
                continue
            if hi is not None and not (ck2 <= hi if hi_i else ck2 < hi):
                continue
            h = max(h, ts)
        return h

    out = {}
    for key in set(cells) | set(markers):
        h = horizon(key)
        c, mk = cells.get(key), markers.get(key)
        c_live = c is not None and c[1] == 0 and c[0] > h
        mk_live = mk is not None and mk[0] > h
        if c_live or mk_live:
            out[key] = c[3] if c_live else None
    return out


def _cql_engine(spark, history):
    table = CqlTable(spark, _FUZZ_SCHEMA)
    for (op, pk, ck1, x, ts, v) in history:
        if op == "w":
            table.execute(
                f"UPDATE t USING TIMESTAMP {ts} SET v = {v} "
                f"WHERE pk = '{pk}' AND ck1 = '{ck1}' AND ck2 = {x}"
            )
        elif op == "i":
            table.execute(
                f"INSERT INTO t (pk, ck1, ck2, v) VALUES "
                f"('{pk}', '{ck1}', {x}, {v}) USING TIMESTAMP {ts}"
            )
        elif op == "dr":
            table.execute(
                f"DELETE FROM t USING TIMESTAMP {ts} "
                f"WHERE pk = '{pk}' AND ck1 = '{ck1}' AND ck2 = {x}"
            )
        elif op == "rt":
            lo, hi, li, hi_i = x
            conds = [f"pk = '{pk}'", f"ck1 = '{ck1}'"]
            if lo is not None:
                conds.append(f"ck2 {'>=' if li else '>'} {lo}")
            if hi is not None:
                conds.append(f"ck2 {'<=' if hi_i else '<'} {hi}")
            table.execute(
                f"DELETE FROM t USING TIMESTAMP {ts} "
                f"WHERE {' AND '.join(conds)}"
            )
        else:
            table.execute(
                f"DELETE FROM t USING TIMESTAMP {ts} WHERE pk = '{pk}'"
            )
    if not table._log:
        return {}
    return {
        (r.pk, r.ck1, r.ck2): r.v for r in table.snapshot().collect()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=cql_history_st)
def test_cql_range_tombstone_histories_match_model(spark, history):
    assert _cql_engine(spark, history) == _cql_model(history)


# --- composite-partition-key fuzz: the SEP-joined log key must behave
# exactly like an opaque (pk1, pk2) pair — writes, row deletes, and
# PARTITION tombstones must shadow per composite partition, never
# bleeding across partitions that share one component value.

_CPK_SCHEMA = TableSchema(
    "t2", "pk1", ("ck",), {"v": "int"},
    key_types={"pk2": "int", "ck": "int"},
    partition_cols=("pk1", "pk2"),
)

cpk_write_st = st.tuples(
    st.just("w"), st.sampled_from("ab"), st.integers(0, 2),
    st.integers(0, 1), st.integers(1, 9), st.integers(0, 99),
)
cpk_insert_st = st.tuples(
    st.just("i"), st.sampled_from("ab"), st.integers(0, 2),
    st.integers(0, 1), st.integers(1, 9), st.integers(0, 99),
)
cpk_rowdel_st = st.tuples(
    st.just("dr"), st.sampled_from("ab"), st.integers(0, 2),
    st.integers(0, 1), st.integers(1, 9), st.just(0),
)
cpk_partdel_st = st.tuples(
    st.just("dp"), st.sampled_from("ab"), st.integers(0, 2),
    st.just(0), st.integers(1, 9), st.just(0),
)
cpk_history_st = st.lists(
    cpk_write_st | cpk_insert_st | cpk_rowdel_st | cpk_partdel_st,
    min_size=1, max_size=14,
)


def _cpk_model(history):
    cells: dict = {}
    markers: dict = {}
    row_t: dict = {}
    part_t: dict = {}

    def put(store, key, wt, val, seq):
        cur = store.get(key)
        if cur is None or (wt, seq) > (cur[0], cur[1]):
            store[key] = (wt, seq, val)

    for seq, (op, pk1, pk2, ck, ts, v) in enumerate(history):
        if op == "w":
            put(cells, (pk1, pk2, ck), ts, v, seq)
        elif op == "i":
            put(cells, (pk1, pk2, ck), ts, v, seq)
            put(markers, (pk1, pk2, ck), ts, None, seq)
        elif op == "dr":
            key = (pk1, pk2, ck)
            row_t[key] = max(row_t.get(key, -1), ts)
        else:
            part_t[(pk1, pk2)] = max(part_t.get((pk1, pk2), -1), ts)

    out = {}
    for key in set(cells) | set(markers):
        pk1, pk2, ck = key
        h = max(part_t.get((pk1, pk2), -1), row_t.get(key, -1))
        c, mk = cells.get(key), markers.get(key)
        c_live = c is not None and c[0] > h
        mk_live = mk is not None and mk[0] > h
        if c_live or mk_live:
            out[key] = c[2] if c_live else None
    return out


def _cpk_engine(spark, history):
    table = CqlTable(spark, _CPK_SCHEMA)
    for (op, pk1, pk2, ck, ts, v) in history:
        if op == "w":
            table.execute(
                f"UPDATE t2 USING TIMESTAMP {ts} SET v = {v} "
                f"WHERE pk1 = '{pk1}' AND pk2 = {pk2} AND ck = {ck}"
            )
        elif op == "i":
            table.execute(
                f"INSERT INTO t2 (pk1, pk2, ck, v) VALUES "
                f"('{pk1}', {pk2}, {ck}, {v}) USING TIMESTAMP {ts}"
            )
        elif op == "dr":
            table.execute(
                f"DELETE FROM t2 USING TIMESTAMP {ts} "
                f"WHERE pk1 = '{pk1}' AND pk2 = {pk2} AND ck = {ck}"
            )
        else:
            table.execute(
                f"DELETE FROM t2 USING TIMESTAMP {ts} "
                f"WHERE pk1 = '{pk1}' AND pk2 = {pk2}"
            )
    if not table._log:
        return {}
    return {
        (r.pk1, r.pk2, r.ck): r.v for r in table.snapshot().collect()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=cpk_history_st)
def test_composite_pk_histories_match_model(spark, history):
    assert _cpk_engine(spark, history) == _cpk_model(history)
