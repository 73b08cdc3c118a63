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
