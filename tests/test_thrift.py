"""Thrift-era surface semantics beyond the oracle parity gate —
notably the super-column-family contract (t5): ``count`` bounds SUPER
columns and a selected super column is returned whole."""

from __future__ import annotations

from tests.conftest import SF_SMOKE

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators.thrift_compat import super_get_slice


def test_super_slice_returns_whole_super_columns(spark):
    events = Catalog(spark, SF_SMOKE).events
    out = super_get_slice(events, key=7, count=2).toPandas()
    supers = sorted(out["event_type"].unique())
    assert len(supers) <= 2
    # every selected super column arrives WHOLE: its cell count equals
    # the raw table's cell count for that (key, super) pair
    raw = events.filter("user_id = 7").toPandas()
    for sc in supers:
        assert (out["event_type"] == sc).sum() == (
            raw["event_type"] == sc
        ).sum()
    # and the bound picks the FIRST supers in name order
    all_supers = sorted(raw["event_type"].unique())
    assert supers == all_supers[: len(supers)]


def test_super_slice_start_bound(spark):
    events = Catalog(spark, SF_SMOKE).events
    out = super_get_slice(events, key=7, start="c", count=100).toPandas()
    assert (out["event_type"] >= "c").all()


def test_super_slice_empty_row(spark):
    events = Catalog(spark, SF_SMOKE).events
    assert super_get_slice(events, key=-1, count=5).count() == 0


def test_batch_mutate_timestamp_shadowing(spark):
    """t6 deletion semantics are TIMESTAMP-ordered, not arrival-ordered:
    a name-deleted gen-0-only column is gone, a gen-1 rewrite (wt = +1h,
    newer than the deletion's wt = gen0+1) of a name-deleted column
    survives, and a user's row deletion shadows its own newest 'error'
    event but not later writes."""
    from cassandra_spark.operators.thrift_compat import t6_batch_mutate

    ev = Catalog(spark, SF_SMOKE).events
    out = {r.user_id: r for r in t6_batch_mutate(spark, SF_SMOKE).collect()}

    raw = ev.select("user_id", "event_id", "event_type", "ts").collect()
    import collections

    by_user = collections.defaultdict(list)
    for r in raw:
        by_user[r.user_id].append(r)
    checked_name_del = checked_row_del = False
    for uid, rows in by_user.items():
        err_wts = [
            int(r.ts.timestamp() * 1_000_000)
            for r in rows
            if r.event_type == "error"
        ]
        row_del = max(err_wts) if err_wts else None
        n_live_expected = 0
        for r in rows:
            wt0 = int(r.ts.timestamp() * 1_000_000)
            has_gen1 = r.event_id % 4 == 0
            wt = wt0 + 3_600_000_000 if has_gen1 else wt0
            name_del = wt0 + 1 if r.event_id % 7 == 3 else None
            live = (row_del is None or wt > row_del) and (
                name_del is None or wt > name_del
            )
            if name_del is not None and not has_gen1:
                assert not live or wt > name_del
                checked_name_del = True
            n_live_expected += live
        got = out[uid].n_live if uid in out else 0
        assert got == n_live_expected, uid
        if row_del is not None:
            checked_row_del = True
    assert checked_name_del and checked_row_del
