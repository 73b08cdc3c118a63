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
