"""Keyset paging walk: successive pages partition the full result set —
no gaps, no overlaps, order preserved (SURVEY.md §2.1 R9).

Keyset pagination requires the key tuple to be a TOTAL order; orders
(o_custkey, o_orderkey) is one (o_orderkey is unique), mirroring the
reference's paging state (partition key position + clustering position).
"""

from __future__ import annotations

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators.read_path import page_after
from tests.conftest import SF_SMOKE

KEYS = ["o_custkey", "o_orderkey"]
PAGE = 400


def test_page_walk_partitions_table(spark):
    orders = Catalog(spark, SF_SMOKE).orders.select(*KEYS)
    full = sorted((r.o_custkey, r.o_orderkey) for r in orders.collect())

    walked: list[tuple] = []
    cursor = None
    while True:
        page = [
            (r.o_custkey, r.o_orderkey)
            for r in page_after(orders, KEYS, cursor, PAGE).collect()
        ]
        if not page:
            break
        assert page == sorted(page), "page not in key order"
        walked.extend(page)
        assert len(page) <= PAGE
        cursor = page[-1]
        if len(page) < PAGE:
            break

    assert walked == full
    assert len(set(walked)) == len(walked), "pages overlap"
