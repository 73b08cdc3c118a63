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


def test_session_paging_exact_float_and_timestamp_cursors(spark):
    """Resume tokens must round-trip float and timestamp keys losslessly:
    a lossy str() cursor would skip or duplicate rows at the page
    boundary. The fixture uses doubles whose short str() forms are NOT
    their exact values (0.1+0.2 etc.) and microsecond timestamps."""
    from cassandra_spark.cql_session import CqlSession

    sess = CqlSession(spark)
    sess.execute(
        "CREATE TABLE m (s text, x double, ts timestamp, v int, "
        "PRIMARY KEY (s, x, ts))"
    )
    vals = [0.1 + 0.2, 1.0 / 3.0, 0.30000000000000004, 0.3, 2.675, 1e-9]
    rows = []
    for i, x in enumerate(sorted(set(vals))):
        for j in range(3):
            ts = f"2024-01-01 00:00:0{j}.00012{i}"
            rows.append((x, ts))
            sess.execute(
                f"INSERT INTO m (s, x, ts, v) VALUES ('p', {x!r}, '{ts}', {i})"
            )
    full = [
        (r.x, r.ts)
        for r in sess.execute("SELECT x, ts FROM m WHERE s = 'p'")
        .orderBy("x", "ts")
        .collect()
    ]
    assert len(full) == len(rows)

    walked, state = [], None
    while True:
        page = sess.execute_paged("SELECT * FROM m", 4, state)
        got = [(r.x, r.ts) for r in page.df.collect()]
        walked.extend(got)
        state = page.paging_state()
        if state is None:
            break
    assert walked == full, "paged walk skipped or duplicated rows"
