"""x43 PageRank vs an independent sequential reference: same integer
recurrence, single-threaded, straight from the event log."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMOKE


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // b
    return -q if a < 0 else q


def _ref_pagerank(k: int):
    from cassandra_spark.operators.timeseries import (
        PR_D_DEN,
        PR_D_NUM,
        PR_SCALE,
    )

    rows = duckdb.sql(
        f"""
        SELECT user_id, event_type
        FROM '{SF_SMOKE}/events.parquet'
        ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    edges: dict[tuple[str, str], int] = {}
    prev_user, prev_type = None, None
    for user, typ in rows:
        if user == prev_user:
            edges[(prev_type, typ)] = edges.get((prev_type, typ), 0) + 1
        prev_user, prev_type = user, typ
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outw = {n: 0 for n in nodes}
    for (s, _), w in edges.items():
        outw[s] += w
    n = len(nodes)
    rank = {v: PR_SCALE // n for v in nodes}
    for _ in range(k):
        contrib = {v: 0 for v in nodes}
        for (s, d), w in edges.items():
            contrib[d] += _tdiv(rank[s] * w, outw[s])
        rank = {
            v: _tdiv((PR_D_DEN - PR_D_NUM) * PR_SCALE, PR_D_DEN * n)
            + _tdiv(PR_D_NUM * contrib[v], PR_D_DEN)
            for v in nodes
        }
    return rank


def test_x43_matches_reference(spark):
    from cassandra_spark.operators.timeseries import (
        PR_ITERS,
        x43_event_pagerank,
    )

    got = {
        r.node: r.rank_ppb for r in x43_event_pagerank(spark, SF_SMOKE).collect()
    }
    assert got == _ref_pagerank(PR_ITERS)


def test_x43_mass_conserved_mod_truncation(spark):
    """Total rank stays within truncation loss of PR_SCALE: each of the
    ≤25 edges and 5 teleport terms can truncate at most 1 ppb per round."""
    from cassandra_spark.operators.timeseries import (
        PR_SCALE,
        x43_event_pagerank,
    )

    rows = x43_event_pagerank(spark, SF_SMOKE).collect()
    total = sum(r.rank_ppb for r in rows)
    assert PR_SCALE * 0.999 <= total <= PR_SCALE
    assert all(r.rank_ppb > 0 for r in rows)
