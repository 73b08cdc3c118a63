"""Replica placement: ring walk semantics + Spark/pure-Python differential."""

from __future__ import annotations

import bisect

from tests.conftest import SF_SMOKE


def test_ring_is_sorted_and_distinct():
    from cassandra_spark.operators.ring import build_ring

    ring = build_ring()
    toks = [t for t, _ in ring]
    assert toks == sorted(toks)
    assert len(set(toks)) == len(toks)  # no token collisions in the seed set


def test_replicas_are_distinct_nodes():
    from cassandra_spark.operators.ring import RF, build_ring, replicas_of_index

    ring = build_ring()
    for i in range(len(ring)):
        reps = replicas_of_index(ring, i)
        assert len(reps) == RF
        assert len(set(reps)) == RF


def test_spark_matches_pure_python_walk(spark):
    """The codegen CASE chain must agree with a bisect-based reference walk
    on every sampled key (token + successor + RF-distinct collection)."""
    from cassandra_spark.operators import murmur3
    from cassandra_spark.operators.ring import (
        build_ring,
        p8_replica_map,
        replicas_of_index,
    )

    ring = build_ring()
    toks = [t for t, _ in ring]
    rows = p8_replica_map(spark, SF_SMOKE).collect()
    assert rows
    for r in rows[:200]:
        tok = murmur3.token_of_bigint(r.o_orderkey)
        assert tok == r.token
        idx = bisect.bisect_left(toks, tok) % len(ring)
        assert ",".join(replicas_of_index(ring, idx)) == r.replicas
        assert r.primary_replica == r.replicas.split(",")[0]


def test_ownership_is_roughly_balanced(spark):
    """16 vnodes/node should spread primary ownership within a loose band —
    the property vnodes exist to provide."""
    from cassandra_spark.operators.ring import p9_ring_ownership

    dist = {r.node: r.n_partitions for r in
            p9_ring_ownership(spark, SF_SMOKE).collect()}
    assert set(dist) == {"n0", "n1", "n2", "n3"}
    total = sum(dist.values())
    for n, c in dist.items():
        assert 0.10 < c / total < 0.45, (n, dist)
