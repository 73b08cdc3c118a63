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


def test_nts_rack_aware_placement(spark):
    """dc1 RF=2 must land on BOTH dc1 racks (n0+n1); dc2 RF=1 on one of
    n2/n3 — for every sampled key."""
    from cassandra_spark.operators.ring import (
        TOPOLOGY,
        p10_nts_replicas,
    )

    rows = p10_nts_replicas(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        reps = r.replicas.split(",")
        assert len(reps) == 3 and len(set(reps)) == 3
        dc1 = [n for n in reps if TOPOLOGY[n][0] == "dc1"]
        dc2 = [n for n in reps if TOPOLOGY[n][0] == "dc2"]
        assert sorted(dc1) == ["n0", "n1"]  # both racks of dc1
        assert len(dc2) == 1


def test_nts_walk_matches_python_reference(spark):
    """The CASE chain agrees with the pure-Python NTS walk per key."""
    import bisect

    from cassandra_spark.operators import murmur3
    from cassandra_spark.operators.ring import (
        build_ring,
        nts_replicas_of_index,
        p10_nts_replicas,
    )

    ring = build_ring()
    toks = [t for t, _ in ring]
    for r in p10_nts_replicas(spark, SF_SMOKE).collect()[:100]:
        idx = bisect.bisect_left(toks, murmur3.token_of_bigint(r.o_orderkey))
        idx %= len(ring)
        assert ",".join(nts_replicas_of_index(ring, idx)) == r.replicas


def test_repartition_by_replica_colocates(spark):
    """After the exchange no node's rows are split across partitions
    (parts_per_node=1): a per-node follow-up stage needs no second
    shuffle. (Two small nodes MAY share a partition — hash partitioning.)"""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.ring import repartition_by_replica

    orders = Catalog(spark, SF_SMOKE).orders.select("o_orderkey")
    out = repartition_by_replica(orders, "o_orderkey")
    split = (
        out.withColumn("__pid", F.spark_partition_id())
        .groupBy("__replica")
        .agg(F.countDistinct("__pid").alias("n_parts"))
        .agg(F.max("n_parts"))
        .collect()[0][0]
    )
    assert split == 1
    assert out.select("__replica").distinct().count() == 4


def test_repartition_by_replica_salted_spread(spark):
    """parts_per_node>1: a node's share spreads over up to that many
    tasks, and rows keep their replica assignment."""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.ring import repartition_by_replica

    orders = Catalog(spark, SF_SMOKE).orders.select("o_orderkey")
    out = repartition_by_replica(orders, "o_orderkey", parts_per_node=4)
    per_node = (
        out.withColumn("__pid", F.spark_partition_id())
        .groupBy("__replica")
        .agg(F.countDistinct("__pid").alias("n_parts"))
        .collect()
    )
    assert all(1 <= r.n_parts <= 4 for r in per_node)
    assert any(r.n_parts > 1 for r in per_node)


def test_split_token_ranges_cover_and_align():
    """Splits tile the whole signed-64 space contiguously, align to vnode
    boundaries, and honor the requested count up to the vnode count."""
    from cassandra_spark.operators.ring import (
        MAX_TOKEN,
        MIN_TOKEN,
        build_ring,
        split_token_ranges,
    )

    ring_toks = {t for t, _ in build_ring()}
    for n in (1, 4, 16, 64, 999):
        s = split_token_ranges(n)
        assert len(s) == min(n, len(ring_toks) + 1)
        assert s[0][0] == MIN_TOKEN and s[-1][1] == MAX_TOKEN
        for (a_s, a_e, _), (b_s, _, _) in zip(s, s[1:]):
            assert a_e == b_s
            assert a_e in ring_toks  # interior boundaries are vnode tokens
        nodes = {owner for _, _, owner in s}
        assert nodes <= {"n0", "n1", "n2", "n3"}


def test_replica_walk_rejects_underprovisioned_ring():
    import pytest as _pytest

    from cassandra_spark.operators.ring import build_ring, replicas_of_index

    small = build_ring(n_nodes=2)
    with _pytest.raises(ValueError, match="distinct endpoints"):
        replicas_of_index(small, 0, rf=3)
    assert len(replicas_of_index(small, 0, rf=2)) == 2


def test_decommission_conservation(spark):
    """RF conservation under decommission: every replica the leaver
    vacates lands on exactly one survivor — per row, the B-replica set
    is the A-set with n3 (if present) replaced by one new node."""
    from cassandra_spark.operators.ring import w26_decommission

    rows = {r.node: r for r in w26_decommission(spark, SF_SMOKE).collect()}
    leaver = rows["n3"]
    assert leaver.n_after == 0 and leaver.n_streamed_in == 0
    streamed = sum(r.n_streamed_in for n, r in rows.items() if n != "n3")
    assert streamed == leaver.n_before
    total = sum(r.n_before for r in rows.values())
    assert sum(r.n_after for r in rows.values()) == total  # RF * rows


def test_move_conservation(spark):
    """RF conservation under nodetool move: replica count is conserved
    globally (RF x rows on both sides), so total streamed-in equals
    total streamed-out; the moved node (n1) actually shifts ownership,
    and — unlike bootstrap/decommission — bystanders may exchange rows
    in BOTH directions as the mover's ranges cascade."""
    from cassandra_spark.operators.ring import RF, w27_move

    rows = {r.node: r for r in w27_move(spark, SF_SMOKE).collect()}
    assert set(rows) == {"n0", "n1", "n2", "n3"}
    total_before = sum(r.n_before for r in rows.values())
    total_after = sum(r.n_after for r in rows.values())
    assert total_before == total_after  # RF x rows, both rings
    assert total_before % RF == 0
    streamed_in = sum(r.n_streamed_in for r in rows.values())
    streamed_out = sum(r.n_streamed_out for r in rows.values())
    assert streamed_in == streamed_out > 0
    mover = rows["n1"]
    assert mover.n_streamed_in > 0 and mover.n_streamed_out > 0, (
        "re-drawn tokens must shift the mover's ownership both ways"
    )
    # per-row form: |ra| == |rb| == RF for every partition, so each
    # relocated replica leaves one owner and lands on one new owner
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators import murmur3
    from cassandra_spark.operators.ring import (
        build_ring_moved,
        replica_case_sql,
    )

    cat = Catalog(spark, SF_SMOKE)
    df = (
        cat.orders.limit(200)
        .select(murmur3.token_col(F.col("o_orderkey")).alias("token"))
        .withColumn("ra", F.expr(replica_case_sql("token")))
        .withColumn(
            "rb", F.expr(replica_case_sql("token", ring=build_ring_moved()))
        )
    )
    bad = df.filter(
        (F.size(F.split("ra", ",")) != RF)
        | (F.size(F.split("rb", ",")) != RF)
    ).count()
    assert bad == 0


def test_rebuild_conservation(spark):
    """Every dc2-owned partition streams exactly once (targets n2/n3
    partition the keyspace by their NTS ownership), and every source is
    a dc1 node — the source-DC filter the reference's RangeStreamer
    applies."""
    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.ring import w28_rebuild

    rows = w28_rebuild(spark, SF_SMOKE).collect()
    assert rows
    assert {r.target_node for r in rows} <= {"n2", "n3"}
    assert {r.source_node for r in rows} <= {"n0", "n1"}
    total = sum(r.n_streamed for r in rows)
    n_orders = Catalog(spark, SF_SMOKE).orders.count()
    assert total == n_orders, "each partition streams exactly once"


def test_tablehistograms_buckets_partition_everything(spark):
    """Exponential buckets tile the distribution: every partition lands
    in exactly one bucket (totals reconcile with the raw groupBy), each
    bucket's max fits its [lo, 2lo) range."""
    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.ring import w29_tablehistograms

    rows = w29_tablehistograms(spark, SF_SMOKE).collect()
    assert rows
    ev = Catalog(spark, SF_SMOKE).events
    assert sum(r.n_partitions for r in rows) == (
        ev.select("user_id").distinct().count()
    )
    assert sum(r.n_rows for r in rows) == ev.count()
    for r in rows:
        assert r.bucket_lo <= r.max_rows <= r.bucket_hi
        assert r.bucket_lo & (r.bucket_lo - 1) == 0, "power-of-two lo"


def test_removenode_restores_rf(spark):
    """Dead-node removal restores RF: total rows streamed equals the
    dead node's replica count under the old ring; every source is a
    SURVIVOR that replicated the partition before (never the dead
    node); new owners are survivors only."""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators import murmur3
    from cassandra_spark.operators.ring import (
        replica_case_sql,
        w30_removenode,
    )

    rows = w30_removenode(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.new_owner != "n3" and r.source_node != "n3" for r in rows)
    streamed = sum(r.n_streamed for r in rows)
    dead_replicas = (
        Catalog(spark, SF_SMOKE)
        .orders.select(
            murmur3.token_col(F.col("o_orderkey")).alias("token")
        )
        .withColumn("ra", F.expr(replica_case_sql("token")))
        .filter(F.expr("(',' || ra || ',') LIKE '%,n3,%'"))
        .count()
    )
    assert streamed == dead_replicas, (
        "every vacated replica lands on exactly one new owner"
    )
