"""Incremental repair (w17): marker reuse, sealed-epoch pruning, and the
drift-bounded streaming phase."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cassandra_spark.operators import repair

SF = "/root/testdata/sf0.01"


def test_marker_sealed_once_and_reused(spark):
    cutoff = repair.ensure_repair_marker(spark, SF)
    d = repair._marker_dir(spark, SF)
    sidecar = os.path.join(d, repair._MARKER_FILE)
    assert os.path.exists(sidecar)
    mtime = os.path.getmtime(sidecar)
    # second call must reattach, not rewrite (no sealed-epoch rescan)
    assert repair.ensure_repair_marker(spark, SF) == cutoff
    assert os.path.getmtime(sidecar) == mtime
    # sealed summaries are readable and bucket-complete
    summ = spark.read.parquet(os.path.join(d, "summaries"))
    assert summ.count() == 16
    assert {f.name for f in summ.schema.fields} == {"bucket", "n", "ck"}


def test_w17_prunes_sealed_epoch_in_scan(spark):
    """The parquet scans must carry ts >= cutoff in PushedFilters —
    repaired data is pruned at the reader, never revalidated."""
    df = repair.w17_incremental_repair(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ts" in plan
    # streaming phase is bounded by the broadcast bad-bucket set
    assert "BroadcastHashJoin" in plan


def test_w17_drift_is_bucket_sparse(spark):
    """Divergence is pinned to buckets {2, 5, 9, 11}; every emitted
    repair row must fall there, and both directions must appear."""
    rows = repair.w17_incremental_repair(spark, SF).collect()
    assert rows, "pinned divergence must produce a repair stream"
    assert {r["bucket"] for r in rows} <= {2, 5, 9, 11}
    assert {r["direction"] for r in rows} == {"a_to_b", "b_to_a"}


def test_w17_repair_stream_is_exactly_the_divergence(spark):
    """Every row a replica misses (and only those) is streamed toward it."""
    from cassandra_spark.catalog import Catalog

    cat = Catalog(spark, SF)
    unrep = cat.events.filter(
        F.col("ts") >= F.lit(repair.CUTOFF).cast("timestamp")
    )
    a_missing = (
        unrep.filter(~F.expr(repair._A_DROP)).select("event_id").collect()
    )
    b_missing = (
        unrep.filter(~F.expr(repair._B_DROP)).select("event_id").collect()
    )
    want_b_to_a = {r["event_id"] for r in a_missing}
    want_a_to_b = {r["event_id"] for r in b_missing}
    # rows missing from BOTH replicas are invisible to anti-entropy
    both = want_b_to_a & want_a_to_b
    rows = repair.w17_incremental_repair(spark, SF).collect()
    got_b_to_a = {r["event_id"] for r in rows if r["direction"] == "b_to_a"}
    got_a_to_b = {r["event_id"] for r in rows if r["direction"] == "a_to_b"}
    assert got_b_to_a == want_b_to_a - both
    assert got_a_to_b == want_a_to_b - both
