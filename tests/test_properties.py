"""Property checks (SURVEY.md §5.2-3): algebraic invariants of the W-tier
merge semantics plus sketch-aggregate sanity (the approx variants that can't
be oracle-compared)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_w4_merge_idempotent(spark):
    """merge(merge(x)) == merge(x): LWW compaction is idempotent — the
    defining property of Cassandra reconciliation."""
    from cassandra_spark.operators.write_semantics import w4_upsert_merge
    from pyspark.sql import Window

    merged = w4_upsert_merge(spark, SF_SMOKE)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("latest_writetime").desc()
    )
    remerged = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, remerged.collect())
    )


def test_w2_ttl_subset(spark):
    """TTL expiry only removes rows, never invents them."""
    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.write_semantics import w2_ttl_expiry

    live = w2_ttl_expiry(spark, SF_SMOKE)
    total = Catalog(spark, SF_SMOKE).events.count()
    n_live = live.count()
    assert 0 < n_live < total


def test_w3_shadow_monotone(spark):
    """Tombstone filter output contains no error rows and no row at-or-
    before its partition's newest tombstone."""
    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.write_semantics import w3_tombstone_filter

    cat = Catalog(spark, SF_SMOKE)
    out = w3_tombstone_filter(spark, SF_SMOKE)
    assert out.filter(F.col("event_type") == "error").count() == 0
    tombs = (
        cat.events.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.max("ts").alias("tomb_ts"))
    )
    violations = out.join(tombs, "user_id").filter(
        F.col("ts") <= F.col("tomb_ts")
    )
    assert violations.count() == 0


def test_approx_count_distinct_close(spark):
    """HLL sketch (the reference's EstimatedHistogram analogue) lands
    within 5% of exact at this cardinality."""
    from cassandra_spark.catalog import Catalog

    orders = Catalog(spark, SF_SMOKE).orders
    exact = orders.select("o_custkey").distinct().count()
    approx = orders.agg(
        F.approx_count_distinct("o_custkey").alias("a")
    ).collect()[0].a
    assert abs(approx - exact) / exact < 0.05


def test_percentile_approx_bounds(spark):
    """t-digest percentile (the 100 TB path) stays within the exact
    percentile's neighborhood."""
    from cassandra_spark.catalog import Catalog

    li = Catalog(spark, SF_SMOKE).lineitem
    row = li.agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("approx"),
        F.percentile("l_quantity", F.lit(0.5)).alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= 1.0


def test_release_caches_unpins_all_blocks(spark):
    """Persist hygiene: the persist-barrier blocks query constructors pin
    (llm_dedup/llm_vectors) must all drop on registry.release_caches —
    after a sweep the session holds zero cached RDD blocks."""
    from cassandra_spark import registry
    from tests.conftest import SF_SMOKE

    registry.load_all()
    jsc = spark.sparkContext._jsc.sc()

    def rdd_ids() -> set[int]:
        return {info.id() for info in jsc.getRDDStorageInfo()}

    # earlier tests in the same session may (a) hold blocks clearCache
    # cannot drop (localCheckpoint RDDs from l17, streaming state) and
    # (b) have ALREADY cached these constructors' plans (CacheManager
    # dedupes by canonicalized plan, so re-persisting yields no new id).
    # Start from a released state, then measure the delta.
    registry.release_caches(spark)
    pre = rdd_ids()
    for name in ("l2b_simhash", "l3b_lsh_ann"):
        registry.QUERIES[name](spark, SF_SMOKE).count()
    assert rdd_ids() - pre, "barriers really persisted"
    registry.release_caches(spark)
    assert not (rdd_ids() - pre), "release_caches must drop the new blocks"
