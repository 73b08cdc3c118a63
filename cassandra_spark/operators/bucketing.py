"""Bucketed table layout: the co-located-join scale path.

The reference co-locates data by token ownership — every replica holds a
deterministic hash range of the ring, so multi-table reads of the same key
never cross nodes (`[C* dht/Murmur3Partitioner, locator/TokenMetadata,
unverified]`). Spark's equivalent is BUCKETING: both tables pre-hashed
into the same number of buckets on the join key at WRITE time; a later
join reads bucket i of each side in the same task — zero shuffle, zero
sort when also sort-ordered (SURVEY.md §4.1 "token-aware placement").

At 100 TB this is the difference between an hourly fact⋈fact job paying
two full-table exchanges and paying none: bucket layout is bought once at
ingest and amortized over every downstream join/aggregation on that key
(the same trade as compaction.py's directory buckets, which serve point
lookups; bucketBy serves JOINS because Spark's planner consumes the
bucket metadata).

Used as infrastructure (writes tables), so exercised by plan-asserting
tests rather than a ``queries()`` entry — same treatment as zorder.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_spark.catalog import Catalog


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-ordered) parquet
    table registered in the session catalog. ``path`` makes it external —
    no warehouse/metastore dependency; the bucket spec lives in the
    catalog entry, which is what lets the planner elide exchanges."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def cobucket_fact_tables(
    spark: SparkSession, sf_dir: str, base_path: str, buckets: int = 8
) -> tuple[str, str]:
    """Bucket lineitem and orders on the shared join key (orderkey) with
    identical bucket counts — the layout every TPC-H-shaped fact⋈fact
    join in this repo would consume at scale. Returns the table names."""
    cat = Catalog(spark, sf_dir)
    write_bucketed(
        cat.lineitem,
        "lineitem_b",
        f"{base_path}/lineitem_b",
        "l_orderkey",
        buckets,
    )
    write_bucketed(
        cat.orders.withColumnRenamed("o_orderkey", "o_orderkey"),
        "orders_b",
        f"{base_path}/orders_b",
        "o_orderkey",
        buckets,
    )
    return "lineitem_b", "orders_b"


def bucketed_join(spark: SparkSession) -> DataFrame:
    """The co-located join over the bucketed pair: with both sides
    bucketed (and sorted) on the key, the plan is a SortMergeJoin whose
    inputs come straight from the bucketed scans — no Exchange on either
    side (asserted in tests/test_bucketing.py)."""
    li = spark.table("lineitem_b")
    o = spark.table("orders_b")
    return li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_extendedprice", "o_orderdate", "o_totalprice"
    )
