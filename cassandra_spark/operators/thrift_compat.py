"""Thrift-era read API (the surface a circa-2010 Cassandra fork exposes):
``get_slice`` / ``multiget_slice`` / ``get_range_slices`` / ``get_count``
(`[C* (0.6) interface/thrift generated servicer + service/StorageProxy,
unverified]` — see SURVEY.md §0 on the fork-era ambiguity and §3 entry
point 3).

Model mapping: a Thrift wide row is one partition; its "columns" are the
clustering-addressed rows (SURVEY §1.1 — super/dynamic columns became
composite clustering keys). So:

- ``get_slice(key, start..finish, count, reversed)`` = single-partition
  clustering slice with a limit — one pruned scan, TakeOrderedAndProject.
- ``multiget_slice(keys, ..., count)`` = the same per key — count applies
  PER ROW (per partition), exactly the Thrift contract.
- ``get_range_slices(start_token..end_token, count)`` = a token-ring
  slice: the bulk-read primitive drivers used to parallelize full scans —
  keyed by bit-exact Murmur3Partitioner tokens (operators/murmur3.py), so
  a real driver's precomputed token ranges line up exactly.
- ``get_count(key)`` = the row's live column count.

Everything compiles to the same pruned DataFrame plans as the R/O tiers;
this module exists so a Thrift-era caller's access pattern has a named,
oracle-checked home.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators import murmur3
from cassandra_spark.registry import query


def get_slice(
    events: DataFrame,
    key: int,
    start: str | None = None,
    finish: str | None = None,
    count: int = 100,
    reversed_: bool = False,
) -> DataFrame:
    """One wide row's column slice: events keyed by user_id, columns in
    (ts DESC, event_id) clustering order; ``start``/``finish`` bound ts
    (inclusive), ``reversed_`` flips to ascending."""
    df = events.filter(F.col("user_id") == key)
    if start is not None:
        df = df.filter(F.col("ts") >= F.lit(start).cast("timestamp"))
    if finish is not None:
        df = df.filter(F.col("ts") <= F.lit(finish).cast("timestamp"))
    order = (
        [F.col("ts").asc(), F.col("event_id").asc()]
        if reversed_
        else [F.col("ts").desc(), F.col("event_id").asc()]
    )
    return df.orderBy(*order).limit(count).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )


def multiget_slice(
    events: DataFrame, keys: list[int], count: int = 100
) -> DataFrame:
    """Per-key slices in one call: ``count`` newest columns PER ROW (the
    Thrift contract) — compiles to one shuffle-per-window pass, not a
    driver loop over keys."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").asc()
    )
    return (
        events.filter(F.col("user_id").isin(keys))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= count)
        .drop("__rn")
        .select("user_id", "ts", "event_id", "event_type", "value")
    )


def get_range_slices(
    events: DataFrame,
    start_token: int,
    end_token: int,
    row_count: int = 100,
) -> DataFrame:
    """Token-ring slice: all rows of the partitions whose token falls in
    [start_token, end_token], keys in token order — the Thrift-era bulk
    scan primitive (each worker of a parallel dump takes one slice)."""
    token = murmur3.token_col(F.col("user_id"))
    keys = (
        events.select("user_id").distinct()
        .withColumn("__token", token)
        .filter(F.col("__token").between(start_token, end_token))
        .orderBy("__token", "user_id")
        .limit(row_count)
    )
    return (
        events.join(F.broadcast(keys), "user_id")
        .select(
            "user_id", F.col("__token").alias("token"),
            "ts", "event_id", "event_type", "value",
        )
    )


@query(
    "t1_get_slice",
    oracle="""
    SELECT user_id, ts, event_id, event_type, value
    FROM events
    WHERE user_id = 7
      AND ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <= TIMESTAMP '2024-01-25 00:00:00'
    ORDER BY ts DESC, event_id ASC
    LIMIT 20
    """,
)
def t1_get_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thrift get_slice: one row's bounded column slice, newest first."""
    return get_slice(
        Catalog(spark, sf_dir).events,
        key=7,
        start="2024-01-05 00:00:00",
        finish="2024-01-25 00:00:00",
        count=20,
    )


@query(
    "t2_multiget_slice",
    oracle="""
    SELECT user_id, ts, event_id, event_type, value
    FROM (
      SELECT user_id, ts, event_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events WHERE user_id IN (3, 5, 8)
    ) WHERE rn <= 5
    """,
)
def t2_multiget_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thrift multiget_slice: newest 5 columns for each of 3 row keys."""
    return multiget_slice(Catalog(spark, sf_dir).events, [3, 5, 8], count=5)


_T3_LO = -(1 << 62)  # one quadrant of the Murmur3 ring
_T3_HI = 0


@query(
    "t3_range_slices",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT DISTINCT user_id FROM events", "user_id")}
    ),
    keys AS (
      SELECT user_id, token FROM __toks
      WHERE token BETWEEN {_T3_LO} AND {_T3_HI}
      ORDER BY token, user_id
      LIMIT 25
    )
    SELECT e.user_id, k.token, e.ts, e.event_id, e.event_type, e.value
    FROM events e JOIN keys k ON e.user_id = k.user_id
    """,
)
def t3_range_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thrift get_range_slices: one Murmur3 token-ring slice of ≤25 row
    keys with all their columns — the parallel bulk-dump primitive; the
    band is one ring quadrant, exactly what a production driver would
    hand a worker."""
    return get_range_slices(
        Catalog(spark, sf_dir).events,
        start_token=_T3_LO,
        end_token=_T3_HI,
        row_count=25,
    )


def super_get_slice(
    events: DataFrame,
    key: int,
    start: str | None = None,
    finish: str | None = None,
    count: int = 10,
) -> DataFrame:
    """``get_slice`` on a SUPER column family (the 2010-fork two-level
    row: key -> super column -> sub-column). SURVEY §1.1's documented
    equivalence maps the super level to the FIRST clustering component —
    here user_id -> event_type (super) -> event_id (sub). The Thrift
    contract this preserves: ``count`` bounds SUPER columns, and a
    selected super column is returned WHOLE (all sub-columns), never
    partially — so the bound is a dense_rank over the super name, not a
    row limit. One partition-pruned scan + one window pass."""
    df = events.filter(F.col("user_id") == key)
    if start is not None:
        df = df.filter(F.col("event_type") >= start)
    if finish is not None:
        df = df.filter(F.col("event_type") <= finish)
    w = Window.partitionBy("user_id").orderBy(F.col("event_type").asc())
    return (
        df.withColumn("__sc", F.dense_rank().over(w))
        .filter(F.col("__sc") <= count)
        .drop("__sc")
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@query(
    "t5_super_slice",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
      SELECT user_id, event_type, event_id, ts, value,
             dense_rank() OVER (
               PARTITION BY user_id ORDER BY event_type ASC) AS sc
      FROM events
      WHERE user_id = 7 AND event_type >= 'c'
    ) WHERE sc <= 2
    """,
)
def t5_super_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thrift get_slice on a super-column family: the first 2 super
    columns (event_type) at/after 'c' in one wide row, each returned
    whole with every sub-column (event_id cell)."""
    return super_get_slice(
        Catalog(spark, sf_dir).events, key=7, start="c", count=2
    )


@query(
    "t4_get_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE user_id = 7
    """,
)
def t4_get_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thrift get_count: the number of live columns in one wide row."""
    return (
        Catalog(spark, sf_dir).events
        .filter(F.col("user_id") == 7)
        .agg(F.count(F.lit(1)).alias("n"))
    )
