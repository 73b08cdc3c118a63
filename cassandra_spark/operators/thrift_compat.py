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


# --- t6: Thrift WRITE path — batch_mutate reconcile --------------------------
#
# `batch_mutate(key -> cf -> [Mutation])` is the Thrift-era write API
# (`[C* (0.6) service/StorageProxy#mutate, thrift/CassandraServer,
# unverified]`): a Mutation is either a column put (name, value, client
# timestamp) or a Deletion (timestamp, optionally a SlicePredicate of
# column names). Reconciliation is pure LWW against the deletion
# timestamps: a put is live iff its timestamp is strictly newer than
# every deletion covering it (row-level or name-level).
#
# The tested mutation stream is derived deterministically from the
# events table (the w-tier replay convention):
#   puts gen-0: every event            (name=event_id, wt=epoch_us(ts))
#   puts gen-1: every 4th event, +1h   (the upsert overwrite)
#   row Deletion per user: timestamp = that user's newest 'error' event
#   name Deletion: names with event_id%7==3, timestamp = gen-0 wt + 1
#     (shadows the gen-0 put but NOT a gen-1 rewrite — timestamp order,
#     not arrival order, decides)

_T6_PUTS_SQL = """
  SELECT user_id, event_id AS name, value, epoch_us(ts) AS wt, 0 AS src
  FROM events
  UNION ALL
  SELECT user_id, event_id, value + 50.0,
         epoch_us(ts + INTERVAL 1 HOUR), 1
  FROM events WHERE event_id % 4 = 0
"""


@query(
    "t6_batch_mutate",
    oracle=f"""
    WITH puts AS ({_T6_PUTS_SQL}),
    row_dels AS (
      SELECT user_id, MAX(epoch_us(ts)) AS del_wt
      FROM events WHERE event_type = 'error' GROUP BY user_id
    ),
    name_dels AS (
      SELECT user_id, event_id AS name, epoch_us(ts) + 1 AS del_wt
      FROM events WHERE event_id % 7 = 3
    ),
    latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, name ORDER BY wt DESC, src DESC) AS rn
        FROM puts
      ) WHERE rn = 1
    ),
    live AS (
      SELECT l.user_id, l.name, l.wt FROM latest l
      LEFT JOIN row_dels r ON r.user_id = l.user_id
      LEFT JOIN name_dels n
        ON n.user_id = l.user_id AND n.name = l.name
      WHERE (r.del_wt IS NULL OR l.wt > r.del_wt)
        AND (n.del_wt IS NULL OR l.wt > n.del_wt)
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_live,
           MAX(name) AS max_name, MAX(wt) AS max_writetime
    FROM live GROUP BY user_id ORDER BY user_id
    """,
)
def t6_batch_mutate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thrift batch_mutate applied + read back: per-column LWW over the
    put generations, then row-level and name-level Deletion shadowing by
    client timestamp. Plan shape: one shuffle keyed (user_id, name) for
    the LWW window, a per-user aggregate join for row deletions, an
    equi-join for name deletions, one final per-user aggregate — no
    driver-side mutation loop, the whole batch reconciles as a plan."""
    ev = Catalog(spark, sf_dir).events
    wt = F.unix_micros(F.col("ts"))
    puts = (
        ev.select(
            "user_id",
            F.col("event_id").alias("name"),
            "value",
            wt.alias("wt"),
            F.lit(0).alias("src"),
        )
        .unionByName(
            ev.filter(F.col("event_id") % 4 == 0).select(
                "user_id",
                F.col("event_id").alias("name"),
                (F.col("value") + 50.0).alias("value"),
                F.unix_micros(
                    F.col("ts") + F.expr("INTERVAL 1 HOUR")
                ).alias("wt"),
                F.lit(1).alias("src"),
            )
        )
    )
    row_dels = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.max(wt).alias("row_del_wt"))
    )
    name_dels = ev.filter(F.col("event_id") % 7 == 3).select(
        "user_id",
        F.col("event_id").alias("name"),
        (wt + 1).alias("name_del_wt"),
    )
    w = Window.partitionBy("user_id", "name").orderBy(
        F.col("wt").desc(), F.col("src").desc()
    )
    latest = (
        puts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    live = (
        latest.join(row_dels, "user_id", "left")
        .join(name_dels, ["user_id", "name"], "left")
        .filter(
            (F.col("row_del_wt").isNull() | (F.col("wt") > F.col("row_del_wt")))
            & (
                F.col("name_del_wt").isNull()
                | (F.col("wt") > F.col("name_del_wt"))
            )
        )
    )
    return (
        live.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.max("name").alias("max_name"),
            F.max("wt").alias("max_writetime"),
        )
        .orderBy("user_id")
    )
