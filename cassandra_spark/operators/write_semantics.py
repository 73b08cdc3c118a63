"""Write-path semantics recast as batch operators (tier W — SURVEY.md §2.9).

This is the distinctive part of the engine: Cassandra's continuous storage-
engine data processing — LWW reconciliation, TTL expiry, tombstone
shadowing, GC purge, counter merge, replica diff (`[C* db/compaction/
CompactionIterator, db/rows/Rows#merge, db/DeletionTime, db/counters/
CounterContext, repair/Validator]`, unverified — SURVEY.md §0) — expressed
as deterministic, distributed DataFrame transforms.

Modeling (§1.2/§1.3 + FIXTURES.md "W-tier synthesis"): the cell key is
(user_id = partition key, event_type = clustering/cell name), writetime =
µs epoch of ts, payload = value. Versioned inputs are synthesized
deterministically from `events` (a base generation + a derived update
generation) so no extra fixtures are needed. Every operator takes explicit
`asof` / `gc_horizon` literals — never wall-clock — for determinism.

Scale posture: all merges key on the partition key the data would already
be distributed by at 100 TB; tombstone and replica-summary sides are
aggregated-to-small before joining (broadcastable), never row×row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.exactmath import dsum, sql_dsum
from cassandra_spark.registry import query

# Fixed parameters for the tested queries (events span 2024-01-01..30).
TTL_S = 14 * 24 * 3600  # 14-day TTL
ASOF = "2024-01-20 00:00:00"  # evaluation instant for TTL liveness
GC_HORIZON = "2024-01-15 00:00:00"  # tombstones older than this are purged


def cell_versions(cat: Catalog) -> DataFrame:
    """Two overlapping generations of cell writes (memtable ∪ SSTable
    stand-in): the base generation is every event; the update generation
    re-writes every 5th event one hour later with value+100. `src` ranks
    generations for deterministic tie-breaking at equal writetime."""
    ev = cat.events.select("user_id", "event_type", "ts", "value", "event_id")
    base = ev.withColumn("src", F.lit(0))
    updates = (
        ev.filter(F.col("event_id") % 5 == 0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        .withColumn("value", F.col("value") + F.lit(100.0))
        .withColumn("src", F.lit(1))
    )
    return base.unionByName(updates).withColumn(
        "writetime", F.unix_micros(F.col("ts"))
    )


_CELLS_SQL = """
  SELECT user_id, event_type, ts, value, event_id, 0 AS src,
         epoch_us(ts) AS writetime
  FROM events
  UNION ALL
  SELECT user_id, event_type, ts + INTERVAL 1 HOUR, value + 100.0, event_id,
         1 AS src, epoch_us(ts + INTERVAL 1 HOUR) AS writetime
  FROM events WHERE event_id % 5 = 0
"""


@query(
    "w4_upsert_merge",
    oracle=f"""
    SELECT user_id, event_type, value AS latest_value,
           writetime AS latest_writetime
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY writetime DESC, src DESC, event_id DESC) AS rn
      FROM ({_CELLS_SQL})
    ) WHERE rn = 1
    """,
)
def w4_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LWW compaction/merge (W1+W4): k-way merge of generations, newest
    writetime wins per cell (`[C* db/compaction/CompactionIterator,
    UnfilteredRowIterators#merge]`). unionByName → per-key window, one
    shuffle on the partition key. Tie-break (src, event_id) mirrors the
    reference's deterministic reconcile order for equal timestamps."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("writetime").desc(), F.col("src").desc(), F.col("event_id").desc()
    )
    return (
        cell_versions(cat)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("value").alias("latest_value"),
            F.col("writetime").alias("latest_writetime"),
        )
    )


@query(
    "w2_ttl_expiry",
    oracle=f"""
    SELECT event_id, user_id, event_type, ts, value
    FROM events
    WHERE epoch_us(ts) + CAST({TTL_S} AS BIGINT) * 1000000
          > epoch_us(TIMESTAMP '{ASOF}')
    """,
)
def w2_ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL expiry (`[C* db/LivenessInfo, db/rows/Cell#isLive]`): a cell is
    live iff writetime + ttl > asof. Explicit asof literal — determinism
    rule §4.3. The predicate folds to `ts > asof - ttl`, which pushes down
    to the scan."""
    cat = Catalog(spark, sf_dir)
    writetime = F.unix_micros(F.col("ts"))
    asof_us = F.unix_micros(F.lit(ASOF).cast("timestamp"))
    return cat.events.filter(
        writetime + F.lit(TTL_S).cast("bigint") * 1000000 > asof_us
    ).select("event_id", "user_id", "event_type", "ts", "value")


_TOMBSTONES_SQL = """
  SELECT user_id, MAX(ts) AS tomb_ts FROM events
  WHERE event_type = 'error' GROUP BY user_id
"""


@query(
    "w3_tombstone_filter",
    oracle=f"""
    SELECT e.event_id, e.user_id, e.event_type, e.ts, e.value
    FROM events e
    LEFT JOIN ({_TOMBSTONES_SQL}) t ON e.user_id = t.user_id
    WHERE e.event_type <> 'error'
      AND (t.tomb_ts IS NULL OR e.ts > t.tomb_ts)
    """,
)
def w3_tombstone_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone shadowing (`[C* db/DeletionTime, db/RangeTombstone]`):
    'error' events model partition-level deletion markers; a data row is
    visible iff no tombstone on its partition has tomb_ts >= row ts.
    Tombstones aggregate to one row per partition key first (max marker),
    so the join side is tiny and broadcast — never a row×row anti-join."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events
    tombs = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.max("ts").alias("tomb_ts"))
    )
    return (
        ev.filter(F.col("event_type") != "error")
        .join(F.broadcast(tombs), "user_id", "left")
        .filter(F.col("tomb_ts").isNull() | (F.col("ts") > F.col("tomb_ts")))
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


@query(
    "w5_gc_purge",
    oracle=f"""
    SELECT e.event_id, e.user_id, e.event_type, e.ts, e.value,
           FALSE AS is_tombstone
    FROM events e
    LEFT JOIN ({_TOMBSTONES_SQL}) t ON e.user_id = t.user_id
    WHERE e.event_type <> 'error'
      AND (t.tomb_ts IS NULL OR e.ts > t.tomb_ts)
    UNION ALL
    SELECT event_id, user_id, event_type, ts, value, TRUE AS is_tombstone
    FROM events
    WHERE event_type = 'error' AND ts >= TIMESTAMP '{GC_HORIZON}'
    """,
)
def w5_gc_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone GC (`[C* db/compaction/CompactionController#
    getPurgeEvaluator]`): compaction output = unshadowed data + tombstones
    still within gc_grace (young markers must survive to keep shadowing
    other replicas' data). Old tombstones are purged."""
    cat = Catalog(spark, sf_dir)
    live = w3_tombstone_filter(spark, sf_dir).withColumn(
        "is_tombstone", F.lit(False)
    )
    young_tombs = (
        cat.events.filter(
            (F.col("event_type") == "error")
            & (F.col("ts") >= F.lit(GC_HORIZON).cast("timestamp"))
        )
        .select("event_id", "user_id", "event_type", "ts", "value")
        .withColumn("is_tombstone", F.lit(True))
    )
    return live.unionByName(young_tombs)


@query(
    "w6_counter_sum",
    oracle=f"""
    SELECT user_id, event_type,
           {sql_dsum('value', 'counter_value')},
           CAST(COUNT(*) AS BIGINT) AS n_increments
    FROM events
    GROUP BY user_id, event_type
    """,
)
def w6_counter_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter reconcile (`[C* db/counters/CounterContext]`): a counter's
    value is the SUM of shard increments — commutative merge, NOT LWW
    (SURVEY.md §7 fidelity note). Map-side partial sums make this one
    cheap shuffle at any scale."""
    cat = Catalog(spark, sf_dir)
    return cat.events.groupBy("user_id", "event_type").agg(
        dsum("value", "counter_value"),
        F.count(F.lit(1)).alias("n_increments"),
    )


# Replica diff: deterministic "replicas" = overlapping event subsets with
# distinct drop patterns (simulating missed writes on each side).
_REPLICA_A = "event_id % 97 <> 0"
_REPLICA_B = "event_id % 89 <> 0"
_CKSUM = "(event_id * 2654435761) % 9007199254740993"


@query(
    "w8_replica_diff",
    oracle=f"""
    WITH a AS (
      SELECT user_id % 16 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_a,
             CAST(bit_xor({_CKSUM}) AS BIGINT) AS cksum_a
      FROM events WHERE {_REPLICA_A} GROUP BY user_id % 16
    ), b AS (
      SELECT user_id % 16 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(bit_xor({_CKSUM}) AS BIGINT) AS cksum_b
      FROM events WHERE {_REPLICA_B} GROUP BY user_id % 16
    )
    SELECT a.bucket, n_a, n_b, cksum_a, cksum_b,
           (n_a = n_b AND cksum_a = cksum_b) AS in_sync
    FROM a JOIN b ON a.bucket = b.bucket
    """,
)
def w8_replica_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repair diff (`[C* repair/Validator, utils/MerkleTree]`): Merkle-style
    per-token-range comparison — each replica reduces to (bucket, count,
    xor-checksum), and only mismatched buckets would be streamed. The
    reduce-then-compare shape is exactly why repair scales: the join is
    over 16 summary rows, not 2×N data rows."""
    cat = Catalog(spark, sf_dir)

    def summarize(pred: str, n_alias: str, ck_alias: str) -> DataFrame:
        return (
            cat.events.filter(F.expr(pred))
            .withColumn("bucket", F.col("user_id") % 16)
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias(n_alias),
                F.expr(f"bit_xor({_CKSUM})").cast("bigint").alias(ck_alias),
            )
        )

    a = summarize(_REPLICA_A, "n_a", "cksum_a")
    b = summarize(_REPLICA_B, "n_b", "cksum_b")
    return a.join(b, "bucket").select(
        "bucket",
        "n_a",
        "n_b",
        "cksum_a",
        "cksum_b",
        (
            (F.col("n_a") == F.col("n_b"))
            & (F.col("cksum_a") == F.col("cksum_b"))
        ).alias("in_sync"),
    )


@query(
    "w16_read_repair",
    oracle=f"""
    WITH a AS (SELECT event_id, user_id, user_id % 16 AS bucket
               FROM events WHERE {_REPLICA_A}),
         b AS (SELECT event_id, user_id, user_id % 16 AS bucket
               FROM events WHERE {_REPLICA_B}),
         sa AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(bit_xor({_CKSUM}) AS BIGINT) AS ck
                FROM events WHERE {_REPLICA_A} GROUP BY bucket),
         sb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(bit_xor({_CKSUM}) AS BIGINT) AS ck
                FROM events WHERE {_REPLICA_B} GROUP BY bucket),
         bad AS (SELECT sa.bucket FROM sa JOIN sb ON sa.bucket = sb.bucket
                 WHERE sa.n <> sb.n OR sa.ck <> sb.ck)
    SELECT COALESCE(a.event_id, b.event_id) AS event_id,
           COALESCE(a.user_id, b.user_id) AS user_id,
           COALESCE(a.bucket, b.bucket) AS bucket,
           CASE WHEN b.event_id IS NULL THEN 'a_to_b'
                ELSE 'b_to_a' END AS direction
    FROM (SELECT * FROM a WHERE bucket IN (SELECT bucket FROM bad)) a
    FULL OUTER JOIN
         (SELECT * FROM b WHERE bucket IN (SELECT bucket FROM bad)) b
      ON a.event_id = b.event_id
    WHERE a.event_id IS NULL OR b.event_id IS NULL
    """,
)
def w16_read_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repair phase behind w8's diff (`[C* repair/RepairJob,
    StreamingRepairTask, unverified]`): only the rows of OUT-OF-SYNC
    Merkle buckets are compared row-by-row, and the output is the repair
    stream — which rows each replica must send the other. The bucket
    restriction is the reason repair scales: the expensive full-outer
    compare runs over mismatched buckets only, never the whole table; at
    100 TB the summary pass is a scan-reduce and the compare is bounded by
    actual drift."""
    cat = Catalog(spark, sf_dir)
    bucket = (F.col("user_id") % 16).alias("bucket")

    def replica(pred: str) -> DataFrame:
        return cat.events.filter(F.expr(pred)).select(
            "event_id", "user_id", bucket
        )

    def summary(pred: str) -> DataFrame:
        return (
            replica(pred)
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(f"bit_xor({_CKSUM})").cast("bigint").alias("ck"),
            )
        )

    sa, sb = summary(_REPLICA_A), summary(_REPLICA_B)
    bad = (
        sa.alias("sa")
        .join(sb.alias("sb"), "bucket")
        .filter(
            (F.col("sa.n") != F.col("sb.n")) | (F.col("sa.ck") != F.col("sb.ck"))
        )
        .select("bucket")
    )
    a = replica(_REPLICA_A).join(F.broadcast(bad), "bucket")
    b = replica(_REPLICA_B).join(F.broadcast(bad), "bucket")
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.event_id") == F.col("b.event_id"), "full_outer"
    )
    return (
        joined.filter(
            F.col("a.event_id").isNull() | F.col("b.event_id").isNull()
        )
        .select(
            F.coalesce(F.col("a.event_id"), F.col("b.event_id")).alias("event_id"),
            F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
            F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"),
            F.when(F.col("b.event_id").isNull(), F.lit("a_to_b"))
            .otherwise(F.lit("b_to_a"))
            .alias("direction"),
        )
    )


@query(
    "w19_consistency_levels",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS truth_rows,
           CAST(sum(CASE WHEN NOT (event_id % 3 = 0 AND event_id % 7 = 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS one_rows,
           CAST(count(*) AS BIGINT) AS quorum_rows,
           CAST(count(*) AS BIGINT) AS all_rows,
           CAST(sum(CASE WHEN event_id % 3 = 0 AND event_id % 7 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS one_stale
    FROM events
    """,
)
def w19_consistency_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read consistency levels over divergent replicas (`[C* service/
    reads/AbstractReadExecutor; db/ConsistencyLevel, unverified]`).

    Divergence model: replica r (of 3) dropped the mutations where
    ``event_id % 3 = r AND event_id % 7 = 0`` — each write still reached
    2 of 3 replicas (the W=QUORUM write contract). The CL identity this
    derives: a CL=ONE read served by replica 0 misses exactly replica 0's
    dropped slice; ANY two-replica quorum covers every row (missing sets
    are pairwise disjoint), so QUORUM == ALL == truth. R+W > N made
    measurable.

    Shape: ONE conditional-aggregate scan — the replica views are
    predicates, not copies, so the check costs a single pass at any
    corpus size (the same trick w8's Merkle diff uses per bucket)."""
    cat = Catalog(spark, sf_dir)
    dropped_r0 = (F.col("event_id") % 3 == 0) & (F.col("event_id") % 7 == 0)
    return cat.events.agg(
        F.count(F.lit(1)).alias("truth_rows"),
        F.sum((~dropped_r0).cast("long")).alias("one_rows"),
        F.count(F.lit(1)).alias("quorum_rows"),
        F.count(F.lit(1)).alias("all_rows"),
        F.sum(dropped_r0.cast("long")).alias("one_stale"),
    )
