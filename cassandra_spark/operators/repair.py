"""Incremental repair (`[C* repair/consistent/LocalSessions,
db/compaction/CompactionStrategyManager (repaired/unrepaired separation),
unverified]`): anti-entropy that never revalidates sealed data.

The reference's incremental repair marks SSTables *repaired* at the end of
a successful session; the next session builds Merkle trees over the
UNREPAIRED set only, so validation cost tracks drift since the last
repair, not table size. This module models the same contract Spark-first:

- **Repair marker** — one parquet per (warehouse, corpus) holding the
  sealed epoch's per-bucket Merkle summaries plus a JSON sidecar with the
  epoch cutoff (the ``repairedAt`` timestamp). First ``w17`` call per
  corpus materializes it (idempotent infrastructure, like
  bucketing.ensure_bucketed_layout); later calls — and later *sessions* —
  reattach without rescanning the sealed epoch. The cutoff flows from the
  sidecar into the plan as a literal, so the scans carry
  ``ts >= cutoff`` in PushedFilters: repaired data is pruned at the
  parquet reader, never revalidated (plan-asserted in
  tests/test_repair.py).
- **Validation** — per-bucket (count, xor-checksum) summaries over the
  unrepaired slice of each replica: one scan-reduce each, 16 summary rows
  out. Buckets whose summaries match are in sync and are never read
  again.
- **Streaming phase** — only drifted buckets' unrepaired rows enter the
  row-level full-outer compare (broadcast of the ≤16-row bad-bucket set),
  emitting the repair stream with direction, exactly w16's shape but
  bounded by drift × unrepaired instead of whole-table.

Pinned two-replica divergence (deterministic, oracle-mirrored): the
replicas agree bit-for-bit on the sealed epoch (repair made them — that is
what ``repaired`` means) and diverge only in the unrepaired slice, in a
bucket-sparse pattern, so most buckets prune at the summary stage.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query

# Sealed epoch: both replicas hold identical data before this ts.
CUTOFF = "2024-01-20 00:00:00"
# Missed-write patterns, unrepaired slice only, bucket-sparse by
# construction: drift can only appear in buckets {2, 5, 9, 11}.
_A_DROP = "NOT (event_id % 7 = 0 AND user_id % 16 IN (2, 5, 11))"
_B_DROP = "NOT (event_id % 11 = 0 AND user_id % 16 IN (5, 9))"
_CKSUM = "(event_id * 2654435761) % 9007199254740993"

_MARKER_FILE = "_repair_marker.json"


def _marker_dir(spark: SparkSession, sf_dir: str) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir")
    local = wh[5:] if wh.startswith("file:") else wh
    tag = re.sub(r"\W+", "_", sf_dir.strip("/"))
    return os.path.join(local, "repair_marker", tag)


def ensure_repair_marker(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently seal the repaired epoch: write the per-bucket Merkle
    summaries of the sealed slice plus the cutoff sidecar. Returns the
    sealed-epoch cutoff (read back from the sidecar when a prior run —
    even a prior session — already sealed it, proving re-runs never
    rescan the sealed epoch)."""
    d = _marker_dir(spark, sf_dir)
    sidecar = os.path.join(d, _MARKER_FILE)
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)["cutoff"]
    cat = Catalog(spark, sf_dir)
    sealed = (
        cat.events.filter(F.col("ts") < F.lit(CUTOFF).cast("timestamp"))
        .withColumn("bucket", F.col("user_id") % 16)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"bit_xor({_CKSUM})").cast("bigint").alias("ck"),
        )
    )
    sealed.write.mode("overwrite").parquet(os.path.join(d, "summaries"))
    os.makedirs(d, exist_ok=True)
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"cutoff": CUTOFF, "buckets": 16}, f)
    os.replace(tmp, sidecar)  # sidecar last: presence implies summaries
    return CUTOFF


@query(
    "w17_incremental_repair",
    oracle=f"""
    WITH a AS (
      SELECT event_id, user_id, user_id % 16 AS bucket FROM events
      WHERE ts >= TIMESTAMP '{CUTOFF}' AND {_A_DROP}
    ), b AS (
      SELECT event_id, user_id, user_id % 16 AS bucket FROM events
      WHERE ts >= TIMESTAMP '{CUTOFF}' AND {_B_DROP}
    ), sa AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(bit_xor({_CKSUM}) AS BIGINT) AS ck
      FROM a GROUP BY bucket
    ), sb AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(bit_xor({_CKSUM}) AS BIGINT) AS ck
      FROM b GROUP BY bucket
    ), bad AS (
      SELECT sa.bucket FROM sa JOIN sb ON sa.bucket = sb.bucket
      WHERE sa.n <> sb.n OR sa.ck <> sb.ck
    )
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
def w17_incremental_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental repair: validate the UNREPAIRED slice only (cutoff read
    from the sealed marker, pushed to the parquet scan), prune in-sync
    buckets via the 16-row summary join, row-compare only drifted
    buckets' unrepaired rows. At 100 TB the sealed epoch — the
    overwhelming bulk of the table — is never read: cost is
    O(unrepaired scan) + O(drift)."""
    cutoff = ensure_repair_marker(spark, sf_dir)
    cat = Catalog(spark, sf_dir)
    unrepaired = cat.events.filter(
        F.col("ts") >= F.lit(cutoff).cast("timestamp")
    )
    bucket = (F.col("user_id") % 16).alias("bucket")

    def replica(drop_pred: str) -> DataFrame:
        return unrepaired.filter(F.expr(drop_pred)).select(
            "event_id", "user_id", bucket
        )

    def summary(drop_pred: str) -> DataFrame:
        return (
            replica(drop_pred)
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(f"bit_xor({_CKSUM})").cast("bigint").alias("ck"),
            )
        )

    sa, sb = summary(_A_DROP), summary(_B_DROP)
    bad = (
        sa.alias("sa")
        .join(sb.alias("sb"), "bucket")
        .filter(
            (F.col("sa.n") != F.col("sb.n"))
            | (F.col("sa.ck") != F.col("sb.ck"))
        )
        .select("bucket")
    )
    a = replica(_A_DROP).join(F.broadcast(bad), "bucket")
    b = replica(_B_DROP).join(F.broadcast(bad), "bucket")
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.event_id") == F.col("b.event_id"), "full_outer"
    )
    return (
        joined.filter(
            F.col("a.event_id").isNull() | F.col("b.event_id").isNull()
        )
        .select(
            F.coalesce(F.col("a.event_id"), F.col("b.event_id")).alias(
                "event_id"
            ),
            F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias(
                "user_id"
            ),
            F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"),
            F.when(F.col("b.event_id").isNull(), F.lit("a_to_b"))
            .otherwise(F.lit("b_to_a"))
            .alias("direction"),
        )
    )


@query(
    "w31_repair_preview",
    oracle=f"""
    WITH a AS (
      SELECT event_id, user_id, user_id % 16 AS bucket FROM events
      WHERE ts >= TIMESTAMP '{CUTOFF}' AND {_A_DROP}
    ), b AS (
      SELECT event_id, user_id, user_id % 16 AS bucket FROM events
      WHERE ts >= TIMESTAMP '{CUTOFF}' AND {_B_DROP}
    ), sa AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(bit_xor({_CKSUM}) AS BIGINT) AS ck
      FROM a GROUP BY bucket
    ), sb AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(bit_xor({_CKSUM}) AS BIGINT) AS ck
      FROM b GROUP BY bucket
    ), bad AS (
      SELECT sa.bucket FROM sa JOIN sb ON sa.bucket = sb.bucket
      WHERE sa.n <> sb.n OR sa.ck <> sb.ck
    ), diff AS (
      SELECT COALESCE(a.bucket, b.bucket) AS bucket,
             COALESCE(a.event_id, b.event_id) AS event_id,
             CASE WHEN b.event_id IS NULL THEN 'a_to_b'
                  ELSE 'b_to_a' END AS direction
      FROM (SELECT * FROM a WHERE bucket IN (SELECT bucket FROM bad)) a
      FULL OUTER JOIN
           (SELECT * FROM b WHERE bucket IN (SELECT bucket FROM bad)) b
        ON a.event_id = b.event_id
      WHERE a.event_id IS NULL OR b.event_id IS NULL
    )
    SELECT bucket, direction,
           CAST(COUNT(*) AS BIGINT) AS rows_to_stream,
           CAST(SUM(8 + 8 + len(CAST(event_id AS VARCHAR))) AS BIGINT)
             AS est_bytes
    FROM diff GROUP BY bucket, direction
    ORDER BY bucket, direction
    """,
)
def w31_repair_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nodetool repair --preview`` (`[C* repair/PreviewRepairTask —
    CASSANDRA-13257, unverified]`, round 13): run the VALIDATION phase
    and report what a repair WOULD stream — per drifted bucket and
    direction, the row count and an estimated byte size — without
    streaming or marking anything. Same pruning shape as w17: the
    sealed epoch never reads (cutoff in PushedFilters), in-sync buckets
    prune at the 16-row summary join, and only drifted buckets' rows
    are counted. The preview is EXACT against the repair it predicts:
    asserted in-body by aggregating w17's actual repair stream and
    comparing. At 100 TB preview cost = validation cost, the point of
    the feature."""
    cutoff = ensure_repair_marker(spark, sf_dir)
    cat = Catalog(spark, sf_dir)
    unrepaired = cat.events.filter(
        F.col("ts") >= F.lit(cutoff).cast("timestamp")
    )
    bucket = (F.col("user_id") % 16).alias("bucket")

    def replica(drop_pred: str) -> DataFrame:
        return unrepaired.filter(F.expr(drop_pred)).select(
            "event_id", "user_id", bucket
        )

    def summary(drop_pred: str) -> DataFrame:
        return (
            replica(drop_pred)
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(f"bit_xor({_CKSUM})").cast("bigint").alias("ck"),
            )
        )

    sa, sb = summary(_A_DROP), summary(_B_DROP)
    bad = (
        sa.alias("sa")
        .join(sb.alias("sb"), "bucket")
        .filter(
            (F.col("sa.n") != F.col("sb.n"))
            | (F.col("sa.ck") != F.col("sb.ck"))
        )
        .select("bucket")
    )
    a = replica(_A_DROP).join(F.broadcast(bad), "bucket")
    b = replica(_B_DROP).join(F.broadcast(bad), "bucket")
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.event_id") == F.col("b.event_id"),
        "full_outer",
    )
    preview = (
        joined.filter(
            F.col("a.event_id").isNull() | F.col("b.event_id").isNull()
        )
        .select(
            F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"),
            F.coalesce(F.col("a.event_id"), F.col("b.event_id")).alias(
                "event_id"
            ),
            F.when(F.col("b.event_id").isNull(), F.lit("a_to_b"))
            .otherwise(F.lit("b_to_a"))
            .alias("direction"),
        )
        .groupBy("bucket", "direction")
        .agg(
            F.count(F.lit(1)).alias("rows_to_stream"),
            # the stream-size estimate: fixed key+timestamp overhead
            # plus the variable payload rendering, the preview's
            # "estimated bytes" column
            F.sum(
                F.lit(16) + F.length(F.col("event_id").cast("string"))
            ).alias("est_bytes"),
        )
        .orderBy("bucket", "direction")
    )
    # the preview must be EXACT against the repair it predicts
    actual = (
        w17_incremental_repair(spark, sf_dir)
        .groupBy("bucket", "direction")
        .agg(F.count(F.lit(1)).alias("rows_to_stream"))
    )
    mismatch = (
        preview.select("bucket", "direction", "rows_to_stream")
        .exceptAll(actual)
        .count()
    )
    assert mismatch == 0, "preview diverged from the actual repair stream"
    return preview
