"""Major compaction as a batch write job (Snk1 + the W4/W5 pipeline made
physical — SURVEY.md §2.9, §4.1 "compaction strategies" row).

Cassandra's compaction rewrites overlapping SSTable generations into one
sorted, tombstone-purged generation (`[C* db/compaction/CompactionTask,
*CompactionStrategy]`, unverified — SURVEY.md §0). The Spark-native
equivalent is a deterministic batch job:

    generations --unionByName--> LWW merge --purge--> bucketed sorted parquet

The output layout IS the optimization (SURVEY.md §4.1 maps Cassandra's
key-range/bloom/index skipping onto parquet physics):

- ``bucket = pmod(hash(pk), n_buckets)`` directory partitioning → a point
  lookup hashes its key and reads ONE directory (partition pruning — the
  token-ownership analogue);
- rows sorted by (pk, clustering) within each file → clustering slices
  prune by parquet row-group min/max stats (the row-index/seek analogue);
- one file per bucket by construction (repartition on the same key the
  directories split by), so a 100 TB table compacts into n_buckets
  parallel, independently-readable runs — no small-file explosion, no
  coordinator. Sizing rule at scale: n_buckets ≈ table_bytes / 256 MB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8


def lww_merge(
    versions: DataFrame,
    partition_key: list[str],
    clustering: list[str],
    writetime_col: str = "writetime",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Per-cell last-writer-wins over any union of generations (W4 as a
    library function). Deterministic: ties on writetime fall back to
    ``tiebreak`` columns descending."""
    order = [F.col(writetime_col).desc()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*partition_key, *clustering).orderBy(*order)
    return (
        versions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def compact(
    versions: DataFrame,
    out_dir: str,
    partition_key: list[str],
    clustering: list[str],
    writetime_col: str = "writetime",
    tiebreak: list[str] | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Rewrite generations into one read-optimized generation at out_dir.

    Exactly one shuffle: the repartition on bucket feeds both the file
    split and (being a superset-key of the LWW window's partitioning after
    merge) the final layout; sortWithinPartitions is a partition-local
    sort, no extra exchange.
    """
    merged = lww_merge(
        versions, partition_key, clustering, writetime_col, tiebreak
    )
    bucket = F.pmod(F.hash(*partition_key), F.lit(n_buckets))
    (
        merged.withColumn("bucket", bucket)
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions(*partition_key, *clustering)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )


def read_compacted(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def compact_time_windows(
    events: DataFrame,
    out_dir: str,
    ts_col: str,
    partition_key: list[str],
    clustering: list[str],
    window: str = "1 day",
) -> None:
    """TWCS analogue (`[C* db/compaction/TimeWindowCompactionStrategy]`,
    unverified): time-series data grouped into non-overlapping time
    windows, one directory per window, rows sorted by (pk, clustering)
    inside. Time-range queries prune whole windows before opening a file
    (the SSTable min/max-timestamp skip, SURVEY.md §4.1); expiring a
    retention period is a directory delete, not a rewrite — exactly why
    Cassandra recommends TWCS for TTL'd time series."""
    win = F.window(F.col(ts_col), window).getField("start").cast("date")
    (
        events.withColumn("window_start", win)
        .repartition("window_start")
        .sortWithinPartitions(*partition_key, *clustering)
        .write.mode("overwrite")
        .partitionBy("window_start")
        .parquet(out_dir)
    )


def point_lookup(
    spark: SparkSession,
    out_dir: str,
    partition_key: list[str],
    key: tuple,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """R1 against the compacted layout: the bucket predicate is derived
    from the key itself, so the scan prunes to one directory before any
    file is opened — Spark's literal-folded partition filter plays the
    role of token ownership."""
    df = read_compacted(spark, out_dir)
    # cast key literals to the stored column types: Murmur3 hashes int and
    # long differently, so an untyped Python literal would bucket-miss
    types = {f.name: f.dataType for f in df.schema.fields}
    lits = [
        F.lit(v).cast(types[c]) for c, v in zip(partition_key, key)
    ]
    bucket = F.pmod(F.hash(*lits), F.lit(n_buckets))
    cond = F.col("bucket") == bucket
    for c, lit in zip(partition_key, lits):
        cond = cond & (F.col(c) == lit)
    return df.filter(cond)
