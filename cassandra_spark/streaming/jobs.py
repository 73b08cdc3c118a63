"""Structured Streaming execution of the S-tier (SURVEY.md §2.10).

The batch builders in operators/streaming_batch.py define the semantics;
this module runs the same logical plans incrementally over a file stream
(`readStream` on the events parquet — the stand-in for a Kafka/connector
source at 100 TB). Watermarks bound state; availableNow processes the
backlog and stops, which is what the tests use to prove batch ≡ streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cassandra_spark.operators.streaming_batch import tumbling_agg

# Raw parquet schema for events (ts arrives as nanos int64 under the
# nanosAsLong conf; converted to µs timestamp below, same as the catalog).
_EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of events with event-time column restored."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source requires a directory: stream the sf_dir with a
    # glob filter selecting just the events table
    raw = (
        spark.readStream.schema(_EVENTS_RAW)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 as a stream: watermarked 1h tumbling counts per event_type.
    The 10-minute watermark bounds window state; late rows beyond it drop
    (S4 semantics) — in append mode a window finalizes once the watermark
    passes its end."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    return tumbling_agg(ev)


def streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 as a stream: watermarked per-user session windows (30 min gap).
    Session windows are the one window kind whose state can MERGE (two
    open sessions coalesce when a bridging event arrives), which is why
    they need the dedicated session_window state store rather than
    bucketed tumbling state."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: streaming dropDuplicates on the event key with watermark-bounded
    dedup state."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    return ev.dropDuplicates(["event_id"])


STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
STATEFUL_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: custom stateful per-key operator via applyInPandasWithState — a
    running (count, sum) per user that survives across micro-batches. This
    is the escape hatch for aggregation logic Spark's built-ins can't
    express (per-key model state, custom eviction); state lives in the
    state store, partitioned by key, so it scales with executors not with
    stream length. Arrow-batched: each group's rows arrive as pandas
    DataFrames, never row-at-a-time."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    ev = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=STATEFUL_OUT,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> None:
    """Drain the backlog into an in-memory table (demo/test harness);
    blocks until the availableNow trigger completes. Aggregations use
    output_mode='complete'; row streams use 'append'."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
