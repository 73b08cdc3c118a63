"""Streaming ≡ batch: the S-tier builders produce identical results when
run incrementally over a file stream with availableNow (SURVEY.md §2.10)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_streaming_tumbling_matches_batch(spark):
    from cassandra_spark.operators.streaming_batch import s1_tumbling
    from cassandra_spark.streaming.jobs import (
        run_available_now,
        streaming_tumbling,
    )

    stream = streaming_tumbling(spark, SF_SMOKE)
    assert stream.isStreaming
    run_available_now(stream, "t_tumbling", output_mode="complete")
    got = {
        (r.bucket_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    want = {
        (r.bucket_start, r.event_type): (r.n, r.sum_value)
        for r in s1_tumbling(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_streaming_dedup(spark):
    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming.jobs import run_available_now, streaming_dedup

    stream = streaming_dedup(spark, SF_SMOKE)
    run_available_now(stream, "t_dedup", output_mode="append")
    n_stream = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0].n
    n_batch = Catalog(spark, SF_SMOKE).events.select("event_id").distinct().count()
    assert n_stream == n_batch
