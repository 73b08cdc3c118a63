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


def test_stateful_user_totals_matches_batch(spark):
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming.jobs import (
        run_available_now,
        stateful_user_totals,
    )

    stream = stateful_user_totals(spark, SF_SMOKE)
    assert stream.isStreaming
    run_available_now(stream, "t_stateful", output_mode="update")
    # update mode re-emits a key on every batch it changes in; the last
    # emission per key is the final state
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM t_stateful").collect()
    }
    want = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in Catalog(spark, SF_SMOKE)
        .events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, total) in want.items():
        assert got[uid][0] == n
        assert round(got[uid][1], 6) == total


def test_streaming_session_matches_batch(spark):
    from cassandra_spark.operators.streaming_batch import s3_session
    from cassandra_spark.streaming.jobs import (
        run_available_now,
        streaming_session,
    )

    stream = streaming_session(spark, SF_SMOKE)
    assert stream.isStreaming
    run_available_now(stream, "t_session", output_mode="complete")
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.sql("SELECT * FROM t_session").collect()
    }
    want = {
        (r.user_id, r.session_start): r.n_events
        for r in s3_session(spark, SF_SMOKE).collect()
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
