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


def test_stateful_state_accumulates_across_batches(spark, tmp_path):
    """Real incremental proof: the source is split into 4 files streamed
    one per micro-batch (maxFilesPerTrigger=1), so per-user state MUST
    carry across batches to reach the batch totals — a single-batch run
    can't fake this."""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs

    src = str(tmp_path / "events_split")
    ev = Catalog(spark, SF_SMOKE).events
    # re-shard the fixture into 4 files, one per micro-batch
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(jobs._events_raw_schema(spark, src))
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401

    import pandas as pd

    def update(key, pdfs, state):
        # same quantized-integer state convention as stateful_user_totals
        import numpy as np

        n, total_q = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_q += int(
                np.floor(pdf["value"].to_numpy() * 1e4 + 0.5)
                .astype(np.int64)
                .sum()
            )
        state.update((n, total_q))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total_q / 1e4]}
        )

    out = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=jobs.STATEFUL_OUT,
            stateStructType=jobs.STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    jobs.run_available_now(out, "t_multi_batch", output_mode="update")
    emitted = spark.sql("SELECT * FROM t_multi_batch").collect()
    # >1 emission for some key proves multiple micro-batches touched it;
    # the running count is monotone, so max(n_events) per key is the final
    # state and must equal the batch count
    counts: dict[int, int] = {}
    final_n: dict[int, int] = {}
    for r in emitted:
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
        final_n[r.user_id] = max(final_n.get(r.user_id, 0), r.n_events)
    assert max(counts.values()) > 1, "everything arrived in one batch"
    want = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final_n == want


def test_streaming_dedup(spark):
    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming.jobs import run_available_now, streaming_dedup

    stream = streaming_dedup(spark, SF_SMOKE)
    run_available_now(stream, "t_dedup", output_mode="append")
    n_stream = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0].n
    n_batch = Catalog(spark, SF_SMOKE).events.select("event_id").distinct().count()
    assert n_stream == n_batch


def test_streaming_upsert_lww_across_batches(spark, tmp_path):
    """foreachBatch LWW sink: stream the events in 4 micro-batches into a
    versioned upsert table; the final version must equal the one-shot
    batch LWW merge, which only holds if each epoch correctly folds into
    the previous version's state."""
    import os

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ev = Catalog(spark, SF_SMOKE).events
    ev.withColumn("ts", F.unix_micros("ts") * 1000).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    jobs.streaming_upsert(spark, src, table)

    from cassandra_spark.streaming.segment_log import SegmentLog

    last = SegmentLog(table).latest_epoch()
    assert last is not None and last >= 1, (
        "everything arrived in one micro-batch"
    )

    got = {
        (r.user_id, r.event_type): (r.value, r.writetime, r.event_id)
        for r in jobs.read_upsert_table(spark, table).collect()
    }
    cells = ev.select(
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("writetime"),
        "event_id",
    )
    want = {
        (r.user_id, r.event_type): (r.value, r.writetime, r.event_id)
        for r in jobs._lww_reduce(cells).collect()
    }
    assert got == want


def test_streaming_upsert_epoch_retry_is_idempotent(spark, tmp_path):
    """A replayed epoch (same version dir already committed) must be a
    no-op, not a double-apply."""
    import os

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ev = Catalog(spark, SF_SMOKE).events
    ev.withColumn("ts", F.unix_micros("ts") * 1000).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    jobs.streaming_upsert(spark, src, table)
    before = sorted(os.listdir(table))
    # wipe the checkpoint so the same source replays from scratch: epochs
    # restart at 0 and must hit the already-committed version dirs
    import shutil

    shutil.rmtree(os.path.join(table, "_chk"))
    jobs.streaming_upsert(spark, src, table)
    assert sorted(os.listdir(table)) == before


def test_stream_static_join_matches_batch(spark):
    """Stream-static broadcast enrichment drains to exactly the batch
    left-join result."""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs

    out = jobs.streaming_enriched(spark, SF_SMOKE)
    jobs.run_available_now(out, "t_enriched", output_mode="append")
    got = {
        r.event_id: (r.c_name, r.c_mktsegment)
        for r in spark.sql("SELECT * FROM t_enriched").collect()
    }
    cat = Catalog(spark, SF_SMOKE)
    dim = cat.customer.select("c_custkey", "c_name", "c_mktsegment")
    ev = cat.events
    want = {
        r.event_id: (r.c_name, r.c_mktsegment)
        for r in ev.join(
            dim, ev["user_id"] == dim["c_custkey"], "left"
        ).select("event_id", "c_name", "c_mktsegment").collect()
    }
    assert got == want


def test_streaming_mv_incremental_matches_recompute(spark, tmp_path):
    """W7 streaming form: stream events in 4 micro-batches while the view
    is maintained ONLY by signed-delta merges; the final view must equal a
    from-scratch recompute over the final base, and the final base must
    equal the one-shot batch LWW merge. Equality across ≥2 epochs proves
    the delta algebra composes (each epoch's view builds on the last)."""
    import os

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ev = Catalog(spark, SF_SMOKE).events
    ev.withColumn("ts", F.unix_micros("ts") * 1000).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    jobs.streaming_mv(spark, src, table)

    from cassandra_spark.streaming.segment_log import SegmentLog

    last = SegmentLog(table).latest_epoch()
    assert last is not None and last >= 1, (
        "everything arrived in one micro-batch"
    )

    base = jobs.read_mv(spark, table, "base")
    view = jobs.read_mv(spark, table, "view")

    cells = ev.select(
        "user_id", "event_type", "value",
        F.unix_micros("ts").alias("writetime"), "event_id",
    )
    want_base = {
        (r.user_id, r.event_type): (r.value, r.writetime, r.event_id)
        for r in jobs._lww_reduce(cells).collect()
    }
    got_base = {
        (r.user_id, r.event_type): (r.value, r.writetime, r.event_id)
        for r in base.collect()
    }
    assert got_base == want_base

    want_view = {
        (r.event_type): (r.cnt, r.total_dec)
        for r in jobs._view_of(base).collect()
    }
    got_view = {
        (r.event_type): (r.cnt, r.total_dec) for r in view.collect()
    }
    assert got_view == want_view


def test_streaming_mv_epoch_retry_is_idempotent(spark, tmp_path):
    """A replayed epoch must skip its committed directory — no double
    deltas in the view."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ev = Catalog(spark, SF_SMOKE).events
    ev.withColumn("ts", F.unix_micros("ts") * 1000).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    jobs.streaming_mv(spark, src, table)
    before = {
        r.event_type: (r.cnt, float(r.total_dec))
        for r in jobs.read_mv(spark, table, "view").collect()
    }
    shutil.rmtree(os.path.join(table, "_chk_mv"))
    jobs.streaming_mv(spark, src, table)
    after = {
        r.event_type: (r.cnt, float(r.total_dec))
        for r in jobs.read_mv(spark, table, "view").collect()
    }
    assert after == before


def test_cdc_stream_delivers_flushed_mutations(spark, tmp_path):
    """CDC parity: draining the segment stream yields exactly the flushed
    slice of the mutation log, record-for-record; memtable cells stay
    invisible until flush (the reference's CDC contract)."""
    from cassandra_spark.cql_dml import CqlTable, TableSchema
    from cassandra_spark.streaming.jobs import cdc_stream, run_available_now

    t = CqlTable(
        spark,
        TableSchema(
            name="kv", partition_key="k", clustering=(),
            regular={"v": "string"}, cdc=True,
        ),
        spill_dir=str(tmp_path / "cdc"),
        spill_threshold=10,
    )
    for i in range(33):
        t.execute(f"INSERT INTO kv (k, v) VALUES ('k{i % 7}', 'v{i}')")
    n_flushed_rows = 33 * 2 - len(t._log)  # marker + cell per INSERT

    run_available_now(cdc_stream(spark, t), "t_cdc", output_mode="append")
    got = spark.sql("SELECT * FROM t_cdc").collect()
    assert len(got) == n_flushed_rows
    # un-flushed tail is NOT in the feed yet; after flush it is
    assert t._log, "test needs an un-flushed tail"
    t.flush()
    run_available_now(cdc_stream(spark, t), "t_cdc2", output_mode="append")
    all_rows = spark.sql("SELECT * FROM t_cdc2").collect()
    assert len(all_rows) == 66
    assert sorted(r.seq for r in all_rows) == list(range(1, 67))


# --- always-on mode (processingTime triggers) -------------------------------


def test_always_on_dedup_rate_source(spark):
    """s5's production shape: a live rate-limited source deduped under a
    processingTime trigger across >=3 micro-batches; the sink must hold
    unique event_ids and the query must report ProcessingTimeTrigger."""
    from pyspark.sql import functions as F

    from cassandra_spark.streaming import jobs

    ev = jobs.rate_events_stream(spark, rows_per_second=400)
    deduped = ev.withWatermark("ts", "10 seconds").dropDuplicates(
        ["event_id"]
    )
    progress = jobs.run_processing_time(
        deduped, "alw_dedup", interval="300 milliseconds", min_batches=3
    )
    assert len(progress) >= 3
    rows = spark.sql("SELECT event_id FROM alw_dedup").collect()
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids)) and ids, "dedup must hold on the sink"
    # every progress entry came from the processing-time trigger loop;
    # batchDuration exists only for ProcessingTime-style periodic triggers
    assert all("batchId" in p for p in progress)


def test_always_on_upsert_latency(spark, tmp_path):
    """s7 always-on: >=3 live epochs commit, keys stay unique (the table
    IS the LWW merge), and per-epoch end-to-end latency (commit wall
    clock - max event time) is positive and under the demo bound pinned
    in BASELINE.md."""
    import os

    from cassandra_spark.streaming import jobs

    table = str(tmp_path / "alw_upsert")
    os.makedirs(table, exist_ok=True)
    lat = jobs.always_on_upsert_demo(
        spark, table, rows_per_second=400,
        interval="300 milliseconds", min_epochs=3,
    )
    assert len(lat) >= 3
    assert all(0 < s < 30 for s in lat), lat
    final = jobs.read_upsert_table(spark, table)
    rows = final.collect()
    keys = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys)) and keys
    # rate source: user_id = value % 50, event_type = value % 4, aligned
    # moduli => exactly 4 event_types per user, <= 200 keys
    assert len(keys) <= 200


def test_always_on_mv_picks_up_files_landing_mid_run(spark, tmp_path):
    """s9 always-on: the MV job keeps polling its source dir; a file that
    lands AFTER the stream starts must flow into base+view without a
    restart — the live-ingestion property availableNow drains cannot
    show."""
    import os
    import time

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    os.makedirs(src, exist_ok=True)
    ev = Catalog(spark, SF_SMOKE).events.withColumn(
        "ts", F.unix_micros("ts") * 1000
    )
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    import shutil

    first.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    # the file source needs a flat dir of files: write parts then move
    for i, d in enumerate(("b1",)):
        for f in os.listdir(src + "/" + d):
            if f.endswith(".parquet"):
                os.rename(f"{src}/{d}/{f}", f"{src}/part-{i:03d}.parquet")
        shutil.rmtree(src + "/" + d)
    from cassandra_spark.streaming.segment_log import SegmentLog

    q = jobs.streaming_mv(spark, src, table, trigger_interval="300 milliseconds")
    try:
        deadline = time.time() + 60
        # latest committed epoch, monotone across gc (manifest COUNT is
        # capped at SegmentLog.keep — the epoch number is the progress)
        latest = lambda: SegmentLog(table).latest_epoch()  # noqa: E731
        while time.time() < deadline and latest() is None:
            time.sleep(0.3)
        assert latest() is not None, "first file never committed"
        n0 = latest()
        base0 = jobs.read_mv(spark, table, "base").count()
        # land a second file mid-run
        second.coalesce(1).write.mode("overwrite").parquet(src + "/b2")
        for f in os.listdir(src + "/b2"):
            if f.endswith(".parquet"):
                os.rename(f"{src}/b2/{f}", f"{src}/part-100.parquet")
        while time.time() < deadline and latest() <= n0:
            time.sleep(0.3)
        assert latest() > n0, "mid-run file never picked up"
    finally:
        q.stop()
        q.awaitTermination()
    base1 = jobs.read_mv(spark, table, "base")
    assert base1.count() >= base0
    # final view equals a recompute over the final base (delta algebra)
    view = jobs.read_mv(spark, table, "view")
    recomputed = jobs._view_of(base1)
    got = {
        (r["event_type"], r["cnt"], str(r["total_dec"]))
        for r in view.collect()
    }
    want = {
        (r["event_type"], r["cnt"], str(r["total_dec"]))
        for r in recomputed.collect()
    }
    assert got == want


def test_streaming_hll_state_bounded_and_exact(spark):
    """s11: the drained streaming sketch equals the one-shot batch sketch
    per day (idempotent max across micro-batches), with at most m rows of
    state per day."""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.sketches import (
        HLL_M,
        _hll_rank_sql,
        mix32_sql,
    )
    from cassandra_spark.operators.streaming_batch import s11_streaming_hll
    from tests.conftest import SF_SMOKE

    got = {
        r.day: (r.scaled_sum, r.n_buckets)
        for r in s11_streaming_hll(spark, SF_SMOKE).collect()
    }
    assert got
    assert all(nb <= HLL_M for _, nb in got.values())
    h = mix32_sql("user_id", "spark")
    batch = (
        Catalog(spark, SF_SMOKE)
        .events.select(
            F.to_date("ts").cast("string").alias("day"),
            F.expr(f"{h} AS h"),
        )
        .select(
            "day",
            F.expr(f"h % {HLL_M} AS bucket"),
            F.expr(_hll_rank_sql("h", "spark")).alias("rank"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rank").alias("maxrank"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .collect()
    )
    for r in batch:
        assert got[r.day][1] == r.n_buckets


def test_s13_neardup_pairs_cross_microbatches(spark):
    """The streaming near-dup's point is state ACROSS epochs: stage docs
    so each near-dup pair's members land in DIFFERENT source files (odd /
    even doc_id), drain with maxFilesPerTrigger=1, and the emitted pair
    set must still equal the one-shot batch rule."""
    import os
    import tempfile

    import duckdb

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs
    from tests.conftest import SF_SMOKE

    tmp = tempfile.mkdtemp(prefix="s13_split_")
    src = os.path.join(tmp, "src")
    docs = Catalog(spark, SF_SMOKE).documents.select("doc_id", "text")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(
        os.path.join(src)
    )
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(
        src
    )
    pairs = jobs.streaming_neardup(spark, src)
    got = {
        (r.doc_a, r.doc_b, r.n_agree)
        for r in pairs.distinct().collect()
    }
    # one-shot truth from the registered oracle
    from cassandra_spark import registry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_SMOKE}/documents.parquet'"
    )
    truth = {
        tuple(r)
        for r in con.execute(
            registry.ORACLE["s13_streaming_neardup"]
        ).fetchall()
    }
    assert got == truth
    assert truth, "fixture should contain near-dup pairs"
    # at least one pair genuinely crossed the odd/even file split
    assert any((a % 2) != (b % 2) for a, b, _ in truth)


def test_s14_stream_stream_join_pairs_cross_epochs(spark):
    """Stream-stream interval join: stage ALL views as file 1 and ALL
    purchases as file 2 (maxFilesPerTrigger=1 -> every pair's members
    arrive in different epochs), drain, and the emitted pair set must
    equal the one-shot batch interval join — possible only if view-side
    join state survived into the purchase epoch."""
    import os
    import tempfile

    import duckdb

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.streaming_batch import _sink_name
    from cassandra_spark.streaming import jobs

    tmp = tempfile.mkdtemp(prefix="s14_split_")
    src = os.path.join(tmp, "src")
    ev = Catalog(spark, SF_SMOKE).events
    for kind in ("view", "purchase"):
        ev.filter(f"event_type = '{kind}'").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = jobs.streaming_purchase_attribution(spark, src)
    name = _sink_name("s14_split")
    jobs.run_available_now(stream, name, output_mode="append")
    got = {
        (r.view_id, r.purchase_id, r.user_id)
        for r in spark.table(name).collect()
    }
    con = duckdb.connect()
    truth = {
        tuple(r)
        for r in con.execute(
            f"""
            SELECT v.event_id, p.event_id, v.user_id
            FROM '{SF_SMOKE}/events.parquet' v
            JOIN '{SF_SMOKE}/events.parquet' p
              ON v.user_id = p.user_id
             AND v.event_type = 'view' AND p.event_type = 'purchase'
             AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
            """
        ).fetchall()
    }
    assert got == truth
    assert truth, "fixture should contain attributable purchases"


def test_s14_watermark_evicts_join_state(spark):
    """With time-ordered weekly slices the global watermark advances
    between epochs, so view/purchase state beyond horizon+delay must be
    REMOVED from the state store (numRowsRemoved > 0) — and eviction must
    never cost a live pair (result still equals the batch join)."""
    import os
    import tempfile

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="s14_evict_")
    src = os.path.join(tmp, "src")
    ev = Catalog(spark, SF_SMOKE).events
    cuts = ["2024-01-08", "2024-01-15", "2024-01-22"]
    lo = [None, *cuts]
    hi = [*cuts, None]
    for a, b in zip(lo, hi):
        sl = ev
        if a is not None:
            sl = sl.where(F.col("ts") >= F.lit(a).cast("timestamp"))
        if b is not None:
            sl = sl.where(F.col("ts") < F.lit(b).cast("timestamp"))
        sl.where(
            F.col("event_type").isin("view", "purchase")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = jobs.streaming_purchase_attribution(spark, src)
    q = (
        stream.writeStream.format("memory")
        .queryName("s14_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    removed = sum(
        so["numRowsRemoved"]
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert removed > 0, "watermark never evicted any join state"
    n_batch = (
        ev.alias("v")
        .join(
            ev.alias("p"),
            (F.col("v.user_id") == F.col("p.user_id"))
            & (F.col("v.event_type") == "view")
            & (F.col("p.event_type") == "purchase")
            & (F.col("p.ts") >= F.col("v.ts"))
            & (F.col("p.ts") <= F.col("v.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .count()
    )
    assert spark.table("s14_evict").count() == n_batch


def test_s15_outer_nulls_gated_by_watermark(spark):
    """Left-outer stream-stream join: unmatched views must emit NULL
    rows ONLY once the final watermark passed view_ts + horizon — views
    younger than that must be WITHHELD (still possibly matchable), so
    the null set is strictly smaller than the batch anti-join."""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.streaming_batch import (
        s15_stream_stream_outer,
    )
    from tests.conftest import SF_SMOKE

    out = s15_stream_stream_outer(spark, SF_SMOKE)
    nulls = out.where(F.col("purchase_id").isNull())
    n_nulls = nulls.count()

    ev = Catalog(spark, SF_SMOKE).events
    v = ev.where("event_type = 'view'").alias("v")
    p = ev.where("event_type = 'purchase'").alias("p")
    unmatched = v.join(
        p,
        (F.col("v.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("v.ts"))
        & (F.col("p.ts") <= F.col("v.ts") + F.expr("INTERVAL 1 HOUR")),
        "left_anti",
    )
    n_unmatched = unmatched.count()
    assert 0 < n_nulls < n_unmatched, (
        "every unmatched view emitted — the watermark gate is not "
        f"withholding in-horizon views ({n_nulls} vs {n_unmatched})"
    )
    # the withheld views are exactly the ones the watermark has not
    # finalized: ts + 1h >= min(side maxima) - 30min
    wm = (
        v.agg(F.max("ts")).collect()[0][0],
        p.agg(F.max("ts")).collect()[0][0],
    )
    import datetime

    final_wm = min(wm) - datetime.timedelta(minutes=30)
    horizon = datetime.timedelta(hours=1)
    withheld = {
        r.event_id
        for r in unmatched.collect()
        if r.ts + horizon >= final_wm
    }
    emitted = {r.view_id for r in nulls.collect()}
    assert emitted.isdisjoint(withheld)
    assert emitted | withheld == {r.event_id for r in unmatched.collect()}


def test_s20_full_outer_both_null_legs_gated(spark):
    """Full-outer stream-stream join: BOTH sides NULL-emit, each gated
    by its own horizon — views by view_ts + 1h (a future purchase could
    match until then), purchases by purchase_ts alone (a matching view
    must be older). The purchase side's earlier horizon means a larger
    emitted fraction of its unmatched set than the view side's."""
    import datetime

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.streaming_batch import (
        s20_stream_stream_full_outer,
    )
    from tests.conftest import SF_SMOKE

    out = s20_stream_stream_full_outer(spark, SF_SMOKE)
    null_p = out.where(F.col("purchase_id").isNull())   # unmatched views
    null_v = out.where(F.col("view_id").isNull())       # unmatched purchases
    assert null_p.count() > 0 and null_v.count() > 0
    # the inner leg equals s14's batch join
    ev = Catalog(spark, SF_SMOKE).events
    v = ev.where("event_type = 'view'").alias("v")
    p = ev.where("event_type = 'purchase'").alias("p")
    cond = (
        (F.col("v.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("v.ts"))
        & (F.col("p.ts") <= F.col("v.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    n_inner = v.join(p, cond).count()
    assert out.where(
        F.col("view_id").isNotNull() & F.col("purchase_id").isNotNull()
    ).count() == n_inner
    # per-side exact emitted sets against the final watermark
    wm = (
        v.agg(F.max("ts")).collect()[0][0],
        p.agg(F.max("ts")).collect()[0][0],
    )
    final_wm = min(wm) - datetime.timedelta(minutes=30)
    horizon = datetime.timedelta(hours=1)
    um_v = v.join(p, cond, "left_anti").collect()
    um_p = p.join(v, cond, "left_anti").collect()
    want_views = {r.event_id for r in um_v if r.ts + horizon < final_wm}
    want_purch = {r.event_id for r in um_p if r.ts < final_wm}
    assert {r.view_id for r in null_p.collect()} == want_views
    assert {r.purchase_id for r in null_v.collect()} == want_purch


def test_s16_bounded_dedup_evicts_state_and_stays_exact(spark):
    """dropDuplicatesWithinWatermark: same-window duplicates drop, the
    result equals the batch distinct — AND, unlike s5's global dedup,
    key state is evicted as the watermark advances (numRowsRemoved > 0,
    final state far below the distinct-key count)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs

    tmp = tempfile.mkdtemp(prefix="s16_evict_")
    src = os.path.join(tmp, "src")
    ev = Catalog(spark, SF_SMOKE).events
    cuts = ["2024-01-08", "2024-01-15", "2024-01-22"]
    lo = [None, *cuts]
    hi = [*cuts, None]
    for a, b in zip(lo, hi):
        sl = ev
        if a is not None:
            sl = sl.where(F.col("ts") >= F.lit(a).cast("timestamp"))
        if b is not None:
            sl = sl.where(F.col("ts") < F.lit(b).cast("timestamp"))
        sl.unionAll(sl).coalesce(1).write.mode("append").parquet(src)

    stream = jobs.streaming_dedup_bounded(spark, src)
    q = (
        stream.writeStream.format("memory")
        .queryName("s16_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_distinct = ev.count()
    assert spark.table("s16_evict").count() == n_distinct
    removed = sum(
        so["numRowsRemoved"]
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert removed > 0, "watermark never evicted dedup state"
    final_state = q.recentProgress[-1]["stateOperators"][0]["numRowsTotal"]
    assert final_state < n_distinct, (
        f"state held {final_state} of {n_distinct} keys — not bounded"
    )


def test_s16_late_redelivery_dropped_not_duplicated(spark):
    """The composition that makes WithinWatermark safe: state for an
    event is evicted only once the watermark passed ts + delay, at which
    point any re-delivery is necessarily LATE and is dropped by the
    watermark rule — so the sink still never sees a duplicate. What is
    lost vs s5 is delivery of very-late FIRST arrivals."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs

    tmp = tempfile.mkdtemp(prefix="s16_late_")
    src = os.path.join(tmp, "src")
    ev = Catalog(spark, SF_SMOKE).events
    w1 = ev.where(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
    w2 = ev.where(
        (F.col("ts") >= F.lit("2024-01-08").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
    )
    # epoch 0: week 1; epoch 1: week 2 (advances the watermark past all
    # of week 1 + delay, evicting its state); epoch 2: week 1 AGAIN
    w1.coalesce(1).write.mode("append").parquet(src)
    w2.coalesce(1).write.mode("append").parquet(src)
    w1.coalesce(1).write.mode("append").parquet(src)

    stream = jobs.streaming_dedup_bounded(spark, src)
    q = (
        stream.writeStream.format("memory")
        .queryName("s16_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # no duplicates in the sink: the late re-delivery was dropped whole
    assert spark.table("s16_late").count() == w1.count() + w2.count()
    assert (
        spark.table("s16_late").groupBy("event_id").count()
        .where("count > 1").count() == 0
    )
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    # all but (at most) a boundary row drop as late; any remainder was
    # deduped against still-live state — either way, never duplicated
    assert dropped >= w1.count() - 1, "late re-delivery should drop"


def _epoch_bytes(table: str, epoch: int) -> int:
    """Bytes the sink wrote FOR epoch e: every segment/fold dir name
    encodes its creating epoch (base-seg-EEE, base-fold-EEE-i, view-*)."""
    import os

    from cassandra_spark.streaming.segment_log import _dir_bytes

    tag = f"-{epoch:010d}"
    return sum(
        _dir_bytes(os.path.join(table, d))
        for d in os.listdir(table)
        if os.path.isdir(os.path.join(table, d))
        and (d.endswith(tag) or f"{tag}-" in d)
    )


def test_upsert_epoch_write_cost_tracks_batch_not_base(
    spark, tmp_path, monkeypatch
):
    """The round-7 scale contract: a 6-epoch drain of equal-size batches
    writes ~constant bytes per non-fold epoch — NOT bytes proportional to
    the accumulated table (the round-6 sink rewrote the whole base every
    epoch, so epoch 5 cost 6x epoch 0). gc is disabled so every epoch's
    dirs survive for measurement."""
    import os

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs
    from cassandra_spark.streaming.segment_log import SegmentLog

    monkeypatch.setattr(SegmentLog, "gc", lambda self: [])
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ev = Catalog(spark, SF_SMOKE).events
    ev.withColumn("ts", F.unix_micros("ts") * 1000).repartition(6).write.mode(
        "overwrite"
    ).parquet(src)
    jobs.streaming_upsert(spark, src, table)
    last = SegmentLog(table).latest_epoch()
    assert last is not None and last >= 4, "need a >=5-epoch drain"
    # a size-tiered fold actually happened (threshold 4)
    assert any(
        "-fold-" in d for d in os.listdir(table)
    ), "expected at least one size-tiered fold across the drain"
    per_epoch = [_epoch_bytes(table, e) for e in range(last + 1)]
    assert all(b > 0 for b in per_epoch)
    # the LAST epoch (no fold lands there with threshold 4 and 6 equal
    # batches) must cost ~one batch, not ~the accumulated table: the old
    # sink's ratio was (last+1)x, this one stays within noise of 1x.
    assert per_epoch[last] < 2.5 * per_epoch[0], per_epoch
    # final visible table still equals the one-shot batch LWW merge
    got = {
        (r.user_id, r.event_type): (r.value, r.writetime, r.event_id)
        for r in jobs.read_upsert_table(spark, table).collect()
    }
    cells = ev.select(
        "user_id", "event_type", "value",
        F.unix_micros("ts").alias("writetime"), "event_id",
    )
    want = {
        (r.user_id, r.event_type): (r.value, r.writetime, r.event_id)
        for r in jobs._lww_reduce(cells).collect()
    }
    assert got == want


def test_mv_epoch_write_cost_tracks_batch_not_base(
    spark, tmp_path, monkeypatch
):
    """s9's base maintenance honors the same O(batch)-per-epoch claim as
    its view deltas: 6 equal micro-batches, last epoch's written bytes
    (base segment + view delta) within noise of the first's."""
    import os

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs
    from cassandra_spark.streaming.segment_log import SegmentLog

    monkeypatch.setattr(SegmentLog, "gc", lambda self: [])
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ev = Catalog(spark, SF_SMOKE).events
    ev.withColumn("ts", F.unix_micros("ts") * 1000).repartition(6).write.mode(
        "overwrite"
    ).parquet(src)
    jobs.streaming_mv(spark, src, table)
    last = SegmentLog(table).latest_epoch()
    assert last is not None and last >= 4
    per_epoch = [_epoch_bytes(table, e) for e in range(last + 1)]
    assert per_epoch[last] < 2.5 * per_epoch[0], per_epoch
    # view still equals a from-scratch recompute over the final base
    base = jobs.read_mv(spark, table, "base")
    want = {
        r.event_type: (r.cnt, r.total_dec)
        for r in jobs._view_of(base).collect()
    }
    got = {
        r.event_type: (r.cnt, r.total_dec)
        for r in jobs.read_mv(spark, table, "view").collect()
    }
    assert got == want


def test_quality_gate_batching_independent(spark, tmp_path):
    """s19's claim, held directly: the zero-state quality rules produce
    IDENTICAL verdict sets whether the stream drains as one batch or
    four."""
    import os

    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.streaming import jobs
    from tests.conftest import SF_SMOKE

    docs = (
        Catalog(spark, SF_SMOKE)
        .documents.filter(F.col("doc_id") % 7 == 1)
        .select("doc_id", "text", "n_chars")
    )
    outs = []
    for label, nfiles in (("one", 1), ("four", 4)):
        src = str(tmp_path / f"src_{label}")
        out = str(tmp_path / f"out_{label}")
        docs.repartition(nfiles).write.mode("overwrite").parquet(src)
        jobs.streaming_quality_gate(spark, src, out)
        outs.append(
            sorted(tuple(r) for r in spark.read.parquet(out).collect())
        )
        # maxFilesPerTrigger=1: four files means four epochs really ran
        n_parts = len(
            [f for f in os.listdir(out) if f.startswith("part-")]
        )
        assert n_parts >= nfiles
    assert outs[0] == outs[1] and outs[0]
