#!/usr/bin/env python
"""Scale-stress harness: measured growth curves for the scale-sensitive queries.

The 100 TB design claims in the operator docstrings (Sigma bucket^2 candidate
verify, one-shuffle merges, broadcast-side joins) had only ever been *asserted*
against plans, never *measured* above sf0.1. This harness turns each claim into
a growth curve:

1. ``build``: deterministically amplify the sf0.1 corpus by FACTOR (default
   10x) into ``.scale_stress/x{FACTOR}/`` so the amplified directory is a
   drop-in ``sf_dir`` for every registered query.
2. ``run``: time each stress query end-to-end (noop sink, same protocol as
   bench.py) at 1x and at FACTORx, and report ``ratio = t_amp / t_base``
   against the ideal ``FACTOR`` (linear work on a fixed 32-thread box; <FACTOR
   is normal while fixed overheads dominate, >>FACTOR flags super-linearity).

Amplification is workload-shape-preserving, not naive duplication:

- **Keys** are re-keyed ``k * FACTOR + r`` (replica index r) on BOTH sides of
  every FK edge, so orders<->lineitem, events<->customer etc. keep their 1:N
  structure inside each replica and replicas never join across.
- **documents.text** is word-salted per replica (``w -> w~r``): replica 0 is
  the original corpus; each other replica occupies a disjoint shingle space.
  Without this, every doc would gain FACTOR-1 exact twins and the near-dup
  band buckets would grow quadratically for data reasons, not algorithmic
  ones. With it, bucket count grows ~FACTOR while bucket sizes stay put --
  exactly the regime the Sigma bucket^2 claim is about.
- **embeddings.embedding** gets a per-replica deterministic sign flip (an
  orthogonal transform): within-replica geometry (norms, cosines) is exactly
  preserved, while replicas become mutually near-orthogonal -- so l2d/l3b/l18
  see a FACTOR-times-larger corpus with the same internal cluster structure.
- ``region``/``nation`` stay fixed (as in TPC-H scaling).

Usage:
    python tools/scale_stress.py [build|run|all] [--factor 10] [--repeat 1]
        [--queries a,b,c] [--out SCALE_STRESS.json]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cassandra_spark import registry  # noqa: E402
from cassandra_spark.catalog import TABLE_NAMES, load_table  # noqa: E402
from cassandra_spark.session import get_spark  # noqa: E402

BASE_DIR = "/root/testdata/sf0.1"

# FK-consistent key columns per amplified table (re-keyed k*FACTOR + r).
REKEY: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
COPY_TABLES = ("region", "nation")

# The scale-sensitive set from VERDICT r2: dedup/ANN family, fact-x-fact
# joins, the full-scan aggregate, and the LWW merge over the whole log.
STRESS_QUERIES = (
    "l1_exact_dedup",
    "l2_minhash_neardup",
    "l2_minhash_neardup_prod",
    "l2b_simhash",
    "l2d_embedding_neardup",
    "l2d_embedding_neardup_prod",
    "l17_dedup_clusters",
    "l18_kmeans",
    "l3b_lsh_ann",
    "x17_large_orders",
    "x17_large_orders_bucketed",
    "x23_waiting_suppliers",
    "x23_waiting_suppliers_bucketed",
    "x28_pricing_summary",
    "w4_upsert_merge",
    "q_flagship_revenue_by_nation",
    # round-5 additions — the DEFAULT run must reproduce the full
    # recorded x10 curve, so every measured query lives here:
    "p9_ring_ownership",
    "l19_audio",
    "a10_hll_distinct",
    "a11_countmin_heavy",
    "a13_hll_partials",
    "a14_histogram_quantiles",
    "w18_hinted_handoff",
    "p10_nts_replicas",
    "l20_chunking",
    "l21_bigram_lm",
    "x38_resample_ffill",
    "x39_funnel",
    "x40_cohort_retention",
    # trainer/graph tier (this round): corpus-pass + model-sized loops
    "l23_bpe_train",
    "l23b_bpe_encode",
    "l24_linreg_gd",
    "x43_event_pagerank",
    "l25_fuzzy_contamination",
    "l26_pq_ann",
    "l27_span_dedup",
    # round-5 second block: bulk ingest + epoch shuffle
    "w22_bulk_load",
    "l28_epoch_shuffle",
    # round-6: temperature mix, SQ8 ANN, Thrift batch_mutate reconcile,
    # incremental dedup, dedup-graph triangles, n-gram novelty
    "l29_temperature_mix",
    "l30_sq8_ann",
    "t6_batch_mutate",
    "l31_incremental_dedup",
    "l32_dedup_triangles",
    "l33_ngram_novelty",
    "l34_cluster_representatives",
    # round-7: segment-log streaming sinks, persisted vector-index
    # query halves (build-once/query-many), container frame sampling
    "s7_streaming_upsert",
    "s9_streaming_mv",
    "l35_ivf_index_query",
    "l36_pq_index_query",
    "l37_video_sampling",
    # round-8: persisted MinHash dedup index (query half — the build is
    # one-time by construction) and the stratified downsample
    "l38_minhash_index_query",
    "l39_stratified_sample",
    "s17_streaming_admission",
    # round-9: incremental index append (the clone+append scenario IS
    # the measured unit — batch signature/assign/encode + generation
    # write + probe over base+generation)
    "l40_minhash_index_append",
    "l41_ivf_index_append",
    "l42_pq_index_append",
    "l43_minhash_index_compact",
    "l44_ivf_index_compact",
    "l45_pq_index_compact",
    "s18_streaming_admission_append",
    "w24_bootstrap_cleanup",
)

# The 100x heavy tier (VERDICT r4 ask #2): the full x-tier join/agg family,
# the PROD dedup/ANN variants only, the iterative algorithms, and the LWW
# merge. The registry's diagnostic=True configs (fixed-plane l2d, blocked
# n-gram Jaccard) are EXCLUDED at this factor by design — they are
# deliberately-naive baselines whose super-linear growth is the documented
# point; run() logs the exclusion so the cap is never silent.
STRESS_QUERIES_100 = (
    "l1_exact_dedup",
    "l2_minhash_neardup_prod",
    "l2b_simhash",
    "l2d_embedding_neardup_prod",
    "l17_dedup_clusters",
    "l18_kmeans",
    "l3b_lsh_ann",
    "l3c_ivf_ann",
    "l26_pq_ann",
    "l27_span_dedup",
    "x15_shipping_priority",
    "x17_large_orders",
    "x17_large_orders_bucketed",
    "x23_waiting_suppliers",
    "x23_waiting_suppliers_bucketed",
    "x25_nation_volume",
    "x28_pricing_summary",
    "x34_product_profit",
    "x37_concentrated_suppliers",
    "w4_upsert_merge",
    "q_flagship_revenue_by_nation",
    "l23_bpe_train",
    "l23b_bpe_encode",
    "l24_linreg_gd",
    "x43_event_pagerank",
    "l25_fuzzy_contamination",
    "w22_bulk_load",
    "l28_epoch_shuffle",
    "l29_temperature_mix",
    "l30_sq8_ann",
    "t6_batch_mutate",
    "l31_incremental_dedup",
    "l32_dedup_triangles",
    "l33_ngram_novelty",
    "l34_cluster_representatives",
    # round-7 (all sub-linear by design at this factor too)
    "s7_streaming_upsert",
    "s9_streaming_mv",
    "l35_ivf_index_query",
    "l36_pq_index_query",
    "l37_video_sampling",
    # round-8: persisted MinHash dedup index (query half — the build is
    # one-time by construction) and the stratified downsample
    "l38_minhash_index_query",
    "l39_stratified_sample",
    "s17_streaming_admission",
    # round-9: incremental index append (the clone+append scenario IS
    # the measured unit — batch signature/assign/encode + generation
    # write + probe over base+generation)
    "l40_minhash_index_append",
    "l41_ivf_index_append",
    "l42_pq_index_append",
    "l43_minhash_index_compact",
    "l44_ivf_index_compact",
    "l45_pq_index_compact",
    "s18_streaming_admission_append",
    "w24_bootstrap_cleanup",
)


def amp_dir(factor: int) -> Path:
    return REPO / ".scale_stress" / f"x{factor}"


def build(spark: SparkSession, factor: int, force: bool = False) -> Path:
    out = amp_dir(factor)
    marker = out / "_BUILT"
    if marker.exists() and not force:
        print(f"[build] {out} already built, skipping", file=sys.stderr)
        return out
    if force and out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)

    rep = F.broadcast(
        spark.range(factor).withColumnRenamed("id", "r")
    )

    for name in TABLE_NAMES:
        src = load_table(spark, BASE_DIR, name)
        dst = str(out / f"{name}.parquet")
        if (out / f"{name}.parquet" / "_SUCCESS").exists():
            # resumable build: a completed per-table write survives an
            # interrupted run; only unfinished tables are (re)built
            print(f"[build] {name} already complete, skipping", file=sys.stderr)
            continue
        if name in COPY_TABLES:
            src.coalesce(1).write.mode("overwrite").parquet(dst)
            continue

        df = src.crossJoin(rep)
        for k in REKEY[name]:
            df = df.withColumn(
                k, (F.col(k) * factor + F.col("r")).cast("bigint")
            )

        if name == "documents":
            # Per-replica word salt: disjoint shingle spaces across replicas.
            salted = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(
                        w, F.lit("~"), F.col("r").cast("string")
                    ),
                ),
                " ",
            )
            df = df.withColumn(
                "text", F.when(F.col("r") == 0, F.col("text")).otherwise(salted)
            ).withColumn("n_chars", F.length("text").cast("bigint"))

        if name == "embeddings":
            # Per-replica sign flip = orthogonal transform: exact within-
            # replica geometry, near-orthogonal across replicas.
            dim = len(src.select("embedding").head()[0])
            rows = []
            for r in range(factor):
                rng = random.Random(1000 + r)
                signs = (
                    [1.0] * dim
                    if r == 0
                    else [rng.choice([-1.0, 1.0]) for _ in range(dim)]
                )
                rows.append((r, signs))
            signs_df = F.broadcast(
                spark.createDataFrame(rows, "r bigint, signs array<float>")
            )
            df = (
                df.join(signs_df, "r")
                .withColumn(
                    "embedding",
                    F.zip_with("embedding", "signs", lambda x, s: x * s),
                )
                .drop("signs")
            )

        cols = [c for c in src.columns]  # original column order
        df.select(*cols).repartition(32).write.mode("overwrite").parquet(dst)
        print(f"[build] wrote {name} x{factor}", file=sys.stderr)

    marker.write_text(str(factor))
    return out


# Build-once/query-many entries: their first execution against a fresh
# corpus constructs the persisted artifact (signature pass / assignment /
# codebook training), which is one-time BY CONSTRUCTION — the growth
# claim these curves check is the QUERY path. One untimed warmup run
# commits the artifact so the timed run measures steady state; without
# it the measured "ratio" silently flips between build+query (fresh
# /tmp) and query-only (artifact left by an earlier sweep) — exactly the
# mixed-warmth ambiguity the provenance stamps exist to kill.
WARM_FIRST = frozenset(
    (
        "l35_ivf_index_query",
        "l36_pq_index_query",
        "l38_minhash_index_query",
        "l40_minhash_index_append",
        "l41_ivf_index_append",
        "l42_pq_index_append",
        "s17_streaming_admission",
        "s18_streaming_admission_append",
    )
)


def time_query(spark: SparkSession, name: str, sf_dir: str, repeat: int) -> float:
    fn = registry.QUERIES[name]
    if name in WARM_FIRST:
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        registry.release_caches(spark)
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
        registry.release_caches(spark)
    return best


def provenance(round_tag: str | None) -> str:
    """Single-string measurement stamp: round + tree + date. Every block
    and every per-query entry written from now on carries one, so a
    merged file can never silently mix rounds again (the r7-era
    l2d_prod 37x sat untagged next to the r8 15x and misled twice)."""
    import datetime
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=REPO, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        commit = "unknown"
    date = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d")
    return f"r{round_tag or '?'}@{commit} {date}"


def run(
    spark: SparkSession,
    factor: int,
    names: list[str],
    repeat: int,
    prov: str = "",
) -> dict:
    adir = str(amp_dir(factor))
    # Warm JVM + footers on both dirs so neither scale pays first-touch costs.
    registry.QUERIES["q_flagship_revenue_by_nation"](spark, BASE_DIR).write.mode(
        "overwrite"
    ).format("noop").save()
    registry.QUERIES["q_flagship_revenue_by_nation"](spark, adir).write.mode(
        "overwrite"
    ).format("noop").save()
    registry.release_caches(spark)

    results: dict[str, dict] = {}
    for name in names:
        base = time_query(spark, name, BASE_DIR, repeat)
        amp = time_query(spark, name, adir, repeat)
        results[name] = {
            "base_sec": round(base, 3),
            "amp_sec": round(amp, 3),
            "ratio": round(amp / base, 2),
            "prov": prov,
        }
        print(
            f"[run] {name}: {base:.2f}s -> {amp:.2f}s "
            f"(x{amp / base:.2f} vs ideal x{factor})",
            file=sys.stderr,
        )
    ratios = sorted(r["ratio"] for r in results.values())
    median = ratios[len(ratios) // 2]
    return {
        "metric": "scale_stress_median_growth",
        "value": median,
        "unit": "x",
        "factor": factor,
        "base_sf": 0.1,
        "prov": prov,
        "queries": results,
    }


# --- replay-tier stress: mutation VOLUME, not corpus size -------------------
#
# The w9/w13/w14 replay queries execute pinned statement scripts, so corpus
# amplification does not stress them; their scale axis is DML statement
# count (the driver-side bound measured in BASELINE.md "DML front-end").
# This mode feeds a synthetic session N and FACTOR*N statements and times
# execute (driver CPU, expected ~linear) and snapshot (reconcile) for both
# the plain in-memory log and the parquet-segment spill path.

REPLAY_BASE_N = 5_000


def _replay_workload(n: int, collections: bool):
    for i in range(n):
        key = f"k{i % (n // 10 or 1)}"
        if collections:
            if i % 5 == 4:
                yield f"DELETE attrs['a{i % 7}'] FROM kv WHERE k = '{key}'"
            else:
                yield (
                    f"UPDATE kv SET attrs['a{i % 7}'] = 'v{i}' "
                    f"WHERE k = '{key}'"
                )
        elif i % 7 == 3:
            yield f"UPDATE kv SET v = 'u{i}' WHERE k = '{key}'"
        elif i % 23 == 11:
            yield f"DELETE FROM kv WHERE k = '{key}'"
        else:
            yield f"INSERT INTO kv (k, v, n) VALUES ('{key}', 'v{i}', {i})"


def _time_replay(spark: SparkSession, n: int, collections: bool, spill: bool):
    import tempfile

    from cassandra_spark.cql_session import CqlSession

    kw = (
        dict(spill_dir=tempfile.mkdtemp(prefix="replay_stress_"),
             spill_threshold=10_000)
        if spill
        else {}
    )
    sess = CqlSession(spark, **kw)
    ddl = (
        "CREATE TABLE kv (k text PRIMARY KEY, v text, attrs map<text,text>)"
        if collections
        else "CREATE TABLE kv (k text PRIMARY KEY, v text, n int)"
    )
    sess.execute(ddl)
    t0 = time.perf_counter()
    for stmt in _replay_workload(n, collections):
        sess.execute(stmt)
    t_exec = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_rows = sess.table("kv").snapshot().count()
    t_snap = time.perf_counter() - t0
    return t_exec, t_snap, n_rows


def replay_stress(spark: SparkSession, factor: int) -> dict:
    results: dict[str, dict] = {}
    for label, collections, spill in (
        ("w9_scalar_plain", False, False),
        ("w9_scalar_spill", False, True),
        ("w13_collection_plain", True, False),
        ("w13_collection_spill", True, True),
    ):
        be, bs, _ = _time_replay(spark, REPLAY_BASE_N, collections, spill)
        ae, as_, _ = _time_replay(
            spark, REPLAY_BASE_N * factor, collections, spill
        )
        results[label] = {
            "base_exec_sec": round(be, 3),
            "base_snapshot_sec": round(bs, 3),
            "amp_exec_sec": round(ae, 3),
            "amp_snapshot_sec": round(as_, 3),
            "exec_ratio": round(ae / be, 2),
            "snapshot_ratio": round(as_ / bs, 2),
        }
        print(
            f"[replay] {label}: exec {be:.2f}->{ae:.2f}s "
            f"(x{ae / be:.1f}), snapshot {bs:.2f}->{as_:.2f}s "
            f"(x{as_ / bs:.1f}) vs ideal x{factor}",
            file=sys.stderr,
        )
    return results


# --- GC stress: the distributed garbage_collect path (round 10) ------------
#
# nodetool garbagecollect rewrites the WHOLE table, so its scale axis is
# table volume. Rows ingest via bulk_load (Spark write bandwidth), 2% of
# keys get shadowing tombstones, and the purge runs through BOTH forms:
# the pyarrow driver reconcile (distributed_merge_bytes=None) and the
# one-Spark-action algebra (threshold forced to 1) — the production
# config routes by input bytes; forcing both at identical inputs is the
# honest path-scaling comparison.

GC_BASE_N = 50_000


def _time_gc(spark: SparkSession, n: int, spark_path: bool):
    import tempfile

    from cassandra_spark.cql_session import CqlSession

    sess = CqlSession(
        spark,
        spill_dir=tempfile.mkdtemp(prefix="gc_stress_"),
        spill_threshold=10_000,
    )
    sess.execute("CREATE TABLE gk (k text PRIMARY KEY, v bigint)")
    t = sess.table("gk")
    t.bulk_load(
        spark.range(n).selectExpr("concat('k', id) AS k", "id AS v"),
        timestamp=100,
    )
    for i in range(0, n, 50):
        sess.execute(f"DELETE FROM gk USING TIMESTAMP 200 WHERE k = 'k{i}'")
    t.flush()
    t.distributed_merge_bytes = 1 if spark_path else None
    t0 = time.perf_counter()
    stats = t.garbage_collect(gc_horizon_us=300)
    dt = time.perf_counter() - t0
    assert stats["dropped"] >= n // 50, stats
    return dt


def gc_stress(spark: SparkSession, factor: int) -> dict:
    results: dict[str, dict] = {}
    for label, spark_path in (
        ("gc_driver", False),
        ("gc_spark", True),
    ):
        b = _time_gc(spark, GC_BASE_N, spark_path)
        a = _time_gc(spark, GC_BASE_N * factor, spark_path)
        results[label] = {
            "base_sec": round(b, 3),
            "amp_sec": round(a, 3),
            "ratio": round(a / b, 2),
        }
        print(
            f"[gc] {label}: {b:.2f}->{a:.2f}s (x{a / b:.1f} vs ideal "
            f"x{factor})",
            file=sys.stderr,
        )
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "cmd", nargs="?", default="all",
        choices=["build", "run", "replay", "gc", "all"],
    )
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--out", default=str(REPO / "SCALE_STRESS.json"))
    ap.add_argument(
        "--round",
        default=os.environ.get("SPARK_GRAFT_ROUND"),
        help="round tag stamped into every measurement (provenance)",
    )
    args = ap.parse_args()
    prov = provenance(args.round)

    registry.load_all()
    spark = get_spark("cassandra-spark-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd in ("build", "all"):
        build(spark, args.factor, force=args.force)
    report = None
    if args.cmd in ("run", "all"):
        if args.queries:
            names = args.queries.split(",")
        elif args.factor >= 100:
            names = list(STRESS_QUERIES_100)
            dropped = sorted(set(STRESS_QUERIES) - set(names))
            print(
                f"[run] factor {args.factor}: diagnostic configs excluded "
                f"by design: {dropped}",
                file=sys.stderr,
            )
        else:
            names = list(STRESS_QUERIES)
        report = run(spark, args.factor, names, args.repeat, prov)
        out_path = Path(args.out)
        if out_path.exists():
            prev = json.loads(out_path.read_text())
            # keep replay/gc curves and other factors' runs across re-runs
            if "replay" in prev:
                report["replay"] = prev["replay"]
            for k in ("gc", "gc_prov", "replay_prov"):
                if k in prev:
                    report[k] = prev[k]
            runs = prev.get("runs", {})
            prev_key = f"x{prev.get('factor')}"
            if prev_key not in runs and "queries" in prev:
                runs[prev_key] = {
                    "value": prev.get("value"),
                    "queries": prev["queries"],
                }
            # MERGE into any existing same-factor section: a --queries
            # subset run must extend the recorded curve set, not replace
            # it (losing the earlier queries' measurements)
            merged_q = dict(
                runs.get(f"x{args.factor}", {}).get("queries", {})
            )
            # prune entries for queries no longer in the registry, so a
            # rename/removal can't pin a stale measurement in the median
            merged_q = {
                q: v for q, v in merged_q.items() if q in registry.QUERIES
            }
            merged_q.update(report["queries"])
            med = round(
                sorted(v["ratio"] for v in merged_q.values())[
                    len(merged_q) // 2
                ],
                2,
            )
            report["queries"] = merged_q
            report["value"] = med
            report["runs"] = {
                **runs,
                f"x{args.factor}": {
                    "value": med,
                    # per-entry "prov" stamps say which round measured
                    # each number; the block stamp = last extension
                    "prov_last": prov,
                    "queries": merged_q,
                },
            }
    if args.cmd in ("replay", "all"):
        replay = replay_stress(spark, args.factor)
        if report is None:  # replay-only: merge into the existing report
            out_path = Path(args.out)
            report = (
                json.loads(out_path.read_text())
                if out_path.exists()
                else {"factor": args.factor}
            )
        report["replay"] = replay
        report["replay_prov"] = prov
    if args.cmd == "gc":
        gc = gc_stress(spark, args.factor)
        if report is None:
            out_path = Path(args.out)
            report = (
                json.loads(out_path.read_text())
                if out_path.exists()
                else {"factor": args.factor}
            )
        report["gc"] = gc
        report["gc_prov"] = prov
    if report is not None:
        line = json.dumps(report)
        print(line)
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
