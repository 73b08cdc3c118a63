"""Persisted vector-index artifacts (round-7): build-once/query-many —
the query path provably performs no training/assignment, results equal
the inline entries, and the SAI ANN scan is partition-pruned to the
probed buckets."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE


def _boom(*a, **k):
    raise AssertionError("training/assignment invoked on the query path")


def test_ivf_query_never_assigns(spark, monkeypatch):
    from cassandra_spark.operators import vector_index as vi

    # ensure the artifact exists, then make assignment impossible
    vi.build_ivf_index(spark, SF_SMOKE)
    monkeypatch.setattr(vi, "_assign_bucket_col", _boom)
    out = vi.l35_ivf_index_query(spark, SF_SMOKE)
    rows = out.collect()
    assert rows, "query returned nothing"
    # recall unchanged: identical to the inline l3c results
    from cassandra_spark.operators.llm_vectors import l3c_ivf_ann

    want = {
        (r.query_id, r.vec_id): (r.cosine, r.rank)
        for r in l3c_ivf_ann(spark, SF_SMOKE).collect()
    }
    got = {(r.query_id, r.vec_id): (r.cosine, r.rank) for r in rows}
    assert got == want


def test_pq_query_never_trains(spark, monkeypatch):
    from cassandra_spark.operators import vector_index as vi

    vi.build_pq_index(spark, SF_SMOKE)
    monkeypatch.setattr(vi, "_pq_train", _boom)
    out = vi.l36_pq_index_query(spark, SF_SMOKE)
    rows = out.collect()
    assert rows
    from cassandra_spark.operators.llm_vectors import l26_pq_ann

    want = {
        (r.query_id, r.vec_id): (r.adist, r.cosine, r.rank)
        for r in l26_pq_ann(spark, SF_SMOKE).collect()
    }
    got = {
        (r.query_id, r.vec_id): (r.adist, r.cosine, r.rank) for r in rows
    }
    assert got == want


def test_build_is_idempotent_and_committed(spark, monkeypatch, tmp_path):
    from cassandra_spark.operators import vector_index as vi

    idx = str(tmp_path / "pq_idx")
    vi.build_pq_index(spark, SF_SMOKE, idx)
    assert os.path.exists(os.path.join(idx, "_MANIFEST.json"))
    # second build must short-circuit on the manifest — no retrain
    monkeypatch.setattr(vi, "_pq_train", _boom)
    assert vi.build_pq_index(spark, SF_SMOKE, idx) == idx


def test_sai_ann_scans_only_probed_buckets(spark):
    """cql17's persisted route: the ANN plan's input files live under the
    artifact and cover ONLY the multiprobe bucket partitions — static
    partition pruning, not a full-corpus hash recompute."""
    from cassandra_spark.cql_session import CqlSession
    from cassandra_spark.operators.cql_queries import _ANN_QVEC
    from cassandra_spark.operators.llm_vectors import (
        N_PLANES,
        multiprobe,
        py_bucket,
    )

    sess = CqlSession(spark, SF_SMOKE)
    sess.execute(
        "CREATE CUSTOM INDEX emb_idx ON embeddings (embedding) "
        "USING 'StorageAttachedIndex'"
    )
    vec = ", ".join(str(v) for v in _ANN_QVEC)
    df = sess.execute(
        f"SELECT vec_id FROM embeddings ORDER BY embedding ANN OF "
        f"[{vec}] LIMIT 10"
    )
    # inputFiles() lists pre-pruning; the executed plan is the truth:
    # the scan must read the ARTIFACT with a PartitionFilters IN-list of
    # exactly the multiprobe buckets and no per-row bucket recompute
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        line for line in plan.splitlines() if "FileScan parquet" in line
    )
    assert "casspark_vecidx_lsh_" in scan, scan[:200]
    pf = scan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "__bucket" in pf and " IN " in pf, pf
    probes = set(multiprobe(py_bucket(list(_ANN_QVEC), N_PLANES), N_PLANES))
    import re as _re

    seen = {
        int(x) for x in _re.search(r"IN \(([-\d,]+)\)", pf).group(1).split(",")
    }
    assert seen == probes, (seen, probes)
    # and the result still matches the per-row-hash route bit-for-bit
    sess2 = CqlSession(spark, SF_SMOKE)
    sess2.execute(
        "CREATE CUSTOM INDEX emb_idx2 ON embeddings (embedding) "
        "USING 'StorageAttachedIndex'"
    )
    # strip the artifact so the fallback per-row path compiles
    sess2.sai_vector_index.clear()
    df2 = sess2.execute(
        f"SELECT vec_id FROM embeddings ORDER BY embedding ANN OF "
        f"[{vec}] LIMIT 10"
    )
    assert [r.vec_id for r in df.collect()] == [
        r.vec_id for r in df2.collect()
    ]


# --- round-9: incremental append (the SSTable pattern) --------------------


def test_ivf_append_equals_one_shot_build(spark, tmp_path):
    """Base build (6/7) + appended generation (1/7) answers the probe
    bit-identically to the one-shot full build."""
    from cassandra_spark.operators import vector_index as vi

    base = vi.build_ivf_index(
        spark, SF_SMOKE, str(tmp_path / "base"), where=vi._APPEND_SPLIT_BASE
    )
    work = vi.clone_index(base, str(tmp_path / "work"))
    assert vi.append_ivf_index(
        spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1"
    )
    full = vi.build_ivf_index(spark, SF_SMOKE)  # cached one-shot artifact
    got = sorted(
        tuple(r) for r in vi.ivf_query_topk(spark, work).collect()
    )
    want = sorted(
        tuple(r) for r in vi.ivf_query_topk(spark, full).collect()
    )
    assert got == want and got


def test_ivf_append_assigns_only_the_batch(spark, tmp_path):
    """The appended generation holds exactly the batch; base postings
    are byte-untouched (no re-assignment of the indexed corpus)."""
    from pyspark.sql import functions as F

    from cassandra_spark.operators import vector_index as vi

    base = vi.build_ivf_index(
        spark, SF_SMOKE, str(tmp_path / "base"), where=vi._APPEND_SPLIT_BASE
    )
    work = vi.clone_index(base, str(tmp_path / "work"))
    before = {
        (p, os.path.getmtime(os.path.join(work, "postings", p)))
        for p in os.listdir(os.path.join(work, "postings"))
    }
    vi.append_ivf_index(spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1")
    after = {
        (p, os.path.getmtime(os.path.join(work, "postings", p)))
        for p in os.listdir(os.path.join(work, "postings"))
    }
    assert before == after, "base postings must not be rewritten"
    gen = spark.read.parquet(os.path.join(work, "postings_g_b1"))
    assert gen.filter(~F.expr(vi._APPEND_SPLIT_NEW)).count() == 0
    assert gen.count() > 0


def test_pq_append_never_trains(spark, tmp_path, monkeypatch):
    """The append path encodes with the FROZEN codebook — training is
    monkeypatched to raise, and the appended codes still land."""
    from cassandra_spark.operators import vector_index as vi

    base = vi.build_pq_index(
        spark, SF_SMOKE, str(tmp_path / "base"), where=vi._APPEND_SPLIT_BASE
    )
    work = vi.clone_index(base, str(tmp_path / "work"))
    monkeypatch.setattr(vi, "_pq_train", _boom)
    assert vi.append_pq_index(
        spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1"
    )
    n_new = spark.read.parquet(os.path.join(work, "codes_g_b1")).count()
    assert n_new > 0
    rows = vi.pq_query_topk(spark, SF_SMOKE, work).collect()
    assert rows, "query over base + generation returned nothing"


def test_ann_append_idempotent_on_batch_id(spark, tmp_path):
    from cassandra_spark.operators import vector_index as vi

    base = vi.build_ivf_index(
        spark, SF_SMOKE, str(tmp_path / "base"), where=vi._APPEND_SPLIT_BASE
    )
    work = vi.clone_index(base, str(tmp_path / "work"))
    assert vi.append_ivf_index(
        spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1"
    ) is True
    n1 = vi.read_family(spark, work, "postings").count()
    assert vi.append_ivf_index(
        spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1"
    ) is False
    assert vi.index_generations(work) == ["b1"]
    assert vi.read_family(spark, work, "postings").count() == n1


def test_ivf_compact_equals_uncompacted(spark, tmp_path):
    from cassandra_spark.operators import vector_index as vi

    base = vi.build_ivf_index(
        spark, SF_SMOKE, str(tmp_path / "base"), where=vi._APPEND_SPLIT_BASE
    )
    work = vi.clone_index(base, str(tmp_path / "work"))
    vi.append_ivf_index(spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1")
    before = sorted(
        tuple(r) for r in vi.ivf_query_topk(spark, work).collect()
    )
    assert vi.compact_index(spark, work) is True
    assert vi.index_generations(work) == []
    # the folded postings keep the bucket partitioning (probe pruning)
    (newdir,) = vi._manifest(work)["families"]["postings"]
    assert any(
        d.startswith("bucket=")
        for d in os.listdir(os.path.join(work, newdir))
    )
    after = sorted(
        tuple(r) for r in vi.ivf_query_topk(spark, work).collect()
    )
    assert before == after and after

def test_pq_compact_folds_codes_not_codebook(spark, tmp_path):
    """PQ fold: answers bit-identical, codes generations folded into one
    segment, and the committed codebook is byte-untouched (it is model
    state shared by every segment, not a generation family)."""
    from cassandra_spark.operators import vector_index as vi

    base = vi.build_pq_index(
        spark, SF_SMOKE, str(tmp_path / "base"), where=vi._APPEND_SPLIT_BASE
    )
    work = vi.clone_index(base, str(tmp_path / "work"))
    vi.append_pq_index(spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1")
    before = sorted(
        tuple(r) for r in vi.pq_query_topk(spark, SF_SMOKE, work).collect()
    )
    book_before = {
        (p, os.path.getmtime(os.path.join(work, "codebook", p)))
        for p in os.listdir(os.path.join(work, "codebook"))
    }
    assert vi.compact_index(spark, work) is True
    assert vi.index_generations(work) == []
    assert not os.path.exists(os.path.join(work, "codes_g_b1"))
    book_after = {
        (p, os.path.getmtime(os.path.join(work, "codebook", p)))
        for p in os.listdir(os.path.join(work, "codebook"))
    }
    assert book_before == book_after, "codebook must not be rewritten"
    after = sorted(
        tuple(r) for r in vi.pq_query_topk(spark, SF_SMOKE, work).collect()
    )
    assert before == after and after


def test_vector_append_after_compact_replay_and_new_batch(spark, tmp_path):
    """Folded batch ids keep replay protection (an at-least-once
    re-append of an absorbed batch is a no-op), while a genuinely new
    batch id still appends and is visible to the probe."""
    from pyspark.sql import functions as F

    from cassandra_spark.operators import vector_index as vi

    base = vi.build_ivf_index(
        spark,
        SF_SMOKE,
        str(tmp_path / "base"),
        where="vec_id % 7 NOT IN (3, 5)",
    )
    work = vi.clone_index(base, str(tmp_path / "work"))
    assert vi.append_ivf_index(
        spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1"
    )
    assert vi.compact_index(spark, work) is True
    # replay of the absorbed batch: no-op, no new generation
    assert vi.append_ivf_index(
        spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1"
    ) is False
    assert vi.index_generations(work) == []
    n_folded = vi.read_family(spark, work, "postings").count()
    # a new batch id appends on top of the folded base
    assert vi.append_ivf_index(spark, SF_SMOKE, work, "vec_id % 7 = 5", "b2")
    assert vi.index_generations(work) == ["b2"]
    fam = vi.read_family(spark, work, "postings")
    assert fam.count() > n_folded
    full = vi.build_ivf_index(spark, SF_SMOKE)  # cached one-shot artifact
    got = sorted(tuple(r) for r in vi.ivf_query_topk(spark, work).collect())
    want = sorted(tuple(r) for r in vi.ivf_query_topk(spark, full).collect())
    assert got == want and got


# --- round-10: the SAI LSH-bucket artifact joins the lifecycle ------------


def test_lsh_append_hashes_only_the_batch(spark, tmp_path):
    """The appended generation holds exactly the batch rows; the base
    bucket layout is byte-untouched (the indexed corpus is never
    re-bucketed on the append path)."""
    from pyspark.sql import functions as F

    from cassandra_spark.operators import vector_index as vi

    base = vi.build_lsh_bucket_index(
        spark, SF_SMOKE, "embeddings", "embedding",
        index_dir=str(tmp_path / "base"), where=vi._APPEND_SPLIT_BASE,
    )
    work = vi.clone_index(base, str(tmp_path / "work"))
    before = {
        (p, os.path.getmtime(os.path.join(work, "buckets", p)))
        for p in os.listdir(os.path.join(work, "buckets"))
    }
    assert vi.append_lsh_bucket_index(
        spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1"
    ) is True
    after = {
        (p, os.path.getmtime(os.path.join(work, "buckets", p)))
        for p in os.listdir(os.path.join(work, "buckets"))
    }
    assert before == after, "base buckets must not be rewritten"
    gen = spark.read.parquet(os.path.join(work, "buckets_g_b1"))
    assert gen.filter(~F.expr(vi._APPEND_SPLIT_NEW)).count() == 0
    assert gen.count() > 0
    # family view = full corpus, bit-identical to a one-shot build
    full = vi.build_lsh_bucket_index(
        spark, SF_SMOKE, "embeddings", "embedding",
        index_dir=str(tmp_path / "full"),
    )
    got = sorted(
        (r.vec_id, r["__bucket"])
        for r in vi.read_family(spark, work, "buckets")
        .select("vec_id", "__bucket").collect()
    )
    want = sorted(
        (r.vec_id, r["__bucket"])
        for r in spark.read.parquet(os.path.join(full, "buckets"))
        .select("vec_id", "__bucket").collect()
    )
    assert got == want and got


def test_lsh_append_idempotent_and_batching_independent(spark, tmp_path):
    from cassandra_spark.operators import vector_index as vi

    base = vi.build_lsh_bucket_index(
        spark, SF_SMOKE, "embeddings", "embedding",
        index_dir=str(tmp_path / "base"), where="vec_id % 7 < 5",
    )
    # one batch vs two batches of the same rows -> identical family
    one = vi.clone_index(base, str(tmp_path / "one"))
    two = vi.clone_index(base, str(tmp_path / "two"))
    assert vi.append_lsh_bucket_index(
        spark, SF_SMOKE, one, "vec_id % 7 >= 5", "all"
    ) is True
    assert vi.append_lsh_bucket_index(  # replay: no-op
        spark, SF_SMOKE, one, "vec_id % 7 >= 5", "all"
    ) is False
    assert vi.index_generations(one) == ["all"]
    assert vi.append_lsh_bucket_index(
        spark, SF_SMOKE, two, "vec_id % 7 = 5", "b5"
    ) is True
    assert vi.append_lsh_bucket_index(
        spark, SF_SMOKE, two, "vec_id % 7 = 6", "b6"
    ) is True
    rows = lambda d: sorted(  # noqa: E731
        (r.vec_id, r["__bucket"])
        for r in vi.read_family(spark, d, "buckets")
        .select("vec_id", "__bucket").collect()
    )
    assert rows(one) == rows(two) and rows(one)


def test_lsh_compact_folds_generations(spark, tmp_path):
    """compact_index folds base + generations to ONE bucket-partitioned
    segment; folded batch ids keep replay protection; the family view
    is unchanged."""
    from cassandra_spark.operators import vector_index as vi

    base = vi.build_lsh_bucket_index(
        spark, SF_SMOKE, "embeddings", "embedding",
        index_dir=str(tmp_path / "base"), where=vi._APPEND_SPLIT_BASE,
    )
    work = vi.clone_index(base, str(tmp_path / "work"))
    vi.append_lsh_bucket_index(spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1")
    before = sorted(
        (r.vec_id, r["__bucket"])
        for r in vi.read_family(spark, work, "buckets")
        .select("vec_id", "__bucket").collect()
    )
    assert vi.compact_index(spark, work) is True
    assert vi.index_generations(work) == []
    assert not os.path.exists(os.path.join(work, "buckets_g_b1"))
    (newdir,) = vi._manifest(work)["families"]["buckets"]
    assert any(
        d.startswith("__bucket=")
        for d in os.listdir(os.path.join(work, newdir))
    ), "the folded family must keep the bucket partitioning"
    # an absorbed batch id must stay a no-op after the fold
    assert vi.append_lsh_bucket_index(
        spark, SF_SMOKE, work, vi._APPEND_SPLIT_NEW, "b1"
    ) is False
    after = sorted(
        (r.vec_id, r["__bucket"])
        for r in vi.read_family(spark, work, "buckets")
        .select("vec_id", "__bucket").collect()
    )
    assert before == after and after
