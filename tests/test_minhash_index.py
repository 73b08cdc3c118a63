"""Persisted MinHash dedup index (l38): the query path never
re-signatures the existing corpus, the artifact layout is genuinely
band-partitioned, and admission equals the inline l31 path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cassandra_spark.operators import minhash_index as mi
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def index_dir(spark):
    return mi.build_minhash_index(spark, SF_SMOKE)


def test_artifact_layout_band_partitioned(index_dir):
    bands = os.path.join(index_dir, "bands")
    band_dirs = [d for d in os.listdir(bands) if d.startswith("band_id=")]
    assert len(band_dirs) == mi.N_BANDS
    pdirs = [
        d
        for d in os.listdir(os.path.join(bands, band_dirs[0]))
        if d.startswith("pband=")
    ]
    assert pdirs, "bands must be sub-partitioned by pband"
    assert os.path.exists(os.path.join(index_dir, "signatures"))
    assert os.path.exists(os.path.join(index_dir, "_MANIFEST.json"))


def test_artifact_holds_existing_corpus_only(spark, index_dir):
    sig = spark.read.parquet(os.path.join(index_dir, "signatures"))
    n_new = sig.filter(F.expr(mi.SPLIT_HASH) % 1000 >= 900).count()
    assert n_new == 0, "the index must cover only the existing corpus"


def test_query_never_resignatures_existing_corpus(
    spark, index_dir, monkeypatch
):
    """With the artifact committed, the ONLY signature work at query time
    is the new batch — a probe wrapper fails the test if any existing-
    corpus doc reaches the signature pass (which is also what a build
    re-run would do)."""
    real = mi.minhash_signatures
    calls = []

    def probe(docs):
        n_existing = docs.filter(
            F.expr(mi.SPLIT_HASH) % 1000 < 900
        ).count()
        assert n_existing == 0, (
            "query path re-signatured the existing corpus"
        )
        calls.append(docs.count())
        return real(docs)

    monkeypatch.setattr(mi, "minhash_signatures", probe)
    out = mi.l38_minhash_index_query(spark, SF_SMOKE).collect()
    assert out, "new batch must produce admission rows"
    assert len(calls) == 1, "exactly one signature pass (the new batch)"
    assert calls[0] == len(out), "every new-batch doc is scored"


def test_admission_matches_inline_l31(spark, index_dir):
    from cassandra_spark.operators.llm_pipeline import l31_incremental_dedup

    via_index = [
        tuple(r) for r in mi.l38_minhash_index_query(spark, SF_SMOKE).collect()
    ]
    inline = [
        tuple(r) for r in l31_incremental_dedup(spark, SF_SMOKE).collect()
    ]
    assert via_index == inline


# --- s17: the streaming gatekeeper over the same artifact -----------------


def test_streaming_admission_batching_independent(spark, index_dir, tmp_path):
    """The gatekeeper's output must not depend on micro-batch boundaries:
    1-file (one epoch) and 4-file (four epochs) stagings agree row-for-
    row, and both equal the corpus-only slice of the batch decision."""
    import os

    from cassandra_spark.streaming import jobs

    split = "(doc_id * 2654435761) % 4294967296"
    new = (
        __import__("cassandra_spark.catalog", fromlist=["Catalog"])
        .Catalog(spark, SF_SMOKE)
        .documents.filter(F.expr(split) % 1000 >= 900)
        .select("doc_id", "text")
    )
    outs = []
    for nfiles in (1, 4):
        src = str(tmp_path / f"src{nfiles}")
        out = str(tmp_path / f"out{nfiles}")
        new.repartition(nfiles).write.mode("overwrite").parquet(src)
        jobs.streaming_admission(spark, src, SF_SMOKE, out)
        outs.append(
            sorted(tuple(r) for r in spark.read.parquet(out).collect())
        )
    assert outs[0] == outs[1]
    assert outs[0], "new batch must produce admissions"


def test_streaming_admission_never_resignatures_corpus(
    spark, index_dir, tmp_path, monkeypatch
):
    from cassandra_spark.streaming import jobs

    real = mi.minhash_signatures

    def probe(docs):
        assert (
            docs.filter(F.expr(mi.SPLIT_HASH) % 1000 < 900).count() == 0
        ), "gatekeeper re-signatured the frozen corpus"
        return real(docs)

    import cassandra_spark.operators.llm_dedup as ld

    monkeypatch.setattr(ld, "minhash_signatures", probe)
    split = "(doc_id * 2654435761) % 4294967296"
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    (
        __import__("cassandra_spark.catalog", fromlist=["Catalog"])
        .Catalog(spark, SF_SMOKE)
        .documents.filter(F.expr(split) % 1000 >= 900)
        .select("doc_id", "text")
        .repartition(2)
        .write.mode("overwrite")
        .parquet(src)
    )
    jobs.streaming_admission(spark, src, SF_SMOKE, out)
    assert spark.read.parquet(out).count() > 0


# --- round-9: incremental append (the SSTable pattern) --------------------


def _clone(spark, index_dir, tmp_path, name="w"):
    return mi.clone_index(index_dir, str(tmp_path / name))


def test_append_only_signatures_the_batch(spark, index_dir, tmp_path,
                                          monkeypatch):
    """append_minhash_index must signature ONLY the appended batch —
    neither the base corpus nor earlier generations."""
    from cassandra_spark.catalog import Catalog

    work = _clone(spark, index_dir, tmp_path)
    batch = (
        Catalog(spark, SF_SMOKE)
        .documents.filter(F.expr(mi.SPLIT_HASH) % 1000 >= 950)
        .select("doc_id", "text")
    )
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    real = mi.minhash_signatures
    seen = []

    def probe(docs):
        ids = {r.doc_id for r in docs.select("doc_id").collect()}
        seen.append(ids)
        return real(docs)

    monkeypatch.setattr(mi, "minhash_signatures", probe)
    assert mi.append_minhash_index(spark, work, batch, "b950")
    assert len(seen) == 1 and seen[0] == batch_ids


def test_append_is_idempotent_on_batch_id(spark, index_dir, tmp_path):
    from cassandra_spark.catalog import Catalog

    work = _clone(spark, index_dir, tmp_path)
    batch = (
        Catalog(spark, SF_SMOKE)
        .documents.filter(F.expr(mi.SPLIT_HASH) % 1000 >= 950)
        .select("doc_id", "text")
    )
    assert mi.append_minhash_index(spark, work, batch, "e0") is True
    n_after_first = mi.index_signatures(spark, work).count()
    assert mi.append_minhash_index(spark, work, batch, "e0") is False
    assert mi.index_generations(work) == ["e0"]
    assert mi.index_signatures(spark, work).count() == n_after_first


def test_uncommitted_generation_is_invisible(spark, index_dir, tmp_path):
    """Crash-safety: generation data written but not manifest-committed
    must not be read (the manifest update is the commit point)."""
    import shutil

    work = _clone(spark, index_dir, tmp_path)
    base_n = mi.index_signatures(spark, work).count()
    # simulate a crash between the data write and the manifest update
    shutil.copytree(
        os.path.join(work, "signatures"),
        os.path.join(work, "signatures_g_orphan"),
    )
    shutil.copytree(
        os.path.join(work, "bands"), os.path.join(work, "bands_g_orphan")
    )
    assert mi.index_generations(work) == []
    assert mi.index_signatures(spark, work).count() == base_n


def test_append_then_admit_equals_full_rebuild(spark, tmp_path):
    """admit -> append -> admit == the one-shot result: admitting the
    >=900 batch against (base<800 + appended 800-899 generation) equals
    admitting it against the index BUILT over <900 in one shot."""
    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.llm_dedup import minhash_signatures

    cat = Catalog(spark, SF_SMOKE)
    bucket = F.expr(mi.SPLIT_HASH) % 1000
    base800 = mi.build_minhash_index(
        spark, SF_SMOKE, str(tmp_path / "base800"), split=800
    )
    work = _clone(spark, base800, tmp_path, "work")
    mi.append_minhash_index(
        spark,
        work,
        cat.documents.filter((bucket >= 800) & (bucket < 900)),
        "b1",
    )
    full = mi.build_minhash_index(
        spark, SF_SMOKE, str(tmp_path / "full900"), split=900
    )
    nsig = minhash_signatures(
        cat.documents.filter(bucket >= 900)
    ).select("doc_id", "sh", *[f"band{b}" for b in range(mi.N_BANDS)])
    via_append = [
        tuple(r)
        for r in mi.admit_against_index(spark, work, nsig).collect()
    ]
    via_rebuild = [
        tuple(r)
        for r in mi.admit_against_index(spark, full, nsig).collect()
    ]
    assert via_append == via_rebuild
    assert via_append, "batch must produce admission rows"


def test_append_loop_batching_independent(spark, index_dir, tmp_path):
    """s18's property at the jobs level: with id-ordered arrival, the
    admit-then-append loop's decisions are identical for 1-file and
    4-file stagings (and the s18 registry query pins both against the
    one-shot oracle)."""
    from cassandra_spark.operators.streaming_batch import (
        stage_id_ordered_files,
    )
    from cassandra_spark.streaming import jobs

    outs = []
    for nfiles in (1, 4):
        work = _clone(spark, index_dir, tmp_path, f"idx{nfiles}")
        src = str(tmp_path / f"src{nfiles}")
        out = str(tmp_path / f"out{nfiles}")
        stage_id_ordered_files(spark, SF_SMOKE, src, n_files=nfiles)
        jobs.streaming_admission_append(spark, src, out, work)
        outs.append(
            sorted(tuple(r) for r in spark.read.parquet(out).collect())
        )
        # every epoch committed a generation
        assert len(mi.index_generations(work)) == nfiles
    assert outs[0] == outs[1]
    assert outs[0], "batch must produce admissions"


def test_compact_folds_generations_same_answers(spark, index_dir, tmp_path):
    """compact_index folds base + generations into one segment per
    family: same admission answers, empty generation list, fewer dirs,
    folded batch ids keep replay protection, appends still work."""
    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.llm_dedup import minhash_signatures
    from cassandra_spark.operators.vector_index import compact_index

    cat = Catalog(spark, SF_SMOKE)
    bucket = F.expr(mi.SPLIT_HASH) % 1000
    work = _clone(spark, index_dir, tmp_path)
    b1 = cat.documents.filter((bucket >= 900) & (bucket < 950))
    b2 = cat.documents.filter(bucket >= 950)
    assert mi.append_minhash_index(spark, work, b1, "e0")
    assert mi.append_minhash_index(spark, work, b2, "e1")
    probe = minhash_signatures(
        cat.documents.filter(bucket >= 990)
    ).select("doc_id", "sh", *[f"band{b}" for b in range(mi.N_BANDS)])
    before = sorted(
        tuple(r) for r in mi.admit_against_index(spark, work, probe).collect()
    )
    n_dirs_before = len(os.listdir(work))
    assert compact_index(spark, work) is True
    assert mi.index_generations(work) == []
    assert len(os.listdir(work)) < n_dirs_before
    after = sorted(
        tuple(r) for r in mi.admit_against_index(spark, work, probe).collect()
    )
    assert before == after and after
    # folded ids stay replay-protected; fresh appends still land
    assert mi.append_minhash_index(spark, work, b1, "e0") is False
    assert mi.append_minhash_index(spark, work, b1, "e2") is True
    # a second compaction folds the new generation too
    assert compact_index(spark, work) is True
    assert compact_index(spark, work) is False  # nothing left to fold


def test_append_loop_with_auto_compaction_same_decisions(
    spark, index_dir, tmp_path
):
    """compact_every folds generations mid-stream; decisions must be
    identical to the uncompacted loop (compaction changes layout only)
    and the artifact must end with fewer generation dirs."""
    from cassandra_spark.operators.streaming_batch import (
        stage_id_ordered_files,
    )
    from cassandra_spark.streaming import jobs

    outs = []
    for tag, every in (("plain", None), ("compact", 2)):
        work = _clone(spark, index_dir, tmp_path, f"idx_{tag}")
        src = str(tmp_path / f"src_{tag}")
        out = str(tmp_path / f"out_{tag}")
        stage_id_ordered_files(spark, SF_SMOKE, src, n_files=4)
        jobs.streaming_admission_append(
            spark, src, out, work, compact_every=every
        )
        outs.append(
            sorted(tuple(r) for r in spark.read.parquet(out).collect())
        )
        if every:
            assert len(mi.index_generations(work)) < 4, (
                "generations must have been folded mid-stream"
            )
    assert outs[0] == outs[1] and outs[0]
