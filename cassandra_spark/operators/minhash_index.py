"""Persisted MinHash/LSH dedup index — build-once / query-many.

Closes for NEAR-DUP DEDUP the gap round 7's l35/l36 closed for ANN:
l31 models incremental batch admission but derives the EXISTING corpus's
signatures inline on every run ("persisted-in-production" was a comment,
not an artifact). Here the index-build work happens once and commits:

- ``signatures``: (doc_id, sh) — the shingle sets the exact verify reads;
- ``bands``: (doc_id, band_val) PARTITIONED BY (band_id, pband) where
  ``pband = band_val % PMOD`` — the LSH posting lists. A probe joins on
  (band_id, pband, band_val), so dynamic partition pruning reads only the
  band directories the new batch actually hashes into (the postings-list
  shape of the IVF artifact, `[C* index/sasi on-disk segments,
  unverified]` is the reference's nearest analogue).

Query time (``l38_minhash_index_query``): ONLY the new batch is
signatured (it is new data); the existing corpus contributes nothing but
its persisted tables. Admission semantics and output are IDENTICAL to
l31 — same oracle — so the artifact path is pinned against the inline
path by construction; tests/test_minhash_index.py additionally
monkeypatch-asserts the existing corpus is never re-signatured and the
build never re-runs once committed.

At 100 TB: the build is one narrow signature pass + one partitioned
write; each incoming batch then costs O(batch signatures) + a band
equi-join against partition-pruned posting lists + an exact verify over
candidate pairs only — never a corpus rescan, never all-pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators.llm_dedup import (
    _minhash_sql_cte,
    minhash_signatures,
)
from cassandra_spark.operators.vector_index import (
    _commit,
    _commit_generation,
    _committed,
    _has_generation,
    clone_index,
    index_generations,
    index_root,
    layout_write,
    read_family,
)
from cassandra_spark.registry import query

# the l25/l31 split hash: bucket >= 900 of 1000 is the "new batch" (~10%)
SPLIT_HASH = "(doc_id * 2654435761) % 4294967296"
N_BANDS = 4
PMOD = 16  # band_val hash-partitions per band: 4 x 16 = 64 directories


def _banded(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_val, pband) from a signature frame."""
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])
        ).alias("band_id", "band_val"),
    ).withColumn("pband", (F.col("band_val") % PMOD).cast("int"))


def build_minhash_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str | None = None,
    split: int = 900,
) -> str:
    """Write the dedup-index artifact for the EXISTING corpus (split
    bucket < ``split``): ``signatures`` + band-partitioned ``bands``.
    Runs the signature pass exactly once per corpus fingerprint."""
    index_dir = index_dir or index_root(
        sf_dir, f"minhash{split if split != 900 else ''}", table="documents"
    )
    if _committed(index_dir):
        return index_dir
    cat = Catalog(spark, sf_dir)
    existing = cat.documents.filter(F.expr(SPLIT_HASH) % 1000 < split)
    sig = minhash_signatures(existing)
    layout_write(sig.select("doc_id", "sh"), []).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "signatures"))
    (
        layout_write(_banded(sig), ["band_id", "pband"])
        .write.mode("overwrite")
        .partitionBy("band_id", "pband")
        .parquet(os.path.join(index_dir, "bands"))
    )
    _commit(
        index_dir,
        {
            "kind": "minhash",
            "bands": N_BANDS,
            "pmod": PMOD,
            "split": split,
            "generations": [],
        },
    )
    return index_dir


# --- incremental append: the SSTable pattern for the dedup index ------------
# (manifest/generation/clone plumbing is shared with the ANN indexes —
# see vector_index.py "incremental append plumbing")


def index_bands(spark: SparkSession, index_dir: str) -> DataFrame:
    """The posting-list table: base build unioned with every committed
    append generation (all share the (band_id, pband) partitioning, so
    partition pruning applies to every segment family alike)."""
    return read_family(spark, index_dir, "bands")


def index_signatures(spark: SparkSession, index_dir: str) -> DataFrame:
    """The shingle-set table across base + append generations."""
    return read_family(spark, index_dir, "signatures")


def append_minhash_index(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    batch_id: str,
    sig: DataFrame | None = None,
) -> bool:
    """Append one admitted/ingested batch to a committed index as a NEW
    segment family — the SSTable pattern the session tables use: the
    batch's signatures and band-partitioned postings are written to
    ``signatures_g_<id>`` / ``bands_g_<id>`` first, and only then does
    the manifest update (atomic ``os.replace``) make them visible, so a
    crash mid-append leaves orphan files, never a manifest pointing at
    missing data. ONLY the batch is signatured — the existing corpus and
    earlier generations are untouched (monkeypatch-asserted in
    tests/test_minhash_index.py). Idempotent on ``batch_id``: a replayed
    append (foreachBatch retry semantics) is a no-op, so the artifact
    never double-counts a batch. Returns True when a generation was
    written, False for the no-op replay."""
    if not _committed(index_dir):
        raise ValueError(f"no committed index at {index_dir}")
    if _has_generation(index_dir, batch_id):
        return False
    if sig is None:
        sig = minhash_signatures(batch)
    # callers that already signatured the batch (the s18 ingestion loop
    # probes with the same signatures) pass ``sig`` so the batch is
    # signatured once per epoch, not once for the probe and once here
    layout_write(sig.select("doc_id", "sh"), []).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, f"signatures_g_{batch_id}"))
    (
        layout_write(_banded(sig), ["band_id", "pband"])
        .write.mode("overwrite")
        .partitionBy("band_id", "pband")
        .parquet(os.path.join(index_dir, f"bands_g_{batch_id}"))
    )
    _commit_generation(index_dir, batch_id)
    return True


def admit_against_index(
    spark: SparkSession, index_dir: str, nsig: DataFrame, sort: bool = True
) -> DataFrame:
    """Per-doc admission decisions for a signatured batch against the
    persisted index (base + all generations): banded candidate probe on
    the partition-pruned posting lists, PLUS arrival-order candidacy
    among the batch docs themselves (q.doc_id < n.doc_id), then exact
    Jaccard verify against the artifact's shingle sets. Output schema =
    l31's: (doc_id, n_dups, best_jaccard, admit). ``sort=False`` skips
    the cosmetic doc_id ordering — an exchange per call that a sink
    write does not need (s18 re-sorts once at read-back)."""
    nbands = _banded(nsig)
    art_bands = index_bands(spark, index_dir)
    n = nbands.alias("n")
    cand_prior = n.join(
        art_bands.alias("p"),
        (F.col("n.band_id") == F.col("p.band_id"))
        & (F.col("n.pband") == F.col("p.pband"))
        & (F.col("n.band_val") == F.col("p.band_val")),
    ).select(
        F.col("n.doc_id").alias("new_doc"),
        F.col("p.doc_id").alias("prior_doc"),
    )
    cand_new = n.join(
        nbands.alias("q"),
        (F.col("n.band_id") == F.col("q.band_id"))
        & (F.col("n.band_val") == F.col("q.band_val"))
        & (F.col("q.doc_id") < F.col("n.doc_id")),
    ).select(
        F.col("n.doc_id").alias("new_doc"),
        F.col("q.doc_id").alias("prior_doc"),
    )
    cand = cand_prior.unionByName(cand_new).distinct()
    art_sh = index_signatures(spark, index_dir)
    prior_sh = art_sh.unionByName(nsig.select("doc_id", "sh"))
    inter = F.size(F.array_intersect(F.col("sn"), F.col("sp")))
    union = F.size(F.col("sn")) + F.size(F.col("sp")) - inter
    dups = (
        cand.join(
            nsig.select(
                F.col("doc_id").alias("new_doc"), F.col("sh").alias("sn")
            ),
            "new_doc",
        )
        .join(
            prior_sh.select(
                F.col("doc_id").alias("prior_doc"), F.col("sh").alias("sp")
            ),
            "prior_doc",
        )
        .withColumn("jaccard", inter.cast("double") / union)
        .groupBy("new_doc")
        .agg(
            F.sum(F.when(F.col("jaccard") >= 0.2, 1).otherwise(0))
            .cast("long")
            .alias("n_dups"),
            F.max("jaccard").alias("best_jaccard"),
        )
    )
    out = (
        nsig.select("doc_id")
        .join(dups, F.col("doc_id") == F.col("new_doc"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_dups"), F.lit(0)).alias("n_dups"),
            "best_jaccard",
            (F.coalesce(F.col("n_dups"), F.lit(0)) == 0).alias("admit"),
        )
    )
    return out.orderBy("doc_id") if sort else out


@query(
    "l38_minhash_index_build",
    oracle=f"""
    WITH {_minhash_sql_cte()},
    bands AS (
      SELECT doc_id, b.band_id,
             CASE b.band_id WHEN 0 THEN band0 WHEN 1 THEN band1
                            WHEN 2 THEN band2 ELSE band3 END AS band_val
      FROM banded CROSS JOIN (VALUES (0), (1), (2), (3)) b(band_id)
      WHERE ({SPLIT_HASH}) % 1000 < 900
    )
    SELECT CAST(band_id AS INTEGER) AS band_id,
           CAST(band_val % {PMOD} AS INTEGER) AS pband,
           CAST(COUNT(*) AS BIGINT) AS n_postings,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM bands GROUP BY 1, 2
    """,
)
def l38_minhash_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once half: materialize the signature + band-partitioned
    posting tables, then report per-(band_id, pband) posting sizes FROM
    THE ARTIFACT — the oracle recomputes the banding from scratch, so
    equality proves the persisted posting lists hold exactly the inline
    derivation."""
    index_dir = build_minhash_index(spark, sf_dir)
    return (
        spark.read.parquet(os.path.join(index_dir, "bands"))
        .groupBy(
            F.col("band_id").cast("int").alias("band_id"),
            F.col("pband").cast("int").alias("pband"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


# The admission oracle (l31's contract): new batch = bucket >= 900,
# priors = the whole earlier corpus (bucket < 900) plus smaller-id batch
# docs (arrival-order candidacy). l38_query proves the build+query split
# equals this; l40 proves build(<800) + APPEND(800-899) + query equals
# the SAME thing — i.e. an appended generation serves exactly like a
# rebuilt index; s18 proves the streaming append loop does too.
ADMIT_ORACLE_SQL = f"""
    WITH {{MINHASH_CTE}},
    bucketed AS (
      SELECT *, ({SPLIT_HASH}) % 1000 AS bucket FROM banded
    ),
    bands AS (
      SELECT doc_id, bucket, b.band_id,
             CASE b.band_id WHEN 0 THEN band0 WHEN 1 THEN band1
                            WHEN 2 THEN band2 ELSE band3 END AS band_val
      FROM bucketed CROSS JOIN (VALUES (0), (1), (2), (3)) b(band_id)
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_doc, p.doc_id AS prior_doc
      FROM bands n JOIN bands p
        ON n.band_id = p.band_id AND n.band_val = p.band_val
      WHERE n.bucket >= 900
        AND (p.bucket < 900 OR (p.bucket >= 900 AND p.doc_id < n.doc_id))
    ),
    verified AS (
      SELECT new_doc,
             CAST(len(list_intersect(sn.sh, sp.sh)) AS DOUBLE)
             / (len(sn.sh) + len(sp.sh) - len(list_intersect(sn.sh, sp.sh)))
               AS jaccard
      FROM cand
      JOIN banded sn ON sn.doc_id = new_doc
      JOIN banded sp ON sp.doc_id = prior_doc
    ),
    dups AS (
      SELECT new_doc,
             CAST(COUNT(*) FILTER (WHERE jaccard >= 0.2) AS BIGINT)
               AS n_dups,
             MAX(jaccard) AS best_jaccard
      FROM verified GROUP BY new_doc
    )
    SELECT b.doc_id,
           COALESCE(d.n_dups, 0) AS n_dups,
           d.best_jaccard,
           COALESCE(d.n_dups, 0) = 0 AS admit
    FROM bucketed b LEFT JOIN dups d ON d.new_doc = b.doc_id
    WHERE b.bucket >= 900
    ORDER BY b.doc_id
    """


@query(
    "l38_minhash_index_query",
    # identical contract to l31: the oracle recomputes the WHOLE corpus
    # inline; the Spark side signatures only the new batch and reads the
    # existing corpus from the artifact
    oracle=ADMIT_ORACLE_SQL.replace(
        "{MINHASH_CTE}", _minhash_sql_cte().strip()
    ),
)
def l38_minhash_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-many half: admit the new batch against the PERSISTED corpus
    index. The new side is signatured here (it is new data); the prior
    side's bands and shingle sets come strictly from the artifact. The
    probe joins on (band_id, pband, band_val) so the partitioned layout
    prunes; arrival-order candidacy among batch docs matches l31."""
    index_dir = build_minhash_index(spark, sf_dir)
    cat = Catalog(spark, sf_dir)
    new_docs = cat.documents.filter(F.expr(SPLIT_HASH) % 1000 >= 900)
    nsig = minhash_signatures(new_docs).select(
        "doc_id", "sh", *[f"band{b}" for b in range(N_BANDS)]
    ).persist()  # three consumers: probe bands, verify sh, output keys
    return admit_against_index(spark, index_dir, nsig)


@query(
    "l40_minhash_index_append",
    # SAME oracle as l38_query: priors = everything below bucket 900.
    # The Spark side gets there differently — base build over <800,
    # APPEND of 800-899 as a generation — so equality proves an appended
    # generation serves exactly like a rebuilt index.
    oracle=ADMIT_ORACLE_SQL.replace(
        "{MINHASH_CTE}", _minhash_sql_cte().strip()
    ),
)
def l40_minhash_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-append half of the persisted dedup index (the SSTable
    pattern, round-9): build the base artifact over bucket < 800, APPEND
    the 800-899 slice as a committed generation (only that slice is
    signatured — the base corpus is untouched, monkeypatch-asserted in
    tests/test_minhash_index.py), then admit the >= 900 batch against
    base + generation. The scenario runs against a CLONE of the cached
    base artifact so bench re-runs never see a previous run's
    generations (append idempotence is separately pinned by batch_id)."""
    import tempfile

    base = build_minhash_index(
        spark,
        sf_dir,
        index_root(sf_dir, "minhash800", table="documents"),
        split=800,
    )
    work = clone_index(base, tempfile.mkdtemp(prefix="l40_idx_"))
    cat = Catalog(spark, sf_dir)
    bucket = F.expr(SPLIT_HASH) % 1000
    batch1 = cat.documents.filter((bucket >= 800) & (bucket < 900))
    append_minhash_index(spark, work, batch1, "b1")
    new_docs = cat.documents.filter(bucket >= 900)
    nsig = minhash_signatures(new_docs).select(
        "doc_id", "sh", *[f"band{b}" for b in range(N_BANDS)]
    ).persist()
    return admit_against_index(spark, work, nsig)


@query(
    "l43_minhash_index_compact",
    # SAME oracle again: base(<800) + appended generation(800-899)
    # FOLDED by compaction must admit the >=900 batch exactly like the
    # un-compacted and the one-shot layouts do.
    oracle=ADMIT_ORACLE_SQL.replace(
        "{MINHASH_CTE}", _minhash_sql_cte().strip()
    ),
)
def l43_minhash_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation compaction (round-9; the artifact's minor compaction,
    completing the SSTable lifecycle: build → append → FOLD): after
    appending the 800-899 slice as a generation, compact_index folds
    base + generations into one segment per family (probe cost back to
    a single read while appends stayed O(batch)), and the >= 900 batch
    then admits against the folded artifact — same oracle as
    l38/l40, so equality proves compaction changed the layout and
    nothing else. Folded batch ids keep replay protection
    (tests/test_minhash_index.py pins no-op re-appends and
    append-after-compact)."""
    import tempfile

    from cassandra_spark.operators.vector_index import compact_index

    base = build_minhash_index(
        spark,
        sf_dir,
        index_root(sf_dir, "minhash800", table="documents"),
        split=800,
    )
    work = clone_index(base, tempfile.mkdtemp(prefix="l43_idx_"))
    cat = Catalog(spark, sf_dir)
    bucket = F.expr(SPLIT_HASH) % 1000
    batch1 = cat.documents.filter((bucket >= 800) & (bucket < 900))
    append_minhash_index(spark, work, batch1, "b1")
    assert compact_index(spark, work)
    new_docs = cat.documents.filter(bucket >= 900)
    nsig = minhash_signatures(new_docs).select(
        "doc_id", "sh", *[f"band{b}" for b in range(N_BANDS)]
    ).persist()
    return admit_against_index(spark, work, nsig)
