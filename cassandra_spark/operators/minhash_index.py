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
    _committed,
    index_root,
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
    spark: SparkSession, sf_dir: str, index_dir: str | None = None
) -> str:
    """Write the dedup-index artifact for the EXISTING corpus (split
    bucket < 900): ``signatures`` + band-partitioned ``bands``. Runs the
    signature pass exactly once per corpus fingerprint."""
    index_dir = index_dir or index_root(sf_dir, "minhash", table="documents")
    if _committed(index_dir):
        return index_dir
    cat = Catalog(spark, sf_dir)
    existing = cat.documents.filter(F.expr(SPLIT_HASH) % 1000 < 900)
    sig = minhash_signatures(existing)
    sig.select("doc_id", "sh").write.mode("overwrite").parquet(
        os.path.join(index_dir, "signatures")
    )
    (
        _banded(sig)
        .write.mode("overwrite")
        .partitionBy("band_id", "pband")
        .parquet(os.path.join(index_dir, "bands"))
    )
    _commit(
        index_dir,
        {"kind": "minhash", "bands": N_BANDS, "pmod": PMOD, "split": 900},
    )
    return index_dir


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


@query(
    "l38_minhash_index_query",
    # identical contract to l31: the oracle recomputes the WHOLE corpus
    # inline; the Spark side signatures only the new batch and reads the
    # existing corpus from the artifact
    oracle=f"""
    WITH {_minhash_sql_cte()},
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
    """,
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
    nbands = _banded(nsig)

    art_bands = spark.read.parquet(os.path.join(index_dir, "bands"))
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

    art_sh = spark.read.parquet(os.path.join(index_dir, "signatures"))
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
    return (
        nsig.select("doc_id")
        .join(dups, F.col("doc_id") == F.col("new_doc"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_dups"), F.lit(0)).alias("n_dups"),
            "best_jaccard",
            (F.coalesce(F.col("n_dups"), F.lit(0)) == 0).alias("admit"),
        )
        .orderBy("doc_id")
    )
