"""Persisted vector-index artifacts: build once, query many (round-7).

The round-6 ANN entries (l3b/l3c/l26/cql17) re-derived their index state
— LSH buckets, IVF assignments, PQ codebooks — inline on every query. A
real SAI vector index (`[C* index/sai, unverified]`, the ``Filter.db``
sidecar analogue next to ``operators/bloom.py``) is built at write time
and served many times. This module persists the three artifact families
as plain parquet tables and routes query-time reads through them:

- **IVF** (``l35``): a ``centroids`` table (cj, cvec) materializing the
  centroid VALUES, and a ``postings`` table — the inverted file — of
  (vec_id, embedding, nrm) **partitioned by bucket**, so a probe of
  nprobe cells is a partition-pruned scan, not a full-corpus filter.
- **PQ** (``l36``): a ``codebook`` table (m, cid, cvec) from the same
  integer-exact Lloyd round as l26 (training collects happen HERE, at
  build), and a ``codes`` table (vec_id, codes). The query path reads
  both and never trains: codebook → broadcast LUT literals, codes →
  map-only ADC scan, exact re-rank joins the base table.

Index identity: the artifact dir is keyed by the corpus file's
(path, size, mtime) fingerprint, so a changed corpus can never serve a
stale index; the build commits by writing ``_MANIFEST.json`` last
(atomic rename), so a crashed build is rebuilt, never half-read.

At 10⁹ vectors nothing changes shape: centroids/codebooks stay O(K·d)
broadcast state, postings partitioning IS the cell layout a distributed
index would shard by, and the codes scan is map-only.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query
from cassandra_spark.operators.llm_vectors import (
    ASSIGN_DUCK,
    N_CENTROIDS,
    PQ_M,
    PQ_NQ,
    PQ_SHORTLIST,
    PQ_SUB,
    PQ_TOPK,
    _assign_bucket_col,
    _normed,
    _NORMED_DUCK,
    _pq_oracle,
    _pq_train,
    _pq_code_udf,
    _QV_SPARK_GRID,
    _unrolled_int_dot,
    dot_duck,
    dot_spark,
)

INDEX_VERSION = 1


def index_root(sf_dir: str, kind: str, table: str = "embeddings") -> str:
    """Deterministic per-(corpus, kind) artifact location. The key folds
    in the corpus file's size+mtime so a regenerated corpus can never
    serve a stale index — the staleness rule a catalog would enforce."""
    base = os.path.abspath(sf_dir)
    st = os.stat(os.path.join(base, f"{table}.parquet"))
    key = hashlib.md5(
        f"{base}|{table}|{st.st_size}|{st.st_mtime_ns}|{kind}|"
        f"v{INDEX_VERSION}".encode()
    ).hexdigest()[:16]
    return os.path.join(
        tempfile.gettempdir(), f"casspark_vecidx_{kind}_{key}"
    )


def _committed(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, "_MANIFEST.json"))


def _commit(index_dir: str, meta: dict) -> None:
    tmp = os.path.join(index_dir, "_MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "_MANIFEST.json"))


# --- incremental append plumbing (round-9): the SSTable pattern -------------
#
# Shared by every persisted index (IVF/PQ here, MinHash in
# minhash_index.py): an append writes the batch's derived rows as a NEW
# segment family ``<family>_g_<batch_id>`` and only then commits the
# manifest update (atomic os.replace) — a crash mid-append leaves orphan
# files, never a manifest pointing at missing data; appends are
# idempotent on batch_id so at-least-once retries cannot double-count.


def _manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "_MANIFEST.json")) as f:
        return json.load(f)


def index_generations(index_dir: str) -> list[str]:
    """Committed append-generation ids in append order (pre-append
    manifests read as none)."""
    return list(_manifest(index_dir).get("generations", []))


def _union_parquet(spark: SparkSession, paths: list[str]) -> DataFrame:
    out = None
    for p in paths:
        df = spark.read.parquet(p)
        out = df if out is None else out.unionByName(df)
    return out


def _family_dirs(index_dir: str, family: str) -> list[str]:
    """The directory names that make up one logical family: the base
    (or, post-compaction, whatever the manifest's ``families`` entry
    points at) plus every committed append generation."""
    man = _manifest(index_dir)
    base = man.get("families", {}).get(family, [family])
    return [os.path.join(index_dir, d) for d in base] + [
        os.path.join(index_dir, f"{family}_g_{g}")
        for g in man.get("generations", [])
    ]


def read_family(
    spark: SparkSession, index_dir: str, family: str
) -> DataFrame:
    """One logical index table = base build + every committed append
    generation (each keeps the family's partitioning, so partition
    pruning applies to every segment alike)."""
    paths = _family_dirs(index_dir, family)
    return (
        spark.read.parquet(paths[0])
        if len(paths) == 1
        else _union_parquet(spark, paths)
    )


def _commit_generation(index_dir: str, batch_id: str) -> None:
    man = _manifest(index_dir)
    man["generations"] = list(man.get("generations", [])) + [batch_id]
    _commit(index_dir, man)


def _has_generation(index_dir: str, batch_id: str) -> bool:
    man = _manifest(index_dir)
    return batch_id in man.get("generations", []) or batch_id in man.get(
        "folded", []
    )


# per-kind family layout: family name -> partitioning columns (the
# layout every segment of the family keeps, base and generations alike)
FAMILY_LAYOUT: dict[str, dict[str, list[str]]] = {
    "minhash": {"signatures": [], "bands": ["band_id", "pband"]},
    "ivf": {"postings": ["bucket"]},
    "pq": {"codes": []},
    "lsh": {"buckets": ["__bucket"]},
}


def layout_write(df: DataFrame, parts: list[str] | tuple[str, ...]):
    """Cluster a family's rows to its on-disk layout before the write
    (r12 opt round, guide §6 small files): a ``partitionBy`` write from
    an N-partition plan emits up to N files per partition directory —
    measured 2080 parquet files (~15 KB each) for the x10 minhash bands
    family, and every probe/clone/compact then pays the per-file
    listing + footer + open cost. An AQE REBALANCE exchange keyed on the
    partition columns (no-arg for unpartitioned families) makes each
    directory one advisory-sized file, splitting genuinely large keys
    instead of funneling them into one task the way a plain
    ``repartition(cols)`` would — the scale-safe form of the fix."""
    if parts:
        return df.hint("rebalance", *parts)
    return df.hint("rebalance")


def compact_index(spark: SparkSession, index_dir: str) -> bool:
    """Fold every committed append generation back into one base segment
    per family — the index artifact's minor compaction (the same
    SSTable-fold the session tables run): each probe currently unions
    base + N generation reads; past some N the per-segment
    listing/footer overhead dominates, so a periodic fold keeps probe
    cost flat while appends stay O(batch).

    Commit protocol mirrors append: the folded family is written to a
    NEW directory (``<family>_c<epoch>``) first; the manifest update
    (atomic os.replace) then points the family at it and clears the
    generation list — a crash before the manifest commit leaves the old
    view fully intact, a crash after leaves only orphan directories
    (cleaned best-effort on the next compaction). Returns False (no-op)
    when there are no generations to fold."""
    import shutil

    man = _manifest(index_dir)
    gens = list(man.get("generations", []))
    if not gens:
        return False
    layout = FAMILY_LAYOUT[man["kind"]]
    epoch = int(man.get("compactions", 0)) + 1
    old_dirs: list[str] = []
    new_names: dict[str, list[str]] = {}
    for family, parts in layout.items():
        old_dirs.extend(_family_dirs(index_dir, family))
        new_name = f"{family}_c{epoch}"
        w = layout_write(
            read_family(spark, index_dir, family), parts
        ).write.mode("overwrite")
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(os.path.join(index_dir, new_name))
        new_names[family] = [new_name]
    man["families"] = {**man.get("families", {}), **new_names}
    man["generations"] = []
    # folded batch ids keep their replay protection: an at-least-once
    # re-append of a batch the compaction already absorbed must still
    # be a no-op, or the artifact double-counts it
    man["folded"] = list(man.get("folded", [])) + gens
    man["compactions"] = epoch
    _commit(index_dir, man)
    for d in old_dirs:  # superseded segments: best-effort GC
        shutil.rmtree(d, ignore_errors=True)
    return True


def clone_index(index_dir: str, dst: str) -> str:
    """File-level copy of a committed artifact (base + generations) — a
    scenario run's PRIVATE appendable index, without re-deriving the
    corpus (bench re-runs must not see a previous run's generations)."""
    import shutil

    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(index_dir, dst)
    return dst


# --- IVF: centroid table + bucket-partitioned inverted file -----------------


def build_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str | None = None,
    where: str | None = None,
) -> str:
    """Write the IVF artifact: ``centroids`` (cj, cvec — the VALUES of
    l3c's deterministic stand-in centroids, so query results stay
    bit-identical to the inline path) and ``postings`` — (vec_id,
    embedding, nrm) partitioned by assigned bucket. Assignment runs ONCE
    here; queries never recompute it. ``where`` (SQL over vec_id)
    restricts the indexed vectors — the base half of an append scenario
    (l41); the centroid table is data-independent, so base + appended
    generations is bit-identical to a one-shot full build."""
    index_dir = index_dir or index_root(sf_dir, "ivf")
    if _committed(index_dir):
        return index_dir
    cat = Catalog(spark, sf_dir)
    dim = int(cat.embeddings.select(F.size("embedding")).head()[0])
    cent = [
        (j, [float(((j * 7919 + d * 104729 + 12345) % 2048) - 1024)
             for d in range(dim)])
        for j in range(N_CENTROIDS)
    ]
    spark.createDataFrame(
        cent, "cj int, cvec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids")
    )
    normed = _normed(cat)
    indexed = normed.filter(F.expr(where)) if where else normed
    (
        layout_write(
            indexed.withColumn("bucket", _assign_bucket_col()), ["bucket"]
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(index_dir, "postings"))
    )
    normed.unpersist()
    _commit(
        index_dir,
        {"kind": "ivf", "n_centroids": N_CENTROIDS, "generations": []},
    )
    return index_dir


def append_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    where: str,
    batch_id: str,
) -> bool:
    """Append new vectors to a committed IVF index: assign ONLY the
    batch to the EXISTING centroids (no re-assignment of the indexed
    corpus — monkeypatch-asserted in tests/test_vector_index.py), write
    the bucket-partitioned ``postings_g_<id>`` family, then commit the
    manifest. Idempotent on batch_id; returns False for a replay."""
    if not _committed(index_dir):
        raise ValueError(f"no committed index at {index_dir}")
    if _has_generation(index_dir, batch_id):
        return False
    cat = Catalog(spark, sf_dir)
    batch = _normed(cat).filter(F.expr(where))
    (
        layout_write(
            batch.withColumn("bucket", _assign_bucket_col()), ["bucket"]
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(index_dir, f"postings_g_{batch_id}"))
    )
    _commit_generation(index_dir, batch_id)
    return True


# dot of a stored centroid vector against ``vec``, accumulated in the
# SAME d-ascending double order as llm_vectors._centroid_dot_spark —
# cvec[d] already holds cast(formula AS double), so terms are identical
# and the fold is bit-exact against the inline formula (and the oracle).
def _cvec_dot(vec: str) -> str:
    return (
        f"aggregate(sequence(0, size({vec}) - 1), 0D, (acc, d) -> acc + "
        f"cvec[d] * cast({vec}[d] AS double))"
    )


def ivf_query_topk(
    spark: SparkSession,
    index_dir: str,
    nprobe: int = 2,
    topk: int = 5,
) -> DataFrame:
    """ANN over the PERSISTED index only — no assignment recompute, no
    training: broadcast the centroid table, rank cells per query, scan
    just the probed postings partitions, exact-score candidates."""
    centroids = spark.read.parquet(os.path.join(index_dir, "centroids"))
    postings = read_family(spark, index_dir, "postings")
    queries = postings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    qdots = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "cdot", F.expr(_cvec_dot("qv"))
    )
    wprobe = Window.partitionBy("query_id").orderBy(F.desc("cdot"), "cj")
    probes = (
        qdots.withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "qn", "cj")
    )
    pairs = postings.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("cj"))
        & (F.col("vec_id") != F.col("query_id")),
    ).withColumn(
        "cosine",
        F.expr(dot_spark("qv", "embedding")) / (F.col("qn") * F.col("nrm")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "vec_id", "cosine", "rank")
    )


@query(
    "l35_ivf_index_build",
    oracle=f"""
    WITH {_NORMED_DUCK},
    assigned AS (
      SELECT vec_id, {ASSIGN_DUCK} AS bucket FROM normed
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM assigned GROUP BY bucket
    """,
)
def l35_ivf_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once half of the persisted-IVF pair: materialize the
    centroid table + bucket-partitioned inverted file, then report the
    committed per-cell posting sizes FROM THE ARTIFACT (the oracle
    recomputes assignment from scratch — equality proves the persisted
    inverted file holds exactly the inline path's assignment)."""
    index_dir = build_ivf_index(spark, sf_dir)
    return (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .select(F.col("bucket").cast("long"), "n_vectors")
    )


# the full-corpus IVF query oracle — shared by l35_query (one-shot
# build) and l41 (base build + appended generation): the centroid table
# is data-independent, so both artifact layouts must answer identically
_IVF_QUERY_ORACLE = f"""
    WITH {_NORMED_DUCK},
    assigned AS (
      SELECT vec_id, embedding, nrm, {ASSIGN_DUCK} AS bucket FROM normed
    ),
    qdots AS (
      SELECT q.vec_id AS query_id, q.embedding, q.nrm, j.j AS cj,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(embedding) + 1), d ->
                 CAST(((j.j * 7919 + (d - 1) * 104729 + 12345) % 2048)
                      - 1024 AS DOUBLE)
                 * CAST(embedding[d] AS DOUBLE))), (x, y) -> x + y)
               AS cdot
      FROM assigned q CROSS JOIN (
        SELECT unnest(range(0, {N_CENTROIDS})) AS j) j
      WHERE q.vec_id < 5
    ),
    probes AS (
      SELECT query_id, embedding, nrm, cj
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cdot DESC, cj) AS rn
            FROM qdots)
      WHERE rn <= 2
    ),
    pairs AS (
      SELECT p.query_id, c.vec_id,
             {dot_duck('p.embedding', 'c.embedding')} / (p.nrm * c.nrm)
               AS cosine
      FROM probes p JOIN assigned c
        ON c.bucket = p.cj AND c.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, cosine, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
          FROM pairs)
    WHERE rn <= 5
    """


@query(
    "l35_ivf_index_query",
    # identical contract to l3c_ivf_ann: the oracle recomputes the whole
    # IVF pipeline inline; the Spark side reads ONLY the artifact
    oracle=_IVF_QUERY_ORACLE,
)
def l35_ivf_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-many half: ensure the artifact exists, then answer STRICTLY
    from it — tests/test_vector_index.py proves the assignment machinery
    is never invoked on this path (it is monkeypatched to raise). Recall
    is unchanged by construction: results hash-match l3c's contract."""
    index_dir = build_ivf_index(spark, sf_dir)
    return ivf_query_topk(spark, index_dir)


# --- SAI LSH bucket layout (cql17's persisted index) -------------------------


def build_lsh_bucket_index(
    spark: SparkSession,
    sf_dir: str,
    tname: str,
    col: str,
    index_dir: str | None = None,
    where: str | None = None,
) -> str:
    """The StorageAttachedIndex artifact for `CREATE CUSTOM INDEX ON
    t (vector_col)`: the table re-laid-out PARTITIONED BY the column's
    sign-LSH bucket. An `ANN OF` probe then reads ONLY its multiprobe
    buckets' partitions — static partition pruning, the Filter.db-style
    narrowing a real SAI performs — instead of recomputing the bucket
    hash over every corpus row per query. Built at index-DDL time (the
    reference builds SAI on CREATE INDEX too), keyed to the corpus
    fingerprint. ``where`` (SQL over the table's columns) restricts the
    indexed rows — the base half of an append scenario (cql41): bucket
    assignment is per-row and data-independent, so base + appended
    generations is bit-identical to a one-shot full build."""
    from cassandra_spark.operators.llm_vectors import N_PLANES, bucket_spark

    index_dir = index_dir or index_root(sf_dir, f"lsh_{col}", table=tname)
    if _committed(index_dir):
        return index_dir
    df = Catalog(spark, sf_dir).table(tname)
    if where:
        df = df.filter(F.expr(where))
    (
        layout_write(
            df.withColumn("__bucket", F.expr(bucket_spark(N_PLANES, col))),
            ["__bucket"],
        )
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(os.path.join(index_dir, "buckets"))
    )
    _commit(
        index_dir,
        {
            "kind": "lsh",
            "table": tname,
            "col": col,
            "planes": N_PLANES,
            "generations": [],
        },
    )
    return index_dir


def append_lsh_bucket_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    where: str,
    batch_id: str,
) -> bool:
    """Append new rows to a committed SAI LSH-bucket artifact — the last
    persisted index to gain the round-9 SSTable lifecycle (its siblings:
    MinHash l40, IVF l41, PQ l42). ONLY the batch is hashed and bucket-
    partitioned into ``buckets_g_<batch_id>`` (the indexed corpus is
    never re-bucketed — monkeypatch-asserted in
    tests/test_vector_index.py); the atomic manifest commit then makes
    the generation visible to every later `ANN OF` probe (cql.py reads
    the family, so partition pruning applies to base and generations
    alike). Idempotent on batch_id; returns False for a replay."""
    from cassandra_spark.operators.llm_vectors import bucket_spark

    if not _committed(index_dir):
        raise ValueError(f"no committed index at {index_dir}")
    if _has_generation(index_dir, batch_id):
        return False
    man = _manifest(index_dir)
    df = Catalog(spark, sf_dir).table(man["table"]).filter(F.expr(where))
    (
        layout_write(
            df.withColumn(
                "__bucket", F.expr(bucket_spark(man["planes"], man["col"]))
            ),
            ["__bucket"],
        )
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(os.path.join(index_dir, f"buckets_g_{batch_id}"))
    )
    _commit_generation(index_dir, batch_id)
    return True


# --- PQ: persisted codebook + code table -------------------------------------


def build_pq_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str | None = None,
    where: str | None = None,
) -> str:
    """Write the PQ artifact: ``codebook`` (m, cid, cvec) from l26's
    integer-exact one-round Lloyd training (the training collects happen
    here, once) and ``codes`` (vec_id, codes) from the Arrow-batched
    encoder. Queries read both tables and never train. ``where`` (SQL
    over vec_id) restricts BOTH the training set and the coded vectors —
    the base half of an append scenario (l42): appends encode with this
    frozen codebook, exactly the production contract (an append must
    never retrain — retraining is a rebuild)."""
    index_dir = index_dir or index_root(sf_dir, "pq")
    if _committed(index_dir):
        return index_dir
    cat = Catalog(spark, sf_dir)
    vecs = cat.embeddings.select(
        "vec_id", F.expr(_QV_SPARK_GRID).alias("qv")
    )
    if where:
        vecs = vecs.filter(F.expr(where))
    vecs = vecs.persist()
    books = _pq_train(vecs)
    rows = [
        (m, int(cid), [float(x) for x in cent[i]])
        for m, (cids, cent) in enumerate(books)
        for i, cid in enumerate(cids)
    ]
    spark.createDataFrame(
        rows, "m int, cid int, cvec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "codebook")
    )
    layout_write(
        vecs.select(
            "vec_id", _pq_code_udf(books)(F.col("qv")).alias("codes")
        ),
        [],
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "codes"))
    vecs.unpersist()
    _commit(index_dir, {"kind": "pq", "m": PQ_M, "generations": []})
    return index_dir


def append_pq_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    where: str,
    batch_id: str,
) -> bool:
    """Append new vectors to a committed PQ index: rehydrate the FROZEN
    codebook from the artifact (a bounded model-state read, never a
    training pass — monkeypatch-asserted in tests/test_vector_index.py),
    encode ONLY the batch, write ``codes_g_<id>``, commit the manifest.
    Idempotent on batch_id; returns False for a replay."""
    if not _committed(index_dir):
        raise ValueError(f"no committed index at {index_dir}")
    if _has_generation(index_dir, batch_id):
        return False
    books = _books_from_index(spark, index_dir)
    cat = Catalog(spark, sf_dir)
    batch = cat.embeddings.select(
        "vec_id", F.expr(_QV_SPARK_GRID).alias("qv")
    ).filter(F.expr(where))
    layout_write(
        batch.select(
            "vec_id", _pq_code_udf(books)(F.col("qv")).alias("codes")
        ),
        [],
    ).write.mode("overwrite").parquet(
        os.path.join(index_dir, f"codes_g_{batch_id}")
    )
    _commit_generation(index_dir, batch_id)
    return True


def _books_from_index(spark: SparkSession, index_dir: str):
    """Rehydrate [(cids, cent_matrix)] from the codebook TABLE — a
    bounded O(M·K·d) model-state read (the KMeansModel residency
    pattern), not a training pass."""
    import numpy as np

    rows = (
        spark.read.parquet(os.path.join(index_dir, "codebook"))
        .orderBy("m", "cid")
        .collect()
    )
    books = []
    for m in range(PQ_M):
        mine = [r for r in rows if r.m == m]
        cids = [int(r.cid) for r in mine]
        cent = np.array([r.cvec for r in mine], dtype=np.float64)
        books.append((cids, cent))
    return books


def pq_query_topk(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> DataFrame:
    """ADC + exact re-rank over the PERSISTED codebook/codes tables: the
    per-query LUTs derive from the codebook table, the shortlist from the
    map-only codes scan, and the re-rank joins the base table's exact
    vectors. No training happens here."""
    import numpy as np

    from cassandra_spark.operators.llm_vectors import _pq_fold_dist

    books = _books_from_index(spark, index_dir)
    coded = read_family(spark, index_dir, "codes")
    cat = Catalog(spark, sf_dir)
    vecs = cat.embeddings.select(
        "vec_id", F.expr(_QV_SPARK_GRID).alias("qv")
    )
    qrows = vecs.filter(F.col("vec_id") < PQ_NQ).orderBy("vec_id").collect()
    lut_rows = []
    for r in qrows:
        q = np.array(r.qv, dtype=np.float64)
        luts = []
        for m, (cids, cent) in enumerate(books):
            sub = q[None, m * PQ_SUB : (m + 1) * PQ_SUB]
            d = _pq_fold_dist(sub, cent)[0]
            full = [0.0] * max(max(cids) + 1, len(cids))
            for c, dv in zip(cids, d):
                full[c] = float(dv)
            luts.append(full)
        lut_rows.append((int(r.vec_id), *luts))
    qdf = F.broadcast(
        spark.createDataFrame(
            lut_rows,
            "query_id long, "
            + ", ".join(f"lut{m} array<double>" for m in range(PQ_M)),
        )
    )
    adist_col = None
    for m in range(PQ_M):
        term = F.col(f"lut{m}")[F.col("codes")[m]]
        adist_col = term if adist_col is None else adist_col + term
    adist = (
        coded.crossJoin(qdf)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", adist_col.alias("adist"))
    )
    wshort = Window.partitionBy("query_id").orderBy("adist", "vec_id")
    short = (
        adist.withColumn("srn", F.row_number().over(wshort))
        .filter(F.col("srn") <= PQ_SHORTLIST)
        .select("query_id", "vec_id", "adist")
    )
    qn2 = _unrolled_int_dot("qv", "qv")
    qa = vecs.filter(F.col("vec_id") < PQ_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qva"),
        qn2.alias("qna2"),
    )
    qb = vecs.select(
        F.col("vec_id").alias("vec_id"),
        F.col("qv").alias("qvb"),
        qn2.alias("qnb2"),
    )
    rer = (
        short.join(F.broadcast(qa), "query_id")
        .join(qb, "vec_id")
        .withColumn(
            "cosine",
            _unrolled_int_dot("qva", "qvb").cast("double")
            / (
                F.sqrt(F.col("qna2").cast("double"))
                * F.sqrt(F.col("qnb2").cast("double"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("query_id", "vec_id", "adist", "cosine", "rank")
    )


# the training CTEs of llm_vectors._pq_oracle, reused verbatim so the
# persisted codebook is checked against the exact same DuckDB algebra
def _pq_train_ctes() -> str:
    from cassandra_spark.operators.llm_vectors import (
        PQ_K,
        _pq_dist_duck,
        _QGRID_DUCK,
    )

    return f"""
    qv_t AS (
      SELECT vec_id, {_QGRID_DUCK} AS qv
      FROM embeddings
    ),
    subs AS (
      SELECT vec_id, m.m AS m,
             list_slice(qv, m.m * {PQ_SUB} + 1, (m.m + 1) * {PQ_SUB}) AS sv
      FROM qv_t CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) m
    ),
    cent0 AS (
      SELECT m, CAST(vec_id AS INTEGER) AS cid,
             list_transform(sv, x -> CAST(x AS DOUBLE)) AS cvec
      FROM subs WHERE vec_id < {PQ_K}
    ),
    a1p AS (
      SELECT s.vec_id, s.m,
             MIN({{'d': {_pq_dist_duck('s.sv', 'c.cvec')}, 'c': c.cid}}) AS mc
      FROM subs s JOIN cent0 c ON c.m = s.m
      GROUP BY s.vec_id, s.m
    ),
    a1 AS (SELECT vec_id, m, mc.c AS cl FROM a1p),
    sums AS (
      SELECT s.m, a.cl, p.pos, SUM(s.sv[p.pos]) AS sm, COUNT(*) AS n
      FROM a1 a JOIN subs s ON s.vec_id = a.vec_id AND s.m = a.m
      CROSS JOIN (SELECT unnest(range(1, {PQ_SUB} + 1)) AS pos) p
      GROUP BY s.m, a.cl, p.pos
    )
    """


@query(
    "l36_pq_index_build",
    oracle=f"""
    WITH {_pq_train_ctes()}
    SELECT CAST(m AS INTEGER) AS m, CAST(cl AS INTEGER) AS cid,
           CAST(pos - 1 AS INTEGER) AS pos,
           CAST(sm AS DOUBLE) / n AS comp
    FROM sums
    """,
)
def l36_pq_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once half of the persisted-PQ pair: run l26's integer-exact
    one-round Lloyd training, persist codebook + codes tables, then
    report the committed codebook COMPONENTS from the artifact — the
    oracle retrains from scratch in SQL, so equality proves the persisted
    codebook is bit-identical to inline training."""
    index_dir = build_pq_index(spark, sf_dir)
    return (
        spark.read.parquet(os.path.join(index_dir, "codebook"))
        .select("m", "cid", F.posexplode("cvec").alias("pos", "comp"))
        .select("m", "cid", F.col("pos").cast("int"), "comp")
    )


@query("l36_pq_index_query", oracle=_pq_oracle())
def l36_pq_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-many half: ADC + exact re-rank strictly from the persisted
    codebook/codes tables — the training path (_pq_train) is provably
    never invoked here (tests monkeypatch it to raise). Same oracle as
    l26_pq_ann: recall and exact values unchanged."""
    index_dir = build_pq_index(spark, sf_dir)
    return pq_query_topk(spark, sf_dir, index_dir)


# --- round-9: incremental append for the ANN indexes -------------------------

# ~1/7th of vectors arrive "later" in the append scenarios; everything
# else is the base build. vec_id-hash keeps the split deterministic.
_APPEND_SPLIT_NEW = "vec_id % 7 = 3"
_APPEND_SPLIT_BASE = "vec_id % 7 <> 3"


@query(
    "l41_ivf_index_append",
    # SAME oracle as l35_ivf_index_query: base build (6/7 of vectors) +
    # appended generation (1/7) must answer exactly like the one-shot
    # full build — assignment is against the same data-independent
    # centroid table either way.
    oracle=_IVF_QUERY_ORACLE,
)
def l41_ivf_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-append half of the persisted IVF pair (the SSTable
    pattern, round-9): build the base inverted file over vec_id % 7 <> 3,
    APPEND the remaining vectors as a committed bucket-partitioned
    generation (only the batch is assigned — the indexed corpus is never
    re-assigned, monkeypatch-asserted in tests/test_vector_index.py),
    then answer the standard top-k probe from base + generation. Runs
    against a CLONE of the cached base artifact so bench re-runs never
    see a previous run's generations."""
    import tempfile

    base = build_ivf_index(
        spark,
        sf_dir,
        index_root(sf_dir, "ivf_base7"),
        where=_APPEND_SPLIT_BASE,
    )
    work = clone_index(base, tempfile.mkdtemp(prefix="l41_idx_"))
    append_ivf_index(spark, sf_dir, work, _APPEND_SPLIT_NEW, "b1")
    return ivf_query_topk(spark, work)


@query(
    "l42_pq_index_append",
    # the PQ oracle with training RESTRICTED to the base split — the
    # frozen-codebook contract: an append encodes with the committed
    # codebook and never retrains (retraining is a rebuild). Codes, ADC
    # and the exact re-rank still cover every vector.
    oracle=_pq_oracle(train_where=_APPEND_SPLIT_BASE),
)
def l42_pq_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-append half of the persisted PQ pair: build codebook
    + codes over vec_id % 7 <> 3, APPEND the remaining vectors encoded
    with the FROZEN codebook (a bounded model-state read — training is
    provably never invoked on the append path), then ADC + re-rank over
    base + generation codes. The oracle trains on the base split only
    and codes everything, so equality pins both halves of the frozen-
    codebook contract."""
    import tempfile

    base = build_pq_index(
        spark,
        sf_dir,
        index_root(sf_dir, "pq_base7"),
        where=_APPEND_SPLIT_BASE,
    )
    work = clone_index(base, tempfile.mkdtemp(prefix="l42_idx_"))
    append_pq_index(spark, sf_dir, work, _APPEND_SPLIT_NEW, "b1")
    return pq_query_topk(spark, sf_dir, work)


@query(
    "l44_ivf_index_compact",
    # SAME oracle a third time (l35_query ≡ l41 ≡ this): the folded
    # artifact must answer exactly like the one-shot build — equality
    # proves compaction changed the postings LAYOUT and nothing else.
    oracle=_IVF_QUERY_ORACLE,
)
def l44_ivf_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation compaction for the persisted IVF index (completing the
    SSTable lifecycle on the vector side, mirroring l43's minhash fold):
    base (6/7 of vectors) + appended generation (1/7) are FOLDED by
    compact_index into one bucket-partitioned postings segment — probe
    cost back to a single partition-pruned read while appends stayed
    O(batch) — and the standard top-k probe then answers from the folded
    artifact. Folded batch ids keep replay protection (re-appending an
    absorbed batch is a no-op, pinned in tests/test_vector_index.py)."""
    import tempfile

    base = build_ivf_index(
        spark,
        sf_dir,
        index_root(sf_dir, "ivf_base7"),
        where=_APPEND_SPLIT_BASE,
    )
    work = clone_index(base, tempfile.mkdtemp(prefix="l44_idx_"))
    append_ivf_index(spark, sf_dir, work, _APPEND_SPLIT_NEW, "b1")
    assert compact_index(spark, work)
    return ivf_query_topk(spark, work)


@query(
    "l45_pq_index_compact",
    # l42's frozen-codebook oracle verbatim: the fold rewrites the codes
    # table only — the committed codebook is untouched (it is model
    # state, not a generation family), so ADC + re-rank answers are
    # bit-identical to the uncompacted append layout.
    oracle=_pq_oracle(train_where=_APPEND_SPLIT_BASE),
)
def l45_pq_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation compaction for the persisted PQ index: after the
    frozen-codebook append (l42), compact_index folds base + generation
    code segments into one codes table; the codebook family is NOT part
    of the fold (FAMILY_LAYOUT lists only ``codes``) because it is
    committed model state shared by every segment. Same oracle as l42
    pins both: answers unchanged, training never re-invoked."""
    import tempfile

    base = build_pq_index(
        spark,
        sf_dir,
        index_root(sf_dir, "pq_base7"),
        where=_APPEND_SPLIT_BASE,
    )
    work = clone_index(base, tempfile.mkdtemp(prefix="l45_idx_"))
    append_pq_index(spark, sf_dir, work, _APPEND_SPLIT_NEW, "b1")
    assert compact_index(spark, work)
    return pq_query_topk(spark, sf_dir, work)
