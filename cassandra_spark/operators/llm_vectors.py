"""L-tier vector operators: brute-force cosine top-k (L3), LSH-bucketed ANN
(L3b — the 100 TB path), embedding-cosine near-dup (L2d). SURVEY.md §2.12.

Float determinism: DuckDB and Spark must produce bit-identical cosines, so
every dot product is a LEFT FOLD in index order over float32 values cast to
double BEFORE multiplying — same operation sequence on both engines, no
reassociation. (A groupBy-sum over exploded elements would sum in partition
order and never match.)

Scale posture: the query side is always the broadcast side (k query vectors
vs N corpus vectors — never corpus×corpus). L3b prunes candidates with a
random-hyperplane LSH bucket before scoring: integer pseudo-random planes
(deterministic, engine-portable), bucket equi-join, cosine only within the
bucket. At 10⁹ vectors the same plan holds with more planes + multiprobe;
an IVF coarse quantizer is the same shape with learned centroids.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query

# --- portable fold-based vector math ---------------------------------------


def dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(sequence(0, size({a}) - 1), 0D, "
        f"(acc, i) -> acc + cast({a}[i] AS double) * cast({b}[i] AS double))"
    )


def dot_duck(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )


NORM_SPARK = f"sqrt({dot_spark('embedding', 'embedding')})"
NORM_DUCK = f"sqrt({dot_duck('embedding', 'embedding')})"

# LSH: 4 integer pseudo-random hyperplanes (16 buckets on this corpus).
# w[p][j] = ((p*1103515245 + j*12345 + 12345) % 2048) - 1024, j 0-based.
N_PLANES = 4


def _plane_dot_spark(p: str, vec: str = "embedding") -> str:
    return (
        f"aggregate(sequence(0, size({vec}) - 1), 0D, (acc, j) -> acc + "
        f"cast((({p} * 1103515245L + j * 12345L + 12345L) % 2048L) - 1024L "
        f"AS double) * cast({vec}[j] AS double))"
    )


def bucket_spark(n_planes: int, vec: str = "embedding") -> str:
    return (
        f"aggregate(sequence(0, {n_planes - 1}), 0L, (acc, p) -> acc + "
        f"(CASE WHEN ({_plane_dot_spark('p', vec)}) > 0D "
        f"THEN shiftleft(1L, p) ELSE 0L END))"
    )


def py_bucket(vec: list[float], n_planes: int = N_PLANES) -> int:
    """The same LSH bucket, computed driver-side for a LITERAL query
    vector (the SAI-routed ANN path computes the probe set at plan time —
    no corpus work for the query side). Bit-for-bit the weights of
    :func:`_plane_dot_spark`."""
    b = 0
    for p in range(n_planes):
        dot = sum(
            (((p * 1103515245 + j * 12345 + 12345) % 2048) - 1024) * float(v)
            for j, v in enumerate(vec)
        )
        if dot > 0.0:
            b |= 1 << p
    return b


def multiprobe(bucket: int, n_planes: int = N_PLANES) -> list[int]:
    """Hamming-1 probe set: the bucket itself plus every one-bit flip."""
    return [bucket] + [bucket ^ (1 << p) for p in range(n_planes)]


BUCKET_SPARK = bucket_spark(N_PLANES)


def _plane_dot_duck(p: str) -> str:
    # j is 1-based in DuckDB lists; (j-1) matches Spark's 0-based weights
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, len(embedding) + 1), j -> "
        f"CAST((({p} * 1103515245 + (j - 1) * 12345 + 12345) % 2048) - 1024 "
        f"AS DOUBLE) * CAST(embedding[j] AS DOUBLE))), (x, y) -> x + y)"
    )


def bucket_duck(n_planes: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(0, {n_planes}), p -> "
        f"CASE WHEN ({_plane_dot_duck('p')}) > 0 THEN (1::BIGINT << p) "
        f"ELSE 0::BIGINT END)), (a, b) -> a + b)"
    )


BUCKET_DUCK = bucket_duck(N_PLANES)

_NORMED_DUCK = f"""
  normed AS (
    SELECT vec_id, label, embedding, {NORM_DUCK} AS nrm
    FROM embeddings
  )
"""


def _normed(cat: Catalog) -> DataFrame:
    """vec_id, label, embedding, nrm — persisted: the fold expression must
    not be re-inlined into every downstream branch (see llm_dedup note)."""
    return (
        cat.embeddings.withColumn("nrm", F.expr(NORM_SPARK)).persist()
    )


@query(
    "l3_cosine_topk",
    oracle=f"""
    WITH {_NORMED_DUCK},
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {dot_duck('q.embedding', 'c.embedding')} / (q.nrm * c.nrm)
               AS cosine
      FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 5
    )
    SELECT query_id, vec_id, cosine, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
          FROM pairs)
    WHERE rn <= 10
    """,
)
def l3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors: the exact baseline.
    Query side broadcast; corpus side scanned once, scored in place,
    TakeOrdered per query. Linear in corpus size — the right baseline even
    at 100 TB when k·|queries| is small."""
    cat = Catalog(spark, sf_dir)
    normed = _normed(cat)
    q = normed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = (
        normed.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.expr(dot_spark("qv", "embedding")) / (F.col("qn") * F.col("nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", "cosine", "rank")
    )


@query(
    "l3b_lsh_ann",
    oracle=f"""
    WITH {_NORMED_DUCK},
    bucketed AS (
      SELECT vec_id, embedding, nrm, {BUCKET_DUCK} AS bucket FROM normed
    ),
    probes AS (
      SELECT vec_id, embedding, nrm,
             CASE WHEN k.k = -1 THEN bucket
                  ELSE xor(bucket, 1::BIGINT << k.k) END AS probe
      FROM bucketed
      CROSS JOIN (VALUES (-1), (0), (1), (2), (3)) k(k)
      WHERE vec_id < 5
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS vec_id
      FROM probes p JOIN bucketed c
        ON c.bucket = p.probe AND c.vec_id <> p.vec_id
    ),
    pairs AS (
      SELECT query_id, cand.vec_id,
             {dot_duck('q.embedding', 'c.embedding')} / (q.nrm * c.nrm)
               AS cosine
      FROM cand
      JOIN bucketed q ON q.vec_id = cand.query_id
      JOIN bucketed c ON c.vec_id = cand.vec_id
    )
    SELECT query_id, vec_id, cosine, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
          FROM pairs)
    WHERE rn <= 5
    """,
)
def l3b_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN, the scale path: random-hyperplane LSH with Hamming-1 multiprobe
    — each query probes its own bucket plus the 4 one-bit-flip neighbors
    (recall ≈ P(≤1 plane disagrees) instead of P(all agree)), candidates
    come from a bucket equi-join, and cosine is computed only for
    candidates. Recall vs the exact l3 baseline is asserted in tests.
    At 10⁹ vectors: more planes + wider multiprobe, same plan shape."""
    cat = Catalog(spark, sf_dir)
    bucketed = (
        _normed(cat).withColumn("bucket", F.expr(BUCKET_SPARK)).persist()
    )
    probe = F.when(F.col("k") == -1, F.col("qbucket")).otherwise(
        F.expr("qbucket ^ shiftleft(1L, k)")
    )
    q = (
        bucketed.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("bucket").alias("qbucket"),
        )
        .crossJoin(
            F.broadcast(
                cat.embeddings.sparkSession.range(-1, N_PLANES).select(
                    F.col("id").cast("int").alias("k")
                )
            )
        )
        .select("query_id", "qv", "qn", probe.alias("probe"))
    )
    pairs = (
        bucketed.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", "qv", "qn", "embedding", "nrm")
        .distinct()
        .withColumn(
            "cosine",
            F.expr(dot_spark("qv", "embedding")) / (F.col("qn") * F.col("nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# IVF: 8 deterministic pseudo-random centroids (stand-ins for k-means
# centroids, which would be fit offline at 100 TB and broadcast the same
# way). w[j][d] = ((j*7919 + d*104729 + 12345) % 2048) - 1024, d 0-based.
N_CENTROIDS = 8


def _centroid_dot_spark(j: str, vec: str = "embedding") -> str:
    return (
        f"aggregate(sequence(0, size({vec}) - 1), 0D, (acc, d) -> acc + "
        f"cast((({j} * 7919L + d * 104729L + 12345L) % 2048L) - 1024L "
        f"AS double) * cast({vec}[d] AS double))"
    )


def _centroid_dot_duck(j: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, len(embedding) + 1), d -> "
        f"CAST((({j} * 7919 + (d - 1) * 104729 + 12345) % 2048) - 1024 "
        f"AS DOUBLE) * CAST(embedding[d] AS DOUBLE))), (x, y) -> x + y)"
    )


# argmax over centroids with deterministic smallest-j tie-break.
# NOT a nested aggregate-in-aggregate lambda: inlining the 64-dim dot
# twice inside an 8-step fold made Catalyst/codegen blow up (>13 min to
# plan two tests). Instead: 8 independent flat fold dot-products packed
# into struct(s, nj) and compared by array_max's lexicographic struct
# ordering — equal s → max nj → smallest j. One codegen stage, no shuffle.
def _assign_bucket_col(vec: str = "embedding"):
    return (
        -F.array_max(
            F.array(
                *[
                    F.struct(
                        F.expr(_centroid_dot_spark(str(j), vec)).alias("s"),
                        F.lit(-j).alias("nj"),
                    )
                    for j in range(N_CENTROIDS)
                ]
            )
        )["nj"]
    ).cast("int")


ASSIGN_DUCK = (
    f"list_reduce(list_prepend(struct_pack(s := CAST(-1e308 AS DOUBLE), "
    f"j := -1), list_transform(range(0, {N_CENTROIDS}), j -> "
    f"struct_pack(s := {_centroid_dot_duck('j')}, j := j))), "
    f"(acc, x) -> CASE WHEN x.s > acc.s THEN x ELSE acc END).j"
)


@query(
    "l3c_ivf_ann",
    oracle=f"""
    WITH {_NORMED_DUCK},
    assigned AS (
      SELECT vec_id, embedding, nrm, {ASSIGN_DUCK} AS bucket FROM normed
    ),
    qdots AS (
      SELECT q.vec_id AS query_id, q.embedding, q.nrm, j.j AS cj,
             {_centroid_dot_duck('j.j')} AS cdot
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
    """,
)
def l3c_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF coarse quantization — the learned-partition scale path
    (same plan shape as a real IVF index: assign once at write time, probe
    nprobe=2 cells at query time, score only candidates). Centroids here
    are deterministic pseudo-random stand-ins so the DuckDB oracle can
    verify assignment + probing + scoring exactly; swap in k-means
    centroids (broadcast) and nothing else changes. At 10⁹ vectors:
    √N centroids, nprobe 8-32, same three joins. This entry documents
    the INLINE pipeline cost; the build-once/query-many form (persisted
    centroid table + bucket-partitioned inverted file) is
    operators/vector_index.py (l35_ivf_index_build/_query)."""
    cat = Catalog(spark, sf_dir)
    assigned = (
        _normed(cat)
        .withColumn("bucket", _assign_bucket_col())
        .persist()
    )
    centroids = cat.embeddings.sparkSession.range(N_CENTROIDS).select(
        F.col("id").cast("int").alias("cj")
    )
    qdots = (
        assigned.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        .crossJoin(F.broadcast(centroids))
        .withColumn("cdot", F.expr(_centroid_dot_spark("cj", vec="qv")))
    )
    wprobe = Window.partitionBy("query_id").orderBy(F.desc("cdot"), "cj")
    probes = (
        qdots.withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= 2)
        .select("query_id", "qv", "qn", "cj")
    )
    pairs = (
        assigned.join(
            F.broadcast(probes),
            (F.col("bucket") == F.col("cj"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine",
            F.expr(dot_spark("qv", "embedding")) / (F.col("qn") * F.col("nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# l2d uses a finer partition than l3b: 10 planes → 1024 buckets, so the
# all-pairs candidate space stays Σ bucket² with small buckets. Hamming-1
# multiprobe compensates the recall lost to the extra planes (identical
# embeddings always share a bucket, so exact dups have recall 1).
#
# The plane count is the ONE scale knob: with buckets fixed, N vectors into
# 2^planes buckets means Σ bucket² grows quadratically in N (measured in the
# scale-stress harness: 10× corpus → ~5.8× runtime at fixed 10 planes).
# Production sizing holds avg bucket occupancy ~constant: planes ≈
# log2(N / target_bucket_size). Both configs below are registered and
# oracle-checked; the _prod variant demonstrates the knob.
ND_PLANES = 10
ND_PLANES_PROD = 14  # 16384 buckets — sized for the 10× stress corpus


def planes_for_corpus(n_vectors: int, target_occupancy: float = 1.5) -> int:
    """Occupancy-constant plane sizing: planes ≈ log2(N / target), clamped
    to [8, 30]. Holding average bucket occupancy constant keeps the
    Σ bucket² candidate cost linear in N — the knob a real deployment turns
    as the corpus grows (the fixed-plane config is diagnostic-only)."""
    import math

    if n_vectors < 1:
        return 8
    return max(8, min(30, round(math.log2(max(n_vectors / target_occupancy, 2.0)))))


def _embedding_neardup_oracle(planes: int) -> str:
    probe_values = ", ".join(f"({k})" for k in range(-1, planes))
    return f"""
    WITH {_NORMED_DUCK},
    bucketed AS (
      SELECT vec_id, embedding, nrm, {bucket_duck(planes)} AS bucket
      FROM normed
    ),
    probes AS (
      SELECT vec_id,
             CASE WHEN k.k = -1 THEN bucket
                  ELSE xor(bucket, 1::BIGINT << k.k) END AS probe
      FROM bucketed
      CROSS JOIN (VALUES {probe_values}) k(k)
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS vec_a, c.vec_id AS vec_b
      FROM probes p JOIN bucketed c
        ON c.bucket = p.probe AND p.vec_id < c.vec_id
    ),
    pairs AS (
      SELECT vec_a, vec_b,
             {dot_duck('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)
               AS cosine
      FROM cand
      JOIN bucketed a ON a.vec_id = vec_a
      JOIN bucketed b ON b.vec_id = vec_b
    )
    SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.35
    """


def embedding_neardup(
    spark: SparkSession, sf_dir: str, planes: int = ND_PLANES
) -> DataFrame:
    """Embedding-cosine near-dup: pairs whose LSH buckets are within
    Hamming distance 1 and whose exact cosine is ≥ 0.35.

    The blocking key is the same random-hyperplane LSH bucket family l3b
    uses for ANN (``planes`` hyperplanes → 2^planes buckets — all-pairs
    needs a finer partition than 5-query ANN), with Hamming-1 multiprobe:
    every vector probes its own bucket plus the one-bit flips, so pairs
    split across adjacent buckets are still candidates. Candidates come
    from a bucket equi-join; exact cosine runs on candidates only. Pair
    cost is Σ bucket², never corpus² — at 10⁹ vectors raise ``planes``
    (keep N / 2^planes ~constant) and widen multiprobe, same plan shape."""
    cat = Catalog(spark, sf_dir)
    # persist: bucketed feeds the probe explode and both verify legs (same
    # barrier rationale as l3b — fingerprints land in a table at 100 TB).
    bucketed = (
        _normed(cat)
        .withColumn("bucket", F.expr(bucket_spark(planes)))
        .persist()
    )
    probe = F.when(F.col("k") == -1, F.col("abucket")).otherwise(
        F.expr("abucket ^ shiftleft(1L, k)")
    )
    probes = (
        bucketed.select(
            F.col("vec_id").alias("vec_a"), F.col("bucket").alias("abucket")
        )
        .crossJoin(
            F.broadcast(
                cat.embeddings.sparkSession.range(-1, planes).select(
                    F.col("id").cast("int").alias("k")
                )
            )
        )
        .select("vec_a", probe.alias("probe"))
    )
    cand = (
        probes.join(
            bucketed.select(
                F.col("vec_id").alias("vec_b"), F.col("bucket").alias("bbucket")
            ),
            (F.col("bbucket") == F.col("probe"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b")
        .distinct()
    )
    return (
        cand.join(
            bucketed.select(
                F.col("vec_id").alias("vec_a"),
                F.col("embedding").alias("ea"),
                F.col("nrm").alias("na"),
            ),
            "vec_a",
        )
        .join(
            bucketed.select(
                F.col("vec_id").alias("vec_b"),
                F.col("embedding").alias("eb"),
                F.col("nrm").alias("nb"),
            ),
            "vec_b",
        )
        .withColumn(
            "cosine",
            F.expr(dot_spark("ea", "eb")) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cosine") >= 0.35)
        .select("vec_a", "vec_b", "cosine")
    )


@query(
    "l2d_embedding_neardup",
    oracle=_embedding_neardup_oracle(ND_PLANES),
    diagnostic=True,
)
def l2d_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-scale config: 10 planes (1024 buckets). Registered
    ``diagnostic=True`` — with buckets FIXED, Σ bucket² grows quadratically
    in corpus size (measured 8.1× runtime at 10× data in SCALE_STRESS).
    The scale path is :func:`l2d_embedding_neardup_prod`, whose plane count
    follows the occupancy-constant rule (:func:`planes_for_corpus`). See
    :func:`embedding_neardup`."""
    return embedding_neardup(spark, sf_dir, ND_PLANES)


# --- quantized vectorized prod path ----------------------------------------
#
# The fold-based plan above is exact but INTERPRETED: Catalyst evaluates
# higher-order `aggregate` lambdas element-by-element, so the bucket costs
# planes×dim lambda steps per vector and the verify costs dim steps per
# candidate pair. Round-5 stress measured the fold-based prod variant at
# 202 s for the 100× corpus (200k×64-d) — ~70× growth that is pure
# expression-interpreter overhead, not plan shape. The production variant
# below moves both hot kernels to Arrow-batched numpy (the same
# "vectorized pandas_udf when Catalyst can't express it efficiently"
# contract as the Murmur3 ring primitive, operators/murmur3.py) and makes
# them INTEGER-exact so the DuckDB oracle still matches bit-for-bit:
#
# - embeddings are quantized to the 2^-20 grid: q[j] = floor(v*2^20 + 0.5)
#   as int64. float32→float64 is exact, ×2^20 scales the exponent (exact),
#   +0.5/floor are deterministic IEEE — numpy and DuckDB agree on every
#   bit. |v| < 1 in this corpus ⇒ |q| < 2^20, so 64-dim dot products stay
#   under 2^46: exact in int64 AND exactly representable in float64.
# - plane dots / bucket bits are then pure int64 matmul (numpy `Q @ W.T`),
#   and the verify cosine is int64 dot / (sqrt·sqrt) with one final
#   correctly-rounded double division — bit-identical cross-engine.
QSCALE = 1 << 20


def _plane_weight_matrix(n_planes: int, dim: int):
    """The SAME pseudo-random plane family as `_plane_dot_spark`
    (w[p][j] = ((p*1103515245 + j*12345 + 12345) % 2048) - 1024) as an
    int64 numpy (planes, dim) matrix."""
    import numpy as np

    p = np.arange(n_planes, dtype=np.int64)[:, None]
    j = np.arange(dim, dtype=np.int64)[None, :]
    return ((p * 1103515245 + j * 12345 + 12345) % 2048) - 1024


def _quantize(mat):
    """float64 (n, dim) → int64 on the 2^-20 grid; floor(x+0.5) is
    round-half-up, matching the oracle's floor(... + 0.5) exactly."""
    import numpy as np

    return np.floor(mat * float(QSCALE) + 0.5).astype(np.int64)


def _qbucket_udf(planes: int):
    """Arrow-batched LSH bucket: int64 matmul against the plane matrix,
    sign bits packed little-endian — one numpy call per ~10k-row batch
    instead of planes×dim interpreted lambda steps per row."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def qbucket(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        Q = _quantize(np.array(emb.tolist(), dtype=np.float64))
        W = _plane_weight_matrix(planes, Q.shape[1])
        bits = (Q @ W.T > 0).astype(np.int64) << np.arange(
            planes, dtype=np.int64
        )
        return pd.Series(bits.sum(axis=1))

    return qbucket


def _qcosine_udf():
    """Arrow-batched quantized cosine: int64 dot products (exact), one
    final double divide (correctly-rounded IEEE on both engines)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def qcos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = _quantize(np.array(a.tolist(), dtype=np.float64))
        B = _quantize(np.array(b.tolist(), dtype=np.float64))
        num = (A * B).sum(axis=1).astype(np.float64)
        na = np.sqrt((A * A).sum(axis=1).astype(np.float64))
        nb = np.sqrt((B * B).sum(axis=1).astype(np.float64))
        return pd.Series(num / (na * nb))

    return qcos


_QGRID_DUCK = (
    "list_transform(embedding, v -> "
    f"CAST(floor(CAST(v AS DOUBLE) * {float(QSCALE)!r} + 0.5) AS BIGINT))"
)


def _qdot_duck(a: str, b: str) -> str:
    """Integer dot over two quantized BIGINT lists — order-free (exact)."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, len({a}) + 1), j -> {a}[j] * {b}[j])), "
        f"(x, y) -> x + y)"
    )


def _qbucket_duck(planes: int) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(0, {planes}), p -> "
        f"CASE WHEN list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, len(qv) + 1), j -> "
        f"(((p * 1103515245 + (j - 1) * 12345 + 12345) % 2048) - 1024) "
        f"* qv[j])), (x, y) -> x + y) > 0 "
        f"THEN (1::BIGINT << p) ELSE 0::BIGINT END)), (a, b) -> a + b)"
    )


def _q_neardup_oracle(planes: int) -> str:
    probe_values = ", ".join(f"({k})" for k in range(-1, planes))
    return f"""
    WITH q AS (
      SELECT vec_id, {_QGRID_DUCK} AS qv FROM embeddings
    ),
    bucketed AS (
      SELECT vec_id, qv, {_qbucket_duck(planes)} AS bucket FROM q
    ),
    probes AS (
      SELECT vec_id,
             CASE WHEN k.k = -1 THEN bucket
                  ELSE xor(bucket, 1::BIGINT << k.k) END AS probe
      FROM bucketed
      CROSS JOIN (VALUES {probe_values}) k(k)
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS vec_a, c.vec_id AS vec_b
      FROM probes p JOIN bucketed c
        ON c.bucket = p.probe AND p.vec_id < c.vec_id
    ),
    pairs AS (
      SELECT vec_a, vec_b,
             CAST({_qdot_duck('a.qv', 'b.qv')} AS DOUBLE)
               / (sqrt(CAST({_qdot_duck('a.qv', 'a.qv')} AS DOUBLE))
                  * sqrt(CAST({_qdot_duck('b.qv', 'b.qv')} AS DOUBLE)))
               AS cosine
      FROM cand
      JOIN q a ON a.vec_id = vec_a
      JOIN q b ON b.vec_id = vec_b
    )
    SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.35
    """


@query(
    "l2d_embedding_neardup_lsh",
    # the oracle mirrors the sf0.01 instantiation (500 vectors) — the one
    # scale the driver's correctness gate runs at; at other scales the
    # Spark side re-derives planes from the actual corpus
    oracle=_q_neardup_oracle(planes_for_corpus(500)),
    diagnostic=True,
)
def l2d_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH near-dup with occupancy-adaptive plane count and both hot
    kernels — bucket assignment and candidate cosine — as Arrow-batched
    int64 numpy (see the QSCALE block comment; this variant is what
    retired the interpreted fold kernels measured at 202 s on the 100×
    corpus). Registered ``diagnostic=True`` after round-5 measurement:

    - **recall**: at the 0.35 verification threshold a single-band
      Hamming-1 hyperplane sketch surfaces only ~11% of true pairs
      (measured against the brute-force ground truth at sf0.1) — the
      per-plane agreement gap between a 0.35 pair and a typical 0.2
      pair is just 0.61 vs 0.56, too thin for any (bands, rows) choice
      to separate (banded variants measured: 67% recall cost 33×10⁹
      candidates). Sign-LSH is the right tool ABOVE ~0.8 cosine.
    - **skew**: direction-clustered corpora stack Σ bucket² far above
      the occupancy-rule estimate (measured 51M pairs for 200k vectors
      even with a well-mixed plane family).

    The production path is :func:`l2d_embedding_neardup_prod`, which
    blocks by the engine's own learned IVF cells instead (measured ~4×
    the recall at linear candidate mass). Cosine here is over the
    2^-20-quantized grid (|Δ| < 4e-6 vs float)."""
    cat = Catalog(spark, sf_dir)
    planes = planes_for_corpus(cat.embeddings.count())
    bucketed = (
        cat.embeddings.select("vec_id", "embedding")
        .withColumn("bucket", _qbucket_udf(planes)(F.col("embedding")))
        .persist()
    )
    probe = F.when(F.col("k") == -1, F.col("abucket")).otherwise(
        F.expr("abucket ^ shiftleft(1L, k)")
    )
    probes = (
        bucketed.select(
            F.col("vec_id").alias("vec_a"), F.col("bucket").alias("abucket")
        )
        .crossJoin(
            F.broadcast(
                spark.range(-1, planes).select(
                    F.col("id").cast("int").alias("k")
                )
            )
        )
        .select("vec_a", probe.alias("probe"))
    )
    cand = (
        probes.join(
            bucketed.select(
                F.col("vec_id").alias("vec_b"), F.col("bucket").alias("bbucket")
            ),
            (F.col("bbucket") == F.col("probe"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b")
        .distinct()
    )
    qcos = _qcosine_udf()
    return (
        cand.join(
            bucketed.select(
                F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
            ),
            "vec_a",
        )
        .join(
            bucketed.select(
                F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
            ),
            "vec_b",
        )
        .withColumn("cosine", qcos(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= 0.35)
        .select("vec_a", "vec_b", "cosine")
    )


# --- IVF-blocked near-dup: the production path ------------------------------
#
# Round-5 measurement on the 100× corpus killed BOTH data-independent
# blocking families for this operator's 0.35 contract (see the _lsh
# docstring: 11% recall / quadratic skew single-band; 33×10⁹ candidates
# for 67% recall banded). What does work on direction-clustered data is
# the engine's own LEARNED coarse quantizer — the same integer-exact
# k-means contract as l18/l3c, used as the blocking key:
#
#   - cells sized to a constant ND_CELL_TARGET occupancy (K = ceil(N/64)
#     cells), so candidate mass is Σ (nprobe·cell)² ≈ N·64·nprobe² —
#     LINEAR in N by construction, and k-means cells track the corpus's
#     real direction clusters instead of fighting them;
#   - SYMMETRIC shared-probe blocking (round-6): every vector ships to
#     its ND_NPROBE nearest cells and a pair is a candidate iff it
#     shares ANY probed cell. Round 5's asymmetric home-in-probes rule
#     measured recall 0.36 at nprobe=2; the sf0.1 sweep against
#     brute-force ground truth (tools/ivf_recall.py) reads:
#       nprobe=2 sym 0.42 | 4 sym 0.81 | 5 sym 0.92 | 6 sym 0.97 | 8 ~0.99
#     at candidate mass 126N/503N/786N/1132N/~2000N. On the 100× corpus
#     (K grows ∝ N at constant occupancy, so cells get geometrically
#     finer) recall stratifies by similarity band — nprobe=8 measures
#     0.90 on pairs ≥0.7 cosine (true near-dups), 0.51 on 0.5–0.7,
#     0.26 on the 0.35–0.5 tail. That tail is irreducible at linear
#     candidates: the corpus's 0.35-threshold truth itself grows ~N²
#     (the amplifier's cross-replica cosine is a random-sign sum with
#     σ≈1/√64, so ~0.26% of ALL pairs graze the threshold), so ANY
#     sub-quadratic blocking loses it. nprobe=8 is the shipped point:
#     base recall ~0.99, scale near-dup-band recall 0.90, mass linear;
#   - the verify stage is the quantized integer cosine (bit-exact).
#
# Assignment is Arrow-batched numpy with PER-DIMENSION sequential
# accumulation — vectorize across rows, fold across dims — so every
# distance matches the oracle's list_reduce fold bit-for-bit. Centroids
# are O(K·d) model state collected to the driver and shipped in the UDF
# closure (the same residency MLlib's KMeansModel has; corpus data is
# never collected). At 10⁹+ vectors K grows linearly at constant cell
# size — beyond driver comfort, train hierarchically (coarse cells →
# per-cell sub-k-means), same plan shape.

ND_CELL_TARGET = 64
ND_NPROBE = 8
ND_SEED_SF001 = 8  # ceil(500 / 64) — the oracle's sf0.01 pin


def _nd_k_for(n: int) -> int:
    return max(1, -(-n // ND_CELL_TARGET))


def _unrolled_int_dot(a: str, b: str, dim: int = 64):
    """64-term int64 multiply-add chain as ONE codegen expression (array
    element access + arithmetic — no higher-order functions)."""
    d = None
    for i in range(dim):
        t = F.col(a)[i] * F.col(b)[i]
        d = t if d is None else d + t
    return d


# BLAS screening margin: the expansion |x|²-2x·c+|c|² loses ≲1e4 absolute
# to cancellation at this grid's magnitudes (terms ~2.4e13, ulp·ops ≈ 5e2);
# 1e6 is >> that bound yet ≪ typical inter-cell gaps (~1e10), so the
# screened set provably contains the exact top-ND_NPROBE cells and stays
# a handful of cells per vector.
_IVF_BLAS_MARGIN = 1.0e6


def _ivf_probe_udf(cids, cents):
    """probes(embedding) -> array<int> of the ND_NPROBE nearest cell ids
    by the EXACT sequential-fold distance (ties by lowest cid).

    Two-phase: a BLAS pass (|x|²-2x·c+|c|², reassociated — 40× faster
    than folding, measured 409 s → 10 s per pass on the 100× corpus)
    screens each vector to the cells within _IVF_BLAS_MARGIN of its
    ND_NPROBE-th smallest approximate distance — a guaranteed superset
    of the exact winners — then only those (vector, cell) pairs are
    re-scored with the oracle's exact dim-ordered fold. Bit-exact result
    at BLAS speed. ``cents`` is a (K, dim) float64 matrix sorted by cid."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cid_arr = np.asarray(cids, dtype=np.int64)
    cent_arr = np.asarray(cents, dtype=np.float64)
    nprobe = min(ND_NPROBE, cent_arr.shape[0])
    cc = (cent_arr * cent_arr).sum(axis=1)

    @pandas_udf("array<int>")
    def probes(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        Q = _quantize(np.array(emb.tolist(), dtype=np.float64)).astype(
            np.float64
        )
        n = len(Q)
        xx = (Q * Q).sum(axis=1)
        Db = xx[:, None] - 2.0 * (Q @ cent_arr.T) + cc[None, :]
        kth = np.partition(Db, nprobe - 1, axis=1)[:, nprobe - 1]
        rows, cols = np.nonzero(Db <= (kth[:, None] + _IVF_BLAS_MARGIN))
        # exact fold distance for the screened (vector, cell) pairs only
        d = np.zeros(len(rows))
        qa, ca = Q[rows], cent_arr[cols]
        for i in range(Q.shape[1]):  # dim-ordered: the oracle's fold
            t = qa[:, i] - ca[:, i]
            d += t * t
        # per-row exact (d, cid) ranking -> first nprobe cells
        order = np.lexsort((cid_arr[cols], d, rows))
        r_sorted = rows[order]
        first_idx = np.searchsorted(r_sorted, np.arange(n), side="left")
        out = []
        for r in range(n):
            s = first_idx[r]
            out.append([int(cid_arr[cols[order[s + j]]]) for j in range(nprobe)])
        return pd.Series(out)

    return probes


def _ivf_nd_centroids(vecs: DataFrame, k: int):
    """Seed with the K lowest vec_ids, run ONE integer-exact Lloyd update
    (l18's contract), return (cids, cents) sorted by cid. The collects
    here move O(K·d) MODEL state to the driver — never corpus data."""
    import numpy as np

    seeds = (
        vecs.filter(F.col("vec_id") < k)
        .orderBy("vec_id")
        .select("vec_id", "qv")
        .collect()
    )
    cids0 = [int(r.vec_id) for r in seeds]
    cent0 = np.array([r.qv for r in seeds], dtype=np.float64)
    a1 = vecs.select(
        "vec_id",
        "qv",
        _ivf_probe_udf(cids0, cent0)(F.col("embedding"))[0].alias("cl"),
    )
    sums = (
        a1.select("cl", F.posexplode("qv").alias("pos", "comp"))
        .groupBy("cl", "pos")
        .agg(F.sum("comp").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    bycell: dict[int, dict[int, float]] = {}
    for r in sums:
        # python float division == DuckDB CAST(s AS DOUBLE)/n: both IEEE
        bycell.setdefault(int(r.cl), {})[int(r.pos)] = r.s / r.n
    cids = sorted(bycell)
    cents = np.array(
        [[bycell[c][p] for p in sorted(bycell[c])] for c in cids],
        dtype=np.float64,
    )
    return cids, cents


def _ivf_nd_group_verify(key, pdf):
    """Per-cell all-pairs verify (runs inside applyInPandas): integer
    matmul Gram matrix (exact — Σ q² < 2^53, so the float64 casts are
    exact too), one rounded double divide per pair, 0.35 threshold.
    Symmetric blocking means every in-cell pair is a candidate; a pair
    co-occurring in several shared probe cells is EMITTED only by the
    minimum shared cell — a purely local rule (both probe lists ride
    along), so no global DISTINCT pass is needed."""
    import numpy as np

    g = int(key[0])
    m = len(pdf)
    if m < 2:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
            {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
        )
    Q = np.array(pdf["qv"].tolist(), dtype=np.int64)
    ids = pdf["vec_id"].to_numpy()
    prs = pdf["pr"].tolist()
    D = Q @ Q.T  # int64: exact
    nrm = np.sqrt(np.diag(D).astype(np.float64))
    cos = D.astype(np.float64) / (nrm[:, None] * nrm[None, :])
    big = np.int64(1) << 62
    width = max(len(p) for p in prs)
    # pad with +big: padding can only "share" with padding, and the real
    # shared cell (at least g itself) always wins the min
    P = np.array(
        [list(p) + [big] * (width - len(p)) for p in prs], dtype=np.int64
    )
    iu, ju = np.triu_indices(m, 1)
    valid = cos[iu, ju] >= 0.35
    iu, ju = iu[valid], ju[valid]
    if len(iu) == 0:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
            {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
        )
    # min over the pair's SHARED probe cells; emit iff this cell is it
    eq = P[iu][:, :, None] == P[ju][:, None, :]
    shared_min = np.where(eq, P[iu][:, :, None], big).min(axis=(1, 2))
    emit = shared_min == g
    ka, kb = iu[emit], ju[emit]
    va = np.minimum(ids[ka], ids[kb])
    vb = np.maximum(ids[ka], ids[kb])
    return pd.DataFrame(
        {"vec_a": va, "vec_b": vb, "cosine": cos[ka, kb]}
    )


def _ivf_nd_dist_duck(qv: str, cvec: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, 65), i -> "
        f"(CAST({qv}[i] AS DOUBLE) - {cvec}[i])"
        f" * (CAST({qv}[i] AS DOUBLE) - {cvec}[i]))), (x, y) -> x + y)"
    )


def _ivf_neardup_oracle(k: int) -> str:
    return f"""
    WITH q AS (
      SELECT vec_id, {_QGRID_DUCK} AS qv FROM embeddings
    ),
    cent0 AS (
      SELECT CAST(vec_id AS INTEGER) AS cid,
             list_transform(qv, x -> CAST(x AS DOUBLE)) AS cvec
      FROM q WHERE vec_id < {k}
    ),
    a1p AS (
      SELECT q.vec_id,
             MIN({{'d': {_ivf_nd_dist_duck('q.qv', 'c.cvec')}, 'c': c.cid}})
               AS mc
      FROM q CROSS JOIN cent0 c
      GROUP BY q.vec_id
    ),
    a1 AS (SELECT vec_id, mc.c AS cl FROM a1p),
    sums AS (
      SELECT a.cl, p.pos, SUM(q.qv[p.pos]) AS s, COUNT(*) AS n
      FROM a1 a JOIN q USING (vec_id)
      CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p
      GROUP BY a.cl, p.pos
    ),
    cent1 AS (
      SELECT CAST(cl AS INTEGER) AS cid,
             list(CAST(s AS DOUBLE) / n ORDER BY pos) AS cvec
      FROM sums GROUP BY cl
    ),
    dists AS (
      SELECT q.vec_id, c.cid,
             {_ivf_nd_dist_duck('q.qv', 'c.cvec')} AS d
      FROM q CROSS JOIN cent1 c
    ),
    pr AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      FROM dists
    ),
    probes AS (SELECT vec_id, cid AS cell FROM pr WHERE rn <= {ND_NPROBE}),
    cand AS (
      SELECT DISTINCT least(p1.vec_id, p2.vec_id) AS vec_a,
             greatest(p1.vec_id, p2.vec_id) AS vec_b
      FROM probes p1 JOIN probes p2
        ON p1.cell = p2.cell AND p1.vec_id <> p2.vec_id
    ),
    pairs AS (
      SELECT vec_a, vec_b,
             CAST({_qdot_duck('a.qv', 'b.qv')} AS DOUBLE)
               / (sqrt(CAST({_qdot_duck('a.qv', 'a.qv')} AS DOUBLE))
                  * sqrt(CAST({_qdot_duck('b.qv', 'b.qv')} AS DOUBLE)))
               AS cosine
      FROM cand
      JOIN q a ON a.vec_id = vec_a
      JOIN q b ON b.vec_id = vec_b
    )
    SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.35
    """


@query(
    "l2d_embedding_neardup_prod",
    # oracle pins the sf0.01 instantiation (500 vectors -> 8 cells); the
    # Spark side re-derives K from the actual corpus at other scales
    oracle=_ivf_neardup_oracle(ND_SEED_SF001),
)
def l2d_embedding_neardup_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production embedding near-dup: learned-IVF blocking (constant-
    occupancy k-means cells, symmetric shared-probe candidates at
    nprobe 8) + quantized-integer cosine verify. See the block comment
    above for why this replaced sign-LSH blocking and for the round-6
    nprobe sweep, and the QSCALE comment for the bit-exactness contract.
    Measured against brute-force ground truth (tools/ivf_recall.py,
    recorded in SCALE_STRESS.json): recall ~0.99 at the 0.35 threshold
    at sf0.1 (round 5's asymmetric nprobe-2 rule: 0.36); on the 100×
    corpus, 0.90 on the ≥0.7-cosine near-dup band (the 0.35-grazing
    tail is quadratic in N by measurement and unreachable at linear
    candidates — block comment). Candidate mass ≈ 2000·N — linear in
    the corpus by construction."""
    cat = Catalog(spark, sf_dir)
    n = cat.embeddings.count()
    k = _nd_k_for(n)
    vecs = cat.embeddings.select(
        "vec_id", "embedding", F.expr(_QV_SPARK_GRID).alias("qv")
    ).persist()
    cids, cents = _ivf_nd_centroids(vecs, k)
    per = vecs.select(
        "vec_id",
        "qv",
        _ivf_probe_udf(cids, cents)(F.col("embedding")).alias("pr"),
    )
    # ONE shuffle: each vector ships to its <= ND_NPROBE probe cells;
    # verification is all-pairs WITHIN the cell group in vectorized int64
    # numpy. A pair sharing several probe cells is emitted only by the
    # MINIMUM shared cell — a purely local rule (both probe lists ride
    # along), so no global DISTINCT pass is needed. (The first cut joined
    # full vectors onto the candidate pairs: 25 GB through two shuffles,
    # 133 s at 100× — this shape moves nprobe·N rows once and was
    # measured an order of magnitude faster.)
    exploded = per.select(
        F.explode("pr").alias("gcell"),
        "vec_id",
        "qv",
        "pr",
    )
    return exploded.groupBy("gcell").applyInPandas(
        _ivf_nd_group_verify, "vec_a long, vec_b long, cosine double"
    )


# ---------------------------------------------------------------------------
# L18: k-means clustering (bounded Lloyd refinement — IVF training / corpus
# diversity sampling)
# ---------------------------------------------------------------------------

KM_K = 4  # seed centroids = the K lowest vec_ids
KM_DIM = 64

# Cross-engine exactness: components quantize to a 1e-6 grid FIRST
# (floor(x*1e6 + 0.5) — identical on both engines, no decimal rounding
# mode in play). Centroid means are then exact-integer sums divided once
# in double, and every distance is the same index-ordered fold, so
# assignments match bit-for-bit.
_QV_SPARK = (
    "transform(embedding, x -> "
    "cast(floor(cast(x as double) * 1000000D + 0.5D) as bigint))"
)
_QV_DUCK = (
    "list_transform(embedding, x -> "
    "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
)

_DIST_SPARK = (
    f"aggregate(sequence(0, {KM_DIM - 1}), 0D, (a, i) -> "
    "a + (cast(qv[i] as double) - ct.cvec[i])"
    " * (cast(qv[i] as double) - ct.cvec[i]))"
)
_ASSIGN_SPARK = (
    f"array_min(transform(cents, ct -> named_struct("
    f"'d', {_DIST_SPARK}, 'c', ct.cid))).c"
)


def _km_dist_duck(qv: str, cvec: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {KM_DIM + 1}), i -> "
        f"(CAST({qv}[i] AS DOUBLE) - {cvec}[i])"
        f" * (CAST({qv}[i] AS DOUBLE) - {cvec}[i]))), (x, y) -> x + y)"
    )


def _km_assign(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """Map-only assignment: the K centroids collapse into ONE broadcast row
    (sorted by cid so the fold's first-minimum tie-break = lowest cid,
    matching the oracle's lexicographic MIN(struct)); each vector scores
    all centroids inside a single projection — no shuffle, no explode."""
    cents_row = cent.agg(
        F.sort_array(F.collect_list(F.struct("cid", "cvec"))).alias("cents")
    )
    return vecs.crossJoin(F.broadcast(cents_row)).select(
        "vec_id", "qv", F.expr(_ASSIGN_SPARK).alias("cluster")
    )


def _km_update(assigned: DataFrame) -> DataFrame:
    """Centroid recompute: exact integer sums per (cluster, dim) — partial
    aggregation collapses each input partition before the one shuffle —
    then a single double division, components reassembled in dim order."""
    sums = (
        assigned.select("cluster", F.posexplode("qv").alias("pos", "comp"))
        .groupBy("cluster", "pos")
        .agg(F.sum("comp").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    return (
        sums.groupBy("cluster")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "pos",
                        (F.col("s").cast("double") / F.col("n")).alias("m"),
                    )
                )
            ).alias("arr")
        )
        .select(
            F.col("cluster").alias("cid"),
            F.expr("transform(arr, s -> s.m)").alias("cvec"),
        )
    )


def _km_oracle() -> str:
    def assign(cent: str, out: str) -> str:
        return f"""
    {out}p AS (
      SELECT vec_id,
             MIN({{'d': {_km_dist_duck('qv', 'cvec')}, 'c': cid}}) AS mc
      FROM qv_t CROSS JOIN {cent}
      GROUP BY vec_id
    ),
    {out} AS (SELECT vec_id, mc.c AS cluster FROM {out}p)
    """

    def update(a: str, out: str) -> str:
        return f"""
    {out}s AS (
      SELECT cluster, p.pos, SUM(qv[p.pos]) AS s, COUNT(*) AS n
      FROM {a} JOIN qv_t USING (vec_id)
      CROSS JOIN (SELECT unnest(range(1, {KM_DIM + 1})) AS pos) p
      GROUP BY cluster, p.pos
    ),
    {out} AS (
      SELECT CAST(cluster AS INTEGER) AS cid,
             list(CAST(s AS DOUBLE) / n ORDER BY pos) AS cvec
      FROM {out}s GROUP BY cluster
    )
    """

    return f"""
    WITH qv_t AS (
      SELECT vec_id, {_QV_DUCK} AS qv FROM embeddings
    ),
    cent0 AS (
      SELECT CAST(vec_id AS INTEGER) AS cid,
             list_transform(qv, x -> CAST(x AS DOUBLE)) AS cvec
      FROM qv_t WHERE vec_id < {KM_K}
    ),
    {assign('cent0', 'a1')},
    {update('a1', 'cent1')},
    {assign('cent1', 'a2')}
    SELECT vec_id, cluster FROM a2
    """


@query("l18_kmeans", oracle=_km_oracle())
def l18_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embedding corpus: deterministic seeding (the K
    lowest vec_ids), two bounded Lloyd rounds (assign → update → assign),
    final per-vector cluster assignment. The IVF coarse quantizer's
    training step (l3c consumes exactly such centroids) and the standard
    corpus-diversity / stratified-sampling primitive.

    Scale posture (100 TB): assignment is MAP-ONLY — centroids are O(K·d)
    model state broadcast to every task (MLlib's KMeans does the same);
    the update is one shuffle of N·d partial sums with map-side combine.
    Iteration count is fixed and small — each extra round is one more
    (map, shuffle) pair, linear in corpus size, and convergence beyond a
    few rounds buys nothing for bucketing use cases. The quantized
    integer grid keeps every mean exact, so the DuckDB oracle reproduces
    assignments bit-for-bit (see _QV_SPARK note)."""
    cat = Catalog(spark, sf_dir)
    # persist: qv feeds assignment twice + the update explode (see
    # word_hash_table note on projection-collapse)
    vecs = cat.embeddings.select(
        "vec_id", F.expr(_QV_SPARK).alias("qv")
    ).persist()
    cent0 = vecs.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.expr("transform(qv, x -> cast(x as double))").alias("cvec"),
    )
    a1 = _km_assign(vecs, cent0)
    cent1 = _km_update(a1)
    a2 = _km_assign(vecs, cent1)
    return a2.select("vec_id", "cluster").orderBy("vec_id")


# ---------------------------------------------------------------------------
# L26: product-quantization ANN (PQ codes + ADC scan + exact re-rank)
# ---------------------------------------------------------------------------
#
# The memory-bound complement to the IVF cell routing of l3c: at 10^9+
# vectors the working set itself (64 floats/vector) no longer fits the
# cluster page cache, so real ANN engines store an 8-16 BYTE PQ code per
# vector and scan codes with asymmetric-distance (ADC) lookup tables,
# re-ranking only a short exact shortlist. This operator reproduces that
# exact pipeline in DataFrame algebra:
#
#   train:  split the 2^-20-quantized vector into PQ_M subvectors; per
#           subspace, deterministic seeds (lowest vec_ids) + ONE integer-
#           exact Lloyd round = the codebook (PQ_K double centroids whose
#           components are exact-int sums / count — same contract as l18).
#   encode: per subspace, argmin centroid with lowest-cid tie-break.
#           Distances are UNROLLED left-associated squared-diff chains
#           (python loop over dims building one codegen expression) — the
#           fold ORDER matches the oracle's list_reduce exactly, and the
#           whole assignment stays inside WholeStageCodegen: no
#           interpreted higher-order lambdas on the hot path (the round-5
#           lesson from the fold-based l2d kernels), no Python either.
#   query:  each query vector computes a PQ_M x PQ_K lookup table once;
#           every corpus code scores as PQ_M table lookups + a 4-term
#           add chain (the ADC scan — the only per-vector work, O(M)).
#   rerank: top PQ_SHORTLIST by ADC are re-scored with the exact
#           integer-grid cosine (order-free int64 dot) and the best
#           PQ_TOPK survive.
#
# Scale posture (100 TB): training reads a bounded sample; encoding is
# map-only against a broadcast codebook; the ADC scan is map-only against
# a broadcast query table; only the shortlist join touches full vectors.
# At 10^9 vectors: PQ_M=8-16, PQ_K=256, IVF cells (l3c) in front — plan
# shape unchanged.

PQ_M = 4          # subspaces
PQ_SUB = 16       # dims per subspace (PQ_M * PQ_SUB = 64)
PQ_K = 16         # centroids per subspace codebook
PQ_SHORTLIST = 20
PQ_TOPK = 5
PQ_NQ = 5         # query vectors: vec_id < PQ_NQ

_QV_SPARK_GRID = (
    "transform(embedding, x -> "
    f"cast(floor(cast(x as double) * {float(1 << 20)!r}D + 0.5D) as bigint))"
)


_PQ_QDOT_DUCK = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(range(1, 65), i -> {a}[i] * {b}[i])), (x, y) -> x + y)"
)


def _pq_dist_duck(sv: str, cv: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {PQ_SUB} + 1), i -> "
        f"(CAST({sv}[i] AS DOUBLE) - {cv}[i])"
        f" * (CAST({sv}[i] AS DOUBLE) - {cv}[i]))), (x, y) -> x + y)"
    )


def _pq_oracle(train_where: str = "TRUE") -> str:
    """The full PQ pipeline in DuckDB. ``train_where`` (SQL over
    vec_id) restricts the TRAINING set — seeds and the Lloyd round —
    while codes/ADC/re-rank still cover every vector: the frozen-
    codebook contract of an index APPEND (l42), default = train on
    everything (l26/l36)."""
    qdot = _PQ_QDOT_DUCK.format(a="qa.qv", b="qb.qv")
    qna = _PQ_QDOT_DUCK.format(a="qa.qv", b="qa.qv")
    qnb = _PQ_QDOT_DUCK.format(a="qb.qv", b="qb.qv")
    return f"""
    WITH qv_t AS (
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
      FROM subs WHERE vec_id < {PQ_K} AND ({train_where})
    ),
    a1p AS (
      SELECT s.vec_id, s.m,
             MIN({{'d': {_pq_dist_duck('s.sv', 'c.cvec')}, 'c': c.cid}}) AS mc
      FROM subs s JOIN cent0 c ON c.m = s.m
      WHERE ({train_where.replace('vec_id', 's.vec_id')})
      GROUP BY s.vec_id, s.m
    ),
    a1 AS (SELECT vec_id, m, mc.c AS cl FROM a1p),
    sums AS (
      SELECT s.m, a.cl, p.pos, SUM(s.sv[p.pos]) AS sm, COUNT(*) AS n
      FROM a1 a JOIN subs s ON s.vec_id = a.vec_id AND s.m = a.m
      CROSS JOIN (SELECT unnest(range(1, {PQ_SUB} + 1)) AS pos) p
      GROUP BY s.m, a.cl, p.pos
    ),
    cent1 AS (
      SELECT m, CAST(cl AS INTEGER) AS cid,
             list(CAST(sm AS DOUBLE) / n ORDER BY pos) AS cvec
      FROM sums GROUP BY m, cl
    ),
    codesp AS (
      SELECT s.vec_id, s.m,
             MIN({{'d': {_pq_dist_duck('s.sv', 'c.cvec')}, 'c': c.cid}}) AS mc
      FROM subs s JOIN cent1 c ON c.m = s.m
      GROUP BY s.vec_id, s.m
    ),
    codes AS (SELECT vec_id, m, mc.c AS code FROM codesp),
    lut AS (
      SELECT s.vec_id AS query_id, s.m, c.cid,
             {_pq_dist_duck('s.sv', 'c.cvec')} AS d
      FROM subs s JOIN cent1 c ON c.m = s.m
      WHERE s.vec_id < {PQ_NQ}
    ),
    adist AS (
      SELECT l.query_id, co.vec_id, SUM(l.d ORDER BY l.m) AS adist
      FROM codes co
      JOIN lut l ON l.m = co.m AND l.cid = co.code
      WHERE co.vec_id <> l.query_id
      GROUP BY l.query_id, co.vec_id
    ),
    short AS (
      SELECT query_id, vec_id, adist
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY adist, vec_id) AS srn
            FROM adist)
      WHERE srn <= {PQ_SHORTLIST}
    ),
    rer AS (
      SELECT s.query_id, s.vec_id, s.adist,
             CAST({qdot} AS DOUBLE)
               / (sqrt(CAST({qna} AS DOUBLE)) * sqrt(CAST({qnb} AS DOUBLE)))
               AS cosine
      FROM short s
      JOIN qv_t qa ON qa.vec_id = s.query_id
      JOIN qv_t qb ON qb.vec_id = s.vec_id
    )
    SELECT query_id, vec_id, adist, cosine, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
          FROM rer)
    WHERE rn <= {PQ_TOPK}
    """


def _pq_fold_dist(Q, C):
    """(n, d) x (K, d) -> (n, K) squared distances accumulated in DIM
    ORDER (vectorize across rows, fold across dims) — bit-identical to
    the oracle's list_reduce chain."""
    import numpy as np

    D = np.zeros((len(Q), len(C)))
    for i in range(Q.shape[1]):
        t = Q[:, i : i + 1] - C[None, :, i]
        D += t * t
    return D


def _pq_code_udf(books):
    """codes(qv) -> array<int>: per-subspace nearest-centroid cid (ties by
    lowest cid — argmin first-occurrence over cid-sorted codebooks).
    ``books`` is [(cids, cent_matrix)] per subspace, shipped in the UDF
    closure (O(M·K·d) model state — the KMeansModel residency pattern)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def codes(qv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype=object)
        Q = np.array(qv.tolist(), dtype=np.float64)
        n = len(Q)
        out = np.empty((n, PQ_M), dtype=np.int64)
        for m, (cids, cent) in enumerate(books):
            sub = Q[:, m * PQ_SUB : (m + 1) * PQ_SUB]
            out[:, m] = np.asarray(cids)[_pq_fold_dist(sub, cent).argmin(1)]
        return pd.Series(list(out))

    return codes


def _pq_train(vecs: DataFrame):
    """Seeds = subvectors of the PQ_K lowest vec_ids; ONE Lloyd round of
    integer-exact sums -> double means per subspace (l18's contract).
    Returns [(cids, cent_matrix float64)] per subspace; only O(M·K·d)
    model state crosses to the driver."""
    import numpy as np

    seeds = (
        vecs.filter(F.col("vec_id") < PQ_K).orderBy("vec_id").collect()
    )
    books0 = []
    for m in range(PQ_M):
        cids = [int(r.vec_id) for r in seeds]
        cent = np.array(
            [r.qv[m * PQ_SUB : (m + 1) * PQ_SUB] for r in seeds],
            dtype=np.float64,
        )
        books0.append((cids, cent))
    a1 = vecs.select(
        "vec_id", "qv", _pq_code_udf(books0)(F.col("qv")).alias("cls")
    )
    sums = (
        a1.select(F.posexplode("qv").alias("pos", "comp"), "cls")
        .select(
            (F.col("pos") / PQ_SUB).cast("int").alias("m"),
            (F.col("pos") % PQ_SUB).alias("posin"),
            F.expr("cls[cast(pos / " + str(PQ_SUB) + " as int)]").alias("cl"),
            "comp",
        )
        .groupBy("m", "cl", "posin")
        .agg(F.sum("comp").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    bymc: dict = {}
    for r in sums:
        # python float division == DuckDB CAST(s AS DOUBLE)/n (IEEE)
        bymc.setdefault((int(r.m), int(r.cl)), {})[int(r.posin)] = r.s / r.n
    books1 = []
    for m in range(PQ_M):
        cids = sorted(c for (mm, c) in bymc if mm == m)
        cent = np.array(
            [[bymc[(m, c)][p] for p in range(PQ_SUB)] for c in cids],
            dtype=np.float64,
        )
        books1.append((cids, cent))
    return books1


@query("l26_pq_ann", oracle=_pq_oracle())
def l26_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC ANN with exact re-rank — see the block comment above for the
    train / encode / ADC / re-rank pipeline and its 100 TB posture.

    Execution shape: codebooks are O(M·K·d) model state (driver-trained
    via one integer-exact distributed Lloyd round, shipped in UDF
    closures); encoding is an Arrow-batched numpy kernel with
    dim-ordered folds (the first cut unrolled 256-term codegen
    expressions instead — Janino's 64 KB method limit made every run pay
    ~18 s of failed-compile fallback); each query's ADC lookup table is
    computed driver-side from the broadcast codebook and joins the code
    scan as plain LITERAL array columns, so the per-vector scan work is
    PQ_M element_at lookups + an ordered 4-term add chain in one small
    codegen stage. This entry documents the INLINE train+query cost; the
    build-once/query-many form (persisted codebook + codes tables, no
    training on the query path) is operators/vector_index.py
    (l36_pq_index_build/_query)."""
    import numpy as np

    cat = Catalog(spark, sf_dir)
    vecs = cat.embeddings.select(
        "vec_id", F.expr(_QV_SPARK_GRID).alias("qv")
    ).persist()
    books = _pq_train(vecs)
    coded = vecs.select(
        "vec_id", "qv", _pq_code_udf(books)(F.col("qv")).alias("codes")
    ).persist()
    # per-query LUTs: distances from the query's subvectors to every
    # centroid, computed driver-side from the collected QUERY rows (query
    # parameters, like the ANN literal vector in cql6) + the codebook
    qrows = (
        vecs.filter(F.col("vec_id") < PQ_NQ).orderBy("vec_id").collect()
    )
    lut_rows = []
    for r in qrows:
        q = np.array(r.qv, dtype=np.float64)
        luts = []
        for m, (cids, cent) in enumerate(books):
            sub = q[None, m * PQ_SUB : (m + 1) * PQ_SUB]
            d = _pq_fold_dist(sub, cent)[0]
            full = [0.0] * PQ_K
            for c, dv in zip(cids, d):
                full[c] = float(dv)
            luts.append(full)
        lut_rows.append((int(r.vec_id), *luts))
    qdf = F.broadcast(
        vecs.sparkSession.createDataFrame(
            lut_rows,
            "query_id long, "
            + ", ".join(f"lut{m} array<double>" for m in range(PQ_M)),
        )
    )
    # ADC scan: PQ_M lookups + the ordered add chain (oracle: SUM(d
    # ORDER BY m) — both left-associated in subspace order)
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
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        rer.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("query_id", "vec_id", "adist", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# L30: SQ8 scalar-quantized ANN — per-vector int8 compression + integer scan
# ---------------------------------------------------------------------------
#
# The standard vector-DB compression tier (jvector/faiss "SQ8"): each
# vector stores ONE float scale (its max-abs component) plus 64 int8
# codes q_j = round(127 * x_j / scale), 4x smaller than float32 and the
# scan becomes an integer multiply-add chain. Distinct from the PQ tier
# (l26: shared codebooks, lossy subspace centroids) and from the internal
# fixed-point grid (_QV_SPARK_GRID: corpus-wide 2^20 grid for exact-math
# oracles) — SQ8's scale is PER VECTOR, so quantization error is bounded
# relative to each vector's own magnitude.
#
# Determinism contract: scale = max(|x_j|) (max is order-free);
# q_j = floor((x * 127.0) / s + 0.5) — multiply THEN divide, each IEEE
# correctly rounded, identical op sequence on both engines; the int dot
# is exact BIGINT arithmetic; the final cosine is one division by a
# product of two correctly-rounded sqrts. Bit-identical by construction.
#
# Scale posture (100 TB): quantization is a map-only projection (in a
# real deployment it is written once as an int8 column + scale, 4x byte
# reduction on the scan); the query side is SQ_NQ rows broadcast; the
# corpus-side work per vector is one 64-term integer chain in a single
# codegen stage. In front of this at 10^9 vectors sits the IVF router
# (l3c) — plan shape unchanged, the SQ8 scan just replaces the float
# fold inside each probed cell.

SQ_NQ = 5
SQ_TOPK = 10


_SQ8_SCALE_SPARK = (
    "array_max(transform(embedding, x -> abs(cast(x as double))))"
)
_SQ8_Q_SPARK = (
    "transform(embedding, x -> CASE WHEN sq_s = 0D THEN 0L ELSE "
    "cast(floor(cast(x as double) * 127.0D / sq_s + 0.5D) as bigint) END)"
)

_SQ8_SCALE_DUCK = (
    "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
)
_SQ8_Q_DUCK = (
    "list_transform(embedding, x -> CASE WHEN sq_s = 0 THEN 0::BIGINT ELSE "
    "CAST(floor(CAST(x AS DOUBLE) * 127.0 / sq_s + 0.5) AS BIGINT) END)"
)


@query(
    "l30_sq8_ann",
    oracle=f"""
    WITH scaled AS (
      SELECT vec_id, embedding, {_SQ8_SCALE_DUCK} AS sq_s FROM embeddings
    ),
    q AS (
      SELECT vec_id, embedding,
             {_SQ8_Q_DUCK} AS q8,
             {NORM_DUCK} AS nrm
      FROM scaled
    ),
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
             CAST({_qdot_duck('a.q8', 'b.q8')} AS DOUBLE)
               / (sqrt(CAST({_qdot_duck('a.q8', 'a.q8')} AS DOUBLE))
                  * sqrt(CAST({_qdot_duck('b.q8', 'b.q8')} AS DOUBLE)))
               AS qcosine,
             {dot_duck('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)
               AS cosine
      FROM q a JOIN q b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {SQ_NQ}
    )
    SELECT query_id, vec_id, qcosine, cosine,
           abs(qcosine - cosine) AS abs_err, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY qcosine DESC, vec_id) AS rn
          FROM pairs)
    WHERE rn <= {SQ_TOPK}
    """,
)
def l30_sq8_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized ANN: per-vector max-abs scale + int8 codes,
    integer-dot scan, quantized-cosine top-{SQ_TOPK} per query with the
    exact cosine and |error| carried for quality audit. See the block
    comment above for the determinism contract and 100 TB posture."""
    cat = Catalog(spark, sf_dir)
    q = (
        cat.embeddings.withColumn("sq_s", F.expr(_SQ8_SCALE_SPARK))
        .withColumn("q8", F.expr(_SQ8_Q_SPARK))
        .withColumn("nrm", F.expr(NORM_SPARK))
        .select("vec_id", "embedding", "q8", "nrm")
    )
    qa = q.filter(F.col("vec_id") < SQ_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("ea"),
        F.col("q8").alias("qa8"),
        F.col("nrm").alias("na"),
        _unrolled_int_dot("q8", "q8").alias("na2"),
    )
    qb = q.select(
        "vec_id",
        F.col("embedding").alias("eb"),
        F.col("q8").alias("qb8"),
        F.col("nrm").alias("nb"),
        _unrolled_int_dot("q8", "q8").alias("nb2"),
    )
    qcos = _unrolled_int_dot("qa8", "qb8").cast("double") / (
        F.sqrt(F.col("na2").cast("double"))
        * F.sqrt(F.col("nb2").cast("double"))
    )
    pairs = (
        qb.crossJoin(F.broadcast(qa))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            qcos.alias("qcosine"),
            (
                F.expr(dot_spark("ea", "eb"))
                / (F.col("na") * F.col("nb"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SQ_TOPK)
        .select(
            "query_id",
            "vec_id",
            "qcosine",
            "cosine",
            (F.abs(F.col("qcosine") - F.col("cosine"))).alias("abs_err"),
            "rank",
        )
    )
