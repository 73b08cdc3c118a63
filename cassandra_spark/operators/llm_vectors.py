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
    √N centroids, nprobe 8-32, same three joins."""
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
    "l2d_embedding_neardup_prod",
    # the oracle mirrors the sf0.01 instantiation (500 vectors) — the one
    # scale the driver's correctness gate runs at; at other scales the
    # Spark side re-derives planes from the actual corpus
    oracle=_q_neardup_oracle(planes_for_corpus(500)),
)
def l2d_embedding_neardup_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-shape embedding near-dup: occupancy-constant plane count
    DERIVED from the corpus at plan time (`planes_for_corpus` — a fixed
    plane count is the one genuine scale killer in this family: occupancy
    grows linearly in N and Σ bucket² quadratically), with both hot
    kernels — LSH bucket assignment and candidate cosine — as Arrow-
    batched int64 numpy (see the QSCALE block comment: exact cross-engine
    by integer arithmetic; round-5 stress measured the interpreted fold
    kernels at 202 s / ~70× growth on the 100× corpus, pure expression-
    interpreter overhead). Candidate generation stays a distributed bucket
    equi-join with Hamming-1 multiprobe — Σ bucket², never corpus².
    Cosine here is over the 2^-20-quantized grid (|Δ| < 4e-6 vs float —
    the threshold semantics, 0.35, are this operator's own contract)."""
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
