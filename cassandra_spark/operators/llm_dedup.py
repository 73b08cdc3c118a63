"""L-tier dedup operators: exact (L1), MinHash+LSH (L2), SimHash (L2b),
n-gram Jaccard (L2c) — SURVEY.md §2.12; mandated by the 100 TB
training-data-pipeline north star.

Everything is pure DataFrame algebra with *portable integer hashing* so the
DuckDB oracle can verify every stage end-to-end (SURVEY.md §7 M6): a word
hashes by char-fold (acc*31+code mod 1e9+7), shingles combine word hashes,
MinHash applies k affine permutations, bands bucket signatures. The same
constants drive both engines, so candidate sets — not just final counts —
must agree exactly.

Scale posture (100 TB): this is the standard shingle→minhash→band→bucket-
join pipeline. Work is linear in corpus size until the band-bucket
self-join, whose cost is Σ bucket² — controlled by band width; the verify
join touches only candidate pairs. No cross join exists anywhere. For even
larger corpora swap the portable hash for xxhash64 (same pipeline shape,
cheaper mixing) — the hash fn is a parameter of the builders below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query

MOD = 1_000_000_007
# MinHash: 8 affine permutations (a*s + b) % MOD, banded 4×2.
MH_A = (131, 1031, 10007, 100003, 1000033, 333667, 999983, 7919)
MH_B = (7, 97, 997, 9973, 99991, 24181, 55331, 104729)
P2, P3 = 1_000_003, 998_244_353  # shingle combiners
BAND_MIX = 1_000_000_009

# --- Spark-side expression fragments (0-based arrays) ---------------------

WORD_HASH_SPARK = (
    "transform(split(text, ' '), w -> "
    f"aggregate(transform(split(w, ''), c -> ascii(c)), 0L, "
    f"(acc, x) -> (acc * 31 + x) % {MOD}))"
)


def shingle_expr_spark(n: int, wh: str = "wh") -> str:
    """Distinct n-gram shingle hashes from the word-hash array."""
    if n == 3:
        combine = f"(wh[i] + wh[i+1] * {P2} + wh[i+2] * {P3}) % {MOD}"
    elif n == 2:
        combine = f"(wh[i] + wh[i+1] * {P2}) % {MOD}"
    else:
        raise ValueError(n)
    return (
        f"array_distinct(transform(sequence(0, size({wh}) - {n}), "
        f"i -> {combine}))"
    )


# --- DuckDB-side fragments (1-based lists) --------------------------------

WORD_HASH_DUCK = (
    "list_transform(string_split(text, ' '), w -> "
    f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(w, ''), "
    f"c -> ascii(c))), (a, b) -> (a * 31 + b) % {MOD}))"
)


def shingle_expr_duck(n: int, wh: str = "wh") -> str:
    if n == 3:
        combine = f"(wh[i] + wh[i+1] * {P2} + wh[i+2] * {P3}) % {MOD}"
    elif n == 2:
        combine = f"(wh[i] + wh[i+1] * {P2}) % {MOD}"
    else:
        raise ValueError(n)
    return (
        f"list_distinct(list_transform(range(1, len({wh}) - {n - 2}), "
        f"i -> {combine}))"
    )


def word_hash_table(docs: DataFrame, min_words: int, *cols: str) -> DataFrame:
    """(*cols, wh) with the word-hash array MATERIALIZED via persist().

    The persist is an optimizer barrier, not a reuse cache: CollapseProject
    would otherwise inline the interpreted per-char hash lambda into every
    `wh[i]` element access of a downstream shingle/signature expression,
    turning one O(words) pass per doc into O(words x references) — measured
    ~10x on l13 at sf0.01 (30s -> 3s). Spark's CacheManager dedupes by
    canonicalized plan, so queries sharing the same projection share one
    materialization. At 100 TB the equivalent is writing the tokenized
    corpus to an intermediate table once and reusing it across all
    dedup / decontamination steps — standard corpus-pipeline practice.
    """
    return (
        docs.select(*cols, F.expr(WORD_HASH_SPARK).alias("wh"))
        .filter(F.size("wh") >= min_words)
        .persist()
    )


# ---------------------------------------------------------------------------
# L1: exact dedup
# ---------------------------------------------------------------------------


@query(
    "l1_exact_dedup",
    oracle="""
    SELECT content_hash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM (
      SELECT doc_id,
             sha256(lower(regexp_replace(text, '\\s+', ' ', 'g')))
               AS content_hash
      FROM documents
    )
    GROUP BY content_hash
    """,
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize (lowercase, collapse whitespace) → SHA-256
    content hash → keep the lowest doc_id per group. hash-groupBy with
    map-side partials; the canonical first pass of any corpus pipeline."""
    cat = Catalog(spark, sf_dir)
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return (
        cat.documents.select(
            "doc_id", F.sha2(norm.cast("binary"), 256).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# L2: MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → 3-gram shingle set + 8 MinHash values + 4 band buckets.
    One narrow pass over the corpus; no shuffle. Barriers after wh and sh
    (see word_hash_table): sh indexes wh 3x per element and each of the 8
    mh columns scans sh, so without them the hash lambda is inlined ~24x."""
    wh_t = word_hash_table(docs, 3, "doc_id")
    df = wh_t.withColumn("sh", F.expr(shingle_expr_spark(3))).select(
        "doc_id", "sh"
    ).persist()
    for j, (a, b) in enumerate(zip(MH_A, MH_B)):
        df = df.withColumn(
            f"mh{j}",
            F.expr(f"array_min(transform(sh, s -> ({a} * s + {b}) % {MOD}))"),
        )
    for band in range(4):
        df = df.withColumn(
            f"band{band}",
            F.col(f"mh{2 * band}") * BAND_MIX + F.col(f"mh{2 * band + 1}"),
        )
    return df


def _minhash_sql_cte() -> str:
    """DuckDB mirror of minhash_signatures (shared by the l2 oracle)."""
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(sh, s -> ({a} * s + {b}) % {MOD}), "
        f"'min') AS mh{j}"
        for j, (a, b) in enumerate(zip(MH_A, MH_B))
    )
    band_cols = ", ".join(
        f"mh{2 * b} * {BAND_MIX} + mh{2 * b + 1} AS band{b}" for b in range(4)
    )
    return f"""
    wh_t AS (
      SELECT doc_id, {WORD_HASH_DUCK} AS wh FROM documents
    ),
    sh_t AS (
      SELECT doc_id, {shingle_expr_duck(3)} AS sh
      FROM wh_t WHERE len(wh) >= 3
    ),
    sig AS (
      SELECT doc_id, sh, {mh_cols} FROM sh_t
    ),
    banded AS (
      SELECT doc_id, sh, {band_cols} FROM sig
    )
    """


_L2_ORACLE = f"""
WITH {_minhash_sql_cte()},
bands AS (
  SELECT doc_id, b.band_id,
         CASE b.band_id WHEN 0 THEN band0 WHEN 1 THEN band1
                        WHEN 2 THEN band2 ELSE band3 END AS band_val
  FROM banded CROSS JOIN (VALUES (0), (1), (2), (3)) b(band_id)
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_val = y.band_val
   AND x.doc_id < y.doc_id
),
verified AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
           AS jaccard
  FROM cand
  JOIN banded sa ON sa.doc_id = doc_a
  JOIN banded sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.2
"""


@query("l2_minhash_neardup", oracle=_L2_ORACLE)
def l2_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: shingle → MinHash(8) → LSH bands (4×2) →
    band-bucket candidate join → exact-Jaccard verify ≥ 0.2.

    The band join is an equi-join on (band_id, band_val): only docs
    agreeing on a full band collide, so candidate count tracks true
    near-dup density rather than corpus². The verify stage computes exact
    Jaccard on the (distinct) shingle-hash sets of candidates only."""
    cat = Catalog(spark, sf_dir)
    # persist: sig feeds four plan branches (bands×2, shingles×2); without a
    # materialization barrier Catalyst inlines the nested-lambda signature
    # tree into every branch — exponential analysis/codegen blowup (observed
    # 79s → 3s at 500 docs). At 100 TB signatures would be written to a
    # table between stages for exactly the same reason.
    sig = (
        minhash_signatures(cat.documents)
        .select(
            "doc_id",
            "sh",
            F.array(*[F.col(f"band{b}") for b in range(4)]).alias("bands"),
        )
        .persist()
    )
    bands = sig.select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_val")
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sh = sig.select("doc_id", "sh")
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.col("sa")) + F.size(F.col("sb")) - inter
    return (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


# --- production-shape MinHash-LSH (parameterized banding) ------------------
#
# l2 above is the fixture-scale config (8 perms, 4×2 bands, verify ≥ 0.2 —
# an s-curve centered near 0.5 so the tiny corpus yields pairs to check).
# Production near-dup dedup runs 100+ permutations with narrow-threshold
# banding: 16 bands × 8 rows centers the s-curve at (1/16)^(1/8) ≈ 0.71,
# so only true near-dups (the standard ≥ 0.8 verify) become candidates and
# Σ bucket² stays tiny at corpus scale. The banding is fully parameterized;
# both configs share one pipeline shape and one oracle generator.

BAND_FOLD_MOD = 1_000_000_000_039  # band-row fold modulus (fits the fold in i64)
PROD_PERMS, PROD_BANDS, PROD_ROWS = 128, 16, 8
PROD_JACCARD = 0.8


def perm_constants(n: int, seed: int = 61409) -> list[tuple[int, int]]:
    """n deterministic affine-permutation constants (a, b) for (a*s+b)%MOD.
    Fixed seed: both engines bake the same literals into their plans."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MOD), rng.randrange(0, MOD)) for _ in range(n)]


def banded_signatures(
    docs: DataFrame, perms: list[tuple[int, int]], n_bands: int, rows: int
) -> DataFrame:
    """doc_id → shingle set + n_bands band buckets from len(perms) MinHash
    values (rows consecutive minhashes fold into one band value). One
    narrow pass; persist barriers as in minhash_signatures."""
    if n_bands * rows != len(perms):
        raise ValueError("bands × rows must equal the permutation count")
    wh_t = word_hash_table(docs, 3, "doc_id")
    sh = (
        wh_t.withColumn("sh", F.expr(shingle_expr_spark(3)))
        .select("doc_id", "sh")
        .persist()
    )
    perm_arr = "array(" + ", ".join(
        f"struct({a}L AS a, {b}L AS b)" for a, b in perms
    ) + ")"
    mh = (
        f"transform({perm_arr}, p -> "
        f"array_min(transform(sh, s -> (p.a * s + p.b) % {MOD})))"
    )
    bands = (
        f"transform(sequence(0, {n_bands - 1}), b -> "
        f"aggregate(slice(mh, cast(b * {rows} + 1 AS int), {rows}), 0L, "
        f"(acc, x) -> (acc * {P2} + x) % {BAND_FOLD_MOD}))"
    )
    # persist between mh and bands: CollapseProject would otherwise inline
    # the len(perms)-permutation transform into every band's slice-fold —
    # n_bands× re-evaluation AND a plan-size blowup (measured ~50s of
    # scale-independent overhead at 128 perms without the barrier)
    mh_t = sh.withColumn("mh", F.expr(mh)).persist()
    return (
        mh_t.withColumn("bands", F.expr(bands))
        .select("doc_id", "sh", "bands")
        .persist()
    )


def _prod_minhash_oracle() -> str:
    perms = perm_constants(PROD_PERMS)
    perm_list = "[" + ", ".join(
        f"{{'a': {a}, 'b': {b}}}" for a, b in perms
    ) + "]"
    mh = (
        f"list_transform({perm_list}, p -> list_aggregate("
        f"list_transform(sh, s -> (p.a * s + p.b) % {MOD}), 'min'))"
    )
    bands = (
        f"list_transform(range(0, {PROD_BANDS}), b -> "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"mh[b * {PROD_ROWS} + 1 : b * {PROD_ROWS} + {PROD_ROWS}]), "
        f"(acc, x) -> (acc * {P2} + x) % {BAND_FOLD_MOD}))"
    )
    band_ids = ", ".join(f"({i})" for i in range(PROD_BANDS))
    return f"""
    WITH wh_t AS (
      SELECT doc_id, {WORD_HASH_DUCK} AS wh FROM documents
    ),
    sh_t AS (
      SELECT doc_id, {shingle_expr_duck(3)} AS sh
      FROM wh_t WHERE len(wh) >= 3
    ),
    sig AS (SELECT doc_id, sh, {mh} AS mh FROM sh_t),
    banded AS (SELECT doc_id, sh, {bands} AS bands FROM sig),
    bands_x AS (
      SELECT doc_id, b.band_id, bands[b.band_id + 1] AS band_val
      FROM banded CROSS JOIN (VALUES {band_ids}) b(band_id)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands_x x JOIN bands_x y
        ON x.band_id = y.band_id AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
    ),
    verified AS (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
               AS jaccard
      FROM cand
      JOIN banded sa ON sa.doc_id = doc_a
      JOIN banded sb ON sb.doc_id = doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {PROD_JACCARD}
    """


@query("l2_minhash_neardup_prod", oracle=_prod_minhash_oracle())
def l2_minhash_neardup_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-shape near-dup: 128 MinHash permutations, 16 bands × 8
    rows (s-curve threshold ≈ 0.71), exact-Jaccard verify ≥ 0.8 — the
    parameters a real corpus dedup pass runs. Same plan shape as l2:
    band equi-join candidates, verify on candidates only."""
    cat = Catalog(spark, sf_dir)
    sig = banded_signatures(
        cat.documents, perm_constants(PROD_PERMS), PROD_BANDS, PROD_ROWS
    )
    bands = sig.select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_val")
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sh = sig.select("doc_id", "sh")
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.col("sa")) + F.size(F.col("sb")) - inter
    return (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= PROD_JACCARD)
    )


# ---------------------------------------------------------------------------
# L2b: SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def _simhash_spark() -> Column:
    """16-bit SimHash from word hashes: per bit, sum ±1 contributions of
    every token occurrence; bit set iff the sum is positive."""
    bit_terms = " + ".join(
        f"(CASE WHEN aggregate(wh, 0L, (acc, h) -> "
        f"acc + (CASE WHEN (h div {1 << i}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return F.expr(f"({bit_terms})").cast("bigint")


def _simhash_duck() -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(wh, h -> "
        f"CASE WHEN (h // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END)), "
        f"(a, b) -> a + b) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return f"CAST(({bit_terms}) AS BIGINT)"


@query(
    "l2b_simhash",
    oracle=f"""
    WITH wh_t AS (
      SELECT doc_id, source, {WORD_HASH_DUCK} AS wh FROM documents
    ),
    fp AS (
      SELECT doc_id, source, {_simhash_duck()} AS simhash
      FROM wh_t WHERE len(wh) >= 1
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT))
                AS INTEGER) AS hamming
    FROM fp a JOIN fp b
      ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 2
    """,
)
def l2b_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 16-bit sign-sum fingerprint per doc; pairs within
    the same source at Hamming distance ≤ 2.

    Candidate generation is BANDED, exactly like MinHash LSH: the 16-bit
    fingerprint splits into 3 bands of 5/5/6 bits, and by pigeonhole any
    pair with Hamming ≤ 2 has its ≤ 2 differing bits in at most 2 bands —
    so at least ONE band matches exactly. Candidates come from an equi-join
    on (source, nib_id, nib_val); the fingerprints ride along, so exact
    Hamming verifies inline in the same join (no second pass), and a final
    distinct collapses pairs that collide in several bands. Pair cost is
    Σ bucket² per (source, band, value) instead of Σ source² — d+1 bands
    detect Hamming ≤ d; at 100 TB widen the fingerprint to 64 bits and
    band 3×21, same plan shape."""
    cat = Catalog(spark, sf_dir)
    # persist: fp feeds both sides of the band self-join; without it the
    # scan and the 16-lambda simhash expression run twice (same barrier
    # rationale as l2_minhash_neardup — at 100 TB fingerprints land in a
    # table first).
    fp = (
        word_hash_table(cat.documents, 1, "doc_id", "source")
        .select("doc_id", "source", _simhash_spark().alias("simhash"))
        .persist()
    )
    # 3 bands: bits 0-4, 5-9, 10-15
    bandvals = F.array(
        F.expr("simhash % 32"),
        F.expr("(simhash div 32) % 32"),
        F.expr("(simhash div 1024) % 64"),
    )
    bands = fp.select(
        "doc_id",
        "source",
        "simhash",
        F.posexplode(bandvals).alias("nib_id", "nib_val"),
    )
    hamming = F.bit_count(
        F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
    ).cast("int")
    return (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.source") == F.col("y.source"))
            & (F.col("x.nib_id") == F.col("y.nib_id"))
            & (F.col("x.nib_val") == F.col("y.nib_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 2)
        .distinct()
    )


# ---------------------------------------------------------------------------
# L2c: n-gram Jaccard (direct, blocked)
# ---------------------------------------------------------------------------


@query(
    "l2c_ngram_jaccard",
    diagnostic=True,
    oracle=f"""
    WITH wh_t AS (
      SELECT doc_id, source, lang, {WORD_HASH_DUCK} AS wh FROM documents
    ),
    sh_t AS (
      SELECT doc_id, source, lang, {shingle_expr_duck(2)} AS sh
      FROM wh_t WHERE len(wh) >= 2
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
             AS jaccard
    FROM sh_t a JOIN sh_t b
      ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.15
    """,
)
def l2c_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct word-bigram Jaccard within (source, lang) blocks, ≥ 0.15.
    The un-hashed baseline for l2: exact, but pair cost is quadratic per
    block — which is why MinHash exists. Registered ``diagnostic=True``:
    this is the recall yardstick for l2, NOT a scale path — at 100 TB run
    l2 (banded MinHash) instead; this one's per-block quadratic verify is
    only tractable at diagnostic corpus sizes."""
    cat = Catalog(spark, sf_dir)
    # persist: both join sides read sh_t; one scan + one shingle pass.
    sh_t = (
        word_hash_table(cat.documents, 2, "doc_id", "source", "lang")
        .select(
            "doc_id", "source", "lang", F.expr(shingle_expr_spark(2)).alias("sh")
        )
        .persist()
    )
    a, b = sh_t.alias("a"), sh_t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.15)
    )


# ---------------------------------------------------------------------------
# L17: near-dup cluster resolution (connected components + canonical pick)
# ---------------------------------------------------------------------------

_L17_ORACLE = f"""
WITH RECURSIVE {_minhash_sql_cte()},
bands AS (
  SELECT doc_id, b.band_id,
         CASE b.band_id WHEN 0 THEN band0 WHEN 1 THEN band1
                        WHEN 2 THEN band2 ELSE band3 END AS band_val
  FROM banded CROSS JOIN (VALUES (0), (1), (2), (3)) b(band_id)
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_val = y.band_val
   AND x.doc_id < y.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM cand
  JOIN banded sa ON sa.doc_id = doc_a
  JOIN banded sb ON sb.doc_id = doc_b
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
        >= 0.2
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id,
       MIN(label) AS cluster_id,
       MIN(label) = node AS keep
FROM reach
GROUP BY node
"""


@query("l17_dedup_clusters", oracle=_L17_ORACLE)
def l17_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER resolution: l2's verified pair set closed into
    connected components, with the minimum doc_id as each cluster's
    canonical survivor — (doc_id, cluster_id, keep). This is the step a
    real pipeline needs after candidate pairs: pairs (a,b) and (b,c) must
    drop BOTH b and c, which no per-pair rule gets right.

    Algorithm: min-label propagation with pointer jumping — each round
    every node takes the min label among itself and its neighbors, then
    short-circuits label -> label(label). Jumping makes convergence
    O(log diameter) rounds instead of O(diameter); near-dup components
    have tiny diameters, so 2-3 rounds is typical.

    Scale posture (100 TB): the graph is the VERIFIED near-dup pair set —
    orders of magnitude smaller than the corpus (its size tracks true
    duplicate density). Each round is one shuffle keyed on node;
    localCheckpoint() truncates the growing lineage exactly as
    GraphFrames' iterative algorithms do; loop control reads a 1-row
    aggregate per round, never result rows. The DuckDB oracle computes
    the same fixpoint as a recursive min-reachability CTE, so the cluster
    assignment — not just component counts — is value-checked."""
    pairs = l2_minhash_neardup(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.union(pairs.select("doc_b", "doc_a"))
        .toDF("src", "dst")
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    while True:
        neigh = (
            edges.join(labels, F.col("src") == F.col("node"))
            .groupBy(F.col("dst").alias("n2"))
            .agg(F.min("label").alias("nlabel"))
        )
        prop = (
            labels.join(neigh, F.col("node") == F.col("n2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nlabel", "label")
                ).alias("label"),
            )
        )
        jump = prop.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        nxt = (
            prop.join(jump, F.col("label") == F.col("jnode"))
            .select("node", F.col("jlabel").alias("label"))
            .localCheckpoint()
        )
        changed = (
            nxt.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = nxt
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("node")).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L32: triangle count + clustering coefficient over the near-dup graph
# ---------------------------------------------------------------------------
#
# Cluster-cohesion audit of the dedup pair set: triangles vs wedges over
# the l2 verified-pair graph. High global clustering means near-dup
# pairs close into tight clusters (the transitive closure l17 builds is
# faithful); low clustering flags chain-shaped false-positive bridges
# (a->b->c with a,c unrelated) that over-merge clusters.
#
# Triangle counting is the classic scale-sensitive graph kernel: with
# edges oriented low->high id, each triangle is counted exactly once by
# joining edge (a,b) x (b,c) x (a,c) — two equi-join shuffles on edge
# endpoints, never an all-pairs step. Wedges = Σ deg·(deg-1)/2 is one
# aggregate. Both integer-exact; the coefficient is one double division.


@query(
    "l32_dedup_triangles",
    oracle=f"""
    WITH edges AS ({_L2_ORACLE.strip()})
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM edges e1
         JOIN edges e2 ON e2.doc_a = e1.doc_b
         JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)
        AS n_triangles,
      (SELECT CAST(COALESCE(SUM(d * (d - 1) / 2), 0) AS BIGINT) FROM (
         SELECT COUNT(*) AS d FROM (
           SELECT doc_a AS n FROM edges
           UNION ALL SELECT doc_b FROM edges) GROUP BY n))
        AS n_wedges
    """,
)
def l32_dedup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles and wedges of the l2 near-dup graph (see block comment).
    Edges are already canonical (doc_a < doc_b), so the 3-way self-join
    counts each triangle once; degrees come from one explode+aggregate."""
    edges = l2_minhash_neardup(spark, sf_dir).select("doc_a", "doc_b").persist()
    tri = (
        edges.alias("e1")
        .join(edges.alias("e2"), F.col("e2.doc_a") == F.col("e1.doc_b"))
        .join(
            edges.alias("e3"),
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("doc_a").alias("n"))
        .unionAll(edges.select(F.col("doc_b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(
            F.coalesce(
                F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long"),
                F.lit(0),
            ).alias("n_wedges")
        )
    )
    return (
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(deg))
    )


# ---------------------------------------------------------------------------
# L34: quality-based cluster representatives
# ---------------------------------------------------------------------------
#
# Production pipelines keep the BEST document of each near-dup cluster,
# not the lowest id: l17's components re-scored so each cluster's
# representative maximizes (stopword-density ppm, word count) — an
# integer-exact stand-in for a quality-classifier score — with min
# doc_id as the final tie-break. One broadcast-join of the (small)
# cluster table onto the quality projection, one per-cluster argmax
# window over cluster-sized groups.

_L34_QUALITY_SQL = """
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(FLOOR(1000000.0 * len(list_filter(string_split(text, ' '),
                w -> w IN ({stops})))
              / len(string_split(text, ' '))) AS BIGINT) AS stop_ppm
  FROM documents
"""


def _l34_oracle() -> str:
    from cassandra_spark.operators.llm_text import _STOP_SQL

    # reuse l17's recursive-component body up to its final SELECT
    body = _L17_ORACLE[: _L17_ORACLE.index("SELECT node AS doc_id")]
    body = body.rstrip().rstrip(",")
    return f"""
    {body},
    members AS (
      SELECT node AS doc_id, MIN(label) AS cluster_id
      FROM reach GROUP BY node
    ),
    scored AS (
      SELECT m.cluster_id, m.doc_id, q.stop_ppm, q.n_words,
             row_number() OVER (
               PARTITION BY m.cluster_id
               ORDER BY q.stop_ppm DESC, q.n_words DESC, m.doc_id)
               AS rn
      FROM members m
      JOIN ({_L34_QUALITY_SQL.format(stops=_STOP_SQL)}) q
        ON q.doc_id = m.doc_id
    )
    SELECT s.cluster_id, s.doc_id AS rep_doc,
           s.stop_ppm AS rep_stop_ppm, s.n_words AS rep_words,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM members m2
             WHERE m2.cluster_id = s.cluster_id) AS n_members
    FROM scored s WHERE s.rn = 1
    ORDER BY s.cluster_id
    """


@query("l34_cluster_representatives", oracle=_l34_oracle())
def l34_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based survivor selection per near-dup cluster (see block
    comment): l17's components joined to an integer-exact quality score,
    per-cluster argmax by (stop_ppm, n_words, min doc_id)."""
    from cassandra_spark.operators.llm_text import STOPWORDS

    cat = Catalog(spark, sf_dir)
    members = l17_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    words = F.split(F.col("text"), " ")
    quality = cat.documents.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.floor(
            1_000_000.0
            * F.size(F.expr(f"filter(split(text, ' '), w -> w IN ({stops}))"))
            / F.size(words)
        ).cast("long").alias("stop_ppm"),
    )
    scored = members.join(quality, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("stop_ppm"), F.desc("n_words"), "doc_id"
    )
    sizes = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(sizes, "cluster_id")
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc"),
            F.col("stop_ppm").alias("rep_stop_ppm"),
            F.col("n_words").alias("rep_words"),
            "n_members",
        )
        .orderBy("cluster_id")
    )
