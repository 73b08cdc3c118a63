"""L-tier text analysis: corpus quality stats (L5), language-ID heuristic
(L6), token counting (L7), document fingerprinting (L8). SURVEY.md §2.12.

All JVM-side expressions (no Python in the hot path); integer/exact-ratio
outputs so both engines agree bit-for-bit. The portable char-fold hash from
llm_dedup is reused for fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators.llm_dedup import MOD, WORD_HASH_DUCK, WORD_HASH_SPARK
from cassandra_spark.registry import query

STOPWORDS = ("the", "a", "an", "of", "to", "in", "is", "and")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "l5_text_stats",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_words,
             n_chars,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ({_STOP_SQL}))) AS n_stop
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS DOUBLE) / COUNT(*) AS avg_words,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(n_stop) AS DOUBLE) / SUM(n_words) AS stop_ratio
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def l5_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus quality profile: doc counts, mean length, and
    stopword ratio — the standard quality-scoring signals. Ratios are
    exact-integer sums divided once in double (order-independent)."""
    cat = Catalog(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    per_doc = cat.documents.select(
        "lang",
        F.size(words).alias("n_words"),
        "n_chars",
        F.size(
            F.expr(f"filter(split(text, ' '), w -> w IN ({stop_list}))")
        ).alias("n_stop"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_words").cast("double") / F.count(F.lit(1))).alias(
                "avg_words"
            ),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "avg_chars"
            ),
            (F.sum("n_stop").cast("double") / F.sum("n_words")).alias(
                "stop_ratio"
            ),
        )
        .orderBy("lang")
    )


# Marker vocabularies for the n-gram language-ID heuristic. On a real
# corpus these are character n-gram profiles; the fixture's text is
# synthetic word soup, so the *mechanism* (score per language, argmax with
# deterministic tie-break) is what's exercised.
LANG_MARKERS = {
    "en": ("the", "a", "is", "and", "value"),
    "de": ("der", "die", "und", "table", "merge"),
    "es": ("el", "la", "que", "scan", "fast"),
}


def _score_sql(markers: tuple[str, ...], dialect: str) -> str:
    lst = ", ".join(f"'{w}'" for w in markers)
    if dialect == "spark":
        return f"size(filter(split(text, ' '), w -> w IN ({lst})))"
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({lst})))"


@query(
    "l6_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_score_sql(LANG_MARKERS['en'], 'duck')} AS s_en,
             {_score_sql(LANG_MARKERS['de'], 'duck')} AS s_de,
             {_score_sql(LANG_MARKERS['es'], 'duck')} AS s_es
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(s_en AS INTEGER) AS s_en,
           CAST(s_de AS INTEGER) AS s_de,
           CAST(s_es AS INTEGER) AS s_es,
           CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS lang_guess
    FROM scored
    """,
)
def l6_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID: marker-vocabulary hit counts per language, argmax with
    a fixed preference order (en > de > es) for ties."""
    cat = Catalog(spark, sf_dir)
    scored = cat.documents.select(
        "doc_id",
        "lang",
        F.expr(_score_sql(LANG_MARKERS["en"], "spark")).alias("s_en"),
        F.expr(_score_sql(LANG_MARKERS["de"], "spark")).alias("s_de"),
        F.expr(_score_sql(LANG_MARKERS["es"], "spark")).alias("s_es"),
    )
    guess = (
        F.when(
            (F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_es")),
            F.lit("en"),
        )
        .when(F.col("s_de") >= F.col("s_es"), F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return scored.select(
        "doc_id", "lang", "s_en", "s_de", "s_es", guess.alias("lang_guess")
    )


@query(
    "l7_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\\s+')) AS INTEGER)
             AS ws_tokens,
           CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS INTEGER)
             AS punct_chars,
           CAST(len(string_split_regex(text, '\\s+'))
                + length(regexp_replace(text, '[\\w\\s]', '', 'g'))
                AS INTEGER) AS est_bpe_tokens,
           CAST(n_chars AS DOUBLE)
             / len(string_split_regex(text, '\\s+')) AS chars_per_token
    FROM documents
    """,
)
def l7_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish estimate (whitespace
    tokens + punctuation chars — punctuation splits into its own tokens in
    BPE vocabularies). chars_per_token is the standard packing signal."""
    cat = Catalog(spark, sf_dir)
    ws = F.size(F.split(F.col("text"), r"\s+"))
    punct = F.length(F.regexp_replace(F.col("text"), r"[\w\s]", ""))
    return cat.documents.select(
        "doc_id",
        ws.alias("ws_tokens"),
        punct.alias("punct_chars"),
        (ws + punct).alias("est_bpe_tokens"),
        (F.col("n_chars").cast("double") / ws).alias("chars_per_token"),
    )


@query(
    "l9_quality_score",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             n_chars,
             length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ({_STOP_SQL}))) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS INTEGER) AS n_words,
           CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
           CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
           CAST(n_chars AS DOUBLE) / n_words AS mean_word_len,
           CASE WHEN n_words >= 5
                 AND CAST(n_punct AS DOUBLE) / n_chars < 0.2
                 AND CAST(n_stop AS DOUBLE) / n_words BETWEEN 0.0 AND 0.6
                THEN TRUE ELSE FALSE END AS keep
    FROM per_doc
    """,
)
def l9_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring — the filter stage of a training-data
    pipeline: length, punctuation ratio, stopword ratio, mean word length,
    and a boolean keep decision (Gopher-rule shape). One narrow pass, no
    shuffle; at 100 TB this is a streaming map over the corpus scan."""
    cat = Catalog(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    per_doc = cat.documents.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.col("n_chars"),
        F.length(F.regexp_replace(F.col("text"), r"[\w\s]", "")).alias(
            "n_punct"
        ),
        F.size(
            F.expr(f"filter(split(text, ' '), w -> w IN ({stop_list}))")
        ).alias("n_stop"),
    )
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_words")
    keep = (
        (F.col("n_words") >= 5)
        & (punct_ratio < 0.2)
        & (stop_ratio >= 0.0)
        & (stop_ratio <= 0.6)
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        (F.col("n_chars").cast("double") / F.col("n_words")).alias(
            "mean_word_len"
        ),
        keep.alias("keep"),
    )


@query(
    "l10_tfidf",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS _one
      FROM tokens GROUP BY doc_id, token
    ),
    df_t AS (
      SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT token,
           CAST(doc_freq AS BIGINT) AS doc_freq,
           round(ln(CAST(n_docs AS DOUBLE) / doc_freq), 9) AS idf
    FROM df_t, n
    WHERE doc_freq >= 10
    """,
)
def l10_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF table (the join side of TF-IDF): explode distinct tokens per doc
    → document frequency → ln(N/df). The per-doc TF side is u3_explode's
    plan shape; scoring joins this (broadcast — vocabulary ≪ corpus) back
    onto term counts. Partial aggregation keeps the shuffle at vocabulary
    size, not token-occurrence size."""
    cat = Catalog(spark, sf_dir)
    docs = cat.documents
    n_docs = docs.count()  # scalar — one job over footer-only count
    tokens = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias(
            "token"
        ),
    )
    return (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= 10)
        .select(
            "token",
            "doc_freq",
            # round(·, 9): ln is transcendental and DuckDB's libm vs the
            # JVM's Math.log differ in the last ulp for some inputs; 9
            # decimals is exact for any IDF purpose and engine-stable
            F.round(
                F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 9
            ).alias("idf"),
        )
    )


@query(
    "l8_fingerprint",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id,
             lower(regexp_replace(text, '\\s+', ' ', 'g')) AS t,
             {WORD_HASH_DUCK} AS wh
      FROM documents
    )
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(t, ''), c -> ascii(c))),
             (a, b) -> (a * 31 + b) % {MOD}) AS doc_fp,
           list_aggregate(wh, 'min') AS min_word_hash
    FROM norm
    """,
)
def l8_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: rolling polynomial hash of the normalized
    text (content identity robust to whitespace/case) + the min word hash
    (a 1-permutation MinHash — the winnowing representative)."""
    cat = Catalog(spark, sf_dir)
    return cat.documents.select(
        "doc_id",
        F.expr(
            "aggregate(transform(split(lower(regexp_replace(text, '\\\\s+', ' ')), "
            f"''), c -> ascii(c)), 0L, (acc, x) -> (acc * 31 + x) % {MOD})"
        ).alias("doc_fp"),
        F.expr(f"array_min({WORD_HASH_SPARK})").alias("min_word_hash"),
    )


# --- training-data assembly: packing and splits ----------------------------

PACK_BUDGET = 512  # tokens per packed training sequence (fixture-sized)


@query(
    "l11_token_pack",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    packed AS (
      SELECT source, doc_id, n_tok,
             CAST(FLOOR((SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
               / {PACK_BUDGET}) AS BIGINT) AS bin
      FROM toks
    )
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM packed
    GROUP BY source, bin
    ORDER BY source, bin
    """,
)
def l11_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: concat-and-chunk documents into
    ~PACK_BUDGET-token bins, deterministically (per source, doc_id order) —
    the sequence-assembly step of an LLM data pipeline. bin = floor(tokens
    before this doc / budget), i.e. each doc joins the bin its first token
    lands in. One narrow shuffle on source for the running sum, reused by
    the per-(source,bin) rollup; at 100 TB the partition key becomes
    (source, date_shard) so no single source serializes."""
    cat = Catalog(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = cat.documents.select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    packed = toks.withColumn(
        "bin",
        F.floor(
            (F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(PACK_BUDGET)
        ),
    )
    return (
        packed.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .orderBy("source", "bin")
    )


# Knuth multiplicative hash: stable across engines (pure int64 arithmetic),
# uncorrelated with doc_id ordering — the standard deterministic split.
_SPLIT_HASH = "(doc_id * 2654435761) % 4294967296"


@query(
    "l12_hash_split",
    oracle=f"""
    SELECT CASE WHEN ({_SPLIT_HASH}) % 1000 < 900 THEN 'train'
                WHEN ({_SPLIT_HASH}) % 1000 < 950 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    ORDER BY split
    """,
)
def l12_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by multiplicative hash of
    the document key — membership is a pure projection (no shuffle, no
    stored split column, stable under re-runs and appends), the property a
    100 TB pipeline needs to re-derive splits on every read."""
    cat = Catalog(spark, sf_dir)
    bucket = F.expr(_SPLIT_HASH) % 1000
    return (
        cat.documents.select(
            F.when(bucket < 900, "train")
            .when(bucket < 950, "val")
            .otherwise("test")
            .alias("split"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


# --- L20: overlapping-window chunking ---------------------------------------

CHUNK_W = 64   # window length (tokens)
CHUNK_S = 48   # stride (tokens) -> 16-token overlap


@query(
    "l20_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE doc_id % 5 = 2
    )
    SELECT doc_id,
           CAST(ci AS INTEGER) AS chunk_idx,
           CAST(ci * {CHUNK_S} AS INTEGER) AS start_tok,
           CAST(len(w[ci * {CHUNK_S} + 1 : ci * {CHUNK_S} + {CHUNK_W}])
                AS INTEGER) AS n_tok,
           md5(array_to_string(
               w[ci * {CHUNK_S} + 1 : ci * {CHUNK_S} + {CHUNK_W}], ' '))
             AS chunk_md5
    FROM toks,
         unnest(range(CAST(1 + ceil(greatest(0, n - {CHUNK_W}) / {CHUNK_S}.0)
                           AS BIGINT))) AS t(ci)
    """,
)
def l20_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking (context-window assembly with overlap —
    the retrieval/pretraining chunker): windows of CHUNK_W tokens every
    CHUNK_S, last window ragged. Row-expanding explode of a per-doc index
    sequence — no shuffle at all; chunk identity is the md5 of the joined
    window (md5 is bit-identical across engines, so the oracle checks the
    exact chunk CONTENT, not just geometry). At 100 TB chunk text never
    materializes driver-side and each task expands only its own docs."""
    cat = Catalog(spark, sf_dir)
    toks = cat.documents.filter(F.col("doc_id") % 5 == 2).select(
        "doc_id",
        F.split(F.col("text"), " ").alias("w"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    )
    n_chunks = F.expr(
        f"CAST(1 + ceil(greatest(0, n - {CHUNK_W}) / {CHUNK_S}.0) AS BIGINT)"
    )
    return (
        toks.withColumn("ci", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "doc_id",
            F.col("ci").cast("int").alias("chunk_idx"),
            (F.col("ci") * CHUNK_S).cast("int").alias("start_tok"),
            F.expr(f"size(slice(w, ci * {CHUNK_S} + 1, {CHUNK_W}))")
            .cast("int")
            .alias("n_tok"),
            F.md5(
                F.expr(
                    f"array_join(slice(w, ci * {CHUNK_S} + 1, {CHUNK_W}), ' ')"
                ).cast("binary")
            ).alias("chunk_md5"),
        )
    )


# --- L21: bigram-LM quality scoring (exact integer math) --------------------


@query(
    "l21_bigram_lm",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents
    ), bg AS (
      SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      FROM toks, unnest(range(1, len(w))) AS t(i)
    ), c12 AS (
      SELECT w1, w2, COUNT(*) AS c12,
             SUM(COUNT(*)) OVER (PARTITION BY w1) AS c1
      FROM bg GROUP BY w1, w2
    )
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(1000000 * c12.c12 // c12.c1) AS BIGINT) AS lm_score,
           CAST(SUM(1000000 * c12.c12 // c12.c1) // COUNT(*) AS BIGINT)
             AS mean_score
    FROM bg JOIN c12 USING (w1, w2)
    GROUP BY bg.doc_id
    """,
)
def l21_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM fluency scoring (the perplexity-filter stage of a data
    pipeline, integer-exact): score(doc) = Σ floor(1e6 · c(w1,w2)/c(w1·))
    over its bigrams — a monotone stand-in for Σ log p(w2|w1) that stays
    bit-exact cross-engine (floored integer ratios; no transcendentals).

    Shape: one explode (no shuffle) → bigram-count aggregation with the
    prefix total derived by a WINDOW over the grouped counts (so the raw
    bigram stream shuffles ONCE, not twice) → one join back keyed on the
    bigram, map-side-combined per-doc rollup. At 100 TB the counts table
    is the natural persist-and-reuse artifact, and stop-word-headed
    bigrams (the hot keys) are handled by AQE skew splitting on the
    score join."""
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    toks = cat.documents.select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    ).filter(F.size("w") >= 2)
    # (single-token docs have no bigrams; without the guard Spark's
    # sequence(1, 0) would DESCEND and fabricate NULL bigrams that
    # inflate the c1 window — the oracle's range(1, 1) is simply empty)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> struct(w[i - 1] AS w1, w[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .withColumn("c1", F.sum("c12").over(Window.partitionBy("w1")))
    )
    return (
        bg.join(c12, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.expr("1000000 * c12 DIV c1")
            ).alias("lm_score"),
        )
        .withColumn(
            "mean_score", F.expr("lm_score DIV n_bigrams")
        )
    )


# Seeded two-round multiplicative mix, pure int64 arithmetic so it is
# bit-identical on Spark and DuckDB. Same family as _SPLIT_HASH above /
# llm_pipeline._MIX_HASH (each formula is frozen by its query's oracle,
# so they stay separate definitions); the seeded form differs in that
# BOTH multipliers are < 2^31 and doc_id is pre-reduced mod 2^32
# (non-negative via the double-mod), so no intermediate exceeds int64
# for ANY int64 doc_id — (2^32) * 1812433253 < 2^63 — where the
# unseeded forms assume doc_id < ~3.4e9. Distinct seeds give
# decorrelated orders over the same corpus.
_SHUF_D = "(((doc_id % 4294967296) + 4294967296) % 4294967296)"
_SHUF_H1 = f"(({_SHUF_D} * 1566083941 + {{seed}} * 40503) % 4294967296)"
_SHUF_H = f"(({_SHUF_H1} * 1812433253) % 4294967296)"
_SHUF_BUCKETS = 64
_SHUF_WIDTH = 4294967296 // _SHUF_BUCKETS


def shuffle_key(seed: int):
    """Spark Column: the deterministic shuffle key H(seed, doc_id)."""
    return F.expr(_SHUF_H.format(seed=seed))


@query(
    "l28_epoch_shuffle",
    oracle=f"""
    SELECT seed, ({_SHUF_H.format(seed='seed')}) // {_SHUF_WIDTH} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN({_SHUF_H.format(seed='seed')}) AS BIGINT) AS min_h,
           CAST(MAX({_SHUF_H.format(seed='seed')}) AS BIGINT) AS max_h,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM documents CROSS JOIN (VALUES (0), (1)) s(seed)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def l28_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L28: deterministic seeded EPOCH SHUFFLE — the training-order
    primitive (each epoch reads the corpus in a different, reproducible
    pseudo-random order). Order is defined positionally-free, the only
    shape that scales: shuffle key H = seeded two-round multiplicative
    mix of doc_id; file bucket = H's top bits (FIXED-width ranges — no
    repartitionByRange sampling, so the assignment is deterministic and
    oracle-checkable); within-bucket order = sort by H. Writing epoch
    files is then `.repartition(N, bucket).sortWithinPartitions(H)` —
    ONE exchange, partition-local sorts, no global sort barrier and no
    driver-side position counter. Changing the seed permutes both
    bucket assignment and within-bucket order (decorrelation pinned in
    tests). The entry aggregates per-(seed, bucket) count / H range /
    id checksum for two epochs — exactly the file-level artifact a
    trainer's data loader consumes."""
    cat = Catalog(spark, sf_dir)
    seeds = spark.range(2).select(F.col("id").cast("int").alias("seed"))
    docs = cat.documents.select("doc_id").crossJoin(F.broadcast(seeds))
    h = F.expr(_SHUF_H.format(seed="seed"))
    return (
        docs.withColumn("h", h)
        .withColumn("bucket", (F.col("h") / F.lit(_SHUF_WIDTH)).cast("long"))
        .groupBy("seed", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("seed", "bucket")
    )


# ---------------------------------------------------------------------------
# L33: n-gram novelty curve — corpus redundancy by source
# ---------------------------------------------------------------------------


from cassandra_spark.operators.llm_dedup import (  # noqa: E402
    shingle_expr_duck as _sh_duck,
)

_L33_SH_DUCK = _sh_duck(3)


@query(
    "l33_ngram_novelty",
    oracle=f"""
    WITH wh_t AS (
      SELECT doc_id, source, {WORD_HASH_DUCK} AS wh FROM documents
    ),
    grams AS (
      SELECT doc_id, source, unnest({_L33_SH_DUCK}) AS g
      FROM wh_t WHERE len(wh) >= 3
    ),
    firsts AS (
      SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_gram_occurrences,
           CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(FLOOR(1000000 * CAST(SUM(CASE WHEN doc_id = first_doc
                                        THEN 1 ELSE 0 END) AS DOUBLE)
                      / COUNT(*)) AS BIGINT) AS novelty_ppm
    FROM grams JOIN firsts USING (g)
    GROUP BY source
    ORDER BY source
    """,
)
def l33_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty: the fraction of distinct-3-gram
    occurrences whose GLOBAL first occurrence (min doc_id) is that
    occurrence's own document — the corpus-redundancy curve that tells a
    pipeline how much a span-level dedup (l27) will reclaim, per source.
    Integer outputs (counts + a floor-ppm rate) hash identically across
    engines. Shape: one tokenize pass, one gram explode, one min
    aggregate keyed by gram content, one join back, one per-source
    aggregate — two content-keyed shuffles total, both on uniformly
    hashed keys."""
    from cassandra_spark.operators.llm_dedup import (
        shingle_expr_spark,
        word_hash_table,
    )

    cat = Catalog(spark, sf_dir)
    wh_t = word_hash_table(cat.documents, 3, "doc_id", "source")
    grams = wh_t.select(
        "doc_id",
        "source",
        F.explode(F.expr(shingle_expr_spark(3))).alias("g"),
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    joined = grams.join(firsts, "g")
    novel = F.sum(
        F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
    ).cast("long")
    return (
        joined.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_gram_occurrences"),
            novel.alias("n_novel"),
            F.floor(
                1_000_000
                * novel.cast("double")
                / F.count(F.lit(1))
            ).cast("long").alias("novelty_ppm"),
        )
        .orderBy("source")
    )


@query(
    "l46_repetition_metrics",
    # integer-exact char counts; ONE double division at the end, so the
    # cross-engine values are bit-identical
    oracle="""
    WITH w AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS ws
      FROM documents
    ),
    g2 AS (
      SELECT doc_id,
             unnest(list_transform(range(len(ws) - 1),
                                   i -> ws[i + 1] || ' ' || ws[i + 2]))
               AS gram
      FROM w
    ),
    c2 AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY doc_id, gram
    ),
    t2 AS (
      SELECT doc_id, MAX(cnt * length(gram)) AS top2_chars
      FROM c2 GROUP BY doc_id
    ),
    g3 AS (
      SELECT doc_id,
             unnest(list_transform(range(len(ws) - 2),
                                   i -> ws[i + 1] || ' ' || ws[i + 2]
                                        || ' ' || ws[i + 3])) AS gram
      FROM w
    ),
    c3 AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM g3 GROUP BY doc_id, gram
    ),
    d3 AS (
      SELECT doc_id, SUM(cnt * length(gram)) AS dup3_chars
      FROM c3 WHERE cnt > 1 GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(COALESCE(top2_chars, 0) AS DOUBLE) / n_chars AS top2_frac,
           CAST(COALESCE(dup3_chars, 0) AS DOUBLE) / n_chars AS dup3_frac,
           (CAST(COALESCE(top2_chars, 0) AS DOUBLE) / n_chars > 0.20
            OR CAST(COALESCE(dup3_chars, 0) AS DOUBLE) / n_chars > 0.18)
             AS repetitive
    FROM w LEFT JOIN t2 USING (doc_id) LEFT JOIN d3 USING (doc_id)
    ORDER BY doc_id
    """,
)
def l46_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-quality rules from the MassiveText/Gopher filtering
    recipe ([Rae et al. 2021, public]) — the per-document CHARACTER-
    fraction form (l15_repetition is the complementary per-language
    rollup over word/gram COUNTS): per document, the character
    fraction occupied by (a) the single most character-occupying word
    2-gram (count x gram length — unique as a number even under count
    ties, so no cross-engine tie-break is needed) and (b) all word
    3-grams occurring more than once (all occurrences counted); a doc
    is flagged ``repetitive`` past the published-style thresholds
    (0.20 / 0.18).

    Spark-first shape: n-gram expansion is a JVM-side ``transform`` +
    ``explode`` (no Python), counts shuffle on the content key
    (doc_id, gram) with map-side partial aggregation, and the per-doc
    reductions are plain MAX/SUM — never a collect, never all-pairs;
    the whole plan is flat per document and scales with the corpus."""
    cat = Catalog(spark, sf_dir)
    docs = cat.documents.select(
        "doc_id", "n_chars", F.split("text", " ").alias("ws")
    )

    def grams(n: int):
        # guard: Spark's sequence(0, -k) generates DESCENDING values,
        # so short docs must short-circuit to an empty array
        expr = (
            f"CASE WHEN size(ws) >= {n} THEN "
            f"transform(sequence(0, size(ws) - {n}), i -> "
            f"concat_ws(' ', {', '.join(f'ws[i + {j}]' for j in range(n))}"
            f")) ELSE array() END"
        )
        return docs.select(
            "doc_id", F.explode(F.expr(expr)).alias("gram")
        ).groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))

    t2 = grams(2).groupBy("doc_id").agg(
        F.max(F.col("cnt") * F.length("gram")).alias("top2_chars")
    )
    d3 = (
        grams(3)
        .filter(F.col("cnt") > 1)
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.length("gram")).alias("dup3_chars"))
    )
    top2 = F.coalesce(F.col("top2_chars"), F.lit(0)).cast(
        "double"
    ) / F.col("n_chars")
    dup3 = F.coalesce(F.col("dup3_chars"), F.lit(0)).cast(
        "double"
    ) / F.col("n_chars")
    return (
        docs.select("doc_id", "n_chars")
        .join(t2, "doc_id", "left")
        .join(d3, "doc_id", "left")
        .select(
            "doc_id",
            top2.alias("top2_frac"),
            dup3.alias("dup3_frac"),
            ((top2 > 0.20) | (dup3 > 0.18)).alias("repetitive"),
        )
        .orderBy("doc_id")
    )


# PII span patterns for the s19 streaming quality gate (the batch PII
# scrub itself is l14_pii_scrub in llm_pipeline.py). RE2/Java-common
# subset so Spark and DuckDB match the same spans; ground-truth PII is
# injected deterministically (the corpus is clean word soup).
_PII_EMAIL_RE = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
_PII_PHONE_RE = r"\d{3}-\d{4}"
# Spark SQL string literals treat backslash as an escape — the same
# pattern needs its backslashes doubled there (DuckDB takes it verbatim)
_PII_EMAIL_SPARK = _PII_EMAIL_RE.replace("\\", "\\\\")
_PII_PHONE_SPARK = _PII_PHONE_RE.replace("\\", "\\\\")
_PII_T2_SPARK = (
    "concat(text, CASE WHEN doc_id % 3 = 0 THEN "
    "concat(' user', doc_id, '@example.com') ELSE '' END, "
    "CASE WHEN doc_id % 5 = 0 THEN "
    "concat(' call 555-01', lpad(cast(doc_id % 100 AS string), 2, '0')) "
    "ELSE '' END)"
)
_PII_T2_DUCK = (
    "text || (CASE WHEN doc_id % 3 = 0 THEN "
    "' user' || doc_id || '@example.com' ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') "
    "ELSE '' END)"
)
