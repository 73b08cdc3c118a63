"""L-tier text analysis: corpus quality stats (L5), language-ID heuristic
(L6), token counting (L7), document fingerprinting (L8). SURVEY.md §2.12.

All JVM-side expressions (no Python in the hot path); integer/exact-ratio
outputs so both engines agree bit-for-bit. The portable char-fold hash from
llm_dedup is reused for fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
