"""L-tier training-data assembly ops beyond per-doc analysis: train/test
contamination check (L13), PII scrubbing (L14), intra-doc repetition
scoring (L15), weighted source mixing (L16). SURVEY.md §2.12.

These are the corpus-hygiene steps between raw documents and training
sequences. Everything stays JVM-side (higher-order array functions +
regexp), integer/exact outputs so Spark and DuckDB agree bit-for-bit.

Scale posture (100 TB): L13 is the one with a real shuffle — test-doc
n-grams join the distinct train-gram set on gram hash. Partial-agg distinct
runs map-side; the join key is a uniform hash so no skew; at full scale the
train-gram set would additionally get a bloom-filter pre-pass
(spark.sql.optimizer.runtime.bloomFilter.enabled) so most test grams never
shuffle. L14/L15 are pure projections; L16 is projection + one rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators.llm_dedup import (
    MOD,
    P2,
    P3,
    WORD_HASH_DUCK,
    WORD_HASH_SPARK,
    _minhash_sql_cte,
    word_hash_table,
)
from cassandra_spark.registry import query

# Same Knuth multiplicative hash family as l12_hash_split, shifted so the
# contamination split and the mixing sample are uncorrelated with it.
_SPLIT_HASH = "(doc_id * 2654435761) % 4294967296"
_MIX_HASH = "((doc_id * 2654435761 + 40503) % 4294967296)"

_GRAM_SPARK = (
    f"transform(sequence(0, size(wh) - 3), "
    f"i -> (wh[i] + wh[i+1] * {P2} + wh[i+2] * {P3}) % {MOD})"
)
_GRAM_DUCK = (
    f"list_transform(range(1, len(wh) - 1), "
    f"i -> (wh[i] + wh[i+1] * {P2} + wh[i+2] * {P3}) % {MOD})"
)


@query(
    "l13_contamination",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, source, {WORD_HASH_DUCK} AS wh FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    grams AS (
      SELECT doc_id, source,
             CASE WHEN ({_SPLIT_HASH}) % 1000 < 900 THEN 'train' ELSE 'eval'
             END AS split,
             list_distinct({_GRAM_DUCK}) AS g
      FROM hashed
    ),
    train_grams AS (
      SELECT DISTINCT UNNEST(g) AS gram FROM grams WHERE split = 'train'
    ),
    eval_grams AS (
      SELECT doc_id, source, UNNEST(g) AS gram FROM grams WHERE split = 'eval'
    ),
    per_doc AS (
      SELECT e.doc_id, e.source,
             COUNT(*) AS n_grams,
             COUNT(t.gram) AS n_hit
      FROM eval_grams e LEFT JOIN train_grams t ON e.gram = t.gram
      GROUP BY e.doc_id, e.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_eval_docs,
           CAST(SUM(CASE WHEN n_hit * 2 >= n_grams THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(n_grams) AS BIGINT) AS total_grams,
           CAST(SUM(n_hit) AS BIGINT) AS total_hits
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def l13_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check (the n-gram-overlap decontamination
    step of an LLM data pipeline): split the corpus 90/10 by key hash,
    then for every eval doc measure how many of its distinct word-3-gram
    hashes appear anywhere in the train split. A doc with >= 50% hit rate
    is contaminated. Integer counts per source."""
    cat = Catalog(spark, sf_dir)
    # word_hash_table is the barrier that keeps the per-char hash lambda
    # from being inlined into every wh[i] access of _GRAM_SPARK; the second
    # persist exists because `hashed` feeds both the train and eval branch.
    hashed = (
        word_hash_table(cat.documents, 3, "doc_id", "source")
        .select(
            "doc_id",
            "source",
            F.when(F.expr(_SPLIT_HASH) % 1000 < 900, "train")
            .otherwise("eval")
            .alias("split"),
            F.array_distinct(F.expr(_GRAM_SPARK)).alias("g"),
        )
        .persist()
    )
    train_grams = (
        hashed.filter(F.col("split") == "train")
        .select(F.explode("g").alias("gram"))
        .distinct()
    )
    eval_grams = hashed.filter(F.col("split") == "eval").select(
        "doc_id", "source", F.explode("g").alias("gram")
    )
    per_doc = (
        eval_grams.join(train_grams.withColumn("hit", F.lit(1)), "gram", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hit"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_eval_docs"),
            F.sum(
                F.when(F.col("n_hit") * 2 >= F.col("n_grams"), 1).otherwise(0)
            ).alias("n_contaminated"),
            F.sum("n_grams").alias("total_grams"),
            F.sum("n_hit").alias("total_hits"),
        )
        .orderBy("source")
    )


# The fixture text has no real PII, so graft a deterministic synthetic
# email + phone per doc before scrubbing — the redaction math is then
# non-trivial while staying a pure function of the input.
_WITH_PII_SPARK = (
    "concat(text, ' contact user', cast(doc_id as string), "
    "'@example.com or +1-555-', lpad(cast(doc_id % 10000 as string), 4, '0'))"
)
_WITH_PII_DUCK = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) "
    "|| '@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@query(
    "l14_pii_scrub",
    oracle=f"""
    WITH pii AS (
      SELECT source, {_WITH_PII_DUCK} AS raw FROM documents
    ),
    scrubbed AS (
      SELECT source, raw,
             regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                            '{_PHONE_RE}', '[PHONE]', 'g') AS clean
      FROM pii
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(raw) - len(clean)) AS BIGINT) AS chars_removed,
           CAST(SUM(len(clean) - len(replace(clean, '[EMAIL]', ''))) / 7
                AS BIGINT) AS n_emails,
           CAST(SUM(len(clean) - len(replace(clean, '[PHONE]', ''))) / 7
                AS BIGINT) AS n_phones
    FROM scrubbed
    GROUP BY source
    ORDER BY source
    """,
)
def l14_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regexp-redact emails and phone numbers to [EMAIL] /
    [PHONE] placeholders, reporting per-source docs touched, characters
    removed, and redaction counts. Redaction is a pure projection — no
    shuffle before the final rollup; at 100 TB this runs in the scan
    stage fused with whatever filter precedes it."""
    cat = Catalog(spark, sf_dir)
    raw = F.expr(_WITH_PII_SPARK)
    clean = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    scrubbed = cat.documents.select(
        "source",
        F.length(raw).alias("len_raw"),
        F.length(clean).alias("len_clean"),
        (
            (F.length(clean) - F.length(F.replace(clean, F.lit("[EMAIL]"), F.lit(""))))
            / 7
        ).cast("long").alias("n_email"),
        (
            (F.length(clean) - F.length(F.replace(clean, F.lit("[PHONE]"), F.lit(""))))
            / 7
        ).cast("long").alias("n_phone"),
    )
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("len_raw") - F.col("len_clean")).alias("chars_removed"),
            F.sum("n_email").alias("n_emails"),
            F.sum("n_phone").alias("n_phones"),
        )
        .orderBy("source")
    )


@query(
    "l15_repetition",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, lang, {WORD_HASH_DUCK} AS wh FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    per_doc AS (
      SELECT lang,
             len(wh) AS n_words,
             len(list_distinct(wh)) AS n_distinct,
             len({_GRAM_DUCK}) - len(list_distinct({_GRAM_DUCK})) AS dup_grams
      FROM hashed
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words - n_distinct) AS BIGINT) AS repeated_words,
           CAST(SUM(dup_grams) AS BIGINT) AS dup_grams,
           CAST(SUM(CASE WHEN dup_grams * 5 >= len_grams THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged
    FROM (SELECT *, n_words - 2 AS len_grams FROM per_doc)
    GROUP BY lang
    ORDER BY lang
    """,
)
def l15_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition scoring (boilerplate / degenerate-text
    filter): per doc, count repeated words and duplicate word-3-grams;
    flag docs whose duplicate-gram fraction is >= 20%. Pure projection +
    rollup, zero joins — the cheap first-pass filter a 100 TB pipeline
    runs before any pairwise dedup."""
    cat = Catalog(spark, sf_dir)
    hashed = (
        cat.documents.withColumn("wh", F.expr(WORD_HASH_SPARK))
        .filter(F.size("wh") >= 3)
        .select(
            "lang",
            F.size("wh").alias("n_words"),
            F.size(F.array_distinct("wh")).alias("n_distinct"),
            (
                F.size(F.expr(_GRAM_SPARK))
                - F.size(F.array_distinct(F.expr(_GRAM_SPARK)))
            ).alias("dup_grams"),
        )
        .withColumn("len_grams", F.col("n_words") - 2)
    )
    return (
        hashed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_words") - F.col("n_distinct")).alias("repeated_words"),
            F.sum("dup_grams").alias("dup_grams"),
            F.sum(
                F.when(F.col("dup_grams") * 5 >= F.col("len_grams"), 1).otherwise(0)
            ).alias("n_flagged"),
        )
        .orderBy("lang")
    )


# Per-source sampling rate in permille: derived from the numeric suffix so
# the mix is deterministic and visibly non-uniform across sources.
_RATE_SPARK = "100 + 40 * (cast(substring(source, 4) as int) % 20)"
_RATE_DUCK = "100 + 40 * (CAST(source[4:] AS INT) % 20)"


@query(
    "l16_source_mix",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ({_MIX_HASH}) % 1000 < ({_RATE_DUCK})
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN ({_MIX_HASH}) % 1000 < ({_RATE_DUCK})
                         THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def l16_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing (curriculum sampling): each source gets a
    deterministic keep-rate; membership is a pure hash of the doc key, so
    the sample is stable under re-runs and appends and needs no stored
    sample column — the same re-derivable-membership property as
    l12_hash_split, here with per-source rates."""
    cat = Catalog(spark, sf_dir)
    keep = (F.expr(_MIX_HASH) % 1000) < F.expr(_RATE_SPARK)
    return (
        cat.documents.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(keep, F.col("n_chars")).otherwise(0)).alias("chars_kept"),
        )
        .orderBy("source")
    )


# --- L29: temperature-weighted source sampling ------------------------------
#
# The multilingual-pretraining recipe (mBERT/XLM-R-style "temperature
# sampling"): per-source keep probability p_i = (n_min / n_i)^(1-alpha),
# so alpha=1 keeps the natural distribution and alpha->0 flattens it.
# Unlike l16's FIXED rates, the rates here derive from the MEASURED
# source counts — the operator is a tiny count aggregate broadcast back
# over the corpus, membership stays a pure hash projection.
#
# alpha is pinned at 0.5 so p_i = sqrt(n_min / n_i): IEEE-754 sqrt and
# division are correctly rounded (pow is NOT), so Spark and DuckDB
# compute the keep threshold floor(1e6 * p_i) bit-identically and the
# hash-boundary docs never flip between engines.

_TEMP_MIX_HASH = "((doc_id * 2654435761 + 71993) % 4294967296)"


@query(
    "l29_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source, n,
             CAST(FLOOR(1000000 * SQRT(
               CAST((SELECT MIN(n) FROM counts) AS DOUBLE)
               / CAST(n AS DOUBLE))) AS BIGINT) AS thresh
      FROM counts
    )
    SELECT d.source,
           CAST(MIN(r.n) AS BIGINT) AS n_docs,
           MIN(r.thresh) AS rate_ppm,
           CAST(SUM(CASE WHEN ({_TEMP_MIX_HASH}) % 1000000 < r.thresh
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN ({_TEMP_MIX_HASH}) % 1000000 < r.thresh
                         THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
    FROM documents d JOIN rates r USING (source)
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def l29_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source sampling (alpha = 0.5): keep rates
    derive from the measured per-source counts — p_i = sqrt(n_min/n_i)
    upweights rare sources toward a flatter mix — and membership is a
    pure hash of the doc key (stable under re-runs/appends, no stored
    sample column). Plan shape at 100 TB: ONE tiny count aggregate
    (|sources| rows) broadcast-joined back over the corpus; the corpus
    pass itself is a map-side projection + partial agg."""
    cat = Catalog(spark, sf_dir)
    docs = cat.documents
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    n_min = counts.agg(F.min("n").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n",
        F.floor(
            1_000_000
            * F.sqrt(
                F.col("n_min").cast("double") / F.col("n").cast("double")
            )
        ).alias("thresh"),
    )
    keep = (F.expr(_TEMP_MIX_HASH) % 1_000_000) < F.col("thresh")
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.min("n").alias("n_docs"),
            F.min("thresh").alias("rate_ppm"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(keep, F.col("n_chars")).otherwise(0)).alias(
                "chars_kept"
            ),
        )
        .orderBy("source")
    )


@query(
    "l22_corpus_datasheet",
    oracle="""
    WITH per_doc AS (
      SELECT source, lang, n_chars,
             len(string_split(text, ' ')) AS n_tok,
             length(regexp_replace(text, '[^.!?]', '', 'g')) AS n_sent_p
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) // COUNT(*) AS mean_chars,
           CAST(SUM(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_short,
           CAST(1000 * SUM(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS short_permille,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_sent_p) AS BIGINT) AS total_sentences
    FROM per_doc
    GROUP BY source ORDER BY source
    """,
)
def l22_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus datasheet: the per-source summary card a training-data
    pipeline publishes with every snapshot — volume, token mass, length
    spread, short-doc rate (per-mille, integer-exact), language spread,
    sentence mass. One map-side-combined aggregation over per-doc
    projections; every statistic is integer algebra so the card is
    reproducible bit-for-bit anywhere."""
    cat = Catalog(spark, sf_dir)
    per_doc = cat.documents.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        F.length(F.regexp_replace(F.col("text"), r"[^.!?]", "")).alias(
            "n_sent_p"
        ),
    )
    short = (F.col("n_tok") < 20).cast("long")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.expr("SUM(n_chars) DIV COUNT(*)").alias("mean_chars"),
            F.sum(short).alias("n_short"),
            F.expr(
                "1000 * SUM(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) "
                "DIV COUNT(*)"
            ).alias("short_permille"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_sent_p").alias("total_sentences"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# L25: fuzzy contamination — cross-split MinHash-LSH near-dup leakage
# ---------------------------------------------------------------------------


@query(
    "l25_fuzzy_contamination",
    oracle=f"""
    WITH {{MINHASH_CTE}},
    bucketed AS (
      SELECT *, ({_SPLIT_HASH}) % 1000 AS bucket FROM banded
    ),
    bands AS (
      SELECT doc_id, bucket, b.band_id,
             CASE b.band_id WHEN 0 THEN band0 WHEN 1 THEN band1
                            WHEN 2 THEN band2 ELSE band3 END AS band_val
      FROM bucketed CROSS JOIN (VALUES (0), (1), (2), (3)) b(band_id)
    ),
    cand AS (
      SELECT DISTINCT e.doc_id AS eval_doc, t.doc_id AS train_doc
      FROM bands e JOIN bands t
        ON e.band_id = t.band_id AND e.band_val = t.band_val
      WHERE e.bucket >= 900 AND t.bucket < 900
    ),
    verified AS (
      SELECT eval_doc, train_doc,
             CAST(len(list_intersect(se.sh, st.sh)) AS DOUBLE)
             / (len(se.sh) + len(st.sh) - len(list_intersect(se.sh, st.sh)))
               AS jaccard
      FROM cand
      JOIN banded se ON se.doc_id = eval_doc
      JOIN banded st ON st.doc_id = train_doc
    )
    SELECT eval_doc AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_train_matches,
           MAX(jaccard) AS best_jaccard
    FROM verified WHERE jaccard >= 0.2
    GROUP BY eval_doc
    ORDER BY doc_id
    """.replace("{MINHASH_CTE}", _minhash_sql_cte().strip()),
)
def l25_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination — l13's exact-gram check at near-dup level:
    eval-split documents whose MinHash-LSH bands collide with any
    TRAIN-split document and whose exact shingle Jaccard clears 0.2. This
    is how a real pipeline catches paraphrased/benchmark leakage that
    exact n-gram matching misses (the l2 machinery, pointed across the
    l12/l13 split instead of at itself).

    Scale posture: identical to l2 — linear signature pass, band
    equi-join (cost Σ bucket_train × bucket_eval, never |train|×|eval|),
    exact verify on candidates only. The split predicate is a pure
    projection of doc_id, so NO second corpus scan: one signature table
    serves both sides of the join."""
    from cassandra_spark.operators.llm_dedup import minhash_signatures

    cat = Catalog(spark, sf_dir)
    sig = (
        minhash_signatures(cat.documents)
        .select(
            "doc_id",
            "sh",
            F.array(*[F.col(f"band{b}") for b in range(4)]).alias("bands"),
            (F.expr(_SPLIT_HASH) % 1000).alias("bucket"),
        )
        .persist()  # four consumers (bands x2, verify x2) — see l2's note
    )
    bands = sig.select(
        "doc_id", "bucket", F.posexplode("bands").alias("band_id", "band_val")
    )
    cand = (
        bands.filter(F.col("bucket") >= 900)
        .alias("e")
        .join(
            bands.filter(F.col("bucket") < 900).alias("t"),
            (F.col("e.band_id") == F.col("t.band_id"))
            & (F.col("e.band_val") == F.col("t.band_val")),
        )
        .select(
            F.col("e.doc_id").alias("eval_doc"),
            F.col("t.doc_id").alias("train_doc"),
        )
        .distinct()
    )
    sh = sig.select("doc_id", "sh")
    inter = F.size(F.array_intersect(F.col("se"), F.col("st")))
    union = F.size(F.col("se")) + F.size(F.col("st")) - inter
    return (
        cand.join(
            sh.select(F.col("doc_id").alias("eval_doc"), F.col("sh").alias("se")),
            "eval_doc",
        )
        .join(
            sh.select(F.col("doc_id").alias("train_doc"), F.col("sh").alias("st")),
            "train_doc",
        )
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= 0.2)
        .groupBy(F.col("eval_doc").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_train_matches"),
            F.max("jaccard").alias("best_jaccard"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L27: repeated-span scrub (C4-style intra-corpus duplicate-span removal)
# ---------------------------------------------------------------------------

SPAN_W = 10  # words per span (C4 used three-sentence spans; this corpus
             # is unpunctuated single-line text, so fixed word windows)


@query(
    "l27_span_dedup",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    idxs AS (
      SELECT doc_id, w,
             CAST(ceil(len(w) / {SPAN_W}.0) AS BIGINT) AS n_chunks,
             unnest(range(0, CAST(ceil(len(w) / {SPAN_W}.0) AS BIGINT)))
               AS idx
      FROM words
    ),
    chunks AS (
      SELECT doc_id, idx, n_chunks,
             array_to_string(
               list_slice(w, idx * {SPAN_W} + 1, (idx + 1) * {SPAN_W}), ' '
             ) AS span
      FROM idxs
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY span ORDER BY doc_id, idx) AS rn
      FROM chunks
    )
    SELECT doc_id,
           MAX(n_chunks) AS n_spans,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' '
                          ORDER BY idx), '')) AS clean_fp
    FROM ranked
    GROUP BY doc_id
    """,
)
def l27_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-corpus repeated-span removal — the C4/RefinedWeb scrub that
    drops every LATER occurrence of an exact text span corpus-wide
    (boilerplate, mirrored passages), keeping the first by (doc_id,
    position). Shape: explode fixed {SPAN_W}-word spans (shuffle-free),
    ONE shuffle keyed by span content for global first-occurrence
    ranking, one groupBy to reassemble documents. Output per doc: span
    counts + an md5 fingerprint of the scrubbed text (so the oracle
    checks exact reassembled content without hauling full text).

    At 100 TB: span ranking shuffles on content (uniform by hashing);
    hot spans (the boilerplate being removed!) are bounded per-reducer
    by count aggregation semantics — rn=1 selection needs only the
    minimum, so AQE skew-split applies cleanly."""
    cat = Catalog(spark, sf_dir)
    words = cat.documents.select(
        "doc_id", F.split("text", " ").alias("w")
    )
    chunks = words.select(
        "doc_id",
        F.ceil(F.size("w") / float(SPAN_W)).cast("long").alias("n_chunks"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(w) / {SPAN_W}.0) "
                f"as int) - 1), i -> "
                f"array_join(slice(w, i * {SPAN_W} + 1, {SPAN_W}), ' '))"
            )
        ).alias("idx", "span"),
    )
    w_first = Window.partitionBy("span").orderBy("doc_id", "idx")
    ranked = chunks.withColumn("rn", F.row_number().over(w_first))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.max("n_chunks").alias("n_spans"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.md5(
                F.array_join(
                    F.expr(
                        "transform(array_sort(collect_list(CASE WHEN rn = 1 "
                        "THEN struct(idx, span) END)), s -> s.span)"
                    ),
                    " ",
                ).cast("binary")
            ).alias("clean_fp"),
        )
    )


# ---------------------------------------------------------------------------
# L31: incremental dedup — admit a NEW batch against an EXISTING corpus
# ---------------------------------------------------------------------------
#
# The production ingestion pattern: the corpus is already deduped; a new
# crawl batch arrives and each new document is admitted iff no verified
# near-dup exists in (existing corpus ∪ earlier-ARRIVED batch docs, by
# doc_id) — the parallel-friendly arrival-order policy: a doc that
# duplicates a REJECTED earlier doc is also rejected, because that
# content is transitively represented by whatever the earlier doc itself
# duplicated (true sequential admitted-only candidacy would serialize
# the batch; the arrival policy is what batch pipelines ship). The
# existing corpus is never re-deduped — its signatures are reusable
# state (at 100 TB a persisted table, not a recompute). Batch membership
# reuses the l25 split hash: bucket >= 900 is the "new batch" (~10%).


@query(
    "l31_incremental_dedup",
    oracle=f"""
    WITH {{MINHASH_CTE}},
    bucketed AS (
      SELECT *, ({_SPLIT_HASH}) % 1000 AS bucket FROM banded
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
    """.replace("{MINHASH_CTE}", _minhash_sql_cte().strip()),
)
def l31_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup admission of a new batch against the
    existing corpus — arrival-order candidacy, see the block comment
    for the policy choice. Scale posture: the existing
    side contributes ONLY its (persisted-in-production) signatures to
    the band equi-join — never text, never pairwise; candidates are
    Σ bucket_new × bucket_all, linear while bucket sizes stay bounded
    (the same regime l2/l25 measure); the exact verify touches
    candidate pairs only."""
    from cassandra_spark.operators.llm_dedup import minhash_signatures

    cat = Catalog(spark, sf_dir)
    sig = (
        minhash_signatures(cat.documents)
        .select(
            "doc_id",
            "sh",
            F.array(*[F.col(f"band{b}") for b in range(4)]).alias("bands"),
            (F.expr(_SPLIT_HASH) % 1000).alias("bucket"),
        )
        .persist()  # four consumers — see l2's note
    )
    bands = sig.select(
        "doc_id", "bucket", F.posexplode("bands").alias("band_id", "band_val")
    )
    new_side = bands.filter(F.col("bucket") >= 900).alias("n")
    cand = (
        new_side.join(
            bands.alias("p"),
            (F.col("n.band_id") == F.col("p.band_id"))
            & (F.col("n.band_val") == F.col("p.band_val"))
            & (
                (F.col("p.bucket") < 900)
                | (F.col("p.doc_id") < F.col("n.doc_id"))
            ),
        )
        .select(
            F.col("n.doc_id").alias("new_doc"),
            F.col("p.doc_id").alias("prior_doc"),
        )
        .distinct()
    )
    sh = sig.select("doc_id", "sh")
    inter = F.size(F.array_intersect(F.col("sn"), F.col("sp")))
    union = F.size(F.col("sn")) + F.size(F.col("sp")) - inter
    dups = (
        cand.join(
            sh.select(F.col("doc_id").alias("new_doc"), F.col("sh").alias("sn")),
            "new_doc",
        )
        .join(
            sh.select(
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
        sig.filter(F.col("bucket") >= 900)
        .select("doc_id")
        .join(dups, F.col("doc_id") == F.col("new_doc"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_dups"), F.lit(0)).alias("n_dups"),
            "best_jaccard",
            (F.coalesce(F.col("n_dups"), F.lit(0)) == 0).alias("admit"),
        )
        .orderBy("doc_id")
    )


# --- L39: deterministic stratified downsample --------------------------------
#
# Corpus curation's "make the mixture" step, the exact-count complement of
# l29's temperature weighting: within each (lang, length-band) stratum keep
# a fixed-rate quota of documents, chosen by a salted multiplicative hash
# so the sample is (a) uniform within the stratum, (b) reproducible across
# runs/engines with zero RNG state, and (c) STABLE under corpus growth —
# a doc's keep-rank can only move if docs hash ahead of it in its own
# stratum. One window shuffle on the stratum key; at 100 TB a hot stratum
# is the skew knob (salt the stratum key or pre-aggregate counts and
# hash-filter by rank range instead of ranking).

_SAMPLE_HASH = "(doc_id * 2654435761 + 40507) % 4294967296"
_LEN_BAND = (
    "CASE WHEN n_chars < 200 THEN 'xs' WHEN n_chars < 400 THEN 's' "
    "WHEN n_chars < 800 THEN 'm' ELSE 'l' END"
)
_KEEP_DIV = 5  # keep floor(n/5) per stratum, min 1 (20% downsample)


@query(
    "l39_stratified_sample",
    oracle=f"""
    WITH strata AS (
      SELECT doc_id, lang, {_LEN_BAND} AS len_band,
             ({_SAMPLE_HASH}) AS h,
             COUNT(*) OVER (PARTITION BY lang, {_LEN_BAND}) AS n_stratum
      FROM documents
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY lang, len_band ORDER BY h, doc_id) AS rnk
      FROM strata
    )
    SELECT doc_id, lang, len_band,
           CAST(rnk AS INTEGER) AS rnk,
           CAST(n_stratum AS BIGINT) AS n_stratum,
           CAST(GREATEST(1, n_stratum // {_KEEP_DIV}) AS BIGINT) AS quota
    FROM ranked
    WHERE rnk <= GREATEST(1, n_stratum // {_KEEP_DIV})
    ORDER BY lang, len_band, rnk
    """,
)
def l39_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified downsample (see block comment): every
    (lang, length-band) stratum keeps its floor(n/5) lowest-salted-hash
    documents (min 1, so rare strata survive). Integer-exact throughout —
    the hash, the band edges, and the quota are all engine-identical, so
    the oracle pins the SAMPLE MEMBERSHIP, not just its size."""
    cat = Catalog(spark, sf_dir)
    strata = cat.documents.select(
        "doc_id",
        "lang",
        F.expr(_LEN_BAND).alias("len_band"),
        F.expr(_SAMPLE_HASH).alias("h"),
    )
    w_n = Window.partitionBy("lang", "len_band")
    w_r = Window.partitionBy("lang", "len_band").orderBy("h", "doc_id")
    quota = F.greatest(
        F.lit(1).cast("long"),
        (F.col("n_stratum") / _KEEP_DIV).cast("long"),
    )
    return (
        strata.withColumn("n_stratum", F.count(F.lit(1)).over(w_n))
        .withColumn("rnk", F.row_number().over(w_r))
        .withColumn("quota", quota)
        .filter(F.col("rnk") <= F.col("quota"))
        .select(
            "doc_id", "lang", "len_band", "rnk", "n_stratum", "quota"
        )
        .orderBy("lang", "len_band", "rnk")
    )
