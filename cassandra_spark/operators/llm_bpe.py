"""L-tier BPE tokenizer training + encoding (l23/l23b): learn byte-pair
merges from the corpus by iterative pair-count aggregation, then apply the
learned merge table corpus-wide. SURVEY.md §2.12.

The classic subword-tokenizer training loop (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public paper):
start from characters, repeatedly merge the most frequent adjacent symbol
pair. This is THE tokenizer-construction step of a training-data pipeline,
and it distributes the same way real BPE trainers do:

- **One corpus-scale pass**: tokenize → word-frequency table (one shuffle,
  map-side combine). Everything after runs on the DISTINCT-WORD table,
  which is vocabulary-sized — orders of magnitude smaller than the corpus.
  This is the standard trick (word-level pre-aggregation) that makes BPE
  training tractable at 100 TB: the 8 training rounds below would touch
  the same few-MB vocab table even if `documents` were 100 TB.
- **Per round**: explode adjacent symbol pairs (weighted by word freq) →
  one vocab-sized aggregation → 1-row argmax (count DESC, pair ASC — the
  deterministic tie-break) → merge applied via `replace` with COLUMN
  arguments from the broadcast 1-row best — the best pair never leaves
  Spark; no driver-side value collection.
- `localCheckpoint(eager)` truncates lineage between rounds (the l17
  pointer-jumping precedent): without it the round-r plan references
  round-(r-1) twice and the logical tree doubles per round.

Cross-engine exactness: a symbol sequence is the string `|s1||s2||...|`
(every symbol wrapped in pipes; symbols are [a-z]+ so '|' never occurs in
one). Merging pair (l, r) is `replace(seq, '|l||r|', '|lr|')` — literal,
left-to-right, non-overlapping — which both Spark's `replace` and DuckDB's
`replace` implement identically (verified on the [a,a,a,a] greedy case:
both give [aa,aa], matching the classic merge-pass semantics). Pair counts
are position counts (overlapping occurrences like (a,a)×2 in "aaa" both
count) exactly as in the reference algorithm's get_stats.

Pinned deviations (documented, not bugs): words are lowercased whitespace
tokens restricted to ^[a-z]+$ (no byte-fallback alphabet, no end-of-word
marker — merges cannot cross words because training runs on the word
table); merge count K is fixed at 8 (a vocab-size target in production —
same loop, more rounds).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query

K_MERGES = 8

# adjacent symbol pairs, 0-based Spark arrays (DuckDB mirror is 1-based)
_PAIRS_SPARK = (
    "transform(sequence(0, size(syms)-2), "
    "i -> struct(syms[i] as l, syms[i+1] as r))"
)


def _vocab0(cat: Catalog) -> DataFrame:
    """Corpus → word-frequency table with initial character sequences.
    The ONLY corpus-scale stage of training (one shuffle on word)."""
    words = (
        cat.documents.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z]+$"))
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "seq",
            F.concat(
                F.lit("|"),
                F.array_join(F.split(F.col("word"), ""), "||"),
                F.lit("|"),
            ),
        )
    )


def _best_pair(vocab: DataFrame) -> DataFrame:
    """One training round's argmax: explode adjacent pairs weighted by word
    frequency, aggregate (vocab-sized shuffle), keep the single most
    frequent pair (ties broken lexicographically — deterministic)."""
    pairs = (
        vocab.withColumn(
            "syms", F.split(F.expr("btrim(seq, '|')"), r"\|\|")
        )
        .filter(F.size("syms") >= 2)
        .select("freq", F.explode(F.expr(_PAIRS_SPARK)).alias("p"))
    )
    return (
        pairs.groupBy(
            F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs")
        )
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
        .limit(1)
    )


def _apply_merge(df: DataFrame, best: DataFrame) -> DataFrame:
    """seq := replace(seq, '|l||r|', '|lr|') with l/r taken from the 1-row
    broadcast best — the merge constant stays a Spark column end-to-end."""
    merged = df.crossJoin(F.broadcast(best)).withColumn(
        "seq",
        F.replace(
            F.col("seq"),
            F.concat(F.lit("|"), "lhs", F.lit("||"), "rhs", F.lit("|")),
            F.concat(F.lit("|"), "lhs", "rhs", F.lit("|")),
        ),
    )
    return merged.drop("lhs", "rhs", "pair_count")


def _train(cat: Catalog, k: int = K_MERGES) -> tuple[list[DataFrame], DataFrame]:
    """Run k merge rounds; returns ([best_1..best_k], final vocab). Each
    round is checkpoint-truncated so the logical plan stays linear in k."""
    vocab = _vocab0(cat).localCheckpoint(eager=True)
    bests: list[DataFrame] = []
    for _ in range(k):
        best = _best_pair(vocab).localCheckpoint(eager=True)
        bests.append(best)
        vocab = _apply_merge(vocab, best).localCheckpoint(eager=True)
    return bests, vocab


# --- oracle generation (DuckDB mirror, 1-based lists) ----------------------

# AS MATERIALIZED throughout: DuckDB inlines CTEs by default, and each
# round references its predecessor ~5× (pairs + 4 scalar-subquery merge
# constants) — inlined, the scan tree grows 5^K and exhausts file handles.
# Materialization makes the oracle evaluate each round once, like Spark's
# localCheckpoint chain.
_VOCAB0_DUCK = """
words AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
),
vocab0 AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq,
         '|' || array_to_string(string_split(word, ''), '||') || '|' AS seq
  FROM words WHERE regexp_matches(word, '^[a-z]+$')
  GROUP BY word
)"""


def _round_duck(r: int) -> str:
    """CTEs for training round r: pairs from vocab{r-1} → best{r} →
    vocab{r}. The merge constant is a scalar subquery on best{r} — the SQL
    stays static while the learned value is data-dependent."""
    lhs = f"(SELECT lhs FROM best{r})"
    rhs = f"(SELECT rhs FROM best{r})"
    return f"""
syms{r} AS (
  SELECT freq, string_split(trim(seq, '|'), '||') AS s FROM vocab{r - 1}
  WHERE len(string_split(trim(seq, '|'), '||')) >= 2
),
px{r} AS (
  SELECT freq,
         unnest(list_transform(range(1, len(s)),
                               i -> {{'l': s[i], 'r': s[i + 1]}})) AS p
  FROM syms{r}
),
pairs{r} AS (
  SELECT p.l AS lhs, p.r AS rhs, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM px{r} GROUP BY p.l, p.r
),
best{r} AS MATERIALIZED (
  SELECT lhs, rhs, pair_count FROM pairs{r}
  ORDER BY pair_count DESC, lhs, rhs LIMIT 1
),
vocab{r} AS MATERIALIZED (
  SELECT word, freq,
         replace(seq, '|' || {lhs} || '||' || {rhs} || '|',
                      '|' || {lhs} || {rhs} || '|') AS seq
  FROM vocab{r - 1}
)"""


def _train_ctes(k: int) -> str:
    return "WITH " + _VOCAB0_DUCK + "," + ",".join(
        _round_duck(r + 1) for r in range(k)
    )


def _bpe_train_oracle(k: int = K_MERGES) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT {r + 1} AS merge_rank, lhs, rhs, pair_count, "
        f"lhs || rhs AS merged FROM best{r + 1}"
        for r in range(k)
    )
    return f"""
    {_train_ctes(k)}
    SELECT * FROM ({unions}) ORDER BY merge_rank
    """


@query("l23_bpe_train", oracle=_bpe_train_oracle())
def l23_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training: the learned merge table — K_MERGES rows of
    (merge_rank, lhs, rhs, pair_count, merged), the tokenizer artifact a
    training pipeline ships. See the module docstring for the distribution
    argument (one corpus pass, then vocab-sized rounds) and the pinned
    cross-engine replace semantics."""
    cat = Catalog(spark, sf_dir)
    bests, _ = _train(cat)
    rows = [
        b.select(
            F.lit(i + 1).alias("merge_rank"),
            "lhs",
            "rhs",
            "pair_count",
            F.concat("lhs", "rhs").alias("merged"),
        )
        for i, b in enumerate(bests)
    ]
    return reduce(DataFrame.unionAll, rows).orderBy("merge_rank")


@query(
    "l23b_bpe_encode",
    oracle=f"""
    {_train_ctes(K_MERGES)},
    dwords AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    enc0 AS (
      SELECT doc_id, word,
             '|' || array_to_string(string_split(word, ''), '||') || '|'
               AS seq
      FROM dwords WHERE regexp_matches(word, '^[a-z]+$')
    ),
    {",".join(
        f'''enc{r + 1} AS MATERIALIZED (
      SELECT doc_id, word,
             replace(seq,
               '|' || (SELECT lhs FROM best{r + 1}) || '||' ||
                      (SELECT rhs FROM best{r + 1}) || '|',
               '|' || (SELECT lhs FROM best{r + 1}) ||
                      (SELECT rhs FROM best{r + 1}) || '|') AS seq
      FROM enc{r}
    )''' for r in range(K_MERGES)
    )}
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(string_split(trim(seq, '|'), '||'))) AS BIGINT)
             AS n_bpe_tokens,
           CAST(SUM(len(word)) AS BIGINT) AS n_chars
    FROM enc{K_MERGES}
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def l23b_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding: apply the learned merge table corpus-wide and report
    per-document true subword token counts (vs l7's estimate). The encode
    pass is corpus-scale but embarrassingly parallel — a projection chain
    of K literal replaces (merge constants broadcast as a 1-row join), no
    shuffle until the per-doc count aggregation. At 100 TB this is the
    plan you want: tokenization cost scales with bytes scanned, the merge
    table is O(K) model state on every task."""
    cat = Catalog(spark, sf_dir)
    bests, _ = _train(cat)
    dwords = (
        cat.documents.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
        )
        .filter(F.col("word").rlike("^[a-z]+$"))
        .withColumn(
            "seq",
            F.concat(
                F.lit("|"),
                F.array_join(F.split(F.col("word"), ""), "||"),
                F.lit("|"),
            ),
        )
    )
    enc = reduce(_apply_merge, bests, dwords)
    return (
        enc.withColumn(
            "n_tok",
            F.size(F.split(F.expr("btrim(seq, '|')"), r"\|\|")),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
            F.sum(F.length("word")).alias("n_chars"),
        )
        .orderBy("doc_id")
    )
