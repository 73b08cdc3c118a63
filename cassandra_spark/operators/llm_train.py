"""L-tier distributed model training (l24): linear regression learned by
integer-exact batch gradient descent over the corpus. SURVEY.md §2.12.

The canonical distributed-trainer shape (MLlib's LinearRegressionWithSGD,
parameter-server training, fasttext-style quality filters all share it):

- the MODEL is O(features) state living in a 1-row DataFrame, broadcast to
  every task — it never leaves Spark, no driver-side value collection;
- each step is ONE corpus-scale aggregation: residual·feature products
  partial-summed map-side, one shuffle of 4 numbers per partition;
- the update is a 1-row × 1-row join — free.

At 100 TB each step costs exactly one scan + one tiny shuffle, which is
the textbook lower bound for full-batch GD; iteration count is fixed and
small (K_STEPS = 6 reaches 493/500 predictions within ±20 chars on the
fixture — measured, deterministic).

Task: predict ``n_chars`` from integer text statistics (word count,
stopword count, long-word count). The relationship is genuinely linear
(chars ≈ mean-word-len × words, corrected by word-length mix), so the
learned weights are interpretable: ~5.1 chars/word base, long words add,
stopwords (short) add little.

Cross-engine exactness (the l18 discipline): every quantity is an integer.
Weights are milli-units (w = 5149 ⇒ 5.149 chars/word); predictions divide
once by 1000 with both engines' truncate-toward-zero integer division
(Spark ``div`` ≡ DuckDB ``//``, probed: -7/2 → -3 on both); gradient sums
are exact int64 (bound at 100× fixture scale: |r·x| ≤ 1e6 × 6e5 docs ×
1000 scale ≈ 6e14 ≪ 2^63 — a true 100-TB run would widen to decimal(38),
same plan). The learning-rate divisor D = N·4096 makes the update an
average-gradient step — scale-invariant in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators.llm_text import STOPWORDS
from cassandra_spark.registry import query

K_STEPS = 6
LR_DIV = 4096  # per-feature-unit learning rate = 1/4096 (prototyped)
TOL = 20  # ±chars counted as a hit in the per-step n_within metric
_BIAS = 10  # bias feature value (not 1: keeps its gradient on the same
# scale as the count features, so one LR_DIV conditions all four)

_W = ["w_bias", "w_words", "w_stop", "w_long"]
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# prediction in chars: (w·x) div 1000, identical token-for-token on both
# engines modulo the div spelling
_PRED = "(w_bias*{b} + w_words*nw + w_stop*ns + w_long*nl)".format(b=_BIAS)


def _features(cat: Catalog) -> DataFrame:
    """One narrow corpus pass → integer feature vector + target."""
    words = F.split(F.col("text"), " ")
    return cat.documents.select(
        F.least(F.size(words), F.lit(1000)).cast("long").alias("nw"),
        F.size(
            F.expr(f"filter(split(text, ' '), w -> w IN ({_STOP_SQL}))")
        ).cast("long").alias("ns"),
        F.size(
            F.expr("filter(split(text, ' '), w -> length(w) > 5)")
        ).cast("long").alias("nl"),
        F.col("n_chars").cast("long").alias("y"),
    )


def _grad(feats: DataFrame, w: DataFrame) -> DataFrame:
    """One GD step's aggregation: Σ residual·xᵢ (+ the doc count), with
    the 1-row model broadcast into the scan."""
    r = F.expr(f"{_PRED} div 1000L - y")
    return feats.crossJoin(F.broadcast(w)).agg(
        F.sum(r * _BIAS).alias("g0"),
        F.sum(r * F.col("nw")).alias("g1"),
        F.sum(r * F.col("ns")).alias("g2"),
        F.sum(r * F.col("nl")).alias("g3"),
        F.count(F.lit(1)).alias("n"),
    )


def _update(w: DataFrame, grads: DataFrame) -> DataFrame:
    """w := w − (1000·g) div (N·LR_DIV) — the milli-unit average-gradient
    step, truncate-toward-zero on both engines."""
    return w.crossJoin(grads).select(
        *[
            F.expr(f"{wc} - (1000L * g{i}) div (n * {LR_DIV}L)").alias(wc)
            for i, wc in enumerate(_W)
        ]
    )


def _n_within(feats: DataFrame, w: DataFrame) -> DataFrame:
    """Per-step fit metric: docs predicted within ±TOL chars."""
    hit = F.expr(f"abs({_PRED} div 1000L - y) <= {TOL}")
    return feats.crossJoin(F.broadcast(w)).agg(
        F.sum(hit.cast("long")).alias("n_within")
    )


def _l24_oracle(k: int = K_STEPS) -> str:
    zero = ", ".join(f"CAST(0 AS BIGINT) AS {wc}" for wc in _W)
    pred = _PRED  # same token sequence; // spelling below
    steps = []
    for s in range(1, k + 1):
        xs = [str(_BIAS), "nw", "ns", "nl"]
        gsel = ", ".join(
            f"CAST(SUM(r * {x}) AS BIGINT) AS g{i}" for i, x in enumerate(xs)
        )
        upd = ", ".join(
            f"{wc} - (1000 * g{i}) // (n * {LR_DIV}) AS {wc}"
            for i, wc in enumerate(_W)
        )
        steps.append(f"""
g{s} AS MATERIALIZED (
  SELECT {gsel}, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT {pred} // 1000 - y AS r, nw, ns, nl FROM feat, w{s - 1})
),
w{s} AS MATERIALIZED (
  SELECT {upd} FROM w{s - 1}, g{s}
),
acc{s} AS MATERIALIZED (
  SELECT CAST(SUM(CASE WHEN abs({pred} // 1000 - y) <= {TOL}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_within
  FROM feat, w{s}
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {s} AS step, {', '.join(_W)}, n_within FROM w{s}, acc{s}"
        for s in range(1, k + 1)
    )
    return f"""
    WITH feat AS MATERIALIZED (
      SELECT CAST(least(len(string_split(text, ' ')), 1000) AS BIGINT) AS nw,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w IN ({_STOP_SQL}))) AS BIGINT) AS ns,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> len(w) > 5)) AS BIGINT) AS nl,
             CAST(n_chars AS BIGINT) AS y
      FROM documents
    ),
    w0 AS MATERIALIZED (SELECT {zero}),
    {",".join(steps)}
    SELECT * FROM ({unions}) ORDER BY step
    """


@query("l24_linreg_gd", oracle=_l24_oracle())
def l24_linreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed batch-GD linear regression: K_STEPS training steps, one
    row per step — (step, learned milli-weights, n_within fit metric).
    The weight trajectory is the model artifact; n_within climbing to
    ~corpus size is the convergence proof. See the module docstring for
    the scale argument and the integer-exactness discipline."""
    cat = Catalog(spark, sf_dir)
    feats = _features(cat).localCheckpoint(eager=True)
    w = spark.createDataFrame(
        [tuple(0 for _ in _W)], ", ".join(f"{wc} long" for wc in _W)
    )
    out: list[DataFrame] = []
    for s in range(1, K_STEPS + 1):
        w = _update(w, _grad(feats, w)).localCheckpoint(eager=True)
        acc = _n_within(feats, w)
        out.append(
            w.crossJoin(acc).select(
                F.lit(s).alias("step"), *_W, "n_within"
            )
        )
    from functools import reduce

    return reduce(DataFrame.unionAll, out).orderBy("step")
