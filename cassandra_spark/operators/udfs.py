"""UDF / UDAF / UDTF tier U1-U3 (SURVEY.md §2.11).

The reference sandboxes Java/JS scalar UDFs and UDAs (`[C* cql3/functions/
UDFunction, UDAggregate]`, unverified — SURVEY.md §0). Here the vectorized
path is the rule: pandas_udf (Arrow-batched) for scalars and grouped
aggregates — NEVER row-at-a-time Python UDFs in a hot path. U3 (UDTF) is
explode/posexplode, which stays fully JVM-side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query


def word_count_udf():
    """Vectorized scalar UDF (U1): whitespace token count per document.
    Arrow-batched: one Python roundtrip per ~10k-row batch, not per row.
    Built lazily — pandas_udf registration needs an active session."""

    @pandas_udf("int")
    def _word_count(text: pd.Series) -> pd.Series:
        return text.str.split(" ").str.len().astype("int32")

    return _word_count


@query(
    "u1_scalar_udf",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents WHERE doc_id < 200
    """,
)
def u1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE FUNCTION analogue: the pandas_udf computes integer token
    counts (deterministic across engines — no float path)."""
    cat = Catalog(spark, sf_dir)
    return cat.documents.filter(F.col("doc_id") < 200).select(
        "doc_id",
        word_count_udf()(F.col("text")).alias("n_words"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


@query(
    "u3_explode",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 30
    """,
)
def u3_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF shape (U3): explode the token list → global token frequencies,
    top 30 with deterministic tie-break. JVM-side generate + partial agg —
    the word-count plan that survives any scale."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.documents.select(
            F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(30)
    )
