"""Set operations X12-X14 (SURVEY.md §2.7).

Absent upstream (no UNION/INTERSECT/EXCEPT in CQL); the reference's
read-path merge is a multiway sorted union with reconciliation (→ W4), and
Merkle-diff repair is "except by checksum" (→ W8). These are the plain
algebra versions on the analytic extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query


def _recent_buyers(cat: Catalog) -> DataFrame:
    return (
        cat.orders.filter(
            F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
        )
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


def _big_spenders(cat: Catalog) -> DataFrame:
    return (
        cat.orders.filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


_RECENT_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1999-01-01'
"""
_BIG_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
"""


@query(
    "x12_union",
    oracle=f"SELECT custkey FROM ({_RECENT_SQL}) UNION SELECT custkey FROM ({_BIG_SQL})",
)
def x12_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): recent buyers ∪ big spenders."""
    cat = Catalog(spark, sf_dir)
    return _recent_buyers(cat).union(_big_spenders(cat)).distinct()


@query(
    "x13_intersect",
    oracle=f"SELECT custkey FROM ({_RECENT_SQL}) INTERSECT SELECT custkey FROM ({_BIG_SQL})",
)
def x13_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers in both sets."""
    cat = Catalog(spark, sf_dir)
    return _recent_buyers(cat).intersect(_big_spenders(cat))


@query(
    "x14_except",
    oracle=f"SELECT custkey FROM ({_RECENT_SQL}) EXCEPT SELECT custkey FROM ({_BIG_SQL})",
)
def x14_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — the algebra behind tombstone purge (W5) and Merkle-diff
    repair (W8, `[C* repair/Validator]`)."""
    cat = Catalog(spark, sf_dir)
    return _recent_buyers(cat).exceptAll(_big_spenders(cat)).distinct()
