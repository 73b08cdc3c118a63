"""CQL-driven registry entries: the cql.py front-end run through the same
DuckDB oracle gate as the native DataFrame constructors (SURVEY.md §2.13).

These prove end-to-end that a reference user's literal CQL text produces
oracle-identical results — parse → restriction check → DataFrame plan →
Catalyst. The statements cover the canonical CQL shapes: point lookup,
clustering slice with reversed order, and PER PARTITION LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_spark.cql import cql_select
from cassandra_spark.registry import query


@query(
    "cql1_point_lookup",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders WHERE o_custkey = 7
    """,
)
def cql1_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL text → single-partition read (R1 through the front-end)."""
    return cql_select(
        spark,
        sf_dir,
        "SELECT o_orderkey, o_orderdate, o_totalprice "
        "FROM orders WHERE o_custkey = 7",
    )


@query(
    "cql2_slice_reversed",
    oracle="""
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_custkey = 7 AND o_orderdate >= DATE '1995-01-01'
    ORDER BY o_orderdate DESC, o_orderkey ASC
    """,
)
def cql2_slice_reversed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL clustering slice + reversed clustering order (R4/O1)."""
    return cql_select(
        spark,
        sf_dir,
        "SELECT o_orderkey, o_orderdate FROM orders "
        "WHERE o_custkey = 7 AND o_orderdate >= '1995-01-01' "
        "ORDER BY o_orderdate DESC, o_orderkey ASC",
    )


@query(
    "cql3_per_partition_limit",
    oracle="""
    SELECT user_id, event_id
    FROM (
      SELECT user_id, event_id, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn <= 2
    """,
)
def cql3_per_partition_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL PER PARTITION LIMIT over the declared clustering order (O3):
    newest 2 events per user, exactly Cassandra's first-k-rows-per-partition
    under the table's (-ts, event_id) clustering."""
    return cql_select(
        spark, sf_dir, "SELECT user_id, event_id FROM events PER PARTITION LIMIT 2"
    )
