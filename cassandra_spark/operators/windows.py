"""Window-function tier X9-X11 (SURVEY.md §2.5).

No analytic windows exist in CQL, but windows are the idiomatic Spark
encoding of reference semantics: LWW = row_number by writetime desc (W4),
clustering order = Window.partitionBy(pk).orderBy(ck) (O1), PER PARTITION
LIMIT = rank filter (O3). This module ships the general surface.

Every ORDER BY carries a unique tie-break column (SURVEY.md §7 hard parts):
with a total order, RANGE and ROWS frames coincide and both engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.exactmath import dec
from cassandra_spark.registry import query


@query(
    "x9_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER w AS INTEGER) AS rn,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def x9_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over each customer's orders by price."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return cat.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "x10_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_orderdate) OVER w AS prev_date,
           lead(o_orderdate) OVER w AS next_date,
           first_value(o_orderdate) OVER w AS first_date,
           CAST(epoch_us(o_orderdate)
                - epoch_us(lag(o_orderdate) OVER w) AS BIGINT)
             AS gap_us
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def x10_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic family: order-to-order gaps per customer timeline — the
    time-series-per-partition read pattern the reference's clustering
    layout exists for."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return cat.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev.alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.first("o_orderdate").over(w).alias("first_date"),
        # parquet µs-naive reads as TIMESTAMP_NTZ in Spark 4; cast to
        # TIMESTAMP is lossless under the UTC session tz
        (
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
        ).alias("gap_us"),
    )


@query(
    "x11_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS VARCHAR) AS DOUBLE) AS running_spend,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_orders_so_far
    FROM orders
    """,
)
def x11_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec running aggregate: cumulative spend per customer.
    Exact-decimal accumulation (order-independent) surfaced as double."""
    cat = Catalog(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cat.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_orders_so_far"),
    )
