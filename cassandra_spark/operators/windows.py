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


@query(
    "x21_window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS VARCHAR) AS DOUBLE) AS mov_sum3,
           FIRST_VALUE(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS first_order,
           LAST_VALUE(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS last_order,
           percent_rank() OVER wp AS price_pct,
           cume_dist() OVER wp AS price_cume
    FROM orders
    WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def x21_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frames + edge values + distribution functions: 3-order
    moving spend (exact decimal, surfaced double), first/last order key of
    the customer's history, and percent_rank/cume_dist by price. The
    moving frame is ROWS (not RANGE) over a unique (date, key) order so
    both engines see identical frames; percent_rank's (rank-1)/(n-1) is a
    single double division — engine-identical."""
    cat = Catalog(spark, sf_dir)
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    mov = seq.rowsBetween(-2, Window.currentRow)
    head = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tail = seq.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    wp = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return cat.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(mov).cast("double").alias("mov_sum3"),
        F.first("o_orderkey").over(head).alias("first_order"),
        F.last("o_orderkey").over(tail).alias("last_order"),
        F.percent_rank().over(wp).alias("price_pct"),
        F.cume_dist().over(wp).alias("price_cume"),
    )
