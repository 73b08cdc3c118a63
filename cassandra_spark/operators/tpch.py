"""Deep multi-join analytic queries in classic TPC-H shapes (X tier — the
analytics-via-DataFrames extension, SURVEY.md §2.3).

The reference cannot run any of these (no joins in CQL); they exist to
prove the engine's Catalyst-side join planning end-to-end on 3- and 4-way
trees with semi-join-like HAVING shapes. Adapted to the fixture's column
subset (no partsupp table); exact-decimal aggregates per exactmath.

Scale posture: dimension sides (customer, nation) broadcast; fact⋈fact
joins (lineitem⋈orders) shuffle on the join key once and AQE splits skew;
top-k finals are TakeOrderedAndProject, never global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.exactmath import SQL_REVENUE, revenue_col, sql_double
from cassandra_spark.registry import query


@query(
    "x15_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_double(f"SUM({SQL_REVENUE})")} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_shipdate > TIMESTAMP '1996-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def x15_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 not-yet-shipped orders of one market segment
    by outstanding revenue. 3-way join → agg → TakeOrdered(10)."""
    cat = Catalog(spark, sf_dir)
    cut = F.lit("1996-07-01").cast("timestamp")
    return (
        cat.lineitem.filter(F.col("l_shipdate") > cut)
        .join(
            cat.orders.filter(F.col("o_orderdate") < cut),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "x16_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_double(f"SUM({SQL_REVENUE})")} AS revenue,
           {sql_double("c_acctbal")} AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def x16_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue in
    a quarter. 4-way join tree with two broadcast dims."""
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return (
        cat.lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "x17_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR)
                AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 270
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def x17_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (~p99 of this corpus), with their customers. The HAVING over a fact
    aggregate is the group-filter pattern; the quantity sum is exact
    decimal so the threshold cut is engine-identical."""
    cat = Catalog(spark, sf_dir)
    # aggregate the fact table FIRST (one narrow-key shuffle, map-side
    # combined), filter to the ~1% tail, THEN join dims — at 100 TB this
    # shuffles quantities, not customer names
    big = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("__qty")
        )
        .filter(F.col("__qty") > 270)
    )
    return (
        big.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("decimal(18,4)").cast("double").alias(
                "o_totalprice"
            ),
            F.col("__qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )
