"""Subquery shapes: EXISTS / NOT EXISTS / scalar / decorrelated-aggregate
(X tier extension, SURVEY.md §2.3).

CQL has no subqueries; these exist to prove Catalyst's subquery planning —
EXISTS → left-semi hash join, NOT EXISTS → left-anti, correlated aggregate
→ decorrelation into a keyed pre-aggregate join, scalar subquery →
broadcast of a 1-row relation. Written as explicit semi/anti/pre-agg
DataFrame plans (the shape Catalyst's RewriteSubquery produces), so the
physical plan is the one a 100 TB run wants: facts shuffle once on the
join key, thresholds and scalars broadcast.

Scale posture: x18's semi join shuffles both sides on o_orderkey (no
row-multiplication: semi stops at first match); x19's scalar avg is a
1-row broadcast and the anti join's build side is pre-filtered; x20's
per-part thresholds are an agg over the fact's own join key, so AQE can
plan the threshold join locally after the map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.exactmath import dec, dsum, sql_double, sql_dsum
from cassandra_spark.registry import query


@query(
    "x18_exists_late",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def x18_exists_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of one quarter's orders that had
    at least one line shipped after the order date. The correlated EXISTS
    with a non-equi conjunct runs as a left-semi join on l_orderkey with
    l_shipdate > o_orderdate as the residual condition."""
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    late = cat.lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "x19_rich_no_big_order",
    oracle=f"""
    WITH posavg AS (
      SELECT {sql_double("SUM(CAST(c_acctbal AS DECIMAL(18,4)))")}
             / COUNT(*) AS thr
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           {sql_dsum("c_acctbal", "totacctbal")}
    FROM customer, posavg
    WHERE c_acctbal > posavg.thr
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 450000)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def x19_rich_no_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and no
    large order, counted per nation. Scalar subquery (global positive-
    balance average) → 1-row broadcast cross join; NOT EXISTS → left-anti
    join against the pre-filtered large-order keys.

    The average is exact-decimal-sum / count in a single double division
    (exactmath.davg rationale) so the threshold cut is engine-identical.
    """
    cat = Catalog(spark, sf_dir)
    thr = (
        cat.customer.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "thr"
            )
        )
    )
    big_orders = (
        cat.orders.filter(F.col("o_totalprice") > 450000)
        .select("o_custkey")
    )
    return (
        cat.customer.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "x20_small_qty_revenue",
    oracle=f"""
    SELECT p_brand,
           {sql_double(f"SUM(CAST(l_extendedprice AS DECIMAL(18,4)))")} / 7.0
             AS avg_weekly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS tk,
                 CAST(0.2 AS DOUBLE) * ({sql_double("SUM(CAST(l_quantity AS DECIMAL(18,4)))")}
                        / COUNT(*)) AS thr
          FROM lineitem GROUP BY l_partkey) t ON t.tk = l_partkey
    WHERE l_quantity < t.thr
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def x20_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue (per brand, /7 weekly-ized) of lines whose
    quantity is below 20% of that part's average. The correlated scalar
    aggregate decorrelates into a WINDOW over the fact's own key — one
    lineitem scan and ONE hash exchange on l_partkey compute the per-part
    threshold in place (the pre-aggregate-then-self-join form scans and
    shuffles lineitem twice, and its |part|-sized pre-agg must never be
    broadcast-hinted at 100 TB); 0.2*avg and the final /7 are single
    double ops on exact sums, engine-identical."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("l_partkey")
    return (
        cat.lineitem.withColumn(
            "thr",
            F.lit(0.2)
            * (
                F.sum(dec("l_quantity")).over(w).cast("double")
                / F.count(F.lit(1)).over(w)
            ),
        )
        .filter(F.col("l_quantity") < F.col("thr"))
        .join(cat.part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_weekly"
            )
        )
        .orderBy("p_brand")
    )
