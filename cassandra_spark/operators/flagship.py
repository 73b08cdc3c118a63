"""Flagship query (SURVEY.md §7 M0): revenue by nation.

lineitem ⋈ orders ⋈ customer ⋈ nation, date-range filter, exact-decimal
revenue aggregate, order by revenue desc — scan + filter + 3 joins + agg +
sort in one plan.

Scale posture (100 TB): customer and nation are dimension tables —
broadcast-joined (no shuffle of the fact side for them); the lineitem⋈orders
join is the only real shuffle and AQE handles skew. The o_orderdate filter
and column pruning reach the parquet scan (verified via .explain: see
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.exactmath import SQL_REVENUE, revenue_col
from cassandra_spark.registry import query

_ORACLE = f"""
SELECT n_name, CAST(CAST(SUM({SQL_REVENUE}) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("q_flagship_revenue_by_nation", oracle=_ORACLE)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        cat.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # no hint on customer: it grows with the corpus (150k rows x SF) --
        # AQE picks BHJ at bench scale and falls back to SMJ at 100 TB
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )
