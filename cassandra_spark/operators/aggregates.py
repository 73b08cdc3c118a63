"""Aggregation tier A1-A7 (+ set ops X12-X14 live in setops.py).

CQL's native aggregates (`[C* cql3/functions/AggregateFcts]`, unverified —
SURVEY.md §0) plus the analytic extensions. All numeric aggregates over
double columns route through exactmath decimal arithmetic for oracle parity;
integer aggregates are naturally exact.

Scale posture: every groupBy here is a map-side-partial + final hash
aggregate (Spark plans partial_sum/partial_count automatically — the same
partial→final split the reference coordinator does for count). The global
aggregates (A1) reduce to a single row via partial aggregation, never a
single-task scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.exactmath import davg, dec, dsum, sql_davg, sql_dsum
from cassandra_spark.registry import query


@query(
    "a1_global_agg",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(l_quantity) AS BIGINT) AS n_qty,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_davg('l_extendedprice', 'avg_price')}
    FROM lineitem
    """,
)
def a1_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/min/max/sum/avg — CQL 2.2+ natives (+ Thrift-era get_count)."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum("l_quantity", "sum_qty"),
        davg("l_extendedprice", "avg_price"),
    )


@query(
    "a2_groupby_pk",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_price')},
           {sql_davg('l_discount', 'avg_disc')}
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def a2_groupby_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY (TPC-H Q1 shape). CQL 3.10 restricts grouping to PK prefix
    (`[C* db/aggregation/GroupMaker]`); Spark is the strict superset."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
            davg("l_discount", "avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "a3_distinct_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def a3_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — exact distinct (Spark expands to a two-stage
    aggregate). The HLL analogue (approx_count_distinct ≈
    `[C* utils/EstimatedHistogram]` cardinality estimation) is exercised in
    tests, not oracle-compared (sketches differ across engines by design)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "a5_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (extension; absent upstream)."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


@query(
    "a6_uda_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                         * CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a6_uda_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate (`CREATE AGGREGATE`, `[C* cql3/functions/
    UDAggregate]`): quantity-weighted average price. Expressed as composed
    built-ins (state = (Σwx, Σw), final = ratio) — the same sfunc/finalfunc
    decomposition the reference compiles, but whole-stage-codegen'd; a
    pandas_udf GROUPED_AGG variant lives in udfs.py for the general case."""
    from cassandra_spark.exactmath import dec

    cat = Catalog(spark, sf_dir)
    wsum = F.sum(dec("l_extendedprice") * dec("l_quantity")).cast("double")
    w = F.sum(dec("l_quantity")).cast("double")
    return (
        cat.lineitem.groupBy("l_returnflag")
        .agg((wsum / w).alias("weighted_avg_price"))
        .orderBy("l_returnflag")
    )


@query(
    "a7_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS p50_qty,
           CAST(quantile_cont(l_quantity, 0.95) AS DOUBLE) AS p95_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a7_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles (`[C* utils/EstimatedHistogram]` is the reference's
    internal histogram). Exact interpolated percentile on both engines
    (Spark `percentile` ≡ DuckDB `quantile_cont`); percentile_approx is the
    100 TB path (t-digest sketch, one pass, mergeable) — tested separately
    since sketches don't oracle-compare."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("p50_qty"),
            F.percentile("l_quantity", F.lit(0.95)).alias("p95_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "a8_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a8_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all 2^k key subsets in one pass (extension;
    absent upstream). Spark expands to a single expanded-grouping
    aggregate — one shuffle, not 2^k scans."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


# fixed vocabulary so the pivot is a static projection on both engines
# (open-ended pivot would need a driver-side distinct — not a 100 TB plan)
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "a9_pivot_events",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS day,
           {", ".join(
               "CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) "
               f"FILTER (WHERE event_type = '{t}') AS VARCHAR) AS DOUBLE) "
               f"AS {t}"
               for t in EVENT_TYPES
           )}
    FROM events
    GROUP BY CAST(ts AS DATE)
    ORDER BY day
    """,
)
def a9_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-day event-type value matrix. With an explicit value
    list the pivot is one hash aggregate over conditional sums (no
    distinct-scan, no second shuffle); absent days/types stay NULL on
    both engines."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.events.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum(dec("value")).cast("double"))
        .orderBy("day")
    )
