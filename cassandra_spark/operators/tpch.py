"""Deep multi-join analytic queries in classic TPC-H shapes (X tier — the
analytics-via-DataFrames extension, SURVEY.md §2.3).

The reference cannot run any of these (no joins in CQL); they exist to
prove the engine's Catalyst-side join planning end-to-end on 3- and 4-way
trees with semi-join-like HAVING shapes. Adapted to the fixture's column
subset (no partsupp table); exact-decimal aggregates per exactmath.

Scale posture: only O(constant) dims (nation/region) and provably
sub-linear filtered sets carry broadcast hints; SF-linear tables
(customer, supplier, part, orders, lineitem) never do — AQE picks BHJ at
bench scale and degrades to shuffle join at 100 TB. Fact⋈fact joins
(lineitem⋈orders) shuffle on the join key once and AQE splits skew;
top-k finals are TakeOrderedAndProject, never global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
            cat.customer.filter(F.col("c_mktsegment") == "BUILDING"),
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
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
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
    return x17_core(cat.lineitem, cat.orders, cat.customer)


def x17_core(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Q18 plan over explicit inputs (also consumed by the bucketed-layout
    variant in operators/bucketing.py)."""
    # aggregate the fact table FIRST (one narrow-key shuffle, map-side
    # combined — zero-exchange when the input is bucketed on l_orderkey),
    # filter to the ~1% tail, THEN join dims — at 100 TB this shuffles
    # quantities, not customer names
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("__qty")
        )
        .filter(F.col("__qty") > 270)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
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


@query(
    "x22_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_double(f"SUM({SQL_REVENUE})")} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def x22_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR of three
    conjunctive predicate blocks spanning both join sides. The part side
    broadcasts; the disjunction is a single post-join filter Catalyst
    keeps in codegen (no union-of-three-scans rewrite needed), and the
    per-side prunable conjuncts (l_quantity <= 30, p_size <= 35) are what
    an optimizer can hoist — asserted in plan tests."""
    cat = Catalog(spark, sf_dir)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    blocks = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(20, 30))
    )
    return (
        cat.lineitem.join(
            cat.part, F.col("p_partkey") == F.col("l_partkey")
        )
        .filter(blocks)
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
    )


@query(
    "x23_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def x23_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finished order ("late" adapted to shipdate > orderdate
    + 90d — the fixture has no commit/receipt dates). The distinctive
    plan: fact self-SEMI-join (another supplier exists) then fact
    self-ANTI-join (no other late supplier), both on the already-shuffled
    l_orderkey key, so the three lineitem branches co-partition and the
    semi/anti residual (suppkey <>) evaluates without extra exchanges."""
    cat = Catalog(spark, sf_dir)
    return x23_core(cat.lineitem, cat.orders, cat.supplier)


def x23_core(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame
) -> DataFrame:
    """Q21 plan over explicit inputs (also consumed by the bucketed-layout
    variant in operators/bucketing.py).

    One-fact-shuffle form (r12 opt round, guide §2.4): the original plan
    scanned lineitem THREE times — the late branch, a self-SEMI-join
    ("another supplier exists") and a self-ANTI-join ("no other late
    supplier") — shuffling the fact on l_orderkey for each branch. Both
    existence tests are per-order aggregates over the same rows, so one
    pass computes them: pre-aggregate to (l_orderkey, l_suppkey) with a
    late-row count, then two window sums over l_orderkey give the
    per-order supplier count and late-supplier count. A sole-late
    supplier's rows are exactly (n_late_rows > 0, n_supp >= 2,
    n_late_supp == 1), and its late-row count is the numwait
    contribution. After the join's exchange on l_orderkey, the pre-agg
    (subset-key clustering) and the windows reuse the partitioning — the
    fact crosses the network once. Result-identical to the semi/anti
    form (same oracle; parity pinned in tests/test_bucketing.py)."""
    lo = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        ).alias("is_late"),
    )
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.col("is_late").cast("long")).alias("n_late_rows")
    )
    w = Window.partitionBy("l_orderkey")
    sole_late = (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_late_supp",
            F.sum((F.col("n_late_rows") > 0).cast("long")).over(w),
        )
        .filter(
            (F.col("n_late_rows") > 0)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        # supplier is SF-linear (10k x SF): no broadcast hint — AQE picks
        # BHJ at bench scale and falls back to shuffle join at 100 TB
        sole_late.join(
            supplier, F.col("s_suppkey") == F.col("l_suppkey")
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "x24_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def x24_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count-per-customer distribution, keeping
    zero-order customers via a LEFT OUTER join whose filter lives in the
    join condition (not a WHERE — that would turn it inner). Two-level
    aggregate; the second groupBy keys on the first's output so it's a
    cheap low-cardinality shuffle."""
    cat = Catalog(spark, sf_dir)
    c_orders = (
        cat.customer.join(
            cat.orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "x25_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
           {sql_double(f"SUM({SQL_REVENUE})")} AS volume
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def x25_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume by year between two nations.
    A 6-way tree where only lineitem⋈orders is fact⋈fact; both nation
    legs broadcast (customer/supplier are SF-linear, so AQE picks their
    strategy), and the nation-pair disjunction filters before the
    aggregate. The nation filter applies at the broadcast build side, so
    the big probe rows that survive are already pair-restricted."""
    cat = Catalog(spark, sf_dir)
    n1 = cat.nation.select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = cat.nation.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        cat.lineitem.join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("nk1") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("nk2") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(revenue_col()).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "x26_priority_by_status",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_linestatus = 'F'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def x26_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional two-way counts (urgent vs not) per
    shipping class (l_returnflag stands in for the fixture's missing
    l_shipmode). The lineitem filters (date window + status) push to the
    parquet scan before the join — asserted in plan tests."""
    cat = Catalog(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_linestatus") == "F")
        )
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "x27_promo_revenue",
    oracle=f"""
    SELECT {sql_double(f"SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE} "
                       f"ELSE CAST(0 AS DECIMAL(18,4)) END)")} * 100
           / {sql_double(f"SUM({SQL_REVENUE})")} AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
)
def x27_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month — conditional
    aggregate over a broadcast join, with the ratio computed as exact
    decimal sums cast to double before one IEEE multiply + divide (the
    exactmath discipline for cross-engine bit-equality)."""
    cat = Catalog(spark, sf_dir)
    promo = F.when(
        F.col("p_type") == "PROMO", revenue_col()
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .join(cat.part, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                F.sum(promo).cast("double")
                * 100
                / F.sum(revenue_col()).cast("double")
            ).alias("promo_pct")
        )
    )
