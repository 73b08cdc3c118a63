"""Third batch of TPC-H shapes (X tier, SURVEY.md §2.3): the five classics
that need the partsupp relation — Q2 (min-cost supplier), Q9 (product-type
profit), Q11 (important stock), Q16 (parts/supplier relationship), Q20
(potential part promotion).

The fixture set has no partsupp table, so these run over a DERIVED supply
relation — one row per (part, supplier) pair that actually traded in
lineitem, with availqty := total quantity traded and supplycost := the
minimum extended price seen. Both engines derive it with the same grouped
aggregation (`_SUPPLY_SQL` / :func:`_supply`), so the join/subquery
STRUCTURE of each Q-shape is exercised exactly; only the base relation's
provenance differs from stock TPC-H. Reference parity: upstream Cassandra
has no multi-table analytics at all — this tier is the "analytics via
DataFrames" north star, graded against the capability envelope (SURVEY §2,
reference checkout empty).

Scale posture (asserted in tests/test_plans.py):
- the supply derivation is ONE grouped pass over lineitem, partial→final
  on (partkey, suppkey) — at 100 TB it is the same shuffle a real
  partsupp scan would replace, and it is shared verbatim by all five
  queries (a production deployment would materialize it once);
- q2/q11/q16/q20 then touch only supply (|pairs| ≪ |lineitem|) joined to
  its dimensions — no second fact shuffle; O(constant) dims and filtered
  sub-linear part sets broadcast-hint, SF-linear supplier slices do not
  (AQE picks BHJ at bench scale, shuffle join at 100 TB);
- q9 is the one genuine fact⋈fact query: lineitem⋈supply on the composite
  (partkey, suppkey) key, both sides pre-pruned by the broadcast part
  filter before the shuffle;
- every threshold / ratio follows exactmath: exact decimal sums, one
  IEEE double op at the very end, identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.exactmath import (
    SQL_REVENUE,
    dec,
    revenue_col,
    sql_double,
)
from cassandra_spark.registry import query

# the shared partsupp stand-in (see module docstring)
_SUPPLY_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4))
               AS ps_availqty,
           MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS ps_supplycost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
"""


def _supply(cat: Catalog) -> DataFrame:
    """The derived supply relation. One grouped pass over lineitem;
    availqty is re-cast to decimal(18,4) so downstream products stay
    inside decimal(38) on both engines."""
    return (
        cat.lineitem.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum(dec("l_quantity")).cast("decimal(18,4)").alias("ps_availqty"),
            F.min(dec("l_extendedprice")).alias("ps_supplycost"),
        )
    )


@query(
    "x33_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    cand AS (
        SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name,
               p_partkey, p_brand
        FROM supply
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        JOIN part ON p_partkey = ps_partkey
        WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM (
        SELECT *, MIN(ps_supplycost) OVER (PARTITION BY ps_partkey)
                  AS min_cost
        FROM cand
    ) t
    WHERE ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def x33_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the European supplier(s)
    offering it at minimum cost. The correlated MIN subquery decorrelates
    to a per-part window min over the already part-filtered regional
    supply — the part and supplier⋈nation⋈region legs join BEFORE the
    window, so the one shuffle partitions only qualifying rows."""
    cat = Catalog(spark, sf_dir)
    sup_nat = (
        cat.supplier.join(
            F.broadcast(cat.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(cat.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    part_sel = cat.part.filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand")
    cand = (
        _supply(cat)
        # SHUFFLE_HASH, not broadcast: BOTH sides of this join are
        # SF-linear (sup_nat is 1/5 of supplier; supply derives from
        # lineitem pairs), so at cluster scale broadcasting either side
        # OOMs — and hint-free, Catalyst's static estimate picks the
        # categorically worse build side (it broadcasts the even larger
        # SUPPLY aggregate; measured round-9: 2.45x the sf1 floor
        # isolated). The shuffle-hash hint forbids BOTH broadcasts: the
        # join keys on suppkey with sup_nat as the per-partition build
        # side, a plan that survives every scale.
        .join(
            sup_nat.hint("shuffle_hash"),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(part_sel), F.col("p_partkey") == F.col("ps_partkey"))
    )
    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "x34_product_profit",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate) AS o_year,
           {sql_double(
               "SUM(" + SQL_REVENUE
               + " - ps_supplycost * CAST(l_quantity AS DECIMAL(18,4)))"
           )} AS sum_profit
    FROM lineitem
    JOIN supply ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def x34_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus supply cost) by supplier
    nation and order year for one product family. The one genuine
    fact⋈fact query of the batch: lineitem⋈supply shuffles on the
    composite (partkey, suppkey) key — BOTH sides are pre-pruned by the
    broadcast part filter so the shuffle moves only the product family's
    rows; nation broadcasts (supplier is SF-linear — AQE picks its
    strategy), orders joins on its own key."""
    cat = Catalog(spark, sf_dir)
    part_sel = cat.part.filter(F.col("p_name").like("%gear%")).select(
        "p_partkey"
    )
    supply = _supply(cat).join(
        F.broadcast(part_sel),
        F.col("ps_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    amount = revenue_col() - F.col("ps_supplycost") * dec("l_quantity")
    return (
        cat.lineitem.join(
            F.broadcast(part_sel), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(
            supply,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(cat.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cat.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "x35_important_stock",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    nat AS (
        SELECT ps_partkey, ps_supplycost * ps_availqty AS val
        FROM supply
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
    )
    SELECT ps_partkey, {sql_double("SUM(val)")} AS value
    FROM nat
    GROUP BY ps_partkey
    HAVING {sql_double("SUM(val)")} >
           (SELECT {sql_double("SUM(val)")} FROM nat) * 0.001
    ORDER BY value DESC, ps_partkey
    """,
)
def x35_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value at one nation's suppliers
    exceeds a fraction of that nation's total. The HAVING-against-scalar-
    subquery decorrelates to a 1-row global aggregate broadcast-crossed
    into the per-part aggregate — the nation's supply rows are scanned
    once into BOTH aggregates, never re-derived."""
    cat = Catalog(spark, sf_dir)
    sup_nat = (
        cat.supplier.join(
            F.broadcast(cat.nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    nat = (
        _supply(cat)
        # sup_nat is a nation slice of SF-linear supplier — no broadcast
        # hint (AQE picks BHJ at bench scale, shuffle join at 100 TB)
        .join(sup_nat, F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"),
        )
    )
    # the global total re-aggregates the PER-PART decimal sums (exact and
    # associative, so it equals the oracle's flat SUM); the persist is a
    # barrier so the supply derivation runs once for both branches — the
    # stored-partsupp-table analogue at 100 TB (cf. word_hash_table)
    per_part = (
        nat.groupBy("ps_partkey").agg(F.sum("val").alias("vdec")).persist()
    )
    total = per_part.agg(F.sum("vdec").cast("double").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .select(
            "ps_partkey",
            F.col("vdec").cast("double").alias("value"),
            "total",
        )
        .filter(F.col("value") > F.col("total") * 0.001)
        .select("ps_partkey", "value")
        .orderBy(F.desc("value"), "ps_partkey")
    )


@query(
    "x36_supplier_counts",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM supply
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 14, 23, 25, 36, 39, 49)
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def x36_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can furnish each qualifying
    part descriptor, excluding a complaint list (stand-in: negative
    account balance). NOT IN over a never-null key compiles to a
    broadcast left-anti join; the distinct count shuffles on the group
    key with partial distinct aggregation map-side."""
    cat = Catalog(spark, sf_dir)
    part_sel = cat.part.filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 14, 23, 25, 36, 39, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complaints = cat.supplier.filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        _supply(cat)
        .join(F.broadcast(part_sel), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            F.broadcast(complaints),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "x37_concentrated_suppliers",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (
        SELECT ps_suppkey FROM supply
        WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        AND 2 * (
            SELECT SUM(CAST(l_quantity AS DECIMAL(18,4))) FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
        ) > ps_availqty
      )
    ORDER BY s_name
    """,
)
def x37_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries with a correlated aggregate —
    suppliers of 'small' parts whose 1996 shipments exceed half their
    all-time traded quantity. The correlated per-(part, supplier) sum
    decorrelates to a grouped aggregate joined on the composite key; both
    IN clauses become semi joins (part list broadcast; the qualifying
    supplier set is aggregated fact output, semi-joined back to the tiny
    supplier dimension). All-exact-decimal threshold: 2·qty96 > availqty
    (no division, no doubles)."""
    cat = Catalog(spark, sf_dir)
    part_sel = cat.part.filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    qty96 = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("q_partkey"),
            F.col("l_suppkey").alias("q_suppkey"),
        )
        .agg(F.sum(dec("l_quantity")).alias("qty96"))
    )
    qualifying = (
        _supply(cat)
        .join(
            F.broadcast(part_sel),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            qty96,
            (F.col("ps_partkey") == F.col("q_partkey"))
            & (F.col("ps_suppkey") == F.col("q_suppkey")),
        )
        .filter(F.lit(2) * F.col("qty96") > F.col("ps_availqty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        cat.supplier.join(
            F.broadcast(cat.nation.filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            qualifying, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
