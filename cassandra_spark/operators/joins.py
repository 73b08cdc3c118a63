"""Join tier X1-X6 (SURVEY.md §2.3).

The reference has NO joins by design (wide-column OLTP: denormalize
instead); its nearest analogues are coordinator multi-partition assembly and
the read-path merge (→ W4). The north star mandates full DataFrame
analytics, so the engine ships Spark's complete join surface, exercised on
the TPC-H-ish fixtures.

Scale posture per query: dimension sides are broadcast (no fact shuffle);
fact⋈fact joins shuffle on their keys with AQE skew handling; the as-of
join uses the union+window encoding — zero join blowup, one shuffle on the
partition key, which is THE scalable as-of pattern at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.exactmath import dsum, sql_dsum
from cassandra_spark.registry import query


@query(
    "x1_join_inner",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def x1_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join, fact⋈fact: Catalyst picks SMJ or shuffled-hash;
    AQE may flip to broadcast once the filtered orders side proves small."""
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    return (
        cat.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice", "sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "x2_join_broadcast",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    """,
)
def x2_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join chain: nation and region are ring-metadata-sized —
    explicitly broadcast so the customer side never shuffles."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(
            F.broadcast(cat.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(cat.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "x3_join_outer",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_big_orders
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c_custkey = o.o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def x3_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero matches —
    COUNT(col) counts non-null only, so empty groups show 0."""
    cat = Catalog(spark, sf_dir)
    big = cat.orders.filter(F.col("o_totalprice") > 400000)
    return (
        cat.customer.join(
            big, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


@query(
    "x4_join_semi_anti",
    oracle="""
    SELECT c_custkey, 'has_urgent' AS tag FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT c_custkey, 'no_recent' AS tag FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    """,
)
def x4_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi + left anti. Anti is also the tombstone-shadowing algebra
    (W3) and EXISTS/NOT EXISTS in the oracle."""
    cat = Catalog(spark, sf_dir)
    urgent = cat.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    recent = cat.orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    semi = (
        cat.customer.join(
            urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        )
        .select("c_custkey")
        .withColumn("tag", F.lit("has_urgent"))
    )
    anti = (
        cat.customer.join(
            recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .select("c_custkey")
        .withColumn("tag", F.lit("no_recent"))
    )
    return semi.unionByName(anti)


@query(
    "x5_join_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_partkey, p_size,
           l_quantity
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_quantity > p_size AND p_size >= 40
    """,
)
def x5_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: equi key + inequality residual — the scalable
    range-join pattern (hash-partition on the equi key, evaluate the range
    residual post-probe). A pure theta join (no equi key) degenerates to
    broadcast-nested-loop; always find a blocking key first at scale."""
    cat = Catalog(spark, sf_dir)
    part = cat.part.filter(F.col("p_size") >= 40)
    return (
        cat.lineitem.join(
            part,
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_quantity") > F.col("p_size")),
        )
        .select("l_orderkey", "l_linenumber", "p_partkey", "p_size", "l_quantity")
    )


# As-of key packing: (µs since 2024-01-01) * 1e6 + event_id. Fits bigint
# through sf1 (31 days rel-µs ≈ 2.7e12; ×1e6 + id < 2.7e18 < 2^63) and is
# order-isomorphic to (ts, event_id), so windowed MAX is argmax-by-time with
# an event_id tie-break.
_EPOCH0_US = 1704067200 * 1_000_000  # 2024-01-01 00:00:00 UTC
_ID_SPACE = 1_000_000


@query(
    "x6_join_asof",
    oracle=f"""
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           make_timestamp(click_key // {_ID_SPACE} + {_EPOCH0_US})
             AS last_click_ts,
           click_key % {_ID_SPACE} AS last_click_id
    FROM (
      SELECT *,
             MAX(CASE WHEN event_type = 'click'
                      THEN (epoch_us(ts) - {_EPOCH0_US}) * {_ID_SPACE}
                           + event_id END)
               OVER (PARTITION BY user_id
                     ORDER BY ts, (event_type = 'click') DESC, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS click_key
      FROM events WHERE event_type IN ('click', 'purchase')
    ) WHERE event_type = 'purchase'
    """,
)
def x6_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's latest click at-or-before
    it — the 'read at timestamp' pattern (x6, SURVEY.md §2.3).

    Encoded as union+window (tag streams, one window over the merged
    timeline) instead of join+filter+rank: no candidate-pair blowup, one
    shuffle on user_id — THE scalable as-of pattern. Ties at equal ts
    resolve clicks-first (a click at the purchase instant counts), then
    highest event_id via the packed key."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events.filter(F.col("event_type").isin("click", "purchase"))
    click_key = F.when(
        F.col("event_type") == "click",
        (F.unix_micros(F.col("ts")) - F.lit(_EPOCH0_US)) * _ID_SPACE
        + F.col("event_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts"),
            (F.col("event_type") == "click").desc(),
            F.col("event_id"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.withColumn("click_key", F.max(click_key).over(w))
    return tagged.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.timestamp_micros(
            F.expr(f"click_key div {_ID_SPACE}") + F.lit(_EPOCH0_US)
        ).alias("last_click_ts"),
        (F.col("click_key") % _ID_SPACE).alias("last_click_id"),
    )
