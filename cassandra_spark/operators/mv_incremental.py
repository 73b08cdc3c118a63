"""w11: incremental materialized-view maintenance — the W7 scale path.

The reference maintains materialized views per-write (`[C* db/view/
ViewUpdateGenerator, unverified]`): each base mutation produces view
deltas, never a recompute. r8_mat_view models the *recompute* form; this
operator models the *incremental* form for an aggregate view and proves
the two agree: the query returns old_view ⊕ Δ(changes) while the oracle
recomputes the view over the updated base from scratch in DuckDB — equal
results mean the delta algebra is exact.

View: orders grouped by priority → (row count, exact total price).
Change set (deterministic from the fixture, standing in for a CDC feed):
- rows with o_orderkey % 13 = 0 are UPDATED: price += 100 and the row
  moves to a brand-new 'X-'-prefixed group (exercises group exit, group
  entry, and group creation);
- rows with o_orderkey % 17 = 3 are DELETED (group shrink, possibly to
  zero — zero-count groups must vanish from the view).

Delta algebra: every change row carries a signed multiplicity m ∈ {-1,+1}
(old image -1, new image +1); Δ per group = (Σm, Σ m·price) — both exact
(count is integral, price sums in decimal). Merge = full-outer join on the
group key, add componentwise, drop groups with count 0.

Scale posture: at 100 TB the old view is a stored table (tiny: one row per
group) and the change feed is the day's CDC batch — the incremental path
touches |Δ| rows instead of re-scanning the base, and the merge is a
broadcast-sized join. Here old_view is computed from the fixture because
no stored state exists; the fixture scan below is the stand-in for a view
table read, not part of the algebra being tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.exactmath import dec, dsum, sql_double
from cassandra_spark.registry import query

_ORACLE = f"""
WITH updated AS (
    SELECT
        CASE WHEN o_orderkey % 13 = 0
             THEN 'X-' || o_orderpriority ELSE o_orderpriority
        END AS o_orderpriority,
        CASE WHEN o_orderkey % 13 = 0
             THEN o_totalprice + 100 ELSE o_totalprice
        END AS price
    FROM orders
    WHERE NOT (o_orderkey % 17 = 3)
)
SELECT o_orderpriority,
       COUNT(*) AS cnt,
       {sql_double("SUM(CAST(price AS DECIMAL(18,4)))")} AS total
FROM updated
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("w11_mv_incremental", oracle=_ORACLE)
def w11_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate view maintained by delta merge; the oracle recomputes the
    same view from the updated base — results must match exactly."""
    cat = Catalog(spark, sf_dir)
    base = cat.orders.select("o_orderkey", "o_orderpriority", "o_totalprice")

    old_view = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("o_totalprice")).alias("total_dec"),
    )

    updated_mask = F.col("o_orderkey") % 13 == 0
    deleted_mask = F.col("o_orderkey") % 17 == 3
    changed = base.filter(updated_mask | deleted_mask)

    # signed change images: old -1 (update + delete), new +1 (update only)
    old_img = changed.select(
        "o_orderpriority",
        F.col("o_totalprice").alias("price"),
        F.lit(-1).alias("m"),
    )
    new_img = (
        changed.filter(updated_mask & ~deleted_mask)
        .select(
            F.concat(F.lit("X-"), F.col("o_orderpriority")).alias(
                "o_orderpriority"
            ),
            (F.col("o_totalprice") + 100).alias("price"),
            F.lit(1).alias("m"),
        )
    )
    delta = (
        old_img.unionByName(new_img)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("m").alias("dcnt"),
            F.sum(dec("price") * F.col("m").cast("decimal(2,0)")).alias(
                "dtotal_dec"
            ),
        )
    )

    zero = F.lit(0).cast("decimal(38,4)")
    return (
        old_view.join(delta, "o_orderpriority", "full")
        .select(
            "o_orderpriority",
            (
                F.coalesce(F.col("cnt"), F.lit(0))
                + F.coalesce(F.col("dcnt"), F.lit(0))
            ).alias("cnt"),
            (
                F.coalesce(F.col("total_dec").cast("decimal(38,4)"), zero)
                + F.coalesce(F.col("dtotal_dec").cast("decimal(38,4)"), zero)
            ).alias("total_dec"),
        )
        .filter(F.col("cnt") > 0)
        .select(
            "o_orderpriority",
            "cnt",
            F.col("total_dec").cast("double").alias("total"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# w21: incremental JOIN-view maintenance (the denormalized double-write)
# ---------------------------------------------------------------------------
#
# The reference's canonical data-modeling pattern is the denormalized
# double-write: an ENRICHMENT view (fact joined with its dimension) kept
# in lockstep with the base table. w11 covers the aggregate-view delta
# algebra; this covers the join view:
#
#   view1 = (view0 ANTI-JOIN deleted keys) UNION (delta JOIN dim)
#
# The incremental path never re-joins OLD fact rows with the dimension —
# only the delta batch touches the join — and the dimension side is
# broadcast (model-sized). The oracle recomputes the final enriched view
# from scratch; equality proves the maintenance algebra exact, including
# delete retraction.
#
# Change set (deterministic, standing in for a CDC batch):
#   - orders with o_orderkey % 97 = 3 are NEW (arrive after view0 built)
#   - orders with o_orderkey % 97 = 11 are DELETED

_W21_ORACLE = f"""
WITH final_orders AS (
    SELECT * FROM orders WHERE NOT (o_orderkey % 97 = 11)
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       {sql_double("SUM(CAST(o_totalprice AS DECIMAL(18,4)))")} AS total
FROM final_orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("w21_join_mv_incremental", oracle=_W21_ORACLE)
def w21_join_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an enrichment (join) view — see the
    block comment. view0 is persisted as the stand-in for the stored
    view table (at 100 TB it IS a table; the block is released by the
    sweep-level registry.release_caches contract, like every other
    constructor persist); the maintenance step anti-joins
    the delete keys (broadcast — a CDC batch's key set is small) and
    unions the delta batch joined against the customer dimension
    (hint-free: customer is SF-linear, AQE picks the strategy). The
    returned aggregate over the maintained view equals the
    from-scratch recompute bit-for-bit (decimal sums)."""
    cat = Catalog(spark, sf_dir)
    orders, cust = cat.orders, cat.customer
    is_new = F.col("o_orderkey") % 97 == 3
    is_del = F.col("o_orderkey") % 97 == 11
    enrich_cols = [
        "o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment",
    ]
    # the stored view: everything that existed before the CDC batch
    view0 = (
        orders.filter(~is_new)
        # customer is SF-linear: no broadcast hint (AQE decides)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(*enrich_cols)
        .persist()
    )
    # maintenance: retract deletes, append the enriched delta
    del_keys = orders.filter(is_del).select("o_orderkey")
    delta = (
        orders.filter(is_new)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(*enrich_cols)
    )
    view1 = view0.join(
        F.broadcast(del_keys), "o_orderkey", "left_anti"
    ).unionByName(delta)
    return (
        view1.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice", "total"),
        )
        .orderBy("c_mktsegment")
    )
