"""Read-path tier: R1-R9 scans, P1-P6 predicates, O1-O4 order/limit.

Re-expresses the reference's read path (`[C* db/SinglePartitionReadCommand,
db/PartitionRangeReadCommand, db/filter/*]`, unverified — SURVEY.md §0) as
declarative DataFrame constructors. There is deliberately NO index machinery
here: Catalyst predicate pushdown + parquet row-group stats replace bloom
filters / key caches / 2i (SURVEY.md §4.1). Every filter below reaches the
parquet scan as a PushedFilter (asserted in tests/test_plans.py).

Scale posture: point/slice lookups prune at the scan; range scans stay
narrow (no shuffle); the only wide op in this module is the per-partition
window in o3 — keyed by the table's partition key, which is exactly how the
data would already be bucketed at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators import murmur3
from cassandra_spark.registry import query

# ---------------------------------------------------------------------------
# R-tier: scans
# ---------------------------------------------------------------------------


@query(
    "r1_point_lookup",
    oracle="SELECT * FROM lineitem WHERE l_orderkey = 7",
)
def r1_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-partition read: full-PK equality fetches one partition's rows.

    `[C* db/SinglePartitionReadCommand.java]` → parquet predicate pushdown;
    at 100 TB with data written partitioned/sorted by pk this touches one
    file's one row group.
    """
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.filter(F.col("l_orderkey") == 7)


@query(
    "r2_in_lookup",
    oracle="SELECT * FROM lineitem WHERE l_orderkey IN (1, 7, 42, 99, 1001)",
)
def r2_in_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-partition read (`IN`): `[C* cql3/restrictions/...]` → isin
    pushdown (In filter reaches the scan)."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.filter(F.col("l_orderkey").isin(1, 7, 42, 99, 1001))


@query(
    "r3_range_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem WHERE l_orderkey BETWEEN 100 AND 500
    """,
)
def r3_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-range scan (`get_range_slices`): contiguous key range +
    column pruning; both the range predicate and the 4-column ReadSchema
    reach the parquet reader."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.filter(F.col("l_orderkey").between(100, 500)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )


@query(
    "r4_clustering_slice",
    oracle="""
    SELECT * FROM lineitem
    WHERE l_orderkey = 7 AND l_linenumber >= 2 AND l_linenumber < 5
    """,
)
def r4_clustering_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering slice within a partition: pk equality + ck range
    (`[C* db/filter/ClusteringIndexSliceFilter]`). With ck-sorted writes the
    row-group min/max stats on l_linenumber prune inside the partition."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.filter(
        (F.col("l_orderkey") == 7)
        & (F.col("l_linenumber") >= 2)
        & (F.col("l_linenumber") < 5)
    )


@query(
    "r5_secondary_filter",
    oracle="SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'",
)
def r5_secondary_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-PK equality — what the reference needs a secondary index for
    (`[C* index/internal/CassandraIndex]`); Spark needs nothing: the scan
    filters in place, in parallel."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.filter(F.col("o_orderpriority") == "1-URGENT")


@query(
    "r6_like_search",
    oracle="""
    SELECT doc_id, source, lang FROM documents
    WHERE text LIKE '%spark%' AND source LIKE 'src1%'
    """,
)
def r6_like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SASI/SAI-style text search (`LIKE 'pre%'`, contains) as native
    pushed-down string predicates (StringStartsWith/StringContains)."""
    cat = Catalog(spark, sf_dir)
    return cat.documents.filter(
        F.col("text").contains("spark") & F.col("source").startswith("src1")
    ).select("doc_id", "source", "lang")


@query(
    "r8_mat_view",
    oracle="""
    SELECT event_type, ts, event_id, user_id, value
    FROM events WHERE event_type = 'purchase'
    """,
)
def r8_mat_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view read: the view re-keys events by event_type
    (`[C* db/view/ViewManager]`). Batch recompute = re-project + re-partition
    by the view PK; at scale the view would be *written* partitioned by
    event_type so this read prunes to one partition directory."""
    cat = Catalog(spark, sf_dir)
    view = materialized_view(
        cat.events,
        view_pk=["event_type"],
        clustering=[F.col("ts").desc(), F.col("event_id")],
        cols=["event_type", "ts", "event_id", "user_id", "value"],
    )
    return view.filter(F.col("event_type") == "purchase")


def materialized_view(base: DataFrame, view_pk, clustering, cols) -> DataFrame:
    """MV maintenance recast as batch recompute (W7 ≡ R8, SURVEY.md §2.9):
    select → drop null view-keys (CQL MVs require IS NOT NULL on view PK) →
    repartition by view PK → clustering order within partitions."""
    df = base.select(*cols)
    for k in view_pk:
        df = df.filter(F.col(k).isNotNull())
    return df.repartition(*view_pk).sortWithinPartitions(*clustering)


@query(
    "r9_keyset_page",
    oracle="""
    SELECT * FROM lineitem
    WHERE l_orderkey > 55 OR (l_orderkey = 55 AND l_linenumber > 3)
    ORDER BY l_orderkey, l_linenumber LIMIT 50
    """,
)
def r9_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paging cursor (`[C* service/pager/QueryPagers]`): keyset pagination —
    resume strictly after (pk=55, ck=3), one page of 50. (pk, ck) is a total
    order, so the page is deterministic. Catalyst turns orderBy+limit into
    TakeOrderedAndProject (no full sort)."""
    cat = Catalog(spark, sf_dir)
    after = (F.col("l_orderkey") > 55) | (
        (F.col("l_orderkey") == 55) & (F.col("l_linenumber") > 3)
    )
    return (
        cat.lineitem.filter(after)
        .orderBy("l_orderkey", "l_linenumber")
        .limit(50)
    )


def page_after(
    df: DataFrame,
    key_cols: list[str],
    cursor: tuple | None,
    page_size: int,
) -> DataFrame:
    """Generic keyset pager behind r9: rows strictly after ``cursor`` in
    (key_cols) lexicographic order, one page. ``cursor=None`` → first page.
    The tuple-> predicate expansion keeps every page a pushdown-able range
    scan + TakeOrderedAndProject — state lives in the cursor, not the
    engine (exactly the reference's paging-state token)."""
    if cursor is not None:
        if len(cursor) != len(key_cols):
            raise ValueError("cursor arity != key arity")
        pred = None
        for i in range(len(key_cols)):
            eq = None
            for c, v in zip(key_cols[:i], cursor[:i]):
                term = F.col(c) == F.lit(v)
                eq = term if eq is None else (eq & term)
            gt = F.col(key_cols[i]) > F.lit(cursor[i])
            clause = gt if eq is None else (eq & gt)
            pred = clause if pred is None else (pred | clause)
        df = df.filter(pred)
    return df.orderBy(*key_cols).limit(page_size)


# ---------------------------------------------------------------------------
# P-tier: predicates / projections
# ---------------------------------------------------------------------------


@query(
    "p1_project",
    oracle="""
    SELECT c_name AS name, c_mktsegment AS segment, c_acctbal AS balance
    FROM customer WHERE c_custkey < 100
    """,
)
def p1_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection with aliases (`[C* cql3/selection/Selection]`);
    ReadSchema shrinks to exactly these columns."""
    cat = Catalog(spark, sf_dir)
    return cat.customer.filter(F.col("c_custkey") < 100).select(
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("balance"),
    )


@query(
    "p2_expr_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS net_price,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def p2_expr_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selector expressions: arithmetic, CAST, function calls
    (`[C* cql3/selection/Selector]`). Exact-decimal arithmetic keeps the
    computed double bit-identical to the oracle."""
    from cassandra_spark.exactmath import revenue_col

    cat = Catalog(spark, sf_dir)
    return cat.lineitem.filter(F.col("l_orderkey") < 200).select(
        "l_orderkey",
        "l_linenumber",
        revenue_col().cast("double").alias("net_price"),
        F.year("l_shipdate").alias("ship_year"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )


@query(
    "p3_tuple_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE (l_orderkey > 40 OR (l_orderkey = 40 AND l_linenumber >= 2))
      AND (l_orderkey < 60 OR (l_orderkey = 60 AND l_linenumber <= 3))
    """,
)
def p3_tuple_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column tuple relations `(a,b) >= (x,y)` expanded to the
    equivalent boolean form (`[C* cql3/restrictions/...]`) — still fully
    pushdown-able (disjunction of range filters on scan columns)."""
    cat = Catalog(spark, sf_dir)
    lo = (F.col("l_orderkey") > 40) | (
        (F.col("l_orderkey") == 40) & (F.col("l_linenumber") >= 2)
    )
    hi = (F.col("l_orderkey") < 60) | (
        (F.col("l_orderkey") == 60) & (F.col("l_linenumber") <= 3)
    )
    return cat.lineitem.filter(lo & hi).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "p4_contains",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE list_contains(string_split(text, ' '), 'spark')
    """,
)
def p4_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL `CONTAINS` on a collection (`[C* db/filter/RowFilter]`): exact
    set-membership on the tokenized text (vs r6's substring match)."""
    cat = Catalog(spark, sf_dir)
    return cat.documents.filter(
        F.array_contains(F.split(F.col("text"), " "), "spark")
    ).select("doc_id", "lang")


# token(): bit-exact Cassandra Murmur3Partitioner tokens
# (`[C* dht/Murmur3Partitioner :: getToken, unverified]`) — see
# operators/murmur3.py. The Spark side is a numpy-vectorized pandas_udf;
# the oracle recomputes the identical hash as generated DuckDB SQL
# (HUGEINT mod-2^64 arithmetic), so the driver's value-hash compare is a
# true cross-engine differential test of every token in the corpus.
_P5_TOKEN_LO = 0
_P5_TOKEN_HI = 1 << 62


@query(
    "p5_token_range",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT l_orderkey, l_linenumber FROM lineitem", "l_orderkey")}
    )
    SELECT * FROM __toks
    WHERE token BETWEEN {_P5_TOKEN_LO} AND {_P5_TOKEN_HI}
    """,
)
def p5_token_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token()-range scan: how the reference splits the ring for parallel
    bulk reads (the Spark-connector pattern). Each worker takes a token
    slice; here one slice is materialized, keyed by REAL Murmur3 tokens —
    a production driver's token-range round-trip lines up bit-for-bit."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.withColumn("token", murmur3.token_col(F.col("l_orderkey")))
        .filter(F.col("token").between(_P5_TOKEN_LO, _P5_TOKEN_HI))
        .select("l_orderkey", "l_linenumber", "token")
    )


@query(
    "p6_token_text",
    oracle=murmur3.duckdb_token_query_ascii(
        "SELECT DISTINCT c_mktsegment FROM customer", "c_mktsegment"
    ),
)
def p6_token_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ring placement of a TEXT-keyed table's partitions: Murmur3 tokens
    of the UTF-8-serialized key (`[C* db/marshal/UTF8Type, unverified]`).
    The segment values span 8-10 bytes, so this is the oracle-checked
    coverage of the k2 tail leg (bytes 8-14) that 8-byte bigint keys
    never touch; the DuckDB side recomputes the identical hash from
    per-character byte lanes (ASCII ≤ 15 bytes, asserted in tests)."""
    murmur3.ensure_token_registered(spark)
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.select("c_mktsegment")
        .distinct()
        .withColumn("token", F.expr("cassandra_token(c_mktsegment)"))
    )


@query(
    "p7_token_composite",
    oracle=murmur3.duckdb_token_query_composite(
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_orderkey <= 400",
        "l_orderkey",
        "l_linenumber",
    ),
)
def p7_token_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ring placement for a COMPOSITE partition key ((l_orderkey,
    l_linenumber)): CompositeType framing — 2-byte BE length + bytes +
    0x00 per component — hashed as one 16-byte body block plus a 2-byte
    tail. This is the oracle-checked coverage of Murmur3's body-block leg
    (canonical masked lanes), which single-column bigint/short-text keys
    never exercise; the DuckDB side recomputes the identical 18-lane
    chain from an independent SQL formulation."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.filter(F.col("l_orderkey") <= 400)
        .select(
            "l_orderkey",
            "l_linenumber",
            murmur3.composite_token_col(
                F.col("l_orderkey"), F.col("l_linenumber")
            ).alias("token"),
        )
    )


@query(
    "p11_token_int32",
    oracle=murmur3.duckdb_token_query_int32(
        "SELECT c_custkey, c_nationkey FROM customer "
        "WHERE c_custkey % 50 = 17",
        "c_nationkey",
    ),
)
def p11_token_int32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ring placement for an INT (4-byte) partition key: Int32Type
    serializes 4 big-endian bytes (`[C* db/marshal/Int32Type,
    unverified]`), so the same numeric value tokenizes DIFFERENTLY than
    in a bigint column — the serialization-fidelity case a stand-in hash
    can't catch. Three-way differential: numpy pandas_udf vs pure-Python
    vs the DuckDB 4-lane chain (tests/test_murmur3.py)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.filter(F.col("c_custkey") % 50 == 17)
        .select(
            "c_custkey",
            "c_nationkey",
            murmur3.int32_token_udf()(F.col("c_nationkey")).alias("token"),
        )
    )


# ---------------------------------------------------------------------------
# O-tier: ordering / limits
# ---------------------------------------------------------------------------


@query(
    "o1_order_within_pk",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    WHERE o_custkey = 42 ORDER BY o_orderdate DESC, o_orderkey
    """,
)
def o1_order_within_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-order read: within one partition, rows come back in
    (reversed) clustering order — orders models pk=o_custkey,
    clustering=(o_orderdate DESC, o_orderkey) per FIXTURES.md."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.filter(F.col("o_custkey") == 42)
        .orderBy(F.col("o_orderdate").desc(), "o_orderkey")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "o2_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 10
    """,
)
def o2_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT with short-circuit (`[C* db/filter/DataLimits]`): Catalyst
    plans TakeOrderedAndProject — per-partition top-10 then merge, never a
    global sort."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "o3_per_partition_limit",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
)
def o3_per_partition_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER PARTITION LIMIT k (`[C* db/filter/DataLimits#CQLPerPartitionLimits]`):
    newest 2 orders per customer. One shuffle on the partition key — the
    shuffle the data layout would already have at scale. Tie-break by
    o_orderkey for determinism."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey")
    )
    return (
        cat.orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )


@query(
    "o4_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def o4_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: orderBy(desc).limit(k) → TakeOrderedAndProject (distributed
    partial top-k, no global sort). o_orderkey tie-break keeps it total."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(15)
    )
