"""Bucketed table layout: the co-located-join scale path.

The reference co-locates data by token ownership — every replica holds a
deterministic hash range of the ring, so multi-table reads of the same key
never cross nodes (`[C* dht/Murmur3Partitioner, locator/TokenMetadata,
unverified]`). Spark's equivalent is BUCKETING: both tables pre-hashed
into the same number of buckets on the join key at WRITE time; a later
join reads bucket i of each side in the same task — zero shuffle, zero
sort when also sort-ordered (SURVEY.md §4.1 "token-aware placement").

At 100 TB this is the difference between an hourly fact⋈fact job paying
two full-table exchanges and paying none: bucket layout is bought once at
ingest and amortized over every downstream join/aggregation on that key
(the same trade as compaction.py's directory buckets, which serve point
lookups; bucketBy serves JOINS because Spark's planner consumes the
bucket metadata).

Two registered queries consume the layout end-to-end:
``x17_large_orders_bucketed`` / ``x23_waiting_suppliers_bucketed`` run the
exact Q18/Q21 plans over the bucketed tables and share the unbucketed
queries' oracles — same answer, zero exchanges on the fact join key
(plan-asserted in tests/test_bucketing.py). Their first call per
(session, sf_dir) builds the layout — idempotent ingest infrastructure,
the analytical plan itself stays declarative.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators.tpch import x17_core, x23_core
from cassandra_spark.registry import ORACLE, query


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-ordered) parquet
    table registered in the session catalog. ``path`` makes it external —
    no warehouse/metastore dependency; the bucket spec lives in the
    catalog entry, which is what lets the planner elide exchanges."""
    # Align the WRITE partitioning with the bucket hash (both are
    # HashPartitioning(key, buckets)), so every bucket lands as ONE file.
    # With multiple files per bucket Spark cannot trust the per-file sort
    # order and re-sorts both SMJ inputs per task — measured at 10x data
    # as the bucketed layout's growth inversion; one pre-sorted file per
    # bucket lets the join consume the layout with NO sort and NO
    # exchange (asserted in tests/test_bucketing.py).
    from pyspark.sql import functions as F

    w = (
        df.repartition(buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
    # Persist the bucket spec beside the data: a later session re-attaching
    # this layout must prove the files really carry this (key, buckets,
    # sort) before writing a CLUSTERED BY catalog entry — a catalog entry
    # that misdescribes the data makes exchange-elided joins silently wrong.
    local = path[5:] if path.startswith("file:") else path
    with open(os.path.join(local, _SPEC_FILE), "w") as f:
        # v2: one-file-per-bucket layouts (write repartitioned by the
        # bucket hash); v-less spec files predate this and re-attach
        # would resurrect a multi-file layout whose sort Spark ignores
        json.dump(
            {"key": key, "buckets": buckets, "sorted": sort, "v": 2}, f
        )


_SPEC_FILE = "_bucket_spec.json"


def cobucket_fact_tables(
    spark: SparkSession, sf_dir: str, base_path: str, buckets: int = 8
) -> tuple[str, str]:
    """Bucket lineitem and orders on the shared join key (orderkey) with
    identical bucket counts — the layout every TPC-H-shaped fact⋈fact
    join in this repo would consume at scale. Returns the table names."""
    cat = Catalog(spark, sf_dir)
    write_bucketed(
        cat.lineitem,
        "lineitem_b",
        f"{base_path}/lineitem_b",
        "l_orderkey",
        buckets,
    )
    write_bucketed(
        cat.orders.withColumnRenamed("o_orderkey", "o_orderkey"),
        "orders_b",
        f"{base_path}/orders_b",
        "o_orderkey",
        buckets,
    )
    return "lineitem_b", "orders_b"


def buckets_for(n_rows: int, target: int = 250_000) -> int:
    """Bucket-count sizing: hold rows-per-bucket ~constant (power of two,
    >= 8). A FIXED bucket count is a scale killer in disguise: the
    zero-exchange SortMergeJoin runs ONE task per bucket, so 8 buckets
    that saturate local[32] at sf0.1 cap a 10x corpus's join at 8-way
    parallelism and its per-task sort grows super-linearly — the round-6
    growth table measured the inversion (bucketed 6.0x vs plain 2.5x at
    10x data under the old 2M-row target, which left the 10x corpus at
    8 buckets). target=250k rows/bucket keeps per-bucket sorts
    memory-bounded and scales task count with volume: sf0.1 -> 8,
    10x -> 32, 100x -> 256 buckets. On a real cluster the same rule
    applies with target sized to executor memory (~128 MB-1 GB of rows
    per bucket); re-bucketing policy: a layout is rewritten when its
    recorded bucket count no longer matches buckets_for(current rows) —
    ensure_bucketed_layout's tag makes that automatic, since the count
    is part of the table identity."""
    b = 8
    while n_rows > target * b and b < 4096:
        b *= 2
    return b


_ROWS_CACHE: dict[str, int] = {}  # sf_dir -> lineitem row count (per process)


def ensure_bucketed_layout(
    spark: SparkSession, sf_dir: str, buckets: int | None = None
) -> tuple[str, str]:
    """Idempotently materialize the co-bucketed fact layout for ``sf_dir``
    (skipped when this session already registered it). Tables are tagged
    per corpus dir AND bucket count so different scale factors coexist in
    one session; the parquet lands under the session's warehouse dir.
    The bucket count derives from the fact-table row count
    (:func:`buckets_for`) unless pinned by the caller."""
    if buckets is None:
        if sf_dir not in _ROWS_CACHE:
            # one metadata-cheap count per corpus dir per process — the
            # idempotency fast path below must not pay a per-query scan
            _ROWS_CACHE[sf_dir] = Catalog(spark, sf_dir).lineitem.count()
        buckets = buckets_for(_ROWS_CACHE[sf_dir])
    tag = re.sub(r"\W+", "_", sf_dir.strip("/")) + f"_b{buckets}"
    li, o = f"lineitem_bkt_{tag}", f"orders_bkt_{tag}"
    if not (spark.catalog.tableExists(li) and spark.catalog.tableExists(o)):
        wh = spark.conf.get("spark.sql.warehouse.dir")
        cat = Catalog(spark, sf_dir)
        for name, src, path, key in (
            (li, cat.lineitem, f"{wh}/bucketed/{tag}/lineitem", "l_orderkey"),
            (o, cat.orders, f"{wh}/bucketed/{tag}/orders", "o_orderkey"),
        ):
            if _register_existing_bucketed(spark, name, path, key, buckets):
                continue  # prior session's layout re-registered, no rewrite
            write_bucketed(src, name, path, key, buckets)
    return li, o


def _register_existing_bucketed(
    spark: SparkSession, name: str, path: str, key: str, buckets: int
) -> bool:
    """Re-attach a bucketed layout a PRIOR session already materialized:
    Spark's default in-memory catalog forgets table entries on session
    exit, but the bucket-suffixed parquet (and its _SUCCESS marker)
    persists under the warehouse — an external CREATE TABLE with the same
    CLUSTERED BY spec restores exchange elision without rewriting the
    facts. Fixtures are immutable, so a completed prior write is always
    current.

    _SUCCESS alone is NOT proof the layout matches: a write with different
    parameters (or a partial/foreign write that left a marker) would make
    the CLUSTERED BY entry misdescribe the data and exchange-elided joins
    silently wrong. So re-attachment requires (a) the spec sidecar written
    by write_bucketed to match (key, buckets, sorted) exactly, and (b) the
    physical files to carry Spark's bucket-id suffix (`_BBBBB.c###`) with
    every id inside [0, buckets). Returns False — caller rewrites — on any
    mismatch."""
    local = path[5:] if path.startswith("file:") else path
    if not os.path.exists(os.path.join(local, "_SUCCESS")):
        return False
    try:
        with open(os.path.join(local, _SPEC_FILE)) as f:
            spec = json.load(f)
    except (OSError, ValueError):
        return False
    if spec != {"key": key, "buckets": buckets, "sorted": True, "v": 2}:
        return False
    ids = set()
    for fn in os.listdir(local):
        if not fn.endswith(".parquet"):
            continue
        m = re.search(r"_(\d{5})\.c\d+", fn)
        if not m:
            return False  # a non-bucketed data file in a bucketed layout
        ids.add(int(m.group(1)))
    if not ids or max(ids) >= buckets:
        return False
    schema = spark.read.parquet(path).schema
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )
    spark.sql(
        f"CREATE TABLE {name} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
    return True


@query("x17_large_orders_bucketed", oracle=ORACLE["x17_large_orders"])
def x17_large_orders_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 over the co-bucketed layout: the l_orderkey aggregate and the
    orders join both consume bucket metadata — NO hash exchange anywhere
    in the plan (only the final presentation sort's range exchange
    remains). Same oracle as x17_large_orders: layout must not change the
    answer."""
    li, o = ensure_bucketed_layout(spark, sf_dir)
    cust = Catalog(spark, sf_dir).customer
    return x17_core(spark.table(li), spark.table(o), cust)


@query("x23_waiting_suppliers_bucketed", oracle=ORACLE["x23_waiting_suppliers"])
def x23_waiting_suppliers_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 over the co-bucketed layout: all three lineitem branches and
    both orders probes read co-located buckets — no exchange on the fact
    key; the only hash exchange left is the final tiny s_name aggregate.
    Same oracle as x23_waiting_suppliers."""
    li, o = ensure_bucketed_layout(spark, sf_dir)
    supp = Catalog(spark, sf_dir).supplier
    return x23_core(spark.table(li), spark.table(o), supp)


def bucketed_join(spark: SparkSession) -> DataFrame:
    """The co-located join over the bucketed pair: with both sides
    bucketed (and sorted) on the key, the plan is a SortMergeJoin whose
    inputs come straight from the bucketed scans — no Exchange on either
    side (asserted in tests/test_bucketing.py)."""
    li = spark.table("lineitem_b")
    o = spark.table("orders_b")
    return li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_extendedprice", "o_orderdate", "o_totalprice"
    )
