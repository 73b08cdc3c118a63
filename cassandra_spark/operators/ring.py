"""Replica placement on the Murmur3 token ring — SimpleStrategy with vnodes
(`[C* locator/SimpleStrategy :: calculateNaturalReplicas,
dht/Murmur3Partitioner, unverified]`).

The reference maps every partition to RF replicas by walking the token ring
clockwise from the key's successor vnode, collecting the first RF DISTINCT
endpoints. A Spark-side engine needs the same mapping for connector locality
(which executors read which token ranges) and for the repair tier's
per-replica views.

Spark-first shape — NO join, NO shuffle: the ring is a small static artifact
(here 4 nodes x 16 vnodes = 64 tokens, derived deterministically from
Murmur3 over the vnode seed strings), so successor lookup compiles to a
64-arm nested CASE over the key token, entirely inside whole-stage codegen.
At 100 TB this is the right plan: replica assignment is a per-row projection
that pipelines inside the scan stage; the per-node aggregation that follows
is one map-side-combined shuffle of ``n_nodes`` groups. A broadcast join
against a ring table would work too, but the CASE chain avoids even the
broadcast exchange, and a real cluster ring (256 vnodes x hundreds of nodes)
still fits comfortably in one generated expression per the same pattern.

The DuckDB oracle recomputes the token via the HUGEINT SQL chain and applies
the IDENTICAL CASE text — a cross-engine differential of both the hash and
the ring walk on every sampled key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators import murmur3
from cassandra_spark.registry import query

N_NODES = 4
VNODES_PER_NODE = 16
RF = 3


def build_ring(
    n_nodes: int = N_NODES, vnodes: int = VNODES_PER_NODE
) -> list[tuple[int, str]]:
    """The fixed demo ring: vnode tokens are Murmur3 tokens of the seed
    strings ``"node<i>#<j>"`` (deterministic, well-spread), sorted
    ascending — each vnode owns ``(prev_token, token]``."""
    ring = [
        (murmur3.token_of_text(f"node{i}#{j}"), f"n{i}")
        for i in range(n_nodes)
        for j in range(vnodes)
    ]
    ring.sort()
    return ring


def replicas_of_index(
    ring: list[tuple[int, str]], idx: int, rf: int = RF
) -> list[str]:
    """Walk clockwise from vnode ``idx`` collecting the first ``rf``
    DISTINCT endpoints — SimpleStrategy's natural-replica rule."""
    out: list[str] = []
    i = idx
    while len(out) < rf:
        node = ring[i % len(ring)][1]
        if node not in out:
            out.append(node)
        i += 1
    return out


def replica_case_sql(
    token_col: str, rf: int = RF, ring: list[tuple[int, str]] | None = None
) -> str:
    """The ring walk as one portable CASE expression: successor vnode =
    smallest ring token >= key token (wrapping to ring[0]); each arm emits
    that vnode's precomputed distinct-endpoint list as 'a,b,c'. Parses
    identically in Spark SQL and DuckDB."""
    ring = ring if ring is not None else build_ring()
    arms = [
        f"WHEN {token_col} <= {tok} THEN "
        f"'{','.join(replicas_of_index(ring, i, rf))}'"
        for i, (tok, _) in enumerate(ring)
    ]
    wrap = ",".join(replicas_of_index(ring, 0, rf))
    return "CASE " + " ".join(arms) + f" ELSE '{wrap}' END"


@query(
    "p8_replica_map",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT o_orderkey FROM orders WHERE o_orderkey % 20 = 3",
          "o_orderkey")}
    )
    SELECT o_orderkey, token,
           {replica_case_sql("token")} AS replicas,
           split_part({replica_case_sql("token")}, ',', 1) AS primary_replica
    FROM __toks
    """,
)
def p8_replica_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural-replica map of a key sample: real Murmur3 token + the
    SimpleStrategy RF=3 ring walk as a codegen CASE — both re-derived
    independently by the oracle's SQL formulation."""
    cat = Catalog(spark, sf_dir)
    case = replica_case_sql("token")
    return (
        cat.orders.filter(F.col("o_orderkey") % 20 == 3)
        .select(
            "o_orderkey",
            murmur3.token_col(F.col("o_orderkey")).alias("token"),
        )
        .withColumn("replicas", F.expr(case))
        .withColumn("primary_replica", F.expr("split_part(replicas, ',', 1)"))
    )


@query(
    "p9_ring_ownership",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT o_orderkey FROM orders", "o_orderkey")}
    )
    SELECT split_part({replica_case_sql("token")}, ',', 1) AS node,
           CAST(count(*) AS BIGINT) AS n_partitions
    FROM __toks
    GROUP BY 1 ORDER BY 1
    """,
)
def p9_ring_ownership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-ownership distribution over the whole orders keyspace —
    ``nodetool status``'s "Owns" column reconstructed from first
    principles. The per-key projection pipelines inside the scan; the
    aggregation shuffles only n_nodes groups (map-side combined), so the
    plan is flat in corpus size."""
    cat = Catalog(spark, sf_dir)
    case = replica_case_sql("token")
    return (
        cat.orders.select(
            murmur3.token_col(F.col("o_orderkey")).alias("token")
        )
        .withColumn("node", F.expr(f"split_part({case}, ',', 1)"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_partitions"))
        .orderBy("node")
    )
