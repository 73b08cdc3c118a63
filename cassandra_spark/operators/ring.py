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

MIN_TOKEN = -(1 << 63)
MAX_TOKEN = (1 << 63) - 1
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


def build_ring_moved(
    moved: str = "n1",
    n_nodes: int = N_NODES,
    vnodes: int = VNODES_PER_NODE,
) -> list[tuple[int, str]]:
    """The ring after ``nodetool move`` on one node: ITS vnode tokens
    are re-drawn (seed strings ``"node<i>@moved#<j>"``), every other
    node's tokens are untouched — the third ring mutation next to
    bootstrap (w24) and decommission (w26). Node count and RF are
    conserved; only ownership boundaries shift."""
    ring = [
        (
            murmur3.token_of_text(
                f"node{i}@moved#{j}" if f"n{i}" == moved else f"node{i}#{j}"
            ),
            f"n{i}",
        )
        for i in range(n_nodes)
        for j in range(vnodes)
    ]
    ring.sort()
    return ring


def replicas_of_index(
    ring: list[tuple[int, str]], idx: int, rf: int = RF
) -> list[str]:
    """Walk clockwise from vnode ``idx`` collecting the first ``rf``
    DISTINCT endpoints — SimpleStrategy's natural-replica rule. Raises
    when the ring has fewer distinct endpoints than ``rf`` (the reference
    throws UnavailableException at quorum time; here the misconfiguration
    fails at plan-build)."""
    out: list[str] = []
    i = idx
    while len(out) < rf and i < idx + len(ring):
        node = ring[i % len(ring)][1]
        if node not in out:
            out.append(node)
        i += 1
    if len(out) < rf:
        raise ValueError(
            f"ring has {len(out)} distinct endpoints < rf={rf}"
        )
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


# ---------------------------------------------------------------------------
# NetworkTopologyStrategy (`[C* locator/NetworkTopologyStrategy ::
# calculateNaturalReplicas, unverified]`)
# ---------------------------------------------------------------------------

# node → (datacenter, rack): 2 DCs x 2 racks, nodes striped across racks
TOPOLOGY = {
    "n0": ("dc1", "r1"),
    "n1": ("dc1", "r2"),
    "n2": ("dc2", "r1"),
    "n3": ("dc2", "r2"),
}
NTS_RF = {"dc1": 2, "dc2": 1}


def nts_replicas_of_index(
    ring: list[tuple[int, str]],
    idx: int,
    rf_per_dc: dict[str, int] | None = None,
    topology: dict[str, tuple[str, str]] | None = None,
) -> list[str]:
    """The reference's per-DC ring walk: accept a node if its RACK is not
    yet represented in its DC's replica set, or if every rack of that DC
    already is (the "skipped" second pass collapses into this rule on one
    walk), until each DC holds rf_dc replicas. Output order = ring walk
    order, like the reference's natural-replica list."""
    rf = rf_per_dc or NTS_RF
    topo = topology or TOPOLOGY
    racks_in_dc: dict[str, set[str]] = {}
    for _, (dc, rack) in topo.items():
        racks_in_dc.setdefault(dc, set()).add(rack)
    chosen: list[str] = []
    seen_racks: dict[str, set[str]] = {dc: set() for dc in rf}
    per_dc: dict[str, int] = {dc: 0 for dc in rf}
    i = idx
    hops = 0
    while hops < 2 * len(ring) and any(
        per_dc[dc] < rf[dc] for dc in rf
    ):
        node = ring[i % len(ring)][1]
        dc, rack = topo[node]
        if node not in chosen and per_dc.get(dc, 99) < rf.get(dc, 0):
            all_racks_seen = seen_racks[dc] >= racks_in_dc[dc]
            if rack not in seen_racks[dc] or all_racks_seen:
                chosen.append(node)
                seen_racks[dc].add(rack)
                per_dc[dc] += 1
        i += 1
        hops += 1
    return chosen


def nts_case_sql(
    token_col: str, ring: list[tuple[int, str]] | None = None
) -> str:
    """NTS natural replicas as the same portable CASE chain as
    :func:`replica_case_sql` — the walk runs at plan-build time, the query
    only classifies tokens."""
    ring = ring if ring is not None else build_ring()
    arms = [
        f"WHEN {token_col} <= {tok} THEN "
        f"'{','.join(nts_replicas_of_index(ring, i))}'"
        for i, (tok, _) in enumerate(ring)
    ]
    wrap = ",".join(nts_replicas_of_index(ring, 0))
    return "CASE " + " ".join(arms) + f" ELSE '{wrap}' END"


@query(
    "p10_nts_replicas",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT o_orderkey FROM orders WHERE o_orderkey % 40 = 9",
          "o_orderkey")}
    )
    SELECT o_orderkey, token,
           {nts_case_sql("token")} AS replicas
    FROM __toks
    """,
)
def p10_nts_replicas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NetworkTopologyStrategy natural replicas (dc1: RF 2 across racks,
    dc2: RF 1) for a key sample — rack-aware per-DC placement, still zero
    joins/shuffles. The oracle replays the identical CASE text over the
    independently-derived token."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.filter(F.col("o_orderkey") % 40 == 9)
        .select(
            "o_orderkey",
            murmur3.token_col(F.col("o_orderkey")).alias("token"),
        )
        .withColumn("replicas", F.expr(nts_case_sql("token")))
    )


def repartition_by_replica(
    df: DataFrame,
    key_col: str,
    parts_per_node: int = 1,
    ring: list[tuple[int, str]] | None = None,
) -> DataFrame:
    """``repartitionByCassandraReplica`` analogue (the connector's
    locality primitive): co-locate rows with their primary replica so a
    follow-up per-node stage (replica-targeted write, per-node bulk load,
    local repair diff) runs without a second shuffle. One exchange on
    (node, salt): the salt spreads a node's share over ``parts_per_node``
    tasks so a hot node doesn't serialize its whole share through one
    task at 100 TB."""
    ring = ring if ring is not None else build_ring()
    case = replica_case_sql("__rtok", ring=ring)
    out = (
        df.withColumn("__rtok", murmur3.token_col(F.col(key_col)))
        .withColumn(
            "__replica", F.expr(f"split_part({case}, ',', 1)")
        )
        .drop("__rtok")
    )
    n_nodes = len({n for _, n in ring})
    if parts_per_node <= 1:
        return out.repartition(n_nodes, F.col("__replica"))
    salt = (F.abs(F.hash(F.col(key_col))) % parts_per_node).alias("__salt")
    return out.withColumn("__salt", salt).repartition(
        n_nodes * parts_per_node, F.col("__replica"), F.col("__salt")
    ).drop("__salt")


def split_token_ranges(
    n_splits: int,
    ring: list[tuple[int, str]] | None = None,
) -> list[tuple[int, int, str]]:
    """Input-split planner (the connector's ``splitCount`` path): carve the
    full signed-64 token space into contiguous half-open ranges
    ``(start, end]`` aligned to vnode boundaries, each tagged with the
    owner of its FIRST vnode range — the unit of parallel scan a
    1000-executor cluster schedules for locality. Produces exactly
    ``min(n_splits, n_vnode_ranges)`` splits, span-balanced greedily with
    a count guarantee (a live deployment would weight by the
    size_estimates partitions_count instead of raw token span)."""
    ring = ring if ring is not None else build_ring()
    toks = [t for t, _ in ring]
    bounds = [MIN_TOKEN] + toks + [MAX_TOKEN]
    vranges = [
        (bounds[i], bounds[i + 1],
         ring[i][1] if i < len(ring) else ring[0][1])
        for i in range(len(bounds) - 1)
    ]
    n_splits = max(1, min(n_splits, len(vranges)))
    total = float(MAX_TOKEN) - float(MIN_TOKEN)
    target = total / n_splits
    out: list[tuple[int, int, str]] = []
    i = 0
    for s in range(n_splits):
        start_tok, owner = vranges[i][0], vranges[i][2]
        span = 0.0
        remaining_splits = n_splits - s
        # must leave at least one vnode range per remaining split
        while i < len(vranges) - (remaining_splits - 1):
            span += float(vranges[i][1]) - float(vranges[i][0])
            i += 1
            if span >= target and s < n_splits - 1:
                break
        out.append((start_tok, vranges[i - 1][1], owner))
    out[-1] = (out[-1][0], MAX_TOKEN, out[-1][2])
    return out


@query(
    "w18_hinted_handoff",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT DISTINCT user_id FROM events", "user_id")}
    ), placed AS (
      SELECT e.event_id, e.user_id,
             (e.event_id % 7) IN (2, 3) AS in_outage,
             unnest(string_split({replica_case_sql("t.token")}, ','))
               AS replica
      FROM events e JOIN __toks t USING (user_id)
    )
    SELECT replica,
           CAST(count(*) AS BIGINT) AS total_writes,
           CAST(sum(CASE WHEN replica = 'n2' AND in_outage
                         THEN 1 ELSE 0 END) AS BIGINT) AS hinted,
           CAST(sum(CASE WHEN replica = 'n2' AND in_outage
                         THEN 0 ELSE 1 END) AS BIGINT) AS applied_live
    FROM placed
    GROUP BY replica ORDER BY replica
    """,
)
def w18_hinted_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hinted handoff accounting (`[C* hints/HintsService,
    db/HintedHandOffManager, unverified]`): writes destined to a replica
    that is DOWN during the outage window become hints held by the
    coordinator; on recovery the hint stream replays and the replica
    converges (total_writes = applied_live + hinted for the down node —
    the convergence identity the test asserts).

    Outage model: node n2 down for the deterministic event_id%7∈{{2,3}}
    slice of the write stream. Spark shape: token (vectorized UDF over the
    DISTINCT user keys, broadcast back) → replica CASE → explode → one
    map-side-combined n_nodes-group aggregation. The per-write hint
    decision pipelines in the scan stage; nothing driver-side."""
    cat = Catalog(spark, sf_dir)
    keys = (
        cat.events.select("user_id")
        .distinct()
        .withColumn("token", murmur3.token_col(F.col("user_id")))
        .withColumn(
            "replicas", F.expr(replica_case_sql("token"))
        )
    )
    placed = (
        cat.events.select("event_id", "user_id")
        .join(F.broadcast(keys), "user_id")
        .withColumn("in_outage", (F.col("event_id") % 7).isin(2, 3))
        .withColumn("replica", F.explode(F.split("replicas", ",")))
    )
    down = (F.col("replica") == "n2") & F.col("in_outage")
    return (
        placed.groupBy("replica")
        .agg(
            F.count(F.lit(1)).alias("total_writes"),
            F.sum(down.cast("long")).alias("hinted"),
            F.sum((~down).cast("long")).alias("applied_live"),
        )
        .orderBy("replica")
    )


def _node_flags_sql(csv_col: str, node: str) -> str:
    """Membership of ``node`` in a 'a,b,c' replica CSV — comma-delimited
    LIKE, portable to Spark SQL and DuckDB alike (node names are one
    letter + digits, so the delimiters make the match exact)."""
    return f"(',' || {csv_col} || ',') LIKE '%,{node},%'"


def _bootstrap_union_sql(nodes: list[str]) -> str:
    arms = [
        f"SELECT '{n}' AS node, {_node_flags_sql('ra', n)} AS before_, "
        f"{_node_flags_sql('rb', n)} AS after_ FROM r"
        for n in nodes
    ]
    return " UNION ALL ".join(arms)


@query(
    "w24_bootstrap_cleanup",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT o_orderkey FROM orders", "o_orderkey")}
    ),
    r AS MATERIALIZED (
      SELECT {replica_case_sql("token")} AS ra,
             {replica_case_sql("token", ring=build_ring(N_NODES + 1))} AS rb
      FROM __toks
    )
    SELECT node,
           CAST(SUM(CASE WHEN before_ THEN 1 ELSE 0 END) AS BIGINT)
             AS n_before,
           CAST(SUM(CASE WHEN after_ THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after,
           CAST(SUM(CASE WHEN after_ AND NOT before_ THEN 1 ELSE 0 END)
             AS BIGINT) AS n_streamed_in,
           CAST(SUM(CASE WHEN before_ AND NOT after_ THEN 1 ELSE 0 END)
             AS BIGINT) AS n_cleaned_up
    FROM ({_bootstrap_union_sql([f"n{i}" for i in range(N_NODES + 1)])})
    GROUP BY node
    ORDER BY node
    """,
)
def w24_bootstrap_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node bootstrap + ``nodetool cleanup`` (`[C* dht/BootStrapper;
    service/StorageService :: forceKeyspaceCleanup, unverified]`): a 5th
    node joins the 4-node ring with its own 16 vnodes, and every
    partition's natural-replica set is recomputed under BOTH rings. Per
    node: replica ownership before/after, the rows the joiner must
    STREAM IN (replica under B, not under A — bootstrap's transfer set),
    and the rows each old node CLEANS UP (replica under A, not under B —
    exactly what cleanup deletes after a topology change; until it runs,
    those rows are dead weight the node still scans).

    Spark-first shape, same as p8-p10: both ring walks are plan-time
    CASE chains inside whole-stage codegen over ONE orders scan, the
    per-node flags unpivot via ``stack`` (projection, no shuffle), and
    the only exchange is the final 5-group aggregate. The oracle
    re-derives the Murmur3 token in SQL and applies the identical CASE
    text for both rings — a cross-engine differential of the hash and
    both ring walks on every key."""
    cat = Catalog(spark, sf_dir)
    nodes = [f"n{i}" for i in range(N_NODES + 1)]
    case_a = replica_case_sql("token")
    case_b = replica_case_sql("token", ring=build_ring(N_NODES + 1))
    stack_items = ", ".join(
        f"'{n}', {_node_flags_sql('ra', n)}, {_node_flags_sql('rb', n)}"
        for n in nodes
    )
    return (
        cat.orders.select(
            murmur3.token_col(F.col("o_orderkey")).alias("token")
        )
        .withColumn("ra", F.expr(case_a))
        .withColumn("rb", F.expr(case_b))
        .select(
            F.expr(
                f"stack({len(nodes)}, {stack_items}) "
                f"AS (node, before_, after_)"
            )
        )
        .groupBy("node")
        .agg(
            F.sum(F.col("before_").cast("long")).alias("n_before"),
            F.sum(F.col("after_").cast("long")).alias("n_after"),
            F.sum((F.col("after_") & ~F.col("before_")).cast("long")).alias(
                "n_streamed_in"
            ),
            F.sum((F.col("before_") & ~F.col("after_")).cast("long")).alias(
                "n_cleaned_up"
            ),
        )
        .orderBy("node")
    )


@query(
    "w26_decommission",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT o_orderkey FROM orders", "o_orderkey")}
    ),
    r AS MATERIALIZED (
      SELECT {replica_case_sql("token")} AS ra,
             {replica_case_sql("token", ring=build_ring(N_NODES - 1))} AS rb
      FROM __toks
    )
    SELECT node,
           CAST(SUM(CASE WHEN before_ THEN 1 ELSE 0 END) AS BIGINT)
             AS n_before,
           CAST(SUM(CASE WHEN after_ THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after,
           CAST(SUM(CASE WHEN after_ AND NOT before_ THEN 1 ELSE 0 END)
             AS BIGINT) AS n_streamed_in
    FROM ({_bootstrap_union_sql([f"n{i}" for i in range(N_NODES)])})
    GROUP BY node
    ORDER BY node
    """,
)
def w26_decommission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node decommission (`[C* service/StorageService :: decommission —
    unbootstrap/streamRanges, unverified]`) — w24's inverse: node n3
    leaves the 4-node ring, its vnodes vanish, and every partition's
    replica set is recomputed under the shrunken ring. Per node:
    ownership before/after and the rows each SURVIVOR must stream IN
    (replica under B, not under A — the leaver streams its ranges to
    exactly these new owners before departing; its own row reads
    n_after = 0). Same one-scan two-CASE-chain plan as w24; the oracle
    re-derives Murmur3 and both ring walks. The invariant the numbers
    prove: RF stays 3, so sum(n_streamed_in) over survivors equals the
    leaver's n_before — every vacated replica lands on exactly one new
    owner (inline-asserted in tests/test_ring.py is the per-row form;
    here it is visible in the oracle-pinned totals)."""
    cat = Catalog(spark, sf_dir)
    nodes = [f"n{i}" for i in range(N_NODES)]
    case_a = replica_case_sql("token")
    case_b = replica_case_sql("token", ring=build_ring(N_NODES - 1))
    stack_items = ", ".join(
        f"'{n}', {_node_flags_sql('ra', n)}, {_node_flags_sql('rb', n)}"
        for n in nodes
    )
    return (
        cat.orders.select(
            murmur3.token_col(F.col("o_orderkey")).alias("token")
        )
        .withColumn("ra", F.expr(case_a))
        .withColumn("rb", F.expr(case_b))
        .select(
            F.expr(
                f"stack({len(nodes)}, {stack_items}) "
                f"AS (node, before_, after_)"
            )
        )
        .groupBy("node")
        .agg(
            F.sum(F.col("before_").cast("long")).alias("n_before"),
            F.sum(F.col("after_").cast("long")).alias("n_after"),
            F.sum((F.col("after_") & ~F.col("before_")).cast("long")).alias(
                "n_streamed_in"
            ),
        )
        .orderBy("node")
    )


@query(
    "w27_move",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT o_orderkey FROM orders", "o_orderkey")}
    ),
    r AS MATERIALIZED (
      SELECT {replica_case_sql("token")} AS ra,
             {replica_case_sql("token", ring=build_ring_moved())} AS rb
      FROM __toks
    )
    SELECT node,
           CAST(SUM(CASE WHEN before_ THEN 1 ELSE 0 END) AS BIGINT)
             AS n_before,
           CAST(SUM(CASE WHEN after_ THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after,
           CAST(SUM(CASE WHEN after_ AND NOT before_ THEN 1 ELSE 0 END)
             AS BIGINT) AS n_streamed_in,
           CAST(SUM(CASE WHEN before_ AND NOT after_ THEN 1 ELSE 0 END)
             AS BIGINT) AS n_streamed_out
    FROM ({_bootstrap_union_sql([f"n{i}" for i in range(N_NODES)])})
    GROUP BY node
    ORDER BY node
    """,
)
def w27_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nodetool move`` (`[C* service/StorageService :: move —
    RangeRelocator/calculateRangesToStreamWithEndpoints, unverified]`)
    — the third ring mutation, completing the triptych with bootstrap
    (w24) and decommission (w26): node n1's vnode tokens are re-drawn
    in place (node count and RF conserved), and every partition's
    natural-replica set is recomputed under BOTH rings. Per node:
    ownership before/after, the rows it must STREAM IN (replica under
    B, not under A — fetched from the old owners before the move
    completes) and STREAM OUT (replica under A, not under B — handed
    off; until cleanup they are dead weight). Unlike w24/w26, EVERY
    node can appear on both sides — the mover's shifted ranges cascade
    through successor walks, so bystanders exchange rows too.

    Same Spark-first shape as w24/w26: both ring walks are plan-time
    CASE chains inside whole-stage codegen over ONE orders scan, the
    per-node flags unpivot via ``stack`` (projection, no shuffle), and
    the only exchange is the final 4-group aggregate. The invariant the
    numbers prove: RF stays {RF} under both rings, so
    sum(n_streamed_in) == sum(n_streamed_out) — every relocated
    replica leaves exactly one old owner and lands on exactly one new
    owner (per-row form pinned in tests/test_ring.py)."""
    cat = Catalog(spark, sf_dir)
    nodes = [f"n{i}" for i in range(N_NODES)]
    case_a = replica_case_sql("token")
    case_b = replica_case_sql("token", ring=build_ring_moved())
    stack_items = ", ".join(
        f"'{n}', {_node_flags_sql('ra', n)}, {_node_flags_sql('rb', n)}"
        for n in nodes
    )
    return (
        cat.orders.select(
            murmur3.token_col(F.col("o_orderkey")).alias("token")
        )
        .withColumn("ra", F.expr(case_a))
        .withColumn("rb", F.expr(case_b))
        .select(
            F.expr(
                f"stack({len(nodes)}, {stack_items}) "
                f"AS (node, before_, after_)"
            )
        )
        .groupBy("node")
        .agg(
            F.sum(F.col("before_").cast("long")).alias("n_before"),
            F.sum(F.col("after_").cast("long")).alias("n_after"),
            F.sum((F.col("after_") & ~F.col("before_")).cast("long")).alias(
                "n_streamed_in"
            ),
            F.sum((F.col("before_") & ~F.col("after_")).cast("long")).alias(
                "n_streamed_out"
            ),
        )
        .orderBy("node")
    )


# portable "first dc1 replica in walk order" / "the dc2 replica" over the
# 3-element NTS replica CSV (dc1 rf=2, dc2 rf=1) — shared by the w28
# Spark plan and its DuckDB oracle verbatim
_NTS_E = [f"split_part({{r}}, ',', {i})" for i in (1, 2, 3)]
_NTS_TARGET_SQL = (
    "CASE WHEN (',' || {r} || ',') LIKE '%,n2,%' THEN 'n2' ELSE 'n3' END"
)
_NTS_SOURCE_SQL = (
    f"CASE WHEN {_NTS_E[0]} IN ('n0', 'n1') THEN {_NTS_E[0]} "
    f"WHEN {_NTS_E[1]} IN ('n0', 'n1') THEN {_NTS_E[1]} "
    f"ELSE {_NTS_E[2]} END"
)


@query(
    "w28_rebuild",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT o_orderkey FROM orders", "o_orderkey")}
    ),
    r AS MATERIALIZED (
      SELECT {nts_case_sql("token")} AS reps FROM __toks
    )
    SELECT {_NTS_TARGET_SQL.format(r='reps')} AS target_node,
           {_NTS_SOURCE_SQL.format(r='reps')} AS source_node,
           CAST(COUNT(*) AS BIGINT) AS n_streamed
    FROM r
    GROUP BY 1, 2
    ORDER BY target_node, source_node
    """,
)
def w28_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nodetool rebuild -- dc1`` (`[C* service/StorageService ::
    rebuild — RangeStreamer with a source-DC filter, unverified]`): the
    dc2 nodes re-fetch every partition they own under
    NetworkTopologyStrategy from a replica in the SOURCE DC — the
    operation that populates a freshly-added datacenter. Per
    (target, source) pair: the rows streamed, where the target is the
    partition's dc2 replica (rf_dc2 = 1) and the source is the first
    dc1 replica in natural-walk order (the reference's RangeStreamer
    picks one source replica per range from the allowed DC).

    Same one-scan shape as the w24/w26/w27 transfer-set family: the
    NTS walk is a plan-time CASE chain, target/source derive from the
    replica CSV with split_part (portable to DuckDB verbatim), and the
    only exchange is the final few-group aggregate. Conservation —
    every dc2-owned partition streams exactly once — is pinned in
    tests/test_ring.py."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.select(
            murmur3.token_col(F.col("o_orderkey")).alias("token")
        )
        .withColumn("reps", F.expr(nts_case_sql("token")))
        .withColumn("target_node", F.expr(_NTS_TARGET_SQL.format(r="reps")))
        .withColumn("source_node", F.expr(_NTS_SOURCE_SQL.format(r="reps")))
        .groupBy("target_node", "source_node")
        .agg(F.count(F.lit(1)).alias("n_streamed"))
        .orderBy("target_node", "source_node")
    )


@query(
    "w29_tablehistograms",
    oracle="""
    WITH per_part AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY user_id
    ),
    bucketed AS (
      SELECT CAST(power(2, floor(log2(n_rows))) AS BIGINT) AS bucket_lo,
             n_rows
      FROM per_part
    )
    SELECT bucket_lo,
           CAST(2 * bucket_lo - 1 AS BIGINT) AS bucket_hi,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(MAX(n_rows) AS BIGINT) AS max_rows
    FROM bucketed
    GROUP BY bucket_lo
    ORDER BY bucket_lo
    """,
)
def w29_tablehistograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nodetool tablehistograms`` / wide-partition detection (`[C*
    utils/EstimatedHistogram; tools/nodetool/TableHistograms,
    unverified]`): the per-partition row-count distribution in
    exponential buckets — the reference keeps EstimatedHistogram's
    ~1.2x bucket ladder; this engine's canonical ladder is powers of
    two (documented divergence: bucket boundaries, not the underlying
    distribution, and integer-exact so the oracle can re-derive it).
    The operational question it answers — "do I have oversized
    partitions, and how big is the tail?" — reads off max_rows in the
    top bucket.

    Scale shape: ONE map-side-combined groupBy on the partition key
    (the natural key the data shuffles by), then a few-group bucket
    rollup — flat in corpus size, the same two-exchange plan at
    100 TB."""
    cat = Catalog(spark, sf_dir)
    per_part = cat.events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    bucket_lo = F.pow(F.lit(2.0), F.floor(F.log2("n_rows"))).cast("bigint")
    return (
        per_part.select(bucket_lo.alias("bucket_lo"), "n_rows")
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("n_rows").alias("n_rows"),
            F.max("n_rows").alias("max_rows"),
        )
        .select(
            "bucket_lo",
            (F.col("bucket_lo") * 2 - 1).alias("bucket_hi"),
            "n_partitions",
            "n_rows",
            "max_rows",
        )
        .orderBy("bucket_lo")
    )


# first SURVIVING replica (n3 is dead) in natural-walk order over the
# old ring's replica CSV — shared verbatim by w30's Spark plan and its
# DuckDB oracle. RF=3 so three split_part arms suffice.
_RM_SOURCE_SQL = (
    "CASE WHEN split_part({r}, ',', 1) <> 'n3' THEN split_part({r}, ',', 1) "
    "WHEN split_part({r}, ',', 2) <> 'n3' THEN split_part({r}, ',', 2) "
    "ELSE split_part({r}, ',', 3) END"
)


@query(
    "w30_removenode",
    oracle=f"""
    WITH __toks AS MATERIALIZED (
      {murmur3.duckdb_token_query(
          "SELECT o_orderkey FROM orders", "o_orderkey")}
    ),
    r AS MATERIALIZED (
      SELECT {replica_case_sql("token")} AS ra,
             {replica_case_sql("token", ring=build_ring(N_NODES - 1))} AS rb
      FROM __toks
    ),
    moved AS (
      SELECT {_RM_SOURCE_SQL.format(r='ra')} AS source_node,
             rb, ra
      FROM r WHERE (',' || ra || ',') LIKE '%,n3,%'
    )
    SELECT node AS new_owner, source_node,
           CAST(COUNT(*) AS BIGINT) AS n_streamed
    FROM (
      SELECT source_node,
             unnest(string_split(rb, ',')) AS node, ra
      FROM moved
    )
    WHERE NOT (',' || ra || ',') LIKE ('%,' || node || ',%')
    GROUP BY node, source_node
    ORDER BY new_owner, source_node
    """,
)
def w30_removenode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nodetool removenode`` (`[C* service/StorageService ::
    removeNode — restoreReplicaCount, unverified]`) — decommission's
    DEAD-node sibling: n3 is gone and cannot stream, so for every
    partition it replicated, each NEW owner (replica under the shrunken
    ring, not under the old) fetches from the FIRST SURVIVING replica
    of the OLD set — the key operational difference from w26, where the
    leaver itself streams its ranges out. Per (new_owner, source) pair:
    rows streamed; sum over pairs equals the dead node's replica count
    (RF restoration, pinned in tests/test_ring.py).

    Same one-scan shape as the rest of the transfer-set family: both
    ring walks and the surviving-source derivation are plan-time CASE
    chains; the per-new-owner unpivot explodes the (at most 3-element)
    replica CSV; the only exchange is the final few-group aggregate."""
    cat = Catalog(spark, sf_dir)
    case_a = replica_case_sql("token")
    case_b = replica_case_sql("token", ring=build_ring(N_NODES - 1))
    moved = (
        cat.orders.select(
            murmur3.token_col(F.col("o_orderkey")).alias("token")
        )
        .withColumn("ra", F.expr(case_a))
        .withColumn("rb", F.expr(case_b))
        .filter(F.expr("(',' || ra || ',') LIKE '%,n3,%'"))
        .withColumn("source_node", F.expr(_RM_SOURCE_SQL.format(r="ra")))
        .select(
            "source_node",
            "ra",
            F.explode(F.split("rb", ",")).alias("new_owner"),
        )
        .filter(~F.expr("(',' || ra || ',') LIKE ('%,' || new_owner || ',%')"))
    )
    return (
        moved.groupBy("new_owner", "source_node")
        .agg(F.count(F.lit(1)).alias("n_streamed"))
        .orderBy("new_owner", "source_node")
    )
