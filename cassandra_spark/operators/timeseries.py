"""Time-series analytics over the events stream: gap-filled resampling
and ordered-funnel matching — the wide-analytics shapes a hypertable user
expects next to windows/sessionization (SURVEY.md §2.5 extension tier).

Both are pure DataFrame algebra (sequence/explode + window functions) —
no UDFs, no driver loops — and both carry exact cross-engine oracles
(integer counts, min/max timestamps; no float accumulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query

RESAMPLE_STEP_S = 3600  # 1-hour grid


@query(
    "x38_resample_ffill",
    oracle=f"""
    WITH obs AS (
      SELECT user_id,
             CAST(floor(epoch_us(ts) / 1000000.0 / {RESAMPLE_STEP_S})
                  AS BIGINT) AS slot,
             COUNT(*) AS n_events
      FROM events WHERE user_id % 25 = 3
      GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, MIN(slot) AS lo, MAX(slot) AS hi FROM obs GROUP BY 1
    ), grid AS (
      SELECT b.user_id, g.slot
      FROM bounds b, LATERAL (
        SELECT UNNEST(range(b.lo, b.hi + 1)) AS slot
      ) g
    ), joined AS (
      SELECT g.user_id, g.slot, o.n_events,
             COUNT(o.n_events) OVER (
               PARTITION BY g.user_id ORDER BY g.slot
             ) AS grp
      FROM grid g LEFT JOIN obs o USING (user_id, slot)
    )
    SELECT user_id, slot,
           CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
           CAST(MAX(n_events) OVER (PARTITION BY user_id, grp)
                AS BIGINT) AS n_events_ffill,
           n_events IS NULL AS was_gap
    FROM joined
    """,
)
def x38_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled resampling: per-user hourly event counts on a dense
    time grid (min..max slot per user), empty slots forward-filled from
    the last observation — the hypertable ``time_bucket_gapfill +
    locf`` shape. Grid densification is a per-user sequence+explode
    (rows expand locally, no shuffle beyond the count agg); the
    forward-fill is the classic two-window trick — a running count of
    non-null observations forms fill groups, then a group-max propagates
    the value — all whole-stage codegen."""
    cat = Catalog(spark, sf_dir)
    obs = (
        cat.events.filter(F.col("user_id") % 25 == 3)
        .groupBy(
            "user_id",
            F.floor(
                F.unix_micros("ts") / 1_000_000.0 / RESAMPLE_STEP_S
            ).alias("slot"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("slot").alias("lo"), F.max("slot").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("slot"),
    )
    w = Window.partitionBy("user_id").orderBy("slot")
    joined = grid.join(obs, ["user_id", "slot"], "left").withColumn(
        "grp", F.count("n_events").over(w)
    )
    wg = Window.partitionBy("user_id", "grp")
    return joined.select(
        "user_id",
        "slot",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.max("n_events").over(wg).cast("long").alias("n_events_ffill"),
        F.col("n_events").isNull().alias("was_gap"),
    )


_FUNNEL = ("signup", "view", "purchase")


@query(
    "x39_funnel",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = '{_FUNNEL[0]}' THEN ts END) AS t0,
             MIN(CASE WHEN event_type = '{_FUNNEL[1]}' THEN ts END) AS t1,
             MIN(CASE WHEN event_type = '{_FUNNEL[2]}' THEN ts END) AS t2
      FROM events GROUP BY 1
    ), staged AS (
      SELECT user_id,
             t0 IS NOT NULL AS s0,
             t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0 AS s1,
             t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
               AND t2 IS NOT NULL AND t2 > t1 AS s2
      FROM firsts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN s0 THEN 1 ELSE 0 END) AS BIGINT)
             AS reached_signup,
           CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT)
             AS reached_view,
           CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT)
             AS reached_purchase
    FROM staged
    """,
)
def x39_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users progressing signup → view → purchase with
    strictly increasing FIRST-occurrence times (the simplest correct
    funnel semantics: stage k counts only if its first event happened
    after stage k-1's first event). One conditional-min aggregation per
    user — a single shuffle — then a conditional-count rollup; monotone
    by construction (asserted in tests)."""
    cat = Catalog(spark, sf_dir)
    firsts = cat.events.groupBy("user_id").agg(
        *[
            F.min(
                F.when(F.col("event_type") == s, F.col("ts"))
            ).alias(f"t{i}")
            for i, s in enumerate(_FUNNEL)
        ]
    )
    s0 = F.col("t0").isNotNull()
    s1 = s0 & F.col("t1").isNotNull() & (F.col("t1") > F.col("t0"))
    s2 = s1 & F.col("t2").isNotNull() & (F.col("t2") > F.col("t1"))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(s0.cast("long")).alias("reached_signup"),
        F.sum(s1.cast("long")).alias("reached_view"),
        F.sum(s2.cast("long")).alias("reached_purchase"),
    )


@query(
    "x40_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(floor(epoch_us(MIN(ts)) / 1000000.0 / 604800.0)
                  AS BIGINT) AS cohort_week
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(epoch_us(e.ts) / 1000000.0 / 604800.0)
                  AS BIGINT) - f.cohort_week AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def x40_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    distinct in each subsequent week offset — the matrix every
    product-analytics pipeline derives. ONE events scan and ONE
    user-keyed shuffle: min(week) and the distinct-week set come out of
    the same groupBy (collect_set dedups map-side, bounded by the
    calendar — #weeks per user, not #events), offsets explode from the
    set, and the final (cohort, offset) rollup is a tiny second
    exchange. The round-8 shape scanned events twice, joined firsts
    back, and paid a third exchange for distinct — 11.2x wall growth at
    100x data; this shape removes the join and the distinct outright.
    At 100 TB the per-user (min, week-set) table is the natural
    incremental artifact (merge-min / set-union per batch)."""
    cat = Catalog(spark, sf_dir)
    week = F.floor(F.unix_micros(F.col("ts")) / 1_000_000.0 / 604_800.0)
    per_user = (
        cat.events.select("user_id", week.alias("w"))
        .groupBy("user_id")
        .agg(
            F.min("w").alias("cohort_week"),
            F.collect_set("w").alias("weeks"),
        )
    )
    activity = per_user.select(
        "cohort_week", F.explode("weeks").alias("w")
    ).select(
        "cohort_week", (F.col("w") - F.col("cohort_week")).alias("week_offset")
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "x41_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def x41_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (first-order Markov counts): per-user
    time-ordered LAG pairs rolled up to (prev, next) transition and
    reach counts — the path-analysis primitive behind funnels. The
    (ts, event_id) order key makes ties deterministic so both engines
    sequence identically. One keyed window shuffle; the 25-cell rollup
    is map-side combined."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = cat.events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    return (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "x42_rolling_24h",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, epoch_us(ts) // 1000000 AS t
      FROM events WHERE user_id % 40 = 11
    )
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY t
             RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_24h,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY t
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_1h
    FROM s
    """,
)
def x42_rolling_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-RANGE frames: per event, how many of the user's
    events fall in the preceding 24h / 1h — the rate-limiting /
    burst-detection primitive. RANGE frames bound by VALUE (seconds),
    not row count, so sparse and dense periods window correctly; one
    keyed shuffle serves both frames. Integer epoch seconds keep the
    frame boundaries engine-exact (a timestamp RANGE would hinge on
    interval semantics)."""
    cat = Catalog(spark, sf_dir)
    s = cat.events.filter(F.col("user_id") % 40 == 11).select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") / 1_000_000).cast("long").alias("t"),
    )
    base = Window.partitionBy("user_id").orderBy("t")
    return s.select(
        "user_id",
        "event_id",
        F.count(F.lit(1))
        .over(base.rangeBetween(-86400, 0))
        .alias("n_24h"),
        F.count(F.lit(1))
        .over(base.rangeBetween(-3600, 0))
        .alias("n_1h"),
    )


# ---------------------------------------------------------------------------
# x43: PageRank over the event-transition graph — the iterative
# graph-analytics primitive (page importance / behavioral-state centrality)
# ---------------------------------------------------------------------------

PR_SCALE = 1_000_000_000  # ranks are parts-per-billion integers
PR_ITERS = 10
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as exact integer arithmetic


def _pr_edges(cat: Catalog) -> DataFrame:
    """Corpus → weighted transition edges (the ONE corpus-scale stage:
    x41's keyed window + 25-cell rollup). Everything after runs on the
    node/edge tables, which are model-sized here; on a web-scale graph
    the identical loop runs with ranks as a keyed table — the joins below
    are already keyed, broadcast only because nodes ≪ corpus."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = cat.events.select(
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
    ).filter(F.col("src").isNotNull())
    return seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))


def _pr_oracle(k: int = PR_ITERS) -> str:
    tele = (
        f"(CAST({PR_D_DEN - PR_D_NUM} AS BIGINT) * {PR_SCALE}) "
        f"// ({PR_D_DEN} * nn.n)"
    )
    iters = ",".join(
        f"""
r{i} AS MATERIALIZED (
  SELECT n2.node,
         {tele} + ({PR_D_NUM} * COALESCE(s.c, 0)) // {PR_D_DEN} AS rank
  FROM nodes n2 CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM((r.rank * e.w) // o.ow) AS BIGINT) AS c
    FROM r{i - 1} r
    JOIN e ON e.src = r.node
    JOIN outd o ON o.src = e.src
    GROUP BY e.dst
  ) s ON s.node = n2.node
)"""
        for i in range(1, k + 1)
    )
    return f"""
    WITH seq AS (
      SELECT LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS src,
             event_type AS dst
      FROM events
    ),
    e AS MATERIALIZED (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
      FROM seq WHERE src IS NOT NULL GROUP BY src, dst
    ),
    outd AS MATERIALIZED (
      SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM e GROUP BY src
    ),
    nodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      )
    ),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, {PR_SCALE} // nn.n AS rank FROM nodes CROSS JOIN nn
    ),
    {iters}
    SELECT node, CAST(rank AS BIGINT) AS rank_ppb
    FROM r{k} ORDER BY node
    """


@query("x43_event_pagerank", oracle=_pr_oracle())
def x43_event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d = 0.85, 10 iterations) over the first-order event
    transition graph: which behavioral state is most central, weighted by
    observed transition volume. The iterative-graph-algorithm primitive
    (same family as l17's connected components).

    Integer-exact: ranks are parts-per-billion ints; each contribution is
    (rank·w) div out_w and damping is 85/100 — all truncate-toward-zero
    integer ops, identical on both engines. The truncation's mass loss
    (≤ a few ppb per edge per round) is part of the pinned semantics, not
    float noise. Nodes without out-edges leak their mass (the standard
    non-redistributing variant) — on this graph every node has out-edges.

    Scale posture: one corpus-scale window+rollup builds the edges; each
    iteration is a keyed join + groupBy on the rank table — node-scale,
    not event-scale. At web-graph size the same plan shuffles ranks by
    dst; lineage is checkpoint-truncated per round (l17 discipline)."""
    cat = Catalog(spark, sf_dir)
    edges = _pr_edges(cat).localCheckpoint(eager=True)
    outd = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # out-degree is loop-invariant: join it onto the edge table ONCE
    # (round 8 — saves one keyed join, i.e. one exchange, per iteration)
    edges_w = edges.join(outd, "src").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"{PR_SCALE}L div n").alias("rank")
    )
    tele = f"({PR_D_DEN - PR_D_NUM}L * {PR_SCALE}L) div ({PR_D_DEN}L * n)"
    for _ in range(PR_ITERS):
        contrib = (
            ranks.join(edges_w, ranks.node == edges_w.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("(rank * w) div ow")).alias("c"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"{tele} + ({PR_D_NUM}L * coalesce(c, 0L)) div {PR_D_DEN}L"
                ).alias("rank"),
            )
        )
        # no per-iteration checkpoint: each round references its
        # predecessor exactly ONCE (contrib is the only consumer), so
        # lineage grows linearly — unlike l23's double-referenced vocab.
        # The corpus-scale subtrees (edges/nodes) ARE checkpointed above,
        # so the deep plan re-reads only 5-row leaves.
    return ranks.select("node", F.col("rank").alias("rank_ppb")).orderBy(
        "node"
    )
