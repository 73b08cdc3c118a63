"""Sketch aggregates (A-tier extras): HyperLogLog distinct estimation and
count-min heavy-hitter counts — DETERMINISTIC, cross-engine-exact builds.

At 100 TB the distinct-count and heavy-hitter questions are answered with
sketches, not exact aggregation (HLL is what the reference's own
``system.size_estimates``-adjacent tooling and most engines use). Spark
ships approx_count_distinct (HLL++), but its sketch internals aren't
reproducible in another engine, so it can't pass a value-hash oracle. The
versions here are built from scratch on integer-only algebra:

- the 32-bit hash is a lowbias-style xorshift-multiply finalizer whose
  products stay under 2^59 (safe for ANSI bigint in Spark and plain SQL in
  DuckDB) — every step is exact in both engines;
- the HLL accumulator sums **scaled integer powers of two** (``2^(25 -
  maxrank)`` as BIGINT) instead of doubles: a float Σ2^-r is rounding- and
  ORDER-dependent past 53 bits of span, an integer Σ2^(25-r) is exact, so
  the final estimate double is identical bit-for-bit across engines;
- count-min rows are three salted instances of the same mixer; the probe
  takes the min over rows, which upper-bounds never-undercounts by
  construction (tested).

Shapes: HLL is two tiny aggregations (m=256 groups, then 1 row) after a
map-only hash projection — one narrow shuffle of 256 groups regardless of
corpus size. Count-min is a 3x row-explode into (row, bucket) counts —
d*w = 1536 cells total — probed by a broadcast join of the candidate keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query

_M32 = 1 << 32
_MIX_K = 73244475  # < 2^27: h * K stays under 2^59 for h < 2^32

HLL_M = 256          # buckets (b = 8)
_HLL_REST_BITS = 24  # rank domain: 1..25 over the remaining hash bits


def mix32_sql(x: str, dialect: str) -> str:
    """The shared 32-bit finalizer as SQL text. ``dialect`` adapts the two
    spots where syntax diverges — Spark spells xor ``^`` and integer
    division ``div``, DuckDB ``xor()`` and ``//`` — every step's VALUE is
    identical (exact integer algebra)."""
    spark = dialect == "spark"

    def x1(a: str, b: str) -> str:
        return f"({a} ^ {b})" if spark else f"xor({a}, {b})"

    def shr16(a: str) -> str:
        return f"(({a}) div 65536)" if spark else f"(({a}) // 65536)"

    h0 = f"((({x}) % {_M32} + {_M32}) % {_M32})"
    h1 = f"({x1(h0, shr16(h0))} * {_MIX_K}) % {_M32}"
    h2 = f"({x1(h1, shr16(h1))} * {_MIX_K}) % {_M32}"
    return x1(h2, shr16(h2))




def hll_scaled_sum_sql() -> str:
    """DuckDB aggregate text for the scaled-integer HLL accumulator over
    grouped (bucket, maxrank) rows — THE estimator core; keep the three
    users (a10, a13, s11 oracle) on this one spelling."""
    return (
        f"CAST(SUM(CAST(2 AS BIGINT) ** ({_HLL_REST_BITS + 1} - maxrank)) "
        f"+ ({HLL_M} - COUNT(*)) * {1 << (_HLL_REST_BITS + 1)} AS BIGINT)"
    )


def hll_scaled_sum_col():
    """The same accumulator as a Spark aggregate Column."""
    return (
        F.expr(
            f"CAST(SUM(CAST(pow(2, {_HLL_REST_BITS + 1} - maxrank) AS BIGINT))"
            " AS BIGINT)"
        )
        + (F.lit(HLL_M) - F.count(F.lit(1)))
        * F.lit(1 << (_HLL_REST_BITS + 1))
    ).cast("long")


# alpha_256 * m^2 * 2^25, all as exact literals folded at parse time
_HLL_NUM = (
    f"(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) "
    f"+ CAST(1.079 AS DOUBLE) / {HLL_M})) * {HLL_M * HLL_M} * {1 << 25}"
)


@query(
    "a10_hll_distinct",
    oracle=f"""
    WITH hashed AS (
      SELECT {mix32_sql("o_custkey", "duck")} AS h FROM orders
    ), ranks AS (
      SELECT h % {HLL_M} AS bucket,
             MAX(CASE WHEN (h // {HLL_M}) % {1 << _HLL_REST_BITS} = 0
                      THEN {_HLL_REST_BITS + 1}
                      ELSE {_HLL_REST_BITS + 1}
                           - length(bin((h // {HLL_M})
                                        % {1 << _HLL_REST_BITS}))
                 END) AS maxrank
      FROM hashed GROUP BY 1
    ), acc AS (
      SELECT CAST(SUM(CAST(2 AS BIGINT)
                      ** ({_HLL_REST_BITS + 1} - maxrank)) AS BIGINT)
               AS int_sum,
             COUNT(*) AS n_buckets
      FROM ranks
    )
    , est AS (
      SELECT CAST(int_sum + ({HLL_M} - n_buckets)
                  * {1 << (_HLL_REST_BITS + 1)} AS BIGINT) AS scaled_sum,
             {HLL_M} - n_buckets AS empties,
             {_HLL_NUM} / CAST(int_sum + ({HLL_M} - n_buckets)
                           * {1 << (_HLL_REST_BITS + 1)} AS DOUBLE) AS raw_est
      FROM acc
    )
    SELECT {HLL_M} AS m,
           scaled_sum,
           CASE WHEN raw_est <= 2.5 * {HLL_M} AND empties > 0
                THEN round(CAST({HLL_M} AS DOUBLE)
                           * ln(CAST({HLL_M} AS DOUBLE) / empties), 6)
                ELSE round(raw_est, 6) END AS estimate,
           (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
             AS exact
    FROM est
    """,
)
def a10_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct customers over orders — the from-scratch,
    cross-engine-exact sketch (see module docstring for why Spark's
    approx_count_distinct can't be oracle-checked). Empty buckets
    contribute rank 0 (the ``m - n_buckets`` term). Estimate accuracy vs
    exact is asserted at ~2/sqrt(m) in tests."""
    cat = Catalog(spark, sf_dir)
    h = mix32_sql("o_custkey", "spark")
    rest = f"(h div {HLL_M}) % {1 << _HLL_REST_BITS}"
    ranks = (
        cat.orders.select(F.expr(f"{h} AS h"))
        .select(
            F.expr(f"h % {HLL_M} AS bucket"),
            F.expr(
                f"CASE WHEN {rest} = 0 THEN {_HLL_REST_BITS + 1} "
                f"ELSE {_HLL_REST_BITS + 1} - length(bin({rest})) END"
            ).alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("maxrank"))
    )
    acc = ranks.agg(
        F.expr(
            f"CAST(SUM(CAST(pow(2, {_HLL_REST_BITS + 1} - maxrank) AS BIGINT))"
            " AS BIGINT)"
        ).alias("int_sum"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    exact = cat.orders.agg(
        F.countDistinct("o_custkey").alias("exact")
    )
    scaled = (
        F.col("int_sum")
        + (F.lit(HLL_M) - F.col("n_buckets"))
        * F.lit(1 << (_HLL_REST_BITS + 1))
    ).cast("long")
    raw_est = F.expr(_HLL_NUM) / scaled.cast("double")
    empties = F.lit(HLL_M) - F.col("n_buckets")
    # small-range correction (linear counting): raw HLL biases high when
    # n << m; ln over the finite 256-value domain is pinned at 6 dp on
    # both engines (same JVM-vs-libm argument as f8)
    estimate = F.when(
        (raw_est <= 2.5 * HLL_M) & (empties > 0),
        F.round(
            F.lit(float(HLL_M))
            * F.log(F.lit(float(HLL_M)) / empties.cast("double")),
            6,
        ),
    ).otherwise(F.round(raw_est, 6))
    return (
        acc.crossJoin(F.broadcast(exact))
        .select(
            F.lit(HLL_M).alias("m"),
            scaled.alias("scaled_sum"),
            estimate.alias("estimate"),
            F.col("exact").cast("long").alias("exact"),
        )
    )


CM_D = 3     # hash rows
CM_W = 512   # counters per row


@query(
    "a11_countmin_heavy",
    oracle=f"""
    WITH cells AS (
      SELECT r, {mix32_sql("user_id * (2 * r + 3)", "duck")} % {CM_W}
               AS bucket,
             COUNT(*) AS cnt
      FROM events, unnest(range({CM_D})) AS t(r)
      GROUP BY 1, 2
    ), truth AS (
      SELECT user_id, COUNT(*) AS true_count
      FROM events GROUP BY 1
    ), probed AS (
      SELECT t.user_id, t.true_count,
             MIN(c.cnt) AS cm_estimate
      FROM truth t
      JOIN cells c
        ON c.bucket = {mix32_sql("t.user_id * (2 * c.r + 3)", "duck")} % {CM_W}
      GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(true_count AS BIGINT) AS true_count,
           CAST(cm_estimate AS BIGINT) AS cm_estimate
    FROM probed WHERE true_count >= 40
    """,
)
def a11_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters: per-user event counts estimated from a
    {CM_D}x{CM_W}-cell sketch, probed for the heavy candidates
    (true >= 40). The sketch never undercounts (min over rows of
    overcounted cells — asserted in tests); collisions only inflate.
    Build = one explode + a d*w-group aggregation; probe = broadcast of
    the tiny cell table back onto the candidates."""
    cat = Catalog(spark, sf_dir)
    bucket = f"{mix32_sql('user_id * (2 * r + 3)', 'spark')} % {CM_W}"
    cells = (
        cat.events.select("user_id")
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(CM_D - 1))))
        .withColumn("bucket", F.expr(bucket))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    truth = (
        cat.events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .filter(F.col("true_count") >= 40)
    )
    probes = truth.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(CM_D - 1)))
    ).withColumn("bucket", F.expr(bucket))
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("cnt").alias("cm_estimate"))
        .select(
            "user_id",
            F.col("true_count").cast("long"),
            F.col("cm_estimate").cast("long"),
        )
    )


KMV_K = 256


@query(
    "a12_kmv_overlap",
    oracle=f"""
    WITH a_keys AS (
      SELECT DISTINCT {mix32_sql("o_custkey", "duck")} AS h
      FROM orders WHERE o_orderkey % 3 = 0
    ), b_keys AS (
      SELECT DISTINCT {mix32_sql("o_custkey", "duck")} AS h
      FROM orders WHERE o_orderkey % 3 = 1
    ), a_kmv AS (
      SELECT h FROM a_keys ORDER BY h LIMIT {KMV_K}
    ), b_kmv AS (
      SELECT h FROM b_keys ORDER BY h LIMIT {KMV_K}
    ), u_kmv AS (
      SELECT h FROM (SELECT h FROM a_kmv UNION SELECT h FROM b_kmv)
      ORDER BY h LIMIT {KMV_K}
    ), stats AS (
      SELECT (SELECT MAX(h) FROM a_kmv) AS ka,
             (SELECT COUNT(*) FROM a_kmv) AS na,
             (SELECT MAX(h) FROM b_kmv) AS kb,
             (SELECT COUNT(*) FROM b_kmv) AS nb,
             (SELECT MAX(h) FROM u_kmv) AS ku,
             (SELECT COUNT(*) FROM u_kmv) AS nu,
             (SELECT COUNT(*) FROM u_kmv
              WHERE h IN (SELECT h FROM a_kmv)
                AND h IN (SELECT h FROM b_kmv)) AS n_both
    )
    SELECT CAST(na AS BIGINT) AS k_a, CAST(nb AS BIGINT) AS k_b,
           CAST(nu AS BIGINT) AS k_u, CAST(n_both AS BIGINT) AS k_both,
           round((CAST(nu AS DOUBLE) - 1.0) * {_M32}
                 / CAST(ku AS DOUBLE), 6) AS union_est,
           round(CAST(n_both AS DOUBLE) / nu
                 * ((CAST(nu AS DOUBLE) - 1.0) * {_M32}
                    / CAST(ku AS DOUBLE)), 6) AS intersection_est
    FROM stats
    """,
)
def a12_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) theta-sketch set algebra:
    distinct-union and intersection estimates between two customer sets
    (orders split by orderkey mod). Unlike HLL, KMV sketches COMPOSE —
    union = bottom-k of merged minima, intersection via the Jaccard of
    the union sketch — which is what 100 TB segment-wise dedup planning
    needs (sketch per shard, combine on the driver-sized k values).
    Deterministic end-to-end: the sketch IS a top-k over an exact integer
    hash (TakeOrderedAndProject, no randomness), so both engines build
    the identical sketch and the estimate doubles match bit-for-bit."""
    cat = Catalog(spark, sf_dir)
    h = mix32_sql("o_custkey", "spark")

    def kmv(cond):
        return (
            cat.orders.filter(cond)
            .select(F.expr(f"{h} AS h"))
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
        )

    a = kmv(F.col("o_orderkey") % 3 == 0)
    b = kmv(F.col("o_orderkey") % 3 == 1)
    u = a.union(b).distinct().orderBy("h").limit(KMV_K)
    sa = a.agg(F.max("h").alias("ka"), F.count("h").alias("na"))
    sb = b.agg(F.max("h").alias("kb"), F.count("h").alias("nb"))
    both = u.join(a, "h", "left_semi").join(b, "h", "left_semi").agg(
        F.count("h").alias("n_both")
    )
    su = u.agg(F.max("h").alias("ku"), F.count("h").alias("nu"))
    union_raw = (
        (F.col("nu").cast("double") - 1.0) * float(_M32)
        / F.col("ku").cast("double")
    )
    union_est = F.round(union_raw, 6)
    return (
        sa.crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(su))
        .crossJoin(F.broadcast(both))
        .select(
            F.col("na").cast("long").alias("k_a"),
            F.col("nb").cast("long").alias("k_b"),
            F.col("nu").cast("long").alias("k_u"),
            F.col("n_both").cast("long").alias("k_both"),
            union_est.alias("union_est"),
            F.round(
                F.col("n_both").cast("double") / F.col("nu") * union_raw, 6
            ).alias("intersection_est"),
        )
    )


def _hll_rank_sql(h: str, dialect: str) -> str:
    """bucket rank of hash ``h`` (1..25) — shared text modulo int-div."""
    d = "div" if dialect == "spark" else "//"
    rest = f"(({h}) {d} {HLL_M}) % {1 << _HLL_REST_BITS}"
    return (
        f"CASE WHEN {rest} = 0 THEN {_HLL_REST_BITS + 1} "
        f"ELSE {_HLL_REST_BITS + 1} - length(bin({rest})) END"
    )


@query(
    "a13_hll_partials",
    oracle=f"""
    WITH hashed AS (
      SELECT event_type,
             {mix32_sql("user_id", "duck")} AS h
      FROM events
    ), per_group AS (
      SELECT event_type, h % {HLL_M} AS bucket,
             MAX({_hll_rank_sql("h", "duck")}) AS maxrank
      FROM hashed GROUP BY 1, 2
    ), group_est AS (
      SELECT event_type,
             {hll_scaled_sum_sql()} AS scaled_sum
      FROM per_group GROUP BY 1
    ), merged AS (
      -- sketch MERGE: per-bucket max across group partials == the global
      -- sketch (max is associative/commutative — the map-side-combine law)
      SELECT bucket, MAX(maxrank) AS maxrank FROM per_group GROUP BY 1
    ), merged_est AS (
      SELECT {hll_scaled_sum_sql()} AS scaled_sum
      FROM merged
    )
    SELECT event_type, scaled_sum,
           (SELECT scaled_sum FROM merged_est) AS merged_scaled_sum
    FROM group_est ORDER BY event_type
    """,
)
def a13_hll_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL COMPOSABILITY: per-event-type distinct-user sketches plus
    their merge (per-bucket max across partials) — the partial-aggregate
    law that lets 1000 executors sketch shards independently and combine
    m-sized states instead of re-scanning. The merged accumulator is, by
    associativity, byte-identical to sketching the whole corpus at once
    (asserted against a10's machinery in tests). Integer accumulators
    keep every value cross-engine exact."""
    cat = Catalog(spark, sf_dir)
    h = mix32_sql("user_id", "spark")
    per_group = (
        cat.events.select(
            "event_type", F.expr(f"{h} AS h")
        )
        .select(
            "event_type",
            F.expr(f"h % {HLL_M} AS bucket"),
            F.expr(_hll_rank_sql("h", "spark")).alias("rank"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rank").alias("maxrank"))
    )
    scaled = hll_scaled_sum_col()
    group_est = per_group.groupBy("event_type").agg(
        scaled.alias("scaled_sum")
    )
    merged_est = (
        per_group.groupBy("bucket")
        .agg(F.max("maxrank").alias("maxrank"))
        .agg(hll_scaled_sum_col().alias("merged_scaled_sum"))
    )
    return (
        group_est.crossJoin(F.broadcast(merged_est))
        .select("event_type", "scaled_sum", "merged_scaled_sum")
        .orderBy("event_type")
    )


HIST_W = 1000  # histogram buckets


@query(
    "a14_histogram_quantiles",
    oracle=f"""
    WITH vals AS (
      SELECT value FROM events WHERE value IS NOT NULL
    ), stats AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi,
             COUNT(*) AS n
      FROM vals
    ), hist AS (
      SELECT LEAST(CAST(floor((value - lo) / (hi - lo) * {HIST_W})
                        AS INTEGER), {HIST_W - 1}) AS bucket,
             COUNT(*) AS cnt
      FROM vals, stats GROUP BY 1
    ), cum AS (
      SELECT bucket, cnt,
             SUM(cnt) OVER (ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_cnt
      FROM hist
    )
    SELECT q,
           MIN(bucket) AS bucket,
           MIN(lo + bucket * (hi - lo) / {HIST_W}) AS est_value
    FROM (SELECT UNNEST([0.5, 0.9, 0.99]) AS q), cum, stats
    WHERE cum_cnt >= CAST(ceil(q * n) AS BIGINT)
    GROUP BY q ORDER BY q
    """,
)
def a14_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch (the reference's EstimatedHistogram
    pattern `[C* utils/EstimatedHistogram, unverified]`, the 4th classic
    sketch): p50/p90/p99 of event values from a {HIST_W}-bucket
    equi-width histogram. Two passes: a 1-row stats agg broadcast back,
    then a {HIST_W}-group count — state is W integers at any corpus size.
    Unlike percentile_approx (whose internal sketch isn't reproducible),
    every step here is IEEE double arithmetic + integer counts in the
    SAME op order on both engines, so the estimates are bit-exact
    cross-engine."""
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    # NULL values carry no measurement: without the filter both engines
    # would bucket them at the top (least() skips NULL) AND count them
    # in n — an agreeing-but-wrong oracle pair
    vals = cat.events.filter(F.col("value").isNotNull()).select("value")
    stats = vals.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    hist = (
        vals.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * HIST_W
                ).cast("int"),
                F.lit(HIST_W - 1),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = hist.withColumn(
        "cum_cnt",
        F.sum("cnt").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    return (
        qs.crossJoin(cum)
        .crossJoin(F.broadcast(stats))
        .filter(
            F.col("cum_cnt") >= F.ceil(F.col("q") * F.col("n")).cast("long")
        )
        .groupBy("q")
        .agg(
            F.min("bucket").alias("bucket"),
            F.min(
                F.col("lo") + F.col("bucket") * (F.col("hi") - F.col("lo"))
                / HIST_W
            ).alias("est_value"),
        )
        .orderBy("q")
    )
