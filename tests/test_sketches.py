"""Sketch aggregates: accuracy bounds + the structural guarantees."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_hll_estimate_within_bound(spark):
    """HLL standard error is ~1.04/sqrt(m); assert a loose 3-sigma band
    against the exact distinct count."""
    from cassandra_spark.operators.sketches import HLL_M, a10_hll_distinct

    r = a10_hll_distinct(spark, SF_SMOKE).collect()[0]
    assert r.m == HLL_M and r.exact > 0
    rel_err = abs(r.estimate - r.exact) / r.exact
    assert rel_err < 3 * 1.04 / (HLL_M ** 0.5), (r.estimate, r.exact)


def test_hll_scaled_sum_is_exact_integer(spark):
    """The accumulator must stay in integer space (the cross-engine
    exactness argument): scaled_sum <= m * 2^25 and > 0."""
    from cassandra_spark.operators.sketches import HLL_M, a10_hll_distinct

    r = a10_hll_distinct(spark, SF_SMOKE).collect()[0]
    assert 0 < r.scaled_sum <= HLL_M * (1 << 25)
    assert isinstance(r.scaled_sum, int)


def test_countmin_never_undercounts(spark):
    """CM estimates are upper bounds by construction — every probed key
    must satisfy estimate >= true count."""
    from cassandra_spark.operators.sketches import a11_countmin_heavy

    rows = a11_countmin_heavy(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.cm_estimate >= r.true_count for r in rows)


def test_mix32_dialects_agree():
    """The Spark and DuckDB spellings of the mixer compute the same
    values (the premise of every sketch oracle)."""
    import duckdb

    from cassandra_spark.operators.sketches import mix32_sql

    vals = [0, 1, -1, 42, 999983, -123456789, 2**31, -(2**31)]
    duck = [
        duckdb.sql(f"SELECT {mix32_sql(str(v), 'duck')}").fetchone()[0]
        for v in vals
    ]
    # pure-Python replay of the mixer
    def mix(x: int) -> int:
        M, K = 1 << 32, 73244475
        h = ((x % M) + M) % M
        h = ((h ^ (h // 65536)) * K) % M
        h = ((h ^ (h // 65536)) * K) % M
        return h ^ (h // 65536)

    assert duck == [mix(v) for v in vals]


def test_mix32_spark_matches_python(spark):
    from cassandra_spark.operators.sketches import mix32_sql

    rows = spark.sql(
        f"SELECT id - 5 AS x, {mix32_sql('id - 5', 'spark')} AS h "
        "FROM range(0, 11)"
    ).collect()

    def mix(x: int) -> int:
        M, K = 1 << 32, 73244475
        h = ((x % M) + M) % M
        h = ((h ^ (h // 65536)) * K) % M
        h = ((h ^ (h // 65536)) * K) % M
        return h ^ (h // 65536)

    for r in rows:
        assert r.h == mix(r.x)


def test_linear_counting_ln_domain_pinned(spark, duck):
    """The small-range branch computes round(m*ln(m/V), 6) for V in
    1..m — a finite 256-value domain; pin Spark (JVM Math) against DuckDB
    (libm) on all of it, the same determinism contract as f8."""
    jvm = spark.sql(
        "SELECT id AS v, round(256.0D * ln(256.0D / id), 6) AS e "
        "FROM range(1, 257)"
    ).collect()
    libm = duck.execute(
        "SELECT r AS v, round(CAST(256 AS DOUBLE) "
        "* ln(CAST(256 AS DOUBLE) / r), 6) AS e "
        "FROM range(1, 257) t(r) ORDER BY r"
    ).fetchall()
    assert [(r.v, r.e) for r in jvm] == [(v, e) for v, e in libm]


def test_kmv_estimates_reasonable(spark):
    """KMV union/intersection estimates should land near the exact values
    on the smoke corpus (loose band: KMV rel-err ~ 1/sqrt(k))."""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.sketches import a12_kmv_overlap

    r = a12_kmv_overlap(spark, SF_SMOKE).collect()[0]
    orders = Catalog(spark, SF_SMOKE).orders
    a = orders.filter(F.col("o_orderkey") % 3 == 0).select("o_custkey")
    b = orders.filter(F.col("o_orderkey") % 3 == 1).select("o_custkey")
    exact_union = a.union(b).distinct().count()
    exact_inter = a.intersect(b).count()
    # when the set is smaller than k the sketch is EXHAUSTIVE: counts are
    # exact and the estimator degrades gracefully
    if r.k_u < 256:
        assert r.k_u == exact_union
        assert r.k_both == exact_inter
    else:
        assert abs(r.union_est - exact_union) / exact_union < 0.25
        assert (
            exact_inter == 0
            or abs(r.intersection_est - exact_inter)
            / max(exact_inter, 1) < 0.5
        )


def test_kmv_plan_is_take_ordered(spark):
    """The sketch build must compile to TakeOrderedAndProject (bounded
    k), never a global sort."""
    import contextlib
    import io

    from cassandra_spark.operators.sketches import a12_kmv_overlap

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        a12_kmv_overlap(spark, SF_SMOKE).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_hll_merge_equals_whole_corpus_sketch(spark):
    """The composability law: merging per-group partials (max per bucket)
    must give the SAME accumulator as sketching all user_ids at once."""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.sketches import (
        HLL_M,
        _HLL_REST_BITS,
        _hll_rank_sql,
        a13_hll_partials,
        mix32_sql,
    )

    merged = a13_hll_partials(spark, SF_SMOKE).collect()[0].merged_scaled_sum
    h = mix32_sql("user_id", "spark")
    direct = (
        Catalog(spark, SF_SMOKE)
        .events.select(F.expr(f"{h} AS h"))
        .select(
            F.expr(f"h % {HLL_M} AS bucket"),
            F.expr(_hll_rank_sql("h", "spark")).alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("maxrank"))
        .agg(
            (
                F.expr(
                    f"CAST(SUM(CAST(pow(2, {_HLL_REST_BITS + 1} - maxrank) "
                    "AS BIGINT)) AS BIGINT)"
                )
                + (F.lit(HLL_M) - F.count(F.lit(1)))
                * F.lit(1 << (_HLL_REST_BITS + 1))
            )
            .cast("long")
            .alias("s")
        )
        .collect()[0]
        .s
    )
    assert merged == direct


def test_histogram_quantiles_bracket_exact(spark):
    """Histogram p50/p90/p99 must bracket the exact percentile_disc
    within one bucket width."""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.sketches import (
        HIST_W,
        a14_histogram_quantiles,
    )

    import math

    got = {r.q: r.est_value for r in
           a14_histogram_quantiles(spark, SF_SMOKE).collect()}
    assert set(got) == {0.5, 0.9, 0.99}
    ev = Catalog(spark, SF_SMOKE).events.filter(F.col("value").isNotNull())
    lo, hi, n = ev.agg(
        F.min("value"), F.max("value"), F.count(F.lit(1))
    ).collect()[0]
    width = (hi - lo) / HIST_W
    ordered = [r.value for r in ev.select("value").orderBy("value").collect()]
    for q in got:
        # the operator's CONTRACT: the bucket holding the ceil(q*n)-th
        # order statistic — its lower edge brackets that exact value
        # within one bucket width on ANY distribution (unlike Spark's
        # interpolated percentile(), which a sparse tail can put many
        # widths away)
        v_k = ordered[math.ceil(q * n) - 1]
        assert got[q] <= v_k <= got[q] + width + 1e-9, (q, got[q], v_k)
    assert got[0.5] <= got[0.9] <= got[0.99]
