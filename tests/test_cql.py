"""CQL front-end: accepted statements compile to the right results;
rejected statements fail with the reference's restriction semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.cql import CQLError, cql_select
from tests.conftest import SF_SMOKE


def q(spark, stmt):
    return cql_select(spark, SF_SMOKE, stmt)


def test_point_lookup(spark):
    rows = q(
        spark, "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = 7"
    ).collect()
    want = (
        Catalog(spark, SF_SMOKE)
        .orders.filter(F.col("o_custkey") == 7)
        .count()
    )
    assert len(rows) == want > 0


def test_in_lookup_and_limit(spark):
    rows = q(
        spark,
        "SELECT * FROM orders WHERE o_custkey IN (1, 2, 3) LIMIT 4",
    ).collect()
    assert 0 < len(rows) <= 4


def test_clustering_slice_with_order(spark):
    rows = q(
        spark,
        "SELECT o_orderkey, o_orderdate FROM orders "
        "WHERE o_custkey = 7 AND o_orderdate >= '1995-01-01' "
        "ORDER BY o_orderdate DESC",
    ).collect()
    dates = [r.o_orderdate for r in rows]
    assert dates == sorted(dates, reverse=True)


def test_per_partition_limit(spark):
    rows = q(
        spark,
        "SELECT user_id, event_id FROM events PER PARTITION LIMIT 2",
    ).collect()
    per = {}
    for r in rows:
        per[r.user_id] = per.get(r.user_id, 0) + 1
    assert per and all(n <= 2 for n in per.values())


def test_non_key_filter_rejected_without_allow_filtering(spark):
    with pytest.raises(CQLError, match="ALLOW FILTERING"):
        q(spark, "SELECT * FROM orders WHERE o_totalprice > 1000")


def test_allow_filtering_permits_scan(spark):
    rows = q(
        spark,
        "SELECT o_orderkey FROM orders WHERE o_totalprice > 1000 "
        "LIMIT 5 ALLOW FILTERING",
    ).collect()
    assert len(rows) == 5


def test_order_by_non_clustering_rejected(spark):
    with pytest.raises(CQLError, match="clustered columns"):
        q(
            spark,
            "SELECT * FROM orders WHERE o_custkey = 7 ORDER BY o_totalprice",
        )


def test_token_range(spark):
    rows = q(
        spark,
        "SELECT o_custkey FROM orders WHERE token(o_custkey) > 0 LIMIT 10",
    ).collect()
    assert rows


def test_contains_rewrite(spark):
    # documents has no array col; build one via the projection instead:
    # CONTAINS on a filtered synthetic array exercises the rewrite path
    # array_contains on a string errors at analysis (filter construction);
    # the rewrite itself is what's under test — assert the rewritten
    # expression reached Catalyst
    with pytest.raises(Exception, match="array_contains|ARRAY|DATATYPE"):
        q(
            spark,
            "SELECT doc_id FROM documents "
            "WHERE doc_id = 1 AND lang CONTAINS 'e' ALLOW FILTERING",
        )


def test_cql_aggregates_in_projection(spark):
    # CQL 2.2+ native aggregates over a partition: count/min/max/sum/avg
    # flow through the projection path unchanged
    rows = q(
        spark,
        "SELECT count(*) AS n, min(o_totalprice) AS lo, "
        "max(o_totalprice) AS hi FROM orders WHERE o_custkey = 7",
    ).collect()
    assert len(rows) == 1
    want = (
        Catalog(spark, SF_SMOKE)
        .orders.filter(F.col("o_custkey") == 7)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .collect()[0]
    )
    assert (rows[0].n, rows[0].lo, rows[0].hi) == (want.n, want.lo, want.hi)


def test_malformed_rejected(spark):
    with pytest.raises(CQLError, match="malformed"):
        q(spark, "UPDATE orders SET x = 1")


def test_group_by_requires_pk_prefix(spark):
    # clustering col without the partition key → rejected (CASSANDRA-10707)
    with pytest.raises(CQLError, match="PRIMARY KEY"):
        q(spark, "SELECT count(*) AS n FROM orders GROUP BY o_orderdate")
    # non-key column → rejected
    with pytest.raises(CQLError, match="PRIMARY KEY"):
        q(spark, "SELECT count(*) AS n FROM orders GROUP BY o_orderstatus")


def test_group_by_first_value_is_clustering_order(spark):
    # non-grouped o_orderdate = first row per group in (-o_orderdate,
    # o_orderkey) clustering order = the customer's NEWEST order date
    rows = {
        r.o_custkey: r.o_orderdate
        for r in q(
            spark,
            "SELECT o_custkey, o_orderdate, count(*) AS n "
            "FROM orders GROUP BY o_custkey",
        ).collect()
    }
    want = {
        r.o_custkey: r.newest
        for r in Catalog(spark, SF_SMOKE)
        .orders.groupBy("o_custkey")
        .agg(F.max("o_orderdate").alias("newest"))
        .collect()
    }
    assert rows == want


def test_distinct_only_partition_key(spark):
    with pytest.raises(CQLError, match="partition key"):
        q(spark, "SELECT DISTINCT o_orderkey FROM orders")
    users = q(spark, "SELECT DISTINCT user_id FROM events").collect()
    assert len(users) == len({u.user_id for u in users}) > 0


def test_ann_requires_limit(spark):
    with pytest.raises(CQLError, match="LIMIT"):
        q(spark, "SELECT vec_id FROM embeddings ORDER BY embedding ANN OF [0.1, 0.2]")
    with pytest.raises(CQLError, match="LIMIT"):
        q(
            spark,
            "SELECT vec_id FROM embeddings "
            "ORDER BY embedding ANN OF [0.1, 0.2] LIMIT 5000",
        )


def test_ann_requires_vector_column(spark):
    with pytest.raises(CQLError, match="vector"):
        q(spark, "SELECT vec_id FROM embeddings ORDER BY vec_id ANN OF [0.1] LIMIT 5")


def test_ann_matches_exact_cosine(spark):
    """Front-end ANN top-1 = the vector most cosine-similar to the query."""
    import math

    vec = ", ".join(str(round((((3 * d + 1) % 17) - 8) / 10, 1)) for d in range(64))
    top = q(
        spark,
        f"SELECT vec_id FROM embeddings ORDER BY embedding ANN OF [{vec}] LIMIT 3",
    ).collect()
    assert len(top) == 3
    qv = [float(x) for x in vec.split(",")]
    best, best_s = None, -2.0
    for r in Catalog(spark, SF_SMOKE).embeddings.collect():
        e = [float(x) for x in r.embedding]
        s = sum(a * b for a, b in zip(e, qv)) / (
            math.sqrt(sum(a * a for a in e)) * math.sqrt(sum(b * b for b in qv))
        )
        if s > best_s:
            best, best_s = r.vec_id, s
    assert top[0].vec_id == best


def test_writetime_ttl_selectors(spark):
    rows = q(
        spark,
        "SELECT event_id, WRITETIME(value), TTL(value) FROM events "
        "WHERE user_id = 3",
    ).collect()
    assert rows
    assert set(rows[0].asDict()) == {"event_id", "writetime_value", "ttl_value"}
    assert all(r.ttl_value == 30 * 24 * 3600 for r in rows)
    # writetime is the µs epoch of ts (fixture synthesis)
    assert all(r.writetime_value > 10**15 for r in rows)


def test_writetime_on_key_column_rejected(spark):
    with pytest.raises(CQLError, match="PRIMARY KEY part"):
        q(spark, "SELECT WRITETIME(user_id) FROM events WHERE user_id = 3")


def test_writetime_without_cell_metadata_rejected(spark):
    # orders carries no cell metadata and no synthesis exists for it
    with pytest.raises(CQLError, match="no cell metadata"):
        q(spark, "SELECT WRITETIME(o_totalprice) FROM orders WHERE o_custkey = 7")


def test_select_json_shape_and_nulls(spark):
    rows = q(
        spark,
        "SELECT JSON event_id, user_id FROM events WHERE user_id = 3 LIMIT 2",
    ).collect()
    assert rows and list(rows[0].asDict()) == ["[json]"]
    assert rows[0]["[json]"].startswith('{"event_id":')


def test_select_json_star(spark):
    rows = q(
        spark, "SELECT JSON * FROM region"
    ).collect()
    assert len(rows) == 5
    assert all(r["[json]"].startswith('{"r_regionkey":') for r in rows)


def test_token_is_bit_exact_murmur3(spark):
    """CQL token() must produce Cassandra's real Murmur3 tokens for
    bigint partition keys (8-byte big-endian serialization)."""
    from cassandra_spark.operators.murmur3 import token_of_bigint

    rows = q(
        spark,
        "SELECT o_custkey, token(o_custkey) AS tok FROM orders "
        "WHERE o_custkey IN (1, 7, 42)",
    ).collect()
    assert rows
    for r in rows:
        assert r["tok"] == token_of_bigint(r["o_custkey"])


def test_group_by_floor_time_bucket(spark):
    """CASSANDRA-11871 lineage: GROUP BY pk, floor(ck, dur) — epoch-
    aligned buckets, gate rejections for every malformed spelling."""
    import pytest

    from cassandra_spark.cql import CQLError, cql_select
    from tests.conftest import SF_SMOKE

    df = cql_select(
        spark, SF_SMOKE,
        "SELECT user_id, floor(ts, 1h) AS bucket, count(event_id) AS n "
        "FROM events GROUP BY user_id, floor(ts, 1h)",
    )
    assert dict(df.dtypes)["bucket"] == "timestamp"
    rows = df.collect()
    assert rows and all(
        r.bucket.minute == 0 and r.bucket.second == 0 for r in rows
    )
    # buckets partition the events: totals must reconcile
    total = cql_select(
        spark, SF_SMOKE,
        "SELECT count(event_id) AS n FROM events GROUP BY user_id",
    ).groupBy().sum("n").collect()[0][0]
    assert sum(r.n for r in rows) == total
    for bad, why in [
        # floor on a non-clustering column
        ("SELECT user_id, floor(event_id, 1h) AS b FROM events "
         "GROUP BY user_id, floor(event_id, 1h)", "next clustering"),
        # floor must come last
        ("SELECT user_id, floor(ts, 1h) AS b FROM events "
         "GROUP BY floor(ts, 1h), user_id", "last"),
        # partition key still required
        ("SELECT floor(ts, 1h) AS b FROM events GROUP BY floor(ts, 1h)",
         "PRIMARY KEY"),
        # variable-length durations rejected
        ("SELECT user_id, floor(ts, 1mo) AS b FROM events "
         "GROUP BY user_id, floor(ts, 1mo)", "fixed-length"),
        # non-temporal column rejected
        ("SELECT user_id, floor(value, 1h) AS b FROM events "
         "GROUP BY user_id, floor(value, 1h)", ""),
    ]:
        with pytest.raises(CQLError):
            cql_select(spark, SF_SMOKE, bad)
    # projection floor must match the grouped bucket
    with pytest.raises(CQLError, match="match"):
        cql_select(
            spark, SF_SMOKE,
            "SELECT user_id, floor(ts, 5m) AS b FROM events "
            "GROUP BY user_id, floor(ts, 1h)",
        )


def test_between_gate(spark):
    """CQL 5.0 BETWEEN: range class in the gate — clustering under a
    restricted pk passes, SAI passes, SASI passes, plain 2i and
    unindexed demand ALLOW FILTERING."""
    import pytest

    from cassandra_spark.cql import CQLError
    from cassandra_spark.cql_session import CqlSession

    s = CqlSession(spark, None)
    s.execute(
        "CREATE TABLE bt (pk int, ck int, v int, w int, u int, "
        "PRIMARY KEY (pk, ck))"
    )
    s.execute("CREATE CUSTOM INDEX ON bt (v) USING 'StorageAttachedIndex'")
    s.execute(
        "CREATE CUSTOM INDEX ON bt (w) USING "
        "'org.apache.cassandra.index.sasi.SASIIndex'"
    )
    s.execute("INSERT INTO bt (pk, ck, v, w, u) VALUES (1, 5, 10, 20, 30)")
    s.execute("INSERT INTO bt (pk, ck, v, w, u) VALUES (1, 9, 11, 21, 31)")
    # clustering BETWEEN under the pk: inclusive both ends
    got = s.execute(
        "SELECT ck FROM bt WHERE pk = 1 AND ck BETWEEN 5 AND 9"
    ).collect()
    assert sorted(r.ck for r in got) == [5, 9]
    # SAI and SASI serve ranges
    assert s.execute(
        "SELECT ck FROM bt WHERE v BETWEEN 10 AND 10"
    ).count() == 1
    assert s.execute(
        "SELECT ck FROM bt WHERE w BETWEEN 20 AND 21"
    ).count() == 2
    # unindexed column: gated
    with pytest.raises(CQLError, match="ALLOW FILTERING"):
        s.execute("SELECT ck FROM bt WHERE u BETWEEN 0 AND 99")
    # a column that does not exist at all is rejected as an invalid
    # statement (unresolved reference) — a DIFFERENT error class than
    # the filtering gate, so negative gate probes must restrict a real
    # column (the cql52 probe regression: o_shippriority is not in the
    # synthetic orders schema)
    with pytest.raises(CQLError, match="invalid statement"):
        s.execute("SELECT ck FROM bt WHERE nope BETWEEN 0 AND 1")
    assert s.execute(
        "SELECT ck FROM bt WHERE u BETWEEN 0 AND 99 ALLOW FILTERING"
    ).count() == 2


def test_partition_key_range_gate(spark):
    """The reference admits only EQ/IN on partition-key components:
    a pk range needs token() or ALLOW FILTERING."""
    import pytest

    from cassandra_spark.cql import CQLError, cql_select
    from tests.conftest import SF_SMOKE

    with pytest.raises(CQLError, match="EQ and IN"):
        cql_select(spark, SF_SMOKE, "SELECT event_id FROM events "
                                    "WHERE user_id < 5")
    # all three escape hatches still run it
    n = cql_select(
        spark, SF_SMOKE,
        "SELECT event_id FROM events WHERE user_id < 5 ALLOW FILTERING",
    ).count()
    assert n > 0
    assert cql_select(
        spark, SF_SMOKE,
        "SELECT event_id FROM events WHERE user_id IN (1, 2)",
    ).count() > 0
    assert cql_select(
        spark, SF_SMOKE,
        "SELECT event_id FROM events WHERE token(user_id) > 0",
    ).count() > 0


def test_between_uses_sai_range_probe(spark, tmp_path):
    """BETWEEN conjuncts feed the SAI per-segment [min, max] range
    probe: out-of-interval segments stat-skip, results stay exact."""
    from cassandra_spark.cql_session import CqlSession

    s = CqlSession(spark, None, spill_dir=str(tmp_path), spill_threshold=4)
    s.execute("CREATE TABLE br (k int PRIMARY KEY, v bigint)")
    s.execute("CREATE CUSTOM INDEX ON br (v) USING 'StorageAttachedIndex'")
    for i in range(12):
        s.execute(f"INSERT INTO br (k, v) VALUES ({i}, {i * 100})")
    tbl = s.table("br")
    assert len(tbl._segments) >= 2
    tbl.index_stats.update(checked=0, range_skipped=0)
    got = {r.k for r in s.execute(
        "SELECT k FROM br WHERE v BETWEEN 250 AND 410"
    ).collect()}
    assert got == {3, 4}
    assert tbl.index_stats["range_skipped"] > 0, (
        "segments outside [250, 410] must be stat-skipped"
    )
