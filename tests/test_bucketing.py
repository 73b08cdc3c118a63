"""Bucketed co-located join: the plan must consume bucket metadata —
no Exchange on either side of the fact⋈fact join (SURVEY.md §4.1)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from cassandra_spark.operators.bucketing import (
    bucketed_join,
    cobucket_fact_tables,
)
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    cobucket_fact_tables(spark, SF_SMOKE, str(tmp_path), buckets=8)
    # force the merge-join path: broadcast would mask the bucket layout
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark)
        plan = _plan(df)
        assert "SortMergeJoin" in plan, plan
        # co-located: bucket layout replaces BOTH shuffles
        assert "Exchange" not in plan, plan
        # sorted buckets: no per-task sort either
        assert "+- Sort" not in plan.split("SortMergeJoin")[0], plan
        # and the join result is right (row count = lineitem rows, since
        # every lineitem has its order)
        from cassandra_spark.catalog import Catalog

        n_li = Catalog(spark, SF_SMOKE).lineitem.count()
        assert df.count() == n_li
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_agg_skips_shuffle(spark, tmp_path):
    """A groupBy on the bucket key also reuses the layout: the partial
    aggregate feeds the final aggregate with no hash exchange."""
    cobucket_fact_tables(spark, SF_SMOKE, str(tmp_path), buckets=8)
    try:
        df = (
            spark.table("lineitem_b")
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "Exchange" not in _plan(df)
    finally:
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")


def test_x17_bucketed_plan_and_parity(spark):
    """Q18 over the bucketed layout: no hash exchange on the FACT key
    (the layout replaces both the l_orderkey aggregate shuffle and the
    o_orderkey join shuffle), same rows as the unbucketed query. The
    customer dim leg may exchange here because this test force-disables
    broadcast to expose the bucketing — in real plans AQE broadcasts it
    (round 8 dropped the explicit customer hint: fact-growth tables are
    never broadcast-hinted)."""
    from cassandra_spark.operators.bucketing import x17_large_orders_bucketed
    from cassandra_spark.operators.tpch import x17_large_orders

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = x17_large_orders_bucketed(spark, SF_SMOKE)
        plan = _plan(df)
        assert "SortMergeJoin" in plan, plan
        import re

        fact_exchanges = [
            m.group(0)
            for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan)
            if "orderkey" in m.group(1)
        ]
        assert not fact_exchanges, plan
        assert df.collect() == x17_large_orders(spark, SF_SMOKE).collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_x23_bucketed_plan_and_parity(spark):
    """Q21 over the bucketed layout: no exchange on the FACT join key
    (l_orderkey) — all three lineitem branches and both orders probes
    are co-located. With auto-broadcast disabled to expose the layout,
    the hash exchanges left are the tiny final s_name aggregate and the
    supplier join's suppkey legs (supplier carries no broadcast hint
    since round 9 — at bench scale AQE broadcasts it and those legs
    vanish; the bucketing claim is strictly about l_orderkey)."""
    import re

    from cassandra_spark.operators.bucketing import (
        x23_waiting_suppliers_bucketed,
    )
    from cassandra_spark.operators.tpch import x23_waiting_suppliers

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = x23_waiting_suppliers_bucketed(spark, SF_SMOKE)
        plan = _plan(df)
        parts = re.findall(r"hashpartitioning\(([^),]+)", plan)
        assert parts and not any("orderkey" in p for p in parts), plan
        assert any("s_name" in p for p in parts), plan
        assert df.collect() == x23_waiting_suppliers(spark, SF_SMOKE).collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_reregister_persisted_layout_without_rewrite(spark):
    """A fresh session forgets catalog entries but the bucket-suffixed
    parquet persists: ensure_bucketed_layout must re-ATTACH the existing
    files (external CREATE TABLE with the bucket spec) instead of
    rewriting the facts, and the re-registered tables must still elide
    the fact-key exchanges."""
    import os

    from cassandra_spark.operators.bucketing import ensure_bucketed_layout
    from cassandra_spark.operators.tpch import x17_core
    from cassandra_spark.catalog import Catalog

    li, o = ensure_bucketed_layout(spark, SF_SMOKE)  # build or reattach
    wh = spark.conf.get("spark.sql.warehouse.dir")
    if wh.startswith("file:"):
        wh = wh[5:]
    # the layout tag (corpus dir + bucket count) is part of the table
    # name — derive the path from it rather than re-computing the tag
    tag = li[len("lineitem_bkt_"):]
    li_path = f"{wh}/bucketed/{tag}/lineitem"
    mtimes = {
        f: os.path.getmtime(os.path.join(li_path, f))
        for f in os.listdir(li_path)
    }

    # simulate a fresh session: external DROP TABLE keeps the data
    spark.sql(f"DROP TABLE {li}")
    spark.sql(f"DROP TABLE {o}")
    li2, o2 = ensure_bucketed_layout(spark, SF_SMOKE)
    assert (li2, o2) == (li, o)
    after = {
        f: os.path.getmtime(os.path.join(li_path, f))
        for f in os.listdir(li_path)
    }
    assert after == mtimes, "re-registration must not rewrite the layout"

    # the re-attached tables still produce the exchange-free agg+join plan
    df = x17_core(
        spark.table(li2), spark.table(o2), Catalog(spark, SF_SMOKE).customer
    )
    plan = _plan(df)
    assert "hashpartitioning" not in plan, plan
    assert df.count() > 0


def test_reattach_rejects_mismatched_layout(spark, tmp_path):
    """_SUCCESS alone must not be trusted: a directory whose persisted
    bucket spec disagrees with the requested (key, buckets) — or that has
    no spec / no bucket-suffixed files at all — is NOT re-registered (a
    CLUSTERED BY entry over it would make exchange-elided joins silently
    wrong). The caller falls back to a rewrite."""
    import json
    import os

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.bucketing import (
        _SPEC_FILE,
        _register_existing_bucketed,
        write_bucketed,
    )

    path = str(tmp_path / "li4")
    write_bucketed(
        Catalog(spark, SF_SMOKE).lineitem, "li_spec_t", path, "l_orderkey", 4
    )
    spark.sql("DROP TABLE li_spec_t")

    # matching spec re-attaches
    assert _register_existing_bucketed(spark, "li_spec_t", path, "l_orderkey", 4)
    spark.sql("DROP TABLE li_spec_t")
    # wrong bucket count / wrong key → refused
    assert not _register_existing_bucketed(
        spark, "li_spec_t", path, "l_orderkey", 8
    )
    assert not _register_existing_bucketed(
        spark, "li_spec_t", path, "l_partkey", 4
    )
    # spec sidecar missing (foreign write that left _SUCCESS) → refused
    os.remove(os.path.join(path, _SPEC_FILE))
    assert not _register_existing_bucketed(
        spark, "li_spec_t", path, "l_orderkey", 4
    )
    # spec present but a non-bucketed data file slipped in → refused
    with open(os.path.join(path, _SPEC_FILE), "w") as f:
        json.dump({"key": "l_orderkey", "buckets": 4, "sorted": True}, f)
    with open(os.path.join(path, "part-00000-foreign.parquet"), "wb") as f:
        f.write(b"PAR1")
    assert not _register_existing_bucketed(
        spark, "li_spec_t", path, "l_orderkey", 4
    )
    assert not spark.catalog.tableExists("li_spec_t")
