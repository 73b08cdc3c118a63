"""Registry-wide physical-plan hygiene sweep (round 8).

Every registered query's plan is built at sf0.001 and screened for the
three classic scale-killers:

- ``CartesianProduct``: banned outright — an unkeyed fact join never
  survives 100x.
- ``BatchEvalPython``: banned outright — a row-at-a-time Python UDF on
  any path (Arrow-batched ``ArrowEvalPython``/pandas_udf is the allowed
  form).
- ``BroadcastNestedLoopJoin``: allowed ONLY on the allowlist below —
  each entry is a deliberate crossJoin of a BOUNDED side (a 1-row global
  aggregate, an O(K) centroid/model/codebook table, or a fixed query-
  vector set), annotated at its source site. A new query landing here
  must either justify itself (add to the list, with the bound) or fix
  its join.

This is the mechanical form of the per-round plan audit: plan-shape
regressions fail CI instead of waiting for a bench diff.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from cassandra_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()

# query -> why its BNLJ side is bounded (kept in sync with the in-source
# "bounded side" comments at each crossJoin call site)
BNLJ_ALLOWED = {
    "a10_hll_distinct": "1-row HLL register aggregate",
    "a12_kmv_overlap": "1-row KMV synopsis per side",
    "a13_hll_partials": "1-row merged-register aggregate",
    "a14_histogram_quantiles": "1-row bin-edge aggregate",
    "l18_kmeans": "O(K) centroid table",
    "l23b_bpe_encode": "O(merges) BPE model table",
    "l24_linreg_gd": "O(features) weight vector",
    "l26_pq_ann": "O(M*K) codebook + fixed query set",
    "l28_epoch_shuffle": "1-row corpus-count aggregate",
    "l29_temperature_mix": "1-row min-source-count aggregate",
    "l2d_embedding_neardup": "O(planes) projection constants (diagnostic)",
    "l2d_embedding_neardup_lsh": "O(planes) constants (diagnostic)",
    "l30_sq8_ann": "fixed 5-query vector set",
    "l32_dedup_triangles": "1-row edge-count aggregate",
    "l35_ivf_index_query": "O(K) centroid table + fixed query set",
    "l36_pq_index_query": "O(M*K) codebook + fixed query set",
    "l41_ivf_index_append": "O(K) centroid table + fixed query set",
    "l42_pq_index_append": "O(M*K) codebook + fixed query set",
    "l44_ivf_index_compact": "O(K) centroid table + fixed query set",
    "l45_pq_index_compact": "O(M*K) codebook + fixed query set",
    "l3_cosine_topk": "fixed query-vector set",
    "l3b_lsh_ann": "fixed query-vector set",
    "l3c_ivf_ann": "O(K) centroids + fixed query set",
    "x19_rich_no_big_order": "1-row scalar threshold",
    "x35_important_stock": "1-row global-total aggregate",
    "x43_event_pagerank": "1-row dangling-mass aggregate per iteration",
}


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_plan_hygiene(spark, name):
    df = registry.QUERIES[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    registry.release_caches(spark)
    assert "CartesianProduct" not in plan, (
        f"{name}: unkeyed cartesian join — find a blocking key"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF — use an Arrow-batched "
        "pandas_udf"
    )
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_ALLOWED, (
            f"{name}: BroadcastNestedLoopJoin on an unvetted side — "
            "justify the bound in BNLJ_ALLOWED or key the join"
        )
