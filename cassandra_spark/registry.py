"""Query registry: the single source of truth behind __spark_entry__.

Each operator module registers its queries with the @query decorator; the
driver-facing ``queries()`` / ``oracle_sql()`` dicts are assembled from here.
A registered query is a constructor ``(spark, sf_dir) -> DataFrame`` — purely
declarative; no collect(), no side effects (SURVEY.md §3.2). A handful of
constructors persist() an intermediate as a deliberate optimizer barrier
(measured 10-30× plan-blowup fix — see llm_dedup.word_hash_table); those
blocks are released by ``release_caches()`` below, which callers driving a
full sweep (bench.py, tools/check_oracle.py) invoke between queries.

DIAGNOSTIC entries — currently ``l2c_ngram_jaccard``,
``l2d_embedding_neardup``, ``l2d_embedding_neardup_lsh`` — are
deliberately-naive baselines kept ONLY for recall/quality comparison
against their production siblings (``l2_minhash_prod``,
``l2d_embedding_neardup_prod``). They are correct and oracle-checked, but
they are NOT scale paths and MUST NOT enter timing sweeps or 100 TB
sizing claims: anything that benches from this registry must exclude
``DIAGNOSTIC`` (bench.py does; a driver that ignores it is measuring the
strawman, not the engine).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}
# Queries registered as deliberately-naive diagnostic baselines: correct and
# oracle-checked, but NOT the scale path (a bucketed sibling is). Kept for
# recall/quality comparison; excluded from any 100 TB sizing claims.
DIAGNOSTIC: set[str] = set()


def query(
    name: str, oracle: Optional[str] = None, diagnostic: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Register a query constructor; ``oracle`` is the DuckDB-equivalent ANSI
    SQL (omit only for genuinely non-SQL-expressible ops — the driver then
    records a weaker rows-only check). ``diagnostic=True`` marks a
    deliberately-naive baseline whose scale path is a bucketed sibling."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        if diagnostic:
            DIAGNOSTIC.add(name)
        return fn

    return deco


def release_caches(spark: SparkSession) -> None:
    """Drop every block persisted by query constructors (the optimizer
    barriers). Spark's CacheManager dedupes by canonicalized plan, so a
    sweep over all 100+ queries would otherwise pin tens of blocks for the
    session lifetime. Call between queries (cheap no-op when nothing is
    cached) or once after a sweep."""
    spark.catalog.clearCache()


def load_all() -> None:
    """Import every operator module (side effect: decorator registration)."""
    from cassandra_spark.operators import (  # noqa: F401
        aggregates,
        audio,
        bucketing,
        collection_replay,
        counter_replay,
        cql_queries,
        dml_replay,
        fql_replay,
        lwt_replay,
        mv_incremental,
        flagship,
        functions,
        joins,
        llm_bpe,
        llm_dedup,
        llm_multimodal,
        llm_pipeline,
        llm_text,
        llm_train,
        llm_vectors,
        masking,
        minhash_index,
        read_path,
        repair,
        ring,
        setops,
        sketches,
        streaming_batch,
        subqueries,
        thrift_compat,
        timeseries,
        typed_replay,
        vector_index,
        tpch,
        tpch2,
        tpch3,
        udfs,
        windows,
        write_semantics,
    )
