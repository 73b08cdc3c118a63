"""Query registry: the single source of truth behind __spark_entry__.

Each operator module registers its queries with the @query decorator; the
driver-facing ``queries()`` / ``oracle_sql()`` dicts are assembled from here.
A registered query is a constructor ``(spark, sf_dir) -> DataFrame`` — purely
declarative; no collect(), no caching, no side effects (SURVEY.md §3.2).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query constructor; ``oracle`` is the DuckDB-equivalent ANSI
    SQL (omit only for genuinely non-SQL-expressible ops — the driver then
    records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (side effect: decorator registration)."""
    from cassandra_spark.operators import (  # noqa: F401
        aggregates,
        counter_replay,
        cql_queries,
        dml_replay,
        lwt_replay,
        mv_incremental,
        flagship,
        functions,
        joins,
        llm_dedup,
        llm_multimodal,
        llm_pipeline,
        llm_text,
        llm_vectors,
        read_path,
        setops,
        streaming_batch,
        subqueries,
        tpch,
        tpch2,
        udfs,
        windows,
        write_semantics,
    )
