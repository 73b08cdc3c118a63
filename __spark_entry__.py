"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`cassandra_spark` — the engine proper. The driver's
verify runs ``entry(spark)`` as a smoke check, runs each ``queries()[name]``
at sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

NOTE for anyone TIMING these queries: entries named in
``cassandra_spark.registry.DIAGNOSTIC`` are deliberately-naive quality
baselines (correct, oracle-checked, not scale paths) — exclude them from
timing sweeps the way bench.py does.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable regardless of the driver's cwd/sys.path.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cassandra_spark import tune_session  # noqa: E402
from cassandra_spark import registry  # noqa: E402

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return registry.QUERIES["q_flagship_revenue_by_nation"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted keys → rows-only check."""
    return dict(registry.ORACLE)
