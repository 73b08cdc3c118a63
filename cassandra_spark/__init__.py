"""cassandra_spark — a PySpark-native analytics engine with the query and
data-processing capability envelope of the reference wide-column store
(SURVEY.md; the reference checkout is empty, so loci are cited as
`[C* path]` upstream-recall, unverified — SURVEY.md §0).

Architecture: a library of declarative DataFrame query constructors over a
thin parquet catalog. Parse/analyze/optimize/execute are all Catalyst's job;
the engine's value is the operator semantics (LWW merge, TTL, tombstones,
clustering reads) re-expressed as distributed-safe DataFrame algebra, plus
the LLM-pipeline tier (dedup, similarity, text analysis) that the 100 TB
use-case needs.
"""

from cassandra_spark.catalog import Catalog, load_table
from cassandra_spark.session import get_spark, tune_session

__all__ = ["Catalog", "load_table", "get_spark", "tune_session"]
