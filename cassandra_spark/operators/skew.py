"""Skew mitigation: salting for hot keys (SURVEY.md §4.2 / the 100 TB
posture notes).

Cassandra pushes hot-partition pain onto the data modeler ("add a bucket
column to your partition key" is the canonical advice for wide/hot
partitions). At 100 TB the same medicine applies to shuffles: a single hot
key serializes one reducer. Two standard cures, both deterministic:

- **salted aggregation**: pre-aggregate on (key, salt) — spreading the hot
  key over n reducers — then finish on key. Associative aggregates only;
  exact same result, two small shuffles instead of one skewed one.
- **salted join**: give each fact row a salt derived from its own row id,
  replicate the (small) dim side across all n salts, join on (key, salt).
  Replication factor n on the dim side buys n-way spread of the hot key.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on in
session.py) handles sort-merge cases automatically at runtime; these
builders are for when the operator is an aggregation, or when the skew is
known ahead of time and the plan should never create the hot reducer in
the first place.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def _salt_of(row_discriminator: Column, n_salts: int) -> Column:
    return F.pmod(F.hash(row_discriminator), F.lit(n_salts))


def salted_agg_sum(
    df: DataFrame,
    keys: list[str],
    value: str,
    discriminator: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """SUM(value) GROUP BY keys, hot-key safe: partial-agg on
    (keys, salt), final-agg on keys. The salt derives from a per-row
    discriminator column (any high-cardinality column), so the plan is
    deterministic — no rand() (SURVEY.md §4.3 determinism rule)."""
    salted = df.withColumn(
        "__salt", _salt_of(F.col(discriminator), n_salts)
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value).alias("__psum"), F.count(F.lit(1)).alias("__pn")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias(f"sum_{value}"),
        F.sum("__pn").cast("bigint").alias("n_rows"),
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    discriminator: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """facts ⋈ dim on key, hot-key safe: facts get a derived salt, dim is
    exploded ×n_salts, the join runs on (key, salt). Equivalent to the
    plain inner join for any n_salts ≥ 1 (each fact row meets exactly one
    replica of its dim row). Use when the dim side is broadcastable-small
    after replication, or when one fact key dominates a shuffle."""
    salted_facts = facts.withColumn(
        "__salt", _salt_of(F.col(discriminator), n_salts)
    )
    replicated_dim = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return salted_facts.join(replicated_dim, [key, "__salt"]).drop("__salt")
