"""CQL dynamic-data-masking and math function families.

Cassandra 5.0 ships a native masking function family
(`[C* cql3/functions/masking/MaskingFcts, PartialMaskingFunction,
HashMaskingFunction, unverified]` — public docs: "Dynamic Data Masking"):

- ``mask_null(v)``           -> always NULL
- ``mask_default(v)``        -> the type's fixed default ('****' for text,
                                0 for numbers, false for booleans, ...)
- ``mask_replace(v, r)``     -> the literal replacement ``r``
- ``mask_inner(v, b, e[,p])``-> keeps the first ``b`` and last ``e`` chars,
                                masks the middle with padding ``p`` ('*');
                                values of length <= b+e are returned intact
- ``mask_outer(v, b, e[,p])``-> masks the first ``b`` and last ``e`` chars,
                                keeps the middle; length <= b+e masks all
- ``mask_hash(v[, alg])``    -> digest of the value (default SHA-256)

Cassandra 4.1 added the math function family
(`[C* cql3/functions/MathFcts, unverified]`): abs, exp, log (natural),
log10, round.

Spark-first shape: every mask is a composition of JVM built-ins
(substring/length/repeat/concat/sha2) — whole-stage codegen, no UDFs, no
shuffle beyond the scan. The oracle mirrors each expression in DuckDB SQL;
the driver's value-hash compare is the cross-engine semantics proof.

Scale note: masks are per-row projections with no state — they pipeline
inside the scan stage at any corpus size and cost one codegen pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query


# ---------------------------------------------------------------------------
# Column-level masking primitives (importable engine surface)
# ---------------------------------------------------------------------------


def mask_null(col: Column) -> Column:
    """``mask_null``: the column's value replaced by NULL (typed)."""
    return F.when(F.lit(False), col)


_TEXT_DEFAULT = "****"


def mask_default(col: Column, cql_type: str = "text") -> Column:
    """``mask_default``: the type's fixed masking default."""
    t = cql_type.lower()
    if t in ("text", "varchar", "ascii"):
        return F.lit(_TEXT_DEFAULT)
    if t in ("int", "bigint", "smallint", "tinyint", "varint", "counter"):
        return F.lit(0).cast("long")
    if t in ("float", "double", "decimal"):
        return F.lit(0.0)
    if t == "boolean":
        return F.lit(False)
    raise ValueError(f"no masking default for CQL type {cql_type!r}")


def mask_replace(col: Column, replacement: Column) -> Column:
    """``mask_replace``: the literal replacement value."""
    return replacement


def mask_inner_sql(col: str, begin: int, end: int, padding: str = "*") -> str:
    """Spark-SQL/DuckDB-shared expression for ``mask_inner`` (both engines
    parse this exact text, which is what makes the oracle a true mirror)."""
    return (
        f"CASE WHEN length({col}) <= {begin + end} THEN {col} "
        f"ELSE substring({col}, 1, {begin}) "
        f"|| repeat('{padding}', CAST(length({col}) - {begin + end} AS INT)) "
        f"|| substring({col}, length({col}) - {end} + 1, {end}) END"
    )


def mask_outer_sql(col: str, begin: int, end: int, padding: str = "*") -> str:
    """Shared expression for ``mask_outer``: mask the first ``begin`` and
    last ``end`` characters, keep the middle; short values mask entirely."""
    return (
        f"CASE WHEN length({col}) <= {begin + end} "
        f"THEN repeat('{padding}', CAST(length({col}) AS INT)) "
        f"ELSE repeat('{padding}', {begin}) "
        f"|| substring({col}, {begin + 1}, length({col}) - {begin + end}) "
        f"|| repeat('{padding}', {end}) END"
    )


def mask_hash(col: Column, algorithm: str = "SHA-256") -> Column:
    """``mask_hash``: hex digest of the value (default SHA-256, as the
    reference's HashMaskingFunction defaults)."""
    bits = {"SHA-256": 256, "SHA-512": 512, "SHA-384": 384, "SHA-224": 224}
    if algorithm not in bits:
        raise ValueError(f"unsupported mask_hash algorithm {algorithm!r}")
    return F.sha2(col.cast("string"), bits[algorithm])


# The CQL front-end's textual expansion of mask_* selectors lives in ONE
# place — cql.py::_rewrite_masks (which builds on the *_sql helpers above).


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@query(
    "cql18_masking",
    oracle=f"""
    SELECT c_custkey,
           CASE WHEN FALSE THEN c_name END AS name_null,
           '****' AS name_default,
           'redacted' AS name_replace,
           {mask_inner_sql("c_name", 4, 2)} AS name_inner,
           {mask_outer_sql("c_name", 4, 2)} AS name_outer,
           {mask_inner_sql("c_mktsegment", 1, 1, "#")} AS seg_inner,
           sha256(c_name) AS name_hash
    FROM customer WHERE c_custkey % 100 = 7
    """,
)
def cql18_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cassandra 5.0 dynamic-data-masking function family over customer
    names (`[C* cql3/functions/masking/*, unverified]`). Every mask is a
    single-pass codegen projection; the DuckDB oracle re-derives the same
    text algebra independently (sha256 vs Spark sha2 proves the digest)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.filter(F.col("c_custkey") % 100 == 7)
        .select(
            "c_custkey",
            mask_null(F.col("c_name")).alias("name_null"),
            mask_default(F.col("c_name")).alias("name_default"),
            mask_replace(F.col("c_name"), F.lit("redacted")).alias(
                "name_replace"
            ),
            F.expr(mask_inner_sql("c_name", 4, 2)).alias("name_inner"),
            F.expr(mask_outer_sql("c_name", 4, 2)).alias("name_outer"),
            F.expr(mask_inner_sql("c_mktsegment", 1, 1, "#")).alias(
                "seg_inner"
            ),
            mask_hash(F.col("c_name")).alias("name_hash"),
        )
    )


@query(
    "f8_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_delta,
           round(l_extendedprice) AS price_round,
           round(l_extendedprice, 1) AS price_round1,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           round(exp(CAST(l_linenumber AS DOUBLE)), 9) AS exp_ln_no,
           round(ln(CAST(l_quantity AS DOUBLE)), 9) AS log_qty,
           round(log10(CAST(l_quantity AS DOUBLE)), 9) AS log10_qty
    FROM lineitem WHERE l_orderkey % 500 = 11
    """,
)
def f8_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL 4.1 math function family — abs/exp/log/log10/round
    (`[C* cql3/functions/MathFcts, unverified]`) as native JVM expressions.

    Cross-engine determinism note: JVM Math and C libm differ in the last
    ulp even on exp(1.0) (measured: ...4590455 vs ...459045), so the
    transcendental outputs are pinned at 9 decimal places on BOTH sides and
    evaluated over small integer domains (l_linenumber 1..7, l_quantity
    1..50); tests/test_masking_math.py verifies the rounded values agree on
    the whole domain, which makes the oracle deterministic across runs."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(F.col("l_orderkey") % 500 == 11)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_delta"),
        F.round("l_extendedprice").alias("price_round"),
        F.round("l_extendedprice", 1).alias("price_round1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.exp(F.col("l_linenumber").cast("double")), 9).alias(
            "exp_ln_no"
        ),
        F.round(F.log(F.col("l_quantity").cast("double")), 9).alias("log_qty"),
        F.round(F.log10(F.col("l_quantity").cast("double")), 9).alias(
            "log10_qty"
        ),
    )


@query(
    "f9_maxwritetime",
    oracle="""
    SELECT user_id,
           max(epoch_us(ts)) AS max_writetime,
           min(epoch_us(ts)) AS min_writetime,
           count(*) AS n_cells
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def f9_maxwritetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cassandra 4.1 ``maxwritetime()`` (`[C* cql3/selection/
    MaxWritetimeFunction, unverified]`): the newest cell timestamp of a
    multi-cell column. Modeled per FIXTURES.md — each user's event set is
    the multi-cell value; maxwritetime is a map-side-combinable max over
    the synthesized __writetime shadow column (one shuffle, partial aggs)."""
    from cassandra_spark.operators.functions import with_cell_metadata

    cat = Catalog(spark, sf_dir)
    ev = with_cell_metadata(cat.events)
    return (
        ev.groupBy("user_id")
        .agg(
            F.max("__writetime_value").alias("max_writetime"),
            F.min("__writetime_value").alias("min_writetime"),
            F.count(F.lit(1)).alias("n_cells"),
        )
        .orderBy("user_id")
    )
