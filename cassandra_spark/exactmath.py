"""Cross-engine numeric determinism helpers.

The correctness oracle hashes values, so Spark and DuckDB must produce
bit-identical numbers. Double summation is order-dependent (Spark sums in
partition order, DuckDB sequentially), so every tested aggregate over doubles
routes through exact decimal arithmetic and converts to double only at the
end — both engines then hold the *same exact rational* and cast it to the
*same* IEEE double (SURVEY.md §7 "hard parts").

The matching oracle-SQL idioms (DuckDB side) are the ``sql_*`` helpers.
Precisions are sized for the fixtures: prices < 1e6 with ≤4 decimals,
discounts/taxes in [0,1) with ≤2 decimals; sums over ≤1e8 rows fit easily in
DECIMAL(38, s).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"  # canonical exact carrier for the double fixture columns


def dec(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dsum(c: Column | str, alias: str) -> Column:
    """Exact sum of a double column, surfaced as double."""
    return F.sum(dec(c)).cast("double").alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Order-independent average: exact decimal sum, double division by count.

    double(exact_sum) / count is a single IEEE division — identical on both
    engines, unlike built-in avg() which accumulates in doubles.
    """
    c = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def sql_double(expr: str) -> str:
    """DuckDB decimal→double, correctly rounded.

    DuckDB 1.0's direct CAST(DECIMAL AS DOUBLE) is off by one ulp once the
    scaled integer exceeds 2^53 (observed: 26916676217.06 → ...059998);
    routing through VARCHAR hits strtod, which rounds correctly and matches
    Spark's BigDecimal.doubleValue()."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, alias: str) -> str:
    return sql_double(f"SUM(CAST({expr} AS DECIMAL(18,4)))") + f" AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        sql_double(f"SUM(CAST({expr} AS DECIMAL(18,4)))")
        + f" / COUNT({expr}) AS {alias}"
    )


def revenue_col(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """Exact l_extendedprice * (1 - l_discount) as decimal."""
    one = F.lit(1).cast(DEC)
    return dec(price) * (one - dec(disc))


SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)
