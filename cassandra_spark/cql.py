"""CQL SELECT front-end: the reference's user-facing query surface compiled
onto DataFrame plans (SURVEY.md §3.1 entry point 1 → §3.2).

A user of the reference writes CQL; this module accepts the CQL SELECT
subset that Cassandra itself accepts (`[C* cql3/statements/SelectStatement,
cql3/restrictions/StatementRestrictions]`, unverified — SURVEY.md §0) and
enforces the same *restriction semantics* — which is the actually
Cassandra-shaped part:

- predicates on non-key columns are REJECTED without ``ALLOW FILTERING``
  (the engine-side guardrail that stops accidental full scans);
- ``ORDER BY`` is only legal on clustering columns of the table;
- ``PER PARTITION LIMIT k`` compiles to a rank-filter window over the
  declared partition key;
- ``CONTAINS`` rewrites to ``array_contains``.

Everything else — comparison/IN/AND expression parsing, constant folding,
predicate pushdown — is delegated to Catalyst by feeding the (rewritten)
WHERE text through ``F.expr``: Spark SQL syntax coincides with CQL on this
subset, and re-implementing an expression parser would be the porting
mistake this repo exists to avoid.

Deliberately NOT accepted (reference scope, SURVEY.md §7 "do not build"):
consistency levels, USING TIMESTAMP/TTL on writes, Paxos/LWT. Analytic SQL
beyond the CQL subset (joins, windows, set ops) should use Spark SQL
directly — that is the extension surface, not an error.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog

AGG_FNS = ("count", "min", "max", "sum", "avg")


class CQLError(ValueError):
    """Invalid statement — message shapes mirror the reference's."""


@dataclass
class _Stmt:
    projection: str
    table: str
    where: str | None
    order_by: list[tuple[str, bool]]  # (col, desc)
    per_partition_limit: int | None
    limit: int | None
    allow_filtering: bool


_SELECT_RE = re.compile(
    r"""^\s*SELECT\s+(?P<proj>.+?)
        \s+FROM\s+(?P<table>\w+)
        (?:\s+WHERE\s+(?P<where>.+?))?
        (?:\s+ORDER\s+BY\s+(?P<order>.+?))?
        (?:\s+PER\s+PARTITION\s+LIMIT\s+(?P<pplimit>\d+))?
        (?:\s+LIMIT\s+(?P<limit>\d+))?
        (?:\s+(?P<allow>ALLOW\s+FILTERING))?
        \s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)


def _parse(stmt: str) -> _Stmt:
    m = _SELECT_RE.match(stmt)
    if not m:
        raise CQLError(f"unsupported or malformed CQL SELECT: {stmt!r}")
    order: list[tuple[str, bool]] = []
    if m.group("order"):
        for part in m.group("order").split(","):
            toks = part.split()
            if len(toks) not in (1, 2) or (
                len(toks) == 2 and toks[1].upper() not in ("ASC", "DESC")
            ):
                raise CQLError(f"bad ORDER BY clause: {part.strip()!r}")
            order.append((toks[0], len(toks) == 2 and toks[1].upper() == "DESC"))
    return _Stmt(
        projection=m.group("proj").strip(),
        table=m.group("table").lower(),
        where=m.group("where"),
        order_by=order,
        per_partition_limit=(
            int(m.group("pplimit")) if m.group("pplimit") else None
        ),
        limit=int(m.group("limit")) if m.group("limit") else None,
        allow_filtering=bool(m.group("allow")),
    )


_IDENT_RE = re.compile(r"\b([a-z_][a-z0-9_]*)\b", re.IGNORECASE)
_CQL_KEYWORDS = frozenset(
    "and or not in contains key true false null like token".split()
)


def _where_columns(where: str, columns: set[str]) -> set[str]:
    return {
        t.lower()
        for t in _IDENT_RE.findall(where)
        if t.lower() in columns and t.lower() not in _CQL_KEYWORDS
    }


def _rewrite_where(where: str) -> str:
    """CQL-only surface forms → Spark SQL equivalents."""
    # col CONTAINS KEY v  →  map_contains_key(col, v)
    where = re.sub(
        r"(\w+)\s+CONTAINS\s+KEY\s+('[^']*'|\S+)",
        r"map_contains_key(\1, \2)",
        where,
        flags=re.IGNORECASE,
    )
    # col CONTAINS v  →  array_contains(col, v)
    where = re.sub(
        r"(\w+)\s+CONTAINS\s+('[^']*'|\S+)",
        r"array_contains(\1, \2)",
        where,
        flags=re.IGNORECASE,
    )
    # token(pk) → xxhash64(pk): same semantics class (hash-order scan
    # bounds), different hash fn — documented in SURVEY.md §2.2 P5
    where = re.sub(r"\btoken\s*\(", "xxhash64(", where, flags=re.IGNORECASE)
    return where


def cql_select(spark: SparkSession, sf_dir: str, stmt: str) -> DataFrame:
    """Compile one CQL SELECT into a DataFrame plan."""
    s = _parse(stmt)
    cat = Catalog(spark, sf_dir)
    try:
        meta = cat.meta(s.table)
    except KeyError:
        raise CQLError(f"unconfigured table {s.table}") from None
    df = cat.table(s.table)
    columns = {c.lower() for c in df.columns}
    key_cols = set(meta.partition_key) | set(meta.clustering_cols)

    if s.where:
        restricted = _where_columns(s.where, columns)
        non_key = restricted - key_cols
        uses_token = re.search(r"\btoken\s*\(", s.where, re.IGNORECASE)
        if non_key and not s.allow_filtering and not uses_token:
            raise CQLError(
                "Cannot execute this query as it might involve data "
                f"filtering on {sorted(non_key)}; use ALLOW FILTERING to "
                "run it anyway"
            )
        df = df.filter(F.expr(_rewrite_where(s.where)))

    if s.order_by:
        bad = [c for c, _ in s.order_by if c.lower() not in meta.clustering_cols]
        if bad:
            raise CQLError(
                f"Order by is currently only supported on the clustered "
                f"columns of the PRIMARY KEY, got {bad}"
            )
        df = df.orderBy(
            *[F.col(c).desc() if desc else F.col(c).asc() for c, desc in s.order_by]
        )

    if s.per_partition_limit is not None:
        if not meta.partition_key:
            raise CQLError(f"table {s.table} declares no partition key")
        order = [
            F.col(c.lstrip("-")).desc() if c.startswith("-") else F.col(c).asc()
            for c in meta.clustering
        ] or [F.lit(1)]
        w = Window.partitionBy(*meta.partition_key).orderBy(*order)
        df = (
            df.withColumn("__ppl_rn", F.row_number().over(w))
            .filter(F.col("__ppl_rn") <= s.per_partition_limit)
            .drop("__ppl_rn")
        )

    proj = s.projection.strip()
    if proj != "*":
        df = df.selectExpr(*[p.strip() for p in proj.split(",")])

    if s.limit is not None:
        df = df.limit(s.limit)
    return df
