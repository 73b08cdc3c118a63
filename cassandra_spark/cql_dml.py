"""CQL DML front-end: INSERT / UPDATE / DELETE / BATCH compiled onto the
W-tier mutation model (SURVEY.md §2.9), completing the reference's
user-facing surface beyond SELECT (cql.py).

The reference's write path is upsert-only: every statement becomes
cell-level mutations (`[C* cql3/statements/ModificationStatement,
db/Mutation, db/partitions/PartitionUpdate]`, unverified — SURVEY.md §0),
and reads see the LWW reconcile of everything written. This module keeps
exactly that shape:

- a statement parses into **cell mutations** (value cells, a row marker
  for INSERT, cell/row/partition tombstones for DELETE);
- the table's visible state (``snapshot``) is a pure DataFrame reduction:
  per-cell LWW (compaction.lww_merge order: writetime desc, tombstone
  beats write on ties, then arrival seq), shadowed by the newest
  applicable row/partition tombstone, TTL-expired cells dropped at the
  caller's ``asof`` — the same W2/W3/W4/W5 semantics the batch operators
  implement, driven from real CQL text.

Fidelity points (each tested):
- INSERT writes a row *marker*, UPDATE does not — an UPDATE-only row
  disappears once its cells are deleted or expire, an INSERTed row
  survives with all-null regulars (the reference's visibility quirk);
- ``USING TIMESTAMP`` makes writes commute: a later-arriving statement
  with an older timestamp loses;
- ``USING TTL`` expires cells, not rows;
- at equal timestamp a delete beats a write; statement arrival order
  breaks write/write ties.

Scale posture: statements accumulate in a driver-side log because DML
*arrives* row-at-a-time; the log becomes a DataFrame and every snapshot
reduction is distributed (one shuffle on the partition key). At 100 TB the
log is a stream — streaming/jobs.streaming_upsert is the continuous form
of the same reconcile — and snapshots are the compaction.compact output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_spark.cql import CQLError

# mutation kinds, in tie-break precedence nowhere — precedence is encoded
# per-rule below (tombstones beat cells at equal writetime)
CELL, MARKER, CELL_TOMB, ROW_TOMB, PART_TOMB, INCR = (
    "cell",
    "marker",
    "cell_tomb",
    "row_tomb",
    "part_tomb",
    "incr",
)

_MUT_SCHEMA = (
    "pk string, ck string, col string, val string, kind string, "
    "writetime long, ttl long, seq long"
)


@dataclass
class TableSchema:
    """Declared table shape: key columns are strings here for simplicity of
    the mutation log; regular columns carry a Spark cast type.

    ``counter=True`` declares a counter table (the reference's counter-only
    table rule `[C* db/counters/CounterContext, cql3 counter validation,
    unverified]`): every regular column is a bigint counter, INSERT is
    rejected, the only write is ``SET c = c ± n``, and USING TIMESTAMP/TTL
    are rejected on writes."""

    name: str
    partition_key: str
    clustering: str | None
    regular: dict[str, str]  # column -> spark type ("int", "string", ...)
    counter: bool = False

    @property
    def key_cols(self) -> list[str]:
        return [self.partition_key] + (
            [self.clustering] if self.clustering else []
        )


_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>\w+)\s*\((?P<cols>[^)]*)\)\s*"
    r"VALUES\s*\((?P<vals>.*)\)\s*(?:(?P<ine>IF\s+NOT\s+EXISTS)\s*)?"
    r"(?:USING\s+(?P<using>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<table>\w+)\s*(?:USING\s+(?P<using>.+?)\s+)?"
    r"SET\s+(?P<set>.+?)\s+WHERE\s+(?P<where>.+?)"
    r"(?:\s+IF\s+(?P<cond>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s*(?P<cols>[^;]*?)\s*FROM\s+(?P<table>\w+)\s*"
    r"(?:USING\s+TIMESTAMP\s+(?P<ts>\d+)\s+)?WHERE\s+(?P<where>.+?)"
    r"(?:\s+IF\s+(?P<cond>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COND_RE = re.compile(
    r"^(\w+)\s*(=|!=|<=|>=|<|>)\s*(.+)$", re.DOTALL
)
_BATCH_RE = re.compile(
    r"^\s*BEGIN\s+(?:UNLOGGED\s+|LOGGED\s+)?BATCH\s+(?P<body>.+?)\s*"
    r"APPLY\s+BATCH\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_using(using: str | None) -> tuple[int | None, int | None]:
    """USING TIMESTAMP n [AND TTL m] in either order → (ts, ttl)."""
    ts = ttl = None
    if not using:
        return ts, ttl
    for part in re.split(r"\s+AND\s+", using.strip(), flags=re.IGNORECASE):
        m = re.fullmatch(r"TIMESTAMP\s+(\d+)", part.strip(), re.IGNORECASE)
        if m:
            ts = int(m.group(1))
            continue
        m = re.fullmatch(r"TTL\s+(\d+)", part.strip(), re.IGNORECASE)
        if m:
            ttl = int(m.group(1))
            continue
        raise CQLError(f"bad USING clause: {part.strip()!r}")
    return ts, ttl


def _parse_literal(tok: str) -> str | None:
    """CQL literal → canonical string form (cast to the column type at
    snapshot time). Strings unquote with '' escaping; NULL → None."""
    tok = tok.strip()
    if re.fullmatch(r"NULL", tok, re.IGNORECASE):
        return None
    m = re.fullmatch(r"'(.*)'", tok, re.DOTALL)
    if m:
        return m.group(1).replace("''", "'")
    if re.fullmatch(r"-?\d+(\.\d+)?([eE][+-]?\d+)?", tok) or re.fullmatch(
        r"(?i)true|false", tok
    ):
        return tok.lower()
    raise CQLError(f"unsupported CQL literal: {tok!r}")


def _split_csv(text: str) -> list[str]:
    """Split on commas not inside single quotes."""
    out, depth, cur = [], False, []
    for ch in text:
        if ch == "'":
            depth = not depth
        if ch == "," and not depth:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [t.strip() for t in out]


class CqlTable:
    """A mutable CQL table: DML statements append to a cell-mutation log;
    ``snapshot(asof_us)`` reconciles it into the visible rows."""

    def __init__(self, spark: SparkSession, schema: TableSchema):
        self.spark = spark
        self.schema = schema
        self._log: list[tuple] = []
        self._clock = 0  # logical µs clock for statements without USING TIMESTAMP
        self._seq = 0  # arrival order, the final tie-breaker

    # --- statement execution ---------------------------------------------

    def execute(self, stmt: str) -> bool | None:
        """Run one statement (or batch). Returns the LWT ``[applied]`` flag
        for conditional statements (IF NOT EXISTS / IF EXISTS / IF col op
        lit), None for unconditional ones. The clock ticks even when a
        condition fails — a rejected proposal still consumed a round."""
        batch = _BATCH_RE.match(stmt)
        if batch:
            # all statements in a batch share one default timestamp — the
            # reference applies the batch atomically at one write time
            self._clock += 1
            default_ts = self._clock
            matched = [
                self._match(sub)
                for sub in re.split(r";\s*", batch.group("body"))
                if sub.strip()
            ]
            conds = [self._cond_text(m) for _, m in matched]
            if any(c is not None for c in conds):
                # conditional batch: single-partition, all-or-nothing, every
                # condition reads the pre-batch state (the reference runs
                # the whole batch through one paxos round)
                if len({self._stmt_pk(h, m) for h, m in matched}) > 1:
                    raise CQLError(
                        "conditional batch must target a single partition"
                    )
                for (h, m), c in zip(matched, conds):
                    if c is not None:
                        self._lwt_guard(m)
                        if not self._eval_cond(c, *self._cond_key(h, m)):
                            return False
                for h, m in matched:
                    h(m, default_ts)
                return True
            for h, m in matched:
                h(m, default_ts)
            return None
        self._clock += 1
        handler, m = self._match(stmt)
        cond = self._cond_text(m)
        if cond is None:
            handler(m, self._clock)
            return None
        self._lwt_guard(m)
        if not self._eval_cond(cond, *self._cond_key(handler, m)):
            return False
        handler(m, self._clock)
        return True

    def _match(self, stmt: str):
        for regex, handler in (
            (_INSERT_RE, self._insert),
            (_UPDATE_RE, self._update),
            (_DELETE_RE, self._delete),
        ):
            m = regex.match(stmt)
            if m:
                return handler, m
        raise CQLError(f"unsupported or malformed CQL DML: {stmt!r}")

    # --- lightweight transactions (compare-and-set) -----------------------

    @staticmethod
    def _cond_text(m: re.Match) -> str | None:
        g = m.groupdict()
        if g.get("ine"):
            return "NOT EXISTS"
        return g.get("cond")

    def _lwt_guard(self, m: re.Match) -> None:
        """The reference rejects counter LWT and custom timestamps on
        conditional writes (paxos owns the write time)."""
        if self.schema.counter:
            raise CQLError(
                "conditional updates are not supported on counter tables"
            )
        g = m.groupdict()
        if g.get("using") and _parse_using(g["using"])[0] is not None:
            raise CQLError(
                "custom timestamps are not allowed with conditional updates"
            )
        if g.get("ts"):
            raise CQLError(
                "custom timestamps are not allowed with conditional updates"
            )

    def _insert_pairs(self, m: re.Match) -> dict[str, str | None]:
        cols = [c.strip().lower() for c in m.group("cols").split(",")]
        vals = [_parse_literal(v) for v in _split_csv(m.group("vals"))]
        if len(cols) != len(vals):
            raise CQLError("INSERT column/value count mismatch")
        return dict(zip(cols, vals))

    def _stmt_pairs(self, m: re.Match) -> dict[str, str | None]:
        # an INSERT match is the one with a "vals" group (bound methods
        # can't be identity-compared — each attribute access rebinds)
        if "vals" in m.re.groupindex:
            return self._insert_pairs(m)
        return self._where_pairs(m.group("where"))

    def _stmt_pk(self, handler, m: re.Match) -> str | None:
        pairs = self._stmt_pairs(m)
        if self.schema.partition_key not in pairs:
            raise CQLError(f"missing partition key {self.schema.partition_key}")
        return pairs[self.schema.partition_key]

    def _cond_key(self, handler, m: re.Match) -> tuple[str | None, str | None]:
        pairs = self._stmt_pairs(m)
        pk, ck = self._key_from_pairs(pairs)
        if self.schema.clustering and ck is None:
            raise CQLError("conditional DML requires the full primary key")
        return pk, ck

    def _eval_cond(self, cond: str, pk: str | None, ck: str | None) -> bool:
        cond = cond.strip()
        if re.fullmatch(r"NOT\s+EXISTS", cond, re.IGNORECASE):
            return self._row_state(pk, ck) is None
        if re.fullmatch(r"EXISTS", cond, re.IGNORECASE):
            return self._row_state(pk, ck) is not None
        state = self._row_state(pk, ck)
        for part in re.split(r"\s+AND\s+", cond, flags=re.IGNORECASE):
            m = _COND_RE.match(part.strip())
            if not m:
                raise CQLError(f"unsupported IF condition: {part!r}")
            col = m.group(1).lower()
            if col not in self.schema.regular:
                raise CQLError(f"IF on unknown column {col!r}")
            cur = None if state is None else state.get(col)
            lit = _parse_literal(m.group(3))
            if not self._cmp(cur, m.group(2), lit, self.schema.regular[col]):
                return False
        return True

    _NUMERIC_TYPES = frozenset(
        {"tinyint", "smallint", "int", "bigint", "long", "float", "double"}
    )

    @staticmethod
    def _cmp(cur: str | None, op: str, lit: str | None, typ: str) -> bool:
        """Condition compare on canonical string values. Null pinning
        (matches the reference's LWT null handling): ``= null`` is true iff
        the cell is unset, ``!=`` is its negation, ordering ops against an
        unset cell or null literal are never satisfied."""
        if cur is None or lit is None:
            if op == "=":
                return cur is None and lit is None
            if op == "!=":
                return not (cur is None and lit is None)
            return False
        if typ.split("(")[0] in CqlTable._NUMERIC_TYPES:
            a, b = float(cur), float(lit)
        else:
            a, b = cur, lit
        return {
            "=": a == b,
            "!=": a != b,
            "<": a < b,
            "<=": a <= b,
            ">": a > b,
            ">=": a >= b,
        }[op]

    def _row_state(self, pk: str | None, ck: str | None) -> dict | None:
        """Pure-Python reconcile of one (pk, ck) at the current clock — the
        LWT read phase. Driver-side by design: a condition reads exactly one
        row, and the reference serves it from one replica's read path, not a
        scan; mirroring it as a Spark job per statement would be the
        anti-pattern. Same W4/W3/W2 rules as :meth:`snapshot` (writetime
        desc, tombstone beats write, arrival seq; row/partition shadowing;
        TTL horizon) — ``tests/test_lwt_replay.py`` holds them together."""
        asof = self._clock
        best: dict = {}
        pt = rt = None
        for lpk, lck, col, val, kind, wt, ttl, seq in self._log:
            if lpk != pk:
                continue
            if kind == PART_TOMB:
                pt = wt if pt is None else max(pt, wt)
                continue
            if lck != ck:
                continue
            if kind == ROW_TOMB:
                rt = wt if rt is None else max(rt, wt)
                continue
            rank = (wt, 1 if kind == CELL_TOMB else 0, seq)
            prev = best.get(col)
            if prev is None or rank > prev[0]:
                best[col] = (rank, kind, val, ttl)
        horizons = [h for h in (pt, rt) if h is not None]
        horizon = max(horizons) if horizons else None
        live: dict = {}
        exists = False
        for col, ((wt, _, _), kind, val, ttl) in best.items():
            if kind == CELL_TOMB:
                continue
            if ttl and wt + ttl <= asof:
                continue
            if horizon is not None and wt <= horizon:
                continue
            exists = True
            if col is not None:
                live[col] = val
        return live if exists else None

    def _check_table(self, name: str) -> None:
        if name.lower() != self.schema.name:
            raise CQLError(
                f"table {name!r} does not match {self.schema.name!r}"
            )

    def _emit(self, pk, ck, col, val, kind, ts, ttl) -> None:
        self._seq += 1
        self._log.append(
            (pk, ck, col, val, kind, ts, ttl if ttl is not None else 0, self._seq)
        )

    def _key_from_pairs(self, pairs: dict[str, str | None]) -> tuple[str, str | None]:
        s = self.schema
        if s.partition_key not in pairs:
            raise CQLError(f"missing partition key {s.partition_key}")
        pk = pairs[s.partition_key]
        ck = pairs.get(s.clustering) if s.clustering else None
        return pk, ck

    def _insert(self, m: re.Match, default_ts: int) -> None:
        self._check_table(m.group("table"))
        if self.schema.counter:
            raise CQLError("INSERT is not allowed on counter tables")
        ts, ttl = _parse_using(m.group("using"))
        ts = default_ts if ts is None else ts
        pairs = self._insert_pairs(m)
        pk, ck = self._key_from_pairs(pairs)
        if self.schema.clustering and self.schema.clustering not in pairs:
            raise CQLError(f"missing clustering key {self.schema.clustering}")
        # the row marker is what makes INSERT-visibility survive null cells
        self._emit(pk, ck, None, None, MARKER, ts, ttl)
        for c, v in pairs.items():
            if c in self.schema.key_cols:
                continue
            if c not in self.schema.regular:
                raise CQLError(f"unknown column {c!r}")
            if v is not None:
                self._emit(pk, ck, c, v, CELL, ts, ttl)
            else:
                self._emit(pk, ck, c, None, CELL_TOMB, ts, None)

    def _where_pairs(self, where: str) -> dict[str, str | None]:
        pairs: dict[str, str | None] = {}
        for part in re.split(r"\s+AND\s+", where.strip(), flags=re.IGNORECASE):
            m = re.fullmatch(r"(\w+)\s*=\s*(.+)", part.strip(), re.DOTALL)
            if not m:
                raise CQLError(f"DML WHERE must be key equalities: {part!r}")
            col = m.group(1).lower()
            if col not in self.schema.key_cols:
                raise CQLError(f"DML WHERE on non-key column {col!r}")
            pairs[col] = _parse_literal(m.group(2))
        return pairs

    _COUNTER_SET_RE = re.compile(
        r"(\w+)\s*=\s*(\w+)\s*([+-])\s*(\d+)\s*$", re.DOTALL
    )

    def _update(self, m: re.Match, default_ts: int) -> None:
        self._check_table(m.group("table"))
        ts, ttl = _parse_using(m.group("using"))
        ts = default_ts if ts is None else ts
        pairs = self._where_pairs(m.group("where"))
        if self.schema.clustering and self.schema.clustering not in pairs:
            raise CQLError("UPDATE requires the full primary key")
        pk, ck = self._key_from_pairs(pairs)
        if self.schema.counter:
            if m.group("using"):
                raise CQLError("USING is not allowed on counter updates")
            for assign in _split_csv(m.group("set")):
                am = self._COUNTER_SET_RE.match(assign.strip())
                if not am or am.group(1).lower() != am.group(2).lower():
                    raise CQLError(
                        f"counter update must be 'c = c +/- n': {assign!r}"
                    )
                c = am.group(1).lower()
                if c not in self.schema.regular:
                    raise CQLError(f"unknown column {c!r}")
                delta = int(am.group(3) + am.group(4))
                self._emit(pk, ck, c, str(delta), INCR, ts, None)
            return
        for assign in _split_csv(m.group("set")):
            am = re.fullmatch(r"(\w+)\s*=\s*(.+)", assign, re.DOTALL)
            if not am:
                raise CQLError(f"bad SET assignment: {assign!r}")
            c = am.group(1).lower()
            if c not in self.schema.regular:
                raise CQLError(f"unknown column {c!r}")
            v = _parse_literal(am.group(2))
            # no row marker: the UPDATE-only row lives and dies with its cells
            if v is not None:
                self._emit(pk, ck, c, v, CELL, ts, ttl)
            else:
                self._emit(pk, ck, c, None, CELL_TOMB, ts, None)

    def _delete(self, m: re.Match, default_ts: int) -> None:
        self._check_table(m.group("table"))
        ts = int(m.group("ts")) if m.group("ts") else default_ts
        pairs = self._where_pairs(m.group("where"))
        pk, ck = self._key_from_pairs(pairs)
        cols = [c.strip().lower() for c in m.group("cols").split(",") if c.strip()]
        if cols:
            if ck is None and self.schema.clustering:
                raise CQLError("cell DELETE requires the full primary key")
            for c in cols:
                if c not in self.schema.regular:
                    raise CQLError(f"unknown column {c!r}")
                self._emit(pk, ck, c, None, CELL_TOMB, ts, None)
        elif self.schema.clustering and ck is not None:
            self._emit(pk, ck, None, None, ROW_TOMB, ts, None)
        else:
            self._emit(pk, None, None, None, PART_TOMB, ts, None)

    # --- snapshot reconciliation -----------------------------------------

    def mutation_log(self) -> DataFrame:
        return self.spark.createDataFrame(self._log, _MUT_SCHEMA)

    def snapshot(self, asof_us: int | None = None) -> DataFrame:
        """Visible rows after W2 (TTL at ``asof``) + W3 (tombstone
        shadowing) + W4 (per-cell LWW): one wide row per live (pk, ck),
        with ``__writetime_<col>`` shadow columns (f2 convention)."""
        s = self.schema
        if not self._log:
            return self._empty()
        if s.counter:
            return self._counter_snapshot()
        mut = self.mutation_log()
        # TTL is in writetime units here (the logical clock); the batch W2
        # operator does the real seconds→µs conversion. Default asof sees
        # everything un-expired that has no TTL.
        asof = (
            asof_us
            if asof_us is not None
            else max(row[5] for row in self._log) + 1
        )

        part_tombs = (
            mut.filter(F.col("kind") == PART_TOMB)
            .groupBy("pk")
            .agg(F.max("writetime").alias("pt_ts"))
        )
        row_tombs = (
            mut.filter(F.col("kind") == ROW_TOMB)
            .groupBy("pk", "ck")
            .agg(F.max("writetime").alias("rt_ts"))
        )

        # per (pk, ck, col) pick the winner among cells/markers and their
        # tombstones: writetime desc, tombstone beats write, then arrival
        cells = mut.filter(F.col("kind").isin(CELL, MARKER, CELL_TOMB))
        is_tomb = (F.col("kind") == CELL_TOMB).cast("int")
        w = Window.partitionBy("pk", "ck", "col").orderBy(
            F.col("writetime").desc(), is_tomb.desc(), F.col("seq").desc()
        )
        winners = (
            cells.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

        live = (
            winners.filter(F.col("kind") != CELL_TOMB)
            # TTL expiry (W2): 0 = no ttl
            .filter(
                (F.col("ttl") == 0)
                | (F.col("writetime") + F.col("ttl") > F.lit(asof))
            )
            # row/partition tombstone shadowing (W3): survive only if newer
            .join(F.broadcast(part_tombs), "pk", "left")
            .join(F.broadcast(row_tombs), ["pk", "ck"], "left")
            .filter(
                (F.col("pt_ts").isNull() | (F.col("writetime") > F.col("pt_ts")))
                & (F.col("rt_ts").isNull() | (F.col("writetime") > F.col("rt_ts")))
            )
        )

        aggs = []
        for c, typ in s.regular.items():
            cell_val = F.when(F.col("col") == c, F.col("val"))
            cell_wt = F.when(F.col("col") == c, F.col("writetime"))
            aggs.append(F.max(cell_val).cast(typ).alias(c))
            aggs.append(F.max(cell_wt).alias(f"__writetime_{c}"))
        wide = live.groupBy("pk", "ck").agg(*aggs)

        out = wide.select(
            F.col("pk").alias(s.partition_key),
            *([F.col("ck").alias(s.clustering)] if s.clustering else []),
            *[c for c in s.regular],
            *[f"__writetime_{c}" for c in s.regular],
        )
        return out.orderBy(s.partition_key, *( [s.clustering] if s.clustering else []))

    def _counter_snapshot(self) -> DataFrame:
        """Counter reconcile (W6 driven from statement text): a counter cell
        is the SUM of its increments newer than the newest tombstone that
        covers it (cell, row, or partition level — delete wins writetime
        ties, same strict-`>` rule as the LWW path); a row is visible iff it
        has at least one live counter cell.

        The reference leaves post-delete increments formally undefined
        ("counters cannot be reliably re-incremented after deletion"); this
        engine pins the deterministic reading above — increments strictly
        newer than the tombstone count, older ones are dropped.
        """
        s = self.schema
        mut = self.mutation_log()
        cell_tombs = (
            mut.filter(F.col("kind") == CELL_TOMB)
            .groupBy("pk", "ck", "col")
            .agg(F.max("writetime").alias("ct_ts"))
        )
        row_tombs = (
            mut.filter(F.col("kind") == ROW_TOMB)
            .groupBy("pk", "ck")
            .agg(F.max("writetime").alias("rt_ts"))
        )
        part_tombs = (
            mut.filter(F.col("kind") == PART_TOMB)
            .groupBy("pk")
            .agg(F.max("writetime").alias("pt_ts"))
        )
        live = (
            mut.filter(F.col("kind") == INCR)
            .join(F.broadcast(cell_tombs), ["pk", "ck", "col"], "left")
            .join(F.broadcast(row_tombs), ["pk", "ck"], "left")
            .join(F.broadcast(part_tombs), "pk", "left")
            .filter(
                (F.col("ct_ts").isNull() | (F.col("writetime") > F.col("ct_ts")))
                & (F.col("rt_ts").isNull() | (F.col("writetime") > F.col("rt_ts")))
                & (F.col("pt_ts").isNull() | (F.col("writetime") > F.col("pt_ts")))
            )
        )
        aggs = [
            F.sum(
                F.when(F.col("col") == c, F.col("val").cast("long"))
            ).alias(c)
            for c in s.regular
        ]
        wide = live.groupBy("pk", "ck").agg(*aggs)
        return wide.select(
            F.col("pk").alias(s.partition_key),
            *([F.col("ck").alias(s.clustering)] if s.clustering else []),
            *[c for c in s.regular],
        ).orderBy(s.partition_key, *([s.clustering] if s.clustering else []))

    def _empty(self) -> DataFrame:
        s = self.schema
        fields = [f"{s.partition_key} string"]
        if s.clustering:
            fields.append(f"{s.clustering} string")
        fields += [f"{c} {t}" for c, t in s.regular.items()]
        if not s.counter:
            fields += [f"__writetime_{c} long" for c in s.regular]
        return self.spark.createDataFrame([], ", ".join(fields))
