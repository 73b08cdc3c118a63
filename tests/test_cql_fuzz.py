"""Statement-mutation fuzz of the CQL front-end (round 8).

The driver contract: ``CqlSession.execute`` either succeeds or raises
``CQLError`` — never an internal Python exception, and never a raw
Catalyst ``ParseException``/``AnalysisException`` (those are wrapped as
the engine's InvalidRequest at the execute boundary). A seeded mutator
splices, truncates, shuffles, and corrupts a pool of valid statements;
any other exception type is a front-end robustness bug."""

from __future__ import annotations

import random

import pytest

from cassandra_spark.cql_session import CqlSession, CQLError

POOL = [
    "CREATE TABLE t1 (k text PRIMARY KEY, v int)",
    "CREATE TABLE t2 (a text, b int, c text, PRIMARY KEY (a, b))",
    "INSERT INTO t1 (k, v) VALUES ('x', 1)",
    "INSERT INTO t2 (a, b, c) VALUES ('p', 2, 'q') USING TTL 60",
    "UPDATE t1 SET v = 3 WHERE k = 'x'",
    "DELETE FROM t2 WHERE a = 'p' AND b = 2",
    "SELECT k, v FROM t1 WHERE k = 'x'",
    "SELECT * FROM t2 WHERE a = 'p' ORDER BY b DESC LIMIT 3",
    "CREATE INDEX iv ON t1 (v)",
    "CREATE ROLE r1 WITH LOGIN = true",
    "GRANT SELECT ON t1 TO r1",
    "BEGIN BATCH INSERT INTO t1 (k, v) VALUES ('y', 2); APPLY BATCH",
    "CREATE MATERIALIZED VIEW mv1 AS SELECT * FROM t2 WHERE b IS NOT "
    "NULL AND a IS NOT NULL PRIMARY KEY (b, a)",
    "ALTER TABLE t1 ADD w text",
    "DROP INDEX iv",
    "CREATE FUNCTION f1 (x int) RETURNS int LANGUAGE sql AS 'x + 1'",
    "SELECT JSON * FROM t1",
    "TRUNCATE t1",
    "CREATE TYPE addr (street text, zip int)",
]


def _mutate(rng: random.Random, s: str) -> str:
    for _ in range(rng.randint(1, 3)):
        k = rng.randint(0, 6)
        if k == 0 and len(s) > 3:
            i = rng.randrange(len(s))
            s = s[:i] + s[i + 1 :]
        elif k == 1:
            i = rng.randrange(len(s) + 1)
            s = s[:i] + rng.choice("'();,=<>*%\x00e[]{}") + s[i:]
        elif k == 2 and len(s) > 1:
            s = s[: rng.randrange(1, len(s))]
        elif k == 3:
            w = s.split(" ")
            rng.shuffle(w)
            s = " ".join(w)
        elif k == 4:
            t = rng.choice(POOL)
            i = rng.randrange(len(s) + 1)
            s = s[:i] + " " + t[: rng.randrange(len(t))] + s[i:]
        elif k == 5:
            s = s.replace("'", "", 1)
        else:
            s = s + " " + rng.choice(
                ["WHERE", "LIMIT -1", "ALLOW", "IF", "USING TIMESTAMP x"]
            )
    return s


def test_execute_never_raises_internal_exceptions(spark):
    rng = random.Random(4242)
    sess = CqlSession(spark)
    for st in POOL:
        sess.execute(st)
    bad: list[tuple[str, str]] = []
    for _ in range(700):
        s = _mutate(rng, rng.choice(POOL))
        try:
            sess.execute(s)
        except CQLError:
            pass
        except Exception as e:  # noqa: BLE001 — the point of the fuzz
            bad.append((f"{type(e).__name__}: {str(e)[:70]}", s[:110]))
    assert not bad, "\n".join(f"{k}\n   stmt: {s!r}" for k, s in bad[:10])


def test_catalyst_errors_surface_as_cqlerror(spark):
    sess = CqlSession(spark)
    sess.execute("CREATE TABLE wt (k text PRIMARY KEY, v int)")
    sess.execute("INSERT INTO wt (k, v) VALUES ('a', 1)")
    # unresolved column (AnalysisException underneath)
    with pytest.raises(CQLError, match="invalid statement"):
        sess.execute("SELECT nope FROM wt WHERE k = 'a'")
    # selector syntax garbage (ParseException underneath)
    with pytest.raises(CQLError, match="invalid statement"):
        sess.execute("SELECT k,{ v FROM wt WHERE k = 'a'")
    # the cause chain stays diagnosable
    try:
        sess.execute("SELECT nope FROM wt WHERE k = 'a'")
    except CQLError as e:
        assert e.__cause__ is not None
