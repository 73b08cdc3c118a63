"""Dynamic-data-masking + math function family: column semantics, CQL
front-end expansion, session-attached masks, and the cross-engine
determinism contract behind the f8 oracle."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# mask_* text algebra
# ---------------------------------------------------------------------------


def _one(spark, expr: str) -> object:
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


@pytest.mark.parametrize(
    "value,begin,end,expect",
    [
        ("alice.smith", 2, 3, "al******ith"),
        ("bob", 2, 2, "bob"),          # len <= begin+end: unchanged
        ("abcd", 2, 2, "abcd"),        # boundary: exactly begin+end
        ("abcde", 2, 2, "ab*de"),
        ("", 1, 1, ""),
    ],
)
def test_mask_inner(spark, value, begin, end, expect):
    from cassandra_spark.operators.masking import mask_inner_sql

    got = _one(spark, mask_inner_sql(f"'{value}'", begin, end))
    assert got == expect


@pytest.mark.parametrize(
    "value,begin,end,expect",
    [
        ("alice.smith", 2, 3, "**ice.sm***"),
        ("bob", 2, 2, "***"),          # len <= begin+end: fully masked
        ("abcd", 2, 2, "****"),
        ("abcde", 2, 2, "**c**"),
        ("", 1, 1, ""),
    ],
)
def test_mask_outer(spark, value, begin, end, expect):
    from cassandra_spark.operators.masking import mask_outer_sql

    got = _one(spark, mask_outer_sql(f"'{value}'", begin, end))
    assert got == expect


def test_mask_padding_char(spark):
    from cassandra_spark.operators.masking import mask_inner_sql

    assert _one(spark, mask_inner_sql("'secret'", 1, 1, "#")) == "s####t"


def test_mask_hash_is_sha256(spark):
    import hashlib

    from pyspark.sql import functions as F

    from cassandra_spark.operators.masking import mask_hash

    df = spark.range(1).select(mask_hash(F.lit("alice")).alias("h"))
    assert df.collect()[0].h == hashlib.sha256(b"alice").hexdigest()


def test_mask_null_keeps_type(spark):
    from pyspark.sql import functions as F

    from cassandra_spark.operators.masking import mask_null

    df = spark.range(1).select(mask_null(F.lit(7).cast("int")).alias("v"))
    assert df.schema["v"].dataType.simpleString() == "int"
    assert df.collect()[0].v is None


def test_mask_default_types():
    from cassandra_spark.operators.masking import mask_default
    from pyspark.sql import functions as F

    assert mask_default(F.col("x"), "text") is not None
    assert mask_default(F.col("x"), "bigint") is not None
    with pytest.raises(ValueError):
        mask_default(F.col("x"), "blob")


# ---------------------------------------------------------------------------
# CQL front-end expansion (textual SELECT path)
# ---------------------------------------------------------------------------


def test_cql_select_mask_functions(spark):
    from cassandra_spark.cql import cql_select

    rows = cql_select(
        spark, SF_SMOKE,
        "SELECT c_custkey, mask_inner(c_name, 4, 2) AS m, "
        "mask_default(c_acctbal) AS d, mask_hash(c_name) AS h "
        "FROM customer WHERE c_custkey = 1",
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    name = cql_select(
        spark, SF_SMOKE, "SELECT c_name FROM customer WHERE c_custkey = 1"
    ).collect()[0].c_name
    assert r.m.startswith(name[:4]) and r.m.endswith(name[-2:])
    assert "*" in r.m and len(r.m) == len(name)
    assert r.d == 0  # numeric column → numeric default
    assert len(r.h) == 64


# ---------------------------------------------------------------------------
# Session-attached masks (ALTER ... MASKED WITH / UNMASK grants)
# ---------------------------------------------------------------------------


@pytest.fixture()
def masked_session(spark):
    from cassandra_spark.cql_session import CqlSession

    s = CqlSession(spark)
    s.execute(
        "CREATE TABLE people (id bigint PRIMARY KEY, name text, ssn text)"
    )
    s.execute("INSERT INTO people (id, name, ssn) VALUES (1, 'alice.smith', "
              "'123-45-6789')")
    s.execute("INSERT INTO people (id, name, ssn) VALUES (2, 'bob.jones', "
              "'987-65-4321')")
    return s


def test_attached_mask_applies_to_select(masked_session):
    s = masked_session
    s.execute("ALTER TABLE people ALTER ssn MASKED WITH mask_replace('XXX')")
    s.execute("ALTER TABLE people ALTER name MASKED WITH mask_inner(2, 2)")
    rows = {r.id: r for r in s.execute(
        "SELECT id, name, ssn FROM people").collect()}
    assert rows[1].ssn == "XXX" and rows[2].ssn == "XXX"
    assert rows[1].name == "al*******th"


def test_attached_mask_where_sees_clear_values(masked_session):
    # the reference's documented caveat: WHERE filters on clear data
    s = masked_session
    s.execute("ALTER TABLE people ALTER ssn MASKED WITH mask_replace('XXX')")
    rows = s.execute(
        "SELECT id, ssn FROM people WHERE id = 1 AND ssn = '123-45-6789' "
        "ALLOW FILTERING"
    ).collect()
    assert len(rows) == 1 and rows[0].ssn == "XXX"


def test_unmask_grant_and_revoke(masked_session):
    s = masked_session
    s.execute("ALTER TABLE people ALTER ssn MASKED WITH mask_null()")
    assert s.execute("SELECT ssn FROM people WHERE id = 1").collect()[0].ssn \
        is None
    s.execute("GRANT UNMASK ON TABLE people TO operator")
    assert s.execute("SELECT ssn FROM people WHERE id = 1").collect()[0].ssn \
        == "123-45-6789"
    s.execute("REVOKE UNMASK ON TABLE people FROM operator")
    assert s.execute("SELECT ssn FROM people WHERE id = 1").collect()[0].ssn \
        is None


def test_drop_masked(masked_session):
    s = masked_session
    s.execute("ALTER TABLE people ALTER ssn MASKED WITH mask_default()")
    assert s.execute("SELECT ssn FROM people WHERE id = 1").collect()[0].ssn \
        == "****"
    s.execute("ALTER TABLE people ALTER ssn DROP MASKED")
    assert s.execute("SELECT ssn FROM people WHERE id = 1").collect()[0].ssn \
        == "123-45-6789"


def test_mask_ddl_rejects_unknown(masked_session):
    from cassandra_spark.cql_session import CQLError

    s = masked_session
    with pytest.raises(CQLError, match="unknown column"):
        s.execute("ALTER TABLE people ALTER nope MASKED WITH mask_null()")
    with pytest.raises(CQLError, match="unknown masking function"):
        s.execute("ALTER TABLE people ALTER ssn MASKED WITH mask_magic()")


# ---------------------------------------------------------------------------
# f8 cross-engine determinism: the rounded transcendental domain
# ---------------------------------------------------------------------------


def test_f8_transcendental_domain_agrees(spark, duck):
    """JVM Math vs C libm differ in the last ulp (exp(1.0) measured to
    differ); the f8 oracle is only deterministic because both sides round
    to 9 dp. Verify the WHOLE argument domain (linenumber 1..7 for exp,
    quantity 1..50 for ln/log10) agrees after rounding — fixed finite
    domain, so this pins the oracle forever on this container."""
    import pandas as pd

    jvm = spark.sql(
        "SELECT id, round(exp(CAST(least(id, 7) AS DOUBLE)), 9) AS e, "
        "round(ln(CAST(id AS DOUBLE)), 9) AS l, "
        "round(log10(CAST(id AS DOUBLE)), 9) AS g "
        "FROM range(1, 51)"
    ).toPandas().sort_values("id").reset_index(drop=True)
    libm = duck.execute(
        "SELECT r AS id, round(exp(CAST(least(r, 7) AS DOUBLE)), 9) AS e, "
        "round(ln(CAST(r AS DOUBLE)), 9) AS l, "
        "round(log10(CAST(r AS DOUBLE)), 9) AS g "
        "FROM range(1, 51) t(r) ORDER BY r"
    ).df()
    pd.testing.assert_frame_equal(
        jvm.astype(float), libm.astype(float), check_exact=True
    )


# ---------------------------------------------------------------------------
# Property tests: the SQL text algebra vs a pure-Python model (DuckDB
# evaluates the shared expression text; Spark↔DuckDB equality is already
# pinned by the cql18 oracle, so this closes the loop on edge cases)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _ALPHABET = st.characters(
        blacklist_characters="'\\", blacklist_categories=("Cs", "Cc")
    )

    def _py_inner(v: str, b: int, e: int, pad: str = "*") -> str:
        if len(v) <= b + e:
            return v
        return v[:b] + pad * (len(v) - b - e) + v[len(v) - e:]

    def _py_outer(v: str, b: int, e: int, pad: str = "*") -> str:
        if len(v) <= b + e:
            return pad * len(v)
        return pad * b + v[b:len(v) - e] + pad * e

    @given(
        st.text(_ALPHABET, max_size=24),
        st.integers(0, 6),
        st.integers(0, 6),
    )
    @settings(max_examples=120, deadline=None)
    def test_mask_inner_matches_python_model(v, b, e):
        import duckdb

        from cassandra_spark.operators.masking import mask_inner_sql

        lit = "'" + v + "'"  # alphabet excludes quote/backslash
        got = duckdb.sql(f"SELECT {mask_inner_sql(lit, b, e)}").fetchone()[0]
        assert got == _py_inner(v, b, e)

    @given(
        st.text(_ALPHABET, max_size=24),
        st.integers(0, 6),
        st.integers(0, 6),
    )
    @settings(max_examples=120, deadline=None)
    def test_mask_outer_matches_python_model(v, b, e):
        import duckdb

        from cassandra_spark.operators.masking import mask_outer_sql

        lit = "'" + v + "'"
        got = duckdb.sql(f"SELECT {mask_outer_sql(lit, b, e)}").fetchone()[0]
        assert got == _py_outer(v, b, e)

except ImportError:  # pragma: no cover - hypothesis is baked into the image
    pass


def test_mask_padding_validation(spark):
    """Padding interpolates into generated SQL: single plain char only."""
    from cassandra_spark.cql import CQLError, cql_select

    with pytest.raises(CQLError, match="single plain character"):
        cql_select(
            spark, SF_SMOKE,
            "SELECT mask_inner(c_name, 1, 1, 'ab') AS m "
            "FROM customer WHERE c_custkey = 1",
        )


def test_mask_default_typed(spark):
    """mask_default through the CQL text path is type-aware: numeric -> 0,
    boolean -> false, temporal -> epoch, text -> '****'."""
    from cassandra_spark.cql import cql_select

    r = cql_select(
        spark, SF_SMOKE,
        "SELECT mask_default(o_totalprice) AS p, "
        "mask_default(o_orderdate) AS d, "
        "mask_default(o_orderpriority) AS s "
        # o_orderkey is a clustering column; restricting it without the
        # partition key needs ALLOW FILTERING (r9 gate-faithfulness fix)
        "FROM orders WHERE o_orderkey = 1 ALLOW FILTERING",
    ).collect()[0]
    assert r.p == 0 and r.s == "****"
    assert str(r.d).startswith("1970-01-01")


def test_masks_never_change_row_selection(spark):
    """Metamorphic property: attaching masks changes projected VALUES
    only — row count and key set of any SELECT are identical with and
    without masks (WHERE runs on clear data; the reference's contract)."""
    from cassandra_spark.cql_session import CqlSession

    s = CqlSession(spark)
    s.execute("CREATE TABLE mm (id bigint PRIMARY KEY, v text, n int)")
    for i in range(30):
        s.execute(f"INSERT INTO mm (id, v, n) VALUES ({i}, 'val{i}', {i % 7})")
    queries = [
        "SELECT id, v, n FROM mm",
        "SELECT id, v FROM mm WHERE id = 11",
        "SELECT id, n FROM mm WHERE n > 3 ALLOW FILTERING",
        "SELECT id FROM mm WHERE v = 'val5' ALLOW FILTERING",
    ]
    before = [sorted(r.id for r in s.execute(q).collect()) for q in queries]
    s.execute("ALTER TABLE mm ALTER v MASKED WITH mask_hash()")
    s.execute("ALTER TABLE mm ALTER n MASKED WITH mask_default()")
    after = [sorted(r.id for r in s.execute(q).collect()) for q in queries]
    assert before == after
