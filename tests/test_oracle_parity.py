"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (fast mirror of the driver's sf0.01 t2 gate; SURVEY.md §5.2)."""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import SF_SMOKE

import __spark_entry__ as e

QUERIES = e.queries()
ORACLE = e.oracle_sql()


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1).astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _hash(df) -> str:
    return hashlib.sha256(_canon(df).to_csv(index=False).encode()).hexdigest()


def test_entry_smoke(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["n_name", "revenue"]


def test_oracle_keys_subset():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in ORACLE:
        assert len(sdf) >= 0  # rows-only contract: must at least run
        return
    ddf = duck.execute(ORACLE[name]).df()
    assert len(sdf) == len(ddf), f"rowcount {len(sdf)} != {len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns)
    if _hash(sdf) != _hash(ddf):
        cs, cd = _canon(sdf), _canon(ddf)
        diff = (cs != cd).any(axis=1)
        raise AssertionError(
            f"value mismatch\nspark:\n{cs[diff].head()}\nduck:\n{cd[diff].head()}"
        )
