"""Frozen nested collections (round 12): literal canonicalization depth,
DDL frozen-spelling gate, DML round-trips, snapshot re-typing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_spark.cql import CQLError
from cassandra_spark.cql_dml import coll_json, spark_type_text
from cassandra_spark.cql_session import CqlSession


def test_coll_json_depth_and_canonical_order():
    # list element order preserved; set sorted; map keys sorted
    assert coll_json("[3, 1, 2]", "list<int>") == "[3,1,2]"
    assert coll_json("{'y', 'x', 'y'}", "set<string>") == '["x","y"]'
    assert coll_json("{3, 10, 2}", "set<int>") == "[2,3,10]"  # numeric order
    assert (
        coll_json("{'b': [2], 'a': [1]}", "map<string,list<int>>")
        == '{"a":[1],"b":[2]}'
    )
    # two nesting levels inside a frozen wrapper
    assert (
        coll_json("[[1, 2], [3]]", "list<list<int>>") == "[[1,2],[3]]"
    )
    # struct elements still route through struct_json
    assert (
        coll_json("[('a', 1)]", "list<struct<c0:string,c1:int>>")
        == '[{"c0":"a","c1":1}]'
    )
    assert coll_json("NULL", "list<int>") is None
    with pytest.raises(CQLError):
        coll_json("[1, NULL]", "list<int>")  # null elements rejected
    with pytest.raises(CQLError):
        coll_json("{'a': 1}", "list<int>")  # wrong literal shape


def test_spark_type_text_normalizes_cql_spellings():
    assert spark_type_text("list<int>") == "array<int>"
    assert spark_type_text("set<string>") == "array<string>"
    assert (
        spark_type_text("map<string,list<set<int>>>")
        == "map<string,array<array<int>>>"
    )


def test_ddl_requires_frozen_nesting(spark):
    s = CqlSession(spark, None)
    for bad in (
        "CREATE TABLE b1 (pk int PRIMARY KEY, m map<text, list<int>>)",
        "CREATE TABLE b2 (pk int PRIMARY KEY, l list<set<text>>)",
        "CREATE TABLE b3 (pk int PRIMARY KEY, s set<map<text, int>>)",
    ):
        with pytest.raises(CQLError, match="frozen"):
            s.execute(bad)
    # collection map keys stay rejected even frozen (pinned envelope)
    with pytest.raises(CQLError, match="scalar key"):
        s.execute(
            "CREATE TABLE b4 (pk int PRIMARY KEY, "
            "m map<frozen<list<int>>, int>)"
        )
    # ALTER ADD goes through the same gate
    s.execute("CREATE TABLE ok (pk int PRIMARY KEY, v int)")
    with pytest.raises(CQLError, match="frozen"):
        s.execute("ALTER TABLE ok ADD m map<text, list<int>>")
    s.execute("ALTER TABLE ok ADD m map<text, frozen<list<int>>>")
    # a frozen OUTER collection freezes everything inside — no inner
    # spelling required (the reference's rule)
    s.execute(
        "CREATE TABLE fz (pk int PRIMARY KEY, f frozen<list<list<int>>>)"
    )


def test_nested_dml_roundtrip_and_lww(spark):
    s = CqlSession(spark, None)
    s.execute(
        "CREATE TABLE nt (pk int PRIMARY KEY, "
        "m map<text, frozen<list<int>>>, l list<frozen<set<text>>>, "
        "st set<frozen<map<text, int>>>)"
    )
    s.execute(
        "INSERT INTO nt (pk, m, l, st) VALUES (1, "
        "{'b': [3], 'a': [1, 2]}, [{'y', 'x'}, {'z'}], "
        "{{'k2': 2, 'k1': 1}})"
    )
    s.execute("UPDATE nt SET m['a'] = [7] WHERE pk = 1")     # subscript
    s.execute("UPDATE nt SET m = m + {'c': [9]} WHERE pk = 1")  # append
    s.execute("DELETE m['b'] FROM nt WHERE pk = 1")          # key tomb
    s.execute(
        """INSERT INTO nt JSON '{"pk": 2, "m": {"z": [5, 6]},"""
        """ "l": [["b", "a"]]}'"""
    )
    rows = {
        r.pk: (r.m, r.l, r.st)
        for r in s.execute("SELECT pk, m, l, st FROM nt")
        .select(
            "pk",
            F.to_json("m").alias("m"),
            F.to_json("l").alias("l"),
            F.to_json("st").alias("st"),
        )
        .collect()
    }
    assert rows[1] == (
        '{"a":[7],"c":[9]}',
        '[["x","y"],["z"]]',
        '[{"k1":1,"k2":2}]',
    )
    # INSERT JSON canonicalizes nested sets too (sorted)
    assert rows[2] == ('{"z":[5,6]}', '[["a","b"]]', None)
    # snapshot Spark types are real nested types, not strings
    dt = dict(s.execute("SELECT m, l, st FROM nt").dtypes)
    assert dt["m"] == "map<string,array<int>>"
    assert dt["l"] == "array<array<string>>"
    assert dt["st"] == "array<map<string,int>>"
