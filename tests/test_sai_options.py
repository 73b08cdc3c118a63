"""SAI index WITH OPTIONS = {'similarity_function': ...}: DDL
validation, per-function ANN ordering on a session vector table
(colinear vectors share an LSH bucket, so ranking is the only
difference between the three functions), and DROP INDEX reverting the
option."""

from __future__ import annotations

import pytest

from cassandra_spark.cql_session import CqlSession, CQLError


def _mk(spark, tmp_path, options=""):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute("CREATE TABLE vt (k text PRIMARY KEY, v vector<float, 2>)")
    sess.execute(
        "CREATE CUSTOM INDEX vt_v_idx ON vt (v) "
        "USING 'StorageAttachedIndex'" + options
    )
    # positive colinear vectors: identical LSH plane-dot signs, so all
    # three rows live in the query vector's own bucket — the candidate
    # set is total and only the ranking differs
    sess.execute("INSERT INTO vt (k, v) VALUES ('a', [10.0, 0.0])")
    sess.execute("INSERT INTO vt (k, v) VALUES ('b', [0.9, 0.0])")
    sess.execute("INSERT INTO vt (k, v) VALUES ('c', [5.0, 0.0])")
    return sess


ANN = "SELECT k FROM vt ORDER BY v ANN OF [1.0, 0.0] LIMIT 3"


def _order(sess):
    return [r.k for r in sess.execute(ANN).collect()]


def test_default_cosine_ties_break_by_pk(spark, tmp_path):
    sess = _mk(spark, tmp_path)
    assert _order(sess) == ["a", "b", "c"]  # cos = 1 for all; pk order


def test_euclidean_ranks_by_distance_asc(spark, tmp_path):
    sess = _mk(
        spark, tmp_path,
        " WITH OPTIONS = {'similarity_function': 'EUCLIDEAN'}",
    )
    assert _order(sess) == ["b", "c", "a"]  # d = 0.1, 4, 9


def test_dot_product_ranks_by_inner_product_desc(spark, tmp_path):
    sess = _mk(
        spark, tmp_path,
        " WITH OPTIONS = {'similarity_function': 'dot_product'}",
    )
    assert _order(sess) == ["a", "c", "b"]  # dot = 10, 5, 0.9


def test_drop_index_reverts_to_cosine(spark, tmp_path):
    sess = _mk(
        spark, tmp_path,
        " WITH OPTIONS = {'similarity_function': 'EUCLIDEAN'}",
    )
    assert _order(sess) == ["b", "c", "a"]
    sess.execute("DROP INDEX vt_v_idx")
    # no index: ANN falls back to brute-force cosine (ties -> pk order)
    assert _order(sess) == ["a", "b", "c"]


def test_option_validation(spark, tmp_path):
    sess = CqlSession(spark, spill_dir=str(tmp_path))
    sess.execute(
        "CREATE TABLE vt (k text PRIMARY KEY, v vector<float, 2>, t text)"
    )
    with pytest.raises(CQLError, match="unknown similarity_function"):
        sess.execute(
            "CREATE CUSTOM INDEX bad1 ON vt (v) USING "
            "'StorageAttachedIndex' WITH OPTIONS = "
            "{'similarity_function': 'manhattan'}"
        )
    with pytest.raises(CQLError, match="only to vector columns"):
        sess.execute(
            "CREATE CUSTOM INDEX bad2 ON vt (t) USING "
            "'StorageAttachedIndex' WITH OPTIONS = "
            "{'similarity_function': 'cosine'}"
        )
    # other OPTIONS keys are accepted (layout advice) without the
    # similarity option being required
    sess.execute(
        "CREATE CUSTOM INDEX ok ON vt (t) USING 'StorageAttachedIndex' "
        "WITH OPTIONS = {'case_sensitive': 'false'}"
    )
