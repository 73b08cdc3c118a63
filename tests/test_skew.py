"""Salting equivalence: the skew-safe plans return exactly the plain
results (SURVEY.md §4.2 scale posture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators.skew import salted_agg_sum, salted_join
from tests.conftest import SF_SMOKE


def test_salted_agg_equals_plain(spark):
    li = Catalog(spark, SF_SMOKE).lineitem
    plain = {
        r.l_orderkey: (r.s, r.n)
        for r in li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.l_orderkey: (r.sum_l_quantity, r.n_rows)
        for r in salted_agg_sum(
            li, ["l_orderkey"], "l_quantity", discriminator="l_linenumber"
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    cat = Catalog(spark, SF_SMOKE)
    facts = cat.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    dim = cat.customer.select("c_custkey", "c_name").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = sorted(
        (r.o_orderkey, r.c_name)
        for r in facts.join(dim, "o_custkey").collect()
    )
    salted = sorted(
        (r.o_orderkey, r.c_name)
        for r in salted_join(
            facts, dim, "o_custkey", discriminator="o_orderkey"
        ).collect()
    )
    assert salted == plain
