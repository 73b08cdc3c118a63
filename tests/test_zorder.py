"""Z-order layout: data preserved, and per-file min/max stats become
selective for BOTH interleaved columns — the property that makes non-PK
predicates prunable without an index (SURVEY.md §2.1 R5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators.zorder import file_stat_selectivity, zorder_write
from tests.conftest import SF_SMOKE

A, B = "l_partkey", "l_suppkey"


def test_zorder_preserves_rows_and_tightens_both_columns(spark, tmp_path):
    li = Catalog(spark, SF_SMOKE).lineitem
    zdir = str(tmp_path / "zorder")
    adir = str(tmp_path / "by_a")

    zorder_write(li, zdir, A, B, n_files=8)
    # baseline: single-column sort — perfectly selective on A, useless on B
    (
        li.repartitionByRange(8, A)
        .sortWithinPartitions(A)
        .write.mode("overwrite")
        .parquet(adir)
    )

    # lossless rewrite
    assert (
        spark.read.parquet(zdir).count() == li.count()
        and spark.read.parquet(zdir)
        .agg(F.sum(A), F.sum(B))
        .first()
        == li.agg(F.sum(A), F.sum(B)).first()
    )

    z_a = file_stat_selectivity(zdir, A)
    z_b = file_stat_selectivity(zdir, B)
    base_b = file_stat_selectivity(adir, B)

    # z-order: BOTH columns substantially tighter than "whole range
    # everywhere"; the single-column layout leaves B unprunable (~full
    # range in every file)
    assert z_a < 0.7, f"A selectivity {z_a:.2f}"
    assert z_b < 0.7, f"B selectivity {z_b:.2f}"
    assert base_b > 0.9, f"sorted-by-A should not help B ({base_b:.2f})"
    assert z_b < base_b
