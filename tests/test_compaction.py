"""Compaction write path: merge correctness, idempotence, and the
read-optimized layout's pruning behavior (SURVEY.md §2.9 / §4.1)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.operators.compaction import (
    compact,
    point_lookup,
    read_compacted,
)
from cassandra_spark.operators.write_semantics import cell_versions
from tests.conftest import SF_SMOKE

PK = ["user_id"]
CK = ["event_type"]


def _cells(spark):
    return cell_versions(Catalog(spark, SF_SMOKE))


def _rows(df):
    return sorted(
        (r.user_id, r.event_type, r.value, r.writetime)
        for r in df.select("user_id", "event_type", "value", "writetime")
        .collect()
    )


def test_compact_equals_lww_merge(spark, tmp_path):
    out = str(tmp_path / "compacted")
    compact(
        _cells(spark), out, PK, CK, tiebreak=["src", "event_id"]
    )
    got = _rows(read_compacted(spark, out))
    want = {}
    for r in _cells(spark).collect():
        k = (r.user_id, r.event_type)
        v = (r.writetime, r.src, r.event_id, r.value)
        if k not in want or v > want[k]:
            want[k] = v
    assert got == sorted(
        (u, e, v[3], v[0]) for (u, e), v in want.items()
    )


def test_compact_idempotent(spark, tmp_path):
    out1 = str(tmp_path / "gen1")
    out2 = str(tmp_path / "gen2")
    compact(_cells(spark), out1, PK, CK, tiebreak=["src", "event_id"])
    gen1 = read_compacted(spark, out1)
    compact(gen1, out2, PK, CK, tiebreak=["src", "event_id"])
    assert _rows(read_compacted(spark, out2)) == _rows(gen1)


def test_point_lookup_prunes_to_one_bucket(spark, tmp_path):
    out = str(tmp_path / "compacted")
    compact(_cells(spark), out, PK, CK, tiebreak=["src", "event_id"])
    some_key = read_compacted(spark, out).select("user_id").first().user_id
    q = point_lookup(spark, out, PK, (some_key,))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    # the folded bucket literal must land in PartitionFilters (directory
    # pruning) and the key equality in PushedFilters (row-group pruning)
    assert "PartitionFilters" in plan
    assert "bucket" in plan
    rows = q.collect()
    assert rows and all(r.user_id == some_key for r in rows)


def test_time_window_layout_prunes_ranges(spark, tmp_path):
    from cassandra_spark.operators.compaction import compact_time_windows

    out = str(tmp_path / "twcs")
    ev = Catalog(spark, SF_SMOKE).events
    compact_time_windows(ev, out, "ts", ["user_id"], ["ts", "event_id"])
    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    q = back.filter(
        (F.col("window_start") >= "2024-01-10")
        & (F.col("window_start") < "2024-01-12")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "window_start" in plan
    # the window column agrees with the row timestamps it contains
    bad = back.filter(
        (F.col("ts") < F.col("window_start").cast("timestamp"))
        | (
            F.col("ts")
            >= F.date_add(F.col("window_start"), 1).cast("timestamp")
        )
    )
    assert bad.count() == 0
    # retention drop = directory delete: expiring a window removes exactly
    # that window's rows
    import glob
    import shutil

    victims = sorted(glob.glob(f"{out}/window_start=*"))[:2]
    dropped = sum(
        spark.read.parquet(v).count() for v in victims
    )
    total_before = back.count()
    for v in victims:
        shutil.rmtree(v)
    spark.catalog.refreshByPath(out)
    assert spark.read.parquet(out).count() == total_before - dropped


def test_files_sorted_within_partitions(spark, tmp_path):
    out = str(tmp_path / "compacted")
    compact(_cells(spark), out, PK, CK, tiebreak=["src", "event_id"])
    # read a single physical file: rows must be sorted by (pk, ck) so
    # parquet row-group min/max stats are selective for slices
    import glob

    files = glob.glob(f"{out}/bucket=*/*.parquet")
    assert files
    one = spark.read.parquet(files[0]).select("user_id", "event_type")
    got = [(r.user_id, r.event_type) for r in one.collect()]
    assert got == sorted(got)
    # exactly one file per bucket directory: no small-file explosion
    dirs = {f.rsplit("/", 1)[0] for f in files}
    assert len(files) == len(dirs)
