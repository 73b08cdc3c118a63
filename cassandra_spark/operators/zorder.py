"""Z-order (Morton) layout: the secondary-index analogue at 100 TB
(SURVEY.md §2.1 R5 "optionally Z-order/bucket for perf").

Cassandra answers non-PK predicates with per-node inverted indexes
(`[C* index/internal/CassandraIndex, index/sai/**]`, unverified — SURVEY.md
§0). A Spark/parquet engine gets the same effect from LAYOUT: write the
table ordered by the interleaved bits of the filter columns and every
file's min/max stats become selective for EACH of those columns
simultaneously — a scan with a predicate on either column skips most
files/row-groups without any index structure to build, store, or repair.

All expression-level: rank-normalize each column to a fixed-width integer
grid, interleave bits JVM-side, repartitionByRange on the z-value so files
tile the curve. Two tiny driver-side scalars (per-column min/max) are the
only non-distributed work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per-column grid resolution; 2 cols × 16 bits → 32-bit z-value


def _gridded(c: Column, lo: float, hi: float, bits: int = BITS) -> Column:
    """Normalize a numeric column onto [0, 2^bits) as a long."""
    if hi <= lo:
        return F.lit(0).cast("long")
    scale = ((c.cast("double") - F.lit(lo)) / F.lit(hi - lo)) * F.lit(
        (1 << bits) - 1
    )
    return F.least(
        F.greatest(F.round(scale).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def _interleave(a: str, b: str, bits: int = BITS) -> Column:
    """Morton-interleave two gridded longs: bit i of a → bit 2i, bit i of
    b → bit 2i+1. One fold, JVM-side."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
        f"acc + shiftleft(shiftright({a}, i) & 1, 2 * i) "
        f"    + shiftleft(shiftright({b}, i) & 1, 2 * i + 1))"
    )


def zorder_write(
    df: DataFrame,
    out_dir: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
) -> None:
    """Write df z-ordered on (col_a, col_b): grid both columns, interleave,
    range-partition on the z-value (files = contiguous curve segments),
    sort within files. min/max of both columns per file are then tight."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    z = _interleave("__ga", "__gb")
    (
        df.withColumn("__ga", _gridded(F.col(col_a), float(lo_a), float(hi_a)))
        .withColumn("__gb", _gridded(F.col(col_b), float(lo_b), float(hi_b)))
        .withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__ga", "__gb", "__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def file_stat_selectivity(out_dir: str, col: str) -> float:
    """Mean fraction of the column's global value range each parquet file
    covers (via footer min/max stats) — the probability a random point
    predicate CANNOT skip a given file. Lower = more selective layout."""
    import glob

    import pyarrow.parquet as pq

    spans = []
    mins, maxs = [], []
    for path in glob.glob(f"{out_dir}/*.parquet"):
        md = pq.ParquetFile(path).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cmeta = md.row_group(rg).column(ci)
                if cmeta.path_in_schema == col and cmeta.statistics:
                    s = cmeta.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None:
            spans.append((fmin, fmax))
            mins.append(fmin)
            maxs.append(fmax)
    lo, hi = min(mins), max(maxs)
    if hi == lo:
        return 1.0
    return sum((b - a) / (hi - lo) for a, b in spans) / len(spans)
