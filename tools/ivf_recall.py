#!/usr/bin/env python
"""Measure l2d_embedding_neardup_prod recall against brute-force ground
truth, and record it in SCALE_STRESS.json under ``recall``.

Ground truth at the base corpus (N <= 20k) is the full upper-triangle
quantized-cosine matrix. On amplified corpora (100x => N = 200k; 2e10
pairs) the truth is SAMPLED: a deterministic subset of query vectors is
scored against the ENTIRE corpus, and recall is measured over truth
pairs touching the sample — an unbiased estimate of pair recall because
the operator's blocking is symmetric in the pair.

Also records the candidate mass (sum over cells of occupancy^2 / 2,
in units of N) so the linear-candidates claim stays measured, not
asserted.

On the amplified corpus, recall is STRATIFIED by replica (ids are
re-keyed k*factor + r, so replica = id % factor):

- **within-replica** pairs are the amplifier's structure-preserved
  truth — the actual near-duplicates a corpus dedup exists to find.
  This is the headline recall.
- **cross-replica** pairs are a statistical artifact of 64 dimensions:
  the per-replica sign flip makes a cross-replica cosine a random-sign
  sum with sigma ~= 1/sqrt(64) = 0.125, so ~0.26% of ALL cross pairs
  (the 2.8-sigma tail) graze past the 0.35 threshold. That tail is
  DIFFUSE (pairs of essentially random directions) and grows as N^2 —
  at 100x it is ~43M pairs, 99% of raw "truth". No blocking with
  linear candidate mass can capture diffuse isotropic-tail pairs
  (they share no locality structure to block on); reporting them in a
  blended recall number would just measure the amplifier's dimension,
  not the operator. Recorded separately, honestly, as the noise floor.

Usage:
    python tools/ivf_recall.py [--sf /root/testdata/sf0.1]
        [--amplified .scale_stress/x100] [--factor 100]
        [--sample 2000] [--out SCALE_STRESS.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cassandra_spark.operators.llm_vectors import (  # noqa: E402
    ND_NPROBE,
    QSCALE,
)

THRESHOLD = 0.35


def _load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], np.floor(E[order] * float(QSCALE) + 0.5)


def _operator_pairs(spark, sf_dir: str) -> set[tuple[int, int]]:
    from cassandra_spark import registry

    registry.load_all()
    df = registry.QUERIES["l2d_embedding_neardup_prod"](spark, sf_dir)
    return {(int(r.vec_a), int(r.vec_b)) for r in df.collect()}


def _truth_full(ids, Q) -> set[tuple[int, int]]:
    nrm = np.sqrt((Q * Q).sum(1))
    C = (Q @ Q.T) / (nrm[:, None] * nrm[None, :])
    iu, ju = np.triu_indices(len(Q), 1)
    m = C[iu, ju] >= THRESHOLD
    return {
        (int(a), int(b))
        for a, b in zip(ids[iu[m]], ids[ju[m]])
    }


def _truth_sampled(ids, Q, sample: int, block: int = 8192):
    """Truth pairs (a, b) where a is in the deterministic sample (every
    ceil(N/sample)-th vector by id order) and b is ANY corpus vector.
    Returns the pair->cosine map so recall can be stratified by
    similarity band as well as by replica."""
    n = len(Q)
    step = max(1, n // sample)
    sel = np.arange(0, n, step)
    nrm = np.sqrt((Q * Q).sum(1))
    Qs = Q[sel]
    ns = nrm[sel]
    pairs: dict[tuple[int, int], float] = {}
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        C = (Qs @ Q[lo:hi].T) / (ns[:, None] * nrm[None, lo:hi])
        si, bj = np.nonzero(C >= THRESHOLD)
        for i, j in zip(si, bj):
            a, b = int(ids[sel[i]]), int(ids[lo + j])
            if a != b:
                pairs[(min(a, b), max(a, b))] = float(C[i, j])
    return pairs, {int(ids[i]) for i in sel}


BANDS = [(0.7, 1.01), (0.5, 0.7), (THRESHOLD, 0.5)]


def _band_recall(truth: dict, got: set) -> dict:
    """Recall stratified by true-cosine band — the ≥0.7 band is the
    near-duplicate mass a corpus dedup exists to find; the threshold-
    grazing tail is dominated by the amplifier's isotropic noise."""
    out = {}
    for lo, hi in BANDS:
        t = {p for p, c in truth.items() if lo <= c < hi}
        h = len(t & got)
        out[f"band_{lo}_{min(hi, 1.0)}"] = {
            "truth": len(t),
            "hits": h,
            "recall": round(h / len(t), 4) if t else None,
        }
    return out


def _candidate_mass(spark, sf_dir: str) -> float:
    """Sum over cells of occupancy^2/2, in units of N — the verify work
    the blocking actually creates (reuses the operator's own probe UDF
    path by re-deriving cells exactly as the operator does)."""
    from pyspark.sql import functions as F

    from cassandra_spark.catalog import Catalog
    from cassandra_spark.operators.llm_vectors import (
        _QV_SPARK_GRID,
        _ivf_nd_centroids,
        _ivf_probe_udf,
        _nd_k_for,
    )

    cat = Catalog(spark, sf_dir)
    n = cat.embeddings.count()
    k = _nd_k_for(n)
    vecs = cat.embeddings.select(
        "vec_id", "embedding", F.expr(_QV_SPARK_GRID).alias("qv")
    ).persist()
    cids, cents = _ivf_nd_centroids(vecs, k)
    occ = (
        vecs.select(
            F.explode(
                _ivf_probe_udf(cids, cents)(F.col("embedding"))
            ).alias("cell")
        )
        .groupBy("cell")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")).alias("m"))
        .collect()[0]
        .m
    )
    vecs.unpersist()
    return float(occ) / 2.0 / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--amplified", default=None,
                    help="amplified corpus dir (sampled truth)")
    ap.add_argument("--factor", type=int, default=100,
                    help="amplification factor (replica = id %% factor)")
    ap.add_argument("--sample", type=int, default=2000)
    ap.add_argument("--out", default=str(REPO / "SCALE_STRESS.json"))
    args = ap.parse_args()

    from cassandra_spark.session import get_spark

    spark = get_spark("ivf-recall")
    results = {}

    for tag, sf_dir in [("base", args.sf)] + (
        [("amplified", args.amplified)] if args.amplified else []
    ):
        ids, Q = _load(sf_dir)
        n = len(ids)
        got = _operator_pairs(spark, sf_dir)
        if n <= 20_000:
            truth = _truth_full(ids, Q)
            hits = len(got & truth)
            denom = len(truth)
            rec_extra = {
                "truth_mode": "full",
                "truth_pairs": denom,
                "hit_pairs": hits,
                "recall": round(hits / denom, 4) if denom else None,
            }
        else:
            truth, sel = _truth_sampled(ids, Q, args.sample)
            got_s = {p for p in got if p[0] in sel or p[1] in sel}
            f = args.factor
            t_within = {p for p in truth if p[0] % f == p[1] % f}
            t_cross = set(truth) - t_within
            h_within = len(got_s & t_within)
            h_cross = len(got_s & t_cross)
            rec_extra = {
                "truth_mode": f"sampled({len(sel)})",
                # headline: structure-preserved near-dup pairs
                "within_replica_truth": len(t_within),
                "within_replica_hits": h_within,
                "within_replica_recall": (
                    round(h_within / len(t_within), 4)
                    if t_within else None
                ),
                # the 2.8-sigma diffuse tail (see module docstring):
                # grows N^2, unblockable at linear candidates — the
                # noise floor, not an operator property
                "cross_replica_truth": len(t_cross),
                "cross_replica_hits": h_cross,
                "cross_replica_recall": (
                    round(h_cross / len(t_cross), 4) if t_cross else None
                ),
                # band-stratified view over ALL sampled truth pairs:
                # the >=0.7 band is the real near-dup mass; the
                # threshold-grazing band is the N^2 isotropic tail
                "by_cosine_band": _band_recall(truth, got_s),
            }
        mass = _candidate_mass(spark, sf_dir)
        rec = {
            "n_vectors": n,
            "threshold": THRESHOLD,
            "nprobe": ND_NPROBE,
            "candidate_mass_per_n": round(mass, 1),
            **rec_extra,
        }
        results[tag] = rec
        print(tag, json.dumps(rec))

    out = Path(args.out)
    doc = json.loads(out.read_text()) if out.exists() else {}
    doc["recall"] = {"l2d_embedding_neardup_prod": results}
    out.write_text(json.dumps(doc, indent=1))
    print(f"recorded -> {out}")


if __name__ == "__main__":
    main()
