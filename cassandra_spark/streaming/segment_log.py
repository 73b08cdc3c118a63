"""Manifest-committed segment log for streaming sinks.

The round-6 sinks rewrote the WHOLE accumulated table through one task
every micro-batch (``_lww_reduce(base ∪ batch).coalesce(1)``) — per-epoch
cost O(base), compaction-on-every-commit at 100 TB. This module gives the
sinks the same LSM shape the batch engine already uses for memtable spill
(`cql_dml.CqlTable` segments + ``stcs_compact``):

- each epoch APPENDS one segment per family (``base``, ``view``): cost
  O(batch), written with the batch's own parallelism;
- the live segment set is published by writing a JSON manifest to a tmp
  name and ``os.replace``-ing it into place — readers always resolve a
  complete manifest, and a retried epoch sees its manifest and skips
  (exactly-once on top of foreachBatch's at-least-once);
- segments FOLD by size tier (log4 buckets, ``stcs_compact``'s shape —
  `[C* db/compaction/SizeTieredCompactionStrategy, unverified]`): a tier
  holding >= min_threshold segments merges into one, so write
  amplification stays logarithmic in data volume instead of linear in
  epoch count;
- superseded segments are garbage-collected only after they drop out of
  the last ``keep`` manifests (deferred GC, the ``_retired`` contract in
  cql_dml: a reader holding the previous manifest still finds its files).

Readers merge at read time (union of live segments + the family's
reduce), exactly the Cassandra read path: SSTables + reconcile. A real
deployment swaps this for Delta/Iceberg MERGE — the manifest here IS a
minimal table-format log, kept dependency-free on purpose.
"""

from __future__ import annotations

import json
import math
import os


class SegmentLog:
    """One streaming table: families of segment dirs + manifest commits.

    Manifest ``m-EEEEEEEEEE.json`` (zero-padded epoch, so lexicographic
    order == epoch order) holds ``{"epoch": N, "segments": {family:
    [dir names]}}``. Everything lives flat under ``root``.
    """

    def __init__(
        self, root: str, min_threshold: int = 4, keep: int | None = None
    ):
        self.root = root
        self.min_threshold = min_threshold
        # READ WINDOW: gc() deletes segment dirs referenced by none of the
        # newest ``keep`` manifests, so a lazy reader pinned to an older
        # manifest (read_upsert_table/read_mv return unlazified plans) has
        # ``keep - 1`` further commit generations before its files can
        # vanish under it. Always-on deployments that hold reader plans
        # across many epochs should raise this (env knob below) or
        # localCheckpoint()/collect the read eagerly.
        if keep is None:
            keep = int(os.environ.get("CASSANDRA_SPARK_SEGMENT_KEEP", "2"))
        self.keep = max(2, keep)
        os.makedirs(root, exist_ok=True)

    # --- manifest plumbing -------------------------------------------------

    def _manifests(self) -> list[str]:
        return sorted(
            f
            for f in os.listdir(self.root)
            if f.startswith("m-") and f.endswith(".json")
        )

    def latest_epoch(self) -> int | None:
        """Epoch of the newest committed manifest (None before the first
        commit). Monotone even after gc drops old manifests — the right
        progress signal for tests/monitors (manifest COUNT is capped at
        ``keep``)."""
        ms = self._manifests()
        if not ms:
            return None
        with open(os.path.join(self.root, ms[-1])) as f:
            return json.load(f)["epoch"]

    def committed(self, epoch: int) -> bool:
        return os.path.exists(
            os.path.join(self.root, f"m-{epoch:010d}.json")
        )

    def live(self) -> dict[str, list[str]]:
        """family -> absolute segment paths of the newest manifest."""
        ms = self._manifests()
        if not ms:
            return {}
        with open(os.path.join(self.root, ms[-1])) as f:
            doc = json.load(f)
        return {
            fam: [os.path.join(self.root, n) for n in names]
            for fam, names in doc["segments"].items()
        }

    def seg_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def commit(self, epoch: int, segments: dict[str, list[str]]) -> None:
        """Atomically publish the live segment sets for ALL families in
        one rename — base and view can never be observed at different
        epochs."""
        doc = {
            "epoch": epoch,
            "segments": {
                fam: [os.path.basename(p) for p in paths]
                for fam, paths in segments.items()
            },
        }
        final = os.path.join(self.root, f"m-{epoch:010d}.json")
        tmp = final + f".tmp-{epoch}"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, final)

    # --- size-tiered folding ----------------------------------------------

    def fold_candidates(self, segs: list[str]) -> list[list[str]]:
        """stcs_compact's tiering over segment DIRS: log4-of-bytes
        buckets; every bucket holding >= min_threshold members is one
        merge job. Untiered segments are left alone, which is what keeps
        write amplification logarithmic."""
        tiers: dict[int, list[str]] = {}
        for s in segs:
            size = max(1024, _dir_bytes(s))
            tiers.setdefault(int(math.log(size, 4)), []).append(s)
        return [
            members
            for _, members in sorted(tiers.items())
            if len(members) >= self.min_threshold
        ]

    # --- deferred GC ---------------------------------------------------------

    def gc(self) -> list[str]:
        """Delete segment dirs referenced by NONE of the newest ``keep``
        manifests, then drop manifests older than those. Deferred by one
        manifest generation so a reader that resolved the previous
        manifest still finds its files (the cql_dml ``_retired``
        contract). Returns the removed paths."""
        import shutil

        ms = self._manifests()
        if len(ms) <= self.keep:
            return []
        kept, dropped = ms[-self.keep:], ms[: -self.keep]
        referenced: set[str] = set()
        for m in kept:
            with open(os.path.join(self.root, m)) as f:
                for names in json.load(f)["segments"].values():
                    referenced.update(names)
        removed: list[str] = []
        for entry in os.listdir(self.root):
            p = os.path.join(self.root, entry)
            if (
                os.path.isdir(p)
                and entry not in referenced
                and not entry.startswith("_")
            ):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
        for m in dropped:
            os.remove(os.path.join(self.root, m))
        return removed


def _dir_bytes(path: str) -> int:
    total = 0
    for base, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(base, f))
            except OSError:
                pass
    return total
