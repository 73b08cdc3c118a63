#!/usr/bin/env python
"""Canonical per-query floor table: parse + mechanical bench diffing.

BASELINE.md holds ONE binding floor table (section "## Canonical floor
table") with rows ``| query | floor_sec | recorded | notes |``. This tool

- ``--check BENCH.json [...]``: compares a bench sweep (the driver's
  ``BENCH_r{N}.json`` / ``bench.py`` output: ``{"queries": {name: sec}}``)
  against the floors. Prints per-query ratio, the median/max summary, and
  every query over the gate; exits 1 if any ratio exceeds --gate (2.0,
  the driver's bound).
- ``--list``: dumps the parsed floor map as JSON (for other tooling).
- ``--migrate``: one-off parser for the pre-round-6 scattered layout —
  reads every 2-column ``| name | sec |`` row in document order with
  later rows overriding earlier (document order is chronological, so a
  re-base later in the file wins). Kept for provenance; the canonical
  table is now the source of truth.

The binding rule, stated once: a query's floor is its row in the
canonical table; >2x that floor in a comparable sweep is a regression.
Single-JVM 190-query sweeps show rotating position/GC spikes — re-measure
an outlier isolated (BENCH_QUERIES=name BENCH_REPEAT=2) before calling
it a regression; only a reproducible isolated exceedance counts.
"""

from __future__ import annotations

import argparse
import json
import re
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BASELINE = REPO / "BASELINE.md"

_ROW4 = re.compile(
    r"^\|\s*([a-zA-Z0-9_]+)\s*\|\s*([0-9.]+)\s*\|\s*([^|]*)\|\s*([^|]*)\|\s*$"
)
_ROW2 = re.compile(r"^\|\s*([a-zA-Z0-9_]+)\s*\|\s*([0-9.]+)\s*\|\s*$")


def load_floors(path: Path = BASELINE, sf1: bool = False) -> dict[str, dict]:
    """Parse a canonical floor table — the sf0.1 one by default, the
    "@ sf1" one with sf1=True. Returns name -> {floor, recorded, notes}."""
    out: dict[str, dict] = {}
    in_section = False
    for line in path.read_text().splitlines():
        if line.startswith("## "):
            low = line.lower()
            in_section = low.startswith("## canonical floor table") and (
                ("@ sf1" in low) == sf1
            )
            continue
        if not in_section:
            continue
        m = _ROW4.match(line)
        if m and m.group(1) not in ("query",):
            out[m.group(1)] = {
                "floor": float(m.group(2)),
                "recorded": m.group(3).strip(),
                "notes": m.group(4).strip(),
            }
    return out


def migrate(path: Path = BASELINE) -> dict[str, float]:
    """Pre-consolidation layout: every 2-col numeric row anywhere in the
    doc, later occurrences override earlier (chronological re-base)."""
    floors: dict[str, float] = {}
    for line in path.read_text().splitlines():
        m = _ROW2.match(line)
        if m and m.group(1) not in ("query",):
            floors[m.group(1)] = float(m.group(2))
    return floors


def _extract_times(doc: dict) -> dict[str, dict[str, float]]:
    """Bench output -> {"sf0.1": {name: sec}, "sf1": {name: sec}} (sf >=
    0.5 routes to the sf1 bucket — the amplified-corpus sweep)."""
    buckets: dict[str, dict[str, float]] = {"sf0.1": {}, "sf1": {}}

    def route(sf, times) -> None:
        key = "sf1" if (sf or 0.1) >= 0.5 else "sf0.1"
        buckets[key].update(times)

    if doc.get("queries"):
        route(doc.get("sf"), doc["queries"])
    # driver BENCH_r{N}.json wrapper: bench stdout in "tail"/"raw"
    for blob_key in ("raw", "tail"):
        blob = doc.get(blob_key)
        if not blob:
            continue
        for line in blob.splitlines():
            try:
                j = json.loads(line)
            except ValueError:
                continue
            if j.get("queries") and j.get("metric", "").startswith(
                ("query_times_chunk", "total_query_wall_clock")
            ):
                route(j.get("sf"), j["queries"])
    return buckets


def check(bench_paths: list[str], gate: float) -> int:
    tables = {"sf0.1": load_floors(), "sf1": load_floors(sf1=True)}
    if not tables["sf0.1"]:
        print("no canonical floor table found in BASELINE.md", file=sys.stderr)
        return 2
    rc = 0
    for bp in bench_paths:
        text = Path(bp).read_text()
        try:
            doc = json.loads(text)
        except ValueError:  # raw bench.py stdout: JSONL
            doc = {"raw": text}
        for sf_key, times in _extract_times(doc).items():
            if not times:
                continue
            floors = tables[sf_key]
            ratios = {}
            unknown = []
            iso_only = set()
            for name, sec in times.items():
                if name in floors:
                    ratios[name] = sec / floors[name]["floor"]
                    # floors tagged isolated-only belong to queries whose
                    # in-sweep time depends on shared-persist cache order
                    # (e.g. the x33-x37 _SUPPLY cluster): their binding
                    # measurement is BENCH_SF1_QUERIES=<one> BENCH_REPEAT=2
                    # in a fresh process, so sweep exceedances are
                    # informational, never gate failures
                    if "isolated-only" in floors[name]["notes"]:
                        iso_only.add(name)
                else:
                    unknown.append(name)
            over = {
                n: r
                for n, r in sorted(ratios.items())
                if r > gate and n not in iso_only
            }
            iso_over = {
                n: round(r, 3)
                for n, r in sorted(ratios.items())
                if r > gate and n in iso_only
            }
            med = statistics.median(ratios.values()) if ratios else None
            mx = max(ratios.items(), key=lambda kv: kv[1]) if ratios else None
            out_doc = {
                "bench": bp,
                "floors": sf_key,
                "compared": len(ratios),
                "no_floor": sorted(unknown),
                "median_ratio": round(med, 3) if med else None,
                "max_ratio": (
                    {"query": mx[0], "ratio": round(mx[1], 3)}
                    if mx
                    else None
                ),
                "over_gate": {n: round(r, 3) for n, r in over.items()},
                "gate": gate,
            }
            # only present when an isolated-only floor actually tripped
            # in-sweep — an empty key was round-11 bookkeeping noise
            if iso_over:
                out_doc["isolated_only_informational"] = iso_over
            print(json.dumps(out_doc))
            if over:
                rc = 1
    return rc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", nargs="+", metavar="BENCH_JSON")
    ap.add_argument("--gate", type=float, default=2.0)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--sf1", action="store_true", help="with --list: sf1 table")
    ap.add_argument("--migrate", action="store_true")
    args = ap.parse_args()
    if args.migrate:
        print(json.dumps(migrate(), indent=1, sort_keys=True))
    elif args.list:
        print(json.dumps(load_floors(sf1=args.sf1), indent=1, sort_keys=True))
    elif args.check:
        sys.exit(check(args.check, args.gate))
    else:
        ap.print_help()


if __name__ == "__main__":
    main()
