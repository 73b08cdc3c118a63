#!/usr/bin/env python
"""One-command round-closing ritual (VERDICT r7 #8, made mechanical).

Runs, in order, with nothing else on the box:

1. full oracle differential (`tools/check_oracle.py`, every queries()
   entry at sf0.01);
2. full pytest;
3. full bench sweep (sf0.1 + sf1 tiers, clean JVM);
4. `tools/floors.py --check` on the sweep — and for every binding
   over-gate entry, an AUTOMATIC isolated re-measure (fresh process,
   BENCH_REPEAT=2, the binding protocol): the record carries both the
   in-sweep and the isolated number, and only a REPRODUCED isolated
   exceedance fails the stage (r6-r8 each saw one in-sweep trip that
   evaporated isolated).

Prints a markdown closing record to paste into BASELINE.md and exits
non-zero if any stage fails. Expect ~35 minutes total.

Usage: python tools/close_round.py [--round N] [--skip-bench]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def sh(cmd: list[str], timeout: int) -> tuple[int, str]:
    p = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
    )
    return p.returncode, (p.stdout or "") + (p.stderr or "")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    record: dict[str, str] = {}
    failed = False

    print("[1/4] full oracle differential ...", file=sys.stderr)
    rc, out = sh(
        [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.01"],
        timeout=1800,
    )
    m = re.search(r"(\d+) ok, (\d+) rows-only, (\d+) FAIL", out)
    record["oracle"] = m.group(0) if m else "PARSE FAILURE"
    failed |= rc != 0 or not m or m.group(3) != "0"

    print("[2/4] full pytest ...", file=sys.stderr)
    rc, out = sh(
        [sys.executable, "-m", "pytest", "tests/", "-q",
         "-p", "no:cacheprovider"],
        timeout=2400,
    )
    m = re.search(r"(\d+) passed", out)
    f = re.search(r"(\d+) failed", out)
    record["pytest"] = (
        f"{m.group(1)} passed" + (f", {f.group(1)} failed" if f else "")
        if m
        else "PARSE FAILURE"
    )
    failed |= rc != 0 or bool(f)

    if not args.skip_bench:
        print("[3/4] full bench sweep ...", file=sys.stderr)
        rc, out = sh([sys.executable, "bench.py"], timeout=2400)
        bench_path = REPO / f"BENCH_SELF_r{args.round}.jsonl"
        bench_path.write_text(
            "\n".join(
                ln for ln in out.splitlines() if ln.startswith("{")
            )
            + "\n"
        )
        totals = {}
        for ln in out.splitlines():
            try:
                d = json.loads(ln)
            except ValueError:
                continue
            if d.get("metric", "").startswith("total_query_wall_clock") and (
                "n_queries" in d
            ):
                totals[d["metric"]] = (d["value"], d["n_queries"])
        record["bench"] = "; ".join(
            f"{k.removeprefix('total_query_wall_clock') or 'sf0.1'}: "
            f"{v[0]}s / {v[1]} queries"
            for k, v in sorted(totals.items())
        )
        failed |= rc != 0 or not totals

        print("[4/4] floors check ...", file=sys.stderr)
        rc, out = sh(
            [sys.executable, "tools/floors.py", "--check", str(bench_path)],
            timeout=300,
        )
        gates = []
        trips: list[tuple[str, str, float]] = []  # (sf_key, name, ratio)
        for ln in out.splitlines():
            try:
                d = json.loads(ln)
            except ValueError:
                continue
            gates.append(
                f"{d['floors']}: median {d['median_ratio']}x, over-gate "
                f"{d['over_gate'] or 'none'}, isolated-only info "
                f"{d.get('isolated_only_informational') or 'none'}"
            )
            for n, r in (d.get("over_gate") or {}).items():
                trips.append((d["floors"], n, r))
        record["floors"] = "; ".join(gates) or "PARSE FAILURE"
        floors_failed = rc != 0

        if trips:
            # auto-adjudicate: four rounds running, the sweep's over-gate
            # entry evaporated when re-measured isolated (x35/x29 in
            # r6/r7, x22 in r8 refuted at 0.98x) — re-run every binding
            # trip with the binding protocol (fresh process,
            # BENCH_REPEAT=2) and record BOTH numbers, so the closing
            # record is self-contained and only a REPRODUCED exceedance
            # fails the stage.
            import os

            sys.path.insert(0, str(REPO / "tools"))
            import floors as floors_mod

            verdicts = []
            confirmed = False
            for sf_key, name, sweep_r in trips:
                print(
                    f"[4b] isolated re-measure of {name} ({sf_key}, "
                    f"in-sweep {sweep_r}x) ...",
                    file=sys.stderr,
                )
                floor = floors_mod.load_floors(sf1=(sf_key == "sf1"))[
                    name
                ]["floor"]
                env = dict(
                    os.environ, BENCH_QUERIES=name, BENCH_REPEAT="2"
                )
                if sf_key == "sf1":
                    env["BENCH_SF1_QUERIES"] = name
                    env["BENCH_SF1_DIR"] = str(
                        REPO / ".scale_stress" / "x10"
                    )
                p = subprocess.run(
                    [sys.executable, "bench.py"],
                    cwd=REPO, capture_output=True, text=True,
                    timeout=1800, env=env,
                )
                iso_times = floors_mod._extract_times(
                    {"raw": p.stdout}
                ).get(sf_key, {})
                iso = iso_times.get(name)
                if iso is None:
                    verdicts.append(f"{name}: ISOLATED RUN FAILED")
                    confirmed = True
                    continue
                ratio = iso / floor
                word = "REFUTED" if ratio <= 2.0 else "CONFIRMED"
                confirmed |= ratio > 2.0
                verdicts.append(
                    f"{name} ({sf_key}): in-sweep {sweep_r}x, isolated "
                    f"{iso:.2f}s = {ratio:.2f}x floor {floor} -> {word}"
                )
            record["isolated_verdicts"] = "; ".join(verdicts)
            # binding rule: only a reproducible isolated exceedance counts
            floors_failed = confirmed
        failed |= floors_failed

    rn = f" (round {args.round})" if args.round else ""
    print(f"\n### Closing record{rn}\n")
    for k, v in record.items():
        print(f"- **{k}**: {v}")
    print(f"\nresult: {'FAIL' if failed else 'ALL GREEN'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
