#!/usr/bin/env python3
"""Mechanically recompute the bench artifact's medians from bench_runs/.

The r16 defect this tool exists to catch: the shipped BENCH "medians"
were a verbatim copy of one unstamped run because the merge formed a
single-member empty-stamp cohort. Recompute the per-query lower-middle
median over the artifact's (fixture, round) cohort straight from the
raw run files and diff against the shipped medians/median_total.

Replicates Bench.mergeRuns exactly (r17 ADVICE fixes):
 - runs order is NUMERIC by run index (lexicographic breaks at 1000);
 - the cohort is the round-stamped runs plus, when the newest
   fixture-matching run is unstamped, that ONE run (the current run
   that adopted the stamp at merge time) — never every trailing
   unstamped run;
 - failure-honest: a query the CURRENT (newest) run failed ships -1
   in the artifact regardless of cohort history, so expect -1 there.

Usage: python3 tools/check_medians.py [artifact.json] [runs_dir]
       (defaults: bench_out.json bench_runs)
Exit 0 when every median and median_total match; 1 otherwise.
"""
import json
import math
import re
import sys
from pathlib import Path


def run_no(name: str) -> int:
    m = re.search(r"run_(\d+)\.json$", name)
    return int(m.group(1)) if m else -1


def main(artifact_path: str, runs_dir: str) -> int:
    art = json.loads(Path(artifact_path).read_text())
    fixture, rnd = art.get("fixture"), art.get("round", "")
    files = sorted(Path(runs_dir).glob("run_*.json"),
                   key=lambda p: run_no(p.name))
    runs = []
    for p in files:
        r = json.loads(p.read_text())
        if r.get("fixture") == fixture:
            runs.append((p.name, r))
    if not runs:
        print(f"no runs for fixture={fixture}")
        return 1
    # the artifact is rewritten by every Bench invocation, so the
    # newest fixture-matching run file IS the artifact's current run
    current_name, current = runs[-1]
    cohort = [r for _, r in runs if r.get("round", "") == rnd]
    if current.get("round", "") != rnd:
        # the unstamped current run adopted the round's stamp at merge
        # time and joined its cohort — only THIS run, never older
        # unstamped files (pre-stamp dev noise)
        cohort.append(current)
    if not cohort:
        print(f"no cohort runs for fixture={fixture} round={rnd!r}")
        return 1
    shipped = art.get("medians", {})
    cur_q = current.get("queries", {})
    n_bad = 0
    total = 0.0
    for q, sv in shipped.items():
        now = cur_q.get(q)
        vals = sorted(v for r in cohort
                      for v in [r.get("queries", {}).get(q)]
                      if v is not None and v >= 0)
        if now is None or now < 0 or not vals:
            expect = -1.0
        else:
            expect = math.floor(vals[(len(vals) - 1) // 2] * 1000 + 0.5) / 1000
        if expect >= 0:
            total += expect
        if abs(sv - expect) > 0.0015:
            print(f"MISMATCH {q}: shipped {sv} recomputed {expect}")
            n_bad += 1
    total = math.floor(total * 1000 + 0.5) / 1000
    if abs(art.get("median_total", -1) - total) > 0.05:
        print(f"MISMATCH median_total: shipped {art.get('median_total')} "
              f"recomputed {total}")
        n_bad += 1
    print(f"== cohort {len(cohort)} runs (current {current_name}), "
          f"{len(shipped)} queries, {n_bad} mismatches ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "bench_out.json",
                  sys.argv[2] if len(sys.argv) > 2 else "bench_runs"))
