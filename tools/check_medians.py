#!/usr/bin/env python3
"""Mechanically recompute the bench artifact's medians from bench_runs/.

The r16 defect this tool exists to catch: the shipped BENCH "medians"
were a verbatim copy of one unstamped run because the merge formed a
single-member empty-stamp cohort. Recompute the per-query lower-middle
median over the artifact's (fixture, round) cohort straight from the
raw run files and diff against the shipped medians/median_total.

Usage: python3 tools/check_medians.py [artifact.json] [runs_dir]
       (defaults: bench_out.json bench_runs)
Exit 0 when every median and median_total match; 1 otherwise.
"""
import json
import math
import sys
from pathlib import Path


def main(artifact_path: str, runs_dir: str) -> int:
    art = json.loads(Path(artifact_path).read_text())
    fixture, rnd = art.get("fixture"), art.get("round", "")
    runs = []
    for p in sorted(Path(runs_dir).glob("run_*.json")):
        r = json.loads(p.read_text())
        if r.get("fixture") == fixture and r.get("round", "") in (rnd, ""):
            # unstamped runs adopt the latest non-empty stamp (the
            # Bench.mergeRuns rule); with a single current round in the
            # dir, any "" run under the same fixture is cohort-eligible
            # only if it is the newest — conservatively include it and
            # let a mismatch surface for investigation
            runs.append((p.name, r))
    cohort = [r for _, r in runs if r.get("round", "") == rnd]
    # "" runs after the last stamped run joined the cohort at merge time
    if rnd:
        stamped_names = [n for n, r in runs if r.get("round", "") == rnd]
        last_stamped = stamped_names[-1] if stamped_names else ""
        cohort += [r for n, r in runs
                   if r.get("round", "") == "" and n > last_stamped]
    if not cohort:
        print(f"no cohort runs for fixture={fixture} round={rnd!r}")
        return 1
    shipped = art.get("medians", {})
    n_bad = 0
    total = 0.0
    for q, sv in shipped.items():
        vals = sorted(v for r in cohort
                      for v in [r.get("queries", {}).get(q)]
                      if v is not None and v >= 0)
        expect = -1.0 if not vals else vals[(len(vals) - 1) // 2]
        expect = math.floor(expect * 1000 + 0.5) / 1000 if expect >= 0 else -1.0
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
    print(f"== cohort {len(cohort)} runs, {len(shipped)} queries, "
          f"{n_bad} mismatches ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "bench_out.json",
                  sys.argv[2] if len(sys.argv) > 2 else "bench_runs"))
