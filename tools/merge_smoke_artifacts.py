#!/usr/bin/env python3
"""Fold a chain-filtered smoke run's per-chain minima into the shipped
smoke artifact (BENCH_sf1_smoke.json / BENCH_sf10_smoke.json).

The in-repo artifacts are min-merges over MANY chains; a filtered run
(new-wave chains only) must not rewrite them wholesale — this tool
updates only the chains present in the new line (taking per-scale
minima if the chain already exists) and recomputes the headline worst
ratio from the merged map.

Usage: merge_smoke_artifacts.py <artifact.json> <new_run.json> [ratio_key]
"""
import json
import sys


def main(artifact_path, run_path):
    art = json.load(open(artifact_path))
    run = json.load(open(run_path))
    sec_keys = [k for k in next(iter(run["queries"].values()))
                if k.endswith("_sec")]
    # EXPLICIT scale order — "sf01" and "sf1" both digit-extract to 1,
    # so a numeric sort would silently ride JSON key insertion order
    # and could invert every ratio (r16 review finding)
    SCALE_ORDER = ["sf01_sec", "sf1_sec", "sf10_sec"]
    unknown = [k for k in sec_keys if k not in SCALE_ORDER]
    if unknown or len(sec_keys) != 2:
        raise SystemExit(f"unrecognized scale keys {sec_keys}; "
                         f"expected two of {SCALE_ORDER}")
    lo, hi = sorted(sec_keys, key=SCALE_ORDER.index)
    for chain, row in run["queries"].items():
        prev = art["queries"].get(chain)
        if prev is None:
            art["queries"][chain] = dict(row)
        else:
            for k in sec_keys:
                prev[k] = min(prev[k], row[k])
            for k in row:
                if k.endswith("_rows"):
                    prev[k] = row[k]
            prev["ratio"] = round(prev[hi] / prev[lo], 3) if prev[lo] > 0 else 0.0
    art["value"] = round(max(q["ratio"] for q in art["queries"].values()), 3)
    json.dump(art, open(artifact_path, "w"), separators=(",", ":"))
    with open(artifact_path, "a") as f:
        f.write("\n")
    print(f"merged {len(run['queries'])} chains into {artifact_path}; "
          f"worst ratio {art['value']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
