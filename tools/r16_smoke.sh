#!/usr/bin/env bash
# Round-16 smoke driver: backfills the r15 late-wave chains that landed
# after the r15 smoke runs (VERDICT r15 item #1) — sf1 for g_ktruss /
# g_louvain_res / x_bloom_incremental, sf10 for g_louvain_res / g_ktruss.
# Uses a fixed jar snapshot so sbt stays free for development; re-snapshot
# the jar after every perf-relevant change.
#
# Fails LOUDLY (r16 review): a missing jar or a dead run must not fall
# through to the merge step and rewrite the artifacts from stale runs
# while still printing the DONE marker.
set -euo pipefail
cd "$(dirname "$0")/.."
JAR=${JAR:-/tmp/graft_r16.jar}
[ -f "$JAR" ] || { echo "FATAL: jar snapshot $JAR missing (sbt package && cp)"; exit 1; }
CP="$JAR:/opt/spark/jars/*"
SF1_CHAINS=${SF1_CHAINS:-g_ktruss,g_louvain_res,x_bloom_incremental}
SF10_CHAINS=${SF10_CHAINS:-g_louvain_res,g_ktruss}

run_and_check() { # label, cmd...
  local label=$1; shift
  local out
  out=$("$@" 2>/dev/null | grep '"metric"') || {
    echo "FATAL: $label produced no metric line (run died or printed nothing)"
    exit 1
  }
  echo "$out"
}

for i in 1 2 3; do
  echo "== sf1 smoke run $i =="
  run_and_check "sf1 run $i" \
    java -Xmx100g -cp "$CP" graft.ScaleSmoke /root/testdata/sf0.1 .tmp/sf1smoke \
    /tmp/sf1_r16_run$i.json "$SF1_CHAINS"
done
for i in 1 2 3; do
  echo "== sf10 smoke run $i =="
  run_and_check "sf10 run $i" \
    java -Xmx100g -cp "$CP" graft.ScaleSmoke sf10 /root/testdata/sf0.1 .tmp/sf1smoke \
    .tmp/sf10smoke /tmp/sf10_r16_run$i.json "$SF10_CHAINS"
done
echo "== merge =="
run_and_check "sf1 merge" java -cp "$CP" graft.ScaleSmoke merge BENCH_sf1_smoke.json >/dev/null
run_and_check "sf10 merge" java -cp "$CP" graft.ScaleSmoke merge10 BENCH_sf10_smoke.json >/dev/null
echo "R16_SMOKE_DONE"
