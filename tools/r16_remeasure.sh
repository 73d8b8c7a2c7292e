#!/usr/bin/env bash
# Round-16 re-measurement campaign after the timing-action fix (bench/
# smoke now time the un-pruned plan): floors re-base, so every raw-run
# dir was cleared and this script rebuilds them from scratch.
# Order: bench (the driver artifact) first, then sf1 smoke, then sf10.
set -euo pipefail
cd "$(dirname "$0")/.."
JAR=${JAR:-/tmp/graft_r16.jar}
[ -f "$JAR" ] || { echo "FATAL: jar snapshot $JAR missing"; exit 1; }
CP="$JAR:/opt/spark/jars/*"

for i in 1 2 3; do
  echo "== bench run $i =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ROUND=r16 \
    java -Xmx100g -cp "$CP" graft.Bench 2>/dev/null | grep -o '"value":[0-9.]*' | head -1 \
    || { echo "FATAL: bench run $i died"; exit 1; }
done

for i in 1 2; do
  echo "== sf1 smoke run $i =="
  java -Xmx100g -cp "$CP" graft.ScaleSmoke /root/testdata/sf0.1 .tmp/sf1smoke \
    /tmp/sf1_r16re_run$i.json 2>/dev/null | grep -o '"value":[0-9.]*' | head -1 \
    || { echo "FATAL: sf1 smoke run $i died"; exit 1; }
done

for i in 1 2; do
  echo "== sf10 smoke run $i =="
  java -Xmx100g -cp "$CP" graft.ScaleSmoke sf10 /root/testdata/sf0.1 .tmp/sf1smoke \
    .tmp/sf10smoke /tmp/sf10_r16re_run$i.json 2>/dev/null | grep -o '"value":[0-9.]*' | head -1 \
    || { echo "FATAL: sf10 smoke run $i died"; exit 1; }
done

echo "== final merges =="
java -cp "$CP" graft.ScaleSmoke merge BENCH_sf1_smoke.json 2>/dev/null | grep -c metric
java -cp "$CP" graft.ScaleSmoke merge10 BENCH_sf10_smoke.json 2>/dev/null | grep -c metric
echo "R16_REMEASURE_DONE"
