#!/usr/bin/env bash
# Round-15 smoke driver: runs the r14-wave sf1 chains and the r13
# second-wave sf10 chains that were listed in ScaleSmoke but never
# executed (VERDICT r14 item #1), plus the ANF.md diagnostic (item #2).
# Uses a fixed jar snapshot so sbt stays free for development.
set -uo pipefail
cd "$(dirname "$0")/.."
JAR=${JAR:-/tmp/graft_r15.jar}
CP="$JAR:/opt/spark/jars/*"
SF1_CHAINS="sim_ivfpq_residual,g_louvain,sim_knn_graph_capped128,t_html_strip,t_compress_ratio"
SF10_CHAINS="q_mmr_rerank,sim_kcenter_select,t_unigram_segment,sim_ivfpq_topk,sim_ivfpq_residual"

for i in 1 2 3; do
  echo "== sf1 smoke run $i =="
  java -Xmx100g -cp "$CP" graft.ScaleSmoke /root/testdata/sf0.1 .tmp/sf1smoke \
    /tmp/sf1_r15_run$i.json "$SF1_CHAINS" 2>/dev/null | grep '"metric"'
done
for i in 1 2 3; do
  echo "== sf10 smoke run $i =="
  java -Xmx100g -cp "$CP" graft.ScaleSmoke sf10 /root/testdata/sf0.1 .tmp/sf1smoke \
    .tmp/sf10smoke /tmp/sf10_r15_run$i.json "$SF10_CHAINS" 2>/dev/null | grep '"metric"'
done
echo "== ANF.md =="
java -Xmx100g -cp "$CP" graft.GraphDiag /root/testdata/sf0.1 ANF.md 4 2>/dev/null | tail -2
echo "== merge =="
java -cp "$CP" graft.ScaleSmoke merge BENCH_sf1_smoke.json 2>/dev/null | grep -c '"metric"'
java -cp "$CP" graft.ScaleSmoke merge10 BENCH_sf10_smoke.json 2>/dev/null | grep -c '"metric"'
echo "R15_SMOKE_DONE"
