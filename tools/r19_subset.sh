#!/bin/bash
# r19 adjudication subset runner: one leg = one JVM, 2 passes, min per
# query (the Bench protocol), trace committed. Quiet box only.
# Usage: tools/r19_subset.sh <sf-label> <leg-tag> [keys]
set -e
cd "$(dirname "$0")/.."
SFLABEL=${1:?sf label: sf0.1|sf1|sf10}
LEG=${2:?leg tag, e.g. head_legA}
KEYS=${3:-sim_nsw_ann,sim_nsw_stored,graph_coreness,graph_kcore,graph_pagerank,graph_jaccard,q21_blame_supplier,dedup_recall_eval}
case "$SFLABEL" in
  sf0.1) DIR=/root/testdata/sf0.1; MEM=8g;  LOGP=8 ;;
  sf1)   DIR=/root/repo/bench-data/sf1;  MEM=16g; LOGP=32 ;;
  sf10)  DIR=/root/repo/bench-data/sf10; MEM=48g; LOGP=128 ;;
  *) echo "unknown sf label $SFLABEL"; exit 1 ;;
esac
OUT=BENCH_TRACE_${SFLABEL}_r19_${LEG}.txt
SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_SF_DIR=$DIR SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_PASSES=2 SPARK_GRAFT_QUERIES="$KEYS" \
SPARK_GRAFT_JAVA_OPTS="-Dspark.graft.logPartitions=$LOGP" \
SPARK_GRAFT_TRACE_OUT="$OUT" \
sbt -batch "runMain graft.Bench" > /tmp/r19_${SFLABEL}_${LEG}.log 2>&1
grep '"metric"' /tmp/r19_${SFLABEL}_${LEG}.log | tail -1
