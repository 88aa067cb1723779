#!/bin/bash
# Capture .explain("formatted") for a set of keys into plans/r19/.
# Usage: tools/r19_plans.sh <repo-dir> <suffix: before|after> <keys,csv>
set -e
REPO=${1:?repo dir}
SUFFIX=${2:?before|after}
KEYS=${3:?keys csv}
OUTDIR=/root/repo/plans/r19
mkdir -p "$OUTDIR"
LOG=/tmp/r19_plans_${SUFFIX}_$$.log
(cd "$REPO" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_PASSES=1 SPARK_GRAFT_EXPLAIN=1 SPARK_GRAFT_QUERIES="$KEYS" \
  SPARK_GRAFT_TRACE_OUT=/tmp/r19_plans_trace_$$.txt \
  sbt -batch "runMain graft.Bench") > "$LOG" 2>&1 || { tail -5 "$LOG"; exit 1; }
python3 - "$LOG" "$OUTDIR" "$SUFFIX" <<'EOF'
import sys, re
log, outdir, suffix = sys.argv[1:4]
text = open(log).read()
# strip sbt/log prefixes like "[error] " that sbt adds to stderr lines
text = re.sub(r'^\[error\] ', '', text, flags=re.M)
parts = re.split(r'\[bench-explain\] ===== (\S+) =====\n', text)
for i in range(1, len(parts) - 1, 2):
    name, body = parts[i], parts[i + 1]
    # plan ends at the next bench marker line
    m = re.search(r'^\[bench-', body, flags=re.M)
    plan = body[:m.start()] if m else body
    with open(f"{outdir}/{name}_{suffix}.txt", "w") as f:
        f.write(plan)
    print(f"wrote {outdir}/{name}_{suffix}.txt ({len(plan)} bytes)")
EOF
