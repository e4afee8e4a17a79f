#!/bin/bash
# N vs 4N scaling evidence: identical input + job, two fresh JVMs.
# Usage: scripts/scaling.sh [N] [DOCS] [ITERS] [HEAP]
set -e
N=${1:-8}
DOCS=${2:-8000}
ITERS=${3:-3}
HEAP=${4:-24g}
cd "$(dirname "$0")/.."
run() {
  SPARK_DRIVER_MEM=$HEAP SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_DOCS=$DOCS \
  SPARK_GRAFT_ITERS=$ITERS sbt -batch "runMain graft.Scaling" 2>&1 |
    grep -o 'SCALING {.*}' | sed 's/^SCALING //'
}
A=$(run "$N")
B=$(run $((4 * N)))
python3 - "$A" "$B" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = b["thr"] / (4 * a["thr"])
print(json.dumps({
    "rows": a["rows"], "n_cpus": a["cpus"],
    "sec_n": a["sec"], "thr_n": a["thr"],
    "sec_4n": b["sec"], "thr_4n": b["thr"],
    "scaling_efficiency": round(eff, 3),
}))
EOF
