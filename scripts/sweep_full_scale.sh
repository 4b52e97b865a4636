#!/bin/bash
# Full-scale differential sweep: run EVERY catalog query against its
# DuckDB oracle at a large scale factor (default sf0.1), in N chunks so
# a single process stays restartable and logs stay inspectable.
#
# The small-SF gate (scripts/check_oracle.py at sf0.01) is what the
# grading driver runs; THIS sweep is the scale regression net — it has
# caught bugs invisible at sf0.01: nondeterministic range-partition
# sampling in global_rank, double-summation noise crossing 4-dp rounding
# at 1e10 magnitudes, and mean-drift amplification in running sums.
#
# Usage: scripts/sweep_full_scale.sh [sf_dir] [n_chunks] [out_prefix]
set -u
SF_DIR="${1:-/root/testdata/sf0.1}"
N="${2:-4}"
OUT="${3:-/tmp/sweep_full}"
cd "$(dirname "$0")/.."

CHUNKS=$(python - "$N" <<'EOF'
import sys, importlib.util, json
spec = importlib.util.spec_from_file_location("e", "__spark_entry__.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
qs = list(m.queries())
n = int(sys.argv[1])
print(json.dumps([qs[i::n] for i in range(n)]))
EOF
)
rc=0
for i in $(seq 0 $((N - 1))); do
  names=$(python -c "import json,sys; print(' '.join(json.loads(sys.argv[1])[$i]))" "$CHUNKS")
  echo "== chunk $i =="
  python scripts/check_oracle.py "$SF_DIR" $names > "${OUT}_chunk$i.log" 2>&1 || rc=1
  tail -1 "${OUT}_chunk$i.log"
done
grep -hE "^FAIL" "${OUT}"_chunk*.log && rc=1
exit $rc
