#!/bin/bash
# One-shot TPU perf A/B matrix (round 2): run between quality-suite trainings.
# Serializes every TPU process (never two at once — remote-compile queue).
# Results land in data/perf_ab/*.log; each step is individually timed out.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-data/perf_ab}
mkdir -p "$OUT"

run() {
  name=$1; shift
  if [ -f "$OUT/$name.log" ]; then echo "=== $name cached ==="; return; fi
  echo "=== $name: $(date) ==="
  timeout 900 "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$?" >> "$OUT/$name.log"
  tail -3 "$OUT/$name.log"
}

# Reference point first (current defaults).
run bench_default           python bench.py
# Saturated-tile skip off (suspected regression for the bench scene).
run bench_noskip            env MSGS_NO_SKIP=1 python bench.py
# Compositor group size.
run bench_group4            env MSGS_GROUP=4 python bench.py
run bench_group16           env MSGS_GROUP=16 python bench.py
# Binning scan backend.
run bench_xla_scan          env MSGS_XLA_SCAN=1 python bench.py
# Combined best-guess (filled in after reading the above — placeholder runs
# noskip+xla_scan so the matrix covers the interaction).
run bench_noskip_xla        env MSGS_NO_SKIP=1 MSGS_XLA_SCAN=1 python bench.py
# Gather strategies at production shape.
run exp_gather              python tools/exp_gather.py 100000 2097152
# Scatter-add histogram gate for row-tight emission.
run exp_scatter             python tools/exp_scatter.py
# Binning stage bisect.
run profile_binning3        python tools/profile_binning3.py
echo "PERF AB DONE $(date)"
