#!/bin/bash
# One-shot TPU perf A/B matrix (round 3): run between quality-suite trainings.
# Serializes every TPU process (never two at once — remote-compile queue).
# Results land in data/perf_ab/*.log; each step is individually timed out.
# A step is cached only if its log recorded rc=0 (ADVICE r2: a timed-out or
# crashed step must be retried, not silently carried as a matrix cell).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-data/perf_ab_r3}
mkdir -p "$OUT"

run() {
  name=$1; shift
  if [ -f "$OUT/$name.log" ] && grep -q '^rc=0' "$OUT/$name.log"; then
    echo "=== $name cached ==="; return
  fi
  echo "=== $name: $(date) ==="
  timeout 900 "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$?" >> "$OUT/$name.log"
  tail -3 "$OUT/$name.log"
}

# Reference point first (current defaults: rect emission).
run bench_default           python bench.py
# Row-tight emission (the headline candidate: ~20-25% fewer entries).
run bench_rowtight          env MSGS_BENCH_ROW_TIGHT=1 python bench.py
# Saturated-tile skip off.
# (knobs resolved r3: skip pinned on, GROUP=8, Pallas scan only)
# Compositor group size.
# Binning scan backend.
# Gather strategies at production shape.
run exp_gather              python tools/exp_gather.py 100000 2097152
echo "PERF AB DONE $(date)"
