#!/bin/bash
# Round-3 TPU perf measurement session: runs once the quality base run has
# released the chip. Serialized — one TPU process at a time.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-data/perf_r3}
mkdir -p "$OUT"

run() {
  name=$1; shift
  if [ -f "$OUT/$name.log" ] && grep -q '^rc=0' "$OUT/$name.log"; then
    echo "=== $name cached ==="; return
  fi
  echo "=== $name: $(date) ==="
  timeout 1200 "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$?" >> "$OUT/$name.log"
  grep -E '"metric"|ms$|match|rc=' "$OUT/$name.log" | tail -6
}

run bench_persub            python bench.py
run profile_stages          python -u tools/profile_stages.py
run exp_gather2             python -u tools/exp_gather2.py 100000 2097152
run profile_vjp             python -u tools/profile_vjp.py
run bench_rowtight          env MSGS_BENCH_ROW_TIGHT=1 python bench.py
run profile_binning3        python -u tools/profile_binning3.py
echo "PERF R3 DONE $(date)"
