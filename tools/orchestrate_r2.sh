#!/bin/bash
# Round-2 session orchestrator: serialize all TPU work.
#  1. wait for the in-flight ms quality run (supervisor pid $1) to finish
#  2. run the perf A/B matrix (short)
#  3. run the remaining quality suite (base + ablations; ms skipped via DONE)
set -u
cd "$(dirname "$0")/.."
MS_PID=${1:?supervisor pid}
while kill -0 "$MS_PID" 2>/dev/null; do sleep 20; done
echo "ms run finished: $(date)"
touch data/quality/ms/DONE
bash tools/run_perf_ab.sh
bash tools/run_quality_suite.sh data/quality
echo "ORCHESTRATION DONE $(date)"
