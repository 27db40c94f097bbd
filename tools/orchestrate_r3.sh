#!/bin/bash
# Round-3 quality-suite orchestrator: wait for the already-running base
# supervisor (if any) to exit, mark base DONE only on a real completion
# marker (ADVICE r2: never on mere process exit — a crashed run must be
# resumed by the suite, not skipped), then run the remaining suite runs
# sequentially (run_quality_suite.sh skips DONE runs and resumes the rest
# from their newest checkpoint via the supervisor).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-data/quality}

while ps -eo cmd | grep -E "supervisor.py|msgs.apps.train" \
    | grep -v grep | grep -q "$OUT/base"; do
  sleep 60
done

if grep -q '"it": 21000, "eval"' "$OUT/base/train_log.jsonl" 2>/dev/null; then
  touch "$OUT/base/DONE"
fi

bash tools/run_quality_suite.sh "$OUT"
