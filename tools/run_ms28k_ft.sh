#!/bin/bash
# ms28k_ft — the fine-tail mechanism test (BASELINE.md r5 ms28k analysis):
# resume the finished ms28k run from chkpnt24000 with --ms_fine_tail_from
# 24000 so iterations 24k→28k sample ONLY the finest level. If the measured
# ×1 decay (22.06→21.78 over 21k→28k) is coarse-gradient drag, this tail
# recovers ×1 while filter_large keeps the coarse aggregates untouched by
# fine renders (coarse scales should hold near their 24k values).
# Directly comparable endpoint: ms28k's inline eval at 28000 (×1 21.78).
set -eu
cd "$(dirname "$0")/.."
OUT=data/quality/ms28k_ft
if [ -f "$OUT/DONE" ]; then echo "ms28k_ft already done"; exit 0; fi
mkdir -p "$OUT"
cp data/quality/ms28k/chkpnt24000.npz "$OUT/"
python tools/supervisor.py --stall_sec 900 --max_restarts 8 \
  --log "$OUT/train.log" -- \
  -m "$OUT" -s data/synth2 --eval --quiet --disable_gui --no_tensorboard \
  --test_interval 0 --capacity 131072 --entry_cap 1048576 \
  --ms_train --ms_train_max_scale 6 --filter_small --insert_large \
  --ms_fine_tail_from 24000 \
  --iterations 28000 --test_iterations 28000 \
  --save_iterations 28000 --checkpoint_iterations 26000 \
  && touch "$OUT/DONE"
git add -A "$OUT" && git commit -q -m "quality: ms28k_ft fine-tail run artifacts" || true
echo "ms28k_ft finished $(date)"
