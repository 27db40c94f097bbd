#!/bin/bash
set -eu
cd "$(dirname "$0")/.."
OUT=data/quality/ms_best21k
if [ -f "$OUT/DONE" ]; then echo done; exit 0; fi
mkdir -p "$OUT"
python tools/supervisor.py --stall_sec 900 --max_restarts 8 \
  --log "$OUT/train.log" -- \
  -m "$OUT" -s data/synth2 --eval --quiet --disable_gui --no_tensorboard \
  --test_interval 0 --capacity 131072 --entry_cap 1048576 \
  --ms_train --ms_train_max_scale 6 --filter_small --insert_large \
  --fade_ungated --multi_occ --multi_dc \
  --iterations 21000 --test_iterations 7000 21000 \
  --save_iterations 21000 --checkpoint_iterations 3000 6000 9000 12000 15000 18000 \
  && touch "$OUT/DONE"
git add -A "$OUT" && git commit -q -m "quality: ms_best21k artifacts (fade_ungated + multi_occ/multi_dc combination run)" || true
echo "ms_best21k finished $(date)"
