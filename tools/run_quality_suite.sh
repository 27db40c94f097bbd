#!/bin/bash
# Multi-scale quality table: base vs ablations vs full MS on the synthetic
# scene (VERDICT round-2 item 2). Reference cadence (densify 500→15000/100,
# opacity reset every 3000), 21000 iterations (6000 past the last reset,
# the reference's 30k/15k margin pattern), eval at 7000/21000 on the held-out
# every-8th views at every train scale. Sequential — one TPU process at a
# time; each run sits under the stall supervisor (tunnel drops).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-data/quality}
ITERS=21000
COMMON="-s data/synth2 --eval --quiet --disable_gui --no_tensorboard
  --iterations $ITERS --test_iterations 7000 $ITERS --test_interval 0
  --save_iterations $ITERS --checkpoint_iterations 3000 6000 9000 12000 15000 18000
  --capacity 131072 --entry_cap 1048576"
MS_COMMON="--ms_train --ms_train_max_scale 6"

run() {
  name=$1; shift
  mkdir -p "$OUT/$name"
  if [ -f "$OUT/$name/DONE" ]; then echo "=== $name already done ==="; return; fi
  echo "=== $name: $(date) ==="
  python tools/supervisor.py --stall_sec 900 --max_restarts 8 \
    --log "$OUT/$name/train.log" -- \
    -m "$OUT/$name" $COMMON "$@" \
    && touch "$OUT/$name/DONE"
  echo "=== $name finished: $(date) ==="
}

# Order: base first (the control), then the headline full method, then
# ablations — so a partial window still yields the core base-vs-ms claim.
run base --ms_test_scales 1 2 4 8 16 32 64
run ms              $MS_COMMON --filter_small --insert_large
run abl_filter_small $MS_COMMON --filter_small
run abl_ms_train    $MS_COMMON
echo "ALL DONE $(date)"
