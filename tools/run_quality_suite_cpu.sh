#!/bin/bash
# CPU fallback of the multi-scale quality table (VERDICT round-2 item 2),
# for when the TPU tunnel is down: same method matrix at miniature scale
# (96² scene, 4k iters, scales 1-8, reference cadence compressed 5×:
# densify 300→2000/100, opacity reset every 1000, eval 2000 past the last
# reset). Pallas kernels run in interpret mode — ~0.4 s/iter, ~2.5 h total.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-data/quality_cpu}
ITERS=4000
COMMON="-s data/synthcpu2 --eval --quiet --disable_gui --no_tensorboard
  --iterations $ITERS --test_iterations 2000 $ITERS --test_interval 0
  --save_iterations $ITERS --capacity 16384 --entry_cap 65536
  --densify_from_iter 300 --densify_until_iter 2000
  --opacity_reset_interval 1000 --position_lr_max_steps $ITERS"
MS_COMMON="--ms_train --ms_train_max_scale 3"

run() {
  name=$1; shift
  mkdir -p "$OUT/$name"
  if [ -f "$OUT/$name/DONE" ]; then echo "=== $name already done ==="; return; fi
  echo "=== $name: $(date) ==="
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m msgs.apps.train -m "$OUT/$name" $COMMON "$@" \
    > "$OUT/$name/train.log" 2>&1 \
    && touch "$OUT/$name/DONE"
  echo "=== $name finished: $(date) ==="
}

run base --ms_test_scales 1 2 4 8
run ms               $MS_COMMON --filter_small --insert_large
run abl_filter_small $MS_COMMON --filter_small
run abl_ms_train     $MS_COMMON
echo "ALL DONE $(date)"
