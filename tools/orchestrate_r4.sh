#!/bin/bash
# Round-4 quality-evidence runs (VERDICT r3 items 2, 3, 4, 6), sequential on
# the one TPU, highest-value first so a partial window still lands the core
# datapoints:
#   abl_insert_large : ms_train + insert_large WITHOUT filter_small — the
#                      datapoint that isolates filter_small's effect with
#                      aggregates present (vs the existing ms column) and
#                      settles the recorded-max-gate semantics question
#                      (BASELINE.md:173-190).
#   base_r4          : re-run of the vanilla 3DGS control with committed
#                      logs + checkpoints (replaces the round-2 prose note).
#   ms28k            : the reference-proportional MS budget (28k vs 21k,
#                      mirroring its 40k-vs-30k, README.md:40) for the
#                      ×1-gap-under-fair-budget headline.
#   multi_app12k     : abl_multi_app (multi_occ + multi_dc) reduced-budget
#                      run — first training evidence for the per-level
#                      appearance-delta path (gaussian_model.py:205-222).
#   fade_ungated     : full ms with filter_small keyed on the current
#                      footprint alone (--fade_ungated) — the alternative
#                      reading of the unrecoverable CUDA test.
#
# Between runs the script honors a PAUSE file (touch $OUT/PAUSE to hold the
# TPU for a bench window; rm it to resume). Protocol otherwise identical to
# tools/run_quality_suite.sh (data/synth2, reference cadence, every-8th-view
# test split).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-data/quality}
COMMON="-s data/synth2 --eval --quiet --disable_gui --no_tensorboard
  --test_interval 0 --capacity 131072 --entry_cap 1048576"
MS_COMMON="--ms_train --ms_train_max_scale 6"

run() {
  name=$1; iters=$2; shift 2
  while [ -f "$OUT/PAUSE" ]; do sleep 60; done
  mkdir -p "$OUT/$name"
  if [ -f "$OUT/$name/DONE" ]; then echo "=== $name already done ==="; return; fi
  echo "=== $name: $(date) ==="
  python tools/supervisor.py --stall_sec 900 --max_restarts 8 \
    --log "$OUT/$name/train.log" -- \
    -m "$OUT/$name" $COMMON "$@" \
    --iterations "$iters" --test_iterations 7000 "$iters" \
    --save_iterations "$iters" \
    --checkpoint_iterations 3000 6000 9000 12000 15000 18000 21000 24000 \
    && touch "$OUT/$name/DONE"
  echo "=== $name finished: $(date) ==="
}

run abl_insert_large 21000 $MS_COMMON --insert_large
run base_r4 21000 --ms_test_scales 1 2 4 8 16 32 64
run ms28k 28000 $MS_COMMON --filter_small --insert_large
run multi_app12k 12000 $MS_COMMON --filter_small --insert_large \
  --multi_occ --multi_dc
run fade_ungated 21000 $MS_COMMON --filter_small --insert_large \
  --fade_ungated
echo "ALL DONE $(date)"
