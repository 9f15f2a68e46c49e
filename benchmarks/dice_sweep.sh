#!/bin/bash
# Re-measure the BASELINE.md synthetic-accuracy table after the two
# late-round-2 training fixes (per-branch init fans in the fused
# split-attention stages; synthetic labels zeroed outside the brain).
# Each row re-runs benchmarks/train_synthetic_dice.py with the exact
# configuration of the original table (256 train frames, 32 held-out,
# batch 16) and appends one JSON line to benchmarks/dice_rerun.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/dice_rerun.jsonl
: > "$OUT"

run() {
  echo "=== $* ===" >&2
  timeout 5400 python benchmarks/train_synthetic_dice.py \
    --n-train 256 --n-test 32 --batch 16 "$@" 2>/dev/null | tail -1 >> "$OUT"
  echo >&2
}

run --model transunet    --epochs 100 --loss cce_smooth
run --model resnest_unet --epochs 150 --loss class_balanced
run --model resnest_unet --epochs 300 --loss class_balanced
run --model resnest_unet --epochs 150 --loss cce_smooth
run --model resnest_unet --epochs 300 --loss cce_smooth
run --model swin         --epochs 100 --loss cce_smooth
run --model mobileunet   --epochs 100 --loss pixelcnn
run --model mobileunet   --epochs 300 --loss pixelcnn
run --model mobileunet   --epochs 300 --loss pixelcnn --class-factor 0.0248,0.044,0.931
run --model mobileunet   --epochs 300 --loss class_balanced
run --model mobileunet   --epochs 300 --loss cce_smooth
run --model vit          --epochs 100 --loss cce_smooth
run --model vit          --epochs 300 --loss cce_smooth
echo "sweep done" >&2
