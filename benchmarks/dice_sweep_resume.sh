#!/bin/bash
# Resume of dice_sweep.sh from row 7 (mobileunet onward) after a session
# restart killed the sweep; appends to the existing dice_rerun.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/dice_rerun.jsonl
run() {
  echo "=== $* ===" >&2
  timeout 5400 python benchmarks/train_synthetic_dice.py \
    --n-train 256 --n-test 32 --batch 16 "$@" 2>/dev/null | tail -1 >> "$OUT"
  echo >&2
}
run --model mobileunet   --epochs 100 --loss pixelcnn
run --model mobileunet   --epochs 300 --loss pixelcnn
run --model mobileunet   --epochs 300 --loss pixelcnn --class-factor 0.0248,0.044,0.931
run --model mobileunet   --epochs 300 --loss class_balanced
run --model mobileunet   --epochs 300 --loss cce_smooth
run --model vit          --epochs 100 --loss cce_smooth
run --model vit          --epochs 300 --loss cce_smooth
echo "sweep done" >&2
