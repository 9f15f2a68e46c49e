#!/bin/bash
# Resume the interrupted Swin bf16-vs-f32 A/B: seed=1 legs only (seed=0 legs
# completed before the session cut; they are already in swin_bf16_ab.jsonl).
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/campaign_r3/swin_bf16_ab.jsonl
for dt in f32 bf16; do
  flag=""
  [ "$dt" = bf16 ] && flag="--bf16"
  echo "[$(date +%H:%M:%S)] swin $dt seed=1"
  timeout 1800 python benchmarks/train_synthetic_dice.py --model swin \
    --epochs 100 $flag --seed 1 >> "$OUT" 2>> "${OUT%.jsonl}.err"
  echo "   exit=$?"
done
echo "swin A/B seed1 done"
