#!/bin/bash
# Swin bf16-vs-f32 converged-Dice jitter check.  dice_bf16.jsonl showed Swin
# at 0.9246 bleed Dice under bf16 vs 0.973 in the f32 table — but those are
# single runs from different sessions.  This interleaves f32/bf16 x 2 seeds
# in ONE session so the gap can be attributed (bf16 effect vs seed jitter).
# Waits for the clean campaign (pid in /tmp/clean_campaign.pid) first.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/campaign_r3/swin_bf16_ab.jsonl
if [ -f /tmp/clean_campaign.pid ] && kill -0 "$(cat /tmp/clean_campaign.pid)" 2>/dev/null; then
  echo "waiting for clean campaign $(cat /tmp/clean_campaign.pid)"
  tail --pid="$(cat /tmp/clean_campaign.pid)" -f /dev/null
fi
: > "$OUT"
for seed in 0 1; do
  for dt in f32 bf16; do
    flag=""
    [ "$dt" = bf16 ] && flag="--bf16"
    echo "[$(date +%H:%M:%S)] swin $dt seed=$seed"
    timeout 1800 python benchmarks/train_synthetic_dice.py --model swin \
      --epochs 100 $flag --seed "$seed" >> "$OUT" 2>> "${OUT%.jsonl}.err"
    echo "   exit=$?"
  done
done
echo "swin bf16 A/B done"
