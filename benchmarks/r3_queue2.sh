#!/bin/bash
# Sequencer: after the clean campaign (pid file), run the stack tile sweep
# (needs a quiet chip), then the Swin bf16-vs-f32 A/B.
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/clean_campaign.pid ] && kill -0 "$(cat /tmp/clean_campaign.pid)" 2>/dev/null; then
  echo "[$(date +%H:%M:%S)] waiting for clean campaign $(cat /tmp/clean_campaign.pid)"
  tail --pid="$(cat /tmp/clean_campaign.pid)" -f /dev/null
fi
echo "[$(date +%H:%M:%S)] stack tile sweep"
timeout 3600 python benchmarks/stack_tile_sweep.py --batch 256 \
  > benchmarks/campaign_r3/stack_tile_sweep.jsonl 2> benchmarks/campaign_r3/stack_tile_sweep.err
echo "[$(date +%H:%M:%S)] tile sweep exit=$?"
bash benchmarks/swin_bf16_ab.sh
echo "[$(date +%H:%M:%S)] queue2 done"
