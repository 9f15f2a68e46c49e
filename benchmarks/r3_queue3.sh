#!/bin/bash
# Post-A/B serial chip queue: (1) bf16-chaos attribution probe, (2) corrected
# per-component roofline (full_forward now takes the REAL pallas serving path;
# adds the composed-XLA comparison row), (3) corrected stack tile sweep
# (full_forward column now actually engages the fused stack per config).
set -u
cd "$(dirname "$0")/.."
D=benchmarks/campaign_r3
echo "[$(date +%H:%M:%S)] bf16 chaos probe"
timeout 1200 python benchmarks/bf16_chaos_probe.py \
  > $D/bf16_chaos.jsonl 2> $D/bf16_chaos.err
echo "   exit=$?"
echo "[$(date +%H:%M:%S)] roofline components (corrected full_forward)"
timeout 3600 python benchmarks/roofline_components.py \
  > $D/roofline_components_fix.jsonl 2> $D/roofline_components_fix.err
echo "   exit=$?"
echo "[$(date +%H:%M:%S)] stack tile sweep (corrected full_forward)"
timeout 3600 python benchmarks/stack_tile_sweep.py --batch 256 --tiles 4,8,16 \
  > $D/stack_tile_sweep_fix.jsonl 2> $D/stack_tile_sweep_fix.err
echo "   exit=$?"
echo "[$(date +%H:%M:%S)] queue3 done"
