#!/bin/bash
# Round-3 CLEAN re-measurement pass.  The first follow-up run was launched
# twice by mistake and the two copies overlapped on the single chip from
# ~14:03, contaminating everything they measured (e.g. the two
# roofline_components full-forward rows differ 57.9 vs 45.6 ms; an 8 GB
# "cold" read shows 110 MB/s).  This script re-runs exactly those
# measurements SERIALLY, one chip job at a time, into *_clean files;
# BASELINE.md cites only the clean rows.
#
# Pre-14:03 serial campaign outputs (latency.jsonl, quantize.jsonl,
# dice_bf16.jsonl, http.jsonl) were single-occupancy and stand.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/campaign_r3
mkdir -p "$OUT"
note() { echo "[$(date +%H:%M:%S)] $*"; }

note "1) evalnorm A/B (folded-act kernel vs einsum/XLA, eval b256)"
timeout 3600 python benchmarks/evalnorm_ab.py --model transunet --batch 256 \
  > "$OUT/evalnorm_ab_clean.txt" 2> "$OUT/evalnorm_ab_clean.err"
note "   exit=$?"

note "2) per-component roofline b256"
timeout 3600 python benchmarks/roofline_components.py --batch 256 \
  > "$OUT/roofline_components_clean.jsonl" 2> "$OUT/roofline_components_clean.err"
note "   exit=$?"

note "3) serving latency bf16 weights: feed f32 vs feed bf16 (ingest probe)"
timeout 3600 python benchmarks/serving_latency.py --model transunet \
  --dtype bf16 --feed f32 > "$OUT/latency_feed_clean.jsonl" 2> "$OUT/latency_feed_clean.err"
note "   feed=f32 exit=$?"
timeout 3600 python benchmarks/serving_latency.py --model transunet \
  --dtype bf16 --feed bf16 >> "$OUT/latency_feed_clean.jsonl" 2>> "$OUT/latency_feed_clean.err"
note "   feed=bf16 exit=$?"

note "4) all-family refresh, one session/methodology (VERDICT item 9)"
timeout 3600 python benchmarks/bench_all.py --batch 128 \
  > "$OUT/bench_all_infer_clean.jsonl" 2> "$OUT/bench_all_clean.err"
note "   infer exit=$?"
timeout 3600 python benchmarks/bench_all.py --batch 64 --train \
  > "$OUT/bench_all_train_clean.jsonl" 2>> "$OUT/bench_all_clean.err"
note "   train exit=$?"

note "5) out-of-core archive scale (8 GB shard reused, cold cache)"
timeout 5400 python benchmarks/out_of_core_scale.py --gb 8 \
  > "$OUT/out_of_core_clean.jsonl" 2> "$OUT/out_of_core_clean.err"
note "   exit=$?"

note "6) serving transport isolate: batcher-direct vs HTTP (1-core host bound)"
timeout 3600 python benchmarks/serving_http_bench.py --model transunet \
  --clients 1,8,32 --direct \
  > "$OUT/http_direct_clean.jsonl" 2> "$OUT/http_direct_clean.err"
note "   exit=$?"

note "7) swin reference crosscheck incl. converter leg (CPU+TF)"
timeout 3600 python benchmarks/swin_reference_crosscheck.py \
  > "$OUT/swin_crosscheck_clean.json" 2> "$OUT/swin_crosscheck_clean.err"
note "   exit=$?"

note "clean pass done"
