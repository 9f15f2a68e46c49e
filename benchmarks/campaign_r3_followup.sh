#!/bin/bash
# Round-3 follow-up: runs once serving_campaign.sh (pid in /tmp/campaign.pid)
# releases the chip.  Sequential, one chip job at a time:
#   1) out-of-core at archive scale, cold page cache (VERDICT item 5)
#   2) per-component serving roofline, batch 256 (VERDICT item 3)
#   3) eval-norm A/B re-measure: the group_flat_norm kernel now folds the
#      following LeakyReLU (round-3 change) — re-test eval pallas-vs-xla
#   4) ingest probe: serving latency with bf16-fed input (kills the
#      on-device cast+relayout named in the round-2 trace)
#   5) all-family serving refresh, ONE session/methodology (VERDICT item 9)
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/campaign_r3
mkdir -p "$OUT"
note() { echo "[$(date +%H:%M:%S)] $*"; }

if [ -f /tmp/campaign.pid ]; then
  note "waiting for campaign pid $(cat /tmp/campaign.pid)"
  tail --pid="$(cat /tmp/campaign.pid)" -f /dev/null
fi
note "campaign done; follow-up starts"

note "1) out-of-core archive scale (8 GB, cold cache)"
timeout 5400 python benchmarks/out_of_core_scale.py --gb 8 \
  >> "$OUT/out_of_core.jsonl" 2> "$OUT/out_of_core.err"
note "   exit=$?"

note "2) per-component roofline b256"
timeout 3600 python benchmarks/roofline_components.py --batch 256 \
  >> "$OUT/roofline_components.jsonl" 2> "$OUT/roofline_components.err"
note "   exit=$?"

note "3) evalnorm A/B with folded-act kernel"
timeout 3600 python benchmarks/evalnorm_ab.py --model transunet --batch 256 \
  >> "$OUT/evalnorm_ab.txt" 2> "$OUT/evalnorm_ab.err"
note "   exit=$?"

note "4) serving latency, bf16-fed input"
timeout 3600 python benchmarks/serving_latency.py --model transunet \
  --dtype bf16 --feed bf16 >> "$OUT/latency.jsonl" 2> "$OUT/latency_bf16feed.err"
note "   exit=$?"

note "5) all-family serving refresh (infer b128 + train b64)"
timeout 3600 python benchmarks/bench_all.py --batch 128 \
  >> "$OUT/bench_all_infer.jsonl" 2> "$OUT/bench_all.err"
note "   infer exit=$?"
timeout 3600 python benchmarks/bench_all.py --batch 64 --train \
  >> "$OUT/bench_all_train.jsonl" 2>> "$OUT/bench_all.err"
note "   train exit=$?"

note "follow-up done"
