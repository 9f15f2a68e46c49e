#!/bin/bash
# Round-3 serving-evidence campaign (VERDICT round-2 items #1, #2):
# every serving-stack claim gets a recorded number, measured in ONE
# session with one methodology on the real TPU chip.
#
#   a) serving latency p50/p99, batch {1,8,64,128} x {f32, bf16, bf16+int8w}
#      (bf16 run launched separately; this script runs the f32 half)
#   b) int8 weight-only Dice delta per trainable family (quantize_eval)
#   c) bf16-training synthetic Dice for the recommended config per family
#      (the bf16 column next to BASELINE.md's f32 accuracy table)
#   d) HTTP serving throughput/latency at 1/8/32 clients x window_ms sweep
#
# Appends JSONL to benchmarks/campaign_r3/*.jsonl; run tail -f to watch.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/campaign_r3
mkdir -p "$OUT"

note() { echo "[$(date +%H:%M:%S)] $*" >&2; }

note "a0) tunnel round-trip probe (sync-latency floor on this box)"
python - >> "$OUT/latency.jsonl" 2>> "$OUT/latency_f32.err" <<'EOF'
# Sync latency here includes the axon-tunnel round trip; measure the floor
# with a trivial kernel so device time can be read as sync_p50 - rtt_p50.
import json, time
import numpy as np
from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401
import jax, jax.numpy as jnp
f = jax.jit(lambda x: jnp.sum(x) + 1.0)
x = jnp.ones((8,), jnp.float32)
float(f(x))
ts = []
for _ in range(40):
    t0 = time.perf_counter(); float(f(x)); ts.append(time.perf_counter() - t0)
print(json.dumps({"probe": "null_kernel_rtt",
                  "sync_p50_ms": round(float(np.percentile(ts, 50)) * 1e3, 3),
                  "sync_p99_ms": round(float(np.percentile(ts, 99)) * 1e3, 3)}))
EOF

note "a) serving latency, f32"
timeout 3600 python benchmarks/serving_latency.py --model transunet \
  --dtype f32 >> "$OUT/latency.jsonl" 2> "$OUT/latency_f32.err"

note "b) quantize_eval per family"
q() {
  timeout 5400 python benchmarks/quantize_eval.py "$@" \
    2>> "$OUT/quantize.err" | tail -1 >> "$OUT/quantize.jsonl"
}
q --model transunet    --epochs 100 --loss cce_smooth
q --model resnest_unet --epochs 300 --loss cce_smooth
q --model swin         --epochs 100 --loss cce_smooth
q --model mobileunet   --epochs 300 --loss cce_smooth

note "c) bf16-training Dice per family (recommended configs)"
d() {
  timeout 5400 python benchmarks/train_synthetic_dice.py \
    --n-train 256 --n-test 32 --batch 16 --bf16 "$@" \
    2>> "$OUT/dice_bf16.err" | tail -1 >> "$OUT/dice_bf16.jsonl"
}
d --model transunet    --epochs 100 --loss cce_smooth
d --model resnest_unet --epochs 300 --loss cce_smooth
d --model swin         --epochs 100 --loss cce_smooth
d --model mobileunet   --epochs 300 --loss cce_smooth

note "d) HTTP serving bench, window_ms sweep"
for w in 0.5 2 5; do
  timeout 3600 python benchmarks/serving_http_bench.py --model transunet \
    --clients 1,8,32 --frames 64 --window-ms "$w" \
    2>> "$OUT/http.err" \
    | sed "s/^{/{\"window_ms\": $w, /" >> "$OUT/http.jsonl"
done

note "campaign done"
