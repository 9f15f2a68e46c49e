"""int8 MXU compute probe (VERDICT r4 next #4, stage 1).

The b256 serving forward sits at adj_frac 1.01 — padded-FLOP-bound
(BASELINE.md round-4: 3,406 raw vs 8,633 MXU-padded GFLOP) — so the only
mechanism left that can move the headline is int8 *compute* (v5e int8 MXU
peak ~2x bf16), not weight-only dequant (measured latency-neutral, round 3).

Before any model surgery, this measures whether XLA's int8 conv/dot path
actually delivers on THIS chip at THIS model's hot shapes: each row times
bf16 vs int8(->int32) for a representative serving-forward layer at b256.
If int8 does not clearly win here, the serving headline cannot benefit and
the probe records the negative (closing the item per VERDICT "win or
recorded negative").

Timing per memory/axon-tunnel rules: windowed pipelined dispatch, scalar-
pull sync, best-of-5 windows, single occupancy.

Run (TPU): python benchmarks/int8_mxu_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401

B = 256

# Representative serving-forward hot layers (transunet at 256x64 input,
# models/{resnest,transunet}.py; shapes carry the padded-FLOP burden the
# roofline walker identified).  (name, H, W, Cin, Cout, k, stride)
CONV_CASES = [
    ("stem3x3", 128, 32, 32, 64, 3, 1),
    ("stage1_3x3", 64, 16, 64, 64, 3, 1),
    ("stage2_3x3", 32, 8, 128, 128, 3, 1),
    ("stage3_3x3", 16, 4, 256, 256, 3, 1),
    ("decoder16", 64, 16, 128, 16, 3, 1),   # the padded 16-out branch
]

# (name, M, K, N): the 80-token attention/MLP GEMMs flattened over batch.
DOT_CASES = [
    ("qkv_proj", B * 80, 512, 1536),
    ("mlp_fc1", B * 80, 512, 2048),
]


def _time_fn(fn, *args, iters=20, windows=5):
    out = fn(*args)
    float(jnp.sum(out))  # compile + settle
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    rows = []
    for name, h, w, cin, cout, k, s in CONV_CASES:
        x = jnp.asarray(rng.normal(size=(B, h, w, cin)), jnp.bfloat16)
        w_bf = jnp.asarray(rng.normal(size=(k, k, cin, cout)), jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-127, 127, size=(B, h, w, cin)),
                         jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 127, size=(k, k, cin, cout)),
                         jnp.int8)
        dn = jax.lax.conv_dimension_numbers(x.shape, w_bf.shape,
                                            ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def conv_bf16(x, w, dn=dn, s=s):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        @jax.jit
        def conv_int8(x, w, dn=dn, s=s):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        row = {"case": name, "kind": "conv",
               "shape": [B, h, w, cin, cout, k]}
        row["bf16_ms"] = round(_time_fn(conv_bf16, x, w_bf), 4)
        try:
            row["int8_ms"] = round(_time_fn(conv_int8, xq, wq), 4)
            row["int8_speedup"] = round(row["bf16_ms"] / row["int8_ms"], 3)
        except Exception as exc:  # unsupported lowering
            row["int8_error"] = f"{type(exc).__name__}: {exc}"[:200]
        rows.append(row)
        print(json.dumps(row), flush=True)

    for name, m, kdim, n in DOT_CASES:
        a = jnp.asarray(rng.normal(size=(m, kdim)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(kdim, n)), jnp.bfloat16)
        aq = jnp.asarray(rng.integers(-127, 127, size=(m, kdim)), jnp.int8)
        bq = jnp.asarray(rng.integers(-127, 127, size=(kdim, n)), jnp.int8)

        @jax.jit
        def dot_bf16(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        @jax.jit
        def dot_int8(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.int32)

        row = {"case": name, "kind": "dot", "shape": [m, kdim, n]}
        row["bf16_ms"] = round(_time_fn(dot_bf16, a, b), 4)
        try:
            row["int8_ms"] = round(_time_fn(dot_int8, aq, bq), 4)
            row["int8_speedup"] = round(row["bf16_ms"] / row["int8_ms"], 3)
        except Exception as exc:
            row["int8_error"] = f"{type(exc).__name__}: {exc}"[:200]
        rows.append(row)
        print(json.dumps(row), flush=True)

    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "campaign_r5")
    os.makedirs(dest, exist_ok=True)
    with open(os.path.join(dest, "int8_mxu_probe.jsonl"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
