"""Full benchmark harness: per-model-family inference and train-step
throughput on the local chip (the BASELINE.md config rows).

Usage: python benchmarks/bench_all.py [--train] [--batch N]
Writes a JSON report to benchmarks/results.json and prints a table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401


def bench_model(name, batch, bf16=True, train=False, n_iter=20):
    import jax
    import jax.numpy as jnp
    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import losses, optim, step as step_mod

    common.set_compute_dtype("bfloat16" if bf16 else None)
    cfg = default_config(name)
    h, w = cfg.model.img_size
    c = cfg.model.in_channels
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, h, w, c)), jnp.float32)

    tx = optim.make_direction(clip_norm=1.0)
    state = step_mod.TrainState.create(model, tx, x, jax.random.PRNGKey(0))

    if train:
        y = jnp.asarray(rng.uniform(0, 2, size=(batch, h, w)), jnp.float32)
        step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                        augment=True, donate=False)

        def run():
            nonlocal state
            state, loss, _ = step(state, x, y, jnp.float32(1e-3))
            return loss
    else:
        fwd = step_mod.make_forward(model)

        @jax.jit
        def fwd_sum(s, xx):
            return jnp.sum(fwd(s, xx))

        def run():
            return fwd_sum(state, x)

    float(run())  # compile
    for _ in range(3):
        float(run())
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        float(run())
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))

    # Pipelined steady state: dispatch a window back-to-back, sync once.
    # Train steps chain through the state; inference chains in program
    # order on the device.  This strips the per-call host round-trip
    # (measured null-kernel RTT p50 31.4 ms on this box) that dominates
    # p50 above.  The window's ONE closing sync is amortized across it:
    # window=8 baked ~RTT/8 ~= 3.9 ms/batch of host-link overhead into
    # every row; window=64 (round 3) leaves <0.5 ms/batch.
    window = 64
    for _ in range(16):
        run()
    float(run())
    # Best of 5 windows: the remote-device tunnel adds multi-ms jitter per
    # dispatch; the minimum is the stable device-throughput estimate.
    pipelined = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(window - 1):
            run()
        float(run())
        pipelined = min(pipelined, (time.perf_counter() - t0) / window)

    return {
        "model": name, "mode": "train" if train else "infer",
        "batch": batch, "img": [h, w, c],
        "p50_ms_per_batch": round(p50 * 1e3, 3),
        "p50_ms_per_frame": round(p50 * 1e3 / batch, 4),
        "sync_frames_per_sec": round(batch / p50, 1),
        "pipelined_ms_per_batch": round(pipelined * 1e3, 3),
        "frames_per_sec": round(batch / pipelined, 1),
        "dtype": "bfloat16" if bf16 else "float32",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--models", default="transunet,resnest_unet,vit,swin,mobileunet")
    ap.add_argument("--n-iter", type=int, default=20)
    args = ap.parse_args()

    results = []
    for name in args.models.split(","):
        try:
            r = bench_model(name, args.batch, train=args.train,
                            n_iter=args.n_iter)
            results.append(r)
            print(json.dumps(r))
        except Exception as exc:
            print(json.dumps({"model": name, "error": str(exc)[:200]}))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    existing = []
    if os.path.exists(out):
        try:
            existing = json.load(open(out))
        except Exception:
            existing = []
    json.dump(existing + results, open(out, "w"), indent=1)


if __name__ == "__main__":
    main()
