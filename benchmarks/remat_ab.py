"""Single-process A/B: train step with conv-stage rematerialization
(``remat_conv=True`` — jax.checkpoint around each ResNeSt split-attention
stage and each decoder block) vs the default persist-activations step.

Motivation: the flagship train step is HBM-bandwidth-bound at ~11% MXU
(BASELINE.md step profile), so recomputing stage forwards in the backward
pass — instead of writing their intermediates to HBM in the forward and
reading them back in the backward — trades idle MXU FLOPs for the bytes
that actually bound the step.  Remat also lets XLA fuse longer forward
chains: tensors saved only for the backward no longer have to materialize.

Interleaved timing windows in one process cancel the remote-device
tunnel's run-to-run variance (+-10% across processes, BASELINE.md).

Run on the TPU:  python benchmarks/remat_ab.py [--model transunet|resnest_unet]
                                               [--batch 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITER = 20
N_WINDOWS = 6


def make_step(model_name: str, batch: int, remat_conv: bool):
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import losses, optim, step as step_mod

    common.set_compute_dtype("bfloat16")
    cfg = default_config(model_name)
    cfg = dc.replace(cfg, model=dc.replace(cfg.model, remat_conv=remat_conv))
    h, w = cfg.model.img_size
    c = cfg.model.in_channels
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, h, w, c)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 2, size=(batch, h, w)), jnp.float32)
    tx = optim.make_direction(clip_norm=1.0)
    state = step_mod.TrainState.create(model, tx, x, jax.random.PRNGKey(0))
    step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                    augment=True, donate=False)
    return state, step, x, y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="transunet")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax.numpy as jnp

    from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401

    lr = jnp.float32(1e-3)
    sr, stepr, xr, yr = make_step(args.model, args.batch, True)
    sb, stepb, xb, yb = make_step(args.model, args.batch, False)
    t0 = time.perf_counter()
    print("compiling remat...", flush=True)
    float(stepr(sr, xr, yr, lr)[1])  # compile remat
    print(f"remat compiled in {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    float(stepb(sb, xb, yb, lr)[1])  # compile base
    print(f"base compiled in {time.perf_counter() - t0:.0f}s", flush=True)
    best = {"remat": float("inf"), "base": float("inf")}
    for w in range(N_WINDOWS):
        for tag, (s0, step, x, y) in (("remat", (sr, stepr, xr, yr)),
                                      ("base", (sb, stepb, xb, yb))):
            t0 = time.perf_counter()
            s = s0
            loss = None
            for _ in range(N_ITER):
                s, loss, _ = step(s, x, y, lr)
            float(loss)
            dt = (time.perf_counter() - t0) / N_ITER * 1e3
            best[tag] = min(best[tag], dt)
            print(f"w{w} {tag}: {dt:.2f} ms", flush=True)
    d = (best["base"] - best["remat"]) / best["base"] * 100
    print(f"MODEL {args.model} b={args.batch} BEST remat={best['remat']:.2f} "
          f"ms base={best['base']:.2f} ms delta={d:.1f}%")


if __name__ == "__main__":
    main()
