"""Interleaved A/B: inference forward with the fused-stage per-branch norm
lowered via the Pallas group_flat_norm kernel vs the einsum/XLA formulation,
at the serving batch.

Motivation: the batch-256 device trace shows the einsum lowering
materializing a full-size f32 ``y*y`` operand for the variance contraction
(472 MB on stage 1 alone) — ~6 ms of the 42.8 ms forward across the four
stages.  Round 1 recorded the einsum as 15% faster at eval; that comparison
predates the single-process interleaved methodology.

Sync note: every timing pulls a SCALAR to host — on this box's remote-device
tunnel ``jax.block_until_ready`` returns without waiting.

Run on the TPU:  python benchmarks/evalnorm_ab.py [--model transunet] [--batch 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITER = 16
N_WINDOWS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="transunet")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models import common, resnest
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import optim, step as step_mod

    common.set_compute_dtype("bfloat16")
    cfg = default_config(args.model)
    h, w = cfg.model.img_size
    c = cfg.model.in_channels
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, h, w, c)), jnp.float32)
    tx = optim.make_direction(clip_norm=1.0)
    state = step_mod.TrainState.create(model, tx, x[:1], jax.random.PRNGKey(0))

    # The norm-impl gate is read at TRACE time: make_forward returns a fresh
    # jax.jit wrapper each call, so each traces under its own setting.
    resnest.set_norm_impl("auto", eval_impl="pallas")
    fwd_p = step_mod.make_forward(model)
    f_pallas = jax.jit(lambda s, xx: jnp.sum(fwd_p(s, xx)))
    float(f_pallas(state, x))
    resnest.set_norm_impl("auto", eval_impl="xla")
    fwd_x = step_mod.make_forward(model)
    f_xla = jax.jit(lambda s, xx: jnp.sum(fwd_x(s, xx)))
    float(f_xla(state, x))
    resnest.set_norm_impl("auto", eval_impl="xla")  # restore defaults

    best = {"pallas": float("inf"), "xla": float("inf")}
    for wdw in range(1, N_WINDOWS + 1):
        for key, fn in (("pallas", f_pallas), ("xla", f_xla)):
            t0 = time.perf_counter()
            for _ in range(N_ITER - 1):
                fn(state, x)
            float(fn(state, x))
            dt = (time.perf_counter() - t0) / N_ITER
            best[key] = min(best[key], dt)
            print(f"w{wdw} {key}: {dt * 1e3:.2f} ms", flush=True)

    d = (best["xla"] - best["pallas"]) / best["xla"] * 100.0
    print(f"MODEL {args.model} b={args.batch} BEST pallas={best['pallas']*1e3:.2f} ms "
          f"xla={best['xla']*1e3:.2f} ms pallas_is {d:+.1f}% faster")


if __name__ == "__main__":
    main()
