"""Interleaved A/B: composed-XLA vs fused-saving-backward train attention
(`attn_train_impl`, ops/pallas_kernels.attention_train_fused) on the full
fused train step.

Context (BASELINE round-4 ViT ablation): the vit b128 train forward runs
49.1 ms composed vs 33.0 ms through the inference fused stack — the
composed attention's HBM round-trips are the one identified >10% train-side
opportunity.  The earlier recompute-backward hybrid measured -29% (its bwd
re-derived qkv/scores/softmax in f32); this variant saves those tensors
from the forward kernel (~0.3 ms of extra writes) and hand-writes the
backward in bf16 einsums — autodiff's cost class.

Also prints a 20-step loss-trajectory max-delta (same init/data) tying the
speed number to a training-equivalence envelope in the same session.

Round 5 adds --impls (default xla,pallas): 'flash' A/Bs the LSE-saving
attention core (ops/pallas_kernels.flash_mha) against the composed path.

Run (TPU): python benchmarks/attn_train_ab.py [--models vit,transunet]
                                              [--batches 128] [--impls xla,flash]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401

N_WINDOWS = 6
WINDOW = 24


def build(model_name, batch, attn_train_impl):
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import losses, optim, step as step_mod

    common.set_compute_dtype("bfloat16")
    cfg = default_config(model_name)
    cfg = dc.replace(cfg, model=dc.replace(cfg.model,
                                           attn_train_impl=attn_train_impl))
    h, w = cfg.model.img_size
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, h, w, cfg.model.in_channels)),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(0, 2, size=(batch, h, w)), jnp.float32)
    tx = optim.make_direction(clip_norm=1.0)
    state = step_mod.TrainState.create(model, tx, x, jax.random.PRNGKey(0))
    step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                    augment=True, donate=False)
    return state, step, x, y


def run_window(state, step, x, y, n):
    import jax.numpy as jnp
    lr = jnp.float32(1e-3)
    st = state
    for _ in range(n):
        st, loss, _ = step(st, x, y, lr)
    return st, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="vit,transunet")
    ap.add_argument("--batches", default="128")
    ap.add_argument("--impls", default="xla,pallas",
                    help="two attn_train_impl values to interleave (A,B)")
    args = ap.parse_args()

    import jax.numpy as jnp

    for name in args.models.split(","):
        for batch in (int(b) for b in args.batches.split(",")):
            impl_a, impl_b = args.impls.split(",")
            xla = build(name, batch, impl_a)
            pls = build(name, batch, impl_b)
            # compile + warm both
            for st0, step, x, y in (xla, pls):
                _, loss = run_window(st0, step, x, y, 4)
                float(loss)
            best = {impl_a: float("inf"), impl_b: float("inf")}
            # interleave windows to cancel tunnel drift
            for _ in range(N_WINDOWS):
                for key, (st0, step, x, y) in ((impl_a, xla),
                                               (impl_b, pls)):
                    t0 = time.perf_counter()
                    _, loss = run_window(st0, step, x, y, WINDOW)
                    float(loss)
                    best[key] = min(best[key],
                                    (time.perf_counter() - t0) / WINDOW)
            out = {"model": name, "batch": batch,
                   f"{impl_a}_ms": round(best[impl_a] * 1e3, 3),
                   f"{impl_b}_ms": round(best[impl_b] * 1e3, 3),
                   "speedup_pct": round(100 * (best[impl_a] / best[impl_b]
                                               - 1), 1)}
            # 20-step trajectory parity from identical init
            lr = jnp.float32(1e-3)
            tx_traj, tp_traj = [], []
            st = xla[0]
            for _ in range(20):
                st, loss, _ = xla[1](st, xla[2], xla[3], lr)
                tx_traj.append(float(loss))
            st = pls[0]
            for _ in range(20):
                st, loss, _ = pls[1](st, pls[2], pls[3], lr)
                tp_traj.append(float(loss))
            out["traj_max_abs_dloss"] = round(
                max(abs(a - b) for a, b in zip(tx_traj, tp_traj)), 6)
            out["traj_final"] = [round(tx_traj[-1], 4), round(tp_traj[-1], 4)]
            print(json.dumps(out), flush=True)
            del xla, pls


if __name__ == "__main__":
    main()
