"""Interleaved A/B for two train-step HBM-bytes candidates exposed by the
round-4 training roofline (BASELINE.md: transunet train is bytes-bound at
raw-MXU 0.24/0.32):

  mu        Adam first moment stored bf16 (``--adam-mu-bf16`` /
            TrainConfig.adam_mu_dtype) vs f32 — halves mu read+write traffic
            (saves 4 bytes/param/step of HBM traffic out of the ~24 the
            params/mu/nu read+write costs).
  donate    donate_argnums on the TrainState (the production Trainer default)
            vs the roofline harness's donate=False — donation lets XLA alias
            the params/opt-state update in place instead of writing a fresh
            copy.

Also prints a 30-step loss-trajectory max-delta for mu-bf16 vs f32 (both from
identical init) so the bytes win is tied to a measured training-equivalence
envelope in the same session.

Interleaved windows in one process cancel the tunnel's run-to-run variance.

Run (TPU): python benchmarks/optstate_ab.py [--model transunet] [--batches 64,128]
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
WINDOW = 32


def build(model_name, batch, mu_dtype, donate):
    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import losses, optim, step as step_mod

    common.set_compute_dtype("bfloat16")
    cfg = default_config(model_name)
    h, w = cfg.model.img_size
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, h, w, cfg.model.in_channels)),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(0, 2, size=(batch, h, w)), jnp.float32)
    tx = optim.make_direction(clip_norm=1.0, mu_dtype=mu_dtype)
    state = step_mod.TrainState.create(model, tx, x, jax.random.PRNGKey(0))
    step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                    augment=True, donate=donate)
    return state, step, x, y


def _warm(state, step, x, y):
    import jax.numpy as jnp
    lr = jnp.float32(1e-3)
    st, loss, _ = step(state, x, y, lr)
    float(loss)
    for _ in range(3):
        st, loss, _ = step(st, x, y, lr)
    float(loss)
    return st


def time_one_window(state, step, x, y):
    """Returns (evolved_state, seconds/step).  The caller must thread the
    evolved state into the next window: donate=True variants alias the
    input buffers, so a consumed TrainState cannot be reused."""
    import jax.numpy as jnp
    lr = jnp.float32(1e-3)
    st = state
    t0 = time.perf_counter()
    for _ in range(WINDOW):
        st, loss, _ = step(st, x, y, lr)
    float(loss)
    return st, (time.perf_counter() - t0) / WINDOW


def trajectory(state, step, x, y, n=30):
    import jax.numpy as jnp
    lr = jnp.float32(1e-3)
    losses_ = []
    st = state
    for _ in range(n):
        st, loss, _ = step(st, x, y, lr)
        losses_.append(float(loss))
    return losses_


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="transunet")
    ap.add_argument("--batches", default="64,128")
    ap.add_argument("--skip-traj", action="store_true")
    args = ap.parse_args()

    import jax

    for batch in (int(b) for b in args.batches.split(",")):
        variants = {
            "f32mu_nodonate": build(args.model, batch, None, False),
            "bf16mu_nodonate": build(args.model, batch, "bfloat16", False),
            "f32mu_donate": build(args.model, batch, None, True),
            "bf16mu_donate": build(args.model, batch, "bfloat16", True),
        }
        n_params = sum(int(np.prod(p.shape)) for p in
                       jax.tree_util.tree_leaves(variants["f32mu_nodonate"][0].params))
        # TRUE interleaving: one timing window per variant per round, so a
        # monotonic tunnel/thermal drift hits every variant equally (the
        # first run of this harness timed each variant's 6 windows in one
        # sequential block, which confounds later variants with drift).
        res, states = {}, {}
        for name, (state, step, x, y) in variants.items():
            states[name] = _warm(state, step, x, y)
            res[name] = float("inf")
        for _ in range(N_WINDOWS):
            for name, (_, step, x, y) in variants.items():
                states[name], dt = time_one_window(states[name], step, x, y)
                res[name] = min(res[name], dt)
        res = {k: round(v * 1e3, 3) for k, v in res.items()}
        out = {"model": args.model, "batch": batch, "n_params": n_params,
               **{f"{k}_ms": v for k, v in res.items()}}
        if not args.skip_traj and batch == 64:
            s_f, st_f, x_, y_ = variants["f32mu_nodonate"]
            s_b, st_b, _, _ = variants["bf16mu_nodonate"]
            tf_ = trajectory(s_f, st_f, x_, y_)
            tb_ = trajectory(s_b, st_b, x_, y_)
            out["traj_max_abs_dloss"] = round(
                max(abs(a - b) for a, b in zip(tf_, tb_)), 6)
            out["traj_final_f32mu"] = round(tf_[-1], 6)
            out["traj_final_bf16mu"] = round(tb_[-1], 6)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
