"""Localize the ViT train step's exposed headroom (round-4 roofline:
b128 measured 129.4 ms vs a 105.5 ms fusion-naive bytes ceiling and a
66 ms padded-MXU floor — the one family whose measured time exceeds even
the un-fused traffic estimate, BASELINE.md round-4 table).

Ablation (separately-jitted scalar-pull timings at the train batch):

  fwd            forward only (train=True, dropout keys fixed)
  fwd_bwd        value_and_grad of the loss (no optimizer)
  full_step      the production fused step (augment + label2vec + loss +
                 backward + clip + adam)
  fwd_bwd_fullremat
                 value_and_grad with the whole forward jax.checkpoint'ed:
                 saved-activation traffic ~0 at the cost of one extra
                 forward of FLOPs (the MXU is at 0.48, so recompute is
                 cheap if bytes are the binding term)

Component programs lose the full graph's fusion context; ratios between
adjacent rows are the signal, not absolute sums.

Run (TPU): python benchmarks/vit_train_ablation.py [--batch 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401

WINDOW = 24
REPEATS = 5


def _time(fn, *args):
    float(fn(*args))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(WINDOW - 1):
            fn(*args)
        out = float(fn(*args))
        best = min(best, (time.perf_counter() - t0) / WINDOW)
        del out
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import losses, optim, step as step_mod

    common.set_compute_dtype("bfloat16")
    cfg = default_config("vit")
    h, w = cfg.model.img_size
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, h, w, cfg.model.in_channels)),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(0, 2, size=(args.batch, h, w)), jnp.float32)
    yv = jax.nn.one_hot((y + 0.5).astype(jnp.int32), 3)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": key, "dropout": jax.random.PRNGKey(1)}, x[:1], True)
    params = variables["params"]

    res = {"model": "vit", "batch": args.batch}

    @jax.jit
    def fwd(params, x):
        out = model.apply({"params": params}, x, True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out.astype(jnp.float32))

    res["fwd_ms"] = round(_time(fwd, params, x), 3)
    print(json.dumps(res), flush=True)

    def ce(params, x):
        # train=True throughout: train=False routes attention through the
        # inference-only fused Pallas block, which is not differentiable
        # (dropout_rate is 0.0 in the vit config, so train=True only
        # selects the composed-XLA attention path the real step uses)
        out = model.apply({"params": params}, x, True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.sum(yv * logp, axis=-1))

    def _grad_scalar(g):
        # consume every grad leaf so the backward survives DCE (the 1e-30
        # weight keeps the reduction un-foldable but numerically invisible)
        return 1e-30 * sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree_util.tree_leaves(g))

    @jax.jit
    def fwd_bwd(params, x):
        l, g = jax.value_and_grad(lambda p: ce(p, x))(params)
        return l + _grad_scalar(g)

    res["fwd_bwd_ms"] = round(_time(fwd_bwd, params, x), 3)
    print(json.dumps(res), flush=True)

    @jax.jit
    def fwd_bwd_fullremat(params, x):
        # checkpoint the ENTIRE forward: backward saves only (params, x) and
        # re-runs the forward — the extreme point of the bytes-vs-FLOPs
        # trade (activation stores ~0, one extra forward of FLOPs)
        l, g = jax.value_and_grad(
            lambda p: jax.checkpoint(lambda q: ce(q, x))(p))(params)
        return l + _grad_scalar(g)

    res["fwd_bwd_fullremat_ms"] = round(_time(fwd_bwd_fullremat, params, x), 3)
    print(json.dumps(res), flush=True)

    # full production step for scale
    tx = optim.make_direction(clip_norm=1.0)
    state = step_mod.TrainState.create(model, tx, x[:1], key)
    step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                    augment=True, donate=False)
    lr = jnp.float32(1e-3)

    st, loss, _ = step(state, x, y, lr)
    float(loss)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(WINDOW):
            st, loss, _ = step(st, x, y, lr)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / WINDOW)
    res["full_step_ms"] = round(best * 1e3, 3)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
