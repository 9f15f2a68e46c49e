"""Single-process A/B: flagship train step with the decoder stage BatchNorm
fused (one BN over the branch concat) vs the reference-shaped four per-branch
BatchNorms.  Interleaved timing windows in one process cancel the remote-
device tunnel's run-to-run variance (BASELINE.md notes +-10% across
processes).

Run on the TPU: python benchmarks/decoder_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
N_ITER = 20
N_WINDOWS = 6


def make_step(fuse_bn: bool):
    import jax
    import jax.numpy as jnp
    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import losses, optim, step as step_mod

    common.set_compute_dtype("bfloat16")
    cfg = default_config("transunet")
    h, w = cfg.model.img_size
    c = cfg.model.in_channels
    import dataclasses as dc
    model = build_model(cfg.model)
    model = dc.replace(model, decoder_fuse_bn=fuse_bn)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, h, w, c)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 2, size=(BATCH, h, w)), jnp.float32)
    tx = optim.make_direction(clip_norm=1.0)
    state = step_mod.TrainState.create(model, tx, x, jax.random.PRNGKey(0))
    step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                    augment=True, donate=False)
    return state, step, x, y


def main():
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401

    lr = jnp.float32(1e-3)
    sf, stepf, xf, yf = make_step(True)
    sb, stepb, xb, yb = make_step(False)
    float(stepf(sf, xf, yf, lr)[1])  # compile fused
    float(stepb(sb, xb, yb, lr)[1])  # compile branch
    best = {"fused": float("inf"), "branch": float("inf")}
    for w in range(N_WINDOWS):
        for tag, (s0, step, x, y) in (("fused", (sf, stepf, xf, yf)),
                                      ("branch", (sb, stepb, xb, yb))):
            t0 = time.perf_counter()
            s = s0
            loss = None
            for _ in range(N_ITER):
                s, loss, _ = step(s, x, y, lr)
            float(loss)
            dt = (time.perf_counter() - t0) / N_ITER * 1e3
            best[tag] = min(best[tag], dt)
            print(f"w{w} {tag}: {dt:.2f} ms", flush=True)
    d = (best["branch"] - best["fused"]) / best["branch"] * 100
    print(f"BEST fused={best['fused']:.2f} ms branch={best['branch']:.2f} ms "
          f"delta={d:.1f}%")


if __name__ == "__main__":
    main()
