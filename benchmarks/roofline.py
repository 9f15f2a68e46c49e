"""Speed-of-light accounting: XLA cost analysis vs measured time.

For each model family's inference forward (and optionally the fused train
step), pulls FLOPs and HBM bytes from the compiled executable's own
``cost_analysis()`` and compares the measured steady-state time against the
two hardware ceilings:

  t_flops = flops / peak_flops        (MXU-bound floor)
  t_bytes = bytes / peak_hbm_bw       (HBM-bound floor)
  speed-of-light = max(t_flops, t_bytes)

``sol_frac`` = SOL time / measured time (1.0 = the program runs at the
roofline; the binding resource is reported).  Peaks default to TPU v5e
(197 TFLOP/s bf16, 819 GB/s HBM) and are env-overridable
(PEAK_TFLOPS / PEAK_HBM_GBS) for other chips.

Interpretation caveat: XLA's ``bytes accessed`` sums operand+output bytes
per HLO op, which over-counts true HBM traffic when fusion keeps operands
in VMEM/registers — so ``sol_frac`` / ``hbm_util`` > 1.0 is possible and
means the program beats the naive every-byte-through-HBM floor (measured:
the flagship train step scores 1.18).  ``mxu_util`` (flops-side) has no
such slack: the flop count is exact, so it is a true utilization.

Usage: python benchmarks/roofline.py [--models transunet,...] [--batch 128]
       [--train] — one JSON row per model to stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401

PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", 197.0))   # v5e bf16
PEAK_HBM_GBS = float(os.environ.get("PEAK_HBM_GBS", 819.0))  # v5e


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return flops, byts


def _measure(callable_, args, window=16):
    # ``callable_`` must return a SCALAR: on this box's remote-device tunnel
    # ``jax.block_until_ready`` returns without waiting (measured 0.6 ms for
    # a 46 ms program), so the only reliable sync is pulling a scalar to the
    # host.  (np.asarray of the full output would instead drag tens of MB
    # through the tunnel and bill the transfer to device time.)
    float(callable_(*args))
    for _ in range(3):
        float(callable_(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(window - 1):
            callable_(*args)
        float(callable_(*args))
        best = min(best, (time.perf_counter() - t0) / window)
    return best


def _measure_train(step, state, x, y, lr, window=16):
    # Thread the TrainState through the chain: returning only the loss would
    # let XLA dead-code-eliminate the whole backward + optimizer update
    # (measured: a loss-only "train step" times within 15% of the forward).
    st, loss, _ = step(state, x, y, lr)
    for _ in range(3):
        st, loss, _ = step(st, x, y, lr)
    float(loss)  # scalar pull — see _measure for why block_until_ready won't do
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(window):
            st, loss, _ = step(st, x, y, lr)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / window)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models",
                    default="transunet,resnest_unet,vit,swin,mobileunet")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--train", action="store_true",
                    help="also analyze the fused train step (batch 64)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import losses, optim, step as step_mod

    for name in args.models.split(","):
        cfg = default_config(name)
        common.set_compute_dtype("bfloat16")
        model = build_model(cfg.model)
        h, w = cfg.model.img_size
        c = cfg.model.in_channels
        tx = (optim.make_dual_rate_direction() if name == "mobileunet"
              else optim.make_direction(clip_norm=1.0))
        state = step_mod.TrainState.create(
            model, tx, jnp.zeros((1, h, w, c), jnp.float32),
            jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)

        jobs = []
        b = args.batch
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
        fwd = step_mod.make_forward(model)
        # Cost analysis runs on the real forward; the measured program sums
        # the probs to a scalar for the host-pull sync (one extra pass over
        # the [B,H,W,C] output — well under 0.1 ms, and identical across
        # models).
        jobs.append(("infer", b, jax.jit(lambda xx: fwd(state, xx)),
                     jax.jit(lambda xx: jnp.sum(fwd(state, xx))), (x,), None))
        if args.train:
            bt = 64
            loss_fn = losses.get_loss(cfg.train.loss)
            tstep = step_mod.make_train_step(
                model, loss_fn, tx, num_classes=cfg.model.num_classes,
                augment=True, donate=False)
            xt = jnp.asarray(rng.normal(size=(bt, h, w, c)), jnp.float32)
            yt = jnp.asarray(
                rng.integers(0, cfg.model.num_classes, size=(bt, h, w)),
                jnp.float32)
            lr = jnp.float32(1e-3)
            jobs.append(("train", bt, tstep, tstep, (state, xt, yt, lr),
                         "thread"))

        for kind, bsz, jitted, timed, fargs, mode in jobs:
            compiled = jitted.lower(*fargs).compile()
            flops, byts = _cost(compiled)
            if mode == "thread":
                t = _measure_train(timed, *fargs)
            else:
                t = _measure(timed, fargs)
            t_fl = flops / (PEAK_TFLOPS * 1e12)
            t_by = byts / (PEAK_HBM_GBS * 1e9)
            sol = max(t_fl, t_by)
            print(json.dumps({
                "model": name, "kind": kind, "batch": bsz,
                "gflops_per_batch": round(flops / 1e9, 2),
                "gbytes_per_batch": round(byts / 1e9, 3),
                "arith_intensity": round(flops / max(byts, 1.0), 1),
                "bound": "flops" if t_fl >= t_by else "bytes",
                "sol_ms": round(sol * 1e3, 3),
                "measured_ms": round(t * 1e3, 3),
                "sol_frac": round(sol / t, 3),
                "mxu_util": round(t_fl / t, 3),
                "hbm_util": round(t_by / t, 3),
                "fps": round(bsz / t, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
