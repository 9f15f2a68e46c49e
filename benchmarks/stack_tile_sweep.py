"""Sweep the fused transformer-stack kernel's tile size and attention
flavor at the flagship serving shape (batch 256, seq 80, hidden 512).

Hypothesis (from roofline_components.py): the kernel's dominant cost is
per-grid-step weight streaming — each step re-reads the layer's ~6.3 MB of
weights, so at batch_per_step=4 the 8-layer stack at b256 streams ~3.2 GB
(~4 ms at HBM peak) against a ~0.4 GB activation floor.  Larger tiles
amortize that, but the masked-dense attention's wasted off-diagonal scores
grow ~T^2 — the per-element flavor (pallas_kernels._tblock_kernel
per_elem=True) removes the waste so T can grow.

For each (T, flavor): isolated 8-layer stack ms + full TransUNet forward ms
(env overrides UM_TPU_STACK_TILE / UM_TPU_STACK_PER_ELEM steer the model's
internal call; a fresh closure per config forces a re-trace).  Numerical
check: each config's stack output is compared against the composed XLA
encoder on the same params/input.

Run: python benchmarks/stack_tile_sweep.py [--batch 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401


def _time(fn, *args, window=8, repeats=5):
    float(fn(*args))  # compile + scalar-pull sync (tunnel-safe)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(window - 1):
            fn(*args)
        float(fn(*args))
        best = min(best, (time.perf_counter() - t0) / window)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--tiles", default="4,8,16,32")
    ap.add_argument("--flavors", default="masked,perelem",
                    help="comma subset of {masked,perelem}")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.transunet import Encoder, TransUNet
    from ultrasound_modeling_tpu.ops import pallas_kernels as pk

    common.set_compute_dtype("bfloat16")
    b = args.batch
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # -- isolated stack: params via the composed module, kernel called direct
    enc = Encoder(512, 4, 8, 2048, 0.0, attn_impl="xla")
    seq = jnp.asarray(rng.normal(size=(b, 80, 512)), jnp.float32)
    variables = jax.jit(enc.init, static_argnums=(2,))(key, seq, False)
    stacked = variables["params"]["blocks"]["block"]
    fin = variables["params"]["encoder_norm"]
    from ultrasound_modeling_tpu.models.transunet import TRANSFORMER_LN_EPS
    scale = 1.0 / float(np.sqrt(4))
    eps = TRANSFORMER_LN_EPS

    # composed XLA reference output for the numerical check
    ref_fn = jax.jit(lambda v, s: enc.apply(v, s, False))
    ref = np.asarray(ref_fn(variables, seq), np.float32)
    ref_scale = float(np.abs(ref).max())

    xb = seq.astype(jnp.bfloat16)

    def stack_fn(t, pe):
        @jax.jit
        def f(xx, st, fs, fb):
            out = pk.transformer_stack_fused(
                xx, st, 4, scale=scale, eps=eps, batch_per_step=t,
                final_ln=(fs, fb), per_elem=pe)
            return jnp.sum(out.astype(jnp.float32))

        @jax.jit
        def fval(xx, st, fs, fb):
            return pk.transformer_stack_fused(
                xx, st, 4, scale=scale, eps=eps, batch_per_step=t,
                final_ln=(fs, fb), per_elem=pe)
        return f, fval

    x_full = jnp.asarray(rng.normal(size=(b, 256, 80, 10)), jnp.float32)

    flavors = [f.strip() for f in args.flavors.split(",") if f.strip()]
    for pe in (False, True):
        if ("perelem" if pe else "masked") not in flavors:
            continue
        for t in (int(v) for v in args.tiles.split(",")):
            f, fval = stack_fn(t, pe)
            fargs = (xb, stacked, fin["scale"], fin["bias"])
            try:
                ms = _time(f, *fargs)
            except Exception as e:  # VMEM overflow etc.
                print(json.dumps({"tile": t, "per_elem": pe,
                                  "error": str(e)[:200]}), flush=True)
                continue
            got = np.asarray(fval(*fargs), np.float32)
            err = float(np.abs(got - ref).max()) / ref_scale
            # full forward with the model's internal call steered by env
            os.environ["UM_TPU_STACK_TILE"] = str(t)
            os.environ["UM_TPU_STACK_PER_ELEM"] = "1" if pe else "0"
            # 'pallas' literally: belt-and-braces.  Models now resolve
            # 'auto' at their gates (models/common.resolve_attn_impl), so
            # 'auto' would also work on a TPU host — the explicit literal
            # documents the historical bug (the first sweep's flat
            # full_forward column measured XLA for every config) and keeps
            # this sweep unambiguous on any platform.
            model = TransUNet(attn_impl="pallas")
            mv = jax.jit(model.init, static_argnums=(2,))(
                {"params": key, "dropout": jax.random.PRNGKey(1)},
                x_full, False)
            full = jax.jit(
                lambda v, a: jnp.sum(model.apply(v, a, False)
                                     .astype(jnp.float32)))
            full_ms = _time(full, mv, x_full)
            print(json.dumps({
                "tile": t, "per_elem": pe, "batch": b,
                "stack_ms": round(ms, 3),
                "full_forward_ms": round(full_ms, 3),
                "rel_err_vs_xla": round(err, 8),
            }), flush=True)


if __name__ == "__main__":
    main()
