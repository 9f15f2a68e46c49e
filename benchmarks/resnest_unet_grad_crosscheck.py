"""Gradient cross-check for the standalone ResNeSt U-Net vs the
reference's own TF tape (reference: TBI_ResNest.py, built eagerly — see
benchmarks/resnest_unet_reference_crosscheck.py; the tape wraps the whole
eager build since the forward executes during construction).

Objective: ``sum(probs * R)`` for a fixed random per-class R — a smooth
surrogate exercising every weight's backward (per-radix split attention,
BatchNorm-in-eval, 5 transposed-conv upsamples) without the CCE clip in
the path.

Run:  python benchmarks/resnest_unet_grad_crosscheck.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _grad_check_util import (  # noqa: E402
    compare_grad_trees, flatten_grads, grads_via_value_mapping)
from resnest_unet_reference_crosscheck import (  # noqa: E402
    H, IN_CH, KPATHS, RADIX, W, build_reference, recorded_to_flax,
    solve_tconv_mapping)

_RADIX_SHARED = ()  # the standalone has genuinely per-radix weights


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, IN_CH)).astype(np.float32)
    r_vec = rng.normal(size=(3,)).astype(np.float32)

    recorded, tf, _, ref_loss, variables, grads = build_reference(
        x, grad_vector=r_vec)
    recorded = list(recorded)  # snapshot before the tconv probe layer

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.resnest import ResNeStUNet
    from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz

    tconv_mapping = solve_tconv_mapping(tf)
    model = ResNeStUNet(num_classes=3, ksize=3, radix=RADIX, kpaths=KPATHS)
    variables0 = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    np.savez("/tmp/resnest_unet_ref_weights.npz",
             **recorded_to_flax(recorded, tconv_mapping))
    params, loaded, missing = load_params_npz(
        variables0["params"], "/tmp/resnest_unet_ref_weights.npz")

    def loss_fn(p, xx):
        probs = model.apply(
            {"params": p, "batch_stats": variables0["batch_stats"]},
            xx, False)
        return jnp.sum(probs * jnp.asarray(r_vec, probs.dtype))

    def loss_and_grads(dtype):
        p = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), dtype), params)
        return jax.value_and_grad(loss_fn)(p, jnp.asarray(x, dtype))

    our_loss_t, our_grads = loss_and_grads(jnp.float32)
    jax.config.update("jax_enable_x64", True)
    try:
        _, our_grads64 = loss_and_grads(jnp.float64)
    finally:
        jax.config.update("jax_enable_x64", False)

    flat_g_ref = grads_via_value_mapping(
        variables, grads,
        lambda: recorded_to_flax(recorded, tconv_mapping))

    result = {
        "loaded": len(loaded), "missing": missing,
        "ref_loss": ref_loss, "our_loss": float(our_loss_t),
        "loss_rel_diff": abs(ref_loss - float(our_loss_t))
        / max(abs(ref_loss), 1e-12),
        **compare_grad_trees(flat_g_ref, flatten_grads(our_grads),
                             flatten_grads(our_grads64),
                             radix_shared_suffixes=_RADIX_SHARED),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
