"""Gradient cross-check for the Swin backbone vs the reference's own TF
tape (reference: SwinTransformer.py, same config constraints as
benchmarks/swin_reference_crosscheck.py — window (4,4) / 256x64 / depths
(2,2), the largest configuration the reference code can run).

Objective: ``sum(pooled_features * R)`` for a fixed random R — a smooth
surrogate that exercises every backbone weight's backward (patch embed,
window attention incl. shifted masks + relative-position bias, patch
merging, norms) without a saturating softmax/clip in the path.

Run:  python benchmarks/swin_grad_crosscheck.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _grad_check_util import (  # noqa: E402
    compare_grad_trees, flatten_grads, grads_via_value_mapping)
from swin_reference_crosscheck import (  # noqa: E402
    DEPTHS, EMBED, H, HEADS, IN_CH, W, WINDOW, build_reference,
    tf_weights_to_flax)


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, IN_CH)).astype(np.float32)

    m, tf, _, _ = build_reference(x)
    n_feat = int(EMBED * 2 ** (len(DEPTHS) - 1))
    r_vec = rng.normal(size=(n_feat,)).astype(np.float32)

    import contextlib
    import io

    with tf.GradientTape() as tape:
        with contextlib.redirect_stdout(io.StringIO()):
            pooled, _ = m(tf.constant(x))
        ref_loss_t = tf.reduce_sum(pooled * tf.constant(r_vec))
    variables = tape.watched_variables()
    grads = tape.gradient(ref_loss_t, variables)
    ref_loss = float(ref_loss_t)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.swin import SwinBackbone
    from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz

    model = SwinBackbone(img_size=(H, W), depths=DEPTHS, num_heads=HEADS,
                         window=WINDOW, drop_path_rate=0.0)
    variables0 = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    np.savez("/tmp/swin_ref_weights.npz", **tf_weights_to_flax(m))
    params, loaded, missing = load_params_npz(variables0["params"],
                                              "/tmp/swin_ref_weights.npz")

    def loss_fn(p, xx):
        final, _ = model.apply({"params": p}, xx, False)
        pooled = final.reshape(final.shape[0], -1, final.shape[-1]).mean(1)
        return jnp.sum(pooled * jnp.asarray(r_vec, pooled.dtype))

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
        variables, grads, lambda: tf_weights_to_flax(m))

    result = {
        "loaded": len(loaded), "missing": missing,
        "ref_loss": ref_loss, "our_loss": float(our_loss_t),
        "loss_rel_diff": abs(ref_loss - float(our_loss_t))
        / max(abs(ref_loss), 1e-12),
        **compare_grad_trees(flat_g_ref, flatten_grads(our_grads),
                             flatten_grads(our_grads64)),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
