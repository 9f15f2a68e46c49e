"""TRAINING gradient cross-check for the MobileNetV2 U-Net vs the
reference's own TF tape (reference model: TBIPixelCNN.py unet_model).

Objective: Keras CategoricalCrossentropy (mean over pixels) — the common
differentiable objective isolating the NETWORK backward (the reference's
own pixelcnn per-class loss family is value-golden-tested in test_losses).
The softmax head kernel is damped x0.05 in both stacks so the CCE clip
stays out of play (see the TransUNet harness for why).

Run:  python benchmarks/mobileunet_grad_crosscheck.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _grad_check_util import (  # noqa: E402
    compare_grad_trees, flatten_grads, grads_via_value_mapping)
from mobileunet_reference_crosscheck import (  # noqa: E402
    H, W, IN_CH, build_reference_patched, solve_tconv_mapping,
    tf_weights_to_flax)


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, IN_CH)).astype(np.float32)
    raw = rng.uniform(size=(2, H, W, 3)).astype(np.float32)
    y = raw / raw.sum(-1, keepdims=True)

    ns, unet, tf, _ = build_reference_patched(x)
    head = unet.layers[-1]
    head.kernel.assign(head.kernel * 0.05)

    cce = tf.keras.losses.CategoricalCrossentropy()
    with tf.GradientTape() as tape:
        probs = unet(tf.constant(x), training=False)
        ref_loss_t = cce(tf.constant(y), probs)
    variables = tape.watched_variables()
    grads = tape.gradient(ref_loss_t, variables)
    ref_loss = float(ref_loss_t)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.mobileunet import MobileUNet
    from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz

    tconv_mapping = solve_tconv_mapping(tf)
    model = MobileUNet()
    variables0 = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    np.savez("/tmp/mobileunet_ref_weights.npz",
             **tf_weights_to_flax(ns, unet, tconv_mapping))
    params, loaded, missing = load_params_npz(
        variables0["params"], "/tmp/mobileunet_ref_weights.npz")

    def loss_fn(p, xx, yy):
        probs = model.apply(
            {"params": p, "batch_stats": variables0["batch_stats"]},
            xx, False)
        pc = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
        return jnp.mean(-jnp.sum(yy * jnp.log(pc), axis=-1))

    def loss_and_grads(dtype):
        p = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), dtype), params)
        return jax.value_and_grad(loss_fn)(
            p, jnp.asarray(x, dtype), jnp.asarray(y, dtype))

    our_loss_t, our_grads = loss_and_grads(jnp.float32)
    jax.config.update("jax_enable_x64", True)
    try:
        _, our_grads64 = loss_and_grads(jnp.float64)
    finally:
        jax.config.update("jax_enable_x64", False)

    flat_g_ref = grads_via_value_mapping(
        variables, grads,
        lambda: tf_weights_to_flax(ns, unet, tconv_mapping))

    result = {
        "loaded": len(loaded), "missing": missing,
        "ref_loss": ref_loss, "our_loss": float(our_loss_t),
        "loss_rel_diff": abs(ref_loss - float(our_loss_t)) / abs(ref_loss),
        **compare_grad_trees(flat_g_ref, flatten_grads(our_grads),
                             flatten_grads(our_grads64)),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
