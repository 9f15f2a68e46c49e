"""TRAINING gradient cross-check for the pure ViT: loss + parameter
gradients vs the reference's own TF tape (reference: TBI_Transformer.py:
226-245 step — plain Keras CategoricalCrossentropy, mean over all pixels).

Companion to benchmarks/transunet_grad_crosscheck.py; the ViT case also
cements the c2 = 0 finding: not only the forward (vit_reference_crosscheck)
but the training DYNAMICS are numerically the reference's, so neither stack
can learn the bleed class where the other could.

The reference loss also adds sum(model.losses) (the l2(1e-5) kernel
regularizers); its gradient is the trivial 2*l2*w term, omitted here so the
check isolates the network backward (the regularizer is value-tested in
test_losses).  q/k and head kernels are damped x0.05 in BOTH stacks to keep
softmax + the CCE clip in the smooth regime (see the TransUNet harness).

Run:  python benchmarks/vit_grad_crosscheck.py
"""

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vit_reference_crosscheck import (  # noqa: E402
    H, W, IN_CH, build_reference, damp_qk, tf_weights_to_flax)


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, IN_CH)).astype(np.float32)
    raw = rng.uniform(size=(2, H, W, 3)).astype(np.float32)
    y = raw / raw.sum(-1, keepdims=True)

    t = build_reference(x)
    damp_qk(t)
    t.head.kernel.assign(t.head.kernel * 0.05)

    import tensorflow as tf

    cce = tf.keras.losses.CategoricalCrossentropy()  # mean over B*H*W
    with tf.GradientTape() as tape:
        with contextlib.redirect_stdout(io.StringIO()):
            probs = t(tf.constant(x))
        ref_loss_t = cce(tf.constant(y), probs)
    variables = tape.watched_variables()
    grads = tape.gradient(ref_loss_t, variables)
    ref_loss = float(ref_loss_t)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.vit import ViTSegmenter
    from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz

    model = ViTSegmenter()
    params0 = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))["params"]
    np.savez("/tmp/vit_ref_weights.npz", **tf_weights_to_flax(t))
    params, loaded, missing = load_params_npz(params0,
                                              "/tmp/vit_ref_weights.npz")

    def loss_fn(p, xx, yy):
        probs = model.apply({"params": p}, xx)
        pc = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
        return jnp.mean(-jnp.sum(yy * jnp.log(pc), axis=-1))

    def loss_and_grads(dtype):
        p = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), dtype), params)
        return jax.value_and_grad(loss_fn)(
            p, jnp.asarray(x, dtype), jnp.asarray(y, dtype))

    our_loss_t, our_grads = loss_and_grads(jnp.float32)
    our_loss = float(our_loss_t)
    jax.config.update("jax_enable_x64", True)
    try:
        _, our_grads64 = loss_and_grads(jnp.float64)
    finally:
        jax.config.update("jax_enable_x64", False)

    # emit reference grads in our layout via the value mapping:
    # assign-grads-then-map-then-restore (see the TransUNet harness)
    watched = list(zip(variables, grads))
    saved = [np.asarray(v) for v, _ in watched]
    try:
        for v, g in watched:
            v.assign(np.zeros(v.shape, np.float32) if g is None
                     else np.asarray(g))
        flat_g_ref = tf_weights_to_flax(t)
    finally:
        for (v, _), val in zip(watched, saved):
            v.assign(val)

    from flax.traverse_util import flatten_dict
    ours_flat = {"/".join(k): np.asarray(v)
                 for k, v in flatten_dict(our_grads).items()}
    ours64_flat = {"/".join(k): np.asarray(v)
                   for k, v in flatten_dict(our_grads64).items()}

    global_scale = max(
        float(np.abs(np.asarray(g)).max()) for g in flat_g_ref.values())
    rels, own_rels, structural = [], [], []
    worst = {"path": None, "rel": 0.0}
    for path, g_ref in flat_g_ref.items():
        g_ours = ours_flat[path]
        g_ours64 = ours64_flat[path]
        g_ref = np.asarray(g_ref)
        # key_bias gradient is analytically zero (softmax row-shift
        # invariance) — floor the denominator so noise/noise doesn't alarm
        scale = max(float(np.abs(g_ref).max()), 1e-7 * global_scale)
        rel = float(np.abs(g_ours - g_ref).max()) / scale
        own_rels.append(float(np.abs(g_ours64 - g_ours).max()) / scale)
        rels.append(rel)
        if rel > worst["rel"]:
            worst = {"path": path, "rel": rel}
        if rel > 1e-2:
            structural.append({"path": path, "rel": rel})

    rels = np.array(rels)
    result = {
        "loaded": len(loaded), "missing": missing,
        "ref_loss": ref_loss, "our_loss": our_loss,
        "loss_rel_diff": abs(ref_loss - our_loss) / abs(ref_loss),
        "grad_leaves_checked": len(rels),
        "grad_rel_median": float(np.median(rels)),
        "grad_rel_p90": float(np.percentile(rels, 90)),
        "grad_rel_max": worst,
        "own_f32_rounding_rel_median": float(np.median(own_rels)),
        "structural_divergences_gt_1pct": structural,
        "no_structural_divergence": not structural,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
