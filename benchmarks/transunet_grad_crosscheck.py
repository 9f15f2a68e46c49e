"""TRAINING-step gradient cross-check: flagship TransUNet loss + parameter
gradients vs the reference's own TF GradientTape (reference:
VisionTransformer.py:235-245 train_step: CCE(label_smoothing=0.1,
reduction NONE) -> compute_average_loss -> tape.gradient).

Extends benchmarks/transunet_reference_crosscheck.py (forward parity) to the
training objective: with the SAME ported weights and input, the loss scalar
and EVERY parameter gradient must agree within f32 conditioning.  This
proves the whole differentiated program — forward, loss, and backward
(including the fused split-attention restructure's custom lowering and the
ConvTranspose kernels) — is numerically the reference's.

Radix-shared leaves: the reference's modular cardinal applies ONE conv per
branch position across all radix branches (ResNest.py:136-147), so its
gradient for that weight is the SUM over radix uses; our per-radix
parameters receive the partial gradients, and the check compares
``ours.sum(radix_axis)`` against the reference gradient for those leaves.

Run:  python benchmarks/transunet_grad_crosscheck.py
"""

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from transunet_reference_crosscheck import (  # noqa: E402
    H, W, IN_CH, build_reference, damp_qk, map_tconv, solve_tconv_mapping,
    tf_weights_to_flax)

# flax-path prefixes whose reference weight is shared across the radix axis
# (axis 1 of our [K, R, ...] stacked params)
_RADIX_SHARED_SUFFIXES = (
    "branch1_kernel", "branch1_bias", "branch1_norm_scale",
    "branch1_norm_bias", "branch2_kernel", "branch2_bias",
    "branch2_norm_scale", "branch2_norm_bias",
    "attn_dense2_kernel", "attn_dense2_bias")


def tf_loss_and_grads(net, tf, x, y):
    """Reference loss + gradients (VisionTransformer.py:225-245)."""
    cce = tf.keras.losses.CategoricalCrossentropy(
        label_smoothing=0.1, reduction="none")
    xt, yt = tf.constant(x), tf.constant(y)
    with tf.GradientTape() as tape:
        with contextlib.redirect_stdout(io.StringIO()):
            logits, _ = net.forward(xt)
        per_example = cce(yt, logits)
        loss = tf.nn.compute_average_loss(per_example,
                                          global_batch_size=x.shape[0])
    variables = tape.watched_variables()
    grads = tape.gradient(loss, variables)
    by_ref = {v.ref(): g for v, g in zip(variables, grads)}
    return float(loss), by_ref


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, IN_CH)).astype(np.float32)
    # soft 3-class target like label2vec output (rows sum to 1)
    raw = rng.uniform(size=(2, H, W, 3)).astype(np.float32)
    y = raw / raw.sum(-1, keepdims=True)

    net, tf = build_reference(x)
    damp_qk(net)
    # Also damp the softmax head: random-init logits saturate the output
    # (probs down to 1e-10), and the loss's 1e-7 clip then zeroes gradients
    # per-pixel — pixels near the cutoff flip membership between the two
    # stacks (forward agreement is ~1e-5) and y/p there is ~1e5, amplifying
    # rounding into percent-level gradient noise that says nothing about
    # architecture.  Small logits keep every pixel in the smooth regime.
    net.decoder.head.kernel.assign(net.decoder.head.kernel * 0.05)
    ref_loss, ref_grad_by_ref = tf_loss_and_grads(net, tf, x, y)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.transunet import TransUNet
    from ultrasound_modeling_tpu.train.losses import cce_smooth
    from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz

    tconv_mapping = solve_tconv_mapping(tf)
    model = TransUNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    flat_w = tf_weights_to_flax(net, model.radix, model.kpaths, tconv_mapping)
    np.savez("/tmp/transunet_ref_weights.npz", **flat_w)
    params, loaded, missing = load_params_npz(
        variables["params"], "/tmp/transunet_ref_weights.npz")

    def loss_fn(p, xx, yy):
        probs = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            xx, False)
        return cce_smooth(yy, probs)

    def loss_and_grads(dtype):
        p = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), dtype), params)
        loss, grads = jax.value_and_grad(loss_fn)(
            p, jnp.asarray(x, dtype), jnp.asarray(y, dtype))
        return float(loss), grads

    our_loss, our_grads = loss_and_grads(jnp.float32)

    # f32-conditioning yardstick on the gradients themselves
    jax.config.update("jax_enable_x64", True)
    try:
        _, our_grads64 = loss_and_grads(jnp.float64)
    finally:
        jax.config.update("jax_enable_x64", False)

    # Reference gradients emitted in our tree layout via the SAME value
    # mapping: temporarily assign each variable its own gradient, run the
    # mapping (which reads values), then restore — robust against Keras-3
    # Variable wrapper types, no proxying needed.
    watched, saved = [], []
    for v, g in ref_grad_by_ref.items():
        var = v.deref()
        watched.append((var, g))
        saved.append(np.asarray(var))
    try:
        for var, g in watched:
            var.assign(np.zeros(var.shape, np.float32) if g is None
                       else np.asarray(g))
        flat_g_ref = tf_weights_to_flax(net, model.radix, model.kpaths,
                                        tconv_mapping)
    finally:
        for (var, _), val in zip(watched, saved):
            var.assign(val)

    from flax.traverse_util import flatten_dict
    ours_flat = {"/".join(k): np.asarray(v)
                 for k, v in flatten_dict(our_grads).items()}
    ours64_flat = {"/".join(k): np.asarray(v)
                   for k, v in flatten_dict(our_grads64).items()}

    # Per-leaf RELATIVE agreement (diff / max|g_ref|).  Two independently
    # rounded f32 backprops through 30+ layers differ by ~1e-4 relative
    # even when semantically identical (each stack's own f32-vs-f64
    # rounding is ~1e-5 and error directions decorrelate and amplify
    # through the norm layers); a STRUCTURAL divergence (wrong eps, a
    # missing term) shows up as >1e-2 on specific leaves.
    # Global gradient scale for flooring the per-leaf denominator: leaves
    # with an ANALYTICALLY ZERO gradient — attention key_bias, whose
    # per-row score shift cancels in the softmax (both stacks produce pure
    # rounding noise around 0; the reference's key bias is a dead
    # parameter) — would otherwise divide noise by noise.
    global_scale = max(
        float(np.abs(np.asarray(g)).max()) for g in flat_g_ref.values())
    rels, own_rels = [], []
    worst = {"path": None, "rel": 0.0}
    structural = []
    for path, g_ref in flat_g_ref.items():
        g_ours = ours_flat[path]
        g_ours64 = ours64_flat[path]
        if path.split("/")[-1] in _RADIX_SHARED_SUFFIXES:
            # reference grad = sum over radix uses; mapping replicated it
            # over axis 1, so row 0 is the reference value
            g_ref = np.asarray(g_ref)[:, 0]
            g_ours = g_ours.sum(axis=1)
            g_ours64 = g_ours64.sum(axis=1)
        scale = max(float(np.abs(g_ref).max()), 1e-7 * global_scale)
        rel = float(np.abs(g_ours - g_ref).max()) / scale
        own = float(np.abs(g_ours64 - g_ours).max()) / scale
        rels.append(rel)
        own_rels.append(own)
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
