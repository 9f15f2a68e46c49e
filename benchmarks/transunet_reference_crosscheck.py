"""Numerical cross-check: this framework's flagship TransUNet vs the
reference's own TensorFlow implementation (reference: VisionTransformer.py,
ResNest.py, Decoder.py).

Same method as benchmarks/vit_reference_crosscheck.py, extended to the full
hybrid model: build the REFERENCE VisionTransformer from /root/reference
(import-only, CPU, Keras-3 compat shims), copy its random-init weights into
the Flax TransUNet parameter tree, and compare forward probabilities on the
same input.  Agreement within f32-conditioning tolerance proves the two
stacks are numerically the same function — encoder (incl. the fused
split-attention restructure), transformer, and decoder together.

Weight-mapping notes (all reference: file:line):
* The reference's modular `cardinal` builds ONE conv1/conv2 object and calls
  it for every radix branch (ResNest.py:136-147 — the weight-sharing defect
  SURVEY §2.12 documents), and `split_attention.dense2` is likewise one
  object applied per radix (ResNest.py:186-197).  This framework implements
  the standalone's per-radix-weights intent, so the shared reference weight
  is REPLICATED across our radix axis — which makes the two functions equal.
* Keras Conv2DTranspose kernels are [kh, kw, out, in] with gradient-of-conv
  semantics; the flax ConvTranspose mapping (spatial flip + channel swap vs
  plain swap) is determined EMPIRICALLY at runtime by matching a probe layer,
  so the script is self-validating against convention drift.
* q/k kernels are damped x0.05 in BOTH models (softmax of random-init scores
  saturates and amplifies f32 rounding chaotically — see the ViT harness).

Run:  python benchmarks/transunet_reference_crosscheck.py
"""

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 256, 80
IN_CH = 10


def build_reference(x):
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    sys.path.insert(0, "/root/reference")
    import tensorflow as tf

    # Keras 3 compat (same as benchmarks/cpu_baseline.py): bare
    # AveragePooling2D() lost its pool_size default.
    _AvgPool = tf.keras.layers.AveragePooling2D

    class AvgPoolCompat(_AvgPool):
        def __init__(self, pool_size=(2, 2), *a, **k):
            super().__init__(pool_size, *a, **k)

    tf.keras.layers.AveragePooling2D = AvgPoolCompat

    import VisionTransformer as ref_vt  # noqa: N813

    # Keras 3 cannot trace the functional visionModel; we only need the
    # module tree + eager forward.
    ref_vt.VisionTransformer.model = lambda self: None
    net = ref_vt.VisionTransformer(2, (H, W), 3)
    with contextlib.redirect_stdout(io.StringIO()):
        net.forward(tf.constant(x))  # build all variables
    return net, tf


def damp_qk(net, factor=0.05):
    for blk in net.transformer.encoder.Transformer_layers:
        for name in ("query", "key"):
            layer = getattr(blk.attn, name)
            layer.kernel.assign(layer.kernel * factor)


def solve_tconv_mapping(tf):
    """Empirically determine the Keras->flax ConvTranspose kernel mapping."""
    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.common import conv_transpose

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, 10, 4)).astype(np.float32)
    ktf = rng.normal(size=(3, 3, 6, 4)).astype(np.float32)  # [h,w,out,in]
    lyr = tf.keras.layers.Conv2DTranspose(6, 3, strides=2, padding="same",
                                          use_bias=False)
    lyr.build((1, 8, 10, 4))
    lyr.kernel.assign(ktf)
    want = np.asarray(lyr(tf.constant(x)))

    fl = conv_transpose(6, 3, 2, use_bias=False)
    candidates = {
        "swap": np.transpose(ktf, (0, 1, 3, 2)),
        "flip_swap": np.transpose(ktf[::-1, ::-1], (0, 1, 3, 2)),
    }
    for tag, k in candidates.items():
        v = {"params": {"kernel": jnp.asarray(k)}}
        got = np.asarray(fl.apply(v, jnp.asarray(x)))
        if got.shape == want.shape and np.allclose(got, want, atol=1e-5):
            return tag
    raise AssertionError("no ConvTranspose kernel mapping matched")


def map_tconv(ktf, mapping):
    if mapping == "swap":
        return np.transpose(np.asarray(ktf), (0, 1, 3, 2))
    return np.transpose(np.asarray(ktf)[::-1, ::-1], (0, 1, 3, 2))


def tf_weights_to_flax(net, radix, kpaths, tconv_mapping) -> dict:
    """Reference module tree -> '/'-joined paths of the TransUNet tree."""
    out = {}

    def put(path, var):
        out[path] = np.asarray(var)

    # ---- hybrid ResNeSt encoder (ResNest.py:14-36) -------------------
    hyb = net.transformer.embeddings.hybrid_model
    put("hybrid/initial_conv/kernel", hyb.conv1.kernel)
    put("hybrid/initial_conv/bias", hyb.conv1.bias)
    for nm in ("convtmp_1", "convtmp_2"):
        lyr = getattr(hyb, nm)
        bn = getattr(hyb, nm + "bn")
        put(f"hybrid/{nm}/kernel", lyr.kernel)
        put(f"hybrid/{nm}/bias", lyr.bias)
        put(f"hybrid/{nm}bn/BatchNorm_0/scale", bn.gamma)
        put(f"hybrid/{nm}bn/BatchNorm_0/bias", bn.beta)

    for s, stage in enumerate((hyb.conv_1, hyb.conv_2, hyb.conv_3,
                               hyb.conv_4), start=1):
        p = f"hybrid/stage{s}"
        # per-kpath cardinal blocks; the ONE conv per cardinal is
        # replicated across our radix axis (see module docstring).
        k1 = np.stack([
            np.stack([np.asarray(cb.conv1.kernel)] * radix)
            for cb in stage.cardinal_blocks])           # [K,R,1,1,cin,c11]
        put(f"{p}/branch1_kernel", k1)
        put(f"{p}/branch1_bias", np.stack([
            np.stack([np.asarray(cb.conv1.bias)] * radix)
            for cb in stage.cardinal_blocks]))
        put(f"{p}/branch1_norm_scale", np.stack([
            np.stack([np.asarray(cb.conv1_bn.gamma)] * radix)
            for cb in stage.cardinal_blocks]))
        put(f"{p}/branch1_norm_bias", np.stack([
            np.stack([np.asarray(cb.conv1_bn.beta)] * radix)
            for cb in stage.cardinal_blocks]))
        put(f"{p}/branch2_kernel", np.stack([
            np.stack([np.asarray(cb.conv2.kernel)] * radix)
            for cb in stage.cardinal_blocks]))
        put(f"{p}/branch2_bias", np.stack([
            np.stack([np.asarray(cb.conv2.bias)] * radix)
            for cb in stage.cardinal_blocks]))
        put(f"{p}/branch2_norm_scale", np.stack([
            np.stack([np.asarray(cb.conv2_bn.gamma)] * radix)
            for cb in stage.cardinal_blocks]))
        put(f"{p}/branch2_norm_bias", np.stack([
            np.stack([np.asarray(cb.conv2_bn.beta)] * radix)
            for cb in stage.cardinal_blocks]))
        # split attention: dense1 per kpath; dense2 shared across radix.
        put(f"{p}/attn_dense1_kernel", np.stack([
            np.asarray(cb.split.dense1.kernel)[0, 0]
            for cb in stage.cardinal_blocks]))          # [K,ckk,ckk//2]
        put(f"{p}/attn_dense1_bias", np.stack([
            np.asarray(cb.split.dense1.bias)
            for cb in stage.cardinal_blocks]))
        put(f"{p}/attn_norm_scale", np.stack([
            np.asarray(cb.split.dense1_bn.gamma)
            for cb in stage.cardinal_blocks]))
        put(f"{p}/attn_norm_bias", np.stack([
            np.asarray(cb.split.dense1_bn.beta)
            for cb in stage.cardinal_blocks]))
        put(f"{p}/attn_dense2_kernel", np.stack([
            np.stack([np.asarray(cb.split.dense2.kernel)[0, 0]] * radix)
            for cb in stage.cardinal_blocks]))          # [K,R,ckk//2,ckk]
        put(f"{p}/attn_dense2_bias", np.stack([
            np.stack([np.asarray(cb.split.dense2.bias)] * radix)
            for cb in stage.cardinal_blocks]))
        put(f"{p}/concat_conv/kernel", stage.concats_2.kernel)
        put(f"{p}/concat_conv/bias", stage.concats_2.bias)
        put(f"{p}/shortcut_conv/kernel", stage.convtmp_sc.kernel)
        put(f"{p}/shortcut_conv/bias", stage.convtmp_sc.bias)
        put(f"{p}/shortcut_norm/LayerNorm_0/scale", stage.convtmp_scbn.gamma)
        put(f"{p}/shortcut_norm/LayerNorm_0/bias", stage.convtmp_scbn.beta)

    # ---- patch embed + transformer (VisionTransformer.py:81-190) -----
    pe = net.transformer.embeddings.patch_embeddings
    put("patch_embeddings/kernel", pe.kernel)
    put("patch_embeddings/bias", pe.bias)
    blocks = net.transformer.encoder.Transformer_layers
    stack = lambda f: np.stack([np.asarray(f(b)) for b in blocks])
    put("encoder/blocks/block/attention_norm/scale",
        stack(lambda b: b.attention_norm.gamma))
    put("encoder/blocks/block/attention_norm/bias",
        stack(lambda b: b.attention_norm.beta))
    put("encoder/blocks/block/ffn_norm/scale",
        stack(lambda b: b.ffn_norm.gamma))
    put("encoder/blocks/block/ffn_norm/bias",
        stack(lambda b: b.ffn_norm.beta))
    for nm in ("query", "key", "value", "out"):
        put(f"encoder/blocks/block/attn/{nm}_kernel",
            stack(lambda b, nm=nm: getattr(b.attn, nm).kernel))
        put(f"encoder/blocks/block/attn/{nm}_bias",
            stack(lambda b, nm=nm: getattr(b.attn, nm).bias))
    put("encoder/blocks/block/ffn/fc1/kernel", stack(lambda b: b.ffn.fc1.kernel))
    put("encoder/blocks/block/ffn/fc1/bias", stack(lambda b: b.ffn.fc1.bias))
    put("encoder/blocks/block/ffn/fc2/kernel", stack(lambda b: b.ffn.fc2.kernel))
    put("encoder/blocks/block/ffn/fc2/bias", stack(lambda b: b.ffn.fc2.bias))
    put("encoder/encoder_norm/scale", net.transformer.encoder.encoder_norm.gamma)
    put("encoder/encoder_norm/bias", net.transformer.encoder.encoder_norm.beta)

    # ---- decoder (Decoder.py:7-146) ----------------------------------
    dec = net.decoder
    put("decoder/conv_more/kernel", dec.conv_more.kernel)
    put("decoder/conv_more/bias", dec.conv_more.bias)
    put("decoder/bn1/LayerNorm_0/scale", dec.bn1.gamma)
    put("decoder/bn1/LayerNorm_0/bias", dec.bn1.beta)
    for i, blk in enumerate(dec.blocks):
        p = f"decoder/block_{i}"
        put(f"{p}/up/kernel", map_tconv(blk.up.kernel, tconv_mapping))
        put(f"{p}/up/bias", blk.up.bias)
        for stage in (1, 2):
            for b in range(4):
                conv = getattr(blk, f"conv{stage}_{b}")
                bn = getattr(blk, f"bn{stage}_{b}")
                put(f"{p}/conv{stage}_{b}/kernel", conv.kernel)
                put(f"{p}/conv{stage}_{b}/bias", conv.bias)
                put(f"{p}/bn{stage}_{b}/BatchNorm_0/scale", bn.gamma)
                put(f"{p}/bn{stage}_{b}/BatchNorm_0/bias", bn.beta)
    put("decoder/head/kernel", map_tconv(dec.head.kernel, tconv_mapping))
    put("decoder/head/bias", dec.head.bias)
    return out


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, IN_CH)).astype(np.float32)

    net, tf = build_reference(x)
    with contextlib.redirect_stdout(io.StringIO()):
        raw_probs = np.asarray(net.forward(tf.constant(x))[0])
        damp_qk(net)
        ref_probs = np.asarray(net.forward(tf.constant(x))[0])

    import jax

    # Force the CPU backend through jax.config — the axon sitecustomize
    # overrides the JAX_PLATFORMS env var at register() time.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.transunet import TransUNet
    from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz

    tconv_mapping = solve_tconv_mapping(tf)
    model = TransUNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    flat = tf_weights_to_flax(net, model.radix, model.kpaths, tconv_mapping)
    np.savez("/tmp/transunet_ref_weights.npz", **flat)
    params, loaded, missing = load_params_npz(
        variables["params"], "/tmp/transunet_ref_weights.npz")
    # batch_stats: both sides sit at init (mean 0, var 1) — nothing to port.
    ours = np.asarray(model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), False))

    # f32-conditioning yardstick: the SAME flax function in f64 vs f32.
    jax.config.update("jax_enable_x64", True)
    try:
        params64 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
        stats64 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64),
            variables["batch_stats"])
        ours64 = np.asarray(model.apply(
            {"params": params64, "batch_stats": stats64},
            jnp.asarray(x, jnp.float64), False))
    finally:
        jax.config.update("jax_enable_x64", False)
    self_rounding = float(np.abs(ours64 - ours).max())

    diff = np.abs(ours - ref_probs)
    result = {
        "tconv_mapping": tconv_mapping,
        "loaded": len(loaded), "missing": missing,
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "ref_prob_range": [float(ref_probs.min()), float(ref_probs.max())],
        "flax_f32_vs_f64_max_abs": self_rounding,
        "tf_diff_within_3x_f32_conditioning":
            bool(diff.max() <= 3 * max(self_rounding, 1e-7)),
        "raw_prob_absmax": float(np.abs(raw_probs).max()),
        "note": "q/k kernels damped x0.05 in BOTH models (see ViT harness); "
                "reference's shared-per-cardinal radix weights replicated "
                "across our per-radix axis (ResNest.py:136-147 defect -> "
                "equal functions)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
