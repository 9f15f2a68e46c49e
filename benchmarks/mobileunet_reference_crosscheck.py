"""Numerical cross-check: this framework's MobileNetV2 U-Net vs the
reference's own TensorFlow implementation (reference: TBIPixelCNN.py).

TBIPixelCNN.py is a module-level script (it loads /data/... and trains at
import), so this harness execs only the model-building prefix (everything
before ``def my_loss_cat``) with ``np.load`` stubbed to a tiny zeros array,
builds ``unet_model(3)``, ports its random-init weights into the Flax
MobileUNet tree, and compares forward probabilities.

Normalized divergence (documented in PARITY.md): the reference's
``LeakyReLU(6.)`` at TBIPixelCNN.py:52,92 passes 6.0 as the LEAKY SLOPE — a
latent typo for ReLU(6.) (the max-value form used at :115,:130).  This
framework implements the ReLU6 intent, so the harness substitutes
``ReLU(6.)`` for ``LeakyReLU(6.)`` in the reference before building (gated
on alpha == 6.0; every other layer runs the reference's code unmodified).

The reference's dead 5th upsample (zip truncation, TBIPixelCNN.py:208-211)
has weights but is never called; it is simply not ported.

Run:  python benchmarks/mobileunet_reference_crosscheck.py
"""

import contextlib
import io
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 256, 64
IN_CH = 15


def build_reference_patched(x):
    """exec the reference's model-building prefix with np.load stubbed."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import tensorflow as tf

    _LeakyReLU = tf.keras.layers.LeakyReLU

    def leaky_compat(alpha=0.3, *a, **k):
        if float(alpha) == 6.0:
            return tf.keras.layers.ReLU(6.0, name=k.get("name"))
        return _LeakyReLU(alpha, *a, **k)

    tf.keras.layers.LeakyReLU = leaky_compat

    if "IPython" not in sys.modules:
        stub = types.ModuleType("IPython")
        stub.display = types.ModuleType("display")
        sys.modules["IPython"] = stub

    src = open("/root/reference/TBIPixelCNN.py").read()
    prefix = src[: src.index("def my_loss_cat")]

    # The prefix itself runs `import numpy as np`, so a namespace shim is
    # bypassed — temporarily patch np.load on the real module instead (the
    # script loads its /data/... archives at import; stub with tiny zeros).
    _orig_load = np.load

    def _stub_load(path, *a, **k):
        # archives are [N, 1, H, W, 16] (SURVEY data layouts); preProcess
        # gathers axis=3 of the per-element [1, H, W, 16].
        return np.zeros((2, 1, H, W, IN_CH + 1), np.float32)

    ns = {"__name__": "tbipixelcnn_prefix"}
    np.load = _stub_load
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            exec(compile(prefix, "/root/reference/TBIPixelCNN.py", "exec"), ns)
            unet = ns["unet_model"](3)
            probs = np.asarray(unet(tf.constant(x), training=False))
    finally:
        np.load = _orig_load
    return ns, unet, tf, probs


def solve_tconv_mapping(tf):
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.common import conv_transpose

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, 10, 4)).astype(np.float32)
    ktf = rng.normal(size=(3, 3, 6, 4)).astype(np.float32)
    lyr = tf.keras.layers.Conv2DTranspose(6, 3, strides=2, padding="same",
                                          use_bias=False)
    lyr.build((1, 8, 10, 4))
    lyr.kernel.assign(ktf)
    want = np.asarray(lyr(tf.constant(x)))
    fl = conv_transpose(6, 3, 2, use_bias=False)
    for tag, k in (("swap", np.transpose(ktf, (0, 1, 3, 2))),
                   ("flip_swap",
                    np.transpose(ktf[::-1, ::-1], (0, 1, 3, 2)))):
        got = np.asarray(fl.apply({"params": {"kernel": jnp.asarray(k)}},
                                  jnp.asarray(x)))
        if got.shape == want.shape and np.allclose(got, want, atol=1e-5):
            return tag
    raise AssertionError("no ConvTranspose kernel mapping matched")


def map_tconv(ktf, mapping):
    k = np.asarray(ktf)
    if mapping == "swap":
        return np.transpose(k, (0, 1, 3, 2))
    return np.transpose(k[::-1, ::-1], (0, 1, 3, 2))


def tf_weights_to_flax(ns, unet, tconv_mapping) -> dict:
    out = {}
    base = ns["base_model"]

    def put(path, var):
        out[path] = np.asarray(var)

    def put_bn(path, bn):
        put(f"{path}/BatchNorm_0/scale", bn.gamma)
        put(f"{path}/BatchNorm_0/bias", bn.beta)

    g = base.get_layer
    put("encoder/conv1/kernel", g("Conv1").kernel)
    put("encoder/conv1/bias", g("Conv1").bias)
    for i in range(16):
        p = f"encoder/block_{i}"
        pre = f"block_{i}_" if i else "expanded_conv_"
        if i:
            put(f"{p}/expand/kernel", g(f"block_{i}_expand").kernel)
            put_bn(f"{p}/expand_bn", g(f"conv_dw_{i}_bn"))
        dw = g(pre + "depthwise")
        # Keras DepthwiseConv2D kernel [kh,kw,C,1] -> flax grouped conv
        # kernel [kh,kw,1,C].
        put(f"{p}/depthwise/kernel",
            np.transpose(np.asarray(dw.kernel), (0, 1, 3, 2)))
        put_bn(f"{p}/depthwise_bn", g(f"conv_pw_{i}_bn"))
        put(f"{p}/project/kernel", g(pre + "project").kernel)
    put("encoder/conv_2/kernel", g("Conv_2").kernel)

    # decoder: the 4 LIVE upsample Sequentials (the 5th is dead code).
    for i, seq in enumerate(ns["up_stack"][:4]):
        tconv, bn = seq.layers[0], seq.layers[1]
        put(f"decoder_up_{i}/t_conv/kernel",
            map_tconv(tconv.kernel, tconv_mapping))
        put_bn(f"decoder_up_{i}/bn", bn)
    head = unet.layers[-1]
    put("decoder_head/kernel", map_tconv(head.kernel, tconv_mapping))
    put("decoder_head/bias", head.bias)
    return out


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, IN_CH)).astype(np.float32)

    ns, unet, tf, ref_probs = build_reference_patched(x)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.mobileunet import MobileUNet
    from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz

    tconv_mapping = solve_tconv_mapping(tf)
    model = MobileUNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    flat = tf_weights_to_flax(ns, unet, tconv_mapping)
    np.savez("/tmp/mobileunet_ref_weights.npz", **flat)
    params, loaded, missing = load_params_npz(
        variables["params"], "/tmp/mobileunet_ref_weights.npz")
    ours = np.asarray(model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), False))

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
        "flax_f32_vs_f64_max_abs": self_rounding,
        "within_3x_f32_conditioning":
            bool(diff.max() <= 3 * max(self_rounding, 1e-7)),
        "note": "reference LeakyReLU(6.) normalized to ReLU(6.) intent in "
                "the TF build (PARITY.md latent-typo entry); dead 5th "
                "upsample not ported (never called)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
