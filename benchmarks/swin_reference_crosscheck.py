"""Numerical cross-check: this framework's Swin backbone vs the reference's
own TensorFlow implementation (reference: SwinTransformer.py).

Method as benchmarks/vit_reference_crosscheck.py: build the reference
SwinTransformerModel from /root/reference (import-only, CPU, Keras-3 compat
shims), port its random-init weights into the Flax SwinBackbone tree, and
compare forward features on the same input.

Configuration note — why window (4,4), img 256x64, depths (2,2):
* The reference's ``window_reverse`` (SwinTransformer.py:52-57) reshapes with
  ``W // window_size[0]`` and ``window_size[1], window_size[1]`` — broken for
  NON-SQUARE windows, so the module's own default ``window_size=[4,5]``
  crashes at runtime (reshape size mismatch; verified).  It only ever works
  with square windows.
* ``SwinTransformerBlock.__init__`` mutates the SHARED ``window_size`` list
  in place when a stage's resolution is small (SwinTransformer.py:172-175),
  retroactively changing already-built blocks' windows — avoided by keeping
  every stage resolution above the window (depths (2,2): 64x16 -> 32x8).
* With a square window the reference's shifted-mask slice quirk
  (SwinTransformer.py:193-198 uses window_size[0] AND [1] in both axes)
  also vanishes, so the reference code runs UNMODIFIED (Keras-3 shims only).
Both defects are §2.12-class latent bugs documented in PARITY.md; this
framework implements the intended (non-square-capable) semantics.

Run:  python benchmarks/swin_reference_crosscheck.py
"""

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 256, 64
IN_CH = 10
DEPTHS = (2, 2)
HEADS = (3, 6)
WINDOW = (4, 4)
EMBED = 96


def build_reference(x):
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    sys.path.insert(0, "/root/reference")
    import tensorflow as tf

    # Keras-3 shims: (a) TF2-era add_weight passed name positionally;
    # (b) '/' in layer names is now rejected.
    _orig_add_weight = tf.keras.layers.Layer.add_weight

    def add_weight_compat(self, *args, **kwargs):
        if args and isinstance(args[0], str):
            kwargs.setdefault("name", args[0].replace("/", "_"))
            args = args[1:]
        if isinstance(kwargs.get("name"), str):
            kwargs["name"] = kwargs["name"].replace("/", "_")
        return _orig_add_weight(self, *args, **kwargs)

    tf.keras.layers.Layer.add_weight = add_weight_compat

    from keras.src.ops import operation

    _orig_op_init = operation.Operation.__init__

    def op_init_compat(self, *args, **kwargs):
        if isinstance(kwargs.get("name"), str):
            kwargs["name"] = kwargs["name"].replace("/", "_")
        _orig_op_init(self, *args, **kwargs)

    operation.Operation.__init__ = op_init_compat

    import SwinTransformer as ref_swin  # noqa: N813

    with contextlib.redirect_stdout(io.StringIO()):
        m = ref_swin.SwinTransformerModel(
            model_name="swin_crosscheck", include_top=False,
            img_size=(H, W), patch_size=(4, 4), in_chans=IN_CH,
            embed_dim=EMBED, depths=list(DEPTHS), num_heads=list(HEADS),
            window_size=list(WINDOW), drop_rate=0.0, drop_path_rate=0.0)
        pooled, feats = m(tf.constant(x))
    return m, tf, np.asarray(pooled), [np.asarray(f) for f in feats]


def tf_weights_to_flax(m) -> dict:
    out = {}

    def put(path, var):
        out[path] = np.asarray(var)

    put("proj/kernel", m.patch_embed.proj.kernel)
    put("proj/bias", m.patch_embed.proj.bias)
    put("patch_norm/scale", m.patch_embed.norm.gamma)
    put("patch_norm/bias", m.patch_embed.norm.beta)
    for i, layer in enumerate(m.basic_layers):
        for d, blk in enumerate(layer.blocks):
            p = f"layer{i}_block{d}"
            put(f"{p}/norm1/scale", blk.norm1.gamma)
            put(f"{p}/norm1/bias", blk.norm1.beta)
            put(f"{p}/norm2/scale", blk.norm2.gamma)
            put(f"{p}/norm2/bias", blk.norm2.beta)
            put(f"{p}/attn/qkv_kernel", blk.attn.qkv.kernel)
            put(f"{p}/attn/qkv_bias", blk.attn.qkv.bias)
            put(f"{p}/attn/proj_kernel", blk.attn.proj.kernel)
            put(f"{p}/attn/proj_bias", blk.attn.proj.bias)
            put(f"{p}/attn/relative_position_bias_table",
                blk.attn.relative_position_bias_table)
            put(f"{p}/mlp_fc1/kernel", blk.mlp.fc1.kernel)
            put(f"{p}/mlp_fc1/bias", blk.mlp.fc1.bias)
            put(f"{p}/mlp_fc2/kernel", blk.mlp.fc2.kernel)
            put(f"{p}/mlp_fc2/bias", blk.mlp.fc2.bias)
        if layer.downsample is not None:
            put(f"layer{i}_downsample/norm/scale", layer.downsample.norm.gamma)
            put(f"layer{i}_downsample/norm/bias", layer.downsample.norm.beta)
            put(f"layer{i}_downsample/reduction/kernel",
                layer.downsample.reduction.kernel)
    put("norm/scale", m.norm.gamma)
    put("norm/bias", m.norm.beta)
    return out


def write_keras2_checkpoint(m, tf, path):
    """Write ``m``'s weights in the TF-2.4-Keras attribute-path object-graph
    layout the released Swin checkpoints carry
    (`basic_layers/0/blocks/0/attn/qkv/kernel/.ATTRIBUTES/VARIABLE_VALUE`).

    Keras 3 no longer registers plain python-list attributes
    (``self.basic_layers = []``, ``self.blocks = []`` —
    SwinTransformer.py:303,399) as ``tf.train.Checkpoint`` dependencies, so
    ``tf.train.Checkpoint(root=m).write`` silently drops every block (the
    first fixture run recorded exactly 6 stored weights: patch_embed + the
    final norm, the only direct-attribute layers).  The original release
    was saved by TF-2.4 Keras, where list tracking produced the indexed
    attribute paths — reproduce that object graph explicitly with
    AutoTrackable nodes.  Non-parameter buffers the real artifact also
    stores (relative_position_index, attn_mask) are included so the
    converter's skip patterns are exercised."""
    AT = tf.__internal__.tracking.AutoTrackable

    def node(**kw):
        n = AT()
        for k, v in kw.items():
            setattr(n, k, v)
        return n

    def var(t, trainable=True):
        return tf.Variable(tf.convert_to_tensor(t), trainable=trainable)

    def dense(layer, bias=True):
        kw = {"kernel": var(layer.kernel)}
        if bias:
            kw["bias"] = var(layer.bias)
        return node(**kw)

    def norm(layer):
        return node(gamma=var(layer.gamma), beta=var(layer.beta))

    root = AT()
    root.patch_embed = node(proj=dense(m.patch_embed.proj),
                            norm=norm(m.patch_embed.norm))
    root.norm = norm(m.norm)
    basic_layers = []
    for layer in m.basic_layers:
        ln = AT()
        blocks = []
        for blk in layer.blocks:
            attn = node(
                qkv=dense(blk.attn.qkv), proj=dense(blk.attn.proj),
                relative_position_bias_table=var(
                    blk.attn.relative_position_bias_table),
                relative_position_index=var(
                    blk.attn.relative_position_index, trainable=False))
            bn = node(norm1=norm(blk.norm1), norm2=norm(blk.norm2),
                      attn=attn,
                      mlp=node(fc1=dense(blk.mlp.fc1),
                               fc2=dense(blk.mlp.fc2)))
            if getattr(blk, "attn_mask", None) is not None:
                bn.attn_mask = var(blk.attn_mask, trainable=False)
            blocks.append(bn)
        ln.blocks = blocks  # AutoTrackable wraps lists -> blocks/0, blocks/1
        if layer.downsample is not None:
            ln.downsample = node(
                reduction=dense(layer.downsample.reduction, bias=False),
                norm=norm(layer.downsample.norm))
        basic_layers.append(ln)
    root.basic_layers = basic_layers
    return tf.train.Checkpoint(root=root).write(path)


def main():
    rng = np.random.default_rng(0)
    # Random-init bias tables are zero and attention is unsaturated at these
    # scales, so no q/k damping is needed (unlike the ViT/TransUNet checks).
    x = rng.normal(size=(2, H, W, IN_CH)).astype(np.float32)

    m, tf, ref_pooled, ref_feats = build_reference(x)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models.swin import SwinBackbone
    from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz

    model = SwinBackbone(img_size=(H, W), depths=DEPTHS, num_heads=HEADS,
                         window=WINDOW, drop_path_rate=0.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    flat = tf_weights_to_flax(m)
    np.savez("/tmp/swin_ref_weights.npz", **flat)
    params, loaded, missing = load_params_npz(variables["params"],
                                              "/tmp/swin_ref_weights.npz")
    final, feats = model.apply({"params": params}, jnp.asarray(x), False)
    ours_pooled = np.asarray(final.reshape(final.shape[0], -1,
                                           final.shape[-1]).mean(axis=1))
    ours_feat0 = np.asarray(feats[0])

    # f32-conditioning yardstick
    jax.config.update("jax_enable_x64", True)
    try:
        params64 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
        final64, feats64 = model.apply({"params": params64},
                                       jnp.asarray(x, jnp.float64), False)
        pooled64 = np.asarray(final64.reshape(
            final64.shape[0], -1, final64.shape[-1]).mean(axis=1))
    finally:
        jax.config.update("jax_enable_x64", False)
    self_rounding = float(np.abs(pooled64 - ours_pooled).max())

    ref_feat0 = ref_feats[0].reshape(ours_feat0.shape)
    d_pool = float(np.abs(ours_pooled - ref_pooled).max())
    d_feat = float(np.abs(ours_feat0 - ref_feat0).max())

    # Converter leg (VERDICT r2 missing #4): write a REAL TF-format
    # checkpoint of the reference model object graph — the same on-disk
    # layout the released rishigami tarballs carry (reference:
    # SwinTransformer.py:461-486 loads them with net.load_weights; saved
    # by TF-2.4 Keras, whose list tracking `write_keras2_checkpoint`
    # reproduces — Keras 3's own tf.train.Checkpoint drops list-held
    # blocks) — and drive it through utils/swin_convert + a live
    # SwinBackbone forward.
    import tempfile

    from ultrasound_modeling_tpu.utils import swin_convert as sc

    with tempfile.TemporaryDirectory() as td:
        ckpt = write_keras2_checkpoint(m, tf, os.path.join(td, "ref.ckpt"))
        conv_params, conv_loaded, conv_missing = sc.load_pretrained_swin(
            variables["params"], ckpt, prefix="")
        conv_final, _ = model.apply({"params": conv_params},
                                    jnp.asarray(x), False)
    conv_pooled = np.asarray(conv_final.reshape(
        conv_final.shape[0], -1, conv_final.shape[-1]).mean(axis=1))
    # The converter path must reproduce the direct-port forward bit-exactly
    # (same weights, same graph) and leave nothing unmapped.
    d_converter = float(np.abs(conv_pooled - ours_pooled).max())
    result = {
        "loaded": len(loaded), "missing": missing,
        "converter_loaded": len(conv_loaded),
        "converter_missing": conv_missing,
        "converter_vs_direct_port_max_abs": d_converter,
        "converter_bit_exact": bool(d_converter == 0.0),
        "max_abs_diff_pooled": d_pool,
        "max_abs_diff_stage0_feature": d_feat,
        "feature_abs_scale": float(np.abs(ref_feat0).max()),
        "flax_f32_vs_f64_max_abs": self_rounding,
        "pooled_within_3x_f32_conditioning":
            bool(d_pool <= 3 * max(self_rounding, 1e-7)),
        "note": "window (4,4) / 256x64 / depths (2,2): the largest config "
                "the reference code can RUN (its window_reverse is broken "
                "for non-square windows and its shared window_size list is "
                "mutated at small resolutions — see module docstring)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
