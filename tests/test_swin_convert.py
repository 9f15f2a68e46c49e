"""Pretrained-Swin TF-checkpoint converter tests.

Builds a synthetic TF checkpoint with the reference release's object-path
layout (reference: SwinTransformer.py:461-486 loads
rishigami/Swin-Transformer-TF checkpoints saved via ``save_weights``:
attribute-named object paths like
``basic_layers/0/blocks/0/attn/qkv/kernel/.ATTRIBUTES/VARIABLE_VALUE``),
converts it, and merges into a live Flax SwinBackbone param tree through the
shape-checked npz loader."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ultrasound_modeling_tpu.models.swin import SwinBackbone  # noqa: E402
from ultrasound_modeling_tpu.utils import swin_convert as sc  # noqa: E402
from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz  # noqa: E402

# tiny config shared by the TF fixture and the Flax model
EMBED = 8
DEPTHS = (1, 1)
HEADS = (2, 2)
WINDOW = (4, 5)
IMG = (64, 80)       # /4 patch -> (16, 20) -> merged (8, 10): both stages
                     # keep the full (4, 5) window (no degenerate clamping)
IN_CH = 10
TABLE_ROWS = (2 * WINDOW[0] - 1) * (2 * WINDOW[1] - 1)


def _dense(units, inp, use_bias=True):
    d = tf.keras.layers.Dense(units, use_bias=use_bias)
    d.build((None, inp))
    return d


def _norm(dim):
    n = tf.keras.layers.LayerNormalization(epsilon=1e-5)
    n.build((None, dim))
    return n


def _tf_fixture_ckpt(path):
    """Mirror of the reference model's tracked-attribute structure (shapes
    only — tiny)."""
    root = tf.train.Checkpoint()

    pe = tf.train.Checkpoint()
    conv = tf.keras.layers.Conv2D(EMBED, (4, 4), strides=(4, 4))
    conv.build((None, IMG[0], IMG[1], IN_CH))
    pe.proj = conv
    pe.norm = _norm(EMBED)
    root.patch_embed = pe

    layers = []
    for i, depth in enumerate(DEPTHS):
        dim = EMBED * 2 ** i
        layer = tf.train.Checkpoint()
        blocks = []
        for _ in range(depth):
            blk = tf.train.Checkpoint()
            blk.norm1 = _norm(dim)
            blk.norm2 = _norm(dim)
            attn = tf.train.Checkpoint()
            attn.qkv = _dense(3 * dim, dim)
            attn.proj = _dense(dim, dim)
            attn.relative_position_bias_table = tf.Variable(
                np.random.default_rng(i).normal(
                    size=(TABLE_ROWS, HEADS[i])).astype(np.float32))
            attn.relative_position_index = tf.Variable(
                np.zeros((WINDOW[0] * WINDOW[1],) * 2, np.int32),
                trainable=False)
            blk.attn = attn
            mlp = tf.train.Checkpoint()
            mlp.fc1 = _dense(4 * dim, dim)
            mlp.fc2 = _dense(dim, 4 * dim)
            blk.mlp = mlp
            blocks.append(blk)
        layer.blocks = blocks
        if i < len(DEPTHS) - 1:
            ds = tf.train.Checkpoint()
            ds.reduction = _dense(2 * dim, 4 * dim, use_bias=False)
            ds.norm = _norm(4 * dim)
            layer.downsample = ds
        layers.append(layer)
    root.basic_layers = layers
    root.norm = _norm(EMBED * 2 ** (len(DEPTHS) - 1))
    root.head = _dense(1000, EMBED * 2 ** (len(DEPTHS) - 1))
    root.save_counter  # touch so it exists, as in real ckpts
    return root.write(path)


@pytest.fixture(scope="module")
def tf_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("swin_tf")
    return _tf_fixture_ckpt(str(d / "swin_tiny.ckpt"))


def _flax_params():
    model = SwinBackbone(img_size=IMG, embed_dim=EMBED, depths=DEPTHS,
                         num_heads=HEADS, window=WINDOW)
    x = jnp.zeros((1,) + IMG + (IN_CH,), jnp.float32)
    return model, model.init(jax.random.PRNGKey(0), x)["params"]


def test_map_tf_name_table():
    f = sc.map_tf_name
    s = "/.ATTRIBUTES/VARIABLE_VALUE"
    assert f("patch_embed/proj/kernel" + s, "") == "proj/kernel"
    assert f("patch_embed/norm/gamma" + s, "") == "patch_norm/scale"
    assert (f("basic_layers/0/blocks/1/attn/qkv/kernel" + s, "backbone/")
            == "backbone/layer0_block1/attn/qkv_kernel")
    assert (f("basic_layers/2/blocks/0/attn/relative_position_bias_table" + s,
              "") == "layer2_block0/attn/relative_position_bias_table")
    assert (f("basic_layers/1/blocks/0/mlp/fc1/bias" + s, "")
            == "layer1_block0/mlp_fc1/bias")
    assert (f("basic_layers/0/downsample/norm/beta" + s, "")
            == "layer0_downsample/norm/bias")
    assert f("norm/gamma" + s, "") == "norm/scale"
    # skipped names
    assert f("head/kernel" + s, "") is None
    assert f("basic_layers/0/blocks/0/attn/relative_position_index" + s,
             "") is None
    assert f("save_counter" + s, "") is None
    assert f("optimizer/iter" + s, "") is None


def test_convert_and_merge(tf_ckpt, tmp_path):
    out_npz = str(tmp_path / "swin.npz")
    converted, skipped = sc.convert_tf_checkpoint(tf_ckpt, out_npz,
                                                  prefix="")
    # every trainable backbone var mapped
    assert "proj/kernel" in converted
    assert "layer0_block0/attn/qkv_kernel" in converted
    assert "layer0_downsample/reduction/kernel" in converted
    assert all("relative_position_index" not in k for k in converted)

    _, params = _flax_params()
    merged, loaded, missing = load_params_npz(params, out_npz)
    # all converted tensors land in the tree (shape-checked by the loader)
    assert set(loaded) == set(converted)
    # table round-trips bit-exactly
    got = np.asarray(
        merged["layer0_block0"]["attn"]["relative_position_bias_table"])
    np.testing.assert_array_equal(
        got, converted["layer0_block0/attn/relative_position_bias_table"])
    # drop-path has no params; nothing else from the backbone is missing
    # except what the fixture does not model (none)
    assert missing == []


def test_fetch_pretrained_offline_gating(tmp_path, monkeypatch):
    """fetch_pretrained mirrors the reference URL scheme (reference:
    SwinTransformer.py:469-476) and fails with an actionable message when
    the box has no network (it must NOT leave partial files behind)."""
    import urllib.request

    def _no_net(*a, **k):
        raise OSError("network unreachable")

    monkeypatch.setattr(urllib.request, "urlopen", _no_net)
    with pytest.raises(RuntimeError, match="swin_tiny_224.tgz"):
        sc.fetch_pretrained("swin_tiny_224", cache_dir=str(tmp_path))
    assert list(tmp_path.rglob("*.part")) == []
    with pytest.raises(KeyError):
        sc.fetch_pretrained("swin_nonexistent", cache_dir=str(tmp_path))
    # cached extraction short-circuits without touching the network
    d = tmp_path / "swin_tiny_224"
    d.mkdir()
    (d / "swin_tiny_224.ckpt.index").write_bytes(b"")
    got = sc.fetch_pretrained("swin_tiny_224", cache_dir=str(tmp_path))
    assert got == str(d / "swin_tiny_224.ckpt")


def test_load_pretrained_swin_one_call(tf_ckpt):
    model, params = _flax_params()
    merged, loaded, missing = sc.load_pretrained_swin(params, tf_ckpt,
                                                      prefix="")
    assert len(loaded) > 20 and missing == []
    # model still runs with merged weights
    x = jnp.zeros((1,) + IMG + (IN_CH,), jnp.float32)
    final, feats = model.apply({"params": merged}, x)
    assert final.shape[0] == 1
