"""Pallas kernel equivalence tests (interpret mode on CPU; compiled on TPU).

Each kernel is pinned against its XLA-composed reference implementation
(SURVEY.md §7 step 6: kernel vs fallback within fp32 tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrasound_modeling_tpu.ops import pallas_kernels as pk
from ultrasound_modeling_tpu.ops import window_attn as wa
from ultrasound_modeling_tpu.data import labels as labels_mod


def test_fused_label2vec_matches_reference(rng):
    label = jnp.asarray(rng.uniform(-0.1, 2.2, size=(2, 16, 8)), jnp.float32)
    got = np.asarray(pk.fused_label2vec_smooth(label, smoothing=0.0,
                                               interpret=True))
    want = np.asarray(labels_mod.label2vec(label, 3))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_label2vec_smoothing(rng):
    label = jnp.asarray(rng.uniform(0, 2.2, size=(4, 8)), jnp.float32)
    got = np.asarray(pk.fused_label2vec_smooth(label, smoothing=0.1,
                                               interpret=True))
    want = np.asarray(labels_mod.label2vec(label, 3)) * 0.9 + 0.1 / 3
    np.testing.assert_allclose(got, want, atol=1e-6)


def _window_attn_setup(rng, nbw=8, n=20, c=16, heads=4):
    x = jnp.asarray(rng.normal(size=(nbw, n, c)), jnp.float32)
    qkv_w = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.1, jnp.float32)
    qkv_b = jnp.asarray(rng.normal(size=(3 * c,)) * 0.1, jnp.float32)
    proj_w = jnp.asarray(rng.normal(size=(c, c)) * 0.1, jnp.float32)
    proj_b = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    table = jnp.asarray(
        rng.normal(size=((2 * 4 - 1) * (2 * 5 - 1), heads)) * 0.1, jnp.float32)
    rel = jnp.asarray(wa.relative_position_index((4, 5)))
    return x, qkv_w, qkv_b, proj_w, proj_b, table, rel, heads


def test_window_attention_fused_matches_xla(rng):
    x, qkv_w, qkv_b, proj_w, proj_b, table, rel, heads = _window_attn_setup(rng)
    got = np.asarray(pk.window_attention_fused(
        x, qkv_w, qkv_b, proj_w, proj_b, table, rel, heads,
        windows_per_step=4, interpret=True))
    ctx = wa.window_attention(x, qkv_w, qkv_b, table, rel, heads)
    want = np.asarray(ctx @ proj_w + proj_b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_window_attention_fused_with_mask(rng):
    x, qkv_w, qkv_b, proj_w, proj_b, table, rel, heads = _window_attn_setup(
        rng, nbw=8)
    mask = jnp.asarray(wa.shifted_window_mask(8, 10, (4, 5), 2))  # 4 windows
    got = np.asarray(pk.window_attention_fused(
        x, qkv_w, qkv_b, proj_w, proj_b, table, rel, heads, mask=mask,
        windows_per_step=4, interpret=True))
    ctx = wa.window_attention(x, qkv_w, qkv_b, table, rel, heads, mask=mask)
    want = np.asarray(ctx @ proj_w + proj_b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_window_attention_fused_grads_match_xla(rng):
    """custom-VJP backward vs autodiff of the XLA fallback, including the
    gradient that flows to the relative-position bias table and through a
    shifted-window mask (the Swin training path)."""
    x, qkv_w, qkv_b, proj_w, proj_b, table, rel, heads = _window_attn_setup(
        rng, nbw=8)
    mask = jnp.asarray(wa.shifted_window_mask(8, 10, (4, 5), 2))

    def loss_fused(x, qkv_w, qkv_b, proj_w, proj_b, table):
        out = pk.window_attention_fused(
            x, qkv_w, qkv_b, proj_w, proj_b, table, rel, heads, mask=mask,
            windows_per_step=4, interpret=True)
        return jnp.sum(out ** 2)

    def loss_xla(x, qkv_w, qkv_b, proj_w, proj_b, table):
        ctx = wa.window_attention(x, qkv_w, qkv_b, table, rel, heads,
                                  mask=mask)
        return jnp.sum((ctx @ proj_w + proj_b) ** 2)

    args = (x, qkv_w, qkv_b, proj_w, proj_b, table)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g_xla = jax.grad(loss_xla, argnums=tuple(range(6)))(*args)
    for name, a, b in zip(
            ["x", "qkv_w", "qkv_b", "proj_w", "proj_b", "table"],
            g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


# ---------------------------------------------------------------------------
# group_flat_norm (fused per-group channel LayerNorm of the split-attention
# stage; models/resnest.py ResidualS._flat_norm)
# ---------------------------------------------------------------------------

def _gfn_ref(y, s, b, gsize, eps):
    """Naive grouped-view reference (f32 math)."""
    n, f = y.shape
    g = f // gsize
    yg = y.reshape(n, g, gsize).astype(jnp.float32)
    mu = yg.mean(-1, keepdims=True)
    var = yg.var(-1, keepdims=True)
    out = (yg - mu) * jax.lax.rsqrt(var + eps)
    return out.reshape(n, f) * s + b


def test_group_flat_norm_matches_reference(rng):
    n, g, c = 37, 9, 10          # ragged n exercises the tail-tile masking
    f = g * c
    y = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    got = pk.group_flat_norm(y, s, b, c, 1e-3, interpret=True)
    want = _gfn_ref(y, s, b, c, 1e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_group_flat_norm_grads_match_reference(rng):
    n, g, c = 37, 3, 20
    f = g * c
    y = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(f,)), jnp.float32)

    def loss_k(y, s, b):
        return jnp.sum(jnp.sin(pk.group_flat_norm(y, s, b, c, 1e-3,
                                                  interpret=True)))

    def loss_r(y, s, b):
        return jnp.sum(jnp.sin(_gfn_ref(y, s, b, c, 1e-3)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(y, s, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(y, s, b)
    for name, a, bb in zip(["dy", "dscale", "dbias"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_group_flat_norm_bf16_error_below_output_quantum(rng):
    """bf16 path: group sums are exact (bf16 x {0,1} products); the only
    loss is squaring the centered values in bf16, which must stay below the
    bf16 quantization of the output itself."""
    n, g, c = 64, 9, 10
    f = g * c
    y = jnp.asarray(rng.normal(size=(n, f)), jnp.bfloat16)
    s = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    got = pk.group_flat_norm(y, s, b, c, 1e-3,
                             interpret=True).astype(jnp.float32)
    want = _gfn_ref(y.astype(jnp.float32), s, b, c, 1e-3)
    quantum = float(jnp.abs(want).max()) / 256.0   # bf16 has 8 mantissa bits
    assert float(jnp.abs(got - want).max()) <= 1.5 * quantum


def test_group_flat_norm_folded_act_matches_reference(rng):
    """act='leaky' folds the stage's LeakyReLU into the kernel sweep; must
    equal activation-after-norm exactly (same math, fused)."""
    n, g, c = 37, 9, 10
    f = g * c
    y = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    got = pk.group_flat_norm(y, s, b, c, 1e-3, interpret=True,
                             act="leaky", act_alpha=0.3)
    pre = _gfn_ref(y, s, b, c, 1e-3)
    want = jnp.where(pre >= 0, pre, 0.3 * pre)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_group_flat_norm_folded_act_grads_match_reference(rng):
    """The custom VJP chains through the folded LeakyReLU (recomputed
    pre-activation sign mask) for dy, dscale AND dbias."""
    n, g, c = 37, 3, 20
    f = g * c
    y = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(f,)), jnp.float32)

    def loss_k(y, s, b):
        return jnp.sum(jnp.sin(pk.group_flat_norm(
            y, s, b, c, 1e-3, interpret=True, act="leaky", act_alpha=0.3)))

    def loss_r(y, s, b):
        pre = _gfn_ref(y, s, b, c, 1e-3)
        return jnp.sum(jnp.sin(jnp.where(pre >= 0, pre, 0.3 * pre)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(y, s, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(y, s, b)
    for name, a, bb in zip(["dy", "dscale", "dbias"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_group_flat_norm_4d_and_model_path(rng):
    """The model calls through ResidualS._flat_norm on [B,H,W,F]; pin the
    pallas lowering against the einsum/XLA lowering of the same module."""
    from ultrasound_modeling_tpu.models import resnest as rn

    n, g, c = 2 * 8 * 10, 9, 6
    f = g * c
    y4 = jnp.asarray(rng.normal(size=(2, 8, 10, f)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    got = pk.group_flat_norm(y4, s, b, c, 1e-3, interpret=True)
    assert got.shape == y4.shape
    want = _gfn_ref(y4.reshape(n, f), s, b, c, 1e-3).reshape(y4.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    rn.set_norm_impl("auto")   # restore (paranoia; other tests rely on it)


def _damped_block_params(key, c, heads, mlp_dim):
    """Block params with damped q/k kernels: random-init bf16 attention
    saturates the softmax and amplifies rounding chaotically (the same
    regime issue as benchmarks/vit_reference_crosscheck.py) — damping keeps
    the comparison in the smooth regime so the tolerance tests the KERNEL,
    not the conditioning."""
    from ultrasound_modeling_tpu.models.transunet import Block

    x0 = jnp.zeros((2, 10, c), jnp.float32)
    blk = Block(c, heads, mlp_dim, 0.0, attn_impl="xla")
    v = blk.init({"params": key}, x0, False)
    p = jax.tree_util.tree_map(lambda a: a, v["params"])
    for k in ("query_kernel", "key_kernel"):
        p["attn"][k] = p["attn"][k] * 0.05
    return blk, {"params": p}


def test_transformer_block_fused_matches_composed(rng):
    """Fused transformer block kernel (LN1+MHA+res+LN2+MLP+res) vs the
    composed flax Block, bf16 compute, interpret mode."""
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.transunet import TRANSFORMER_LN_EPS

    c, heads, mlp_dim = 64, 4, 128
    common.set_compute_dtype("bfloat16")
    try:
        blk, v = _damped_block_params(jax.random.PRNGKey(0), c, heads,
                                      mlp_dim)
        x = jnp.asarray(rng.normal(size=(4, 10, c)), jnp.float32)
        want = np.asarray(blk.apply(v, x, False), np.float32)
        got = np.asarray(pk.transformer_block_fused(
            x, v["params"], heads, scale=1.0 / np.sqrt(heads),
            eps=TRANSFORMER_LN_EPS, batch_per_step=2, interpret=True),
            np.float32)
    finally:
        common.set_compute_dtype(None)
    assert got.shape == want.shape
    quantum = np.abs(want).max() / 256.0
    assert np.abs(got - want).max() <= 4 * quantum


def test_transformer_block_fused_per_elem_matches_dense(rng):
    """per_elem=True (static per-batch-element attention loop, no cross-
    element mask) must equal the masked-dense flavor bit-for-bit in
    interpret mode — same math, different blocking."""
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.transunet import TRANSFORMER_LN_EPS

    c, heads, mlp_dim = 64, 4, 128
    common.set_compute_dtype("bfloat16")
    try:
        blk, v = _damped_block_params(jax.random.PRNGKey(2), c, heads,
                                      mlp_dim)
        x = jnp.asarray(rng.normal(size=(6, 10, c)), jnp.float32)
        want = np.asarray(blk.apply(v, x, False), np.float32)
        kw = dict(scale=1.0 / np.sqrt(heads), eps=TRANSFORMER_LN_EPS,
                  interpret=True)
        dense = np.asarray(pk.transformer_block_fused(
            x, v["params"], heads, batch_per_step=2, per_elem=False, **kw),
            np.float32)
        pe = np.asarray(pk.transformer_block_fused(
            x, v["params"], heads, batch_per_step=3, per_elem=True, **kw),
            np.float32)
        pe_full = np.asarray(pk.transformer_block_fused(
            x, v["params"], heads, batch_per_step=6, per_elem=True, **kw),
            np.float32)
    finally:
        common.set_compute_dtype(None)
    quantum = np.abs(want).max() / 256.0
    assert np.abs(dense - want).max() <= 4 * quantum
    # per-element vs composed: same bound as dense
    assert np.abs(pe - want).max() <= 4 * quantum
    assert np.abs(pe_full - want).max() <= 4 * quantum
    # and near-identical to the dense flavor (same math, same dtypes)
    assert np.abs(pe_full - dense).max() <= quantum


def test_transformer_stack_fused_encoder_path(rng):
    """Encoder(attn_impl='pallas') at eval routes through the fused stack
    (incl. the folded final encoder_norm); pin against the scanned XLA
    path with the SAME params."""
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.transunet import Encoder

    common.set_compute_dtype("bfloat16")
    try:
        x = jnp.asarray(rng.normal(size=(4, 10, 64)), jnp.float32)
        enc_x = Encoder(64, 4, 3, 128, 0.0, attn_impl="xla")
        enc_p = Encoder(64, 4, 3, 128, 0.0, attn_impl="pallas")
        v = enc_x.init({"params": jax.random.PRNGKey(1)}, x, False)
        # damp q/k for the smooth regime (see _damped_block_params)
        p = v["params"]
        blocks = dict(p["blocks"]["block"])
        attn = dict(blocks["attn"])
        attn["query_kernel"] = attn["query_kernel"] * 0.05
        attn["key_kernel"] = attn["key_kernel"] * 0.05
        blocks["attn"] = attn
        v = {"params": {**p, "blocks": {"block": blocks}}}
        want = np.asarray(enc_x.apply(v, x, False), np.float32)
        got = np.asarray(enc_p.apply(v, x, False), np.float32)
    finally:
        common.set_compute_dtype(None)
    quantum = np.abs(want).max() / 256.0
    assert np.abs(got - want).max() <= 6 * quantum


def test_transformer_block_fused_gelu_exact(rng):
    """The kernel's rational-approximation erf must match exact GELU to far
    below bf16 resolution."""
    x = np.linspace(-6, 6, 4001, dtype=np.float32)
    want = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    got = np.asarray(x * 0.5 * (1.0 + pk._erf(jnp.asarray(x) *
                                              0.7071067811865476)))
    assert np.abs(got - want).max() < 2e-6


def test_vit_fused_block_path(rng):
    """ViTSegmenter(attn_impl='pallas') eval tracing routes every Block
    through the fused kernel (incl. folded encoder_norm); pin against the
    composed path with the same params on a tiny config."""
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.vit import ViTSegmenter

    common.set_compute_dtype("bfloat16")
    try:
        kw = dict(num_classes=3, hidden_size=32, num_heads=4, num_layers=2,
                  grid=(4, 5), img_size=(32, 20), mlp_dim=64)
        m_x = ViTSegmenter(attn_impl="xla", **kw)
        m_p = ViTSegmenter(attn_impl="pallas", **kw)
        x = jnp.asarray(rng.normal(size=(2, 32, 20, 10)), jnp.float32)
        v = m_x.init({"params": jax.random.PRNGKey(2)}, x, False)
        p = {**v["params"]}
        for i in range(2):
            blk = dict(p[f"block_{i}"])
            attn = dict(blk["attn"])
            attn["query_kernel"] = attn["query_kernel"] * 0.05
            attn["key_kernel"] = attn["key_kernel"] * 0.05
            blk["attn"] = attn
            p[f"block_{i}"] = blk
        v = {"params": p}
        want = np.asarray(m_x.apply(v, x, False), np.float32)
        got = np.asarray(m_p.apply(v, x, False), np.float32)
    finally:
        common.set_compute_dtype(None)
    assert got.shape == want.shape
    # outputs are post-softmax probabilities in [0, 1]
    assert np.abs(got - want).max() <= 0.02


def test_fused_stack_not_engaged_at_f32(rng):
    """Under f32 compute (compute_dtype unset) the bf16-contract fused
    block/stack kernels must NOT engage: 'pallas' and 'xla' eval paths of
    the Encoder and the ViT blocks agree bitwise, because both route
    through the same composed ops (the fused attention kernel preserves
    dtype; the whole-block kernel does not and is gated to bf16)."""
    from ultrasound_modeling_tpu.models.transunet import Encoder
    from ultrasound_modeling_tpu.models.vit import ViTSegmenter

    x = jnp.asarray(rng.normal(size=(2, 10, 64)), jnp.float32)
    enc_x = Encoder(64, 4, 2, 128, 0.0, attn_impl="xla")
    enc_p = Encoder(64, 4, 2, 128, 0.0, attn_impl="pallas")
    v = enc_x.init({"params": jax.random.PRNGKey(3)}, x, False)
    want = np.asarray(enc_x.apply(v, x, False))
    got = np.asarray(enc_p.apply(v, x, False))
    # the per-attention pallas kernel preserves f32, so only tiny
    # accumulation-order differences are allowed
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    kw = dict(num_classes=3, hidden_size=32, num_heads=4, num_layers=2,
              grid=(4, 5), img_size=(32, 20), mlp_dim=64)
    m_x = ViTSegmenter(attn_impl="xla", **kw)
    m_p = ViTSegmenter(attn_impl="pallas", **kw)
    xi = jnp.asarray(rng.normal(size=(2, 32, 20, 10)), jnp.float32)
    vv = m_x.init({"params": jax.random.PRNGKey(4)}, xi, False)
    want = np.asarray(m_x.apply(vv, xi, False))
    got = np.asarray(m_p.apply(vv, xi, False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_attention_train_fused_fwd_and_grads():
    """Train-path fused attention (saving backward): forward matches the
    composed q/k/v/mha/out chain exactly (same f32 accumulation), and every
    gradient — x and the four projections — matches composed autodiff to f32
    rounding (the backward consumes the kernel's saved qkv/o/probs, no
    recompute).  Covers both one-sequence-per-step and packed (t>1,
    block-diagonal mask) layouts."""
    from ultrasound_modeling_tpu.ops.attention import mha
    from ultrasound_modeling_tpu.ops.pallas_kernels import attention_train_fused

    rng = np.random.default_rng(7)
    b, n, c, heads = 4, 16, 32, 4
    scale = 1.0 / np.sqrt(heads)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    qkv_w = jnp.asarray(rng.normal(size=(c, 3 * c), scale=0.2), jnp.float32)
    qkv_b = jnp.asarray(rng.normal(size=(3 * c,), scale=0.1), jnp.float32)
    proj_w = jnp.asarray(rng.normal(size=(c, c), scale=0.2), jnp.float32)
    proj_b = jnp.asarray(rng.normal(size=(c,), scale=0.1), jnp.float32)

    def composed(x, qkv_w, qkv_b, proj_w, proj_b):
        q = x @ qkv_w[:, :c] + qkv_b[:c]
        k = x @ qkv_w[:, c:2 * c] + qkv_b[c:2 * c]
        v = x @ qkv_w[:, 2 * c:] + qkv_b[2 * c:]
        return mha(q, k, v, heads, scale=scale) @ proj_w + proj_b

    args = (x, qkv_w, qkv_b, proj_w, proj_b)
    want = composed(*args)

    for t in (None, 2):  # default packing and explicit 2-seq tiles
        def fused(x, qkv_w, qkv_b, proj_w, proj_b):
            return attention_train_fused(x, qkv_w, qkv_b, proj_w, proj_b,
                                         heads, scale=scale, seqs_per_step=t,
                                         interpret=True)

        got = fused(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-6, atol=2e-6)

        def scalar(fn):
            return lambda a: jnp.sum(jnp.sin(fn(*a)))

        g_want = jax.grad(scalar(composed))(args)
        g_got = jax.grad(scalar(fused))(args)
        for name, gw, gg in zip(("x", "qkv_w", "qkv_b", "proj_w", "proj_b"),
                                g_want, g_got):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"t={t} grad {name}")


def test_attn_train_impl_model_gradients():
    """attn_train_impl='pallas' wired through ViTSegmenter/TransUNet Block:
    train-mode forward and parameter gradients match the composed path."""
    from ultrasound_modeling_tpu.models.vit import ViTSegmenter

    rng = np.random.default_rng(8)
    kw = dict(num_classes=3, hidden_size=32, num_heads=4, num_layers=2,
              grid=(4, 5), img_size=(32, 20), mlp_dim=64)
    m_x = ViTSegmenter(attn_train_impl="xla", **kw)
    m_p = ViTSegmenter(attn_train_impl="pallas", **kw)
    xi = jnp.asarray(rng.normal(size=(2, 32, 20, 10)), jnp.float32)
    vv = m_x.init({"params": jax.random.PRNGKey(4)}, xi, True)

    def loss(m):
        def f(params):
            out = m.apply({"params": params}, xi, True,
                          rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.mean(jnp.square(out))
        return f

    l_w, g_w = jax.value_and_grad(loss(m_x))(vv["params"])
    l_g, g_g = jax.value_and_grad(loss(m_p))(vv["params"])
    np.testing.assert_allclose(float(l_g), float(l_w), rtol=1e-5)
    flat_w = jax.tree_util.tree_leaves_with_path(g_w)
    flat_g = jax.tree_util.tree_leaves_with_path(g_g)
    for (pw, aw), (pg, ag) in zip(flat_w, flat_g):
        assert pw == pg
        np.testing.assert_allclose(np.asarray(ag), np.asarray(aw),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(pw))


def test_flash_mha_fwd_and_grads():
    """Flash-style train attention core (VERDICT r4 next #2): forward
    matches the composed mha chain, and the LSE-recompute Pallas backward
    matches composed autodiff's gradient to f32 rounding — for both
    one-sequence-per-step and packed (t>1, block-diagonal mask) layouts."""
    from ultrasound_modeling_tpu.ops.attention import mha
    from ultrasound_modeling_tpu.ops.pallas_kernels import flash_mha

    rng = np.random.default_rng(9)
    b, n, c, heads = 4, 16, 32, 4
    scale = 1.0 / np.sqrt(heads)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * c)), jnp.float32)

    def composed(qkv):
        return mha(qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:],
                   heads, scale=scale)

    want = composed(qkv)
    for t in (None, 2):
        got = flash_mha(qkv, heads, scale=scale, seqs_per_step=t,
                        interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-6, atol=2e-6, err_msg=f"t={t}")

        def scalar(fn):
            return lambda a: jnp.sum(jnp.sin(fn(a)))

        g_want = jax.grad(scalar(composed))(qkv)
        g_got = jax.grad(scalar(
            lambda a: flash_mha(a, heads, scale=scale, seqs_per_step=t,
                                interpret=True)))(qkv)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=1e-4, atol=1e-4, err_msg=f"t={t}")

    with pytest.raises(ValueError):
        flash_mha(qkv, heads, scale=scale, seqs_per_step=3, interpret=True)


def test_attn_train_impl_flash_model_gradients():
    """attn_train_impl='flash' wired through ViTSegmenter: train-mode
    forward and parameter gradients match the composed path."""
    from ultrasound_modeling_tpu.models.vit import ViTSegmenter

    rng = np.random.default_rng(10)
    kw = dict(num_classes=3, hidden_size=32, num_heads=4, num_layers=2,
              grid=(4, 5), img_size=(32, 20), mlp_dim=64)
    m_x = ViTSegmenter(attn_train_impl="xla", **kw)
    m_f = ViTSegmenter(attn_train_impl="flash", **kw)
    xi = jnp.asarray(rng.normal(size=(2, 32, 20, 10)), jnp.float32)
    vv = m_x.init({"params": jax.random.PRNGKey(4)}, xi, True)

    def loss(m):
        def f(params):
            out = m.apply({"params": params}, xi, True,
                          rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.mean(jnp.square(out))
        return f

    l_w, g_w = jax.value_and_grad(loss(m_x))(vv["params"])
    l_g, g_g = jax.value_and_grad(loss(m_f))(vv["params"])
    np.testing.assert_allclose(float(l_g), float(l_w), rtol=1e-5)
    flat_w = jax.tree_util.tree_leaves_with_path(g_w)
    flat_g = jax.tree_util.tree_leaves_with_path(g_g)
    for (pw, aw), (pg, ag) in zip(flat_w, flat_g):
        assert pw == pg
        np.testing.assert_allclose(np.asarray(ag), np.asarray(aw),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(pw))
