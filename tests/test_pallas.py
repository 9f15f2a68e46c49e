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
