"""Ops equivalence tests: KSAC shared-tap vs naive dilated convs, window
partition round-trip, window attention vs a direct einsum re-derivation,
on-device resize/blur sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrasound_modeling_tpu.ops import ksac, window_attn as wa
from ultrasound_modeling_tpu.ops import resize as rops


def test_ksac_shared_matches_naive(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 8)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(3, 3, 8, 16)) * 0.1, jnp.float32)
    rates = (1, 2, 4, 8, 16)
    naive = ksac.ksac_naive(x, kern, rates)
    shared = ksac.ksac_shared_taps(x, kern, rates)
    assert len(naive) == len(shared) == len(rates)
    for a, b in zip(naive, shared):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 10, 6)), jnp.float32)
    win = (4, 5)
    windows = wa.window_partition(x, win)
    assert windows.shape == (2 * 4 * 2, 20, 6)
    back = wa.window_reverse(windows, win, 16, 10)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_bounds():
    idx = wa.relative_position_index((4, 5))
    assert idx.shape == (20, 20)
    assert idx.min() >= 0
    assert idx.max() < (2 * 4 - 1) * (2 * 5 - 1)
    # self-pairs map to the center entry
    assert len(set(np.diag(idx))) == 1


def test_shifted_window_mask_blocks():
    mask = wa.shifted_window_mask(8, 10, (4, 5), shift=2)
    assert mask.shape == (2 * 2, 20, 20)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # windows away from the wrap boundary are fully visible
    assert np.all(mask[0] == 0.0)


def test_window_attention_matches_direct(rng):
    nbw, n, c, heads = 8, 20, 16, 4
    x = jnp.asarray(rng.normal(size=(nbw, n, c)), jnp.float32)
    qkv_w = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.1, jnp.float32)
    qkv_b = jnp.asarray(rng.normal(size=(3 * c,)) * 0.1, jnp.float32)
    table = jnp.asarray(rng.normal(size=((2 * 4 - 1) * (2 * 5 - 1), heads)) * 0.1,
                        jnp.float32)
    rel = jnp.asarray(wa.relative_position_index((4, 5)))

    got = np.asarray(wa.window_attention(x, qkv_w, qkv_b, table, rel, heads))

    # Direct re-derivation.
    d = c // heads
    qkv = (np.asarray(x) @ np.asarray(qkv_w) + np.asarray(qkv_b))
    qkv = qkv.reshape(nbw, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * d ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(0, 1, 3, 2)
    bias = np.asarray(table)[np.asarray(rel).reshape(-1)].reshape(n, n, heads)
    attn = attn + bias.transpose(2, 0, 1)[None]
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    want = (attn @ v).transpose(0, 2, 1, 3).reshape(nbw, n, c)
    # softmax/exp chains computed in different orders: f32 tolerance
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-3)


def test_resize_bilinear_shapes(rng):
    img = jnp.asarray(rng.normal(size=(10, 8, 3)), jnp.float32)
    out = rops.resize_bilinear(img, (20, 16))
    assert out.shape == (20, 16, 3)
    # constant image stays constant under bilinear resize
    const = jnp.ones((10, 8)) * 3.5
    out2 = rops.resize_bilinear(const, (25, 13))
    np.testing.assert_allclose(np.asarray(out2), 3.5, rtol=1e-6)


def test_gaussian_blur_preserves_mean_and_smooths(rng):
    img = jnp.asarray(rng.normal(size=(32, 32)), jnp.float32)
    out = rops.gaussian_blur(img, ksize=9, sigma=4.0)
    assert out.shape == (32, 32)
    # blur reduces variance, roughly preserves mean
    assert float(jnp.var(out)) < float(jnp.var(img))
    assert abs(float(jnp.mean(out)) - float(jnp.mean(img))) < 0.05
    # kernel normalization
    k = rops.gaussian_kernel1d(9, 4.0)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
