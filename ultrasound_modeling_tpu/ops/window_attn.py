"""Windowed (Swin-style) attention: partition, relative-position bias,
shifted-window masking.

The reference computes attention per non-overlapping ``[wh, ww]`` window with
a learned relative-position bias and cross-window mixing via cyclic shift +
additive mask (reference: SwinTransformer.py:42-57 partition/reverse,
:60-133 WindowAttention, :189-254 shifted windows).

This blockwise-local structure maps 1:1 onto TPU tiling: each window's
attention is an independent small matmul chain, batched over
``B * num_windows`` — exactly the layout a Pallas grid wants
(see ops.pallas_kernels.window_attention for the fused kernel; this module is
the XLA-composed implementation and the correctness reference).

All functions are shape-static and jit/vmap/pjit friendly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, window: Tuple[int, int]) -> jnp.ndarray:
    """[B, H, W, C] -> [B * nH * nW, wh * ww, C] (reference: SwinTransformer.py:42-49)."""
    b, h, w, c = x.shape
    wh, ww = window
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, c)


def window_reverse(windows: jnp.ndarray, window: Tuple[int, int],
                   h: int, w: int) -> jnp.ndarray:
    """Inverse of window_partition: [B*nH*nW, wh*ww, C] -> [B, H, W, C]."""
    wh, ww = window
    c = windows.shape[-1]
    x = windows.reshape(-1, h // wh, w // ww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


def relative_position_index(window: Tuple[int, int]) -> np.ndarray:
    """Static ``[wh*ww, wh*ww]`` index into the (2wh-1)(2ww-1) bias table
    (reference: SwinTransformer.py:84-93)."""
    wh, ww = window
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def shifted_window_mask(h: int, w: int, window: Tuple[int, int],
                        shift: int) -> np.ndarray:
    """Static additive mask ``[num_windows, N, N]`` with -100 for pairs in
    different pre-shift regions (reference: SwinTransformer.py:189-214)."""
    wh, ww = window
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -shift), slice(-shift, None)):
        for ws in (slice(0, -ww), slice(-ww, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    # pure-NumPy window partition (this function must stay trace-free: it is
    # called at trace time inside jitted model code with static shapes)
    windows = img.reshape(h // wh, wh, w // ww, ww).transpose(0, 2, 1, 3)
    windows = windows.reshape(-1, wh * ww)
    mask = windows[:, None, :] - windows[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_attention(x: jnp.ndarray, qkv_w: jnp.ndarray,
                     qkv_b: Optional[jnp.ndarray],
                     bias_table: jnp.ndarray, rel_index: jnp.ndarray,
                     num_heads: int,
                     mask: Optional[jnp.ndarray] = None,
                     scale: Optional[float] = None) -> jnp.ndarray:
    """Window attention over pre-partitioned windows.

    Args:
      x: ``[nBW, N, C]`` windows (nBW = batch * num_windows, N = wh*ww).
      qkv_w: ``[C, 3C]`` fused QKV projection; qkv_b optional ``[3C]``.
      bias_table: ``[(2wh-1)(2ww-1), heads]`` relative-position bias.
      rel_index: ``[N, N]`` static index into bias_table.
      mask: optional ``[num_windows, N, N]`` additive mask for shifted windows.

    Returns ``[nBW, N, C]`` (pre-projection context).
    """
    nbw, n, c = x.shape
    d = c // num_heads
    if scale is None:
        scale = d ** -0.5  # reference: SwinTransformer.py:68 (standard here)

    qkv = x @ qkv_w
    if qkv_b is not None:
        qkv = qkv + qkv_b
    qkv = qkv.reshape(nbw, n, 3, num_heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * scale, qkv[1], qkv[2]

    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32)
    bias = bias_table[rel_index.reshape(-1)].reshape(n, n, num_heads)
    attn = attn + bias.transpose(2, 0, 1)[None]

    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(nbw // nw, nw, num_heads, n, n)
        attn = attn + mask[None, :, None]
        attn = attn.reshape(nbw, num_heads, n, n)

    probs = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return ctx.transpose(0, 2, 1, 3).reshape(nbw, n, c)
