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
* ``group_flat_norm`` — per-branch channel LayerNorm of the fused
  split-attention stage (models/resnest.py) as a single HBM sweep each for
  forward and the custom-VJP backward; group stats ride the MXU via a 0/1
  block-diagonal selection matrix (exact bf16 reduction at default
  precision).
* ``fused_label2vec_smooth`` — label2vec thresholds + label smoothing in one
  VPU pass (the per-batch label path of every train step).

All kernels run in interpret mode off-TPU so the same tests run on CPU.
"""

from __future__ import annotations

import functools
import os
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
                        addmask_ref, out_ref, *, num_heads: int,
                        scale: float, rows: int, c: int):
    """One grid step: [T*N, C] rows of T windows -> [T*N, C] output.

    Block-diagonal batching: attention over all T windows in the tile is ONE
    [T*N, d] x [d, T*N] matmul; a precomputed additive matrix
    ``addmask_ref[h]`` = -1e9 off the diagonal blocks + relative-position
    bias tiled on them (+ the shifted-window mask where applicable) restores
    per-window locality through the softmax.  Everything is a 2-D MXU matmul
    or elementwise VPU op — no batched dots, reshapes of the lane dim, or
    scatters (which Mosaic cannot lower).
    """
    x2 = x_ref[:]                                        # [rows, C]
    qkv = jnp.dot(x2, qkv_w_ref[:],
                  preferred_element_type=jnp.float32) + qkv_b_ref[:]

    head_outs = []
    for h in range(num_heads):
        d = c // num_heads
        q = qkv[:, h * d:(h + 1) * d] * scale            # [rows, d]
        k = qkv[:, c + h * d:c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        scores = scores + addmask_ref[0, h]              # [rows, rows]
        probs = jax.nn.softmax(scores, axis=-1)
        head_outs.append(jnp.dot(probs, v,
                                 preferred_element_type=jnp.float32))
    out = jnp.concatenate(head_outs, axis=-1)            # [rows, C]
    y = jnp.dot(out, proj_w_ref[:],
                preferred_element_type=jnp.float32) + proj_b_ref[:]
    out_ref[:] = y.astype(out_ref.dtype)


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

    Kernel layout: T windows per grid step as [T*N, C] rows; per-window
    locality is enforced by a precomputed per-head additive matrix (bias on
    the diagonal blocks, -1e9 off them, shifted-window mask folded in) so the
    whole tile is plain 2-D MXU matmuls.  When ``mask`` is given
    ([num_windows, N, N]), T is chosen to divide num_windows and the additive
    matrix cycles with period num_windows / T via the BlockSpec index map.
    """
    nbw, n, c = x_windows.shape
    d = c // num_heads
    if scale is None:
        scale = d ** -0.5
    interpret = (not _on_tpu()) if interpret is None else interpret

    t = windows_per_step
    if mask is not None:
        nw = int(mask.shape[0])
        t = int(np.gcd(t, nw))
    while nbw % t:
        t -= 1
    rows = t * n

    # Additive matrices [V, heads, rows, rows], built with traced jnp ops
    # (the bias table is a learned parameter): relative-position bias tiled
    # on the diagonal blocks, -1e9 off them, shifted-window masks folded in.
    bias = bias_table[rel_index.reshape(-1)]
    bias = bias.reshape(n, n, num_heads).transpose(2, 0, 1)  # [h, N, N]
    eye_t = np.eye(t, dtype=np.float32)
    offdiag = jnp.asarray(
        (1.0 - np.kron(eye_t, np.ones((n, n), np.float32))) * -1e9)
    # [h, t, n, t, n]: eye(t) on the block axes x bias on the token axes.
    base = (jnp.asarray(eye_t)[None, :, None, :, None]
            * bias[:, None, :, None, :]).reshape(num_heads, rows, rows)
    base = base + offdiag[None]
    if mask is not None:
        nw = int(mask.shape[0])
        v_count = max(nw // t, 1)
        variants = []
        for v in range(v_count):
            sel = jnp.asarray(mask)[(v * t + np.arange(t)) % nw]  # [t, N, N]
            block = (jnp.asarray(eye_t)[:, None, :, None]
                     * sel[:, :, None, :]).reshape(rows, rows)
            variants.append(base + block[None])
        addmask = jnp.stack(variants)             # [V, heads, rows, rows]
    else:
        v_count = 1
        addmask = base[None]

    qkv_b = jnp.zeros((3 * c,), jnp.float32) if qkv_b is None else qkv_b
    proj_b = jnp.zeros((c,), jnp.float32) if proj_b is None else proj_b

    x2 = x_windows.reshape(nbw * n, c)
    static = (num_heads, float(scale), rows, c, v_count, bool(interpret))
    out = _fused_attn_core(static, x2, qkv_w, qkv_b, proj_w, proj_b,
                           addmask.astype(jnp.float32))
    return out.reshape(nbw, n, c)


def _fused_attn_fwd_pallas(static, x2, qkv_w, qkv_b, proj_w, proj_b, addmask):
    num_heads, scale, rows, c, v_count, interpret = static
    grid = (x2.shape[0] // rows,)
    kernel = functools.partial(
        _window_attn_kernel, num_heads=num_heads, scale=scale,
        rows=rows, c=c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, rows, rows),
                         lambda i: (i % v_count, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], c), x2.dtype),
        interpret=interpret,
    )(x2, qkv_w, qkv_b, proj_w, proj_b, addmask)


def _fused_attn_recompute(static, x2, qkv_w, qkv_b, proj_w, proj_b, addmask):
    """XLA re-derivation of the kernel math (f32), used by the backward pass
    (flash-attention-style rematerialization: save only the inputs, rebuild
    qkv/probs on the backward pass instead of storing them from the kernel).
    Returns the intermediates the gradient needs."""
    num_heads, scale, rows, c, v_count, _ = static
    g_steps = x2.shape[0] // rows
    d = c // num_heads
    x3 = x2.reshape(g_steps, rows, c).astype(jnp.float32)
    qkv = (jnp.einsum("grc,cd->grd", x3, qkv_w.astype(jnp.float32))
           + qkv_b.astype(jnp.float32))
    qkv = qkv.reshape(g_steps, rows, 3, num_heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [G, rows, h, d]
    am = jnp.take(addmask, jnp.arange(g_steps) % v_count, axis=0)
    s = scale * jnp.einsum("grhd,gshd->ghrs", q, k) + am
    p = jax.nn.softmax(s, axis=-1)                      # [G, h, rows, rows]
    o = jnp.einsum("ghrs,gshd->grhd", p, v).reshape(g_steps, rows, c)
    return x3, q, k, v, p, o


def _fused_attn_fwd(static, x2, qkv_w, qkv_b, proj_w, proj_b, addmask):
    out = _fused_attn_fwd_pallas(static, x2, qkv_w, qkv_b, proj_w, proj_b,
                                 addmask)
    return out, (x2, qkv_w, qkv_b, proj_w, proj_b, addmask)


def _fused_attn_bwd(static, res, g):
    num_heads, scale, rows, c, v_count, _ = static
    x2, qkv_w, qkv_b, proj_w, proj_b, addmask = res
    g_steps = x2.shape[0] // rows
    d = c // num_heads
    x3, q, k, v, p, o = _fused_attn_recompute(
        static, x2, qkv_w, qkv_b, proj_w, proj_b, addmask)
    g3 = g.reshape(g_steps, rows, c).astype(jnp.float32)
    pw = proj_w.astype(jnp.float32)
    d_proj_w = jnp.einsum("grc,grk->ck", o, g3)
    d_proj_b = g3.sum((0, 1))
    do = jnp.einsum("grk,ck->grc", g3, pw).reshape(g_steps, rows,
                                                   num_heads, d)
    dp = jnp.einsum("grhd,gshd->ghrs", do, v)
    dv = jnp.einsum("ghrs,grhd->gshd", p, do)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    # Grid step i uses addmask[i % v_count]; G is a multiple of v_count, so
    # the per-variant gradient is a fold over the leading cycle axis.
    d_addmask = ds.reshape(g_steps // v_count, v_count, num_heads, rows,
                           rows).sum(0)
    dq = scale * jnp.einsum("ghrs,gshd->grhd", ds, k)
    dk = scale * jnp.einsum("ghrs,grhd->gshd", ds, q)
    dqkv = jnp.stack([dq, dk, dv], axis=2).reshape(g_steps, rows, 3 * c)
    d_qkv_w = jnp.einsum("grc,grd->cd", x3, dqkv)
    d_qkv_b = dqkv.sum((0, 1))
    dx = jnp.einsum("grd,cd->grc", dqkv, qkv_w.astype(jnp.float32))
    return (dx.reshape(x2.shape).astype(x2.dtype),
            d_qkv_w.astype(qkv_w.dtype), d_qkv_b.astype(qkv_b.dtype),
            d_proj_w.astype(proj_w.dtype), d_proj_b.astype(proj_b.dtype),
            d_addmask.astype(addmask.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_attn_core(static, x2, qkv_w, qkv_b, proj_w, proj_b, addmask):
    """Fused forward (Pallas) with an XLA-recompute backward, so the kernel
    is usable inside jitted train steps (grads flow to x, the projections,
    and — through ``addmask`` — the relative-position bias table)."""
    return _fused_attn_fwd_pallas(static, x2, qkv_w, qkv_b, proj_w, proj_b,
                                  addmask)


_fused_attn_core.defvjp(_fused_attn_fwd, _fused_attn_bwd)


# ---------------------------------------------------------------------------
# Fused attention for the TRAIN path (saving backward)
# ---------------------------------------------------------------------------
#
# The recompute-backward hybrid above loses on long sequences (ViT train
# -29%, round-2 measurement): its backward re-derives qkv/scores/softmax in
# f32, re-paying most of the forward.  This variant instead SAVES the
# backward's inputs from the forward kernel — qkv (unscaled) and the softmax
# probs — as extra kernel outputs (cheap: ~0.3 ms of extra HBM writes at ViT
# b128 shapes vs the ~16 ms the fused forward saves over composed XLA,
# BASELINE round-4 ViT ablation), and hand-writes the backward as bf16
# einsums with f32 accumulation — the same cost/precision class as autodiff
# of the composed path.  Global (non-windowed) attention: the reference's
# 80/160-token sequences (VisionTransformer.py:9-57, TBI_Transformer.py:50).
#
# Grid is (batch_tiles, heads) with HEAD-SLICED weights: a single-axis grid
# holding the whole [C, 3C] qkv projection resident OOMs scoped VMEM at ViT
# width (1280 -> 9.8 MB for that operand alone; measured 18.4 MB stack vs
# the 16 MB limit on v5e).  Per head the kernel sees [C, 3d] / [d, C] weight
# slices (~1.6 MB at ViT width), computes that head's qkv/scores/softmax/PV
# and accumulates its output-projection contribution into an f32 VMEM
# scratch; the last head adds the bias and writes the block's output.  The
# wrapper pre-permutes the weights head-major; gradients are returned in the
# original layout.


def _attn_train_kernel(x_ref, qkvw_ref, qkvb_ref, projw_ref, projb_ref,
                       offdiag_ref, out_ref, qkv_ref, probs_ref, acc_ref, *,
                       num_heads: int, scale: float, rows: int, c: int,
                       use_mask: bool):
    h = pl.program_id(1)
    d = c // num_heads
    x2 = x_ref[:]                                        # [rows, C]
    qkv_h = jnp.dot(x2, qkvw_ref[0],
                    preferred_element_type=jnp.float32) + qkvb_ref[0]
    qkv_ref[0] = qkv_h.astype(qkv_ref.dtype)             # [rows, 3d]
    q = qkv_h[:, :d] * scale
    k = qkv_h[:, d:2 * d]
    v = qkv_h[:, 2 * d:]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    if use_mask:
        scores = scores + offdiag_ref[:]
    probs = jax.nn.softmax(scores, axis=-1)
    probs_ref[0, 0] = probs.astype(probs_ref.dtype)
    ho = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    contrib = jnp.dot(ho, projw_ref[0],
                      preferred_element_type=jnp.float32)  # [rows, C]

    @pl.when(h == 0)
    def _init():
        acc_ref[:] = contrib + projb_ref[:]

    @pl.when(h != 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + contrib

    @pl.when(h == num_heads - 1)
    def _flush():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _attn_train_fwd_pallas(static, x2, qkv_w, qkv_b, proj_w, proj_b):
    num_heads, scale, rows, c, t, n, interpret = static
    d = c // num_heads
    total = x2.shape[0]
    grid = (total // rows, num_heads)   # heads iterate fastest
    # Constant block-diagonal mask restoring per-sequence locality when t
    # sequences share a tile, passed as an operand (pallas rejects captured
    # [rows, rows] constants); a zero matrix when t == 1.
    if t > 1:
        offdiag = jnp.asarray(
            (1.0 - np.kron(np.eye(t, dtype=np.float32),
                           np.ones((n, n), np.float32))) * -1e9)
    else:
        offdiag = jnp.zeros((rows, rows), jnp.float32)
    # Head-major weight layouts: [H, C, 3d], [H, 3d], [H, d, C] — each
    # head's grid step streams only its own slice through VMEM.
    qkvw_hm = qkv_w.reshape(c, 3, num_heads, d).transpose(2, 0, 1, 3) \
        .reshape(num_heads, c, 3 * d)
    # [H, 1, 3d]: Mosaic requires the last two block dims divisible by
    # (8, 128) or equal to the full array dims — a middle singleton makes
    # the per-head bias block (1, 1, 3d) legal.
    qkvb_hm = qkv_b.reshape(3, num_heads, d).transpose(1, 0, 2) \
        .reshape(num_heads, 1, 3 * d)
    projw_hm = proj_w.reshape(num_heads, d, c)
    kernel = functools.partial(
        _attn_train_kernel, num_heads=num_heads, scale=scale,
        rows=rows, c=c, use_mask=t > 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i, h: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 3 * d), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * d), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, c), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, h: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, rows), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, c), lambda i, h: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 3 * d), lambda i, h: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, rows), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((total, c), x2.dtype),
            jax.ShapeDtypeStruct((num_heads, total, 3 * d), x2.dtype),
            jax.ShapeDtypeStruct((total // rows, num_heads, rows, rows),
                                 x2.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((rows, c), jnp.float32)],
        interpret=interpret,
    )(x2, qkvw_hm, qkvb_hm, projw_hm, proj_b, offdiag)


def _attn_train_fwd(static, x2, qkv_w, qkv_b, proj_w, proj_b):
    out, qkv_hm, probs = _attn_train_fwd_pallas(static, x2, qkv_w, qkv_b,
                                                proj_w, proj_b)
    return out, (x2, qkv_hm, probs, qkv_w, proj_w)


def _attn_train_bwd(static, res, g):
    """bf16 operands, f32 accumulation — autodiff's cost/precision class —
    consuming the forward kernel's saved qkv/probs (no recompute; the
    pre-projection context o is one cheap PV einsum away from them)."""
    num_heads, scale, rows, c, t, n, _ = static
    x2, qkv_hm, probs, qkv_w, proj_w = res
    gsteps = x2.shape[0] // rows
    d = c // num_heads
    f32 = jnp.float32
    dt = x2.dtype

    # saved qkv is head-leading [H, total, 3d] (the kernel's block layout)
    qkv5 = qkv_hm.reshape(num_heads, gsteps, rows, 3, d)
    q = qkv5[..., 0, :].transpose(1, 2, 0, 3)            # [G, rows, h, d]
    k = qkv5[..., 1, :].transpose(1, 2, 0, 3)
    v = qkv5[..., 2, :].transpose(1, 2, 0, 3)
    p = probs  # [G, h, rows, rows], x2 dtype
    o3 = jnp.einsum("ghrs,gshd->grhd", p, v,
                    preferred_element_type=f32).astype(dt) \
        .reshape(gsteps, rows, c)

    g3 = g.reshape(gsteps, rows, c)
    d_proj_w = jnp.einsum("grc,grk->ck", o3, g3,
                          preferred_element_type=f32)
    d_proj_b = jnp.sum(g3.astype(f32), (0, 1))
    do = jnp.einsum("grk,ck->grc", g3, proj_w,
                    preferred_element_type=f32).astype(dt)
    do = do.reshape(gsteps, rows, num_heads, d)
    dp = jnp.einsum("grhd,gshd->ghrs", do, v, preferred_element_type=f32)
    dv = jnp.einsum("ghrs,grhd->gshd", p, do,
                    preferred_element_type=f32).astype(dt)
    # softmax backward in f32 (the composed path's softmax runs f32 too)
    pf = p.astype(f32)
    ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
    ds = ds.astype(dt)
    dq = scale * jnp.einsum("ghrs,gshd->grhd", ds, k,
                            preferred_element_type=f32)
    dk = scale * jnp.einsum("ghrs,grhd->gshd", ds, q,
                            preferred_element_type=f32)
    dqkv = jnp.concatenate([
        dq.astype(dt).reshape(gsteps, rows, c),
        dk.astype(dt).reshape(gsteps, rows, c),
        dv.reshape(gsteps, rows, c)], axis=-1)           # [G, rows, 3C]
    x3 = x2.reshape(gsteps, rows, c)
    d_qkv_w = jnp.einsum("grc,grd->cd", x3, dqkv,
                         preferred_element_type=f32)
    d_qkv_b = jnp.sum(dqkv.astype(f32), (0, 1))
    dx = jnp.einsum("grd,cd->grc", dqkv, qkv_w,
                    preferred_element_type=f32)
    return (dx.reshape(x2.shape).astype(x2.dtype),
            d_qkv_w.astype(qkv_w.dtype), d_qkv_b.astype(qkv_w.dtype),
            d_proj_w.astype(proj_w.dtype), d_proj_b.astype(proj_w.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attn_train_core(static, x2, qkv_w, qkv_b, proj_w, proj_b):
    """Fused attention forward (Pallas, saving qkv/probs) with a
    saved-intermediates bf16 backward — the train-path counterpart of
    ``_fused_attn_core`` (whose recompute backward measured -29% on ViT)."""
    out, _, _ = _attn_train_fwd_pallas(static, x2, qkv_w, qkv_b,
                                       proj_w, proj_b)
    return out


_attn_train_core.defvjp(_attn_train_fwd, _attn_train_bwd)


def attention_train_fused(x: jnp.ndarray, qkv_w: jnp.ndarray,
                          qkv_b: jnp.ndarray, proj_w: jnp.ndarray,
                          proj_b: jnp.ndarray, num_heads: int,
                          scale: Optional[float] = None,
                          seqs_per_step: Optional[int] = None,
                          interpret: Optional[bool] = None) -> jnp.ndarray:
    """Differentiable fused global MHA: qkv-proj -> scores -> softmax -> PV
    -> out-proj as one Pallas kernel that also emits the backward's saved
    tensors.  ``x`` is [B, N, C]; grads flow to x and all four projections.
    Packs ``seqs_per_step`` sequences per grid step (block-diagonal constant
    mask) so short sequences still fill the MXU's 8-row sublane tiles."""
    b, n, c = x.shape
    d = c // num_heads
    if scale is None:
        scale = d ** -0.5
    interpret = (not _on_tpu()) if interpret is None else interpret
    t = _pick_seqs_per_step(b, n, seqs_per_step)
    rows = t * n
    static = (num_heads, float(scale), rows, c, t, n, bool(interpret))
    out = _attn_train_core(static, x.reshape(b * n, c), qkv_w, qkv_b,
                           proj_w, proj_b)
    return out.reshape(b, n, c)


def _pick_seqs_per_step(b: int, n: int,
                        seqs_per_step: Optional[int]) -> int:
    """Sequences packed per grid step.  An explicit request must be honored
    exactly — silently shrinking it would change the measured kernel shape
    (ADVICE r4) — so a non-divisor raises; the auto choice fills the MXU's
    sublane tiles (~256 rows) with the largest divisor of the batch."""
    if seqs_per_step:
        if b % seqs_per_step:
            raise ValueError(
                f"seqs_per_step={seqs_per_step} does not divide batch {b}; "
                "pass a divisor or omit it for the auto choice")
        return seqs_per_step
    t = max(1, 256 // n)
    while b % t:
        t -= 1
    return t


# ---------------------------------------------------------------------------
# Flash-style attention CORE for the train path (LSE-saving backward)
# ---------------------------------------------------------------------------
#
# Round-4's attention_train_fused fused the whole projection chain and saved
# qkv head-major + probs from the forward; the measured -11.2% came from the
# BACKWARD's saved-tensor relayouts (head-major [H, B*N, 3d] qkv and
# [G, H, rows, rows] probs re-transposed by XLA einsums).  This variant is
# the named round-5 mechanism (VERDICT r4 next #2): fuse ONLY the attention
# core (scores -> softmax -> PV), leave the qkv/out projections to XLA
# autodiff (plain GEMMs it already schedules optimally, saving x and qkv in
# their natural [B, N, C] layouts), and save from the forward ONLY the
# per-row log-sum-exp ([B, heads, N] f32 — ~0.7 MB at ViT b128 vs the 105 MB
# f32 probs the composed path materializes).  The backward is a second
# Pallas kernel: probs are recomputed tile-wise as exp(scores - lse) and the
# dp/ds tiles stay VMEM-resident — no probs round-trip, no relayouts,
# packed-qkv in / packed-dqkv out so XLA never slices the operands either.
# The reference sequences are short (80/160 tokens: VisionTransformer.py:9,
# TBI_Transformer.py:50), so a whole row of scores fits VMEM and no KV-tile
# running-max loop is needed — "flash" here means the LSE-only save.


def _flash_core_fwd_kernel(qkv_ref, offdiag_ref, out_ref, lse_ref, *,
                           num_heads: int, scale: float, c: int,
                           use_mask: bool):
    d = c // num_heads
    qkv = qkv_ref[:]                                     # [rows, 3C]
    outs = []
    for h in range(num_heads):
        q = qkv[:, h * d:(h + 1) * d]
        k = qkv[:, c + h * d:c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if use_mask:
            s = s + offdiag_ref[:]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        den = jnp.sum(e, axis=-1, keepdims=True)
        lse_ref[0, h] = (m + jnp.log(den))[:, 0]
        p = (e / den).astype(qkv.dtype)  # composed path casts probs too
        outs.append(jnp.dot(p, v, preferred_element_type=jnp.float32))
    out_ref[:] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


def _flash_core_bwd_kernel(qkv_ref, lse_ref, g_ref, offdiag_ref, dqkv_ref, *,
                           num_heads: int, scale: float, c: int,
                           use_mask: bool):
    d = c // num_heads
    f32 = jnp.float32
    qkv = qkv_ref[:]                                     # [rows, 3C]
    g = g_ref[:]                                         # [rows, C]
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * d:(h + 1) * d]
        k = qkv[:, c + h * d:c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        s = jnp.dot(q, k.T, preferred_element_type=f32) * scale
        if use_mask:
            s = s + offdiag_ref[:]
        # exp(s - lse) == softmax(s) bit-for-bit up to fp rounding; masked
        # (-1e9) entries underflow to exactly 0.
        p = jnp.exp(s - lse_ref[0, h][:, None])          # [rows, rows] f32
        go = g[:, h * d:(h + 1) * d]                     # [rows, d]
        dp = jax.lax.dot_general(
            go, v, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                  # [rows, rows]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(qkv.dtype)
        dqs.append(jnp.dot(ds, k, preferred_element_type=f32))
        dks.append(jax.lax.dot_general(                  # ds^T . q
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=f32))
        dvs.append(jax.lax.dot_general(                  # p^T . go
            p.astype(qkv.dtype), go, (((0,), (0,)), ((), ())),
            preferred_element_type=f32))
    dqkv_ref[:] = jnp.concatenate(
        [jnp.concatenate(dqs, axis=-1), jnp.concatenate(dks, axis=-1),
         jnp.concatenate(dvs, axis=-1)], axis=-1).astype(dqkv_ref.dtype)


def _flash_offdiag(t: int, n: int):
    if t > 1:
        return jnp.asarray(
            (1.0 - np.kron(np.eye(t, dtype=np.float32),
                           np.ones((n, n), np.float32))) * -1e9)
    return jnp.zeros((n, n), jnp.float32)


def _flash_fwd_pallas(static, qkv2):
    num_heads, scale, rows, c, t, n, interpret = static
    total = qkv2.shape[0]
    grid = (total // rows,)
    kernel = functools.partial(
        _flash_core_fwd_kernel, num_heads=num_heads, scale=scale, c=c,
        use_mask=t > 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 3 * c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, rows), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((total, c), qkv2.dtype),
            jax.ShapeDtypeStruct((total // rows, num_heads, rows),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(qkv2, _flash_offdiag(t, rows // t))


def _flash_bwd_pallas(static, qkv2, lse, g2):
    num_heads, scale, rows, c, t, n, interpret = static
    total = qkv2.shape[0]
    grid = (total // rows,)
    kernel = functools.partial(
        _flash_core_bwd_kernel, num_heads=num_heads, scale=scale, c=c,
        use_mask=t > 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 3 * c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, rows), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 3 * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, 3 * c), qkv2.dtype),
        interpret=interpret,
    )(qkv2, lse, g2, _flash_offdiag(t, rows // t))


def _flash_core_fwd(static, qkv2):
    out, lse = _flash_fwd_pallas(static, qkv2)
    return out, (qkv2, lse)


def _flash_core_bwd(static, res, g):
    qkv2, lse = res
    dqkv = _flash_bwd_pallas(static, qkv2, lse,
                             g.astype(qkv2.dtype))
    return (dqkv,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(static, qkv2):
    out, _ = _flash_fwd_pallas(static, qkv2)
    return out


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_mha(qkv: jnp.ndarray, num_heads: int, scale: float,
              seqs_per_step: Optional[int] = None,
              interpret: Optional[bool] = None) -> jnp.ndarray:
    """Differentiable fused attention core over packed projections.

    ``qkv`` is ``[B, N, 3C]`` laid out ``[q | k | v]`` (each C wide, heads
    d-sliced within); returns the pre-output-projection context ``[B, N, C]``.
    Saves only the per-row LSE for the backward (flash-style); grads flow to
    ``qkv`` and from there through XLA's own autodiff of the projections.
    ``scale`` is explicit (the reference uses 1/sqrt(num_heads) —
    reference: VisionTransformer.py:42)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    interpret = (not _on_tpu()) if interpret is None else interpret
    t = _pick_seqs_per_step(b, n, seqs_per_step)
    rows = t * n
    static = (num_heads, float(scale), rows, c, t, n, bool(interpret))
    out = _flash_core(static, qkv.reshape(b * n, 3 * c))
    return out.reshape(b, n, c)


# ---------------------------------------------------------------------------
# Fused transformer block (inference)
# ---------------------------------------------------------------------------
#
# One kernel per layer: LN1 -> MHA (qkv, scores, softmax, PV, out-proj) ->
# residual -> LN2 -> MLP (fc1, exact GELU, fc2) -> residual, everything on
# VMEM-resident tiles of T batch elements x S tokens.  The composed XLA
# lowering round-trips the [B,S,C] activation to HBM between every one of
# the ~12 ops; here each layer reads x once and writes x once (device
# trace at batch 256: the 8-layer flagship stack costs 11.6 ms composed vs
# a ~5.5 ms flops+bytes floor).  Inference only — training keeps the
# composed path (autodiff through the XLA ops; the recompute-backward
# variant measured slower for long sequences, BASELINE.md).


def _erf(x):
    """erf for the exact-GELU inside kernels: Mosaic lowers neither erf nor
    erfc, so use the Abramowitz–Stegun 7.1.26 rational approximation
    (max abs error 1.5e-7 — three decades below the bf16 output quantum)."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _tblock_kernel(x_ref, ln1_s_ref, ln1_b_ref, qkv_w_ref, qkv_b_ref,
                   proj_w_ref, proj_b_ref, ln2_s_ref, ln2_b_ref,
                   fc1_w_ref, fc1_b_ref, fc2_w_ref, fc2_b_ref, offmask_ref,
                   fin_s_ref, fin_b_ref, out_ref, *, num_heads: int,
                   scale: float, eps: float, c: int, final_ln: bool,
                   seq: int, per_elem: bool):
    """One grid step: [T*S, C] rows of T batch elements through one
    transformer block.  Attention locality (batch elements must not attend
    to each other) comes in two flavors:

    * ``per_elem=False``: ONE dense [T*S, T*S] score matmul per head with
      ``offmask_ref`` (-1e9 off the T diagonal [S,S] blocks) masking the
      cross-element blocks.  The masked blocks are wasted MXU work that
      grows ~T^2, which caps the useful tile size at small T.
    * ``per_elem=True``: a static loop over the T elements with [S, S]
      scores each — no waste, so T can grow to amortize the per-step
      weight streaming (each grid step re-reads the layer's ~14 MB of
      weights from HBM; at T=4 that is ~7.2 GB for the flagship's 8-layer
      stack at batch 256 — the dominant cost, matching the measured ~10 ms
      against a ~0.6 ms activation-bytes floor).

    ``final_ln`` folds the stack's trailing encoder_norm into the last
    layer's kernel (as a separate op its input arrives in the kernel's
    output layout and XLA pays a relayout copy — 2.7 ms at batch 256)."""
    xf = x_ref[:].astype(jnp.float32)                    # [rows, C]

    def _ln(v, s_ref, b_ref):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        zc = v - mu
        var = jnp.mean(zc * zc, axis=-1, keepdims=True)
        return zc * jax.lax.rsqrt(var + eps) * s_ref[:] + b_ref[:]

    h = _ln(xf, ln1_s_ref, ln1_b_ref).astype(jnp.bfloat16)
    qkv = jnp.dot(h, qkv_w_ref[:],
                  preferred_element_type=jnp.float32) + qkv_b_ref[:]
    d = c // num_heads
    head_outs = []
    for hh in range(num_heads):
        q = qkv[:, hh * d:(hh + 1) * d] * scale
        k = qkv[:, c + hh * d:c + (hh + 1) * d]
        v = qkv[:, 2 * c + hh * d:2 * c + (hh + 1) * d]
        if per_elem:
            elems = []
            for t in range(0, q.shape[0], seq):
                s = jnp.dot(q[t:t + seq], k[t:t + seq].T,
                            preferred_element_type=jnp.float32)
                p = jax.nn.softmax(s, axis=-1)
                elems.append(jnp.dot(p.astype(jnp.bfloat16),
                                     v[t:t + seq].astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32))
            head_outs.append(jnp.concatenate(elems, axis=0))
        else:
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            s = s + offmask_ref[:]
            p = jax.nn.softmax(s, axis=-1)
            head_outs.append(jnp.dot(p.astype(jnp.bfloat16),
                                     v.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32))
    attn = jnp.concatenate(head_outs, axis=-1).astype(jnp.bfloat16)
    attn = jnp.dot(attn, proj_w_ref[:],
                   preferred_element_type=jnp.float32) + proj_b_ref[:]
    x1 = xf + attn                                        # residual (f32)

    h2 = _ln(x1, ln2_s_ref, ln2_b_ref).astype(jnp.bfloat16)
    m = jnp.dot(h2, fc1_w_ref[:],
                preferred_element_type=jnp.float32) + fc1_b_ref[:]
    g = (m * 0.5 * (1.0 + _erf(m * 0.7071067811865476))).astype(jnp.bfloat16)
    y = jnp.dot(g, fc2_w_ref[:],
                preferred_element_type=jnp.float32) + fc2_b_ref[:]
    out = x1 + y
    if final_ln:
        out = _ln(out, fin_s_ref, fin_b_ref)
    out_ref[:] = out.astype(out_ref.dtype)


_TBLOCK_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def transformer_block_fused(x: jnp.ndarray, p: dict, num_heads: int,
                            scale: float, eps: float,
                            batch_per_step: int = 4,
                            final_ln: Optional[Tuple] = None,
                            interpret: Optional[bool] = None,
                            per_elem: bool = False) -> jnp.ndarray:
    """One pre-LN transformer block, fused (inference).

    ``x [B, S, C]``; ``p`` holds the block's params under the flax names:
    ``attention_norm/{scale,bias}``, ``attn/{query,key,value,out}_{kernel,
    bias}``, ``ffn_norm/{scale,bias}``, ``ffn/fc1|fc2/{kernel,bias}``.
    ``scale`` is the attention scale (the reference's 1/sqrt(num_heads) —
    reference: VisionTransformer.py:42).  ``final_ln``: optional
    ``(scale, bias)`` of a trailing stack LayerNorm folded into this
    layer's kernel."""
    interpret = (not _on_tpu()) if interpret is None else interpret
    b, s, c = x.shape
    t = batch_per_step
    while b % t:
        t -= 1
    rows = t * s

    bf = jnp.bfloat16
    attn = p["attn"]
    qkv_w = jnp.concatenate([attn["query_kernel"], attn["key_kernel"],
                             attn["value_kernel"]], axis=1).astype(bf)
    qkv_b = jnp.concatenate([attn["query_bias"], attn["key_bias"],
                             attn["value_bias"]]).astype(jnp.float32)
    if per_elem:
        # per-element attention needs no mask; pass a dummy scalar-ish block
        offmask = jnp.zeros((8, 128), jnp.float32)
    else:
        # -1e9 between different batch elements of the tile (block-diag
        # locality)
        offmask = jnp.asarray(
            (1.0 - np.kron(np.eye(t, dtype=np.float32),
                           np.ones((s, s), np.float32))) * -1e9)

    args = (
        x.reshape(b * s, c).astype(bf),
        p["attention_norm"]["scale"].astype(jnp.float32),
        p["attention_norm"]["bias"].astype(jnp.float32),
        qkv_w, qkv_b,
        attn["out_kernel"].astype(bf),
        attn["out_bias"].astype(jnp.float32),
        p["ffn_norm"]["scale"].astype(jnp.float32),
        p["ffn_norm"]["bias"].astype(jnp.float32),
        p["ffn"]["fc1"]["kernel"].astype(bf),
        p["ffn"]["fc1"]["bias"].astype(jnp.float32),
        p["ffn"]["fc2"]["kernel"].astype(bf),
        p["ffn"]["fc2"]["bias"].astype(jnp.float32),
        offmask,
        (final_ln[0].astype(jnp.float32) if final_ln is not None
         else jnp.ones((c,), jnp.float32)),
        (final_ln[1].astype(jnp.float32) if final_ln is not None
         else jnp.zeros((c,), jnp.float32)),
    )
    m = p["ffn"]["fc1"]["kernel"].shape[-1]
    grid = (b // t,)

    def vspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_tblock_kernel, num_heads=num_heads,
                          scale=float(scale), eps=float(eps), c=c,
                          final_ln=final_ln is not None, seq=s,
                          per_elem=per_elem),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vspec((c,)), vspec((c,)),
            vspec((c, 3 * c)), vspec((3 * c,)),
            vspec((c, c)), vspec((c,)),
            vspec((c,)), vspec((c,)),
            vspec((c, m)), vspec((m,)),
            vspec((m, c)), vspec((c,)),
            vspec(tuple(offmask.shape)),
            vspec((c,)), vspec((c,)),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * s, c), jnp.bfloat16),
        interpret=interpret,
        compiler_params=None if interpret else _TBLOCK_VMEM,
    )(*args)
    return out.reshape(b, s, c).astype(x.dtype)


def transformer_stack_fused(x: jnp.ndarray, stacked: dict, num_heads: int,
                            scale: float, eps: float,
                            batch_per_step: Optional[int] = None,
                            final_ln: Optional[Tuple] = None,
                            interpret: Optional[bool] = None,
                            per_elem: Optional[bool] = None) -> jnp.ndarray:
    """Apply a whole stack of transformer blocks (inference).

    ``stacked``: the nn.scan param tree — every leaf has a leading [L]
    layer axis (models/transunet.py Encoder 'blocks'/'block').
    ``final_ln``: optional (scale, bias) of the stack's trailing
    encoder_norm, folded into the last layer's kernel.
    ``batch_per_step``/``per_elem``: tile size and attention flavor
    (see _tblock_kernel; large tiles amortize per-step weight streaming
    and need per_elem to avoid the masked-dense scheme's ~T^2 waste).
    Defaults are chosen by measurement at the flagship shape
    (benchmarks/stack_tile_sweep.py); env overrides ``UM_TPU_STACK_TILE``
    / ``UM_TPU_STACK_PER_ELEM=0|1`` exist for the sweep harness."""
    if batch_per_step is None:
        batch_per_step = int(os.environ.get("UM_TPU_STACK_TILE", "4"))
    if per_elem is None:
        # Default flipped to per-element in round 5: the flavor re-sweep on
        # the evolved kernel measured per-elem FASTER at both serving
        # batches (interleaved bench.py sessions, 2026-08-21: b128 7002 vs
        # 6820 fps, b256 6470 vs 6310 — +2.5-2.7%), overturning the
        # round-3 masked-dense default.  UM_TPU_STACK_PER_ELEM=0 restores
        # the dense flavor.
        per_elem = os.environ.get("UM_TPU_STACK_PER_ELEM", "1") == "1"
    n_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for layer in range(n_layers):
        p = jax.tree_util.tree_map(lambda a: a[layer], stacked)
        last = layer == n_layers - 1
        x = transformer_block_fused(x, p, num_heads, scale, eps,
                                    batch_per_step,
                                    final_ln=final_ln if last else None,
                                    interpret=interpret, per_elem=per_elem)
    return x


# ---------------------------------------------------------------------------
# Fused per-group channel LayerNorm (flat layout)
# ---------------------------------------------------------------------------
#
# Normalizes each contiguous group of ``gsize`` channels of a flat
# [N, F = G*gsize] tensor to zero mean / unit variance (per row, per group),
# then applies per-channel scale and bias — the per-branch "LayerNorm" of the
# fused split-attention stage (models/resnest.py ResidualS._flat_norm;
# reference semantics: keras LayerNorm per radix/cardinal branch,
# ResNest.py:19).  XLA lowers that as three+ full passes over the tensor
# (mean matmul, var matmul, normalize) with a badly tiled [*,F]x[F,G]
# contraction (~3.4 TFLOP/s measured); here each row tile is read once,
# stats ride the MXU on VMEM-resident blocks, and the normalized output is
# written once.  Backward is a second single-pass kernel (stats recomputed
# in-VMEM from the saved conv output, LN-style three-term gradient).


# Precision scheme: TPU matmuls default to bf16 multiplies, which would
# truncate the group means (catastrophic cancellation when centering).
# Instead of paying HIGHEST (6 MXU passes — measured to dominate the
# kernel), group SUMS are taken with a 0/1 block-diagonal selection matrix:
# bf16 x {0,1} products are exact with f32 accumulation at DEFAULT
# precision, so the mean (sum * 1/gsize in f32) is exact to input
# precision.  The variance terms square in bf16 (~2^-8 relative), which is
# below the bf16 quantization of the kernel's own output.


def _gfn_grp(x, msel_ref, inv: float, hi: bool):
    """Exact group-mean of ``x`` broadcast back to flat F space: one dot
    with the 0/1 selection matrix + f32 scale.  ``hi=False`` (bf16 model
    path): bf16 x {0,1} products are exact at default precision.
    ``hi=True`` (f32 inputs): pay the HIGHEST-precision passes."""
    if hi:
        s = jnp.dot(x, msel_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    else:
        s = jnp.dot(x.astype(jnp.bfloat16), msel_ref[:],
                    preferred_element_type=jnp.float32)
    return s * inv


def _gfn_fwd_kernel(y_ref, s_ref, b_ref, msel_ref, out_ref, *, eps: float,
                    inv: float, hi: bool, alpha: Optional[float]):
    y = y_ref[:].astype(jnp.float32)                     # [rows, F]
    mub = _gfn_grp(y, msel_ref, inv, hi)
    zc = y - mub
    varb = _gfn_grp(zc * zc, msel_ref, inv, hi)
    rstdb = jax.lax.rsqrt(varb + eps)                    # [rows, F]
    out = zc * rstdb * s_ref[:] + b_ref[:]
    if alpha is not None:
        # Folded LeakyReLU: the activation that always follows this norm in
        # the split-attention stage.  Standalone it is a full read+write HBM
        # pass (XLA cannot fuse an elementwise op INTO the opaque kernel
        # call); folded here it is free VPU work on the VMEM-resident tile.
        out = jnp.where(out >= 0.0, out, alpha * out)
    out_ref[:] = out.astype(out_ref.dtype)


def _gfn_bwd_kernel(y_ref, g_ref, s_ref, b_ref, msel_ref,
                    dy_ref, ds_ref, db_ref, *, eps: float, inv: float,
                    hi: bool, n_rows: int, rows: int, alpha: Optional[float]):
    i = pl.program_id(0)
    y = y_ref[:].astype(jnp.float32)                     # [rows, F]
    g = g_ref[:].astype(jnp.float32)
    # zero the tail-tile padding rows so the reductions stay exact
    row = i * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    valid = row < n_rows
    g = jnp.where(valid, g, 0.0)
    y = jnp.where(valid, y, 0.0)

    mub = _gfn_grp(y, msel_ref, inv, hi)
    zc = y - mub
    varb = _gfn_grp(zc * zc, msel_ref, inv, hi)
    rstdb = jax.lax.rsqrt(varb + eps)
    xhat = zc * rstdb                                    # [rows, F]
    if alpha is not None:
        # Chain through the folded LeakyReLU: the pre-activation is cheap to
        # recompute from the already-recomputed stats, and dL/dpre = g * act'
        # feeds the unchanged LN three-term gradient below.
        pre = xhat * s_ref[:] + b_ref[:]
        g = g * jnp.where(pre >= 0.0, 1.0, alpha)

    sg = g * s_ref[:]
    t1 = _gfn_grp(sg, msel_ref, inv, hi)
    t2 = _gfn_grp(sg * xhat, msel_ref, inv, hi)
    dy = (sg - t1 - xhat * t2) * rstdb
    dy_ref[:] = jnp.where(valid, dy, 0.0).astype(dy_ref.dtype)

    dspart = jnp.sum(g * xhat, axis=0)                   # [F]
    dbpart = jnp.sum(g, axis=0)

    @pl.when(i == 0)
    def _init():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    ds_ref[:] += dspart
    db_ref[:] += dbpart


def _gfn_matrices(f: int, gsize: int):
    g = f // gsize
    msel = np.kron(np.eye(g, dtype=np.float32),
                   np.ones((gsize, gsize), np.float32))   # [F, F], 0/1
    return (jnp.asarray(msel, jnp.bfloat16),)


_GFN_VMEM = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)


def _gfn_rows(n: int, f: int) -> int:
    # big tiles: the per-grid-step dots are tiny, so fewer/larger steps
    # amortize their MXU latency; bounded by the Mosaic scoped-VMEM stack
    # (f32 intermediates are rows x pad128(F) x 4B each)
    rows = 2048 if f <= 128 else (1024 if f <= 384 else 512)
    return min(rows, max(16, n))


def _gfn_fwd_pallas(static, y2, scale, bias):
    gsize, eps, interpret, alpha = static
    n, f = y2.shape
    rows = _gfn_rows(n, f)
    (mavg,) = _gfn_matrices(f, gsize)
    grid = (pl.cdiv(n, rows),)
    return pl.pallas_call(
        functools.partial(_gfn_fwd_kernel, eps=eps, inv=1.0 / gsize,
                          hi=y2.dtype != jnp.bfloat16, alpha=alpha),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f), y2.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _GFN_VMEM,
    )(y2, scale.astype(jnp.float32), bias.astype(jnp.float32), mavg)


def _gfn_bwd_pallas(static, y2, scale, bias, g):
    gsize, eps, interpret, alpha = static
    n, f = y2.shape
    rows = _gfn_rows(n, f)
    (mavg,) = _gfn_matrices(f, gsize)
    grid = (pl.cdiv(n, rows),)
    kernel = functools.partial(_gfn_bwd_kernel, eps=eps, inv=1.0 / gsize,
                               hi=y2.dtype != jnp.bfloat16,
                               n_rows=n, rows=rows, alpha=alpha)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, f), y2.dtype),
            jax.ShapeDtypeStruct((f,), jnp.float32),
            jax.ShapeDtypeStruct((f,), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _GFN_VMEM,
    )(y2, g, scale.astype(jnp.float32), bias.astype(jnp.float32), mavg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gfn_core(static, y2, scale, bias):
    return _gfn_fwd_pallas(static, y2, scale, bias)


def _gfn_core_fwd(static, y2, scale, bias):
    return _gfn_fwd_pallas(static, y2, scale, bias), (y2, scale, bias)


def _gfn_core_bwd(static, res, g):
    y2, scale, bias = res
    dy, dscale, dbias = _gfn_bwd_pallas(static, y2, scale, bias, g)
    return dy, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_gfn_core.defvjp(_gfn_core_fwd, _gfn_core_bwd)


def group_flat_norm(y: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    gsize: int, eps: float,
                    interpret: Optional[bool] = None,
                    act: Optional[str] = None,
                    act_alpha: float = 0.3) -> jnp.ndarray:
    """Per-group channel LayerNorm over a flat channel axis.

    ``y [..., F]`` with ``F = G * gsize``: each contiguous ``gsize`` slice is
    normalized to its own mean/variance (computed over that slice, per
    leading index), then scaled/shifted by the per-channel ``scale``/``bias``
    (flattened to ``[F]``).  ``act='leaky'`` additionally applies
    LeakyReLU(``act_alpha``) inside the kernel — the norm is always followed
    by it in the split-attention stage, and standalone the activation costs
    a full HBM read+write pass that cannot fuse into the opaque kernel call.
    Differentiable (custom VJP; both passes are single-sweep Pallas kernels
    on TPU, interpret mode elsewhere)."""
    if act not in (None, "leaky"):
        raise ValueError(f"unsupported folded activation {act!r}")
    interpret = (not _on_tpu()) if interpret is None else interpret
    f = y.shape[-1]
    if f % gsize:
        raise ValueError(f"channels {f} not divisible by group size {gsize}")
    y2 = y.reshape(-1, f)
    alpha = float(act_alpha) if act == "leaky" else None
    static = (int(gsize), float(eps), bool(interpret), alpha)
    out = _gfn_core(static, y2, scale.reshape(-1), bias.reshape(-1))
    return out.reshape(y.shape)


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
    train.losses.cce_smooth.

    NOTE: the train step uses data.labels.label2vec directly (XLA fuses it
    into the loss); this kernel is the standalone Pallas formulation, kept
    equivalence-tested.  Batched inputs are gridded one image per program
    so a full batch never has to fit VMEM at once."""
    interpret = (not _on_tpu()) if interpret is None else interpret
    label = label.astype(jnp.float32)
    squeeze = label.ndim == 2
    if squeeze:
        label = label[None]
    lead, hw = label.shape[0], label.shape[1:]
    out = pl.pallas_call(
        functools.partial(_label_kernel, smoothing=float(smoothing)),
        grid=(lead,),
        out_shape=jax.ShapeDtypeStruct((lead,) + hw + (3,), jnp.float32),
        in_specs=[pl.BlockSpec((1,) + hw, lambda i: (i,) + (0,) * len(hw),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + hw + (3,),
                               lambda i: (i,) + (0,) * (len(hw) + 1),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(label)
    return out[0] if squeeze else out
