"""Post-training int8 weight-only quantization for serving.

A TPU-native serving feature beyond the reference (which serves f32 Keras
SavedModels on CPU — reference: TBIEvaluator.py:28,235-238): kernel weights
are stored int8 with a per-output-channel f32 scale and dequantized on-chip
inside the jitted forward.  Weight HBM traffic and exported-artifact size
drop ~2x (vs bf16) / ~4x (vs f32); at serving batch sizes small enough to be
weight-bound (the clinical per-frame path), that is the latency floor.
Activations and the matmuls themselves stay in the model's compute dtype —
this is weight-only (dequantize-then-compute), so accuracy loss is bounded by
int8 rounding of the weights alone (measured in BASELINE.md).

Usage:
    qparams = quantize_params(state.params)
    fwd = make_quantized_forward(model, state)        # x -> probs
    # or thread through export:  cli export --quantize int8
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Leaves smaller than this stay f32: biases, norm scales/offsets, the
# relative-position bias tables — quantizing them saves ~nothing and they
# are precision-critical.
MIN_QUANT_SIZE = 4096


def _is_qleaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"q", "scale"}


def _quantize_leaf(w):
    """Symmetric per-output-channel (last axis) int8 quantization."""
    w = np.asarray(w)
    reduce_axes = tuple(range(w.ndim - 1))
    absmax = np.max(np.abs(w), axis=reduce_axes, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"q": q, "scale": scale.astype(np.float32)}


def quantize_params(params, min_size: int = MIN_QUANT_SIZE):
    """Quantize every kernel-like leaf (ndim >= 2, size >= min_size) to
    {'q': int8, 'scale': f32 per-output-channel}; other leaves pass through.
    """

    def visit(leaf):
        arr = np.asarray(leaf)
        if arr.ndim >= 2 and arr.size >= min_size and np.issubdtype(
                arr.dtype, np.floating):
            return _quantize_leaf(arr)
        return leaf

    return jax.tree_util.tree_map(visit, params)


def dequantize_params(qparams, dtype=jnp.float32):
    """Inverse transform — runs on device inside jit, so the HBM-resident
    weights stay int8 and the convert happens on-chip."""

    def visit(leaf):
        if _is_qleaf(leaf):
            return (jnp.asarray(leaf["q"]).astype(dtype)
                    * jnp.asarray(leaf["scale"]).astype(dtype))
        return leaf

    return jax.tree_util.tree_map(visit, qparams, is_leaf=_is_qleaf)


def quantized_fraction(qparams) -> float:
    """Fraction of parameter scalars stored int8 (coverage diagnostic)."""
    total = quant = 0
    for leaf in jax.tree_util.tree_leaves(
            qparams, is_leaf=_is_qleaf):
        if _is_qleaf(leaf):
            quant += leaf["q"].size
            total += leaf["q"].size
        else:
            total += np.asarray(leaf).size
    return quant / max(total, 1)


def quantized_forward_fn(model, state):
    """Unjitted ``x -> probs`` closure with int8-resident weights (eval
    mode) — shared by :func:`make_quantized_forward` (jits it) and
    infer/export.py (traces it through jax.export)."""
    from ultrasound_modeling_tpu.train.step import _apply

    qparams = quantize_params(state.params)

    def fwd(x):
        params = dequantize_params(qparams)
        probs, _ = _apply(model, params, state.batch_stats, x, False, None)
        return probs

    return fwd


def make_quantized_forward(model, state):
    """Jitted ``x -> probs`` with int8-resident weights (eval mode)."""
    return jax.jit(quantized_forward_fn(model, state))
