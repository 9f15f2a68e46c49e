"""Multi-head attention with the reference's numerics.

The TransUNet / pure-ViT attention scales scores by ``1/sqrt(num_heads)`` —
NOT the standard ``1/sqrt(d_head)`` (reference: VisionTransformer.py:42,
TBI_Transformer.py:50).  This is preserved as a parity-critical quirk.

Sequence lengths here are tiny (80 tokens TransUNet, 160 tokens ViT), so a
flash-attention decomposition buys nothing; a single fused XLA softmax-matmul
chain is already optimal (everything fits in VMEM).  The interesting kernel
surface is the *windowed* attention in ops.window_attn.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        num_heads: int, scale: Optional[float] = None) -> jnp.ndarray:
    """Batched MHA over ``[B, S, H*D]`` projections.

    Args:
      q, k, v: ``[B, S, hidden]`` already-projected tensors.
      num_heads: head count; hidden must divide evenly.
      scale: score scale; defaults to the reference's ``1/sqrt(num_heads)``.

    Returns ``[B, S, hidden]`` (pre-output-projection context).
    """
    b, s, hidden = q.shape
    d = hidden // num_heads
    if scale is None:
        scale = 1.0 / jnp.sqrt(jnp.asarray(num_heads, q.dtype))

    def split(x):  # [B, S, hidden] -> [B, heads, S, d]
        return x.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("bhsd,bhtd->bhst", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhst,bhtd->bhsd", probs, vh,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, hidden)
