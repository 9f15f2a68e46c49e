"""Loss families.

All three reference loss families are supported (all operate on post-softmax
probabilities, as the reference models emit probabilities, not logits):

1. ``cce_smooth`` — Keras CategoricalCrossentropy(label_smoothing=0.1,
   reduction=NONE) + ``tf.nn.compute_average_loss`` over the global batch
   (reference: VisionTransformer.py:205-206,225-227): per-pixel CE summed over
   pixels, averaged over the *global* batch.
2. ``class_balanced`` — per-class inverse-frequency scaling
   ``1/(sum_b y_c + 1)/(H*W)`` (reference: TBI_ResNest.py:234-248).
3. ``factor_scaled`` — constant class factors [0.06329, 0.027567, 0.90914]
   with manual smoothing y*0.9 + 0.1/C and clip 1e-7
   (reference: VisionTransformer.py:259-279); the PixelCNN variant
   (reference: TBIPixelCNN.py:223-230) and the inference-side variant with
   factors [1.1603, 0.50832, 5.8513] (reference: TBIEvaluator.py:121-129)
   are the same shape with different constants.

Each returns a scalar; the reference's trailing ``tf.reduce_sum`` on
map-shaped losses is folded in.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

DEFAULT_CLASS_FACTOR = (0.06329, 0.027567, 0.90914)
EVAL_CLASS_FACTOR = (1.1603, 0.50832, 5.8513)
_EPS = 1e-7


def cce_smooth(y_true: jnp.ndarray, probs: jnp.ndarray,
               label_smoothing: float = 0.1,
               global_batch_size: int | None = None) -> jnp.ndarray:
    """Smoothed categorical cross-entropy, summed over pixels, averaged over
    the global batch (reference: VisionTransformer.py:225-227)."""
    c = y_true.shape[-1]
    y = y_true * (1.0 - label_smoothing) + label_smoothing / c
    p = jnp.clip(probs, _EPS, 1.0 - _EPS)
    per_pixel = -jnp.sum(y * jnp.log(p), axis=-1)  # [B, H, W]
    gb = global_batch_size if global_batch_size else y_true.shape[0]
    return jnp.sum(per_pixel) / gb


def class_balanced(y_true: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
    """Inverse-frequency class-balanced CE (reference: TBI_ResNest.py:234-248).

    Per class c: scale = 1 / (sum_b y_c + 1) / (H*W)  (shape [H, W]);
    CE_c = sum_b (y_c * log(p_c + 1e-7)) * scale; loss = -sum_{h,w} sum_c CE_c.
    """
    h, w = y_true.shape[1], y_true.shape[2]
    num_classes = y_true.shape[-1]
    ce = jnp.zeros((h, w), jnp.float32)
    for c in range(num_classes):
        yc = y_true[..., c]
        pc = probs[..., c]
        scale = 1.0 / (jnp.sum(yc, axis=0) + 1.0) / (h * w)
        ce = ce + jnp.sum(yc * jnp.log(pc + _EPS), axis=0) * scale
    return -jnp.sum(ce)


def factor_scaled(y_true: jnp.ndarray, probs: jnp.ndarray,
                  class_factor: Sequence[float] = DEFAULT_CLASS_FACTOR,
                  smoothing: float = 0.1) -> jnp.ndarray:
    """Constant-class-factor CE with manual smoothing
    (reference: VisionTransformer.py:259-279): loss =
    -3 * sum_{b,h,w,c} y' * log(clip(p)) * factor[c]."""
    c = y_true.shape[-1]
    y = y_true * (1.0 - smoothing) + smoothing / c
    p = jnp.clip(probs, _EPS, 1.0 - _EPS)
    cf = jnp.asarray(class_factor, jnp.float32)
    return -3.0 * jnp.sum(y * jnp.log(p) * cf)


def pixelcnn_loss(y_true: jnp.ndarray, probs: jnp.ndarray,
                  class_factor: Sequence[float] = DEFAULT_CLASS_FACTOR
                  ) -> jnp.ndarray:
    """Per-class scaled CE (reference: TBIPixelCNN.py:223-230):
    CE_c = sum(y_c * log p_c) / (sum y_c + 1) * factor[c]; loss = -sum_c CE_c."""
    cf = jnp.asarray(class_factor, jnp.float32)
    num_classes = y_true.shape[-1]
    ce = 0.0
    for c in range(num_classes):
        yc = y_true[..., c]
        pc = jnp.clip(probs[..., c], _EPS, 1.0)
        scale = 1.0 / (jnp.sum(yc) + 1.0)
        ce = ce + jnp.sum(yc * jnp.log(pc)) * scale * cf[c]
    return -ce


def evaluator_loss(y_true: jnp.ndarray, probs: jnp.ndarray,
                   class_factor: Sequence[float] = EVAL_CLASS_FACTOR
                   ) -> jnp.ndarray:
    """Inference-side variant (reference: TBIEvaluator.py:121-129)."""
    cf = jnp.asarray(class_factor, jnp.float32)
    scale = 1.0 / jnp.sum(y_true)
    ce = 0.0
    for c in range(y_true.shape[-1]):
        pc = jnp.clip(probs[..., c], _EPS, 1.0)
        ce = ce + jnp.sum(y_true[..., c] * jnp.log(pc)) * scale * cf[c]
    return -3.0 * ce


def l2_regularization(params, scale: float = 1e-5) -> jnp.ndarray:
    """Keras-style L2 kernel regularization summed into the loss
    (reference: TBI_Transformer.py:11 ``L2(l2=1e-5)`` on dense/conv kernels,
    added to the loss at TBI_Transformer.py:234 ``sum(model.losses)``).
    Applies to 'kernel' leaves only (not biases/norm scales), like Keras."""
    total = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = str(getattr(path[-1], "key", path[-1]))
        if name == "kernel":
            total = total + jnp.sum(jnp.square(leaf))
    return scale * total


LOSSES = {
    "cce_smooth": cce_smooth,
    "class_balanced": class_balanced,
    "factor_scaled": factor_scaled,
    "pixelcnn": pixelcnn_loss,
    "evaluator": evaluator_loss,
}


def get_loss(name: str):
    if name not in LOSSES:
        raise KeyError(f"unknown loss {name!r}; available: {sorted(LOSSES)}")
    return LOSSES[name]
