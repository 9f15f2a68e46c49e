"""Label encoding.

The ETL produces *soft* scalar labels in {0: outside brain, 1: brain,
2: bleed} with in-between values introduced by resize/Gaussian-blur smoothing
(reference: DataFilePlayGround.py:330-343).  ``label2vec`` converts them to a
3-channel probabilistic map with the reference's exact thresholds
(reference: Dataset_2.py:6-20; rationale for 0.95/1.05 at Dataset_2.py:78-84):

  class_2 = clip(label - 1, 0, 1)        where label >= 1.05, else 0
  class_1 = 1 - class_2                  where label >  0.95, else 0
  class_0 = 1                            where label <= 0.95, else 0

This soft labeling is a deliberate feature of the reference, not one-hot
(except the MobileUNet pipeline, which one-hots integer labels —
reference: TBIPixelCNN.py:22-23).

All functions here are pure jnp and run inside ``jit`` on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def label2vec(label: jnp.ndarray, num_classes: int = 3) -> jnp.ndarray:
    """Soft class maps from a scalar label image.

    Args:
      label: float array ``[..., H, W]`` with values around {0, 1, 2}.
      num_classes: 3 (bleed task) or 2 (brain-mask task).

    Returns:
      float32 array ``[..., H, W, num_classes]``.
    """
    label = label.astype(jnp.float32)
    if num_classes == 3:
        class_2 = jnp.where(label >= 1.05, label - 1.0, 0.0)
        class_2 = jnp.minimum(class_2, 1.0)
        class_1 = jnp.where(label > 0.95, 1.0 - class_2, 0.0)
        class_0 = jnp.where(label <= 0.95, 1.0, 0.0)
        return jnp.stack([class_0, class_1, class_2], axis=-1)
    elif num_classes == 2:
        # 2-class variant (reference: Dataset_2.py:14-19).
        return jnp.stack([1.0 - label, label], axis=-1)
    else:
        raise ValueError(f"num_classes must be 2 or 3, got {num_classes}")


def one_hot_labels(label: jnp.ndarray, num_classes: int = 3) -> jnp.ndarray:
    """Integer one-hot variant used by the MobileUNet pipeline
    (reference: TBIPixelCNN.py:22-23)."""
    idx = label.astype(jnp.int32)
    return jnp.eye(num_classes, dtype=jnp.float32)[jnp.clip(idx, 0, num_classes - 1)]


def vec2label(vec: jnp.ndarray) -> jnp.ndarray:
    """Collapse class maps back to a scalar label image via argmax
    (used by the inference renderer)."""
    return jnp.argmax(vec, axis=-1).astype(jnp.float32)
