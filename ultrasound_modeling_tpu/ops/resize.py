"""On-device resize and Gaussian blur.

The reference leans on OpenCV's C++ kernels for these (``cv2.resize`` at
DataPreprocessing.py:133-135 / DataFilePlayGround.py:379-381,
``cv2.GaussianBlur(ksize=(9,9), sigmaX=4)`` at DataFilePlayGround.py:338-340).
Here they are XLA ops usable both in the host ETL (CPU backend) and fused into
device pipelines:

* ``resize_bilinear`` — half-pixel-aligned bilinear, matching cv2's
  INTER_LINEAR convention (jax.image.resize 'linear' uses the same
  half-pixel sampling grid).
* ``gaussian_blur`` — separable conv with OpenCV's getGaussianKernel weights
  and BORDER_REFLECT_101 boundary (= numpy 'reflect').
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int],
                    channels_last: bool = True) -> jnp.ndarray:
    """Resize images bilinearly.

    Rank 2 is ``[H, W]``; rank 3 is ``[H, W, C]`` when ``channels_last``
    (the default, matching cv2) and ``[B, H, W]`` otherwise; rank 4 is
    ``[B, H, W, C]``.  The flag exists because the two rank-3 layouts are
    indistinguishable from shape alone — resizing a batched-grayscale stack
    under the channels-last assumption would silently interpolate ACROSS
    the batch axis."""
    if img.ndim == 2:
        return jax.image.resize(img, out_hw, method="linear")
    if img.ndim == 3:
        if channels_last:  # [H, W, C]
            return jax.image.resize(img, out_hw + (img.shape[-1],),
                                    method="linear")
        return jax.image.resize(img, (img.shape[0],) + out_hw,
                                method="linear")  # [B, H, W]
    # batched [B, H, W, C]
    return jax.image.resize(
        img, (img.shape[0],) + out_hw + (img.shape[-1],), method="linear")


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """OpenCV getGaussianKernel: truncated Gaussian, normalized."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jnp.ndarray, ksize: int = 9,
                  sigma: float = 4.0) -> jnp.ndarray:
    """Separable Gaussian blur of a 2-D image, reflect-101 boundary
    (cv2.GaussianBlur equivalent)."""
    k = jnp.asarray(gaussian_kernel1d(ksize, sigma))
    # total padding must be ksize-1 so the 'valid' conv restores H x W
    # (symmetric ksize//2 per side over-pads by one for even ksize).
    pad_lo, pad_hi = (ksize - 1) // 2, ksize // 2
    x = jnp.pad(img, ((pad_lo, pad_hi), (pad_lo, pad_hi)), mode="reflect")
    # Rows then cols via 1-D convs (VPU-friendly; XLA fuses).
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                 in_axes=1, out_axes=1)(x)
    return x
