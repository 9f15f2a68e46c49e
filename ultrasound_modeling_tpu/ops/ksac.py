"""Kernel-Sharing Atrous Convolution (KSAC).

The reference implements a shared-weight multi-dilation conv by decomposing a
k x k conv into k^2 per-tap 1x1 matmuls and shift-adding each tap once per
dilation rate (reference: Decoder.py:226-290, via tf.raw_ops BatchMatMulV2 /
Pad / SelectV2).  The algorithmic point: the expensive per-tap products
``v_ij = x @ K[i, j]`` are computed ONCE and reused by every dilation rate, so
R dilation rates cost ~1 conv of FLOPs instead of R.

Two implementations, equivalence-tested against each other:

* ``ksac_shared_taps`` — the shared-tap decomposition in pure XLA: one
  ``[N*H*W, Cin] x [Cin, k^2*Cout]`` matmul (a single large MXU op), then
  static shift-accumulate per rate.  This is the default.
* ``ksac_naive`` — R separate ``lax.conv_general_dilated`` calls with the same
  kernel (what XLA would do without the sharing insight); used as the
  reference implementation in tests and as a fallback.

Boundary semantics: each shifted tap is zero-padded (no wrap), identical to a
SAME-padded dilated conv with zero boundaries — so the two implementations
agree exactly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def ksac_naive(x: jnp.ndarray, kernel: jnp.ndarray,
               rates: Sequence[int]) -> Tuple[jnp.ndarray, ...]:
    """R SAME-padded dilated convs sharing one ``[kh, kw, Cin, Cout]`` kernel."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    outs = []
    for r in rates:
        outs.append(jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="SAME",
            rhs_dilation=(r, r), dimension_numbers=dn))
    return tuple(outs)


def _shift2d(v: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[n, i, j, c] = v[n, i - dy, j - dx, c], zero-filled (static shifts)."""
    n, h, w, c = v.shape
    pad = [(0, 0), (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)), (0, 0)]
    v = jnp.pad(v, pad)
    return jax.lax.dynamic_slice(
        v, (0, max(-dy, 0), max(-dx, 0), 0), (n, h, w, c))


def ksac_shared_taps(x: jnp.ndarray, kernel: jnp.ndarray,
                     rates: Sequence[int]) -> Tuple[jnp.ndarray, ...]:
    """Shared-tap KSAC: one big matmul + per-rate static shift-accumulates.

    For a SAME conv with dilation r, out = sum_{i,j} shift((i - kc)*r,
    (j - kc)*r)(x @ K[i, j]); the taps are shared across rates.

    Odd kernel sizes only: XLA's SAME padding is asymmetric for even
    kernels (lo = (k-1)*r//2), while the center-tap decomposition here is
    symmetric — an even kernel would be silently shifted one pixel
    relative to ``ksac_naive``.  The reference only uses 3x3 KSAC kernels
    (Decoder.py:294-344).
    """
    kh, kw, cin, cout = kernel.shape
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError(
            f"ksac_shared_taps requires odd kernel sizes, got {(kh, kw)} "
            "(even-kernel SAME padding is asymmetric; use impl='naive')")
    n, h, w, _ = x.shape
    # [N*H*W, Cin] @ [Cin, kh*kw*Cout] — one MXU-friendly matmul.
    xf = x.reshape(n * h * w, cin)
    kf = kernel.reshape(kh * kw * 1, cin, cout).transpose(1, 0, 2).reshape(
        cin, kh * kw * cout)
    v = (xf @ kf).reshape(n, h, w, kh * kw, cout)

    outs = []
    cy, cx = kh // 2, kw // 2
    # SAME dilated cross-correlation: out[p] = sum_ij x[p + (i-c)*r] K[ij]
    #                                        = sum_ij v_ij[p + (i-c)*r]
    # i.e. v_ij shifted by -(i-c)*r under _shift2d's out[p] = v[p - d].
    for r in rates:
        acc = jnp.zeros((n, h, w, cout), dtype=v.dtype)
        for i in range(kh):
            for j in range(kw):
                dy = (cy - i) * r
                dx = (cx - j) * r
                acc = acc + _shift2d(v[:, :, :, i * kw + j, :], dy, dx)
        outs.append(acc)
    return tuple(outs)


def ksac(x: jnp.ndarray, kernel: jnp.ndarray, rates: Sequence[int],
         impl: str = "shared") -> Tuple[jnp.ndarray, ...]:
    if impl == "shared":
        return ksac_shared_taps(x, kernel, rates)
    if impl == "naive":
        return ksac_naive(x, kernel, rates)
    raise ValueError(f"unknown ksac impl {impl!r}")


class KernelSharingConv(nn.Module):
    """Kernel-sharing atrous conv layer (reference: Decoder.py:294-346).

    One shared ``[k, k, Cin, Cout]`` kernel evaluated at all dilation rates
    (default (1, 2, 4, 8, 16) — Decoder.py:295), each rate BatchNorm'd and
    GELU'd (Decoder.py:332-345), then SUMMED across rates.  (The reference's
    KSACBlock stacks the per-rate list into a 5-D tensor and feeds it to a
    2-D conv — dead/broken code, SURVEY.md §2.12; summation is the KSAC
    paper's semantics and the evident intent.)
    """

    features: int
    kernel_size: int = 3
    rates: Tuple[int, ...] = (1, 2, 4, 8, 16)
    impl: str = "shared"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultrasound_modeling_tpu.models.common import Norm
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features))
        ys = ksac(x, kernel.astype(x.dtype), self.rates, self.impl)
        out = None
        for r, y in zip(self.rates, ys):
            y = Norm("batch", name=f"bn_r_{r}")(y, train)
            y = nn.gelu(y, approximate=False)
            out = y if out is None else out + y
        return out
