"""Shared building blocks for the model zoo.

Normalization/activation defaults match the TF/Keras layers the reference
uses: Keras ``LayerNormalization`` (eps 1e-3, channels-only), Keras
``BatchNormalization`` (momentum 0.99, eps 1e-3), ``LeakyReLU`` (alpha 0.3),
``ELU``.  The modular ResNeSt (reference: ResNest.py:19,86,125) mixes
BatchNorm in the stem with LayerNorm in the blocks; the standalone U-Net
(reference: TBI_ResNest.py:90,144,164) is all-BatchNorm with ELU — both are
expressible via the ``norm``/``act`` kinds here.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# Keras defaults the reference relies on.
KERAS_LN_EPS = 1e-3
KERAS_BN_EPS = 1e-3
KERAS_BN_MOMENTUM = 0.99
LEAKY_ALPHA = 0.3

he_normal = nn.initializers.he_normal()
glorot_uniform = nn.initializers.glorot_uniform()

# Compute dtype for matmuls/convs (params stay float32).  bfloat16 doubles
# MXU throughput on TPU; set before model construction/trace (trace-time
# constant).  Softmaxes and losses stay in float32 regardless.
_COMPUTE_DTYPE = None  # None = float32 everywhere


def set_compute_dtype(dtype) -> None:
    """Set the global compute dtype ('bfloat16' / jnp.bfloat16 / None)."""
    global _COMPUTE_DTYPE
    if isinstance(dtype, str):
        dtype = None if dtype in ("float32", "f32") else jnp.dtype(dtype).type
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


def resolve_attn_impl(impl: str) -> str:
    """Resolve 'auto' per platform: fused Pallas kernels on TPU, XLA
    elsewhere.  Measured on one v5e chip (batch-128 forward, bf16): Swin
    +29% (20-token windows), ViT +49% (33.0 vs 49.2 ms), TransUNet +2.5%
    (21.1 vs 21.7 ms) — the VMEM tile cap in models/transunet.Attention is
    what makes the long-sequence cases win.

    Model gates compare the literal string 'pallas', so this must run
    before (or at) the gate — the modules call it themselves, which keeps
    directly-constructed models (attn_impl='auto') on the measured-fastest
    path instead of silently degrading to XLA."""
    if impl == "auto":
        return "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl not in ("xla", "pallas"):
        # A typo ('palas') would otherwise silently degrade to the
        # composed-XLA path — the same silent-degradation class the 'auto'
        # resolution fix closed.  'flash' is deliberately NOT accepted
        # here: it is the train-path LSE-saving core (flash_mha), and no
        # inference consumer implements it — validating it would silently
        # disable the fused eval kernels (use attn_train_impl instead).
        raise ValueError(f"unknown attn_impl {impl!r}; "
                         "expected 'auto', 'xla' or 'pallas'")
    return impl


def resolve_attn_train_impl(impl: str) -> str:
    """Resolve the TRAIN-path attention impl.  'auto' -> the LSE-saving
    flash core on TPU (measured vit train step +24.6% at b128 / +16.7% at
    b64, BASELINE.md round 5), composed XLA elsewhere (off-TPU the Pallas
    kernels run interpret mode — orders of magnitude slower).  Explicit
    'flash'/'pallas' are honored everywhere (interpret mode on CPU, as the
    parity tests use)."""
    if impl == "auto":
        return "flash" if jax.devices()[0].platform == "tpu" else "xla"
    if impl not in ("xla", "pallas", "flash"):
        raise ValueError(f"unknown attn_train_impl {impl!r}; "
                         "expected 'auto', 'xla', 'pallas' or 'flash'")
    return impl


def activation(kind: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if kind == "leaky":
        return lambda x: nn.leaky_relu(x, negative_slope=LEAKY_ALPHA)
    if kind == "elu":
        return nn.elu
    if kind == "relu":
        return nn.relu
    if kind == "relu6":
        # MobileNetV2 blocks (reference: TBIPixelCNN.py:115,130 use ReLU(6.);
        # the LeakyReLU(6.) at TBIPixelCNN.py:52,92 is a latent typo for ReLU6
        # — we implement the intent).
        return lambda x: jnp.minimum(nn.relu(x), 6.0)
    if kind == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation {kind!r}")


class Norm(nn.Module):
    """Keras-flavoured norm selected by kind: 'layer' | 'batch' | 'none'."""

    kind: str = "layer"
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "layer":
            return nn.LayerNorm(epsilon=KERAS_LN_EPS,
                                dtype=compute_dtype())(x)
        if self.kind == "batch":
            ura = (not train if self.use_running_average is None
                   else self.use_running_average)
            return nn.BatchNorm(
                use_running_average=ura,
                momentum=KERAS_BN_MOMENTUM, epsilon=KERAS_BN_EPS,
                dtype=compute_dtype(), axis_name=None)(x)
        if self.kind == "none":
            return x
        raise ValueError(f"unknown norm {self.kind!r}")


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """Keras ``AveragePooling2D(pool_size=2, strides=2)`` (VALID padding)."""
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2), padding="VALID")


def conv(features: int, kernel: int | tuple = 3, strides: int = 1,
         dilation: int = 1, use_bias: bool = True,
         kernel_init=he_normal, name: Optional[str] = None) -> nn.Conv:
    """Keras-``Conv2D``-equivalent with SAME padding."""
    k = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    s = strides if isinstance(strides, tuple) else (strides, strides)
    return nn.Conv(features, kernel_size=k, strides=s, padding="SAME",
                   kernel_dilation=(dilation, dilation), use_bias=use_bias,
                   kernel_init=kernel_init, dtype=compute_dtype(), name=name)


def conv_transpose(features: int, kernel: int = 3, strides: int = 2,
                   use_bias: bool = True, kernel_init=he_normal,
                   name: Optional[str] = None) -> nn.ConvTranspose:
    """Keras-``Conv2DTranspose(padding='same')``-equivalent: out = in * stride."""
    return nn.ConvTranspose(
        features, kernel_size=(kernel, kernel), strides=(strides, strides),
        padding="SAME", use_bias=use_bias, kernel_init=kernel_init,
        dtype=compute_dtype(), name=name)


def dense(features: int, use_bias: bool = True,
          kernel_init=glorot_uniform, name: Optional[str] = None) -> nn.Dense:
    """Keras-``Dense``-default (glorot_uniform) equivalent."""
    return nn.Dense(features, use_bias=use_bias, kernel_init=kernel_init,
                    dtype=compute_dtype(), name=name)


def dropout(rate: float, deterministic: bool) -> Callable:
    if rate == 0.0:
        return lambda x: x
    return nn.Dropout(rate=rate, deterministic=deterministic)
