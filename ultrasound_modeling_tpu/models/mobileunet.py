"""MobileNetV2 U-Net (the reference's "PixelCNN" — actually a pix2pix-style
MobileNet U-Net, reference: TBIPixelCNN.py).

Encoder: hand-rolled MobileNetV2 (reference: TBIPixelCNN.py:41-143) — stem
conv 32 s2, 16 inverted-residual blocks with expansion 6 and the reference's
filter/stride table, final 1x1 conv 1280.  Depthwise convs map to
``feature_group_count`` grouped convs (MXU-friendly).  Skip taps at
block_{1,3,6,12}_expand_relu + out_relu (reference: TBIPixelCNN.py:174-180).

Decoder: pix2pix upsample stack 512,512,256,128,64 (dropout on the first 3 —
reference: TBIPixelCNN.py:189-195), skip concats, transposed-conv softmax head
(:214-217).

The encoder/decoder train with different Adam rates in the reference
(2e-3 / 2e-4, beta1 0.5 — TBIPixelCNN.py:256-257); parameters are namespaced
``encoder``/``decoder`` here so optax.multi_transform can split them
(see train.optim.make_dual_rate_optimizer).

Activations: ReLU6 in the inverted residuals (reference: TBIPixelCNN.py:115,
130; the LeakyReLU(6.) at :52,:92 is a latent typo for ReLU6 — intent
implemented).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ultrasound_modeling_tpu.models.common import Norm, activation, compute_dtype

# (filters, stride) per inverted-residual block (reference: TBIPixelCNN.py:53-84).
_BLOCK_TABLE = (
    (16, 1), (24, 2), (24, 1), (32, 2), (32, 1), (32, 1),
    (64, 2), (64, 1), (64, 1), (64, 1), (96, 1), (96, 1),
    (96, 2), (160, 1), (160, 1), (160, 1))
# Skip taps: expand-relu of these blocks + the final out_relu
# (reference: TBIPixelCNN.py:174-180).
_SKIP_BLOCKS = (1, 3, 6, 12)


class InvertedResidual(nn.Module):
    """reference: TBIPixelCNN.py:101-143."""

    filters: int
    stride: int
    expansion: int = 6
    block_id: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        relu6 = activation("relu6")
        inputs = x
        in_filters = x.shape[-1]
        expand_out = None
        if self.block_id:
            x = nn.Conv(self.expansion * in_filters, (1, 1), padding="SAME", dtype=compute_dtype(),
                        use_bias=False, name="expand")(x)
            x = Norm("batch", name="expand_bn")(x, train)
            x = relu6(x)
            expand_out = x
        # Depthwise conv = grouped conv with feature_group_count = channels.
        # Stride 2 replicates the reference's ZeroPadding2D(1) + VALID
        # (TBIPixelCNN.py:120-127): symmetric (1,1) padding, NOT 'SAME'
        # (which pads (0,1) at even dims — a one-pixel alignment shift).
        ch = x.shape[-1]
        pad = "SAME" if self.stride == 1 else ((1, 1), (1, 1))
        x = nn.Conv(ch, (3, 3), strides=(self.stride, self.stride), dtype=compute_dtype(),
                    padding=pad, feature_group_count=ch, use_bias=False,
                    name="depthwise")(x)
        x = Norm("batch", name="depthwise_bn")(x, train)
        x = relu6(x)
        x = nn.Conv(self.filters, (1, 1), padding="SAME", use_bias=False, dtype=compute_dtype(),
                    name="project")(x)
        if in_filters == self.filters and self.stride == 1:
            x = inputs + x
        return x, expand_out


class MobileNetV2Encoder(nn.Module):
    """reference: TBIPixelCNN.py:41-98; returns (bottleneck, skips)."""

    expansion: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        relu6 = activation("relu6")
        # Reference stem: ZeroPadding2D(1) + 3x3 s2 VALID conv
        # (TBIPixelCNN.py:45-52) — symmetric (1,1) padding, not 'SAME'.
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=compute_dtype(), name="conv1")(x)
        x = relu6(x)
        skips = []
        for i, (filters, stride) in enumerate(_BLOCK_TABLE):
            x, expand_out = InvertedResidual(
                filters, stride, self.expansion, block_id=i,
                name=f"block_{i}")(x, train)
            if i in _SKIP_BLOCKS:
                skips.append(expand_out)
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=compute_dtype(), name="conv_2")(x)
        x = relu6(x)
        skips.append(x)  # out_relu tap
        return skips


class _Upsample(nn.Module):
    """pix2pix upsample: ConvTranspose(k, s2, no bias) -> BN -> [dropout] -> ReLU
    (reference: TBIPixelCNN.py:148-165)."""

    filters: int
    apply_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.filters, (3, 3), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=compute_dtype(), kernel_init=nn.initializers.normal(0.02),
            name="t_conv")(x)
        x = Norm("batch", name="bn")(x, train)
        if self.apply_dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.relu(x)


class MobileUNet(nn.Module):
    """reference: TBIPixelCNN.py:198-220.  Input [B, 256, 64, 15] (or any
    /32-divisible shape); output softmax probabilities."""

    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = MobileNetV2Encoder(name="encoder")(x, train)
        y = skips[-1]
        # The reference defines 5 upsample stages but ``zip`` with 4 skips
        # truncates to 4 (reference: TBIPixelCNN.py:189-195,208-211) — the
        # (64, 3) stage is dead code; the head convT does the final 2x.
        up_specs = ((512, True), (512, True), (256, True), (128, False))
        for i, ((filters, drop), skip) in enumerate(
                zip(up_specs, reversed(skips[:-1]))):
            y = _Upsample(filters, drop, name=f"decoder_up_{i}")(y, train)
            y = jnp.concatenate([y, skip], axis=-1)
        logits = nn.ConvTranspose(
            self.num_classes, (3, 3), strides=(2, 2), padding="SAME", dtype=compute_dtype(),
            name="decoder_head")(y)
        return nn.softmax(logits, axis=-1)
