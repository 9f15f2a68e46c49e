"""Pure ViT segmenter (reference: TBI_Transformer.py).

Patch-conv embedding (patch 16x8 -> grid 16x10, seq 160, hidden 1280,
8 heads, 8 layers — reference: TBI_Transformer.py:17,94-96,150), zero
(non-learned) position embeddings (:106), pre-LN blocks with the
1/sqrt(num_heads) attention scale (:50), final LN, reshape the encoded
sequence back to the image plane and a 3x3 conv softmax head (:180-191).
L2(1e-5) weight decay on dense/conv kernels is applied in the loss via
optax.add_decayed_weights equivalents at the trainer level when configured.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ultrasound_modeling_tpu.models.common import (compute_dtype,
                                                   resolve_attn_impl)
from ultrasound_modeling_tpu.models.transunet import Block, TRANSFORMER_LN_EPS


class ViTSegmenter(nn.Module):
    num_classes: int = 3
    hidden_size: int = 1280
    num_heads: int = 8
    num_layers: int = 8
    grid: Tuple[int, int] = (16, 10)
    img_size: Tuple[int, int] = (256, 80)
    mlp_dim: int = 2048
    dropout_rate: float = 0.0
    attn_impl: str = "xla"
    attn_train_impl: str = "xla"
    # The reference's position embeddings are CONSTANT zeros — a no-op
    # (``tf.zeros``, never a variable: TBI_Transformer.py:106).  Parity
    # default preserves that; True makes them a learnable zero-init param
    # (the standard ViT design), which is what lets the segmenter localize
    # (measured: held-out brain Dice 0.06 -> see BASELINE.md).
    learned_pos: bool = False
    # Framework extension (off for parity): a small strided conv stem before
    # the patch embedding.  The pure reference ViT never learns the bleed
    # class (c2 Dice = 0.00 across sweeps; proven equivalent to the TF
    # reference in benchmarks/vit_reference_crosscheck.py) because detecting
    # the bleed needs local per-pixel displacement statistics that a 16x8
    # linear patch projection destroys; a tiny conv stem restores them.
    conv_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = self.img_size
        gh, gw = self.grid
        patch = (h // gh, w // gw)  # (16, 8)
        b = x.shape[0]
        if self.conv_stem:
            # 3x3 convs at stride 2 twice (keeps the grid math: the patch
            # conv then runs at patch/4 on the 4x-downsampled map), LeakyReLU
            # between — enough receptive mixing for the displacement
            # statistics the bleed class needs.
            for i, ch in enumerate((64, 128)):
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=compute_dtype(),
                            bias_init=nn.initializers.normal(0.02),
                            name=f"stem_{i}")(x)
                x = nn.leaky_relu(x, negative_slope=0.2)
            patch = (patch[0] // 4, patch[1] // 4)  # (4, 2) on the /4 map
        # Patch-conv embedding (reference: TBI_Transformer.py:103-105).
        # Non-zero bias init: all-zero input patches (displacement is zeroed
        # outside the brain) would otherwise embed to constant rows, whose
        # zero channel variance makes every LayerNorm backward amplify
        # gradients by 1/sqrt(eps)=1000 — measured 4e7 gradient norms that
        # starve the rest of the net under global-norm clipping (see
        # models/swin.py patch embed for the same fix).
        emb = nn.Conv(self.hidden_size, kernel_size=patch, strides=patch,
                      padding="VALID", dtype=compute_dtype(),
                      kernel_init=nn.initializers.he_normal(),
                      bias_init=nn.initializers.normal(0.02),
                      name="patch_embeddings")(x)
        emb = emb.reshape(b, gh * gw, self.hidden_size)
        # Zero position embeddings — preserved no-op (TBI_Transformer.py:106)
        # unless ``learned_pos`` upgrades them to a learnable parameter.
        if self.learned_pos:
            pos = self.param("position_embeddings", nn.initializers.zeros,
                             (1, gh * gw, self.hidden_size))
            emb = emb + pos.astype(emb.dtype)
        # Whole-block fused kernel on the inference tracing (same gate and
        # kernel as the TransUNet Encoder; see models/transunet.py).  Params
        # are created by the flax Blocks below either way, so checkpoints
        # are identical.  The kernel's matmul contract is bf16 (inputs and
        # inter-layer stream), so it only engages under bf16 compute — f32
        # eval keeps the composed path's full-precision numerics.
        use_fused = (resolve_attn_impl(self.attn_impl) == "pallas"
                     and not train
                     and compute_dtype() == jnp.bfloat16
                     and not self.is_initializing())
        if use_fused:
            import numpy as _np

            from ultrasound_modeling_tpu.ops.pallas_kernels import (
                transformer_block_fused)
            fin = self.get_variable("params", "encoder_norm")
            scale = 1.0 / float(_np.sqrt(self.num_heads))
            for i in range(self.num_layers):
                p = self.get_variable("params", f"block_{i}")
                last = i == self.num_layers - 1
                emb = transformer_block_fused(
                    emb, p, self.num_heads, scale, TRANSFORMER_LN_EPS,
                    batch_per_step=max(1, 512 // emb.shape[1]),
                    final_ln=(fin["scale"], fin["bias"]) if last else None)
        else:
            for i in range(self.num_layers):
                emb = Block(self.hidden_size, self.num_heads, self.mlp_dim,
                            self.dropout_rate, attn_impl=self.attn_impl,
                            attn_train_impl=self.attn_train_impl,
                            name=f"block_{i}")(emb, train)
            emb = nn.LayerNorm(epsilon=TRANSFORMER_LN_EPS,
                               dtype=compute_dtype(),
                               name="encoder_norm")(emb)
        # Reshape the sequence buffer back onto the image plane
        # (reference: TBI_Transformer.py:188-189): 160*1280 = 256*80*10.
        feat = emb.reshape(b, h, w, -1)
        logits = nn.Conv(self.num_classes, kernel_size=(3, 3), padding="SAME", dtype=compute_dtype(),
                         kernel_init=nn.initializers.normal(0.05),
                         name="head")(feat)
        return nn.softmax(logits, axis=-1)
