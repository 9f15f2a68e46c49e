"""TransUNet: ResNeSt-hybrid patch embedding -> transformer bottleneck ->
DecoderCup with dilated-conv branches and hidden-state re-concat.

Flagship model, parity with reference VisionTransformer.py + Decoder.py:

* Embeddings: modular ResNeSt encoder produces the ``[B, 16, 5, 512]``
  bottleneck; a 1x1 conv patch embed; position embeddings are CONSTANT ZEROS
  (non-learned — reference: VisionTransformer.py:108, preserved).
* Encoder: 8 pre-LN blocks (eps 1e-6), 4 heads, hidden 512, MLP 2048 with
  GELU; attention scores scaled by 1/sqrt(num_heads) — NOT 1/sqrt(d_head)
  (reference: VisionTransformer.py:42).
* DecoderCup (reference: Decoder.py:98-146): reshape(16, 5) -> 3x3 conv 256
  -> LN -> LeakyReLU -> 3 DecoderBlocks (4-branch dilated convs d=1/2/4/8 +
  transposed-conv upsample + skip concat) with the transformer hidden states
  re-reshaped and re-concatenated at every scale (Decoder.py:140-141) ->
  3x3 transposed-conv softmax head.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ultrasound_modeling_tpu.models.common import (
    Norm, activation, compute_dtype, conv, conv_transpose, dense,
    resolve_attn_impl, resolve_attn_train_impl)
from ultrasound_modeling_tpu.models.resnest import ResNeStEncoder
from ultrasound_modeling_tpu.ops.attention import mha

TRANSFORMER_LN_EPS = 1e-6  # reference: VisionTransformer.py:131-132,158


class Attention(nn.Module):
    """MHA with q/k/v/out Dense and the 1/sqrt(heads) scale
    (reference: VisionTransformer.py:9-57).

    ``attn_impl='pallas'`` runs the whole qkv-projection -> scores -> softmax
    -> PV -> output-projection chain as ONE fused Pallas kernel: each batch
    element is a "window" of the block-diagonal kernel (no bias, no mask), so
    the sequence never round-trips to HBM between the six ops.
    """

    hidden_size: int = 512
    num_heads: int = 4
    dropout_rate: float = 0.0
    attn_impl: str = "xla"
    # Train-path kernel gate (separate from attn_impl: the eval-path fused
    # kernel is not differentiable).  'pallas' = fused forward with the
    # saving bf16 backward (attention_train_fused, measured slower);
    # 'flash' = LSE-saving attention core (flash_mha — the vit TPU
    # default via 'auto', measured +24.6% at b128); 'xla' = composed.
    attn_train_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.hidden_size
        import numpy as _np
        scale = 1.0 / float(_np.sqrt(self.num_heads))  # reference numerics
        # One param layout for both impls (checkpoint-compatible).
        init = nn.initializers.glorot_uniform()
        binit = nn.initializers.zeros
        wq = self.param("query_kernel", init, (h, h))
        bq = self.param("query_bias", binit, (h,))
        wk = self.param("key_kernel", init, (h, h))
        bk = self.param("key_bias", binit, (h,))
        wv = self.param("value_kernel", init, (h, h))
        bv = self.param("value_bias", binit, (h,))
        wo = self.param("out_kernel", init, (h, h))
        bo = self.param("out_bias", binit, (h,))
        # Match nn.Dense(dtype=compute_dtype()) numerics: cast params to the
        # compute dtype so bf16 activations stay bf16 (scan carry dtype).
        dt = compute_dtype()
        if dt is not None:
            x = x.astype(dt)
            wq, bq, wk, bk = (a.astype(dt) for a in (wq, bq, wk, bk))
            wv, bv, wo, bo = (a.astype(dt) for a in (wv, bv, wo, bo))
        # Inference: the fully-fused kernel (ViT +49%).  Training: the
        # composed XLA path by default, or — the vit TPU default since
        # round 5 — the 'flash' LSE-saving core below (+24.6% vit b128;
        # the fully-fused saving-backward 'pallas' variant measured
        # slower, BASELINE.md).  ``train`` is a static Python bool — this
        # branch is trace-time.
        if resolve_attn_impl(self.attn_impl) == "pallas" and not train:
            from ultrasound_modeling_tpu.ops import pallas_kernels as pk
            qkv_w = jnp.concatenate([wq, wk, wv], axis=1)
            qkv_b = jnp.concatenate([bq, bk, bv])
            zero_bias = jnp.zeros((1, self.num_heads), jnp.float32)
            zero_index = jnp.zeros((x.shape[1], x.shape[1]), jnp.int32)
            # Cap the tile so the [heads, t*N, t*N] additive matrix fits
            # VMEM for long sequences (ViT: N=160, h=1280).
            t = max(1, 256 // int(x.shape[1]))
            out = pk.window_attention_fused(
                x, qkv_w, qkv_b, wo, bo, zero_bias, zero_index,
                self.num_heads, scale=scale, windows_per_step=t)
        elif train and resolve_attn_train_impl(self.attn_train_impl) == "pallas":
            from ultrasound_modeling_tpu.ops import pallas_kernels as pk
            qkv_w = jnp.concatenate([wq, wk, wv], axis=1)
            qkv_b = jnp.concatenate([bq, bk, bv])
            out = pk.attention_train_fused(x, qkv_w, qkv_b, wo, bo,
                                           self.num_heads, scale=scale)
        elif train and resolve_attn_train_impl(self.attn_train_impl) == "flash":
            # LSE-saving attention core (VERDICT r4 next #2): projections
            # stay XLA GEMMs (autodiff saves x/qkv in natural layouts), only
            # scores->softmax->PV is fused, and the backward recomputes
            # probs from the saved per-row LSE with ds/dp VMEM-resident.
            from ultrasound_modeling_tpu.ops import pallas_kernels as pk
            qkv = x @ jnp.concatenate([wq, wk, wv], axis=1) \
                + jnp.concatenate([bq, bk, bv])
            ctx = pk.flash_mha(qkv, self.num_heads, scale=scale)
            out = ctx @ wo + bo
        else:
            q = x @ wq + bq
            k = x @ wk + bk
            v = x @ wv + bv
            ctx = mha(q, k, v, self.num_heads, scale=scale)
            out = ctx @ wo + bo
        if self.dropout_rate:
            out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        return out


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (reference: VisionTransformer.py:60-78)."""

    hidden_size: int = 512
    mlp_dim: int = 2048
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = dense(self.mlp_dim, name="fc1")(x)
        if self.dropout_rate:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = activation("gelu")(x)
        x = dense(self.hidden_size, name="fc2")(x)
        if self.dropout_rate:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class Block(nn.Module):
    """Pre-LN transformer block (reference: VisionTransformer.py:127-150)."""

    hidden_size: int = 512
    num_heads: int = 4
    mlp_dim: int = 2048
    dropout_rate: float = 0.0
    attn_impl: str = "xla"
    attn_train_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        x = nn.LayerNorm(epsilon=TRANSFORMER_LN_EPS, dtype=compute_dtype(), name="attention_norm")(x)
        x = Attention(self.hidden_size, self.num_heads, self.dropout_rate,
                      attn_impl=self.attn_impl,
                      attn_train_impl=self.attn_train_impl,
                      name="attn")(x, train)
        x = x + h
        h = x
        x = nn.LayerNorm(epsilon=TRANSFORMER_LN_EPS, dtype=compute_dtype(), name="ffn_norm")(x)
        x = Mlp(self.hidden_size, self.mlp_dim, self.dropout_rate,
                name="ffn")(x, train)
        return x + h


class _ScanBlock(nn.Module):
    """Block adapted to the (carry, out) protocol for nn.scan."""

    hidden_size: int
    num_heads: int
    mlp_dim: int
    dropout_rate: float
    attn_impl: str = "xla"
    attn_train_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool):
        x = Block(self.hidden_size, self.num_heads, self.mlp_dim,
                  self.dropout_rate, attn_impl=self.attn_impl,
                  attn_train_impl=self.attn_train_impl,
                  name="block")(x, train)
        return x, None


class Encoder(nn.Module):
    """num_layers blocks + final LN (reference: VisionTransformer.py:153-174).

    Blocks are laid out as ONE ``nn.scan`` over stacked per-layer params
    instead of ``num_layers`` unrolled copies: the compiled HLO contains a
    single block body (an order-of-magnitude compile-time reduction for the
    deep stacks; runtime is identical — weights stream per layer).

    ``pp_mesh``: when set (and its ``model`` axis has size > 1), the stacked
    layers execute as a GPipe pipeline over that axis instead of a local scan
    (parallel/pipeline.py) — the param layout is IDENTICAL (``[L, ...]``
    leaves, layer axis sharded across stages), so checkpoints are
    interchangeable between the scanned and pipelined paths."""

    hidden_size: int = 512
    num_heads: int = 4
    num_layers: int = 8
    mlp_dim: int = 2048
    dropout_rate: float = 0.0
    remat: bool = False
    attn_impl: str = "xla"
    attn_train_impl: str = "xla"
    pp_mesh: Optional[Any] = None
    pp_micro: int = 0
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = _ScanBlock
        if self.remat:
            # scan-over-remat: activations rematerialized per layer in the
            # backward pass — trades ~1 extra forward of FLOPs for O(1)
            # stored activations per layer (HBM-bound big-batch training).
            block_cls = nn.remat(_ScanBlock, static_argnums=(2,))
        scanned = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast,
            length=self.num_layers,
            # unroll > 1 trades HLO size for removing the while-loop's
            # per-layer dynamic-update-slice stacking of saved activations
            # (~2.5 ms/step on the flagship at batch 64); param layout is
            # unchanged ([L, ...] stacked leaves).
            unroll=self.scan_unroll,
        )(self.hidden_size, self.num_heads, self.mlp_dim, self.dropout_rate,
          self.attn_impl, self.attn_train_impl, name="blocks")
        use_pp = (self.pp_mesh is not None
                  and not self.is_initializing()
                  and (self.pp_mesh.shape.get("pipe", 1) > 1
                       or self.pp_mesh.shape.get("model", 1) > 1))
        # Whole-stack fused kernel on the inference path: each layer reads x
        # from HBM once and writes it once (LN/attention/MLP/residuals all
        # VMEM-resident) instead of round-tripping between every op.  Same
        # gate as the fused attention ('pallas' at eval); params are the
        # scanned tree, so checkpoints are interchangeable.
        # The fused stack's matmul contract is bf16 (inputs and inter-layer
        # stream), so it only engages under bf16 compute — f32 eval keeps
        # the composed path's full-precision numerics.
        use_fused_stack = (resolve_attn_impl(self.attn_impl) == "pallas"
                           and not train
                           and compute_dtype() == jnp.bfloat16
                           and not use_pp and not self.is_initializing())
        if use_pp:
            x = self._pipelined(x, train)
        elif use_fused_stack:
            from ultrasound_modeling_tpu.ops.pallas_kernels import (
                transformer_stack_fused)
            import numpy as _np
            stacked = self.get_variable("params", "blocks")["block"]
            fin = self.get_variable("params", "encoder_norm")
            # encoder_norm is folded into the last layer's kernel (a
            # standalone LN after the kernel costs a full relayout copy of
            # its input); param creation still goes through the flax module
            # below on the init/train tracings.
            return transformer_stack_fused(
                x, stacked, self.num_heads,
                scale=1.0 / float(_np.sqrt(self.num_heads)),
                eps=TRANSFORMER_LN_EPS,
                final_ln=(fin["scale"], fin["bias"]))
        else:
            x, _ = scanned(x, train)
        return nn.LayerNorm(epsilon=TRANSFORMER_LN_EPS, dtype=compute_dtype(), name="encoder_norm")(x)

    def _pipelined(self, x, train: bool):
        """Apply the stacked blocks as a pipeline over the mesh 'model' axis
        (the scanned params created at init are reused verbatim)."""
        import jax as _jax

        from ultrasound_modeling_tpu.parallel.mesh import pipe_axis
        from ultrasound_modeling_tpu.parallel.pipeline import pipeline_stack

        axis = pipe_axis(self.pp_mesh)  # 'pipe' on a dp x tp x pp mesh
        stacked = self.get_variable("params", "blocks")["block"]
        n_stages = self.pp_mesh.shape[axis]
        if n_stages > 1:
            n_layers = _jax.tree.leaves(stacked)[0].shape[0]
            if n_layers % n_stages:
                raise ValueError(
                    f"num_layers={n_layers} not divisible by pipeline "
                    f"stages={n_stages}")
        block = Block(self.hidden_size, self.num_heads, self.mlp_dim,
                      self.dropout_rate, attn_impl=self.attn_impl,
                      attn_train_impl=self.attn_train_impl)
        want_dropout = bool(self.dropout_rate) and train
        base_key = self.make_rng("dropout") if want_dropout else None

        def layer_apply(lp, h, fold):
            # NOTE: dropout keys here are fold_in(base, layer + micro*P)
            # streams, a DIFFERENT stream than the nn.scan split_rngs used by
            # the local path — pp-vs-scan runs with dropout>0 are not
            # expected to be bitwise reproducible (dropout=0 paths are; see
            # test_parallel.py pins).
            rngs = ({"dropout": _jax.random.fold_in(base_key, fold)}
                    if want_dropout else None)
            return block.apply({"params": lp}, h, train, rngs=rngs)

        if self.remat:
            layer_apply = _jax.checkpoint(layer_apply)
        return pipeline_stack(layer_apply, stacked, x, mesh=self.pp_mesh,
                              num_micro=self.pp_micro or None, axis=axis)


class DecoderBlock(nn.Module):
    """Transposed-conv upsample + skip concat + two 4-branch dilated conv
    stages (reference: Decoder.py:7-94).  Branch dilations 1 (as 1x1), 2, 4, 8;
    each branch BatchNorm'd; concat then LeakyReLU.

    ``fuse_bn``: collapse the four per-branch BatchNorms into ONE BatchNorm
    over the concatenated channels — numerically EXACT, since BatchNorm
    statistics and affine params are per-channel, so concat-then-normalize
    equals normalize-then-concat (equivalence-tested in test_models_extra).
    Measured (v5e): ISOLATED stage fwd+bwd it wins -11% across the three
    decoder shapes (benchmarks/decoder_fuse_probe.py), but in the FULL
    flagship train step it LOSES 5% (benchmarks/decoder_ab.py, interleaved
    single-process A/B: 54.2 vs 51.5 ms @ b64) — in the whole graph XLA
    fuses each small per-branch BN into its conv's epilogue, while the wide
    concat BN forces a separate stats pass.  Default therefore stays False
    (also the reference-shaped param tree); the restructure is kept as an
    option because the isolated win shows it is shape-dependent."""

    out_channels: int
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, x, skip: Optional[jnp.ndarray] = None,
                 train: bool = False):
        leaky = activation("leaky")
        x = conv_transpose(self.out_channels, 3, 2, name="up")(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        for stage in (1, 2):
            branches = []
            for b, (ksz, dil) in enumerate(((1, 1), (3, 2), (3, 4), (3, 8))):
                y = conv(self.out_channels // 4, ksz, dilation=dil,
                         name=f"conv{stage}_{b}")(x)
                if not self.fuse_bn:
                    y = Norm("batch", name=f"bn{stage}_{b}")(y, train)
                branches.append(y)
            x = jnp.concatenate(branches, axis=-1)
            if self.fuse_bn:
                x = Norm("batch", name=f"bn{stage}")(x, train)
            x = leaky(x)
        return x


class KSACDecoderBlock(nn.Module):
    """Alternative decoder block with kernel-sharing atrous convs
    (reference: Decoder.py:150-176 KSACBlock): transposed-conv upsample +
    skip concat + two KernelSharingConv layers (rates 1/2/4/8/16)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, skip: Optional[jnp.ndarray] = None,
                 train: bool = False):
        from ultrasound_modeling_tpu.ops.ksac import KernelSharingConv
        x = conv_transpose(self.out_channels, 3, 2, name="up")(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = KernelSharingConv(self.out_channels, name="ksac_1")(x, train)
        x = KernelSharingConv(self.out_channels, name="ksac_2")(x, train)
        return x


class DecoderCup(nn.Module):
    """reference: Decoder.py:98-146.  ``block_kind``: 'dilated' (DecoderBlock,
    the default path) or 'ksac' (KSACDecoderBlock alternative)."""

    num_classes: int = 3
    grid: Tuple[int, int] = (16, 5)
    head_channels: int = 256
    skip_channels: Tuple[int, ...] = (256, 128, 64)
    block_kind: str = "dilated"
    fuse_bn: bool = False
    remat: bool = False  # jax.checkpoint each decoder block (HBM-bytes win)

    @nn.compact
    def __call__(self, hidden_states, features=None, train: bool = False):
        gh, gw = self.grid
        b = hidden_states.shape[0]
        y = hidden_states  # [B, seq, hidden] kept for per-scale re-concat
        x = hidden_states.reshape(b, gh, gw, -1)
        x = conv(self.head_channels, 3, name="conv_more")(x)
        x = Norm("layer", name="bn1")(x, train)
        x = activation("leaky")(x)
        for i, ch in enumerate(self.skip_channels):
            skip = None
            if features is not None and i < len(features):
                skip = features[i]
            if self.block_kind == "ksac":
                blk_cls = (nn.remat(KSACDecoderBlock, static_argnums=(3,))
                           if self.remat else KSACDecoderBlock)
                x = blk_cls(ch, name=f"block_{i}")(x, skip, train)
            else:
                blk_cls = (nn.remat(DecoderBlock, static_argnums=(3,))
                           if self.remat else DecoderBlock)
                x = blk_cls(ch, fuse_bn=self.fuse_bn,
                            name=f"block_{i}")(x, skip, train)
            # Re-concat the raw transformer hidden states, reshaped to this
            # scale (reference: Decoder.py:140-141).
            scale = 2 ** (i + 1)
            x0 = y.reshape(b, gh * scale, gw * scale, -1)
            x = jnp.concatenate([x, x0], axis=-1)
        logits = conv_transpose(self.num_classes, 3, 2, name="head")(x)
        return nn.softmax(logits, axis=-1)


class TransUNet(nn.Module):
    """Full model (reference: VisionTransformer.py:192-257).

    Input ``[B, 256, 80, 10]`` -> probabilities ``[B, 256, 80, num_classes]``.
    """

    num_classes: int = 3
    hidden_size: int = 512
    num_heads: int = 4
    num_layers: int = 8
    mlp_dim: int = 2048
    grid: Tuple[int, int] = (16, 5)
    radix: int = 3
    kpaths: int = 3
    ksize: int = 3
    dropout_rate: float = 0.0
    decoder_kind: str = "dilated"  # 'dilated' | 'ksac'
    # One BatchNorm over each decoder stage's branch concat (exact but
    # measured slower in the full step; see DecoderBlock.fuse_bn).
    decoder_fuse_bn: bool = False
    remat: bool = False
    # jax.checkpoint the conv stages (ResNeSt encoder stages + decoder
    # blocks): recompute their forward in the backward pass instead of
    # persisting intermediates.  The train step is HBM-bound at ~11% MXU
    # (BASELINE.md), so this trades idle FLOPs for the bytes that bound it.
    remat_conv: bool = False
    attn_impl: str = "xla"
    attn_train_impl: str = "xla"
    pp_mesh: Optional[Any] = None   # pipeline the transformer stack (Encoder)
    pp_micro: int = 0
    # unroll the whole 8-layer scan: removes the while-loop's per-layer
    # dynamic-update-slice stacking (measured -5% step time at batch 64).
    scan_unroll: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats_bottleneck, features = ResNeStEncoder(
            self.ksize, self.radix, self.kpaths, remat=self.remat_conv,
            name="hybrid")(x, train)
        # 1x1-conv patch embed on the 16x5 bottleneck
        # (reference: VisionTransformer.py:106-107).
        emb = conv(self.hidden_size, 1, name="patch_embeddings")(feats_bottleneck)
        b = emb.shape[0]
        seq = self.grid[0] * self.grid[1]
        emb = emb.reshape(b, seq, self.hidden_size)
        # Position embeddings: constant zeros (reference quirk,
        # VisionTransformer.py:108) — a no-op, intentionally preserved.
        encoded = Encoder(self.hidden_size, self.num_heads, self.num_layers,
                          self.mlp_dim, self.dropout_rate, remat=self.remat,
                          attn_impl=self.attn_impl,
                          attn_train_impl=self.attn_train_impl,
                          pp_mesh=self.pp_mesh,
                          pp_micro=self.pp_micro, scan_unroll=self.scan_unroll,
                          name="encoder")(emb, train)
        return DecoderCup(self.num_classes, self.grid,
                          block_kind=self.decoder_kind,
                          fuse_bn=self.decoder_fuse_bn,
                          remat=self.remat_conv,
                          name="decoder")(encoded, features, train)
