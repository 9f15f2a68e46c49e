"""ResNeSt split-attention encoder and standalone ResNeSt U-Net.

Two parity targets:

* ``ResNeStEncoder`` — the modular encoder used as the TransUNet hybrid stem
  (reference: ResNest.py:4-58): stem convs -> 4x (avg-pool + split-attention
  residual stage), returning the bottleneck plus 3 skip maps.  Block norms are
  LayerNorm, activations LeakyReLU; the stem uses BatchNorm
  (reference: ResNest.py:19,23,86,125).
* ``ResNeStUNet`` — the standalone full U-Net (reference: TBI_ResNest.py:80-128):
  6 pooling stages, 5 transposed-conv upsamples with skip concats, softmax
  head; all-BatchNorm with ELU activations.

Split-attention semantics preserved from the standalone (per-radix weights,
reference: TBI_ResNest.py:175-207): sum radix branches -> global-avg-pool ->
1x1 conv (C/2) -> per-radix 1x1 conv (C) -> softmax over *channels* (sigmoid
if radix == 1) -> weighted sum.  Note the reference's channel-axis softmax is
itself a deviation from the ResNeSt paper's radix-softmax; we preserve the
reference's numerics.  (The modular ResNest.py:136-147 reuses one conv object
across radix branches, making all branches identical — a latent defect; the
standalone's per-radix weights are the intent and are what we implement.)

TPU layout note: the radix branches and cardinal paths are structurally
identical subnetworks applied to the same input with independent weights, so
they are expressed with ``nn.vmap`` over stacked parameters rather than
unrolled Python loops — one HLO body per stage (compile-time) and batched
convs XLA can tile as grouped matmuls (runtime).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ultrasound_modeling_tpu.models.common import (
    KERAS_BN_EPS, KERAS_BN_MOMENTUM, KERAS_LN_EPS, LEAKY_ALPHA, Norm,
    activation, avg_pool2, compute_dtype, conv, conv_transpose, he_normal)

# per-branch norm lowering inside the fused split-attention stage.  Train
# and eval tracings are gated separately and have OPPOSITE winners (both
# re-verified by single-process interleaved A/B with scalar-pull sync):
# train 'auto' = Pallas fused kernel on TPU (einsum backward costs ~5 ms/
# step); eval 'xla' = the einsum lowering (42.1 vs 54.8 ms full forward at
# batch 256, benchmarks/evalnorm_ab.py, round-3 clean pass incl. the
# folded-LeakyReLU kernel — XLA fuses the eval normalize into the conv
# epilogues, which the opaque kernel call forbids, and that buys more
# than the kernel's single-sweep stats save).
_PALLAS_NORM = "auto"
_PALLAS_NORM_EVAL = "xla"


def _platform_default() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _use_pallas_norm(train: bool = True) -> bool:
    impl = _PALLAS_NORM if train else _PALLAS_NORM_EVAL
    if impl == "auto":
        return _platform_default()
    return impl == "pallas"


def set_norm_impl(impl: str, eval_impl: str = None) -> None:
    """'auto' | 'pallas' | 'xla' — test hook for the fused-stage norm.
    ``eval_impl`` sets the eval-tracing gate; None leaves it unchanged
    (its default is 'xla' — the measured eval winner)."""
    global _PALLAS_NORM, _PALLAS_NORM_EVAL
    assert impl in ("auto", "pallas", "xla")
    _PALLAS_NORM = impl
    if eval_impl is not None:
        assert eval_impl in ("auto", "pallas", "xla")
        _PALLAS_NORM_EVAL = eval_impl


def _vmapped(module_cls, axis_size: int):
    """nn.vmap over independent per-branch parameters, same input."""
    return nn.vmap(
        module_cls,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=None, out_axes=0, axis_size=axis_size,
        methods=["__call__"])


class _Dense2(nn.Module):
    """Per-radix 1x1 attention conv (vmapped over radix)."""

    channels: int

    @nn.compact
    def __call__(self, y):
        return conv(self.channels, 1, name="dense2")(y)


class SplitAttention(nn.Module):
    """Split-attention over stacked radix branches
    (reference: TBI_ResNest.py:175-207).

    Input ``branches``: [R, B, H, W, C] stacked radix outputs.
    """

    channels: int
    radix: int
    norm: str = "layer"
    act: str = "leaky"

    @nn.compact
    def __call__(self, branches: jnp.ndarray, train: bool = False):
        act = activation(self.act)
        s = jnp.sum(branches, axis=0)                      # [B, H, W, C]
        gap = jnp.mean(s, axis=(1, 2), keepdims=True)      # [B, 1, 1, C]
        y = conv(self.channels // 2, 1, name="dense1")(gap)
        y = Norm(self.norm, name="dense1_norm")(y, train)
        y = act(y)
        z = _vmapped(_Dense2, self.radix)(self.channels, name="dense2")(y)
        # z: [R, B, 1, 1, C]
        if self.radix == 1:
            z = nn.sigmoid(z)
        else:
            z = nn.softmax(z, axis=-1)  # channel-axis softmax (reference quirk)
        return jnp.sum(branches * z, axis=0)


class _CardinalBranch(nn.Module):
    """One radix branch: 1x1 conv -> norm -> act -> kxk conv -> norm -> act
    (reference: TBI_ResNest.py:160-171)."""

    c_11: int
    c_kk: int
    ksize: int
    norm: str
    act: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation(self.act)
        y = conv(self.c_11, 1, name="conv1")(x)
        y = Norm(self.norm, name="conv1_norm")(y, train)
        y = act(y)
        y = conv(self.c_kk, self.ksize, name="conv2")(y)
        y = Norm(self.norm, name="conv2_norm")(y, train)
        return act(y)


class Cardinal(nn.Module):
    """One cardinal path: radix vmapped branches + split attention
    (reference: TBI_ResNest.py:153-173)."""

    outchannel: int
    ksize: int
    radix: int
    kpaths: int
    norm: str = "layer"
    act: str = "leaky"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_11 = int(self.outchannel / self.radix / self.kpaths)
        c_kk = int(self.outchannel / self.kpaths)
        branches = _vmapped(_CardinalBranch, self.radix)(
            c_11, c_kk, self.ksize, self.norm, self.act,
            name="branches")(x, train)                     # [R, B, H, W, Ckk]
        return SplitAttention(c_kk, self.radix, self.norm, self.act,
                              name="split")(branches, train)


class ResidualS(nn.Module):
    """Split-attention residual stage (reference: TBI_ResNest.py:130-151,
    ResNest.py:61-107).

    ``shortcut_always``: the modular variant always projects + norms the
    shortcut (ResNest.py:98-101); the standalone only when channel counts
    differ (TBI_ResNest.py:142-146).
    """

    outchannel: int
    ksize: int
    radix: int
    kpaths: int
    norm: str = "layer"
    act: str = "leaky"
    shortcut_always: bool = True
    # 'fused': all K*R branch convs restructured into dense / block-diagonal
    # convolutions + einsum split-attention (one MXU-friendly op per logical
    # layer).  'vmap': one batched HLO per branch layer (the straightforward
    # lowering; per-branch channels of 3-30 pad to 128 TPU lanes, wasting
    # bandwidth — measured ~40% slower on stage 1).  Numerics identical
    # (tests/test_models.py fused-vs-vmap equivalence).
    impl: str = "fused"

    def _group_norm(self, y, name: str, train: bool):
        """Per-branch norm over the trailing channel axis of
        ``y [..., *branch_dims, C]`` — the fused equivalent of the vmapped
        ``Norm`` (Keras LayerNorm eps 1e-3 / BatchNorm momentum .99 eps 1e-3
        per branch).  Stats in f32, output in compute dtype."""
        shape = y.shape[3:]  # [K, R, C] or [K, C]
        scale = self.param(f"{name}_scale", nn.initializers.ones, shape)
        bias = self.param(f"{name}_bias", nn.initializers.zeros, shape)
        yf = y.astype(jnp.float32)
        if self.norm == "layer":
            mean = yf.mean(axis=-1, keepdims=True)
            var = yf.var(axis=-1, keepdims=True)
            out = (yf - mean) * lax.rsqrt(var + KERAS_LN_EPS)
        elif self.norm == "batch":
            red = tuple(range(y.ndim - len(shape)))  # batch+spatial axes
            ra_mean = self.variable(
                "batch_stats", f"{name}_mean",
                lambda: jnp.zeros(shape, jnp.float32))
            ra_var = self.variable(
                "batch_stats", f"{name}_var",
                lambda: jnp.ones(shape, jnp.float32))
            if train:
                mean = yf.mean(axis=red)
                var = yf.var(axis=red)
                if not self.is_initializing():
                    m = KERAS_BN_MOMENTUM
                    ra_mean.value = m * ra_mean.value + (1 - m) * mean
                    ra_var.value = m * ra_var.value + (1 - m) * var
            else:
                mean, var = ra_mean.value, ra_var.value
            out = (yf - mean) * lax.rsqrt(var + KERAS_BN_EPS)
        else:
            out = yf
        out = out * scale + bias
        return out.astype(y.dtype)

    def _flat_norm(self, y, name: str, shape, train: bool,
                   act: Optional[str] = None):
        """Per-branch norm on the FLAT channel axis of ``y [B,H,W,G*C]``
        (param ``shape`` e.g. ``(K, R, C)`` factors the channels into
        ``G = K*R`` groups of ``C``), numerically equal to ``_group_norm``
        on the grouped view, followed by ``act`` (the stage always activates
        right after the branch norm; taking it as an argument lets the
        Pallas lowering fold it into the kernel's single sweep — standalone
        it is a full HBM read+write pass XLA cannot fuse into the opaque
        kernel call).

        Motivation (profiled on v5e, flagship fwd batch 256): the grouped
        6-D view [B,H,W,K,R,C] with C of 3-30 forces XLA into padded
        layouts + f32 relayout copies around every stat op — ~8 ms/stage of
        pure data formatting.  Here group means arrive by multiplying with a
        constant block-averaging matrix on the MXU (``y @ M``, f32
        accumulation), so every elementwise op stays on the flat tiled
        layout and fuses into the neighbouring convs."""
        act_fn = activation(act) if act else (lambda v: v)
        c = shape[-1]
        f = y.shape[-1]
        scale = self.param(f"{name}_scale", nn.initializers.ones, shape)
        bias = self.param(f"{name}_bias", nn.initializers.zeros, shape)
        sflat = scale.reshape(-1).astype(jnp.float32)
        bflat = bias.reshape(-1).astype(jnp.float32)
        if self.norm == "layer":
            if _use_pallas_norm(train):
                # TRAIN default: single-sweep fused kernel (fwd + custom-VJP
                # bwd) — XLA lowers the einsum backward as 3+ full HBM
                # passes (~5 ms/step of the flagship).  EVAL default stays
                # the einsum: its stats do materialize a full-size f32 y*y
                # operand (472 MB at batch 256 on stage 1 — device trace),
                # but XLA fuses the normalize into the conv epilogues, and
                # the fused forward still beats the kernel by 30% end to end
                # (benchmarks/evalnorm_ab.py, 42.1 vs 54.8 ms at b256,
                # round-3 clean pass).
                from ultrasound_modeling_tpu.ops.pallas_kernels import (
                    group_flat_norm)
                if act == "leaky":
                    return group_flat_norm(y, sflat, bflat, c, KERAS_LN_EPS,
                                           act="leaky", act_alpha=LEAKY_ALPHA)
                return act_fn(
                    group_flat_norm(y, sflat, bflat, c, KERAS_LN_EPS))
            if y.dtype == jnp.bfloat16:
                # bf16 path: the Pallas kernel's precision scheme, in XLA.
                # Group SUMS ride a 0/1 block-diagonal selection matrix —
                # bf16 x {0,1} products are exact with f32 accumulation at
                # DEFAULT precision — and the variance is the two-pass
                # centered form with the centered values squared in bf16
                # (error below the output's own bf16 quantum; the same
                # scheme group_flat_norm is equivalence-tested under).  vs
                # the former HIGHEST-precision one-pass einsum this drops
                # 6x MXU stat passes and halves the squared-operand bytes
                # (f32 y*y was 472 MB at batch 256 on stage 1 alone).
                msel = jnp.kron(jnp.eye(f // c, dtype=jnp.float32),
                                jnp.ones((c, c), jnp.float32)
                                ).astype(jnp.bfloat16)
                inv = 1.0 / c
                mu = jnp.einsum("bhwf,fg->bhwg", y, msel,
                                preferred_element_type=jnp.float32) * inv
                yf = y.astype(jnp.float32)
                zc = yf - mu
                zq = (zc * zc).astype(jnp.bfloat16)
                var = jnp.einsum("bhwf,fg->bhwg", zq, msel,
                                 preferred_element_type=jnp.float32) * inv
                out = zc * lax.rsqrt(var + KERAS_LN_EPS) * sflat + bflat
                return act_fn(out.astype(y.dtype))
            avg = jnp.kron(jnp.eye(f // c, dtype=y.dtype),
                           jnp.full((c, c), 1.0 / c, y.dtype))
            # HIGHEST: TPU matmuls default to low-precision multiplies,
            # which would truncate the group stats (~1e-2 relative).
            hi = lax.Precision.HIGHEST
            mu = jnp.einsum("bhwf,fg->bhwg", y, avg,
                            preferred_element_type=jnp.float32, precision=hi)
            s2 = jnp.einsum("bhwf,fg->bhwg", y * y, avg,
                            preferred_element_type=jnp.float32, precision=hi)
            # One-pass variance cancels catastrophically when |mean| >> std;
            # clamp so var + eps can't go negative under rsqrt.
            var = jnp.maximum(s2 - mu * mu, 0.0)
            yf = y.astype(jnp.float32)
            out = (yf - mu) * lax.rsqrt(var + KERAS_LN_EPS) * sflat + bflat
            return act_fn(out.astype(y.dtype))
        # batch: per-(k,r,c) stats ARE per-flat-channel stats — one plain
        # channel reduce, no grouped view needed at all.
        ra_mean = self.variable("batch_stats", f"{name}_mean",
                                lambda: jnp.zeros(shape, jnp.float32))
        ra_var = self.variable("batch_stats", f"{name}_var",
                               lambda: jnp.ones(shape, jnp.float32))
        if train:
            yf32 = y.astype(jnp.float32)
            mean = yf32.mean(axis=(0, 1, 2))
            var = yf32.var(axis=(0, 1, 2))
            if not self.is_initializing():
                m = KERAS_BN_MOMENTUM
                ra_mean.value = (m * ra_mean.value
                                 + (1 - m) * mean.reshape(shape))
                ra_var.value = m * ra_var.value + (1 - m) * var.reshape(shape)
        else:
            mean = ra_mean.value.reshape(-1)
            var = ra_var.value.reshape(-1)
        a = lax.rsqrt(var + KERAS_BN_EPS) * sflat
        return act_fn(
            (y.astype(jnp.float32) * a + (bflat - mean * a)).astype(y.dtype))

    def _fused(self, x, train: bool):
        """Block-diagonal dense restructuring of the K*R branch tree.

        The K*R 1x1 branch convs all read the same input, so they ARE one
        dense ``Cin -> K*R*c11`` conv; the K*R kxk convs (each reading only
        its own c11 slice) become one dense conv with a block-diagonal
        kernel (zeros off-block cost nothing — the tiny per-branch channel
        counts were being padded to the 128-lane TPU tile anyway); split
        attention becomes two einsums over stacked weights."""
        act = activation(self.act)
        k_, r_ = self.kpaths, self.radix
        cardchannel = self.outchannel // 2
        c11 = int(cardchannel / r_ / k_)
        ckk = int(cardchannel / k_)
        cin = x.shape[-1]
        kr = k_ * r_
        dt = compute_dtype() or x.dtype
        # He-normal with the PER-BRANCH fan: the stacked [K, R, ...] param
        # shapes would otherwise inflate fan_in by K*R and shrink the init
        # std ~3x vs the per-branch vmap/reference init (batch_axis tells
        # variance_scaling the leading axes are independent branches).
        he_b = nn.initializers.variance_scaling(
            2.0, "fan_in", "truncated_normal", batch_axis=(0, 1))
        he_b1 = nn.initializers.variance_scaling(
            2.0, "fan_in", "truncated_normal", batch_axis=(0,))

        w1 = self.param("branch1_kernel", he_b,
                        (k_, r_, 1, 1, cin, c11))
        b1 = self.param("branch1_bias", nn.initializers.zeros, (k_, r_, c11))
        w2 = self.param("branch2_kernel", he_b,
                        (k_, r_, self.ksize, self.ksize, c11, ckk))
        b2 = self.param("branch2_bias", nn.initializers.zeros, (k_, r_, ckk))

        b, h, w, _ = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        # 1x1 branch convs == one dense conv to K*R*c11.
        k1 = w1.transpose(2, 3, 4, 0, 1, 5).reshape(1, 1, cin, kr * c11)
        y = lax.conv_general_dilated(
            x.astype(dt), k1.astype(dt), (1, 1), "SAME",
            dimension_numbers=dn) + b1.reshape(-1).astype(dt)
        y = self._flat_norm(y, "branch1_norm", (k_, r_, c11), train,
                            act=self.act)

        # kxk branch convs == one block-diagonal dense conv.
        k2 = jnp.zeros((self.ksize, self.ksize, kr * c11, kr * ckk), w2.dtype)
        w2f = w2.reshape(kr, self.ksize, self.ksize, c11, ckk)
        for i in range(kr):
            k2 = k2.at[:, :, i * c11:(i + 1) * c11,
                       i * ckk:(i + 1) * ckk].set(w2f[i])
        y = lax.conv_general_dilated(
            y, k2.astype(dt), (1, 1), "SAME",
            dimension_numbers=dn) + b2.reshape(-1).astype(dt)
        y = self._flat_norm(y, "branch2_norm", (k_, r_, ckk), train,
                            act=self.act)
        # y: [B, H, W, K*R*ckk], flat channel order (k, r, c).

        # Split attention (reference: TBI_ResNest.py:175-207), all K paths at
        # once: sum radix -> GAP -> per-path dense1 -> per-(path,radix)
        # dense2 -> channel softmax -> weighted radix sum.
        wd1 = self.param("attn_dense1_kernel", he_b1,
                         (k_, ckk, ckk // 2))
        bd1 = self.param("attn_dense1_bias", nn.initializers.zeros,
                         (k_, ckk // 2))
        wd2 = self.param("attn_dense2_kernel", he_b,
                         (k_, r_, ckk // 2, ckk))
        bd2 = self.param("attn_dense2_bias", nn.initializers.zeros,
                         (k_, r_, ckk))
        # GAP commutes with the radix sum: one spatial mean on the flat
        # layout, radix-summed on the tiny [B, ...] result.
        gap = y.mean(axis=(1, 2)).reshape(b, k_, r_, ckk).sum(2)  # [B,K,ckk]
        a = jnp.einsum("bkc,kcd->bkd", gap, wd1.astype(dt)) + bd1.astype(dt)
        a = act(self._group_norm(a[:, None, None], "attn_norm",
                                 train)[:, 0, 0])
        z = (jnp.einsum("bkd,krdc->bkrc", a, wd2.astype(dt))
             + bd2.astype(dt))                             # [B,K,R,ckk]
        if r_ == 1:
            z = nn.sigmoid(z)
        else:
            z = nn.softmax(z, axis=-1)  # channel-axis softmax (ref. quirk)
        # Weighted radix sum out[...,(k,c)] = sum_r y[...,(k,r,c)] z[b,k,r,c]:
        # multiply on the flat layout, contract the radix groups with a
        # constant 0/1 selection matrix on the MXU — no grouped views of the
        # full-resolution tensor anywhere in this stage.
        zf = z.reshape(b, 1, 1, kr * ckk).astype(dt)
        eye = jnp.eye(ckk, dtype=dt)
        sel = jnp.kron(jnp.eye(k_, dtype=dt),
                       jnp.tile(eye, (r_, 1)))             # [kr*ckk, k*ckk]
        return jnp.einsum("bhwf,fg->bhwg", y * zf, sel)

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation(self.act)
        if self.impl == "fused":
            concats = self._fused(x, train)
        else:
            cards = _vmapped(Cardinal, self.kpaths)(
                self.outchannel // 2, self.ksize, self.radix, self.kpaths,
                self.norm, self.act, name="cardinals")(x, train)
            # [K, B, H, W, C/2] -> channel-concat in cardinal order.
            k, b, h, w, c = cards.shape
            concats = jnp.moveaxis(cards, 0, -2).reshape(b, h, w, k * c)
        concats = conv(self.outchannel, self.ksize, name="concat_conv")(concats)

        if self.shortcut_always or x.shape[-1] != self.outchannel:
            sc = conv(self.outchannel, 1, name="shortcut_conv")(x)
            sc = Norm(self.norm, name="shortcut_norm")(sc, train)
            sc = act(sc)
        else:
            sc = x
        return sc + concats


def vmap_to_fused_params(vp: dict) -> dict:
    """Map one ResidualS's impl='vmap' param subtree to the impl='fused'
    layout (same tensors, different leaf names).  Checkpoint migration
    helper + equivalence-test fixture."""
    cards = vp["cardinals"]
    br = cards["branches"]
    sp = cards["split"]

    def _norm(sub):  # LayerNorm_0 or BatchNorm_0 scale/bias
        inner = next(iter(sub.values()))
        return inner["scale"], inner["bias"]

    b1s, b1b = _norm(br["conv1_norm"])
    b2s, b2b = _norm(br["conv2_norm"])
    ats, atb = _norm(sp["dense1_norm"])
    out = {
        "branch1_kernel": br["conv1"]["kernel"],
        "branch1_bias": br["conv1"]["bias"],
        "branch1_norm_scale": b1s,
        "branch1_norm_bias": b1b,
        "branch2_kernel": br["conv2"]["kernel"],
        "branch2_bias": br["conv2"]["bias"],
        "branch2_norm_scale": b2s,
        "branch2_norm_bias": b2b,
        "attn_dense1_kernel": sp["dense1"]["kernel"][:, 0, 0],
        "attn_dense1_bias": sp["dense1"]["bias"],
        "attn_norm_scale": ats,
        "attn_norm_bias": atb,
        "attn_dense2_kernel": sp["dense2"]["dense2"]["kernel"][:, :, 0, 0],
        "attn_dense2_bias": sp["dense2"]["dense2"]["bias"],
        "concat_conv": vp["concat_conv"],
    }
    if "shortcut_conv" in vp:
        out["shortcut_conv"] = vp["shortcut_conv"]
        out["shortcut_norm"] = vp["shortcut_norm"]
    return out


class ResNeStEncoder(nn.Module):
    """Modular encoder for the TransUNet hybrid stem (reference: ResNest.py:4-58).

    Returns ``(x4, [x3, x2, x1])``: bottleneck at 1/16 resolution plus skips
    at 1/8, 1/4, 1/2.  Stage channels 64/128/256/512 (ResNest.py:29-36).
    """

    ksize: int = 3
    radix: int = 3
    kpaths: int = 3
    # Rematerialize each split-attention stage in the backward pass
    # (jax.checkpoint).  The train step is HBM-bandwidth-bound at ~11% MXU
    # (BASELINE.md), so recomputing a stage's forward instead of persisting
    # its intermediates trades idle MXU FLOPs for HBM bytes.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_cls = (nn.remat(ResidualS, static_argnums=(2,)) if self.remat
                     else ResidualS)
        leaky = activation("leaky")
        x = conv(16, 3, name="initial_conv")(x)
        x = leaky(x)
        x = conv(32, 3, name="convtmp_1")(x)
        x = Norm("batch", name="convtmp_1bn")(x, train)
        x = leaky(x)
        x = conv(32, 3, name="convtmp_2")(x)
        x = Norm("batch", name="convtmp_2bn")(x, train)
        x = leaky(x)
        x = avg_pool2(x)
        x1 = stage_cls(64, self.ksize, self.radix, self.kpaths,
                       norm="layer", act="leaky", name="stage1")(x, train)
        x = avg_pool2(x1)
        x2 = stage_cls(128, self.ksize, self.radix, self.kpaths,
                       norm="layer", act="leaky", name="stage2")(x, train)
        x = avg_pool2(x2)
        x3 = stage_cls(256, self.ksize, self.radix, self.kpaths,
                       norm="layer", act="leaky", name="stage3")(x, train)
        x = avg_pool2(x3)
        x4 = stage_cls(512, self.ksize, self.radix, self.kpaths,
                       norm="layer", act="leaky", name="stage4")(x, train)
        return x4, [x3, x2, x1]


class _Upsample(nn.Module):
    """ConvTranspose(k4, s2) -> BN -> [dropout 0.5] -> ReLU
    (reference: TBI_ResNest.py:209-220)."""

    out_channel: int
    apply_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv_transpose(self.out_channel, 4, 2, name="t_conv")(x)
        x = Norm("batch", name="bn")(x, train)
        if self.apply_dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.relu(x)


class ResNeStUNet(nn.Module):
    """Standalone ResNeSt U-Net (reference: TBI_ResNest.py:80-128).

    Input ``[B, H, W, C]`` with H, W divisible by 64 (six 2x pools — the
    reference trains at 256x64x6, TBI_ResNest.py:267-270); output per-pixel
    softmax probabilities ``[B, H, W, num_classes]``.
    """

    num_classes: int = 3
    ksize: int = 3
    radix: int = 3
    kpaths: int = 3
    remat: bool = False  # jax.checkpoint each split-attention stage

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage = (nn.remat(ResidualS, static_argnums=(2,)) if self.remat
                 else ResidualS)
        elu = activation("elu")
        rs = dict(ksize=self.ksize, radix=self.radix, kpaths=self.kpaths,
                  norm="batch", act="elu", shortcut_always=False)

        x = conv(16, 3, name="conv1")(x)
        x = elu(x)
        x = conv(32, 3, name="conv2_1_1")(x)
        x = elu(x)  # no BN on this conv in the reference (TBI_ResNest.py:86)
        x = conv(32, 3, name="conv2_1_2")(x)
        x = Norm("batch", name="conv2_1_2bn")(x, train)
        x = elu(x)

        pool1 = avg_pool2(x)
        c1 = stage(64, name="conv2_1", **rs)(pool1, train)
        pool2 = avg_pool2(c1)
        c2 = stage(128, name="conv2_2", **rs)(pool2, train)
        pool3 = avg_pool2(c2)
        c3 = stage(256, name="conv3_1", **rs)(pool3, train)
        pool4 = avg_pool2(c3)
        c4 = stage(512, name="conv3_2", **rs)(pool4, train)
        pool5 = avg_pool2(c4)
        c5 = stage(512, name="conv4_1", **rs)(pool5, train)
        pool6 = avg_pool2(c5)

        u = _Upsample(512, True, name="upsample_0")(pool6, train)
        u = jnp.concatenate([u, pool5], axis=-1)
        u = _Upsample(512, True, name="upsample_1")(u, train)
        u = jnp.concatenate([u, pool4], axis=-1)
        u = _Upsample(512, True, name="upsample_2")(u, train)
        u = jnp.concatenate([u, pool3], axis=-1)
        u = _Upsample(256, False, name="upsample_3")(u, train)
        u = jnp.concatenate([u, pool2], axis=-1)
        u = _Upsample(128, False, name="upsample_4")(u, train)
        u = jnp.concatenate([u, pool1], axis=-1)

        logits = conv_transpose(self.num_classes, 4, 2, name="f_tran")(u)
        return nn.softmax(logits, axis=-1)
