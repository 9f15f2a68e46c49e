"""Optimizers and learning-rate schedules.

Reference semantics:
* Adam everywhere (reference: VisionTransformer.py:204); gradient clipping by
  global norm 1.0 (reference: VisionTransformer.py:244); the standalone
  ResNeSt U-Net clips nothing (reference: TBI_ResNest.py:43-46).
* PiecewiseConstantDecay schedules (reference: MainNumpy.py:83-88 with
  boundaries [2000,4000,8000,10000,15000] x [1,.3,.1,.03,.01,.003] scaled by
  1e-2; MainParallel.py:74-79 variant scaled 1e-3).
* Reactive F1-plateau LR/5 decay (reference: TBI_ResNest.py:407-412) — exposed
  as a mutable scale multiplier in the train loop.
* The MobileUNet trains encoder and decoder with different Adam rates
  (2e-3 / 2e-4, beta1 = 0.5 — reference: TBIPixelCNN.py:256-257), expressed
  here with ``optax.multi_transform`` over a path predicate.

Built on optax: ``chain(clip_by_global_norm, scale_by_adam, scale)``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import optax


def piecewise_constant(base: float, boundaries: Sequence[int],
                       values: Sequence[float]) -> Callable:
    """``base * values[i]`` for steps in (boundaries[i-1], boundaries[i]]
    (Keras PiecewiseConstantDecay semantics: len(values) = len(boundaries)+1)."""
    bnds = jnp.asarray(boundaries)
    vals = jnp.asarray(values, jnp.float32) * base

    def schedule(step):
        idx = jnp.sum(step > bnds)
        return vals[idx]

    return schedule


def make_direction(clip_norm: Optional[float] = 1.0,
                   b1: float = 0.9, b2: float = 0.999,
                   weight_decay: float = 0.0,
                   mu_dtype: Optional[str] = None
                   ) -> optax.GradientTransformation:
    """Clip + Adam *direction* (no lr scale — the train step applies the
    runtime learning rate; see train.step.make_train_step).

    ``weight_decay`` adds decoupled (AdamW-style) decay AFTER the Adam
    rescale; since the step multiplies the whole update by the runtime lr,
    the effective decay follows the piecewise schedule — the intent of the
    reference's scheduled wd lambda (reference: MainNumpy.py:87-88, whose
    AdamW import is commented out there).

    ``mu_dtype`` ("bfloat16") stores the first moment in bf16 — an HBM-bytes
    optimization for the bytes-bound train step (BASELINE round-4 roofline);
    the second moment stays f32 (bf16 under the rsqrt would inject ~4e-3
    relative step noise)."""
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, mu_dtype=mu_dtype))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    return optax.chain(*parts)


def make_optimizer(learning_rate: float | Callable,
                   clip_norm: Optional[float] = 1.0,
                   b1: float = 0.9, b2: float = 0.999,
                   plateau_scale: Optional[Callable[[], float]] = None
                   ) -> optax.GradientTransformation:
    """Adam with optional global-norm clipping (the reference's optimizer
    stack — clip at VisionTransformer.py:244, Adam at :204)."""
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2))
    if callable(learning_rate):
        parts.append(optax.scale_by_schedule(lambda s: -learning_rate(s)))
    else:
        parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)


def make_dual_rate_direction(encoder_ratio: float = 0.1, b1: float = 0.5,
                             encoder_prefix: str = "encoder",
                             mu_dtype: Optional[str] = None
                             ) -> optax.GradientTransformation:
    """MobileUNet dual-Adam direction (reference: TBIPixelCNN.py:256-257,
    290-298): encoder params train at ``encoder_ratio`` x the decoder rate
    (2e-4 vs 2e-3 in the reference), both with beta1 = 0.5.  Composes with
    the runtime-lr step: the step's lr is the decoder rate.

    Parameters under the ``encoder_prefix`` top-level module get the ratio.
    """
    import jax

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "encoder"
            if str(getattr(path[0], "key", path[0])).startswith(encoder_prefix)
            else "decoder",
            params)

    return optax.multi_transform(
        {"encoder": optax.chain(optax.scale_by_adam(b1=b1,
                                                    mu_dtype=mu_dtype),
                                optax.scale(encoder_ratio)),
         "decoder": optax.scale_by_adam(b1=b1, mu_dtype=mu_dtype)},
        label_fn)


def mainnumpy_schedule(base: float = 1e-2) -> Callable:
    """reference: MainNumpy.py:83-88."""
    return piecewise_constant(
        base, (2000, 4000, 8000, 10000, 15000),
        (1.0, 0.3, 0.1, 0.03, 0.01, 0.003))


def mainparallel_schedule(base: float = 1e-3) -> Callable:
    """reference: MainParallel.py:74-79 (boundaries stretched to 10k-80k)."""
    return piecewise_constant(
        base, (10000, 20000, 40000, 60000, 80000),
        (1.0, 0.3, 0.1, 0.03, 0.01, 0.003))
