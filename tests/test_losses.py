"""Loss golden tests against literal NumPy transcriptions of the reference
math (reference: VisionTransformer.py:225-227,259-279; TBI_ResNest.py:234-248;
TBIPixelCNN.py:223-230; TBIEvaluator.py:121-129)."""

import jax.numpy as jnp
import numpy as np

from ultrasound_modeling_tpu.train import losses

B, H, W, C = 2, 8, 6, 3


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _data(rng):
    y = np.zeros((B, H, W, C), np.float32)
    idx = rng.integers(0, C, size=(B, H, W))
    for c in range(C):
        y[..., c] = idx == c
    p = _softmax(rng.normal(size=(B, H, W, C))).astype(np.float32)
    return y, p


def test_cce_smooth(rng):
    y, p = _data(rng)
    got = float(losses.cce_smooth(jnp.asarray(y), jnp.asarray(p)))
    ls = 0.1
    ysm = y * (1 - ls) + ls / C
    pc = np.clip(p, 1e-7, 1 - 1e-7)
    want = float(np.sum(-np.sum(ysm * np.log(pc), -1)) / B)
    assert abs(got - want) < 1e-3 * abs(want)


def test_class_balanced(rng):
    y, p = _data(rng)
    ce = np.zeros((H, W), np.float32)
    for c in range(C):
        scale = 1.0 / (y[..., c].sum(axis=0) + 1.0) / (H * W)
        ce += (y[..., c] * np.log(p[..., c] + 1e-7)).sum(axis=0) * scale
    want = float(-ce.sum())
    got = float(losses.class_balanced(jnp.asarray(y), jnp.asarray(p)))
    assert abs(got - want) < 1e-4 * max(abs(want), 1)


def test_factor_scaled(rng):
    y, p = _data(rng)
    cf = np.array(losses.DEFAULT_CLASS_FACTOR, np.float32)
    ysm = y * 0.9 + 0.1 / C
    pc = np.clip(p, 1e-7, 1 - 1e-7)
    want = float(-3 * np.sum(ysm * np.log(pc) * cf))
    got = float(losses.factor_scaled(jnp.asarray(y), jnp.asarray(p)))
    assert abs(got - want) < 1e-3 * abs(want)


def test_pixelcnn_loss(rng):
    y, p = _data(rng)
    cf = np.array(losses.DEFAULT_CLASS_FACTOR, np.float32)
    ce = 0.0
    for c in range(C):
        scale = 1.0 / (y[..., c].sum() + 1.0)
        ce += np.sum(y[..., c] * np.log(np.clip(p[..., c], 1e-7, 1))) * scale * cf[c]
    want = float(-ce)
    got = float(losses.pixelcnn_loss(jnp.asarray(y), jnp.asarray(p)))
    assert abs(got - want) < 1e-4 * max(abs(want), 1)


def test_evaluator_loss(rng):
    y, p = _data(rng)
    cf = np.array(losses.EVAL_CLASS_FACTOR, np.float32)
    scale = 1.0 / y.sum()
    ce = 0.0
    for c in range(C):
        ce += np.sum(y[..., c] * np.log(np.clip(p[..., c], 1e-7, 1))) * scale * cf[c]
    want = float(-3 * ce)
    got = float(losses.evaluator_loss(jnp.asarray(y), jnp.asarray(p)))
    assert abs(got - want) < 1e-4 * max(abs(want), 1)


def test_losses_decrease_toward_truth(rng):
    """Sanity: probabilities closer to y give lower loss for every family."""
    y, p = _data(rng)
    closer = 0.7 * y + 0.3 * p
    closer /= closer.sum(-1, keepdims=True)
    for name, fn in losses.LOSSES.items():
        far = float(fn(jnp.asarray(y), jnp.asarray(p)))
        near = float(fn(jnp.asarray(y), jnp.asarray(closer)))
        assert near < far, name
