"""Model-zoo smoke tests: init + forward shapes + output is a distribution.

Run at reduced spatial size where possible to keep CPU compile times sane;
full-size coverage lives in the e2e smoke test and the benchmark harness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrasound_modeling_tpu.models.resnest import ResNeStEncoder, ResNeStUNet
from ultrasound_modeling_tpu.models.transunet import TransUNet


def _init_and_forward(model, x, train=False):
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train)
    if train and "batch_stats" in variables:
        out, _ = model.apply(variables, x, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
        return out
    return model.apply(variables, x, train)


def test_resnest_encoder_shapes():
    x = jnp.zeros((1, 32, 20, 10))
    model = ResNeStEncoder(ksize=3, radix=2, kpaths=2)
    (x4, skips) = _init_and_forward(model, x)
    assert x4.shape == (1, 2, 1, 512)         # 1/16 resolution
    assert skips[0].shape == (1, 4, 2, 256)   # x3 at 1/8
    assert skips[1].shape == (1, 8, 5, 128)   # x2 at 1/4
    assert skips[2].shape == (1, 16, 10, 64)  # x1 at 1/2


def test_resnest_unet_probabilities():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 6)),
                    jnp.float32)
    model = ResNeStUNet(num_classes=3, radix=2, kpaths=2)
    probs = _init_and_forward(model, x)
    assert probs.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def _tiny_transunet():
    """CPU-sized TransUNet: grid (4, 5) at 64x80, hidden 64 (the test box has
    a single CPU core — full-size coverage runs on TPU via bench.py)."""
    return TransUNet(num_classes=3, hidden_size=64, num_heads=4, num_layers=2,
                     mlp_dim=128, grid=(4, 5), radix=2, kpaths=2)


def test_transunet_shapes():
    x = jnp.zeros((1, 64, 80, 10))
    model = _tiny_transunet()
    probs = _init_and_forward(model, x)
    assert probs.shape == (1, 64, 80, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_transunet_ksac_decoder():
    x = jnp.zeros((1, 64, 80, 10))
    model = TransUNet(num_classes=3, hidden_size=64, num_heads=4, num_layers=1,
                      mlp_dim=128, grid=(4, 5), radix=2, kpaths=2,
                      decoder_kind="ksac")
    probs = _init_and_forward(model, x, train=True)
    assert probs.shape == (1, 64, 80, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_transunet_gradients_flow():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 80, 10)),
                    jnp.float32)
    model = _tiny_transunet()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, False)

    def loss(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             x, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum((out - 0.5) ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert leaves
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert np.isfinite(total) and total > 0
