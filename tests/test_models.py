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


class TestFusedResidualS:
    """impl='fused' (block-diagonal dense restructure) vs impl='vmap'
    (per-branch batched HLOs): identical math, different lowering."""

    def _run(self, norm, train, rng):
        import jax
        from ultrasound_modeling_tpu.models.resnest import (
            ResidualS, vmap_to_fused_params)
        x = jnp.asarray(rng.normal(size=(2, 16, 8, 12)), jnp.float32)
        kw = dict(outchannel=24, ksize=3, radix=3, kpaths=2, norm=norm,
                  act="leaky")
        m_v = ResidualS(impl="vmap", **kw)
        v_v = m_v.init(jax.random.PRNGKey(0), x, train)
        m_f = ResidualS(impl="fused", **kw)
        fused_params = vmap_to_fused_params(v_v["params"])
        variables = {"params": fused_params}
        if "batch_stats" in v_v:
            # Fresh zero/one running stats on both sides.
            bs = m_f.init(jax.random.PRNGKey(1), x, train).get(
                "batch_stats", {})
            variables["batch_stats"] = bs
        mut = ["batch_stats"] if norm == "batch" else False
        out_v = m_v.apply(v_v, x, train, mutable=mut)
        out_f = m_f.apply(variables, x, train, mutable=mut)
        if mut:
            (ov, sv), (of, sf) = out_v, out_f
        else:
            ov, of = out_v, out_f
            sv = sf = None
        np.testing.assert_allclose(np.asarray(of), np.asarray(ov),
                                   rtol=2e-4, atol=2e-4)
        return sv, sf

    def test_layer_eval(self, rng):
        self._run("layer", False, rng)

    def test_layer_train(self, rng):
        self._run("layer", True, rng)

    def test_batch_train_updates_stats(self, rng):
        sv, sf = self._run("batch", True, rng)
        # Running stats advance identically (up to leaf naming).
        leaves_v = sorted(np.asarray(l).ravel()[0]
                          for l in jax.tree.leaves(sv))
        leaves_f = sorted(np.asarray(l).ravel()[0]
                          for l in jax.tree.leaves(sf))
        np.testing.assert_allclose(leaves_f, leaves_v, rtol=1e-4, atol=1e-5)

    def test_batch_eval(self, rng):
        self._run("batch", False, rng)
