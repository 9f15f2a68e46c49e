"""int8 weight-only quantization tests (infer/quantize.py): coverage,
bounded dequant error, forward closeness, and the smaller exported artifact.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrasound_modeling_tpu.config import from_toml
from ultrasound_modeling_tpu.infer import export as ex
from ultrasound_modeling_tpu.infer import quantize as qz
from ultrasound_modeling_tpu.models.registry import build_model
from ultrasound_modeling_tpu.train import optim, step as step_mod

H, W = 64, 80

TOML = """
[model]
name = 'transunet'
hidden_size = 64
num_layers = 2
num_heads = 2
mlp_dim = 64
grid = [4, 5]
img_size = [64, 80]

[train]
batch_size = 2
"""


@pytest.fixture(scope="module")
def state_and_cfg(tmp_path_factory):
    p = tmp_path_factory.mktemp("qcfg") / "small.toml"
    p.write_text(TOML)
    cfg = from_toml(str(p))
    model = build_model(cfg.model)
    tx = optim.make_direction(clip_norm=cfg.train.clip_global_norm,
                              weight_decay=cfg.train.weight_decay)
    state = step_mod.TrainState.create(
        model, tx, jnp.zeros((1, H, W, 10), jnp.float32),
        jax.random.PRNGKey(0))
    return state, cfg


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 3, 32, 64)).astype(np.float32)
    q = qz._quantize_leaf(w)
    assert q["q"].dtype == np.int8
    assert q["scale"].shape == (1, 1, 1, 64)
    deq = q["q"].astype(np.float32) * q["scale"]
    # symmetric rounding: error <= scale/2 per element, per output channel
    err = np.abs(deq - w)
    assert np.all(err <= q["scale"] * 0.5 + 1e-7)


def test_quantize_params_coverage(state_and_cfg):
    state, _ = state_and_cfg
    qp = qz.quantize_params(state.params)
    frac = qz.quantized_fraction(qp)
    assert frac > 0.8                      # kernels dominate the param count
    # biases / norm params untouched
    leaves = jax.tree_util.tree_leaves(qp, is_leaf=qz._is_qleaf)
    assert any(qz._is_qleaf(l) for l in leaves)
    assert any(not qz._is_qleaf(l) for l in leaves)
    # dequantize restores the tree structure with float leaves
    dq = qz.dequantize_params(qp)
    orig_flat = jax.tree_util.tree_leaves(state.params)
    dq_flat = jax.tree_util.tree_leaves(dq)
    assert len(orig_flat) == len(dq_flat)
    for a, b in zip(orig_flat, dq_flat):
        assert a.shape == b.shape


def test_quantized_forward_close(state_and_cfg):
    state, cfg = state_and_cfg
    model = build_model(cfg.model)
    qfwd = qz.make_quantized_forward(model, state)
    direct = step_mod.make_forward(model)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, H, W, 10)),
                    jnp.float32)
    got = np.asarray(qfwd(x))
    want = np.asarray(direct(state, x))
    assert got.shape == want.shape
    # weight-only int8: output probabilities move by << one class decision
    assert np.max(np.abs(got - want)) < 0.15
    agree = np.mean(np.argmax(got, -1) == np.argmax(want, -1))
    assert agree > 0.99


def test_quantized_export_smaller(state_and_cfg, tmp_path):
    state, cfg = state_and_cfg
    full = ex.export_forward(cfg.model, state, (H, W, 10), batch=1)
    quant = ex.export_forward(cfg.model, state, (H, W, 10), batch=1,
                              quantize="int8")
    p_full = str(tmp_path / "full.hlo")
    p_quant = str(tmp_path / "quant.hlo")
    ex.save_exported(full, p_full)
    ex.save_exported(quant, p_quant)
    assert os.path.getsize(p_quant) < 0.45 * os.path.getsize(p_full)
    served = ex.load_exported(p_quant)
    x = jnp.zeros((1, H, W, 10), jnp.float32)
    probs = np.asarray(served(x))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
