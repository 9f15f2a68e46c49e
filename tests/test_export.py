"""Serving-export tests: the StableHLO artifact (jax.export) round-trips —
the TPU-native analogue of the reference's SavedModel save/load
(reference: MainNumpy.py:177, TBIEvaluator.py:235-236)."""

import dataclasses as dc
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrasound_modeling_tpu import cli
from ultrasound_modeling_tpu.config import from_toml
from ultrasound_modeling_tpu.infer import export as ex
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
def small_cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "small.toml"
    p.write_text(TOML)
    return str(p)


@pytest.fixture(scope="module")
def state_and_cfg(small_cfg_path):
    cfg = from_toml(small_cfg_path)
    model = build_model(cfg.model)
    tx = optim.make_direction(clip_norm=cfg.train.clip_global_norm,
                              weight_decay=cfg.train.weight_decay)
    state = step_mod.TrainState.create(
        model, tx, jnp.zeros((1, H, W, 10), jnp.float32),
        jax.random.PRNGKey(0))
    return state, cfg


def test_export_roundtrip_symbolic_batch(state_and_cfg, tmp_path):
    state, cfg = state_and_cfg
    exported = ex.export_forward(cfg.model, state, (H, W, 10), batch=None)
    path = str(tmp_path / "m.stablehlo")
    ex.save_exported(exported, path)
    assert os.path.getsize(path) > 0

    served = ex.load_exported(path)
    model = build_model(cfg.model)
    direct = step_mod.make_forward(model)
    rng = np.random.default_rng(0)
    # one artifact, two different batch sizes (shape-polymorphic batch axis)
    for b in (2, 3):
        x = jnp.asarray(rng.normal(size=(b, H, W, 10)), jnp.float32)
        got = np.asarray(served(x))
        want = np.asarray(direct(state, x))
        assert got.shape == (b, H, W, 3)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_static_batch_pins_shape(state_and_cfg, tmp_path):
    state, cfg = state_and_cfg
    exported = ex.export_forward(cfg.model, state, (H, W, 10), batch=2)
    path = str(tmp_path / "m2.stablehlo")
    ex.save_exported(exported, path)
    served = ex.load_exported(path)
    x = jnp.zeros((2, H, W, 10), jnp.float32)
    assert np.asarray(served(x)).shape == (2, H, W, 3)
    with pytest.raises(Exception):
        served(jnp.zeros((3, H, W, 10), jnp.float32))
    # the pinned batch is recorded in the artifact metadata (serve/infer
    # collapse their padding buckets to exactly it)
    _, shape, batch = ex.load_exported_meta(path)
    assert shape == (H, W, 10) and batch == 2


def test_cli_export_then_infer_serves_artifact(small_cfg_path, tmp_path):
    out = str(tmp_path / "flagship.stablehlo")
    # ckpt-less export requires the explicit --init-random escape hatch
    with pytest.raises(SystemExit, match="trained weights"):
        cli.main(["export", "--config", small_cfg_path, "--out", out])
    cli.main(["export", "--config", small_cfg_path, "--out", out,
              "--init-random"])
    assert os.path.getsize(out) > 0

    # the evaluator serves the artifact without a checkpoint or model rebuild
    out_dir = str(tmp_path / "panels")
    cli.main(["infer", "--config", small_cfg_path, "--exported", out,
              "--synthetic", "--max-frames", "2", "--out", out_dir])
    assert os.path.exists(os.path.join(out_dir, "summary.json"))
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 2
