"""Checkpoint save/restore round-trip + max-to-keep rotation
(the working version of the reference's dead save_params intent,
reference: TBI_ResNest.py:57-78)."""

import jax
import jax.numpy as jnp
import numpy as np

from ultrasound_modeling_tpu.train import optim, step as step_mod
from ultrasound_modeling_tpu.utils.checkpoint import Checkpointer
import flax.linen as nn


class TinyModel(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Dense(8)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.Dense(3)(x)


def _make_state():
    model = TinyModel()
    tx = optim.make_direction()
    return model, tx, step_mod.TrainState.create(
        model, tx, jnp.zeros((2, 4)), jax.random.PRNGKey(0))


def test_roundtrip(tmp_path):
    model, tx, state = _make_state()
    ck = Checkpointer(str(tmp_path / "ck"), max_to_keep=3, use_orbax=False)
    ck.save(state, 10)
    _, _, template = _make_state()
    restored = ck.restore(template)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(a, b)
    assert int(restored.step) == int(state.step)


def test_max_to_keep(tmp_path):
    model, tx, state = _make_state()
    ck = Checkpointer(str(tmp_path / "ck"), max_to_keep=2, use_orbax=False)
    for s in (1, 2, 3, 4):
        ck.save(state, s)
    assert ck.latest_step() == 4
    import os
    files = [f for f in os.listdir(str(tmp_path / "ck"))
             if f.endswith(".msgpack")]
    assert len(files) == 2  # rotation kept only the last two


def test_params_npz_roundtrip(tmp_path):
    from ultrasound_modeling_tpu.utils.checkpoint import (
        load_params_npz, save_params_npz)
    model, tx, state = _make_state()
    path = str(tmp_path / "w.npz")
    save_params_npz(state.params, path)
    # fresh init, different seed -> different params
    model2 = TinyModel()
    fresh = model2.init(jax.random.PRNGKey(9), jnp.zeros((2, 4)), False)
    merged, loaded, missing = load_params_npz(fresh["params"], path)
    assert not missing
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_missing_raises(tmp_path):
    model, tx, state = _make_state()
    ck = Checkpointer(str(tmp_path / "empty"), use_orbax=False)
    try:
        ck.restore(state)
        assert False, "should raise"
    except FileNotFoundError:
        pass
