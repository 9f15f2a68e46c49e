"""Multi-device data parallelism on the virtual 8-device CPU mesh
(SURVEY.md §4: the JAX fake backend for testing a v5e-8 mesh).

Verifies:
* mesh construction and batch/replica shardings,
* the sharded train step runs and matches the single-device step numerically
  (same params in, same loss out — the psum'd gradient path is exercised),
* psum-able metric accumulation across shards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrasound_modeling_tpu.data import synthetic
from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
from ultrasound_modeling_tpu.train import losses, optim
from ultrasound_modeling_tpu.train import step as step_mod
from ultrasound_modeling_tpu.models.resnest import ResNeStUNet

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

H = W = 32
C = 4
BATCH = 8


def _setup():
    model = ResNeStUNet(num_classes=3, radix=2, kpaths=2)
    tx = optim.make_direction(clip_norm=1.0)
    step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                    num_classes=3, augment=False,
                                    donate=False)
    sample = jnp.zeros((BATCH, H, W, C), jnp.float32)
    state = step_mod.TrainState.create(model, tx, sample,
                                       jax.random.PRNGKey(0))
    raw = synthetic.make_raw_array(BATCH, seed=0, height=H, width=W, n_disp=C)
    x = jnp.asarray(raw[:, 0, :, :, 1:-1])
    y = jnp.asarray(raw[:, 0, :, :, 0])
    return model, step, state, x, y


def test_mesh_shapes():
    mesh = mesh_mod.make_mesh(n_data=8)
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == (mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS)


def test_sharded_step_matches_single_device():
    model, step, state, x, y = _setup()
    lr = jnp.float32(1e-3)

    # Single device result.
    s1, loss1, _ = step(state, x, y, lr)

    # Sharded over the 8-device mesh.
    mesh = mesh_mod.make_mesh(n_data=8)
    state_r = mesh_mod.replicate(mesh, state)
    xs, ys = mesh_mod.shard_batch(mesh, x, y)
    s8, loss8, _ = step(state_r, xs, ys, lr)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    # Parameters after one step agree (gradient all-reduce path correct).
    # Tolerance note: psum reduction order differs from a single-device sum;
    # on near-zero gradients Adam's g/sqrt(v) direction can flip sign under
    # that noise, moving a parameter by up to 2*lr — so the bound is 2*lr
    # plus slack, and we additionally require <0.5% of params to be affected.
    l1 = jax.tree.leaves(jax.device_get(s1.params))
    l8 = jax.tree.leaves(jax.device_get(s8.params))
    lr = 1e-3
    n_bad = 0
    n_total = 0
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(a, b, atol=2.2 * lr)
        n_bad += int(np.sum(np.abs(a - b) > 1e-4))
        n_total += a.size
    assert n_bad / n_total < 0.005, (n_bad, n_total)


def test_batch_sharding_layout():
    mesh = mesh_mod.make_mesh(n_data=8)
    x = jnp.zeros((16, 8, 8, 2))
    xs = mesh_mod.shard_batch(mesh, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec(mesh_mod.DATA_AXIS)
    # each device holds 1/8 of the batch
    shard = xs.addressable_shards[0]
    assert shard.data.shape == (2, 8, 8, 2)
