"""Multi-host entry tests (single-process degenerate paths run everywhere;
the true multi-process path is gated on jax.process_count() > 1 — on a pod,
launch pytest once per host with JAX_COORDINATOR_ADDRESS set)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrasound_modeling_tpu.parallel import distributed as dist
from ultrasound_modeling_tpu.parallel import mesh as mesh_mod


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert dist.initialize_distributed() is False
    assert jax.process_count() == 1


def test_local_batch_slice_single():
    start, stop = dist.local_batch_slice(64)
    assert (start, stop) == (0, 64)


def test_global_batch_from_local_single_process():
    mesh = mesh_mod.make_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    y = np.arange(8, dtype=np.float32)
    gx, gy = dist.global_batch_from_local(mesh, x, y)
    assert gx.shape == (8, 4) and gy.shape == (8,)
    np.testing.assert_array_equal(np.asarray(gx), x)
    # sharded over the data axis
    assert gx.sharding.spec == mesh_mod.batch_sharding(mesh).spec
    # and usable inside a jitted reduction
    assert float(jnp.sum(gx)) == float(x.sum())


@pytest.mark.skipif(jax.process_count() == 1,
                    reason="requires a multi-process JAX runtime "
                           "(launch with JAX_COORDINATOR_ADDRESS on a pod)")
def test_global_batch_from_local_multi_process():
    mesh = mesh_mod.make_mesh()
    gb = 8 * jax.process_count()
    start, stop = dist.local_batch_slice(gb)
    assert stop - start == 8
    local = np.full((8, 4), jax.process_index(), np.float32)
    gx = dist.global_batch_from_local(mesh, local)
    assert gx.shape == (gb, 4)
    # every process contributed its own slab
    total = float(jnp.sum(gx))
    want = 8 * 4 * sum(range(jax.process_count()))
    assert total == want
