"""Device mesh, sharding rules and collectives.

The reference's distribution layer is ``tf.distribute.MirroredStrategy``
(reference: MainParallel.py:16): variables replicated, batches split across
replicas, gradients all-reduced with NCCL (ReduceOp.SUM at
MainParallel.py:131-134), eval logits gathered to host
(MainParallel.py:158-163).

TPU-native equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis (ICI
fabric) and a reserved ``model`` axis for tensor-parallel extensions.  Batches
are sharded ``P('data')``; params/opt-state are replicated ``P()``; the train
step is jitted with those shardings and XLA inserts the gradient all-reduce
over ICI.  Eval metrics are small ``psum``-able tensors (train.metrics), so
nothing is gathered to the host.  Multi-slice scaling reuses the same code:
``jax.devices()`` spans slices and the mesh simply includes the DCN axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = devices[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays on the mesh, batch-sharded over ``data``."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / opt state) across the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)
