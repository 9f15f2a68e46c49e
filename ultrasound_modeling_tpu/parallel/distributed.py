"""Multi-host / multi-slice entry (DCN scaling).

The reference attempted multi-worker data parallelism and abandoned it
(commented-out ``MultiWorkerMirroredStrategy`` scaffolding —
reference: TBI_ResNest.py:6,463-468).  The TPU-native path is the JAX
multi-process runtime: every host calls ``jax.distributed.initialize``,
``jax.devices()`` then spans all slices, and the SAME mesh/collective code
as single-host runs over ICI within a slice and DCN across slices
(SURVEY.md §2.4/§5.8).

Feeding follows ``jax.make_array_from_process_local_data``: each process
loads only its local shard of the global batch (the equivalent of the
reference's ``experimental_distribute_dataset``, MainParallel.py:128).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from ultrasound_modeling_tpu.parallel import mesh as mesh_mod


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize the JAX multi-process runtime (idempotent).

    Returns True when a multi-process runtime is active afterwards.  With no
    arguments and no ``JAX_COORDINATOR_ADDRESS``/cloud-TPU environment, this
    is a single-process no-op — the same binary runs unchanged on one host.

    ORDERING: nothing here may touch the XLA backend before
    ``jax.distributed.initialize`` — even ``jax.process_count()`` initializes
    it (and caches its answer), after which initialize() raises.  The
    already-initialized check therefore reads the client state directly.
    """
    try:
        from jax._src import distributed as _dist_state
        already = getattr(_dist_state.global_state, "client", None) is not None
    except Exception:
        # Private API moved: assume NOT initialized (the normal startup
        # state) and let jax.distributed.initialize itself report a double
        # call below — calling jax.process_count() here would initialize
        # the XLA backend and make initialize() fail unconditionally.
        already = False
    if already:
        return jax.process_count() > 1  # already initialized
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and env_coord is None \
            and num_processes is None:
        # single-process: nothing to do (TPU pod slices auto-detect via
        # jax.distributed.initialize() with no args, but calling it on a
        # non-pod single host raises; keep the no-arg path lazy).
        return False
    kwargs = {}
    if coordinator_address or env_coord:
        kwargs["coordinator_address"] = coordinator_address or env_coord
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    elif "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:
        if "already" not in str(exc):
            raise  # real failure; double-init just means we're live
    return jax.process_count() > 1


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, stop) rows of the global batch this process should load —
    the per-process analogue of MirroredStrategy's dataset sharding
    (reference: MainParallel.py:128,151-156)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count "
            f"{n} — tail rows would silently be fed by no host")
    per = global_batch // n
    start = per * jax.process_index()
    return start, start + per


def global_batch_from_local(mesh, *local_arrays):
    """Assemble global batch-sharded arrays from per-process local shards
    (``jax.make_array_from_process_local_data``; the multi-host replacement
    for ``mesh_mod.shard_batch``).  Single-process it degenerates to a plain
    ``device_put`` with the same sharding, so callers can use it
    unconditionally."""
    sharding = mesh_mod.batch_sharding(mesh)
    if jax.process_count() == 1:
        out = tuple(jax.device_put(a, sharding) for a in local_arrays)
        return out if len(out) > 1 else out[0]
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in local_arrays)
    return out if len(out) > 1 else out[0]
