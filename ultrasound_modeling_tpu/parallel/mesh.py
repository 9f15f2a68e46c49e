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
PIPE_AXIS = "pipe"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              n_pipe: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, model)`` mesh — or ``(data, model, pipe)`` when
    ``n_pipe > 1`` — over the given (default: all) devices.

    The ``pipe`` axis carries GPipe pipeline stages (parallel/pipeline.py)
    and composes with Megatron TP over ``model``: each pipeline stage is
    itself a ``model``-wide tensor-parallel group (dp x tp x pp)."""
    devices = list(devices if devices is not None else jax.devices())
    per_data = n_model * n_pipe
    if n_data is None:
        n_data = len(devices) // per_data
    if n_data < 1:
        raise ValueError(
            f"mesh needs n_model*n_pipe = {per_data} devices per data "
            f"group but only {len(devices)} are available")
    if n_data * per_data > len(devices):
        raise ValueError(
            f"mesh wants {n_data}x{n_model}x{n_pipe} = "
            f"{n_data * per_data} devices, have {len(devices)}")
    if len(devices) % per_data and n_data == len(devices) // per_data:
        import warnings
        warnings.warn(
            f"{len(devices) - n_data * per_data} of {len(devices)} devices "
            f"unused (device count not divisible by n_model*n_pipe = "
            f"{per_data})", stacklevel=2)
    use = devices[: n_data * per_data]
    if n_pipe > 1:
        arr = np.array(use).reshape(n_data, n_model, n_pipe)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def pipe_axis(mesh: Mesh) -> str:
    """The axis pipeline stages live on: ``pipe`` when the mesh has one
    (dp x tp x pp), else ``model`` (the 2-axis dp x pp layout)."""
    return PIPE_AXIS if mesh.shape.get(PIPE_AXIS, 1) > 1 else MODEL_AXIS


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


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over ``data`` AND image height over ``model`` — spatial
    partitioning (the conv-model form of sequence/context parallelism).
    GSPMD inserts the halo exchanges for SAME-padded convs and pools, so
    a [B, H, W, C] conv network runs unchanged; reductions (BatchNorm
    batch stats, GAP) are global automatically."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def shard_batch_spatial(mesh: Mesh, *arrays):
    """Place [B, H, ...] host arrays batch- and height-sharded."""
    s = spatial_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / opt state) across the mesh.

    Multi-process: ``device_put`` cannot target the other hosts'
    (non-addressable) devices, but every process computes the same host
    value (same init seed — the Trainer's contract, train/loop.py), so the
    fully-replicated global array is assembled from each process's local
    copy instead (exercised by tests/test_distributed.py's real 2-process
    run; the reference's abandoned multi-worker intent: TBI_ResNest.py:6)."""
    s = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                s, np.asarray(a)), tree)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


# ---------------------------------------------------------------------------
# Tensor parallelism (Megatron-style) for the transformer stacks
# ---------------------------------------------------------------------------
#
# The reference has no TP (SURVEY.md §2.3) — this is the TPU-native extension
# the reserved ``model`` axis exists for.  Sharding is declared per-parameter
# and GSPMD inserts the collectives: qkv projections and MLP fc1 are
# column-parallel (output features / heads sharded, no comms in between),
# attn-out and MLP fc2 are row-parallel (input features sharded, one
# all-reduce at the block output, which XLA fuses with the residual add).
# Works for both the scanned TransUNet stack ([L, ...] leaves) and the
# unrolled ViT blocks — specs are built from the trailing axes.

_COL_KERNELS = ("attn/query_kernel", "attn/key_kernel", "attn/value_kernel",
                "ffn/fc1/kernel")
_COL_BIASES = ("attn/query_bias", "attn/key_bias", "attn/value_bias",
               "ffn/fc1/bias")
_ROW_KERNELS = ("attn/out_kernel", "ffn/fc2/kernel")


def _leaf_spec(path, leaf) -> P:
    name = "/".join(
        str(getattr(k, "key", getattr(k, "name", k))) for k in path)
    nd = leaf.ndim

    def tail(model_pos_from_end: int) -> P:
        axes = [None] * nd
        axes[nd - model_pos_from_end] = MODEL_AXIS
        return P(*axes)

    if any(name.endswith(s) for s in _COL_KERNELS):
        return tail(1)          # [..., in, out]: shard out
    if any(name.endswith(s) for s in _COL_BIASES):
        return tail(1)          # [..., out]: shard out
    if any(name.endswith(s) for s in _ROW_KERNELS):
        return tail(2)          # [..., in, out]: shard in
    return P()


def tp_param_specs(params):
    """PartitionSpec pytree for Megatron-style TP over ``model``."""
    return jax.tree_util.tree_map_with_path(_leaf_spec, params)


def shard_params(mesh: Mesh, tree, specs=None):
    """Place a param/opt-state pytree on the mesh per the TP specs
    (replicated where no rule matches).  ``specs`` defaults to
    ``tp_param_specs`` of the tree itself."""
    if specs is None:
        specs = tp_param_specs(tree)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), tree, specs)
