"""Pipeline parallelism (GPipe schedule) for the scanned transformer stack.

The reference has no pipeline parallelism (SURVEY.md §2.3 — its only
distribution is MirroredStrategy data parallelism, reference:
MainParallel.py:16).  This module is the TPU-native extension that completes
the mesh story: the flagship TransUNet's transformer stack is an ``nn.scan``
over stacked per-layer params ``[L, ...]`` (models/transunet.py Encoder), so
pipelining is a *sharding of the layer axis*: stage ``s`` of ``P`` holds
layers ``[s*L/P, (s+1)*L/P)`` and activations flow stage-to-stage over ICI
with ``lax.ppermute``.

Design (idiomatic JAX, not a port of anything):

* ``jax.shard_map`` manual ONLY over the pipeline axis (``axis_names={axis}``)
  — the ``data`` axis stays GSPMD-automatic, so data parallelism composes
  with no extra code: batch stays ``P('data')``-sharded right through the
  pipeline body.
* GPipe schedule: the local batch is split into ``M`` microbatches; at step
  ``t`` of ``M + P - 1``, stage ``s`` processes microbatch ``t - s`` (bubbles
  masked out).  Steps run under ``lax.scan`` — one compiled body.
* The whole thing is differentiable: ``ppermute``'s transpose is the reverse
  permute, so the backward pass is the mirror-image pipeline (fill from the
  last stage), and the stacked-layer grads come out still sharded
  ``P(axis)`` — each stage materialises only its own slab's grads/opt state,
  which is exactly pipeline-parallel memory scaling.
* The output is ``psum``-broadcast from the last stage so the (replicated)
  decoder head runs identically on every pipe shard.

Bubble fraction is ``(P-1)/(M+P-1)``; pick ``num_micro >= 2*P`` (the default)
to keep it under a third.

Activation memory: params/opt-state/grads scale per stage as above, but the
backward of the scheduled ``lax.scan`` saves activations for all ``M + P - 1``
steps on every stage unless the layer body is rematerialized — so the CLI
enables per-layer ``remat`` by default under ``--pp`` (cli.py cmd_train);
stage-local *activation* scaling holds only with remat on.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ultrasound_modeling_tpu.parallel.mesh import MODEL_AXIS


def _vary(tree, axis: str):
    """Mark zero-initialised carries as device-varying over ``axis`` (required
    by shard_map's varying-manual-axes type system for scan carries)."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is None:                      # older jax: vma tracking absent
        return tree
    return jax.tree.map(lambda a: pcast(a, (axis,), to="varying"), tree)


def pipeline_stack(layer_apply: Callable, stacked_params, x: jnp.ndarray,
                   *, mesh: Mesh, num_micro: Optional[int] = None,
                   axis: str = MODEL_AXIS):
    """Run ``x`` through ``L`` stacked layers, pipelined over ``axis``.

    ``layer_apply(layer_params, h, fold) -> h`` applies ONE layer;
    ``fold`` is an int32 scalar (global layer index mixed with the microbatch
    id) for rng folding — ignore it for deterministic layers.
    ``stacked_params``: pytree with leading layer axis ``[L, ...]`` on every
    leaf, sharded ``P(axis)`` (see ``pp_param_specs``).
    ``x``: ``[B, ...]`` activations (may be batch-sharded over other,
    GSPMD-automatic mesh axes).
    """
    n_stages = mesh.shape[axis]
    if n_stages == 1:
        def body(h, lp_i):
            lp, i = lp_i
            return layer_apply(lp, h, i), None
        n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
        h, _ = jax.lax.scan(body, x, (stacked_params, jnp.arange(n_layers)))
        return h

    batch = x.shape[0]
    if num_micro:
        if batch % num_micro:
            raise ValueError(
                f"num_micro={num_micro} does not divide the local batch "
                f"{batch}; pick a divisor (bubble fraction depends on it)")
        m = num_micro
    else:
        m = min(batch, 2 * n_stages)
        while batch % m:
            m -= 1
    layers_per_stage = jax.tree.leaves(stacked_params)[0].shape[0] // n_stages

    def local(slab, x_local):
        s = jax.lax.axis_index(axis)
        micro = x_local.reshape(m, -1, *x_local.shape[1:])

        def stage(h, micro_id):
            def body(h, lp_i):
                lp, i = lp_i
                fold = (s * layers_per_stage + i) + micro_id * 1000003
                return layer_apply(lp, h, fold), None
            h, _ = jax.lax.scan(body, h, (slab, jnp.arange(layers_per_stage)))
            return h

        outbuf = _vary(jnp.zeros_like(micro), axis)
        recv = _vary(jnp.zeros_like(micro[0]), axis)

        def step(carry, t):
            recv, outbuf = carry
            micro_id = jnp.clip(t - s, 0, m - 1)
            mb = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(t, 0, m - 1), keepdims=False)
            inp = jnp.where(s == 0, mb, recv)
            out = stage(inp, micro_id)
            oi = t - (n_stages - 1)
            written = jax.lax.dynamic_update_index_in_dim(
                outbuf, out, jnp.clip(oi, 0, m - 1), 0)
            keep = (s == n_stages - 1) & (oi >= 0)
            outbuf = jnp.where(keep, written, outbuf)
            recv = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (recv, outbuf), None

        (recv, outbuf), _ = jax.lax.scan(
            step, (recv, outbuf), jnp.arange(m + n_stages - 1))
        # Broadcast the last stage's outputs to every pipe shard: the decoder
        # head is replicated over the pipe axis.
        outbuf = jax.lax.psum(
            jnp.where(s == n_stages - 1, outbuf, jnp.zeros_like(outbuf)), axis)
        return outbuf.reshape(x_local.shape)

    return jax.shard_map(local, mesh=mesh, in_specs=(P(axis), P()),
                         out_specs=P(), axis_names={axis})(stacked_params, x)


def pp_param_specs(params, axis: str = MODEL_AXIS,
                   stack_key: str = "blocks"):
    """PartitionSpec pytree for pipeline parallelism: every leaf under a
    ``stack_key`` subtree (the nn.scan-stacked layer params, leading axis L)
    is sharded ``P(axis)`` on the layer axis; everything else replicated."""
    def leaf_spec(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        if stack_key in names:
            return P(axis)
        return P()
    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_params_pp(mesh: Mesh, tree, axis: str = MODEL_AXIS,
                    stack_key: str = "blocks"):
    """Place a param/opt-state pytree on the mesh per the PP specs."""
    from ultrasound_modeling_tpu.parallel.mesh import shard_params
    return shard_params(mesh, tree, specs=pp_param_specs(tree, axis,
                                                         stack_key))


def pp_tp_param_specs(params, pipe_axis: str = "pipe",
                      stack_key: str = "blocks"):
    """Combined dp x tp x pp specs: stacked transformer leaves shard their
    leading layer axis over ``pipe_axis`` AND their Megatron row/column axis
    over ``model`` (parallel.mesh tp rules); everything else follows the
    plain TP rules (replicated where no rule matches)."""
    from ultrasound_modeling_tpu.parallel import mesh as mesh_mod

    def leaf_spec(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        tp_spec = mesh_mod._leaf_spec(path, leaf)
        if stack_key not in names:
            return tp_spec
        axes = list(tp_spec) + [None] * (leaf.ndim - len(tp_spec))
        axes[0] = pipe_axis
        return P(*axes)
    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_params_pp_tp(mesh: Mesh, tree, pipe_axis: str = "pipe",
                       stack_key: str = "blocks"):
    """Place a param/opt-state pytree on a (data, model, pipe) mesh with
    the combined TP + PP sharding."""
    from ultrasound_modeling_tpu.parallel.mesh import shard_params
    return shard_params(mesh, tree, specs=pp_tp_param_specs(tree, pipe_axis,
                                                            stack_key))
