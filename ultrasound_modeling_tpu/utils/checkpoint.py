"""Checkpoint / resume.

The reference's variable-level checkpointing is dead code (its ``save_params``
iterates ``model.layers.name`` and raises — reference: TBI_ResNest.py:57-78,
documented in SURVEY.md §2.12); the intent was a named checkpoint with
``max_to_keep=3`` rotation (TBI_ResNest.py:64-66) plus whole-model saves at
the end of training (MainNumpy.py:177).  This module makes that intent work:

* ``Checkpointer`` — saves/restores the full ``TrainState``
  ``{params, batch_stats, opt_state, step, rng}`` with max-to-keep rotation,
  via Orbax when available, falling back to a plain msgpack writer (flax
  serialization) otherwise.  Restore covers preemption — the TPU failure mode
  that matters (SURVEY.md §5.3).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import jax

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from flax import serialization


def flatten_params(params, prefix: str = ""):
    """Flatten a param pytree to {'a/b/c': array} with '/'-joined keys."""
    import jax.tree_util as jtu
    flat = {}
    for path, leaf in jtu.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        flat[prefix + key] = leaf
    return flat


def save_params_npz(params, path: str) -> None:
    """Write params as an .npz of '/'-joined names (the portable exchange
    format; a converter from the reference's released TF checkpoints —
    reference: SwinTransformer.py:461-486 — would emit this)."""
    import numpy as np
    flat = {k: np.asarray(v) for k, v in flatten_params(params).items()}
    np.savez(path, **flat)


def load_params_npz(params, path: str, strict: bool = False):
    """Merge an .npz of '/'-joined names into a param pytree (shape-checked).

    Returns (new_params, loaded_keys, missing_keys).  This is the pretrained
    -weight load path: the reference downloads TF Swin weights at model build
    (reference: SwinTransformer.py:469-484); this framework loads from a local
    npz instead (no-egress environments) with explicit reporting.
    """
    import jax.tree_util as jtu
    import numpy as np

    archive = dict(np.load(path))
    loaded, missing = [], []

    flat_with_path = jtu.tree_flatten_with_path(params)
    treedef = flat_with_path[1]
    new_leaves = []
    for p, leaf in flat_with_path[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in p)
        if key in archive:
            arr = archive[key]
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch for {key}: ckpt {arr.shape} vs "
                    f"model {leaf.shape}")
            new_leaves.append(arr.astype(np.asarray(leaf).dtype))
            loaded.append(key)
        else:
            missing.append(key)
            new_leaves.append(leaf)
    if strict and missing:
        raise KeyError(f"{len(missing)} params missing from {path}: "
                       f"{missing[:5]}...")
    return jtu.tree_unflatten(treedef, new_leaves), loaded, missing


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 use_orbax: Optional[bool] = None):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        self.use_orbax = _HAS_ORBAX if use_orbax is None else use_orbax
        self._mgr = None
        if self.use_orbax:
            try:
                self._mgr = ocp.CheckpointManager(
                    self.directory,
                    options=ocp.CheckpointManagerOptions(
                        max_to_keep=max_to_keep, create=True))
            except Exception:
                self.use_orbax = False

    # -- msgpack fallback ---------------------------------------------------

    def _msgpack_path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:010d}.msgpack")

    def _msgpack_steps(self):
        pat = re.compile(r"ckpt_(\d+)\.msgpack$")
        steps = []
        for f in os.listdir(self.directory):
            m = pat.match(f)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    # -- public API ---------------------------------------------------------

    def save(self, state: Any, step: int) -> None:
        state = jax.device_get(state)
        if self.use_orbax and self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
            return
        with open(self._msgpack_path(step), "wb") as fh:
            fh.write(serialization.to_bytes(state))
        for old in self._msgpack_steps()[: -self.max_to_keep]:
            os.remove(self._msgpack_path(old))

    def latest_step(self) -> Optional[int]:
        if self.use_orbax and self._mgr is not None:
            return self._mgr.latest_step()
        steps = self._msgpack_steps()
        return steps[-1] if steps else None

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``target`` (a template TrainState).

        Leaf dtypes follow the TEMPLATE, not the file: a checkpoint written
        with a different ``adam_mu_dtype`` (f32 mu resumed under
        ``--adam-mu-bf16``, or vice versa) restores mu leaves whose dtype
        disagrees with the rebuilt optimizer template, and leaving the cast
        to Orbax/flax/optax internals makes resume behavior depend on their
        versions.  Cast explicitly instead (ADVICE r4)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if self.use_orbax and self._mgr is not None:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(jax.device_get(target)))
        else:
            with open(self._msgpack_path(step), "rb") as fh:
                restored = serialization.from_bytes(jax.device_get(target),
                                                    fh.read())
        return _cast_like(target, restored)


def _cast_like(template: Any, restored: Any) -> Any:
    """Cast every array leaf of ``restored`` to the dtype of the matching
    ``template`` leaf (shapes already validated by the deserializers)."""
    import numpy as np

    def cast(t, r):
        td = getattr(t, "dtype", None)
        if td is not None and hasattr(r, "dtype") and r.dtype != td:
            return np.asarray(r).astype(td)
        return r

    return jax.tree.map(cast, template, restored)
