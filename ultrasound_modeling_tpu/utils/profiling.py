"""Profiling and numerics-debugging hooks.

The reference has no profiler (SURVEY.md §5.1 — only epoch wall-clock prints,
reference: TBIPixelCNN.py:311,357-358) and its only sanitizer is a NaN check
on the input pipeline (reference: TBIPixelCNN.py:24-25).  Here:

* ``trace(log_dir)`` — context manager around ``jax.profiler`` producing
  TensorBoard-viewable device traces.
* ``step_timer`` — host-side p50/p90 step-latency accumulator (the
  BASELINE.md metric).
* ``check_numerics(tree, name)`` — NaN/Inf guard over a pytree, enabled by
  the ``UM_TPU_DEBUG_NANS`` env var or ``enable_nan_checks()`` (the
  jax-native big hammer ``jax_debug_nans`` is also exposed).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, List

import jax
import jax.numpy as jnp
import numpy as np

_NAN_CHECKS = bool(os.environ.get("UM_TPU_DEBUG_NANS"))


def enable_nan_checks(jax_level: bool = False) -> None:
    """Turn on pytree NaN guards; optionally also jax's global debug_nans."""
    global _NAN_CHECKS
    _NAN_CHECKS = True
    if jax_level:
        jax.config.update("jax_debug_nans", True)


def check_numerics(tree, name: str = "tree") -> None:
    """Host-side NaN/Inf check over a pytree (no-op unless enabled)."""
    if not _NAN_CHECKS:
        return
    for i, leaf in enumerate(jax.tree.leaves(tree)):
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name} (leaf {i}, shape {arr.shape})")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Device trace around a block: view in TensorBoard's profile tab."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Collects per-step host latencies; reports p50/p90/p99 and frames/sec."""

    def __init__(self, batch_size: int = 1):
        self.batch_size = batch_size
        self.samples: List[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = np.asarray(self.samples)
        return {
            "p50_ms": float(np.percentile(s, 50) * 1e3),
            "p90_ms": float(np.percentile(s, 90) * 1e3),
            "p99_ms": float(np.percentile(s, 99) * 1e3),
            "frames_per_sec": float(self.batch_size / np.percentile(s, 50)),
        }
