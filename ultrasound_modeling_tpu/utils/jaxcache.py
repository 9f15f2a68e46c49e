"""Persistent XLA compilation cache.

Remote-device compiles dominate iteration time on single-host dev boxes
(30s-minutes per program over the axon tunnel); caching compiled executables
on disk makes second processes start in seconds.  Importing this module (or
calling ``enable()``) turns the cache on unless the user already configured
one.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"))


def enable(cache_dir: str = _DEFAULT_DIR) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


try:
    enable()
except Exception:  # pragma: no cover - cache is best-effort
    pass
