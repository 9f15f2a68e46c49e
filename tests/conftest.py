"""Test configuration: force CPU with a virtual 8-device mesh.

This is the JAX-world fake backend for testing v5e-8-style sharding without
TPU hardware (SURVEY.md §4): every test sees 8 XLA host devices.

Note: the dev environment's sitecustomize registers a remote-TPU ("axon")
backend at interpreter start and exports JAX_PLATFORMS=axon, so mutating
os.environ here is too late — the platform must be overridden through
``jax.config`` before any backend is initialized.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA compile cache: model-graph compiles dominate test wall-time
# on this single-core box; warm runs skip them entirely.
from ultrasound_modeling_tpu.utils import jaxcache  # noqa: E402,F401


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
