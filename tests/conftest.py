"""Test configuration: force CPU with a virtual 8-device mesh.

This is the JAX-world fake backend for testing v5e-8-style sharding without
TPU hardware (SURVEY.md §4): every test sees 8 XLA host devices.
"""

import os

# Force-override: the dev environment exports JAX_PLATFORMS=axon (remote TPU
# tunnel); tests must run on local CPU with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA compile cache: model-graph compiles dominate test wall-time
# on this single-core box; warm runs skip them entirely.
from ultrasound_modeling_tpu.utils import jaxcache  # noqa: E402,F401


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
