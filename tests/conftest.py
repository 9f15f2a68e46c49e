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


# ---------------------------------------------------------------------------
# Test tiers: `pytest -m fast` is the <120 s CI gate on this 1-core box;
# `pytest` (no marker) stays the full-depth suite.  Modules are marked here
# centrally so individual files don't need decoration; the slow set is the
# model-graph-compile-heavy tier (measured, see tests/README timings in
# BASELINE.md round 2).
SLOW_MODULES = {
    "test_parallel",        # 8-device mesh model steps
    "test_models",          # full model families fwd/bwd
    "test_models_extra",
    "test_train_smoke",     # end-to-end trainer epochs
    "test_attention_impls",
    "test_pallas",          # pallas kernels interpret mode
    "test_bf16",
    "test_infer_cli",       # full transunet restore + render
    "test_swin_convert",    # imports tensorflow
    "test_crosschecks",     # TF reference builds (gated on RUN_CROSSCHECKS)
    "test_journey",         # full .mat -> etl -> train -> infer chain
    "test_parity_pins",     # 5 family init+forward vs committed goldens
    "test_distributed",     # real 2-process coordinator run (CPU compiles)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.module.__name__.rsplit(".", 1)[-1]
        marker = "slow" if name in SLOW_MODULES else "fast"
        item.add_marker(getattr(pytest.mark, marker))
