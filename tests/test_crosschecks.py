"""Reference weight-port crosschecks as gated tests.

Each benchmarks/*_reference_crosscheck.py harness builds the corresponding
model from /root/reference (TensorFlow, CPU), ports its weights into the
Flax tree, and asserts forward agreement within the model's own
f32-conditioning bound.  They need TensorFlow + several minutes each, so
they are gated behind RUN_CROSSCHECKS=1 (results recorded in
benchmarks/results.json and PARITY.md).

Run:  RUN_CROSSCHECKS=1 python -m pytest tests/test_crosschecks.py -q
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_CROSSCHECKS"),
    reason="slow TF crosschecks; set RUN_CROSSCHECKS=1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HARNESSES = [
    ("transunet_reference_crosscheck.py", "tf_diff_within_3x_f32_conditioning"),
    ("transunet_grad_crosscheck.py", "no_structural_divergence"),
    ("vit_reference_crosscheck.py", "tf_diff_within_3x_f32_conditioning"),
    ("vit_grad_crosscheck.py", "no_structural_divergence"),
    ("swin_reference_crosscheck.py", "pooled_within_3x_f32_conditioning"),
    ("swin_grad_crosscheck.py", "no_structural_divergence"),
    ("mobileunet_reference_crosscheck.py", "within_3x_f32_conditioning"),
    ("mobileunet_grad_crosscheck.py", "no_structural_divergence"),
    ("resnest_unet_reference_crosscheck.py", "within_3x_f32_conditioning"),
    ("resnest_unet_grad_crosscheck.py", "no_structural_divergence"),
]


@pytest.mark.parametrize("script,flag", HARNESSES,
                         ids=[h[0].split("_reference")[0] for h in HARNESSES])
def test_crosscheck(script, flag):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # harnesses force CPU via jax.config
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", script)],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["missing"] == [], result
    assert result[flag], result
