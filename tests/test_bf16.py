"""bfloat16 compute path: forward stays finite, close to f32, params f32."""

import jax
import jax.numpy as jnp
import numpy as np

from ultrasound_modeling_tpu.models import common
from ultrasound_modeling_tpu.models.resnest import ResNeStUNet


def _forward(x):
    model = ResNeStUNet(num_classes=3, radix=2, kpaths=2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    dtypes = {str(l.dtype) for l in jax.tree.leaves(variables["params"])}
    return model.apply(variables, x, False), dtypes


def test_bf16_forward_close_to_f32(rng):
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 6)) * 0.5, jnp.float32)
    common.set_compute_dtype(None)
    probs32, dt32 = _forward(x)
    try:
        common.set_compute_dtype("bfloat16")
        probs16, dt16 = _forward(x)
    finally:
        common.set_compute_dtype(None)
    # Params stay float32 in both modes.
    assert dt32 == {"float32"} and dt16 == {"float32"}
    assert np.isfinite(np.asarray(probs16)).all()
    # Distributions agree to bf16 tolerance.
    assert np.mean(np.abs(np.asarray(probs16) - np.asarray(probs32))) < 0.05
