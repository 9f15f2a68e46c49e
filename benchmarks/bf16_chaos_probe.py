"""Attribute the stack-sweep's rel_err_vs_xla (~0.27 at b256) to bf16
round-off amplification through 8 random-init transformer layers, NOT to a
kernel defect: measure XLA-vs-XLA (bf16 compute vs f32 compute, same params,
same composed path — no Pallas anywhere) at 1/2/4/8 layers.  If the pure-XLA
bf16 divergence at L=8 matches the sweep's kernel-vs-XLA number, the sweep
metric is the input regime (raw N(0,1) q/k -> chaotic attention), which is
why tests/test_pallas.py pins kernels in the damped 'smooth regime' instead.

Run: python benchmarks/bf16_chaos_probe.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.transunet import Encoder

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    seq = jnp.asarray(rng.normal(size=(256, 80, 512)), jnp.float32)

    for L in (1, 2, 4, 8):
        common.set_compute_dtype(None)
        e32 = Encoder(512, 4, L, 2048, 0.0, attn_impl="xla")
        v = jax.jit(e32.init, static_argnums=(2,))(key, seq, False)
        r32 = np.asarray(jax.jit(
            lambda vv, s: e32.apply(vv, s, False))(v, seq), np.float32)
        common.set_compute_dtype("bfloat16")
        e16 = Encoder(512, 4, L, 2048, 0.0, attn_impl="xla")
        o16 = np.asarray(jax.jit(
            lambda vv, s: e16.apply(vv, s, False))(v, seq), np.float32)
        common.set_compute_dtype(None)
        rel = float(np.abs(o16 - r32).max()) / float(np.abs(r32).max())
        print(json.dumps({"layers": L, "xla_bf16_vs_xla_f32_rel": round(rel, 6)}),
              flush=True)


if __name__ == "__main__":
    main()
