"""Reproduce the XLA cost_analysis scan under-count (one JSON line).

``lax.scan`` bodies are counted ONCE by ``compiled.cost_analysis()`` —
an 8-step scanned matmul chain reports ~1 matmul of flops, the unrolled
chain ~8.  Every cost_analysis-based SOL over a scanned program (the
transformer stack is an nn.scan of 8 layers) under-counts by the trip
count.  benchmarks/padded_sol.py's jaxpr walker multiplies scan bodies
by their length instead.

Run (any backend): python benchmarks/cost_analysis_scan_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from padded_sol import padded_cost

    w = jnp.ones((128, 128), jnp.float32)
    x = jnp.ones((16, 128), jnp.float32)

    def body(c, _):
        return c @ w, None

    f_scan = jax.jit(lambda c: jax.lax.scan(body, c, None, length=8)[0].sum())

    def unroll(c):
        for _ in range(8):
            c = c @ w
        return c.sum()

    f_un = jax.jit(unroll)

    def ca(f):
        a = f.lower(x).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        return float(a.get("flops", 0.0)), float(a.get("bytes accessed", 0.0))

    fs, bs = ca(f_scan)
    fu, bu = ca(f_un)
    out = {
        "one_matmul_flops": 2 * 16 * 128 * 128,
        "scan8_cost_analysis_flops": fs,
        "unroll8_cost_analysis_flops": fu,
        "scan8_bytes": bs,
        "unroll8_bytes": bu,
        "scan_undercount_factor": round(fu / fs, 2) if fs else None,
        "walker_scan8_raw_flops": padded_cost(f_scan, x)["raw_matmul_flops"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
