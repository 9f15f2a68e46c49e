"""Micro-probe: DecoderBlock dilated-branch stage restructure candidates.

The flagship train step is HBM-bound (BASELINE.md: ~800 GB/s, MXU 11%); the
DecoderBlock runs 2 stages x (4 dilated convs + 4 BatchNorms) as 16 separate
ops (models/transunet.py DecoderBlock; reference: Decoder.py:61-91).  This
probe times stage variants fwd+bwd at the three decoder block shapes to pick
the default:

  branch   — current: 4 convs (d=1 as 1x1, 3x3 d=2/4/8) + 4 BNs + concat
  onebn    — 4 convs + concat + ONE BatchNorm over C (exact: BN is
             per-channel, so concat-then-BN == BN-then-concat)
  fused2   — TWO convs: [3x3 dil2] carrying the 1x1 branch in its center tap
             (C/2 out) and [5x5 dil4] carrying the d=4 and d=8 branches
             (C/2 out), + one BN.  1.5x tap FLOPs, half the input reads,
             2x wider output lanes.
  dense81  — ONE [9x9 dil2] conv carrying all four branches (2.9x tap
             FLOPs, single input read, full-C output).

Run on the TPU: python benchmarks/decoder_fuse_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultrasound_modeling_tpu.models.common import Norm, activation, conv

# (H, W, C_in, C_out) for decoder blocks 0/1/2 of the flagship at batch 64
# (head 256 -> up 256 + skip 256 cat -> 512; later blocks with hidden
# re-concat channels folded in approximately)
SHAPES = [
    ("block0_s1", 32, 10, 512, 256),
    ("block0_s2", 32, 10, 256, 256),
    ("block1_s1", 64, 20, 288, 128),
    ("block1_s2", 64, 20, 128, 128),
    ("block2_s1", 128, 40, 144, 64),
    ("block2_s2", 128, 40, 64, 64),
]
BATCH = 64


class StageBranch(nn.Module):
    c_out: int
    one_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        leaky = activation("leaky")
        branches = []
        for b, (ksz, dil) in enumerate(((1, 1), (3, 2), (3, 4), (3, 8))):
            y = conv(self.c_out // 4, ksz, dilation=dil, name=f"conv_{b}")(x)
            if not self.one_bn:
                y = Norm("batch", name=f"bn_{b}")(y, train)
            branches.append(y)
        y = jnp.concatenate(branches, axis=-1)
        if self.one_bn:
            y = Norm("batch", name="bn")(y, train)
        return leaky(y)


class StageFused2(nn.Module):
    c_out: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        leaky = activation("leaky")
        # 3x3 dil-2 carries branches d1 (center) + d2; 5x5 dil-4 carries
        # d4 (inner 3x3) + d8 (ring at +-2 grid steps)
        a = conv(self.c_out // 2, 3, dilation=2, name="conv_a")(x)
        b = conv(self.c_out // 2, 5, dilation=4, name="conv_b")(x)
        y = jnp.concatenate([a, b], axis=-1)
        y = Norm("batch", name="bn")(y, train)
        return leaky(y)


class StageDense81(nn.Module):
    c_out: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        leaky = activation("leaky")
        y = conv(self.c_out, 9, dilation=2, name="conv")(x)
        y = Norm("batch", name="bn")(y, train)
        return leaky(y)


def bench(module, x, n_iter=30):
    params = module.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(v, xx):
        def loss(p):
            out, _ = module.apply(
                {"params": p, **{k: v[k] for k in v if k != "params"}},
                xx, mutable=["batch_stats"])
            return jnp.sum(out * out)
        g = jax.grad(loss)(v["params"])
        return jax.tree.leaves(g)[0].sum()

    # warmup + compile
    float(step(params, x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(n_iter):
            acc = step(params, x)
        float(acc)
        dt = (time.perf_counter() - t0) / n_iter
        best = min(best, dt)
    return best * 1e3


def main():
    jnp_dtype = jnp.bfloat16
    results = {}
    for name, h, w, cin, cout in SHAPES:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(BATCH, h, w, cin)),
            jnp_dtype)
        row = {}
        for vname, mod in [
                ("branch", StageBranch(cout)),
                ("onebn", StageBranch(cout, one_bn=True)),
                ("fused2", StageFused2(cout)),
                ("dense81", StageDense81(cout))]:
            row[vname] = bench(mod, x)
        results[name] = row
        print(name, {k: f"{v:.3f}ms" for k, v in row.items()}, flush=True)
    tot = {v: sum(r[v] for r in results.values())
           for v in ("branch", "onebn", "fused2", "dense81")}
    print("TOTALS", {k: f"{v:.3f}ms" for k, v in tot.items()})


if __name__ == "__main__":
    main()
