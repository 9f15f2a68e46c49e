"""Ablation profile of the flagship inference forward: encoder stem/stages,
transformer stack, and decoder timed as separately-jitted programs at the
serving batch, to localize where the batch-256 forward's time goes
(benchmarks/roofline.py: measured 42.5 ms vs a 24.7 ms HBM byte floor,
sol_frac 0.58 — so ~1.7x sits somewhere in the graph).

Component programs don't see each other's fusion context, so the sum can
exceed the full forward; the value is the RATIO between components.

Run:  python benchmarks/infer_profile.py [--batch 256]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, *args, window=8, repeats=5):
    """fn must return a SCALAR: on this box's remote-device tunnel,
    ``jax.block_until_ready`` returns without waiting (measured: 0.6 ms for a
    46 ms program), so the only reliable sync is pulling a scalar to host."""
    float(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(window - 1):
            fn(*args)
        float(fn(*args))
        best = min(best, (time.perf_counter() - t0) / window)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.resnest import ResNeStEncoder, ResidualS
    from ultrasound_modeling_tpu.models.transunet import DecoderCup, Encoder, TransUNet

    common.set_compute_dtype("bfloat16")
    b = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, 256, 80, 10)), jnp.float32)
    key = jax.random.PRNGKey(0)

    def _sum(tree):
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree_util.tree_leaves(tree))

    def bench(name, module, *inputs):
        variables = jax.jit(module.init, static_argnums=(1 + len(inputs),))(
            key, *inputs, False)
        fn = jax.jit(lambda v, *a: _sum(module.apply(v, *a, False)))
        ms = _time(fn, variables, *inputs)
        print(f"{name:28s} {ms:8.3f} ms", flush=True)

    # full model
    model = TransUNet(attn_impl="auto")
    bench("full forward", model, x)

    # encoder (stem + 4 split-attention stages)
    enc = ResNeStEncoder()
    bench("resnest encoder", enc, x)

    # individual stages at their real shapes
    stage_shapes = [
        ("stage1 (64ch, 128x40)", 64, (b, 128, 40, 32)),
        ("stage2 (128ch, 64x20)", 128, (b, 64, 20, 64)),
        ("stage3 (256ch, 32x10)", 256, (b, 32, 10, 128)),
        ("stage4 (512ch, 16x5)", 512, (b, 16, 5, 256)),
    ]
    for name, ch, shp in stage_shapes:
        xs = jnp.asarray(rng.normal(size=shp), jnp.float32)
        bench(name, ResidualS(ch, 3, 3, 3, norm="layer", act="leaky"), xs)

    # transformer stack on the bottleneck sequence
    seq = jnp.asarray(rng.normal(size=(b, 80, 512)), jnp.float32)
    bench("transformer stack (8L)", Encoder(512, 4, 8, 2048, 0.0), seq)

    # decoder over encoded + skips (skips synthesized at the real shapes:
    # x3 1/8, x2 1/4, x1 1/2 resolution)
    encoded = jnp.asarray(rng.normal(size=(b, 80, 512)), jnp.float32)
    skips_c = [
        jnp.asarray(rng.normal(size=(b, 32, 10, 256)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 64, 20, 128)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 128, 40, 64)), jnp.float32),
    ]
    dec = DecoderCup(3)
    variables = jax.jit(dec.init, static_argnums=(3,))(
        key, encoded, skips_c, False)
    fn = jax.jit(lambda v, h, f: _sum(dec.apply(v, h, f, False)))
    ms = _time(fn, variables, encoded, skips_c)
    print(f"{'decoder cup':28s} {ms:8.3f} ms", flush=True)

    # decoder blocks at their real shapes (in-ch = up-in, out ch, skip ch)
    from ultrasound_modeling_tpu.models.transunet import DecoderBlock
    dec_shapes = [
        ("dec block0 (256ch -> 32x10)", 256, (b, 16, 5, 256), (b, 32, 10, 256)),
        ("dec block1 (128ch -> 64x20)", 128, (b, 32, 10, 256 + 512), (b, 64, 20, 128)),
        ("dec block2 (64ch -> 128x40)", 64, (b, 64, 20, 128 + 512), (b, 128, 40, 64)),
    ]
    for name, ch, xin_shape, skip_shape in dec_shapes:
        xin = jnp.asarray(rng.normal(size=xin_shape), jnp.float32)
        skip = jnp.asarray(rng.normal(size=skip_shape), jnp.float32)
        blk = DecoderBlock(ch)
        variables = jax.jit(blk.init, static_argnums=(3,))(
            key, xin, skip, False)
        fn = jax.jit(lambda v, a, s: _sum(blk.apply(v, a, s, False)))
        ms = _time(fn, variables, xin, skip)
        print(f"{name:28s} {ms:8.3f} ms", flush=True)


    # stem alone (initial convs at full 256x80 resolution)
    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            from ultrasound_modeling_tpu.models.common import (
                Norm, activation, avg_pool2, conv)
            leaky = activation("leaky")
            x = conv(16, 3, name="initial_conv")(x)
            x = leaky(x)
            x = conv(32, 3, name="convtmp_1")(x)
            x = Norm("batch", name="convtmp_1bn")(x, train)
            x = leaky(x)
            x = conv(32, 3, name="convtmp_2")(x)
            x = Norm("batch", name="convtmp_2bn")(x, train)
            x = leaky(x)
            return avg_pool2(x)

    bench("stem (3 convs @256x80)", Stem(), x)


if __name__ == "__main__":
    main()
