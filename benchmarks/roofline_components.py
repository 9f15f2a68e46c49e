"""Per-component speed-of-light accounting for the flagship serving forward
(VERDICT r2 weak #1: close the books on the batch-256 sol_frac 0.58).

Each component of the TransUNet inference graph is jitted in isolation at
its real serving shape; for each we record

  flops / bytes   from the compiled executable's own cost_analysis()
  sol_ms          max(flops/peak_flops, bytes/peak_bw)  (v5e peaks)
  measured_ms     steady-state scalar-pull timing
  sol_frac        sol_ms / measured_ms

and print one JSON row per component plus a closing "accounting" row that
compares sum-of-component SOLs and measured times against the full forward.
Isolated components lose their neighbours' fusion context, so component
measured times over-count fusible boundaries — the table is an upper bound
on each component's true share, which is the right direction for proving a
residual structural.

ROUND-3 CORRECTION — XLA cost_analysis counts a lax.scan body ONCE
(measured on this box: an 8-step scanned 128x128 matmul chain reports
flops=526,337 ~= one matmul, vs 4,196,351 for the same chain unrolled).
The transformer stack is an nn.scan of 8 layers, so every earlier
cost_analysis-based SOL for the stack — and for the full forward that
contains it — under-counted the stack's flops AND bytes by 8x.  Rows now
also carry scan-correct walker tallies from benchmarks/padded_sol.py:
``raw_gflops_walker`` / ``gbytes_walker`` (same naive per-op convention as
cost_analysis, scan-multiplied), ``padded_gflops`` (MXU 128-lane/128-
contraction padding — the FLOPs the array actually executes at these
shapes), ``vpu_gops``, and ``adj_sol_ms`` = max(bytes, padded-MXU, VPU)
— the shape-aware speed of light.

Run: python benchmarks/roofline_components.py [--batch 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401

PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", 197.0))   # v5e bf16
PEAK_HBM_GBS = float(os.environ.get("PEAK_HBM_GBS", 819.0))  # v5e


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _time(fn, *args, window=8, repeats=5):
    # scalar-pull sync: block_until_ready returns early on this tunnel
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
    from ultrasound_modeling_tpu.models.resnest import (ResNeStEncoder,
                                                        ResidualS)
    from ultrasound_modeling_tpu.models.transunet import (DecoderCup, Encoder,
                                                          TransUNet)

    common.set_compute_dtype("bfloat16")
    b = args.batch
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def _sum(tree):
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree_util.tree_leaves(tree))

    rows = []

    from padded_sol import adjusted_sol_ms, padded_cost

    def bench(name, fn_jit, fargs, note="", scan_trip=None):
        compiled = fn_jit.lower(*fargs).compile()
        flops, byts = _cost(compiled)
        if scan_trip:
            # cost_analysis counts the scan body ONCE (see module
            # docstring); the component is dominated by its scan, so
            # multiply both tallies by the trip count (approximate: the
            # non-scanned in/out epilogue is counted trip x too).
            flops *= scan_trip
            byts *= scan_trip
        t_fl = flops / (PEAK_TFLOPS * 1e12)
        t_by = byts / (PEAK_HBM_GBS * 1e9)
        sol = max(t_fl, t_by)
        ms = _time(fn_jit, *fargs)
        row = {
            "component": name,
            "gflops": round(flops / 1e9, 1),
            "gbytes": round(byts / 1e9, 3),
            "bound": "flops" if t_fl >= t_by else "bytes",
            "sol_ms": round(sol * 1e3, 3),
            "measured_ms": round(ms, 3),
            "sol_frac": round(sol * 1e3 / ms, 3) if ms else None,
        }
        # Padding-adjusted SOL (benchmarks/padded_sol.py): what the MXU's
        # 128-lane/128-contraction padding and the VPU's f32 sweep rate
        # make reachable IN PRINCIPLE at these shapes.
        try:
            acc = padded_cost(fn_jit, *fargs)
            row.update(adjusted_sol_ms(byts, acc))
            row["adj_frac"] = (round(row["adj_sol_ms"] / ms, 3)
                               if ms else None)
        except Exception as e:  # keep the base row if the walker trips
            row["adj_error"] = str(e)[:120]
        if note:
            row["note"] = note
        rows.append(row)
        print(json.dumps(row), flush=True)
        return row

    def bench_module(name, module, inputs, note=""):
        variables = jax.jit(module.init, static_argnums=(1 + len(inputs),))(
            key, *inputs, False)
        fn = jax.jit(lambda v, *a: _sum(module.apply(v, *a, False)))
        return bench(name, fn, (variables,) + tuple(inputs), note)

    def bench_module_kw(name, module, inputs, note="", scan_trip=None):
        variables = jax.jit(module.init, static_argnums=(1 + len(inputs),))(
            key, *inputs, False)
        fn = jax.jit(lambda v, *a: _sum(module.apply(v, *a, False)))
        return bench(name, fn, (variables,) + tuple(inputs), note,
                     scan_trip=scan_trip)

    x = jnp.asarray(rng.normal(size=(b, 256, 80, 10)), jnp.float32)

    # --- full forward -------------------------------------------------------
    # Resolving 'auto' here is belt-and-braces: models now resolve it at
    # their own gates (models/common.resolve_attn_impl) — the explicit
    # resolution documents the historical bug that contaminated the first
    # clean-pass full_forward row (unresolved 'auto' measured XLA while
    # claiming Pallas).
    from ultrasound_modeling_tpu.models.registry import _resolve_impl
    model = TransUNet(attn_impl=_resolve_impl("auto"))
    full = bench_module("full_forward", model, (x,))
    # comparison row: the composed-XLA stack path (what 'xla' serves)
    bench_module("full_forward_xla_stack", TransUNet(attn_impl="xla"), (x,),
                 note="composed scan path; contrast with full_forward "
                      "(fused Pallas stack) to price the stack kernel "
                      "end-to-end")

    # --- ingest proxy: f32 NHWC(10ch) -> bf16 padded-lane layout ------------
    ingest = jax.jit(lambda a: jnp.sum(a.astype(jnp.bfloat16)
                                       .astype(jnp.float32)))
    bench("ingest_cast", ingest, (x,),
          note="cast-only proxy; in-graph relayout to padded lanes is "
               "larger (device trace ~2 ms)")

    # --- encoder ------------------------------------------------------------
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

    bench_module("stem", Stem(), (x,))

    stage_shapes = [
        ("stage1", 64, (b, 128, 40, 32)),
        ("stage2", 128, (b, 64, 20, 64)),
        ("stage3", 256, (b, 32, 10, 128)),
        ("stage4", 512, (b, 16, 5, 256)),
    ]
    for name, ch, shp in stage_shapes:
        xs = jnp.asarray(rng.normal(size=shp), jnp.float32)
        bench_module(name, ResidualS(ch, 3, 3, 3, norm="layer", act="leaky"),
                     (xs,))

    # --- the eval flat-norm stats alone, at the REAL branch shapes ---------
    # stage1 (ch 64, 128x40): branch1 F=27 (9 groups of 3), branch2 F=90
    # (9 of 10); stage2 (ch 128, 64x20): F=63 (9 of 7) and F=189 (9 of 21).
    def _stats_fn(f, c):
        msel = jnp.kron(jnp.eye(f // c, dtype=jnp.float32),
                        jnp.ones((c, c), jnp.float32)).astype(jnp.bfloat16)

        def _stats(y):
            mu = jnp.einsum("bhwf,fg->bhwg", y, msel,
                            preferred_element_type=jnp.float32) / c
            zc = y.astype(jnp.float32) - mu
            zq = (zc * zc).astype(jnp.bfloat16)
            var = jnp.einsum("bhwf,fg->bhwg", zq, msel,
                             preferred_element_type=jnp.float32) / c
            return jnp.sum(zc * jax.lax.rsqrt(var + 1e-3))

        return jax.jit(_stats)

    for tag, (hh, ww), f, c in (("s1_branch1", (128, 40), 27, 3),
                                ("s1_branch2", (128, 40), 90, 10),
                                ("s2_branch1", (64, 20), 63, 7),
                                ("s2_branch2", (64, 20), 189, 21)):
        yb = jnp.asarray(rng.normal(size=(b, hh, ww, f)), jnp.bfloat16)
        bench(f"flat_norm_stats_{tag}", _stats_fn(f, c), (yb,),
              note="stats+normalize of the eval LayerNorm at this branch "
                   "shape (diagnostic; lives inside the stage rows)")

    # --- transformer stack + decoder ---------------------------------------
    seq = jnp.asarray(rng.normal(size=(b, 80, 512)), jnp.float32)
    # XLA path: nn.scan of 8 layers -> cost_analysis counts the body once;
    # scan_trip corrects it.
    bench_module_kw("transformer_stack_8L_xla", Encoder(512, 4, 8, 2048, 0.0),
                    (seq,), scan_trip=8)
    # Fused Pallas path (the serving default inside the auto full forward):
    # cost_analysis sees an opaque custom call, so the walker tallies carry
    # the real compute.
    enc_p = Encoder(512, 4, 8, 2048, 0.0, attn_impl="pallas")
    bench_module_kw("transformer_stack_8L", enc_p, (seq,))

    encoded = jnp.asarray(rng.normal(size=(b, 80, 512)), jnp.float32)
    skips_c = [
        jnp.asarray(rng.normal(size=(b, 32, 10, 256)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 64, 20, 128)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 128, 40, 64)), jnp.float32),
    ]
    dec = DecoderCup(3)
    variables = jax.jit(dec.init, static_argnums=(3,))(
        key, encoded, skips_c, False)
    fn = jax.jit(lambda v, h, fts: _sum(dec.apply(v, h, fts, False)))
    bench("decoder_cup", fn, (variables, encoded, skips_c),
          note="incl. softmax head; dilated-branch 16-out-ch lane padding "
               "is structural (BASELINE.md decoder analysis)")

    # --- accounting ---------------------------------------------------------
    comp = [r for r in rows
            if r["component"] not in ("full_forward", "ingest_cast",
                                      "full_forward_xla_stack",
                                      "transformer_stack_8L_xla")
            and not r["component"].startswith("flat_norm_stats")]
    acct = {
        "component": "ACCOUNTING",
        "full_measured_ms": full["measured_ms"],
        "full_sol_ms": full["sol_ms"],
        "full_sol_frac": full["sol_frac"],
        "full_adj_sol_ms": full.get("adj_sol_ms"),
        "full_adj_frac": full.get("adj_frac"),
        "sum_component_measured_ms": round(
            sum(r["measured_ms"] for r in comp), 3),
        "sum_component_sol_ms": round(sum(r["sol_ms"] for r in comp), 3),
        "sum_component_adj_sol_ms": round(
            sum(r.get("adj_sol_ms") or 0.0 for r in comp), 3),
        "components": [r["component"] for r in comp],
        "note": "components = stem+stages+stack+decoder (pipeline "
                "partition); ingest/flat-norm rows are diagnostic views "
                "inside those, not additive.  sol_ms uses XLA "
                "cost_analysis, which counts scan bodies ONCE (8x "
                "under-count on the stack and the full forward); "
                "adj_sol_ms uses the scan-correct walker with MXU-padded "
                "flops and a VPU term (padded_sol.py).",
    }
    rows.append(acct)
    print(json.dumps(acct), flush=True)


if __name__ == "__main__":
    main()
