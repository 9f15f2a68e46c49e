"""Padding-adjusted speed-of-light model (roofline closing-the-books tool).

The naive SOL used by benchmarks/roofline.py — max(flops/MXU_peak,
bytes/HBM_peak) — assumes every FLOP can be executed at the MXU's dense
bf16 rate and every byte streamed at HBM peak.  At the reference
architecture's shapes that is unreachable *in principle*:

* the 128x128 systolic MXU pads the output-feature axis to 128 lanes and
  the contraction axis to 128 — a 3x3x10->16 stem conv occupies the full
  array but does 16/128 of the useful columns and 90/128 of the rows;
* f32 LayerNorm / softmax / exact-GELU sweeps run on the (8,128) VPU at a
  rate orders of magnitude below the MXU, and transcendentals
  (exp/erf/rsqrt) cost multiple VPU passes each.

This module walks a function's jaxpr (recursing through pjit / scan /
custom-vjp / pallas_call) and tallies

  padded_matmul_flops  every dot_general / conv_general_dilated counted at
                       the shape the MXU actually executes: contraction
                       and output-feature dims rounded up to 128, the
                       sublane (rows) dim rounded up to 8,
  vpu_ops              every elementwise / reduce primitive counted per
                       output (or input, for reduces) element, with
                       transcendentals weighted TRANSCENDENTAL_COST x,

from which an adjusted SOL is

  adj_sol_s = max(bytes / HBM_peak,
                  padded_matmul_flops / MXU_peak,
                  vpu_ops / VPU_peak)

MODELING ASSUMPTIONS (all env-overridable, all stated so the numbers can
be checked): v5e bf16 MXU peak 197 TFLOP/s; HBM 819 GB/s; VPU peak 7e12
f32 lane-ops/s (8 sublanes x 128 lanes x 4 ALUs x ~1.7 GHz); one
transcendental = 8 lane-ops.  scan bodies are multiplied by trip count;
pallas_call bodies by the grid size.  The model intentionally IGNORES
fusion (it bounds compute/bytes, not scheduling) and pallas_call HBM
traffic is approximated by its operand/result bytes at the call site.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

MXU_PEAK = float(os.environ.get("PEAK_TFLOPS", 197.0)) * 1e12
HBM_PEAK = float(os.environ.get("PEAK_HBM_GBS", 819.0)) * 1e9
VPU_PEAK = float(os.environ.get("PEAK_VPU_OPS", 7.0e12))
TRANSCENDENTAL_COST = float(os.environ.get("TRANSCENDENTAL_COST", 8.0))

# transcendental / expensive VPU primitives (multi-pass on the VPU)
_TRANS = {
    "exp", "log", "log1p", "expm1", "tanh", "sin", "cos", "logistic",
    "erf", "erfc", "erf_inv", "rsqrt", "sqrt", "pow", "cbrt", "div",
    "atan2", "lgamma", "digamma",
}
# primitives that do no arithmetic (layout/metadata only)
_FREE = {
    "reshape", "squeeze", "expand_dims", "transpose", "broadcast_in_dim",
    "convert_element_type", "bitcast_convert_type", "slice", "rev",
    "dynamic_slice", "dynamic_update_slice", "concatenate", "pad",
    "gather", "scatter", "iota", "copy", "stop_gradient", "device_put",
    "constant", "empty",
}


def _ceil(x: int, m: int) -> int:
    return int(-(-x // m) * m)


def _nelem(aval) -> int:
    try:
        return int(np.prod(aval.shape)) if aval.shape else 1
    except Exception:
        return 0


def _dot_padded_flops(eqn) -> float:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    k = int(np.prod([lhs.shape[d] for d in lc])) if lc else 1
    bd = int(np.prod([lhs.shape[d] for d in lb])) if lb else 1
    m = int(np.prod([lhs.shape[d] for d in range(len(lhs.shape))
                     if d not in lc and d not in lb]) or 1)
    n = int(np.prod([rhs.shape[d] for d in range(len(rhs.shape))
                     if d not in rc and d not in rb]) or 1)
    return 2.0 * bd * _ceil(m, 8) * _ceil(k, 128) * _ceil(n, 128)


def _conv_padded_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    g = int(eqn.params.get("feature_group_count", 1))
    bgc = int(eqn.params.get("batch_group_count", 1))
    # kernel: spatial dims x (cin/g) x cout  (positions from dn.rhs_spec)
    rhs_spec = dn.rhs_spec  # (out_c, in_c, *spatial)
    cout = rhs.shape[rhs_spec[0]]
    cin_per_g = rhs.shape[rhs_spec[1]]
    ksp = int(np.prod([rhs.shape[d] for d in rhs_spec[2:]]) or 1)
    out_spec = dn.out_spec  # (batch, out_c, *spatial)
    bsz = out.shape[out_spec[0]]
    osp = int(np.prod([out.shape[d] for d in out_spec[2:]]) or 1)
    m = bsz * osp                      # rows: every output pixel
    k = ksp * cin_per_g                # contraction per group
    n = cout // g                      # output features per group
    return 2.0 * g * bgc * _ceil(m, 8) * _ceil(k, 128) * _ceil(n, 128)


def _aval_bytes(aval) -> float:
    try:
        return float(np.prod(aval.shape) * aval.dtype.itemsize
                     ) if aval.shape else float(aval.dtype.itemsize)
    except Exception:
        return 0.0


def _eqn_bytes(eqn) -> float:
    """Per-op naive bytes (operands + outputs), the same convention XLA's
    cost_analysis 'bytes accessed' uses — but tallied through scan bodies
    x trip count, which cost_analysis does NOT do (measured: an 8-step
    scanned matmul reports the flops/bytes of ONE step)."""
    tot = 0.0
    for v in eqn.invars:
        if hasattr(v, "aval"):
            tot += _aval_bytes(v.aval)
    for v in eqn.outvars:
        tot += _aval_bytes(v.aval)
    return tot


def _walk(jaxpr, mult: float, acc: Dict[str, float]) -> None:
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            acc["padded_matmul_flops"] += mult * _dot_padded_flops(eqn)
            acc["raw_matmul_flops"] += mult * 2.0 * _raw_dot_flops(eqn)
            acc["bytes_naive"] += mult * _eqn_bytes(eqn)
        elif prim == "conv_general_dilated":
            acc["padded_matmul_flops"] += mult * _conv_padded_flops(eqn)
            acc["raw_matmul_flops"] += mult * _raw_conv_flops(eqn)
            acc["bytes_naive"] += mult * _eqn_bytes(eqn)
        elif prim in ("scan",):
            trip = float(eqn.params.get("length", 1))
            _walk(eqn.params["jaxpr"].jaxpr, mult * trip, acc)
        elif prim in ("while",):
            # trip count unknowable statically; count one iteration
            _walk(eqn.params["body_jaxpr"].jaxpr, mult, acc)
        elif prim in ("cond",):
            branches = eqn.params.get("branches", ())
            if branches:  # worst case branch
                sub = [dict.fromkeys(acc, 0.0) for _ in branches]
                for s, br in zip(sub, branches):
                    _walk(br.jaxpr, mult, s)
                worst = max(sub, key=lambda s: s["padded_matmul_flops"]
                            + s["vpu_ops"])
                for kk in acc:
                    acc[kk] += worst[kk]
        elif prim == "pallas_call":
            grid = eqn.params.get("grid_mapping", None)
            steps = 1.0
            if grid is not None and getattr(grid, "grid", None):
                steps = float(np.prod([int(gg) for gg in grid.grid]))
            inner = eqn.params.get("jaxpr", None)
            if inner is not None:
                # Inner refs live in VMEM: count compute x grid steps but
                # NOT their bytes (that would bill VMEM traffic as HBM);
                # HBM traffic for the call is its operands + results once.
                sub = dict.fromkeys(acc, 0.0)
                _walk(getattr(inner, "jaxpr", inner), mult * steps, sub)
                for kk in acc:
                    if kk != "bytes_naive":
                        acc[kk] += sub[kk]
            acc["bytes_naive"] += mult * _eqn_bytes(eqn)
        elif prim in ("jit", "pjit", "closed_call", "core_call", "remat",
                      "remat2", "checkpoint", "custom_jvp_call",
                      "custom_vjp_call", "custom_jvp_call_jaxpr",
                      "custom_vjp_call_jaxpr"):
            inner = (eqn.params.get("jaxpr")
                     or eqn.params.get("call_jaxpr")
                     or eqn.params.get("fun_jaxpr"))
            if inner is not None:
                _walk(getattr(inner, "jaxpr", inner), mult, acc)
        elif prim in _FREE:
            continue
        elif prim.startswith("reduce_") or prim in ("reduce_sum",
                                                    "reduce_max",
                                                    "reduce_min",
                                                    "argmax", "argmin"):
            acc["vpu_ops"] += mult * sum(_nelem(v.aval)
                                         for v in eqn.invars
                                         if hasattr(v, "aval"))
            acc["bytes_naive"] += mult * _eqn_bytes(eqn)
        elif prim in _TRANS:
            acc["vpu_ops"] += (mult * TRANSCENDENTAL_COST
                               * _nelem(eqn.outvars[0].aval))
            acc["bytes_naive"] += mult * _eqn_bytes(eqn)
        else:
            # generic elementwise (add/mul/sub/max/select/compare/...)
            acc["vpu_ops"] += mult * _nelem(eqn.outvars[0].aval)
            acc["bytes_naive"] += mult * _eqn_bytes(eqn)


def _raw_dot_flops(eqn) -> float:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    k = int(np.prod([lhs.shape[d] for d in lc])) if lc else 1
    out_elems = _nelem(eqn.outvars[0].aval)
    return float(out_elems) * k


def _raw_conv_flops(eqn) -> float:
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    g = int(eqn.params.get("feature_group_count", 1))
    rhs_spec = dn.rhs_spec
    cin_per_g = rhs.shape[rhs_spec[1]]
    ksp = int(np.prod([rhs.shape[d] for d in rhs_spec[2:]]) or 1)
    out_elems = _nelem(eqn.outvars[0].aval)
    return 2.0 * out_elems * ksp * cin_per_g / max(g, 1) * g


def padded_cost(fn, *args) -> Dict[str, Any]:
    """Trace ``fn(*args)`` and return the padded-cost tallies + the
    adjusted-SOL seconds for the three hardware limits."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)
    acc = {"padded_matmul_flops": 0.0, "raw_matmul_flops": 0.0,
           "vpu_ops": 0.0, "bytes_naive": 0.0}
    _walk(jaxpr.jaxpr, 1.0, acc)
    return acc


def adjusted_sol_ms(bytes_accessed: float, acc: Dict[str, float]) -> dict:
    """Adjusted SOL from the walker tallies.

    The bytes term uses the CALLER's number (XLA cost_analysis — a
    post-fusion traffic estimate; note it counts scan bodies once).  The
    walker's own ``bytes_naive`` is a PRE-fusion per-op tally: a
    scan-correct *upper* bound on traffic, reported for reference but
    never used as the binding SOL term (fusion legitimately eliminates
    most of it)."""
    t_by = bytes_accessed / HBM_PEAK
    t_mxu = acc["padded_matmul_flops"] / MXU_PEAK
    t_vpu = acc["vpu_ops"] / VPU_PEAK
    bound = max((t_by, "bytes"), (t_mxu, "mxu_padded"), (t_vpu, "vpu"))
    return {
        "adj_sol_ms": round(max(t_by, t_mxu, t_vpu) * 1e3, 3),
        "adj_bound": bound[1],
        "padded_gflops": round(acc["padded_matmul_flops"] / 1e9, 1),
        "raw_gflops_walker": round(acc["raw_matmul_flops"] / 1e9, 1),
        "gbytes_walker_upper": round(acc.get("bytes_naive", 0.0) / 1e9, 3),
        "vpu_gops": round(acc["vpu_ops"] / 1e9, 1),
    }
