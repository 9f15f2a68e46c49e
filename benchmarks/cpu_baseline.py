"""Measure the CPU inference baseline that `bench.py` compares against.

The reference runs inference on CPU (CUDA explicitly disabled —
reference: TBIEvaluator.py:28) with a batch-1 forward per fork'd process
(reference: TBIEvaluator.py:198,235).  Round 1 estimated that baseline at
2 fps; this harness measures it:

1. this framework's flagship TransUNet, batch-1 forward, JAX CPU backend
   (the apples-to-apples own-stack CPU number), and
2. (when TensorFlow is importable) the reference's own TransUNet
   (VisionTransformer.py) built from /root/reference, batch-1 eager-free
   forward on CPU — the true reference path, minus the per-image process
   fork + model reload the reference also pays.

Writes one JSON line with both numbers; BENCH_CPU_FPS for bench.py should be
the measured reference fps (or the own-stack number when TF is absent).

Run:  JAX_PLATFORMS=cpu python benchmarks/cpu_baseline.py
(CPU-only so the TPU tunnel is not involved; takes a few minutes on this
1-core box.)
"""

import json
import os
import sys
import time

import numpy as np

# Runnable as `python benchmarks/cpu_baseline.py` (sys.path[0] is then
# benchmarks/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, n_warmup=2, n_iter=10):
    for _ in range(n_warmup):
        fn()
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def own_stack_cpu_fps():
    import jax

    # The dev box's axon sitecustomize force-sets jax_platforms="axon,cpu"
    # at register() time, OVERRIDING the JAX_PLATFORMS env var — so without
    # this explicit config update the "CPU" forward silently runs on the
    # remote TPU.  (tests/conftest.py does the same for the test tier.)
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models.registry import build_model

    cfg = default_config("transunet")
    model = build_model(cfg.model)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 256, 80, 10)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(p, xx):
        return model.apply(p, xx)

    def run():
        np.asarray(fwd(params, x))

    sec = time_fn(run)
    return 1.0 / sec, sec


def reference_tf_cpu_fps():
    """Build the reference's own TransUNet from /root/reference and time a
    batch-1 CPU forward.  Import-only use for measurement; nothing is
    copied."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    sys.path.insert(0, "/root/reference")
    try:
        import tensorflow as tf

        # Keras 3 compat: the reference's TF2-era `AveragePooling2D()`
        # (Decoder.py:26) relied on the then-default pool_size=(2, 2);
        # Keras 3 made the argument required.  Shim the default back in so
        # the reference builds unmodified.
        _AvgPool = tf.keras.layers.AveragePooling2D

        # NB: no leading underscore — the class name becomes a TF scope name.
        class AvgPoolCompat(_AvgPool):
            def __init__(self, pool_size=(2, 2), *a, **k):
                super().__init__(pool_size, *a, **k)

        tf.keras.layers.AveragePooling2D = AvgPoolCompat
        import VisionTransformer as ref_vt  # noqa: N813
    except Exception as exc:
        return None, None, f"import failed: {exc}"
    try:
        # Keras 3 cannot build the reference's functional `visionModel`
        # (keras.Input through non-layer ops is now rejected), so skip the
        # Model wrapper and time `forward` directly — which is also what the
        # reference's own inference path runs (TBIEvaluator.py:238 calls the
        # loaded model eagerly, layer by layer, per batch-1 frame).
        ref_vt.VisionTransformer.model = lambda self: None
        net = ref_vt.VisionTransformer(1, (256, 80), 3)
        x = tf.constant(np.random.default_rng(0).normal(
            size=(1, 256, 80, 10)), tf.float32)

        import contextlib
        import io

        def run_eager():
            with contextlib.redirect_stdout(io.StringIO()):
                net.forward(x)  # reference prints shapes every call

        sec_eager = time_fn(run_eager, n_warmup=2, n_iter=10)

        try:
            fwd = tf.function(lambda xx: net.forward(xx))
            with contextlib.redirect_stdout(io.StringIO()):
                fwd(x)  # trace

            def run_graph():
                fwd(x)

            sec_graph = time_fn(run_graph, n_warmup=2, n_iter=10)
        except Exception:
            sec_graph = None
        if sec_graph is None:
            return 1.0 / sec_eager, sec_eager, None, None, None
        return (1.0 / sec_eager, sec_eager, 1.0 / sec_graph, sec_graph, None)
    except Exception as exc:
        return None, None, None, None, f"build/run failed: {exc}"


def main():
    out = {}
    if "--skip-own" not in sys.argv:
        own_fps, own_sec = own_stack_cpu_fps()
        out = {"own_cpu_fps_b1": round(own_fps, 3),
               "own_cpu_ms_b1": round(own_sec * 1e3, 1)}
    if "--skip-tf" not in sys.argv:
        (eager_fps, eager_sec, graph_fps, graph_sec,
         err) = reference_tf_cpu_fps()
        if eager_fps is not None:
            out["reference_tf_eager_cpu_fps_b1"] = round(eager_fps, 3)
            out["reference_tf_eager_cpu_ms_b1"] = round(eager_sec * 1e3, 1)
            if graph_fps is not None:
                out["reference_tf_graph_cpu_fps_b1"] = round(graph_fps, 3)
                out["reference_tf_graph_cpu_ms_b1"] = round(graph_sec * 1e3, 1)
        else:
            out["reference_tf_error"] = err
    print(json.dumps(out))


if __name__ == "__main__":
    main()
