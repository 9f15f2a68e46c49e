"""Benchmark harness.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric: TransUNet (flagship) batched inference frames/sec/chip on the
local accelerator, with p50 ms/frame and the MEASURED reference-CPU
denominator for the ``vs_baseline`` ratio.  The reference's inference runs
single-image, model-reloaded-per-process, on CPU (reference:
TBIEvaluator.py:28,198,235) — BASELINE.md sets the >10x frames/sec/chip
target against that path.  The model is built through the production
registry (same resolved attention kernel as ``cli infer``).

Per-model-family tables live in benchmarks/bench_all.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401  (XLA disk cache)


def _bench_forward(model, x, n_warmup=3, n_iter=20):
    import jax
    import jax.numpy as jnp

    # jitted init: one dispatch instead of one roundtrip per op (critical
    # over the axon remote-device tunnel).
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, False)

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x, False)

    # Force a real round-trip: under the axon tunnel block_until_ready alone
    # can return before device execution completes, so reduce on device and
    # pull the scalar to host inside the timed region.
    @jax.jit
    def fwd_sum(variables, x):
        return jnp.sum(fwd(variables, x))

    float(fwd_sum(variables, x))
    for _ in range(n_warmup):
        float(fwd_sum(variables, x))
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        float(fwd_sum(variables, x))
        times.append(time.perf_counter() - t0)
    times = np.array(times)
    batch = x.shape[0]

    # Steady-state (pipelined) throughput: dispatch a window of batches
    # back-to-back and sync once at the end.  TPU executes the window in
    # program order, so fetching the last scalar bounds the whole window;
    # this is the serving-throughput number, free of the per-call host
    # round-trip that dominates the p50 latency above on this host link.
    # Window size: the one scalar pull at the end of a window costs a full
    # tunnel round-trip (measured null-kernel RTT p50 31.4 ms on this box,
    # benchmarks/campaign_r3/latency.jsonl) which is AMORTIZED over the
    # window — at window=8 that baked ~3.9 ms/batch of pure host-link
    # overhead into the "device throughput" number.  window=64 makes the
    # sync residue <0.5 ms/batch.
    window = 64
    outs = [fwd_sum(variables, x) for _ in range(16)]  # warm pipeline
    float(outs[-1])
    # Best of several windows: the remote-device tunnel adds multi-ms jitter
    # per dispatch, so a single window can read 10-20% slow; the minimum is
    # the stable device-throughput estimate.
    # METHODOLOGY NOTE: best-of-5 was adopted late in round 1; rows in
    # benchmarks/results.json / BASELINE.md recorded before commit 16266fc
    # used a single window and read up to ~10-20% slower on this host link.
    # Window 8 -> 64 in round 3; pre-round-3 pipelined rows carry the
    # ~RTT/8 overhead.
    pipelined = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [fwd_sum(variables, x) for _ in range(window)]
        float(outs[-1])
        pipelined = min(pipelined, (time.perf_counter() - t0) / window)

    return {
        "p50_ms_per_batch": float(np.percentile(times, 50) * 1e3),
        "p50_ms_per_frame": float(np.percentile(times, 50) * 1e3 / batch),
        "sync_frames_per_sec": float(batch / np.percentile(times, 50)),
        "frames_per_sec": float(batch / pipelined),
        "pipelined_ms_per_batch": float(pipelined * 1e3),
    }


def _bench_train(model, batch, h, w, c, n_windows=5, window=32):
    """Train-step headline (VERDICT r3 #7): fused augment+label2vec+fwd+bwd+
    clip+adam step (train/step.py make_train_step — the program `cli train`
    runs), steady-state ms/step with a scalar loss pull as the sync.
    Reference loop being priced: MainNumpy.py:41-66 / VisionTransformer.py:235-245.
    """
    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.train import losses, optim
    from ultrasound_modeling_tpu.train import step as step_mod

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(batch, h, w, c)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 2, size=(batch, h, w)), jnp.float32)
    lr = jnp.float32(1e-3)
    tx = optim.make_direction(clip_norm=1.0)
    state = step_mod.TrainState.create(model, tx, x, jax.random.PRNGKey(0))
    # donate=True matches the production Trainer step (state buffers are
    # aliased in place); the chain below rebinds st each call, so donation
    # is safe here.  (Measured neutral on this model — campaign_r4
    # optstate_ab — but the headline should price the shipping program.)
    step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                    augment=True, donate=True)

    st, loss, _ = step(state, x, y, lr)
    float(loss)  # compile + sync
    for _ in range(3):
        st, loss, _ = step(st, x, y, lr)
    float(loss)
    best = float("inf")
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(window):
            st, loss, _ = step(st, x, y, lr)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / window)
    return {
        "train_ms_per_step": float(best * 1e3),
        "train_fps": float(batch / best),
        "train_batch": batch,
    }


def main():
    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models.registry import build_model

    # Serving batch is a free deployment parameter, so the headline serves
    # at the measured-best of the two saturation candidates.  The knee
    # MOVED across rounds: b256 beat b128 through round 3, but the round-
    # 4/5 fusion work made b128 the sweet spot (6823 vs 6316 fps, serial
    # interleaved session 2026-08-21; b512 5949).  BENCH_BATCH pins one.
    env_batch = os.environ.get("BENCH_BATCH")
    candidates = [int(env_batch)] if env_batch else [128, 256]
    use_bf16 = os.environ.get("BENCH_BF16", "1") not in ("0", "false")
    if use_bf16:
        from ultrasound_modeling_tpu.models import common
        common.set_compute_dtype("bfloat16")
    rng = np.random.default_rng(0)

    # Build through the registry: resolves attn_impl='auto' to the fused
    # Pallas kernel on TPU — the SAME kernel `cli infer` serves with, so
    # the headline measures the production path.
    cfg = default_config("transunet")
    model = build_model(cfg.model)
    stats = batch = None
    for b in candidates:
        x = jnp.asarray(rng.normal(size=(b, 256, 80, 10)), jnp.float32)
        s = _bench_forward(model, x)
        if stats is None or s["frames_per_sec"] > stats["frames_per_sec"]:
            stats, batch = s, b

    # Train-step headline on the same flagship (b64 matches the reference's
    # training batch, VisionTransformer.py:241).  BENCH_TRAIN=0 skips.
    if os.environ.get("BENCH_TRAIN", "1") not in ("0", "false"):
        h, w = cfg.model.img_size
        train_batch = int(os.environ.get("BENCH_TRAIN_BATCH", "64"))
        stats.update(_bench_train(model, train_batch, h, w,
                                  cfg.model.in_channels))

    # Reference CPU baseline: the evaluator path runs batch-1 CPU inference
    # with a fresh model load per frame (TBIEvaluator.py:198-238).  MEASURED
    # (benchmarks/cpu_baseline.py, round 2): the reference's own TF
    # TransUNet forward on this box's CPU runs 1.27-1.43 fps eager (700-786
    # ms/frame — the eager layer-by-layer call is what TBIEvaluator.py:238
    # executes), ~7 fps under tf.function, excluding the per-frame process
    # fork + model reload the reference also pays.  The default uses the
    # faster (conservative-for-us) reading; BENCH_CPU_FPS overrides.
    cpu_fps = float(os.environ.get("BENCH_CPU_FPS", "1.428"))
    vs_baseline = stats["frames_per_sec"] / cpu_fps

    print(json.dumps({
        "metric": "transunet_inference_frames_per_sec_per_chip",
        "value": round(stats["frames_per_sec"], 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs_baseline, 2),
        "p50_ms_per_frame": round(stats["p50_ms_per_frame"], 3),
        "sync_frames_per_sec": round(stats["sync_frames_per_sec"], 2),
        "batch": batch,
        "dtype": "bfloat16" if use_bf16 else "float32",
        "device": str(jax.devices()[0]),
        **{k: round(v, 2) for k, v in stats.items()
           if k.startswith("train_")},
    }))


if __name__ == "__main__":
    main()
