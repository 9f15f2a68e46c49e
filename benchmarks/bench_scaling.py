"""Data-parallel scaling harness (BASELINE config row 5).

On real multi-chip hardware this measures weak-scaling efficiency of the
fused train step over the ``data`` mesh axis (global batch = per-chip batch x
n_chips; efficiency = fps(n) / (n * fps(1))).  Only one chip is attached in
this environment, so by default it validates the *mechanics* on a virtual
CPU mesh (1 -> 2 -> 4 -> 8 devices) — the collective layout is identical to
ICI on a v5e-8; run with --platform tpu on a pod slice for real numbers.

Usage: python benchmarks/bench_scaling.py [--platform cpu|tpu]
       [--devices 1,2,4,8] [--per-device-batch 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--n-iter", type=int, default=10)
    args = ap.parse_args()

    counts = [int(c) for c in args.devices.split(",")]
    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(counts)}")

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ultrasound_modeling_tpu.data import synthetic
    from ultrasound_modeling_tpu.models.resnest import ResNeStUNet
    from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
    from ultrasound_modeling_tpu.train import losses, optim, step as step_mod

    h, w, c = (64, 64, 6) if args.platform == "cpu" else (256, 64, 6)
    model = ResNeStUNet(num_classes=3, radix=2, kpaths=2) \
        if args.platform == "cpu" else ResNeStUNet(num_classes=3)
    tx = optim.make_direction(clip_norm=1.0)
    step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                    augment=True, donate=False)

    base_fps = None
    results = []
    for n in counts:
        if n > len(jax.devices()):
            break
        batch = args.per_device_batch * n
        raw = synthetic.make_raw_array(batch, seed=0, height=h, width=w,
                                       n_disp=c)
        x = jnp.asarray(raw[:, 0, :, :, 1:-1])
        y = jnp.asarray(raw[:, 0, :, :, 0])
        mesh = mesh_mod.make_mesh(n_data=n, devices=jax.devices()[:n])
        state = step_mod.TrainState.create(
            model, tx, jnp.zeros((batch, h, w, c)), jax.random.PRNGKey(0))
        state = mesh_mod.replicate(mesh, state)
        xs, ys = mesh_mod.shard_batch(mesh, x, y)
        lr = jnp.float32(1e-3)
        s2, loss, _ = step(state, xs, ys, lr)
        float(loss)
        times = []
        for _ in range(args.n_iter):
            t0 = time.perf_counter()
            s2, loss, _ = step(s2, xs, ys, lr)
            float(loss)
            times.append(time.perf_counter() - t0)
        p50 = float(np.percentile(times, 50))
        fps = batch / p50
        if base_fps is None:
            base_fps = fps
        results.append({
            "devices": n, "global_batch": batch,
            "p50_ms_per_step": round(p50 * 1e3, 2),
            "frames_per_sec": round(fps, 1),
            "weak_scaling_efficiency": round(fps / (n * base_fps), 3),
        })
        print(json.dumps(results[-1]))


if __name__ == "__main__":
    main()
