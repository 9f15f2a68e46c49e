"""HTTP serving throughput: dynamic micro-batching vs one-at-a-time.

Quantifies infer/server.py's cross-request coalescing: C concurrent clients
each stream single-frame predict requests at the server (the clinical
per-probe pattern), and the batcher coalesces them into padded device
batches.  The reference's serving analogue processes frames strictly
one-per-process with a full model reload each time
(reference: TBIEvaluator.py:191-206,235-236).

Runs fully in-process (no sockets beyond loopback): an InferenceServer on
port 0, clients on threads.  Per-client sequential requests measure added
latency; the concurrency sweep measures coalesced throughput.

Usage: python benchmarks/serving_http_bench.py [--model transunet]
       [--clients 1,4,16] [--frames 64]
Appends one JSON row per client count to stdout.
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401


def _post_npy(url, x):
    buf = io.BytesIO()
    np.save(buf, x, allow_pickle=False)
    req = urllib.request.Request(
        url, data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        return np.load(io.BytesIO(resp.read()), allow_pickle=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="transunet")
    ap.add_argument("--clients", default="1,4,16")
    ap.add_argument("--frames", type=int, default=64,
                    help="single-frame requests per client")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--window-ms", type=float, default=2.0)
    ap.add_argument("--direct", action="store_true",
                    help="clients call DynamicBatcher.predict directly "
                         "(no HTTP, no npy serialization) — isolates the "
                         "transport cost from batcher+device throughput; "
                         "on this 1-core box the HTTP rows are bound by "
                         "the colocated client threads, not the server")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.infer.server import InferenceServer
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import optim, step as step_mod

    cfg = default_config(args.model)
    common.set_compute_dtype("bfloat16")
    model = build_model(cfg.model)
    h, w = cfg.model.img_size
    c = cfg.model.in_channels
    tx = optim.make_direction(clip_norm=1.0)
    state = step_mod.TrainState.create(
        model, tx, jnp.zeros((1, h, w, c), jnp.float32),
        jax.random.PRNGKey(0))
    fwd_full = step_mod.make_forward(model)
    fn = jax.jit(lambda x: fwd_full(state, x))

    server = InferenceServer(fn, (h, w, c), port=0,
                             max_batch=args.max_batch,
                             window_ms=args.window_ms,
                             model_name=args.model)
    server.start_background()
    host, port = server.address
    url = f"http://{host}:{port}/predict"
    print(f"# warming buckets {server.batcher.buckets} ...",
          file=sys.stderr, flush=True)
    server.batcher.warmup((h, w, c))

    rng = np.random.default_rng(0)
    frame = rng.normal(size=(h, w, c)).astype(np.float32)
    frame_b = frame[None]  # batcher.predict takes [n,H,W,C]

    for n_clients in (int(v) for v in args.clients.split(",")):
        b0 = server.batcher.stats()
        latencies = []
        lat_lock = threading.Lock()

        def client():
            for _ in range(args.frames):
                t0 = time.perf_counter()
                if args.direct:
                    server.batcher.predict(frame_b, timeout=300)
                else:
                    _post_npy(url, frame)
                dt = time.perf_counter() - t0
                with lat_lock:
                    latencies.append(dt)

        threads = [threading.Thread(target=client)
                   for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        b1 = server.batcher.stats()
        total = n_clients * args.frames
        batches = b1["device_batches"] - b0["device_batches"]
        print(json.dumps({
            "transport": "direct" if args.direct else "http",
            "window_ms": args.window_ms,
            "model": args.model, "clients": n_clients,
            "frames": total,
            "fps": round(total / wall, 1),
            "p50_latency_ms": round(
                float(np.percentile(latencies, 50)) * 1e3, 2),
            "p99_latency_ms": round(
                float(np.percentile(latencies, 99)) * 1e3, 2),
            "device_batches": batches,
            "mean_rows_per_batch": round(total / max(batches, 1), 2),
        }), flush=True)

    server.shutdown()


if __name__ == "__main__":
    main()
