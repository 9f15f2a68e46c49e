"""Out-of-core loader micro-benchmark (VERDICT round-1 item 8).

Measures, on a synthetic ETL-layout shard ([N, 1, 256, 80, 12] f32):

1. row-gather throughput: native C++ loader (native/npy_loader.cpp, threaded
   pread) vs the np.load(mmap_mode='r') fallback,
2. end-to-end epoch wall-clock of a small train run with out_of_core
   batches, synchronous vs prefetch-overlapped (data.pipeline.prefetch,
   the Trainer's default for non-device-resident datasets).

Run: python benchmarks/out_of_core_bench.py   (uses the TPU for (2))
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROWS = 512
SHAPE = (N_ROWS, 1, 256, 64, 8)  # -> x [256,64,6], resnest_unet's native shape
BATCH = 32


def make_shard(path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=SHAPE).astype(np.float32)
    arr[..., 0] = rng.uniform(0, 2, size=SHAPE[:-1])
    np.save(path, arr)
    return path


def bench_gather(path):
    from ultrasound_modeling_tpu.data import native_loader

    out = {}
    shard = native_loader.NpyShard(path)
    out["native_available"] = shard.native
    idx = np.random.default_rng(1).permutation(N_ROWS)[:256].astype(np.int64)

    def run(s):
        t0 = time.perf_counter()
        for start in range(0, 256, BATCH):
            s.gather(idx[start:start + BATCH])
        return time.perf_counter() - t0

    run(shard)  # warm page cache
    out["gather_s"] = min(run(shard) for _ in range(3))
    mb = 256 * np.prod(SHAPE[1:]) * 4 / 1e6
    out["gather_MBps"] = round(mb / out["gather_s"], 1)

    if shard.native:
        fb = native_loader.NpyShard(path, force_fallback=True)
        run(fb)
        out["fallback_gather_s"] = min(run(fb) for _ in range(3))
        out["fallback_gather_MBps"] = round(mb / out["fallback_gather_s"], 1)
    return out


def bench_epoch_overlap(path):
    """Short training epochs over the out-of-core dataset, prefetch on/off."""
    import dataclasses as dc

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.data.pipeline import Dataset
    from ultrasound_modeling_tpu.train.loop import Trainer

    cfg = default_config("resnest_unet")
    cfg = dc.replace(cfg, train=dc.replace(
        cfg.train, batch_size=BATCH, epochs=2, eval_every_epochs=100))
    out = {}
    for overlap in (True, False):
        ds = Dataset.from_npy(path, path, out_of_core=True)
        if not overlap:
            ds.device_resident = True   # trick Trainer into the sync path
        trainer = Trainer(cfg, ds)
        r0 = trainer.train_epoch(0)     # includes compile
        t0 = time.perf_counter()
        r = trainer.train_epoch(1)
        dt = time.perf_counter() - t0
        key = "overlap" if overlap else "sync"
        out[f"{key}_epoch_s"] = round(dt, 3)
        out[f"{key}_fps"] = round(r["iters"] * BATCH / dt, 1)
    return out


def main():
    with tempfile.TemporaryDirectory() as d:
        path = make_shard(os.path.join(d, "shard.npy"))
        res = {"rows": N_ROWS, "batch": BATCH}
        res.update(bench_gather(path))
        if "--gather-only" not in sys.argv:
            res.update(bench_epoch_overlap(path))
        print(json.dumps(res))


if __name__ == "__main__":
    main()
