"""Out-of-core loader at ARCHIVE scale, cold cache (VERDICT r2 weak #3).

The round-2 overlap measurement (out_of_core_bench.py) used a 512-row shard
resident in a warm page cache — it measured dispatch overhead, not I/O.
This benchmark sizes the shard to real-archive scale (default 8 GB, past any
per-epoch reuse) and measures with a COLD page cache: every trial first
evicts the shard's pages via ``posix_fadvise(POSIX_FADV_DONTNEED)`` (per-
inode, so it hits the loader's own fd too), then times

1. random-row gather throughput, native threaded-pread loader
   (native/npy_loader.cpp) vs the np.load(mmap_mode='r') fallback;
2. one full training epoch (resnest_unet, real train step on the device)
   with the prefetch-overlapped loader vs the synchronous path: overlap
   should hide cold-archive I/O behind compute (epoch ~ max(io, compute)
   instead of io + compute).

The shard is kept at --path between runs (generation writes ~--gb GB once).

Run: python benchmarks/out_of_core_scale.py [--gb 8] [--skip-epoch]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROW_SHAPE = (1, 256, 64, 8)   # -> x [256,64,6]: resnest_unet's native shape
ROW_BYTES = int(np.prod(ROW_SHAPE)) * 4
BATCH = 32


def evict(path):
    """Drop the file's pages from the page cache.

    DONTNEED only drops CLEAN pages: immediately after generation the
    shard's pages are dirty and survive the fadvise (the round-3 run of
    this harness recorded a 934 MB/s "cold" leg on a 76 MB/s random-read
    disk that way).  So: fsync first (force writeback -> pages clean),
    fadvise, and — when running as root — drop_caches as belt-and-braces."""
    try:
        fd = os.open(path, os.O_RDWR)
    except PermissionError:
        # e.g. root-generated shard, later non-root run: fsync needs write
        # access but is only essential right after generation (dirty pages);
        # fall back to read-only fadvise.
        fd = os.open(path, os.O_RDONLY)
    try:
        if os.access(path, os.W_OK):
            os.fsync(fd)
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
    finally:
        os.close(fd)
    try:
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3\n")
    except (PermissionError, OSError):
        pass  # not root: fsync+fadvise above is the best available


def make_shard(path, n_rows):
    """Write [n_rows, 1, 256, 64, 8] f32 in chunks (bounded host memory)."""
    from numpy.lib.format import open_memmap
    t0 = time.perf_counter()
    out = open_memmap(path, mode="w+", dtype=np.float32,
                      shape=(n_rows,) + ROW_SHAPE)
    rng = np.random.default_rng(0)
    chunk = 1024
    for start in range(0, n_rows, chunk):
        stop = min(start + chunk, n_rows)
        block = rng.normal(size=(stop - start,) + ROW_SHAPE
                           ).astype(np.float32)
        block[..., 0] = rng.uniform(0, 2, size=(stop - start,) + ROW_SHAPE[:-1])
        out[start:stop] = block
    out.flush()
    del out
    return time.perf_counter() - t0


def bench_gather(path, n_rows, n_gather=2048):
    from ultrasound_modeling_tpu.data import native_loader

    # DISJOINT row sets per loader config: this VM's virtio disk sits on a
    # hypervisor-side cache that guest drop_caches cannot evict, so a leg
    # that re-reads rows a previous leg touched measures the HOST cache
    # (the first run of this table read 1.8 GB/s "cold" mmap on rows the
    # native leg had just pulled twice).  Disjoint sets at 8 GB scale keep
    # each cold leg on rows last touched at generation time.
    # Two loader configs need two DISJOINT sets: shrink n_gather for small
    # shards rather than silently under-filling the second slice (an empty
    # slice times 64 zero-row gathers and reports absurd GB/s figures —
    # the exact artifact class this harness exists to eliminate).
    n_gather = min(n_gather, n_rows // 2)
    n_gather -= n_gather % BATCH
    assert n_gather > 0, f"shard too small to gather-bench ({n_rows} rows)"
    perm = np.random.default_rng(1).permutation(n_rows).astype(np.int64)
    out = {}

    def run(s, idx):
        t0 = time.perf_counter()
        for start in range(0, n_gather, BATCH):
            s.gather(idx[start:start + BATCH])
        return time.perf_counter() - t0

    mb = n_gather * ROW_BYTES / 1e6
    for li, (name, kw) in enumerate((("native", {}),
                                     ("mmap_fallback",
                                      {"force_fallback": True}))):
        idx = perm[li * n_gather:(li + 1) * n_gather]
        # Evict BEFORE constructing the shard: the mmap fallback maps the
        # file at construction, and POSIX_FADV_DONTNEED does not reliably
        # drop pages that are already mapped (the first run of this harness
        # recorded a 1960 MB/s "cold" mmap leg on a disk that does 76 MB/s
        # random reads — the evict had silently failed).
        evict(path)
        shard = native_loader.NpyShard(path, **kw)
        if name == "native" and not shard.native:
            out["native_available"] = False
            continue
        cold = run(shard, idx)
        warm = run(shard, idx)     # same rows, now cached
        out[f"{name}_cold_s"] = round(cold, 3)
        out[f"{name}_cold_MBps"] = round(mb / cold, 1)
        out[f"{name}_warm_MBps"] = round(mb / warm, 1)
    return out


def bench_epoch(path, n_rows):
    """Cold-cache training epoch, prefetch-overlap vs synchronous."""
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
            ds.device_resident = True   # Trainer takes the sync path
        trainer = Trainer(cfg, ds)
        # epoch 0 warms the compile cache on a few cached rows' worth of
        # batches; then evict and measure epoch 1 fully cold.
        trainer.train_epoch(0)
        evict(path)
        t0 = time.perf_counter()
        r = trainer.train_epoch(1)
        dt = time.perf_counter() - t0
        key = "overlap" if overlap else "sync"
        out[f"{key}_cold_epoch_s"] = round(dt, 3)
        out[f"{key}_cold_fps"] = round(r["iters"] * BATCH / dt, 1)
        del trainer, ds
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=8.0)
    ap.add_argument("--path", default="/tmp/ooc_scale_shard.npy")
    ap.add_argument("--skip-epoch", action="store_true",
                    help="gather-only (no device needed)")
    args = ap.parse_args()

    n_rows = int(args.gb * 1e9 / ROW_BYTES)
    res = {"rows": n_rows, "shard_gb": round(n_rows * ROW_BYTES / 1e9, 2),
           "batch": BATCH}
    if (not os.path.exists(args.path)
            or os.path.getsize(args.path) < n_rows * ROW_BYTES):
        res["generate_s"] = round(make_shard(args.path, n_rows), 1)
    res.update(bench_gather(args.path, n_rows))
    if not args.skip_epoch:
        res.update(bench_epoch(args.path, n_rows))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
