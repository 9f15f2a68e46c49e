"""Command-line interface: train / eval / infer / etl / bench subcommands.

The reference has no CLI (every entry point is ``python <file>.py`` with
hardcoded paths — reference: MainNumpy.py:150-181, TBIEvaluator.py:374-378).

Usage:
  python -m ultrasound_modeling_tpu.cli train --model transunet --epochs 50
  python -m ultrasound_modeling_tpu.cli train --model resnest_unet --synthetic
  python -m ultrasound_modeling_tpu.cli eval  --model transunet --ckpt DIR
  python -m ultrasound_modeling_tpu.cli infer --ckpt DIR --data TestingData.npy
  python -m ultrasound_modeling_tpu.cli etl   --raw RAW --out OUT --objective 1
  python -m ultrasound_modeling_tpu.cli bench --model transunet
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401  (enables XLA disk cache)


def _add_common(p):
    p.add_argument("--model", default="transunet",
                   choices=["transunet", "resnest_unet", "vit", "swin",
                            "mobileunet"])
    p.add_argument("--num-classes", type=int, default=None,
                   help="defaults to the config/family value (3)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=None,
                   help="defaults to the config/family value (0)")
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--ckpt", default=None, help="checkpoint directory")
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic data instead of .npy files")
    p.add_argument("--train-data", default=None)
    p.add_argument("--val-data", default=None)
    p.add_argument("--n-devices", type=int, default=None,
                   help="data-parallel devices (default: all)")
    p.add_argument("--out-of-core", action="store_true",
                   help="stream batches from disk via the native mmap "
                        "loader instead of loading the archive into memory")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree over the 'model' mesh axis "
                        "(Megatron-style sharding of the transformer stack; "
                        "total devices = n-devices * tp)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages (GPipe schedule on the "
                        "scanned transformer stack; transunet only; composes "
                        "with --tp/--n-devices into a dp x tp x pp mesh)")
    p.add_argument("--pp-micro", type=int, default=0,
                   help="pipeline microbatches (default 2*stages)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host entry: jax.distributed.initialize from "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID; per-process batches assembled via "
                        "make_array_from_process_local_data "
                        "(parallel/distributed.py)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay float32)")
    p.add_argument("--remat-conv", action="store_true",
                   help="jax.checkpoint the conv stages (ResNeSt stages + "
                        "decoder blocks): trades idle MXU FLOPs for HBM "
                        "bytes in the bandwidth-bound train step")
    p.add_argument("--attn-train", default=None,
                   choices=("auto", "xla", "pallas", "flash"),
                   help="train-path attention kernel for transunet/vit: "
                        "'pallas' = fused forward saving qkv/context/probs "
                        "for a bf16 hand-written backward (no recompute); "
                        "'flash' = fused attention CORE saving only softmax "
                        "LSE, probs recomputed tile-wise in a Pallas "
                        "backward (projections stay XLA GEMMs); "
                        "default keeps the composed-XLA autodiff path")
    p.add_argument("--adam-mu-bf16", action="store_true",
                   help="store the Adam first moment in bfloat16 (shrinks "
                        "optimizer state/checkpoints; measured "
                        "latency-neutral — state traffic is <1%% of the "
                        "step's HBM bytes; second moment stays f32)")
    p.add_argument("--config", default=None,
                   help="TOML config file (overrides per-family defaults)")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint from --ckpt")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace into DIR")


def build_dataset(cfg, args):
    from ultrasound_modeling_tpu.data.pipeline import Dataset
    if args.synthetic or not args.train_data:
        h, w = cfg.model.img_size
        bs = cfg.train.batch_size
        return Dataset.synthetic(
            n_train=max(64, 2 * bs), n_test=max(16, bs), height=h, width=w,
            n_disp=cfg.model.in_channels, num_classes=cfg.model.num_classes)
    return Dataset.from_npy(args.train_data, args.val_data,
                            cfg.model.num_classes,
                            out_of_core=getattr(args, "out_of_core", False))


def build_config(args):
    import dataclasses as dc
    from ultrasound_modeling_tpu.config import default_config, from_toml
    if getattr(args, "config", None):
        cfg = from_toml(args.config)
    else:
        cfg = default_config(args.model)
    model = cfg.model
    if args.num_classes is not None:
        model = dc.replace(model, num_classes=args.num_classes)
    if getattr(args, "bf16", False):
        model = dc.replace(model, compute_dtype="bfloat16")
    if getattr(args, "remat_conv", False):
        model = dc.replace(model, remat_conv=True)
    if getattr(args, "attn_train", None):
        model = dc.replace(model, attn_train_impl=args.attn_train)
    train = cfg.train
    if getattr(args, "adam_mu_bf16", False):
        train = dc.replace(train, adam_mu_dtype="bfloat16")
    if args.batch_size:
        train = dc.replace(train, batch_size=args.batch_size)
    if args.seed is not None:
        train = dc.replace(train, seed=args.seed)
    return cfg.replace(model=model, train=train)


def cmd_train(args):
    import jax
    from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
    from ultrasound_modeling_tpu.train.loop import Trainer
    from ultrasound_modeling_tpu.utils.checkpoint import Checkpointer
    from ultrasound_modeling_tpu.utils.logging import MetricLogger

    if getattr(args, "distributed", False):
        # multi-host entry: initialize the JAX multi-process runtime BEFORE
        # any devices are touched (parallel/distributed.py; the reference's
        # abandoned MultiWorkerMirroredStrategy, TBI_ResNest.py:6,463-468)
        from ultrasound_modeling_tpu.parallel import distributed as dist_mod
        active = dist_mod.initialize_distributed()
        print(f"distributed: processes={jax.process_count()} "
              f"index={jax.process_index()} active={active}")
    cfg = build_config(args)
    if cfg.model.name == "vit":
        # measured ceiling, surfaced where users meet it (README "Model
        # families", BASELINE.md accuracy table): the conv-free pure ViT
        # scores bleed Dice exactly 0 in every swept configuration, and the
        # implementation is proven weight-identical to the reference's own
        # TF model (PARITY.md) — the architecture, not the port, is the cause
        print("WARNING: the pure ViT family never learns the bleed class "
              "(measured bleed Dice = 0.0 across lr/loss/pos-emb/conv-stem "
              "sweeps; see README 'Model families' and PARITY.md). It ships "
              "for reference parity — use transunet/swin/resnest_unet for "
              "real segmentation.", flush=True)
    ds = build_dataset(cfg, args)
    mesh = None
    tp = max(int(getattr(args, "tp", 1) or 1), 1)
    pp = max(int(getattr(args, "pp", 1) or 1), 1)
    if tp > 1:
        # The fused Pallas attention kernel is a single-device program — it
        # cannot be partitioned over the 'model' axis by GSPMD.  Force the
        # composed XLA attention (which shards cleanly) under TP.
        import dataclasses as dc
        cfg = dc.replace(cfg, model=dc.replace(
            cfg.model, attn_impl="xla", swin_attn_impl="xla"))
    from ultrasound_modeling_tpu.models.common import (
        resolve_attn_train_impl)
    if (resolve_attn_train_impl(cfg.model.attn_train_impl) in ("pallas", "flash")
            and ((args.n_devices and args.n_devices > 1) or tp > 1
                 or pp > 1)):
        # Resolve BEFORE the gate: '--attn-train auto' becomes 'flash' on
        # TPU, and comparing the literal string would let that combination
        # slip past (ADVICE r4 medium).
        # Same constraint on the train-path kernels: pallas_call has no
        # GSPMD partitioning rule, so under a mesh it would replicate (or
        # fail to partition) the attention activations.  The combination is
        # untested — fall back to the composed path rather than ship it.
        # An EXPLICIT kernel request gets a warning; the 'auto' default
        # resolves quietly (nothing the user asked for is being overridden).
        import dataclasses as dc
        if cfg.model.attn_train_impl != "auto":
            print("WARNING: --attn-train pallas/flash is single-device "
                  "only; using the composed XLA train attention under "
                  "--n-devices/--tp/--pp.", flush=True)
        cfg = dc.replace(cfg, model=dc.replace(
            cfg.model, attn_train_impl="xla"))
    if pp > 1 and not cfg.model.remat:
        # GPipe backward saves activations for all m + P - 1 schedule steps
        # on every stage; per-layer remat is what delivers the module's
        # stage-local activation-memory scaling, so it is the default
        # under --pp (parallel/pipeline.py).
        import dataclasses as dc
        cfg = dc.replace(cfg, model=dc.replace(cfg.model, remat=True))
    if tp > 1 and pp > 1:
        # dp x tp x pp: pipeline stages on a dedicated 'pipe' axis, TP
        # groups over 'model' inside each stage.
        mesh = mesh_mod.make_mesh(n_data=args.n_devices, n_model=tp,
                                  n_pipe=pp)
    elif (args.n_devices and args.n_devices > 1) or max(tp, pp) > 1:
        mesh = mesh_mod.make_mesh(n_data=args.n_devices,
                                  n_model=max(tp, pp))
    ckpt = Checkpointer(args.ckpt) if args.ckpt else None
    trainer = Trainer(cfg, ds, mesh=mesh,
                      logger=MetricLogger(args.log_dir), checkpointer=ckpt,
                      parallel="pp" if pp > 1 else "tp",
                      pp_micro=getattr(args, "pp_micro", 0))
    if args.resume and ckpt is not None and ckpt.latest_step() is not None:
        trainer.state = ckpt.restore(trainer.state)
        trainer.iteration = int(trainer.state.step)
        print(f"resumed from step {trainer.iteration}")
    if args.epochs:
        import dataclasses as dc
        trainer.cfg = cfg.replace(train=dc.replace(cfg.train,
                                                   epochs=args.epochs))
    if args.profile:
        from ultrasound_modeling_tpu.utils.profiling import trace
        with trace(args.profile):
            summary = trainer.fit(args.epochs)
    else:
        summary = trainer.fit(args.epochs)
    print({k: round(v, 5) for k, v in summary.items()})


def cmd_eval(args):
    from ultrasound_modeling_tpu.train.loop import Trainer
    from ultrasound_modeling_tpu.utils.checkpoint import Checkpointer
    from ultrasound_modeling_tpu.utils.logging import MetricLogger

    cfg = build_config(args)
    ds = build_dataset(cfg, args)
    trainer = Trainer(cfg, ds, logger=MetricLogger(args.log_dir))
    if args.ckpt:
        ckpt = Checkpointer(args.ckpt)
        trainer.state = ckpt.restore(trainer.state)
    summary = trainer.evaluate(epoch=0)
    print({k: round(v, 5) for k, v in summary.items()})


def _restore_state(mcfg, tcfg, sample_shape, ckpt_dir):
    """Rebuild the TrainState structure the Trainer saves (including the
    optimizer direction state, which depends on the training config's
    loss/clip choices) and restore ``ckpt_dir`` into it.  Shared by
    ``infer``/``serve`` (via :func:`_make_forward`) and ``export`` so the
    restore contract cannot drift between them."""
    import jax
    import jax.numpy as jnp
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import optim, step as step_mod
    from ultrasound_modeling_tpu.utils.checkpoint import Checkpointer

    if mcfg.compute_dtype != "float32":
        # the Trainer sets this global for train/eval; set it here too so
        # `infer --bf16` actually runs bfloat16
        from ultrasound_modeling_tpu.models import common as model_common
        model_common.set_compute_dtype(mcfg.compute_dtype)
    model = build_model(mcfg)
    clip = tcfg.clip_global_norm if tcfg.loss != "class_balanced" else None
    if mcfg.name == "mobileunet":
        tx = optim.make_dual_rate_direction(mu_dtype=tcfg.adam_mu_dtype)
    else:
        tx = optim.make_direction(clip_norm=clip,
                                  weight_decay=tcfg.weight_decay,
                                  mu_dtype=tcfg.adam_mu_dtype)
    sample = jnp.zeros((1,) + tuple(sample_shape), jnp.float32)
    # init from the TRAIN seed (not a fixed 0) so a ckpt-less build matches
    # what `cli train` would have initialized
    state = step_mod.TrainState.create(
        model, tx, sample, jax.random.PRNGKey(getattr(tcfg, "seed", 0)))
    if ckpt_dir:
        state = Checkpointer(ckpt_dir).restore(state)
    return model, state


def _make_forward(mcfg, tcfg, sample_shape, ckpt_dir, mesh=None,
                  quantize=None):
    """Build a restored ``x -> probs`` forward for one model config.

    Rebuilds the same TrainState structure the Trainer saves (including the
    optimizer direction state, which depends on the training config's
    loss/clip choices) so msgpack/orbax restores match, then closes the
    forward over the restored state — the TPU-native equivalent of the
    reference's per-process ``keras.models.load_model``
    (reference: TBIEvaluator.py:221-236).

    With a ``mesh``, params are replicated and each batch is sharded over the
    ``data`` axis, so one forward spans all mesh devices — the TPU-native
    version of the reference evaluator's 16-wide multiprocessing fan-out
    (reference: TBIEvaluator.py:190-206), with ICI doing the scatter instead
    of process forks."""
    import jax

    model, state = _restore_state(mcfg, tcfg, sample_shape, ckpt_dir)
    from ultrasound_modeling_tpu.train import step as step_mod
    if quantize:
        if quantize != "int8":
            raise ValueError(f"unknown quantize mode {quantize!r}")
        from ultrasound_modeling_tpu.infer.quantize import (
            make_quantized_forward)
        # int8 leaves are host arrays baked as jit constants; under a mesh
        # GSPMD replicates them against the sharded batch automatically
        qfwd = make_quantized_forward(model, state)
        if mesh is None:
            return qfwd
        from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
        shard = mesh_mod.batch_sharding(mesh)
        return lambda b: qfwd(jax.device_put(b, shard))
    fwd = step_mod.make_forward(model)
    if mesh is None:
        return lambda b: fwd(state, b)
    from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
    state = jax.device_put(state, mesh_mod.replicated(mesh))
    shard = mesh_mod.batch_sharding(mesh)
    return lambda b: fwd(state, jax.device_put(b, shard))


def cmd_infer(args):
    """End-to-end evaluator (the reference's TBIEvaluator product —
    reference: TBIEvaluator.py:163-373 Polar_Model/Cardiac_Model/PolarProcess/
    Display): optional brain-mask -> bleed cascade, per-scan cardiac batches
    from TestingPaths, full polar panel set (prediction / truth / bleed
    probability / bMode / brain-mask / difference / confusion) and a
    per-class count summary (checkCount semantics, quantitatively)."""
    import json
    import numpy as np
    import jax.numpy as jnp
    from ultrasound_modeling_tpu.infer import evaluate as ev
    from ultrasound_modeling_tpu.infer import render

    cfg = build_config(args)

    # -- test data: ETL'd archive (the reference's input product) or the
    #    dataset test split (synthetic smoke path).
    paths = bmode = None
    if getattr(args, "archive", None):
        x, y, bmode, paths = ev.load_archive(args.archive)
    else:
        ds = build_dataset(cfg, args)
        x = np.asarray(ds.x_te)
        y = np.asarray(ds.y_te)
    if getattr(args, "select", None) and paths is None:
        raise SystemExit(
            "--select filters by TestingPaths entries, which only an "
            "--archive input provides; the synthetic/test-split path has "
            "no frame paths")
    if getattr(args, "select", None) and paths is not None:
        # frame selection by patient/scan substring over TestingPaths —
        # the reference's findImage (TBIEvaluator.py:41-56) picks a frame
        # index by matching patientNum/scanNum inside the stored path
        keep = np.array([args.select in str(p) for p in paths])
        if not keep.any():
            print(f"--select {args.select!r} matches no TestingPaths entry")
            return
        x, y = x[keep], y[keep]
        bmode = bmode[keep] if bmode is not None else None
        paths = [p for p, k in zip(paths, keep) if k]
    if getattr(args, "max_frames", 0):
        x, y = x[: args.max_frames], y[: args.max_frames]
        bmode = bmode[: args.max_frames] if bmode is not None else None
        paths = paths[: args.max_frames] if paths is not None else None

    import dataclasses as dc
    sample_shape = x.shape[1:]
    mesh = None
    if getattr(args, "n_devices", None) and args.n_devices > 1:
        # data-parallel inference: one forward spans n_devices chips, batch
        # sharded over the 'data' axis (the reference fans inference out
        # 16-wide with process forks — TBIEvaluator.py:190-206)
        from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
        mesh = mesh_mod.make_mesh(n_data=args.n_devices)
    exported_batch = None
    if getattr(args, "exported", None):
        # serve a jax.export artifact: weights + program embedded, no
        # checkpoint or model rebuild (infer/export.py).  A static-batch
        # export pins the chunk size below to the pinned batch.
        if mesh is not None:
            raise SystemExit(
                "--exported artifacts are lowered for one device; "
                "--n-devices needs --ckpt (model rebuilt and mesh-sharded), "
                "or run one process per device")
        if getattr(args, "quantize", None):
            raise SystemExit(
                "--quantize does nothing for --exported artifacts; "
                "quantize at export time: `export --quantize int8`")
        from ultrasound_modeling_tpu.infer.export import load_exported_meta
        bleed_fwd, exported_shape, exported_batch = load_exported_meta(
            args.exported)
        if tuple(sample_shape) != tuple(exported_shape):
            # validate up front (serve does the same via sample_shape):
            # otherwise mismatched archives die in a deep jax trace error
            raise SystemExit(
                f"--exported artifact was lowered for frames shaped "
                f"{tuple(exported_shape)}, but the input provides "
                f"{tuple(sample_shape)}; re-export for this archive or "
                f"pass matching data")
    else:
        bleed_fwd = _make_forward(cfg.model, cfg.train, sample_shape,
                                  args.ckpt, mesh=mesh,
                                  quantize=getattr(args, "quantize", None))

    # -- optional cascade: brain-mask model zeroes non-brain input before the
    #    bleed model runs (reference: TBIEvaluator.py:221-232).
    if getattr(args, "cascade", None):
        cascade_family = getattr(args, "cascade_model", None) or args.model
        if cascade_family == cfg.model.name:
            brain_mcfg = cfg.model
            brain_tcfg = cfg.train
        else:
            from ultrasound_modeling_tpu.config import default_config
            brain_def = default_config(cascade_family)
            brain_mcfg, brain_tcfg = brain_def.model, brain_def.train
        brain_mcfg = dc.replace(
            brain_mcfg, num_classes=getattr(args, "cascade_classes", 2) or 2)
        brain_fwd = _make_forward(brain_mcfg, brain_tcfg, sample_shape,
                                  args.cascade, mesh=mesh)
        cascade = ev.make_cascade(brain_fwd, bleed_fwd, return_mask=True)

        def forward_with_mask(b):
            return cascade(b)
    else:
        def forward_with_mask(b):
            return bleed_fwd(b), None

    out_dir = args.out or "inference_out"
    os.makedirs(out_dir, exist_ok=True)
    axes = None
    if args.axis_dir and os.path.isdir(args.axis_dir):
        axes = render.load_axes(args.axis_dir)

    if x.shape[0] == 0:
        print("no test frames in the input (empty archive/test split)")
        return
    bs = min(16, x.shape[0])
    if exported_batch is not None:
        # static-batch artifact: every chunk must be exactly the pinned size
        bs = exported_batch
    if mesh is not None:
        # chunk size must divide evenly over the data axis; round up so the
        # padded chunks shard cleanly
        nd = args.n_devices
        bs = -(-bs // nd) * nd
    nc = cfg.model.num_classes

    def render_frame(i, probs_i, name, mask_i=None):
        # composite (reference: TBIEvaluator.py:249-252) directly in numpy —
        # probs are already on host; a per-frame device round-trip costs
        # multi-ms dispatch on a remote link for microseconds of arithmetic
        p = np.asarray(probs_i)
        comp = 1.0 - p[..., 0] - 0.5 * p[..., 1] + p[..., 2]
        counts = ev.class_counts(np.asarray(probs_i), y[i], nc)
        render.render_panels(
            os.path.join(out_dir, f"{name}.png"), comp, y[i],
            prob_bleed=np.asarray(probs_i[..., -1]),
            bmode=bmode[i] if bmode is not None else None,
            mask=mask_i, diff=True, confusion=counts["confusion"],
            axes=axes, title=name)
        return counts

    summary = {"frames": [], "totals": {}}
    n_panels = 0

    # One forward pass in fixed-size batches for BOTH modes — the last batch
    # is padded to `bs` so the whole run costs exactly one XLA compile (the
    # per-scan cardiac groups have varying lengths; feeding each group as a
    # whole batch would recompile per distinct length, and each compile is
    # 30s+ on a remote-device link).  Batch-1-independent eval-mode forward,
    # so batching does not change numerics.
    probs_chunks, mask_chunks = [], []
    n_total = x.shape[0]
    for start in range(0, n_total, bs):
        stop = min(start + bs, n_total)
        xb = np.asarray(x[start:stop])
        pad = bs - xb.shape[0]
        if pad:
            xb = np.concatenate([xb, np.repeat(xb[-1:], pad, axis=0)], axis=0)
        probs, mk = forward_with_mask(jnp.asarray(xb))
        probs_chunks.append(np.asarray(probs)[: stop - start])
        mask_chunks.append(
            np.asarray(mk)[: stop - start] if mk is not None else None)
    probs_all = np.concatenate(probs_chunks, axis=0)
    mask_all = (np.concatenate(mask_chunks, axis=0)
                if mask_chunks and mask_chunks[0] is not None else None)

    def frame_names():
        """(index, panel name) per frame.  Cardiac mode numbers cycles
        within each scan (reference: TBIEvaluator.py:132-160) with a
        per-scan counter that survives non-consecutive groups (a shuffled
        --split random archive interleaves scans; restarting at _c00 per
        group would overwrite earlier panels)."""
        if getattr(args, "cardiac", False) and paths is not None:
            cycle_no = {}
            for path, start, stop in ev.group_by_path(paths):
                key = str(path).strip("[]")
                for j in range(stop - start):
                    k = cycle_no.get(key, 0)
                    cycle_no[key] = k + 1
                    yield start + j, f"{key}_c{k:02d}"
        else:
            for i in range(n_total):
                yield i, (f"{str(paths[i]).strip(chr(39) + chr(34) + '[] ')}"
                          f"_{i:04d}"
                          if paths is not None else f"frame_{i:04d}")

    for i, name in frame_names():
        counts = render_frame(i, probs_all[i], name,
                              mask_all[i] if mask_all is not None else None)
        summary["frames"].append({"name": name, **{
            k: (v.tolist() if hasattr(v, "tolist") else v)
            for k, v in counts.items()}})
        n_panels += 1

    # aggregate per-class counts + confusion over the run
    tot_conf = np.sum([np.asarray(f["confusion"]) for f in summary["frames"]],
                      axis=0)
    summary["totals"] = {
        "pred_counts": np.sum([f["pred_counts"] for f in summary["frames"]],
                              axis=0).tolist(),
        "true_counts": np.sum([f["true_counts"] for f in summary["frames"]],
                              axis=0).tolist(),
        "confusion": tot_conf.tolist(),
        "pixel_accuracy": float(np.trace(tot_conf) / max(tot_conf.sum(), 1)),
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"wrote {n_panels} panels to {out_dir}")
    print(f"class counts (pred/true): "
          f"{summary['totals']['pred_counts']} / "
          f"{summary['totals']['true_counts']}  "
          f"pixel_acc={summary['totals']['pixel_accuracy']:.4f}")


def cmd_export(args):
    """Serialize the restored inference forward as a StableHLO artifact
    (jax.export) — the TPU-native analogue of the reference's end-of-training
    whole-model SavedModel save (reference: MainNumpy.py:177).  The artifact
    embeds the weights; `infer --exported FILE` (or any jax process via
    infer.export.load_exported) serves it without the model code."""
    from ultrasound_modeling_tpu.infer import export as ex

    if not args.ckpt and not getattr(args, "init_random", False):
        # same footgun guard as `serve`: an artifact of random weights is
        # never what a user wants unless they say so explicitly
        raise SystemExit(
            "export needs trained weights: pass --ckpt CKPT_DIR (or "
            "--init-random to deliberately export freshly initialized "
            "parameters, e.g. for artifact plumbing tests)")
    cfg = build_config(args)
    mcfg, tcfg = cfg.model, cfg.train
    h, w = mcfg.img_size
    sample_shape = (h, w, mcfg.in_channels)
    _, state = _restore_state(mcfg, tcfg, sample_shape, args.ckpt)
    platforms = (tuple(p.strip() for p in args.platforms.split(","))
                 if args.platforms else None)
    exported = ex.export_forward(mcfg, state, sample_shape,
                                 batch=args.batch or None,
                                 platforms=platforms,
                                 quantize=getattr(args, "quantize", None))
    out = args.out or f"{mcfg.name}.stablehlo"
    ex.save_exported(exported, out)
    batch_desc = args.batch or "symbolic"
    print(f"exported {mcfg.name} forward (batch={batch_desc}, "
          f"platforms={list(exported.platforms)}) -> {out} "
          f"({os.path.getsize(out)} bytes)")


def cmd_serve(args):
    """Serve inference over HTTP with dynamic micro-batching — one resident
    compiled forward instead of the reference's per-frame process fork +
    SavedModel reload (reference: TBIEvaluator.py:191-206,235-236).  Loads
    either a `cli export` StableHLO artifact (--exported) or a checkpoint
    (--ckpt, model rebuilt from the config, same restore path as `infer`).
    With --n-devices N the coalesced batches shard over the mesh's ``data``
    axis (padding buckets floored at N so every batch divides evenly)."""
    from ultrasound_modeling_tpu.infer.server import InferenceServer

    min_batch = 1
    max_batch = args.max_batch
    if args.exported:
        if args.n_devices and args.n_devices > 1:
            raise SystemExit(
                "--exported artifacts are lowered for one device; "
                "--n-devices needs --ckpt (model rebuilt and mesh-sharded), "
                "or run one serving process per device")
        if getattr(args, "quantize", None):
            raise SystemExit(
                "--quantize does nothing for --exported artifacts; "
                "quantize at export time: `export --quantize int8`")
        from ultrasound_modeling_tpu.infer.export import load_exported_meta
        fn, sample_shape, exported_batch = load_exported_meta(args.exported)
        if exported_batch is not None:
            # static-batch artifact: the only legal device batch is the
            # pinned size — collapse the padding buckets to exactly it
            min_batch = max_batch = exported_batch
            print(f"static-batch artifact: every device batch padded to "
                  f"{exported_batch}", flush=True)
        name = os.path.basename(args.exported)
    else:
        if not args.ckpt:
            raise SystemExit(
                "serve needs trained weights: pass --ckpt CKPT_DIR or "
                "--exported ARTIFACT (otherwise the server would answer "
                "from randomly initialized parameters)")
        cfg = build_config(args)
        mcfg = cfg.model
        h, w = mcfg.img_size
        sample_shape = (h, w, mcfg.in_channels)
        mesh = None
        if args.n_devices and args.n_devices > 1:
            if args.max_batch % args.n_devices:
                raise SystemExit(
                    "--max-batch must be a multiple of --n-devices")
            from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
            mesh = mesh_mod.make_mesh(n_data=args.n_devices)
            min_batch = args.n_devices
        fn = _make_forward(mcfg, cfg.train, sample_shape, args.ckpt,
                           mesh=mesh,
                           quantize=getattr(args, "quantize", None))
        name = mcfg.name

    server = InferenceServer(fn, sample_shape, host=args.host,
                             port=args.port, max_batch=max_batch,
                             window_ms=args.window_ms, model_name=name,
                             min_batch=min_batch,
                             max_pending=getattr(args, "max_pending", 0),
                             request_timeout=getattr(args, "request_timeout",
                                                     120.0))
    host, port = server.address
    if args.warmup:
        print(f"warming {len(server.batcher.buckets)} batch buckets "
              f"{server.batcher.buckets} ...", flush=True)
        server.batcher.warmup(sample_shape)
    print(f"serving {name} (frames {sample_shape}, max_batch "
          f"{max_batch}, window {args.window_ms} ms) "
          f"on http://{host}:{port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


def cmd_etl(args):
    from ultrasound_modeling_tpu.data.etl import run_etl
    objective = (args.objective if args.objective in ("iph", "waveform")
                 else int(args.objective))
    run_etl(args.raw, args.out, objective, max_workers=args.workers,
            label_mode=args.label_mode, split=args.split,
            test_size=args.test_size, split_seed=args.split_seed)


def cmd_bench(args):
    # Explicit flags WIN over the environment; with no flag, bench.py's own
    # defaults apply (a {128, 256} batch sweep reporting the measured-best
    # point — so this entry point reports the same headline as
    # `python bench.py`; pass --batch-size to pin one batch).
    if args.batch_size:
        os.environ["BENCH_BATCH"] = str(args.batch_size)
    if getattr(args, "bf16", False):
        os.environ["BENCH_BF16"] = "1"
    import runpy
    sys.argv = ["bench.py"]
    runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"), run_name="__main__")


def _honor_jax_platforms_env():
    """Make the documented ``JAX_PLATFORMS=cpu`` workflow actually work:
    site plugins (e.g. the axon TPU register) may force
    ``jax_platforms`` through ``jax.config`` at interpreter start, which
    silently overrides the env var — a "CPU" run then executes on the
    remote device.  If the user set JAX_PLATFORMS explicitly and the
    config disagrees, the env wins."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax
    have = jax.config.jax_platforms
    if have and have != want and not str(have).startswith(want):
        jax.config.update("jax_platforms", want)


def main(argv=None):
    _honor_jax_platforms_env()
    parser = argparse.ArgumentParser(prog="ultrasound_modeling_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train")
    _add_common(p)
    p.add_argument("--epochs", type=int, default=None)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval")
    _add_common(p)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("infer")
    _add_common(p)
    p.add_argument("--out", default=None)
    p.add_argument("--axis-dir", default=None)
    p.add_argument("--archive", default=None, metavar="DIR",
                   help="ETL'd archive folder with TestingData.npy + "
                        "TestingPaths.npy (the reference evaluator's input "
                        "— TBIEvaluator.py:177-181)")
    p.add_argument("--cascade", default=None, metavar="BRAIN_CKPT",
                   help="brain-mask checkpoint dir: run the two-stage "
                        "brain-mask -> bleed cascade "
                        "(TBIEvaluator.py:221-232)")
    p.add_argument("--cascade-model", default=None,
                   help="model family of the brain-mask checkpoint "
                        "(default: same as --model)")
    p.add_argument("--cascade-classes", type=int, default=2,
                   help="num classes of the brain-mask model (default 2)")
    p.add_argument("--cardiac", action="store_true",
                   help="group test rows into per-scan cardiac-cycle "
                        "batches by TestingPaths (TBIEvaluator.py:132-160)")
    p.add_argument("--max-frames", type=int, default=0,
                   help="render at most N frames (0 = all)")
    p.add_argument("--exported", default=None, metavar="FILE",
                   help="serve a `cli export` StableHLO artifact instead of "
                        "rebuilding the model from --ckpt (weights embedded)")
    p.add_argument("--select", default=None, metavar="SUBSTR",
                   help="only frames whose TestingPaths entry contains "
                        "SUBSTR (patient/scan selection — the reference's "
                        "findImage, TBIEvaluator.py:41-56)")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="int8 weight-only serving: kernels stored int8 with "
                        "per-channel scales, dequantized on-chip "
                        "(infer/quantize.py)")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("export")
    _add_common(p)
    p.add_argument("--out", default=None,
                   help="output artifact path (default <model>.stablehlo)")
    p.add_argument("--batch", type=int, default=0,
                   help="pin a static batch size (default 0 = symbolic "
                        "batch: one artifact serves any batch size)")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms, e.g. 'cpu,tpu' "
                        "(default: this process's backend)")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="embed int8 weights (per-channel scales, on-chip "
                        "dequant): ~4x smaller artifact than f32")
    p.add_argument("--init-random", action="store_true",
                   help="allow exporting without --ckpt (freshly "
                        "initialized weights — plumbing tests only)")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("serve")
    _add_common(p)
    p.add_argument("--exported", default=None, metavar="FILE",
                   help="serve a `cli export` StableHLO artifact (weights "
                        "embedded) instead of rebuilding from --ckpt")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000,
                   help="0 = pick a free port (printed at startup)")
    p.add_argument("--max-batch", type=int, default=64,
                   help="device batch ceiling for cross-request coalescing")
    p.add_argument("--window-ms", type=float, default=2.0,
                   help="max time a request waits for batch-mates")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile all padding buckets before listening")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="int8 weight-only serving from --ckpt "
                        "(infer/quantize.py)")
    p.add_argument("--max-pending", type=int, default=0,
                   help="admission budget in frames; requests beyond it get "
                        "503 + Retry-After instead of queueing unboundedly "
                        "(0 = 8 device batches; a single request larger "
                        "than this is always refused — split client-side)")
    p.add_argument("--request-timeout", type=float, default=120.0,
                   help="per-request deadline in seconds (expiry returns "
                        "504 and cancels not-yet-run chunks)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("etl")
    p.add_argument("--raw", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--objective", default="1",
                   choices=["0", "1", "iph", "waveform"],
                   help="0=brainMask, 1=bleed, iph=pizza_IPH subset, "
                        "waveform=harmonics->waveform synthesis "
                        "(DataFilePlayGround.py:21-83)")
    p.add_argument("--label-mode", default="v2", choices=["v2", "v1"],
                   help="bleed labels: v2=blurred soft blood>normal "
                        "(DataFilePlayGround.py:330-343), v1=hard "
                        "bloodMaskThick+1 (DataPreprocessing.py:122,144)")
    p.add_argument("--split", default="fold", choices=["fold", "random"],
                   help="fold=count%%10 file fold (v2), random=seeded "
                        "sklearn train_test_split (v1, "
                        "DataPreprocessing.py:174-195)")
    p.add_argument("--test-size", type=float, default=0.5,
                   help="random-split test fraction (v1 used 0.2/0.5)")
    p.add_argument("--split-seed", type=int, default=42)
    p.add_argument("--workers", type=int, default=4)
    p.set_defaults(fn=cmd_etl)

    p = sub.add_parser("bench")
    _add_common(p)
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
