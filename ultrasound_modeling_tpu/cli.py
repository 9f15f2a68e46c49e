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
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
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
                   help="pipeline-parallel stages over the 'model' mesh axis "
                        "(GPipe schedule on the scanned transformer stack; "
                        "transunet only; mutually exclusive with --tp)")
    p.add_argument("--pp-micro", type=int, default=0,
                   help="pipeline microbatches (default 2*stages)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay float32)")
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
    model = dc.replace(cfg.model, num_classes=args.num_classes)
    if getattr(args, "bf16", False):
        model = dc.replace(model, compute_dtype="bfloat16")
    train = cfg.train
    if args.batch_size:
        train = dc.replace(train, batch_size=args.batch_size)
    train = dc.replace(train, seed=args.seed)
    return cfg.replace(model=model, train=train)


def cmd_train(args):
    import jax
    from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
    from ultrasound_modeling_tpu.train.loop import Trainer
    from ultrasound_modeling_tpu.utils.checkpoint import Checkpointer
    from ultrasound_modeling_tpu.utils.logging import MetricLogger

    cfg = build_config(args)
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


def cmd_infer(args):
    import numpy as np
    import jax.numpy as jnp
    from ultrasound_modeling_tpu.infer import evaluate as ev
    from ultrasound_modeling_tpu.infer import render
    from ultrasound_modeling_tpu.train.loop import Trainer
    from ultrasound_modeling_tpu.train import step as step_mod
    from ultrasound_modeling_tpu.utils.checkpoint import Checkpointer
    from ultrasound_modeling_tpu.data import labels as labels_mod

    cfg = build_config(args)
    ds = build_dataset(cfg, args)
    trainer = Trainer(cfg, ds)
    if args.ckpt:
        trainer.state = Checkpointer(args.ckpt).restore(trainer.state)
    forward = step_mod.make_forward(trainer.model)

    x = np.asarray(ds.x_te)
    y = np.asarray(ds.y_te)
    probs = ev.run_inference(lambda b: forward(trainer.state, b), x,
                             batch_size=min(16, x.shape[0]))
    out_dir = args.out or "inference_out"
    axes = None
    if args.axis_dir and os.path.isdir(args.axis_dir):
        axes = render.load_axes(args.axis_dir)
    for i in range(probs.shape[0]):
        comp = np.asarray(ev.composite_probability(jnp.asarray(probs[i])))
        render.render_panels(
            os.path.join(out_dir, f"frame_{i:04d}.png"), comp, y[i],
            prob_bleed=probs[i, :, :, -1], axes=axes, title=f"frame {i}")
    print(f"wrote {probs.shape[0]} panels to {out_dir}")


def cmd_etl(args):
    from ultrasound_modeling_tpu.data.etl import run_etl
    objective = args.objective if args.objective == "iph" else int(args.objective)
    run_etl(args.raw, args.out, objective, max_workers=args.workers)


def cmd_bench(args):
    os.environ.setdefault("BENCH_BATCH", str(args.batch_size or 32))
    import runpy
    sys.argv = ["bench.py"]
    runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"), run_name="__main__")


def main(argv=None):
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
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("etl")
    p.add_argument("--raw", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--objective", default="1", choices=["0", "1", "iph"],
                   help="0=brainMask, 1=bleed, iph=pizza_IPH subset")
    p.add_argument("--workers", type=int, default=4)
    p.set_defaults(fn=cmd_etl)

    p = sub.add_parser("bench")
    _add_common(p)
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
