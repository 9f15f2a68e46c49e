"""Accuracy harness: train a model family on synthetic data and report
per-class Dice on the held-out fold (the BASELINE.md accuracy row).

Synthetic frames mimic the ETL output (soft labels, brain ellipse + bleed
blob, displacement fields zeroed outside the brain — data/synthetic.py), so
this measures the full pipeline's ability to learn the segmentation task
end-to-end; real-data Dice requires the clinical .mat archive.

Usage: python benchmarks/train_synthetic_dice.py [--model resnest_unet]
       [--epochs 20] [--n-train 128] [--batch 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnest_unet")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--n-test", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--vit-learned-pos", action="store_true",
                    help="learnable position embeddings (framework "
                         "extension; reference ViT has constant zeros)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override base learning rate")
    ap.add_argument("--loss", default=None,
                    help="override loss family (e.g. factor_scaled)")
    ap.add_argument("--scan", action="store_true",
                    help="lax.scan'd whole-epoch device program")
    ap.add_argument("--vit-conv-stem", action="store_true",
                    help="small strided conv stem before the patch embed "
                         "(framework extension; see models/vit.py)")
    ap.add_argument("--class-factor", default=None,
                    help="comma-separated per-class loss scale override "
                         "(factor-family losses), e.g. '0.05,0.03,0.92'")
    ap.add_argument("--seed", type=int, default=None,
                    help="override the train init/shuffle seed (run-to-run "
                         "jitter checks, e.g. bf16-vs-f32 A/B)")
    args = ap.parse_args()

    import dataclasses as dc

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.data.pipeline import Dataset
    from ultrasound_modeling_tpu.train.loop import Trainer
    from ultrasound_modeling_tpu.utils.logging import MetricLogger

    cfg = default_config(args.model)
    model_cfg = cfg.model
    if args.bf16:
        model_cfg = dc.replace(model_cfg, compute_dtype="bfloat16")
    train_cfg = dc.replace(cfg.train, batch_size=args.batch,
                           eval_every_epochs=max(1, args.epochs // 4),
                           epochs=args.epochs)
    if args.loss:
        train_cfg = dc.replace(train_cfg, loss=args.loss)
    if args.lr:
        train_cfg = dc.replace(train_cfg, learning_rate=args.lr)
    if args.class_factor:
        train_cfg = dc.replace(train_cfg, class_factor=tuple(
            float(v) for v in args.class_factor.split(",")))
    if args.seed is not None:
        train_cfg = dc.replace(train_cfg, seed=args.seed)
    if args.vit_learned_pos:
        model_cfg = dc.replace(model_cfg, vit_learned_pos=True)
    if args.vit_conv_stem:
        model_cfg = dc.replace(model_cfg, vit_conv_stem=True)
    if args.scan:
        train_cfg = dc.replace(train_cfg, scan_epochs=True)
    cfg = cfg.replace(model=model_cfg, train=train_cfg)
    h, w = cfg.model.img_size
    ds = Dataset.synthetic(n_train=args.n_train, n_test=args.n_test,
                           height=h, width=w, n_disp=cfg.model.in_channels)
    trainer = Trainer(cfg, ds, logger=MetricLogger(echo=False))
    t0 = time.time()
    trainer.fit(args.epochs)
    final = trainer.evaluate(epoch=args.epochs)
    out = {
        "model": args.model, "epochs": args.epochs,
        "loss": cfg.train.loss, "dtype": "bf16" if args.bf16 else "f32",
        "seed": cfg.train.seed,
        **({"class_factor": list(cfg.train.class_factor)}
           if args.class_factor else {}),
        "train_minutes": round((time.time() - t0) / 60, 2),
        "dice_c0": round(final["dice_c0"], 4),
        "dice_c1": round(final["dice_c1"], 4),
        "dice_c2": round(final["dice_c2"], 4),
        "mean_dice": round(final["mean_dice"], 4),
        "f1": round(final["f1"], 4),
        "mean_iou": round(final["mean_iou"], 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
