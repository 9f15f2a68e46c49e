"""Accuracy cost of int8 weight-only serving: train the model on synthetic
data, then compare held-out per-class Dice between the full-precision forward
and the int8-quantized forward (infer/quantize.py).

Usage: python benchmarks/quantize_eval.py [--model transunet] [--epochs 100]
Prints one JSON line with both metric sets and the bleed-Dice delta.
"""

import argparse
import dataclasses as dc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultrasound_modeling_tpu.utils import jaxcache  # noqa: F401


def _eval_forward(fwd, ds, num_classes, batch=16):
    import jax.numpy as jnp
    from ultrasound_modeling_tpu.data import labels as labels_mod
    from ultrasound_modeling_tpu.train import metrics

    mstate = metrics.zeros(num_classes)
    while True:
        x, y, terminator = ds.next_test(batch)
        probs = fwd(jnp.asarray(x))
        yv = labels_mod.label2vec(jnp.asarray(y), num_classes)
        mstate = metrics.update(mstate, yv, probs, jnp.zeros(()))
        if terminator:
            break
    return {k: float(v) for k, v in metrics.summarize(mstate).items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="transunet")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--n-test", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--loss", default="cce_smooth")
    args = ap.parse_args()

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.data.pipeline import Dataset
    from ultrasound_modeling_tpu.infer.quantize import (
        make_quantized_forward, quantized_fraction, quantize_params)
    from ultrasound_modeling_tpu.train import step as step_mod
    from ultrasound_modeling_tpu.train.loop import Trainer
    from ultrasound_modeling_tpu.utils.logging import MetricLogger

    cfg = default_config(args.model)
    cfg = cfg.replace(
        train=dc.replace(cfg.train, batch_size=args.batch, loss=args.loss,
                         epochs=args.epochs,
                         eval_every_epochs=max(1, args.epochs // 4)))
    h, w = cfg.model.img_size
    ds = Dataset.synthetic(n_train=args.n_train, n_test=args.n_test,
                           height=h, width=w, n_disp=cfg.model.in_channels)
    trainer = Trainer(cfg, ds, logger=MetricLogger(echo=False))
    trainer.fit(args.epochs)

    nc = cfg.model.num_classes
    fwd_full = step_mod.make_forward(trainer.model)
    full = _eval_forward(lambda x: fwd_full(trainer.state, x), ds, nc,
                         args.batch)
    qfwd = make_quantized_forward(trainer.model, trainer.state)
    quant = _eval_forward(qfwd, ds, nc, args.batch)
    frac = quantized_fraction(quantize_params(trainer.state.params))

    keys = ["dice_c0", "dice_c1", "dice_c2", "mean_dice", "f1"]
    print(json.dumps({
        "model": args.model, "epochs": args.epochs, "loss": args.loss,
        "quantized_fraction": round(frac, 4),
        "full": {k: round(full[k], 4) for k in keys},
        "int8": {k: round(quant[k], 4) for k in keys},
        "dice_c2_delta": round(quant["dice_c2"] - full["dice_c2"], 5),
    }))


if __name__ == "__main__":
    main()
