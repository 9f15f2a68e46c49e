"""Metric logging: JSONL scalars (+ stdout), mirroring the reference's
TensorBoard scalar/image cadence (reference: MainNumpy.py:16-17,54-60,124-133)
without a TF dependency.

Scalars append to ``<dir>/scalars.jsonl`` as ``{"step": n, ...}`` lines;
image summaries save PNG side-by-side prediction/truth panels (the
reference's ``concat([pred, truth], axis=2)`` image summaries —
MainNumpy.py:58-60) when matplotlib is available.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, echo: bool = True,
                 tensorboard: bool = True):
        self.log_dir = log_dir
        self.echo = echo
        self._fh = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, "scalars.jsonl"), "a")
            if tensorboard:
                from ultrasound_modeling_tpu.utils.tb_writer import EventWriter
                self._tb = EventWriter(log_dir)

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._tb:
            # metric values only — rec's step/time bookkeeping keys would
            # become junk TensorBoard series
            self._tb.scalars(int(step),
                             {k: float(v) for k, v in values.items()})
        if self.echo:
            body = ", ".join(f"{k}={v:.5g}" for k, v in values.items())
            print(f"[step {step}] {body}")

    def images(self, step: int, tag: str, pred: np.ndarray,
               truth: np.ndarray) -> None:
        """Side-by-side panel (reference: MainNumpy.py:58-60) — written as a
        real TensorBoard image summary on the step axis (the reference's
        ``tf.summary.image`` cadence, MainNumpy.py:54-60,108-113) AND as a
        loose PNG under ``<dir>/images/`` for shell-level inspection."""
        if not self.log_dir:
            return
        panel = np.concatenate([np.asarray(pred), np.asarray(truth)], axis=1)
        gray = panel[..., -1] if panel.ndim == 3 else panel
        if self._tb:
            lo, hi = float(gray.min()), float(gray.max())
            u8 = np.zeros_like(gray, dtype=np.uint8) if hi <= lo else \
                np.clip((gray - lo) / (hi - lo) * 255.0, 0, 255).astype(np.uint8)
            self._tb.image(tag, u8, int(step))
        try:
            import matplotlib
            matplotlib.use("Agg")
            from matplotlib import pyplot as plt
        except Exception:
            return
        img_dir = os.path.join(self.log_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.imshow(gray, cmap="magma")
        ax.set_title(f"{tag} step {step} (pred | truth)")
        ax.axis("off")
        fig.savefig(os.path.join(img_dir, f"{tag}_{step}.png"))
        plt.close(fig)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._tb:
            self._tb.close()
            self._tb = None
