"""On-device metrics: confusion-matrix accumulation -> Dice / IoU / P / R / F1.

The reference computes Keras Precision/Recall/MeanIoU on *rounded*
probabilities, flattening all classes together (reference: MainNumpy.py:49-53,
100-106), class-2-only variants on the last channel (MainNumpy.py:104-105),
and manual F1 = 2PR/(P+R) (MainNumpy.py:121-122).  Under data parallelism it
gathers per-replica outputs to the host and updates metrics there
(reference: MainParallel.py:158-163) — strictly worse than reducing on device.

Here metrics are accumulated on device as small integer tensors that are
trivially ``psum``-able across a mesh:

* ``binary_counts`` — TP/FP/FN/TN over thresholded (rounded) probabilities,
  flattening all classes, exactly mirroring the Keras semantics; plus the
  class-2-only (bleed) variant.
* ``confusion_matrix`` — argmax-based ``[C, C]`` confusion, from which
  per-class Dice / IoU / precision / recall / F1 derive.

All functions are jit-safe; ``MetricState`` is a pytree and supports ``+``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


AUC_BINS = 200  # histogram resolution (≙ Keras AUC num_thresholds=200)


class MetricState(NamedTuple):
    """Accumulable metric state (a pytree; add states to merge)."""

    binary: jnp.ndarray        # [4] TP, FP, FN, TN over all classes
    binary_c2: jnp.ndarray     # [4] same, bleed channel only
    confusion: jnp.ndarray     # [C, C] argmax confusion (rows=true, cols=pred)
    auc_hist: jnp.ndarray      # [2, 2, AUC_BINS] (all|c2, pos|neg) pred hists
    loss_sum: jnp.ndarray      # scalar
    count: jnp.ndarray         # scalar batch count

    def __add__(self, other: "MetricState") -> "MetricState":
        return jax.tree.map(lambda a, b: a + b, self, other)


def zeros(num_classes: int = 3) -> MetricState:
    return MetricState(
        binary=jnp.zeros(4, jnp.float32),
        binary_c2=jnp.zeros(4, jnp.float32),
        confusion=jnp.zeros((num_classes, num_classes), jnp.float32),
        auc_hist=jnp.zeros((2, 2, AUC_BINS), jnp.float32),
        loss_sum=jnp.zeros((), jnp.float32),
        count=jnp.zeros((), jnp.float32))


def _binary_counts(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Keras Precision/Recall semantics on rounded values: flatten, threshold
    at 0.5 (rounding first makes them identical)."""
    t = (jnp.round(y_true) > 0.5).reshape(-1)
    p = (jnp.round(y_pred) > 0.5).reshape(-1)
    tp = jnp.sum(t & p)
    fp = jnp.sum(~t & p)
    fn = jnp.sum(t & ~p)
    tn = jnp.sum(~t & ~p)
    return jnp.stack([tp, fp, fn, tn]).astype(jnp.float32)


def confusion_matrix(y_true: jnp.ndarray, probs: jnp.ndarray,
                     num_classes: int) -> jnp.ndarray:
    """Argmax-based [C, C] confusion accumulated with one scatter-add."""
    t = jnp.argmax(y_true, axis=-1).reshape(-1)
    p = jnp.argmax(probs, axis=-1).reshape(-1)
    idx = t * num_classes + p
    flat = jnp.zeros(num_classes * num_classes, jnp.float32).at[idx].add(1.0)
    return flat.reshape(num_classes, num_classes)


def _auc_hists(y_true: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
    """[2, AUC_BINS] histograms of predicted probability, split by ground
    truth (positives row 0, negatives row 1).  Bucket ``floor(p * BINS)``
    ≙ the fixed-threshold binning of keras.metrics.AUC
    (reference: TBIPixelCNN.py:271-280)."""
    t = (jnp.round(y_true) > 0.5).reshape(-1)
    p = jnp.clip(probs.reshape(-1), 0.0, 1.0)
    idx = jnp.minimum((p * AUC_BINS).astype(jnp.int32), AUC_BINS - 1)
    pos = jnp.zeros(AUC_BINS, jnp.float32).at[idx].add(
        t.astype(jnp.float32))
    neg = jnp.zeros(AUC_BINS, jnp.float32).at[idx].add(
        (~t).astype(jnp.float32))
    return jnp.stack([pos, neg])


def update(state: MetricState, y_true: jnp.ndarray, probs: jnp.ndarray,
           loss: jnp.ndarray) -> MetricState:
    c = state.confusion.shape[0]
    return state + MetricState(
        binary=_binary_counts(y_true, probs),
        binary_c2=_binary_counts(y_true[..., -1], probs[..., -1]),
        confusion=confusion_matrix(y_true, probs, c),
        auc_hist=jnp.stack([
            _auc_hists(y_true, probs),
            _auc_hists(y_true[..., -1], probs[..., -1])]),
        loss_sum=jnp.asarray(loss, jnp.float32),
        count=jnp.ones((), jnp.float32))


def _roc_auc(hists: jnp.ndarray) -> jnp.ndarray:
    """Trapezoidal ROC AUC from (pos, neg) prediction histograms."""
    pos, neg = hists[0], hists[1]
    # TP(threshold_j) = # positives in buckets >= j: reversed cumsum, with a
    # leading "threshold below 0" point where TPR = FPR = 1.
    tp = jnp.concatenate([jnp.cumsum(pos[::-1])[::-1], jnp.zeros(1)])
    fp = jnp.concatenate([jnp.cumsum(neg[::-1])[::-1], jnp.zeros(1)])
    tpr = tp / jnp.maximum(tp[0], 1.0)
    fpr = fp / jnp.maximum(fp[0], 1.0)
    return jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) * 0.5)


def _prf(counts: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    tp, fp, fn, _ = counts
    precision = tp / jnp.maximum(tp + fp, 1.0)
    recall = tp / jnp.maximum(tp + fn, 1.0)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    return {"precision": precision, "recall": recall, "f1": f1}


def summarize(state: MetricState) -> Dict[str, jnp.ndarray]:
    """Derive the full scalar metric set from an accumulated state."""
    out = {}
    for key, counts in (("", state.binary), ("c2_", state.binary_c2)):
        for name, val in _prf(counts).items():
            out[key + name] = val
    cm = state.confusion
    tp = jnp.diag(cm)
    support_true = cm.sum(axis=1)
    support_pred = cm.sum(axis=0)
    union = support_true + support_pred - tp
    iou = tp / jnp.maximum(union, 1.0)
    dice = 2 * tp / jnp.maximum(support_true + support_pred, 1.0)
    # Keras MeanIoU averages only over classes that appear (nonzero union)
    # — a bleed-free eval fold must not deflate the mean by an absent
    # class's 0/0.
    present = (union > 0).astype(iou.dtype)
    n_present = jnp.maximum(present.sum(), 1.0)
    out["mean_iou"] = (iou * present).sum() / n_present
    out["mean_dice"] = (dice * present).sum() / n_present
    for c in range(cm.shape[0]):
        out[f"dice_c{c}"] = dice[c]
        out[f"iou_c{c}"] = iou[c]
    out["accuracy"] = tp.sum() / jnp.maximum(cm.sum(), 1.0)
    out["auc"] = _roc_auc(state.auc_hist[0])
    out["c2_auc"] = _roc_auc(state.auc_hist[1])
    out["loss"] = state.loss_sum / jnp.maximum(state.count, 1.0)
    return out
