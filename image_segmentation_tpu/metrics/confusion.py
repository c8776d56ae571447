"""Segmentation metrics: confusion accumulation + Dice/IoU/Accuracy.

Reference semantics (reference utils/MetricsHistory.py:55-128): per image,
argmax the prediction, one-hot both, accumulate per-class TP/FP/FN/TN in
float64; at epoch end compute per-class IoU = TP/(TP+FP+FN),
Dice = 2TP/(2TP+FP+FN), Acc = (TP+TN)/total, then macro-average over
classes with `ignore_index` masked out of the MEAN (not out of the
pixels).

TPU-native design: the whole accumulation reduces to a (C, C) confusion
matrix — `conf[t, p] = #pixels with label t predicted p` — computed on
device as a one-hot × one-hot matmul (MXU work, no host sync per image),
then summed in float64 on the host or psum'd across a mesh. TP/FP/FN/TN
are linear functionals of `conf`, so the epoch metrics are bit-identical
to the reference's per-image boolean algebra.

`MetricsHistory` keeps the reference class's API (reset / accumulate /
compute_epoch_metrics / history getters) so the training engine mirrors
reference utils/training.py usage, but it accepts either host numpy
per-image pairs or pre-reduced device confusion matrices.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_counts(
    preds: jnp.ndarray, labels: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """(...,) int predictions × labels → (C, C) float32 confusion matrix.

    conf[t, p] = number of pixels with true class t predicted as p.
    Implemented as one-hot(label)ᵀ @ one-hot(pred): a (P, C)·(P, C) matmul
    that XLA tiles onto the MXU.
    """
    t = jax.nn.one_hot(labels.reshape(-1), num_classes, dtype=jnp.float32)
    p = jax.nn.one_hot(preds.reshape(-1), num_classes, dtype=jnp.float32)
    return jnp.einsum("nt,np->tp", t, p)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_counts_masked(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    num_classes: int,
) -> jnp.ndarray:
    """Confusion matrix counting only pixels where `valid` is True — used
    for fixed-shape eval batches where the padding region must not count."""
    t = jax.nn.one_hot(labels.reshape(-1), num_classes, dtype=jnp.float32)
    t = t * valid.reshape(-1, 1).astype(jnp.float32)
    p = jax.nn.one_hot(preds.reshape(-1), num_classes, dtype=jnp.float32)
    return jnp.einsum("nt,np->tp", t, p)


def counts_from_confusion(conf: np.ndarray):
    """(C, C) confusion → per-class (tp, fp, fn, tn) in the matrix's dtype."""
    conf = np.asarray(conf)
    tp = np.diag(conf).copy()
    fp = conf.sum(axis=0) - tp  # predicted c but true other
    fn = conf.sum(axis=1) - tp  # true c but predicted other
    tn = conf.sum() - tp - fp - fn
    return tp, fp, fn, tn


def metrics_from_counts(tp, fp, fn, tn, mask: Optional[np.ndarray] = None):
    """Per-class + macro Dice/IoU/Acc with the reference's formulas
    (utils/MetricsHistory.py:106-113). Per-class division is unguarded
    like the reference — a class absent from both pred and GT yields nan.
    The MACRO means average over the classes actually present (nanmean):
    one empty class would otherwise poison the mean to nan for the whole
    run and permanently block best-mIoU checkpointing. On any val set
    where every non-ignored class appears (the real Pet splits) this is
    numerically identical to the reference's plain mean."""
    with np.errstate(divide="ignore", invalid="ignore"):
        per_class_iou = tp / (tp + fp + fn)
        per_class_dice = (2 * tp) / (2 * tp + fp + fn)
        per_class_acc = (tp + tn) / (tp + tn + fp + fn)
    if mask is None:
        mask = np.ones_like(tp, dtype=bool)
    def _present_mean(a):
        v = a[mask]
        v = v[np.isfinite(v)]
        return float(v.mean()) if v.size else float("nan")

    mean_iou = _present_mean(per_class_iou)
    mean_dice = _present_mean(per_class_dice)
    mean_acc = _present_mean(per_class_acc)
    return {
        "per_class_iou": per_class_iou,
        "per_class_dice": per_class_dice,
        "per_class_acc": per_class_acc,
        "mean_iou": mean_iou,
        "mean_dice": mean_dice,
        "mean_acc": mean_acc,
    }


class MetricsHistory:
    """Epoch-level metric accumulator mirroring the reference class's API
    (reference utils/MetricsHistory.py:4-183), float64 on host."""

    def __init__(self, num_classes: int, ignore_index: Optional[int] = None):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.confusion = np.zeros((num_classes, num_classes), dtype=np.float64)

        self.epoch_mean_dice_history = []
        self.epoch_mean_iou_history = []
        self.epoch_mean_acc_history = []
        self.epoch_per_class_dice_history = []
        self.epoch_per_class_iou_history = []
        self.epoch_per_class_acc_history = []
        self.last_per_class_iou = None
        self.last_per_class_dice = None
        self.last_per_class_acc = None

        self.mask = np.ones(num_classes, dtype=bool)
        if ignore_index is not None and 0 <= ignore_index < num_classes:
            self.mask[ignore_index] = False

    def reset(self):
        self.confusion[:] = 0.0

    def accumulate(self, pred: np.ndarray, label: np.ndarray):
        """Accumulate one image: pred (H, W, C) scores or (H, W) hard ids;
        label (H, W) int."""
        pred = np.asarray(pred)
        if pred.ndim == 3:
            pred = pred.argmax(axis=-1)
        label = np.asarray(label).reshape(pred.shape)
        idx = label.astype(np.int64) * self.num_classes + pred.astype(np.int64)
        conf = np.bincount(
            idx.reshape(-1), minlength=self.num_classes**2
        ).reshape(self.num_classes, self.num_classes)
        self.confusion += conf

    def accumulate_confusion(self, conf) -> None:
        """Accumulate a pre-reduced (C, C) confusion matrix (device path)."""
        self.confusion += np.asarray(conf, dtype=np.float64)

    def compute_epoch_metrics(self):
        tp, fp, fn, tn = counts_from_confusion(self.confusion)
        m = metrics_from_counts(tp, fp, fn, tn, self.mask)

        self.epoch_mean_iou_history.append(m["mean_iou"])
        self.epoch_mean_dice_history.append(m["mean_dice"])
        self.epoch_mean_acc_history.append(m["mean_acc"])
        self.epoch_per_class_iou_history.append(m["per_class_iou"])
        self.epoch_per_class_dice_history.append(m["per_class_dice"])
        self.epoch_per_class_acc_history.append(m["per_class_acc"])
        self.last_per_class_iou = m["per_class_iou"]
        self.last_per_class_dice = m["per_class_dice"]
        self.last_per_class_acc = m["per_class_acc"]
        return m["mean_dice"], m["mean_iou"], m["mean_acc"]

    # Reference getter API (utils/MetricsHistory.py:152-183)
    def get_ignore_index(self):
        return self.ignore_index

    def get_num_classes(self):
        return self.num_classes

    def get_mean_dice_history(self):
        return self.epoch_mean_dice_history

    def get_mean_iou_history(self):
        return self.epoch_mean_iou_history

    def get_mean_acc_history(self):
        return self.epoch_mean_acc_history

    def get_class_dice_history(self):
        return self.epoch_per_class_dice_history

    def get_class_iou_history(self):
        return self.epoch_per_class_iou_history

    def get_class_acc_history(self):
        return self.epoch_per_class_acc_history

    def get_last_per_class_dice(self):
        return self.last_per_class_dice

    def get_last_per_class_iou(self):
        return self.last_per_class_iou

    def get_last_per_class_acc(self):
        return self.last_per_class_acc

    def state_dict(self):
        return {
            "confusion": self.confusion,
            "mean_dice": list(self.epoch_mean_dice_history),
            "mean_iou": list(self.epoch_mean_iou_history),
            "mean_acc": list(self.epoch_mean_acc_history),
            "per_class_dice": [np.asarray(x) for x in self.epoch_per_class_dice_history],
            "per_class_iou": [np.asarray(x) for x in self.epoch_per_class_iou_history],
            "per_class_acc": [np.asarray(x) for x in self.epoch_per_class_acc_history],
        }

    def load_state_dict(self, d):
        self.confusion = np.asarray(d["confusion"], dtype=np.float64)
        self.epoch_mean_dice_history = list(d["mean_dice"])
        self.epoch_mean_iou_history = list(d["mean_iou"])
        self.epoch_mean_acc_history = list(d["mean_acc"])
        self.epoch_per_class_dice_history = [np.asarray(x) for x in d["per_class_dice"]]
        self.epoch_per_class_iou_history = [np.asarray(x) for x in d["per_class_iou"]]
        self.epoch_per_class_acc_history = [np.asarray(x) for x in d["per_class_acc"]]
        # the reference getters stay answerable after a restore: the last
        # per-class vectors are the tails of the saved histories
        self.last_per_class_dice = (
            self.epoch_per_class_dice_history[-1]
            if self.epoch_per_class_dice_history else None
        )
        self.last_per_class_iou = (
            self.epoch_per_class_iou_history[-1]
            if self.epoch_per_class_iou_history else None
        )
        self.last_per_class_acc = (
            self.epoch_per_class_acc_history[-1]
            if self.epoch_per_class_acc_history else None
        )
