"""Streaming segmentation metrics with an on-device confusion matrix.

The reference computes np.bincount confusion updates on the host per image
(util/metrics.py:26-68).  Here the histogram update is a single fused
on-device op — predictions never leave HBM during eval; only the final
(n, n) matrix is pulled to the host for scoring.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..data.label_maps import CLASS_NAMES_16, CLASS_NAMES_19


def confusion_update(
    conf: jnp.ndarray, label_true: jnp.ndarray, label_pred: jnp.ndarray, n_class: int
) -> jnp.ndarray:
    """Add this batch's confusion counts (valid = 0 <= gt < n_class).

    Equivalent to the reference _fast_hist (util/metrics.py:32-37) but
    vectorized on device.
    """
    lt = label_true.reshape(-1).astype(jnp.int32)
    lp = label_pred.reshape(-1).astype(jnp.int32)
    mask = (lt >= 0) & (lt < n_class)
    # one-hot matmul instead of scatter-add: the MXU does this in one pass,
    # whereas a 2M-element scatter serializes on TPU
    gt_oh = jax.nn.one_hot(jnp.where(mask, lt, n_class), n_class + 1,
                           dtype=jnp.float32)[:, :n_class]
    pr_oh = jax.nn.one_hot(lp, n_class, dtype=jnp.float32)
    hist = jnp.einsum("pg,pk->gk", gt_oh, pr_oh,
                      precision=jax.lax.Precision.HIGHEST)
    return conf + hist.astype(conf.dtype)


@jax.jit
def _update19(conf, lt, lp):
    return confusion_update(conf, lt, lp, 19)


def scores_from_confusion(hist: np.ndarray) -> tuple[dict, dict]:
    """Overall/mean acc, fwavacc, per-class IoU, mIoU.

    Mirrors runningScore.get_scores (util/metrics.py:43-65) including
    nan-mean over absent classes.
    """
    hist = np.asarray(hist, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
        mean_iu = np.nanmean(iu)
        freq = hist.sum(axis=1) / hist.sum()
        fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
    cls_iu = dict(zip(range(len(iu)), iu))
    scores = {
        "overall_acc": acc,
        "mean_acc": acc_cls,
        "fwavacc": fwavacc,
        "mean_iou": mean_iu,
    }
    if len(iu) == 16:
        # SYNTHIA protocol also reports mIoU over 13 classes, excluding
        # wall(3)/fence(4)/pole(5)
        keep = [i for i in range(16) if i not in (3, 4, 5)]
        scores["mean_iou_13"] = float(np.nanmean(iu[keep]))
    return scores, cls_iu


@dataclasses.dataclass
class RunningScore:
    """Streaming confusion-matrix scorer; update stays on device."""

    n_classes: int = 19

    def __post_init__(self):
        self.reset()

    def reset(self):
        self.confusion = jnp.zeros((self.n_classes, self.n_classes), jnp.int32)

    def update(self, label_true, label_pred):
        if self.n_classes == 19:
            self.confusion = _update19(self.confusion, jnp.asarray(label_true), jnp.asarray(label_pred))
        else:
            self.confusion = confusion_update(
                self.confusion, jnp.asarray(label_true), jnp.asarray(label_pred), self.n_classes
            )

    def get_scores(self) -> tuple[dict, dict]:
        return scores_from_confusion(np.asarray(self.confusion))

    def pretty(self) -> str:
        scores, cls_iu = self.get_scores()
        names = CLASS_NAMES_19 if self.n_classes == 19 else CLASS_NAMES_16
        lines = [
            f"===>{names[i]}:{cls_iu[i]}" for i in range(self.n_classes)
        ]
        lines += [f"{k}: {v}" for k, v in scores.items()]
        return "\n".join(lines)
