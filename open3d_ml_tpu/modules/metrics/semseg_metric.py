"""Accumulated confusion-matrix metric for semantic segmentation.

Rebuild of /root/reference/ml3d/torch/modules/metrics/semseg_metric.py:5-126:
per-batch confusion matrices (bincount trick) are accumulated on the host;
acc()/iou() return per-class values with the mean appended, using NaN for
absent classes and nanmean overall.
"""

import numpy as np


def confusion_matrix_device(scores, labels, valid_mask, num_classes):
    """On-device confusion matrix [C, C] so only C^2 ints cross the host
    boundary per step (the reference ships full per-point scores to the CPU,
    semseg_metric.py:17)."""
    import jax.numpy as jnp
    pred = jnp.argmax(scores.reshape(-1, num_classes), axis=-1)
    labels = labels.reshape(-1)
    valid = valid_mask.reshape(-1)
    flat = jnp.where(valid, labels * num_classes + pred,
                     num_classes * num_classes)
    counts = jnp.bincount(flat, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


class SemSegMetric:

    def __init__(self):
        self.confusion_matrix = None
        self.num_classes = None

    def reset(self):
        self.confusion_matrix = None
        self.num_classes = None

    @staticmethod
    def get_confusion_matrix(scores, labels):
        """Confusion matrix [C, C] (rows = gt, cols = pred).

        Args:
            scores: [N, C] logits or probabilities (numpy or jax array).
            labels: [N] int gt labels in dense class space.
        """
        scores = np.asarray(scores)
        labels = np.asarray(labels).reshape(-1)
        c = scores.shape[-1]
        pred = scores.reshape(-1, c).argmax(axis=-1)
        flat = labels * c + pred
        cm = np.bincount(flat, minlength=c * c).reshape(c, c)
        return cm

    def update(self, scores, labels):
        cm = self.get_confusion_matrix(scores, labels)
        self.update_cm(cm)

    def update_cm(self, cm):
        """Accumulate a precomputed [C, C] confusion matrix (e.g. one
        computed on device by confusion_matrix_device)."""
        cm = np.asarray(cm)
        if self.confusion_matrix is None:
            self.confusion_matrix = cm.copy()
            self.num_classes = cm.shape[0]
        else:
            self.confusion_matrix += cm

    def __iadd__(self, other):
        if self.confusion_matrix is None:
            self.confusion_matrix = other.confusion_matrix.copy()
            self.num_classes = other.num_classes
        else:
            self.confusion_matrix += other.confusion_matrix
        return self

    def acc(self):
        """Per-class accuracy + overall mean (NaN for absent classes)."""
        if self.confusion_matrix is None:
            return []
        cm = self.confusion_matrix
        accs = []
        for c in range(self.num_classes):
            denom = cm[c, :].sum()
            accs.append(cm[c, c] / denom if denom > 0 else np.nan)
        accs.append(np.nanmean(accs))
        return accs

    def iou(self):
        """Per-class IoU + overall mean (NaN for absent classes)."""
        if self.confusion_matrix is None:
            return []
        cm = self.confusion_matrix
        ious = []
        for c in range(self.num_classes):
            tp = cm[c, c]
            denom = cm[c, :].sum() + cm[:, c].sum() - tp
            ious.append(tp / denom if denom > 0 else np.nan)
        ious.append(np.nanmean(ious))
        return ious
