"""Semantic segmentation loss with ignored-label masking.

Rebuild of /root/reference/ml3d/torch/modules/losses/semseg_loss.py:7-54 in
functional JAX form. The reference *compacts* valid rows (dynamic shape);
under XLA we keep static shapes and mask instead: ignored labels get zero
weight in the normalized cross-entropy, which is numerically identical.
"""

import jax
import jax.numpy as jnp


def filter_valid_label(scores, labels, num_classes, ignored_label_inds):
    """Build (remapped_labels, valid_mask) for loss/metric computation.

    Labels in ignored_label_inds are masked out; remaining labels are shifted
    down so the class axis stays dense (reference semseg_loss.py:18-36).

    Args:
        scores: [..., num_classes] logits (unused, kept for API parity).
        labels: [...] int labels in the *raw* label space.

    Returns:
        (labels_remapped [...], valid_mask [...] bool)
    """
    valid = jnp.ones(labels.shape, bool)
    for ign in ignored_label_inds:
        valid &= labels != ign
    reducer = jnp.zeros(labels.shape, labels.dtype)
    for ign in sorted(ignored_label_inds):
        reducer += (labels > ign).astype(labels.dtype)
    remapped = jnp.where(valid, labels - reducer, 0)
    remapped = jnp.clip(remapped, 0, num_classes - 1)
    return remapped, valid


class SemSegLoss:
    """Weighted cross-entropy for semantic segmentation.

    Mirrors the reference SemSegLoss (semseg_loss.py:40-54): per-class
    weights derived from dataset class frequencies when provided.
    """

    def __init__(self, pipeline, model, dataset):
        self.num_classes = model.cfg.num_classes
        self.ignored_label_inds = model.cfg.get("ignored_label_inds", [])
        self.class_weights = None
        if (dataset is not None and "class_weights" in dataset.cfg.keys() and
                dataset.cfg.class_weights and
                len(dataset.cfg.class_weights) != 0):
            from ...datasets.utils import DataProcessing
            weights = DataProcessing.get_class_weights(
                dataset.cfg.class_weights)
            self.class_weights = jnp.asarray(weights, jnp.float32)

    def weighted_cross_entropy(self, logits, labels, valid_mask):
        """Mean weighted CE over valid entries.

        Args:
            logits: [N, C] raw scores.
            labels: [N] int class ids (already remapped to dense space).
            valid_mask: [N] bool.
        """
        logp = jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                                   labels[:, None], axis=-1)[:, 0]
        w = jnp.ones_like(logp)
        if self.class_weights is not None:
            w = self.class_weights[labels]
        w = w * valid_mask.astype(w.dtype)
        return -(logp * w).sum() / jnp.maximum(w.sum(), 1e-6)

    # reference method name alias (semseg_loss.py:49)
    weighted_CrossEntropyLoss = weighted_cross_entropy
