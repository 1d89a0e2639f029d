"""Focal loss for dense object detection heads.

Rebuild of /root/reference/ml3d/torch/modules/losses/focal_loss.py:14-54:
sigmoid focal loss FL(p_t) = -alpha_t (1 - p_t)^gamma log(p_t), summed with an
external normalizer (avg_factor), mask-friendly for static shapes.
"""

import jax
import jax.numpy as jnp


class FocalLoss:

    def __init__(self, gamma=2.0, alpha=0.25, loss_weight=1.0):
        self.gamma = gamma
        self.alpha = alpha
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        """Args:
            pred: [N, C] raw logits.
            target: [N, C] one-hot float targets, or [N] int class ids where
                id == C means background (all-zero one-hot row, reference
                focal_loss.py:7-11,33-35).
            weight: optional [N] or [N, C] per-element weights.
            avg_factor: normalizer (defaults to count of weights > 0 or N).
        """
        pred = pred.astype(jnp.float32)
        if target.ndim == pred.ndim - 1:
            c = pred.shape[-1]
            target = (target[..., None] == jnp.arange(c)[None, :])
        target = target.astype(jnp.float32)
        p = jax.nn.sigmoid(pred)
        ce = -(target * jax.nn.log_sigmoid(pred) +
               (1 - target) * jax.nn.log_sigmoid(-pred))
        p_t = p * target + (1 - p) * (1 - target)
        alpha_t = self.alpha * target + (1 - self.alpha) * (1 - target)
        loss = alpha_t * ((1 - p_t)**self.gamma) * ce
        if weight is not None:
            if weight.ndim < loss.ndim:
                weight = weight[..., None]
            loss = loss * weight
        total = loss.sum()
        if avg_factor is None:
            avg_factor = pred.shape[0]
        return self.loss_weight * total / jnp.maximum(avg_factor, 1.0)
