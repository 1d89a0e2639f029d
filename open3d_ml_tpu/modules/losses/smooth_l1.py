"""Smooth-L1 (Huber) loss.

Rebuild of /root/reference/ml3d/torch/modules/losses/smooth_L1.py:5-47.
"""

import jax.numpy as jnp


class SmoothL1Loss:

    def __init__(self, beta=1.0, loss_weight=1.0):
        self.beta = beta
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        diff = jnp.abs(pred.astype(jnp.float32) -
                       target.astype(jnp.float32))
        loss = jnp.where(diff < self.beta, 0.5 * diff * diff / self.beta,
                         diff - 0.5 * self.beta)
        if weight is not None:
            if weight.ndim < loss.ndim:
                weight = weight[..., None]
            loss = loss * weight
        total = loss.sum()
        if avg_factor is None:
            avg_factor = pred.shape[0]
        return self.loss_weight * total / jnp.maximum(avg_factor, 1.0)
