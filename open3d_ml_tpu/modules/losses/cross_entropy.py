"""Plain cross-entropy loss (optionally masked/weighted).

Rebuild of /root/reference/ml3d/torch/modules/losses/cross_entropy.py:13-48.
"""

import jax
import jax.numpy as jnp


class CrossEntropyLoss:

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label, weight=None, avg_factor=None):
        """cls_score [N, C] logits; label [N] int."""
        logp = jax.nn.log_softmax(cls_score.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, label[:, None], axis=-1)[:, 0]
        if weight is not None:
            nll = nll * weight
        total = nll.sum()
        if avg_factor is None:
            avg_factor = cls_score.shape[0]
        return self.loss_weight * total / jnp.maximum(avg_factor, 1.0)
