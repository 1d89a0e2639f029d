"""Learning-rate schedules as optax-compatible schedule functions.

Rebuilds of /root/reference/ml3d/torch/modules/schedulers/: CosineWarmupLR
(cosine_warmup_scheduler.py:32-44), LROneCycleScheduler
(lr_one_cycle_scheduler.py), BNMomentumScheduler (bn_momentum_scheduler.py:
40-63 — expressed here as a momentum schedule the train loop can query), and
exponential decay (torch ExponentialLR used by most semseg models).
"""

import math

import numpy as np
import optax


def exponential_lr(base_lr, gamma, steps_per_epoch=1):
    """ExponentialLR: lr = base * gamma^epoch (decay applied per epoch)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (gamma**epoch)

    return schedule


def cosine_warmup_lr(base_lr, total_steps, warmup_steps=0, min_factor=1e-5):
    """CosineWarmupLR: linear warmup then cosine decay to ~0."""

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(warmup_steps, 1)
        t = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * jnp.clip(t, 0, 1)))
        factor = jnp.where(step < warmup_steps, warm,
                           jnp.maximum(cos, min_factor))
        return base_lr * factor

    return schedule


def one_cycle_lr(base_lr, total_steps, div_factor=10.0, pct_start=0.4):
    """LROneCycleScheduler (fastai-style one-cycle over total_steps)."""
    return optax.linear_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=base_lr,
        pct_start=pct_start,
        pct_final=1.0,
        div_factor=div_factor,
        final_div_factor=div_factor * 1e4 / 10.0)


def bn_momentum_schedule(bn_momentum=0.5, bn_decay=0.5, decay_step=10):
    """BN momentum by epoch: m = bn_momentum * bn_decay^(epoch//decay_step),
    clipped to >= 0.01 (reference semantics for PointRCNN)."""

    def schedule(epoch):
        return max(bn_momentum * (bn_decay**(epoch // decay_step)), 0.01)

    return schedule


__all__ = [
    "exponential_lr", "cosine_warmup_lr", "one_cycle_lr",
    "bn_momentum_schedule"
]
