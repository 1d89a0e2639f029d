"""Optimizer wrappers: weight-decay masking and one-cycle training.

Functional replacement for the reference's fastai-style OptimWrapper
(/root/reference/ml3d/torch/modules/optimizers/optim_wrapper.py:34-232),
which splits parameters into layer groups and excludes batchnorm/bias from
weight decay. optax expresses the same policies as gradient-transformation
masks.
"""

import optax


def _is_norm_or_bias(path):
    keys = [getattr(p, "key", str(p)).lower() for p in path]
    joined = "/".join(keys)
    return ("batch_norm" in joined or "bn" in joined.split("/")[-2:][0]
            if keys else False) or keys[-1] in ("bias", "scale")


def no_decay_mask(params):
    """True for parameters that SHOULD receive weight decay (kernels),
    False for biases and normalization parameters — the reference's
    ``bn_wd=False`` behavior."""
    import jax
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_norm_or_bias(path), params)


def adamw_grouped(learning_rate, weight_decay=1e-2, betas=(0.9, 0.999),
                  decay_norm_and_bias=False):
    """AdamW with weight decay masked off normalization/bias parameters
    (unless ``decay_norm_and_bias``)."""
    if decay_norm_and_bias:
        return optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                           weight_decay=weight_decay)
    return optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                       weight_decay=weight_decay, mask=no_decay_mask)


def one_cycle_adam(total_steps, lr, moms=(0.95, 0.85), div_factor=10.0,
                   pct_start=0.4, weight_decay=0.0):
    """One-cycle Adam as used by PointRCNN's OptimWrapper+OneCycleScheduler
    (reference point_rcnn.py:142-185)."""
    lr_schedule = optax.linear_onecycle_schedule(
        transition_steps=total_steps, peak_value=lr, pct_start=pct_start,
        pct_final=1.0, div_factor=div_factor,
        final_div_factor=div_factor * 1e4 / 10.0)
    tx = optax.adamw(lr_schedule, b1=moms[0], b2=0.99,
                     weight_decay=weight_decay, mask=no_decay_mask) \
        if weight_decay else optax.adam(lr_schedule, b1=moms[0], b2=0.99)
    return tx, lr_schedule
