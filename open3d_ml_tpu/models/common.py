"""Shared building blocks for point cloud models."""

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchedNet(nn.Module):
    """vmap wrapper mapping a single-sample net over the leading batch axis.

    Parameters/batch statistics are broadcast; BatchNorm layers inside the
    wrapped net must use axis_name="batch" so statistics sync across the
    mapped axis (torch BN-over-(B,N) semantics). Optional ``precompute``
    hook runs OUTSIDE the vmap (e.g. per-sample KNN pyramids, which lower
    catastrophically under batched top_k).
    """
    net: nn.Module
    precompute: callable = None

    @nn.compact
    def __call__(self, inputs, training=False):
        if self.precompute is not None:
            inputs = self.precompute(self.net, inputs)
        vnet = nn.vmap(
            lambda mdl, x: mdl(x, training=training),
            # "p2p_reg": per-deformable-KPConv regularizer terms sown inside
            # the net (one value per sample; summed by regularizer_loss)
            # "kp_points": KPConv kernel-point dispositions — generated at
            # init, overwritten by zoo-checkpoint conversion (broadcast)
            # "intermediates": diagnostics sown per sample (e.g.
            # SparseConvUnet's site-cap overflow counters)
            variable_axes={"params": None, "batch_stats": None,
                           "p2p_reg": 0, "kp_points": None,
                           "intermediates": 0},
            split_rngs={"params": False, "dropout": True},
            in_axes=(0,),
            out_axes=0,
            axis_name="batch")
        return vnet(self.net, inputs)


def batch_norm(training, name=None, epsilon=1e-5, momentum=0.9,
               axis_name="batch"):
    """BatchNorm with torch defaults, synced over the vmapped batch axis.

    axis_name=None for nets that run directly on a [B, N, C] batch (the
    fused bucket paths): flax BN already reduces over (B, N) there.
    """
    return nn.BatchNorm(use_running_average=not training, momentum=momentum,
                        epsilon=epsilon, axis_name=axis_name, name=name)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of a padded [..., V, C] tensor.

    Padded rows must not contaminate batch statistics, so mean/var are
    computed with the mask, reduced over every non-channel axis, and —
    when the net is run per sample under nn.vmap — synced across the
    mapped axis via psum (torch BN-over-active-sites semantics for sparse
    voxel nets). Batched nets ([B, V, C] inputs, e.g. the bucket conv
    path) pass axis_name=None: the leading axis is already reduced.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: str = "batch"

    @nn.compact
    def __call__(self, x, mask, training=False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,)))

        if training:
            red = tuple(range(x.ndim - 1))
            m = mask[..., None].astype(x.dtype)
            cnt = jnp.sum(m)
            s = jnp.sum(x * m, axis=red)
            s2 = jnp.sum(x * x * m, axis=red)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + \
                    (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + \
                    (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[..., None], y, 0.0)
