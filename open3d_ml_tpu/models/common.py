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
            variable_axes={"params": None, "batch_stats": None},
            split_rngs={"params": False, "dropout": True},
            in_axes=(0,),
            out_axes=0,
            axis_name="batch")
        return vnet(self.net, inputs)


def batch_norm(training, name=None, epsilon=1e-5, momentum=0.9):
    """BatchNorm with torch defaults, synced over the vmapped batch axis."""
    return nn.BatchNorm(use_running_average=not training, momentum=momentum,
                        epsilon=epsilon, axis_name="batch", name=name)
