"""On-device voxelization: quantize -> sort by voxel key -> segment runs.

TPU-native replacement for the reference's external `voxelize` op
(/root/reference/ml3d/torch/models/point_pillars.py:355,
ml3d/torch/models/sparseconvnet.py:294): points are hashed to voxels and
point indices grouped per voxel, with caps max_voxels / max_points_per_voxel.

The reference returns ragged (voxel_point_indices, row_splits); here outputs
are dense padded with masks — static shapes for XLA. Voxels are ordered by
linearized coordinate key (deterministic), and the first max_voxels in that
order are kept; within a voxel, points keep ascending original order (stable
sort) and the first max_points_per_voxel are kept.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VoxelData(NamedTuple):
    """Dense padded voxelization result.

    coords: [max_voxels, 3] int32 integer voxel coordinates (x,y,z order);
        padding rows are 0.
    point_indices: [max_voxels, max_points] int32 indices into the input
        points; padding entries are 0 (mask with ``point_mask``).
    point_mask: [max_voxels, max_points] bool.
    num_points_per_voxel: [max_voxels] int32 (capped at max_points).
    voxel_mask: [max_voxels] bool, True for real voxels.
    num_voxels: [] int32.
    """
    coords: jax.Array
    point_indices: jax.Array
    point_mask: jax.Array
    num_points_per_voxel: jax.Array
    voxel_mask: jax.Array
    num_voxels: jax.Array
    # [N] int32: voxel slot of each INPUT point (original order), sentinel
    # max_voxels for dropped points (out of range / beyond either cap).
    # Enables point-major consumers (segment ops over points) that never
    # materialize the [max_voxels, max_points] gather.
    point_to_voxel: jax.Array


def voxelize(points, voxel_size, points_range_min, points_range_max,
             max_voxels, max_points_per_voxel, *, points_mask=None):
    """Voxelize one point cloud. All shape parameters are static.

    Args:
        points: [N, 3] float coordinates.
        voxel_size: (3,) float voxel edge lengths.
        points_range_min/max: (3,) float bounds; points outside are dropped.
        max_voxels, max_points_per_voxel: static caps.
        points_mask: optional [N] bool marking valid input points.

    Returns: VoxelData.
    """
    import numpy as np

    n = points.shape[0]
    # voxel_size / ranges are static config values: grid dims resolved on host.
    vsize_np = np.asarray(voxel_size, np.float64)
    rmin_np = np.asarray(points_range_min, np.float64)
    rmax_np = np.asarray(points_range_max, np.float64)
    grid_dims_np = np.maximum(
        np.floor((rmax_np - rmin_np) / vsize_np + 0.5).astype(np.int64), 1)
    total_cells = int(np.prod(grid_dims_np))
    key_dtype = jnp.int32 if (total_cells < 2**31 - 1
                              or not jax.config.jax_enable_x64) else jnp.int64

    vsize = jnp.asarray(vsize_np, jnp.float32)
    rmin = jnp.asarray(rmin_np, jnp.float32)
    rmax = jnp.asarray(rmax_np, jnp.float32)
    grid_dims = jnp.asarray(grid_dims_np).astype(key_dtype)

    coords = jnp.floor((points - rmin) / vsize).astype(key_dtype)  # [N,3]
    in_range = jnp.all((coords >= 0) & (coords < grid_dims), axis=1)
    in_range &= jnp.all(points >= rmin, axis=1) & jnp.all(points < rmax,
                                                          axis=1)
    if points_mask is not None:
        in_range &= points_mask

    # Linearize (x fastest-varying is irrelevant; just needs to be bijective).
    key = (coords[:, 2] * grid_dims[1] + coords[:, 1]) * grid_dims[0] \
        + coords[:, 0]
    big = jnp.iinfo(key_dtype).max
    key = jnp.where(in_range, key, big)

    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    skey = key[order]
    svalid = skey != big

    # Run boundaries over the sorted keys.
    prev = jnp.concatenate([jnp.full((1,), -1, skey.dtype), skey[:-1]])
    new_run = (skey != prev) & svalid
    voxel_rank = jnp.cumsum(new_run.astype(jnp.int32)) - 1  # [N]
    num_voxels_total = voxel_rank[-1] + 1 if n > 0 else jnp.int32(0)
    num_voxels_total = jnp.where(jnp.any(svalid), num_voxels_total, 0)

    # Start position of each run -> column index within voxel.
    pos = jnp.arange(n, dtype=jnp.int32)
    rank_c = jnp.where(svalid, voxel_rank, max_voxels)
    starts = jax.ops.segment_min(jnp.where(svalid, pos, n), rank_c,
                                 num_segments=max_voxels + 1)[:max_voxels]
    col = pos - starts[jnp.clip(rank_c, 0, max_voxels - 1)]

    keep = svalid & (rank_c < max_voxels) & (col < max_points_per_voxel)
    rank_s = jnp.where(keep, rank_c, max_voxels)
    col_s = jnp.where(keep, col, max_points_per_voxel)

    point_indices = jnp.zeros((max_voxels, max_points_per_voxel), jnp.int32)
    point_indices = point_indices.at[rank_s, col_s].set(order, mode="drop")
    point_mask = jnp.zeros((max_voxels, max_points_per_voxel), jnp.bool_)
    point_mask = point_mask.at[rank_s, col_s].set(True, mode="drop")

    counts = jnp.sum(point_mask, axis=1).astype(jnp.int32)
    voxel_mask = (jnp.arange(max_voxels) <
                  jnp.minimum(num_voxels_total, max_voxels))
    num_voxels = jnp.minimum(num_voxels_total, max_voxels).astype(jnp.int32)

    # Voxel integer coords: scatter from run starts.
    sorted_coords = coords[order]
    vox_coords = jnp.zeros((max_voxels, 3), jnp.int32)
    vox_coords = vox_coords.at[rank_s, :].set(
        sorted_coords.astype(jnp.int32), mode="drop")
    # (every point in a run has identical coords, so last-write-wins is fine)

    # Per-point voxel slot in ORIGINAL point order (rank_s is aligned with
    # the sorted order; order[i] is sorted position i's original index).
    point_to_voxel = jnp.full((n,), max_voxels, jnp.int32)
    point_to_voxel = point_to_voxel.at[order].set(rank_s, mode="drop")

    return VoxelData(vox_coords, point_indices, point_mask, counts,
                     voxel_mask, num_voxels, point_to_voxel)


def gather_voxel_points(points, voxel_data, fill_value=0.0):
    """Gather per-voxel point features: [max_voxels, max_points, D]."""
    g = points[voxel_data.point_indices]
    return jnp.where(voxel_data.point_mask[..., None], g,
                     jnp.asarray(fill_value, points.dtype))


def voxel_feature_mean(features, voxel_data):
    """Average features of the points inside each voxel: [max_voxels, D]."""
    g = gather_voxel_points(features, voxel_data)
    n = jnp.maximum(voxel_data.num_points_per_voxel[:, None], 1)
    return jnp.sum(g, axis=1) / n.astype(g.dtype)
