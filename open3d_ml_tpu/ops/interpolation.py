"""Feature interpolation ops: 3-NN inverse-distance and trilinear devoxelize.

TPU-native replacements for the reference CUDA ops `three_nn` /
`three_interpolate` (/root/reference/ml3d/torch/utils/pointnet/
pointnet2_utils.py:108-180) and `trilinear_devoxelize_forward/backward`
(/root/reference/ml3d/torch/models/pvcnn.py:17-63). Pure gathers +
weighted sums — autodiff provides the backward passes, no custom VJP needed.
"""

import jax.numpy as jnp

from .neighbors import knn_search


def three_nn(queries, points, *, points_mask=None):
    """3 nearest neighbors: returns (dist [Q,3] float32, idx [Q,3] int32).

    Distances are euclidean (not squared), matching the reference op.
    """
    idx, d2 = knn_search(points, queries, 3, points_mask=points_mask)
    return jnp.sqrt(d2), idx


def three_interpolate(features, idx, weight):
    """Weighted sum of 3 neighbor features.

    Args:
        features: [N, C] source features.
        idx: [Q, 3] int32 neighbor indices.
        weight: [Q, 3] float weights.

    Returns: [Q, C].
    """
    gathered = features[idx]  # [Q, 3, C]
    return jnp.sum(gathered * weight[..., None].astype(gathered.dtype),
                   axis=1)


def inverse_distance_weights(dist, eps=1e-8):
    """Reference weighting (pointnet2 FP): w_i = (1/d_i) / sum_j (1/d_j)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def trilinear_devoxelize(grid, coords, resolution):
    """Trilinear interpolation from a dense grid to point locations.

    Args:
        grid: [C, R, R, R] voxel features.
        coords: [3, N] float point coordinates in voxel units, in [0, R-1].
        resolution: R (static int).

    Returns: [C, N] interpolated features. Differentiable in both args.
    """
    r = resolution
    c = jnp.clip(coords, 0.0, float(r - 1))
    lo = jnp.minimum(jnp.floor(c).astype(jnp.int32), r - 2)  # [3,N]
    lo = jnp.maximum(lo, 0)
    hi = lo + 1
    frac = c - lo.astype(c.dtype)  # [3,N]

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = hi[0] if dx else lo[0]
                iy = hi[1] if dy else lo[1]
                iz = hi[2] if dz else lo[2]
                wx = frac[0] if dx else 1.0 - frac[0]
                wy = frac[1] if dy else 1.0 - frac[1]
                wz = frac[2] if dz else 1.0 - frac[2]
                vals = grid[:, ix, iy, iz]  # [C, N]
                out = out + vals * (wx * wy * wz)[None, :]
    return out


def trilinear_voxelize_coords(points, resolution):
    """Normalize points to voxel-unit coords [3, N] for a R^3 grid, matching
    PVCNN's normalization (unit sphere -> [0, R-1])."""
    pts = points.astype(jnp.float32)  # [N, 3]
    norm = (pts + 1.0) * 0.5 * (resolution - 1)
    return norm.T
