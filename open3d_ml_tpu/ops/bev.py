"""BEV canvas construction from pillar features, scatter-light.

The PointPillars canvas scatter — write V pillar feature rows into their
cells of a [ny*nx, C] canvas — lowers to a random row scatter in XLA and
costs ~7-8 ms/scan at the KITTI config (40k pillars x 64ch into 496x432),
the single largest cost of the whole forward after the point-major PFN.
TPU scatters/gathers are row-latency-bound, so the fix is to shrink the
rows, not the count:

1. scatter only the SLOT INDEX (one int32 per pillar, measured
   ~0.3 ms/scan): slot_at_cell = (-1)[num_cells].at[cells].set(arange(V))
2. one [num_cells, C] row gather pulls each occupied cell's pillar
   features (~0.7 ms/scan); empty cells mask to zero.

Total ~1.9 ms/scan vs 7.2 for the direct feature scatter. (A Pallas
one-hot-matmul scatter kernel was measured worse — 800+ small grid steps
are overhead-bound — and jnp.searchsorted inversions are gather-heavy.)

Replaces the role of the reference's PointPillarsScatter
(/root/reference/ml3d/torch/models/point_pillars.py:558-617).
"""

import jax
import jax.numpy as jnp


def bev_scatter(pillar_feats, cells, num_cells):
    """Place pillar rows into a flat canvas (cells need not be sorted).

    Args:
        pillar_feats: [B, V, C] pillar features.
        cells: [B, V] int32 canvas cell per pillar, unique per batch row;
            invalid pillars must carry cells >= num_cells (dropped).
        num_cells: static canvas size (ny * nx).

    Returns [B, num_cells, C] (empty cells zero).
    """
    b, v, c = pillar_feats.shape

    def one(pf, cl):
        slot = jnp.full((num_cells,), -1, jnp.int32).at[cl].set(
            jnp.arange(v, dtype=jnp.int32), mode="drop")
        return jnp.where(slot[:, None] >= 0, pf[jnp.maximum(slot, 0)], 0.0)

    return jax.vmap(one)(pillar_feats, cells)


# back-compat alias (the sorted-cell property is no longer required)
bev_scatter_sorted = bev_scatter
