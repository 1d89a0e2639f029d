"""Point sampling ops: furthest point sampling (FPS) and random sampling.

TPU-native replacement for the reference's CUDA `furthest_point_sampling` /
`furthest_point_sampling_v2` (/root/reference/ml3d/torch/utils/pointnet/
pointnet2_utils.py:39-105). FPS is inherently sequential in k; each iteration
is a full-width VPU min/argmax, expressed as a lax.fori_loop with static k.
"""

import jax
import jax.numpy as jnp


def furthest_point_sampling(points, k, *, points_mask=None, start_idx=0):
    """Iterative FPS returning [k] int32 indices.

    Matches reference semantics: starts at index ``start_idx`` (the CUDA op
    starts at 0), greedily adds the point with max distance to the selected
    set. Masked points are never selected. If fewer than k valid points
    exist, indices repeat the last valid selection.
    """
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    neg = jnp.float32(-1.0)
    init_dist = jnp.full((n,), jnp.inf, jnp.float32)
    if points_mask is not None:
        init_dist = jnp.where(points_mask, init_dist, neg)

    def body(i, state):
        dist, selected, last = state
        d = jnp.sum((pts - pts[last])**2, axis=1)
        if points_mask is not None:
            d = jnp.where(points_mask, d, neg)
        dist = jnp.minimum(dist, d)
        nxt = jnp.argmax(dist).astype(jnp.int32)
        selected = selected.at[i].set(nxt)
        return dist, selected, nxt

    selected0 = jnp.zeros((k,), jnp.int32).at[0].set(start_idx)
    _, selected, _ = jax.lax.fori_loop(
        1, k, body, (init_dist, selected0, jnp.int32(start_idx)))
    return selected


def furthest_point_sampling_batch(points, k, *, points_mask=None):
    """vmapped FPS over a leading batch dim: [B, N, 3] -> [B, k]."""
    if points_mask is None:
        return jax.vmap(lambda p: furthest_point_sampling(p, k))(points)
    return jax.vmap(
        lambda p, m: furthest_point_sampling(p, k, points_mask=m))(
            points, points_mask)


def random_sampling(key, n, k, *, replace=False):
    """Random choice of k indices out of n (static shapes)."""
    return jax.random.choice(key, n, shape=(k,), replace=replace)
