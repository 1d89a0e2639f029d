"""Block-local window ops over Morton-sorted point clouds.

The TPU-first execution strategy for point-cloud networks: sort the cloud
once along a space-filling curve, then constrain every neighbor structure to
a fixed window of the sorted order. Neighbor SEARCH becomes a batched
[T, span] distance matmul + narrow top_k per block (no 45k-wide scans), and
neighbor GATHER becomes a block-diagonal one-hot matmul (MXU work) instead of
a random-access HBM gather (which is latency-bound at ~1.5 ns/row on TPU —
measured: a [45k, 16, 8] random row-gather costs ~17 ms while the equivalent
block one-hot matmul costs <1 ms).

This replaces the role of the reference's external KNN/CUDA ops
(/root/reference/ml3d/torch/models/randlanet.py:215-232 host KD-trees;
ml3d/datasets/utils/dataprocessing.py:87-103) with a redesign: the reference
gathers are unconstrained; here locality is made explicit so XLA can tile
everything onto the MXU.

Key property used throughout: a stride-r slice of a Morton-sorted array is
spatially uniform (the curve visits space locally), so pyramid subsampling
keeps both sortedness and coverage — the TPU analog of the reference's
"random subsample of a shuffled cloud".

All functions take/return block-RELATIVE neighbor indices where stated:
``rel_idx[i, j]`` indexes into the candidate slice of i's block, i.e. global
index = block_start(i) + rel_idx[i, j]. This makes search output feed the
gather directly with zero index arithmetic in between.
"""

import functools

import jax
import jax.numpy as jnp

from .morton import morton_codes


def block_starts(n, num_queries, block, window, stride=1):
    """Start row (into the n-row sorted value array) of each query block's
    candidate slice. Query block b covers queries [b*block, (b+1)*block);
    its slice is [start_b, start_b + span) with
    span = block*stride + 2*window, start_b = clip(b*block*stride - window).

    Returns (starts [nblk] int32, span int, nblk int).
    """
    nblk = -(-num_queries // block)
    span = min(n, block * stride + 2 * window)
    b = jnp.arange(nblk, dtype=jnp.int32)
    starts = jnp.clip(b * block * stride - window, 0, max(n - span, 0))
    return starts, span, nblk


def window_knn(points, queries, k, *, block=256, window=128, stride=1,
               points_mask=None):
    """K nearest neighbors of sorted queries among sorted points, searched
    within each query block's candidate window.

    Args:
        points: [N, 3] float, Morton-sorted.
        queries: [Q, 3] float, Morton-sorted, co-located with points:
            query i's neighbors are assumed near sorted-point position
            i*stride (stride = N // Q for pyramid cross-level search,
            1 for self-KNN where queries is points).
        k: neighbor count (static).
        block: queries per block (the [block, span] tile is one matmul).
        window: half-width margin in sorted-point rows.
        stride: N // Q (points per query step).
        points_mask: optional [N] bool; False rows never match.

    Returns:
        rel_idx: [Q, k] int32 block-relative indices (see module docstring).
        d2: [Q, k] float32 squared distances, ascending.
        starts: [nblk] int32 block slice starts (global = starts[i//block]
            + rel_idx[i]).
    """
    n = points.shape[0]
    q = queries.shape[0]
    k = min(k, n)
    starts, span, nblk = block_starts(n, q, block, window, stride)

    pad_q = nblk * block - q
    qs = jnp.pad(queries.astype(jnp.float32), ((0, pad_q), (0, 0)))
    qb = qs.reshape(nblk, block, 3)

    pts = points.astype(jnp.float32)
    if points_mask is not None:
        pn_mask = points_mask
    else:
        pn_mask = None

    def one_block(qc, start):
        cand = jax.lax.dynamic_slice(pts, (start, 0), (span, 3))
        q2 = jnp.sum(qc * qc, axis=-1, keepdims=True)
        c2 = jnp.sum(cand * cand, axis=-1)[None, :]
        cross = jax.lax.dot_general(
            qc, cand, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        d2 = jnp.maximum(q2 + c2 - 2.0 * cross, 0.0)  # [block, span]
        if pn_mask is not None:
            cm = jax.lax.dynamic_slice(pn_mask, (start,), (span,))
            d2 = jnp.where(cm[None, :], d2, jnp.inf)
        if k == 1:
            idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
            return idx[:, None], jnp.min(d2, axis=1)[:, None]
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    rel, d2 = jax.vmap(one_block)(qb, starts)
    return (rel.reshape(-1, k)[:q], d2.reshape(-1, k)[:q], starts)


def gather_window(values, rel_idx, starts, span, *, block=256,
                  compute_dtype=jnp.float32):
    """Gather neighbor rows as a block-diagonal one-hot matmul (MXU).

    out[i, j, :] = values[starts[i // block] + rel_idx[i, j], :]

    Args:
        values: [N, C] float values (the sorted feature table).
        rel_idx: [Q, K] int32 block-relative indices from window_knn.
        starts: [nblk] int32 block slice starts.
        span: candidate slice width (static).
        block: queries per block (must match the search call).
        compute_dtype: dtype of the one-hot matmul (bf16 doubles MXU rate;
            exact for one-hot times bf16-rounded values).

    Returns [Q, K, C] in values.dtype.
    """
    q, k = rel_idx.shape
    n, c = values.shape
    nblk = starts.shape[0]
    pad_q = nblk * block - q
    rel = jnp.pad(rel_idx, ((0, pad_q), (0, 0))).reshape(nblk, block * k)

    vals = values.astype(compute_dtype)

    def one_block(rel_b, start):
        tab = jax.lax.dynamic_slice(vals, (start, 0), (span, c))
        oh = jax.nn.one_hot(rel_b, span, dtype=compute_dtype)
        out = jax.lax.dot_general(
            oh, tab, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=compute_dtype)
        return out  # [block*k, c]

    out = jax.vmap(one_block)(rel, starts)
    out = out.reshape(nblk * block, k, c)[:q].astype(values.dtype)
    return out


def gather_window_max(values, rel_idx, starts, span, *, block=256):
    """max over K of gathered neighbor rows, without materializing [Q, K, C]:
    out[i, :] = max_j values[starts[i//block] + rel_idx[i, j], :].

    Used for the pyramid max-pool (gather + max fusion). Implemented with the
    same block tables; the max is a segment-max via one-hot select.
    """
    q, k = rel_idx.shape
    n, c = values.shape
    nblk = starts.shape[0]
    pad_q = nblk * block - q
    rel = jnp.pad(rel_idx, ((0, pad_q), (0, 0))).reshape(nblk, block, k)

    neg_inf = jnp.finfo(values.dtype).min

    def one_block(rel_b, start):
        tab = jax.lax.dynamic_slice(values, (start, 0), (span, c))
        gathered = jnp.max(
            jnp.where(
                jax.nn.one_hot(rel_b, span, dtype=jnp.bool_)[..., None],
                tab[None, None, :, :], neg_inf),
            axis=2)  # [block, k, c]
        return jnp.max(gathered, axis=1)  # [block, c]

    out = jax.vmap(one_block)(rel, starts)
    return out.reshape(nblk * block, c)[:q]


def morton_sort(points, valid=None):
    """Morton-sort a cloud; returns (perm [N] int32, sorted_points).

    perm maps sorted position -> original index (sorted = points[perm]).
    """
    codes = morton_codes(points, valid)
    perm = jnp.argsort(codes).astype(jnp.int32)
    return perm, points[perm]


def build_window_pyramid(points, k, sub_ratios, *, block=256, window=None,
                         presorted=False):
    """Morton-sorted KNN/pool/upsample pyramid with block-relative indices.

    The fused-execution analog of ops.neighbors.build_knn_pyramid: every
    index it returns is block-relative so the model can use gather_window
    (one-hot MXU matmuls) for all neighbor reads. Subsampling is stride-r
    slicing of the sorted order (spatially uniform on a Morton curve).

    Args:
        points: [N, 3]; pre-sorted if presorted=True, else sorted here.
        k: neighbors per point.
        sub_ratios: per-level subsample ratios (e.g. [4, 4, 4, 4]).
        block: queries per search/gather block.
        window: half-width margin (default 8*k).
        presorted: skip the device-side Morton sort.

    Returns dict:
        perm: [N] int32 sorted->original (arange if presorted).
        coords: per-level sorted coords [N_i, 3].
        neighbor_rel / neighbor_starts / neighbor_span: self-KNN per level.
        pool_rel / pool_starts / pool_span: for level i, the k neighbors (in
            level-i order) of each level-(i+1) point — max-pool source.
        up_rel / up_starts / up_span: for level i, the 1-NN (in level-(i+1)
            order) of each level-i point — nearest-neighbor upsample source.
    """
    if window is None:
        window = max(8 * k, 128)
    if presorted:
        perm = jnp.arange(points.shape[0], dtype=jnp.int32)
        pc = points
    else:
        perm, pc = morton_sort(points)

    out = {
        "perm": perm, "coords": [], "neighbor_rel": [],
        "neighbor_starts": [], "neighbor_span": [], "pool_rel": [],
        "pool_starts": [], "pool_span": [], "up_rel": [], "up_starts": [],
        "up_span": [],
    }
    for ratio in sub_ratios:
        n = pc.shape[0]
        rel, _, starts = window_knn(pc, pc, k, block=block, window=window)
        _, span, _ = block_starts(n, n, block, window)

        sub = pc[::ratio]
        # pool: neighbors of each SUB point among the fine level. Query i of
        # the sub level sits at fine position i*ratio -> stride search.
        pool_rel, _, pool_starts = window_knn(
            pc, sub, k, block=block, window=window, stride=ratio)
        _, pool_span, _ = block_starts(n, sub.shape[0], block, window,
                                       stride=ratio)

        # upsample: 1-NN of each FINE point among the sub level. Fine query
        # i maps near sub position i // ratio: same block machinery with the
        # roles flipped — block of `block` fine queries covers
        # block // ratio sub rows (+/- window).
        up_rel, _, up_starts = _window_knn_down(
            sub, pc, block=block, window=window, ratio=ratio)
        _, up_span, _ = block_starts(sub.shape[0], n, block, window,
                                     stride=1)  # span recomputed below

        out["coords"].append(pc)
        out["neighbor_rel"].append(rel)
        out["neighbor_starts"].append(starts)
        out["neighbor_span"].append(span)
        out["pool_rel"].append(pool_rel)
        out["pool_starts"].append(pool_starts)
        out["pool_span"].append(pool_span)
        out["up_rel"].append(up_rel)
        out["up_starts"].append(up_starts)
        out["up_span"].append(_down_span(sub.shape[0], block, window, ratio))
        pc = sub
    return out


def _down_span(n_sub, block, window, ratio):
    return min(n_sub, block // ratio + 2 * window)


def _window_knn_down(sub, fine, *, block, window, ratio):
    """1-NN of each fine point among sub points: fine query block b (block
    wide) maps to sub rows [b*block//ratio - window, ...]. Returns
    (rel [Nf, 1], d2, starts [nblk])."""
    nf = fine.shape[0]
    ns = sub.shape[0]
    span = _down_span(ns, block, window, ratio)
    nblk = -(-nf // block)
    b = jnp.arange(nblk, dtype=jnp.int32)
    starts = jnp.clip(b * (block // ratio) - window, 0, max(ns - span, 0))

    pad_q = nblk * block - nf
    qs = jnp.pad(fine.astype(jnp.float32), ((0, pad_q), (0, 0)))
    qb = qs.reshape(nblk, block, 3)
    subf = sub.astype(jnp.float32)

    def one_block(qc, start):
        cand = jax.lax.dynamic_slice(subf, (start, 0), (span, 3))
        q2 = jnp.sum(qc * qc, axis=-1, keepdims=True)
        c2 = jnp.sum(cand * cand, axis=-1)[None, :]
        cross = jax.lax.dot_general(
            qc, cand, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        d2 = jnp.maximum(q2 + c2 - 2.0 * cross, 0.0)
        idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
        return idx[:, None], jnp.min(d2, axis=1)[:, None]

    rel, d2 = jax.vmap(one_block)(qb, starts)
    return rel.reshape(-1, 1)[:nf], d2.reshape(-1, 1)[:nf], starts


def gather_window_rows(values, rel_idx, starts, span, *, block=256,
                       compute_dtype=jnp.float32):
    """K=1 gather (upsample): out[i, :] = values[starts[i//block] +
    rel_idx[i, 0]]. Same one-hot matmul, shaped [Q, C]."""
    out = gather_window(values, rel_idx, starts, span, block=block,
                        compute_dtype=compute_dtype)
    return out[:, 0, :]
