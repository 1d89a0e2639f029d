"""Neighbor search on device: exact KNN, fixed-radius search, ball query.

TPU-native replacements for the reference's external C++/CUDA neighbor ops:
`knn_search` (/root/reference/ml3d/torch/models/point_transformer.py:8,
ml3d/datasets/utils/dataprocessing.py:99-103), `FixedRadiusSearch`
(ml3d/torch/models/kpconv.py:2021) and `ball_query`
(ml3d/torch/utils/pointnet/pointnet2_utils.py:36).

Design: brute-force tiled distance computation. Pairwise squared distances are
a matmul (MXU work): d2 = |q|^2 + |p|^2 - 2 q.p^T. Queries are processed in
chunks via lax.map so the [Q, N] distance matrix never exceeds a bounded HBM
footprint; top-k runs per chunk. Everything has static shapes; invalid
(padded) points are masked with +inf distance. Exact top-k by default, with a
TPU-fast `jax.lax.approx_min_k` path for large N.
"""

import functools

import jax
import jax.numpy as jnp

# Queries processed per chunk; bounds the [CHUNK, N] distance tile in HBM.
_DEFAULT_CHUNK = 2048


def _pairwise_dist2(queries, points):
    """Squared euclidean distances [Q, N] via MXU-friendly matmul."""
    qf = queries.astype(jnp.float32)
    pf = points.astype(jnp.float32)
    q2 = jnp.sum(qf * qf, axis=-1, keepdims=True)  # [Q,1]
    p2 = jnp.sum(pf * pf, axis=-1)[None, :]  # [1,N]
    # HIGHEST precision: TPU MXU default rounds inputs to bf16, which is not
    # enough to rank near-tied neighbor distances correctly.
    cross = jax.lax.dot_general(
        qf, pf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # [Q,N]
    d2 = q2 + p2 - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def _chunked(fn, queries, chunk):
    """Apply fn over query chunks of size ``chunk`` and concatenate."""
    q = queries.shape[0]
    if q <= chunk:
        return fn(queries)
    pad = (-q) % chunk
    qp = jnp.pad(queries, ((0, pad),) + ((0, 0),) * (queries.ndim - 1))
    qp = qp.reshape(-1, chunk, *queries.shape[1:])
    out = jax.lax.map(fn, qp)
    out = jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[2:])[:q], out)
    return out


def knn_search(points, queries, k, *, points_mask=None, exact=True,
               chunk=_DEFAULT_CHUNK, recall_target=0.95):
    """Exact (or TPU-approximate) k-nearest-neighbor search.

    Args:
        points: [N, D] reference points.
        queries: [Q, D] query points.
        k: number of neighbors (static).
        points_mask: optional [N] bool; False entries are never neighbors.
        exact: if False use jax.lax.approx_min_k (faster on TPU for large N).
        chunk: query chunk size bounding HBM footprint.
        recall_target: recall for the approximate path.

    Returns:
        (indices [Q, k] int32, dist2 [Q, k] float32), sorted by distance.
        If fewer than k valid points exist, the nearest valid index repeats.
    """
    n = points.shape[0]
    k = min(k, n)

    # Exact path on a real TPU: the Pallas running-best-list kernel keeps
    # the whole point set in VMEM and replaces lax.top_k's sort with K
    # min-extraction rounds (ops/pallas/knn.py). The XLA formulation below
    # remains the CPU/fallback twin with identical contract.
    if (exact and k > 1 and points.ndim == 2 and points.shape[-1] == 3 and
            n <= 200_000 and jax.default_backend() == "tpu"):
        from .pallas.knn import knn_pallas
        return knn_pallas(points, queries, k, points_mask=points_mask)

    def one_chunk(qc):
        d2 = _pairwise_dist2(qc, points)
        if points_mask is not None:
            d2 = jnp.where(points_mask[None, :], d2, jnp.inf)
        if k == 1:
            # plain min/argmin reduction: far cheaper than any top-k path
            idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
            return idx[:, None], jnp.min(d2, axis=1)[:, None]
        if exact:
            neg, idx = jax.lax.top_k(-d2, k)
            return idx.astype(jnp.int32), -neg
        dist, idx = jax.lax.approx_min_k(d2, k, recall_target=recall_target)
        return idx.astype(jnp.int32), dist

    return _chunked(one_chunk, queries, chunk)


def radius_search(points, queries, radius, max_k, *, points_mask=None,
                  chunk=_DEFAULT_CHUNK):
    """Fixed-radius search returning padded [Q, max_k] neighbor indices.

    TPU-native equivalent of the reference FixedRadiusSearch
    (/root/reference/ml3d/torch/models/kpconv.py:2002-2035), which returns
    ragged lists; here the output is dense padded: the nearest min(count,
    max_k) in-radius neighbors per query, plus a validity mask and counts.

    Returns:
        indices: [Q, max_k] int32 (arbitrary valid index where masked).
        mask: [Q, max_k] bool, True for real in-radius neighbors.
        counts: [Q] int32 number of in-radius neighbors (uncapped by max_k).
    """
    r2 = jnp.asarray(radius, jnp.float32)**2

    def one_chunk(qc):
        d2 = _pairwise_dist2(qc, points)
        if points_mask is not None:
            d2 = jnp.where(points_mask[None, :], d2, jnp.inf)
        counts = jnp.sum(d2 <= r2, axis=1).astype(jnp.int32)
        neg, idx = jax.lax.top_k(-d2, min(max_k, points.shape[0]))
        dist2 = -neg
        mask = dist2 <= r2
        return idx.astype(jnp.int32), mask, counts

    return _chunked(one_chunk, queries, chunk)


def ball_query(points, queries, radius, k, *, points_mask=None,
               chunk=_DEFAULT_CHUNK):
    """PointNet++-style ball query: up to k neighbors within radius; empty
    slots are filled with the first found neighbor (reference semantics of
    `ball_query`, pointnet2_utils.py). Queries with zero in-radius neighbors
    fall back to their nearest point so gathers stay in-bounds.

    Returns (indices [Q, k] int32, mask [Q, k] bool).
    """
    idx, mask, _ = radius_search(points, queries, radius, k,
                                 points_mask=points_mask, chunk=chunk)
    # Fill masked-out slots with the first valid neighbor (or nearest point).
    first = idx[:, :1]
    filled = jnp.where(mask, idx, first)
    return filled, mask


def nearest_neighbor(points, queries, *, points_mask=None,
                     chunk=_DEFAULT_CHUNK):
    """1-NN: returns [Q] int32 indices of the closest point to each query."""
    idx, _ = knn_search(points, queries, 1, points_mask=points_mask,
                        chunk=chunk)
    return idx[:, 0]


def _grid_candidates(pts, valid, queries, cell_size, grid_dim, cap):
    """Candidate indices/points/mask from the 3x3x3 cells around each query
    at one cell size. Returns (idx [Q, 27*cap], pts [Q, 27*cap, 3], mask)."""
    n = pts.shape[0]
    q = queries.shape[0]
    big = jnp.float32(1e9)
    masked_pts = jnp.where(valid[:, None], pts, big)
    origin = jnp.min(masked_pts, axis=0)

    cell = jnp.clip(
        jnp.floor((pts - origin[None, :]) / cell_size), 0,
        grid_dim - 1).astype(jnp.int32)
    cid = (cell[:, 2] * grid_dim + cell[:, 1]) * grid_dim + cell[:, 0]
    cid = jnp.where(valid, cid, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(cid).astype(jnp.int32)
    sorted_cid = cid[order]
    sorted_pts = pts[order]

    qcell = jnp.clip(
        jnp.floor((queries.astype(jnp.float32) - origin[None, :]) /
                  cell_size), 0, grid_dim - 1).astype(jnp.int32)

    offsets = jnp.asarray(
        [[dx, dy, dz] for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)], jnp.int32)  # [27, 3]
    ncell = qcell[:, None, :] + offsets[None, :, :]  # [Q, 27, 3]
    in_grid = jnp.all((ncell >= 0) & (ncell < grid_dim), axis=-1)
    ncid = (ncell[..., 2] * grid_dim + ncell[..., 1]) * grid_dim + \
        ncell[..., 0]  # [Q, 27]

    start = jnp.searchsorted(sorted_cid, ncid.reshape(-1)).astype(jnp.int32)
    end = jnp.searchsorted(sorted_cid, ncid.reshape(-1),
                           side="right").astype(jnp.int32)
    count = (end - start).reshape(q, 27)
    start = start.reshape(q, 27)

    slot = jnp.arange(cap, dtype=jnp.int32)
    cand_sorted = start[:, :, None] + slot[None, None, :]  # [Q, 27, cap]
    cand_mask = (slot[None, None, :] < count[:, :, None]) & \
        in_grid[:, :, None]
    cand_sorted = jnp.clip(cand_sorted, 0, n - 1).reshape(q, 27 * cap)
    cand_mask = cand_mask.reshape(q, 27 * cap)
    cand_idx = order[cand_sorted]  # original point indices
    cand_pts = sorted_pts[cand_sorted.reshape(-1)].reshape(q, 27 * cap, 3)
    return cand_idx, cand_pts, cand_mask


def knn_grid(points, queries, k, cell_size, *, grid_dim=1024, cap=48,
             n_global=256, points_mask=None, chunk=8192,
             count_target=None):
    """Adaptive grid-bucketed KNN: near-exact at a fraction of brute-force
    work, robust to the order-of-magnitude density variation of lidar
    scans.

    Points are hashed into ``grid_dim``^3 cell grids at several cell sizes
    (``cell_size``: float or tuple of levels, finest first — e.g. powers of
    two spanning the expected k-NN radius range). Each query *adaptively*
    picks the finest level whose 3x3x3 neighboring cells contain at least
    ``count_target`` (default 4k) points, then scores only those cells'
    points (up to ``cap`` per cell) plus ``n_global`` strided fallback
    candidates. Exact whenever the chosen level's cells cover the true k-th
    neighbor without overflowing ``cap``; by construction the chosen level
    has just-enough population, so both failure modes are rare at any
    density. Queries are processed in chunks to bound the candidate-gather
    footprint.

    Returns (indices [Q, k] int32, dist2 [Q, k] float32).
    """
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    valid = jnp.ones((n,), bool) if points_mask is None else points_mask
    if not isinstance(cell_size, (tuple, list)):
        cell_size = (cell_size,)
    levels = len(cell_size)
    target = count_target or 4 * k

    big = jnp.float32(1e9)
    masked_pts = jnp.where(valid[:, None], pts, big)
    origin = jnp.min(masked_pts, axis=0)

    # per-level sorted cell keys
    orders, sorted_cids = [], []
    for cs in cell_size:
        cell = jnp.clip(jnp.floor((pts - origin[None, :]) / cs), 0,
                        grid_dim - 1).astype(jnp.int32)
        cid = (cell[:, 2] * grid_dim + cell[:, 1]) * grid_dim + cell[:, 0]
        cid = jnp.where(valid, cid, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(cid).astype(jnp.int32)
        orders.append(order)
        sorted_cids.append(cid[order])
    order_all = jnp.stack(orders)  # [L, N]

    offsets = jnp.asarray(
        [[dx, dy, dz] for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)], jnp.int32)  # [27, 3]
    slot = jnp.arange(cap, dtype=jnp.int32)

    if n_global > 0:
        stride = max(n // n_global, 1)
        g_idx = (jnp.arange(n_global, dtype=jnp.int32) * stride) % n
        g_mask = valid[g_idx]
        g_pts = pts[g_idx]

    def one_chunk(qc):
        nq = qc.shape[0]
        starts, counts = [], []
        for li, cs in enumerate(cell_size):
            qcell = jnp.clip(
                jnp.floor((qc - origin[None, :]) / cs), 0,
                grid_dim - 1).astype(jnp.int32)
            ncell = qcell[:, None, :] + offsets[None, :, :]
            in_grid = jnp.all((ncell >= 0) & (ncell < grid_dim), axis=-1)
            ncid = (ncell[..., 2] * grid_dim +
                    ncell[..., 1]) * grid_dim + ncell[..., 0]
            s = jnp.searchsorted(sorted_cids[li],
                                 ncid.reshape(-1)).astype(jnp.int32)
            e = jnp.searchsorted(sorted_cids[li], ncid.reshape(-1),
                                 side="right").astype(jnp.int32)
            cnt = jnp.where(in_grid.reshape(-1), e - s, 0)
            starts.append(s.reshape(nq, 27))
            counts.append(cnt.reshape(nq, 27))
        start_l = jnp.stack(starts)  # [L, nq, 27]
        count_l = jnp.stack(counts)
        total_l = jnp.sum(count_l, axis=2)  # [L, nq]

        # finest level with enough population (fallback: coarsest)
        enough = total_l >= target  # [L, nq]
        lsel = jnp.argmax(enough, axis=0)
        lsel = jnp.where(jnp.any(enough, axis=0), lsel,
                         levels - 1).astype(jnp.int32)  # [nq]

        take = lambda arr: jnp.take_along_axis(
            arr, lsel[None, :, None], axis=0)[0]  # [nq, 27]
        start_sel = take(start_l)
        count_sel = take(count_l)

        cand_sorted = start_sel[:, :, None] + slot[None, None, :]
        cand_mask = slot[None, None, :] < count_sel[:, :, None]
        cand_sorted = jnp.clip(cand_sorted, 0, n - 1).reshape(nq, 27 * cap)
        cand_mask = cand_mask.reshape(nq, 27 * cap)
        cand_idx = order_all[lsel[:, None], cand_sorted]  # [nq, 27*cap]

        if n_global > 0:
            cand_idx = jnp.concatenate(
                [cand_idx,
                 jnp.broadcast_to(g_idx[None, :], (nq, n_global))], axis=1)
            cand_mask = jnp.concatenate(
                [cand_mask,
                 jnp.broadcast_to(g_mask[None, :], (nq, n_global))], axis=1)

        # Transposed [axis, nq, W] layout: a [*, W, 3] gather would
        # lane-pad the 3-vector to 128 on TPU (40x HBM waste).
        d2 = jnp.zeros(cand_idx.shape, jnp.float32)
        for ax in range(3):
            diff_ax = pts[:, ax][cand_idx] - qc[:, ax:ax + 1]
            d2 = d2 + diff_ax * diff_ax
        d2 = jnp.where(cand_mask, d2, jnp.inf)
        neg, sel = jax.lax.top_k(-d2, k)
        idx = jnp.take_along_axis(cand_idx, sel, axis=1)
        return idx.astype(jnp.int32), -neg

    return _chunked(one_chunk, queries.astype(jnp.float32), chunk)


def build_knn_pyramid(points, k, sub_ratios, *, num_interp=1,
                      method="exact", grid_cells=None):
    """Per-layer (neighbors, pool, up) index pyramid for encoder/decoder nets.

    TPU-first version of the host-side loop in the reference RandLA-Net
    transform (/root/reference/ml3d/torch/models/randlanet.py:215-232): runs
    entirely on device inside the jitted step. The input ``points`` must be in
    random order (sub-sampling takes the first N/r rows).

    Args:
        method: 'exact' (brute-force MXU + top_k), 'approx'
            (jax.lax.approx_min_k), 'grid' (adaptive grid-bucketed, ~99%
            recall, fast on CPU), or 'window' (Morton-curve windows, ~98%
            recall with 3 curves and no random-access gathers — see
            ops/morton.py).
        grid_cells: cell-size levels for method='grid' (finest first). The
            adaptive level selection makes one set work for every pyramid
            level despite the 2x-per-level spacing growth.

    Returns dict with lists: coords, neighbor_indices [N_i, k],
    sub_idx [N_{i+1}, k], interp_idx [N_i, num_interp].
    """
    if method == "grid":
        cells = tuple(grid_cells or (0.25, 1.0, 4.0, 16.0))
        search = functools.partial(knn_grid, cell_size=cells)
    elif method == "approx":
        search = functools.partial(knn_search, exact=False)
    elif method == "window":
        from .morton import knn_window
        search = knn_window
    else:
        search = knn_search

    coords, neighbors, pools, ups = [], [], [], []
    pc = points
    for ratio in sub_ratios:
        n = pc.shape[0]
        nbr, _ = search(pc, pc, k)
        n_sub = n // ratio
        sub = pc[:n_sub]
        pool = nbr[:n_sub]
        up, _ = search(sub, pc, num_interp)
        coords.append(pc)
        neighbors.append(nbr)
        pools.append(pool)
        ups.append(up)
        pc = sub
    return {
        "coords": coords,
        "neighbor_indices": neighbors,
        "sub_idx": pools,
        "interp_idx": ups,
    }
