"""Morton (Z-order) codes and curve-window KNN.

TPU-first alternative to bucketed grid search for the KNN pyramid
(reference computes neighbors on host with KD-trees,
/root/reference/ml3d/torch/models/randlanet.py:215-232; the CUDA backends
use brute force / grid hashing). Design:

* points are sorted by a 30-bit Morton code (10 bits/axis);
* a tile of T sorted queries reads ONE contiguous slice of the sorted
  points as its candidate set (`dynamic_slice` — sequential HBM reads, no
  random-access gathers, which are the latency bottleneck for neighbor ops
  on TPU);
* distances [T, span] are one MXU matmul + top_k;
* recall lost at Z-curve seams is recovered by running a second curve over
  rotated coordinates and merging the two candidate lists.

Work per level-0 query drops from N (brute force / approx_min_k scan) to
`span` (~0.5-1k), a 30-60x reduction at N=45k.

Measured recall vs scipy cKDTree ground truth on a lidar-density cloud
(N=45k, radial falloff): self-KNN k=16 -> 0.98 (3 curves, window=128);
cross 1-NN upsample (11k refs, 45k queries) -> 0.98 (2 curves).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

# Fixed rotations whose Morton curves break differently; curve 0 is axis
# aligned. Generated once from a seeded Householder/QR (host constant).
_ROTS = []
_rng = np.random.default_rng(12345)
_ROTS.append(np.eye(3, dtype=np.float32))
for _ in range(3):
    _q, _r = np.linalg.qr(_rng.standard_normal((3, 3)))
    _ROTS.append((_q * np.sign(np.diag(_r))).astype(np.float32))


def _spread_bits(v):
    """Spread the low 10 bits of int32 v so there are 2 zero bits between
    every data bit (standard Morton bit dilation)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _quantize(pts, valid, levels):
    """Quantize [N, 3] float points to integer grid coords in the valid
    bounding box."""
    big = jnp.float32(1e9)
    masked = jnp.where(valid[:, None], pts, big)
    lo = jnp.min(masked, axis=0)
    masked = jnp.where(valid[:, None], pts, -big)
    hi = jnp.max(masked, axis=0)
    top = jnp.float32(levels - 1)
    scale = top / jnp.maximum(hi - lo, 1e-6)
    return jnp.clip((pts - lo[None, :]) * scale[None, :], 0.0,
                    top).astype(jnp.int32)


def morton_codes(pts, valid=None):
    """30-bit Morton codes for [N, 3] float points, normalized to the valid
    bounding box. Invalid points get the maximum code so they sort last."""
    if valid is None:
        valid = jnp.ones(pts.shape[:1], bool)
    q = _quantize(pts, valid, 1024)
    code = (_spread_bits(q[:, 0]) | (_spread_bits(q[:, 1]) << 1) |
            (_spread_bits(q[:, 2]) << 2))
    return jnp.where(valid, code, jnp.int32(0x7FFFFFFF))


def hilbert_codes(pts, valid=None, bits=10):
    """30-bit Hilbert-curve codes for [N, 3] float points (10 bits/axis).

    Same contract as morton_codes but a strictly more local ordering: the
    Hilbert curve has no Z-order seams, so the true k-NN of a run of
    consecutive sorted points touch ~20-25% fewer fixed-size segments
    (measured on 45k lidar-density clouds: oracle segments per 128-query
    block at seg=64 drop 39.4 -> 31.5 mean, 63 -> 53 p99). Used by the
    bucket KNN pyramid (ops/bucket.py) so its candidate tables can be
    narrower at equal recall.

    Skilling's transpose algorithm, vectorized over points: ~3*bits
    bitwise ops, traced once under jit (static Python loops).
    """
    if valid is None:
        valid = jnp.ones(pts.shape[:1], bool)
    x = _quantize(pts, valid, 1 << bits)  # [N, 3] int32
    x0, x1, x2 = x[:, 0], x[:, 1], x[:, 2]

    # inverse-undo pass: top bit down to bit 1. Per axis: if the axis has
    # bit Q set, invert x0's low bits; otherwise exchange the low bits of
    # x0 and the axis (for axis 0 the exchange is a no-op, so only the
    # invert branch applies).
    for qbit in range(bits - 1, 0, -1):
        qv = jnp.int32(1 << qbit)
        pv = qv - 1
        x0 = jnp.where((x0 & qv) != 0, x0 ^ pv, x0)
        for xi in (1, 2):
            xin = x1 if xi == 1 else x2
            cond = (xin & qv) != 0
            x0_inv = jnp.where(cond, x0 ^ pv, x0)
            t = jnp.where(cond, 0, (x0_inv ^ xin) & pv)
            x0 = x0_inv ^ t
            if xi == 1:
                x1 = xin ^ t
            else:
                x2 = xin ^ t

    # Gray encode
    x1 = x1 ^ x0
    x2 = x2 ^ x1
    t = jnp.zeros_like(x0)
    for qbit in range(bits - 1, 0, -1):
        qv = jnp.int32(1 << qbit)
        t = jnp.where((x2 & qv) != 0, t ^ (qv - 1), t)
    x0, x1, x2 = x0 ^ t, x1 ^ t, x2 ^ t

    # interleave transpose-form bits, x0's bit most significant
    code = (_spread_bits(x0) << 2) | (_spread_bits(x1) << 1) | \
        _spread_bits(x2)
    return jnp.where(valid, code, jnp.int32(0x7FFFFFFF))


def _dist2_tile(qc, cand):
    """[T, 3] x [S, 3] squared distances, f32 MXU matmul."""
    q2 = jnp.sum(qc * qc, axis=-1, keepdims=True)
    c2 = jnp.sum(cand * cand, axis=-1)[None, :]
    cross = jax.lax.dot_general(
        qc, cand, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return jnp.maximum(q2 + c2 - 2.0 * cross, 0.0)


def _window_pass(points, valid, queries, k, window, tile):
    """One curve pass: returns (idx [Q, k] into points, d2 [Q, k]),
    unsorted back to the original query order."""
    n = points.shape[0]
    q = queries.shape[0]

    codes_p = morton_codes(points, valid)
    order_p = jnp.argsort(codes_p).astype(jnp.int32)
    sp = points[order_p]
    sv = valid[order_p]
    codes_p_sorted = codes_p[order_p]

    if queries is points:
        order_q = order_p
        sq = sp
        pos = jnp.arange(q, dtype=jnp.int32)
    else:
        codes_q = morton_codes(queries)
        order_q = jnp.argsort(codes_q).astype(jnp.int32)
        sq = queries[order_q]
        pos = jnp.searchsorted(codes_p_sorted,
                               codes_q[order_q]).astype(jnp.int32)

    # span: how much of the sorted points one tile of sorted queries can
    # cover, plus the +-window margin (rounded up to a lane multiple)
    per_tile = int(np.ceil(tile * n / max(q, 1)))
    span = min(n, int(np.ceil((per_tile + 2 * window) / 128.0)) * 128)

    pad = (-q) % tile
    sq_p = jnp.pad(sq, ((0, pad), (0, 0)))
    pos_p = jnp.pad(pos, (0, pad))
    tiles_q = sq_p.reshape(-1, tile, 3)
    tiles_pos = pos_p.reshape(-1, tile)

    def one_tile(args):
        qc, tpos = args
        start = jnp.clip(tpos[0] - window, 0, max(n - span, 0))
        cand = jax.lax.dynamic_slice(sp, (start, 0), (span, 3))
        cvalid = jax.lax.dynamic_slice(sv, (start,), (span,))
        d2 = _dist2_tile(qc, cand)
        d2 = jnp.where(cvalid[None, :], d2, jnp.inf)
        neg, col = jax.lax.top_k(-d2, k)
        return (start + col).astype(jnp.int32), -neg

    sidx, sd2 = jax.lax.map(one_tile, (tiles_q, tiles_pos))
    sidx = sidx.reshape(-1, k)[:q]
    sd2 = sd2.reshape(-1, k)[:q]
    # back to original point ids and original query order
    pidx = order_p[sidx]
    out_idx = jnp.zeros((q, k), jnp.int32).at[order_q].set(pidx)
    out_d2 = jnp.zeros((q, k), jnp.float32).at[order_q].set(sd2)
    return out_idx, out_d2


def _merge_topk(idx_list, d2_list, k):
    """Merge per-curve [Q, k] candidate lists, deduplicating shared ids."""
    idx = jnp.concatenate(idx_list, axis=1)  # [Q, C*k]
    d2 = jnp.concatenate(d2_list, axis=1)
    # sort by id so duplicates are adjacent, mark all but the first as inf
    o = jnp.argsort(idx, axis=1)
    idx_s = jnp.take_along_axis(idx, o, axis=1)
    d2_s = jnp.take_along_axis(d2, o, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((idx.shape[0], 1), bool), idx_s[:, 1:] == idx_s[:, :-1]],
        axis=1)
    d2_s = jnp.where(dup, jnp.inf, d2_s)
    neg, sel = jax.lax.top_k(-d2_s, k)
    return jnp.take_along_axis(idx_s, sel, axis=1), -neg


def knn_window(points, queries, k, *, window=192, n_curves=2,
               points_mask=None, tile=1024):
    """K-nearest neighbors via Morton-curve windows (approximate).

    Args:
        points: [N, 3] reference points.
        queries: [Q, 3] query points (pass the same array for self-KNN).
        k: neighbor count (static).
        window: half-width margin of the sorted-candidate slice per tile.
        n_curves: 1-4 space-filling curves (more curves -> higher recall).
        points_mask: optional [N] bool validity.
        tile: queries per tile (controls the [tile, span] distance block).

    Returns (indices [Q, k] int32, dist2 [Q, k] float32).
    """
    pts = points.astype(jnp.float32)
    qs = queries.astype(jnp.float32)
    n = pts.shape[0]
    k = min(k, n)
    valid = jnp.ones((n,), bool) if points_mask is None else points_mask
    self_knn = queries is points

    idx_list, d2_list = [], []
    for c in range(min(n_curves, len(_ROTS))):
        rot = jnp.asarray(_ROTS[c])
        rp = pts @ rot.T
        rq = rp if self_knn else qs @ rot.T
        # distances are computed on rotated coords (isometry: identical d2)
        i, d = _window_pass(rp, valid, rq, k, window, tile)
        idx_list.append(i)
        d2_list.append(d)
    if len(idx_list) == 1:
        return idx_list[0], d2_list[0]
    return _merge_topk(idx_list, d2_list, k)
