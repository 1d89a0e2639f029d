"""Block-table substrate for sparse (submanifold) convolutions on TPU.

The bucket execution strategy for SparseConvUnet-style voxel networks — the
same design that accelerated RandLA-Net's neighbor path (ops/bucket.py,
ops/pallas/bucket.py), specialized to EXACT integer-offset stencils instead
of KNN:

1. Sort active sites once by 30-bit Morton key. Parent Morton = child
   Morton >> 3, so stride-2 downsampling PRESERVES the order — one argsort
   per forward, every deeper level dedups a sorted array with a cumsum.
2. Cut the sorted sites into segments of ``seg``; for each block of
   ``qblock`` consecutive sites, rank segments by the exact bbox
   lower-bound and keep the top-S: the block's candidate table. Segments
   beyond the stencil's reach can never hold a neighbor, so the table is
   EXACT whenever the number of in-reach segments is <= S (the per-block
   shortfall is returned as an overflow counter — zero means exact).
3. The rulebook (which table row is the neighbor at offset (dx,dy,dz)) is
   one knn_pallas(k=1) call per level: a match is a squared distance of 0
   between integer coordinates (exact in f32), a miss has d2 >= 1.
4. Convolution = gather_pallas (block-local one-hot matmuls on the MXU,
   ~20x faster than XLA row gathers at these shapes) -> mask missing taps
   -> one [V, K*Cin] x [K*Cin, Cout] GEMM.

This replaces the role of the reference's external SparseConv rulebook
machinery (/root/reference/ml3d/torch/models/sparseconvnet.py:344-487 and
the open3d-ml CUDA voxel hashing behind it). The hash-based exact twin
(ops/sparse.py) remains the evaluation/parity path.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .morton import _spread_bits
from .pallas.bucket import gather_pallas, knn_pallas

_I32MAX = jnp.iinfo(jnp.int32).max
_FAR = 1e9  # padded support rows
_QFAR = 2e9  # invalid query rows (knn_pallas's own pad value)


def morton_key_int(coords, mask=None):
    """[..., 3] int32 coords (< 1024 per axis) -> 30-bit Morton key, z in
    the high bit of each triplet (key & 7 == z0*4 + y0*2 + x0, the child
    offset inside the 2^3 parent block; key >> 3 == parent key)."""
    x = _spread_bits(coords[..., 0])
    y = _spread_bits(coords[..., 1])
    z = _spread_bits(coords[..., 2])
    key = (z << 2) | (y << 1) | x
    in_range = jnp.all((coords >= 0) & (coords < 1024), axis=-1)
    if mask is not None:
        in_range &= mask
    return jnp.where(in_range, key, _I32MAX)


def sort_sites(coords, mask):
    """Morton-sort padded sites: [B, V, 3] int32 + [B, V] bool.

    Invalid rows key to INT32_MAX, so the valid prefix stays a prefix.
    Returns (sorted_coords, sorted_mask, sorted_key, inv_perm) where
    inv_perm maps ORIGINAL row -> sorted position (for remapping
    point->site indices); invalid rows map to themselves' slot (don't
    care, callers mask).
    """
    key = morton_key_int(coords, mask)
    perm = jnp.argsort(key, axis=-1).astype(jnp.int32)  # sorted pos -> orig
    scoords = jnp.take_along_axis(coords, perm[..., None], axis=-2)
    smask = jnp.take_along_axis(mask, perm, axis=-1)
    skey = jnp.take_along_axis(key, perm, axis=-1)
    v = coords.shape[-2]
    pos = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32), perm.shape)
    inv_perm = jnp.zeros(perm.shape, jnp.int32)
    inv_perm = jax.vmap(lambda ip, p, q: ip.at[p].set(q))(
        inv_perm, perm, pos) if coords.ndim == 3 else \
        inv_perm.at[perm].set(pos)
    return scoords, smask, skey, inv_perm


def support_points(coords, mask, seg):
    """Float support rows for knn_pallas: valid coords, invalid/padded 1e9,
    padded to a multiple of seg. [B, V, 3] -> [B, Vp, 3] float32."""
    pts = jnp.where(mask[..., None], coords.astype(jnp.float32), _FAR)
    v = pts.shape[-2]
    pad = (-v) % seg
    if pad:
        pts = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)),
                      constant_values=_FAR)
    return pts


def _masked_bboxes(pts, num_valid, rows):
    """Per-chunk bboxes over the VALID PREFIX of pts: [ceil(n/rows)]
    chunks of `rows` consecutive rows; rows at index >= num_valid are
    excluded (Morton sort keeps valid rows a prefix). Empty chunks get
    (lo=+big, hi=-big)."""
    n = pts.shape[0]
    nc = -(-n // rows)
    pad = nc * rows - n
    p = jnp.pad(pts, ((0, pad), (0, 0))) if pad else pts
    m = (jnp.arange(nc * rows) < num_valid).reshape(nc, rows, 1)
    p = p.reshape(nc, rows, 3)
    big = jnp.float32(3e38)
    lo = jnp.min(jnp.where(m, p, big), axis=1)
    hi = jnp.max(jnp.where(m, p, -big), axis=1)
    return lo, hi


def rank_site_segments(support_f, num_support, sites_f, num_sites, *, seg,
                       qblock, num_segs, reach):
    """Candidate segment table per site block + exactness overflow.

    Whole-block bbox ranking by score = lb*1e4 + center-distance, where lb
    is the exact bbox-to-bbox lower bound on any point pair. A segment in
    reach (lb <= reach) can only be displaced from the top-S by segments
    whose score is lower, i.e. lb <= reach + diag/1e4 < reach + 0.2 — so
    counting segments with lb <= reach + 0.2 gives a SOUND exactness
    certificate: overflow == 0 => every in-reach segment is in its
    block's table.

    support_f: [B, Vp, 3] (1e9 pad rows), num_support: [B] valid prefix
    length. sites_f: [B, V, 3], num_sites: [B]. reach: max coordinate
    distance from a query site to any stencil target (sqrt(3) for the
    3^3 submanifold stencil).

    Returns (seg_ids [B, nqb, S] int32 best-first, overflow [B] int32);
    overflow == 0 means the tables cover every possible tap exactly.
    """
    def one(pts, np_, qs, nq):
        nseg = pts.shape[0] // seg
        s = min(num_segs, nseg)
        plo, phi = _masked_bboxes(pts, np_, seg)
        qlo, qhi = _masked_bboxes(qs, nq, qblock)
        gap = jnp.maximum(
            jnp.maximum(qlo[:, None, :] - phi[None, :, :],
                        plo[None, :, :] - qhi[:, None, :]), 0.0)
        lb = jnp.sqrt(jnp.sum(gap * gap, axis=-1))  # [nqb, nseg]
        diff = (qlo + qhi)[:, None, :] - (plo + phi)[None, :, :]
        cd = jnp.sqrt(jnp.sum(diff * diff, axis=-1)) * 0.5
        score = lb * 1e4 + jnp.minimum(cd, 1e3)
        _, seg_ids = jax.lax.top_k(-score, s)
        in_reach = jnp.sum((lb <= reach + 0.2).astype(jnp.int32), axis=1)
        overflow = jnp.sum(jnp.maximum(in_reach - s, 0))
        return seg_ids.astype(jnp.int32), overflow

    return jax.vmap(one)(support_f, num_support, sites_f, num_sites)


def match_stencil(support_f, sites_f, stencil, seg_ids, *, seg, qblock,
                  interpret=False):
    """Exact rulebook: for each (site, stencil offset), the table row of
    the site at coords+offset, or a miss.

    sites_f: [B, V, 3] float integer-valued coords (2e9 for invalid rows).
    stencil: [K, 3] integer offsets (numpy or jnp).
    seg_ids: [B, nqb, S] from rank_site_segments with the SAME qblock
        (the flattened queries use qblock*K rows per block).

    Returns (rel [B, V, K] int32 into the S*seg table, found [B, V, K]
    bool).
    """
    b, v, _ = sites_f.shape
    k = stencil.shape[0]
    offs = jnp.asarray(stencil, jnp.float32)
    qpts = sites_f[:, :, None, :] + offs[None, None]  # [B, V, K, 3]
    rel, d2 = knn_pallas(support_f, qpts.reshape(b, v * k, 3), seg_ids, 1,
                         seg=seg, qblock=qblock * k, interpret=interpret)
    # integer coords: an exact match has d2 == 0, any miss d2 >= 1 (the
    # kernel's position-packing truncates low mantissa bits — harmless at
    # this gap)
    found = d2.reshape(b, v, k) < 0.25
    return rel.reshape(b, v, k), found


def gather_taps(values, ctx, *, compute_dtype=None):
    """Gather neighbor features through block tables and zero missing taps.

    values: [B, V, C] (rows beyond the valid prefix arbitrary — they are
    only read through `found` taps). Returns [B, Q, K, C] float32.
    """
    seg = ctx.seg
    v = values.shape[1]
    pad = (-v) % seg
    vals = jnp.pad(values, ((0, 0), (0, pad), (0, 0))) if pad else values
    cdt = jnp.dtype(compute_dtype) if compute_dtype else jnp.float32
    g = gather_pallas(vals, ctx.seg_ids, ctx.rel, seg, ctx.qblock, cdt,
                      ctx.interpret)
    return g * ctx.found[..., None].astype(g.dtype)


class BucketCtx(NamedTuple):
    """Per-level conv context: block tables + rulebook for one stencil."""
    seg_ids: Any  # [B, nqb, S]
    rel: Any      # [B, Q, K]
    found: Any    # [B, Q, K]
    seg: int
    qblock: int
    interpret: bool = False


class StencilCtx(NamedTuple):
    """Per-level conv context for the FUSED kernel path
    (ops/pallas/stencil.stencil_conv_pallas): no precomputed rulebook —
    the kernel matches per-tap Morton query keys against the table rows'
    keys inline, so the context carries keys instead of (rel, found)."""
    seg_ids: Any  # [B, nqb, S]
    qkeys: Any    # [B, Q, K] int32 per-tap query keys (misses -1)
    keys: Any     # [B, V] int32 support Morton keys (invalid INT32_MAX)
    seg: int
    qblock: int
    interpret: bool = False


def stencil_query_keys(coords, mask, stencil):
    """Per-tap Morton query keys for an integer stencil: [B, V, 3] int32
    sites + [K, 3] offsets -> [B, V, K] int32 keys; taps that cannot exist
    (invalid site, target outside the 1024^3 domain) become -1, which can
    never equal a valid key (>= 0) or a pad row's INT32_MAX."""
    offs = jnp.asarray(stencil, jnp.int32)
    q = coords[:, :, None, :] + offs[None, None]  # [B, V, K, 3]
    k = morton_key_int(q, jnp.broadcast_to(mask[:, :, None], q.shape[:-1]))
    return jnp.where(k == _I32MAX, -1, k)


def bucket_downsample(coords, mask, mkey, cap):
    """Stride-2 parents of Morton-sorted sites, staying Morton-sorted.

    Parent Morton key = child key >> 3, which is non-decreasing along the
    children's sorted order — dedup is a run-boundary cumsum, no sort.

    coords/mask/mkey: [B, V, .] sorted by mkey (invalid rows INT32_MAX).
    Returns (pcoords [B, cap, 3], pmask [B, cap], pkey [B, cap],
    off_idx [B, V] in [0, 8) child position inside the 2^3 parent block,
    dropped [B] count of children whose parent fell beyond the cap).
    """
    def one(c, m, k):
        pk = jnp.where(m, k >> 3, _I32MAX)
        prev = jnp.concatenate([jnp.full((1,), -1, pk.dtype), pk[:-1]])
        valid = pk != _I32MAX
        new_run = (pk != prev) & valid
        rank = jnp.cumsum(new_run.astype(jnp.int32)) - 1
        rank_c = jnp.where(valid & (rank < cap), rank, cap)
        pcoords = jnp.zeros((cap, 3), jnp.int32).at[rank_c].set(
            c >> 1, mode="drop")
        pmask = jnp.zeros((cap,), jnp.bool_).at[rank_c].set(
            True, mode="drop")
        pkey = jnp.full((cap,), _I32MAX, jnp.int32).at[rank_c].set(
            pk, mode="drop")
        off_idx = jnp.where(m, k & 7, 0).astype(jnp.int32)
        dropped = jnp.sum(m & (rank >= cap)).astype(jnp.int32)
        return pcoords, pmask, pkey, off_idx, dropped

    return jax.vmap(one)(coords, mask, mkey)
