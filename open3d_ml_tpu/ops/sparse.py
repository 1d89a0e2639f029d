"""Sparse (submanifold) convolution substrate: rulebooks over active sites.

TPU-native replacement for the reference's external SparseConv /
SparseConvTranspose layers (/root/reference/ml3d/torch/models/
sparseconvnet.py:9,344-487). Active voxel sites live as padded [V, 3] int32
coordinate arrays with masks (static cap V). The "rulebook" is a dense
[V, K] neighbor-index matrix built by hashing coordinates with a
sort + searchsorted lookup — pure XLA, no dynamic shapes. Convolution is then
gather -> one [V, K*Cin] x [K*Cin, Cout] matmul (MXU) with masked padding.

Coordinates must be rebased to >= 0 with per-axis extent < 2^10 per level so
linearized keys fit int32 (callers rebase; ScanNet-style scenes fit easily).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EXTENT = 1 << 10  # per-axis coordinate extent for int32 linearization


def linearize(coords, mask=None):
    """[V, 3] int coords -> int32 keys; masked/invalid -> INT32_MAX."""
    key = (coords[:, 2] * _EXTENT + coords[:, 1]) * _EXTENT + coords[:, 0]
    in_range = jnp.all((coords >= 0) & (coords < _EXTENT), axis=1)
    if mask is not None:
        in_range &= mask
    return jnp.where(in_range, key, jnp.iinfo(jnp.int32).max)


class SiteHash:
    """Sorted-key lookup table over active sites (host-free, on device)."""

    def __init__(self, coords, mask):
        self.num_sites = coords.shape[0]
        key = linearize(coords, mask)
        self.order = jnp.argsort(key).astype(jnp.int32)
        self.sorted_key = key[self.order]
        self.mask = mask

    def lookup(self, query_coords, query_mask=None):
        """Return ([Q] site index or sentinel num_sites, [Q] found bool)."""
        qkey = linearize(query_coords, query_mask)
        pos = jnp.searchsorted(self.sorted_key, qkey).astype(jnp.int32)
        pos_c = jnp.clip(pos, 0, self.num_sites - 1)
        found = (self.sorted_key[pos_c] == qkey) & \
                (qkey != jnp.iinfo(jnp.int32).max)
        idx = jnp.where(found, self.order[pos_c], self.num_sites)
        return idx, found


def kernel_offsets(kernel_size=3, centered=True):
    """[K, 3] numpy integer offsets in x-fastest order."""
    rng = range(-(kernel_size // 2), kernel_size // 2 + 1) if centered \
        else range(kernel_size)
    offs = [(x, y, z) for z in rng for y in rng for x in rng]
    return np.asarray(offs, np.int32)


def build_rulebook(coords, mask, offsets, *, site_hash=None):
    """Dense rulebook [V, K]: neighbor site index per (site, offset), with
    sentinel V where the neighbor is inactive.

    Args:
        coords: [V, 3] int32 active-site coordinates (padded).
        mask: [V] bool valid sites.
        offsets: [K, 3] int (numpy or jnp) kernel offsets.
    """
    sh = site_hash or SiteHash(coords, mask)
    offs = jnp.asarray(offsets, jnp.int32)
    k = offs.shape[0]

    def one(off):
        idx, _ = sh.lookup(coords + off[None, :], mask)
        return idx

    rulebook = jax.vmap(one)(offs)  # [K, V]
    return jnp.transpose(rulebook, (1, 0))  # [V, K]


def apply_sparse_conv(features, rulebook, weights, *, out_mask=None,
                      normalize=False, compute_dtype=None):
    """Gather-GEMM sparse convolution.

    Args:
        features: [V_in, Cin] features of the *input* level (padded rows
            arbitrary — they are never referenced thanks to the sentinel).
        rulebook: [V_out, K] indices into features (sentinel V_in = missing).
        weights: [K, Cin, Cout].
        out_mask: [V_out] to zero padded outputs.
        normalize: divide by the number of present neighbors (open3d
            SparseConv normalize flag).
        compute_dtype: cast features BEFORE the gather (bf16 halves the
            HBM traffic of the dominant [V, K, Cin] gather) and run the
            GEMM at that dtype; accumulation/output stay float32.

    Returns: [V_out, Cout] float32.
    """
    v_in = features.shape[0]
    k, cin, cout = weights.shape
    if compute_dtype is not None:
        cdt = jnp.dtype(compute_dtype)
        features = features.astype(cdt)
        weights = weights.astype(cdt)
    feats_pad = jnp.concatenate(
        [features, jnp.zeros((1, cin), features.dtype)], axis=0)
    gathered = feats_pad[rulebook]  # [V_out, K, Cin]
    out = jax.lax.dot_general(
        gathered.reshape(-1, k * cin), weights.reshape(k * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if normalize:
        cnt = jnp.sum(rulebook < v_in, axis=1, keepdims=True)
        out = out / jnp.maximum(cnt, 1).astype(out.dtype)
    if out_mask is not None:
        out = jnp.where(out_mask[:, None], out, 0.0)
    return out


def unique_sites(coords, mask, cap):
    """Deduplicate [V, 3] coords -> padded [cap, 3] unique sites.

    Returns (unique_coords [cap,3], unique_mask [cap], inverse [V] mapping
    each input row to its unique-site rank, sentinel cap when masked/over
    capacity). Order: ascending linearized key (deterministic).
    """
    v = coords.shape[0]
    key = linearize(coords, mask)
    order = jnp.argsort(key).astype(jnp.int32)
    skey = key[order]
    svalid = skey != jnp.iinfo(jnp.int32).max
    prev = jnp.concatenate([jnp.full((1,), -1, skey.dtype), skey[:-1]])
    new_run = (skey != prev) & svalid
    rank = jnp.cumsum(new_run.astype(jnp.int32)) - 1  # rank in sorted order
    rank = jnp.where(svalid & (rank < cap), rank, cap)

    ucoords = jnp.zeros((cap, 3), jnp.int32)
    ucoords = ucoords.at[rank].set(coords[order], mode="drop")
    umask = jnp.zeros((cap,), jnp.bool_).at[rank].set(True, mode="drop")

    inverse = jnp.full((v,), cap, jnp.int32)
    inverse = inverse.at[order].set(rank, mode="drop")
    return ucoords, umask, inverse


def downsample_sites(coords, mask, cap):
    """Stride-2 parent sites: unique(coords // 2).

    Returns (parent_coords [cap,3], parent_mask [cap], parent_idx [V] rank of
    each input's parent, child_offset_idx [V] in [0,8) = position within the
    2^3 block, x-fastest)."""
    parent = coords // 2
    pcoords, pmask, inverse = unique_sites(parent, mask, cap)
    rem = coords - parent * 2
    off_idx = (rem[:, 2] * 2 + rem[:, 1]) * 2 + rem[:, 0]
    return pcoords, pmask, inverse, off_idx


def apply_sparse_conv_transpose(coarse_features, parent_idx, child_off_idx,
                                weights, *, out_mask=None,
                                compute_dtype=None):
    """Transpose (up) convolution for stride-2 kernel-2: each fine site
    gathers its coarse parent's features through the weight slice selected by
    its intra-block offset.

    Args:
        coarse_features: [V_coarse, Cin].
        parent_idx: [V_fine] rank of the parent (sentinel V_coarse).
        child_off_idx: [V_fine] in [0, 8).
        weights: [8, Cin, Cout].

    Returns: [V_fine, Cout].
    """
    vc = coarse_features.shape[0]
    cin = coarse_features.shape[1]
    k, _, cout = weights.shape
    if compute_dtype is not None:
        cdt = jnp.dtype(compute_dtype)
        coarse_features = coarse_features.astype(cdt)
        weights = weights.astype(cdt)
    feats_pad = jnp.concatenate(
        [coarse_features, jnp.zeros((1, cin), coarse_features.dtype)],
        axis=0)
    gathered = feats_pad[parent_idx]  # [V_fine, Cin]
    # all K weight branches on MXU, then select per site
    outs = jax.lax.dot_general(
        gathered, weights,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [V_fine, K, Cout]
    out = jnp.take_along_axis(
        outs, child_off_idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    if out_mask is not None:
        out = jnp.where(out_mask[:, None], out, 0.0)
    return out
