"""Pallas TPU kernels for EXACT integer-stencil sparse convolutions.

The round-5 acceleration of the SparseConvUnet bucket path
(ops/sparse_bucket.py): submanifold / down / up convolutions ride ONE fused
kernel instead of the match (knn_pallas k=1) + gather (one-hot matmul) +
GEMM pipeline. The key observation: on integer voxel sites a stencil tap is
a Morton-KEY EQUALITY, not a nearest-neighbor problem — the query key of
site q at offset o is computable in XLA (morton(coords_q + o), or
(parent_key << 3) | child_code for the stride-2 stencils), so the kernel
never needs distance math, extraction rounds, or a separate rulebook pass:

    per block:  oh3[k, q, t] = (qkey[k, q] == table_key[t])        (VPU)
                g = oh3.reshape(K*qb, T) @ table_values            (MXU)
                out[q] = sum_k g[k*qb:(k+1)*qb] @ W[k]             (MXU)

Misses (no active site at the offset) contribute an all-zero one-hot row —
the `found`-mask multiply of the unfused path happens for free. The
candidate tables (seg_ids) still come from rank_site_segments, whose
overflow counter remains the exactness certificate.

Measured motivation (scripts/profile_scu_bucket.py on chip, round 5): the
ScanNet-config forward spent 29.6 ms in match_stencil and 73.4 ms in
gather+GEMM convs of a 110 ms total; the fused kernel deletes the match
stage entirely and the [V, K, C] HBM intermediate between gather and GEMM.

Replaces the role of the reference's CUDA rulebook + scatter convolution
(/root/reference/ml3d/torch/models/sparseconvnet.py:344-487).

stencil_match_pallas is the standalone key-equality rulebook builder (same
contract as ops/sparse_bucket.match_stencil) used by the fused kernel's
custom-VJP backward, which recomputes (rel, found) and delegates to the
differentiable gather_pallas composition — integer keys carry no gradient.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bucket import (_SMEM_PREFETCH_BUDGET, _global_candidates, _seg_specs,
                     _split_batch, gather_pallas)

_I32MAX = jnp.iinfo(jnp.int32).max
_BIGPOS = 0x7F000000  # > any table position, < I32MAX (packing headroom)

# Test hook (same contract as ops/pallas/bucket._INTERPRET_KERNEL): when
# True, interpret=True runs the REAL kernels through the Mosaic interpreter
# instead of the fast XLA twin.
_INTERPRET_KERNEL = False


def _pad_rows(arr, mult, value):
    """Pad axis 1 to a multiple of `mult` with `value`."""
    n = arr.shape[1]
    pad = (-n) % mult
    if not pad:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[1] = (0, pad)
    return jnp.pad(arr, widths, constant_values=value)


def _match_kernel(sref, qk_ref, *args, k, s, table):
    """Key-equality rulebook: rel = min position where qkey == tabkey,
    found = any match. One [qb, table] compare + min per tap — no distance
    math, no extraction rounds (cf. _knn_kernel)."""
    ktabs, rel_ref, fnd_ref = args[:s], args[s], args[s + 1]
    tabk = jnp.concatenate([t[0] for t in ktabs], axis=0)[:, 0]  # [table]
    qk = qk_ref[0]  # [qb, K] int32
    qb = qk.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (qb, table), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (qb, k), 1)
    rel = jnp.zeros((qb, k), jnp.int32)
    fnd = jnp.zeros((qb, k), jnp.int32)
    for kk in range(k):
        eq = qk[:, kk][:, None] == tabk[None, :]
        m = jnp.min(jnp.where(eq, pos, _BIGPOS), axis=1)[:, None]
        # dynamic lane stores are not allowed in Mosaic: write column kk
        # via broadcast-select (the _extract_min_rounds pattern)
        rel = jnp.where(kcol == kk, m, rel)
        fnd = jnp.where(kcol == kk, (m < _BIGPOS).astype(jnp.int32), fnd)
    rel_ref[0] = rel
    fnd_ref[0] = fnd


def _match_xla(keys, qkeys, seg_ids, seg, qblock):
    """XLA twin (CPU tests / no-TPU hosts): identical selection semantics.
    Memory is O(nqb * qblock * K * table) bools — test shapes only."""
    b, q, k = qkeys.shape
    _, nqb, s = seg_ids.shape
    qpad = nqb * qblock - q
    assert qpad >= 0, (nqb, qblock, q)
    qk = _pad_rows(qkeys, nqb * qblock, -1) if qpad else qkeys
    cand = _global_candidates(seg_ids, seg)  # [B, nqb, S*seg]

    def one(kk, qq, cnd):
        tabk = kk[cnd]                                   # [nqb, T]
        qb = qq.reshape(nqb, qblock, k)
        eq = qb[..., None] == tabk[:, None, None, :]     # [nqb, qb, K, T]
        pos = jnp.arange(tabk.shape[-1], dtype=jnp.int32)
        m = jnp.min(jnp.where(eq, pos, _BIGPOS), axis=-1)
        return m.reshape(-1, k), (m < _BIGPOS).reshape(-1, k)

    rel, fnd = jax.vmap(one)(keys, qk, cand)
    return rel[:, :q], fnd[:, :q]


def stencil_match_pallas(keys, qkeys, seg_ids, *, seg, qblock,
                         interpret=False):
    """Exact stencil rulebook by Morton-key equality.

    Args:
        keys: [B, Vp] int32 Morton keys of the (sorted, padded) support
            sites; pad / invalid rows MUST be INT32_MAX.
        qkeys: [B, Q, K] int32 per-tap query keys; misses-by-construction
            (invalid query, out-of-range target) MUST be negative (-1) so
            they can never equal a valid key (>= 0) or a pad (INT32_MAX).
        seg_ids: [B, nqb, S] candidate tables from rank_site_segments
            (nqb = ceil(Q / qblock)).

    Returns (rel [B, Q, K] int32 positions into the S*seg table — out of
    range when not found, which one-hot gathers read as a zero row —
    and found [B, Q, K] bool).
    """
    b, vp, = keys.shape
    _, q, k = qkeys.shape
    _, nqb, s = seg_ids.shape
    table = s * seg
    assert vp % seg == 0, "pad keys to a multiple of seg"

    if interpret and not _INTERPRET_KERNEL:
        return _match_xla(keys, qkeys, seg_ids, seg, qblock)
    if b > 1 and b * nqb * s * 4 > _SMEM_PREFETCH_BUDGET:
        rel, fnd = _split_batch(
            lambda i: stencil_match_pallas(
                keys[i:i + 1], qkeys[i:i + 1], seg_ids[i:i + 1], seg=seg,
                qblock=qblock, interpret=interpret), b)
        return rel, fnd

    qpad = nqb * qblock - q
    assert qpad >= 0, (nqb, qblock, q)
    qk = _pad_rows(qkeys, nqb * qblock, -1) if qpad else qkeys
    keysf = keys[..., None]  # [B, Vp, 1] — lane dim 1 == full trailing dim
    kern = functools.partial(_match_kernel, k=k, s=s, table=table)
    rel, fnd = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nqb),
            in_specs=[pl.BlockSpec((1, qblock, k),
                                   lambda ib, iq, sref: (ib, iq, 0),
                                   memory_space=pltpu.VMEM)] +
            _seg_specs(s, seg, 1),
            out_specs=(
                pl.BlockSpec((1, qblock, k),
                             lambda ib, iq, sref: (ib, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qblock, k),
                             lambda ib, iq, sref: (ib, iq, 0),
                             memory_space=pltpu.VMEM),
            )),
        out_shape=(
            jax.ShapeDtypeStruct((b, q + qpad, k), jnp.int32),
            jax.ShapeDtypeStruct((b, q + qpad, k), jnp.int32),
        ),
        interpret=interpret,
    )(seg_ids.reshape(b, nqb * s), qk, *([keysf] * s))
    return rel[:, :q], fnd[:, :q].astype(bool)


def _conv_kernel(sref, qkT_ref, w_ref, *args, k, s, cin, cout, table,
                 compute_dtype):
    """Fused match+gather+GEMM for one query block.

    The one-hot is built k-major ([K, qb, table] -> [K*qb, table]) so the
    dominant matmul runs with full 128-row MXU tiles even at qblock 32,
    and the per-k weight GEMMs read contiguous SUBLANE slices of g (a
    row-major k-minor layout would need a rows->lanes relayout Mosaic
    does not support). qkeys arrive pre-transposed [B, nqb, K, qblock]
    for the same reason.
    """
    ktabs = args[:s]
    vtabs = args[s:2 * s]
    out_ref = args[2 * s]
    tabk = jnp.concatenate([t[0] for t in ktabs], axis=0)[:, 0]  # [table]
    tabv = jnp.concatenate([t[0] for t in vtabs],
                           axis=0).astype(compute_dtype)  # [table, cin]
    qkT = qkT_ref[0, 0]  # [k, qb] int32
    qb = qkT.shape[1]
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    oh3 = (qkT[:, :, None] == tabk[None, None, :]).astype(compute_dtype)
    g = jax.lax.dot_general(
        oh3.reshape(k * qb, table), tabv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32)  # [k*qb, cin]
    w = w_ref[...]  # [k*cin, cout]
    acc = jnp.zeros((qb, cout), jnp.float32)
    for kk in range(k):
        gk = jax.lax.slice_in_dim(g, kk * qb, (kk + 1) * qb,
                                  axis=0).astype(compute_dtype)
        wk = jax.lax.slice_in_dim(w, kk * cin, (kk + 1) * cin,
                                  axis=0).astype(compute_dtype)
        acc = acc + jax.lax.dot_general(
            gk, wk, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)
    out_ref[0] = acc


def _conv_ref(values, rel, found, seg_ids, w, seg, qblock, compute_dtype,
              interpret):
    """Differentiable reference composition (gather_pallas carries the
    transposed-matmul VJP); also the forward's XLA twin given a twin
    rulebook. Mirrors the fused kernel's rounding: bf16 one-hot gather,
    bf16 GEMM inputs, f32 accumulation."""
    k, cin, cout = w.shape
    g = gather_pallas(values, seg_ids, rel, seg, qblock, compute_dtype,
                      interpret)
    g = g * found[..., None].astype(g.dtype)
    b, q = g.shape[:2]
    cdt = compute_dtype
    return jax.lax.dot_general(
        g.reshape(b, q, k * cin).astype(cdt),
        w.reshape(k * cin, cout).astype(cdt),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _conv_fwd_impl(values, keys, qkeys, seg_ids, w, seg, qblock,
                   compute_dtype, interpret):
    b, n, cin = values.shape
    _, q, k = qkeys.shape
    _, nqb, s = seg_ids.shape
    kk, _, cout = w.shape
    assert kk == k, (kk, k)
    table = s * seg

    vals = _pad_rows(values, seg, 0)
    kys = _pad_rows(keys, seg, _I32MAX)

    if interpret and not _INTERPRET_KERNEL:
        rel, fnd = _match_xla(kys, qkeys, seg_ids, seg, qblock)
        return _conv_ref(vals, rel, fnd, seg_ids, w, seg, qblock,
                         compute_dtype, interpret)
    if b > 1 and b * nqb * s * 4 > _SMEM_PREFETCH_BUDGET:
        return _split_batch(
            lambda i: _conv_fwd_impl(
                values[i:i + 1], keys[i:i + 1], qkeys[i:i + 1],
                seg_ids[i:i + 1], w, seg, qblock, compute_dtype,
                interpret), b)

    qpad = nqb * qblock - q
    assert qpad >= 0, (nqb, qblock, q)
    qk = _pad_rows(qkeys, nqb * qblock, -1) if qpad else qkeys
    # pre-transpose to k-major blocks: [B, nqb, K, qblock]
    qkT = qk.reshape(b, nqb, qblock, k).transpose(0, 1, 3, 2)
    keysf = kys[..., None]
    kern = functools.partial(_conv_kernel, k=k, s=s, cin=cin, cout=cout,
                             table=table, compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nqb),
            in_specs=[pl.BlockSpec((1, 1, k, qblock),
                                   lambda ib, iq, sref: (ib, iq, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k * cin, cout),
                                   lambda ib, iq, sref: (0, 0),
                                   memory_space=pltpu.VMEM)] +
            _seg_specs(s, seg, 1) + _seg_specs(s, seg, cin),
            out_specs=pl.BlockSpec((1, qblock, cout),
                                   lambda ib, iq, sref: (ib, iq, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((b, q + qpad, cout), jnp.float32),
        interpret=interpret,
    )(seg_ids.reshape(b, nqb * s), qkT, w.reshape(k * cin, cout),
      *([keysf] * s), *([vals] * s))
    return out[:, :q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def stencil_conv_pallas(values, keys, qkeys, seg_ids, w, seg, qblock,
                        compute_dtype=jnp.bfloat16, interpret=False):
    """out[b, i] = sum_k values[b, row(qkeys[b,i,k])] @ w[k], where
    row(.) is the support row whose Morton key equals the tap key (zero
    contribution when no such active site exists).

    Args:
        values: [B, V, Cin] support features (padded internally to seg).
        keys: [B, V] int32 Morton keys of the support rows (invalid rows
            INT32_MAX — sort_sites' convention).
        qkeys: [B, Q, K] int32 per-tap query keys (misses negative).
        seg_ids: [B, nqb, S] candidate tables (rank_site_segments).
        w: [K, Cin, Cout] stencil weights.

    Returns [B, Q, Cout] float32. Gradients flow to values and w only
    (the rulebook is integral); the backward recomputes (rel, found) via
    stencil_match_pallas and rides gather_pallas's transposed-matmul VJP.
    """
    return _conv_fwd_impl(values, keys, qkeys, seg_ids, w, seg, qblock,
                          compute_dtype, interpret)


def _conv_fwd(values, keys, qkeys, seg_ids, w, seg, qblock, compute_dtype,
              interpret):
    out = _conv_fwd_impl(values, keys, qkeys, seg_ids, w, seg, qblock,
                         compute_dtype, interpret)
    return out, (values, keys, qkeys, seg_ids, w)


def _conv_bwd(seg, qblock, compute_dtype, interpret, res, g):
    values, keys, qkeys, seg_ids, w = res
    vals = _pad_rows(values, seg, 0)
    kys = _pad_rows(keys, seg, _I32MAX)
    rel, fnd = stencil_match_pallas(kys, qkeys, seg_ids, seg=seg,
                                    qblock=qblock, interpret=interpret)
    _, vjp = jax.vjp(
        lambda v, ww: _conv_ref(v, rel, fnd, seg_ids, ww, seg, qblock,
                                compute_dtype, interpret), vals, w)
    dv, dw = vjp(g)
    return dv[:, :values.shape[1]], None, None, None, dw


stencil_conv_pallas.defvjp(_conv_fwd, _conv_bwd)
