"""Pallas TPU kernels for segment-bucketed neighbor search and gathers.

The compute backbone of the fused (Morton-sorted) execution path — see
ops/bucket.py for the algorithm. Two kernels, both built on scalar-prefetch
block pipelining (``PrefetchScalarGridSpec``): the per-block segment ids
picked by the XLA selection stage drive the BlockSpec index_maps, so the
S candidate segments of every block are DMA'd HBM->VMEM by the Pallas
pipeline itself (double-buffered, no random access):

* ``knn_pallas``: exact KNN inside the block's candidate table — distance
  cross-term on the MXU, then k min-extraction rounds on the VPU (the
  running-best pattern of ops/pallas/knn.py, but over one fixed table).
* ``gather_pallas``: neighbor-feature gather as K one-hot matmuls per block
  — [qblock, table] one-hot (iota==rel compare, built in VMEM, never touches
  HBM) x [table, C] on the MXU. Measured [45k, 16, 128] gather: ~1 ms where
  the equivalent XLA random row-gather costs ~17 ms.

Gradients: gather_pallas carries a custom VJP whose backward is the
TRANSPOSED one-hot matmul per block (MXU) plus one segment-granular
scatter-add of nqb*S contiguous chunks — a direct Q*K-row scatter-add
measured as the dominant cost of fused training (the swap doubled
train-step throughput, 0.82M -> 1.66M pts/s). Neighbor indices are
integral — no gradient flows through the search.

Replaces the role of the reference's CUDA knn/gather ops
(/root/reference/ml3d/torch/models/randlanet.py:215-232 host KD-trees;
open3d.ml.torch.ops knn_search used by point_transformer.py:8).

Rejected design (round 5, measured): a FACTORED one-hot gather —
onehot(rel) = onehot(slot) (x) onehot(r), one [qb*k, 128] x [128, sc*C]
matmul per S-chunk + slot-masked adds — aimed at the N-padding waste the
microbench exposed (gather time is flat in C <= 128: the [qb, table] x
[table, C] matmul runs at the N-padded-to-128 rate, ~55% of peak at
C=128). Where Mosaic compiled it, it ran 2-3x SLOWER than the direct
kernel (lane-dim concats + K=128-deep chunk matmuls), and several
eligible shapes crashed the Mosaic compiler (remote_compile HTTP 500).
The direct kernel's padded-N matmul is already the efficient form at
these shapes; table width is the only real lever (scripts/bench_gather.py
: table 2048 -> 1024 cuts a [45k,16] gather 12.5 -> 7.6 ms at qblock=128;
finer qblocks LOSE — per-block overhead: qb32@1024 12.9 ms, qb64@1024
10.3 ms).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30

# Test hook: when True, interpret=True runs the REAL kernels through the
# Mosaic interpreter (slow, tiny shapes only) instead of the fast XLA twin,
# so kernel-side logic (grid/padding arithmetic) is exercised on CPU.
_INTERPRET_KERNEL = False


def _seg_specs(s, seg, width):
    """S BlockSpecs that each select one segment row-block of the values
    array, driven by the scalar-prefetched seg_ids.

    seg_ids are shipped FLATTENED to [B, nqb*S]: a trailing S axis would be
    padded to the SMEM lane width (8-16x waste) and can blow the 1 MB
    scalar-prefetch budget at small seg/qblock configs. iq*S+j is static
    grid-index arithmetic, which index maps allow."""
    def imap(ib, iq, sref, j):
        return (ib, sref[ib, iq * s + j], 0)
    return [
        pl.BlockSpec((1, seg, width), functools.partial(imap, j=j),
                     memory_space=pltpu.VMEM) for j in range(s)
    ]


def _extract_min_rounds(keys, k, mask):
    """k min-extraction rounds over packed keys [qb, w]: returns
    (best_d [qb, k] f32 ascending, best_i [qb, k] positions).

    The round loop is UNROLLED (k is static and small): a lax.fori_loop
    here carries the full [qb, w] buffer through scf.for, which costs a
    carry copy per round; unrolled, Mosaic keeps the running buffer in
    place."""
    qb = keys.shape[0]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (qb, k), 1)
    big_keys = jnp.int32(0x7F000000)

    ck = keys
    bd = jnp.full((qb, k), _BIG, jnp.float32)
    bi = jnp.zeros((qb, k), jnp.int32)
    for kk in range(k):
        m = jnp.min(ck, axis=1, keepdims=True)  # [qb, 1] packed key
        # write column kk via broadcast-select (dynamic lane stores are not
        # allowed in Mosaic)
        bd = jnp.where(kcol == kk, (m & ~mask).view(jnp.float32), bd)
        bi = jnp.where(kcol == kk, m & mask, bi)
        if kk + 1 < k:
            ck = jnp.where(ck == m, big_keys, ck)
    return bd, bi


def _knn_kernel(sref, q_ref, *args, k, s, table, dist_mode="vpu"):
    """Exact KNN inside each block's candidate table.

    Rejected design (measured): two-tier extraction — full-k rounds on the
    best-ranked table half, fewer rounds on the far half, then a narrow
    merge — saved ~3 ms at table 4096 while the extraction loop was a
    lax.fori_loop, but with the UNROLLED loop (see _extract_min_rounds)
    plain full-width extraction is 1.6x faster than the tiered variant
    (22.2 vs 35.1 ms): the merge's repacking costs more than the skipped
    rounds.

    dist_mode picks the [qb, table] squared-distance computation:
      * "highest": qn+tn-2qt cross-term matmul at f32 HIGHEST (6 MXU
        passes — exact, but the K=4 contraction underfills the MXU).
      * "vpu": direct (q-t)^2 accumulation on the VPU, no MXU at all —
        exact f32 and no qn/tn cancellation error. Measured within 2% of
        "highest" at table 4096 (the kernel is DMA/extraction-bound, not
        distance-bound); numerically strictly better.
    (Mosaic does not implement Precision.HIGH — only these two.)"""
    tabs, rel_ref, d2_ref = args[:s], args[s], args[s + 1]
    q = q_ref[0]  # [qb, 4]
    qb = q.shape[0]
    tab = jnp.concatenate([t[0] for t in tabs], axis=0)  # [table, 4]
    if dist_mode == "vpu":
        d2 = jnp.zeros((qb, table), jnp.float32)
        for c in range(3):
            diff = q[:, c][:, None] - tab[:, c][None, :]
            d2 += diff * diff
    else:
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        tn = jnp.sum(tab * tab, axis=1)[None, :]
        cross = jax.lax.dot_general(
            q, tab, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        d2 = jnp.maximum(qn + tn - 2.0 * cross, 0.0)  # [qb, table]

    pos = jax.lax.broadcasted_iota(jnp.int32, (qb, table), 1)

    # Key packing: d2 >= 0, so its int32 bit pattern is order-preserving.
    # Embed the lane position in the low index bits (the table is <= 2^shift
    # wide): one min per extraction round yields BOTH the min distance and
    # its position, halving the VPU passes vs a min + masked-argmin pair.
    # Cost: the low `shift` mantissa bits of d2 are truncated — a relative
    # distance error < 2^-12 that can only swap near-exact ties.
    shift = max((table - 1).bit_length(), 1)
    mask = (1 << shift) - 1
    keys = (d2.view(jnp.int32) & ~mask) | pos

    if k == 1:
        m = jnp.min(keys, axis=1, keepdims=True)
        rel_ref[0] = m & mask
        d2_ref[0] = (m & ~mask).view(jnp.float32)
        return

    best_d, best_i = _extract_min_rounds(keys, k, mask)
    rel_ref[0] = best_i
    d2_ref[0] = best_d


def _global_candidates(seg_ids, seg):
    """[B, nqb, S] segment ids -> [B, nqb, S*seg] global row indices."""
    offs = jnp.arange(seg, dtype=jnp.int32)
    return (seg_ids[..., None] * seg + offs).reshape(
        seg_ids.shape[0], seg_ids.shape[1], -1)


def _knn_xla(points, queries, seg_ids, k, seg, qblock):
    """XLA twin of the knn kernel (same contract, same results up to ties).

    Used on CPU (tests / no-TPU hosts): the Mosaic interpreter is far too
    slow for model-sized inputs, and this path exercises identical selection
    and distance semantics.
    """
    b, n, _ = points.shape
    _, q, _ = queries.shape
    qpad = (-q) % qblock
    qs = jnp.pad(queries[..., :3], ((0, 0), (0, qpad), (0, 0)),
                 constant_values=2e9)
    cand = _global_candidates(seg_ids, seg)  # [B, nqb, S*seg]

    def one(pts, qrows, cnd):
        tabs = pts[cnd][..., :3]  # [nqb, S*seg, 3]
        qb = qrows.reshape(-1, qblock, 3)
        d2 = (jnp.sum(qb * qb, -1)[..., None] +
              jnp.sum(tabs * tabs, -1)[:, None, :] -
              2.0 * jnp.einsum("bqc,btc->bqt", qb, tabs,
                               precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.maximum(d2, 0.0)
        if k == 1:
            idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)[..., None]
            dd = jnp.min(d2, axis=-1)[..., None]
        else:
            neg, idx = jax.lax.top_k(-d2, k)
            idx = idx.astype(jnp.int32)
            dd = -neg
        return idx.reshape(-1, k), dd.reshape(-1, k)

    rel, d2 = jax.vmap(one)(points, qs, cand)
    return rel[:, :q], d2[:, :q]


# The whole scalar-prefetch operand lives in SMEM (~1 MB). Above this
# budget the call is split over the batch axis (B single-sample calls),
# keeping each call's [nqb*S] int32 table within limits. Observed hard
# limit on v5e: 1,048,576 bytes ("prefetched SMEM operand").
_SMEM_PREFETCH_BUDGET = 768 * 1024


def _split_batch(fn, b):
    """Run fn(i) for each batch index and stack the (tuple of) results."""
    outs = [fn(i) for i in range(b)]
    if isinstance(outs[0], tuple):
        return tuple(jnp.concatenate([o[j] for o in outs])
                     for j in range(len(outs[0])))
    return jnp.concatenate(outs)


def knn_pallas(points, queries, seg_ids, k, *, seg=128, qblock=128,
               dist_mode="vpu", interpret=False):
    """Exact KNN of each query inside its block's candidate table.

    Args:
        points: [B, Npad, 3or4] float32, Morton-sorted, padded to a multiple
            of seg with far-away coords (1e9) so pad rows never match.
        queries: [B, Q, 3or4] float32, Morton-sorted.
        seg_ids: [B, nqb, S] int32 from the XLA selection stage
            (nqb = ceil(Q / qblock)).
        k: neighbor count (static).
        dist_mode: "vpu" (default, exact f32 on the VPU) or "highest"
            (cross-term matmul) — see _knn_kernel.

    Returns (rel [B, Q, k] int32 indices into the S*seg table, d2 [B, Q, k]).
    """
    if interpret and not _INTERPRET_KERNEL:
        return _knn_xla(points, queries, seg_ids, k, seg, qblock)

    b, n, d = points.shape
    _, q, _ = queries.shape
    _, nqb, s = seg_ids.shape
    table = s * seg
    assert n % seg == 0, "pad points to a multiple of seg"

    if b > 1 and b * nqb * s * 4 > _SMEM_PREFETCH_BUDGET:
        return _split_batch(
            lambda i: knn_pallas(points[i:i + 1], queries[i:i + 1],
                                 seg_ids[i:i + 1], k, seg=seg,
                                 qblock=qblock, dist_mode=dist_mode,
                                 interpret=interpret), b)

    pts = points if d == 4 else jnp.pad(points, ((0, 0), (0, 0), (0, 1)))
    qpad = (-q) % qblock
    qs = queries if d == 4 else jnp.pad(queries, ((0, 0), (0, 0), (0, 1)))
    if qpad:
        qs = jnp.pad(qs, ((0, 0), (0, qpad), (0, 0)),
                     constant_values=2e9)

    kern = functools.partial(_knn_kernel, k=k, s=s, table=table,
                             dist_mode=dist_mode)
    seg_ids_flat = seg_ids.reshape(b, nqb * s)
    rel, d2 = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nqb),
            in_specs=[pl.BlockSpec((1, qblock, 4),
                                   lambda ib, iq, sref: (ib, iq, 0),
                                   memory_space=pltpu.VMEM)] +
            _seg_specs(s, seg, 4),
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
            jax.ShapeDtypeStruct((b, q + qpad, k), jnp.float32),
        ),
        interpret=interpret,
    )(seg_ids_flat, qs, *([pts] * s))
    return rel[:, :q], d2[:, :q]


def _gather_kernel(sref, rel_ref, *args, k, s, c, compute_dtype):
    tabs, out_ref = args[:s], args[s]
    tab = jnp.concatenate([t[0] for t in tabs],
                          axis=0).astype(compute_dtype)  # [table, C]
    rel = rel_ref[0]  # [qb, K]
    qb = rel.shape[0]
    table = tab.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (qb, table), 1)
    # the MXU's DEFAULT precision rounds f32 inputs to bf16; a gather must
    # be value-exact when f32 is requested
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    for kk in range(k):
        oh = (iota == rel[:, kk][:, None]).astype(compute_dtype)
        out = jax.lax.dot_general(
            oh, tab, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)
        out_ref[0, :, kk * c:(kk + 1) * c] = out.astype(out_ref.dtype)


def _gather_flat_kernel(sref, rel_ref, *args, k, s, c, compute_dtype,
                        group=1):
    """One-hot gather with k FLATTENED into the matmul M dim: ONE
    [qb*k, table] x [table, C] matmul per block (full 128-row MXU tiles)
    instead of k separate [qb, table] matmuls whose M=qb rows waste the
    systolic array whenever qblock < 128. Output rows are (query-major,
    k-minor) — the caller reshapes [Q*k, C] -> [Q, k, C] outside.

    group > 1 processes `group` consecutive query blocks (each with its
    OWN s-slot table) in one grid step: fine-grained tables (gather_qblock
    re-blocking) keep their narrow width — the matmul/one-hot win — while
    the grid stays coarse, avoiding the per-block overhead that made
    small qblocks LOSE at equal table width (bench_gather.py: qb32@1024
    12.9 ms vs qb128@1024 7.6 ms for the same [45k, 16] gather)."""
    tabs, out_ref = args[:s * group], args[s * group]
    relall = rel_ref[0]  # [qb*group, K]
    qb = relall.shape[0] // group
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    for g in range(group):
        tab = jnp.concatenate(
            [tabs[g * s + j][0] for j in range(s)],
            axis=0).astype(compute_dtype)  # [table, C]
        table = tab.shape[0]
        rel = relall[g * qb:(g + 1) * qb]
        iota3 = jax.lax.broadcasted_iota(jnp.int32, (qb, k, table), 2)
        oh = (iota3 == rel[:, :, None]).astype(compute_dtype)
        out_ref[0, g * qb * k:(g + 1) * qb * k, :] = jax.lax.dot_general(
            oh.reshape(qb * k, table), tab,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)  # [qb*k, C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def gather_pallas(values, seg_ids, rel, seg=128, qblock=128,
                  compute_dtype=jnp.bfloat16, interpret=False):
    """out[b, i, j] = values[b, seg_ids[b, i//qblock, rel[b,i,j]//seg]*seg
                              + rel[b,i,j]%seg].

    Args:
        values: [B, Npad, C] (Npad multiple of seg).
        seg_ids: [B, nqb, S] int32.
        rel: [B, Q, K] int32 indices into each block's S*seg table.
        compute_dtype: one-hot matmul dtype; bf16 doubles MXU rate and costs
            only bf16 rounding of the gathered values.

    Returns [B, Q, K, C] float32.
    """
    return _gather_fwd_impl(values, seg_ids, rel, seg, qblock, compute_dtype,
                            interpret)


def _gather_fwd_impl(values, seg_ids, rel, seg, qblock, compute_dtype,
                     interpret):
    b, n, c = values.shape
    _, q, k = rel.shape
    _, nqb, s = seg_ids.shape
    assert n % seg == 0, "pad values to a multiple of seg"

    if interpret and not _INTERPRET_KERNEL:
        # XLA twin for CPU/tests (exact f32 rows; the kernel's bf16 one-hot
        # matmul rounds values to bf16)
        blk = jnp.arange(q)[None, :, None] // qblock
        bidx = jnp.arange(b)[:, None, None]
        glob = seg_ids[bidx, blk, rel // seg] * seg + rel % seg
        return values[bidx, glob]
    if b > 1 and b * nqb * s * 4 > _SMEM_PREFETCH_BUDGET:
        return _split_batch(
            lambda i: _gather_fwd_impl(values[i:i + 1], seg_ids[i:i + 1],
                                       rel[i:i + 1], seg, qblock,
                                       compute_dtype, interpret), b)

    # Pad queries to cover EXACTLY the nqb table rows: after compact_tables
    # re-blocking (gather_qblock), nqb can exceed ceil(q/qblock) whenever q
    # is not a multiple of the original search qblock — padding from q alone
    # would let the extra grid steps index rel/out blocks out of bounds.
    qpad = nqb * qblock - q
    assert qpad >= 0, (nqb, qblock, q)
    relp = jnp.pad(rel, ((0, 0), (0, qpad), (0, 0))) if qpad else rel
    seg_ids_flat = seg_ids.reshape(b, nqb * s)

    # Flattened variant when qblock underfills the MXU's 128-row tiles and
    # the [qb*k, table] one-hot fits comfortably in VMEM. Mosaic accepts
    # the [qb, k, table] -> [qb*k, table] reshape only when the lane dim
    # (table) is 128-aligned and the merged rows stay sublane-aligned —
    # a k=3 upsample gather against a 1-segment 32-lane table (Point
    # Transformer pyramid, coarsest level) hit "unsupported shape cast".
    oh_bytes = qblock * k * s * seg * (2 if compute_dtype == jnp.bfloat16
                                       else 4)
    if (qblock < 128 and s * seg % 128 == 0 and (qblock * k) % 8 == 0 and
            oh_bytes <= 4 * 1024 * 1024):
        # group consecutive blocks into one grid step up to 128 query
        # rows: narrow per-sub-block tables at coarse grid overhead (see
        # _gather_flat_kernel)
        group = min(128 // qblock, max(1, 64 // s))  # <= 64 seg operands
        while group > 1 and nqb % group:
            group //= 2
        kern = functools.partial(_gather_flat_kernel, k=k, s=s, c=c,
                                 compute_dtype=compute_dtype, group=group)
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, nqb // group),
                in_specs=[pl.BlockSpec((1, qblock * group, k),
                                       lambda ib, iq, sref: (ib, iq, 0),
                                       memory_space=pltpu.VMEM)] +
                _seg_specs(s * group, seg, c),
                out_specs=pl.BlockSpec((1, qblock * group * k, c),
                                       lambda ib, iq, sref: (ib, iq, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((b, (q + qpad) * k, c),
                                           jnp.float32),
            interpret=interpret,
        )(seg_ids_flat, relp, *([values] * s * group))
        return out.reshape(b, q + qpad, k, c)[:, :q]

    kern = functools.partial(_gather_kernel, k=k, s=s, c=c,
                             compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nqb),
            in_specs=[pl.BlockSpec((1, qblock, k),
                                   lambda ib, iq, sref: (ib, iq, 0),
                                   memory_space=pltpu.VMEM)] +
            _seg_specs(s, seg, c),
            out_specs=pl.BlockSpec((1, qblock, k * c),
                                   lambda ib, iq, sref: (ib, iq, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((b, q + qpad, k * c), jnp.float32),
        interpret=interpret,
    )(seg_ids_flat, relp, *([values] * s))
    return out[:, :q].reshape(b, q, k, c)


def _gather_fwd(values, seg_ids, rel, seg, qblock, compute_dtype, interpret):
    out = _gather_fwd_impl(values, seg_ids, rel, seg, qblock, compute_dtype,
                           interpret)
    return out, (values.shape, seg_ids, rel)


def _gather_bwd_kernel(rel_ref, g_ref, out_ref, *, k, c, table,
                       compute_dtype):
    """Per query block: dTable = one-hot^T @ g — the exact transpose of the
    forward's gather matmul, on the MXU. compute_dtype matches the
    forward's (f32 = exact grads; bf16 rounds the cotangents like the
    forward rounds the values)."""
    rel = rel_ref[0]                                   # [qb, K]
    qb = rel.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (qb, table), 1)
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    acc = jnp.zeros((table, c), jnp.float32)
    for kk in range(k):
        oh = (iota == rel[:, kk][:, None]).astype(compute_dtype)
        gk = g_ref[0, :, kk * c:(kk + 1) * c].astype(compute_dtype)
        acc = acc + jax.lax.dot_general(
            oh, gk, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)        # [table, C]
    out_ref[0] = acc


def _gather_bwd_flat_kernel(rel_ref, g_ref, out_ref, *, k, c, table,
                            compute_dtype, group=1):
    """Flattened backward: ONE [qb*k, table]^T x [qb*k, C] matmul per block
    (contraction dim qb*k fills the MXU even at small qblock). g is shipped
    pre-reshaped to [Qpad*k, C] rows (query-major, k-minor). group > 1
    mirrors the forward's grouped-table stepping."""
    relall = rel_ref[0]                                # [qb*group, K]
    qb = relall.shape[0] // group
    gall = g_ref[0]                                    # [qb*group*k, C]
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    for g in range(group):
        rel = relall[g * qb:(g + 1) * qb]
        iota3 = jax.lax.broadcasted_iota(jnp.int32, (qb, k, table), 2)
        oh = (iota3 == rel[:, :, None]).astype(compute_dtype)
        gk = gall[g * qb * k:(g + 1) * qb * k].astype(compute_dtype)
        out_ref[0, g * table:(g + 1) * table, :] = jax.lax.dot_general(
            oh.reshape(qb * k, table), gk,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)        # [table, C]


def _gather_bwd(seg, qblock, compute_dtype, interpret, res, g):
    """Backward: accumulate cotangents into the gathered value rows.

    A direct scatter-add is row-latency-bound (Q*K rows — measured the
    dominant cost of fused training). Instead each block's [table, C]
    partial is the TRANSPOSED one-hot matmul of the forward (MXU), and the
    per-(block, slot) partials are reduced into value rows with one
    segment-granular scatter-add of nqb*S large contiguous chunks.
    """
    vshape, seg_ids, rel = res
    b, n, c = vshape
    _, q, k = rel.shape
    _, nqb, s = seg_ids.shape
    table = s * seg

    if interpret and not _INTERPRET_KERNEL:  # XLA twin: plain scatter-add
        blk = jnp.arange(q)[None, :, None] // qblock
        bidx = jnp.arange(b)[:, None, None]
        glob = seg_ids[bidx, blk, rel // seg] * seg + rel % seg
        dv = jnp.zeros(vshape, g.dtype)
        dv = dv.at[bidx, glob].add(g)
        return dv, None, None

    # pad to cover exactly the nqb table rows (see _gather_fwd_impl): with
    # re-blocked tables the extra grid steps would otherwise read g out of
    # bounds and scatter-add the duplicated partials into dv
    qpad = nqb * qblock - q
    assert qpad >= 0, (nqb, qblock, q)
    relp = jnp.pad(rel, ((0, 0), (0, qpad), (0, 0))) if qpad else rel

    oh_bytes = qblock * k * table * (2 if compute_dtype == jnp.bfloat16
                                     else 4)
    if qblock < 128 and oh_bytes <= 4 * 1024 * 1024:
        group = min(128 // qblock, max(1, 64 // s))  # mirror the forward
        while group > 1 and nqb % group:
            group //= 2
        gp = g.reshape(b, q * k, c)
        if qpad:  # padded queries contribute zero
            gp = jnp.pad(gp, ((0, 0), (0, qpad * k), (0, 0)))
        kern = functools.partial(_gather_bwd_flat_kernel, k=k, c=c,
                                 table=table, compute_dtype=compute_dtype,
                                 group=group)
        partial = pl.pallas_call(
            kern,
            grid=(b, nqb // group),
            in_specs=[
                pl.BlockSpec((1, qblock * group, k),
                             lambda ib, iq: (ib, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qblock * group * k, c),
                             lambda ib, iq: (ib, iq, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, group * table, c),
                                   lambda ib, iq: (ib, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, nqb * table, c),
                                           jnp.float32),
            interpret=interpret,
        )(relp, gp)
    else:
        gp = g.reshape(b, q, k * c)
        if qpad:  # padded queries contribute zero
            gp = jnp.pad(gp, ((0, 0), (0, qpad), (0, 0)))
        kern = functools.partial(_gather_bwd_kernel, k=k, c=c, table=table,
                                 compute_dtype=compute_dtype)
        partial = pl.pallas_call(
            kern,
            grid=(b, nqb),
            in_specs=[
                pl.BlockSpec((1, qblock, k), lambda ib, iq: (ib, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qblock, k * c), lambda ib, iq: (ib, iq, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, table, c),
                                   lambda ib, iq: (ib, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, nqb * table, c), jnp.float32),
            interpret=interpret,
        )(relp, gp)

    # reduce partials into value rows: one scatter-add of nqb*S contiguous
    # [seg, C] chunks per sample (latency ~nqb*S rows, not Q*K)
    part = partial.reshape(b, nqb * s, seg, c)
    sid = seg_ids.reshape(b, nqb * s)
    nseg = n // seg
    bidx = jnp.arange(b)[:, None]
    dv = jnp.zeros((b, nseg, seg, c), jnp.float32)
    dv = dv.at[bidx, sid].add(part, mode="drop")
    return dv.reshape(b, n, c).astype(g.dtype), None, None


gather_pallas.defvjp(_gather_fwd, _gather_bwd)
