"""Chip smoke for the fused stencil-conv kernel: real Mosaic lowering +
parity vs the match_stencil/gather_taps composition at a small-but-real
shape. Exits non-zero on any mismatch, printing one JSON line either way.

Usage: python scripts/smoke_stencil_tpu.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from open3d_ml_tpu.ops.pallas.stencil import stencil_conv_pallas
    from open3d_ml_tpu.ops.sparse import kernel_offsets
    from open3d_ml_tpu.ops.sparse_bucket import (BucketCtx, gather_taps,
                                                 match_stencil,
                                                 rank_site_segments,
                                                 sort_sites,
                                                 stencil_query_keys,
                                                 support_points)

    seg, qblock, cin, cout = 64, 32, 32, 48
    b, cap, box = 2, 2048, 24  # dense box -> exact tables at S=16
    rng = np.random.default_rng(0)
    coords = np.zeros((b, cap, 3), np.int32)
    mask = np.zeros((b, cap), bool)
    for i in range(b):
        c = np.unique(rng.integers(0, box, (cap * 2, 3)), axis=0)
        rng.shuffle(c)
        n = min(len(c), cap - 11 + i)
        coords[i, :n] = c[:n]
        mask[i, :n] = True
    coords, mask, mkey, _ = sort_sites(jnp.asarray(coords),
                                       jnp.asarray(mask))
    nv = jnp.sum(mask, axis=1).astype(jnp.int32)
    sup = support_points(coords, mask, seg)
    sites_q = jnp.where(mask[..., None], coords.astype(jnp.float32), 2e9)
    seg_ids, ovf = rank_site_segments(sup, nv, sites_q, nv, seg=seg,
                                      qblock=qblock, num_segs=16,
                                      reach=1.74)
    offs = kernel_offsets(3, centered=True)
    k = offs.shape[0]
    values = jnp.asarray(rng.standard_normal((b, cap, cin)),
                         jnp.float32) * mask[..., None]
    w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1, jnp.float32)

    rel, fnd = match_stencil(sup, sites_q, offs, seg_ids, seg=seg,
                             qblock=qblock, interpret=False)
    ctx = BucketCtx(seg_ids, rel, fnd, seg, qblock, False)
    g = gather_taps(values, ctx, compute_dtype=jnp.float32)
    # HIGHEST: the kernel's f32 path is exact; a default-precision einsum
    # would bf16-round its inputs on the MXU and dominate the error
    ref = jnp.einsum("bqkc,kco->bqo", g, w,
                     precision=jax.lax.Precision.HIGHEST)

    qkeys = stencil_query_keys(coords, mask, offs)

    def fused(v, ww):
        return stencil_conv_pallas(v, mkey, qkeys, seg_ids, ww, seg,
                                   qblock, jnp.float32, False)

    out = jax.jit(fused)(values, w)
    m = np.asarray(mask)
    err = float(np.max(np.abs(np.asarray(out)[m] - np.asarray(ref)[m])))

    cot = jnp.asarray(rng.standard_normal((b, cap, cout)),
                      jnp.float32) * mask[..., None]
    gv, gw = jax.jit(jax.grad(
        lambda v, ww: jnp.sum(fused(v, ww) * cot), (0, 1)))(values, w)
    gv_r, gw_r = jax.grad(
        lambda v, ww: jnp.sum(
            jnp.einsum("bqkc,kco->bqo",
                       gather_taps(v, ctx, compute_dtype=jnp.float32), ww,
                       precision=jax.lax.Precision.HIGHEST)
            * cot), (0, 1))(values, w)

    gerr = max(float(np.max(np.abs(np.asarray(gv) - np.asarray(gv_r)))),
               float(np.max(np.abs(np.asarray(gw) - np.asarray(gw_r)))))
    ok = err < 1e-3 and gerr < 1e-2 and int(jnp.sum(ovf)) == 0
    print(json.dumps({"fwd_max_err": err, "grad_max_err": gerr,
                      "table_overflow": int(jnp.sum(ovf)), "ok": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
