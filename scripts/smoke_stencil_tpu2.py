"""Chip triangulation for the stencil-conv grad mismatch seen on dense
scenes: compares, ON THE TPU,

  twin   — the pure-XLA reference (interpret=True paths: _match_xla +
           XLA gather twin): exact by construction, runs on any backend;
  kernel — the fused stencil_conv_pallas (real Mosaic kernels);
  dist   — the match_stencil (knn_pallas) + gather_taps composition
           (the pre-round-5 SCU path, also real kernels);

for forward values, gradients, and the rulebooks themselves. Prints one
JSON line with max errors + rulebook disagreement counts, so whichever
component is wrong on real hardware is named directly.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from open3d_ml_tpu.ops.pallas.stencil import (stencil_conv_pallas,
                                                  stencil_match_pallas)
    from open3d_ml_tpu.ops.sparse import kernel_offsets
    from open3d_ml_tpu.ops.sparse_bucket import (BucketCtx, gather_taps,
                                                 match_stencil,
                                                 rank_site_segments,
                                                 sort_sites,
                                                 stencil_query_keys,
                                                 support_points)

    seg, qblock, cin, cout = 64, 32, 32, 48
    b, cap, box = 2, 2048, 24
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
    cot = jnp.asarray(rng.standard_normal((b, cap, cout)),
                      jnp.float32) * mask[..., None]
    qkeys = stencil_query_keys(coords, mask, offs)
    m = np.asarray(mask)

    out = {"table_overflow": int(jnp.sum(ovf))}

    # --- rulebooks: twin vs kernel vs distance ---------------------------
    def rb_key(interpret):
        return stencil_match_pallas(mkey, qkeys, seg_ids, seg=seg,
                                    qblock=qblock, interpret=interpret)

    def rb_dist(interpret):
        return match_stencil(sup, sites_q, offs, seg_ids, seg=seg,
                             qblock=qblock, interpret=interpret)

    rel_t, fnd_t = jax.jit(lambda: rb_key(True))()
    rel_k, fnd_k = jax.jit(lambda: rb_key(False))()
    rel_d, fnd_d = jax.jit(lambda: rb_dist(False))()
    rel_dt, fnd_dt = jax.jit(lambda: rb_dist(True))()

    def rb_diff(tag, ra, fa, rb_, fb_):
        fa, fb_ = np.asarray(fa, bool), np.asarray(fb_, bool)
        ra, rb2 = np.asarray(ra), np.asarray(rb_)
        vm = m[:, :, None] & np.ones_like(fa)
        fdis = int(np.sum((fa != fb_) & vm))
        hit = fa & fb_ & vm
        rdis = int(np.sum((ra != rb2) & hit))
        out[f"{tag}_found_disagree"] = fdis
        out[f"{tag}_rel_disagree_on_hits"] = rdis

    rb_diff("kernel_vs_twin", rel_k, fnd_k, rel_t, fnd_t)
    rb_diff("dist_vs_twin", rel_d, fnd_d, rel_t, fnd_t)
    rb_diff("disttwin_vs_twin", rel_dt, fnd_dt, rel_t, fnd_t)

    # --- forward + grads: twin vs kernel ---------------------------------
    def fused(v, ww, interpret):
        return stencil_conv_pallas(v, mkey, qkeys, seg_ids, ww, seg,
                                   qblock, jnp.float32, interpret)

    def loss(v, ww, interpret):
        return jnp.sum(fused(v, ww, interpret) * cot)

    out_t = jax.jit(lambda v, ww: fused(v, ww, True))(values, w)
    out_k = jax.jit(lambda v, ww: fused(v, ww, False))(values, w)
    out["fwd_kernel_vs_twin"] = float(
        np.max(np.abs(np.asarray(out_k)[m] - np.asarray(out_t)[m])))

    gv_t, gw_t = jax.jit(jax.grad(
        lambda v, ww: loss(v, ww, True), (0, 1)))(values, w)
    gv_k, gw_k = jax.jit(jax.grad(
        lambda v, ww: loss(v, ww, False), (0, 1)))(values, w)
    out["dv_kernel_vs_twin"] = float(
        np.max(np.abs(np.asarray(gv_k) - np.asarray(gv_t))))
    out["dw_kernel_vs_twin"] = float(
        np.max(np.abs(np.asarray(gw_k) - np.asarray(gw_t))))

    # --- distance-composition grads vs twin -------------------------------
    def loss_dist(v, ww, interpret):
        ctx = BucketCtx(seg_ids, rel_d if not interpret else rel_t,
                        fnd_d if not interpret else fnd_t, seg, qblock,
                        interpret)
        g = gather_taps(v, ctx, compute_dtype=jnp.float32)
        return jnp.sum(jnp.einsum(
            "bqkc,kco->bqo", g, ww,
            precision=jax.lax.Precision.HIGHEST) * cot)

    gv_d, gw_d = jax.jit(jax.grad(
        lambda v, ww: loss_dist(v, ww, False), (0, 1)))(values, w)
    out["dv_dist_vs_twin"] = float(
        np.max(np.abs(np.asarray(gv_d) - np.asarray(gv_t))))
    out["dw_dist_vs_twin"] = float(
        np.max(np.abs(np.asarray(gw_d) - np.asarray(gw_t))))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
