"""Per-stage time breakdown of the SparseConvUnet BUCKET forward on chip.

Decomposes the shipped ScanNet-config forward (bench.py's
sparseconvunet metric) into its stages, mirroring
SparseConvUnetNet._forward_bucket:

    voxsort_ms   voxelize + Morton sort + point->site remap + input mean
    rank_ms      rank_site_segments at every level (sub + down + up)
    match_ms     match_stencil (Pallas k=1 rulebook) at every level
    convs_ms     every gather_taps + GEMM at its real (V, K, C) shape
    downup_ms    bucket_downsample + up one-hot apply arithmetic
    fwd_ms       the whole model forward
    rest_ms      fwd - (the above)  (BN/ReLU/logits/devoxelize residual)

Chained-fori_loop timing (see bench.py). Usage:
    python scripts/profile_scu_bucket.py [--iters 5]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chained(fn, *args, iters=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(_, s):
            aa = (a[0] + s * 1e-38,) + a[1:]
            return fn(*aa)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from open3d_ml_tpu.pipelines.base_pipeline import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from open3d_ml_tpu.datasets.synthetic import make_semseg_scene
    from open3d_ml_tpu.models import SparseConvUnet
    from open3d_ml_tpu.models.sparseconvunet import SparseConvUnetNet
    from open3d_ml_tpu.ops.sparse import kernel_offsets
    from open3d_ml_tpu.ops.sparse_bucket import (bucket_downsample,
                                                 gather_taps,
                                                 match_stencil,
                                                 rank_site_segments,
                                                 sort_sites, support_points,
                                                 BucketCtx)
    from open3d_ml_tpu.ops.voxelize import voxelize
    from open3d_ml_tpu.utils import Config

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.load_from_file(os.path.join(
        here, "open3d_ml_tpu", "configs", "sparseconvunet_scannet.yml"))
    model_cfg = dict(cfg.model)
    model_cfg.pop("name", None)
    model_cfg["warn_on_overflow"] = False
    model = SparseConvUnet(**model_cfg)
    n = model.cfg.num_points
    rng = np.random.default_rng(0)

    # same surface scene as bench.child_sparseconvunet
    pts = make_semseg_scene(n, seed=0)[0].astype(np.float64)
    pts -= pts.min(0)
    pts *= min(1000.0 / max(pts.max(), 1e-6), 1.0 / model.cfg.voxel_size)
    pts = (pts.astype(np.int32) + 0.5).astype(np.float32)
    batch = {
        "point": jnp.asarray(pts[None]),
        "feat": jnp.asarray(rng.uniform(-1, 1, (1, n, 3)), jnp.float32),
        "point_mask": jnp.ones((1, n), bool),
    }

    seg = model.cfg.get("bucket_seg", 64)
    qblock = model.cfg.get("bucket_qblock", 32)
    s_cand = model.cfg.get("bucket_segs", 16)
    num_levels = model.cfg.num_levels
    cap = model.cfg.max_voxels
    m = model.cfg.multiplier
    planes = [m * (i + 1) for i in range(num_levels)]
    caps = [max(((cap >> i) + 7) & ~7, 64) for i in range(num_levels)]
    cdt = model.cfg.get("compute_dtype", None)
    offs27 = kernel_offsets(3, centered=True)
    offs8 = kernel_offsets(2, centered=False)
    rec = {"device": jax.devices()[0].device_kind, "caps": caps}

    # ---- stage: voxelize + sort + input mean
    def voxsort(p, pm, f):
        vd = jax.vmap(lambda pp, mm: voxelize(
            pp, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0),
            (1024.0, 1024.0, 1024.0), cap, 1024 // 8,
            points_mask=mm))(p, pm)
        coords, mask, mkey, inv_perm = sort_sites(vd.coords, vd.voxel_mask)
        inv_pad = jnp.concatenate(
            [inv_perm, jnp.full((1, 1), cap, jnp.int32)], axis=1)
        ps = jnp.take_along_axis(inv_pad, vd.point_to_voxel, axis=1)
        vp = (vd.point_to_voxel < cap) & pm
        ps = jnp.where(vp, ps, cap)
        fs = jax.vmap(lambda ff, pp, vv: jax.ops.segment_sum(
            jnp.where(vv[:, None], ff, 0.0), pp,
            num_segments=cap + 1)[:cap])(f, ps, vp)
        return (jnp.sum(coords) + jnp.sum(fs)).astype(jnp.float32) * 1e-12

    rec["voxsort_ms"] = round(chained(
        voxsort, batch["point"], batch["point_mask"], batch["feat"],
        iters=args.iters) * 1e3, 2)

    # materialize per-level geometry (the stage functions' constants)
    vd = jax.vmap(lambda pp, mm: voxelize(
        pp, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0), (1024.0, 1024.0, 1024.0),
        cap, 1024 // 8, points_mask=mm))(batch["point"],
                                         batch["point_mask"])
    coords, mask, mkey, _ = sort_sites(vd.coords, vd.voxel_mask)
    levels = []  # (coords, mask, nv, mkey)
    c_, m_, k_ = coords, mask, mkey
    for i in range(num_levels):
        nv = jnp.sum(m_, axis=1).astype(jnp.int32)
        levels.append((c_, m_, nv, k_))
        rec.setdefault("active_sites", []).append(int(nv[0]))
        if i < num_levels - 1:
            c_, m_, k_, _, _ = bucket_downsample(c_, m_, k_, caps[i + 1])

    # ---- stage: rank_site_segments everywhere (sub every level; down+up
    # between levels)
    def rank_all(c0):
        acc = jnp.sum(c0).astype(jnp.float32) * 0.0
        for i in range(num_levels):
            c, mm, nv, _ = levels[i]
            sup = support_points(c, mm, seg)
            sids, _ = rank_site_segments(
                sup, nv, c.astype(jnp.float32), nv, seg=seg, qblock=qblock,
                num_segs=s_cand, reach=1.74)
            acc += jnp.sum(sids).astype(jnp.float32) * 1e-12
            if i < num_levels - 1:
                cp, mp, npar, _ = levels[i + 1]
                pq = jnp.where(mp[..., None], (cp * 2).astype(jnp.float32),
                               2e9)
                sd, _ = rank_site_segments(sup, nv, pq, npar, seg=seg,
                                           qblock=qblock, num_segs=s_cand,
                                           reach=1.74)
                supp = support_points(cp, mp, seg)
                fq = jnp.where(mm[..., None],
                               (c >> 1).astype(jnp.float32), 2e9)
                su, _ = rank_site_segments(supp, npar, fq, nv, seg=seg,
                                           qblock=128, num_segs=s_cand,
                                           reach=0.1)
                acc += (jnp.sum(sd) + jnp.sum(su)).astype(
                    jnp.float32) * 1e-12
        return acc

    c0f = coords.astype(jnp.float32)
    rec["rank_ms"] = round(chained(rank_all, c0f,
                                   iters=args.iters) * 1e3, 2)

    # materialize all seg_ids / ctxs
    ctxs, down_ctxs, up_ctxs = [], [], []
    for i in range(num_levels):
        c, mm, nv, _ = levels[i]
        sup = support_points(c, mm, seg)
        sids, _ = rank_site_segments(sup, nv, c.astype(jnp.float32), nv,
                                     seg=seg, qblock=qblock,
                                     num_segs=s_cand, reach=1.74)
        sq = jnp.where(mm[..., None], c.astype(jnp.float32), 2e9)
        rel, fnd = match_stencil(sup, sq, offs27, sids, seg=seg,
                                 qblock=qblock)
        ctxs.append((sup, sq, sids, BucketCtx(sids, rel, fnd, seg, qblock)))
        if i < num_levels - 1:
            cp, mp, npar, _ = levels[i + 1]
            pq = jnp.where(mp[..., None], (cp * 2).astype(jnp.float32), 2e9)
            sd, _ = rank_site_segments(sup, nv, pq, npar, seg=seg,
                                       qblock=qblock, num_segs=s_cand,
                                       reach=1.74)
            rd, fd = match_stencil(sup, pq, offs8, sd, seg=seg,
                                   qblock=qblock)
            down_ctxs.append((sup, pq, sd,
                              BucketCtx(sd, rd, fd, seg, qblock)))
            supp = support_points(cp, mp, seg)
            fq = jnp.where(mm[..., None], (c >> 1).astype(jnp.float32), 2e9)
            su, _ = rank_site_segments(supp, npar, fq, nv, seg=seg,
                                       qblock=128, num_segs=s_cand,
                                       reach=0.1)
            ru, fu = match_stencil(supp, fq, np.zeros((1, 3), np.int32),
                                   su, seg=seg, qblock=128)
            up_ctxs.append((supp, fq, su, BucketCtx(su, ru, fu, seg, 128)))

    # ---- stage: match_stencil everywhere (given seg_ids)
    def match_all(c0):
        acc = jnp.sum(c0).astype(jnp.float32) * 0.0
        for i in range(num_levels):
            sup, sq, sids, _ = ctxs[i]
            rel, fnd = match_stencil(sup, sq, offs27, sids, seg=seg,
                                     qblock=qblock)
            acc += jnp.sum(rel).astype(jnp.float32) * 1e-12
            if i < num_levels - 1:
                sup_d, pq, sd, _ = down_ctxs[i]
                rd, _ = match_stencil(sup_d, pq, offs8, sd, seg=seg,
                                      qblock=qblock)
                supp, fq, su, _ = up_ctxs[i]
                ru, _ = match_stencil(supp, fq,
                                      np.zeros((1, 3), np.int32), su,
                                      seg=seg, qblock=128)
                acc += (jnp.sum(rd) + jnp.sum(ru)).astype(
                    jnp.float32) * 1e-12
        return acc

    rec["match_ms"] = round(chained(match_all, c0f,
                                    iters=args.iters) * 1e3, 2)

    # ---- stage: every conv's gather+GEMM at its real shape. Conv counts
    # per level (residual ScanNet config): input_conv at l0; per level
    # block = 2 convs (residual), post = 2 convs except deepest; down GEMM
    # and up gather between levels.
    import jax.random as jrandom

    def convs_all(c0):
        acc = jnp.sum(c0).astype(jnp.float32) * 0.0
        for i in range(num_levels):
            _, _, _, ctx = ctxs[i]
            v = caps[i]
            p = planes[i]
            nconv = (1 if i == 0 else 0) + 2 + (2 if i < num_levels - 1
                                                else 0)
            key = jrandom.PRNGKey(i)
            f = jrandom.normal(key, (1, v, p), jnp.float32)
            w = jrandom.normal(key, (27 * p, p), jnp.float32)
            gd = jnp.dtype(cdt) if cdt else jnp.float32
            for _ in range(nconv):
                g = gather_taps(f, ctx, compute_dtype=cdt)
                out = jax.lax.dot_general(
                    g.reshape(1, v, 27 * p).astype(gd), w.astype(gd),
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                f = out * 1e-6 + f
            acc += jnp.sum(f).astype(jnp.float32) * 1e-12
            if i < num_levels - 1:
                _, _, _, dctx = down_ctxs[i]
                gd8 = gather_taps(f, dctx, compute_dtype=cdt)
                _, _, _, uctx = up_ctxs[i]
                fu = jrandom.normal(key, (1, caps[i + 1], planes[i + 1]),
                                    jnp.float32)
                gu = gather_taps(fu, uctx, compute_dtype=cdt)
                acc += (jnp.sum(gd8) + jnp.sum(gu)).astype(
                    jnp.float32) * 1e-12
        return acc

    rec["convs_ms"] = round(chained(convs_all, c0f,
                                    iters=args.iters) * 1e3, 2)

    # ---- stage: downsample chain
    def down_all(c0):
        acc = jnp.sum(c0).astype(jnp.float32) * 0.0
        c_, m_, k_ = coords, mask, mkey
        for i in range(num_levels - 1):
            c_, m_, k_, off, _ = bucket_downsample(c_, m_, k_, caps[i + 1])
            acc += jnp.sum(off).astype(jnp.float32) * 1e-12
        return acc

    rec["downup_ms"] = round(chained(down_all, c0f,
                                     iters=args.iters) * 1e3, 2)

    # ---- full forward
    net = model.get_net()
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda b: net.init({"params": key}, b,
                                           training=False))(batch)

    def fwd(p, v, f, pm):
        return jnp.sum(net.apply(v, {"point": p, "feat": f,
                                     "point_mask": pm}, training=False))

    rec["fwd_ms"] = round(chained(
        fwd, batch["point"], variables, batch["feat"],
        batch["point_mask"], iters=args.iters) * 1e3, 2)
    rec["rest_ms"] = round(
        rec["fwd_ms"] - rec["voxsort_ms"] - rec["rank_ms"] -
        rec["match_ms"] - rec["convs_ms"] - rec["downup_ms"], 2)
    rec["points_per_sec"] = round(n / (rec["fwd_ms"] / 1e3), 1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
