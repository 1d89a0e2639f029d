"""Per-stage time breakdown of the fused RandLA-Net forward on the chip.

Decomposes the flagship forward (the bench.py primary metric) into the
stages that MFU cannot see — the FLOPs model counts only model matmuls, so
at MFU 0.32% ~99.7% of the runtime is invisible. This makes it visible:

    sort_ms       Hilbert codes + argsort + permute        (per forward)
    select_ms     XLA segment ranking, all levels (nbr+up)
    knn_ms        Pallas table KNN, all levels (nbr+up)
    compact_ms    gather-table compaction, all levels
    pyramid_ms    the four above, fused as the real pyramid build
    gather_ms     every model-side gather_pallas at its real shape
    fwd_ms        the whole forward (pyramid + gathers + MLPs)
    model_rest_ms fwd - pyramid - gather  (MLP/GEMM + glue residual)

Stages are timed with the chained-fori_loop methodology (bench.py): the
relay round-trip is ~32 ms, so each stage runs `iters` times inside ONE
jit with a data dependency and is fetched once.

Usage: python scripts/profile_stages.py [seg qblock S G [U]]
Defaults = the shipped YAML config (seg64 qb128 S64 G32 U0).
"""
import json
import os
import sys
import time

import numpy as np


def chained(fn, *args, iters=10):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(_, s):
            aa = (a[0] + s * 1e-38,) + a[1:]
            return fn(*aa)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(*args))  # warmup + compile
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def stage_times(b=4, n=45056, k=16, ratios=(4, 4, 4, 4), seg=64,
                qblock=128, num_segs=64, gather_segs=32, up_segs=0,
                iters=10, model=True, interpret=None,
                up_mode="search"):
    """Returns the per-stage ms dict (see module docstring). model=False
    skips the full-forward / gather stages (pyramid decomposition only)."""
    import jax
    import jax.numpy as jnp
    from open3d_ml_tpu.ops.bucket import (_pad_seg, build_bucket_pyramid_tpu,
                                          compact_tables, select_segments)
    from open3d_ml_tpu.ops.morton import hilbert_codes
    from open3d_ml_tpu.ops.pallas.bucket import gather_pallas, knn_pallas

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-25, 25, (b, n, 3)), jnp.float32)
    out = {}

    # ---- stage: hilbert sort
    def sort_fn(p):
        codes = jax.vmap(hilbert_codes)(p)
        perm = jnp.argsort(codes, axis=1).astype(jnp.int32)
        pc = jnp.take_along_axis(p, perm[..., None], axis=1)
        return jnp.sum(pc) * 1e-12

    out["sort_ms"] = chained(sort_fn, pts, iters=iters) * 1e3

    # materialize the sorted pyramid coords once — under ONE jit per step
    # (eager dispatch through the TPU relay costs ~32 ms per op; a few
    # hundred eager ops would take minutes)
    @jax.jit
    def _mk_coords(p):
        codes = jax.vmap(hilbert_codes)(p)
        perm = jnp.argsort(codes, axis=1).astype(jnp.int32)
        pc = jnp.take_along_axis(p, perm[..., None], axis=1)
        cs = [pc]
        for r in ratios:
            nn_ = cs[-1].shape[1]
            cs.append(cs[-1][:, ::r][:, :nn_ // r])
        return cs

    coords = _mk_coords(pts)
    pc0 = coords[0]

    # ---- stage: segment selection (nbr at every level + up at every level)
    def select_fn(p0):
        cs = [p0] + coords[1:]
        acc = jnp.float32(0.0)
        for i, r in enumerate(ratios):
            pcl, sub = cs[i], cs[i + 1]
            s_here = min(num_segs, -(-pcl.shape[1] // seg))
            sids = select_segments(pcl, pcl, seg=seg, qblock=qblock,
                                   num_segs=s_here)
            acc += jnp.sum(sids).astype(jnp.float32)
            if up_mode != "derive":
                s_up = min(up_segs or max(2, num_segs // 2),
                           max(2, num_segs // 2),
                           -(-sub.shape[1] // seg))
                usids = select_segments(sub, pcl, seg=seg, qblock=qblock,
                                        num_segs=s_up)
                acc += jnp.sum(usids).astype(jnp.float32)
        return acc * 1e-12

    out["select_ms"] = chained(select_fn, pc0, iters=iters) * 1e3

    # materialize sids/usids for the knn stage (one jit)
    @jax.jit
    def _mk_sids(cs):
        sl, ul = [], []
        for i, r in enumerate(ratios):
            pcl, sub = cs[i], cs[i + 1]
            s_here = min(num_segs, -(-pcl.shape[1] // seg))
            sl.append(select_segments(pcl, pcl, seg=seg, qblock=qblock,
                                      num_segs=s_here))
            s_up = min(up_segs or max(2, num_segs // 2),
                       max(2, num_segs // 2), -(-sub.shape[1] // seg))
            ul.append(select_segments(sub, pcl, seg=seg, qblock=qblock,
                                      num_segs=s_up))
        return sl, ul

    sids_l, usids_l = _mk_sids(coords)

    # ---- stage: Pallas KNN (nbr k=K at every level, up 1-NN at every level)
    def knn_fn(p0):
        cs = [p0] + coords[1:]
        acc = jnp.float32(0.0)
        for i in range(len(ratios)):
            pcl, sub = cs[i], cs[i + 1]
            pcp = _pad_seg(pcl, seg, fill=1e9)
            rel, _ = knn_pallas(pcp, pcl, sids_l[i], k, seg=seg,
                                qblock=qblock,
                                interpret=interpret)
            acc += jnp.sum(rel).astype(jnp.float32)
            if up_mode != "derive":
                subp = _pad_seg(sub, seg, fill=1e9)
                urel, _ = knn_pallas(subp, pcl, usids_l[i], 1, seg=seg,
                                     qblock=qblock,
                                     interpret=interpret)
                acc += jnp.sum(urel).astype(jnp.float32)
        return acc * 1e-12

    out["knn_ms"] = chained(knn_fn, pc0, iters=iters) * 1e3

    # materialize rel for the compact stage (one jit)
    @jax.jit
    def _mk_rel(cs, sl):
        return [knn_pallas(_pad_seg(cs[i], seg, fill=1e9), cs[i], sl[i],
                           k, seg=seg, qblock=qblock,
                           interpret=interpret)[0]
                for i in range(len(ratios))]

    rel_l = _mk_rel(coords, sids_l)

    # ---- stage: gather-table compaction
    if gather_segs and gather_segs < num_segs:
        def compact_fn(p0):
            acc = jnp.sum(p0) * 0.0
            for i in range(len(ratios)):
                ns, nr = compact_tables(sids_l[i], rel_l[i], gather_segs,
                                        seg=seg, qblock=qblock)
                acc += (jnp.sum(ns) + jnp.sum(nr)).astype(jnp.float32)
            return acc * 1e-12

        out["compact_ms"] = chained(compact_fn, pc0, iters=iters) * 1e3
    else:
        out["compact_ms"] = 0.0

    # ---- the real fused pyramid build (sort + select + knn + compact)
    def pyr_fn(p):
        py = build_bucket_pyramid_tpu(p, k, list(ratios), seg=seg,
                                      qblock=qblock, num_segs=num_segs,
                                      gather_segs=gather_segs,
                                      up_segs=up_segs, up_mode=up_mode,
                                      interpret=interpret)
        acc = jnp.float32(0.0)
        for lst in (py["nbr_rel"], py["pool_rel"], py["up_rel"]):
            for x in lst:
                acc += jnp.sum(x.astype(jnp.float32)) * 1e-12
        return acc

    out["pyramid_ms"] = chained(pyr_fn, pts, iters=iters) * 1e3

    if not model:
        return out

    # ---- stage: every model-side gather at its real shape
    # (dims mirror RandLANetNet: lse1 gathers 3+d/2, lse2 d/2, pool 2d,
    # upsample the decoder width)
    # jit the build (eager dispatch through the relay takes minutes), then
    # concretize the Python-int block-granularity lists jit arrayified
    pyr = jax.jit(lambda p: build_bucket_pyramid_tpu(
        p, k, list(ratios), seg=seg, qblock=qblock, num_segs=num_segs,
        gather_segs=gather_segs, up_segs=up_segs, up_mode=up_mode,
        interpret=interpret))(pts)
    for key_ in ("nbr_qblock", "pool_qblock", "up_qblock"):
        if key_ in pyr:
            pyr[key_] = [int(v) for v in pyr[key_]]
    dims = [16, 64, 128, 256][:len(ratios)]

    def gather_fn(p0):
        acc = jnp.float32(0.0)
        for i in range(len(ratios)):
            nl = pyr["coords"][i].shape[1]
            d = dims[i]
            key = jax.random.PRNGKey(i)
            f1 = jax.random.normal(key, (b, nl, 3 + d // 2), jnp.float32)
            f1 = f1 + jnp.sum(p0) * 1e-30
            g1 = gather_pallas(_pad_seg(f1, seg), pyr["nbr_seg_ids"][i],
                               pyr["nbr_rel"][i], seg,
                               pyr["nbr_qblock"][i], jnp.bfloat16,
                               interpret)
            f2 = jax.random.normal(key, (b, nl, d // 2), jnp.float32)
            g2 = gather_pallas(_pad_seg(f2, seg), pyr["nbr_seg_ids"][i],
                               pyr["nbr_rel"][i], seg,
                               pyr["nbr_qblock"][i], jnp.bfloat16,
                               interpret)
            f3 = jax.random.normal(key, (b, nl, 2 * d), jnp.float32)
            g3 = gather_pallas(_pad_seg(f3, seg), pyr["pool_seg_ids"][i],
                               pyr["pool_rel"][i], seg,
                               pyr["pool_qblock"][i], jnp.bfloat16,
                               interpret)
            # decoder upsample of this level's width
            nc = pyr["coords"][i + 1].shape[1] if i + 1 < len(
                pyr["coords"]) else pyr["coords"][i].shape[1]
            f4 = jax.random.normal(key, (b, nc, 2 * d), jnp.float32)
            up_qb = pyr.get("up_qblock", [qblock] * len(ratios))[i]
            g4 = gather_pallas(_pad_seg(f4, seg), pyr["up_seg_ids"][i],
                               pyr["up_rel"][i], seg, up_qb,
                               jnp.bfloat16, interpret)
            acc += (jnp.sum(g1) + jnp.sum(g2) + jnp.sum(g3) +
                    jnp.sum(g4)) * 1e-12
        return acc

    out["gather_ms"] = chained(gather_fn, pc0, iters=iters) * 1e3

    # ---- full forward
    from open3d_ml_tpu.models import RandLANet
    mdl = RandLANet(num_points=n, num_classes=19, ignored_label_inds=[0],
                    in_channels=3, dim_features=8, num_layers=len(ratios),
                    dim_output=list(dims), sub_sampling_ratio=list(ratios),
                    seg=seg, block=qblock, num_segs=num_segs,
                    gather_segs=gather_segs, up_segs=up_segs,
                    up_mode=up_mode)
    net = mdl.get_net()
    feats = jnp.asarray(rng.uniform(-25, 25, (b, n, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda bb: net.init(
        {"params": key, "dropout": key}, bb, training=False))(
            {"coords": pts, "features": feats})

    def fwd(c, v, f):
        return jnp.sum(net.apply(v, {"coords": c, "features": f},
                                 training=False))

    out["fwd_ms"] = chained(fwd, pts, variables, feats, iters=iters) * 1e3
    out["model_rest_ms"] = (out["fwd_ms"] - out["pyramid_ms"] -
                            out["gather_ms"])
    out["points_per_sec"] = b * n / (out["fwd_ms"] / 1e3)
    return {kk: (round(v, 2) if isinstance(v, float) else v)
            for kk, v in out.items()}


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from open3d_ml_tpu.pipelines.base_pipeline import _enable_compile_cache
    _enable_compile_cache()  # share the pipeline/bench compile cache

    parts = sys.argv[1:]
    um = "derive" if "D" in parts else "search"
    args = [int(x) for x in parts if x != "D"]
    seg, qblock, s, g = (args + [64, 128, 64, 32][len(args):])[:4]
    u = args[4] if len(args) > 4 else 0
    out = stage_times(seg=seg, qblock=qblock, num_segs=s, gather_segs=g,
                      up_segs=u, up_mode=um)
    out.update({"config": f"seg{seg}_qb{qblock}_S{s}_G{g}_U{u}"
                + ("_D" if um == "derive" else "")})
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
