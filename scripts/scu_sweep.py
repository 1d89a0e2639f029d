"""SparseConvUnet bucket-parameter sweep: forward time vs (seg, qblock, S).

The bucket path's cost centers are the per-block table DMas (gather/match
kernels load S*seg support rows per qblock queries) and the per-level
rank/match table construction; this sweeps the block geometry on the real
chip and reports points/sec plus the exactness overflow counter for each
configuration (overflow 0 = the tables cover every stencil tap, i.e. the
config is numerically exact — see ops/sparse_bucket.rank_site_segments).

Usage:  python scripts/scu_sweep.py [--out SCU_SWEEP.json]
"""

import argparse
import json
import sys
import time
from os.path import abspath, dirname, join

import numpy as np

sys.path.insert(0, dirname(dirname(abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--configs", default="64,32,16 64,32,12 64,32,8 "
                                          "32,32,24 32,32,16 32,32,12 "
                                          "32,64,16 16,32,24 48,32,12")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from open3d_ml_tpu.models import SparseConvUnet
    from open3d_ml_tpu.pipelines.base_pipeline import _enable_compile_cache
    from open3d_ml_tpu.utils import Config
    _enable_compile_cache()

    here = dirname(dirname(abspath(__file__)))
    cfg = Config.load_from_file(join(
        here, "open3d_ml_tpu", "configs", "sparseconvunet_scannet.yml"))
    base_cfg = dict(cfg.model)
    base_cfg.pop("name", None)

    n = base_cfg["num_points"]
    rng = np.random.default_rng(0)
    # surface-concentrated scene, same construction as bench.py's
    # child_sparseconvunet (r4 verdict Weak #6)
    from open3d_ml_tpu.datasets.synthetic import make_semseg_scene
    pts = make_semseg_scene(n, seed=0)[0].astype(np.float64)
    pts -= pts.min(0)
    pts *= min(1000.0 / max(pts.max(), 1e-6), 1.0 / 0.02)
    pts = (pts.astype(np.int32) + 0.5).astype(np.float32)
    batch = {
        "point": jnp.asarray(pts[None]),
        "feat": jnp.asarray(rng.uniform(-1, 1, (1, n, 3)), jnp.float32),
        "point_mask": jnp.ones((1, n), bool),
    }
    key = jax.random.PRNGKey(0)
    rows = []
    for spec in args.configs.split():
        seg, qb, s = (int(x) for x in spec.split(","))
        mc = dict(base_cfg, bucket_seg=seg, bucket_qblock=qb,
                  bucket_segs=s, warn_on_overflow=False)
        model = SparseConvUnet(**mc)
        net = model.get_net()
        try:
            v = jax.jit(lambda bb: net.init(
                {"params": key}, bb, training=False))(batch)
            iters = args.iters

            @jax.jit
            def run(vv, bb):
                def body(_, acc):
                    b2 = dict(bb)
                    b2["feat"] = bb["feat"] + acc * 1e-38
                    out = net.apply(vv, b2, training=False)
                    return jnp.sum(out.astype(jnp.float32))
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

            float(run(v, batch))  # compile + warm
            t0 = time.perf_counter()
            float(run(v, batch))
            dt = time.perf_counter() - t0
            # exactness: sown overflow counter on one eager apply
            _, inter = net.apply(v, batch, training=False,
                                 mutable=["intermediates"])
            ovf = int(np.asarray(jax.tree.leaves(
                inter["intermediates"]["net"]
                ["table_overflow_blocks"])[0]).sum())
            row = {"seg": seg, "qblock": qb, "S": s,
                   "points_per_sec": round(n * iters / dt, 1),
                   "ms_per_fwd": round(dt / iters * 1000, 2),
                   "table_overflow_blocks": ovf}
        except Exception as e:  # noqa: BLE001 - record and continue
            row = {"seg": seg, "qblock": qb, "S": s,
                   "error": str(e)[-300:]}
        print(json.dumps(row), flush=True)
        rows.append(row)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"device": str(jax.devices()[0].device_kind),
                       "num_points": n, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
